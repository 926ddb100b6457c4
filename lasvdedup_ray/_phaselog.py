"""Opt-in sub-phase wall-clock marks (LASVDEDUP_PHASE_LOG=1).

Scaling diagnostics only — prints the wall time since the previous mark
to stderr at each named sync point; zero work when the env var is unset.
The flagship pipeline (`pipelines/dedup.py`) prints coarse PHASE lines;
SUBPHASE lines nest inside them (store build, hot-set derivation,
pair materialize, border probe) so a bench run shows where the
CPU-count-independent wall time sits.  Each prefix keeps its own
since-last clock, so the coarse and nested series don't reset each other.
"""

from __future__ import annotations

import os
import sys
import time

_ENABLED = bool(os.environ.get("LASVDEDUP_PHASE_LOG"))
_last: dict[str, float] = {}


def reset(prefix: str = "SUBPHASE") -> None:
    """Start (or restart) a prefix's clock without printing — call at a
    pipeline's entry so its first mark measures from there."""
    if _ENABLED:
        _last[prefix] = time.time()


def mark(name: str, prefix: str = "SUBPHASE") -> None:
    """Print `<prefix> <name>: <dt>s` (time since the previous mark of
    the same prefix)."""
    if not _ENABLED:
        return
    now = time.time()
    dt = now - _last.get(prefix, now)
    print(f"{prefix} {name}: {dt:.2f}s", file=sys.stderr, flush=True)
    _last[prefix] = now
