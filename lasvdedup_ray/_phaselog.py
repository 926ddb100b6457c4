"""Opt-in sub-phase wall-clock marks (LASVDEDUP_PHASE_LOG=1).

Scaling diagnostics only — prints the wall time since the previous mark
to stderr at each named sync point; zero work when the env var is unset.
The flagship pipeline (`pipelines/dedup.py`) prints coarse PHASE lines;
these SUBPHASE lines nest inside them (store build, hot-set derivation,
pair materialize, border probe) so a bench run shows where the
CPU-count-independent wall time sits.
"""

from __future__ import annotations

import os
import sys
import time

_ENABLED = bool(os.environ.get("LASVDEDUP_PHASE_LOG"))
_last = [time.time()]


def mark(name: str) -> None:
    """Print `SUBPHASE <name>: <dt>s` (time since the previous mark)."""
    if not _ENABLED:
        return
    now = time.time()
    print(f"SUBPHASE {name}: {now - _last[0]:.2f}s", file=sys.stderr, flush=True)
    _last[0] = now
