"""Large-allocation hygiene for the engine's worker processes.

Numpy madvises ``MADV_HUGEPAGE`` on every allocation >= 4 MB (its Linux
default since 1.18).  With the kernel's THP defrag policy set to
``madvise`` — the common distro default — first-touch of such a region
performs *synchronous* huge-page compaction, and on a memory-fragmented
host that stalls for hundreds of microseconds **per page**: measured here
at 0.01-0.03 GB/s fault rate vs 2.3 GB/s with plain 4 KiB pages, i.e. a
~100x slowdown on exactly the allocations a dedup engine makes all day
(signature matrices, shingle buffers, Arrow->numpy copies) in every
short-lived Ray worker.  This is the same pathology long documented for
Redis/Postgres under THP; the sandbox VM exhibits it persistently (see
BASELINE.md machine blocks, rounds 3-5).

The fix is one numpy switch.  It must flip in *every* process: the
driver, plus each Ray worker.  Workers import this package while
unpickling our stage callables, so importing :mod:`lasvdedup_ray` is
sufficient; the env var additionally covers any worker forked after the
driver set it (numpy reads ``NUMPY_MADVISE_HUGEPAGE`` at import time,
the ``_set_madvise_hugepage`` call covers processes where numpy was
already imported).

Set ``LASVDEDUP_THP_MADVISE=1`` to keep numpy's default behavior (e.g.
on hosts where THP defrag is ``defer`` and huge pages genuinely help).
"""

from __future__ import annotations

import os


def disable_numpy_hugepage_madvise() -> None:
    if os.environ.get("LASVDEDUP_THP_MADVISE") == "1":
        return
    # For processes not yet started (Ray workers inherit the driver's
    # environment via the raylet when ray.init follows this import).
    os.environ.setdefault("NUMPY_MADVISE_HUGEPAGE", "0")
    try:
        try:
            from numpy.core.multiarray import _set_madvise_hugepage
        except ImportError:  # numpy >= 2.0 layout
            from numpy._core.multiarray import _set_madvise_hugepage
        _set_madvise_hugepage(False)
    except Exception:
        # Private API: absence just means numpy keeps its default; the
        # env var above still applies to any not-yet-imported numpy.
        pass


disable_numpy_hugepage_madvise()
