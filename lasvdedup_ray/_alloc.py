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

A second, independent pathology: glibc's dynamic mmap threshold caps at
32 MB, so any numpy temporary above that is mmap'd on allocation and
munmap'd on free — every single call.  A stage whose per-task temporaries
are a few tens of MB (the LSH pair emitter gathers a ~33 MB signature
block per partition) then pays a page-fault storm on first touch plus a
TLB-shootdown IPI broadcast on free, and the shootdowns SERIALIZE across
workers: measured on the 600k-file flagship, each reduce task spent
user 1.3 s / sys 5.5 s (cold) with ~20k minor faults per call, and the
32-way reduce wave ran at ~3x effective parallelism.  Raising the malloc
mmap threshold keeps those temporaries on the (reused) heap: sys time
collapses and the wave scales with CPUs.  The cost is a retained arena of
roughly the threshold size per worker process — ~6 GB across 32 workers,
negligible against the 128 GB box and strictly bounded by
``_MMAP_THRESHOLD_BYTES``.  Opt out with ``LASVDEDUP_MMAP_THRESHOLD=0``
(or set another byte value).
"""

from __future__ import annotations

import os

_MMAP_THRESHOLD_BYTES = 256 * 1024 * 1024


def raise_malloc_mmap_threshold() -> None:
    """mallopt(M_MMAP_THRESHOLD, 256 MB) in this process (glibc only).

    Explicit mallopt is exempt from glibc's 32 MB dynamic-threshold cap,
    so multi-ten-MB numpy temporaries become ordinary reused heap chunks
    instead of per-call mmap/munmap cycles (fault + TLB-shootdown storms
    at high worker concurrency — see module docstring)."""
    env = os.environ.get("LASVDEDUP_MMAP_THRESHOLD")
    threshold = _MMAP_THRESHOLD_BYTES if env is None else int(env)
    if threshold <= 0:
        return
    try:
        import ctypes
        import ctypes.util

        libc = ctypes.CDLL(ctypes.util.find_library("c") or "libc.so.6", use_errno=True)
        M_TRIM_THRESHOLD = -1  # glibc malloc.h
        M_MMAP_THRESHOLD = -3
        libc.mallopt(M_MMAP_THRESHOLD, threshold)
        # without this, freeing a large top-of-heap chunk trims the heap
        # right back (madvise/munmap) and the next call re-faults every
        # page — measured 817k minor faults across 50 alloc/free cycles of
        # a 64 MB buffer with the mmap threshold alone vs 542 with both
        libc.mallopt(M_TRIM_THRESHOLD, 4 * threshold)
    except Exception:
        # non-glibc platform: allocations keep the default policy
        pass


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
raise_malloc_mmap_threshold()
