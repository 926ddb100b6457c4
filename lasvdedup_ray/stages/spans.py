"""Exact near-dup span detection (the optional substring stage,
SURVEY §7 step 10 / north_star "suffix-array substring stage").

For verified near-dup pairs, finds the LONGEST COMMON SUBSTRING length (and
its offsets) with the classic binary-search-over-length + rolling-hash
technique — O((n+m) log min(n,m)) per pair, fully numpy-vectorized per
length probe, hash hits confirmed by a real byte comparison so the result
is exact (no collision risk).  Equivalent output to a suffix-array LCS
walk, but expressible with the same windowed-hash kernels the signer uses.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import pyarrow as pa
import ray
import ray.data

from ..functions.hashing import U64, _POLY_MULT, splitmix64


def _length_hashes(arr: np.ndarray, L: int) -> np.ndarray:
    """splitmix-finalized polynomial hashes of all L-grams of a byte array."""
    win = np.lib.stride_tricks.sliding_window_view(arr, L).astype(U64)
    pows = _POLY_MULT ** np.arange(L - 1, -1, -1, dtype=U64)
    return splitmix64((win * pows).sum(axis=1, dtype=U64))


def longest_common_substring(a: bytes, b: bytes) -> Tuple[int, int, int]:
    """(length, offset_a, offset_b) of the longest common substring.

    Binary search on length; at each probe the L-gram hash sets of both
    strings are intersected (numpy), and every hash match is confirmed
    byte-for-byte before being accepted.
    """
    if not a or not b:
        return 0, 0, 0
    aa = np.frombuffer(a, dtype=np.uint8)
    bb = np.frombuffer(b, dtype=np.uint8)

    def probe(L: int) -> Optional[Tuple[int, int]]:
        if L == 0:
            return (0, 0)
        if L > len(aa) or L > len(bb):
            return None
        ha = _length_hashes(aa, L)
        hb = _length_hashes(bb, L)
        common, ia, ib = np.intersect1d(ha, hb, return_indices=True)
        if common.shape[0] == 0:
            return None
        # confirm (hash collisions are ~2^-64 but the result must be exact)
        for pa_, pb_ in zip(ia, ib):
            if a[pa_ : pa_ + L] == b[pb_ : pb_ + L]:
                return (int(pa_), int(pb_))
        # all candidates were collisions: fall back to full cross-check of
        # matching hashes (vanishingly rare)
        order = np.argsort(hb, kind="stable")
        hb_sorted = hb[order]
        for pa_ in range(len(ha)):
            lo = np.searchsorted(hb_sorted, ha[pa_])
            while lo < len(hb_sorted) and hb_sorted[lo] == ha[pa_]:
                pb_ = int(order[lo])
                if a[pa_ : pa_ + L] == b[pb_ : pb_ + L]:
                    return (pa_, pb_)
                lo += 1
        return None

    lo, hi = 0, min(len(aa), len(bb))
    best = (0, 0)
    while lo < hi:
        mid = (lo + hi + 1) // 2
        hit = probe(mid)
        if hit is not None:
            best = hit
            lo = mid
        else:
            hi = mid - 1
    return lo, best[0], best[1]


def common_spans(
    pairs_with_content: ray.data.Dataset,
    min_len: int = 1,
) -> ray.data.Dataset:
    """map_batches stage: rows (id_a, id_b, content_a, content_b) ->
    (id_a, id_b, lcs_len, offset_a, offset_b), filtered to lcs_len >=
    min_len."""

    def batch(t: pa.Table) -> pa.Table:
        ia = t["id_a"].to_pylist()
        ib = t["id_b"].to_pylist()
        lens, oa, ob = [], [], []
        for ca, cb in zip(t["content_a"].to_pylist(), t["content_b"].to_pylist()):
            L, x, y = longest_common_substring(ca.encode(), cb.encode())
            lens.append(L)
            oa.append(x)
            ob.append(y)
        out = pa.table(
            {
                "id_a": pa.array(ia, pa.string()),
                "id_b": pa.array(ib, pa.string()),
                "lcs_len": pa.array(lens, pa.int64()),
                "offset_a": pa.array(oa, pa.int64()),
                "offset_b": pa.array(ob, pa.int64()),
            }
        )
        import pyarrow.compute as pc

        return out.filter(pc.greater_equal(out["lcs_len"], min_len))

    return pairs_with_content.map_batches(batch, batch_format="pyarrow", batch_size=256)
