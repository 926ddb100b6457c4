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


# _POLY_MULT is odd, hence invertible mod 2^64 — windowed polynomial hashes
# can be recovered from position-weighted prefix sums by multiplying with
# inverse powers, giving O(n) time AND memory per length probe (the naive
# sliding_window_view materializes an (n-L+1) x L matrix: ~20 GB for a
# 100 KB doc at L ~ n/2).
_POLY_INV = U64(pow(int(_POLY_MULT), -1, 1 << 64))


def _prefix_state(arr: np.ndarray):
    """Per-string precomputation shared by every length probe.

    Returns (cs, inv_pows) with
      cs[i]      = sum_{j<i} arr[j] * M^(n-1-j)   (mod 2^64)
      inv_pows[k] = M^-k                           (mod 2^64)
    so that hash of window [i, i+L) = (cs[i+L]-cs[i]) * inv_pows[n-L-i].
    """
    n = len(arr)
    pows_asc = np.empty(n, dtype=U64)  # M^0 .. M^(n-1)
    pows_asc[0] = 1
    if n > 1:
        np.multiply.accumulate(np.full(n - 1, _POLY_MULT, dtype=U64), out=pows_asc[1:])
    w = arr.astype(U64) * pows_asc[::-1]
    cs = np.empty(n + 1, dtype=U64)
    cs[0] = 0
    np.cumsum(w, dtype=U64, out=cs[1:])
    inv_pows = np.empty(n + 1, dtype=U64)
    inv_pows[0] = 1
    np.multiply.accumulate(np.full(n, _POLY_INV, dtype=U64), out=inv_pows[1:])
    return cs, inv_pows


def _window_hashes(state, n: int, L: int) -> np.ndarray:
    """splitmix-finalized polynomial hashes of all L-grams — O(n)."""
    cs, inv_pows = state
    sums = cs[L:] - cs[: n - L + 1]
    return splitmix64(sums * inv_pows[n - L :: -1])


def _length_hashes(arr: np.ndarray, L: int) -> np.ndarray:
    """splitmix-finalized polynomial hashes of all L-grams of a byte array."""
    return _window_hashes(_prefix_state(arr), len(arr), L)


def longest_common_substring(a: bytes, b: bytes) -> Tuple[int, int, int]:
    """(length, offset_a, offset_b) of the longest common substring.

    Binary search on length; at each probe the L-gram hash sets of both
    strings are intersected (numpy), and every hash match is confirmed
    byte-for-byte before being accepted.  Among the maximum-length
    matches the DETERMINISTIC one is returned: smallest offset_a, then
    smallest offset_b — so the result is a pure function of the inputs
    and SQL-replayable (the driver's DuckDB oracle mirrors this rule).
    """
    if not a or not b:
        return 0, 0, 0
    aa = np.frombuffer(a, dtype=np.uint8)
    bb = np.frombuffer(b, dtype=np.uint8)
    state_a = _prefix_state(aa)
    state_b = _prefix_state(bb)

    def probe(L: int) -> Optional[Tuple[int, int]]:
        """Smallest (offset_a, offset_b) match of length L, or None."""
        if L == 0:
            return (0, 0)
        if L > len(aa) or L > len(bb):
            return None
        ha = _window_hashes(state_a, len(aa), L)
        hb = _window_hashes(state_b, len(bb), L)
        # np.intersect1d returns the FIRST occurrence index of each common
        # hash in both arrays, so min over confirmed ia == the smallest
        # offset_a over all window matches, and its ib == the smallest
        # offset_b carrying that same substring (modulo hash collisions,
        # handled below).
        common, ia, ib = np.intersect1d(ha, hb, return_indices=True)
        if common.shape[0] == 0:
            return None
        # confirm in ascending offset_a order (hash collisions are ~2^-64
        # but the result must be exact AND deterministic)
        for k in np.argsort(ia, kind="stable"):
            pa_, pb_ = int(ia[k]), int(ib[k])
            if a[pa_ : pa_ + L] == b[pb_ : pb_ + L]:
                return (pa_, pb_)
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
    while lo < hi:
        mid = (lo + hi + 1) // 2
        if probe(mid) is not None:
            lo = mid
        else:
            hi = mid - 1
    best = probe(lo)
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
