"""Hypothesis property tests over the pure (non-Ray) kernels — invariants
that must hold for ANY input, not just the pinned fixtures."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from lasvdedup_ray.functions.hashing import (
    hamming64,
    sha256_bytes,
    shingle_hashes,
    splitmix64,
)
from lasvdedup_ray.functions.text import quality_metrics, winnow_fingerprints

texts = st.lists(
    st.text(
        alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=200
    ),
    min_size=1,
    max_size=20,
)


@settings(max_examples=50, deadline=None)
@given(texts)
def test_quality_metrics_ratio_bounds(ts):
    m = quality_metrics(pa.array(ts, pa.string()))
    for k in ("alpha_ratio", "digit_ratio", "punct_ratio", "ws_ratio"):
        v = m[k].to_numpy(zero_copy_only=False)
        assert ((v >= 0.0) & (v <= 1.0)).all(), k
    n_chars = m["n_chars"].to_numpy(zero_copy_only=False)
    assert (n_chars == np.array([len(t) for t in ts])).all()
    # alpha + digit counts can never exceed the character count
    tot = (m["alpha_ratio"].to_numpy(zero_copy_only=False)
           + m["digit_ratio"].to_numpy(zero_copy_only=False))
    assert (tot <= 1.0 + 1e-12).all()


@settings(max_examples=50, deadline=None)
@given(st.binary(min_size=0, max_size=500))
def test_winnow_fingerprints_nonempty_and_deterministic(data):
    f1 = winnow_fingerprints(data)
    f2 = winnow_fingerprints(data)
    assert len(f1) >= 1
    assert np.array_equal(np.sort(f1), np.sort(f2))
    # fingerprints are a subset of fingerprints of the doubled document
    # only when the doc is long enough to window — just re-check stability
    assert f1.dtype == np.uint64


@settings(max_examples=30, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), min_size=2,
                max_size=200, unique=True))
def test_splitmix64_injective_on_sample(xs):
    h = splitmix64(np.array(xs, dtype=np.uint64))
    assert len(np.unique(h)) == len(xs)


@settings(max_examples=30, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), min_size=2,
                max_size=50))
def test_hamming64_metric_properties(xs):
    a = np.array(xs, dtype=np.uint64)
    b = np.roll(a, 1)
    d_ab = hamming64(a, b)
    d_ba = hamming64(b, a)
    assert (d_ab == d_ba).all()  # symmetry
    assert (hamming64(a, a) == 0).all()  # identity
    assert (d_ab <= 64).all() and (d_ab >= 0).all()


@settings(max_examples=20, deadline=None)
@given(st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126),
               min_size=0, max_size=300))
def test_shingle_hashes_count(s):
    k = 8
    h = shingle_hashes(s.encode("utf-8"), k=k)
    n = len(s.encode("utf-8"))
    assert len(h) == max(n - k + 1, 0) or (n < k and len(h) <= 1)


@settings(max_examples=20, deadline=None)
@given(st.lists(st.binary(max_size=100), min_size=1, max_size=20))
def test_sha256_bytes_shape(bs):
    out = sha256_bytes(bs)
    assert len(out) == len(bs)
    assert all(len(d) == 32 for d in out)


events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),        # user
        st.integers(min_value=0, max_value=50),       # ts (us)
        st.integers(min_value=0, max_value=3),        # stage index
    ),
    min_size=0,
    max_size=60,
)


@settings(max_examples=100, deadline=None)
@given(events_strategy)
def test_funnel_partition_matches_bruteforce(rows):
    """The vectorized per-partition funnel chain == a per-user Python scan
    for ANY event multiset (ties, revisits, out-of-order arrival)."""
    import pyarrow.compute as pc  # noqa: F401

    from lasvdedup_ray.pipelines.relational import FUNNEL_STAGES

    uid = np.array([r[0] for r in rows], np.int64)
    ts = np.array([r[1] for r in rows], np.int64)
    ety = np.array([FUNNEL_STAGES[r[2]] for r in rows]) if rows else np.array([], dtype="U8")

    # mirror of funnel_partition's numpy core (same code path semantics)
    if len(rows) == 0:
        counts = np.zeros(len(FUNNEL_STAGES), np.int64)
    else:
        users, uidx = np.unique(uid, return_inverse=True)
        cur = np.full(len(users), -np.inf)
        counts = np.zeros(len(FUNNEL_STAGES), np.int64)
        for k, stage in enumerate(FUNNEL_STAGES):
            nxt = np.full(len(users), np.inf)
            m = (ety == stage) & (ts > cur[uidx])
            np.minimum.at(nxt, uidx[m], ts[m])
            cur = nxt
            counts[k] = int(np.isfinite(cur).sum())

    expected = np.zeros(len(FUNNEL_STAGES), np.int64)
    for u in np.unique(uid):
        sel = uid == u
        cur_t = -np.inf
        for k, stage in enumerate(FUNNEL_STAGES):
            cand = ts[sel & (ety == stage)]
            cand = cand[cand > cur_t]
            if len(cand) == 0:
                break
            cur_t = cand.min()
            expected[k] += 1
    assert list(counts) == list(expected)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=(1 << 58) - 1), min_size=1, max_size=50))
def test_hll_bit_length_matches_python(ws):
    """The vectorized shift-cascade bit_length in hll_distinct_users'
    partials == int.bit_length for any 58-bit window value."""
    v = np.array(ws, np.uint64)
    bl = np.zeros(len(v), np.int64)
    for s in (32, 16, 8, 4, 2, 1):
        m = (v >> np.uint64(s)) > 0
        bl[m] += s
        v[m] >>= np.uint64(s)
    bl += (v > 0).astype(np.int64)
    assert list(bl) == [int(w).bit_length() for w in ws]


range_events = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=4),     # user
        st.integers(min_value=0, max_value=100),   # ts
        st.booleans(),                             # is_click
        st.integers(min_value=-5, max_value=5),    # value e4 (int)
    ),
    min_size=0,
    max_size=50,
)


@settings(max_examples=100, deadline=None)
@given(range_events)
def test_range_join_probe_matches_bruteforce(rows):
    """The merge-probe window counts/sums == brute-force O(n*m) pairs for
    ANY event layout (equal timestamps, empty sides, interleaved users)."""
    W = 10
    cu = np.array([r[0] for r in rows if r[2]], np.int64)
    cts = np.array([r[1] for r in rows if r[2]], np.int64)
    cv = np.array([r[3] for r in rows if r[2]], np.int64)
    pu = np.array([r[0] for r in rows if not r[2]], np.int64)
    pts = np.array([r[1] for r in rows if not r[2]], np.int64)

    def probe(keys):
        m = len(cu) + len(keys)
        u_all = np.concatenate([cu, pu])
        k_all = np.concatenate([cts, keys])
        kind = np.concatenate(
            [np.ones(len(cu), np.int8), np.zeros(len(keys), np.int8)]
        )
        order = np.lexsort((kind, k_all, u_all))
        click_flag = kind[order] == 1
        before_n = np.concatenate([[0], np.cumsum(click_flag)])[:m]
        before_v = np.concatenate(
            [[0], np.cumsum(np.where(click_flag, np.concatenate([cv, np.zeros(len(keys), np.int64)])[order], 0))]
        )[:m]
        pos = np.empty(m, np.int64)
        pos[order] = np.arange(m)
        probe_pos = pos[len(cu):]
        return before_n[probe_pos], before_v[probe_pos]

    if len(pu):
        n_hi, v_hi = probe(pts)
        n_lo, v_lo = probe(pts - W)
        n_clicks, sums = n_hi - n_lo, v_hi - v_lo
    else:
        n_clicks = sums = np.array([], np.int64)

    for i in range(len(pu)):
        mask = (cu == pu[i]) & (cts >= pts[i] - W) & (cts < pts[i])
        assert n_clicks[i] == mask.sum()
        assert sums[i] == cv[mask].sum()


@settings(max_examples=60, deadline=None)
@given(texts)
def test_token_set_canonical_form_matches_python(ts):
    """The vectorized sorted-distinct-token canonicalization inside
    dup_rate_by_source == sorted(set(text.lower().split(' '))) for ANY
    ASCII text (double spaces, leading/trailing spaces, empty strings —
    all produce '' tokens that both sides keep identically)."""
    import pyarrow.compute as pc

    col = pa.array(ts, pa.string())
    toks_list = pc.split_pattern(pc.utf8_lower(col), " ")
    flat = pc.list_flatten(toks_list).to_numpy(zero_copy_only=False)
    parent = pc.list_parent_indices(toks_list).to_numpy(zero_copy_only=False)
    order = np.lexsort((flat, parent))
    p, w = parent[order], flat[order]
    keep = np.ones(len(p), dtype=bool)
    keep[1:] = (p[1:] != p[:-1]) | (w[1:] != w[:-1])
    p, w = p[keep], w[keep]
    bounds = np.searchsorted(p, np.arange(1, len(ts)))
    canon = [" ".join(ws) for ws in np.split(w, bounds)]
    expected = [" ".join(sorted(set(t.lower().split(" ")))) for t in ts]
    assert canon == expected


@settings(max_examples=50, deadline=None)
@given(texts)
def test_token_poly_hashes_matches_horner(ts):
    """token_poly_hashes equals the per-string Horner-form byte polynomial
    mod 2^64 for ANY printable-ASCII strings, across plain/sliced/chunked
    and string/large_string layouts."""
    from lasvdedup_ray.functions.hashing import _POLY_MULT, token_poly_hashes

    def ref(s: str) -> int:
        z = 0
        for b in s.encode():
            z = (z * int(_POLY_MULT) + b) % (1 << 64)
        return z

    exp = np.array([ref(s) for s in ts], np.uint64)
    assert (token_poly_hashes(pa.array(ts, pa.string())) == exp).all()
    assert (token_poly_hashes(pa.array(ts, pa.large_string())) == exp).all()
    arr = pa.array(["pad"] + ts, pa.string()).slice(1)  # non-zero offset
    assert (token_poly_hashes(arr) == exp).all()


@settings(max_examples=50, deadline=None)
@given(texts, texts)
def test_poly_concat_matches_joined_hash(a, b):
    """H(w1 + ' ' + w2) via the concat identity equals hashing the joined
    string directly, for ANY string pairs (incl. empties)."""
    from lasvdedup_ray.functions.hashing import (
        _POLY_MULT,
        poly_concat,
        token_poly_hashes,
    )

    n = min(len(a), len(b))
    a, b = a[:n], b[:n]
    h1 = token_poly_hashes(pa.array(a, pa.string()))
    h2 = token_poly_hashes(pa.array(b, pa.string()))
    lens2 = np.array([len(w.encode()) for w in b], np.int64)
    got = poly_concat(h1 * _POLY_MULT + np.uint64(32), h2, lens2)
    exp = token_poly_hashes(pa.array([f"{x} {y}" for x, y in zip(a, b)]))
    assert (got == exp).all()
