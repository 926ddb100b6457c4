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
