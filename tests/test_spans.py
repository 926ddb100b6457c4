"""Exact LCS span stage vs difflib oracle."""

import difflib

import numpy as np
import pyarrow as pa
import ray.data

from lasvdedup_ray.stages.spans import common_spans, longest_common_substring


def _oracle(a: bytes, b: bytes) -> int:
    m = difflib.SequenceMatcher(None, a, b, autojunk=False)
    return m.find_longest_match(0, len(a), 0, len(b)).size


def test_lcs_matches_difflib():
    rng = np.random.default_rng(4)
    cases = [
        (b"hello world", b"say hello there"),
        (b"abcdef", b"zabcq"),
        (b"", b"x"),
        (b"same", b"same"),
        (b"xyz", b"abc"),
    ]
    alpha = np.frombuffer(b"abcdefgh", dtype=np.uint8)
    for _ in range(20):
        a = alpha[rng.integers(0, 8, rng.integers(5, 200))].tobytes()
        b = alpha[rng.integers(0, 8, rng.integers(5, 200))].tobytes()
        cases.append((a, b))
    for a, b in cases:
        L, oa, ob = longest_common_substring(a, b)
        assert L == _oracle(a, b), (a, b)
        if L:
            assert a[oa : oa + L] == b[ob : ob + L]


def test_common_spans_stage():
    t = pa.table(
        {
            "id_a": pa.array(["x"], pa.string()),
            "id_b": pa.array(["y"], pa.string()),
            "content_a": pa.array(["prefix SHARED-SPAN-HERE suffix1"], pa.large_string()),
            "content_b": pa.array(["other SHARED-SPAN-HERE tail"], pa.large_string()),
        }
    )
    out = common_spans(ray.data.from_arrow(t)).to_pandas()
    assert len(out) == 1
    row = out.iloc[0]
    assert row["lcs_len"] == len(" SHARED-SPAN-HERE ")


def test_large_doc_linear_memory():
    """ADVICE r1: L ~ n/2 probes on ~100 KB docs must not materialize an
    (n-L+1) x L window matrix (was ~GBs); the prefix-sum rolling hash is
    O(n) per probe."""
    import numpy as np

    rng = np.random.default_rng(0)
    common = bytes(rng.integers(32, 127, 40_000, dtype=np.uint8))
    a = bytes(rng.integers(32, 127, 20_000, dtype=np.uint8)) + common
    b = common + bytes(rng.integers(32, 127, 30_000, dtype=np.uint8))
    L, oa, ob = longest_common_substring(a, b)
    assert L >= 40_000
    assert a[oa : oa + L] == b[ob : ob + L]
