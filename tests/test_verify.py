"""verify_pairs: exact boundary semantics must hold on BOTH execution
paths — the driver-attach fast path and the fully distributed
bloom + double-join path (round-1 ADVICE: the old code skipped exact
verification above a driver cap; now boundary pairs are exact-checked at
every scale)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from lasvdedup_ray.config import LSHConfig, SignatureConfig
from lasvdedup_ray.stages.lsh import PAIR_SCHEMA
from lasvdedup_ray.stages.verify import exact_jaccard_for_pairs, verify_pairs

SIG = SignatureConfig(k=3)
TAU = 0.2


def _mk(words, drop=0):
    """Doc built from numbered tokens; `drop` controls exact Jaccard."""
    return " ".join(f"tok{i:04d}" for i in range(drop, words + drop))


@pytest.fixture(scope="module")
def fixture_data():
    # near pair (a,b): high overlap => exact d well under tau
    a, b = _mk(200), _mk(200, drop=4)
    # far pair (c,d): ~1/3 overlap => exact d well over tau
    c, d = _mk(90), _mk(90, drop=60)
    da = 1.0 - exact_jaccard_for_pairs([a], [b], SIG)[0]
    dc = 1.0 - exact_jaccard_for_pairs([c], [d], SIG)[0]
    assert da <= TAU < dc, (da, dc)
    content = ray.data.from_arrow(
        pa.table(
            {
                "id": pa.array(["a", "b", "c", "d", "e", "f"], pa.string()),
                "content": pa.array([a, b, c, d, _mk(50), _mk(50, 40)], pa.string()),
            }
        )
    )
    # both candidate pairs land IN the borderline band (est > tau - 0.04);
    # (e,f) is a sure pair (est below the band) that must pass unchecked
    pairs = ray.data.from_arrow(
        pa.table(
            {
                "id_a": pa.array(["a", "c", "e"], pa.string()),
                "id_b": pa.array(["b", "d", "f"], pa.string()),
                "est_distance": pa.array([0.18, 0.18, 0.05], pa.float64()),
            },
            schema=PAIR_SCHEMA,
        )
    )
    return pairs, content


@pytest.mark.parametrize("cap", [5000, 0])  # driver path / forced distributed path
def test_borderline_exact_checked_both_paths(fixture_data, cap):
    pairs, content = fixture_data
    out = verify_pairs(
        pairs,
        content,
        SIG,
        LSHConfig(),
        tau=TAU,
        num_partitions=4,
        border_driver_cap=cap,
    ).take_all()
    kept = {(r["id_a"], r["id_b"]) for r in out}
    assert ("a", "b") in kept  # borderline, exact d <= tau -> kept
    assert ("c", "d") not in kept  # borderline, exact d > tau -> dropped
    assert ("e", "f") in kept  # sure pair passes without content check


def test_no_borderline_short_circuit(fixture_data):
    _, content = fixture_data
    pairs = ray.data.from_arrow(
        pa.table(
            {
                "id_a": pa.array(["e"], pa.string()),
                "id_b": pa.array(["f"], pa.string()),
                "est_distance": pa.array([0.01], pa.float64()),
            },
            schema=PAIR_SCHEMA,
        )
    )
    out = verify_pairs(pairs, content, SIG, LSHConfig(), tau=TAU).take_all()
    assert [(r["id_a"], r["id_b"]) for r in out] == [("e", "f")]


@pytest.mark.parametrize("cap", [5000, 0])  # driver path / forced distributed path
def test_attach_pair_contents_drops_missing_ids_both_paths(fixture_data, cap):
    # ADVICE r2: the driver path used to raise a bare KeyError for a pair
    # endpoint absent from the content table, while the distributed path's
    # inner joins silently dropped the pair — semantics must not flip at
    # driver_cap.  Both paths now DROP such pairs.
    from lasvdedup_ray.stages.verify import attach_pair_contents

    _, content = fixture_data
    pairs = ray.data.from_arrow(
        pa.table(
            {
                "id_a": pa.array(["a", "ghost"], pa.string()),
                "id_b": pa.array(["b", "b"], pa.string()),
                "est_distance": pa.array([0.1, 0.1], pa.float64()),
            },
            schema=PAIR_SCHEMA,
        )
    )
    out = attach_pair_contents(
        pairs, content, num_partitions=4, driver_cap=cap
    ).take_all()
    assert {(r["id_a"], r["id_b"]) for r in out} == {("a", "b")}
    assert all("content_a" in r and "content_b" in r for r in out)
