"""hash_exchange (stages/exchange.py): the raw-Ray pkey co-location used
in place of sort-based groupby(pkey).map_groups across the flagship.

Contract under test: every row with the same pkey reaches exactly ONE
reduce call, reducers see whole groups (possibly several pkeys' rows
never mix — one reduce per pkey), and results match the groupby path."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from lasvdedup_ray.stages.exchange import hash_exchange


def _mk(n_rows: int, n_parts: int, n_blocks: int = 5) -> rd.Dataset:
    t = pa.table(
        {
            "pkey": pa.array((np.arange(n_rows) * 7919) % n_parts, pa.int32()),
            "v": pa.array(np.arange(n_rows), pa.int64()),
        }
    )
    return rd.from_arrow(t).repartition(n_blocks)


def _make_summarize():
    """Factory returning a fully self-contained closure: cloudpickle ships
    closures (and their imports-inside) by value, while test-module-level
    functions pickle by reference and Ray workers cannot import tests."""

    def _summarize(g):
        import numpy as _np
        import pyarrow as _pa

        if g.num_rows == 0:
            return _pa.table(
                {
                    "pkey": _pa.array([], _pa.int32()),
                    "n": _pa.array([], _pa.int64()),
                    "vsum": _pa.array([], _pa.int64()),
                }
            )
        pk = g["pkey"].to_numpy(zero_copy_only=False)
        v = g["v"].to_numpy(zero_copy_only=False)
        keys = _np.unique(pk)
        return _pa.table(
            {
                "pkey": _pa.array(keys, _pa.int32()),
                "n": _pa.array([int((pk == k).sum()) for k in keys], _pa.int64()),
                "vsum": _pa.array([int(v[pk == k].sum()) for k in keys], _pa.int64()),
            }
        )

    return _summarize


@pytest.mark.parametrize("n_parts", [1, 8, 12])  # incl. non-power-of-two
def test_matches_groupby(ray_session, n_parts):
    ds = _mk(1000, n_parts)
    summarize = _make_summarize()
    ours = hash_exchange(ds, "pkey", n_parts, summarize).to_pandas()
    ref = (
        ds.groupby("pkey")
        .map_groups(summarize, batch_format="pyarrow")
        .to_pandas()
    )
    ours = ours.sort_values("pkey").reset_index(drop=True)
    ref = ref.sort_values("pkey").reset_index(drop=True)
    assert ours.equals(ref)


def test_one_reduce_call_per_pkey(ray_session):
    """Each pkey's rows arrive complete in a single reduce invocation."""
    n_parts = 6
    ds = _mk(600, n_parts)

    def whole_group(g):
        import numpy as _np
        import pyarrow as _pa

        pk = g["pkey"].to_numpy(zero_copy_only=False)
        # every pkey present must be complete: 600 rows spread over
        # (i*7919)%6 — count per key is exactly 100
        keys, counts = _np.unique(pk, return_counts=True)
        assert all(c == 100 for c in counts), (keys, counts)
        return _pa.table({"n_keys": _pa.array([len(keys)], _pa.int64())})

    out = hash_exchange(ds, "pkey", n_parts, whole_group).to_pandas()
    assert int(out["n_keys"].sum()) == n_parts


def test_empty_upstream_blocks(ray_session):
    """Partitions with no rows are skipped entirely; an all-empty upstream
    with empty_schema yields a typed empty result."""
    t = pa.table(
        {
            "pkey": pa.array([0, 0, 0], pa.int32()),
            "v": pa.array([1, 2, 3], pa.int64()),
        }
    )
    ds = rd.from_arrow(t)

    def fn(g):
        import pyarrow as _pa

        assert g.schema.names == ["pkey", "v"]
        return _pa.table({"n": _pa.array([g.num_rows], _pa.int64())})

    out = hash_exchange(ds, "pkey", 4, fn).to_pandas()
    # empty partitions are SKIPPED (groupby semantics: a reduce fn is never
    # invoked on an empty group)
    assert sorted(out["n"]) == [3]


def test_all_empty_with_schema(ray_session):
    t = pa.table(
        {"pkey": pa.array([], pa.int32()), "v": pa.array([], pa.int64())}
    )
    ds = rd.from_arrow(t)
    out_schema = pa.schema([("n", pa.int64())])

    def fn(g):
        raise AssertionError("must never be called on empty partitions")

    out = hash_exchange(ds, "pkey", 4, fn, empty_schema=out_schema)
    # NOTE: to_pandas drops 0-row schemas in Ray 2.49; assert on the
    # dataset schema + count instead
    assert out.count() == 0
    assert out.schema().names == ["n"]


def test_out_of_range_pkey_raises(ray_session):
    # groupby(pkey) grouped any key value; hash_exchange's contract is
    # pkey in [0, P) — a key outside that range must FAIL LOUDLY rather
    # than silently dropping the row from every partition slice
    t = pa.table(
        {
            "pkey": pa.array([0, 1, 7], pa.int32()),  # 7 >= P=4
            "v": pa.array([1, 2, 3], pa.int64()),
        }
    )
    ds = rd.from_arrow(t)

    def fn(g):
        return g

    with pytest.raises(Exception, match="pkey out of range"):
        hash_exchange(ds, "pkey", 4, fn).materialize()


def test_grouped_sum_exchange_matches_groupby(ray_session):
    from lasvdedup_ray.stages.exchange import grouped_sum_exchange

    rng = np.random.default_rng(5)
    n = 4000
    t = pa.table(
        {
            "k1": pa.array(rng.choice(["a", "b", "c"], n).tolist(), pa.string()),
            "k2": pa.array(rng.choice(["x", "y"], n).tolist(), pa.string()),
            "v": pa.array(rng.standard_normal(n), pa.float64()),
            "cnt": pa.array(np.ones(n, np.int64), pa.int64()),
        }
    )
    ds = rd.from_arrow(t).repartition(7)
    # map-side combiner, then the exchange
    def combine(b):
        import pyarrow as _pa

        g = b.group_by(["k1", "k2"]).aggregate([("v", "sum"), ("cnt", "sum")])
        return _pa.table(
            {"k1": g["k1"], "k2": g["k2"], "v": g["v_sum"], "cnt": g["cnt_sum"]}
        )

    out = (
        grouped_sum_exchange(
            ds.map_batches(combine, batch_format="pyarrow"),
            keys=["k1", "k2"],
            sum_cols=["v"],
            count_col="cnt",
        )
        .to_pandas()
        .sort_values(["k1", "k2"])
        .reset_index(drop=True)
    )
    ref = (
        t.to_pandas()
        .groupby(["k1", "k2"], as_index=False)
        .agg(v=("v", "sum"), cnt=("cnt", "sum"))
        .sort_values(["k1", "k2"])
        .reset_index(drop=True)
    )
    assert out["cnt"].tolist() == ref["cnt"].tolist()
    assert np.allclose(out["v"].to_numpy(), ref["v"].to_numpy())


def test_grouped_sum_exchange_empty_input(ray_session):
    from lasvdedup_ray.stages.exchange import grouped_sum_exchange

    t = pa.table(
        {"k": pa.array([], pa.string()), "v": pa.array([], pa.float64())}
    )
    schema = pa.schema([("k", pa.string()), ("v", pa.float64())])
    out = grouped_sum_exchange(
        rd.from_arrow(t), keys=["k"], sum_cols=["v"], empty_schema=schema
    )
    assert out.count() == 0
    assert out.schema().names == ["k", "v"]


def test_missing_pkey_column_raises(ray_session):
    # a NON-empty block without the pkey column must fail loudly: its rows
    # would otherwise reach no reducer and silently vanish
    t = pa.table({"v": pa.array([1, 2, 3], pa.int64())})
    ds = rd.from_arrow(t)

    def fn(g):
        return g

    with pytest.raises(Exception, match="missing pkey column"):
        hash_exchange(ds, "pkey", 4, fn).materialize()


def test_grouped_sum_exchange_null_keys(ray_session):
    """Null group-key values form their own group (parity with the Ray
    groupby().aggregate() this path replaces) instead of crashing the
    key-hash join."""
    from lasvdedup_ray.stages.exchange import grouped_sum_exchange

    t = pa.table(
        {
            "k": pa.array(["a", None, "a", None, "b"], pa.string()),
            "v": pa.array([1.0, 2.0, 3.0, 4.0, 5.0], pa.float64()),
        }
    )
    out = (
        grouped_sum_exchange(rd.from_arrow(t), keys=["k"], sum_cols=["v"])
        .to_pandas()
        .sort_values("k", na_position="last")
        .reset_index(drop=True)
    )
    assert len(out) == 3
    assert out["v"].tolist()[:2] == [4.0, 5.0]  # a=4, b=5
    assert out["v"].iloc[2] == 6.0 and out["k"].isna().iloc[2]
