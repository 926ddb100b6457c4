"""Relational operator coverage over the driver's TPC-H-ish tables.

Each query here is a Ray-Data-first pipeline with an exactly-matching ANSI
SQL oracle in ``__ray_entry__.oracle_sql`` (same column names, same
quantization, deterministic tie-breaks).  They exercise the engine surface
SURVEY §2 maps: pruned parquet reads, vectorized batch transforms, partial
pre-aggregation before groupby shuffles, broadcast joins for small sides,
hash joins, sorts, top-k, and windowed (tumbling) aggregates.

Float determinism: float aggregates are QUANTIZED to int64 (``*_e4`` =
value * 10^4 rounded) in BOTH the Ray pipeline and the SQL oracle.  Rounded
doubles from two engines can differ in the last bit (different summation
orders + different round() kernels), which flips row ordering and value
hashes; integer quantization makes the comparison exact.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data.aggregate import Count, Max, Mean, Min, Sum


def quantize(t: pa.Table, cols, scale: int = 10_000, suffix: str = "_e4") -> pa.Table:
    """Replace float columns with int64 ``round(value * scale)`` columns
    named ``<col><suffix>`` (rounding half away from zero, = DuckDB round)."""
    for c in cols:
        i = t.schema.get_field_index(c)
        q = pc.round(
            pc.multiply(pc.cast(t[c], pa.float64()), pa.scalar(float(scale))),
            ndigits=0,
            round_mode="half_towards_infinity",
        )
        t = t.remove_column(i)
        t = t.add_column(i, c + suffix, pc.cast(q, pa.int64()))
    return t


def q1_pricing_summary(sf_dir: str) -> ray.data.Dataset:
    """TPC-H Q1 shape: filtered scan -> grouped aggregate.
    Columns pruned at the read; revenue derived vectorized per batch."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=[
            "l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
            "l_discount", "l_shipdate",
        ],
    )
    cutoff = pa.scalar(pd.Timestamp("1998-09-02"), pa.timestamp("us"))

    def derive(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less_equal(t["l_shipdate"], cutoff))
        disc_price = pc.multiply(
            t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"])
        )
        return t.append_column("disc_price", disc_price)

    agg = (
        ds.map_batches(derive, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("l_quantity", alias_name="sum_qty"),
            Sum("l_extendedprice", alias_name="sum_base_price"),
            Sum("disc_price", alias_name="sum_disc_price"),
            Mean("l_quantity", alias_name="avg_qty"),
            Count(alias_name="count_order"),
        )
    )
    return agg.map_batches(
        lambda t: quantize(t, ["sum_qty", "sum_base_price", "sum_disc_price", "avg_qty"]),
        batch_format="pyarrow",
    ).sort(["l_returnflag", "l_linestatus"])


def q3_top_orders(sf_dir: str) -> ray.data.Dataset:
    """Join + aggregate + deterministic top-10 (revenue DESC, o_orderkey ASC)."""
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
    )

    def part_rev(t: pa.Table) -> pa.Table:
        rev = pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
        return pa.table({"l_orderkey": t["l_orderkey"], "rev": rev})

    rev_by_order = (
        li.map_batches(part_rev, batch_format="pyarrow")
        .groupby("l_orderkey")
        .aggregate(Sum("rev", alias_name="revenue"))
    )
    # orders is a many-to-one lookup side — broadcast it (ray.put once)
    # instead of hash-joining the aggregated facts
    import pyarrow.parquet as pq

    ot = pq.read_table(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
    )
    omap = {
        int(k): (int(d) // 1_000_000, p)
        for k, d, p in zip(
            ot["o_orderkey"].to_pylist(),
            ot["o_orderdate"].cast(pa.int64()).to_pylist(),
            ot["o_orderpriority"].to_pylist(),
        )
    }
    oref = ray.put(omap)

    def attach_order(t: pa.Table) -> pa.Table:
        if oref not in _Q5_CACHE:
            _Q5_CACHE.clear()
            _Q5_CACHE[oref] = ray.get(oref)
        om = _Q5_CACHE[oref]
        keys = t["l_orderkey"].to_pylist()
        hits = [om.get(int(k)) for k in keys]
        mask = pa.array([h is not None for h in hits])
        out = pa.table(
            {
                "o_orderkey": t["l_orderkey"],
                "revenue": t["revenue"],
                "o_orderdate_s": pa.array(
                    [h[0] if h else 0 for h in hits], pa.int64()
                ),
                "o_orderpriority": pa.array(
                    [h[1] if h else "" for h in hits], pa.string()
                ),
            }
        ).filter(mask)
        return quantize(out, ["revenue"])

    out = rev_by_order.map_batches(attach_order, batch_format="pyarrow")
    return out.sort(["revenue_e4", "o_orderkey"], descending=[True, False]).limit(10)


_Q5_CACHE: dict = {}


def q5_nation_revenue(sf_dir: str) -> ray.data.Dataset:
    """Revenue by nation.  All three dimension hops (orderkey -> custkey ->
    nationkey -> name) are many-to-one LOOKUPS, so the fact scan maps
    straight to nation via broadcast numpy lookup arrays (ray.put once,
    worker-cached) with a per-batch combiner — the only shuffle left is
    the 25-row final groupby.  No hash join touches lineitem."""
    import pyarrow.parquet as pq

    orders_t = pq.read_table(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    )
    cust_t = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    nation_t = pq.read_table(f"{sf_dir}/nation.parquet")
    # dense lookup arrays indexed by key (keys are small positive ints)
    ok = np.asarray(orders_t["o_orderkey"], dtype=np.int64)
    oc = np.asarray(orders_t["o_custkey"], dtype=np.int64)
    order2cust = np.full(ok.max() + 1, -1, dtype=np.int64)
    order2cust[ok] = oc
    ck = np.asarray(cust_t["c_custkey"], dtype=np.int64)
    cn = np.asarray(cust_t["c_nationkey"], dtype=np.int64)
    cust2nat = np.full(ck.max() + 1, -1, dtype=np.int64)
    cust2nat[ck] = cn
    nk = np.asarray(nation_t["n_nationkey"], dtype=np.int64)
    names = nation_t["n_name"].to_pylist()
    nat_names = [""] * (int(nk.max()) + 1)
    for k, nm in zip(nk, names):
        nat_names[int(k)] = nm
    ref = ray.put((order2cust, cust2nat, nat_names))

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
    )

    def partial(t: pa.Table) -> pa.Table:
        if ref not in _Q5_CACHE:
            _Q5_CACHE.clear()
            _Q5_CACHE[ref] = ray.get(ref)
        o2c, c2n, nn = _Q5_CACHE[ref]
        okeys = t["l_orderkey"].to_numpy(zero_copy_only=False)
        rev = (
            t["l_extendedprice"].to_numpy(zero_copy_only=False)
            * (1.0 - t["l_discount"].to_numpy(zero_copy_only=False))
        )
        nat = c2n[o2c[okeys]]  # inner-join semantics: -1 = missing
        ok_mask = nat >= 0
        sums = np.bincount(nat[ok_mask], weights=rev[ok_mask], minlength=len(nn))
        hit = np.flatnonzero(sums != 0)
        return pa.table(
            {
                "n_name": pa.array([nn[i] for i in hit], pa.string()),
                "prev": pa.array(sums[hit], pa.float64()),
            }
        )

    agg = (
        li.map_batches(partial, batch_format="pyarrow")
        .groupby("n_name")
        .aggregate(Sum("prev", alias_name="revenue"))
    )
    return agg.map_batches(
        lambda t: quantize(t, ["revenue"]), batch_format="pyarrow"
    ).sort("n_name")


def events_by_type(sf_dir: str) -> ray.data.Dataset:
    """Partial pre-aggregation inside map_batches, then a tiny groupby —
    the combiner pattern for scale (SURVEY §4)."""
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by("event_type").aggregate([("value", "sum"), ("value", "count")])
        return pa.table(
            {
                "event_type": g["event_type"],
                "psum": g["value_sum"],
                "pcount": g["value_count"],
            }
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Sum("psum", alias_name="sum_value"), Sum("pcount", alias_name="n_events"))
    )
    return agg.map_batches(
        lambda t: quantize(
            t.append_column(
                "avg_value", pc.divide(t["sum_value"], pc.cast(t["n_events"], pa.float64()))
            ),
            ["sum_value", "avg_value"],
        ),
        batch_format="pyarrow",
    ).sort("event_type")


def events_hourly(sf_dir: str) -> ray.data.Dataset:
    """Tumbling 1h window per event_type: epoch-floor key + groupby
    (streaming-shaped workload as a batch window aggregate).  Window start
    is emitted as integer epoch-seconds for engine-exact comparison."""
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"])

    def win(t: pa.Table) -> pa.Table:
        epoch = pc.cast(t["ts"], pa.int64())  # microseconds
        hour_s = pc.multiply(pc.divide(epoch, 3_600_000_000), 3600)
        return pa.table(
            {
                "event_type": t["event_type"],
                "window_start_s": hour_s,
                "value": t["value"],
            }
        )

    agg = (
        ds.map_batches(win, batch_format="pyarrow")
        .groupby(["event_type", "window_start_s"])
        .aggregate(Count(alias_name="n_events"), Sum("value", alias_name="sum_value"))
    )
    return agg.map_batches(
        lambda t: quantize(t, ["sum_value"]), batch_format="pyarrow"
    ).sort(["event_type", "window_start_s"])


def top_users_by_value(sf_dir: str) -> ray.data.Dataset:
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "value"])
    agg = ds.groupby("user_id").aggregate(
        Sum("value", alias_name="total_value"), Count(alias_name="n_events")
    )
    out = agg.map_batches(lambda t: quantize(t, ["total_value"]), batch_format="pyarrow")
    return out.sort(["total_value_e4", "user_id"], descending=[True, False]).limit(20)


def brand_revenue(sf_dir: str) -> ray.data.Dataset:
    """Fact-to-dimension broadcast join: part (small) shipped once via
    ray.put, looked up per batch — no shuffle of lineitem."""
    part = ray.data.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand"]
    ).to_pandas()
    brand_map = dict(zip(part["p_partkey"].astype(int), part["p_brand"]))
    ref = ray.put(brand_map)

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_extendedprice", "l_discount"],
    )

    def to_brand(t: pa.Table) -> pa.Table:
        bm = ray.get(ref)
        keys = t["l_partkey"].to_pylist()
        brands = [bm.get(int(k)) for k in keys]
        rev = pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
        out = pa.table({"p_brand": pa.array(brands, pa.string()), "rev": rev})
        return out.filter(pc.is_valid(out["p_brand"]))  # inner-join semantics

    agg = (
        li.map_batches(to_brand, batch_format="pyarrow")
        .groupby("p_brand")
        .aggregate(Sum("rev", alias_name="revenue"), Count(alias_name="n_items"))
    )
    return agg.map_batches(
        lambda t: quantize(t, ["revenue"]), batch_format="pyarrow"
    ).sort("p_brand")


SESSION_GAP_S = 1800  # 30 min


def user_sessions(sf_dir: str) -> ray.data.Dataset:
    """Gap-based sessionization (streaming-shaped workload as a batch
    window op): events partitioned by user, sorted by ts within the group,
    a >30 min gap starts a new session.  Ordering assumption: per-user
    event order is established INSIDE the group sort — no global order is
    relied on (Ray block order is nondeterministic)."""
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("ts")
        ts_s = g["ts"].astype("int64") // 1_000_000
        new_session = (ts_s.diff().isna()) | (ts_s.diff() > SESSION_GAP_S)
        sess_id = new_session.cumsum()
        sizes = sess_id.value_counts()
        return pd.DataFrame(
            {
                "user_id": [int(g["user_id"].iloc[0])],
                "n_sessions": [int(sess_id.max())],
                "n_events": [len(g)],
                "max_session_events": [int(sizes.max())],
            }
        )

    return (
        ds.groupby("user_id")
        .map_groups(sessions, batch_format="pandas")
        .sort("user_id")
    )


def supplier_balance_stats(sf_dir: str) -> ray.data.Dataset:
    """Min/Max/Mean aggregate over a dimension table grouped by nation."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/supplier.parquet", columns=["s_nationkey", "s_acctbal"]
    )
    agg = ds.groupby("s_nationkey").aggregate(
        Min("s_acctbal", alias_name="min_bal"),
        Max("s_acctbal", alias_name="max_bal"),
        Mean("s_acctbal", alias_name="avg_bal"),
        Count(alias_name="n_suppliers"),
    )
    out = agg.map_batches(
        lambda t: quantize(t, ["min_bal", "max_bal", "avg_bal"]), batch_format="pyarrow"
    )
    return out.map_batches(
        lambda t: t.set_column(
            t.schema.get_field_index("s_nationkey"),
            "s_nationkey",
            pc.cast(t["s_nationkey"], pa.int64()),
        ),
        batch_format="pyarrow",
    ).sort("s_nationkey")
