"""Ordered-window operators Ray Data lacks natively: per-key rolling
aggregates and the as-of (most-recent-prior-event) join.

Both are expressed with the engine's standard ordered-partition shape
(the same one ``user_sessions`` uses): ONE hash-partition shuffle on the
key, then a fully vectorized within-partition pass — lexsort by
(key, ts) + numpy shifts/scans.  No global sort, no per-row Python, no
driver state; the partitioning assumption is that one key's rows fit a
partition (keys are hash-spread over ``WINDOW_PARTITIONS`` groups, and a
group holds many whole keys).  At 100 TB the shuffle is the one
unavoidable exchange; everything after it is linear scans.

Float determinism vs the SQL oracles: ``value`` is quantized to int64
e4 units BEFORE the window sum, so the rolling sums are exact integer
arithmetic on both engines (a windowed SUM(double) can differ in the
last bit between engines and flip the e4 rounding).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ..stages.exchange import hash_exchange
from ..sources.readers import read_parquet_clean

WINDOW_PARTITIONS = 64
ROLL_PRECEDING = 2  # window = current row + 2 preceding rows per user


def _add_pkey(t: pa.Table) -> pa.Table:
    pk = pc.cast(
        pc.bit_wise_and(t["user_id"], pa.scalar(WINDOW_PARTITIONS - 1)), pa.int32()
    )
    return t.append_column("pkey", pk)


def user_rolling_value(sf_dir: str) -> ray.data.Dataset:
    """Per-user rolling aggregate ordered by time: for every event, the
    sum / count / mean of ``value`` over the current and 2 preceding
    events of the same user (SQL ``ROWS BETWEEN 2 PRECEDING AND CURRENT
    ROW``).  Ray Data has no ordered-window operator; this composes one
    from hash-partition + in-partition lexsort + numpy shifted adds.

    roll_mean_e4 is round(roll_sum_e4 / roll_n) — integer inputs, one
    double division, half-away rounding — bit-identical to the oracle's
    ``round(SUM(v_e4) OVER w / COUNT(*) OVER w)``.
    """
    ds = read_parquet_clean(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts", "value"]
    )

    EMPTY = pa.schema(
        [
            ("event_id", pa.int64()),
            ("user_id", pa.int64()),
            ("roll_sum_e4", pa.int64()),
            ("roll_n", pa.int64()),
            ("roll_mean_e4", pa.int64()),
        ]
    )

    def rolling_partition(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return EMPTY.empty_table()
        uid = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        eid = t["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = (
            t["ts"]
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        v_e4 = (
            pc.round(
                pc.multiply(pc.cast(t["value"], pa.float64()), pa.scalar(1e4)),
                ndigits=0,
                round_mode="half_towards_infinity",
            )
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        order = np.lexsort((eid, ts, uid))
        uid, eid, v_e4 = uid[order], eid[order], v_e4[order]
        n = len(uid)
        # shifted adds, masked at user boundaries (window never crosses keys)
        same1 = np.zeros(n, dtype=bool)
        same1[1:] = uid[1:] == uid[:-1]
        same2 = np.zeros(n, dtype=bool)
        same2[2:] = uid[2:] == uid[:-2]
        s = v_e4.copy()
        s[1:] += np.where(same1[1:], v_e4[:-1], 0)
        s[2:] += np.where(same2[2:], v_e4[:-2], 0)
        cnt = 1 + same1.astype(np.int64) + same2.astype(np.int64)
        # np.round is half-even; DuckDB round() is half-away — s/cnt hits
        # an exact .5 whenever cnt == 2 and s is odd, so use the pyarrow
        # kernel with the DuckDB-matching mode
        mean_e4 = (
            pc.round(
                pc.divide(pa.array(s, pa.float64()), pa.array(cnt, pa.float64())),
                ndigits=0,
                round_mode="half_towards_infinity",
            )
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        return pa.table(
            {
                "event_id": pa.array(eid, pa.int64()),
                "user_id": pa.array(uid, pa.int64()),
                "roll_sum_e4": pa.array(s, pa.int64()),
                "roll_n": pa.array(cnt, pa.int64()),
                "roll_mean_e4": pa.array(mean_e4, pa.int64()),
            }
        )

    return (
        hash_exchange(
            ds.map_batches(_add_pkey, batch_format="pyarrow"),
            "pkey",
            WINDOW_PARTITIONS,
            lambda t: rolling_partition(t.drop_columns(["pkey"])),
        )
        .sort("event_id")
    )


def purchase_attribution(sf_dir: str) -> ray.data.Dataset:
    """As-of join (each 'purchase' event attributed to the same user's
    most recent STRICTLY-earlier 'view' event) — the classic operator
    missing from Ray Data, composed as: pruned+predicate-pushdown read of
    just the two event types, hash-partition by user, and a vectorized
    merge scan per partition (sort by (user, ts, kind) with purchases
    ordered before views at equal ts so strict ``view.ts < purchase.ts``
    holds, then a running last-view-index via ``np.maximum.accumulate``).
    Purchases with no prior view are dropped (ASOF inner-join semantics).

    Partitioning assumption: rows of one user are co-located by the
    ``user_id`` hash shuffle; the scan is O(rows) per partition.
    """
    import pyarrow.dataset as pads

    ds = read_parquet_clean(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "ts", "event_type"],
        filter=pads.field("event_type").isin(["purchase", "view"]),
    )

    EMPTY = pa.schema(
        [
            ("event_id", pa.int64()),
            ("user_id", pa.int64()),
            ("view_event_id", pa.int64()),
            ("us_since_view", pa.int64()),
        ]
    )

    def asof_partition(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return EMPTY.empty_table()
        uid = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        eid = t["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = (
            t["ts"]
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        is_view = pc.equal(t["event_type"], "view").to_numpy(zero_copy_only=False)
        # purchases (kind 0) before views (kind 1) at equal ts => a view at
        # the purchase's own timestamp is NOT visible (strict inequality)
        kind = is_view.astype(np.int8)
        order = np.lexsort((kind, ts, uid))
        uid, eid, ts, is_view = uid[order], eid[order], ts[order], is_view[order]
        n = len(uid)
        idx = np.arange(n, dtype=np.int64)
        last_view = np.maximum.accumulate(np.where(is_view, idx, -1))
        # invalidate carries across user boundaries: a carried index from a
        # previous user is < this user's first row index
        user_start = np.ones(n, dtype=bool)
        user_start[1:] = uid[1:] != uid[:-1]
        first_idx = idx[user_start][np.cumsum(user_start) - 1]
        sel = (~is_view) & (last_view >= first_idx)
        lv = last_view[sel]
        return pa.table(
            {
                "event_id": pa.array(eid[sel], pa.int64()),
                "user_id": pa.array(uid[sel], pa.int64()),
                "view_event_id": pa.array(eid[lv], pa.int64()),
                "us_since_view": pa.array(ts[sel] - ts[lv], pa.int64()),
            }
        )

    return (
        hash_exchange(
            ds.map_batches(_add_pkey, batch_format="pyarrow"),
            "pkey",
            WINDOW_PARTITIONS,
            lambda t: asof_partition(t.drop_columns(["pkey"])),
        )
        .sort("event_id")
    )


RANGE_JOIN_WINDOW_US = 3_600_000_000  # 1 hour


def purchase_click_window_join(sf_dir: str) -> ray.data.Dataset:
    """Banded range join (interval join): for each 'purchase' event, the
    count and e4-quantized value sum of the SAME user's 'click' events in
    the strict preceding hour (``p.ts - 1h <= c.ts < p.ts``).

    Scale shape: a range join is a shuffle-killer done naively (every pair
    within the band); here both sides hash-partition ONCE on ``user_id %
    P`` and the per-partition pass is two searchsorted probes per purchase
    against the user-run-local sorted click timeline plus an int64
    prefix-sum difference — O((n+m) log m) per partition, no pair
    materialization.  Click values are quantized to int64 BEFORE summing
    so the window sums are exact integers on both engines (a float
    prefix-sum difference could drift a half-ulp against the oracle's
    direct summation)."""
    import pyarrow.dataset as pads

    ds = read_parquet_clean(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "ts", "event_type", "value"],
        filter=pads.field("event_type").isin(["purchase", "click"]),
    )

    EMPTY = pa.schema(
        [
            ("event_id", pa.int64()),
            ("user_id", pa.int64()),
            ("n_clicks", pa.int64()),
            ("click_value_e4", pa.int64()),
        ]
    )

    def window_partition(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return EMPTY.empty_table()
        uid = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        eid = t["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = (
            t["ts"]
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        val = t["value"].to_numpy(zero_copy_only=False)
        v_e4 = np.where(
            val >= 0, np.floor(val * 1e4 + 0.5), np.ceil(val * 1e4 - 0.5)
        ).astype(np.int64)
        is_click = pc.equal(t["event_type"], "click").to_numpy(
            zero_copy_only=False
        )
        c = np.flatnonzero(is_click)
        p = np.flatnonzero(~is_click)
        cu, cts, cv = uid[c], ts[c], v_e4[c]
        pu, pts, peid = uid[p], ts[p], eid[p]

        def probe(keys: np.ndarray) -> tuple:
            """Exclusive running (count, value-sum) of clicks strictly
            before each probe key in the merged (user, key) order; probes
            sort BEFORE clicks at equal keys, so an equal-timestamp click
            is not counted — together the two probes give the half-open
            window [pts - W, pts)."""
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

        n_hi, v_hi = probe(pts)
        n_lo, v_lo = probe(pts - RANGE_JOIN_WINDOW_US)
        n_clicks = n_hi - n_lo
        sums = v_hi - v_lo
        return pa.table(
            {
                "event_id": pa.array(peid, pa.int64()),
                "user_id": pa.array(pu, pa.int64()),
                "n_clicks": pa.array(n_clicks, pa.int64()),
                "click_value_e4": pa.array(sums, pa.int64()),
            }
        )

    return (
        hash_exchange(
            ds.map_batches(_add_pkey, batch_format="pyarrow"),
            "pkey",
            WINDOW_PARTITIONS,
            lambda t: window_partition(t.drop_columns(["pkey"])),
        )
        .sort("event_id")
    )
