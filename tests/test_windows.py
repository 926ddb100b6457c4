"""Ordered-window operators (rolling aggregate + as-of join) pinned by
hand-computable synthetic fixtures and a pandas mirror, plus the
decontamination operator against a brute-force set oracle."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lasvdedup_ray.pipelines.windows import purchase_attribution, user_rolling_value


@pytest.fixture(scope="module")
def events_dir(tmp_path_factory):
    """Tiny events table with the window edge cases: single-event users,
    a purchase before any view, a view at the exact purchase timestamp
    (must NOT match — strict inequality), multiple views before one
    purchase (latest wins)."""
    d = tmp_path_factory.mktemp("winevents")
    base = np.datetime64("2024-01-01T00:00:00", "us")
    s = np.timedelta64(1_000_000, "us")  # 1 second

    rows = [
        # user 1: view(10) view(20) purchase(30) -> matches view@20
        (1, 1, base + 10 * s, "view", 1.0),
        (2, 1, base + 20 * s, "view", 2.0),
        (3, 1, base + 30 * s, "purchase", 3.0),
        # user 2: purchase first (no prior view -> dropped), then view,
        # then purchase at the SAME ts as a later view (strict: the
        # equal-ts view must not match; the earlier one does)
        (4, 2, base + 5 * s, "purchase", 1.5),
        (5, 2, base + 6 * s, "view", 2.5),
        (6, 2, base + 9 * s, "view", 0.5),
        (7, 2, base + 9 * s, "purchase", 4.5),
        # user 3: single event
        (8, 3, base + 1 * s, "purchase", 9.0),
    ]
    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    pq.write_table(t, str(d / "events.parquet"))
    return str(d)


def test_rolling_value_fixture(events_dir):
    out = user_rolling_value(events_dir).to_pandas()
    got = {
        int(r.event_id): (int(r.roll_sum_e4), int(r.roll_n), int(r.roll_mean_e4))
        for r in out.itertuples()
    }
    assert got == {
        1: (10000, 1, 10000),
        2: (30000, 2, 15000),
        3: (60000, 3, 20000),
        4: (15000, 1, 15000),
        5: (40000, 2, 20000),
        # user 2 events sorted by ts: e4(5s) e5(6s) e6(9s,view) e7(9s,purchase)
        # window rows are 3 most recent by ts regardless of type; at equal
        # ts the event_id tie-break orders e6 before e7
        6: (45000, 3, 15000),
        7: (75000, 3, 25000),
        8: (90000, 1, 90000),
    }


def test_rolling_value_matches_pandas_mirror(events_dir):
    out = user_rolling_value(events_dir).to_pandas()
    ev = pq.read_table(f"{events_dir}/events.parquet").to_pandas()
    ev["v_e4"] = (ev["value"] * 1e4).round().astype("int64")
    ev = ev.sort_values(["user_id", "ts", "event_id"])
    g = ev.groupby("user_id")["v_e4"]
    ev["roll_sum_e4"] = g.transform(lambda s: s.rolling(3, min_periods=1).sum()).astype(
        "int64"
    )
    ev["roll_n"] = g.transform(lambda s: s.rolling(3, min_periods=1).count()).astype(
        "int64"
    )
    mirror = ev.sort_values("event_id").reset_index(drop=True)
    got = out.sort_values("event_id").reset_index(drop=True)
    assert list(got["roll_sum_e4"]) == list(mirror["roll_sum_e4"])
    assert list(got["roll_n"]) == list(mirror["roll_n"])


def test_purchase_attribution_fixture(events_dir):
    out = purchase_attribution(events_dir).to_pandas()
    got = {
        int(r.event_id): (int(r.view_event_id), int(r.us_since_view))
        for r in out.itertuples()
    }
    # e4 has no prior view (dropped); e7's equal-ts view e6 is excluded by
    # the strict inequality, so e5 (3 s earlier) wins; e8's user has no views
    assert got == {
        3: (2, 10_000_000),
        7: (5, 3_000_000),
    }


def test_windows_against_duckdb_at_sf0001():
    """Both window operators must match the registered DuckDB oracle SQL
    on the driver's real testdata (same comparison the driver runs)."""
    import os

    import duckdb

    sf_dir = "/root/testdata/sf0.001"
    if not os.path.isdir(sf_dir):
        pytest.skip("driver testdata not present")
    import __ray_entry__ as entry_mod

    oracles = entry_mod.oracle_sql()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'"
    )
    for name, fn in (
        ("user_rolling_value", user_rolling_value),
        ("purchase_attribution", purchase_attribution),
    ):
        got = fn(sf_dir).to_pandas()
        exp = con.sql(oracles[name]).df()
        got = got[sorted(got.columns)].sort_values(sorted(got.columns)).reset_index(
            drop=True
        )
        exp = exp[sorted(exp.columns)].sort_values(sorted(exp.columns)).reset_index(
            drop=True
        )
        pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_decontam_overlap_brute_force():
    """decontam_overlap equals a brute-force per-doc distinct-shingle
    intersection against the benchmark slice."""
    import os

    from lasvdedup_ray.pipelines.textops import (
        DECONTAM_BENCH_DIVISOR,
        SHINGLE_K,
        decontam_overlap,
    )

    sf_dir = "/root/testdata/sf0.001"
    if not os.path.isdir(sf_dir):
        pytest.skip("driver testdata not present")
    docs = pq.read_table(f"{sf_dir}/documents.parquet").to_pandas()
    cut = len(docs) // DECONTAM_BENCH_DIVISOR
    k = SHINGLE_K

    def grams(txt):
        return (
            {txt} if len(txt) < k else {txt[i : i + k] for i in range(len(txt) - k + 1)}
        )

    bench = set()
    for t in docs[docs["doc_id"] < cut]["text"]:
        bench |= grams(t)
    expected = {}
    for did, t in zip(docs["doc_id"], docs["text"]):
        if did < cut:
            continue
        n = len(grams(t) & bench)
        if n:
            expected[int(did)] = n
    out = decontam_overlap(sf_dir).to_pandas()
    got = dict(zip(out["doc_id"].astype(int), out["n_overlap"].astype(int)))
    assert got == expected


def test_purchase_click_window_join_boundaries(ray_session, tmp_path):
    """Half-open window [p.ts - 1h, p.ts): a click exactly 1h before IS
    counted, a click at the purchase's own timestamp is NOT, and clicks
    from other users never leak in."""
    from lasvdedup_ray.pipelines.windows import purchase_click_window_join

    base = np.datetime64("2024-01-01T12:00:00", "us")
    H = np.timedelta64(3600_000_000, "us")
    s = np.timedelta64(1_000_000, "us")
    rows = [
        # user 1: purchase at base; clicks at -1h (in), -30m (in),
        # -1h-1s (out), 0 (out, equal ts)
        (1, 1, base - H, "click", 1.0),
        (2, 1, base - H - s, "click", 100.0),
        (3, 1, base - 1800 * s, "click", 2.25),
        (4, 1, base, "click", 1000.0),
        (5, 1, base, "purchase", 5.0),
        # user 2: same timestamps, must not mix with user 1
        (6, 2, base - 10 * s, "click", 7.5),
        (7, 2, base, "purchase", 1.0),
        # user 3: purchase with no clicks at all
        (8, 3, base, "purchase", 2.0),
    ]
    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
        }
    )
    d = tmp_path / "ev"
    d.mkdir()
    pq.write_table(t, str(d / "events.parquet"))
    out = purchase_click_window_join(str(d)).to_pandas()
    got = {r.event_id: (r.n_clicks, r.click_value_e4) for r in out.itertuples()}
    assert got == {
        5: (2, 32500),   # 1.0 + 2.25 -> 3.25 e4
        7: (1, 75000),
        8: (0, 0),
    }
