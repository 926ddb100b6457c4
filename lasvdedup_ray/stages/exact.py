"""Exact-duplicate fast path: hash-partition + per-group representative.

Exact dups are distance-0 pairs in the reference's model (below any
threshold ⇒ same cluster, ``sequence_grouping.py:51-53``).  Handling them
BEFORE signing means the expensive MinHash stage runs once per distinct
content — at 100 TB scale with heavy exact duplication this is the single
biggest saving in the pipeline.  The rep choice here is min(id): any member
works because identical content ⇒ identical signature; final ranking
happens in the classification stage over the whole cluster.

Execution shape: rows are hash-partitioned on ``pkey = crc32(sha_hex) % P``
and each partition is processed as ONE vectorized call (sort by (sha, id),
first-occurrence mask) — a per-sha ``groupby().map_groups`` would cost one
Python call per distinct content hash.
"""

from __future__ import annotations



import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from .lsh import PAIR_SCHEMA

NUM_PARTITIONS = 64


def _add_pkey(t: pa.Table) -> pa.Table:
    # any pure function of sha_hex co-locates each sha's rows; vectorized
    # 64-bit hash instead of a per-row crc32 loop
    import pandas as _pd

    keys = np.asarray(t["sha_hex"].to_pylist(), dtype=object)
    pk = (_pd.util.hash_array(keys, categorize=False) % NUM_PARTITIONS).astype(np.int32)
    return t.append_column("pkey", pa.array(pk, pa.int32()))


def _sha_sort(g: pa.Table):
    sha = np.asarray(g.column("sha_hex").to_pylist(), dtype=object)
    ids = np.asarray(g.column("id").to_pylist(), dtype=object)
    order = np.lexsort((ids, sha))
    first = np.ones(len(order), dtype=bool)
    sha_sorted = sha[order]
    first[1:] = sha_sorted[1:] != sha_sorted[:-1]
    return order, first


def exact_representatives(prepared: ray.data.Dataset) -> ray.data.Dataset:
    """One full row (incl. content) per distinct sha256 — the min(id) row.
    This is the one shuffle in the pipeline that moves content; everything
    downstream of the signer is slim (ids + signatures only)."""

    def keep_firsts(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return g.drop_columns(["pkey"])
        order, first = _sha_sort(g)
        take = pa.array(order[first], pa.int64())
        return g.take(take).drop_columns(["pkey"])

    from .exchange import hash_exchange

    return hash_exchange(
        prepared.map_batches(_add_pkey, batch_format="pyarrow"),
        "pkey",
        NUM_PARTITIONS,
        keep_firsts,
    )


FUSED_SCHEMA = pa.schema(
    [
        ("kind", pa.int8()),  # 0 = representative row, 1 = star edge row
        ("id", pa.string()),
        ("sha_hex", pa.string()),
        ("minhash", pa.large_binary()),
        ("simhash", pa.uint64()),
        ("id_a", pa.string()),
        ("id_b", pa.string()),
    ]
)


def exact_collapse(signed_slim: ray.data.Dataset) -> ray.data.Dataset:
    """ONE sha shuffle producing both the per-sha representative rows
    (kind=0: id, sha_hex, minhash, simhash) and the rep--member star edges
    (kind=1: id_a, id_b).  ``exact_representatives`` + ``exact_dup_edges``
    each shuffled the same keys separately — at the flagship's scale the
    second exchange was pure overhead.  Callers filter the (materialized)
    fused output by ``kind``."""

    def emit_fused(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return FUSED_SCHEMA.empty_table()
        g = g.drop_columns(["pkey"])
        order, first = _sha_sort(g)
        take = pa.array(order[first], pa.int64())
        reps = g.take(take)
        n_reps = reps.num_rows
        ids = np.asarray(g.column("id").to_pylist(), dtype=object)[order]
        group_idx = np.cumsum(first) - 1
        rep_positions = np.flatnonzero(first)
        reps_for_row = ids[rep_positions[group_idx]]
        members_mask = ~first
        n_edges = int(members_mask.sum())
        rep_part = pa.table(
            {
                "kind": pa.array(np.zeros(n_reps, dtype=np.int8), pa.int8()),
                "id": pc.cast(reps["id"], pa.string()),
                "sha_hex": pc.cast(reps["sha_hex"], pa.string()),
                "minhash": pc.cast(reps["minhash"], pa.large_binary()),
                "simhash": pc.cast(reps["simhash"], pa.uint64()),
                "id_a": pa.nulls(n_reps, pa.string()),
                "id_b": pa.nulls(n_reps, pa.string()),
            },
            schema=FUSED_SCHEMA,
        )
        if n_edges == 0:
            return rep_part
        edge_part = pa.table(
            {
                "kind": pa.array(np.ones(n_edges, dtype=np.int8), pa.int8()),
                "id": pa.nulls(n_edges, pa.string()),
                "sha_hex": pa.nulls(n_edges, pa.string()),
                "minhash": pa.nulls(n_edges, pa.large_binary()),
                "simhash": pa.nulls(n_edges, pa.uint64()),
                "id_a": pa.array(list(reps_for_row[members_mask]), pa.string()),
                "id_b": pa.array(list(ids[members_mask]), pa.string()),
            },
            schema=FUSED_SCHEMA,
        )
        return pa.concat_tables([rep_part, edge_part])

    from .exchange import hash_exchange

    return hash_exchange(
        signed_slim.map_batches(_add_pkey, batch_format="pyarrow"),
        "pkey",
        NUM_PARTITIONS,
        emit_fused,
    )


def fused_reps(fused: ray.data.Dataset) -> ray.data.Dataset:
    """kind=0 slice of ``exact_collapse`` output -> (id, sha_hex, minhash,
    simhash)."""
    return fused.map_batches(
        lambda t: t.filter(pc.equal(t["kind"], 0)).select(
            ["id", "sha_hex", "minhash", "simhash"]
        )
        if "kind" in t.column_names
        else pa.schema(
            [
                ("id", pa.string()),
                ("sha_hex", pa.string()),
                ("minhash", pa.large_binary()),
                ("simhash", pa.uint64()),
            ]
        ).empty_table(),
        batch_format="pyarrow",
    )


def fused_edges(fused: ray.data.Dataset) -> ray.data.Dataset:
    """kind=1 slice of ``exact_collapse`` output -> zero-distance star
    edges in PAIR_SCHEMA."""

    def to_pairs(t: pa.Table) -> pa.Table:
        if "kind" not in t.column_names:
            return PAIR_SCHEMA.empty_table()
        e = t.filter(pc.equal(t["kind"], 1))
        return pa.table(
            {
                "id_a": pc.cast(e["id_a"], pa.string()),
                "id_b": pc.cast(e["id_b"], pa.string()),
                "est_distance": pa.array(
                    np.zeros(e.num_rows, dtype=np.float64), pa.float64()
                ),
            },
            schema=PAIR_SCHEMA,
        )

    return fused.map_batches(to_pairs, batch_format="pyarrow")


def exact_collapse_driver(signed_slim: ray.data.Dataset):
    """Driver-side sha collapse for small inputs (gated by
    ``ExecutionConfig.exact_driver_cap``): streams only (id, sha_hex) to the
    driver, lexsorts once, and returns

        (rep_ids, edges_table)

    where ``rep_ids`` is the min(id)-per-distinct-sha id array (object
    dtype, in sha-sorted order) and ``edges_table`` is the rep--member
    zero-distance star edge list in PAIR_SCHEMA — the exact output the
    ``exact_collapse`` exchange produces, without its all-to-all fixed cost
    (~0.8 s on a 32-CPU box, pure overhead at <100k rows).  The caller
    filters the signed dataset by id membership to recover the rep rows."""
    id_parts, sha_parts = [], []
    for b in signed_slim.select_columns(["id", "sha_hex"]).iter_batches(
        batch_size=1 << 16, batch_format="pyarrow"
    ):
        id_parts.append(np.asarray(b.column("id").to_pylist(), dtype=object))
        sha_parts.append(np.asarray(b.column("sha_hex").to_pylist(), dtype=object))
    if not id_parts:
        return np.empty(0, dtype=object), PAIR_SCHEMA.empty_table()
    ids = np.concatenate(id_parts)
    sha = np.concatenate(sha_parts)
    order = np.lexsort((ids, sha))
    ids, sha = ids[order], sha[order]
    first = np.ones(len(ids), dtype=bool)
    first[1:] = sha[1:] != sha[:-1]
    rep_ids = ids[first]
    group_idx = np.cumsum(first) - 1
    reps_for_row = rep_ids[group_idx]
    members = ~first
    n_edges = int(members.sum())
    edges = pa.table(
        {
            "id_a": pa.array(list(reps_for_row[members]), pa.string()),
            "id_b": pa.array(list(ids[members]), pa.string()),
            "est_distance": pa.array(np.zeros(n_edges), pa.float64()),
        },
        schema=PAIR_SCHEMA,
    )
    return rep_ids, edges


def exact_dup_edges(prepared_slim: ray.data.Dataset) -> ray.data.Dataset:
    """(sha_hex, id) -> star edges rep--member with distance 0 (slim
    shuffle: only ids + hashes move)."""

    def emit_edges(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return PAIR_SCHEMA.empty_table()
        order, first = _sha_sort(g)
        ids = np.asarray(g.column("id").to_pylist(), dtype=object)[order]
        # rep (first of group) repeated for each subsequent member
        group_idx = np.cumsum(first) - 1
        rep_positions = np.flatnonzero(first)
        reps_for_row = ids[rep_positions[group_idx]]
        members_mask = ~first
        if not members_mask.any():
            return PAIR_SCHEMA.empty_table()
        return pa.table(
            {
                "id_a": pa.array(list(reps_for_row[members_mask]), pa.string()),
                "id_b": pa.array(list(ids[members_mask]), pa.string()),
                "est_distance": pa.array(
                    np.zeros(int(members_mask.sum())), pa.float64()
                ),
            },
            schema=PAIR_SCHEMA,
        )

    from .exchange import hash_exchange

    return hash_exchange(
        prepared_slim.select_columns(["sha_hex", "id"]).map_batches(
            _add_pkey, batch_format="pyarrow"
        ),
        "pkey",
        NUM_PARTITIONS,
        emit_edges,
    )
