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

import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from .lsh import PAIR_SCHEMA

NUM_PARTITIONS = 64


def _add_pkey(t: pa.Table) -> pa.Table:
    keys = t["sha_hex"].to_pylist()
    pk = np.fromiter(
        (zlib.crc32(k.encode()) % NUM_PARTITIONS for k in keys),
        dtype=np.int32,
        count=len(keys),
    )
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

    return (
        prepared.map_batches(_add_pkey, batch_format="pyarrow")
        .groupby("pkey")
        .map_groups(keep_firsts, batch_format="pyarrow")
    )


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

    return (
        prepared_slim.select_columns(["sha_hex", "id"])
        .map_batches(_add_pkey, batch_format="pyarrow")
        .groupby("pkey")
        .map_groups(emit_edges, batch_format="pyarrow")
    )
