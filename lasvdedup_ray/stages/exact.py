"""Exact-duplicate fast path: hash-partition + per-group representative.

Exact dups are distance-0 pairs in the reference's model (below any
threshold ⇒ same cluster, ``sequence_grouping.py:51-53``).  Handling them
BEFORE signing means the expensive MinHash stage runs once per distinct
content — at 100 TB scale with heavy exact duplication this is the single
biggest saving in the pipeline.  The rep choice here is min(id): any member
works because identical content ⇒ identical signature; final ranking
happens in the classification stage over the whole cluster.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from .lsh import PAIR_SCHEMA


def _keep_min_id(g: pa.Table) -> pa.Table:
    ids = g.column("id").to_pylist()
    return g.take(pa.array([int(np.argmin(np.asarray(ids, dtype=object)))]))


def exact_representatives(prepared: ray.data.Dataset) -> ray.data.Dataset:
    """One full row (incl. content) per distinct sha256.  This is the one
    shuffle in the pipeline that moves content; everything downstream of the
    signer is slim (ids + signatures only)."""
    return prepared.groupby("sha_hex").map_groups(_keep_min_id, batch_format="pyarrow")


def _emit_zero_edges(g: pa.Table) -> pa.Table:
    ids = sorted(g.column("id").to_pylist())
    if len(ids) < 2:
        return pa.table(
            {"id_a": pa.array([], pa.string()), "id_b": pa.array([], pa.string()),
             "est_distance": pa.array([], pa.float64())},
            schema=PAIR_SCHEMA,
        )
    rep = ids[0]
    others = ids[1:]
    return pa.table(
        {
            "id_a": pa.array([rep] * len(others), pa.string()),
            "id_b": pa.array(others, pa.string()),
            "est_distance": pa.array([0.0] * len(others), pa.float64()),
        },
        schema=PAIR_SCHEMA,
    )


def exact_dup_edges(prepared_slim: ray.data.Dataset) -> ray.data.Dataset:
    """(sha_hex, id) -> star edges rep--member with distance 0 (slim shuffle:
    only ids + hashes move)."""
    return prepared_slim.select_columns(["sha_hex", "id"]).groupby("sha_hex").map_groups(
        _emit_zero_edges, batch_format="pyarrow"
    )
