"""Raw-Ray hash exchange: co-locate rows by a small integer partition key
without a sort barrier.

Ray Data's ``groupby(key).map_groups`` runs a sort-based shuffle: a
sampling pass over every block, a SortMap wave, and a SortReduce wave —
measured ~10-20 s of CPU-count-independent wall time per barrier on the
flagship (the dominant term in the 8->32 scaling gap once the per-pair
compare was fixed).  For keys that are ALREADY a hash residue in
``[0, num_partitions)`` (the engine's ``pkey`` columns), none of that
machinery is needed: this helper splits each upstream block into
``num_partitions`` sub-tables (one task per block, ``num_returns=P``) and
runs one reduce task per partition over its sub-tables — two scheduling
waves, no sampling pass, no sort.

Partitioning assumption (document per SURVEY): every row with the same
``pkey`` value lands in exactly ONE reduce call — identical to the
``groupby(pkey).map_groups`` contract — because pkey p goes to reduce p
verbatim.  Reduce functions that only need co-location (the LSH pair
emitter sorts its partition internally; the hot-key counter counts per
ckey) are drop-in.

On a multi-node cluster this is exactly a hash shuffle (what Ray's
``ShuffleStrategy.HASH_SHUFFLE`` runs internally); the Dataset-API
version (``repartition(keys=...)``) is not used because the strategy flag
is consulted at execution time from a context shared across the whole
lineage, and flipping it would silently re-plan every other groupby in
the same execution (measured: aggregator-actor deadlock at 8 CPUs).

Scale note: object count is ``num_blocks x num_partitions`` slivers; at
600k files (75 blocks x 32 partitions) that is 2,400 plasma objects of
~300 KB — far below Ray's practical limits.  At 10^9-row scale, feed this
from coarser blocks (fewer, larger) rather than raising P past the
cluster's CPU count.
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np
import pyarrow as pa
import ray
import ray.data


@ray.remote
def _split_by_pkey(block: pa.Table, pkey_col: str, num_partitions: int):
    """One upstream block -> ``num_partitions`` sub-tables (num_returns=P)."""
    pk = block[pkey_col].to_numpy(zero_copy_only=False).astype(np.int64)
    out = []
    for p in range(num_partitions):
        out.append(block.filter(pa.array(pk == p)))
    if num_partitions == 1:
        # num_returns=1 treats a tuple return as THE single value
        return out[0]
    return tuple(out)


@ray.remote
def _reduce_partition(fn, empty_schema: Optional[pa.Schema], *subs: pa.Table):
    tables = [s for s in subs if s.num_rows]
    if tables:
        part = pa.concat_tables(tables)
    elif subs:
        part = subs[0]
    else:
        part = (empty_schema or pa.schema([])).empty_table()
    return fn(part)


def hash_exchange(
    ds: ray.data.Dataset,
    pkey_col: str,
    num_partitions: int,
    reduce_fn: Callable[[pa.Table], pa.Table],
    empty_schema: Optional[pa.Schema] = None,
) -> ray.data.Dataset:
    """``groupby(pkey).map_groups(reduce_fn)`` for an integer pkey in
    ``[0, num_partitions)``, as a two-wave raw-Ray exchange (no sort
    barrier).  ``reduce_fn`` receives ONE Arrow table holding every row of
    its pkey (row order = upstream block order, not sorted — reducers that
    need an order must sort internally, as the LSH emitter already does).
    ``empty_schema``: schema for the result of a reduce over zero rows
    when the upstream dataset itself is empty."""
    refs = ds.to_arrow_refs()
    if not refs:
        if empty_schema is not None:
            return ray.data.from_arrow(reduce_fn(empty_schema.empty_table()))
        return ds
    parts = [
        _split_by_pkey.options(num_returns=num_partitions).remote(
            r, pkey_col, num_partitions
        )
        for r in refs
    ]
    if num_partitions == 1:
        parts = [[p] for p in parts]
    out_refs = [
        _reduce_partition.remote(reduce_fn, empty_schema, *[row[p] for row in parts])
        for p in range(num_partitions)
    ]
    return ray.data.from_arrow_refs(out_refs)
