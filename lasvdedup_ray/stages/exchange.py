"""Raw-Ray hash exchange: co-locate rows by a small integer partition key
without a sort barrier.

Ray Data's ``groupby(key).map_groups`` runs a sort-based shuffle: a
sampling pass over every block, a SortMap wave, and a SortReduce wave —
measured ~10-20 s of CPU-count-independent wall time per barrier on the
flagship (the dominant term in the 8->32 scaling gap once the per-pair
compare was fixed).  For keys that are ALREADY a hash residue in
``[0, num_partitions)`` (the engine's ``pkey`` columns), none of that
machinery is needed: this helper splits each upstream block into
``num_partitions`` sub-tables (one task per block, ``num_returns=P+1``;
the extra return is the per-partition row-count vector) and runs one
reduce task per NON-EMPTY partition over its sub-tables — two scheduling
waves, no sampling pass, no sort.  Partitions with zero rows are skipped
entirely, matching ``groupby`` semantics (a reduce fn is never invoked
on an empty group), so reducers need no empty-input guard.

Partitioning assumption (document per SURVEY): every row with the same
``pkey`` value lands in exactly ONE reduce call — identical to the
``groupby(pkey).map_groups`` contract — because pkey p goes to reduce p
verbatim.  Reducers that only need co-location (the LSH pair emitter
sorts its partition internally; per-user session folds see every row of
their users) are drop-in.

On a multi-node cluster this is exactly a hash shuffle (what Ray's
``ShuffleStrategy.HASH_SHUFFLE`` runs internally); the Dataset-API
version (``repartition(keys=...)``) is not used because the strategy flag
is consulted at execution time from a context shared across the whole
lineage, and flipping it would silently re-plan every other groupby in
the same execution (measured: aggregator-actor deadlock at 8 CPUs).

The counts sync costs one driver round-trip of tiny int vectors but adds
no critical-path time: every reduce already waits on every split (each
needs its sliver of every block).

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
    """One upstream block -> ``num_partitions`` sub-tables plus the
    per-partition row-count vector (num_returns = P + 1)."""
    counts = np.zeros(num_partitions, dtype=np.int64)
    if pkey_col not in block.column_names and block.num_rows > 0:
        # loud failure, matching the out-of-range check below: a NON-empty
        # block without the pkey column would otherwise reach no reducer
        # and its rows would silently vanish from the result
        raise ValueError(
            f"hash_exchange: non-empty block is missing pkey column "
            f"{pkey_col!r} (columns: {block.column_names})"
        )
    if block.num_rows == 0:
        # Ray Data normalizes empty map outputs to SCHEMALESS 0-row blocks
        # (no columns at all); they carry no rows for any partition
        out = [block] * num_partitions
        out.append(counts)
        return tuple(out) if num_partitions > 0 else (counts,)
    pk = block[pkey_col].to_numpy(zero_copy_only=False).astype(np.int64)
    # one stable gather + P zero-copy slices instead of P full-table filter
    # scans (the filter loop cost O(P * rows) per block — measured ~6 s of
    # split-wave wall at 600k files with P=128); stable argsort preserves
    # upstream row order within each partition, keeping the documented
    # "row order = upstream block order" reducer contract
    order = np.argsort(pk, kind="stable")
    sorted_block = block.take(pa.array(order, pa.int64()))
    pk_sorted = pk[order]
    # loud failure instead of silent row loss: groupby(pkey) (which this
    # replaces) grouped ANY key value; here a key outside
    # [0, num_partitions) would fall outside every slice below
    if pk_sorted[0] < 0 or pk_sorted[-1] >= num_partitions:
        raise ValueError(
            f"hash_exchange pkey out of range [0, {num_partitions}): "
            f"min={pk_sorted[0]}, max={pk_sorted[-1]}"
        )
    bounds = np.searchsorted(pk_sorted, np.arange(num_partitions + 1, dtype=np.int64))
    counts = np.diff(bounds)
    out = [
        sorted_block.slice(int(bounds[p]), int(counts[p]))
        for p in range(num_partitions)
    ]
    out.append(counts)
    return tuple(out)


@ray.remote
def _reduce_partition(fn, *subs: pa.Table):
    tables = [s for s in subs if s.num_rows]
    part = pa.concat_tables(tables) if tables else subs[0]
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
    barrier).  ``reduce_fn`` receives ONE non-empty Arrow table holding
    every row of its pkey (row order = upstream block order, not sorted —
    reducers that need an order must sort internally, as the LSH emitter
    already does); it is never called on an empty partition.
    ``empty_schema``: schema of the typed empty RESULT returned when the
    upstream has no rows at all (None -> a zero-block dataset, matching
    groupby's schemaless-empty behavior)."""
    from .._phaselog import mark as _mark

    refs = ds.to_arrow_refs()
    _mark(f"exchange[{pkey_col}]:upstream_exec")
    if not refs:
        parts_lists: list = []
    else:
        parts_lists = [
            _split_by_pkey.options(num_returns=num_partitions + 1).remote(
                r, pkey_col, num_partitions
            )
            for r in refs
        ]
    if parts_lists:
        totals = np.sum(ray.get([row[num_partitions] for row in parts_lists]), axis=0)
        live = [p for p in range(num_partitions) if totals[p] > 0]
    else:
        live = []
    _mark(f"exchange[{pkey_col}]:split_wave")
    if not live:
        if empty_schema is not None:
            return ray.data.from_arrow(empty_schema.empty_table())
        return ray.data.from_arrow_refs([])
    out_refs = [
        _reduce_partition.remote(reduce_fn, *[row[p] for row in parts_lists])
        for p in live
    ]
    return ray.data.from_arrow_refs(out_refs)


def grouped_sum_exchange(
    ds: ray.data.Dataset,
    keys: list,
    sum_cols: list,
    count_col: Optional[str] = None,
    num_partitions: int = 8,
    empty_schema: Optional[pa.Schema] = None,
) -> ray.data.Dataset:
    """Final reduce of per-batch PARTIAL sums: one small hash exchange on a
    key-derived pkey, Arrow ``group_by`` inside each partition.

    Why not ``groupby(keys).aggregate(Sum(...))``: Ray's sort-based
    Aggregate emits one block per reduce partition INCLUDING schemaless
    zero-row blocks when distinct groups < partitions — those bundles
    diverge every downstream operator's tracked schema (the "RefBundle
    with a different schema" warning on every tiny grouped aggregate) and
    defeat bundle-schema dedup.  This path only ever emits typed non-empty
    bundles, and it presumes the caller already combined map-side, so the
    rows crossing the exchange are O(groups per block), not source rows.

    ``ds`` blocks must hold partial rows: ``keys`` + float/int ``sum_cols``
    (+ an int ``count_col`` of partial row counts).  The per-row Python
    key hash below is fine precisely because inputs are post-combiner
    (a handful of rows per block).
    """
    import zlib

    def add_pkey(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column("pkey", pa.array([], pa.int32()))
        # null keys map to a sentinel so they co-locate in one partition
        # (Arrow's in-partition group_by then groups them as their own
        # group, matching the Ray groupby semantics this path replaces)
        parts = [t[k].cast(pa.string()).to_pylist() for k in keys]
        h = np.fromiter(
            (
                zlib.crc32(
                    "\x1f".join("\x00<null>" if v is None else v for v in vs).encode()
                )
                for vs in zip(*parts)
            ),
            dtype=np.uint32,
            count=t.num_rows,
        )
        return t.append_column(
            "pkey", pa.array((h % num_partitions).astype(np.int32), pa.int32())
        )

    def reduce_fn(t: pa.Table) -> pa.Table:
        t = t.drop_columns(["pkey"])
        aggs = [(c, "sum") for c in sum_cols]
        if count_col:
            aggs.append((count_col, "sum"))
        g = t.group_by(keys).aggregate(aggs)
        cols = {k: g[k] for k in keys}
        for c in sum_cols:
            cols[c] = g[c + "_sum"]
        if count_col:
            cols[count_col] = g[count_col + "_sum"]
        return pa.table(cols)

    return hash_exchange(
        ds.map_batches(add_pkey, batch_format="pyarrow"),
        "pkey",
        num_partitions,
        reduce_fn,
        empty_schema=empty_schema,
    )
