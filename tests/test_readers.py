"""read_parquet_clean (sources/readers.py): clean-schema pre-declaration
and the pure-read fast path it enables.

Contract: blocks carry metadata-free (hashable) schemas; when the clean
schema is successfully passed INTO read_parquet, the returned dataset is
a PURE read (no post-read strip stage), so ``count()`` stays a parquet-
metadata-only operation — several pipelines rely on O(1) counts for
index fingerprints and row hints."""

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lasvdedup_ray.sources.readers import read_parquet_clean


@pytest.fixture()
def pandas_parquet(tmp_path):
    # pandas writes a b'pandas' schema-metadata blob -> unhashable schema
    p = tmp_path / "t.parquet"
    pd.DataFrame({"a": [1, 2, 3], "b": ["x", "y", "z"]}).to_parquet(p)
    assert pq.read_schema(str(p)).metadata is not None
    return str(p)


def test_blocks_metadata_free(ray_session, pandas_parquet):
    b = read_parquet_clean(pandas_parquet).take_batch(3, batch_format="pyarrow")
    assert b.schema.metadata is None
    assert all(f.metadata is None for f in b.schema)
    hash(b.schema)  # hashable => Ray's bundle-schema dedup works


def test_pure_read_when_schema_declared(ray_session, pandas_parquet):
    ds = read_parquet_clean(pandas_parquet)
    # no post-read map stage: the plan's sole operator is the read
    assert "MapBatches" not in str(ds), str(ds)
    assert ds.count() == 3


def test_strip_fallback_with_partition_column(ray_session, tmp_path):
    # hive partition column absent from the footer -> schema can't be
    # pre-declared; the post-read strip stage must still clean metadata
    root = tmp_path / "part"
    (root / "k=1").mkdir(parents=True)
    pd.DataFrame({"a": [1, 2]}).to_parquet(root / "k=1" / "f.parquet")
    ds = read_parquet_clean(str(root), columns=["a", "k"])
    b = ds.take_batch(2, batch_format="pyarrow")
    assert b.schema.metadata is None
    assert sorted(b.column_names) == ["a", "k"]
