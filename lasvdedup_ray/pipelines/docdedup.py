"""Dedup-family queries over the driver's ``documents`` table.

Projects ``documents`` into the canonical source schema and runs the
flagship MinHash/LSH pipeline (plus variants) so every dedup mode has a
``queries()`` entry on the driver tables.
"""

from __future__ import annotations

from typing import Optional

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..config import PipelineConfig
from ..sources.corpus import SOURCE_SCHEMA
from ..pipelines.dedup import dedup_pipeline
from ..sources.readers import read_parquet_clean


def documents_as_source(sf_dir: str) -> ray.data.Dataset:
    ds = read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang", "source"]
    )

    def proj(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table(
            {
                "repo": pc.binary_join_element_wise(
                    pa.array(["src"] * n), t["source"], "/"
                ),
                "path": pc.binary_join_element_wise(
                    pa.array(["doc"] * n), pc.cast(t["doc_id"], pa.string()), "_"
                ),
                "commit": pc.cast(t["doc_id"], pa.string()),
                "lang": t["lang"],
                "content": pc.cast(t["text"], pa.large_string()),
            },
            schema=SOURCE_SCHEMA,
        )

    return ds.map_batches(proj, batch_format="pyarrow")


def _minhash_dedup_base(
    sf_dir: str, config: Optional[PipelineConfig] = None, num_partitions: int = 8
) -> ray.data.Dataset:
    """Flagship near-dup clustering on documents, UNSORTED — one row per
    doc (doc_id, cluster_id, classification, decision_category,
    is_representative, rank).  Order-insensitive consumers (the cluster
    histogram) use this directly and skip the final range shuffle."""
    res = dedup_pipeline(documents_as_source(sf_dir), config, num_partitions=num_partitions)

    def finish(t: pa.Table) -> pa.Table:
        # id = src/<source>:doc_<doc_id>@<doc_id> — recover numeric doc_id
        commit = pc.split_pattern(t["id"], "@")
        doc_id = pc.cast(pc.list_element(commit, 1), pa.int64())
        return pa.table(
            {
                "doc_id": doc_id,
                "cluster_id": t["cluster_id"],
                "classification": t["classification"],
                "decision_category": t["decision_category"],
                "is_representative": t["is_representative"],
                "rank": t["rank"],
            }
        )

    return res.map_batches(finish, batch_format="pyarrow")


def minhash_dedup_docs(
    sf_dir: str, config: Optional[PipelineConfig] = None, num_partitions: int = 8
) -> ray.data.Dataset:
    """Flagship near-dup clustering on documents; returns one row per doc
    (doc_id, cluster_id, classification, decision_category,
    is_representative, rank) sorted by doc_id."""
    return _minhash_dedup_base(sf_dir, config, num_partitions).sort("doc_id")


def minhash_dedup_best_quality(
    sf_dir: str, num_partitions: int = 8
) -> ray.data.Dataset:
    """Quality-aware near-dup selection: the flagship MinHash/LSH
    clustering, but each cluster's surviving representative is the member
    with the HIGHEST quality score (alpha_ratio scaled to int, attached
    via the ``rank_table`` side-table path — the reference's ranked-contigs
    mechanism) instead of the default length-distance rank.  Returns
    (doc_id, cluster_id, is_representative, quality_e6) sorted by doc_id."""
    import dataclasses

    import numpy as np

    from ..functions.text import quality_metrics

    src = documents_as_source(sf_dir)

    # rank side table: id -> quality (alpha_ratio * 1e6 as int64; higher is
    # better — selection columns sort descending)
    docs = read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source"]
    )

    def qtable(t: pa.Table) -> pa.Table:
        m = quality_metrics(t["text"])
        q = pc.cast(
            pc.floor(pc.multiply(m["alpha_ratio"], 1_000_000.0)), pa.int64()
        )
        rp = pc.binary_join_element_wise(
            pa.array(["src"] * t.num_rows), t["source"], "/"
        )
        pathpart = pc.binary_join_element_wise(
            pa.array(["doc"] * t.num_rows), pc.cast(t["doc_id"], pa.string()), "_"
        )
        ids = pc.binary_join_element_wise(
            pc.binary_join_element_wise(rp, pathpart, ":"),
            pc.cast(t["doc_id"], pa.string()),
            "@",
        )
        return pa.table({"id": ids, "quality": q})

    rank_table = docs.map_batches(qtable, batch_format="pyarrow")

    base = PipelineConfig()
    cfg = dataclasses.replace(base, selection_columns=("quality",))
    res = dedup_pipeline(
        src,
        cfg,
        num_partitions=num_partitions,
        rank_table=rank_table,
    )

    def finish(t: pa.Table) -> pa.Table:
        commit = pc.split_pattern(t["id"], "@")
        doc_id = pc.cast(pc.list_element(commit, 1), pa.int64())
        return pa.table(
            {
                "doc_id": doc_id,
                "cluster_id": t["cluster_id"],
                "is_representative": t["is_representative"],
            }
        )

    return res.map_batches(finish, batch_format="pyarrow").sort("doc_id")


def dedup_cluster_stats(
    sf_dir: str, num_partitions: int = 8
) -> ray.data.Dataset:
    """Dedup REPORT over the flagship clustering: the cluster-size
    histogram (cluster_size, n_clusters, n_docs) — the first artifact a
    100 TB dedup run is judged by (how much collapsed, at what cluster
    granularity).  Built from two combiner-bounded grouped-sum exchanges
    on top of the UNSORTED flagship output (the histogram is
    order-insensitive, so the per-doc table's final doc_id range shuffle
    is skipped): per-batch partial counts per cluster_id, then per-size
    cluster counts — no row-level shuffle beyond what the flagship itself
    does."""
    from ..stages.exchange import grouped_sum_exchange

    base = _minhash_dedup_base(sf_dir, num_partitions=num_partitions)

    def per_cluster(t: pa.Table) -> pa.Table:
        g = t.select(["cluster_id"]).group_by(["cluster_id"]).aggregate(
            [("cluster_id", "count")]
        )
        return pa.table(
            {"cluster_id": g["cluster_id"], "n": g["cluster_id_count"]}
        )

    sizes = grouped_sum_exchange(
        base.map_batches(per_cluster, batch_format="pyarrow"),
        keys=["cluster_id"],
        sum_cols=["n"],
        num_partitions=4,
        empty_schema=pa.schema([("cluster_id", pa.string()), ("n", pa.int64())]),
    )

    def per_size(t: pa.Table) -> pa.Table:
        g = t.select(["n"]).group_by(["n"]).aggregate([("n", "count")])
        return pa.table(
            {
                "cluster_size": pc.cast(g["n"], pa.int64()),
                "n_clusters": pc.cast(g["n_count"], pa.int64()),
            }
        )

    hist = grouped_sum_exchange(
        sizes.map_batches(per_size, batch_format="pyarrow"),
        keys=["cluster_size"],
        sum_cols=["n_clusters"],
        num_partitions=2,
        empty_schema=pa.schema(
            [("cluster_size", pa.int64()), ("n_clusters", pa.int64())]
        ),
    )

    def finish(t: pa.Table) -> pa.Table:
        return t.append_column(
            "n_docs", pc.multiply(t["cluster_size"], t["n_clusters"])
        )

    return hist.map_batches(finish, batch_format="pyarrow").sort("cluster_size")
