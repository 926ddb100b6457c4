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


def documents_as_source(sf_dir: str) -> ray.data.Dataset:
    ds = ray.data.read_parquet(
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


def minhash_dedup_docs(
    sf_dir: str, config: Optional[PipelineConfig] = None, num_partitions: int = 8
) -> ray.data.Dataset:
    """Flagship near-dup clustering on documents; returns one row per doc
    (doc_id, cluster_id, classification, decision_category,
    is_representative, rank) sorted by doc_id."""
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

    return res.map_batches(finish, batch_format="pyarrow").sort("doc_id")
