"""Checkpoint/resume: per-stage Parquet + manifest (Snakemake-equivalent
skip semantics, SURVEY §4)."""

import json
import os

import pyarrow as pa
import ray.data

from lasvdedup_ray.config import PipelineConfig
from lasvdedup_ray.pipelines.dedup import dedup_pipeline
from lasvdedup_ray.sources.corpus import CorpusSpec, generate_corpus
from lasvdedup_ray.state.checkpoint import StageCheckpointer


def test_pin_writes_and_reuses(tmp_path):
    ck = StageCheckpointer(str(tmp_path))
    t = pa.table({"x": [1, 2, 3]})
    out1 = ck.pin(ray.data.from_arrow(t), "stage_a").to_pandas()
    assert ck.is_done("stage_a")
    assert os.path.isdir(tmp_path / "stage_a")
    # second pin with DIFFERENT data must return the checkpointed result
    # (resume-skip semantics, like Snakemake's outputs-exist rule skip)
    t2 = pa.table({"x": [9, 9, 9, 9]})
    out2 = ck.pin(ray.data.from_arrow(t2), "stage_a").to_pandas()
    assert sorted(out2["x"]) == sorted(out1["x"])


def test_manifest_atomic(tmp_path):
    ck = StageCheckpointer(str(tmp_path))
    ck.pin(ray.data.from_arrow(pa.table({"x": [1]})), "s1")
    ck.pin(ray.data.from_arrow(pa.table({"x": [2]})), "s2")
    m = json.load(open(tmp_path / "manifest.json"))
    assert m["s1"]["done"] and m["s2"]["done"]


def test_pipeline_resume_identical(tmp_path):
    corpus, _ = generate_corpus(CorpusSpec(n_files=120, seed=9))
    cfg = PipelineConfig(checkpoint_dir=str(tmp_path / "ckpt"))
    a = (
        dedup_pipeline(ray.data.from_arrow(corpus), cfg, num_partitions=4)
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    # resume: stages are read back from parquet, result identical
    b = (
        dedup_pipeline(ray.data.from_arrow(corpus), cfg, num_partitions=4)
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    for col in ["id", "cluster_id", "classification", "decision_category", "rank"]:
        assert (a[col] == b[col]).all(), col
    manifest = json.load(open(tmp_path / "ckpt" / "manifest.json"))
    assert manifest.get("signed", {}).get("done")
