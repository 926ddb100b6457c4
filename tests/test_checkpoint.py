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


def test_fingerprint_invalidates_on_change(tmp_path):
    """ADVICE r1: a checkpoint pinned under a different (input, config)
    fingerprint must be recomputed, not silently reused."""
    t1 = pa.table({"x": [1, 2, 3]})
    ck1 = StageCheckpointer(str(tmp_path), fingerprint="aaa")
    out1 = ck1.pin(ray.data.from_arrow(t1), "stage").to_pandas()
    assert sorted(out1["x"]) == [1, 2, 3]
    # same fingerprint -> reuse (different data ignored)
    out2 = StageCheckpointer(str(tmp_path), fingerprint="aaa").pin(
        ray.data.from_arrow(pa.table({"x": [9]})), "stage"
    ).to_pandas()
    assert sorted(out2["x"]) == [1, 2, 3]
    # different fingerprint -> recompute
    out3 = StageCheckpointer(str(tmp_path), fingerprint="bbb").pin(
        ray.data.from_arrow(pa.table({"x": [7, 8]})), "stage"
    ).to_pandas()
    assert sorted(out3["x"]) == [7, 8]


def test_pipeline_fingerprint_recomputes_on_new_input(tmp_path):
    """Reusing a checkpoint_dir with different input data must yield the
    NEW input's results (round-1 bug: stale 'signed' parquet returned)."""
    corpus1, _ = generate_corpus(CorpusSpec(n_files=60, seed=1))
    corpus2, _ = generate_corpus(CorpusSpec(n_files=80, seed=2))
    cfg = PipelineConfig(checkpoint_dir=str(tmp_path / "ck"))
    a = dedup_pipeline(ray.data.from_arrow(corpus1), cfg, num_partitions=4).count()
    b = dedup_pipeline(ray.data.from_arrow(corpus2), cfg, num_partitions=4).count()
    assert a == corpus1.num_rows
    assert b == corpus2.num_rows  # not the stale corpus1 stages


def test_force_recomputes_pinned_stage(tmp_path):
    """--force (reference pipeline.py:26,74): a completed checkpoint is
    ignored and overwritten instead of reused."""
    ck = StageCheckpointer(str(tmp_path))
    ck.pin(ray.data.from_arrow(pa.table({"x": [1, 2, 3]})), "stage_a")
    forced = StageCheckpointer(str(tmp_path), force=True)
    assert not forced.is_done("stage_a")
    assert forced.status("stage_a") == "forced"
    out = forced.pin(ray.data.from_arrow(pa.table({"x": [9, 9]})), "stage_a").to_pandas()
    assert sorted(out["x"]) == [9, 9]  # recomputed, not the cached [1,2,3]
    # and the overwrite is durable: a fresh non-force checkpointer reads it
    again = StageCheckpointer(str(tmp_path)).pin(
        ray.data.from_arrow(pa.table({"x": [0]})), "stage_a"
    ).to_pandas()
    assert sorted(again["x"]) == [9, 9]


def test_plan_stages_dry_run(tmp_path):
    """Dry-run plan: stage list + per-stage checkpoint status, nothing
    executed (reference run_pipeline dry_run, pipeline.py:9-83)."""
    from lasvdedup_ray.pipelines.dedup import plan_stages

    corpus, _ = generate_corpus(CorpusSpec(n_files=60, seed=3))
    cfg = PipelineConfig(checkpoint_dir=str(tmp_path / "ck"))
    plan = plan_stages(ray.data.from_arrow(corpus), cfg)
    stages = [p["stage"] for p in plan]
    assert stages == ["signed", "reps", "candidates", "verify", "cluster", "classify"]
    assert all(p["checkpoint"] == "missing" for p in plan[:2])
    # nothing was executed or written by the dry run
    assert not os.path.exists(tmp_path / "ck" / "manifest.json")
    # after a real run the plan reports the pinned stages as cached
    dedup_pipeline(ray.data.from_arrow(corpus), cfg, num_partitions=4).count()
    plan2 = plan_stages(ray.data.from_arrow(corpus), cfg)
    assert all(p["checkpoint"] == "cached" for p in plan2[:2])
