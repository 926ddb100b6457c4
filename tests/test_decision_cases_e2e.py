"""Decision cases 4 (OutliersDetected) and 5 (TrueCoinfection) through the
REAL pipeline — not just the unit-level classifier — plus schema
validation.  The default e2e corpus only exercises cases 1-3 because
min_neighborhood=8 exceeds its cluster sizes."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from lasvdedup_ray.config import ClassThresholds, PipelineConfig
from lasvdedup_ray.pipelines.dedup import dedup_pipeline
from lasvdedup_ray.sources.corpus import SOURCE_SCHEMA


def _chain_cluster_corpus(n_members=7, step=0.12, seed=5):
    """A transitive chain cluster: consecutive members within tau, ends far
    apart — with min_neighborhood below the cluster size, classification
    falls through Case 2 (not all pairwise <= tau) and Case 3 (not small)
    into the outlier/coinfection branch."""
    rng = np.random.default_rng(seed)
    vocab = [f"ident_{i}" for i in range(4000)]
    toks = [vocab[i] for i in rng.integers(0, 4000, 500)]
    rows = {k: [] for k in SOURCE_SCHEMA.names}

    def add(tokens, i):
        rows["repo"].append("o/r")
        rows["path"].append(f"src/m{i}.py")
        rows["commit"].append(f"{i:040d}")
        rows["lang"].append("py")
        rows["content"].append(" ".join(tokens))

    cur = list(toks)
    for i in range(n_members):
        add(cur, i)
        cur = list(cur)
        n_mut = int(len(cur) * step)
        for p in rng.choice(len(cur), n_mut, replace=False):
            cur[int(p)] = vocab[int(rng.integers(0, 4000))]
    # singletons for ballast
    for i in range(n_members, n_members + 6):
        add([vocab[int(x)] for x in rng.integers(0, 4000, 500)], i)
    return pa.table(rows, schema=SOURCE_SCHEMA)


CFG = PipelineConfig(
    default_thresholds=ClassThresholds(tau=0.3, min_neighborhood=3, z_threshold=2.0,
                                       target_length=4000),
)


def test_case4_or_5_reached_through_pipeline():
    corpus = _chain_cluster_corpus()
    out = dedup_pipeline(ray.data.from_arrow(corpus), CFG, num_partitions=2).to_pandas()
    cats = set(out["decision_category"])
    # the chain cluster must fall through to the outlier/coinfection branch
    assert cats & {"OutliersDetected", "TrueCoinfection"}, cats
    big = out[out["decision_category"].isin(["OutliersDetected", "TrueCoinfection"])]
    assert big["cluster_id"].nunique() == 1
    if "OutliersDetected" in cats:
        assert (big["classification"] == "keep").sum() == 1
    else:
        assert (big["classification"] == "distinct").all()


def test_missing_columns_raise():
    bad = pa.table({"repo": pa.array(["o/r"]), "content": pa.array(["x"], pa.large_string())})
    with pytest.raises(ValueError, match="missing required columns"):
        dedup_pipeline(ray.data.from_arrow(bad), PipelineConfig(), num_partitions=2)
