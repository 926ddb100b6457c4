"""Execution-plan equivalence: the size-gated alternates must produce the
same clusters/classifications as the defaults.

- LSH signature transport: broadcast store (under sig_broadcast_cap) vs
  inline sig16 band rows must emit the SAME verified pair set.
- exact_first=True (sha-dedup before signing + sha-join) vs the default
  slim-collapse path must produce identical cluster membership and
  classifications.
"""

import dataclasses

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from lasvdedup_ray.config import PipelineConfig
from lasvdedup_ray.pipelines.dedup import candidate_tau, dedup_pipeline
from lasvdedup_ray.sources.corpus import CorpusSpec, generate_corpus
from lasvdedup_ray.stages.lsh import candidate_pairs
from lasvdedup_ray.stages.prepare import prepare
from lasvdedup_ray.stages.signatures import add_signatures


@pytest.fixture(scope="module")
def signed_corpus():
    corpus, _ = generate_corpus(CorpusSpec(n_files=300, seed=17))
    cfg = PipelineConfig()
    signed = add_signatures(
        prepare(ray.data.from_arrow(corpus)), cfg=cfg.signature
    ).materialize()
    return corpus, cfg, signed


def test_broadcast_and_inline_transport_same_pairs(signed_corpus):
    _, cfg, signed = signed_corpus
    slim = signed.select_columns(["id", "minhash", "simhash"])
    emit_tau = candidate_tau(cfg) + cfg.lsh.exact_margin

    def pairset(lsh_cfg):
        df = candidate_pairs(slim, cfg.signature, lsh_cfg, tau=emit_tau).to_pandas()
        return set(zip(df["id_a"], df["id_b"]))

    # default: broadcast store + driver-side hot sets (300 rows is under
    # both caps); force the distributed hot-prefilter pass and the inline
    # signature transport and pin all three plans to the same pair set
    default = pairset(cfg.lsh)
    dist_hot = pairset(dataclasses.replace(cfg.lsh, hot_driver_cap=0))
    inline = pairset(dataclasses.replace(cfg.lsh, sig_broadcast_cap=0))
    assert default == dist_hot == inline and len(default) > 0


def _canon_results(ds) -> pd.DataFrame:
    df = ds.to_pandas()[
        ["id", "classification", "decision_category", "is_representative"]
    ]
    return df.sort_values("id").reset_index(drop=True)


def test_driver_collapse_matches_exchange_collapse(signed_corpus):
    """The small-input driver-side sha collapse (exact_driver_cap) must
    yield identical classifications to the exact_collapse exchange plan —
    same min(id)-per-sha reps, same star edges."""
    corpus, _, _ = signed_corpus
    base = PipelineConfig()
    driver = _canon_results(
        dedup_pipeline(ray.data.from_arrow(corpus), base, num_partitions=4)
    )
    exchange_cfg = dataclasses.replace(
        base, execution=dataclasses.replace(base.execution, exact_driver_cap=0)
    )
    exchange = _canon_results(
        dedup_pipeline(ray.data.from_arrow(corpus), exchange_cfg, num_partitions=4)
    )
    pd.testing.assert_frame_equal(driver, exchange)


def test_exact_first_path_matches_default(signed_corpus):
    corpus, _, _ = signed_corpus
    a = _canon_results(
        dedup_pipeline(ray.data.from_arrow(corpus), PipelineConfig(), num_partitions=4)
    )
    b = _canon_results(
        dedup_pipeline(
            ray.data.from_arrow(corpus),
            PipelineConfig(exact_first=True),
            num_partitions=4,
        )
    )
    pd.testing.assert_frame_equal(a, b)


def test_embedding_neardup_pairs_chunked_matches_broadcast():
    """The exact pair join above the broadcast cap (chunked block-nested
    loop) must emit IDENTICAL (id_a, id_b, cosine_e6) rows to the
    single-broadcast path (VERDICT r3 #2)."""
    from lasvdedup_ray.pipelines.ann import embedding_neardup_pairs

    sf = "/root/testdata/sf0.001"
    full = embedding_neardup_pairs(sf).to_pandas()
    # tiny cap: 64-dim float64 rows are 512 B, so 80 rows/chunk -> 7 chunks
    chunked = embedding_neardup_pairs(sf, broadcast_cap_bytes=80 * 64 * 8).to_pandas()
    assert len(full) > 0
    pd.testing.assert_frame_equal(
        full.reset_index(drop=True), chunked.reset_index(drop=True)
    )


def test_knn_graph_chunked_matches_broadcast():
    """The kNN graph above the broadcast cap (sequential chunk passes +
    query-keyed top-k merge) must emit IDENTICAL (query_id, vec_id,
    cosine_e6) rows to the single-broadcast path, including ties resolved
    across chunk boundaries."""
    from lasvdedup_ray.pipelines.ann import knn_graph_embeddings

    sf = "/root/testdata/sf0.001"
    full = knn_graph_embeddings(sf).to_pandas()
    chunked = knn_graph_embeddings(sf, broadcast_cap_bytes=80 * 64 * 8).to_pandas()
    assert len(full) > 0
    pd.testing.assert_frame_equal(
        full.reset_index(drop=True), chunked.reset_index(drop=True)
    )


def test_knn_graph_matches_numpy_reference(tmp_path):
    """Engine kNN graph equals a brute-force numpy reference on a planted
    table with an exact-duplicate vector pair (cosine 1.0 ties) and an
    orthogonal vector (fewer-than-k neighborhood still emits k rows when
    n-1 >= k)."""
    import pyarrow.parquet as pq

    from lasvdedup_ray.pipelines.ann import knn_graph_embeddings

    rng = np.random.default_rng(3)
    vecs = rng.normal(size=(20, 8))
    vecs[7] = vecs[3]  # exact duplicate -> cosine_e6 == 1e6 with tie-break
    t = pa.table(
        {
            "vec_id": pa.array(range(20), pa.int64()),
            "embedding": pa.array(
                [list(map(float, v)) for v in vecs], pa.list_(pa.float32())
            ),
            "label": pa.array([0] * 20, pa.int32()),
        }
    )
    pq.write_table(t, str(tmp_path / "embeddings.parquet"))
    got = knn_graph_embeddings(str(tmp_path), k=3).to_pandas()

    m = np.array(
        [np.asarray(r, np.float64) for r in t["embedding"].to_pylist()]
    )
    n = m / np.linalg.norm(m, axis=1, keepdims=True)
    cos = n @ n.T
    q = np.where(cos * 1e6 >= 0, np.floor(cos * 1e6 + 0.5), np.ceil(cos * 1e6 - 0.5)).astype(
        np.int64
    )
    exp_rows = []
    for i in range(20):
        cand = [(int(-q[i, j]), j) for j in range(20) if j != i]
        for negq, j in sorted(cand)[:3]:
            exp_rows.append((i, j, -negq))
    exp = (
        pd.DataFrame(exp_rows, columns=["query_id", "vec_id", "cosine_e6"])
        .sort_values(["query_id", "vec_id"])
        .reset_index(drop=True)
    )
    got = got.sort_values(["query_id", "vec_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp)
    # the duplicate pair found each other at exactly 1e6
    assert got.query("query_id == 3 and vec_id == 7")["cosine_e6"].iloc[0] == 1_000_000


def test_knn_graph_chunked_empty_passes(tmp_path):
    """A 1-row table forced onto the chunked path (every chunk pass emits
    zero rows after the self-mask) returns a typed empty result instead of
    crashing on an empty pass list."""
    import pyarrow.parquet as pq

    from lasvdedup_ray.pipelines.ann import knn_graph_embeddings

    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array([1], pa.int64()),
                "embedding": pa.array([[1.0, 0.0]], pa.list_(pa.float32())),
                "label": pa.array([0], pa.int32()),
            }
        ),
        str(tmp_path / "embeddings.parquet"),
    )
    ds = knn_graph_embeddings(str(tmp_path), broadcast_cap_bytes=1)
    assert ds.schema().names == ["query_id", "vec_id", "cosine_e6"]
    assert ds.count() == 0
