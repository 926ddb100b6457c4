"""Execution-plan equivalence: the size-gated alternates must produce the
same clusters/classifications as the defaults.

- LSH signature transport: broadcast store (under sig_broadcast_cap) vs
  inline sig16 band rows must emit the SAME verified pair set.
- exact_first=True (sha-dedup before signing + sha-join) vs the default
  slim-collapse path must produce identical cluster membership and
  classifications.
"""

import dataclasses

import pandas as pd
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
