"""Persisted incremental near-dup index (state/neardup_index.py):
build-once / probe-many semantics, manifest skip on the second batch,
and broadcast-vs-copartition path equivalence (VERDICT r4 item 9)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from lasvdedup_ray.state import neardup_index as ni
from lasvdedup_ray.state.neardup_index import NearDupIndex


def _docs(ids, texts):
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    )


def _mk_corpus(seed=7, n=40):
    rng = np.random.default_rng(seed)
    words = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot"]
    texts = [
        " ".join(rng.choice(words, size=12).tolist()) for _ in range(n)
    ]
    return texts


def test_build_once_probe_twice_skips_rebuild(tmp_path):
    texts = _mk_corpus()
    corpus = _docs(list(range(0, 80, 2)), texts)
    index = NearDupIndex(str(tmp_path / "idx"), corpus_fingerprint="c1")
    assert index.build(corpus) is True  # first build scans
    assert index.is_built()

    # batch 1: one exact dup of corpus doc 0, one unrelated doc
    b1 = _docs([101, 103], [texts[0], "zzzz qqqq xxxx yyyy wwww vvvv"])
    r1 = index.probe(b1).to_pandas()
    assert r1["doc_id"].tolist() == [101]
    assert int(r1["n_partners"].iloc[0]) >= 1

    # batch 2 against the SAME index object rebuilt from disk: build()
    # must be a manifest hit (returns False, no corpus scan), and the
    # probe result is unchanged for the same batch
    index2 = NearDupIndex(str(tmp_path / "idx"), corpus_fingerprint="c1")
    assert index2.build(corpus) is False  # SKIP path
    r2 = index2.probe(b1).to_pandas()
    assert r2.values.tolist() == r1.values.tolist()

    # a second, different batch probes without any rebuild
    b2 = _docs([201], [texts[1]])
    r3 = index2.probe(b2).to_pandas()
    assert r3["doc_id"].tolist() == [201]


def test_fingerprint_invalidation(tmp_path):
    texts = _mk_corpus(seed=3, n=10)
    corpus = _docs(list(range(10)), texts)
    a = NearDupIndex(str(tmp_path / "i"), corpus_fingerprint="v1")
    assert a.build(corpus) is True
    # changed corpus fingerprint -> stale index must NOT be served
    b = NearDupIndex(str(tmp_path / "i"), corpus_fingerprint="v2")
    assert not b.is_built()
    assert b.build(corpus) is True


def test_broadcast_and_copartition_paths_agree(tmp_path, monkeypatch):
    texts = _mk_corpus(seed=11, n=30)
    corpus = _docs(list(range(0, 60, 2)), texts)
    batch = _docs(
        [1, 3, 5],
        [texts[2], texts[5][:20] + " unrelated tail zz", "totally new words"],
    )
    idx = NearDupIndex(str(tmp_path / "bc"), corpus_fingerprint="x")
    idx.build(corpus)
    fast = idx.probe(batch).to_pandas()
    # force the co-partition (huge-batch) path on the same data
    monkeypatch.setattr(ni, "PROBE_BCAST_CAP", 0)
    slow = idx.probe(batch).to_pandas()
    assert fast.values.tolist() == slow.values.tolist()


def test_df_cap_applies_to_index_only(tmp_path):
    # a shingle present in MORE than df_cap index docs is dropped from the
    # index; an incoming doc made only of that boilerplate finds no partner
    boiler = "boilerplate-line-common"
    corpus = _docs(list(range(5)), [boiler + f" tail{i}" for i in range(5)])
    idx = NearDupIndex(
        str(tmp_path / "cap"), df_cap=2, corpus_fingerprint="cap"
    )
    idx.build(corpus)
    r = idx.probe(_docs([99], [boiler])).to_pandas()
    assert len(r) == 0


def test_corpus_fingerprint_tracks_file_mutation(tmp_path):
    # same path + same row count but different bytes/mtime must yield a
    # DIFFERENT fingerprint — a regenerated corpus at a fixed per-SF size
    # must not be served a stale index from the shared cache dir
    import os
    import pyarrow.parquet as pq

    from lasvdedup_ray.state.neardup_index import corpus_fingerprint_of

    p = str(tmp_path / "documents.parquet")
    pq.write_table(pa.table({"doc_id": [1, 2], "text": ["aa", "bb"]}), p)
    fp1 = corpus_fingerprint_of(p, 2)
    pq.write_table(pa.table({"doc_id": [1, 2], "text": ["cc", "dd"]}), p)
    os.utime(p, ns=(1, 1))  # force a distinct mtime even on coarse clocks
    fp2 = corpus_fingerprint_of(p, 2)
    assert fp1 != fp2
