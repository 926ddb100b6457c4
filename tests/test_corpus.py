"""Corpus generator: determinism, schema, planted-structure invariants."""

import pyarrow as pa

from lasvdedup_ray.sources.corpus import (
    BOILERPLATE_HEADER,
    SOURCE_SCHEMA,
    CorpusSpec,
    generate_corpus,
)


def test_schema_matches_input_hint():
    corpus, truth = generate_corpus(CorpusSpec(n_files=50))
    assert corpus.schema.equals(SOURCE_SCHEMA)
    assert corpus.num_rows == 50
    assert truth.num_rows == 50


def test_deterministic():
    a, ta = generate_corpus(CorpusSpec(n_files=100, seed=7))
    b, tb = generate_corpus(CorpusSpec(n_files=100, seed=7))
    assert a.equals(b)
    assert ta.equals(tb)
    c, _ = generate_corpus(CorpusSpec(n_files=100, seed=8))
    assert not a.equals(c)


def test_unique_ids():
    corpus, truth = generate_corpus(CorpusSpec(n_files=300))
    ids = truth["id"].to_pylist()
    assert len(ids) == len(set(ids)) == 300


def test_planted_structure(corpus_tables):
    corpus, truth = corpus_tables
    contents = corpus["content"].to_pylist()
    groups = truth["truth_group"].to_pylist()
    # exact duplicates exist
    by_content = {}
    for c in contents:
        by_content[c] = by_content.get(c, 0) + 1
    assert any(v >= 2 for v in by_content.values())
    # boilerplate skew fixture exists
    n_boiler = sum(1 for c in contents if c.startswith(BOILERPLATE_HEADER))
    assert n_boiler >= 10
    # grouped + ungrouped rows both present
    assert any(g >= 0 for g in groups) and any(g < 0 for g in groups)
