"""Deterministic synthetic source-code corpus generator (FIXTURES.md F1).

Emits a Parquet-able Arrow table with EXACTLY the ``input_hint`` schema
``(repo, path, commit, lang, content)`` plus a separate ground-truth table
(``id`` -> planted group label).  Seeded and fully deterministic — same
(n_files, seed) always yields byte-identical content.

Planted structure (mirrors the reference's test corpus roles,
``/root/reference/tests/data/``):
- exact-duplicate groups  (reference Case 2, ``sequence_grouping.py:226-252``)
- near-duplicate clusters at controlled token-mutation rates, including
  transitive chains A~B~C with A!~C (single-linkage semantics,
  ``sequence_grouping.py:89-118``)
- singletons              (Case 1, ``sequence_grouping.py:209-221``)
- clusters with one planted outlier (Case 4 median+MAD,
  ``distance_matrix.py:45-72``)
- a shared boilerplate/license header across many otherwise-unrelated files
  (the LSH band-skew fixture — the "hot key" north_rule requires handling)
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Tuple

import numpy as np
import pyarrow as pa

LANGS = ["py", "js", "java", "go", "rs"]

_KEYWORDS = (
    "def class return if else for while import from try except with as pass "
    "lambda yield raise assert global del not and or in is None True False"
).split()

BOILERPLATE_HEADER = (
    "# Copyright (c) 2020 Example Corp. All rights reserved.\n"
    "# Licensed under the Apache License, Version 2.0 (the 'License');\n"
    "# you may not use this file except in compliance with the License.\n"
    "# You may obtain a copy of the License at\n"
    "#     http://www.apache.org/licenses/LICENSE-2.0\n"
    "# Unless required by applicable law or agreed to in writing, software\n"
    "# distributed under the License is distributed on an 'AS IS' BASIS.\n"
)

SOURCE_SCHEMA = pa.schema(
    [
        ("repo", pa.string()),
        ("path", pa.string()),
        ("commit", pa.string()),
        ("lang", pa.string()),
        ("content", pa.large_string()),
    ]
)


@dataclass(frozen=True)
class CorpusSpec:
    n_files: int = 1000
    seed: int = 42
    exact_dup_frac: float = 0.15     # rows that are exact copies of a base
    near_dup_frac: float = 0.25      # rows in near-dup clusters (incl. chains)
    boilerplate_frac: float = 0.20   # unique rows sharing the license header
    outlier_cluster_frac: float = 0.05
    tokens_per_doc: int = 220
    mutation_rate: float = 0.04      # token-substitution rate for near dups
    chain_step_rate: float = 0.08    # per-link mutation for A~B~C chains


def _identifier(rng: np.random.Generator) -> str:
    syll = ["fo", "ba", "qu", "ze", "mi", "ta", "ro", "lu", "ke", "da", "vi", "no"]
    n = int(rng.integers(2, 5))
    return "".join(syll[int(i)] for i in rng.integers(0, len(syll), n)) + str(int(rng.integers(0, 100)))


def _base_tokens(rng: np.random.Generator, n_tokens: int, vocab: List[str]) -> List[str]:
    idx = rng.integers(0, len(vocab), n_tokens)
    kw = rng.random(n_tokens) < 0.25
    out = []
    for i in range(n_tokens):
        out.append(_KEYWORDS[int(idx[i]) % len(_KEYWORDS)] if kw[i] else vocab[int(idx[i])])
    return out


def _render(tokens: List[str], rng: np.random.Generator) -> str:
    """Deterministic layout: ~8 tokens per line with light indentation."""
    lines, cur = [], []
    for i, t in enumerate(tokens):
        cur.append(t)
        if len(cur) >= 8:
            indent = "    " * int(i % 3 == 0)
            lines.append(indent + " ".join(cur))
            cur = []
    if cur:
        lines.append(" ".join(cur))
    return "\n".join(lines) + "\n"


def _mutate(tokens: List[str], rate: float, rng: np.random.Generator, vocab: List[str]) -> List[str]:
    out = list(tokens)
    n_mut = max(1, int(len(tokens) * rate))
    pos = rng.choice(len(tokens), size=min(n_mut, len(tokens)), replace=False)
    for p in pos:
        out[int(p)] = vocab[int(rng.integers(0, len(vocab)))]
    return out


def generate_corpus(spec: CorpusSpec = CorpusSpec()) -> Tuple[pa.Table, pa.Table]:
    """Returns (corpus_table, truth_table).

    corpus_table: SOURCE_SCHEMA.  truth_table: (id:string, truth_group:int64)
    where truth_group is the planted-group label (-1 for singletons/
    boilerplate-unique files).  ``id = f"{repo}:{path}@{commit}"`` — the row
    id used everywhere downstream.
    """
    rng = np.random.default_rng(spec.seed)
    vocab = [_identifier(rng) for _ in range(1500)]

    repos: List[str] = []
    paths: List[str] = []
    commits: List[str] = []
    langs: List[str] = []
    contents: List[str] = []
    truth: List[int] = []

    hexdigits = np.array(list("0123456789abcdef"))

    def _commit() -> str:
        return "".join(hexdigits[rng.integers(0, 16, 40)])

    def _add(content: str, group: int, tag: str, i: int) -> None:
        g = int(rng.integers(0, 40))
        repos.append(f"org{g}/repo{g}")
        paths.append(f"src/{tag}_{i}.py")
        commits.append(_commit())
        langs.append(LANGS[int(rng.integers(0, len(LANGS)))])
        contents.append(content)
        truth.append(group)

    n = spec.n_files
    n_exact = int(n * spec.exact_dup_frac)
    n_near = int(n * spec.near_dup_frac)
    n_boiler = int(n * spec.boilerplate_frac)
    n_outlier = int(n * spec.outlier_cluster_frac)
    group_id = 0
    i = 0
    # exact-dup groups of size 2-4
    while n_exact > 0:
        size = int(rng.integers(2, 5))
        size = min(size, n_exact)
        if size < 2:
            break
        base = _render(_base_tokens(rng, spec.tokens_per_doc, vocab), rng)
        for _ in range(size):
            _add(base, group_id, "exact", i)
            i += 1
        group_id += 1
        n_exact -= size

    # near-dup clusters: half compact clusters, half transitive chains
    while n_near > 0:
        size = int(rng.integers(2, 6))
        size = min(size, n_near)
        if size < 2:
            break
        toks = _base_tokens(rng, spec.tokens_per_doc, vocab)
        chain = rng.random() < 0.5 and size >= 3
        prev = toks
        for j in range(size):
            if j == 0:
                cur = toks
            elif chain:
                cur = _mutate(prev, spec.chain_step_rate, rng, vocab)
                prev = cur
            else:
                cur = _mutate(toks, spec.mutation_rate, rng, vocab)
            _add(_render(cur, rng), group_id, "near", i)
            i += 1
        group_id += 1
        n_near -= size

    # boilerplate: unique bodies sharing the big license header (band skew)
    for _ in range(n_boiler):
        body = _render(_base_tokens(rng, spec.tokens_per_doc, vocab), rng)
        _add(BOILERPLATE_HEADER + body, -1, "boiler", i)
        i += 1

    # outlier clusters: tight core + one farther member (Case 4 shape)
    while n_outlier > 0:
        size = min(max(4, int(rng.integers(4, 7))), n_outlier)
        if size < 4:
            for _ in range(n_outlier):
                _add(_render(_base_tokens(rng, spec.tokens_per_doc, vocab), rng), -1, "single", i)
                i += 1
            n_outlier = 0
            break
        toks = _base_tokens(rng, spec.tokens_per_doc, vocab)
        for j in range(size - 1):
            cur = toks if j == 0 else _mutate(toks, spec.mutation_rate * 0.5, rng, vocab)
            _add(_render(cur, rng), group_id, "outl", i)
            i += 1
        far = _mutate(toks, spec.mutation_rate * 3.5, rng, vocab)
        _add(_render(far, rng), group_id, "outl", i)
        i += 1
        group_id += 1
        n_outlier -= size

    # singletons fill whatever quota remains so the total is exactly n_files
    while len(contents) < n:
        _add(_render(_base_tokens(rng, spec.tokens_per_doc, vocab), rng), -1, "single", i)
        i += 1

    ids = [f"{r}:{p}@{c}" for r, p, c in zip(repos, paths, commits)]
    corpus = pa.table(
        {
            "repo": pa.array(repos, pa.string()),
            "path": pa.array(paths, pa.string()),
            "commit": pa.array(commits, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "content": pa.array(contents, pa.large_string()),
        },
        schema=SOURCE_SCHEMA,
    )
    truth_t = pa.table(
        {"id": pa.array(ids, pa.string()), "truth_group": pa.array(truth, pa.int64())}
    )
    return corpus, truth_t


def write_corpus(out_dir: str, spec: CorpusSpec = CorpusSpec(), shards: int = 4) -> str:
    """Write the corpus as ``shards`` Parquet files (resumable-input layout)
    plus ``truth.parquet``.  Returns ``out_dir``."""
    import os

    import pyarrow.parquet as pq

    corpus, truth_t = generate_corpus(spec)
    os.makedirs(out_dir, exist_ok=True)
    n = corpus.num_rows
    per = max(1, (n + shards - 1) // shards)
    for s in range(shards):
        lo = s * per
        if lo >= n:
            break
        pq.write_table(corpus.slice(lo, per), os.path.join(out_dir, f"part-{s:05d}.parquet"))
    pq.write_table(truth_t, os.path.join(out_dir, "truth.parquet"))
    return out_dir
