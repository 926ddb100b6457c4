"""textops pipelines: df-capped n-gram Jaccard (skew-safe) and the
size-gated pair-content attach used by common_span_pairs."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data

from lasvdedup_ray.pipelines.textops import (
    SHINGLE_K,
    common_span_pairs,
    ngram_jaccard_pairs,
)
from lasvdedup_ray.stages.verify import attach_pair_contents


@pytest.fixture(scope="module")
def doc_dir(tmp_path_factory):
    """Synthetic documents: one shared boilerplate sentence across ALL docs
    (a hot shingle set exceeding any small df cap), plus planted near-dup
    pairs and unique tails."""
    rng = np.random.default_rng(11)
    boiler = "COMMON LICENSE HEADER ALL RIGHTS RESERVED FOREVER AND EVER. "

    def body(seed):
        r = np.random.default_rng(seed)
        return " ".join(f"w{int(x):05d}" for x in r.integers(0, 10**6, 60))

    texts, ids = [], []
    for i in range(40):
        texts.append(boiler + body(i))
        ids.append(i)
    # planted near-dup pair: same body, tiny suffix difference
    shared = body(999)
    texts.append(boiler + shared + " tail_one")
    ids.append(100)
    texts.append(boiler + shared + " tail_two")
    ids.append(101)
    d = tmp_path_factory.mktemp("ngramdocs")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * len(ids), pa.string()),
            }
        ),
        str(d / "documents.parquet"),
    )
    return str(d)


def test_ngram_df_cap_suppresses_boilerplate(doc_dir):
    """With df_cap below the corpus size, the ubiquitous boilerplate
    shingles are excluded: only the planted near-dup pair survives, and no
    O(m^2) bucket is expanded (42 docs share the hot shingles; uncapped
    that bucket alone is ~861 pairs)."""
    out = ngram_jaccard_pairs(doc_dir, threshold=0.5, df_cap=8).to_pandas()
    assert list(zip(out["id_a"], out["id_b"])) == [(100, 101)]


def test_ngram_df_cap_oracle_parity(doc_dir):
    """The capped pipeline must equal a brute-force pandas oracle applying
    the identical df cutoff (the cap is part of the query semantics)."""
    df_cap = 8
    docs = pq.read_table(f"{doc_dir}/documents.parquet").to_pandas()
    sets = {}
    for did, txt in zip(docs["doc_id"], docs["text"]):
        n = len(txt)
        sh = {txt} if n < SHINGLE_K else {txt[i : i + SHINGLE_K] for i in range(n - SHINGLE_K + 1)}
        sets[did] = sh
    from collections import Counter

    df_count = Counter(s for sh in sets.values() for s in sh)
    kept = {d: {s for s in sh if df_count[s] <= df_cap} for d, sh in sets.items()}
    expected = []
    ids = sorted(kept)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(kept[a] & kept[b])
            union = len(kept[a] | kept[b])
            if union and inter / union >= 0.5:
                expected.append((a, b, round(inter / union * 1e6)))
    out = ngram_jaccard_pairs(doc_dir, threshold=0.5, df_cap=df_cap).to_pandas()
    got = list(zip(out["id_a"], out["id_b"], out["jaccard_e6"]))
    assert sorted(got) == sorted(expected)


def test_common_span_pairs_runs(doc_dir):
    out = common_span_pairs(doc_dir, threshold=0.5).to_pandas()
    # the planted pair shares boiler + body(999): a long common span
    assert set(zip(out["id_a"], out["id_b"])) == {(100, 101)}
    assert int(out["lcs_len"].iloc[0]) >= 300


def test_attach_pair_contents_paths_agree(doc_dir):
    docs = ray.data.read_parquet(f"{doc_dir}/documents.parquet", columns=["doc_id", "text"])
    pairs = ray.data.from_arrow(
        pa.table(
            {
                "id_a": pa.array([0, 1, 100], pa.int64()),
                "id_b": pa.array([2, 3, 101], pa.int64()),
            }
        )
    )
    a = attach_pair_contents(pairs, docs, id_col="doc_id").to_pandas()
    b = attach_pair_contents(pairs, docs, id_col="doc_id", driver_cap=0).to_pandas()
    cols = ["id_a", "id_b", "text_a", "text_b"]
    a = a[cols].sort_values(["id_a", "id_b"]).reset_index(drop=True)
    b = b[cols].sort_values(["id_a", "id_b"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_simhash_pigeonhole_guarantee(doc_dir):
    """Every pair within max_hamming bits MUST be found: banding uses
    max_hamming+1 slices (ADVICE r1 — 4 quadrants only guaranteed hd<=3).
    Checked structurally: a 64-bit hash with max_hamming flipped bits,
    one per slice boundary region, still shares a slice."""
    import itertools

    from lasvdedup_ray.pipelines import textops

    max_h = 8
    n_slices = min(max_h + 1, 64)
    base_w, extra = divmod(64, n_slices)
    widths = [base_w + (1 if i < extra else 0) for i in range(n_slices)]
    assert sum(widths) == 64 and len(widths) == max_h + 1
    # adversarial: flip one bit in max_h distinct slices -> one slice intact
    shifts = [sum(widths[:i]) for i in range(n_slices)]
    for flip_set in itertools.combinations(range(n_slices), max_h):
        untouched = set(range(n_slices)) - set(flip_set)
        assert untouched  # pigeonhole: at least one slice shared


def test_simhash_bucket_cap_skew(doc_dir):
    """VERDICT r2 #3: a hot slice bucket must not expand O(m^2).  With the
    cap forced tiny, the query still completes, emits canonical
    (id_a < id_b) unique pairs, and keeps the planted near-dup pair —
    its members are SimHash-adjacent, so the neighbor chain links them."""
    from lasvdedup_ray.pipelines.textops import simhash_near_pairs

    capped = simhash_near_pairs(doc_dir, bucket_cap=4, cap_neighbors=3).to_pandas()
    assert (capped["id_a"] < capped["id_b"]).all()
    assert not capped.duplicated(["id_a", "id_b"]).any()
    full = simhash_near_pairs(doc_dir).to_pandas()
    # chained emission can only lose pairs, never invent them
    full_set = set(zip(full["id_a"], full["id_b"]))
    assert set(zip(capped["id_a"], capped["id_b"])) <= full_set
    if (100, 101) in full_set:
        assert ((capped["id_a"] == 100) & (capped["id_b"] == 101)).any()


def test_bpe_token_counts_values():
    from lasvdedup_ray.functions.text import bpe_token_counts

    col = pa.array(["I'll see 42 cats!", "", "a b", "__x__"])
    # "I"|"'ll"|" see"|" 42"|" cats"|"!" = 6; ""=0; "a"|" b"=2;
    # "__"|"x"|"__" = 3
    assert bpe_token_counts(col).to_pylist() == [6, 0, 2, 3]


def test_token_counts_docs_query(doc_dir):
    from lasvdedup_ray.pipelines.textops import token_counts_docs

    out = token_counts_docs(doc_dir).to_pandas()
    assert len(out) == 42
    assert (out["n_bpe_tokens"] > 0).all() and (out["n_ws_tokens"] > 0).all()
    assert list(out["doc_id"]) == sorted(out["doc_id"])


def test_span_dedup_docs_matches_bruteforce(doc_dir):
    """span_dedup_docs == a driver-side brute-force first-occurrence pass
    (same window, same (doc_id, seq) ordering, same reassembly)."""
    from lasvdedup_ray.pipelines.textops import SPAN_WORDS, span_dedup_docs

    res = span_dedup_docs(doc_dir).to_pandas().sort_values("doc_id").reset_index(drop=True)

    docs = pq.read_table(f"{doc_dir}/documents.parquet").to_pandas()
    docs = docs.sort_values("doc_id").reset_index(drop=True)
    seen: set = set()
    exp = []
    for _, row in docs.iterrows():
        words = row["text"].split(" ")
        n_spans = -(-len(words) // SPAN_WORDS)
        kept = []
        for s in range(n_spans):
            p = " ".join(words[s * SPAN_WORDS : (s + 1) * SPAN_WORDS])
            if p not in seen:
                seen.add(p)
                kept.append(p)
        exp.append(
            {
                "doc_id": row["doc_id"],
                "clean_text": " ".join(kept),
                "n_spans": n_spans,
                "n_kept": len(kept),
            }
        )
    exp = pd.DataFrame(exp)
    pd.testing.assert_frame_equal(res[exp.columns.tolist()], exp)
    # dedup fired: the planted shared-body pair and the boilerplate head
    # must lose spans somewhere
    assert (res["n_kept"] < res["n_spans"]).any()


def test_span_dedup_all_spans_lost(tmp_path):
    """An exact-duplicate doc loses EVERY span to the earlier copy: the
    co-group reassembly must still emit its row with clean_text == '' and
    n_kept == 0 (the left-outer semantics of the old join path)."""
    from lasvdedup_ray.pipelines.textops import SPAN_WORDS, span_dedup_docs

    base = " ".join(f"tok{i:03d}" for i in range(SPAN_WORDS * 3))
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": pa.array(
                    [base, base, "entirely different words here"], pa.string()
                ),
                "lang": pa.array(["en"] * 3, pa.string()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    res = (
        span_dedup_docs(str(tmp_path))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(res["doc_id"]) == [1, 2, 3]
    assert res.loc[0, "clean_text"] == base and res.loc[0, "n_kept"] == 3
    assert res.loc[1, "clean_text"] == "" and res.loc[1, "n_kept"] == 0
    assert res.loc[1, "n_spans"] == 3
    assert res.loc[2, "n_kept"] == 1


def test_incremental_dedup_planted(tmp_path):
    """Incoming (odd doc_id) docs dedup against the index (even doc_id):
    cross-parity matches drop, surviving in-batch dups collapse to
    min(doc_id) with a copy count, index-only dups are irrelevant."""
    from lasvdedup_ray.pipelines.textops import incremental_dedup_docs

    texts = {
        0: "alpha corpus text",      # index
        2: "beta corpus text",       # index
        4: "beta corpus text",       # index dup of 2 (must not matter)
        1: "alpha corpus text",      # incoming, matches index -> dropped
        3: "gamma fresh text",       # incoming, fresh
        5: "gamma fresh text",       # incoming dup of 3 -> collapses
        7: "delta fresh text",       # incoming, fresh, unique
        9: "beta corpus text",       # incoming, matches index -> dropped
    }
    d = tmp_path / "docs"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(sorted(texts), pa.int64()),
                "text": pa.array([texts[k] for k in sorted(texts)], pa.string()),
            }
        ),
        str(d / "documents.parquet"),
    )
    res = incremental_dedup_docs(str(d)).to_pandas()
    assert list(res["doc_id"]) == [3, 7]
    assert list(res["n_copies"]) == [2, 1]


def test_normalized_dedup_planted(tmp_path):
    """Case/punctuation/spacing variants collapse to one normalized form;
    genuinely different texts survive."""
    from lasvdedup_ray.pipelines.textops import normalized_dedup_docs

    texts = [
        "Hello, World!",          # 0
        "hello   world",          # 1 -> dup of 0
        "HELLO-WORLD.",           # 2 -> dup of 0
        "goodbye world",          # 3
        "  hello world  ",        # 4 -> dup of 0
        "hello world 2",          # 5
    ]
    d = tmp_path / "docs"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        ),
        str(d / "documents.parquet"),
    )
    res = normalized_dedup_docs(str(d)).to_pandas()
    assert list(res["doc_id"]) == [0, 3, 5]
    assert list(res["n_copies"]) == [4, 1, 1]


def test_vocab_top_tokens_tiebreak(tmp_path):
    """Top-K boundary falls inside a count tie: lexicographic token order
    must decide, and partial counts must sum across batches/docs."""
    from lasvdedup_ray.pipelines.textops import VOCAB_TOP_K, vocab_top_tokens

    hi = [f"a{i:03d}" for i in range(50)]    # count 3 each
    lo = [f"b{i:03d}" for i in range(100)]   # count 2 each -> tie at K=100
    docs = [
        " ".join(hi) + " " + " ".join(lo),
        " ".join(hi) + " " + " ".join(lo),
        " ".join(hi).upper(),                # lowercased -> third count
    ]
    d = tmp_path / "docs"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(docs)), pa.int64()),
                "text": pa.array(docs, pa.string()),
            }
        ),
        str(d / "documents.parquet"),
    )
    res = vocab_top_tokens(str(d)).to_pandas()
    assert len(res) == VOCAB_TOP_K
    assert list(res["tok"][:50]) == hi and set(res["n"][:50]) == {3}
    assert list(res["tok"][50:]) == lo[:50] and set(res["n"][50:]) == {2}


def test_incremental_neardup_parity(tmp_path):
    """Only mixed-parity (incoming vs index) near-dup pairs count: an
    incoming-incoming near-dup pair is ignored; dissimilar incoming docs
    don't appear."""
    from lasvdedup_ray.pipelines.textops import incremental_neardup_docs

    rng = np.random.default_rng(3)

    def body(seed):
        r = np.random.default_rng(seed)
        return " ".join(f"w{int(x):05d}" for x in r.integers(0, 10**6, 60))

    base = body(1)
    texts = {
        0: base,                       # index
        1: base + " tailx",            # incoming ~ index 0 -> near-dup
        3: body(2),                    # incoming, unique
        5: body(4) + " zz",            # incoming, near-dup of 7 ONLY
        7: body(4),                    # incoming (odd) -> same parity, ignored
        2: body(9),                    # index, unique
    }
    d = tmp_path / "docs"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(sorted(texts), pa.int64()),
                "text": pa.array([texts[k] for k in sorted(texts)], pa.string()),
            }
        ),
        str(d / "documents.parquet"),
    )
    res = incremental_neardup_docs(str(d)).to_pandas()
    assert list(res["doc_id"]) == [1]
    assert list(res["n_partners"]) == [1]


def test_jaccard_cluster_transitive(tmp_path):
    """Planted chain A~B~C (A!~C directly) must land in ONE cluster labeled
    min(doc_id); unrelated docs stay singletons labeled themselves."""
    from lasvdedup_ray.pipelines.textops import jaccard_cluster_docs

    rng = np.random.default_rng(5)

    def words(seed, n):
        r = np.random.default_rng(seed)
        return [f"w{int(x):05d}" for x in r.integers(0, 10**6, n)]

    base = words(77, 80)
    a = " ".join(base)
    b = " ".join(base[20:] + words(88, 20))     # high overlap with a and c
    c = " ".join(base[40:] + words(88, 20) + words(99, 20))
    lone = " ".join(words(123, 80))
    d = tmp_path / "docs"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([3, 7, 11, 20], pa.int64()),
                "text": pa.array([a, b, c, lone], pa.string()),
                "lang": pa.array(["en"] * 4, pa.string()),
            }
        ),
        str(d / "documents.parquet"),
    )
    out = jaccard_cluster_docs(str(d), threshold=0.3).to_pandas()
    got = dict(zip(out["doc_id"], out["cluster_id"]))
    assert got[20] == 20  # singleton labels itself
    # the chain is one component labeled by its min member
    assert got[3] == got[7] == got[11] == 3


def test_bm25_topk_matches_bruteforce(tmp_path):
    """bm25_topk matches a plain-Python BM25 reference (same +1-idf
    variant, same tokenization, same e6 quantization, same tie-break)
    on a planted corpus exercising tf saturation and length norm."""
    import math

    from lasvdedup_ray.pipelines.textops import (
        BM25_B,
        BM25_K1,
        BM25_QUERIES,
        BM25_TOP_K,
        bm25_topk,
    )

    rng = np.random.default_rng(7)
    terms = sorted({w for q in BM25_QUERIES.values() for w in q})
    filler = [f"f{i:03d}" for i in range(30)]
    docs = []
    for i in range(60):
        words = list(rng.choice(filler, size=int(rng.integers(5, 80))))
        # plant query terms with varying tf so ranks differ
        for t in terms:
            words += [t] * int(rng.integers(0, 4))
        rng.shuffle(words)
        docs.append(" ".join(words))
    docs.append("")  # empty doc: counts toward N, no tokens
    d = tmp_path / "docs"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(docs)), pa.int64()),
                "text": pa.array(docs, pa.string()),
            }
        ),
        str(d / "documents.parquet"),
    )

    # brute-force reference
    toks = [[w for w in t.lower().split(" ") if w] for t in docs]
    N = len(docs)
    avgdl = sum(len(t) for t in toks) / N
    df = {w: sum(w in t for t in toks) for w in terms}
    expected = {}
    for qid, qterms in BM25_QUERIES.items():
        scores = []
        for i, t in enumerate(toks):
            # per-term e6 quantization BEFORE the sum (engine convention)
            s_e6 = 0
            for w in qterms:
                tf = t.count(w)
                if tf == 0 or df[w] == 0:
                    continue
                idf = math.log(1.0 + (N - df[w] + 0.5) / (df[w] + 0.5))
                c = idf * tf * (BM25_K1 + 1.0) / (
                    tf + BM25_K1 * (1.0 - BM25_B + BM25_B * len(t) / avgdl)
                )
                s_e6 += int(math.floor(c * 1e6 + 0.5))
            if s_e6 > 0:
                scores.append((s_e6, i))
        scores.sort(key=lambda p: (-p[0], p[1]))
        expected[qid] = scores[:BM25_TOP_K]

    out = bm25_topk(str(d)).to_pandas()
    for qid in BM25_QUERIES:
        sub = out[out["query_id"] == qid]
        got = list(zip(sub["score_e6"], sub["doc_id"]))
        assert got == expected[qid], f"query {qid}"


def test_doc_length_quantiles_planted(tmp_path):
    """Lower discrete quantile on a planted distribution: 100 docs of
    lengths 1..100 per lang -> p50=50, p90=90, p99=99 exactly."""
    from lasvdedup_ray.pipelines.textops import doc_length_quantiles

    d = tmp_path / "docs"
    d.mkdir()
    langs = ["aa"] * 100 + ["bb"] * 10
    lens = list(range(1, 101)) + [7] * 10
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(langs)), pa.int64()),
                "lang": pa.array(langs, pa.string()),
                "n_chars": pa.array(lens, pa.int64()),
            }
        ),
        str(d / "documents.parquet"),
    )
    out = doc_length_quantiles(str(d)).to_pandas()
    got = {(r.lang, r.q_pct): r.n_chars for r in out.itertuples()}
    assert got == {
        ("aa", 50): 50, ("aa", 90): 90, ("aa", 99): 99,
        ("bb", 50): 7, ("bb", 90): 7, ("bb", 99): 7,
    }
    assert set(out[out["lang"] == "aa"]["n_docs"]) == {100}


def test_dup_rate_by_source_token_set(tmp_path):
    """Token-set identity: reordered copies count as dups, docs with a
    genuinely different vocabulary do not."""
    from lasvdedup_ray.pipelines.textops import dup_rate_by_source

    d = tmp_path / "docs"
    d.mkdir()
    rows = [
        ("s1", "alpha beta gamma"),
        ("s1", "gamma beta alpha alpha"),   # same token set, reordered + rep
        ("s1", "delta epsilon"),
        ("s2", "beta alpha gamma"),         # same set again, third source copy
        ("s2", "zeta eta theta"),
    ]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(rows)), pa.int64()),
                "source": pa.array([r[0] for r in rows], pa.string()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        ),
        str(d / "documents.parquet"),
    )
    out = dup_rate_by_source(str(d)).to_pandas()
    got = {r.source: (r.n_docs, r.n_dup_docs, r.dup_rate_e6) for r in out.itertuples()}
    assert got == {"s1": (3, 2, 666667), "s2": (2, 1, 500000)}


def test_tfidf_source_terms_planted(tmp_path):
    """A token unique to one source must outrank corpus-wide tokens
    (idf=ln(1)=0 for universal terms), with the token tie-break pinned."""
    from lasvdedup_ray.pipelines.textops import TFIDF_TOP_K, tfidf_source_terms

    d = tmp_path / "docs"
    d.mkdir()
    rows = [
        ("sA", "common common unique_a common filler1"),
        ("sA", "common filler2"),
        ("sB", "common unique_b unique_b filler1"),
        ("sB", "common filler2"),
    ]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(rows)), pa.int64()),
                "source": pa.array([r[0] for r in rows], pa.string()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        ),
        str(d / "documents.parquet"),
    )
    out = tfidf_source_terms(str(d)).to_pandas()
    top = out.groupby("source").first()
    assert top.loc["sA", "tok"] == "unique_a"
    assert top.loc["sB", "tok"] == "unique_b"
    # universal terms score exactly 0 (idf = ln(1))
    zero = out[out["tok"] == "common"]
    assert (zero["tfidf_e6"] == 0).all()
    assert (out.groupby("source").size() <= TFIDF_TOP_K).all()


def test_tfidf_wide_vocab_partitioned_df(tmp_path):
    """Wide-vocabulary stress for the in-partition df plan (VERDICT r3 #3):
    many tokens unique to one source spread across every df partition, df
    computed without the vocabulary ever touching the driver.  Compared
    against a direct pandas TF-IDF oracle on the winning rows."""
    import math

    from lasvdedup_ray.pipelines.textops import TFIDF_TOP_K, tfidf_source_terms

    d = tmp_path / "docs"
    d.mkdir()
    n_sources = 6
    vocab_per_source = 300  # 1800 distinct tokens >> partition count (64)
    rows = []
    for s in range(n_sources):
        uniq = " ".join(f"tok_s{s}_{i}" for i in range(vocab_per_source))
        rows.append((f"s{s}", f"shared {uniq} shared"))
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(rows)), pa.int64()),
                "source": pa.array([r[0] for r in rows], pa.string()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        ),
        str(d / "documents.parquet"),
    )
    out = tfidf_source_terms(str(d)).to_pandas()
    # every source's winners are its own unique tokens (idf = ln(6)),
    # scored tf=1 * ln(6); 'shared' scores 0 and never wins
    expect_e6 = int(math.floor(math.log(n_sources) * 1e6 + 0.5))
    assert len(out) == n_sources * TFIDF_TOP_K
    for s in range(n_sources):
        mine = out[out["source"] == f"s{s}"]
        assert (mine["tfidf_e6"] == expect_e6).all()
        assert mine["tok"].str.startswith(f"tok_s{s}_").all()
        # deterministic token tie-break: lexicographically smallest first
        assert list(mine["tok"]) == sorted(mine["tok"])[:TFIDF_TOP_K]


def test_bloom_decontam_never_misses(ray_session, tmp_path):
    """Bloom decontamination is conservative: every TRUE benchmark-overlap
    shingle is flagged (no false negatives by construction); a doc that is
    a verbatim copy of a benchmark doc has all its grams flagged; docs
    shorter than the shingle width are skipped on both engines."""
    import pyarrow.parquet as pq

    from lasvdedup_ray.pipelines.textops import (
        bloom_decontam_docs,
        decontam_overlap,
    )

    texts = {}
    # benchmark slice = doc_ids 0..1 (cut = 20 // 10 = 2)
    texts[0] = "the quick brown fox jumps over the lazy dog again and again"
    texts[1] = "pack my box with five dozen liquor jugs for the contest"
    # train docs
    texts[2] = texts[0]  # verbatim benchmark copy -> all grams flagged
    texts[3] = "completely different content zebra quartz mythic jungle"
    texts[4] = "tiny"  # < 8 chars -> skipped
    for i in range(5, 20):
        texts[i] = f"unique filler text number {i} with enough length to shingle"
    t = pa.table(
        {
            "doc_id": pa.array(sorted(texts), pa.int64()),
            "text": pa.array([texts[i] for i in sorted(texts)]),
            "lang": pa.array(["en"] * 20),
            "source": pa.array(["s"] * 20),
            "n_chars": pa.array([len(texts[i]) for i in sorted(texts)], pa.int64()),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    bloom = bloom_decontam_docs(str(tmp_path)).to_pandas().set_index("doc_id")
    exact = decontam_overlap(str(tmp_path)).to_pandas().set_index("doc_id")

    assert 4 not in bloom.index  # sub-shingle-width doc skipped
    # verbatim copy: every distinct gram flagged
    assert bloom.loc[2, "n_flagged"] == bloom.loc[2, "n_grams"]
    # conservativeness: flagged >= exact overlap for every probed doc
    for did, row in exact.iterrows():
        if did in bloom.index:
            assert bloom.loc[did, "n_flagged"] >= row["n_overlap"], did
