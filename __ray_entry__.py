"""Driver contract for the graft builder (Ray Data target).

The driver calls ``ray.init`` itself before importing this module; nothing
here (or in ``lasvdedup_ray``) calls ``ray.init``/``ray.shutdown``.

``queries()`` maps operator names (SURVEY.md §2 coverage) to callables over
``sf_dir``; ``oracle_sql()`` gives the DuckDB-equivalent SQL with IDENTICAL
column names, rounding, and tie-breaks.  Entries without SQL (minhash /
simhash / LSH / langid / fingerprints) get the driver's rows-only check and
are instead pinned by the in-repo pytest oracles (tests/test_e2e.py).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

TOKEN_RE = "[A-Za-z0-9_]+"


def entry() -> Any:
    """Flagship: MinHash/LSH near-dup clustering over sf0.001 documents."""
    from lasvdedup_ray.pipelines.docdedup import minhash_dedup_docs

    return minhash_dedup_docs("/root/testdata/sf0.001", num_partitions=4)


def queries() -> dict[str, Callable[[str], Any]]:
    from lasvdedup_ray.pipelines import (
        ann,
        curation,
        docdedup,
        media,
        relational,
        textops,
        windows,
    )

    # Dict order = the order the driver's correctness gate runs them.  The
    # gate has truncated at 50 entries two rounds running (time budget on
    # a degraded host), so the block it did NOT reach in round 4 — the 11
    # tail entries below, which ride on their r3 green rows — runs FIRST
    # this round (VERDICT r4 item 2), then the r4-new embedding/media
    # block, then the rest roughly cheapest-first so any truncation costs
    # the fewest stale rows.
    return {
        # round-4 unchecked tail (rotate to the front)
        "order_price_quantiles": relational.order_price_quantiles,
        "ngram_jaccard_pairs": textops.ngram_jaccard_pairs,
        "q1_pricing_summary": relational.q1_pricing_summary,
        "q5_nation_revenue": relational.q5_nation_revenue,
        "events_hourly": relational.events_hourly,
        "bm25_topk": textops.bm25_topk,
        "events_by_type": relational.events_by_type,
        "jaccard_cluster_docs": textops.jaccard_cluster_docs,
        "q3_top_orders": relational.q3_top_orders,
        "span_dedup_docs": textops.span_dedup_docs,
        "incremental_neardup_docs": textops.incremental_neardup_docs,
        # NEW r5: incremental near-dup through the persisted shingle index
        "incremental_index_neardup": textops.incremental_index_neardup,
        # NEW r5: DSIR data-selection importance weights
        "dsir_weights": curation.dsir_weights,
        # NEW r5: CCNet-style hashed bigram-LM quality scoring
        "lm_perplexity_docs": curation.lm_perplexity_docs,
        # NEW r5: exact cosine kNN graph over the embedding table
        "knn_graph_embeddings": ann.knn_graph_embeddings,
        # NEW r5: fixed-memory Bloom-filter decontamination
        "bloom_decontam_docs": textops.bloom_decontam_docs,
        # NEW r5: dedup report (cluster-size histogram of the flagship)
        "dedup_cluster_stats": docdedup.dedup_cluster_stats,
        # similarity search + media + decontam + spans (r4 green)
        "embedding_topk": ann.embedding_topk,
        "embedding_topk_ivf": ann.embedding_topk_ivf,
        "embedding_neardup_pairs": ann.embedding_neardup_pairs,
        "embedding_neardup_lsh": ann.embedding_neardup_lsh,
        "embedding_kmeans": ann.embedding_kmeans,
        "semdedup_embeddings": ann.semdedup_embeddings,
        "label_centroids": ann.label_centroids,
        "decontam_overlap": textops.decontam_overlap,
        # multimodal plumbing (deterministic synthetic media corpus;
        # rows-only — binary feature extraction is not SQL-expressible)
        "media_features": media.media_features,
        "media_frame_stats": media.media_frame_stats,
        "media_decoded_stats": media.media_decoded_stats,
        "common_span_pairs": textops.common_span_pairs,
        # text analysis / quality / curation (cheap)
        "quality_filter": textops.quality_filter,
        "doc_stats": textops.doc_stats,
        "token_counts_docs": textops.token_counts_docs,
        "doc_fingerprints": textops.doc_fingerprints,
        "pii_redact_docs": curation.pii_redact_docs,
        "repetition_stats_docs": curation.repetition_stats_docs,
        "hash_sample_stratified": curation.hash_sample_stratified,
        "supplier_balance_stats": relational.supplier_balance_stats,
        "domain_mix_weights": curation.domain_mix_weights,
        "langid_docs": textops.langid_docs,
        "vocab_top_tokens": textops.vocab_top_tokens,
        "lang_quality_summary": textops.lang_quality_summary,
        "hll_distinct_users": relational.hll_distinct_users,
        # relational / windows (mid)
        "purchase_attribution": windows.purchase_attribution,
        "purchase_click_window_join": windows.purchase_click_window_join,
        "top_orders_per_cust": relational.top_orders_per_cust,
        "event_debounce": relational.event_debounce,
        "customers_without_orders": relational.customers_without_orders,
        "normalized_dedup_docs": textops.normalized_dedup_docs,
        "doc_length_quantiles": textops.doc_length_quantiles,
        "props_value_stats": relational.props_value_stats,
        "simhash_near_pairs": textops.simhash_near_pairs,
        "cohort_retention": relational.cohort_retention,
        "brand_revenue": relational.brand_revenue,
        "top_users_by_value": relational.top_users_by_value,
        "user_rolling_value": windows.user_rolling_value,
        "event_funnel": relational.event_funnel,
        "shuffle_export_docs": curation.shuffle_export_docs,
        "quality_classifier_docs": curation.quality_classifier_docs,
        "pack_sequences": curation.pack_sequences,
        "incremental_dedup_docs": textops.incremental_dedup_docs,
        "user_sessions": relational.user_sessions,
        "dup_rate_by_source": textops.dup_rate_by_source,
        "tfidf_source_terms": textops.tfidf_source_terms,
        # dedup family (the flagship-adjacent chains)
        "minhash_dedup_docs": docdedup.minhash_dedup_docs,
        "distinct_users_daily": relational.distinct_users_daily,
        "minhash_dedup_best_quality": docdedup.minhash_dedup_best_quality,
        "exact_dedup_docs": textops.exact_dedup_docs,
    }


def _langid_sql() -> str:
    """Mirror of lasvdedup_ray.functions.text.language_id/stopword_ratio,
    built FROM the same lexicon constants so the two sides cannot drift.
    Tie-break matches the Python argmax: first language in STOPWORDS
    insertion order with the maximum hit count wins; zero hits -> 'und'."""
    from lasvdedup_ray.functions.text import STOPWORDS, TOKEN_REGEX

    langs = list(STOPWORDS)  # en, de, fr, es, it — insertion order
    hit_cols = []
    for lg in langs:
        words = ", ".join(f"'{w}'" for w in sorted(STOPWORDS[lg]))
        hit_cols.append(
            f"len(list_filter(toks, x -> list_contains([{words}], x))) AS h_{lg}"
        )
    all_h = ", ".join(f"h_{lg}" for lg in langs)
    cases = []
    for i, lg in enumerate(langs):
        rest = [f"h_{lg} >= h_{other}" for other in langs[i + 1 :]]
        cond = " AND ".join(rest) if rest else "TRUE"
        cases.append(f"WHEN {cond} THEN '{lg}'")
    case_block = "\n                   ".join(cases[:-1])
    return f"""
        WITH tk AS (
            SELECT doc_id,
                   regexp_extract_all(lower(text), '{TOKEN_REGEX}') AS toks
            FROM documents
        ),
        h AS (
            SELECT doc_id, len(toks) AS n, {", ".join(hit_cols)}
            FROM tk
        )
        SELECT doc_id,
               CASE WHEN greatest({all_h}) = 0 THEN 'und'
                   {case_block}
                   ELSE '{langs[-1]}' END AS lang_pred,
               CAST(round((CASE WHEN n = 0 THEN 0.0
                                ELSE h_en * 1.0 / n END) * 1000000) AS BIGINT)
                   AS en_stopword_ratio_e6
        FROM h ORDER BY doc_id
    """


# ---- generated 64-bit hash-chain SQL (shared by winnow / simhash oracles) --
# The engine's shingle hash is a rolling FNV-multiplier polynomial over the
# text bytes finalized with splitmix64 (lasvdedup_ray/functions/hashing.py).
# These helpers emit the SAME chain as DuckDB SQL, built from the SAME
# constants, so the two engines cannot drift.  64-bit wraparound arithmetic
# runs in HUGEINT with a hi/lo split for the multiplies (a full 64x64
# product overflows HUGEINT); xors/shifts run in UBIGINT.  Assumes ASCII
# text (the documents corpus), where DuckDB's per-character ord() equals
# the UTF-8 byte the numpy kernel hashes.

_M64 = 1 << 64
_GOLD = 0x9E3779B97F4A7C15


def _mul_sql(z: str, c: int) -> str:
    return (
        f"((((({z}) // 4294967296) * {c}::HUGEINT) % 4294967296) * 4294967296"
        f" + (({z}) % 4294967296) * {c}::HUGEINT) % {_M64}"
    )


def _xorshift_sql(z: str, s: int) -> str:
    return (
        f"CAST(xor(CAST({z} AS UBIGINT), CAST(({z}) // {1 << s} AS UBIGINT))"
        f" AS HUGEINT)"
    )


def _poly_sql(k: int, textcol: str) -> str:
    from lasvdedup_ray.functions.hashing import _POLY_MULT

    pows = [pow(int(_POLY_MULT), k - 1 - j, _M64) for j in range(k)]
    return " + ".join(
        f"ord(substr({textcol}, CAST(i+{j} AS INTEGER), 1))::HUGEINT"
        f" * {pows[j]}::HUGEINT"
        for j in range(k)
    )


def _sm64_ctes(src: str, carry: str, tag: str = "") -> str:
    """splitmix64 as a CTE chain: ``src`` must expose columns ``{carry}, z``
    (z = the raw polynomial hash); the final CTE ``smx{tag}`` yields the
    finalized UBIGINT hash.  ``tag`` renames the chain's CTEs so a query
    can apply the finalizer more than once (e.g. the Bloom oracle's
    hash-then-position double chain)."""
    from lasvdedup_ray.functions.hashing import _MIX_M1, _MIX_M2

    return f"""
        s0{tag} AS (SELECT {carry}, (z + {_GOLD}::HUGEINT) % {_M64} AS z FROM {src}),
        s1{tag} AS (SELECT {carry}, {_xorshift_sql("z", 30)} AS z FROM s0{tag}),
        s2{tag} AS (SELECT {carry}, {_mul_sql("z", int(_MIX_M1))} AS z FROM s1{tag}),
        s3{tag} AS (SELECT {carry}, {_xorshift_sql("z", 27)} AS z FROM s2{tag}),
        s4{tag} AS (SELECT {carry}, {_mul_sql("z", int(_MIX_M2))} AS z FROM s3{tag}),
        smx{tag} AS (SELECT {carry}, CAST({_xorshift_sql("z", 31)} AS UBIGINT) AS z
                FROM s4{tag})"""


def _winnow_sql() -> str:
    """Mirror of lasvdedup_ray.functions.text.winnow_fingerprints in pure
    DuckDB SQL (rolling k-gram hash -> sliding-window min -> distinct
    count).  Docs shorter than k, or with <= window k-gram hashes, emit
    exactly one fingerprint in the kernel (min of all hashes / whole-text
    blake2b hash)."""
    k, window = 8, 16  # winnow_fingerprints defaults
    poly = _poly_sql(k, "text")
    return f"""
        WITH pos AS (
            SELECT doc_id, text, length(text) - {k - 1} AS nw,
                   unnest(generate_series(1, length(text) - {k - 1})) AS i
            FROM documents WHERE length(text) >= {k}
        ),
        p0 AS (SELECT doc_id, nw, i, ({poly}) % {_M64} AS z FROM pos),
        {_sm64_ctes("p0", "doc_id, nw, i")},
        wm AS (
            SELECT doc_id, nw, i,
                   min(z) OVER (PARTITION BY doc_id ORDER BY i
                                ROWS BETWEEN CURRENT ROW AND {window - 1} FOLLOWING)
                       AS wmin
            FROM smx
        ),
        big AS (
            SELECT doc_id, count(DISTINCT wmin) AS n_fingerprints
            FROM wm WHERE nw > {window} AND i <= nw - {window - 1} GROUP BY doc_id
        ),
        small AS (
            SELECT DISTINCT doc_id, CAST(1 AS BIGINT) AS n_fingerprints
            FROM documents
            WHERE length(text) < {k} OR length(text) - {k - 1} <= {window}
        )
        SELECT doc_id, n_fingerprints FROM big
        UNION ALL SELECT doc_id, n_fingerprints FROM small
        ORDER BY doc_id
    """


def _simhash_sql() -> str:
    """Mirror of the simhash_near_pairs query in pure DuckDB SQL: the same
    normalization (lowercase + whitespace collapse), the same distinct
    k=5-gram splitmix64 hashes, the same hash-mod shingle sampling with
    its empty-sample fallback, the same strict-majority bit vote — then
    ALL pairs with Hamming distance <= 8 via bit_count(xor()).  This is
    the query's exact semantics; the engine's slice-bucket pigeonhole
    (and its band-cap chaining on skewed buckets, which never triggers at
    oracle scale) is purely an execution strategy."""
    from lasvdedup_ray.config import SignatureConfig

    cfg = SignatureConfig()
    k, mod, max_h = cfg.k, cfg.sample_mod, 8
    poly = _poly_sql(k, "txt")
    bitsums = ", ".join(
        f"sum(CAST((z // {1 << b}) % 2 AS BIGINT)) AS c{b}" for b in range(64)
    )
    simbits = " + ".join(
        f"(CASE WHEN 2*c{b} > n THEN {1 << b}::HUGEINT ELSE 0::HUGEINT END)"
        for b in range(64)
    )
    return f"""
        WITH nm AS (
            SELECT doc_id,
                   regexp_replace(lower(text),
                                  '[ \t\r\n\f\v]+', ' ', 'g') AS txt
            FROM documents
        ),
        pos AS (
            SELECT doc_id, txt,
                   unnest(generate_series(1, length(txt) - {k - 1})) AS i
            FROM nm WHERE length(txt) >= {k}
        ),
        p0 AS (SELECT doc_id, ({poly}) % {_M64} AS z FROM pos),
        {_sm64_ctes("p0", "doc_id")},
        hs AS (SELECT DISTINCT doc_id, z FROM smx),
        stats AS (
            SELECT doc_id, count(*) AS n_all,
                   sum(CASE WHEN z % {mod} = 0 THEN 1 ELSE 0 END) AS n_samp
            FROM hs GROUP BY doc_id
        ),
        sel AS (
            SELECT h.doc_id, h.z
            FROM hs h JOIN stats s ON h.doc_id = s.doc_id
            WHERE (s.n_all > 1 AND s.n_samp >= 1 AND h.z % {mod} = 0)
               OR NOT (s.n_all > 1 AND s.n_samp >= 1)
        ),
        bits AS (
            SELECT doc_id, count(*) AS n, {bitsums}
            FROM sel GROUP BY doc_id
        ),
        sim AS (
            SELECT doc_id, CAST(({simbits}) AS UBIGINT) AS simhash FROM bits
        )
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
        FROM sim a JOIN sim b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_h}
        ORDER BY id_a, id_b
    """


def _pii_sql() -> str:
    """Mirror of lasvdedup_ray.pipelines.curation.pii_redact_docs, built
    from the SAME RE2 patterns and replacement order (pyarrow.compute and
    DuckDB both run RE2, so match/replace semantics agree; DuckDB standard
    strings do not process backslashes, so the patterns drop in verbatim)."""
    from lasvdedup_ray.pipelines.curation import PII_REPLACEMENTS

    red = "text"
    for pat, repl in PII_REPLACEMENTS:
        red = f"regexp_replace({red}, '{pat}', '{repl}', 'g')"
    (email, _), (ipv4, _), (phone, _) = PII_REPLACEMENTS
    return f"""
        SELECT doc_id,
               CAST(len(regexp_extract_all(text, '{email}')) AS BIGINT) AS n_emails,
               CAST(len(regexp_extract_all(text, '{ipv4}')) AS BIGINT) AS n_ips,
               CAST(len(regexp_extract_all(text, '{phone}')) AS BIGINT) AS n_phones,
               length({red}) AS n_chars_redacted,
               sha256({red}) AS redacted_sha
        FROM documents ORDER BY doc_id
    """


def _repetition_sql() -> str:
    """Mirror of curation.repetition_stats_docs: duplicate-line and
    duplicate-token fractions.  Division-before-multiplication matches the
    engine's quantize() operand order exactly."""
    e6 = "CAST(round((({num}) * 1.0 / greatest({den}, 1)) * 1000000) AS BIGINT)"
    return f"""
        WITH l AS (
            SELECT doc_id, unnest(string_split(text, chr(10))) AS line
            FROM documents
        ),
        per_line AS (
            SELECT doc_id, count(*) AS n_lines, sum(length(line)) AS lchars
            FROM l GROUP BY doc_id
        ),
        ul AS (SELECT DISTINCT doc_id, line FROM l),
        per_uline AS (
            SELECT doc_id, count(*) AS n_uline, sum(length(line)) AS ulchars
            FROM ul GROUP BY doc_id
        ),
        tk AS (
            SELECT doc_id, unnest(regexp_extract_all(text, '{TOKEN_RE}')) AS tok
            FROM documents
        ),
        per_tok AS (
            SELECT doc_id, count(*) AS n_tok, count(DISTINCT tok) AS n_utok
            FROM tk GROUP BY doc_id
        )
        SELECT d.doc_id,
               pl.n_lines,
               coalesce(pt.n_tok, 0) AS n_tokens,
               {e6.format(num="pl.n_lines - pu.n_uline", den="pl.n_lines")}
                   AS dup_line_frac_e6,
               {e6.format(num="pl.lchars - pu.ulchars", den="pl.lchars")}
                   AS dup_char_frac_e6,
               {e6.format(num="coalesce(pt.n_tok - pt.n_utok, 0)",
                          den="coalesce(pt.n_tok, 0)")}
                   AS dup_token_frac_e6
        FROM documents d
        JOIN per_line pl ON d.doc_id = pl.doc_id
        JOIN per_uline pu ON d.doc_id = pu.doc_id
        LEFT JOIN per_tok pt ON d.doc_id = pt.doc_id
        ORDER BY d.doc_id
    """


_STRPOLY_MAXP = 520  # feature byte lengths the oracle powers table covers


def _strpoly_ctes(maxp: int = _STRPOLY_MAXP) -> str:
    """Shared CTE chain hashing every distinct feature string in a prior
    CTE ``uf(f)`` with the engine's byte-polynomial + splitmix64
    (``token_poly_hashes`` parity; powers table generated from the SAME
    _POLY_MULT): emits pw/ufc/pr/p0 and ends at ``smx(f, z)``.  A feature
    longer than ``maxp`` bytes raises a loud DuckDB error() instead of
    silently dropping its high-order terms (the engine kernel handles any
    length)."""
    from lasvdedup_ray.functions.hashing import _POLY_MULT

    pows = ", ".join(
        f"{pow(int(_POLY_MULT), e, _M64)}::HUGEINT" for e in range(maxp)
    )
    return f"""
        pw AS (SELECT unnest(generate_series(0, {maxp - 1})) AS e,
                      unnest([{pows}]) AS p),
        ufc AS (SELECT f, unnest(generate_series(1,
                    CASE WHEN length(f) > {maxp}
                         THEN CAST(error('oracle powers table covers {maxp}B; feature longer') AS INTEGER)
                         ELSE length(f) END)) AS j
                FROM uf WHERE length(f) > 0),
        pr AS (SELECT f,
                      sum(ord(substr(f, j::INTEGER, 1))::HUGEINT * pw.p)
                          % {_M64} AS z
               FROM ufc JOIN pw ON pw.e = length(ufc.f) - ufc.j GROUP BY f),
        p0 AS (SELECT f, z FROM pr
               UNION ALL SELECT f, 0::HUGEINT AS z FROM uf WHERE length(f) = 0),
        {_sm64_ctes("p0", "f")}"""


def _dsir_sql() -> str:
    """Mirror of curation.dsir_weights (DSIR, arXiv:2302.03169): identical
    tokenization (string_split of lower(text) on ' '), identical
    unigram+bigram feature set, the engine's rolling-polynomial +
    splitmix64 hash chain rebuilt character-wise from the SAME constants
    (via _strpoly_ctes), identical add-one smoothing and float expression
    order, e6 quantization BEFORE the per-doc sum so the document weights
    are integer-exact on both engines."""
    from lasvdedup_ray.pipelines.curation import (
        DSIR_ALPHA,
        DSIR_BUCKETS,
        DSIR_TARGET_LANG,
    )

    m, a = DSIR_BUCKETS, float(DSIR_ALPHA)
    return f"""
        WITH tk AS (
            SELECT doc_id, lang, string_split(lower(text), ' ') AS ts
            FROM documents
        ),
        uni AS (SELECT doc_id, lang, unnest(ts) AS f FROM tk),
        bi0 AS (SELECT doc_id, lang, ts,
                       unnest(generate_series(1, len(ts) - 1)) AS i FROM tk),
        bi AS (SELECT doc_id, lang, ts[i] || ' ' || ts[i+1] AS f FROM bi0),
        feats AS (
            SELECT doc_id, lang, f FROM uni
            UNION ALL SELECT doc_id, lang, f FROM bi
        ),
        uf AS (SELECT DISTINCT f FROM feats),
        {_strpoly_ctes()},
        fb AS (SELECT f, CAST(z % {m} AS BIGINT) AS b FROM smx),
        cnt AS (SELECT b,
                       count(*) FILTER (WHERE lang = '{DSIR_TARGET_LANG}') AS ct,
                       count(*) AS cr
                FROM feats JOIN fb USING (f) GROUP BY b),
        tot AS (SELECT sum(ct) AS nt, sum(cr) AS nr FROM cnt),
        lrt AS (SELECT b,
                       CAST(round((ln(CAST(ct AS DOUBLE) + {a})
                                   - ln(CAST(nt AS DOUBLE) + {float(m)})
                                   - ln(CAST(cr AS DOUBLE) + {a})
                                   + ln(CAST(nr AS DOUBLE) + {float(m)}))
                                  * 1000000) AS BIGINT) AS lr_e6
                FROM cnt, tot)
        SELECT doc_id, count(*) AS n_feats,
               CAST(sum(lr_e6) AS BIGINT) AS dsir_logratio_e6
        FROM feats JOIN fb USING (f) JOIN lrt USING (b)
        GROUP BY doc_id ORDER BY doc_id
    """


def _bloom_decontam_sql() -> str:
    """Mirror of textops.bloom_decontam_docs: the _doc_shingles codepoint
    chain (length-seeded _SHINGLE_MULT fold + splitmix64 — DuckDB's ord()
    and substr() are codepoint-based like the engine's UTF-32 windows),
    then a SECOND splitmix chain (h + ki) for the k_hashes bit positions;
    a probe shingle is flagged iff all its positions appear in the
    benchmark slice's position set — the register-level-oracle convention,
    so Bloom false positives match bit-for-bit."""
    from lasvdedup_ray.pipelines.textops import (
        _SHINGLE_MULT,
        BLOOM_K_HASHES,
        BLOOM_M_BITS,
        DECONTAM_BENCH_DIVISOR,
        SHINGLE_K,
    )

    k, m, kh = SHINGLE_K, BLOOM_M_BITS, BLOOM_K_HASHES
    M = int(_SHINGLE_MULT)
    seed = (k * pow(M, k, _M64)) % _M64
    pows = [pow(M, k - 1 - j, _M64) for j in range(k)]
    poly = " + ".join(
        f"ord(substr(text, CAST(i+{j} AS INTEGER), 1))::HUGEINT * {pows[j]}::HUGEINT"
        for j in range(k)
    )
    return f"""
        WITH docs8 AS (
            SELECT doc_id, text FROM documents WHERE length(text) >= {k}
        ),
        cut AS (SELECT count(*) // {DECONTAM_BENCH_DIVISOR} AS c FROM documents),
        pos AS (
            SELECT doc_id, text,
                   unnest(generate_series(1, length(text) - {k - 1})) AS i
            FROM docs8
        ),
        p0 AS (SELECT doc_id, ({seed}::HUGEINT + {poly}) % {_M64} AS z FROM pos),
        {_sm64_ctes("p0", "doc_id")},
        hs AS (SELECT DISTINCT doc_id, z AS h FROM smx),
        hp AS (SELECT doc_id, h, unnest(generate_series(0, {kh - 1})) AS ki
               FROM hs),
        p0b AS (SELECT doc_id, h, ki,
                       (CAST(h AS HUGEINT) + ki) % {_M64} AS z FROM hp),
        {_sm64_ctes("p0b", "doc_id, h, ki", tag="b")},
        pp AS (SELECT doc_id, h, ki, CAST(z % {m} AS BIGINT) AS bpos FROM smxb),
        bench_bits AS (
            SELECT DISTINCT bpos FROM pp, cut WHERE doc_id < cut.c
        ),
        probe AS (SELECT doc_id, h, bpos FROM pp, cut WHERE doc_id >= cut.c),
        fl AS (
            SELECT p.doc_id, p.h, count(b.bpos) AS nhit
            FROM probe p LEFT JOIN bench_bits b ON p.bpos = b.bpos
            GROUP BY p.doc_id, p.h
        )
        SELECT doc_id, count(*) AS n_grams,
               CAST(sum(CASE WHEN nhit = {kh} THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_flagged
        FROM fl GROUP BY doc_id ORDER BY doc_id
    """


def _lm_perplexity_sql() -> str:
    """Mirror of curation.lm_perplexity_docs (CCNet-style hashed bigram-LM
    scoring): same tokenization and hash chain as _dsir_sql, counts taken
    over the training-language slice only, the full 0..m-1 bucket domain
    materialized so zero-count buckets quantize exactly like the engine's
    dense vectors, and per-bigram quantized (q_pair - q_ctx) summed as
    integers per document."""
    from lasvdedup_ray.pipelines.curation import LM_BUCKETS, LM_TRAIN_LANG

    m = LM_BUCKETS
    return f"""
        WITH tk AS (
            SELECT doc_id, lang, string_split(lower(text), ' ') AS ts
            FROM documents
        ),
        uni AS (SELECT doc_id, lang, unnest(ts) AS f FROM tk),
        bi0 AS (SELECT doc_id, lang, ts,
                       unnest(generate_series(1, len(ts) - 1)) AS i FROM tk),
        bi AS (SELECT doc_id, lang, ts[i] AS ctx_f,
                      ts[i] || ' ' || ts[i+1] AS pair_f FROM bi0),
        uf AS (SELECT DISTINCT f FROM (
                   SELECT f FROM uni
                   UNION SELECT pair_f AS f FROM bi)),
        {_strpoly_ctes()},
        fb AS (SELECT f, CAST(z % {m} AS BIGINT) AS b FROM smx),
        dom AS (SELECT unnest(generate_series(0, {m - 1})) AS b),
        ctx_cnt AS (
            SELECT fb.b, count(*) AS c FROM uni JOIN fb USING (f)
            WHERE lang = '{LM_TRAIN_LANG}' GROUP BY fb.b),
        pair_cnt AS (
            SELECT fb.b, count(*) AS c
            FROM bi JOIN fb ON fb.f = bi.pair_f
            WHERE lang = '{LM_TRAIN_LANG}' GROUP BY fb.b),
        qc AS (SELECT dom.b,
                      CAST(round(ln(CAST(coalesce(ctx_cnt.c, 0) AS DOUBLE)
                                    + {float(m)}) * 1000000) AS BIGINT) AS q
               FROM dom LEFT JOIN ctx_cnt USING (b)),
        qp AS (SELECT dom.b,
                      CAST(round(ln(CAST(coalesce(pair_cnt.c, 0) AS DOUBLE)
                                    + 1.0) * 1000000) AS BIGINT) AS q
               FROM dom LEFT JOIN pair_cnt USING (b)),
        scored AS (
            SELECT bi.doc_id, qp.q - qc.q AS lp
            FROM bi
            JOIN fb fc ON fc.f = bi.ctx_f
            JOIN fb fp ON fp.f = bi.pair_f
            JOIN qc ON qc.b = fc.b
            JOIN qp ON qp.b = fp.b),
        agg AS (
            SELECT doc_id, count(*) AS n_bigrams,
                   CAST(sum(lp) AS BIGINT) AS lm_logprob_e6
            FROM scored GROUP BY doc_id)
        SELECT d.doc_id,
               coalesce(agg.n_bigrams, 0) AS n_bigrams,
               coalesce(agg.lm_logprob_e6, 0) AS lm_logprob_e6
        FROM documents d LEFT JOIN agg USING (doc_id)
        ORDER BY d.doc_id
    """


def _hash_sample_sql() -> str:
    """Mirror of curation.hash_sample_stratified: the same splitmix64
    chain (via _sm64_ctes) over doc_id, the same per-language keep rates."""
    from lasvdedup_ray.pipelines.curation import SAMPLE_DEFAULT_RATE, SAMPLE_RATES

    cases = " ".join(f"WHEN '{lg}' THEN {r}" for lg, r in SAMPLE_RATES.items())
    return f"""
        WITH p0 AS (
            SELECT doc_id, lang, doc_id::HUGEINT AS z FROM documents
        ),
        {_sm64_ctes("p0", "doc_id, lang")}
        SELECT doc_id, lang FROM smx
        WHERE z % 100 < CASE lang {cases} ELSE {SAMPLE_DEFAULT_RATE} END
        ORDER BY doc_id
    """


def _ngram_pairs_sql() -> str:
    """Shared pair body for ngram_jaccard_pairs and incremental_neardup_docs."""
    return """
            WITH pos AS (
                SELECT doc_id, text,
                       unnest(generate_series(1, greatest(length(text) - 7, 1))) AS i
                FROM documents
            ),
            sh AS (
                SELECT DISTINCT doc_id,
                       CASE WHEN length(text) < 8 THEN text
                            ELSE substr(text, CAST(i AS INTEGER), 8) END AS shingle
                FROM pos
            ),
            -- doc-frequency cap (= lasvdedup_ray NGRAM_DF_CAP): shingles in
            -- more than 128 docs are boilerplate, excluded from the
            -- similarity universe on BOTH engines
            df AS (SELECT shingle, count(*) AS df FROM sh GROUP BY shingle),
            shk AS (
                SELECT sh.doc_id, sh.shingle FROM sh
                JOIN df ON sh.shingle = df.shingle WHERE df.df <= 128
            ),
            sizes AS (SELECT doc_id, count(*) AS sz FROM shk GROUP BY doc_id),
            inter AS (
                SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
                FROM shk a JOIN shk b
                  ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                GROUP BY 1, 2
            )
            SELECT i.id_a, i.id_b,
                   CAST(round(i.inter * 1000000.0 / (sa.sz + sb.sz - i.inter)) AS BIGINT)
                       AS jaccard_e6
            FROM inter i
            JOIN sizes sa ON i.id_a = sa.doc_id
            JOIN sizes sb ON i.id_b = sb.doc_id
            WHERE i.inter * 1.0 / (sa.sz + sb.sz - i.inter) >= 0.5
            ORDER BY i.id_a, i.id_b
    """


def _incremental_index_sql() -> str:
    """Mirror of textops.incremental_index_neardup / state.neardup_index:
    even doc_ids are the persisted index corpus, odd doc_ids the incoming
    batch.  The df cap (NGRAM_DF_CAP=128) applies to INDEX shingles only —
    incoming shingles are probes and never capped; |B| is the index doc's
    KEPT shingle count, |A| the incoming doc's full distinct count."""
    return """
            WITH pos AS (
                SELECT doc_id, text,
                       unnest(generate_series(1, greatest(length(text) - 7, 1))) AS i
                FROM documents
            ),
            sh AS (
                SELECT DISTINCT doc_id,
                       CASE WHEN length(text) < 8 THEN text
                            ELSE substr(text, CAST(i AS INTEGER), 8) END AS shingle
                FROM pos
            ),
            idx AS (SELECT * FROM sh WHERE doc_id % 2 = 0),
            inc AS (SELECT * FROM sh WHERE doc_id % 2 = 1),
            df AS (SELECT shingle, count(*) AS df FROM idx GROUP BY shingle),
            idxk AS (
                SELECT idx.doc_id, idx.shingle FROM idx
                JOIN df ON idx.shingle = df.shingle WHERE df.df <= 128
            ),
            bsz AS (SELECT doc_id, count(*) AS sz FROM idxk GROUP BY doc_id),
            asz AS (SELECT doc_id, count(*) AS sz FROM inc GROUP BY doc_id),
            inter AS (
                SELECT a.doc_id AS in_id, b.doc_id AS idx_id, count(*) AS inter
                FROM inc a JOIN idxk b ON a.shingle = b.shingle
                GROUP BY 1, 2
            )
            SELECT i.in_id AS doc_id, count(*) AS n_partners
            FROM inter i
            JOIN asz ON i.in_id = asz.doc_id
            JOIN bsz ON i.idx_id = bsz.doc_id
            WHERE i.inter * 1.0 / (asz.sz + bsz.sz - i.inter) >= 0.5
            GROUP BY 1 ORDER BY 1
    """


def _textops_vocab_k() -> int:
    from lasvdedup_ray.pipelines.textops import VOCAB_TOP_K

    return VOCAB_TOP_K


def _debounce_sql() -> str:
    """Mirror of relational.event_debounce: keep events whose lag-gap
    within (user_id, event_type) exceeds DEBOUNCE_GAP_S (or the first)."""
    from lasvdedup_ray.pipelines.relational import DEBOUNCE_GAP_S

    return f"""
        WITH e AS (
            -- epoch_us // 1e6: integer floor (epoch(ts)::BIGINT rounds)
            SELECT user_id, event_type,
                   CAST(epoch_us(ts) // 1000000 AS BIGINT) AS ts_s, event_id
            FROM events
        ), l AS (
            SELECT *, lag(ts_s) OVER (
                PARTITION BY user_id, event_type ORDER BY ts_s, event_id
            ) AS prev
            FROM e
        )
        SELECT user_id, event_type, ts_s, event_id FROM l
        WHERE prev IS NULL OR ts_s - prev > {DEBOUNCE_GAP_S}
        ORDER BY user_id, event_type, ts_s, event_id
    """


def _shuffle_export_sql() -> str:
    """Mirror of curation.shuffle_export_docs: the same seeded splitmix64
    chain, shard = hash % n_shards, pos = rank within shard by (hash,
    doc_id)."""
    from lasvdedup_ray.pipelines.curation import SHUFFLE_SEED, SHUFFLE_SHARDS

    return f"""
        WITH p0 AS (
            SELECT doc_id,
                   (doc_id::HUGEINT + {SHUFFLE_SEED}::HUGEINT) % {_M64} AS z
            FROM documents
        ),
        {_sm64_ctes("p0", "doc_id")}
        SELECT doc_id, CAST(z % {SHUFFLE_SHARDS} AS BIGINT) AS shard,
               row_number() OVER (
                   PARTITION BY z % {SHUFFLE_SHARDS} ORDER BY z, doc_id
               ) AS pos
        FROM smx ORDER BY shard, pos
    """


def _span_dedup_sql() -> str:
    """Mirror of textops.span_dedup_docs: fixed word-window spans, global
    first occurrence by (doc_id, seq), reassembly in seq order."""
    from lasvdedup_ray.pipelines.textops import SPAN_WORDS

    return f"""
        WITH words AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS w,
                   generate_subscripts(string_split(text, ' '), 1) AS ws
            FROM documents
        ), spans AS (
            SELECT doc_id, CAST((ws - 1) // {SPAN_WORDS} AS BIGINT) AS seq,
                   string_agg(w, ' ' ORDER BY ws) AS p
            FROM words GROUP BY doc_id, (ws - 1) // {SPAN_WORDS}
        ), firsts AS (
            SELECT doc_id, seq FROM (
                SELECT doc_id, seq,
                       row_number() OVER (PARTITION BY p ORDER BY doc_id, seq) AS rn
                FROM spans) WHERE rn = 1
        ), kept AS (
            SELECT s.doc_id, s.seq, s.p
            FROM spans s JOIN firsts f USING (doc_id, seq)
        ), agg AS (
            SELECT doc_id, string_agg(p, ' ' ORDER BY seq) AS clean_text,
                   count(*) AS n_kept
            FROM kept GROUP BY doc_id
        ), tot AS (
            SELECT doc_id, count(*) AS n_spans FROM spans GROUP BY doc_id
        )
        SELECT d.doc_id, coalesce(a.clean_text, '') AS clean_text,
               t.n_spans, coalesce(a.n_kept, 0) AS n_kept
        FROM documents d
        JOIN tot t USING (doc_id) LEFT JOIN agg a USING (doc_id)
        ORDER BY doc_id
    """


# ---- embedding oracle constant generation ---------------------------------
# The hyperplane-LSH planes are a pure function of the seed; the IVF and
# k-means centroids are deterministic functions of the (seed, data) pair.
# The driver's correctness gate runs at this canonical sf dir, so the
# data-dependent constants are replayed from it with the engine's own
# deterministic numpy trainers and embedded as SQL literals — DuckDB then
# INDEPENDENTLY replays bucketing / assignment / top-k / stats from those
# constants (the "given the engine's own centroids" oracle pattern).

_ORACLE_SF_DIR = "/root/testdata/sf0.01"


def _embedding_dim(sf_dir: str = _ORACLE_SF_DIR) -> int:
    try:
        import pyarrow.parquet as _pq

        pf = _pq.ParquetFile(f"{sf_dir}/embeddings.parquet")
        first = next(pf.iter_batches(batch_size=1, columns=["embedding"]))
        return len(first["embedding"][0])
    except Exception:
        return 64


def _embedding_lsh_sql() -> str:
    """Mirror of ann.embedding_neardup_lsh at driver scale: the 8x6 random
    hyperplanes (np.random.default_rng(42), a pure function of the seed)
    are embedded as literals; DuckDB replays sign-bucketing, the
    (tbl, bkey) self-join, pair dedup, and exact cosine verification.
    Assumes no bucket exceeds ANN_BUCKET_CAP (true at the driver's
    scales; the capped neighbor-chaining path is exercised by pytest)."""
    import numpy as np

    dim = _embedding_dim()
    rng = np.random.default_rng(42)
    planes = rng.standard_normal((8, 6, dim))
    rows = ",\n                ".join(
        f"({t}, {p}, {d + 1}, {planes[t, p, d]:.17g})"
        for t in range(8)
        for p in range(6)
        for d in range(dim)
    )
    return f"""
        WITH pl(tbl, p, d, w) AS (VALUES
                {rows}
        ), x AS (
            SELECT vec_id, unnest(embedding) AS v,
                   generate_subscripts(embedding, 1) AS d
            FROM embeddings
        ), dots AS (
            SELECT x.vec_id, pl.tbl, pl.p, sum(x.v::DOUBLE * pl.w) AS s
            FROM x JOIN pl ON pl.d = x.d
            GROUP BY 1, 2, 3
        ), keys AS (
            SELECT vec_id, tbl,
                   sum(CASE WHEN s >= 0 THEN 1 << p ELSE 0 END) AS bkey
            FROM dots GROUP BY vec_id, tbl
        ), cand AS (
            SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
            FROM keys a JOIN keys b
              ON a.tbl = b.tbl AND a.bkey = b.bkey AND a.vec_id < b.vec_id
        ), ver AS (
            SELECT c.id_a, c.id_b,
                   list_cosine_similarity(
                       CAST(ea.embedding AS DOUBLE[]),
                       CAST(eb.embedding AS DOUBLE[])
                   ) AS cos
            FROM cand c
            JOIN embeddings ea ON ea.vec_id = c.id_a
            JOIN embeddings eb ON eb.vec_id = c.id_b
        )
        SELECT id_a, id_b, round(cos, 6) AS cosine
        FROM ver WHERE cos >= 0.35
        ORDER BY id_a, id_b
    """


def _embedding_ivf_sql() -> str:
    """Mirror of ann.embedding_topk_ivf: the coarse-quantizer centroids are
    replayed with the engine's own deterministic trainer
    (_spherical_kmeans over the first sample_rows rows, seed 42) and
    embedded as literals; DuckDB replays cell assignment, per-query probe
    selection, and the per-query top-k."""
    import inspect

    import numpy as np
    import pyarrow.parquet as _pq

    from lasvdedup_ray.pipelines.ann import _list_matrix, _spherical_kmeans

    sig = inspect.signature(__import__(
        "lasvdedup_ray.pipelines.ann", fromlist=["embedding_topk_ivf"]
    ).embedding_topk_ivf)
    dflt = {k: v.default for k, v in sig.parameters.items()}
    n_queries, k = dflt["n_queries"], dflt["k"]
    n_centroids, n_probe = dflt["n_centroids"], dflt["n_probe"]
    sample_rows, seed = dflt["sample_rows"], dflt["seed"]

    t = _pq.read_table(
        f"{_ORACLE_SF_DIR}/embeddings.parquet", columns=["embedding"]
    )
    smat = _list_matrix(t["embedding"])[:sample_rows]
    nr = np.linalg.norm(smat, axis=1, keepdims=True)
    nr[nr == 0] = 1.0
    cents = _spherical_kmeans(smat / nr, n_centroids, seed)
    probe = min(n_probe, cents.shape[0])
    rows = ",\n                ".join(
        f"({c}, {d + 1}, {cents[c, d]:.17g})"
        for c in range(cents.shape[0])
        for d in range(cents.shape[1])
    )
    return f"""
        WITH cents(cell, d, w) AS (VALUES
                {rows}
        ), x AS (
            SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v,
                   generate_subscripts(embedding, 1) AS d
            FROM embeddings
        ), nrm AS (
            SELECT vec_id,
                   CASE WHEN sqrt(sum(v * v)) = 0 THEN 1
                        ELSE sqrt(sum(v * v)) END AS nr
            FROM x GROUP BY 1
        ), dots AS (
            SELECT x.vec_id, c.cell, sum(x.v * c.w) AS dot
            FROM x JOIN cents c ON c.d = x.d GROUP BY 1, 2
        ), assign AS (
            SELECT vec_id, cell FROM (
                SELECT vec_id, cell, row_number() OVER (
                    PARTITION BY vec_id ORDER BY dot DESC, cell
                ) AS rn FROM dots
            ) WHERE rn = 1
        ), q AS (
            SELECT vec_id AS query_id FROM embeddings
            ORDER BY vec_id LIMIT {n_queries}
        ), qcells AS (
            SELECT query_id, cell FROM (
                SELECT q.query_id, d.cell, row_number() OVER (
                    PARTITION BY q.query_id ORDER BY d.dot DESC, d.cell
                ) AS rn
                FROM q JOIN dots d ON d.vec_id = q.query_id
            ) WHERE rn <= {probe}
        ), cand AS (
            SELECT qc.query_id, a.vec_id
            FROM qcells qc JOIN assign a
              ON a.cell = qc.cell AND a.vec_id <> qc.query_id
        ), pairdot AS (
            SELECT c.query_id, c.vec_id, sum(xa.v * xq.v) AS dp
            FROM cand c
            JOIN x xa ON xa.vec_id = c.vec_id
            JOIN x xq ON xq.vec_id = c.query_id AND xq.d = xa.d
            GROUP BY 1, 2
        ), scored AS (
            SELECT p.query_id, p.vec_id,
                   CAST(round(p.dp / (na.nr * nq.nr) * 1000000) AS BIGINT)
                       AS cosine_e6
            FROM pairdot p
            JOIN nrm na ON na.vec_id = p.vec_id
            JOIN nrm nq ON nq.vec_id = p.query_id
        ), ranked AS (
            SELECT *, row_number() OVER (
                PARTITION BY query_id ORDER BY cosine_e6 DESC, vec_id
            ) AS rn FROM scored
        )
        SELECT query_id, vec_id, cosine_e6 FROM ranked WHERE rn <= {k}
        ORDER BY query_id, cosine_e6 DESC, vec_id
    """


def _embedding_kmeans_sql() -> str:
    """Mirror of ann.embedding_kmeans's FINAL stats pass: the iterated
    centroids are replayed with kmeans_centroids_replay (kept in exact
    lockstep with the distributed run by per-iteration e6 quantization)
    and embedded as literals; DuckDB independently re-derives assignment,
    member counts and mean cosine."""
    from lasvdedup_ray.pipelines.ann import kmeans_centroids_replay

    cents = kmeans_centroids_replay(_ORACLE_SF_DIR)
    rows = ",\n                ".join(
        f"({c}, {d + 1}, {cents[c, d]:.17g})"
        for c in range(cents.shape[0])
        for d in range(cents.shape[1])
    )
    return f"""
        WITH cents(cell, d, w) AS (VALUES
                {rows}
        ), x AS (
            SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v,
                   generate_subscripts(embedding, 1) AS d
            FROM embeddings
        ), nrm AS (
            SELECT vec_id,
                   CASE WHEN sqrt(sum(v * v)) = 0 THEN 1
                        ELSE sqrt(sum(v * v)) END AS nr
            FROM x GROUP BY 1
        ), dots AS (
            SELECT x.vec_id, c.cell, sum(x.v * c.w) AS dot
            FROM x JOIN cents c ON c.d = x.d GROUP BY 1, 2
        ), best AS (
            SELECT d.vec_id, d.cell, d.dot / n.nr AS cos,
                   row_number() OVER (
                       PARTITION BY d.vec_id ORDER BY d.dot DESC, d.cell
                   ) AS rn
            FROM dots d JOIN nrm n USING (vec_id)
        ), agg AS (
            SELECT cell AS cluster_id, count(*) AS n_members,
                   sum(cos) AS cos_sum
            FROM best WHERE rn = 1 GROUP BY 1
        ), cl AS (SELECT DISTINCT cell AS cluster_id FROM cents)
        SELECT c.cluster_id,
               coalesce(a.n_members, 0) AS n_members,
               CAST(round(coalesce(a.cos_sum, 0)
                    / greatest(coalesce(a.n_members, 0), 1) * 1000000)
                    AS BIGINT) AS mean_cos_e6
        FROM cl c LEFT JOIN agg a USING (cluster_id)
        ORDER BY cluster_id
    """


def _semdedup_sql() -> str:
    """Mirror of ann.semdedup_embeddings: the replayed kmeans centroids
    (exact lockstep with the distributed run via per-iteration e6
    quantization) are embedded as literals; DuckDB re-derives the
    assignment, per-row centroid cosine, and the pairwise-dominance drop
    rule (dropped iff a strictly-lower-(cent_cos_e6, vec_id) same-cluster
    row is >= tau-similar)."""
    from lasvdedup_ray.pipelines.ann import SEMDEDUP_TAU, kmeans_centroids_replay

    cents = kmeans_centroids_replay(_ORACLE_SF_DIR)
    rows = ",\n                ".join(
        f"({c}, {d + 1}, {cents[c, d]:.17g})"
        for c in range(cents.shape[0])
        for d in range(cents.shape[1])
    )
    tau_e6 = int(round(SEMDEDUP_TAU * 1e6))
    return f"""
        WITH cents(cell, d, w) AS (VALUES
                {rows}
        ), x AS (
            SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v,
                   generate_subscripts(embedding, 1) AS d
            FROM embeddings
        ), nrm AS (
            SELECT vec_id,
                   CASE WHEN sqrt(sum(v * v)) = 0 THEN 1
                        ELSE sqrt(sum(v * v)) END AS nr
            FROM x GROUP BY 1
        ), dots AS (
            SELECT x.vec_id, c.cell, sum(x.v * c.w) AS dot
            FROM x JOIN cents c ON c.d = x.d GROUP BY 1, 2
        ), best AS (
            SELECT d.vec_id, d.cell, d.dot / n.nr AS cos,
                   row_number() OVER (
                       PARTITION BY d.vec_id ORDER BY d.dot DESC, d.cell
                   ) AS rn
            FROM dots d JOIN nrm n USING (vec_id)
        ), assign AS (
            SELECT vec_id, cell AS cluster_id,
                   CAST(round(cos * 1000000) AS BIGINT) AS cent_cos_e6
            FROM best WHERE rn = 1
        ), dropped AS (
            SELECT DISTINCT pa.vec_id
            FROM assign pa
            JOIN assign pb
              ON pb.cluster_id = pa.cluster_id
             AND (pb.cent_cos_e6 < pa.cent_cos_e6
                  OR (pb.cent_cos_e6 = pa.cent_cos_e6
                      AND pb.vec_id < pa.vec_id))
            JOIN embeddings ea ON ea.vec_id = pa.vec_id
            JOIN embeddings eb ON eb.vec_id = pb.vec_id
            WHERE CAST(round(list_cosine_similarity(
                      CAST(ea.embedding AS DOUBLE[]), CAST(eb.embedding AS DOUBLE[])
                  ) * 1000000) AS BIGINT) >= {tau_e6}
        )
        SELECT a.vec_id, a.cluster_id, a.cent_cos_e6,
               CAST(CASE WHEN d.vec_id IS NULL THEN 1 ELSE 0 END AS BIGINT)
                   AS is_kept
        FROM assign a LEFT JOIN dropped d USING (vec_id)
        ORDER BY a.vec_id
    """


def _common_span_sql() -> str:
    """Mirror of textops.common_span_pairs: for every n-gram-Jaccard
    near-dup pair, the longest common substring via diagonal runs — a
    character match at (i, j) extends a run along diagonal i - j; the
    longest consecutive run IS the LCS (exact, like the engine's
    binary-search + rolling-hash stage).  Tie rule matches the engine:
    smallest offset_a, then smallest offset_b.  Engine offsets are
    0-based byte offsets; the corpus is ASCII so chars == bytes."""
    return f"""
        WITH pairs AS (
            SELECT id_a, id_b FROM ({_ngram_pairs_sql()})
        ), pd AS (
            SELECT p.id_a, p.id_b, da.text AS ta, db.text AS tb
            FROM pairs p
            JOIN documents da ON da.doc_id = p.id_a
            JOIN documents db ON db.doc_id = p.id_b
        ), ca AS (
            SELECT id_a, id_b, i, substr(ta, CAST(i AS INTEGER), 1) AS ch
            FROM (SELECT id_a, id_b, ta,
                         unnest(generate_series(1, length(ta))) AS i
                  FROM pd)
        ), cb AS (
            SELECT id_a, id_b, j, substr(tb, CAST(j AS INTEGER), 1) AS ch
            FROM (SELECT id_a, id_b, tb,
                         unnest(generate_series(1, length(tb))) AS j
                  FROM pd)
        ), m AS (
            SELECT a.id_a, a.id_b, a.i, b.j
            FROM ca a JOIN cb b
              ON a.id_a = b.id_a AND a.id_b = b.id_b AND a.ch = b.ch
        ), runs AS (
            SELECT id_a, id_b, i, j, i - j AS diag,
                   i - row_number() OVER (
                       PARTITION BY id_a, id_b, i - j ORDER BY i
                   ) AS grp
            FROM m
        ), rl AS (
            SELECT id_a, id_b, count(*) AS len, min(i) AS si, min(j) AS sj
            FROM runs GROUP BY id_a, id_b, diag, grp
        ), best AS (
            SELECT id_a, id_b, len, si, sj,
                   row_number() OVER (
                       PARTITION BY id_a, id_b ORDER BY len DESC, si, sj
                   ) AS rn
            FROM rl
        )
        SELECT id_a, id_b, CAST(len AS BIGINT) AS lcs_len,
               CAST(si - 1 AS BIGINT) AS offset_a,
               CAST(sj - 1 AS BIGINT) AS offset_b
        FROM best WHERE rn = 1 AND len >= 1
        ORDER BY id_a, id_b
    """


def _tfidf_sql() -> str:
    """Mirror of textops.tfidf_source_terms (see its docstring for the
    determinism contract)."""
    from lasvdedup_ray.pipelines.textops import TFIDF_TOP_K

    return f"""
        WITH toks AS (
            SELECT source, unnest(string_split(lower(text), ' ')) AS tok
            FROM documents
        ), t2 AS (
            SELECT source, tok FROM toks WHERE tok <> ''
        ), cells AS (
            SELECT source, tok, count(*) AS tf FROM t2 GROUP BY source, tok
        ), stats AS (
            SELECT count(DISTINCT source) AS ns FROM cells
        ), df AS (
            SELECT tok, count(*) AS df FROM cells GROUP BY tok
        ), scored AS (
            SELECT c.source, c.tok,
                   CAST(floor(c.tf * ln(stats.ns * 1.0 / df.df) * 1e6 + 0.5)
                        AS BIGINT) AS tfidf_e6
            FROM cells c JOIN df USING (tok) CROSS JOIN stats
        ), ranked AS (
            SELECT *, row_number() OVER (
                PARTITION BY source ORDER BY tfidf_e6 DESC, tok
            ) AS rn FROM scored
        )
        SELECT source, tok, tfidf_e6 FROM ranked WHERE rn <= {TFIDF_TOP_K}
        ORDER BY source, tfidf_e6 DESC, tok
    """


def _length_quantiles_sql() -> str:
    """Mirror of textops.doc_length_quantiles: lower discrete quantile
    (smallest value whose per-lang cumulative count reaches
    ceil(q * n)) over bounded-domain (lang, n_chars) cells."""
    from lasvdedup_ray.pipelines.textops import LENGTH_QUANTILE_QS

    qvals = ", ".join(f"({int(round(q * 100))})" for q in LENGTH_QUANTILE_QS)
    return f"""
        WITH cells AS (
            SELECT lang, n_chars, count(*) AS n
            FROM documents GROUP BY lang, n_chars
        ), cum AS (
            SELECT lang, n_chars,
                   sum(n) OVER (PARTITION BY lang ORDER BY n_chars) AS cum,
                   sum(n) OVER (PARTITION BY lang) AS total
            FROM cells
        ), q(q_pct) AS (VALUES {qvals})
        SELECT c.lang, CAST(q.q_pct AS BIGINT) AS q_pct,
               min(c.n_chars) AS n_chars,
               CAST(min(c.total) AS BIGINT) AS n_docs
        FROM cum c JOIN q ON c.cum >= ceil(q.q_pct / 100.0 * c.total)
        GROUP BY c.lang, q.q_pct
        ORDER BY c.lang, q.q_pct
    """


def _funnel_sql() -> str:
    """Mirror of relational.event_funnel: per-stage first-completion times
    as a chain of min-ts joins with the engine's strict ``ts > prev``
    advancement rule."""
    from lasvdedup_ray.pipelines.relational import FUNNEL_STAGES

    ctes = [
        f"s1 AS (SELECT user_id, min(ts) AS t FROM events"
        f" WHERE event_type = '{FUNNEL_STAGES[0]}' GROUP BY user_id)"
    ]
    for k in range(1, len(FUNNEL_STAGES)):
        ctes.append(
            f"s{k + 1} AS (SELECT e.user_id, min(e.ts) AS t FROM events e"
            f" JOIN s{k} USING (user_id)"
            f" WHERE e.event_type = '{FUNNEL_STAGES[k]}' AND e.ts > s{k}.t"
            f" GROUP BY e.user_id)"
        )
    selects = " UNION ALL ".join(
        f"SELECT CAST({k + 1} AS BIGINT) AS stage,"
        f" '{stage}' AS event_type,"
        f" (SELECT count(*) FROM s{k + 1}) AS n_users"
        for k, stage in enumerate(FUNNEL_STAGES)
    )
    return f"WITH {', '.join(ctes)} SELECT * FROM ({selects}) ORDER BY stage"


def _hll_sql() -> str:
    """Mirror of relational.hll_distinct_users: the same splitmix64 chain
    over user_id, register = low HLL_P bits, rho = 59 - bit_length of the
    58-bit window (DuckDB ``length(bin(w))``)."""
    from lasvdedup_ray.pipelines.relational import HLL_M, HLL_P

    wmax_bits = 64 - HLL_P + 1
    return f"""
        WITH p0 AS (
            SELECT event_type, user_id::HUGEINT AS z FROM events
        ),
        {_sm64_ctes("p0", "event_type")},
        r AS (
            SELECT event_type,
                   CAST(z % {HLL_M} AS BIGINT) AS register,
                   {wmax_bits} - CASE WHEN z // {HLL_M} = 0 THEN 0
                        ELSE length(bin(z // {HLL_M})) END AS rho
            FROM smx
        )
        SELECT event_type, register, CAST(max(rho) AS BIGINT) AS rho
        FROM r GROUP BY event_type, register
        ORDER BY event_type, register
    """


def _bm25_sql() -> str:
    """Mirror of textops.bm25_topk: Lucene "+1" idf, identical tokenization
    (lower, single-space split, empties dropped), identical quantization
    (each PER-TERM contribution floor(c*1e6 + 0.5) to BIGINT before the
    (query, doc) sum, so both engines sum exact integers — contributions
    are non-negative with the +1 idf), identical top-k tie-break
    (score_e6 desc, doc_id asc)."""
    from lasvdedup_ray.pipelines.textops import (
        BM25_B,
        BM25_K1,
        BM25_QUERIES,
        BM25_TOP_K,
    )

    qvals = ", ".join(
        f"({qid}, '{w}')"
        for qid in sorted(BM25_QUERIES)
        for w in BM25_QUERIES[qid]
    )
    return f"""
        WITH q(query_id, tok) AS (VALUES {qvals}),
        toks AS (
            SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
            FROM documents
        ), toks2 AS (
            SELECT doc_id, tok FROM toks WHERE tok <> ''
        ), stats AS (
            SELECT (SELECT count(*) FROM documents) AS n_docs,
                   (SELECT count(*) FROM toks2) * 1.0
                       / (SELECT count(*) FROM documents) AS avgdl
        ), dl AS (
            SELECT doc_id, count(*) AS dl FROM toks2 GROUP BY doc_id
        ), tf AS (
            SELECT doc_id, tok, count(*) AS tf FROM toks2
            WHERE tok IN (SELECT DISTINCT tok FROM q)
            GROUP BY doc_id, tok
        ), df AS (
            SELECT tok, count(*) AS df FROM tf GROUP BY tok
        ), contrib AS (
            SELECT q.query_id, tf.doc_id,
                   CAST(floor(
                       ln(1.0 + (stats.n_docs - df.df + 0.5) / (df.df + 0.5))
                           * tf.tf * ({BM25_K1} + 1.0)
                           / (tf.tf + {BM25_K1} * (1.0 - {BM25_B}
                                  + {BM25_B} * dl.dl / stats.avgdl))
                           * 1e6 + 0.5
                   ) AS BIGINT) AS c_e6
            FROM tf
            JOIN df USING (tok)
            JOIN dl USING (doc_id)
            JOIN q ON q.tok = tf.tok
            CROSS JOIN stats
        ), scored AS (
            SELECT query_id, doc_id,
                   CAST(sum(c_e6) AS BIGINT) AS score_e6
            FROM contrib GROUP BY query_id, doc_id
        ), ranked AS (
            SELECT *, row_number() OVER (
                PARTITION BY query_id ORDER BY score_e6 DESC, doc_id
            ) AS rn FROM scored
        )
        SELECT query_id, doc_id, score_e6 FROM ranked
        WHERE rn <= {BM25_TOP_K}
        ORDER BY query_id, score_e6 DESC, doc_id
    """


def _pack_sql() -> str:
    """Mirror of curation.pack_sequences: global ordered cumsum window."""
    from lasvdedup_ray.pipelines.curation import PACK_TOKEN_BUDGET

    return f"""
        WITH t AS (
            SELECT doc_id,
                   CAST(len(regexp_extract_all(text, '{TOKEN_RE}')) AS BIGINT) AS tok
            FROM documents
        ),
        c AS (
            SELECT doc_id, tok,
                   sum(tok) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum
            FROM t
        )
        SELECT CAST((cum - tok) // {PACK_TOKEN_BUDGET} AS BIGINT) AS seq_id,
               count(*) AS n_docs,
               CAST(sum(tok) AS BIGINT) AS sum_tokens,
               min(doc_id) AS first_doc,
               max(doc_id) AS last_doc
        FROM c GROUP BY seq_id ORDER BY seq_id
    """


def _quality_classifier_sql() -> str:
    """Mirror of curation.QualityClassifier: the same feature formulas
    (quality_metrics regex classes), the same logistic weights (generated
    from QC_WEIGHTS so they cannot drift), and the same left-to-right z
    accumulation so float evaluation order matches the numpy side."""
    from lasvdedup_ray.pipelines.curation import QC_KEEP_THRESHOLD, QC_WEIGHTS

    w = dict(QC_WEIGHTS)
    z = f"{w['bias']!r}"
    for name, wv in QC_WEIGHTS[1:]:
        z = f"({z} + {wv!r} * {name})"
    return f"""
        WITH m AS (
            SELECT doc_id,
                   len(regexp_extract_all(text, '[A-Za-z]')) * 1.0
                       / greatest(length(text), 1) AS alpha_ratio,
                   len(regexp_extract_all(text, '[0-9]')) * 1.0
                       / greatest(length(text), 1) AS digit_ratio,
                   len(regexp_extract_all(text, '[.,;:!?]')) * 1.0
                       / greatest(length(text), 1) AS punct_ratio,
                   len(regexp_extract_all(text, '[ \\t\\r\\n]')) * 1.0
                       / greatest(length(text), 1) AS ws_ratio,
                   ln(1.0 + len(regexp_extract_all(text, '{TOKEN_RE}')))
                       AS log_tokens
            FROM documents
        ),
        zz AS (SELECT doc_id, {z} AS z FROM m)
        SELECT doc_id,
               CAST(round((1.0 / (1.0 + exp(-z))) * 1000000) AS BIGINT)
                   AS quality_score_e6,
               CAST(CASE WHEN 1.0 / (1.0 + exp(-z)) >= {QC_KEEP_THRESHOLD!r}
                         THEN 1 ELSE 0 END AS BIGINT) AS keep
        FROM zz ORDER BY doc_id
    """


def _minhash_dedup_sql(quality_rank: bool = False) -> str:
    """Full SQL oracle for the FLAGSHIP ``minhash_dedup_docs`` pipeline —
    every stage mirrored in DuckDB from the engine's own constants.

    ``quality_rank=True`` mirrors ``minhash_dedup_best_quality`` instead:
    the SAME cluster chain, but each cluster's representative is chosen by
    (|n_chars - target| ASC, quality DESC, id ASC) where quality =
    floor(alpha_ratio * 1e6) — the engine's rank-table side-channel
    (``pipelines/docdedup.py:72-135``) — and the output slims to
    (doc_id, cluster_id, is_representative).

    Stages:

    1. normalization (lower + whitespace collapse) and k-shingle hashes via
       the shared splitmix64 chain (``functions/hashing.py``);
    2. hash-mod shingle sampling + densified OPH signatures (128 uint32
       slots; rotate-back fill chain == the doubling joins here);
    3. exact-dup collapse to min(id)-per-content representatives with
       zero-distance star edges (``stages/exact.py``);
    4. LSH banding over the low-16-bit slots (band = 4 consecutive sig16
       slots; equal band hash <=> equal slot tuple) among representatives
       (``stages/lsh.py``);
    5. emission + verification thresholds: est16 <= tau - margin_low passes,
       (tau - margin_low, tau + margin_high] re-checked with EXACT Jaccard
       over the full shingle sets, inclusive d <= tau (``stages/verify.py``);
    6. connected components via recursive min-label closure, cluster label =
       lexicographic min member id (``state/unionfind.py``);
    7. the reference decision tree (``stages/classify.py``): Case 1
       singleton -> SingleSequence, Case 2 all FULL-slot pairwise distances
       <= tau -> BelowThreshold, else (m <= min_neighborhood at this scale)
       SmallClade; rank = row_number by (|n_chars - target| ASC, n_lines
       DESC, id ASC).

    MATERIALIZED hints: the densification doubles reference the previous
    fill level twice, so inlined CTEs would expand the upstream chain
    2^levels times; materializing each level (and the shared hs/sigs
    tables) keeps the oracle polynomial.
    """
    from lasvdedup_ray.config import ClassThresholds, LSHConfig, SignatureConfig

    cfg = SignatureConfig()
    lsh = LSHConfig()
    th = ClassThresholds()
    k, mod, nb, rows = cfg.k, cfg.sample_mod, cfg.num_perms, cfg.rows
    shift_bins = 64 - int(nb).bit_length() + 1
    tau = th.tau
    emit_tau = tau + lsh.exact_margin_high
    sure_tau = tau - lsh.exact_margin_low
    tgt = th.target_length

    fills = ""
    prev = "f0"
    s = 1
    while s < nb:
        cur = f"f{s}x"
        fills += f""",
        {cur} AS MATERIALIZED (
            SELECT a.doc_id, a.j, coalesce(a.val, b.val) AS val
            FROM {prev} a JOIN {prev} b
              ON a.doc_id = b.doc_id AND b.j = (a.j - {s} + {nb}) % {nb}
        )"""
        prev = cur
        s *= 2

    # band-key positional weights: rows x 16-bit slots folded into one
    # HUGEINT (exact — no hash, so no false band collisions in the oracle)
    wt_case = " ".join(
        f"WHEN {p} THEN {1 << (16 * p)}::HUGEINT" for p in range(rows)
    )

    if quality_rank:
        # quality = floor(alpha_ratio * 1e6) — same float sequence as
        # functions/text.quality_metrics + docdedup.qtable
        qual_col = (
            ", CAST(floor((len(regexp_extract_all(text, '[A-Za-z]')) * 1.0"
            " / greatest(length(text), 1)) * 1000000.0) AS BIGINT) AS qual"
        )
        member_qual = ", b.qual"
        rank_order = f"abs(n_chars - {tgt}), qual DESC, id"
        final = """
    SELECT m.doc_id,
           c.cluster_id,
           (r.rank = 1) AS is_representative
    FROM members m
    JOIN clust c ON c.comp = m.comp
    JOIN rk r ON r.comp = m.comp AND r.doc_id = m.doc_id
    ORDER BY m.doc_id
    """
    else:
        qual_col = ""
        member_qual = ""
        rank_order = f"abs(n_chars - {tgt}), n_lines DESC, id"
        final = f"""
    SELECT m.doc_id,
           c.cluster_id,
           CASE WHEN c.m = 1 OR r.rank = 1 THEN 'keep' ELSE 'duplicate' END
               AS classification,
           CASE WHEN c.m = 1 THEN 'SingleSequence'
                WHEN pm.dmax <= {tau} THEN 'BelowThreshold'
                ELSE 'SmallClade' END AS decision_category,
           (r.rank = 1) AS is_representative,
           r.rank
    FROM members m
    JOIN clust c ON c.comp = m.comp
    JOIN rk r ON r.comp = m.comp AND r.doc_id = m.doc_id
    LEFT JOIN pairmax pm ON pm.comp = m.comp
    ORDER BY m.doc_id
    """

    return f"""
    WITH RECURSIVE nm AS MATERIALIZED (
        SELECT doc_id,
               regexp_replace(lower(text), '[ \t\r\n\f\v]+', ' ', 'g') AS txt
        FROM documents
    ),
    base AS MATERIALIZED (
        SELECT doc_id,
               'src/' || source || ':doc_' || CAST(doc_id AS VARCHAR)
                   || '@' || CAST(doc_id AS VARCHAR) AS id,
               text,
               length(text) AS n_chars,
               length(text) - length(replace(text, chr(10), '')) + 1 AS n_lines
               {qual_col}
        FROM documents
    ),
    base2 AS MATERIALIZED (
        SELECT *, min(id) OVER (PARTITION BY text) AS rep_id FROM base
    ),
    pos AS (
        SELECT doc_id, txt,
               unnest(generate_series(1, length(txt) - {k - 1})) AS i
        FROM nm WHERE length(txt) >= {k}
    ),
    p0 AS (SELECT doc_id, ({_poly_sql(k, "txt")}) % {_M64} AS z FROM pos),
    {_sm64_ctes("p0", "doc_id")},
    hs AS MATERIALIZED (SELECT DISTINCT doc_id, z FROM smx),
    stats AS (
        SELECT doc_id, count(*) AS n_all,
               sum(CASE WHEN z % {mod} = 0 THEN 1 ELSE 0 END) AS n_samp
        FROM hs GROUP BY doc_id
    ),
    sel AS (
        SELECT h.doc_id, h.z
        FROM hs h JOIN stats s ON h.doc_id = s.doc_id
        WHERE (s.n_all > 1 AND s.n_samp >= 1 AND h.z % {mod} = 0)
           OR NOT (s.n_all > 1 AND s.n_samp >= 1)
    ),
    binned AS (
        SELECT doc_id,
               CAST((z // {1 << shift_bins}) % {nb} AS INTEGER) AS j,
               CAST((z // {1 << 25}) % 4294967296 AS BIGINT) AS val
        FROM sel
    ),
    slot0 AS MATERIALIZED (
        SELECT doc_id, j, min(val) AS val FROM binned GROUP BY 1, 2
    ),
    grid AS (
        SELECT d.doc_id, g.j FROM (SELECT DISTINCT doc_id FROM nm) d,
             (SELECT unnest(generate_series(0, {nb - 1})) AS j) g
    ),
    f0 AS MATERIALIZED (
        SELECT g.doc_id, g.j,
               CASE WHEN s.val = 4294967295 THEN NULL ELSE s.val END AS val
        FROM grid g LEFT JOIN slot0 s ON g.doc_id = s.doc_id AND g.j = s.j
    ){fills},
    sigs AS MATERIALIZED (SELECT doc_id, j, val FROM {prev}),
    exact_edges AS (
        SELECT rb.doc_id AS a, b2.doc_id AS b
        FROM base2 b2 JOIN base2 rb ON rb.id = b2.rep_id
        WHERE rb.doc_id <> b2.doc_id
    ),
    repsig AS (
        SELECT s.doc_id, s.j, s.val % 65536 AS v16,
               CAST(s.j // {rows} AS INTEGER) AS band, s.j % {rows} AS p
        FROM sigs s JOIN base2 r ON r.doc_id = s.doc_id AND r.id = r.rep_id
    ),
    bkey AS MATERIALIZED (
        SELECT doc_id, band,
               sum(v16 * CASE p {wt_case} END) AS bk
        FROM repsig GROUP BY doc_id, band
    ),
    cand0 AS MATERIALIZED (
        SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
        FROM bkey a JOIN bkey b
          ON a.band = b.band AND a.bk = b.bk AND a.doc_id < b.doc_id
    ),
    est AS MATERIALIZED (
        SELECT c.da, c.db,
               1.0 - sum(CASE WHEN sa.val % 65536 = sb.val % 65536
                              THEN 1 ELSE 0 END) / {float(nb)} AS d16
        FROM cand0 c
        JOIN sigs sa ON sa.doc_id = c.da
        JOIN sigs sb ON sb.doc_id = c.db AND sb.j = sa.j
        GROUP BY c.da, c.db
    ),
    bord AS (SELECT da, db FROM est WHERE d16 > {sure_tau} AND d16 <= {emit_tau}),
    hsn AS MATERIALIZED (SELECT doc_id, count(*) AS n FROM hs GROUP BY doc_id),
    inter AS (
        SELECT b.da, b.db, count(*) AS icnt
        FROM bord b
        JOIN hs x ON x.doc_id = b.da
        JOIN hs y ON y.doc_id = b.db AND y.z = x.z
        GROUP BY b.da, b.db
    ),
    bjacc AS (
        SELECT b.da, b.db,
               1.0 - CAST(coalesce(i.icnt, 0) AS DOUBLE)
                     / (na.n + nb2.n - coalesce(i.icnt, 0)) AS dex
        FROM bord b
        LEFT JOIN inter i ON i.da = b.da AND i.db = b.db
        JOIN hsn na ON na.doc_id = b.da
        JOIN hsn nb2 ON nb2.doc_id = b.db
    ),
    near_edges AS (
        SELECT da AS a, db AS b FROM est WHERE d16 <= {sure_tau}
        UNION ALL
        SELECT da AS a, db AS b FROM bjacc WHERE dex <= {tau}
    ),
    edges AS (
        SELECT a, b FROM exact_edges UNION ALL SELECT a, b FROM near_edges
    ),
    bidir AS MATERIALIZED (
        SELECT a, b FROM edges UNION ALL SELECT b AS a, a AS b FROM edges
    ),
    reach(idn, lbl) AS (
        SELECT doc_id, doc_id FROM base
        UNION
        SELECT r.idn, e.b FROM reach r JOIN bidir e ON e.a = r.lbl
    ),
    comp AS (SELECT idn AS doc_id, min(lbl) AS comp FROM reach GROUP BY idn),
    members AS MATERIALIZED (
        SELECT c.comp, b.doc_id, b.id, b.n_chars, b.n_lines{member_qual}
        FROM comp c JOIN base2 b ON b.doc_id = c.doc_id
    ),
    clust AS (
        SELECT comp, min(id) AS cluster_id, count(*) AS m
        FROM members GROUP BY comp
    ),
    rk AS (
        SELECT comp, doc_id,
               row_number() OVER (
                   PARTITION BY comp
                   ORDER BY {rank_order}
               ) AS rank
        FROM members
    ),
    cpairs AS (
        SELECT m1.comp, m1.doc_id AS a, m2.doc_id AS b
        FROM members m1 JOIN members m2
          ON m1.comp = m2.comp AND m1.doc_id < m2.doc_id
    ),
    perpair AS (
        SELECT p.comp, p.a, p.b,
               1.0 - sum(CASE WHEN sa.val = sb.val THEN 1 ELSE 0 END)
                     / {float(nb)} AS d
        FROM cpairs p
        JOIN sigs sa ON sa.doc_id = p.a
        JOIN sigs sb ON sb.doc_id = p.b AND sb.j = sa.j
        GROUP BY p.comp, p.a, p.b
    ),
    pairmax AS (SELECT comp, max(d) AS dmax FROM perpair GROUP BY comp)
    {final}"""


def oracle_sql() -> dict[str, str]:
    # *_e4 / *_e6 = value quantized to int64 (x * 10^4 / 10^6, rounded half
    # away from zero) so both engines compare exact integers, never floats.
    return {
        "q1_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   CAST(round(sum(l_quantity) * 10000) AS BIGINT) AS sum_qty_e4,
                   CAST(round(sum(l_extendedprice) * 10000) AS BIGINT) AS sum_base_price_e4,
                   CAST(round(sum(l_extendedprice * (1 - l_discount)) * 10000) AS BIGINT)
                       AS sum_disc_price_e4,
                   CAST(round(avg(l_quantity) * 10000) AS BIGINT) AS avg_qty_e4,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus
        """,
        "q3_top_orders": """
            SELECT o.o_orderkey,
                   CAST(round(sum(l.l_extendedprice * (1 - l.l_discount)) * 10000) AS BIGINT)
                       AS revenue_e4,
                   CAST(epoch(o.o_orderdate) AS BIGINT) AS o_orderdate_s,
                   o.o_orderpriority
            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
            GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderpriority
            ORDER BY revenue_e4 DESC, o.o_orderkey
            LIMIT 10
        """,
        "q5_nation_revenue": """
            SELECT n.n_name,
                   CAST(round(sum(l.l_extendedprice * (1 - l.l_discount)) * 10000) AS BIGINT)
                       AS revenue_e4
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            GROUP BY n.n_name ORDER BY n.n_name
        """,
        "events_by_type": """
            SELECT event_type,
                   CAST(round(sum(value) * 10000) AS BIGINT) AS sum_value_e4,
                   count(*) AS n_events,
                   CAST(round(sum(value) / count(*) * 10000) AS BIGINT) AS avg_value_e4
            FROM events GROUP BY event_type ORDER BY event_type
        """,
        "events_hourly": """
            SELECT event_type,
                   CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS window_start_s,
                   count(*) AS n_events,
                   CAST(round(sum(value) * 10000) AS BIGINT) AS sum_value_e4
            FROM events GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "top_users_by_value": """
            SELECT user_id,
                   CAST(round(sum(value) * 10000) AS BIGINT) AS total_value_e4,
                   count(*) AS n_events
            FROM events GROUP BY user_id
            ORDER BY total_value_e4 DESC, user_id LIMIT 20
        """,
        "user_sessions": """
            -- gaps on second-truncated epochs (epoch_us // 1e6), matching the
            -- engine's ts_s = micros // 1_000_000 (relational.py:467-476);
            -- a raw INTERVAL comparison can disagree within 1 s of the gap
            WITH o AS (
                SELECT user_id,
                       CAST(epoch_us(ts) // 1000000 AS BIGINT) AS ts,
                       CASE WHEN lag(epoch_us(ts) // 1000000) OVER w IS NULL
                                 OR epoch_us(ts) // 1000000
                                    - lag(epoch_us(ts) // 1000000) OVER w > 1800
                            THEN 1 ELSE 0 END AS new_s
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts) // 1000000)
            ),
            s AS (
                SELECT user_id,
                       sum(new_s) OVER (
                           PARTITION BY user_id ORDER BY ts
                           ROWS UNBOUNDED PRECEDING
                       ) AS sess_id
                FROM o
            ),
            per_sess AS (
                SELECT user_id, sess_id, count(*) AS sess_events
                FROM s GROUP BY user_id, sess_id
            )
            SELECT user_id,
                   count(*) AS n_sessions,
                   CAST(sum(sess_events) AS BIGINT) AS n_events,
                   max(sess_events) AS max_session_events
            FROM per_sess GROUP BY user_id ORDER BY user_id
        """,
        "user_rolling_value": """
            WITH q AS (
                SELECT event_id, user_id, ts,
                       CAST(round(value * 10000) AS BIGINT) AS v_e4
                FROM events
            )
            SELECT event_id, user_id,
                   CAST(sum(v_e4) OVER w AS BIGINT) AS roll_sum_e4,
                   CAST(count(*) OVER w AS BIGINT) AS roll_n,
                   CAST(round(sum(v_e4) OVER w * 1.0 / count(*) OVER w) AS BIGINT)
                       AS roll_mean_e4
            FROM q
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
            ORDER BY event_id
        """,
        "purchase_attribution": """
            SELECT p.event_id AS event_id, p.user_id AS user_id,
                   v.event_id AS view_event_id,
                   CAST(epoch_us(p.ts) - epoch_us(v.ts) AS BIGINT) AS us_since_view
            FROM (SELECT * FROM events WHERE event_type = 'purchase') p
            ASOF JOIN (SELECT * FROM events WHERE event_type = 'view') v
              ON p.user_id = v.user_id AND p.ts > v.ts
            ORDER BY event_id
        """,
        # click values quantized to int64 BEFORE the window sum on both
        # engines, so the banded-join aggregates are exact integers
        "purchase_click_window_join": """
            WITH p AS (
                SELECT event_id, user_id, ts FROM events
                WHERE event_type = 'purchase'
            ), c AS (
                SELECT user_id, ts,
                       CAST(round(value * 10000) AS BIGINT) AS v
                FROM events WHERE event_type = 'click'
            )
            SELECT p.event_id, p.user_id,
                   count(c.ts) AS n_clicks,
                   CAST(coalesce(sum(c.v), 0) AS BIGINT) AS click_value_e4
            FROM p LEFT JOIN c ON c.user_id = p.user_id
               AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts < p.ts
            GROUP BY p.event_id, p.user_id
            ORDER BY p.event_id
        """,
        "langid_docs": _langid_sql(),
        "doc_fingerprints": _winnow_sql(),
        "simhash_near_pairs": _simhash_sql(),
        "pii_redact_docs": _pii_sql(),
        "repetition_stats_docs": _repetition_sql(),
        "hash_sample_stratified": _hash_sample_sql(),
        "dsir_weights": _dsir_sql(),
        "lm_perplexity_docs": _lm_perplexity_sql(),
        "bloom_decontam_docs": _bloom_decontam_sql(),
        "pack_sequences": _pack_sql(),
        "quality_classifier_docs": _quality_classifier_sql(),
        "customers_without_orders": """
            SELECT c_custkey FROM customer c
            WHERE NOT EXISTS (
                SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
            )
            ORDER BY c_custkey
        """,
        "order_price_quantiles": """
            SELECT CAST(50 AS BIGINT) AS q_pct,
                   CAST(round(quantile_disc(o_totalprice, 0.50) * 10000) AS BIGINT)
                       AS price_e4 FROM orders
            UNION ALL
            SELECT 90, CAST(round(quantile_disc(o_totalprice, 0.90) * 10000) AS BIGINT)
            FROM orders
            UNION ALL
            SELECT 99, CAST(round(quantile_disc(o_totalprice, 0.99) * 10000) AS BIGINT)
            FROM orders
            ORDER BY q_pct
        """,
        "top_orders_per_cust": """
            WITH r AS (
                SELECT o_custkey, o_orderkey,
                       CAST(round(o_totalprice * 10000) AS BIGINT) AS total_e4,
                       row_number() OVER (
                           PARTITION BY o_custkey
                           ORDER BY o_totalprice DESC, o_orderkey
                       ) AS rnk
                FROM orders
            )
            SELECT o_custkey, o_orderkey, total_e4, CAST(rnk AS BIGINT) AS rnk
            FROM r WHERE rnk <= 3 ORDER BY o_custkey, rnk
        """,
        "domain_mix_weights": f"""
            WITH t AS (
                SELECT source, count(*) AS n_docs,
                       CAST(sum(len(regexp_extract_all(text, '{TOKEN_RE}')))
                            AS BIGINT) AS total_tokens
                FROM documents GROUP BY source
            ),
            s AS (
                SELECT *, CAST(floor(sqrt(total_tokens) * 1000) AS BIGINT) AS sq
                FROM t
            ),
            d AS (SELECT sum(sq) AS denom FROM s)
            SELECT source, n_docs, total_tokens,
                   CAST(floor(sq * 1000000.0 / denom + 0.5) AS BIGINT)
                       AS weight_e6
            FROM s, d ORDER BY source
        """,
        "decontam_overlap": """
            WITH pos AS (
                SELECT doc_id, text,
                       unnest(generate_series(1, greatest(length(text) - 7, 1))) AS i
                FROM documents
            ),
            sh AS (
                SELECT DISTINCT doc_id,
                       CASE WHEN length(text) < 8 THEN text
                            ELSE substr(text, CAST(i AS INTEGER), 8) END AS shingle
                FROM pos
            ),
            -- benchmark slice = lowest 10% of doc_ids (DECONTAM_BENCH_DIVISOR)
            cut AS (SELECT count(*) // 10 AS c FROM documents),
            bench AS (
                SELECT DISTINCT shingle FROM sh, cut WHERE doc_id < cut.c
            )
            SELECT s.doc_id, count(*) AS n_overlap
            FROM sh s JOIN bench b ON s.shingle = b.shingle, cut
            WHERE s.doc_id >= cut.c
            GROUP BY s.doc_id ORDER BY s.doc_id
        """,
        "brand_revenue": """
            SELECT p.p_brand,
                   CAST(round(sum(l.l_extendedprice * (1 - l.l_discount)) * 10000) AS BIGINT)
                       AS revenue_e4,
                   count(*) AS n_items
            FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
            GROUP BY p.p_brand ORDER BY p.p_brand
        """,
        "supplier_balance_stats": """
            SELECT CAST(s_nationkey AS BIGINT) AS s_nationkey,
                   CAST(round(min(s_acctbal) * 10000) AS BIGINT) AS min_bal_e4,
                   CAST(round(max(s_acctbal) * 10000) AS BIGINT) AS max_bal_e4,
                   CAST(round(avg(s_acctbal) * 10000) AS BIGINT) AS avg_bal_e4,
                   count(*) AS n_suppliers
            FROM supplier GROUP BY s_nationkey ORDER BY s_nationkey
        """,
        "token_counts_docs": f"""
            SELECT doc_id,
                   CAST(len(regexp_extract_all(text, '{TOKEN_RE}')) AS BIGINT)
                       AS n_ws_tokens,
                   CAST(len(regexp_extract_all(text,
                        '''(?:[sdmt]|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^\\sA-Za-z0-9]+|\\s+'))
                       AS BIGINT) AS n_bpe_tokens
            FROM documents ORDER BY doc_id
        """,
        "doc_stats": f"""
            SELECT doc_id,
                   length(text) AS n_chars,
                   CAST(len(regexp_extract_all(text, '{TOKEN_RE}')) AS BIGINT) AS n_tokens,
                   CAST(round(len(regexp_extract_all(text, '[A-Za-z]')) * 1000000.0
                         / greatest(length(text), 1)) AS BIGINT) AS alpha_ratio_e6,
                   CAST(round(len(regexp_extract_all(text, '[0-9]')) * 1000000.0
                         / greatest(length(text), 1)) AS BIGINT) AS digit_ratio_e6,
                   CAST(round(len(regexp_extract_all(text, '[.,;:!?]')) * 1000000.0
                         / greatest(length(text), 1)) AS BIGINT) AS punct_ratio_e6
            FROM documents ORDER BY doc_id
        """,
        "lang_quality_summary": f"""
            SELECT lang,
                   count(*) AS n_docs,
                   CAST(sum(len(regexp_extract_all(text, '{TOKEN_RE}'))) AS BIGINT)
                       AS total_tokens,
                   CAST(round(avg(len(regexp_extract_all(text, '[A-Za-z]')) * 1.0
                             / greatest(length(text), 1)) * 1000000) AS BIGINT)
                       AS avg_alpha_ratio_e6
            FROM documents GROUP BY lang ORDER BY lang
        """,
        "quality_filter": """
            SELECT doc_id FROM documents
            WHERE length(text) >= 100
              AND len(regexp_extract_all(text, '[0-9]')) * 1.0
                  / greatest(length(text), 1) <= 0.3
            ORDER BY doc_id
        """,
        "exact_dedup_docs": """
            SELECT min(doc_id) AS doc_id, count(*) AS copies
            FROM documents GROUP BY text ORDER BY doc_id
        """,
        # K mirrors textops.VOCAB_TOP_K; split/tie-break semantics match the
        # engine (single-space split, empties dropped, count desc then token)
        "vocab_top_tokens": f"""
            WITH toks AS (
                SELECT unnest(string_split(lower(text), ' ')) AS tok
                FROM documents
            )
            SELECT tok, count(*) AS n FROM toks WHERE tok <> ''
            GROUP BY tok ORDER BY n DESC, tok LIMIT {_textops_vocab_k()}
        """,
        # normalization uses the SAME RE2 patterns as the engine's pyarrow
        # kernels (both RE2) — character-class semantics match exactly
        "normalized_dedup_docs": """
            WITH n AS (
                SELECT doc_id,
                       trim(regexp_replace(regexp_replace(
                           lower(text), '[^a-z0-9 ]+', ' ', 'g'
                       ), ' +', ' ', 'g')) AS ntext
                FROM documents
            )
            SELECT min(doc_id) AS doc_id, count(*) AS n_copies
            FROM n GROUP BY ntext ORDER BY doc_id
        """,
        # incremental dedup: even doc_id = existing index, odd = incoming
        # (parity split is query semantics, mirrored in the engine)
        "incremental_dedup_docs": """
            WITH idx AS (
                SELECT DISTINCT text FROM documents WHERE doc_id % 2 = 0
            )
            SELECT CAST(min(doc_id) AS BIGINT) AS doc_id,
                   count(*) AS n_copies
            FROM documents
            WHERE doc_id % 2 = 1
              AND text NOT IN (SELECT text FROM idx)
            GROUP BY text
            ORDER BY doc_id
        """,
        # C4-style span dedup: the window size mirrors
        # lasvdedup_ray.pipelines.textops.SPAN_WORDS (query semantics)
        "span_dedup_docs": _span_dedup_sql(),
        "bm25_topk": _bm25_sql(),
        "doc_length_quantiles": _length_quantiles_sql(),
        # K mirrors textops.TFIDF_TOP_K; identical tokenization, source-level
        # df, ln(ns/df) idf, floor(+0.5) e6 quantization, tok tie-break
        "tfidf_source_terms": _tfidf_sql(),
        # canonical form = sorted distinct tokens (binary collation sort ==
        # numpy lexsort on the same lowercase ASCII tokens)
        "dup_rate_by_source": """
            WITH n AS (
                SELECT source,
                       array_to_string(list_sort(list_distinct(
                           string_split(lower(text), ' '))), ' ') AS canon
                FROM documents
            ), c AS (
                SELECT canon, count(*) AS copies FROM n GROUP BY canon
            ), d AS (
                SELECT n.source,
                       CAST(c.copies > 1 AS BIGINT) AS is_dup
                FROM n JOIN c USING (canon)
            )
            SELECT source, count(*) AS n_docs,
                   CAST(sum(is_dup) AS BIGINT) AS n_dup_docs,
                   CAST(round(sum(is_dup) * 1.0 / count(*) * 1000000)
                        AS BIGINT) AS dup_rate_e6
            FROM d GROUP BY source ORDER BY source
        """,
        "shuffle_export_docs": _shuffle_export_sql(),
        "distinct_users_daily": """
            -- epoch_us // : integer floor (epoch(ts)::BIGINT ROUNDS and
            -- would disagree with the engine within 0.5 s of a boundary)
            SELECT event_type,
                   CAST(epoch_us(ts) // 86400000000 * 86400 AS BIGINT) AS day_s,
                   count(DISTINCT user_id) AS distinct_users
            FROM events
            GROUP BY event_type, epoch_us(ts) // 86400000000 * 86400
            ORDER BY event_type, day_s
        """,
        # gap constant mirrors relational.DEBOUNCE_GAP_S (query semantics)
        "event_debounce": _debounce_sql(),
        "event_funnel": _funnel_sql(),
        # same RE2 extraction as the engine (both engines are RE2);
        # mean = sum/count of exact int64s then one round — drift-free
        "props_value_stats": """
            WITH x AS (
                SELECT event_type,
                       CAST(regexp_extract(props, '"k":\\s*(-?\\d+)', 1)
                            AS BIGINT) AS k
                FROM events
                WHERE regexp_matches(props, '"k":\\s*-?\\d+')
            )
            SELECT event_type, count(*) AS n,
                   min(k) AS k_min, max(k) AS k_max,
                   CAST(round(CAST(sum(k) AS DOUBLE) / count(*) * 1000000)
                        AS BIGINT) AS k_mean_e6
            FROM x GROUP BY event_type ORDER BY event_type
        """,
        # day convention mirrors distinct_users_daily (integer-floor epoch
        # microseconds; epoch(ts)::BIGINT rounds near second boundaries)
        "cohort_retention": """
            WITH d AS (
                SELECT user_id,
                       CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day
                FROM events
            ), f AS (
                SELECT user_id, min(day) AS fday FROM d GROUP BY user_id
            ), a AS (
                SELECT DISTINCT d.user_id, d.day, f.fday
                FROM d JOIN f USING (user_id)
            )
            SELECT fday * 86400 AS cohort_day_s,
                   day - fday AS day_offset,
                   count(*) AS n_users
            FROM a GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "hll_distinct_users": _hll_sql(),
        "ngram_jaccard_pairs": _ngram_pairs_sql(),
        # single-linkage clustering over the SAME exact-Jaccard pair
        # universe: recursive min-label transitive closure == the engine's
        # distributed union-find (state/unionfind.py) — this is the direct
        # SQL oracle for the connected-components operator
        "jaccard_cluster_docs": f"""
            WITH RECURSIVE pairs AS (
                SELECT id_a, id_b FROM ({_ngram_pairs_sql()})
            ), bidir AS (
                SELECT id_a AS a, id_b AS b FROM pairs
                UNION ALL
                SELECT id_b AS a, id_a AS b FROM pairs
            ), reach(id, lbl) AS (
                SELECT doc_id, doc_id FROM documents
                UNION
                SELECT r.id, e.b FROM reach r JOIN bidir e ON e.a = r.lbl
            )
            SELECT id AS doc_id, min(lbl) AS cluster_id
            FROM reach GROUP BY id ORDER BY doc_id
        """,
        # incremental near-dup: incoming (odd doc_id) docs with n-gram
        # Jaccard >= 0.5 against ANY index (even doc_id) doc — the same
        # pair universe as ngram_jaccard_pairs (shared SQL body),
        # restricted to mixed-parity pairs and collapsed per incoming doc
        "incremental_neardup_docs": f"""
            SELECT CASE WHEN id_a % 2 = 1 THEN id_a ELSE id_b END AS doc_id,
                   count(*) AS n_partners
            FROM ({_ngram_pairs_sql()})
            WHERE (id_a % 2) <> (id_b % 2)
            GROUP BY 1
            ORDER BY doc_id
        """,
        # incremental near-dup through the PERSISTED index: index-side df
        # cap, uncapped probe shingles (state/neardup_index.py semantics)
        "incremental_index_neardup": _incremental_index_sql(),
        # per-element DOUBLE casts mirror the engine's f32 -> f64 promotion
        # before the moment sums (sum/sumsq of FLOAT would drift)
        "label_centroids": """
            WITH x AS (
                SELECT label, unnest(embedding) AS v,
                       generate_subscripts(embedding, 1) AS dim
                FROM embeddings
            ), m AS (
                SELECT CAST(label AS BIGINT) AS label,
                       CAST(dim AS BIGINT) AS dim,
                       sum(v::DOUBLE) AS s1,
                       sum(v::DOUBLE * v::DOUBLE) AS s2,
                       count(*) AS n_vecs
                FROM x GROUP BY 1, 2
            )
            SELECT label, dim,
                   CAST(round(s1 / n_vecs * 1000000) AS BIGINT) AS centroid_e6,
                   CAST(round((s2 / n_vecs - (s1 / n_vecs) * (s1 / n_vecs))
                        * 1000000) AS BIGINT) AS variance_e6,
                   n_vecs
            FROM m ORDER BY label, dim
        """,
        "knn_graph_embeddings": """
            WITH c AS (
                SELECT a.vec_id AS query_id, b.vec_id AS vec_id,
                       CAST(round(list_cosine_similarity(
                           CAST(a.embedding AS DOUBLE[]),
                           CAST(b.embedding AS DOUBLE[])
                       ) * 1000000) AS BIGINT) AS cosine_e6
                FROM embeddings a CROSS JOIN embeddings b
                WHERE a.vec_id <> b.vec_id
            ),
            r AS (
                SELECT *, row_number() OVER (
                    PARTITION BY query_id ORDER BY cosine_e6 DESC, vec_id
                ) AS rn FROM c
            )
            SELECT query_id, vec_id, cosine_e6 FROM r WHERE rn <= 3
            ORDER BY query_id, vec_id
        """,
        "embedding_topk": """
            WITH q AS (
                SELECT vec_id AS query_id, embedding AS qe
                FROM embeddings ORDER BY vec_id LIMIT 5
            ),
            c AS (
                SELECT q.query_id, e.vec_id,
                       CAST(round(list_cosine_similarity(
                           CAST(q.qe AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])
                       ) * 1000000) AS BIGINT) AS cosine_e6
                FROM q CROSS JOIN embeddings e
                WHERE e.vec_id <> q.query_id
            ),
            r AS (
                SELECT *, row_number() OVER (
                    PARTITION BY query_id ORDER BY cosine_e6 DESC, vec_id
                ) AS rn FROM c
            )
            SELECT query_id, vec_id, cosine_e6 FROM r WHERE rn <= 5
            ORDER BY query_id, cosine_e6 DESC, vec_id
        """,
        "embedding_neardup_pairs": """
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   CAST(round(list_cosine_similarity(
                       CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])
                   ) * 1000000) AS BIGINT) AS cosine_e6
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(
                      CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])
                  ) >= 0.35
            ORDER BY id_a, id_b
        """,
        # FLAGSHIP full-chain oracle: normalization -> shingle hashes ->
        # OPH signatures -> exact collapse -> LSH bands -> est16/exact
        # verify -> components -> decision tree, all in one DuckDB query
        # generated from the engine's own constants.  The decision tree
        # covers Cases 1/2/3 (the only ones reachable when every
        # non-case-2 cluster has <= min_neighborhood members, as at the
        # driver's scales; Case 4/5 clusters would need MAD in SQL).
        "minhash_dedup_docs": _minhash_dedup_sql(),
        # dedup report: cluster-size histogram over the SAME flagship chain
        "dedup_cluster_stats": f"""
            SELECT cluster_size, count(*) AS n_clusters,
                   CAST(cluster_size * count(*) AS BIGINT) AS n_docs
            FROM (
                SELECT cluster_id, count(*) AS cluster_size
                FROM ({_minhash_dedup_sql()}) GROUP BY cluster_id
            ) GROUP BY cluster_size ORDER BY cluster_size
        """,
        # same chain, quality-ranked representative (rank-table side path)
        "minhash_dedup_best_quality": _minhash_dedup_sql(quality_rank=True),
        # true LCS per near-dup pair, in pure SQL: character-match
        # positions grouped by diagonal (i - j), longest consecutive run =
        # the longest common substring; tie rule mirrors the engine
        # (smallest offset_a, then offset_b).  Texts are bytes==chars
        # (ASCII corpus).
        "common_span_pairs": _common_span_sql(),
        # hyperplane-LSH near-dup: the random planes are a deterministic
        # function of the seed, embedded as literals; DuckDB replays
        # bucketing + exact cosine verification
        "embedding_neardup_lsh": _embedding_lsh_sql(),
        # IVF top-k: the coarse-quantizer centroids are a deterministic
        # function of the training sample, replayed with the engine's own
        # numpy trainer and embedded as literals; DuckDB replays cell
        # assignment, probe selection and the per-query top-k
        "embedding_topk_ivf": _embedding_ivf_sql(),
        # k-means: the engine's iterations are replayed in numpy (same
        # deterministic init + per-iteration e6 centroid quantization
        # keeps both replicas in lockstep); DuckDB independently replays
        # the final assignment + stats pass against those centroids
        "embedding_kmeans": _embedding_kmeans_sql(),
        # SemDeDup: kmeans assignment vs the replayed-centroid literals,
        # then the pairwise-dominance drop rule as a SQL self-join
        "semdedup_embeddings": _semdedup_sql(),
        # media_features / media_frame_stats: binary feature extraction —
        # not SQL-expressible, rows-only driver check; pinned by pytest
        # value oracles (tests/test_multimodal.py).
    }
