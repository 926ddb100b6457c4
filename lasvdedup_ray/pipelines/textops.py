"""Text-analysis + dedup operator coverage over the ``documents`` table.

Training-data-pipeline operators (language-ID, quality scoring, token
counting, fingerprinting, exact / n-gram-Jaccard / MinHash / SimHash
dedup) expressed Ray-Data-first.  Where the semantics are SQL-expressible
the matching DuckDB oracle lives in ``__ray_entry__.oracle_sql`` with
identical tokenization/shingling on both sides.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Count, Min, Sum

from ..config import SignatureConfig
from ..functions.hashing import hamming64, sha256_bytes
from ..functions.text import (
    language_id,
    quality_metrics,
    stopword_ratio,
    winnow_fingerprints,
)
from ..stages.signatures import MinHashSigner, sigs_to_matrix


from .relational import quantize


def doc_stats(sf_dir: str) -> ray.data.Dataset:
    """Per-document quality metrics, all pyarrow kernels (SQL oracle uses
    the same regex classes)."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def stats(t: pa.Table) -> pa.Table:
        m = quality_metrics(t["text"])
        out = pa.table(
            {
                "doc_id": t["doc_id"],
                "n_chars": m["n_chars"],
                "n_tokens": m["n_tokens"],
                "alpha_ratio": m["alpha_ratio"],
                "digit_ratio": m["digit_ratio"],
                "punct_ratio": m["punct_ratio"],
            }
        )
        return quantize(out, ["alpha_ratio", "digit_ratio", "punct_ratio"], scale=1_000_000, suffix="_e6")

    return ds.map_batches(stats, batch_format="pyarrow").sort("doc_id")


def exact_dedup_docs(sf_dir: str) -> ray.data.Dataset:
    """Exact dedup on the documents table: hash-partition by content,
    keep min(doc_id) per group, count copies."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def hash_batch(t: pa.Table) -> pa.Table:
        digests = sha256_bytes(s.encode("utf-8") for s in t["text"].to_pylist())
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "sha_hex": pa.array([d.hex() for d in digests], pa.string()),
            }
        )

    agg = (
        ds.map_batches(hash_batch, batch_format="pyarrow")
        .groupby("sha_hex")
        .aggregate(Min("doc_id", alias_name="doc_id"), Count(alias_name="copies"))
    )
    return agg.select_columns(["doc_id", "copies"]).sort("doc_id")


def lang_quality_summary(sf_dir: str) -> ray.data.Dataset:
    """Per-lang corpus summary: doc count, total tokens, mean alpha ratio."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["lang", "text"])

    def partial(t: pa.Table) -> pa.Table:
        m = quality_metrics(t["text"])
        tmp = pa.table(
            {"lang": t["lang"], "n_tokens": m["n_tokens"], "alpha": m["alpha_ratio"]}
        )
        g = tmp.group_by("lang").aggregate(
            [("n_tokens", "sum"), ("alpha", "sum"), ("lang", "count")]
        )
        return pa.table(
            {
                "lang": g["lang"],
                "ptok": g["n_tokens_sum"],
                "palpha": g["alpha_sum"],
                "pn": g["lang_count"],
            }
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(
            Sum("ptok", alias_name="total_tokens"),
            Sum("palpha", alias_name="alpha_sum"),
            Sum("pn", alias_name="n_docs"),
        )
    )

    def finish(t: pa.Table) -> pa.Table:
        avg = pc.divide(t["alpha_sum"], pc.cast(t["n_docs"], pa.float64()))
        out = pa.table(
            {
                "lang": t["lang"],
                "n_docs": t["n_docs"],
                "total_tokens": t["total_tokens"],
                "avg_alpha_ratio": avg,
            }
        )
        return quantize(out, ["avg_alpha_ratio"], scale=1_000_000, suffix="_e6")

    return agg.map_batches(finish, batch_format="pyarrow").sort("lang")


def quality_filter(sf_dir: str, min_chars: int = 100, max_digit_ratio: float = 0.3) -> ray.data.Dataset:
    """Quality-gate filter: docs passing length + digit-ratio thresholds."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def keep(t: pa.Table) -> pa.Table:
        m = quality_metrics(t["text"])
        mask = pc.and_(
            pc.greater_equal(m["n_chars"], min_chars),
            pc.less_equal(m["digit_ratio"], max_digit_ratio),
        )
        return pa.table({"doc_id": t["doc_id"]}).filter(mask)

    return ds.map_batches(keep, batch_format="pyarrow").sort("doc_id")


SHINGLE_K = 8  # character shingle width for the n-gram Jaccard join


def _doc_shingles(t: pa.Table, k: int) -> pa.Table:
    """Explode docs to distinct (doc_id, shingle-string) rows — plain
    substrings (no hashing) so a SQL oracle can reproduce them exactly."""
    out_ids, out_sh = [], []
    for did, txt in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
        n = len(txt)
        if n < k:
            sh = {txt}
        else:
            sh = {txt[i : i + k] for i in range(n - k + 1)}
        out_ids.extend([did] * len(sh))
        out_sh.extend(sh)
    return pa.table(
        {"doc_id": pa.array(out_ids, pa.int64()), "shingle": pa.array(out_sh, pa.string())}
    )


def ngram_jaccard_pairs(sf_dir: str, threshold: float = 0.5) -> ray.data.Dataset:
    """n-gram Jaccard similarity self-join: explode to (doc_id, shingle),
    groupby(shingle) emits co-occurrence pairs, pair-count aggregate gives
    |A∩B|, a broadcast of per-doc set sizes gives |A∪B|.  The exact
    (non-probabilistic) counterpart of the MinHash path, with a full SQL
    oracle."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    shingles = ds.map_batches(
        lambda t: _doc_shingles(t, SHINGLE_K), batch_format="pyarrow"
    ).materialize()

    sizes = shingles.groupby("doc_id").aggregate(Count(alias_name="set_size"))
    import ray as _ray

    size_map = dict(
        zip(
            (r["doc_id"] for r in sizes.take_all()),
            (r["set_size"] for r in sizes.take_all()),
        )
    )
    size_ref = _ray.put(size_map)

    def emit_pairs(g: pa.Table) -> pa.Table:
        ids = sorted(g["doc_id"].to_pylist())
        m = len(ids)
        if m < 2:
            return pa.table(
                {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64())}
            )
        a, b = [], []
        for i in range(m - 1):
            for j in range(i + 1, m):
                a.append(ids[i])
                b.append(ids[j])
        return pa.table({"id_a": pa.array(a, pa.int64()), "id_b": pa.array(b, pa.int64())})

    inter = (
        shingles.groupby("shingle")
        .map_groups(emit_pairs, batch_format="pyarrow")
        .groupby(["id_a", "id_b"])
        .aggregate(Count(alias_name="inter"))
    )

    def jaccard(t: pa.Table) -> pa.Table:
        sm = _ray.get(size_ref)
        ia = t["id_a"].to_pylist()
        ib = t["id_b"].to_pylist()
        inter_n = np.asarray(t["inter"].to_pylist(), dtype=np.float64)
        union_n = np.array([sm[x] + sm[y] for x, y in zip(ia, ib)]) - inter_n
        jac = inter_n / union_n
        out = pa.table(
            {
                "id_a": t["id_a"],
                "id_b": t["id_b"],
                "jaccard": pa.array(jac, pa.float64()),
            }
        )
        return quantize(out, ["jaccard"], scale=1_000_000, suffix="_e6").filter(
            pc.greater_equal(pa.array(jac), threshold)
        )

    return inter.map_batches(jaccard, batch_format="pyarrow").sort(["id_a", "id_b"])


def langid_docs(sf_dir: str) -> ray.data.Dataset:
    """Heuristic language ID + stopword ratio (actor-pool-style batch fn;
    no SQL oracle — lexicon heuristic)."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def ident(t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        out = pa.table(
            {
                "doc_id": t["doc_id"],
                "lang_pred": pa.array(language_id(texts), pa.string()),
                "en_stopword_ratio": pa.array(stopword_ratio(texts, "en"), pa.float64()),
            }
        )
        return quantize(out, ["en_stopword_ratio"], scale=1_000_000, suffix="_e6")

    return ds.map_batches(ident, batch_format="pyarrow").sort("doc_id")


def doc_fingerprints(sf_dir: str) -> ray.data.Dataset:
    """Winnowing fingerprint counts per doc (rolling-hash document
    fingerprinting; rows-only check)."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def fp(t: pa.Table) -> pa.Table:
        counts = [
            int(winnow_fingerprints(s.encode("utf-8")).shape[0])
            for s in t["text"].to_pylist()
        ]
        return pa.table(
            {"doc_id": t["doc_id"], "n_fingerprints": pa.array(counts, pa.int64())}
        )

    return ds.map_batches(fp, batch_format="pyarrow").sort("doc_id")


def simhash_near_pairs(sf_dir: str, max_hamming: int = 8) -> ray.data.Dataset:
    """SimHash near-dup pairs: sign per doc via the signer pool, then
    bucket by the 4 x 16-bit SimHash quadrants (a pair within Hamming
    distance <= 16/quadrant-count shares >=1 quadrant — pigeonhole), verify
    Hamming inside each bucket.  Scale path: one slim shuffle, no O(n^2)."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def to_source(t: pa.Table) -> pa.Table:
        return pa.table(
            {"doc_id": t["doc_id"], "content": pc.cast(t["text"], pa.large_string())}
        )

    signed = ds.map_batches(to_source, batch_format="pyarrow").map_batches(
        MinHashSigner,
        fn_constructor_kwargs={"cfg": SignatureConfig()},
        batch_format="pyarrow",
        batch_size=1024,
        concurrency=(1, 4),
    )

    def quadrants(t: pa.Table) -> pa.Table:
        sim = t["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        n = len(sim)
        qs, keys, ids, sims = [], [], [], []
        for q in range(4):
            part = ((sim >> np.uint64(16 * q)) & np.uint64(0xFFFF)).astype(np.int64)
            qs.append(np.full(n, q, dtype=np.int32))
            keys.append(part)
            ids.append(t["doc_id"].to_numpy(zero_copy_only=False))
            sims.append(sim)
        return pa.table(
            {
                "q": pa.array(np.concatenate(qs), pa.int32()),
                "qkey": pa.array(np.concatenate(keys), pa.int64()),
                "doc_id": pa.array(np.concatenate(ids), pa.int64()),
                "simhash": pa.array(np.concatenate(sims), pa.uint64()),
            }
        )

    def bucket_pairs(g: pa.Table) -> pa.Table:
        m = g.num_rows
        empty = pa.table(
            {
                "id_a": pa.array([], pa.int64()),
                "id_b": pa.array([], pa.int64()),
                "hamming": pa.array([], pa.int64()),
            }
        )
        if m < 2:
            return empty
        ids = g["doc_id"].to_numpy(zero_copy_only=False)
        sims = g["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        order = np.argsort(ids)
        ids, sims = ids[order], sims[order]
        iu, ju = np.triu_indices(m, k=1)
        hd = hamming64(sims[iu], sims[ju])
        keep = hd <= max_hamming
        return pa.table(
            {
                "id_a": pa.array(ids[iu[keep]], pa.int64()),
                "id_b": pa.array(ids[ju[keep]], pa.int64()),
                "hamming": pa.array(hd[keep], pa.int64()),
            }
        )

    pairs = (
        signed.map_batches(quadrants, batch_format="pyarrow")
        .groupby(["q", "qkey"])
        .map_groups(bucket_pairs, batch_format="pyarrow")
        .groupby(["id_a", "id_b"])
        .aggregate(Min("hamming", alias_name="hamming"))
    )
    return pairs.sort(["id_a", "id_b"])


def common_span_pairs(sf_dir: str, threshold: float = 0.5) -> ray.data.Dataset:
    """Exact near-dup SPANS: for each n-gram-Jaccard near-dup pair, the
    longest common substring (length + offsets) via the binary-search +
    rolling-hash stage (suffix-array-equivalent output; rows-only check —
    LCS is not SQL-expressible)."""
    import ray as _ray

    from ..stages.spans import common_spans

    pairs = ngram_jaccard_pairs(sf_dir, threshold=threshold).to_pandas()
    if not len(pairs):
        return ray.data.from_arrow(
            pa.table(
                {
                    "id_a": pa.array([], pa.int64()),
                    "id_b": pa.array([], pa.int64()),
                    "lcs_len": pa.array([], pa.int64()),
                }
            )
        )
    needed = set(pairs["id_a"]) | set(pairs["id_b"])
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    ref = _ray.put(needed)

    def grab(t: pa.Table) -> pa.Table:
        want = _ray.get(ref)
        return t.filter(pa.array([int(i) in want for i in t["doc_id"].to_pylist()]))

    sub = docs.map_batches(grab, batch_format="pyarrow").to_pandas()
    cm = dict(zip(sub["doc_id"], sub["text"]))
    with_content = pa.table(
        {
            "id_a": pa.array([str(x) for x in pairs["id_a"]], pa.string()),
            "id_b": pa.array([str(x) for x in pairs["id_b"]], pa.string()),
            "content_a": pa.array([cm[x] for x in pairs["id_a"]], pa.large_string()),
            "content_b": pa.array([cm[x] for x in pairs["id_b"]], pa.large_string()),
        }
    )
    spans = common_spans(ray.data.from_arrow(with_content))

    def to_int_ids(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "id_a": pc.cast(t["id_a"], pa.int64()),
                "id_b": pc.cast(t["id_b"], pa.int64()),
                "lcs_len": t["lcs_len"],
                "offset_a": t["offset_a"],
                "offset_b": t["offset_b"],
            }
        )

    return spans.map_batches(to_int_ids, batch_format="pyarrow").sort(["id_a", "id_b"])
