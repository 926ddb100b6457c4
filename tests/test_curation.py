"""Curation operators: PII redaction, repetition metrics, stratified hash
sampling, mixing weights, sequence packing.  Fixtures plant the signal the
sf corpora lack (real PII strings, duplicate lines, packing boundaries)."""

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lasvdedup_ray.functions.hashing import splitmix64
from lasvdedup_ray.pipelines.curation import (
    PACK_TOKEN_BUDGET,
    SAMPLE_DEFAULT_RATE,
    SAMPLE_RATES,
    domain_mix_weights,
    hash_sample_stratified,
    pack_sequences,
    pii_redact_docs,
    repetition_stats_docs,
)


@pytest.fixture(scope="module")
def cur_dir(tmp_path_factory):
    texts = [
        # doc 0: one email, one ip, one phone
        "contact bob@example.com or 10.0.0.1 or 555-123-4567 today",
        # doc 1: two emails, phone with dots
        "a@b.io c@d.org and 555.123.4567",
        # doc 2: clean
        "the quick brown fox jumps over the lazy dog",
        # doc 3: duplicate lines (4 lines, 2 distinct)
        "same line\nsame line\nother\nsame line",
        # doc 4: heavy token repetition
        "spam spam spam spam ham",
        # doc 5: empty text
        "",
    ]
    langs = ["en", "en", "de", "en", "zh", "en"]
    sources = ["web", "web", "books", "web", "forum", "books"]
    d = tmp_path_factory.mktemp("curation")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(langs, pa.string()),
                "source": pa.array(sources, pa.string()),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        str(d / "documents.parquet"),
    )
    return str(d)


def test_pii_counts_and_redaction(ray_session, cur_dir):
    out = pii_redact_docs(cur_dir).to_pandas().set_index("doc_id")
    assert out.loc[0, "n_emails"] == 1
    assert out.loc[0, "n_ips"] == 1
    assert out.loc[0, "n_phones"] == 1
    assert out.loc[1, "n_emails"] == 2
    assert out.loc[1, "n_phones"] == 1
    assert out.loc[2, ["n_emails", "n_ips", "n_phones"]].sum() == 0
    red0 = "contact <EMAIL> or <IP> or <PHONE> today"
    assert out.loc[0, "redacted_sha"] == hashlib.sha256(red0.encode()).hexdigest()
    assert out.loc[0, "n_chars_redacted"] == len(red0)
    # clean doc: redaction is the identity
    assert (
        out.loc[2, "redacted_sha"]
        == hashlib.sha256(b"the quick brown fox jumps over the lazy dog").hexdigest()
    )


def test_repetition_metrics(ray_session, cur_dir):
    out = repetition_stats_docs(cur_dir).to_pandas().set_index("doc_id")
    # doc 3: 4 lines, 2 distinct -> dup_line_frac = 1/2
    assert out.loc[3, "n_lines"] == 4
    assert out.loc[3, "dup_line_frac_e6"] == 500000
    # dup chars: lines are 9+9+5+9=32 chars, distinct 9+5=14 -> 18/32
    assert out.loc[3, "dup_char_frac_e6"] == round(18 / 32 * 1e6)
    # doc 4: 5 tokens, 2 distinct -> 3/5 duplicated
    assert out.loc[4, "n_tokens"] == 5
    assert out.loc[4, "dup_token_frac_e6"] == 600000
    # empty doc: one empty line, zero tokens, all fracs 0
    assert out.loc[5, "n_lines"] == 1
    assert out.loc[5, "n_tokens"] == 0
    assert out.loc[5, "dup_token_frac_e6"] == 0


def test_hash_sample_matches_reference_mask(ray_session, cur_dir):
    out = hash_sample_stratified(cur_dir).to_pandas()
    docs = pq.read_table(f"{cur_dir}/documents.parquet").to_pandas()
    h = splitmix64(docs["doc_id"].to_numpy().astype(np.uint64)) % np.uint64(100)
    rates = docs["lang"].map(lambda lg: SAMPLE_RATES.get(lg, SAMPLE_DEFAULT_RATE))
    expect = set(docs.loc[h < rates.to_numpy().astype(np.uint64), "doc_id"])
    assert set(out["doc_id"]) == expect
    # default-rate language is always kept
    assert 4 in set(out["doc_id"])  # zh -> rate 100


def test_domain_mix_weights_normalized(ray_session, cur_dir):
    t = domain_mix_weights(cur_dir).to_pandas().set_index("source")
    assert t.loc["web", "n_docs"] == 3
    assert t.loc["books", "n_docs"] == 2
    # weights ∝ sqrt(tokens), normalized to ~1e6
    s = np.floor(np.sqrt(t["total_tokens"].to_numpy().astype(float)) * 1000)
    expect = np.floor(s * 1e6 / s.sum() + 0.5).astype(np.int64)
    assert (t["weight_e6"].to_numpy() == expect).all()
    assert abs(t["weight_e6"].sum() - 1_000_000) <= len(t)


def test_pack_sequences_contiguous(ray_session, cur_dir, tmp_path):
    # build a corpus where packing boundaries are known exactly:
    # 10 docs x (BUDGET//3 + 1) tokens -> seq capacity just under 3 docs
    per = PACK_TOKEN_BUDGET // 3 + 1
    texts = [" ".join(f"t{j}" for j in range(per)) for _ in range(10)]
    d = tmp_path / "pack"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(10), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        ),
        str(d / "documents.parquet"),
    )
    out = pack_sequences(str(d)).to_pandas()
    toks = np.full(10, per, dtype=np.int64)
    seq = (np.cumsum(toks) - toks) // PACK_TOKEN_BUDGET
    # sequences are contiguous doc_id ranges covering all docs exactly once
    assert out["n_docs"].sum() == 10
    assert (out["sum_tokens"] == out["n_docs"] * per).all()
    expect_counts = np.bincount(seq)
    assert (out.sort_values("seq_id")["n_docs"].to_numpy() == expect_counts).all()
    assert (out["first_doc"] <= out["last_doc"]).all()
    # ranges do not overlap
    o = out.sort_values("seq_id")
    assert (o["first_doc"].to_numpy()[1:] == o["last_doc"].to_numpy()[:-1] + 1).all()
