"""Text normalization + analysis kernels (numpy / pyarrow vectorized).

Normalization here is the analog of the reference's gap-stripping before
shingle-comparison (``lasvdedup/utils/io_utils.py:139`` strips ``-`` before
writing; our normalization feeds *shingling only* — stored content stays
byte-identical so the sha256 invariant holds).
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .hashing import U64, shingle_hashes, splitmix64

# word-ish tokens: identifiers/numbers — the cheap whitespace-ish tokenizer
TOKEN_REGEX = r"[A-Za-z0-9_]+"
_TOKEN_RE = re.compile(TOKEN_REGEX)
PUNCT_REGEX = r"[.,;:!?]"
# GPT-2-style BPE pre-tokenizer pattern (contraction suffixes, space-glued
# letter/digit/symbol runs, whitespace runs), restricted to RE2 syntax (no
# lookahead) and ASCII classes — both pyarrow's count_substring_regex and
# DuckDB's regexp_extract_all run RE2, so the SQL oracle counts the SAME
# matches
BPE_TOKEN_REGEX = r"'(?:[sdmt]|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+"


def bpe_token_counts(col: pa.Array | pa.ChunkedArray) -> pa.Array | pa.ChunkedArray:
    """BPE-ish token count per string — one vectorized RE2 pass."""
    return pc.count_substring_regex(col, BPE_TOKEN_REGEX)

# tiny per-language stopword lexicons for the n-gram/stopword language-ID
# heuristic (public common-word lists)
STOPWORDS: Dict[str, frozenset] = {
    "en": frozenset("the and of to a in is it you that he was for on are with as at be this".split()),
    "de": frozenset("der die und in den von zu das mit sich des auf ist im dem nicht ein".split()),
    "fr": frozenset("le de la et les des en un du une est que pour dans ce il au pas sur".split()),
    "es": frozenset("de la que el en y a los se del las un por con no una su para es".split()),
    "it": frozenset("di e il la che in a per un è del con non le si da come dei al".split()),
}


def normalize_for_shingling(
    col: pa.Array | pa.ChunkedArray, lowercase: bool = True, collapse_ws: bool = True
) -> pa.Array | pa.ChunkedArray:
    """Vectorized (pyarrow) normalization applied before shingling only."""
    out = col
    if lowercase:
        out = pc.utf8_lower(out)
    if collapse_ws:
        out = pc.replace_substring_regex(out, r"[ \t\r\n\f\v]+", " ")
    return out


def token_counts(col: pa.Array | pa.ChunkedArray) -> pa.Array | pa.ChunkedArray:
    """Number of TOKEN_REGEX tokens per string (pyarrow count_substring_regex)."""
    return pc.count_substring_regex(col, TOKEN_REGEX)


def line_counts(col: pa.Array | pa.ChunkedArray) -> pa.Array | pa.ChunkedArray:
    """Line count = newline count + 1 (empty string -> 1)."""
    return pc.add(pc.count_substring(col, "\n"), 1)


def quality_metrics(col: pa.Array | pa.ChunkedArray) -> Dict[str, pa.Array]:
    """Length / punctuation / alpha / token quality signals, all pyarrow
    kernels (no Python per-row work).  Ratios are 0.0 for empty strings."""
    n_chars = pc.utf8_length(col)
    denom = pc.max_element_wise(n_chars, 1)
    n_alpha = pc.count_substring_regex(col, r"[A-Za-z]")
    n_digit = pc.count_substring_regex(col, r"[0-9]")
    n_punct = pc.count_substring_regex(col, PUNCT_REGEX)
    n_tokens = pc.count_substring_regex(col, TOKEN_REGEX)
    n_ws = pc.count_substring_regex(col, r"[ \t\r\n]")
    f64 = pa.float64()
    denom_f = pc.cast(denom, f64)
    return {
        "n_chars": pc.cast(n_chars, pa.int64()),
        "n_tokens": pc.cast(n_tokens, pa.int64()),
        "alpha_ratio": pc.divide(pc.cast(n_alpha, f64), denom_f),
        "digit_ratio": pc.divide(pc.cast(n_digit, f64), denom_f),
        "punct_ratio": pc.divide(pc.cast(n_punct, f64), denom_f),
        "ws_ratio": pc.divide(pc.cast(n_ws, f64), denom_f),
        "mean_token_len": pc.divide(
            pc.cast(pc.count_substring_regex(col, r"[A-Za-z0-9_]"), f64),
            pc.cast(pc.max_element_wise(n_tokens, 1), f64),
        ),
    }


def stopword_ratio(texts: Sequence[Optional[str]], lang: str = "en") -> np.ndarray:
    """Fraction of tokens that are stopwords of ``lang``.  Token iteration in
    Python — use inside an actor-pool stage on modest batches."""
    sw = STOPWORDS[lang]
    out = np.zeros(len(texts), dtype=np.float64)
    for i, t in enumerate(texts):
        if not t:
            continue
        toks = _TOKEN_RE.findall(t.lower())
        if toks:
            out[i] = sum(1 for w in toks if w in sw) / len(toks)
    return out


def language_id(texts: Sequence[Optional[str]]) -> List[str]:
    """Heuristic language ID: argmax stopword-hit rate across lexicons;
    'und' (undetermined) when nothing matches."""
    langs = list(STOPWORDS)
    out: List[str] = []
    for t in texts:
        if not t:
            out.append("und")
            continue
        toks = _TOKEN_RE.findall(t.lower())
        if not toks:
            out.append("und")
            continue
        best, best_hits = "und", 0
        for lg in langs:
            sw = STOPWORDS[lg]
            hits = sum(1 for w in toks if w in sw)
            if hits > best_hits:
                best, best_hits = lg, hits
        out.append(best)
    return out


def extract_group_key(
    col: pa.Array | pa.ChunkedArray, pattern: str
) -> pa.Array | pa.ChunkedArray:
    """Regex group-key extraction — the reference's sample-id extractor
    (``lasvdedup/utils/sequence_grouping.py:29-37``: ``pattern.search(name)
    .group(0)`` per tip, counting non-matches) as a vectorized pyarrow
    kernel.  Returns the first match per value; null where no match (the
    reference logs-and-skips those)."""
    wrapped = pattern if "(?P<" in pattern else f"(?P<key>{pattern})"
    st = pc.extract_regex(col, wrapped)
    field = st.type[0].name if isinstance(st, pa.Array) else st.chunk(0).type[0].name
    return pc.struct_field(st, field)


def winnow_fingerprints(data: bytes, k: int = 8, window: int = 16) -> np.ndarray:
    """Winnowing document fingerprints (Schleimer et al., SIGMOD 2003):
    the minimum shingle hash in each sliding window of ``window`` k-gram
    hashes, deduplicated.  Vectorized with sliding_window_view."""
    n = len(data)
    if n < k:
        return shingle_hashes(data, k)
    arr = np.frombuffer(data, dtype=np.uint8)
    win = np.lib.stride_tricks.sliding_window_view(arr, k).astype(U64)
    pows = U64(1099511628211) ** np.arange(k - 1, -1, -1, dtype=U64)
    raw = splitmix64((win * pows).sum(axis=1, dtype=U64))
    if raw.shape[0] <= window:
        return np.unique(np.array([raw.min()], dtype=U64))
    wv = np.lib.stride_tricks.sliding_window_view(raw, window)
    return np.unique(wv.min(axis=1))
