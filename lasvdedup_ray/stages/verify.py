"""Exact-Jaccard re-verification of borderline candidate pairs.

MinHash estimates have sigma ≈ sqrt(J(1-J)/num_perms) ≈ 0.035 at the
J = 1-tau boundary with 128 perms — enough to flip pairs across the
reference's inclusive ``<=`` threshold (``sequence_grouping.py:53``).  To
hold dup-pair recall >= 0.99 *at* the boundary, pairs whose estimated
distance lies within ``exact_margin`` of tau are re-checked with the exact
shingle-set Jaccard: a slim content join (only borderline pair endpoints,
a tiny fraction of the corpus) + a vectorized set intersection per pair.

Pairs with est_distance <= tau - margin are accepted outright; pairs with
est_distance > tau + margin were never emitted by the LSH stage.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..config import LSHConfig, SignatureConfig
from ..functions.hashing import shingle_hashes
from ..functions.text import normalize_for_shingling
from .lsh import PAIR_SCHEMA


def exact_jaccard_for_pairs(
    contents_a, contents_b, cfg: SignatureConfig
) -> np.ndarray:
    """Exact Jaccard over normalized k-shingle hash sets, one value per pair."""
    out = np.empty(len(contents_a), dtype=np.float64)
    for i, (ca, cb) in enumerate(zip(contents_a, contents_b)):
        na = ca.lower() if cfg.lowercase else ca
        nb = cb.lower() if cfg.lowercase else cb
        if cfg.collapse_ws:
            na = " ".join(na.split())
            nb = " ".join(nb.split())
        ha = shingle_hashes(na.encode("utf-8"), cfg.k)
        hb = shingle_hashes(nb.encode("utf-8"), cfg.k)
        inter = np.intersect1d(ha, hb, assume_unique=True).shape[0]
        union = ha.shape[0] + hb.shape[0] - inter
        out[i] = inter / union if union else 1.0
    return out


def verify_pairs(
    pairs: ray.data.Dataset,
    content_by_id: ray.data.Dataset,
    sig_cfg: SignatureConfig,
    lsh_cfg: Optional[LSHConfig] = None,
    tau: float = 0.2,
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """Split candidate pairs into sure / borderline; exact-verify the
    borderline slice via two slim content joins.  Returns the final verified
    edge list (id_a, id_b, est_distance) with d <= tau (inclusive)."""
    lsh_cfg = lsh_cfg or LSHConfig()

    def _safe_filter(pred):
        # empty upstream datasets can arrive schemaless: normalize to
        # PAIR_SCHEMA so downstream joins always see (id_a, id_b, est_distance)
        def fn(t: pa.Table) -> pa.Table:
            if "est_distance" not in t.column_names:
                return PAIR_SCHEMA.empty_table()
            return t.filter(pred(t))

        return fn

    if not lsh_cfg.exact_verify:
        return pairs.map_batches(
            _safe_filter(lambda t: pc.less_equal(t["est_distance"], tau)),
            batch_format="pyarrow",
        )
    m = lsh_cfg.exact_margin
    sure = pairs.map_batches(
        _safe_filter(lambda t: pc.less_equal(t["est_distance"], tau - m)),
        batch_format="pyarrow",
    )
    borderline = pairs.map_batches(
        _safe_filter(lambda t: pc.greater(t["est_distance"], tau - m)),
        batch_format="pyarrow",
    ).materialize()  # tiny: only boundary-zone pairs
    if borderline.count() == 0:
        # a zero-block dataset would reach the join schemaless and fail
        return sure

    j1 = borderline.join(
        content_by_id, join_type="inner", num_partitions=num_partitions,
        on=("id_a",), right_on=("id",),
    ).map_batches(
        lambda t: pa.table(
            {"id_a": t["id_a"], "id_b": t["id_b"], "content_a": t["content"]}
        ),
        batch_format="pyarrow",
    )
    j2 = j1.join(
        content_by_id, join_type="inner", num_partitions=num_partitions,
        on=("id_b",), right_on=("id",),
    )

    def check(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"id_a": pa.array([], pa.string()), "id_b": pa.array([], pa.string()),
                 "est_distance": pa.array([], pa.float64())}, schema=PAIR_SCHEMA)
        ja = exact_jaccard_for_pairs(
            t["content_a"].to_pylist(), t["content"].to_pylist(), sig_cfg
        )
        d = 1.0 - ja
        keep = d <= tau  # inclusive boundary (sequence_grouping.py:53)
        return pa.table(
            {
                "id_a": t["id_a"].filter(pa.array(keep)),
                "id_b": t["id_b"].filter(pa.array(keep)),
                "est_distance": pa.array(d[keep], pa.float64()),
            },
            schema=PAIR_SCHEMA,
        )

    checked = j2.map_batches(check, batch_format="pyarrow")
    return sure.union(checked)
