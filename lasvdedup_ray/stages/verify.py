"""Exact-Jaccard re-verification of borderline candidate pairs.

MinHash estimates have sigma ≈ sqrt(J(1-J)/num_perms) ≈ 0.035 at the
J = 1-tau boundary with 128 perms — enough to flip pairs across the
reference's inclusive ``<=`` threshold (``sequence_grouping.py:53``).  To
hold dup-pair recall >= 0.99 *at* the boundary, pairs whose estimated
distance lies within ``exact_margin`` of tau are re-checked with the exact
shingle-set Jaccard.

Execution shape: the borderline set is tiny by construction (only pairs in
the ±margin band around tau), so its endpoint id-set is broadcast
(``ray.put``), the matching contents are filtered out of the corpus in one
distributed ``map_batches`` pass (no shuffle), and the exact Jaccard check
runs on the collected subset.  Pairs with est_distance <= tau - margin are
accepted outright; pairs with est_distance > tau + margin were never
emitted by the LSH stage.  If the borderline set exceeds
``max_driver_pairs`` the check degrades gracefully to trusting the
estimates (logged), rather than shipping unbounded content.
"""

from __future__ import annotations

import logging
from typing import Dict, Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ..config import LSHConfig, SignatureConfig
from ..functions.hashing import shingle_hashes
from .lsh import PAIR_SCHEMA

logger = logging.getLogger(__name__)

MAX_DRIVER_PAIRS = 500_000


def _normalize(s: str, cfg: SignatureConfig) -> bytes:
    if cfg.lowercase:
        s = s.lower()
    if cfg.collapse_ws:
        s = " ".join(s.split())
    return s.encode("utf-8")


def exact_jaccard_for_pairs(contents_a, contents_b, cfg: SignatureConfig) -> np.ndarray:
    """Exact Jaccard over normalized k-shingle hash sets, one value per pair."""
    out = np.empty(len(contents_a), dtype=np.float64)
    for i, (ca, cb) in enumerate(zip(contents_a, contents_b)):
        ha = shingle_hashes(_normalize(ca, cfg), cfg.k)
        hb = shingle_hashes(_normalize(cb, cfg), cfg.k)
        inter = np.intersect1d(ha, hb, assume_unique=True).shape[0]
        union = ha.shape[0] + hb.shape[0] - inter
        out[i] = inter / union if union else 1.0
    return out


def _exact_distances(
    ids_a, ids_b, content_map: Dict[str, str], cfg: SignatureConfig
) -> np.ndarray:
    """Pairwise exact Jaccard distance with per-id shingle-set caching."""
    cache: Dict[str, np.ndarray] = {}

    def sh(i: str) -> np.ndarray:
        if i not in cache:
            cache[i] = shingle_hashes(_normalize(content_map[i], cfg), cfg.k)
        return cache[i]

    out = np.empty(len(ids_a), dtype=np.float64)
    for n, (a, b) in enumerate(zip(ids_a, ids_b)):
        ha, hb = sh(a), sh(b)
        inter = np.intersect1d(ha, hb, assume_unique=True).shape[0]
        union = ha.shape[0] + hb.shape[0] - inter
        out[n] = 1.0 - (inter / union if union else 1.0)
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
    borderline slice.  Returns the verified edge list (id_a, id_b,
    est_distance) with d <= tau (inclusive boundary)."""
    lsh_cfg = lsh_cfg or LSHConfig()

    def _safe_filter(pred):
        # empty upstream datasets can arrive schemaless: normalize to
        # PAIR_SCHEMA so every block downstream has (id_a, id_b, est_distance)
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
    n_border = borderline.count()
    if n_border == 0:
        return sure
    if n_border > MAX_DRIVER_PAIRS:
        # degrade gracefully: trust the estimates instead of shipping
        # unbounded content to the driver (logged, never silent)
        logger.warning(
            "borderline pair set too large for exact verify (%d > %d); "
            "falling back to signature estimates at the boundary",
            n_border,
            MAX_DRIVER_PAIRS,
        )
        return pairs.map_batches(
            _safe_filter(lambda t: pc.less_equal(t["est_distance"], tau)),
            batch_format="pyarrow",
        )

    bdf = borderline.to_pandas()
    needed = set(bdf["id_a"]) | set(bdf["id_b"])
    id_ref = ray.put(needed)

    def grab(t: pa.Table) -> pa.Table:
        want = ray.get(id_ref)
        mask = pa.array([i in want for i in t["id"].to_pylist()])
        return t.filter(mask)

    sub = content_by_id.map_batches(grab, batch_format="pyarrow").to_pandas()
    content_map = dict(zip(sub["id"], sub["content"]))
    d_exact = _exact_distances(list(bdf["id_a"]), list(bdf["id_b"]), content_map, sig_cfg)
    keep = d_exact <= tau  # inclusive boundary (sequence_grouping.py:53)
    checked = pa.table(
        {
            "id_a": pa.array(list(bdf["id_a"][keep]), pa.string()),
            "id_b": pa.array(list(bdf["id_b"][keep]), pa.string()),
            "est_distance": pa.array(d_exact[keep], pa.float64()),
        },
        schema=PAIR_SCHEMA,
    )
    return sure.union(ray.data.from_arrow(checked))
