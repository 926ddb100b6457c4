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
    # pairs feed two consumers (sure + borderline); materialize once so the
    # whole candidate-generation subplan doesn't execute twice
    pairs = pairs.materialize()

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
    m = lsh_cfg.exact_margin_low
    n_pairs = pairs.count()  # metadata-only on the materialized dataset

    if n_pairs <= MAX_DRIVER_PAIRS:
        # common case: the verified-candidate set is tiny relative to the
        # corpus — split sure/borderline and exact-check on the driver in
        # ONE extra distributed pass (the content grab), instead of three
        # separate Ray executions (borderline materialize + filter + join)
        pdf = pairs.to_pandas()
        if len(pdf) == 0:
            return ray.data.from_arrow(PAIR_SCHEMA.empty_table())
        pdf = pdf.drop_duplicates(subset=["id_a", "id_b"])
        border_mask = (pdf["est_distance"] > tau - m).to_numpy()
        sure_df = pdf[~border_mask]
        bdf = pdf[border_mask]
        sure_t = pa.table(
            {
                "id_a": pa.array(list(sure_df["id_a"]), pa.string()),
                "id_b": pa.array(list(sure_df["id_b"]), pa.string()),
                "est_distance": pa.array(
                    sure_df["est_distance"].to_numpy(), pa.float64()
                ),
            },
            schema=PAIR_SCHEMA,
        )
        if not len(bdf):
            return ray.data.from_arrow(sure_t)

        # collect borderline-endpoint contents in one distributed filter
        # pass (no shuffle), then attach contents to pairs and exact-check
        needed = set(bdf["id_a"]) | set(bdf["id_b"])
        id_ref = ray.put(needed)

        def grab(t: pa.Table) -> pa.Table:
            want = ray.get(id_ref)
            mask = pa.array([i in want for i in t["id"].to_pylist()])
            return t.filter(mask)

        def check_batch(t: pa.Table) -> pa.Table:
            ia = t["id_a"].to_pylist()
            ib = t["id_b"].to_pylist()
            ja = exact_jaccard_for_pairs(
                t["content_a"].to_pylist(), t["content_b"].to_pylist(), sig_cfg
            )
            d_exact = 1.0 - ja
            keep = d_exact <= tau  # inclusive boundary (sequence_grouping.py:53)
            return pa.table(
                {
                    "id_a": pa.array([x for x, k in zip(ia, keep) if k], pa.string()),
                    "id_b": pa.array([x for x, k in zip(ib, keep) if k], pa.string()),
                    "est_distance": pa.array(d_exact[keep], pa.float64()),
                },
                schema=PAIR_SCHEMA,
            )

        if len(bdf) <= 5_000:
            # few pairs: attach contents on the driver (distributed joins
            # would leave empty, schemaless partitions and add latency)
            sub = content_by_id.map_batches(grab, batch_format="pyarrow").to_pandas()
            content_map = dict(zip(sub["id"], sub["content"]))
            bdf = bdf.sort_values("id_a")
            border_t = pa.table(
                {
                    "id_a": pa.array(list(bdf["id_a"]), pa.string()),
                    "id_b": pa.array(list(bdf["id_b"]), pa.string()),
                    "est_distance": pa.array(bdf["est_distance"].to_numpy(), pa.float64()),
                    "content_a": pa.array(
                        [content_map[x] for x in bdf["id_a"]], pa.large_string()
                    ),
                    "content_b": pa.array(
                        [content_map[x] for x in bdf["id_b"]], pa.large_string()
                    ),
                }
            )
            checked_ds = ray.data.from_arrow(border_t).map_batches(
                check_batch, batch_format="pyarrow", batch_size=1024
            )
            return ray.data.from_arrow(sure_t).union(checked_ds)

        # many pairs: fully distributed — double hash join against the
        # filtered content subset, with both sides PRE-renamed so no
        # map_batches sits between the joins (a zero-block post-map
        # partition is schemaless and crashes Arrow's join)
        sub_ds = content_by_id.map_batches(grab, batch_format="pyarrow").materialize()
        content_a_ds = sub_ds.map_batches(
            lambda t: pa.table({"id_a": t["id"], "content_a": t["content"]}),
            batch_format="pyarrow",
        ).materialize()
        content_b_ds = sub_ds.map_batches(
            lambda t: pa.table({"id_b": t["id"], "content_b": t["content"]}),
            batch_format="pyarrow",
        ).materialize()
        border_ds = ray.data.from_arrow(
            pa.table(
                {
                    "id_a": pa.array(list(bdf["id_a"]), pa.string()),
                    "id_b": pa.array(list(bdf["id_b"]), pa.string()),
                    "est_distance": pa.array(bdf["est_distance"].to_numpy(), pa.float64()),
                }
            )
        )
        j = border_ds.join(
            content_a_ds, join_type="inner", num_partitions=num_partitions, on=("id_a",)
        ).join(
            content_b_ds, join_type="inner", num_partitions=num_partitions, on=("id_b",)
        )
        checked_ds = j.map_batches(check_batch, batch_format="pyarrow", batch_size=1024)
        return ray.data.from_arrow(sure_t).union(checked_ds)

    # scale path: candidate set too large for the driver — keep everything
    # distributed and trust the signature estimates at the boundary
    # (logged, never silent; at this edge volume the margin pairs are a
    # vanishing fraction)
    logger.warning(
        "candidate pair set %d > %d: skipping driver-side exact verify, "
        "using signature estimates at the boundary",
        n_pairs,
        MAX_DRIVER_PAIRS,
    )
    return pairs.map_batches(
        _safe_filter(lambda t: pc.less_equal(t["est_distance"], tau)),
        batch_format="pyarrow",
    )
