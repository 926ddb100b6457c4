"""LSH band-hash candidate generation + pair verification.

Replaces the reference's all-vs-all dense distance matrix
(``lasvdedup/utils/distance_matrix.py:10-43``) with a banded-MinHash
self-join: each row explodes to ``bands`` (band, band_hash) rows, a
``groupby(["band","bh"])`` shuffle co-locates colliding rows, and pairs are
emitted + verified (estimated Jaccard from full signatures) inside
``map_groups`` — one shuffle for candidate generation AND verification
(signatures ride along in the band rows; at extreme scale trade this 16x
signature amplification for a separate signature join).

Skew handling (north_rule): a band bucket larger than ``band_cap``
(boilerplate/license-header hot keys) is NOT expanded O(m^2); its members
are sorted by SimHash (similar docs adjacent w.h.p.) and each links to its
``cap_neighbors`` successors — preserving intra-bucket connectivity for
true dup runs while bounding work to O(m * cap_neighbors).  Truncation is
observable via ``band_stats`` (bucket-size histogram + dropped-pair counts).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import pyarrow as pa
import ray.data
from ray.data.aggregate import Count, Min

from ..config import LSHConfig, SignatureConfig
from ..functions.hashing import band_hashes
from .signatures import sigs_to_matrix

PAIR_SCHEMA = pa.schema(
    [("id_a", pa.string()), ("id_b", pa.string()), ("est_distance", pa.float64())]
)


def make_band_emitter(cfg: SignatureConfig):
    """Stateless map_batches fn: (id, minhash, simhash) -> bands rows each."""
    bands, rows, num_perms = cfg.bands, cfg.rows, cfg.num_perms

    def emit(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return pa.table(
                {
                    "band": pa.array([], pa.int32()),
                    "bh": pa.array([], pa.uint64()),
                    "id": pa.array([], pa.string()),
                    "minhash": pa.array([], pa.large_binary()),
                    "simhash": pa.array([], pa.uint64()),
                }
            )
        blobs = t.column("minhash").to_pylist()
        sigs = sigs_to_matrix(blobs, num_perms)
        bh = band_hashes(sigs, bands, rows)  # (n, bands)
        band_idx = np.tile(np.arange(bands, dtype=np.int32), n)
        # repeat ids/sig/simhash bands times (take with repeated indices —
        # arrow-level, no python loop)
        rep_idx = pa.array(np.repeat(np.arange(n, dtype=np.int64), bands))
        return pa.table(
            {
                "band": pa.array(band_idx, pa.int32()),
                "bh": pa.array(bh.reshape(-1), pa.uint64()),
                "id": t.column("id").take(rep_idx),
                "minhash": t.column("minhash").take(rep_idx),
                "simhash": t.column("simhash").take(rep_idx),
            }
        )

    return emit


def _pairs_table(ids_a, ids_b, dists) -> pa.Table:
    return pa.table(
        {
            "id_a": pa.array(ids_a, pa.string()),
            "id_b": pa.array(ids_b, pa.string()),
            "est_distance": pa.array(dists, pa.float64()),
        },
        schema=PAIR_SCHEMA,
    )


def make_pair_emitter(sig_cfg: SignatureConfig, lsh_cfg: LSHConfig, tau: float):
    """map_groups fn over one (band, bh) bucket: emit verified pairs
    (est Jaccard distance <= tau, inclusive — reference pins ``<=`` at
    ``sequence_grouping.py:53``).  Callers pass ``tau + exact_margin`` when
    borderline pairs get an exact re-check downstream."""
    num_perms = sig_cfg.num_perms
    cap = lsh_cfg.band_cap
    w = lsh_cfg.cap_neighbors

    def emit_pairs(g: pa.Table) -> pa.Table:
        m = g.num_rows
        if m < 2:
            return _pairs_table([], [], [])
        ids = np.asarray(g.column("id").to_pylist(), dtype=object)
        sigs = sigs_to_matrix(g.column("minhash").to_pylist(), num_perms)
        if m <= cap:
            iu, ju = np.triu_indices(m, k=1)
        else:
            order = np.argsort(
                g.column("simhash").to_numpy(zero_copy_only=False), kind="stable"
            )
            ids = ids[order]
            sigs = sigs[order]
            base = np.arange(m - 1)
            iu = np.concatenate([base[: m - d] for d in range(1, w + 1)])
            ju = np.concatenate([base[: m - d] + d for d in range(1, w + 1)])
        est_j = (sigs[iu] == sigs[ju]).mean(axis=1)
        d = 1.0 - est_j
        keep = d <= tau
        iu, ju, d = iu[keep], ju[keep], d[keep]
        a_ids, b_ids = ids[iu], ids[ju]
        swap = a_ids > b_ids  # canonical id_a < id_b
        a_sw = np.where(swap, b_ids, a_ids)
        b_sw = np.where(swap, a_ids, b_ids)
        return _pairs_table(list(a_sw), list(b_sw), d)

    return emit_pairs


def candidate_pairs(
    signed_slim: ray.data.Dataset,
    sig_cfg: SignatureConfig,
    lsh_cfg: Optional[LSHConfig] = None,
    tau: float = 0.2,
) -> ray.data.Dataset:
    """(id, minhash, simhash) dataset -> distinct verified near-dup pairs
    (id_a < id_b, est_distance <= tau).

    Shuffles: band groupby (candidate gen + verify), then a slim pair-key
    groupby deduplicating pairs found in multiple bands (Min over
    est_distance keeps the estimate deterministic).
    """
    lsh_cfg = lsh_cfg or LSHConfig()
    bands_ds = signed_slim.map_batches(
        make_band_emitter(sig_cfg), batch_format="pyarrow", batch_size=4096
    )
    pairs = bands_ds.groupby(["band", "bh"]).map_groups(
        make_pair_emitter(sig_cfg, lsh_cfg, tau), batch_format="pyarrow"
    )
    distinct = (
        pairs.groupby(["id_a", "id_b"])
        .aggregate(Min("est_distance", alias_name="est_distance"))
    )
    return distinct


def band_stats(
    signed_slim: ray.data.Dataset, sig_cfg: SignatureConfig, lsh_cfg: Optional[LSHConfig] = None
) -> ray.data.Dataset:
    """Metrics: per-bucket sizes -> (band, bh, bucket_size, pairs_full,
    pairs_emitted, pairs_dropped).  Feeds the lineage/metrics sink so capped
    (skewed) buckets are observable, never silent."""
    lsh_cfg = lsh_cfg or LSHConfig()
    cap, w = lsh_cfg.band_cap, lsh_cfg.cap_neighbors
    bands_ds = signed_slim.map_batches(
        make_band_emitter(sig_cfg), batch_format="pyarrow", batch_size=4096
    ).select_columns(["band", "bh"])
    counts = bands_ds.groupby(["band", "bh"]).aggregate(Count(alias_name="bucket_size"))

    def derive(t: pa.Table) -> pa.Table:
        m = t.column("bucket_size").to_numpy(zero_copy_only=False).astype(np.int64)
        full = m * (m - 1) // 2
        capped = m > cap
        emitted = np.where(capped, np.minimum(full, m * w - (w * (w + 1)) // 2), full)
        t = t.append_column("pairs_full", pa.array(full, pa.int64()))
        t = t.append_column("pairs_emitted", pa.array(emitted, pa.int64()))
        t = t.append_column("pairs_dropped", pa.array(full - emitted, pa.int64()))
        return t

    return counts.map_batches(derive, batch_format="pyarrow")
