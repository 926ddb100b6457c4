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
import pyarrow.compute as pc
import ray
import ray.data
from ray.data.aggregate import Count, Min

from ..config import LSHConfig, SignatureConfig
from ..functions.hashing import band_hashes, splitmix64 as _smx64
from .exchange import hash_exchange
from .signatures import sig_matrix_from_column, sigs_to_matrix

# worker-process-level caches for broadcast side data (hot-bucket keys and
# the hash-indexed signature store) — ray.get once per worker, not per batch
_WORKER_HOT_CACHE: dict = {}
_WORKER_SIG_CACHE: dict = {}
_WORKER_BLOCK_CACHE: dict = {}


def _cluster_cpus(default: int = 8) -> int:
    try:
        return int(ray.cluster_resources().get("CPU", default))
    except Exception:
        return default

PAIR_SCHEMA = pa.schema(
    [("id_a", pa.string()), ("id_b", pa.string()), ("est_distance", pa.float64())]
)


def make_band_emitter(cfg: SignatureConfig):
    """Stateless map_batches fn: (id, minhash, simhash) -> bands rows each.

    Band rows carry a COMPRESSED signature (low 16 bits of each uint32
    slot, num_perms*2 bytes instead of num_perms*4) used for BOTH in-bucket
    verification and canonical-band pair emission: 16-bit slot-equality
    false positives occur with probability 1/65536, biasing the Jaccard
    estimate by ~1.5e-5 and mis-skipping canonical emission with
    probability ~1e-4 per pair — both negligible against the recall budget
    — while halving the band-shuffle payload.
    """
    bands, rows, num_perms = cfg.bands, cfg.rows, cfg.num_perms

    def emit(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return pa.table(
                {
                    "band": pa.array([], pa.int32()),
                    "bh": pa.array([], pa.uint64()),
                    "id": pa.array([], pa.string()),
                    "sig16": pa.array([], pa.binary(num_perms * 2)),
                    "simhash": pa.array([], pa.uint64()),
                }
            )
        sigs = sig_matrix_from_column(t.column("minhash"), num_perms)
        sig16 = (sigs & np.uint32(0xFFFF)).astype(np.uint16)
        # banding over the sig16 slots (consistent across every plan and
        # with the driver-side hot-set derivation): a band whose low-16
        # slot values agree hashes equal; false band collisions from the
        # dropped high bits are ~2^-64 per pair-band — negligible, and
        # every candidate is verified against the full sig16 anyway
        bh = band_hashes(sig16, bands, rows)  # (n, bands)
        band_idx = np.tile(np.arange(bands, dtype=np.int32), n)
        # repeat ids/sig/simhash bands times (take with repeated indices —
        # arrow-level, no python loop)
        rep_np = np.repeat(np.arange(n, dtype=np.int64), bands)
        rep_idx = pa.array(rep_np)
        sig16_rep = np.ascontiguousarray(sig16[rep_np])  # (n*bands, num_perms)
        sig16_arr = pa.FixedSizeBinaryArray.from_buffers(
            pa.binary(num_perms * 2),
            n * bands,
            [None, pa.py_buffer(sig16_rep.tobytes())],
        )
        return pa.table(
            {
                "band": pa.array(band_idx, pa.int32()),
                "bh": pa.array(bh.reshape(-1), pa.uint64()),
                "id": t.column("id").take(rep_idx),
                "sig16": sig16_arr,
                "simhash": t.column("simhash").take(rep_idx),
            }
        )

    return emit


def sig16_matrix(col: pa.ChunkedArray | pa.Array, num_perms: int) -> np.ndarray:
    """Zero-copy decode of the fixed_size_binary(num_perms*2) sig16 column
    into a (n, num_perms) uint16 matrix."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.empty((0, num_perms), dtype=np.uint16)
    buf = col.buffers()[1]
    off = col.offset * num_perms * 2
    return np.frombuffer(
        buf, dtype=np.uint16, count=n * num_perms, offset=off
    ).reshape(n, num_perms)


def _pairs_table(ids_a, ids_b, dists) -> pa.Table:
    return pa.table(
        {
            "id_a": pa.array(ids_a, pa.string()),
            "id_b": pa.array(ids_b, pa.string()),
            "est_distance": pa.array(dists, pa.float64()),
        },
        schema=PAIR_SCHEMA,
    )


SLIM_BAND_SCHEMA = pa.schema(
    [
        ("band", pa.int32()),
        ("bh", pa.uint64()),
        ("idh", pa.uint64()),
        ("simhash", pa.uint64()),
        ("cmask", pa.uint64()),
        ("pkey", pa.int32()),
    ]
)


def _hash_combine(band_arr: np.ndarray, bh_arr: np.ndarray) -> np.ndarray:
    """64-bit combined (band, bh) bucket key; a false collision only ships
    one extra row into the shuffle (never drops a hot row)."""
    return _smx64(bh_arr.astype(np.uint64) ^ _smx64(band_arr.astype(np.uint64)))


def _in_sorted(arr: np.ndarray, vals: np.ndarray) -> np.ndarray:
    """Membership of ``vals`` in the sorted uint64 array ``arr``."""
    if not len(arr):
        return np.zeros(len(vals), dtype=bool)
    pos = np.searchsorted(arr, vals)
    pos[pos >= len(arr)] = len(arr) - 1
    return arr[pos] == vals


def _member(struct, comb: np.ndarray) -> np.ndarray:
    """Hot-bucket membership against either representation: ("exact",
    sorted-keys) or ("bloom", bitmap, mask)."""
    if struct[0] == "exact":
        return _in_sorted(struct[1], comb)
    _, bitmap, bmask = struct
    ok = np.ones(len(comb), dtype=bool)
    for probe in (comb & bmask, _smx64(comb) & bmask):
        word = bitmap[probe >> np.uint64(6)]
        ok &= (word >> (probe & np.uint64(63))) & np.uint64(1) != 0
    return ok


def _make_store_row_fn(sig_cfg: SignatureConfig):
    """map_batches fn: (id, minhash) -> (idh, sig16-binary, id) store rows;
    the sig16 + id-hash are computed on workers."""
    import pandas as _pd

    np_ = sig_cfg.num_perms

    def to_store_rows(t: pa.Table) -> pa.Table:
        ids_b = np.asarray(t.column("id").to_pylist(), dtype=object)
        sigs_b = sig_matrix_from_column(t.column("minhash"), np_)
        s16 = np.ascontiguousarray((sigs_b & np.uint32(0xFFFF)).astype(np.uint16))
        sig_arr = pa.FixedSizeBinaryArray.from_buffers(
            pa.binary(np_ * 2), len(ids_b), [None, pa.py_buffer(s16.tobytes())]
        )
        return pa.table(
            {
                "idh": pa.array(
                    _pd.util.hash_array(ids_b, categorize=False), pa.uint64()
                ),
                "sig": sig_arr,
                "id": t.column("id"),
            }
        )

    return to_store_rows


@ray.remote(num_cpus=0)
def _block_bounds(tbl: pa.Table):
    """(first_idh, last_idh, num_rows, has_internal_dup) of one sorted
    store block — runs where the block lives; ships 4 scalars back."""
    n = tbl.num_rows
    if n == 0:
        return (0, 0, 0, False)
    idh = tbl.column("idh").to_numpy(zero_copy_only=False).astype(np.uint64)
    dup = bool(np.any(idh[1:] == idh[:-1])) if n > 1 else False
    return (int(idh[0]), int(idh[-1]), n, dup)


def _build_sig_store_blocks(signed_slim: ray.data.Dataset, sig_cfg: SignatureConfig):
    """Distributed broadcast-store assembly (VERDICT r2 #7): an idh sort
    SHUFFLE orders the store rows, the blocks stay in plasma, and the
    driver holds only (first-idh boundaries, block refs) — it never
    concatenates the signature matrix (the blob builder costs ~800 MB of
    driver RAM + a serial collect pass at the 3M-row cap).  Workers
    resolve an idh by boundary searchsorted -> zero-copy block read ->
    in-block searchsorted.  Returns None on an id-hash collision (same
    inline fallback as the blob builder)."""
    sorted_ds = (
        signed_slim.select_columns(["id", "minhash"])
        .map_batches(_make_store_row_fn(sig_cfg), batch_format="pyarrow", batch_size=8192)
        .sort("idh")
        .materialize()
    )
    refs = sorted_ds.to_arrow_refs()
    bounds = ray.get([_block_bounds.remote(r) for r in refs])
    firsts, lasts, kept_refs = [], [], []
    for (f, l, n, dup), r in zip(bounds, refs):
        if n == 0:
            continue
        if dup:
            import logging

            logging.getLogger(__name__).warning(
                "id-hash collision in block signature store: falling back "
                "to inline signature transport"
            )
            return None
        firsts.append(f)
        lasts.append(l)
        kept_refs.append(r)
    if not kept_refs:
        return None
    firsts_np = np.asarray(firsts, dtype=np.uint64)
    lasts_np = np.asarray(lasts, dtype=np.uint64)
    if np.any(lasts_np[:-1] == firsts_np[1:]):  # cross-block boundary dup
        import logging

        logging.getLogger(__name__).warning(
            "id-hash collision at a block boundary: falling back to inline "
            "signature transport"
        )
        return None
    return ray.put(("blocks", firsts_np, kept_refs))


def _resolve_from_blocks(store, idh_vals: np.ndarray, num_perms: int):
    """Worker-side lookup against the block store: per-block zero-copy
    decode (cached per worker process), searchsorted within."""
    _, firsts, refs = store
    n = len(idh_vals)
    sigs = np.empty((n, num_perms), dtype=np.uint16)
    ids = np.empty(n, dtype=object)
    bidx = np.searchsorted(firsts, idh_vals, side="right") - 1
    bidx[bidx < 0] = 0
    for b in np.unique(bidx):
        ref = refs[int(b)]
        key = ref.hex()
        if key not in _WORKER_BLOCK_CACHE:
            tbl = ray.get(ref)
            _WORKER_BLOCK_CACHE[key] = (
                tbl.column("idh").to_numpy(zero_copy_only=False).astype(np.uint64),
                sig16_matrix(tbl.column("sig"), num_perms),
                np.asarray(tbl.column("id").to_pylist(), dtype=object),
            )
        idh_b, sig_b, ids_b = _WORKER_BLOCK_CACHE[key]
        mask = bidx == b
        pos = np.searchsorted(idh_b, idh_vals[mask])
        pos[pos >= len(idh_b)] = len(idh_b) - 1
        sigs[mask] = sig_b[pos]
        ids[mask] = ids_b[pos]
    return sigs, ids


def _build_sig_store(signed_slim: ray.data.Dataset, sig_cfg: SignatureConfig):
    """Assemble the broadcast signature store: one idh-sorted (idh, sig16,
    ids) blob in plasma (``ray.put`` once; zero-copy reads, one physical
    copy per node).  Returns ``(store_ref, sig16_matrix)`` — the matrix is
    handed back so the caller can derive the hot/capped bucket sets
    driver-side without a second distributed pass.  Returns ``(None,
    None)`` on a 64-bit id-hash collision between two distinct ids (ADVICE
    r2: searchsorted would silently resolve both to one signature and emit
    pairs with wrong ids) — callers must then fall back to inline
    signature transport."""
    np_ = sig_cfg.num_perms
    idh_parts, sig_parts, id_parts = [], [], []
    for b in (
        signed_slim.select_columns(["id", "minhash"])
        .map_batches(
            _make_store_row_fn(sig_cfg), batch_format="pyarrow", batch_size=8192
        )
        .iter_batches(batch_size=1 << 16, batch_format="pyarrow")
    ):
        idh_parts.append(b.column("idh").to_numpy(zero_copy_only=False).astype(np.uint64))
        sig_parts.append(sig16_matrix(b.column("sig"), np_).copy())
        col = b.column("id")
        id_parts.extend(col.chunks if isinstance(col, pa.ChunkedArray) else [col])
    if not idh_parts:
        return None, None
    idh_all = np.concatenate(idh_parts)
    order = np.argsort(idh_all, kind="stable")
    idh_sorted = idh_all[order]
    if idh_sorted.size > 1 and bool(np.any(idh_sorted[1:] == idh_sorted[:-1])):
        import logging

        logging.getLogger(__name__).warning(
            "id-hash collision in broadcast signature store (n=%d): "
            "falling back to inline signature transport",
            idh_sorted.size,
        )
        return None, None
    sig16_sorted = np.ascontiguousarray(np.vstack(sig_parts)[order])
    # ids stay an ARROW string array: its buffers travel out-of-band
    # through plasma (zero-copy per worker), instead of an object ndarray
    # whose unpickle materializes n Python strings in every worker process
    ids_sorted = pa.concat_arrays(
        [c.cast(pa.string()) for c in id_parts]
    ).take(pa.array(order, pa.int64()))
    ref = ray.put(("blob", idh_sorted, sig16_sorted, ids_sorted))
    return ref, sig16_sorted


@ray.remote
def _hot_chunk_split(sig16_chunk: np.ndarray, bands: int, rows: int, n_buckets: int):
    """Band-hash one row chunk and range-split the combined keys by their
    TOP bits into ``n_buckets`` sorted arrays (num_returns=n_buckets)."""
    n = sig16_chunk.shape[0]
    bh = band_hashes(sig16_chunk, bands, rows)
    band_idx = np.tile(np.arange(bands, dtype=np.int64), n)
    comb = np.sort(_hash_combine(band_idx, bh.reshape(-1)))
    # the top-bits shift only yields monotonic disjoint ranges for
    # power-of-two bucket counts; any other value wraps uint64 and
    # silently unsorts the merged hot-key set (searchsorted misses)
    assert n_buckets & (n_buckets - 1) == 0, (
        f"_hot_chunk_split requires power-of-two n_buckets, got {n_buckets}"
    )
    shift = np.uint64(64 - int(n_buckets).bit_length() + 1)
    bounds = np.searchsorted(
        comb, np.arange(1, n_buckets, dtype=np.uint64) << shift
    )
    return tuple(np.split(comb, bounds))


@ray.remote
def _hot_bucket_merge(band_cap: int, *parts: np.ndarray):
    """Global per-key counts within one key RANGE: sorted concat + run
    lengths -> (hot keys sorted, capped keys sorted)."""
    allk = np.concatenate(parts)
    if allk.size == 0:
        e = np.empty(0, dtype=np.uint64)
        return e, e
    allk.sort()
    first = np.ones(allk.size, dtype=bool)
    first[1:] = allk[1:] != allk[:-1]
    starts = np.flatnonzero(first)
    cnt = np.diff(np.append(starts, allk.size))
    uniq = allk[starts]
    return uniq[cnt >= 2], uniq[cnt > band_cap]


def _derive_hot_sets(sig16: np.ndarray, sig_cfg: SignatureConfig, band_cap: int):
    """Hot/capped bucket derivation from the full sig16 matrix (the
    broadcast store already collected it).  Small inputs run one
    vectorized band-hash + unique pass on the driver; larger ones fan the
    band hashing + counting out as a two-wave distributed unique (row
    chunks split keys by top bits into range buckets; one merge task per
    bucket), so the driver only concatenates the already-sorted hot-key
    ranges — the serial pass was ~3.4 s of CPU-count-independent wall at
    600k rows.  Returns the same exact ("exact", sorted-keys) structure +
    capped key array either way."""
    n = sig16.shape[0]
    if n <= 100_000 or not ray.is_initialized():
        bh = band_hashes(sig16, sig_cfg.bands, sig_cfg.rows)  # (n, bands)
        band_idx = np.tile(np.arange(sig_cfg.bands, dtype=np.int64), n)
        comb = _hash_combine(band_idx, bh.reshape(-1))
        uniq, cnt = np.unique(comb, return_counts=True)  # sorted keys
        hot = cnt >= 2
        return ("exact", uniq[hot]), uniq[cnt > band_cap]
    n_chunks = max(2, min(16, _cluster_cpus() // 2))
    n_buckets = 16
    bounds = np.linspace(0, n, n_chunks + 1, dtype=np.int64)
    splits = [
        _hot_chunk_split.options(num_returns=n_buckets).remote(
            sig16[bounds[i] : bounds[i + 1]], sig_cfg.bands, sig_cfg.rows, n_buckets
        )
        for i in range(n_chunks)
    ]
    merged = ray.get(
        [
            _hot_bucket_merge.remote(band_cap, *[row[b] for row in splits])
            for b in range(n_buckets)
        ]
    )
    # buckets are disjoint ascending key RANGES: concatenation stays sorted
    hot_keys = np.concatenate([m[0] for m in merged])
    capped_keys = np.concatenate([m[1] for m in merged])
    return ("exact", hot_keys), capped_keys


def _make_slim_band_emitter(sig_cfg: SignatureConfig, num_partitions: int, hot_ref):
    """map_batches fn: (id, minhash, simhash) -> slim ~40 B band rows
    (band, bh, idh, simhash, cmask, pkey) for broadcast-store transport.
    Only rows in hot (>= 2 member) buckets ship; cmask flags capped
    bands."""
    bands, rows = sig_cfg.bands, sig_cfg.rows

    def emit_slim(t: pa.Table) -> pa.Table:
        import pandas as _pd

        n = t.num_rows
        if n == 0:
            return SLIM_BAND_SCHEMA.empty_table()
        sigs = sig_matrix_from_column(t.column("minhash"), sig_cfg.num_perms)
        sig16 = (sigs & np.uint32(0xFFFF)).astype(np.uint16)
        bh = band_hashes(sig16, bands, rows)  # (n, bands)
        band_idx = np.tile(np.arange(bands, dtype=np.int64), n)
        bh_flat = bh.reshape(-1)
        if hot_ref not in _WORKER_HOT_CACHE:
            _WORKER_HOT_CACHE.clear()
            _WORKER_HOT_CACHE[hot_ref] = ray.get(hot_ref)
        hot_struct_w, capped_w = _WORKER_HOT_CACHE[hot_ref]
        comb = _hash_combine(band_idx, bh_flat)
        capped_bits = _in_sorted(capped_w, comb).reshape(-1, bands)
        cm = np.bitwise_or.reduce(
            capped_bits.astype(np.uint64) << np.arange(bands, dtype=np.uint64),
            axis=1,
        )
        keep = _member(hot_struct_w, comb)
        ids_b = np.asarray(t.column("id").to_pylist(), dtype=object)
        idh_b = _pd.util.hash_array(ids_b, categorize=False)
        sim_b = t.column("simhash").to_numpy(zero_copy_only=False).astype(np.uint64)
        rep = np.repeat(np.arange(n, dtype=np.int64), bands)[keep]
        return pa.table(
            {
                "band": pa.array(band_idx[keep].astype(np.int32), pa.int32()),
                "bh": pa.array(bh_flat[keep], pa.uint64()),
                "idh": pa.array(idh_b[rep], pa.uint64()),
                "simhash": pa.array(sim_b[rep], pa.uint64()),
                "cmask": pa.array(cm[rep], pa.uint64()),
                "pkey": pa.array(
                    (bh_flat[keep] & np.uint64(num_partitions - 1)).astype(np.int32),
                    pa.int32(),
                ),
            },
            schema=SLIM_BAND_SCHEMA,
        )

    return emit_slim


def make_partition_pair_emitter(
    sig_cfg: SignatureConfig,
    lsh_cfg: LSHConfig,
    tau: float,
    sig_store_ref=None,
):
    """map_groups fn over one HASH PARTITION of band rows (many buckets per
    call): sorts the partition by (band, bh), finds bucket boundaries
    vectorized, and only loops Python over buckets with >= 2 members —
    Ray-groupby-per-bucket would make one Python call per (band, bh) bucket
    (~32x corpus size, mostly singletons), which dominates wall time.

    Emits verified pairs (est Jaccard distance <= tau, inclusive — the
    reference pins ``<=`` at ``sequence_grouping.py:53``).  Callers pass
    ``tau + exact_margin`` when borderline pairs get an exact re-check
    downstream.

    CANONICAL-BAND EMISSION: a pair is emitted only by the FIRST band in
    which its rows' slots agree (computed per pair from the sig16 slot
    equality matrix).  Without this, an exact-dup pair collides in every
    band and the edge list inflates x bands (3.5M instead of ~120k edges
    for a 300k-file corpus) — with it, multiplicity is ~1 and no
    downstream pair-dedup shuffle is needed.

    CAPPED-BAND EXCEPTION (ADVICE r1): a capped bucket emits only
    SimHash-chained neighbor pairs, so an "earlier" band that was capped
    may never have emitted the pair — skipping it here would suppress the
    edge in EVERY band.  Each band row therefore carries ``cmask``, a
    bitmask of which of its bands landed in a capped (> band_cap) bucket
    (computed against the global bucket-count side data), and the
    earlier-band skip only trusts UNCAPPED earlier bands.  Pairs that a
    capped bucket did chain may then be emitted twice (capped band + a
    later uncapped band) — multiplicity, not loss; union-find is
    insensitive and ``dedup_pairs=True`` restores exact uniqueness."""
    num_perms = sig_cfg.num_perms
    cap = lsh_cfg.band_cap
    w = lsh_cfg.cap_neighbors
    rows_per_band = sig_cfg.rows
    n_bands = sig_cfg.bands
    if n_bands > 64:
        raise ValueError("cmask capped-band bitmask supports at most 64 bands")

    band_arange = np.arange(n_bands, dtype=np.int64)
    band_arange_u64 = np.arange(n_bands, dtype=np.uint64)

    def emit_partition(g: pa.Table) -> pa.Table:
        m = g.num_rows
        if m < 2:
            return _pairs_table([], [], [])
        band = g.column("band").to_numpy(zero_copy_only=False).astype(np.int64)
        bh = g.column("bh").to_numpy(zero_copy_only=False).astype(np.uint64)
        sim = g.column("simhash").to_numpy(zero_copy_only=False).astype(np.uint64)
        if "cmask" in g.column_names:
            cmask = g.column("cmask").to_numpy(zero_copy_only=False).astype(np.uint64)
        else:  # band rows emitted without the hot/capped prefilter
            cmask = np.zeros(m, dtype=np.uint64)
        if sig_store_ref is not None and "idh" in g.column_names:
            # broadcast-signature mode: resolve sigs + ids from the shared
            # hash-indexed store (one plasma object per node, zero-copy).
            # Two layouts: ("blob", idh, sig, ids) — driver-assembled under
            # hot_driver_cap — and ("blocks", boundaries, refs) — the
            # distributed sort assembly (VERDICT r2 #7).
            if sig_store_ref not in _WORKER_SIG_CACHE:
                _WORKER_SIG_CACHE.clear()
                _WORKER_SIG_CACHE[sig_store_ref] = ray.get(sig_store_ref)
            store = _WORKER_SIG_CACHE[sig_store_ref]
            idh_vals = g.column("idh").to_numpy(zero_copy_only=False).astype(np.uint64)
            if store[0] == "blocks":
                sigs, ids_obj = _resolve_from_blocks(store, idh_vals, num_perms)
                ids_src, ids_idx, idh_pre = None, None, None
            else:
                # blob layout: sigs/idh are zero-copy numpy views and ids an
                # Arrow string array straight out of plasma.  Rows carry
                # STORE INDICES through the sort/emission below; strings are
                # materialized only for the few emitted pairs (fetch()),
                # never for all m band rows.
                _, IDH, SIG, IDS = store
                pos = np.searchsorted(IDH, idh_vals)
                sigs = SIG[pos]
                ids_obj, ids_src, ids_idx = None, IDS, pos
                # idh_vals IS pd.util.hash_array(id) per store construction
                # (collision-checked), so the tie-break hash below needs no
                # re-hash of resolved strings
                idh_pre = idh_vals
        else:
            ids_obj = np.asarray(g.column("id").to_pylist(), dtype=object)
            ids_src, ids_idx, idh_pre = None, None, None
            sigs = sig16_matrix(g.column("sig16"), num_perms)

        def fetch(ridx: np.ndarray) -> np.ndarray:
            # row indices -> id strings (object ndarray); reads the CURRENT
            # ids_obj/ids_idx bindings (they are reindexed alongside sigs)
            if ids_obj is not None:
                return ids_obj[ridx]
            return np.asarray(
                ids_src.take(pa.array(ids_idx[ridx], pa.int64())).to_pylist(),
                dtype=object,
            )

        # 64-bit hash of each row's full signature: identical signatures
        # (exact dups and sketch-identical near-dups) collapse to ONE
        # representative per bucket below — the O(m^2) in-bucket expansion
        # then runs over DISTINCT signatures only, and identical followers
        # attach by star edges (single-linkage components are preserved:
        # a star reaches everything a clique reaches).
        from ..functions.hashing import splitmix64 as _smx64

        # fold 4 uint16 slots at a time via a uint64 view (32 passes, not 128)
        sig64 = np.ascontiguousarray(sigs).view(np.uint64).reshape(m, num_perms // 4)
        sigh = np.zeros(m, dtype=np.uint64)
        for j in range(sig64.shape[1]):
            sigh = sigh * np.uint64(0x9E3779B97F4A7C15) + sig64[:, j]
        sigh = _smx64(sigh)

        # deterministic rep choice WITHOUT sorting object strings (an
        # object-dtype lexsort key costs more than the whole pair pass):
        # a 64-bit id hash breaks run-internal ties reproducibly
        import pandas as _pd

        if idh_pre is not None:
            idh = idh_pre
        else:
            idh = _pd.util.hash_array(ids_obj, categorize=False)
        order = np.lexsort((idh, sigh, bh, band))
        band, bh, sim, sigs = band[order], bh[order], sim[order], sigs[order]
        if ids_obj is not None:
            ids_obj = ids_obj[order]
        else:
            ids_idx = ids_idx[order]
        cmask, sigh = cmask[order], sigh[order]
        boundary = np.ones(m, dtype=bool)
        boundary[1:] = (band[1:] != band[:-1]) | (bh[1:] != bh[:-1])

        # identical-signature runs inside each bucket
        grp_first = boundary.copy()
        grp_first[1:] |= sigh[1:] != sigh[:-1]
        run_id = np.cumsum(grp_first) - 1
        rep_pos = np.flatnonzero(grp_first)  # first row of each run
        rep_of_row = rep_pos[run_id]

        out_a, out_b, out_d = [], [], []

        # star edges: follower -> its run representative, emitted ONLY in
        # the first uncapped band (all bands agree for identical sigs, so
        # exactly one band emits; if every band is capped, band 0 emits)
        followers = np.flatnonzero(~grp_first)
        if followers.size:
            inv = (~cmask[followers]) & np.uint64((1 << n_bands) - 1)
            lsb = inv & (np.uint64(0) - inv)
            first_unc = np.where(
                inv == 0, 0, np.log2(np.maximum(lsb, 1).astype(np.float64)).astype(np.int64)
            )
            emit_mask = band[followers] == first_unc
            f = followers[emit_mask]
            if f.size:
                a_ids, b_ids = fetch(rep_of_row[f]), fetch(f)
                swap = a_ids > b_ids
                out_a.append(np.where(swap, b_ids, a_ids))
                out_b.append(np.where(swap, a_ids, b_ids))
                out_d.append(np.zeros(f.size, dtype=np.float64))

        # representative-only view: rebuild bucket boundaries over reps
        band = band[rep_pos]
        bh = bh[rep_pos]
        if ids_obj is not None:
            ids_obj = ids_obj[rep_pos]
        else:
            ids_idx = ids_idx[rep_pos]
        sim = sim[rep_pos]
        sigs = sigs[rep_pos]
        cmask = cmask[rep_pos]
        m = rep_pos.size
        boundary = np.ones(m, dtype=bool)
        boundary[1:] = (band[1:] != band[:-1]) | (bh[1:] != bh[:-1])
        starts = np.flatnonzero(boundary)
        sizes = np.diff(np.append(starts, m))

        def flush(iu: np.ndarray, ju: np.ndarray, in_capped_bucket: bool = False) -> None:
            """Verify + canonically emit a batch of global (iu, ju) pairs
            — shared by the size-batched fast path and the capped loop."""
            if iu.size == 0:
                return
            eq = sigs[iu] == sigs[ju]  # (npairs, num_perms)
            d = 1.0 - np.count_nonzero(eq, axis=1) / float(num_perms)
            keep = d <= tau
            # the canonical-band skip below costs ~3 linear passes over
            # (npairs, num_perms); survivors of the tau filter are a tiny
            # fraction of raw bucket pairs, so filter FIRST and run the
            # band logic on survivors only
            if not np.any(keep):
                return
            iu, ju, d, eq = iu[keep], ju[keep], d[keep], eq[keep]
            keep = np.ones(iu.size, dtype=bool)
            # Canonical-band skip, capped-aware (ADVICE r1):
            # - UNCAPPED bucket: skip only if an earlier UNCAPPED band
            #   agreed (it fully expanded and emitted the pair).  An earlier
            #   capped band only chained SimHash neighbors and cannot be
            #   trusted — without this, a pair whose first agreeing band is
            #   capped is suppressed in EVERY band.
            # - CAPPED bucket (chain pairs): keep the original any-earlier-
            #   band skip — an earlier capped band over the same membership
            #   chained the SAME pairs (identical SimHash order), so
            #   dropping the skip would emit every mega-dup chain pair once
            #   per band (x bands edge blowup, measured 32x on the bench
            #   corpus).
            b_cur = band[iu]
            band_eq = eq.reshape(-1, n_bands, rows_per_band).all(axis=2)
            if in_capped_bucket:
                earlier = (band_eq & (band_arange[None, :] < b_cur[:, None])).any(axis=1)
            else:
                uncapped = ((cmask[iu][:, None] >> band_arange_u64[None, :]) & 1) == 0
                earlier = (
                    band_eq & uncapped & (band_arange[None, :] < b_cur[:, None])
                ).any(axis=1)
            keep &= ~earlier
            iu, ju, d = iu[keep], ju[keep], d[keep]
            if iu.size == 0:
                return
            a_ids, b_ids = fetch(iu), fetch(ju)
            swap = a_ids > b_ids  # canonical id_a < id_b
            out_a.append(np.where(swap, b_ids, a_ids))
            out_b.append(np.where(swap, a_ids, b_ids))
            out_d.append(d)

        # fast path: buckets of the same (small) size are expanded together
        # — per-bucket Python looping costs ~0.2 ms x millions of tiny
        # buckets and dominated this stage before.  The naive expansion
        # (gather sigs[iu]/sigs[ju] per raw pair) moves 2 x 256 B of DRAM
        # per pair — ~3 GB per partition at 600k files, which made this
        # stage memory-bandwidth-bound and ANTI-scale 8 -> 32 CPUs.  The
        # blocked path below instead gathers each bucket's CONTIGUOUS
        # signature rows once (256 B per row), compares inside the
        # cache-resident block in ~1024-pair chunks whose temporaries fit
        # the core-PRIVATE L2 (~512 KB — measured 2.5x faster than 8k-pair
        # chunks at 16-way concurrency: L3 is shared and thrashes), and
        # hands only the tau-survivors (a tiny fraction) to ``flush``,
        # which redoes the exact compare + canonical-band logic on that
        # small set — the emitted pair sequence is bit-identical to the
        # naive expansion (pinned by tests/test_skew.py / the flagship
        # oracle).
        pair_chunk = max(1, int(lsh_cfg.pair_batch_rows) // 64)
        multi = sizes >= 2
        small = multi & (sizes <= cap)
        fperms = float(num_perms)
        for sz in np.unique(sizes[small]):
            sz = int(sz)
            ss = starts[sizes == sz]
            iu_l, ju_l = np.triu_indices(sz, k=1)
            npl = iu_l.size
            if npl <= pair_chunk:
                # many buckets per chunk: block gather (nb, sz, perms),
                # broadcast-compare all triu pairs of every bucket at once
                step = max(1, pair_chunk // npl)
                col = np.arange(sz, dtype=np.int64)
                for c0 in range(0, ss.size, step):
                    sc = ss[c0 : c0 + step]
                    block = sigs[(sc[:, None] + col[None, :]).ravel()]
                    block = block.reshape(sc.size, sz, num_perms)
                    cnt = (block[:, iu_l, :] == block[:, ju_l, :]).sum(axis=2)
                    sel = (1.0 - cnt / fperms) <= tau
                    selr = sel.ravel()
                    if selr.any():
                        flush(
                            (sc[:, None] + iu_l[None, :]).ravel()[selr],
                            (sc[:, None] + ju_l[None, :]).ravel()[selr],
                        )
            else:
                # one big bucket at a time: its (sz, perms) slice is a
                # cache-resident view; chunk the triu pair list instead
                for s in ss:
                    blk = sigs[s : s + sz]
                    for p0 in range(0, npl, pair_chunk):
                        il = iu_l[p0 : p0 + pair_chunk]
                        jl = ju_l[p0 : p0 + pair_chunk]
                        cnt = (blk[il] == blk[jl]).sum(axis=1)
                        sel = (1.0 - cnt / fperms) <= tau
                        if sel.any():
                            flush(s + il[sel], s + jl[sel])

        # capped path: oversized (skewed) buckets chain SimHash neighbors
        for s, sz in zip(starts[sizes > cap], sizes[sizes > cap]):
            sz = int(sz)
            so = np.argsort(sim[s : s + sz], kind="stable") + s
            base = np.arange(sz - 1)
            iu_l = np.concatenate([base[: sz - d] for d in range(1, w + 1)])
            ju_l = np.concatenate([base[: sz - d] + d for d in range(1, w + 1)])
            flush(so[iu_l], so[ju_l], in_capped_bucket=True)

        if not out_a:
            return _pairs_table([], [], [])
        return _pairs_table(
            list(np.concatenate(out_a)),
            list(np.concatenate(out_b)),
            np.concatenate(out_d),
        )

    return emit_partition


def candidate_pairs(
    signed_slim: ray.data.Dataset,
    sig_cfg: SignatureConfig,
    lsh_cfg: Optional[LSHConfig] = None,
    tau: float = 0.2,
    num_partitions: int = 64,
    dedup_pairs: bool = False,
    n_rows_hint: Optional[int] = None,
) -> ray.data.Dataset:
    """(id, minhash, simhash) dataset -> verified near-dup pairs
    (id_a < id_b, est_distance <= tau).

    One band-shuffle plan with two size-gated ingredients (all variants
    emit identical pair sets, pinned by ``tests/test_path_equivalence.py``):

    - SIGNATURE TRANSPORT: under ``sig_broadcast_cap`` rows, signatures
      ship once as a hash-indexed broadcast store and band rows are ~40 B
      slim; above it they ride inline (nothing node-sized exists at 10^12
      rows).
    - HOT/CAPPED BUCKET SETS: under ``hot_driver_cap`` rows (broadcast
      mode only) they are derived driver-side from the store's sig16
      matrix — no second distributed pass, none of its materialize/count
      barriers (the r2 small-scale regression).  Above it, a slim
      (band, bh) count pass finds them distributed.  Only rows in hot
      (>= 2 member) buckets enter the band shuffle, and canonical-band
      emission keeps pair multiplicity ~1 with no pair-dedup shuffle.

    ``n_rows_hint``: caller-known row count of ``signed_slim`` (skips a
    count pass)."""
    lsh_cfg = lsh_cfg or LSHConfig()
    # ~4 partitions per CPU: with one partition per core, a single skewed
    # bucket-partition is a straggler that caps scaling; extra waves let
    # the scheduler rebalance (measured: emit-partition max/mean ~3x)
    num_partitions = max(int(num_partitions), 4 * _cluster_cpus())
    num_partitions = 1 << (int(num_partitions) - 1).bit_length()  # next pow2
    bands, rows = sig_cfg.bands, sig_cfg.rows

    n_rows_slim = int(n_rows_hint) if n_rows_hint is not None else signed_slim.count()
    if n_rows_slim < 2:
        # 0/1-row input: no pair can exist (and a zero-block dataset
        # downstream would be schemaless)
        return ray.data.from_arrow(PAIR_SCHEMA.empty_table())

    if bands > 64:
        raise ValueError("cmask capped-band bitmask supports at most 64 bands")
    band_cap = lsh_cfg.band_cap
    from ..functions.hashing import splitmix64 as _smx

    # ---- phase 0: signature transport ------------------------------------
    # While the table fits the broadcast cap, ship signatures ONCE as a
    # hash-indexed store; band rows shrink to ~40 B (measured ~9x fewer
    # bytes through the sort exchange than inline sig16 + id strings).
    # Under hot_driver_cap the store is a driver-assembled blob (the sig16
    # matrix doubles as the hot-set source below); above it the assembly
    # is a distributed idh sort whose blocks stay in plasma — the driver
    # never holds the matrix (VERDICT r2 #7).
    from .._phaselog import mark as _mark

    _mark("cand:enter")
    sig_store_ref = sig16_drv = None
    if n_rows_slim <= lsh_cfg.sig_broadcast_cap:
        if n_rows_slim <= lsh_cfg.hot_driver_cap:
            sig_store_ref, sig16_drv = _build_sig_store(signed_slim, sig_cfg)
        else:
            sig_store_ref = _build_sig_store_blocks(signed_slim, sig_cfg)
    use_bcast = sig_store_ref is not None
    _mark("cand:sig_store")

    # ---- phase 1: hot/capped bucket sets ---------------------------------
    # Nearly all band buckets are singletons and can never form a pair, yet
    # their rows would dominate the band shuffle.  Only rows in hot (>= 2
    # member) buckets enter it (~85-95% volume cut on realistic corpora).
    if use_bcast and n_rows_slim <= lsh_cfg.hot_driver_cap:
        # the store build already collected every sig16 on the driver:
        # derive the EXACT hot/capped key sets locally — no second
        # distributed pass, no materialize/count barriers
        hot_struct, capped_sorted = _derive_hot_sets(sig16_drv, sig_cfg, band_cap)
        _mark("cand:hot_derive")
        if hot_struct[1].size == 0:
            return ray.data.from_arrow(PAIR_SCHEMA.empty_table())
        hot_ref = ray.put((hot_struct, capped_sorted))
        return _banded_pairs(
            signed_slim,
            sig_cfg,
            lsh_cfg,
            tau,
            num_partitions,
            dedup_pairs,
            hot_ref,
            sig_store_ref,
            use_bcast=True,
        )

    def emit_keys(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return pa.table(
                {"pkey": pa.array([], pa.int32()), "ckey": pa.array([], pa.uint64())}
            )
        sigs = sig_matrix_from_column(t.column("minhash"), sig_cfg.num_perms)
        sig16 = (sigs & np.uint32(0xFFFF)).astype(np.uint16)
        bh = band_hashes(sig16, bands, rows)
        band_idx = np.tile(np.arange(bands, dtype=np.int64), n)
        ckey = _hash_combine(band_idx, bh.reshape(-1))
        pk = (ckey & np.uint64(num_partitions - 1)).astype(np.int32)
        return pa.table(
            {"pkey": pa.array(pk, pa.int32()), "ckey": pa.array(ckey, pa.uint64())}
        )

    def dup_keys(g: pa.Table) -> pa.Table:
        # vectorized within one hash partition: keys appearing >= 2 times,
        # flagged capped when the bucket exceeds band_cap (a per-key
        # groupby would be millions of tiny Ray groups).  pkey is derived
        # from ckey, so partition-local counts are global counts.
        ck = g.column("ckey").to_numpy(zero_copy_only=False).astype(np.uint64)
        if ck.shape[0] < 2:
            return pa.table(
                {"ckey": pa.array([], pa.uint64()), "capped": pa.array([], pa.bool_())}
            )
        uniq, cnt = np.unique(ck, return_counts=True)
        hot = cnt >= 2
        return pa.table(
            {
                "ckey": pa.array(uniq[hot], pa.uint64()),
                "capped": pa.array(cnt[hot] > band_cap, pa.bool_()),
            }
        )

    # materialize once: the hot-key set is O(colliding buckets), far smaller
    # than the input, and is consumed twice (count + collect/stream)
    hot_ds = hash_exchange(
        signed_slim.map_batches(emit_keys, batch_format="pyarrow", batch_size=8192),
        "pkey",
        num_partitions,
        dup_keys,
    ).materialize()
    n_hot = hot_ds.count()
    if n_hot == 0:
        # no bucket has >= 2 members -> no candidate pairs at all (also the
        # 0/1-row input path: a zero-block dataset here would be schemaless)
        return ray.data.from_arrow(PAIR_SCHEMA.empty_table())

    capped_parts: list = []
    if n_hot <= lsh_cfg.hot_exact_cap:
        # exact sorted key array (fast path, small/moderate cardinality)
        hot_parts: list = []
        for b in hot_ds.iter_batches(batch_size=1 << 16, batch_format="pyarrow"):
            ck = b.column("ckey").to_numpy(zero_copy_only=False).astype(np.uint64)
            cp = b.column("capped").to_numpy(zero_copy_only=False)
            hot_parts.append(ck)
            if cp.any():
                capped_parts.append(ck[cp])
        hot_struct = ("exact", np.sort(np.concatenate(hot_parts)))
    else:
        # two-probe bloom bitmap: fixed-size driver memory regardless of
        # hot-key cardinality; built streaming one batch at a time.  A
        # false positive ships one extra row into the band shuffle — never
        # drops a pair.
        bits = 1 << min(
            int(n_hot * lsh_cfg.bloom_bits_per_key - 1).bit_length(),
            int(lsh_cfg.bloom_max_bits).bit_length() - 1,
        )
        bmask = np.uint64(bits - 1)
        bitmap = np.zeros(bits >> 6, dtype=np.uint64)
        for b in hot_ds.iter_batches(batch_size=1 << 18, batch_format="pyarrow"):
            ck = b.column("ckey").to_numpy(zero_copy_only=False).astype(np.uint64)
            cp = b.column("capped").to_numpy(zero_copy_only=False)
            if cp.any():
                capped_parts.append(ck[cp])
            for probe in (ck & bmask, _smx(ck) & bmask):
                np.bitwise_or.at(
                    bitmap, probe >> np.uint64(6), np.uint64(1) << (probe & np.uint64(63))
                )
        hot_struct = ("bloom", bitmap, bmask)
    # capped buckets (> band_cap members) are rare by construction — keep
    # the exact sorted set so cmask is never approximate
    capped_sorted = (
        np.sort(np.concatenate(capped_parts))
        if capped_parts
        else np.empty(0, dtype=np.uint64)
    )
    hot_ref = ray.put((hot_struct, capped_sorted))
    _mark("cand:hot_derive")
    return _banded_pairs(
        signed_slim,
        sig_cfg,
        lsh_cfg,
        tau,
        num_partitions,
        dedup_pairs,
        hot_ref,
        sig_store_ref,
        use_bcast=use_bcast,
    )


def _banded_pairs(
    signed_slim: ray.data.Dataset,
    sig_cfg: SignatureConfig,
    lsh_cfg: LSHConfig,
    tau: float,
    num_partitions: int,
    dedup_pairs: bool,
    hot_ref,
    sig_store_ref,
    use_bcast: bool,
) -> ray.data.Dataset:
    """Phase 2 of candidate generation: band shuffle over hot-bucket rows
    only (slim rows + broadcast store under the cap, inline sig16 above),
    then in-partition verification + canonical emission."""
    bands = sig_cfg.bands
    emit = make_band_emitter(sig_cfg)

    def emit_with_pkey(t: pa.Table) -> pa.Table:
        bt = emit(t)
        if bt.num_rows:
            if hot_ref not in _WORKER_HOT_CACHE:
                _WORKER_HOT_CACHE.clear()
                _WORKER_HOT_CACHE[hot_ref] = ray.get(hot_ref)
            hot_struct_w, capped_w = _WORKER_HOT_CACHE[hot_ref]
            bnd = bt["band"].to_numpy(zero_copy_only=False).astype(np.int64)
            bhv = bt["bh"].to_numpy(zero_copy_only=False).astype(np.uint64)
            comb = _hash_combine(bnd, bhv)
            # per-row bitmask of capped bands (band rows are row-major:
            # row0 band0..b-1, row1 band0..b-1, ...)
            capped_bits = _in_sorted(capped_w, comb).reshape(-1, bands)
            cmask = np.bitwise_or.reduce(
                capped_bits.astype(np.uint64) << np.arange(bands, dtype=np.uint64),
                axis=1,
            )
            bt = bt.append_column(
                "cmask", pa.array(np.repeat(cmask, bands), pa.uint64())
            )
            bt = bt.filter(pa.array(_member(hot_struct_w, comb)))
        else:
            bt = bt.append_column("cmask", pa.array([], pa.uint64()))
        pkey = pc.cast(
            pc.bit_wise_and(bt["bh"], pa.scalar(np.uint64(num_partitions - 1), pa.uint64())),
            pa.int32(),
        )
        return bt.append_column("pkey", pkey)

    bands_ds = signed_slim.map_batches(
        _make_slim_band_emitter(sig_cfg, num_partitions, hot_ref=hot_ref)
        if use_bcast
        else emit_with_pkey,
        batch_format="pyarrow",
        batch_size=4096,
    )
    # pkey is a hash residue in [0, num_partitions): use the raw-Ray hash
    # exchange (stages/exchange.py) instead of the sort-based groupby —
    # same co-location contract, no sampling pass / sort barrier (the
    # barrier was ~15 s of CPU-count-independent wall at 600k files)
    pairs = hash_exchange(
        bands_ds,
        "pkey",
        num_partitions,
        make_partition_pair_emitter(sig_cfg, lsh_cfg, tau, sig_store_ref=sig_store_ref),
        empty_schema=PAIR_SCHEMA,
    )
    if dedup_pairs:
        # canonical-band emission already reduces multiplicity to ~1; this
        # extra all-to-all guarantees exact uniqueness for metrics use.
        return pairs.groupby(["id_a", "id_b"]).aggregate(
            Min("est_distance", alias_name="est_distance")
        )
    return pairs


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
