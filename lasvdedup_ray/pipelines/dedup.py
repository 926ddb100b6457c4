"""The flagship pipeline: near-duplicate detection + clustering +
classification over a Parquet source-code table.

Ray-Data-first rebuild of the reference's analytical core
(``lasvdedup/utils/determine_duplicates.py:52-153``), per SURVEY §3:

    read_parquet
      -> prepare             (map_batches: id, sha256, stats)        [stateless]
      -> exact dedup         (groupby sha_hex: reps + 0-dist edges)  [1 content shuffle]
      -> MinHashSigner       (actor pool, signatures per distinct content)
      -> LSH candidate gen   (band groupby: verified pairs)          [slim shuffle]
      -> union-find          (driver DSU / distributed label prop)
      -> classification      (groupby cluster_id: 5-case decision tree)
      -> write_parquet       (partitioned by classification) + metrics

Everything between the signer and the final content re-join shuffles ONLY
ids + signatures (content projected out — SURVEY §7 "very wide rows").
"""

from __future__ import annotations

from typing import Optional

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..config import PipelineConfig
from ..stages.classify import classify_clusters
from ..stages.exact import exact_dup_edges, exact_representatives
from ..stages.lsh import band_stats, candidate_pairs
from ..stages.prepare import prepare
from ..stages.signatures import add_signatures
from ..stages.verify import verify_pairs
from ..state.checkpoint import StageCheckpointer
from ..state.unionfind import assign_clusters

SLIM_COLS = ["id", "sha_hex", "lang", "n_chars", "n_lines", "sha256"]

# per-worker-process cache for the broadcast rep-id filter set (small-input
# driver-collapse plan): ray.get once per worker, not per task
_WORKER_REP_CACHE: dict = {}


def candidate_tau(config: PipelineConfig) -> float:
    """Candidate-generation threshold: the loosest tau across partition
    classes, so no per-lang threshold can lose candidates; the per-lang tau
    is applied in classification."""
    taus = [config.default_thresholds.tau] + [
        t.tau for t in config.lang_thresholds.values()
    ]
    return max(taus)


def _input_fingerprint(n_rows: int, schema_names, config: PipelineConfig) -> str:
    """(input row count + columns, full config repr) — a stage checkpoint
    from a different input/config is recomputed, never reused."""
    import hashlib as _hashlib

    return _hashlib.sha256(
        f"{n_rows}|{sorted(schema_names)}|{config!r}".encode()
    ).hexdigest()[:16]


def plan_stages(
    ds: ray.data.Dataset, config: Optional[PipelineConfig] = None
) -> list:
    """Dry-run plan (the reference's ``run_pipeline(..., dry_run)``,
    ``lasvdedup/pipeline.py:9-83``): the ordered stage list with each
    checkpointable stage's resume status — nothing executes beyond the
    input's metadata row count."""
    config = config or PipelineConfig()
    fp = _input_fingerprint(ds.count(), ds.schema().names, config)
    ck = StageCheckpointer(config.checkpoint_dir, fingerprint=fp)
    pinned = (
        ["prepared", "signed"] if config.exact_first else ["signed", "reps"]
    )
    plan = []
    for name in pinned:
        status = ck.status(name) if config.checkpoint_dir else "no checkpoint_dir"
        plan.append({"stage": name, "checkpoint": status})
    for name in ("candidates", "verify", "cluster", "classify"):
        plan.append({"stage": name, "checkpoint": "always runs"})
    return plan


def dedup_pipeline(
    ds: ray.data.Dataset,
    config: Optional[PipelineConfig] = None,
    num_partitions: int = 32,
    force_distributed_components: bool = False,
    rank_table: Optional[ray.data.Dataset] = None,
    edges_out: Optional[str] = None,
    force: bool = False,
) -> ray.data.Dataset:
    """Full dedup: returns the classification Dataset (RESULT_SCHEMA:
    id, cluster_id, classification, decision_category, is_representative,
    rank, group_members, reason, sha256, lang).

    ``rank_table``: optional metadata side table (id + numeric columns) —
    the reference's ranked contigs table (``io_utils.py:30-61``); left-join
    by id, its columns become usable in ``config.selection_columns``
    (missing rows rank last).  ``edges_out``: optional Parquet directory for
    the verified edge list — the scalable analog of the reference's dense
    ``.mldist`` distance-matrix sink (``io_utils.py:69-83``)."""
    # scaling diagnostics only (LASVDEDUP_PHASE_LOG=1): wall time since
    # the previous sync point, printed to stderr — no behavior change
    from .._phaselog import mark as _plmark, reset as _plreset

    _plreset("PHASE")

    def _phase(name: str) -> None:
        _plmark(name, prefix="PHASE")

    config = config or PipelineConfig()
    if config.group_only and not config.group_regex:
        raise ValueError("group_only=True requires group_regex")
    # schema validation up front (reference: missing-column ValueError,
    # io_utils.py:39-42) — fail fast instead of deep inside a shuffle
    schema_names = set(ds.schema().names)
    missing = [c for c in ("repo", "path", "commit", "lang", "content") if c not in schema_names]
    if missing:
        raise ValueError(
            f"input is missing required columns {missing}; expected "
            f"(repo, path, commit, lang, content)"
        )
    ex = config.execution
    n_rows_in = ds.count()
    fp = _input_fingerprint(n_rows_in, schema_names, config)
    # force (reference --force/forceall): recompute every pinned stage
    ck = StageCheckpointer(config.checkpoint_dir, fingerprint=fp, force=force)
    tau = candidate_tau(config)
    emit_tau = tau + (config.lsh.exact_margin if config.lsh.exact_verify else 0.0)

    if config.exact_first:
        # sign once per distinct content, propagate signatures by sha join
        prepared = ck.pin(prepare(ds, batch_size=ex.prepare_batch_size), "prepared")
        if prepared.count() == 0:
            from ..stages.classify import RESULT_SCHEMA

            return ray.data.from_arrow(RESULT_SCHEMA.empty_table())
        slim_all = prepared.select_columns(SLIM_COLS)
        reps = exact_representatives(prepared)
        e_edges = exact_dup_edges(slim_all)
        signed = ck.pin(
            add_signatures(
                reps,
                cfg=config.signature,
                batch_size=ex.batch_size,
                concurrency=ex.signer_concurrency,
            ),
            "signed",
        )
        signed_slim = signed.select_columns(["id", "sha_hex", "minhash", "simhash"])
        if config.group_only:
            # reference-parity mode: no content-derived edges at all
            from ..stages.lsh import PAIR_SCHEMA

            edges = ray.data.from_arrow(PAIR_SCHEMA.empty_table())
        else:
            near_edges = verify_pairs(
                candidate_pairs(
                    signed_slim.select_columns(["id", "minhash", "simhash"]),
                    config.signature,
                    config.lsh,
                    tau=emit_tau,
                    n_rows_hint=signed.count(),  # pinned upstream: metadata count
                ),
                signed.select_columns(["id", "content"]),
                config.signature,
                config.lsh,
                tau=tau,
                num_partitions=num_partitions,
            )
            edges = near_edges.union(e_edges)
        # propagate each sha-representative's signature to every member row
        meta = slim_all.join(
            signed_slim.select_columns(["sha_hex", "minhash", "simhash"]),
            join_type="inner",
            num_partitions=num_partitions,
            on=("sha_hex",),
        )
    else:
        # default: sign every row (OPH signing is O(shingles); identical
        # content yields identical signatures), then collapse exact dups at
        # the SLIM level before banding: one slim shuffle on sha (ids +
        # signatures, no content) keeps one representative per distinct
        # content in the LSH stage and links members by zero-distance star
        # edges.  On dup-heavy corpora (2/3 exact dups measured on the
        # bench corpus) this cuts the band shuffle ~3x and the in-bucket
        # pair verification ~9x — the single biggest scaling lever.
        # Batch size adapts to input size: small enough that every CPU gets
        # tasks, large enough that driver scheduling (~ms per task) doesn't
        # serialize the run at scale.
        adaptive_bs = max(256, min(4096, n_rows_in // (num_partitions * 8) or 256))
        signed = ck.pin(
            add_signatures(
                prepare(ds, batch_size=adaptive_bs),
                cfg=config.signature,
                batch_size=adaptive_bs,
                concurrency=ex.signer_concurrency,
            ),
            "signed",
        )
        _phase("prepare+sign")
        if signed.count() == 0:
            from ..stages.classify import RESULT_SCHEMA

            return ray.data.from_arrow(RESULT_SCHEMA.empty_table())
        meta = signed.select_columns(SLIM_COLS + ["minhash", "simhash"])
        if config.group_only:
            # reference-parity mode (sequence_grouping.py:29-37): clusters
            # come from group_regex only; signatures still feed the
            # in-cluster decision tree
            from ..stages.lsh import PAIR_SCHEMA

            edges = ray.data.from_arrow(PAIR_SCHEMA.empty_table())
        else:
            if config.checkpoint_dir is None and n_rows_in <= ex.exact_driver_cap:
                # small input: the sha collapse runs on the driver (one slim
                # streamed pass + lexsort) instead of paying the groupby
                # exchange's fixed all-to-all cost; reps are recovered by an
                # exact broadcast is_in filter over the pinned signed dataset
                from ..stages.exact import exact_collapse_driver

                rep_ids, edges_tbl = exact_collapse_driver(signed)
                n_reps = len(rep_ids)
                # ship the rep-id set through plasma once (ray.put + per-worker
                # cache), not pickled into every task closure
                rep_ref = ray.put(pa.array(list(rep_ids), pa.string()))

                def keep_reps(t: pa.Table) -> pa.Table:
                    if rep_ref not in _WORKER_REP_CACHE:
                        _WORKER_REP_CACHE.clear()
                        _WORKER_REP_CACHE[rep_ref] = ray.get(rep_ref)
                    return t.filter(
                        pc.is_in(t["id"], value_set=_WORKER_REP_CACHE[rep_ref])
                    )

                reps_slim = signed.select_columns(
                    ["id", "sha_hex", "minhash", "simhash"]
                ).map_batches(keep_reps, batch_format="pyarrow")
                e_edges = ray.data.from_arrow(edges_tbl)
            else:
                # ONE sha shuffle yields both the per-sha representatives and
                # the zero-distance star edges (two separate groupbys before r3)
                from ..stages.exact import exact_collapse, fused_edges, fused_reps

                from .._phaselog import mark as _plmark2

                fused = ck.pin(
                    exact_collapse(
                        signed.select_columns(["id", "sha_hex", "minhash", "simhash"])
                    ),
                    "reps",
                )
                _plmark2("exact:fused_pin")
                reps_slim = fused_reps(fused)
                n_reps = reps_slim.count()  # cheap filter pass over pinned fused
                _plmark2("exact:n_reps_count")
                e_edges = fused_edges(fused)
                _phase("exact_collapse")
            near_edges = verify_pairs(
                candidate_pairs(
                    reps_slim.select_columns(["id", "minhash", "simhash"]),
                    config.signature,
                    config.lsh,
                    tau=emit_tau,
                    n_rows_hint=n_reps,
                ),
                signed.select_columns(["id", "content"]),
                config.signature,
                config.lsh,
                tau=tau,
                num_partitions=num_partitions,
            )
            _phase("candidates+verify")
            edges = near_edges.union(e_edges)

    if rank_table is not None:
        # metadata/ranking side table (reference: contigs TSV joined per
        # sequence) with the reference's 3-stage fuzzy key resolution
        # (exact -> _R_-strip + dot-split -> dot-boundary prefix) and a
        # configurable miss policy (sequence_grouping.py:55-78)
        from ..stages.ranktab import attach_rank_table

        meta = attach_rank_table(
            meta,
            rank_table,
            miss_policy=config.rank_miss_policy,
            num_partitions=num_partitions,
        )

    if config.group_regex:
        # grouping-policy knob (reference SAMPLE_REGEX, config.yaml:26):
        # rows sharing an extracted group key are pre-linked with
        # zero-distance edges, so each "sample" clusters together before
        # any LSH evidence — the reference groups per sample up front
        edges = edges.union(
            group_key_edges(meta.select_columns(["id"]), config.group_regex)
        )

    if edges_out is not None:
        edges = edges.materialize()
        edges.write_parquet(edges_out)

    clustered = assign_clusters(
        meta,
        edges,
        dsu_edge_limit=ex.dsu_edge_limit,
        max_rounds=ex.max_label_rounds,
        num_partitions=num_partitions,
        force_distributed=force_distributed_components,
    )
    _phase("unionfind")
    return classify_clusters(clustered, config)


GROUP_KEY_PARTITIONS = 64


def group_key_edges(ids_ds: ray.data.Dataset, pattern: str) -> ray.data.Dataset:
    """Star-topology zero-distance edges linking all ids that share a
    regex-extracted group key (the reference's per-sample grouping,
    ``sequence_grouping.py:29-37``).  One hash-partition shuffle on the
    key; within-partition star emission is vectorized (min id per key ->
    every other member)."""
    import zlib

    import numpy as np

    from ..functions.text import extract_group_key
    from ..stages.lsh import PAIR_SCHEMA

    def keyed(t: pa.Table) -> pa.Table:
        keys = extract_group_key(t["id"], pattern)
        out = pa.table({"id": t["id"], "gkey": keys}).filter(pc.is_valid(keys))
        pk = np.fromiter(
            (zlib.crc32(k.encode()) % GROUP_KEY_PARTITIONS for k in out["gkey"].to_pylist()),
            dtype=np.int32,
            count=out.num_rows,
        )
        return out.append_column("pkey", pa.array(pk, pa.int32()))

    def star_edges(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or "gkey" not in g.column_names:
            return PAIR_SCHEMA.empty_table()
        keys = np.asarray(g["gkey"].to_pylist(), dtype=object)
        ids = np.asarray(g["id"].to_pylist(), dtype=object)
        order = np.lexsort((ids, keys))
        keys, ids = keys[order], ids[order]
        first = np.ones(len(keys), dtype=bool)
        first[1:] = keys[1:] != keys[:-1]
        starts = np.flatnonzero(first)
        sizes = np.diff(np.append(starts, len(keys)))
        hub = np.repeat(ids[starts], sizes)  # min id per key (sorted)
        other = ids
        keep = hub != other
        return pa.table(
            {
                "id_a": pa.array(hub[keep], pa.string()),
                "id_b": pa.array(other[keep], pa.string()),
                "est_distance": pa.array(np.zeros(int(keep.sum())), pa.float64()),
            },
            schema=PAIR_SCHEMA,
        )

    from ..stages.exchange import hash_exchange
    from ..stages.lsh import PAIR_SCHEMA as _PS

    return hash_exchange(
        ids_ds.map_batches(keyed, batch_format="pyarrow"),
        "pkey",
        GROUP_KEY_PARTITIONS,
        star_edges,
        empty_schema=_PS,
    )


def attach_content(
    results: ray.data.Dataset,
    prepared: ray.data.Dataset,
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """Join classification results back to original content by id (hash
    shuffle join — the reference's write-time classification<->sequence join,
    ``io_utils.py:135-144``).  Surviving rows preserve content byte-for-byte
    (sha256 invariant)."""
    content = prepared.select_columns(["id", "repo", "path", "commit", "content"])
    # Arrow's hash join rejects list-typed payload columns: pack the
    # group_members list to a \x1f-delimited string across the join
    SEP = "\x1f"

    def pack(t: pa.Table) -> pa.Table:
        idx = t.schema.get_field_index("group_members")
        packed = pc.binary_join(t["group_members"], SEP)
        return t.set_column(idx, "group_members", pc.cast(packed, pa.string()))

    def unpack(t: pa.Table) -> pa.Table:
        idx = t.schema.get_field_index("group_members")
        unpacked = pc.split_pattern(t["group_members"], SEP)
        return t.set_column(idx, "group_members", unpacked)

    joined = results.map_batches(pack, batch_format="pyarrow").join(
        content, join_type="inner", num_partitions=num_partitions, on=("id",)
    )
    return joined.map_batches(unpack, batch_format="pyarrow")


def survivors(results_with_content: ray.data.Dataset) -> ray.data.Dataset:
    """Rows the dedup keeps: classification in {keep, distinct} (the
    reference routes GOOD and COINFECTION to the good/ dir,
    ``classification.py:167-173``)."""
    return results_with_content.map_batches(
        lambda t: t.filter(
            pc.is_in(t["classification"], value_set=pa.array(["keep", "distinct"]))
        ),
        batch_format="pyarrow",
    )


def write_results(
    results: ray.data.Dataset,
    out_dir: str,
) -> None:
    """Partitioned Parquet sink (one directory per classification — the
    reference's good/bad dir routing, ``io_utils.py:85-144``); resumable by
    partition."""
    # group_members is list-typed: keep pyarrow end-to-end
    results.write_parquet(out_dir, partition_cols=["classification"])


def dedup_metrics(
    signed_slim: ray.data.Dataset,
    config: PipelineConfig,
) -> ray.data.Dataset:
    """Lineage/metrics rows: band bucket-size histogram + dropped-pair
    accounting (north_rule: per-partition lineage + row-count/signature
    metrics)."""
    return band_stats(
        signed_slim.select_columns(["id", "minhash", "simhash"]),
        config.signature,
        config.lsh,
    )
