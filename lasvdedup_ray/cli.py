"""Command-line entry points.

Mirrors the reference's CLI surface (``lasvdedup/cli.py:24-90``):
``run`` executes the full pipeline (read -> dedup -> write), ``deduplicate``
is the analytical-core alias (reference entry point 2), and a missing
subcommand defaults to ``run`` (back-compat shim, ``cli.py:18-22``).
Threshold flags override the config file which overrides packaged defaults
(``config_setup.py:102-204`` layering).

Only this CLI owns the Ray session (guarded init; the library never calls
ray.init).
"""

from __future__ import annotations

import argparse
import json
import sys
from typing import Any, Dict, List, Optional

from .config_io import build_config
from .sources.readers import read_parquet_clean


def _build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="lasvdedup_ray")
    sub = p.add_subparsers(dest="command")

    def add_common(sp):
        sp.add_argument("--input", required=True, help="parquet file/dir/glob of (repo,path,commit,lang,content)")
        sp.add_argument("--output", required=True, help="output directory")
        sp.add_argument("--config", help="YAML/JSON config file")
        sp.add_argument("--tau", type=float, help="Jaccard-distance threshold (inclusive <=)")
        sp.add_argument("--min-neighborhood", type=int, help="small-cluster bound (reference CLADE_SIZE)")
        sp.add_argument("--z-threshold", type=float, help="MAD outlier multiplier")
        sp.add_argument("--target-length", type=int, help="preferred content length for ranking")
        sp.add_argument("--lang-tau", action="append", default=[], metavar="LANG=TAU",
                        help="per-lang threshold override (repeatable)")
        sp.add_argument("--checkpoint-dir", help="per-stage parquet checkpoints (resume)")
        sp.add_argument("--num-cpus", type=int, default=None)
        sp.add_argument("--num-partitions", type=int, default=32)
        sp.add_argument("--write-tsv", action="store_true",
                        help="also write the sorted conformance TSV")
        sp.add_argument("--metrics", action="store_true",
                        help="also write band-skew / lineage metrics parquet")
        sp.add_argument("--rank-table",
                        help="metadata side table (parquet/csv with an id column) "
                             "joined for ranking — reference contigs-table analog")
        sp.add_argument("--selection-columns", default=None,
                        help="comma-separated ranking columns (DESC), e.g. stars,coverage")
        sp.add_argument("--edges-out",
                        help="also write the verified edge list parquet (replaces "
                             "the reference's dense .mldist matrix sink)")
        sp.add_argument("--write-annotations", action="store_true",
                        help="also write the slim 4-column annotation TSV "
                             "(reference FigTree sink, io_utils.py:160-169)")
        sp.add_argument("--group-regex",
                        help="regex grouping key over row ids (reference "
                             "SAMPLE_REGEX, config.yaml:26)")
        sp.add_argument("--rank-miss-policy", choices=["rank_last", "error"],
                        help="rank-table fuzzy-lookup miss policy "
                             "(reference: hard error)")
        sp.add_argument("--log-file",
                        help="per-run log file (reference setup_logging, "
                             "determine_duplicates.py:22-50)")
        sp.add_argument("--log-level", default="INFO")
        sp.add_argument("--force", action="store_true",
                        help="recompute every checkpointed stage even if a "
                             "completed checkpoint exists (reference "
                             "--force/forceall, pipeline.py:26,74)")
        sp.add_argument("--dry-run", action="store_true",
                        help="print the stage plan + checkpoint resume "
                             "status as JSON and exit without executing "
                             "(reference run_pipeline dry_run, "
                             "pipeline.py:9-83)")
        sp.add_argument("--print-config", action="store_true",
                        help="print the effective layered config as JSON "
                             "(copy-editable; feed back via --config) and "
                             "exit")

    add_common(sub.add_parser("run", help="full pipeline: read -> dedup -> write"))
    add_common(sub.add_parser("deduplicate", help="alias of run (analytical core)"))
    return p


def _overrides_from_args(args: argparse.Namespace) -> Dict[str, Any]:
    ov: Dict[str, Any] = {}
    th = {}
    if args.tau is not None:
        th["tau"] = args.tau
    if args.min_neighborhood is not None:
        th["min_neighborhood"] = args.min_neighborhood
    if args.z_threshold is not None:
        th["z_threshold"] = args.z_threshold
    if args.target_length is not None:
        th["target_length"] = args.target_length
    if th:
        ov["thresholds"] = th
    lang_over = {}
    for spec in args.lang_tau:
        lang, _, v = spec.partition("=")
        lang_over[lang] = {"tau": float(v)}
    if lang_over:
        ov["lang_thresholds"] = lang_over
    if args.checkpoint_dir:
        ov["checkpoint_dir"] = args.checkpoint_dir
    if args.selection_columns:
        ov["selection_columns"] = [c for c in args.selection_columns.split(",") if c]
    if getattr(args, "group_regex", None):
        ov["group_regex"] = args.group_regex
    if getattr(args, "rank_miss_policy", None):
        ov["rank_miss_policy"] = args.rank_miss_policy
    return ov


def main(argv: Optional[List[str]] = None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    # back-compat shim: no subcommand -> "run" (reference cli.py:18-22)
    if argv and not argv[0].startswith("-") and argv[0] not in ("run", "deduplicate"):
        argv.insert(0, "run")
    elif not argv or argv[0].startswith("-"):
        argv.insert(0, "run")
    args = _build_parser().parse_args(argv)

    cfg = build_config(args.config, _overrides_from_args(args))

    if args.print_config:
        from .config_io import config_to_dict

        print(json.dumps(config_to_dict(cfg), indent=2, default=list))
        return 0

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=args.num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    from .pipelines.dedup import dedup_pipeline, plan_stages, write_results
    from .sources.io import (
        setup_logging,
        write_annotation_tsv,
        write_conformance_tsv,
        write_run_metrics,
    )

    setup_logging(args.log_level, args.log_file)

    ds = read_parquet_clean(args.input)

    if args.dry_run:
        print(json.dumps({"dry_run": True, "plan": plan_stages(ds, cfg)}))
        ray.shutdown()
        return 0
    rank_table = None
    if args.rank_table:
        rank_table = (
            ray.data.read_csv(args.rank_table)
            if args.rank_table.endswith(".csv")
            else read_parquet_clean(args.rank_table)
        )
    results = dedup_pipeline(
        ds,
        cfg,
        num_partitions=args.num_partitions,
        rank_table=rank_table,
        edges_out=args.edges_out,
        force=args.force,
    ).materialize()
    write_results(results, args.output)
    summary = {
        "rows": results.count(),
        "output": args.output,
    }
    if args.write_tsv:
        summary["tsv"] = write_conformance_tsv(results, args.output)
    if args.write_annotations:
        summary["annotations"] = write_annotation_tsv(results, args.output)
    if args.metrics:
        summary["metrics"] = write_run_metrics(ds, results, cfg, args.output)
    print(json.dumps(summary))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
