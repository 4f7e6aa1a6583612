"""CLI entry point (reference pipelines/__main__.py: serve/backfill).

    python -m at_data_pipelines_spark backfill --lake /tmp/lake
    python -m at_data_pipelines_spark daily   --lake /tmp/lake --date 2023-12-29
    python -m at_data_pipelines_spark bench
    python -m at_data_pipelines_spark lake --lake /tmp/lake history  <table>
    python -m at_data_pipelines_spark lake --lake /tmp/lake analyze  <table>
    python -m at_data_pipelines_spark lake --lake /tmp/lake optimize <table> --zorder a,b
    python -m at_data_pipelines_spark lake --lake /tmp/lake restore  <table> --version 3
    python -m at_data_pipelines_spark lake --lake /tmp/lake vacuum   [table]

Backfill/daily run the full DAG on the synthetic market fixtures (real
deployments inject connector DataFrames instead — see sources/); `lake`
is the table-maintenance surface (commit log, ANALYZE stats, Z-order
compaction, snapshot restore, retention vacuum).
"""

from __future__ import annotations

import argparse
import datetime as dt
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="at_data_pipelines_spark")
    sub = p.add_subparsers(dest="cmd", required=True)
    for name in ("backfill", "daily"):
        sp = sub.add_parser(name)
        sp.add_argument("--lake", required=True)
        sp.add_argument("--tickers", type=int, default=50)
        if name == "daily":
            sp.add_argument("--date", required=True)
    sub.add_parser("bench")
    cu = sub.add_parser("curate")
    cu.add_argument("--input", required=True, help="parquet documents path")
    cu.add_argument("--output", required=True, help="curated parquet output dir")
    cu.add_argument("--langs", default=None, help="comma-separated allowed langs")
    cu.add_argument("--min-tokens", type=int, default=10)
    cu.add_argument("--threshold", type=float, default=0.6, help="near-dup jaccard")
    cu.add_argument("--max-top-gram-frac", type=float, default=None)
    cu.add_argument("--val-frac", type=float, default=None)
    cu.add_argument("--redact", action="store_true")
    lk = sub.add_parser("lake", help="table maintenance")
    lk.add_argument("--lake", required=True)
    lk.add_argument(
        "op",
        choices=[
            "history",
            "analyze",
            "optimize",
            "compact",
            "restore",
            "vacuum",
            "changes",
            "properties",
        ],
    )
    lk.add_argument("table", nargs="?", default=None)
    lk.add_argument("--zorder", default=None, help="comma-separated Z-order columns")
    lk.add_argument(
        "--grace-s",
        type=int,
        default=3600,
        help="vacuum: skip unreferenced generations younger than this "
        "(in-flight-writer guard); 0 only in maintenance windows",
    )
    lk.add_argument("--zorder-files", type=int, default=8)
    lk.add_argument("--full", action="store_true", help="optimize: rewrite all partitions")
    lk.add_argument("--version", type=int, default=None, help="restore target version")
    lk.add_argument("--since", type=int, default=None, help="changes: from version")
    lk.add_argument("--to", type=int, default=None, help="changes: to version (default current)")
    args = p.parse_args(argv)

    if args.cmd == "lake":
        import json

        from pyspark.sql import SparkSession

        from .catalog import Lakehouse
        from .session import get_spark

        # only stop a session this CLI created (embedding callers — tests,
        # notebooks — keep theirs)
        owns_session = SparkSession.getActiveSession() is None
        spark = get_spark(app_name=f"atdp-lake-{args.op}")
        lake = Lakehouse(spark, args.lake)
        if args.op != "vacuum" and not args.table:
            p.error(f"lake {args.op} requires a table name")
        if args.op == "history":
            for h in lake.history(args.table):
                print(json.dumps(h))
        elif args.op == "analyze":
            print(json.dumps(lake.analyze(args.table)))
        elif args.op == "optimize":
            lake.optimize(
                args.table,
                zorder_by=args.zorder.split(",") if args.zorder else None,
                zorder_files=args.zorder_files,
                full=args.full,
            )
            print(f"optimized {args.table}")
        elif args.op == "compact":
            # the out-of-band maintenance pass: small-file merge on
            # PK-less (append-only) tables, keep-latest optimize on PK
            # tables — safe to run while a stream keeps appending (the
            # commit rebases over disjoint-partition rival appends)
            lake.compact(
                args.table,
                zorder_by=args.zorder.split(",") if args.zorder else None,
                zorder_files=args.zorder_files,
                full=args.full,
            )
            print(f"compacted {args.table}")
        elif args.op == "restore":
            if args.version is None:
                p.error("restore requires --version")
            lake.restore(args.table, args.version)
            print(f"restored {args.table} to v{args.version}")
        elif args.op == "changes":
            if args.since is None:
                p.error("changes requires --since")
            ch = lake.table_changes(args.table, args.since, to_version=args.to)
            for row in ch.toJSON().collect():
                print(row)
        elif args.op == "properties":
            print(json.dumps(lake.get_properties(args.table)))
        else:
            removed = lake.vacuum(args.table, grace_s=args.grace_s)
            print(json.dumps({"removed": removed}))
        if owns_session:
            spark.stop()
        return 0

    if args.cmd == "bench":
        import bench

        bench.main()
        return 0

    if args.cmd == "curate":
        from pyspark.sql import SparkSession

        from .llmops.curate import curate_corpus
        from .session import get_spark

        # only stop a session this CLI created (embedding callers — tests,
        # notebooks — keep theirs)
        owns_session = SparkSession.getActiveSession() is None
        spark = get_spark(app_name="atdp-curate")
        docs = spark.read.parquet(args.input)
        curated, stats = curate_corpus(
            docs,
            allowed_langs=args.langs.split(",") if args.langs else None,
            min_tokens=args.min_tokens,
            near_dup_threshold=args.threshold,
            max_top_gram_frac=args.max_top_gram_frac,
            val_frac=args.val_frac,
            redact=args.redact,
        )
        curated.write.mode("overwrite").parquet(args.output)
        funnel = stats.collect()[0].asDict()
        print(__import__("json").dumps(funnel))
        if owns_session:
            spark.stop()
        return 0

    from .catalog import Lakehouse
    from .pipelines import PipelineConfig, flows, synthetic
    from .session import get_spark

    spark = get_spark(app_name=f"atdp-{args.cmd}")
    lake = Lakehouse(spark, args.lake)
    cfg = PipelineConfig()
    fixtures = synthetic.generate_market(spark, n_tickers=args.tickers)
    if args.cmd == "backfill":
        flows.run_backfill(lake, fixtures, cfg)
        print(f"backfill complete: {len(lake.tables())} tables in {args.lake}")
    else:
        ran = flows.run_daily(lake, cfg, dt.date.fromisoformat(args.date))
        print("daily ran" if ran else "market closed — skipped")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
