"""CLI entry point (reference pipelines/__main__.py: serve/backfill).

    python -m at_data_pipelines_spark backfill --lake /tmp/lake
    python -m at_data_pipelines_spark daily   --lake /tmp/lake --date 2023-12-29
    python -m at_data_pipelines_spark bench

Backfill/daily run the full DAG on the synthetic market fixtures (real
deployments inject connector DataFrames instead — see sources/).
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
    args = p.parse_args(argv)

    if args.cmd == "bench":
        import bench

        bench.main()
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
