"""Benchmark runner — times the headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced with a cheap count() action (full plan execution, no
driver-side materialization of result rows beyond the aggregate).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from at_data_pipelines_spark.queries import QUERIES  # noqa: E402
from at_data_pipelines_spark.session import get_spark  # noqa: E402

# headline set: one per operator family, heaviest shapes included
HEADLINE = [
    "q01_pricing_summary",
    "q02_local_supplier_revenue",
    "q03_top_orders",
    "q04_priority_semi",
    "q13_orders_with_optional_lineitems",
    "q14_rolling_beta_supplier",
    "q20_rolling_window_stats",
    "q25_sessionization",
    "q26_tumbling_5min",
    "q28_ewm_halflife10",
    "q40_exact_dedup",
    "q44_word_frequency",
    "q45_minhash_lsh_candidates",
    "q46_jaccard_near_dups",
    "q47_simhash32",
    "q48_cosine_top5",
]


def bench_pipelines(spark) -> dict[str, float]:
    """Wall time of the flow DAG — the applyInPandas kernel surface (QP
    fan-out, rolling OLS, EWM) that the query set doesn't exercise. One
    timed run each (a full DAG is too heavy for min-of-2): a 30-ticker /
    6-month backfill (~125 QP dates) and one incremental daily step on
    top. Reported separately from the query total so round-over-round
    query comparisons stay like-for-like."""
    import datetime as dtm
    import tempfile

    import pyspark.sql.functions as F

    from at_data_pipelines_spark.catalog import Lakehouse
    from at_data_pipelines_spark.pipelines import flows, synthetic
    from at_data_pipelines_spark.pipelines.flows import PipelineConfig

    cfg = PipelineConfig(window=30, ewm_half_life=10.0, reversal_window=11)
    fx = synthetic.generate_market(
        spark, n_tickers=30, start=dtm.date(2023, 1, 2), end=dtm.date(2023, 6, 30)
    )
    last = max(r.date for r in fx["calendar"].collect())
    cut = {
        k: fx[k].filter(F.col("date") < F.lit(last))
        for k in ("calendar", "universe", "stock_bars", "etf_bars")
    }
    root = tempfile.mkdtemp(prefix="bench_lake_")
    lake = Lakehouse(spark, root)
    t0 = time.perf_counter()
    flows.run_backfill(lake, cut, cfg)
    backfill_s = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    flows.run_daily(
        lake,
        cfg,
        run_date=last + dtm.timedelta(days=1),
        new_stock_bars=fx["stock_bars"].filter(F.col("date") == F.lit(last)),
        new_etf_bars=fx["etf_bars"].filter(F.col("date") == F.lit(last)),
        new_calendar=fx["calendar"].filter(F.col("date") == F.lit(last)),
        new_universe=fx["universe"].filter(F.col("date") == F.lit(last)),
    )
    daily_s = round(time.perf_counter() - t0, 3)
    return {"backfill_qp_dag": backfill_s, "daily_incremental_dag": daily_s}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = -1.0  # unknown scale tag
    spark = get_spark(app_name="bench")

    # warm the JVM/codegen once with the cheapest query
    QUERIES["q10_distinct_flag_status"](spark, sf_dir).count()

    # min-of-3 warm runs per query, with per-query spread reported so
    # round-over-round deltas are attributable to plans vs session noise
    # (r2 showed an unexplainable uniform +12% drift under min-of-2)
    timings: dict[str, float] = {}
    stats: dict[str, dict[str, float]] = {}
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    for name in HEADLINE:
        if name not in QUERIES:
            continue
        samples: list[float] = []
        for _ in range(runs):
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).count()
            samples.append(time.perf_counter() - t0)
        samples.sort()
        timings[name] = round(samples[0], 3)
        stats[name] = {
            "min": round(samples[0], 3),
            "median": round(samples[len(samples) // 2], 3),
            "spread": round(samples[-1] - samples[0], 3),
        }

    pipelines = bench_pipelines(spark)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_query_wall_time_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "query_stats": stats,
                "pipelines": pipelines,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
