"""Benchmark runner — times the headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced with a cheap count() action (full plan execution, no
driver-side materialization of result rows beyond the aggregate).

Methodology (r3/r4/r5 judge findings baked in):
- **Each cohort runs in its OWN subprocess with a fresh JVM.** Round 5
  showed that whichever cohort runs second inherits the first cohort's
  session pressure (GC debt, codegen cache, shuffle-dir litter): with
  DAGs timed first, the driver's q14/q47/q48 minima read 1.5-4x above a
  quiet-session measurement of identical code. Process isolation is the
  only ordering that contaminates neither — the orchestrator (this file,
  no args) launches `--cohort pipelines`, `--cohort commit`, and
  `--cohort queries` sequentially as subprocesses and merges their JSON.
- Pipeline DAGs use a FRESH lakehouse per run, min-of-2 with spread.
- A commit-overhead micro-benchmark (upserts into a partitioned
  lakehouse table) isolates the manifest-protocol cost from the DAG
  numbers, so protocol changes and plan changes can't be conflated.
- Per-query min/median/spread are reported; q46's persisted shingle
  relation is released after the query loop (release_shingle_caches), so
  nothing stays cache-resident into a later measurement.
- **Every cohort carries an interleaved pinned control** (r11 verdict
  task #1): a fixed range→shuffle-agg job whose code never changes runs
  between measurements in the queries / extras / commit / pipelines
  cohorts, and each cohort's JSON ships the control's min/median/spread.
  Cross-round query drift that tracks the control is session noise;
  drift the control doesn't share is a plan regression.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

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

# round-6/7 additions, timed as their OWN cohort and reported separately —
# the 16-query headline total stays comparable round-over-round
EXTRAS = [
    "q65_bm25_search",
    "q66_kmv_distinct_users",
    "q67_weighted_sample",
    "q68_cms_heavy_hitters",
    "q69_bloom_membership",
    "q70_chunk_documents",
    "q71_quantile_sketch",
]


def bench_commit_overhead(spark) -> dict[str, float]:
    """Micro-benchmark of the lakehouse commit path: tiny upserts into a
    partitioned PK table, so the time is dominated by protocol cost
    (write one small generation + manifest GET/PUT + token round-trip),
    not by data volume. Reported as seconds per upsert (min over the
    runs after the first, which pays writer warm-up)."""
    import tempfile

    from pyspark.sql import types as T

    from at_data_pipelines_spark.catalog import Lakehouse

    schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("part", T.IntegerType()),
            T.StructField("v", T.DoubleType()),
        ]
    )
    lake = Lakehouse(spark, tempfile.mkdtemp(prefix="bench_commit_"))
    lake.create("t", schema, ["part"], ["k", "part"])
    n = 8
    samples = []
    controls = []
    import pandas as pd

    _pinned_control(spark)  # control pays its own codegen warm-up once
    for i in range(n):
        if i % 3 == 0:  # interleaved: 3 control samples across the loop
            controls.append(_pinned_control(spark))
        # pandas-origin batch = one input partition, so the measurement is
        # the commit protocol itself, not local-mode task-launch noise from
        # a 10-row batch sharded over 32 near-empty partitions
        df = spark.createDataFrame(
            pd.DataFrame({"k": range(10), "part": i % 2, "v": float(i)}), schema
        )
        t0 = time.perf_counter()
        lake.upsert("t", df)
        samples.append(time.perf_counter() - t0)
    warm = sorted(samples[1:])
    return {
        "upsert_s_min": round(warm[0], 3),
        "upsert_s_median": round(warm[len(warm) // 2], 3),
        "pinned_control": _control_stats(controls),
    }


def _control_stats(controls: list[float]) -> dict[str, float]:
    ctl = sorted(controls)
    return {
        "min": round(ctl[0], 3),
        "median": round(ctl[len(ctl) // 2], 3),
        "spread": round(ctl[-1] - ctl[0], 3),
    }


def _pinned_control(spark) -> float:
    """A fixed, DAG-independent job (range → mod-key shuffle agg) timed
    interleaved with the pipeline runs. Its code never changes round to
    round, so if the control drifts between sessions the same way the DAG
    walls do, the drift is session noise, not a plan regression (r10
    verdict task #1: the daily-DAG uptick was unadjudicable without one)."""
    from pyspark.sql import functions as F

    t0 = time.perf_counter()
    (
        spark.range(5_000_000)
        .select((F.col("id") % 997).alias("k"), (F.col("id") * 31 % 101).alias("v"))
        .groupBy("k")
        .agg(F.sum("v").alias("s"), F.count("*").alias("c"))
        .count()
    )
    return time.perf_counter() - t0


def bench_pipelines(spark, runs: int = 3) -> dict[str, dict[str, float]]:
    """Wall time of the flow DAG — the applyInPandas kernel surface (QP
    fan-out, rolling OLS, EWM) that the query set doesn't exercise: a
    30-ticker / 6-month backfill (~125 QP dates) and one incremental
    daily step on top. Each run uses a FRESH lakehouse; min and spread
    over ``runs`` runs are reported so session noise is visible instead
    of silently folded into the number. The daily step also reports a
    per-stage wall breakdown (of the fastest run) and a pinned-control
    wall so drift is attributable: stage vector names the stage that
    grew; control drift names the session."""
    import datetime as dtm
    import tempfile

    import pyspark.sql.functions as F

    from at_data_pipelines_spark.catalog import Lakehouse
    from at_data_pipelines_spark.pipelines import flows, synthetic
    from at_data_pipelines_spark.pipelines.flows import PipelineConfig

    cfg = PipelineConfig(window=30, ewm_half_life=10.0, reversal_window=11)
    # untimed warm-up DAG (5 tickers / 6 weeks): pays JVM/codegen/Arrow
    # warm-up once so the measured runs reflect steady-state plan cost,
    # not first-execution compilation (same rationale as the query
    # cohort's discarded warm-ups)
    wfx = synthetic.generate_market(
        spark, n_tickers=5, start=dtm.date(2023, 1, 2), end=dtm.date(2023, 2, 15)
    )
    flows.run_backfill(
        Lakehouse(spark, tempfile.mkdtemp(prefix="bench_warm_")), wfx, cfg
    )
    fx = synthetic.generate_market(
        spark, n_tickers=30, start=dtm.date(2023, 1, 2), end=dtm.date(2023, 6, 30)
    )
    last = max(r.date for r in fx["calendar"].collect())
    cut = {
        k: fx[k].filter(F.col("date") < F.lit(last))
        for k in ("calendar", "universe", "stock_bars", "etf_bars")
    }
    _pinned_control(spark)  # control pays its own codegen warm-up once
    backfills: list[float] = []
    dailies: list[float] = []
    controls: list[float] = []
    stage_vecs: list[dict[str, float]] = []
    for _ in range(runs):
        controls.append(_pinned_control(spark))
        lake = Lakehouse(spark, tempfile.mkdtemp(prefix="bench_lake_"))
        t0 = time.perf_counter()
        flows.run_backfill(lake, cut, cfg)
        backfills.append(time.perf_counter() - t0)
        stages: dict[str, float] = {}
        t0 = time.perf_counter()
        flows.run_daily(
            lake,
            cfg,
            run_date=last + dtm.timedelta(days=1),
            new_stock_bars=fx["stock_bars"].filter(F.col("date") == F.lit(last)),
            new_etf_bars=fx["etf_bars"].filter(F.col("date") == F.lit(last)),
            new_calendar=fx["calendar"].filter(F.col("date") == F.lit(last)),
            new_universe=fx["universe"].filter(F.col("date") == F.lit(last)),
            stage_times=stages,
        )
        dailies.append(time.perf_counter() - t0)
        stage_vecs.append(stages)
    best = stage_vecs[dailies.index(min(dailies))]
    return {
        "backfill_qp_dag": {
            "min": round(min(backfills), 3),
            "spread": round(max(backfills) - min(backfills), 3),
        },
        "daily_incremental_dag": {
            "min": round(min(dailies), 3),
            "spread": round(max(dailies) - min(dailies), 3),
        },
        "daily_stage_breakdown": best,
        "pinned_control": _control_stats(controls),
    }


def bench_queries(
    spark, sf_dir: str, names: list[str] | None = None
) -> tuple[dict[str, float], dict[str, dict[str, float]], dict[str, float]]:
    """min-of-N warm runs per query, with per-query spread reported so
    round-over-round deltas are attributable to plans vs session noise
    (r2 showed an unexplainable uniform +12% drift under min-of-2).
    Returns (timings, per-query stats, control stats) — the control is
    a separate value, NOT a pseudo-query key inside stats (r12 advice:
    its shape differs and consumers iterating stats as queries would
    have to special-case it, as bench_pipelines already does)."""
    from at_data_pipelines_spark.queries import QUERIES

    # warm the JVM/codegen once with the cheapest query
    QUERIES["q10_distinct_flag_status"](spark, sf_dir).count()
    _pinned_control(spark)  # control pays its own codegen warm-up once

    timings: dict[str, float] = {}
    stats: dict[str, dict[str, float]] = {}
    controls: list[float] = []
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    # per-query DISCARDED warm-ups before the counted runs: repeated
    # fresh-JVM measurement shows heavy queries (q46) improving monotonically
    # for ~4 executions as C2 compiles the generated code (3.46 -> 2.73 ->
    # 2.36 s, identical plan and rows); counting JIT tiers as "spread"
    # misattributes compiler warm-up to plan noise
    warmups = int(os.environ.get("SPARK_GRAFT_BENCH_WARMUPS", "2"))
    for name in names if names is not None else HEADLINE:
        if name not in QUERIES:
            continue
        # one control sample interleaved per query: if a query's wall
        # drifts between sessions while the control (whose code never
        # changes) drifts the same way, the delta is session noise, not
        # a plan regression (r11 verdict task #1 — the q47/q48 upticks
        # required a judge re-bench because only the pipelines cohort
        # carried a control)
        controls.append(_pinned_control(spark))
        samples: list[float] = []
        for i in range(warmups + runs):
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).count()
            if i >= warmups:
                samples.append(time.perf_counter() - t0)
        samples.sort()
        timings[name] = round(samples[0], 3)
        stats[name] = {
            "min": round(samples[0], 3),
            "median": round(samples[len(samples) // 2], 3),
            "spread": round(samples[-1] - samples[0], 3),
        }

    # drop the q46 shingle cache so nothing stays resident past the loop
    from at_data_pipelines_spark.llmops.dedup import release_shingle_caches

    release_shingle_caches()
    control = _control_stats(controls) if controls else {}
    return timings, stats, control


def run_cohort(cohort: str, sf_dir: str) -> None:
    """Run ONE cohort in this process and print its JSON fragment."""
    from at_data_pipelines_spark.session import get_spark

    spark = get_spark(app_name=f"bench-{cohort}")
    if cohort == "pipelines":
        out = {"pipeline_stats": bench_pipelines(spark)}
    elif cohort == "commit":
        out = {"commit_overhead": bench_commit_overhead(spark)}
    elif cohort == "queries":
        timings, stats, control = bench_queries(spark, sf_dir)
        out = {"queries": timings, "query_stats": stats, "queries_control": control}
    elif cohort == "extras":
        timings, stats, control = bench_queries(spark, sf_dir, names=EXTRAS)
        out = {"extras": timings, "extras_stats": stats, "extras_control": control}
    else:
        raise SystemExit(f"unknown cohort {cohort!r}")
    print(json.dumps(out))
    spark.stop()


def _run_isolated(cohort: str, sf_dir: str) -> dict:
    """Launch one cohort as a subprocess (fresh JVM) and parse its JSON
    fragment from the last stdout line."""
    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--cohort", cohort],
        capture_output=True,
        text=True,
        env={**os.environ, "SPARK_GRAFT_SF_DIR": sf_dir},
        timeout=3600,
    )
    lines = [ln for ln in proc.stdout.strip().splitlines() if ln.strip()]
    if proc.returncode != 0 or not lines:
        sys.stderr.write(proc.stderr[-4000:])
        raise RuntimeError(f"cohort {cohort} failed (rc={proc.returncode})")
    return json.loads(lines[-1])


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = -1.0  # unknown scale tag

    if len(sys.argv) >= 3 and sys.argv[1] == "--cohort":
        run_cohort(sys.argv[2], sf_dir)
        return

    # orchestrate: one fresh JVM per cohort so no cohort inherits another's
    # session pressure; order no longer matters, kept stable for logs
    merged: dict = {}
    for cohort in ("pipelines", "commit", "queries", "extras"):
        merged.update(_run_isolated(cohort, sf_dir))

    timings = merged.get("queries", {})
    total = round(sum(timings.values()), 3)
    # two lines, detailed FIRST: the driver captures a byte-capped stdout
    # tail and json-parses the last line — every round through r12 the
    # single ~3.5 KB detailed line overflowed that cap, so the recorded
    # tail began mid-object (losing the early queries) and parsed=null.
    # The final line is the compact contract shape (metric/value/unit/
    # queries/sf) and fits whole; the full stats stay on the line above.
    print(
        json.dumps(
            {
                "detail": "full_stats",
                "query_stats": merged.get("query_stats", {}),
                "extras_stats": merged.get("extras_stats", {}),
                "queries_control": merged.get("queries_control", {}),
                "extras_control": merged.get("extras_control", {}),
                "pipeline_stats": merged.get("pipeline_stats", {}),
                # full commit-cohort dict INCLUDING its pinned control —
                # the compact line below keeps only the numeric fields,
                # and dropping the control here would leave commit drift
                # the one cohort that can't self-adjudicate (review find)
                "commit_overhead": merged.get("commit_overhead", {}),
                "isolation": "one JVM subprocess per cohort",
            }
        )
    )
    print(
        json.dumps(
            {
                "metric": "headline_query_wall_time_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "extras": merged.get("extras", {}),
                "pipelines": {
                    k: v["min"]
                    for k, v in merged.get("pipeline_stats", {}).items()
                    if isinstance(v, dict) and "min" in v
                },
                "commit_overhead": {
                    k: v
                    for k, v in merged.get("commit_overhead", {}).items()
                    if isinstance(v, (int, float))
                },
                "queries_control_min": merged.get("queries_control", {}).get("min"),
                "extras_control_min": merged.get("extras_control", {}).get("min"),
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
