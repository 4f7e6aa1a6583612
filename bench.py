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


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = -1.0  # unknown scale tag
    spark = get_spark(app_name="bench")

    # warm the JVM/codegen once with the cheapest query
    QUERIES["q10_distinct_flag_status"](spark, sf_dir).count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        if name not in QUERIES:
            continue
        best = float("inf")
        for _ in range(2):  # min of 2: steady-state, less scheduler noise
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).count()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_query_wall_time_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
