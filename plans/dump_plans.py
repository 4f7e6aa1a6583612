"""Dump .explain('formatted') for a set of registered queries.

Usage: python plans/dump_plans.py <outdir> <suffix> [query ...]
  e.g. python plans/dump_plans.py plans/r17 before q45_minhash_lsh_candidates q46_jaccard_near_dups

Driver-side only — explain() never launches jobs, so this is safe to run
on a loaded host.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from at_data_pipelines_spark.queries import QUERIES  # noqa: E402
from at_data_pipelines_spark.session import get_spark  # noqa: E402


def main() -> None:
    outdir, suffix, *names = sys.argv[1:]
    os.makedirs(outdir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="plan-dump")
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
