"""Bucketed-table co-located join: pre-bucketing both sides on the join
key eliminates the shuffle (zero Exchange in the join plan) — the layout
strategy for repeated large-table joins at cluster scale (SURVEY §7 /
pyspark guide 'Partitioning & shuffle')."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_has_no_exchange(spark, no_broadcast):
    # tables land in ./spark-warehouse (gitignored; static conf can't move it)
    big_a = spark.range(50_000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("a")
    )
    big_b = spark.range(50_000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("b")
    )
    import shutil

    for name, df in [("ba", big_a), ("bb", big_b)]:
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        # the in-memory catalog forgets tables across sessions but their
        # warehouse dirs persist — saveAsTable refuses over a stale dir
        shutil.rmtree(f"spark-warehouse/{name}", ignore_errors=True)
        df.write.bucketBy(8, "k").sortBy("k").saveAsTable(name)
    joined = spark.table("ba").join(spark.table("bb"), "k")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, "bucketed join still shuffles"
    # and the result is right
    row = joined.agg(F.count("*").alias("n"), F.sum(F.col("a") + F.col("b")).alias("s")).collect()[0]
    assert row.n == 50_000
    assert row.s == sum(2 * i + 3 * i for i in range(50_000))
    # unbucketed control: same join DOES shuffle
    ctl = big_a.join(big_b, "k")
    ctl_plan = ctl._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" in ctl_plan
