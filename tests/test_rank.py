"""Distributed two-pass global rank (ops.rank) — parity with the
single-partition window and scale-shape plan assertions."""

from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from at_data_pipelines_spark.io import load_table
from at_data_pipelines_spark.ops.rank import (
    ntile_from,
    percent_rank_from,
    with_global_rank,
)


def test_global_rank_matches_window(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    w = W.orderBy("c_acctbal", "c_custkey")
    want = {
        (r.c_custkey, r.rk, r.dec, r.pr)
        for r in c.select(
            "c_custkey",
            F.row_number().over(w).alias("rk"),
            F.ntile(7).over(w).alias("dec"),
            F.round(F.percent_rank().over(w), 9).alias("pr"),
        ).collect()
    }
    ranked = with_global_rank(c, ["c_acctbal", "c_custkey"])
    got = {
        (r.c_custkey, r.rk, r.dec, r.pr)
        for r in ranked.select(
            "c_custkey",
            F.col("global_rank").alias("rk"),
            ntile_from(F.col("global_rank"), F.col("_total"), 7).alias("dec"),
            F.round(percent_rank_from(F.col("global_rank"), F.col("_total")), 9).alias("pr"),
        ).collect()
    }
    assert got == want


def test_ntile_from_matches_window_all_remainders(spark):
    """NTILE's uneven-bucket split must match for every N mod k."""
    for n_rows in (9, 10, 11, 23):
        df = spark.range(1, n_rows + 1).withColumnRenamed("id", "k")
        w = W.orderBy("k")
        want = [
            (r.k, r.t) for r in df.select("k", F.ntile(10).over(w).alias("t")).collect()
        ]
        got = [
            (r.k, r.t)
            for r in df.select(
                "k",
                ntile_from(F.col("k"), F.lit(n_rows).cast("long"), 10).alias("t"),
            ).collect()
        ]
        assert sorted(got) == sorted(want), f"n_rows={n_rows}"


def test_rank_stage_is_distributed(spark, sf_dir):
    """q38's plan must not rank through one partition: no global-window
    rank functions, the data path goes through range partitioning, and at
    most one SinglePartition exchange exists (the P-row offsets metadata,
    not the data)."""
    import __spark_entry__ as m

    df = m.queries()["q38_customer_deciles"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ntile(" not in plan and "percent_rank(" not in plan
    assert "rangepartitioning" in plan
    assert plan.count("SinglePartition") <= 1
    # the local-rank window is partitioned (by _pid), never global: every
    # row_number window spec in the plan carries a partition key. (AQE may
    # still coalesce the tiny fixture to 1 runtime partition — the plan's
    # partitioning scheme, not the runtime count, is the scale contract.)
    assert "hashpartitioning(_pid" in plan
