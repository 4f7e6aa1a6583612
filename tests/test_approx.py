"""Approximate aggregates (free Spark surface, SURVEY §2.4 note): sketch
results must land within their error bounds of exact answers. No DuckDB
oracle — HLL/KLL sketches are engine-specific by design."""

from __future__ import annotations

from pyspark.sql import functions as F

from at_data_pipelines_spark.io import load_table


def test_approx_count_distinct(spark, sf_dir):
    l = load_table(spark, sf_dir, "lineitem")
    exact = l.select(F.countDistinct("l_partkey").alias("n")).collect()[0].n
    approx = l.select(F.approx_count_distinct("l_partkey", rsd=0.02).alias("n")).collect()[0].n
    assert abs(approx - exact) / exact < 0.06  # 3× the requested rsd


def test_percentile_approx_near_exact(spark, sf_dir):
    l = load_table(spark, sf_dir, "lineitem")
    row = l.select(
        F.percentile_approx("l_extendedprice", 0.5, 10_000).alias("ap"),
        F.percentile("l_extendedprice", F.lit(0.5)).alias("ex"),
    ).collect()[0]
    assert abs(row.ap - row.ex) / row.ex < 0.01
