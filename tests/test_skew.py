"""Salted join / two-phase aggregation: identical results to the naive
shapes, with the salt spreading hot keys across partitions."""

from __future__ import annotations

from pyspark.sql import functions as F

from at_data_pipelines_spark.ops import salted_join, two_phase_agg, with_salt


def _skewed(spark):
    # one hot key (90% of rows) + long tail
    hot = spark.range(9000).select(
        F.lit("HOT").alias("k"), F.col("id").alias("payload")
    )
    tail = spark.range(1000).select(
        F.concat(F.lit("k"), (F.col("id") % 50).cast("string")).alias("k"),
        (F.col("id") + 100000).alias("payload"),
    )
    return hot.unionByName(tail)


def test_salted_join_matches_plain_join(spark):
    big = _skewed(spark)
    dim_rows = [("HOT", 1.0)] + [(f"k{i}", float(i)) for i in range(50)]
    dim = spark.createDataFrame(dim_rows, ["k", "v"])
    plain = big.join(dim, "k").agg(
        F.count("*").alias("n"), F.sum("v").alias("sv"), F.sum("payload").alias("sp")
    ).collect()[0]
    salted = salted_join(big, dim, "k", entropy_col="payload", salt_n=8).agg(
        F.count("*").alias("n"), F.sum("v").alias("sv"), F.sum("payload").alias("sp")
    ).collect()[0]
    assert (plain.n, plain.sv, plain.sp) == (salted.n, salted.sv, salted.sp)


def test_salted_join_left_keeps_unmatched(spark):
    big = _skewed(spark)
    dim = spark.createDataFrame([("HOT", 1.0)], ["k", "v"])
    out = salted_join(big, dim, "k", entropy_col="payload", salt_n=4, how="left")
    assert out.count() == big.count()
    assert out.filter(F.col("v").isNull()).count() == 1000


def test_two_phase_agg_matches_direct(spark):
    df = _skewed(spark)
    direct = {
        r.k: (r.n, r.s)
        for r in df.groupBy("k")
        .agg(F.count("*").alias("n"), F.sum("payload").alias("s"))
        .collect()
    }
    two = {
        r.k: (r.n, r.s)
        for r in two_phase_agg(
            df,
            ["k"],
            "payload",
            partial_aggs=[F.count("*").alias("pn"), F.sum("payload").alias("ps")],
            final_aggs=[F.sum("pn").alias("n"), F.sum("ps").alias("s")],
            salt_n=8,
        ).collect()
    }
    assert direct == two


def test_salt_spreads_hot_key(spark):
    df = with_salt(_skewed(spark).filter(F.col("k") == "HOT"), "payload", 8)
    per_salt = df.groupBy("_salt").count().collect()
    assert len(per_salt) == 8  # all salt buckets hit
    assert max(r["count"] for r in per_salt) < 9000 * 0.25  # no bucket dominates
