"""Subquery-shaped queries (q31-q34): scalar subqueries, correlated
subqueries, nested aggregation — the Catalyst rewrite surface (subquery →
join) that simple operator queries don't exercise.

All deterministic via the registry's exact-arithmetic policy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from .registry import register
from .relational import _sql_dsum, dsum


# --------------------------------------------------------------------------
# q31 — TPC-H Q11 shape: group aggregate filtered by a global scalar
#        subquery (fraction of the grand total).
# --------------------------------------------------------------------------
@register(
    "q31_important_parts",
    oracle=f"""
    WITH per_part AS (
        SELECT l_partkey, {_sql_dsum('l_extendedprice')} AS part_value
        FROM lineitem GROUP BY l_partkey),
    total AS (SELECT SUM(part_value) AS tv FROM per_part)
    SELECT l_partkey, part_value
    FROM per_part, total
    WHERE part_value > tv * 0.0005
    """,
)
def q31_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    per_part = l.groupBy("l_partkey").agg(dsum("l_extendedprice").alias("part_value"))
    total = per_part.agg(F.sum("part_value").alias("tv"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("part_value") > F.col("tv") * 0.0005)
        .select("l_partkey", "part_value")
    )


# --------------------------------------------------------------------------
# q32 — TPC-H Q15 shape: top revenue supplier(s) via nested aggregation
#        (supplier whose revenue equals MAX(revenue)).
# --------------------------------------------------------------------------
@register(
    "q32_top_supplier",
    oracle=f"""
    WITH rev AS (
        SELECT l_suppkey, {_sql_dsum('l_extendedprice*(1-l_discount)', 10000)} AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1998-01-01' AND l_shipdate < TIMESTAMP '1998-04-01'
        GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, revenue
    FROM supplier, rev
    WHERE s_suppkey = l_suppkey AND revenue = (SELECT MAX(revenue) FROM rev)
    """,
)
def q32_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    dt = l.schema["l_shipdate"].dataType
    rev = (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1998-01-01").cast(dt))
            & (F.col("l_shipdate") < F.lit("1998-04-01").cast(dt))
        )
        .groupBy("l_suppkey")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000).alias("revenue"))
    )
    mx = rev.agg(F.max("revenue").alias("mx"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("revenue") == F.col("mx"))
        .join(s, F.col("l_suppkey") == s.s_suppkey)
        .select("s_suppkey", "s_name", "revenue")
    )


# --------------------------------------------------------------------------
# q33 — TPC-H Q17 shape: correlated scalar subquery (per-part average
#        threshold) → small-order detection.
# --------------------------------------------------------------------------
@register(
    "q33_small_quantity_revenue",
    oracle=f"""
    WITH avg_qty AS (
        SELECT l_partkey AS pk,
               ROUND({_sql_dsum('l_quantity')} / COUNT(*), 6) AS aq
        FROM lineitem GROUP BY l_partkey)
    SELECT {_sql_dsum('l_extendedprice')} AS total_price, COUNT(*) AS n_rows
    FROM lineitem, avg_qty
    WHERE l_partkey = pk AND l_quantity < 0.5 * aq
    """,
)
def q33_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    avg_qty = l.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.round(dsum("l_quantity") / F.count("*"), 6).alias("aq")
    )
    return (
        l.join(avg_qty, l.l_partkey == avg_qty.pk)
        .filter(F.col("l_quantity") < 0.5 * F.col("aq"))
        .agg(dsum("l_extendedprice").alias("total_price"), F.count("*").alias("n_rows"))
    )


# --------------------------------------------------------------------------
# q34 — TPC-H Q22 shape: anti join + scalar-subquery threshold
#        (rich customers with no orders, by phone-prefix-like segment).
# --------------------------------------------------------------------------
@register(
    "q34_lost_customers",
    oracle=f"""
    WITH thresh AS (
        SELECT ROUND({_sql_dsum('c_acctbal')} / COUNT(*), 6) AS avg_bal
        FROM customer WHERE c_acctbal > 0.0)
    SELECT c_mktsegment, COUNT(*) AS n_custs,
           {_sql_dsum('c_acctbal')} AS total_bal
    FROM customer, thresh
    WHERE c_acctbal > avg_bal
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY c_mktsegment
    """,
)
def q34_lost_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    thresh = c.filter(F.col("c_acctbal") > 0.0).agg(
        F.round(dsum("c_acctbal") / F.count("*"), 6).alias("avg_bal")
    )
    return (
        c.crossJoin(F.broadcast(thresh))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_custs"), dsum("c_acctbal").alias("total_bal"))
    )
