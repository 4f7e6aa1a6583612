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


# --------------------------------------------------------------------------
# q39 — set operators INTERSECT / EXCEPT (SURVEY §2.7: absent from the
#        reference, exposed natively): customer retention year-over-year.
# --------------------------------------------------------------------------
@register(
    "q39_customer_retention",
    oracle="""
    WITH y96 AS (SELECT DISTINCT o_custkey FROM orders
                 WHERE o_orderdate >= TIMESTAMP '1996-01-01'
                   AND o_orderdate < TIMESTAMP '1997-01-01'),
    y97 AS (SELECT DISTINCT o_custkey FROM orders
            WHERE o_orderdate >= TIMESTAMP '1997-01-01'
              AND o_orderdate < TIMESTAMP '1998-01-01')
    SELECT 'retained' AS cohort, COUNT(*) AS n
    FROM (SELECT o_custkey FROM y96 INTERSECT SELECT o_custkey FROM y97)
    UNION ALL
    SELECT 'churned', COUNT(*)
    FROM (SELECT o_custkey FROM y96 EXCEPT SELECT o_custkey FROM y97)
    UNION ALL
    SELECT 'new', COUNT(*)
    FROM (SELECT o_custkey FROM y97 EXCEPT SELECT o_custkey FROM y96)
    """,
)
def q39_customer_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    dt = o.schema["o_orderdate"].dataType

    def year_custs(y0, y1):
        return (
            o.filter(
                (F.col("o_orderdate") >= F.lit(y0).cast(dt))
                & (F.col("o_orderdate") < F.lit(y1).cast(dt))
            )
            .select("o_custkey")
            .distinct()
        )

    y96 = year_custs("1996-01-01", "1997-01-01")
    y97 = year_custs("1997-01-01", "1998-01-01")
    spark_df = (
        y96.intersect(y97).agg(F.count("*").alias("n")).select(F.lit("retained").alias("cohort"), "n")
        .unionByName(
            y96.exceptAll(y97).agg(F.count("*").alias("n")).select(F.lit("churned").alias("cohort"), "n")
        )
        .unionByName(
            y97.exceptAll(y96).agg(F.count("*").alias("n")).select(F.lit("new").alias("cohort"), "n")
        )
    )
    return spark_df


# --------------------------------------------------------------------------
# q35 — CUBE grouping sets with GROUPING() disambiguation.
# --------------------------------------------------------------------------
@register(
    "q35_cube_orders",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           GROUPING(o_orderstatus) AS g_status,
           GROUPING(o_orderpriority) AS g_prio,
           COUNT(*) AS n, {_sql_dsum('o_totalprice')} AS total
    FROM orders
    GROUP BY CUBE(o_orderstatus, o_orderpriority)
    """,
)
def q35_cube_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.grouping("o_orderstatus").cast("long").alias("g_status"),
        F.grouping("o_orderpriority").cast("long").alias("g_prio"),
        F.count("*").alias("n"),
        dsum("o_totalprice").alias("total"),
    )


# --------------------------------------------------------------------------
# q36 — time-RANGE window frame: trailing 10-minute sum per user
#        (range frame on epoch-µs, exact cents — intraday rolling shape).
# --------------------------------------------------------------------------
@register(
    "q36_trailing_10min_sum",
    oracle="""
    SELECT event_id, user_id,
           CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) OVER w AS DOUBLE)/100
             AS trailing_sum,
           COUNT(*) OVER w AS n_in_window
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                 RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW)
    """,
)
def q36_trailing_10min_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..io import load_table as lt
    from pyspark.sql.window import Window as W

    e = lt(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts_us").rangeBetween(-600_000_000, 0)
    cents = F.round(F.col("value") * 100).cast("long")
    return e.select(
        "event_id",
        "user_id",
        (F.sum(cents).over(w).cast("double") / 100).alias("trailing_sum"),
        F.count(F.lit(1)).over(w).alias("n_in_window"),
    )


# --------------------------------------------------------------------------
# q37 — first/last value per partition-day (open/close of each user-day).
# --------------------------------------------------------------------------
@register(
    "q37_user_day_open_close",
    oracle="""
    SELECT DISTINCT user_id,
           epoch_us(ts) // 86400000000 AS day_idx,
           FIRST_VALUE(value) OVER w AS open_value,
           LAST_VALUE(value) OVER
             (PARTITION BY user_id, epoch_us(ts) // 86400000000
              ORDER BY epoch_us(ts), event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             AS close_value
    FROM events
    WINDOW w AS (PARTITION BY user_id, epoch_us(ts) // 86400000000
                 ORDER BY epoch_us(ts), event_id)
    """,
)
def q37_user_day_open_close(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..io import load_table as lt
    from pyspark.sql.window import Window as W

    e = lt(spark, sf_dir, "events").withColumn("day_idx", F.expr("ts_us DIV 86400000000"))
    w = W.partitionBy("user_id", "day_idx").orderBy("ts_us", "event_id")
    wfull = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return (
        e.select(
            "user_id",
            "day_idx",
            F.first("value").over(w).alias("open_value"),
            F.last("value").over(wfull).alias("close_value"),
        )
        .distinct()
    )


# --------------------------------------------------------------------------
# q38 — rank family: ntile deciles + percent_rank over a total order.
#        Registered plan is the distributed two-pass rank (ops.rank):
#        range-repartition on the order keys, local row_number per range
#        partition, P-row broadcast prefix offsets, then percent_rank and
#        NTILE closed-form from (global_rank, N) — no single-partition
#        global sort anywhere in the plan (asserted by plan test).
# --------------------------------------------------------------------------
@register(
    "q38_customer_deciles",
    oracle="""
    SELECT c_custkey, c_acctbal,
           NTILE(10) OVER w AS decile,
           ROUND(PERCENT_RANK() OVER w, 9) AS pr
    FROM customer
    WINDOW w AS (ORDER BY c_acctbal, c_custkey)
    """,
)
def q38_customer_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ops.rank import ntile_from, percent_rank_from, with_global_rank

    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    ranked = with_global_rank(c, ["c_acctbal", "c_custkey"])
    g, n = F.col("global_rank"), F.col("_total")
    return ranked.select(
        "c_custkey",
        "c_acctbal",
        ntile_from(g, n, 10).alias("decile"),
        F.round(percent_rank_from(g, n), 9).alias("pr"),
    )
