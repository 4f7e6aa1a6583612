"""Relational operator queries (SURVEY §2.2-2.4, 2.6, 2.7).

Each query exercises one or more reference operators on the driver's
TPC-H-ish tables and carries a DuckDB oracle. Spark-first notes are inline:
filters/projections are written so Catalyst pushes them into the parquet
scan; dimension joins are broadcast; top-k compiles to
TakeOrderedAndProject.

Reference parity citations (files under /root/reference):
- equi-joins on composite keys: pipelines/utils/data.py:25,59,71
- left-join + null-filter: pipelines/utils/data.py:59-60
- groupBy aggregates: pipelines/benchmark_flow.py:28-29
- pivot/unpivot: pipelines/factor_model_flow.py:18,79-81
- union-all concat: pipelines/stock_prices_flow.py:87
- sort desc + head (top-k): pipelines/utils/calendar.py:17-19
- distinct: pipelines/history_flow.py:21
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..io import load_table
from .registry import register


def dsum(col: Column | str, scale: int = 100) -> Column:
    """Deterministic sum of a fixed-decimal double column.

    Rounds each value to an exact scaled int64, sums in integer space
    (order-independent, overflow-safe for this data), divides back to
    double. DuckDB equivalent:
    ``CAST(SUM(CAST(ROUND(x*scale) AS BIGINT)) AS DOUBLE)/scale``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(F.round(c * scale).cast("long")).cast("double") / F.lit(float(scale))


def _sql_dsum(expr: str, scale: int = 100) -> str:
    return f"CAST(SUM(CAST(ROUND(({expr})*{scale}) AS BIGINT)) AS DOUBLE)/{scale}"


# --------------------------------------------------------------------------
# q01 — TPC-H Q1 shape: scan + filter + groupBy + 8 aggregates. [A1,P4,F1]
# --------------------------------------------------------------------------
@register(
    "q01_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {_sql_dsum('l_quantity')} AS sum_qty,
           {_sql_dsum('l_extendedprice')} AS sum_base_price,
           {_sql_dsum('l_extendedprice*(1-l_discount)', 10000)} AS sum_disc_price,
           {_sql_dsum('l_extendedprice*(1-l_discount)*(1+l_tax)', 1000000)} AS sum_charge,
           ROUND({_sql_dsum('l_quantity')} / COUNT(*), 6) AS avg_qty,
           ROUND({_sql_dsum('l_extendedprice')} / COUNT(*), 6) AS avg_price,
           ROUND({_sql_dsum('l_discount')} / COUNT(*), 6) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    cutoff = F.lit("2000-09-02").cast(l.schema["l_shipdate"].dataType)
    return (
        l.filter(F.col("l_shipdate") <= cutoff)  # pushed to parquet scan
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000).alias("sum_disc_price"),
            dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax")), 1000000
            ).alias("sum_charge"),
            F.round(dsum("l_quantity") / F.count("*"), 6).alias("avg_qty"),
            F.round(dsum("l_extendedprice") / F.count("*"), 6).alias("avg_price"),
            F.round(dsum("l_discount") / F.count("*"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


# --------------------------------------------------------------------------
# q02 — TPC-H Q5 shape: 6-way equi-join chain, dims broadcast. [J1-J6]
# --------------------------------------------------------------------------
@register(
    "q02_local_supplier_revenue",
    oracle=f"""
    SELECT n_name, {_sql_dsum('l_extendedprice*(1-l_discount)', 10000)} AS revenue
    FROM customer, orders, lineitem, supplier, nation, region
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      AND r_name = 'REGION_0'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY n_name
    """,
)
def q02_local_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    dt = o.schema["o_orderdate"].dataType
    o = o.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast(dt))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast(dt))
    )
    # lineitem is the fact table; everything else is broadcast-able at any SF
    # where dims stay dim-sized (customer at 100TB would be sort-merge, AQE
    # decides; the explicit broadcasts below are the small fixed dims).
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r.filter(F.col("r_name") == "REGION_0")), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000).alias("revenue"))
    )


# --------------------------------------------------------------------------
# q03 — top-k with deterministic tiebreak (sort desc + limit). [O2]
# --------------------------------------------------------------------------
@register(
    "q03_top_orders",
    oracle=f"""
    SELECT o_orderkey, o_orderdate,
           {_sql_dsum('l_extendedprice*(1-l_discount)', 10000)} AS revenue
    FROM customer, orders, lineitem
    WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
      AND l_orderkey = o_orderkey
      AND o_orderdate < TIMESTAMP '1999-03-15'
      AND l_shipdate  > TIMESTAMP '1999-03-15'
    GROUP BY o_orderkey, o_orderdate
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
)
def q03_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    dt = o.schema["o_orderdate"].dataType
    # r16 (guide §3.1): the date filter keeps ~97% of orders, so the
    # auto-broadcast of the filtered side was a ~145k-row driver-built
    # hashed relation (0.60 s vs 0.45 s interleaved min-of-4) — and a
    # shape that cannot broadcast at 100 TB. Shuffled-hash builds the
    # per-partition tables in parallel instead.
    o = o.filter(F.col("o_orderdate") < F.lit("1999-03-15").cast(dt)).hint("shuffle_hash")
    l = l.filter(F.col("l_shipdate") > F.lit("1999-03-15").cast(l.schema["l_shipdate"].dataType))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)  # filtered customer: broadcast by AQE
        .groupBy("o_orderkey", "o_orderdate")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))  # TakeOrderedAndProject
        .limit(10)
    )


# --------------------------------------------------------------------------
# q04 — EXISTS via left-semi join. [J-semi]
# --------------------------------------------------------------------------
@register(
    "q04_priority_semi",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    """,
)
def q04_priority_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    # r16 (guide §3.1): without the hint the planner broadcasts the
    # PROJECTED lineitem side (~600k rows at sf0.1) — a single-threaded
    # driver-side hashed-relation build that dominated the query (0.78 s
    # vs 0.48 s, interleaved min-of-4), and a plan that cannot exist at
    # 100 TB (lineitem is the fact table). A shuffled-hash semi join
    # builds per-partition hash tables in parallel and is the strategy a
    # cluster-scale planner would need anyway.
    cond = (l.l_orderkey == o.o_orderkey) & (
        l.l_shipdate > o.o_orderdate + F.expr("INTERVAL 60 DAYS")
    )
    return (
        o.join(l.hint("shuffle_hash"), cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


# --------------------------------------------------------------------------
# q05 — NOT EXISTS via left-anti join. [J-anti]
# --------------------------------------------------------------------------
@register(
    "q05_customers_without_orders",
    oracle=f"""
    SELECT c_mktsegment, COUNT(*) AS n_customers,
           {_sql_dsum('c_acctbal')} AS total_acctbal
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY c_mktsegment
    """,
)
def q05_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers"), dsum("c_acctbal").alias("total_acctbal"))
    )


# --------------------------------------------------------------------------
# q06 — TPC-H Q6 shape: pure filter + global agg (between / range). [P4,A3]
# --------------------------------------------------------------------------
@register(
    "q06_forecast_revenue",
    oracle=f"""
    SELECT {_sql_dsum('l_extendedprice*l_discount', 10000)} AS revenue,
           COUNT(*) AS n_rows
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
    """,
)
def q06_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    dt = l.schema["l_shipdate"].dataType
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast(dt))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast(dt))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dsum(F.col("l_extendedprice") * F.col("l_discount"), 10000).alias("revenue"),
            F.count("*").alias("n_rows"),
        )
    )


# --------------------------------------------------------------------------
# q07 — pivot long→wide with explicit value list. [R2]
# --------------------------------------------------------------------------
@register(
    "q07_pivot_status_by_nation",
    oracle=f"""
    SELECT n_name,
           {_sql_dsum("CASE WHEN o_orderstatus='F' THEN o_totalprice END")} AS total_F,
           {_sql_dsum("CASE WHEN o_orderstatus='O' THEN o_totalprice END")} AS total_O,
           {_sql_dsum("CASE WHEN o_orderstatus='P' THEN o_totalprice END")} AS total_P
    FROM orders, customer, nation
    WHERE o_custkey = c_custkey AND c_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def q07_pivot_status_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    joined = o.join(c, o.o_custkey == c.c_custkey).join(
        F.broadcast(n), c.c_nationkey == n.n_nationkey
    )
    # explicit pivot values: single-pass, deterministic columns (SURVEY §7.5.7)
    piv = (
        joined.groupBy("n_name")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(dsum("o_totalprice"))
    )
    return piv.select(
        "n_name",
        F.col("F").alias("total_F"),
        F.col("O").alias("total_O"),
        F.col("P").alias("total_P"),
    )


# --------------------------------------------------------------------------
# q08 — unpivot wide→long (melt). [R3]
# --------------------------------------------------------------------------
@register(
    "q08_unpivot_part_metrics",
    oracle="""
    SELECT p_partkey, 'retail_price' AS metric, p_retailprice AS value
    FROM part
    UNION ALL
    SELECT p_partkey, 'size' AS metric, CAST(p_size AS DOUBLE) AS value
    FROM part
    """,
)
def q08_unpivot_part_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").select(
        "p_partkey",
        F.col("p_retailprice").alias("retail_price"),
        F.col("p_size").cast("double").alias("size"),
    )
    return p.unpivot("p_partkey", ["retail_price", "size"], "metric", "value")


# --------------------------------------------------------------------------
# q09 — union-all of heterogeneous projections with literal tag. [R1,R5,F10]
# --------------------------------------------------------------------------
@register(
    "q09_union_tagged",
    oracle="""
    SELECT o_orderkey AS id, 'urgent_order' AS tag FROM orders
    WHERE o_orderpriority = '1-URGENT'
    UNION ALL
    SELECT c_custkey AS id, 'rich_customer' AS tag FROM customer
    WHERE c_acctbal > 9000
    """,
)
def q09_union_tagged(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_orderkey").alias("id"), F.lit("urgent_order").alias("tag")
    )
    rich = c.filter(F.col("c_acctbal") > 9000).select(
        F.col("c_custkey").alias("id"), F.lit("rich_customer").alias("tag")
    )
    return urgent.unionByName(rich)


# --------------------------------------------------------------------------
# q10 — distinct. [A5,R6]
# --------------------------------------------------------------------------
@register(
    "q10_distinct_flag_status",
    oracle="SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
)
def q10_distinct_flag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus").distinct()


# --------------------------------------------------------------------------
# q11 — top-k per group via row_number window. [O2 grouped]
# --------------------------------------------------------------------------
@register(
    "q11_top_suppliers_per_nation",
    oracle="""
    SELECT s_nationkey, s_suppkey, s_acctbal, rn FROM (
        SELECT s_nationkey, s_suppkey, s_acctbal,
               ROW_NUMBER() OVER (PARTITION BY s_nationkey
                                  ORDER BY s_acctbal DESC, s_suppkey) AS rn
        FROM supplier) t
    WHERE rn <= 3
    """,
)
def q11_top_suppliers_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier")
    w = W.partitionBy("s_nationkey").orderBy(F.desc("s_acctbal"), F.asc("s_suppkey"))
    return (
        s.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("s_nationkey", "s_suppkey", "s_acctbal", "rn")
    )


# --------------------------------------------------------------------------
# q12 — rollup (grouping sets). [A-ext; free in Spark, declared for parity]
# --------------------------------------------------------------------------
@register(
    "q12_rollup_acctbal",
    oracle=f"""
    SELECT r_name, n_name, COUNT(*) AS n_suppliers,
           {_sql_dsum('s_acctbal')} AS total_acctbal
    FROM supplier, nation, region
    WHERE s_nationkey = n_nationkey AND n_regionkey = r_regionkey
    GROUP BY ROLLUP(r_name, n_name)
    """,
)
def q12_rollup_acctbal(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    joined = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    )
    return joined.rollup("r_name", "n_name").agg(
        F.count("*").alias("n_suppliers"), dsum("s_acctbal").alias("total_acctbal")
    )


# --------------------------------------------------------------------------
# q13 — left join + null-filter (reference idiom J2/J4/J5) and
#        left join preserving nulls. [J2,P5]
# --------------------------------------------------------------------------
@register(
    "q13_orders_with_optional_lineitems",
    oracle="""
    SELECT o.o_orderkey, o.o_totalprice, COUNT(l.l_orderkey) AS n_items
    FROM orders o LEFT JOIN lineitem l
      ON o.o_orderkey = l.l_orderkey AND l.l_quantity > 45
    GROUP BY o.o_orderkey, o.o_totalprice
    """,
)
def q13_orders_with_optional_lineitems(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    return (
        o.join(l, o.o_orderkey == l.l_orderkey, "left")
        .groupBy(o.o_orderkey, o.o_totalprice)
        .agg(F.count(l.l_orderkey).alias("n_items"))
    )


# --------------------------------------------------------------------------
# q14 — rolling single-regressor beta per supplier (reference W7:
#        pipelines/betas_flow.py:14-56) in closed form from exact scaled
#        window sums: beta = cov(price,qty)/var(qty) over last 30 rows.
# --------------------------------------------------------------------------
# (l_orderkey, l_linenumber) is NOT unique in the synthetic data (118k dup
# groups at sf0.1); the measures make the order total in practice, which the
# window sums need to be engine-independent
_Q14_WIN = (
    "PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber, "
    "l_quantity, l_extendedprice"
)
_Q14_SUMS = """
      CAST(SUM(CAST(ROUND(l_quantity*100) AS BIGINT)) OVER w AS DOUBLE)/100
"""


@register(
    "q14_rolling_beta_supplier",
    oracle=f"""
    SELECT l_suppkey, l_orderkey, l_linenumber,
      CASE WHEN COUNT(*) OVER w >= 30 THEN
        ROUND(
          ( CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)
                     * CAST(ROUND(l_quantity*100) AS BIGINT)) OVER w AS DOUBLE)/10000
            - (CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) OVER w AS DOUBLE)/100)
              * ({_Q14_SUMS}) / (COUNT(*) OVER w) )
          /
          NULLIF(
            CAST(SUM(CAST(ROUND(l_quantity*100) AS BIGINT)
                     * CAST(ROUND(l_quantity*100) AS BIGINT)) OVER w AS DOUBLE)/10000
            - ({_Q14_SUMS}) * ({_Q14_SUMS}) / (COUNT(*) OVER w), 0)
        , 6)
      END AS beta
    FROM lineitem
    WINDOW w AS ({_Q14_WIN} ROWS BETWEEN 29 PRECEDING AND CURRENT ROW)
    """,
)
def q14_rolling_beta_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    w = (
        W.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
        .rowsBetween(-29, 0)
    )
    pc = F.round(F.col("l_extendedprice") * 100).cast("long")
    qc = F.round(F.col("l_quantity") * 100).cast("long")
    n = F.count("*").over(w)
    sp = F.sum(pc).over(w).cast("double") / 100
    sq = F.sum(qc).over(w).cast("double") / 100
    spq = F.sum(pc * qc).over(w).cast("double") / 10000
    sqq = F.sum(qc * qc).over(w).cast("double") / 10000
    var = sqq - sq * sq / n
    beta = (spq - sp * sq / n) / F.when(var != 0, var)  # NULL on zero variance
    return l.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.when(n >= 30, F.round(beta, 6)).alias("beta"),
    )


# --------------------------------------------------------------------------
# q15 — scalar function surface: JSON extraction, dict remap (reference F9:
#        pipelines/factor_model_flow.py:84), epoch arithmetic (F8).
# --------------------------------------------------------------------------
@register(
    "q15_json_remap",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k,
           CASE event_type
                WHEN 'click' THEN 'engagement'
                WHEN 'view' THEN 'engagement'
                WHEN 'purchase' THEN 'conversion'
                WHEN 'signup' THEN 'conversion'
                ELSE 'other' END AS category,
           epoch_us(ts) // 1000000 AS epoch_s
    FROM events
    """,
)
def q15_json_remap(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    remap = {"click": "engagement", "view": "engagement", "purchase": "conversion", "signup": "conversion"}
    cat = F.lit("other")
    for k, v in remap.items():
        cat = F.when(F.col("event_type") == k, v).otherwise(cat)
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k"),
        cat.alias("category"),
        F.expr("ts_us DIV 1000000").alias("epoch_s"),
    )


# --------------------------------------------------------------------------
# q16 — min/max extremes + conditional aggregation (reference A4:
#        pipelines/utils/calendar.py:10, pipelines/betas_flow.py:123-124).
# --------------------------------------------------------------------------
@register(
    "q16_segment_extremes",
    oracle="""
    SELECT c_mktsegment,
           MIN(c_acctbal) AS min_bal, MAX(c_acctbal) AS max_bal,
           COUNT(*) FILTER (WHERE c_acctbal < 0) AS n_negative,
           MIN(o_orderdate) AS first_order, MAX(o_orderdate) AS last_order
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_mktsegment
    """,
)
def q16_segment_extremes(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_mktsegment")
        .agg(
            F.min("c_acctbal").alias("min_bal"),
            F.max("c_acctbal").alias("max_bal"),
            F.count(F.when(F.col("c_acctbal") < 0, 1)).alias("n_negative"),
            F.min("o_orderdate").alias("first_order"),
            F.max("o_orderdate").alias("last_order"),
        )
    )


# --------------------------------------------------------------------------
# q17 — string↔date roundtrip with month names (reference F6:
#        str.strptime(Date, "%B %d, %Y"), pipelines/universe_flow.py:76)
#        plus date-part extraction (F4/F5/F7).
# --------------------------------------------------------------------------
@register(
    "q17_date_roundtrip",
    oracle="""
    SELECT o_orderkey,
           strftime(o_orderdate, '%B %-d, %Y') AS pretty,
           CAST(strptime(strftime(o_orderdate, '%B %-d, %Y'), '%B %d, %Y') AS DATE)
             AS parsed,
           CAST(year(o_orderdate) AS INT) AS y,
           CAST(month(o_orderdate) AS INT) AS m,
           CAST(day(o_orderdate) AS INT) AS d
    FROM orders WHERE o_orderkey < 500
    """,
)
def q17_date_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 500)
    pretty = F.date_format("o_orderdate", "MMMM d, yyyy")
    return o.select(
        "o_orderkey",
        pretty.alias("pretty"),
        F.to_date(pretty, "MMMM d, yyyy").alias("parsed"),
        F.year("o_orderdate").cast("int").alias("y"),
        F.month("o_orderdate").cast("int").alias("m"),
        F.dayofmonth("o_orderdate").cast("int").alias("d"),
    )


# --------------------------------------------------------------------------
# q18 — exact interpolated percentiles per group (the deterministic cousin
#        of percentile_approx; linear interpolation is bit-identical to
#        DuckDB's quantile_cont on this fixed-decimal data).
# --------------------------------------------------------------------------
@register(
    "q18_percentiles",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           quantile_cont(l_quantity, 0.5) AS qty_p50,
           quantile_cont(l_quantity, 0.9) AS qty_p90,
           quantile_cont(l_extendedprice, 0.25) AS price_p25,
           quantile_cont(l_extendedprice, 0.99) AS price_p99
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q18_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag", "l_linestatus").agg(
        F.percentile("l_quantity", F.lit(0.5)).alias("qty_p50"),
        F.percentile("l_quantity", F.lit(0.9)).alias("qty_p90"),
        F.percentile("l_extendedprice", F.lit(0.25)).alias("price_p25"),
        F.percentile("l_extendedprice", F.lit(0.99)).alias("price_p99"),
    )
