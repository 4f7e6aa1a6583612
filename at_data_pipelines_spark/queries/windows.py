"""Window / time-series queries over the events panel (SURVEY §2.5).

These mirror the reference's core idiom — per-entity ordered windows
(``.over("ticker")`` in Polars; `pipelines/returns_flow.py:20`,
`pipelines/reversal_flow.py:20-25`, `pipelines/factor_model_flow.py:99-103`)
— on the driver's ``events`` table (entity = user_id, time = ts).

Determinism: all ordering and bucketing uses int64 epoch-micros (``ts_us`` /
DuckDB ``epoch_us(ts)`` — DuckDB truncates parquet ns-timestamps to µs on
scan, so µs is the common resolution); rolling sums/stds use exact scaled
integer window sums so Spark and DuckDB produce bit-identical doubles.
Incomplete windows yield NULL (Polars min-periods semantics — SURVEY §7.5.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..io import load_table
from .registry import register

# per-user event order; event_id tiebreak makes it total
_ORDER_SQL = "PARTITION BY user_id ORDER BY epoch_us(ts), event_id"


def _events(spark, sf_dir) -> DataFrame:
    return load_table(spark, sf_dir, "events")


def _w():
    return W.partitionBy("user_id").orderBy("ts_us", "event_id")


# --------------------------------------------------------------------------
# q20 — per-entity ordered-window stats in ONE query: pct_change (reference
#        W1: pipelines/returns_flow.py:20), rolling_sum(21) with
#        min_periods=21 (W2: pipelines/reversal_flow.py:20-25), and rolling
#        sample std over 20 rows (W3: pipelines/factor_model_flow.py:99-103).
#        The three frames share one (user_id, ts) sort, so Spark plans a
#        single Exchange+Sort feeding all window operators — merging them is
#        strictly cheaper than three separate passes, and keeps the registry
#        inside the driver's correctness window.
#        Std is computed closed-form from exact integer window sums:
#        identical doubles in both engines, immune to Welford-vs-merge
#        differences.
# --------------------------------------------------------------------------
_STD_SQL = """
    CASE WHEN COUNT(*) OVER w20 >= 20 THEN
      SQRT(GREATEST(
        ( CAST(SUM(CAST(ROUND(value*100) AS BIGINT)*CAST(ROUND(value*100) AS BIGINT)) OVER w20 AS DOUBLE)/10000
          - (CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) OVER w20 AS DOUBLE)/100)
            * (CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) OVER w20 AS DOUBLE)/100)
            / (COUNT(*) OVER w20)
        ) / (COUNT(*) OVER w20 - 1), 0.0))
    END
"""


@register(
    "q20_rolling_window_stats",
    oracle=f"""
    SELECT user_id, event_id,
           value / NULLIF(LAG(value) OVER ({_ORDER_SQL}), 0) - 1 AS pct_change,
           CASE WHEN COUNT(*) OVER w21 >= 21 THEN
             CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) OVER w21 AS DOUBLE)/100
           END AS roll_sum,
           {_STD_SQL} AS roll_std
    FROM events
    WINDOW w21 AS ({_ORDER_SQL} ROWS BETWEEN 20 PRECEDING AND CURRENT ROW),
           w20 AS ({_ORDER_SQL} ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
    """,
)
def q20_rolling_window_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ts import pct_change

    e = _events(spark, sf_dir)
    w21 = _w().rowsBetween(-20, 0)
    w20 = _w().rowsBetween(-19, 0)
    cents = F.round(F.col("value") * 100).cast("long")
    n20 = F.count("*").over(w20)
    sx = F.sum(cents).over(w20).cast("double") / 100
    sxx = F.sum(cents * cents).over(w20).cast("double") / 10000
    var = (sxx - sx * sx / n20) / (n20 - 1)
    return e.select(
        "user_id",
        "event_id",
        # NULL when prev value is 0 (ANSI-safe; mirrored by NULLIF in the oracle)
        pct_change("value", _w()).alias("pct_change"),
        F.when(
            F.count("*").over(w21) >= 21, F.sum(cents).over(w21).cast("double") / 100
        ).alias("roll_sum"),
        F.when(n20 >= 20, F.sqrt(F.greatest(var, F.lit(0.0)))).alias("roll_std"),
    )


# --------------------------------------------------------------------------
# q23 — global z-score, whole-frame mean/std (reference A3/F12:
#        pipelines/reversal_flow.py:39-42 — deliberately NOT per-group).
# --------------------------------------------------------------------------
@register(
    "q23_zscore_global",
    oracle="""
    WITH stats AS (
        SELECT CAST(SUM(n_chars) AS DOUBLE) AS sx,
               CAST(SUM(n_chars*n_chars) AS DOUBLE) AS sxx,
               COUNT(*) AS n
        FROM documents)
    SELECT doc_id,
           ROUND((n_chars - sx/n) /
                 SQRT((sxx - sx*sx/n) / (n - 1)), 9) AS zscore
    FROM documents, stats
    """,
)
def q23_zscore_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    stats = d.agg(
        F.sum("n_chars").cast("double").alias("sx"),
        F.sum(F.col("n_chars") * F.col("n_chars")).cast("double").alias("sxx"),
        F.count("*").alias("n"),
    )
    # one-row aggregate broadcast back over the frame (crossJoin of a 1-row
    # df is a BroadcastNestedLoopJoin — free at any scale)
    return d.crossJoin(F.broadcast(stats)).select(
        "doc_id",
        F.round(
            (F.col("n_chars") - F.col("sx") / F.col("n"))
            / F.sqrt((F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n")) / (F.col("n") - 1)),
            9,
        ).alias("zscore"),
    )


# --------------------------------------------------------------------------
# q24 — per-partition count as denominator (reference A6/W10:
#        pipelines/benchmark_flow.py:16 equal-weight 1/len().over(date)).
#        Day is derived from epoch-nanos → timezone-independent.
# --------------------------------------------------------------------------
@register(
    "q24_equal_weight_daily",
    oracle="""
    SELECT DATE '1970-01-01' + CAST(epoch_us(ts) // 86400000000 AS INT) AS day,
           user_id,
           COUNT(*) AS n_events,
           1.0 / COUNT(*) AS equal_weight
    FROM events
    GROUP BY 1, 2
    """,
)
def q24_equal_weight_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    day = F.date_add(
        F.lit("1970-01-01").cast("date"),
        F.expr("CAST(ts_us DIV 86400000000 AS INT)"),
    )
    return (
        e.groupBy(day.alias("day"), "user_id")
        .agg(F.count("*").alias("n_events"), (F.lit(1.0) / F.count("*")).alias("equal_weight"))
    )


# --------------------------------------------------------------------------
# q25 — sessionization: 30-min inactivity gap → session ids → per-session
#        aggregates. Lag + cumulative-sum window idiom.
# --------------------------------------------------------------------------
@register(
    "q25_sessionization",
    oracle=f"""
    WITH flagged AS (
        SELECT user_id, event_id, epoch_us(ts) AS ts_us, value,
               CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER ({_ORDER_SQL})
                         > 1800000000 THEN 1
                    WHEN LAG(epoch_us(ts)) OVER ({_ORDER_SQL}) IS NULL THEN 1
                    ELSE 0 END AS is_new
        FROM events),
    sessions AS (
        SELECT *, SUM(is_new) OVER (PARTITION BY user_id
                                    ORDER BY ts_us, event_id) AS session_id
        FROM flagged)
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           COUNT(*) AS n_events,
           CAST(MAX(ts_us) - MIN(ts_us) AS DOUBLE)/1000000 AS duration_s,
           CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS DOUBLE)/100 AS total_value
    FROM sessions
    GROUP BY user_id, session_id
    """,
)
def q25_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    w = _w()
    gap = F.col("ts_us") - F.lag("ts_us").over(w)
    is_new = F.when(gap > 1800 * 10**6, 1).when(gap.isNull(), 1).otherwise(0)
    sessions = e.withColumn("is_new", is_new).withColumn(
        "session_id", F.sum("is_new").over(w)
    )
    return sessions.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        ((F.max("ts_us") - F.min("ts_us")).cast("double") / 10**6).alias("duration_s"),
        (F.sum(F.round(F.col("value") * 100).cast("long")).cast("double") / 100).alias(
            "total_value"
        ),
    )


# --------------------------------------------------------------------------
# q26 — tumbling 5-minute window aggregation (batch equivalent of the
#        streaming module's windowed agg; bucket on epoch-nanos).
# --------------------------------------------------------------------------
@register(
    "q26_tumbling_5min",
    oracle="""
    SELECT epoch_us(ts) // 300000000 * 300 AS bucket_start_s,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS DOUBLE)/100 AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def q26_tumbling_5min(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    bucket = (F.expr("ts_us DIV 300000000") * 300).alias("bucket_start_s")
    return e.groupBy(bucket, "event_type").agg(
        F.count("*").alias("n_events"),
        (F.sum(F.round(F.col("value") * 100).cast("long")).cast("double") / 100).alias(
            "total_value"
        ),
    )


# --------------------------------------------------------------------------
# q27 — order-insensitive collect: sorted distinct set → csv string
#        (reference A2 collect_list made deterministic). [A2,O3]
# --------------------------------------------------------------------------
@register(
    "q27_event_types_per_user",
    oracle="""
    SELECT user_id,
           STRING_AGG(DISTINCT event_type, ',' ORDER BY event_type) AS types_csv,
           COUNT(DISTINCT event_type) AS n_types
    FROM events
    GROUP BY user_id
    """,
)
def q27_event_types_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    return e.groupBy("user_id").agg(
        F.array_join(F.array_sort(F.collect_set("event_type")), ",").alias("types_csv"),
        F.countDistinct("event_type").alias("n_types"),
    )


# --------------------------------------------------------------------------
# q19 — as-of (backward) join: each event gets the most recent purchase
#        at-or-before it per user. Spark lacks the operator natively; the
#        implementation is ops.asof_join (union + last-ignorenulls window,
#        one shuffle, no Python). Oracle: DuckDB's native ASOF JOIN.
# --------------------------------------------------------------------------
@register(
    "q19_asof_last_purchase",
    oracle="""
    WITH p AS (
        SELECT user_id, epoch_us(ts) AS ts_us, MAX(value) AS purchase_value
        FROM events WHERE event_type = 'purchase'
        GROUP BY user_id, epoch_us(ts)),
    e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events)
    SELECT e.event_id, e.user_id, e.ts_us,
           p.purchase_value,
           p.ts_us AS purchase_ts_us
    FROM e ASOF LEFT JOIN p
      ON e.user_id = p.user_id AND e.ts_us >= p.ts_us
    """,
)
def q19_asof_last_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ops import asof_join

    e = _events(spark, sf_dir)
    left = e.select("event_id", "user_id", "ts_us")
    right = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts_us")
        .agg(F.max("value").alias("purchase_value"))
        .withColumn("purchase_ts_us", F.col("ts_us"))
    )
    return asof_join(
        left, right, on="ts_us", by="user_id",
        value_cols=["purchase_value", "purchase_ts_us"],
    )


# --------------------------------------------------------------------------
# q28 — exponential smoothing, half-life 10 (reference W4:
#        pipelines/factor_model_flow.py:87 ewm_mean(half_life=60),
#        Polars adjust=True). Spark: Arrow applyInPandas recursion; oracle:
#        direct O(n²)-per-group weighted sum (exact same math, different fp
#        path — hence round(4)).
# --------------------------------------------------------------------------
@register(
    "q28_ewm_halflife10",
    oracle=f"""
    WITH r AS (
        SELECT user_id, event_id, value,
               ROW_NUMBER() OVER ({_ORDER_SQL}) AS rn
        FROM events)
    SELECT a.user_id, a.event_id,
           ROUND(SUM(POW(0.5, (a.rn - b.rn)/10.0) * b.value)
                 / SUM(POW(0.5, (a.rn - b.rn)/10.0)), 4) AS ewm
    FROM r a JOIN r b ON a.user_id = b.user_id AND b.rn <= a.rn
    GROUP BY a.user_id, a.event_id
    """,
)
def q28_ewm_halflife10(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ts import ewm_mean

    e = _events(spark, sf_dir).select("user_id", "event_id", "ts_us", "value")
    out = ewm_mean(
        e, "value", halflife=10.0, partition_cols=["user_id"], order_cols=["ts_us", "event_id"]
    )
    return out.select("user_id", "event_id", F.round("ewm", 4).alias("ewm"))


# --------------------------------------------------------------------------
# q54 — funnel analysis: per user, the ordered view → click → purchase
#        progression (first click after first view, first purchase after
#        that click), counted per funnel stage.
# --------------------------------------------------------------------------
@register(
    "q54_funnel",
    oracle="""
    WITH v AS (SELECT user_id, MIN(epoch_us(ts)) AS t_view
               FROM events WHERE event_type = 'view' GROUP BY user_id),
    c AS (SELECT e.user_id, MIN(epoch_us(e.ts)) AS t_click
          FROM events e JOIN v ON e.user_id = v.user_id
          WHERE e.event_type = 'click' AND epoch_us(e.ts) > v.t_view
          GROUP BY e.user_id),
    p AS (SELECT e.user_id, MIN(epoch_us(e.ts)) AS t_purchase
          FROM events e JOIN c ON e.user_id = c.user_id
          WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > c.t_click
          GROUP BY e.user_id)
    SELECT (SELECT COUNT(*) FROM v) AS n_viewed,
           (SELECT COUNT(*) FROM c) AS n_clicked_after_view,
           (SELECT COUNT(*) FROM p) AS n_purchased_after_click
    """,
)
def q54_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("t_view"))
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts_us") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("t_click"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts_us") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("t_purchase"))
    )
    return (
        v.agg(F.count("*").alias("n_viewed"))
        .crossJoin(c.agg(F.count("*").alias("n_clicked_after_view")))
        .crossJoin(p.agg(F.count("*").alias("n_purchased_after_click")))
    )


# --------------------------------------------------------------------------
# q55 — cohort retention: users grouped by first-activity day; distinct
#        active users per (cohort, day-offset) — the product-analytics
#        retention triangle.
# --------------------------------------------------------------------------
@register(
    "q55_cohort_retention",
    oracle="""
    WITH first_day AS (
        SELECT user_id, MIN(epoch_us(ts) // 86400000000) AS cohort_day
        FROM events GROUP BY user_id),
    activity AS (
        SELECT DISTINCT e.user_id, f.cohort_day,
               epoch_us(e.ts) // 86400000000 - f.cohort_day AS day_offset
        FROM events e JOIN first_day f ON e.user_id = f.user_id)
    SELECT cohort_day, day_offset, COUNT(*) AS n_active
    FROM activity GROUP BY cohort_day, day_offset
    """,
)
def q55_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir).withColumn("day", F.expr("ts_us DIV 86400000000"))
    first_day = e.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    activity = (
        e.join(first_day, "user_id")
        .select("user_id", "cohort_day", (F.col("day") - F.col("cohort_day")).alias("day_offset"))
        .distinct()
    )
    return activity.groupBy("cohort_day", "day_offset").agg(F.count("*").alias("n_active"))


# --------------------------------------------------------------------------
# q29 — keep-latest-per-key dedup: the catalog's optimize() kernel
#        (reference S4, pipelines/stock_prices_flow.py:121) as a query.
# --------------------------------------------------------------------------
@register(
    "q29_keep_latest_event",
    oracle=f"""
    SELECT user_id, event_type, event_id, value FROM (
        SELECT user_id, event_type, event_id, value,
               ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                  ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
        FROM events) t
    WHERE rn = 1
    """,
)
def q29_keep_latest_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    w = W.partitionBy("user_id", "event_type").orderBy(F.desc("ts_us"), F.desc("event_id"))
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", "event_id", "value")
    )


# --------------------------------------------------------------------------
# q62 — batch purchase attribution via the bucketized range join
#        (ops.range_join): every (purchase, click) pair where the click
#        happened in the 30 minutes before the purchase, same user. The
#        batch counterpart of streaming.purchase_attribution_stream, and
#        the D-gate exercise of the interval-join operator: time is
#        bucketed into gap-width bins so the plan is a uniform equi-join
#        on (user, bin) + exact range filter — never a per-key cross
#        product. Oracle is DuckDB's plain inequality join.
# --------------------------------------------------------------------------
@register(
    "q62_purchase_attribution",
    oracle="""
    WITH c AS (SELECT user_id, event_id AS click_id, epoch_us(ts) AS click_us
               FROM events WHERE event_type = 'click'),
    p AS (SELECT user_id, event_id AS purchase_id, epoch_us(ts) AS purchase_us
          FROM events WHERE event_type = 'purchase')
    SELECT p.user_id, p.purchase_id, p.purchase_us, c.click_id, c.click_us
    FROM p JOIN c ON p.user_id = c.user_id
    WHERE c.click_us >= p.purchase_us - 1800000000
      AND c.click_us <= p.purchase_us
    """,
)
def q62_purchase_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ops import range_join

    e = _events(spark, sf_dir)
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts_us").alias("purchase_us"),
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("click_id"),
        F.col("ts_us").alias("click_us"),
    )
    return range_join(
        purchases,
        clicks,
        on_left="purchase_us",
        on_right="click_us",
        lower=-1_800_000_000,
        upper=0,
        by=["user_id"],
    ).select("user_id", "purchase_id", "purchase_us", "click_id", "click_us")


# --------------------------------------------------------------------------
# q64 — LEFT-outer purchase attribution: q62's interval join with
#        how='left', so purchases with NO qualifying click survive
#        null-padded. Exercises the range_join outer path (surrogate-key
#        anti-join: null-safe, duplicate-safe) under the DuckDB oracle —
#        the oracle is a plain LEFT JOIN with the interval condition in
#        the ON clause.
# --------------------------------------------------------------------------
@register(
    "q64_purchase_attribution_left",
    oracle="""
    WITH c AS (SELECT user_id, event_id AS click_id, epoch_us(ts) AS click_us
               FROM events WHERE event_type = 'click'),
    p AS (SELECT user_id, event_id AS purchase_id, epoch_us(ts) AS purchase_us
          FROM events WHERE event_type = 'purchase')
    SELECT p.user_id, p.purchase_id, p.purchase_us, c.click_id, c.click_us
    FROM p LEFT JOIN c ON p.user_id = c.user_id
      AND c.click_us >= p.purchase_us - 1800000000
      AND c.click_us <= p.purchase_us
    """,
)
def q64_purchase_attribution_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ops import range_join

    e = _events(spark, sf_dir)
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts_us").alias("purchase_us"),
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("click_id"),
        F.col("ts_us").alias("click_us"),
    )
    return range_join(
        purchases,
        clicks,
        on_left="purchase_us",
        on_right="click_us",
        lower=-1_800_000_000,
        upper=0,
        by=["user_id"],
        how="left",
    ).select("user_id", "purchase_id", "purchase_us", "click_id", "click_us")


# --------------------------------------------------------------------------
# q63 — hourly rollup derived FROM the 5-minute rollup via
#        ts.cascade_rollup (continuous-aggregate cascade): sums/counts
#        are algebraic, so the hourly numbers come from 12 fine partials
#        per bucket instead of a raw re-scan — exactness proven by the
#        oracle aggregating the RAW events directly at 1 h. Exact-cents
#        integer sums end-to-end, so reuse is bit-identical.
# --------------------------------------------------------------------------
@register(
    "q63_hourly_rollup_cascade",
    oracle="""
    SELECT epoch_us(ts) // 3600000000 * 3600 AS bucket_start_s,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS DOUBLE)/100 AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def q63_hourly_rollup_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ts import cascade_rollup

    e = _events(spark, sf_dir)
    five_min = (
        e.groupBy(
            (F.expr("ts_us DIV 300000000") * 300).alias("bucket_start_s"),
            "event_type",
        ).agg(
            F.count("*").alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"),
        )
    )
    hourly = cascade_rollup(
        five_min,
        fine_bucket_col="bucket_start_s",
        coarse_seconds=3600,
        fine_seconds=300,
        group_cols=["event_type"],
        sum_cols=["cents"],
        count_col="n_events",
    )
    return hourly.select(
        "bucket_start_s",
        "event_type",
        "n_events",
        (F.col("cents").cast("double") / 100).alias("total_value"),
    )
