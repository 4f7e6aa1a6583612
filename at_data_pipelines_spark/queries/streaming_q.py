"""Streaming queries in the oracle gate.

These run a real Structured Streaming plan (availableNow trigger, memory
sink) to completion inside the query callable, then return the result as
a DataFrame — so the STREAMING path itself is DuckDB-oracle-checked, not
just its batch equivalent.
"""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import register


def _drain_to_memory(agg, name_prefix: str):
    """Run an availableNow stream to completion into a memory sink and
    return the result table. FAILS LOUDLY on timeout — a partial drain
    would otherwise flow into the oracle compare as a silently wrong
    (or empty) result. Uses a FIXED sink name per query and drops the
    previous run's temp view first, so repeated invocations (gate +
    pytest parametrize + bench) don't pin one full result copy per run
    in driver memory for the session's lifetime."""
    spark = agg.sparkSession
    name = f"{name_prefix}_out"
    spark.catalog.dropTempView(name)  # no-op if absent
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError(f"{name_prefix}: availableNow drain exceeded 300s")
    return spark.table(name)


@register(
    "q60_stream_tumbling_5min",
    oracle="""
    SELECT epoch_us(ts) // 300000000 * 300 AS bucket_start_s,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS DOUBLE)/100 AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def q60_stream_tumbling_5min(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming import read_events_stream

    stream = read_events_stream(spark, f"{sf_dir}/events.parquet")
    # exact-cents sum variant of the streaming aggregation for oracle parity
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "5 minutes").alias("win"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"),
        )
    )
    out = _drain_to_memory(agg, "q60")
    # unix_timestamp of an instant is timezone-independent
    return out.select(
        F.unix_timestamp(F.col("win.start")).alias("bucket_start_s"),
        "event_type",
        "n_events",
        (F.col("cents").cast("double") / 100).alias("total_value"),
    )


@register(
    "q61_stream_sessionization",
    oracle="""
    WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us,
                      CAST(ROUND(value*100) AS BIGINT) AS cents FROM events),
    o AS (SELECT user_id, ts_us, cents,
                 CASE WHEN ts_us - LAG(ts_us) OVER (PARTITION BY user_id
                                                    ORDER BY ts_us) > 1800000000
                      THEN 1 ELSE 0 END AS brk
          FROM e),
    s AS (SELECT user_id, ts_us, cents,
                 SUM(brk) OVER (PARTITION BY user_id ORDER BY ts_us
                                ROWS UNBOUNDED PRECEDING) AS sid
          FROM o)
    SELECT user_id,
           MIN(ts_us) AS session_start_us,
           MAX(ts_us) + 1800000000 AS session_end_us,
           COUNT(*) AS n_events,
           CAST(SUM(cents) AS DOUBLE)/100 AS total_value
    FROM s GROUP BY user_id, sid
    """,
)
def q61_stream_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization THROUGH a real streaming plan: ``session_window``
    (30-minute inactivity gap) with a watermark, availableNow to
    completion, memory sink. Spark's session end = last event + gap,
    mirrored in the oracle; boundary semantics verified exact against
    the batch lag+cumsum construction (q25) on µs-resolution data.
    Exact-cents sums per the registry determinism policy."""
    from ..streaming import read_events_stream

    stream = read_events_stream(spark, f"{sf_dir}/events.parquet")
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", "30 minutes").alias("win"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"),
        )
    )
    out = _drain_to_memory(agg, "q61")
    return out.select(
        "user_id",
        F.unix_micros(F.col("win.start")).alias("session_start_us"),
        F.unix_micros(F.col("win.end")).alias("session_end_us"),
        "n_events",
        (F.col("cents").cast("double") / 100).alias("total_value"),
    )
