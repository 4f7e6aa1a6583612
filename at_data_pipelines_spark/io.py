"""Loaders for the driver-provided test tables.

All tables are single parquet files under ``{sf_dir}/{name}.parquet``.
The ``events`` table is written with TIMESTAMP(NANOS), which Spark cannot
read natively; we read it via ``spark.sql.legacy.parquet.nanosAsLong`` and
expose BOTH:

- ``ts_ns``  — the raw int64 epoch nanoseconds,
- ``ts_us``  — epoch microseconds (``ts_ns div 1000``; DuckDB also truncates
               parquet ns-timestamps to µs on scan, so this is the value the
               oracle sees via ``epoch_us(ts)``), and
- ``ts``     — a microsecond TIMESTAMP (for humans and streaming APIs).

Doing time bucketing on ``ts_us`` integers instead of timestamps keeps every
derived value bit-identical to a DuckDB oracle using ``epoch_us(ts)`` and is
also the fastest path at scale (pure long arithmetic inside codegen; no
calendar logic per row).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = f"{sf_dir}/{name}.parquet"
    if name == "events":
        # must be set before the read resolves the schema; harmless if set
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, T.LongType):
            df = df.withColumnRenamed("ts", "ts_ns")
        else:
            # TIMESTAMP or TIMESTAMP_NTZ (isAdjustedToUTC=false parquet) —
            # derive nanos. NTZ wall-clock is read as UTC, matching how a
            # DuckDB oracle's epoch_us(ts) treats the same naive value.
            col = F.col("ts")
            if isinstance(ts_type, T.TimestampNTZType):
                spark.conf.set("spark.sql.session.timeZone", "UTC")
                col = col.cast("timestamp")
            df = df.withColumn("ts_ns", F.unix_micros(col) * F.lit(1000)).drop("ts")
        return df.withColumn("ts_us", F.expr("ts_ns div 1000")).withColumn(
            "ts", F.timestamp_micros(F.col("ts_us"))
        )
    return spark.read.parquet(path)
