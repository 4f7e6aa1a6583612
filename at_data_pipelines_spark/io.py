"""Loaders for the driver-provided test tables.

All tables are single parquet files under ``{sf_dir}/{name}.parquet``.
The ``events`` table's ``ts`` column has shipped in several physical
parquet encodings over time (TIMESTAMP(NANOS), TIMESTAMP_NTZ(µs), raw
int64); we sniff the footer with pyarrow and normalize every variant to
the same three columns:

- ``ts_ns``  — int64 epoch nanoseconds,
- ``ts_us``  — epoch microseconds (DuckDB also truncates parquet
               ns-timestamps to µs on scan, so this is the value the
               oracle sees via ``epoch_us(ts)``), and
- ``ts``     — a microsecond TIMESTAMP (for humans and streaming APIs).

Doing time bucketing on ``ts_us`` integers instead of timestamps keeps every
derived value bit-identical to a DuckDB oracle using ``epoch_us(ts)`` and is
also the fastest path at scale (pure long arithmetic inside codegen; no
calendar logic per row).

NTZ wall-clocks are interpreted as UTC via ``timestampdiff(MICROSECOND,
TIMESTAMP_NTZ '1970-01-01', ts)`` — pure wall arithmetic, so the result is
independent of ``spark.sql.session.timeZone`` (the caller's timezone
setting is left untouched and results cannot depend on it).

One documented exception to "no session-conf mutation": legacy
TIMESTAMP(NANOS) parquet (the "ns" footer kind) is unreadable by Spark
without ``spark.sql.legacy.parquet.nanosAsLong=true``, which is a
session-level conf consulted at scan planning — there is no per-read
scoping for it. ``get_spark`` pins it at session build; the loaders set
it (idempotently) only when an ns-kind file is actually opened, so a
foreign session gains the ability to read such files at the cost of any
OTHER TIMESTAMP(NANOS) parquet in that session resolving as LongType
from then on. Timezone semantics are never touched.
"""

from __future__ import annotations

import glob
import os
import weakref

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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

#: tz-independent NTZ wall-clock -> epoch micros (wall treated as UTC)
NTZ_EPOCH_US = "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"


def events_ts_kind(path: str) -> str:
    """Sniff the physical type of the events ``ts`` column from the parquet
    footer (driver-side, one file): returns ``'long'`` (raw int64 nanos),
    ``'ns'`` (TIMESTAMP(NANOS) — Spark needs the nanosAsLong legacy conf),
    ``'ntz'`` (TIMESTAMP_NTZ, µs/ms) or ``'ltz'`` (UTC-adjusted TIMESTAMP)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    if os.path.isdir(path):
        files = sorted(glob.glob(os.path.join(path, "*.parquet")))
        if not files:
            raise FileNotFoundError(f"no parquet files under {path}")
        path = files[0]
    t = pq.read_schema(path).field("ts").type
    if pa.types.is_timestamp(t):
        if t.tz is not None:
            return "ltz"
        return "ns" if t.unit == "ns" else "ntz"
    if pa.types.is_integer(t):
        return "long"
    raise TypeError(f"unsupported events.ts physical type: {t}")


def _normalize_events_ts(df: DataFrame, kind: str) -> DataFrame:
    """Attach ``ts_ns``/``ts_us``/``ts`` given the sniffed physical kind.
    All derivations are pure arithmetic — no session-timezone dependence."""
    if kind in ("long", "ns"):
        df = df.withColumnRenamed("ts", "ts_ns")
        df = df.withColumn("ts_us", F.expr("ts_ns div 1000"))
    elif kind == "ntz":
        df = df.withColumn("ts_us", F.expr(NTZ_EPOCH_US)).drop("ts")
        df = df.withColumn("ts_ns", F.col("ts_us") * F.lit(1000))
    else:  # ltz: instant semantics, unix_micros is tz-independent
        df = df.withColumn("ts_us", F.unix_micros("ts")).drop("ts")
        df = df.withColumn("ts_ns", F.col("ts_us") * F.lit(1000))
    return df.withColumn("ts", F.timestamp_micros(F.col("ts_us")))


# r16 (guide §6, metadata only — NOT a result cache): building a fresh
# parquet reader costs a file listing + a driver footer read per call
# (130-220 ms measured over py4j on the r16 host), and every query builder
# re-pays it for every table on every run — 25 load_table calls across the
# 16 headline queries. The resolved *logical plan* is memoized per
# SparkSession (weak — a stopped session drops its entry) keyed on the
# file's (path, mtime, size), the same content-addressed-plan class as
# catalog._plan_memo: every action on the returned DataFrame still scans
# the parquet input in full, nothing row-shaped is ever stored.
_READER_MEMO: "weakref.WeakKeyDictionary[SparkSession, dict]" = (
    weakref.WeakKeyDictionary()
)


def _table_stamp(path: str) -> tuple:
    try:
        st = os.stat(path)
        return (st.st_mtime_ns, st.st_size)
    except OSError:
        return (-1, -1)


# r17 negative result, measured and NOT shipped: the driver test files are
# single-row-group parquet (unsplittable — every scan is one task), and
# guide §2.5's "repartition immediately after the read" was A/B'd as a
# load_table option (repartition(defaultParallelism) for files ≥ 256 KiB).
# It parallelized the scan-side compute but LOST across the board at sf0.1
# (headline total ~11.4 s → ~14 s; q01 0.50→0.76, q03 0.43→1.00,
# q28 0.68→2.13): with 32 cores and sub-second queries, the extra exchange
# is a stage barrier + AQE planning round per query that costs more than
# the single-task compute it spreads. At a real multi-file scale the scan
# splits by file/row-group anyway, so the rewrite has no production story
# either.


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = f"{sf_dir}/{name}.parquet"
    key = (path, _table_stamp(path))
    memo = _READER_MEMO.setdefault(spark, {})
    df = memo.get(key)
    if df is not None:
        return df
    if name == "events":
        kind = events_ts_kind(path)
        if kind == "ns":
            # must be set before the read resolves the schema; only needed
            # for legacy TIMESTAMP(NANOS) files, which Spark can't read
            # natively any other way
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = _normalize_events_ts(spark.read.parquet(path), kind)
    else:
        df = spark.read.parquet(path)
    memo[key] = df
    return df
