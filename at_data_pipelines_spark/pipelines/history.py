"""Intraday history flows (SURVEY §2.1 S6-S7, §1.3 stock_history /
etf_history / portfolio_history).

Reference: per-market-date minute bars over the EXTENDED session
04:00–20:00 America/New_York, stored as UTC timestamps
(pipelines/history_flow.py:28-95); portfolio equity curve from epoch
seconds → UTC (pipelines/portfolio_history_flow.py:15-41, F8).

Timezone policy (SURVEY §7.5.8): storage and Spark session are UTC;
New-York session boundaries are computed with zoneinfo on the driver
(DST-correct) and shipped as UTC instants — executors never do calendar
math.
"""

from __future__ import annotations

import datetime as dt
from zoneinfo import ZoneInfo

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..catalog import Lakehouse

NY = ZoneInfo("America/New_York")
UTC = dt.timezone.utc

HISTORY_SCHEMA = T.StructType(
    [
        T.StructField("ticker", T.StringType()),
        T.StructField("timestamp", T.TimestampType()),
        T.StructField("open", T.DoubleType()),
        T.StructField("high", T.DoubleType()),
        T.StructField("low", T.DoubleType()),
        T.StructField("close", T.DoubleType()),
        T.StructField("volume", T.DoubleType()),
        T.StructField("trade_count", T.DoubleType()),
        T.StructField("vwap", T.DoubleType()),
    ]
)

PORTFOLIO_HISTORY_SCHEMA = T.StructType(
    [
        T.StructField("timestamp", T.TimestampType()),
        T.StructField("equity", T.DoubleType()),
    ]
)


def extended_hours_utc(d: dt.date) -> tuple[dt.datetime, dt.datetime]:
    """04:00–20:00 America/New_York for market date ``d``, as UTC instants
    (reference pipelines/history_flow.py:29-33). DST-correct."""
    start = dt.datetime(d.year, d.month, d.day, 4, 0, tzinfo=NY)
    end = dt.datetime(d.year, d.month, d.day, 20, 0, tzinfo=NY)
    return start.astimezone(UTC), end.astimezone(UTC)


def create_history_tables(lake: Lakehouse) -> None:
    # reference declares no partition keys (pipelines/history_flow.py:79-95);
    # at 100 TB the natural extension is partitionBy(session_date)
    lake.create("stock_history", HISTORY_SCHEMA, [], ["timestamp", "ticker"])
    lake.create("etf_history", HISTORY_SCHEMA, [], ["timestamp", "ticker"])
    lake.create("portfolio_history", PORTFOLIO_HISTORY_SCHEMA, [], ["timestamp"])


def history_flow(
    lake: Lakehouse, bars: DataFrame, market_date: dt.date, table: str = "stock_history"
) -> None:
    """Upsert one market date of minute bars, clipped to the extended
    session (bars arrive in UTC; the clip bounds are UTC instants)."""
    start, end = extended_hours_utc(market_date)
    # both bounds INCLUSIVE: the reference's Alpaca StockBarsRequest
    # start/end are inclusive, so a bar stamped exactly 20:00:00 NY is kept
    clipped = bars.filter(
        (F.col("timestamp") >= F.lit(start.replace(tzinfo=None)))
        & (F.col("timestamp") <= F.lit(end.replace(tzinfo=None)))
    )
    lake.upsert(table, clipped)


def portfolio_history_flow(lake: Lakehouse, equity_epoch_s: DataFrame) -> None:
    """Equity curve from (epoch_s long, equity double) rows — reference F8
    ``from_epoch(...).convert_time_zone('UTC')`` becomes
    ``timestamp_seconds`` under a UTC session."""
    df = equity_epoch_s.select(
        F.timestamp_seconds(F.col("epoch_s")).alias("timestamp"), "equity"
    )
    lake.upsert("portfolio_history", df)
