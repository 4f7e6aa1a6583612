"""REST bar sources (SURVEY §2.1 S5-S8).

The reference pulls daily/minute bars and account data from the Alpaca
REST API on the driver, then frames them
(pipelines/stock_prices_flow.py:26-90, pipelines/history_flow.py:28-71,
pipelines/portfolio_history_flow.py:15-41, pipelines/utils/alpaca.py:8-45).

This module reproduces the *engine-relevant* behaviors with the network
client injected (no external service in this environment):

- **year-batched fetching** to respect API page limits (S5) — each batch
  becomes one partition-aligned insert;
- **typed empty frames** when the API returns nothing (reference
  pipelines/stock_prices_flow.py:42-55) so downstream schemas never break;
- **driver-fetch → createDataFrame** hand-off (Arrow) — the driver only
  holds one batch at a time; Spark distributes immediately.

A real deployment passes a client callable that wraps the actual HTTP SDK.
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

BAR_SCHEMA = T.StructType(
    [
        T.StructField("ticker", T.StringType()),
        T.StructField("date", T.DateType()),
        T.StructField("open", T.DoubleType()),
        T.StructField("high", T.DoubleType()),
        T.StructField("low", T.DoubleType()),
        T.StructField("close", T.DoubleType()),
        T.StructField("volume", T.DoubleType()),
        T.StructField("trade_count", T.DoubleType()),
        T.StructField("vwap", T.DoubleType()),
    ]
)

# client contract: (tickers, start, end) -> pandas frame with BAR_SCHEMA cols
BarClient = Callable[[list[str], dt.date, dt.date], pd.DataFrame]


def empty_bars(spark: SparkSession) -> DataFrame:
    """Typed empty frame — the reference's empty-API-response fallback."""
    return spark.createDataFrame([], BAR_SCHEMA)


def _year_ranges(start: dt.date, end: dt.date) -> Iterator[tuple[dt.date, dt.date]]:
    y = start
    while y <= end:
        y_end = min(dt.date(y.year, 12, 31), end)
        yield y, y_end
        y = dt.date(y.year + 1, 1, 1)


def fetch_daily_bars_batched(
    spark: SparkSession,
    client: BarClient,
    tickers: list[str],
    start: dt.date,
    end: dt.date,
) -> DataFrame:
    """Fetch bars one calendar year at a time (reference
    pipelines/stock_prices_flow.py:76-90) and union into one DataFrame.
    Each year lands in its own hive partition on write, so ingestion
    parallelism and storage layout line up."""
    out: DataFrame | None = None
    for s, e in _year_ranges(start, end):
        pdf = client(tickers, s, e)
        if pdf is None or len(pdf) == 0:
            continue
        batch = spark.createDataFrame(pdf[[f.name for f in BAR_SCHEMA.fields]], BAR_SCHEMA)
        out = batch if out is None else out.unionByName(batch)
    return out if out is not None else empty_bars(spark)


ORDER_SCHEMA = T.StructType(
    [
        T.StructField("order_id", T.StringType()),
        T.StructField("ticker", T.StringType()),
        T.StructField("side", T.StringType()),
        T.StructField("filled_at", T.TimestampType()),
        T.StructField("filled_qty", T.DoubleType()),
        T.StructField("filled_avg_price", T.DoubleType()),
    ]
)


def filled_orders_frame(
    spark: SparkSession, raw_orders: list[dict], since: dt.datetime | None = None
) -> DataFrame:
    """Client-side filter/projection of raw order dicts to filled orders
    (reference S8, pipelines/utils/alpaca.py:8-45: fetch → keep filled →
    project to a narrow dict list → frame)."""
    rows = []
    for o in raw_orders:
        if o.get("status") != "filled" or o.get("filled_at") is None:
            continue
        if since is not None and o["filled_at"] < since:
            continue
        rows.append(
            (
                str(o["id"]),
                o["symbol"],
                o["side"],
                o["filled_at"],
                float(o["filled_qty"]),
                float(o["filled_avg_price"]),
            )
        )
    return spark.createDataFrame(rows, ORDER_SCHEMA)


class RestBarSource:
    """Thin stateful wrapper holding a client + universe, mirroring the
    reference's task signatures."""

    def __init__(self, spark: SparkSession, client: BarClient):
        self.spark = spark
        self.client = client

    def daily_bars(self, tickers: list[str], start: dt.date, end: dt.date) -> DataFrame:
        return fetch_daily_bars_batched(self.spark, self.client, tickers, start, end)
