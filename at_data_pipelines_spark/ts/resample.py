"""Bar resampling: minute bars → coarser OHLCV bars (5min/1h/1d).

The reference stores raw minute bars (``pipelines/history_flow.py``) and
daily bars separately; any real consumer resamples between them. One
groupBy per (ticker, bucket) with ordered-extremum aggregates:

- open/close via ``min_by``/``max_by`` on the timestamp — JVM ordered
  aggregates, no window pass, no sort;
- high/low/volume/trade_count as plain min/max/sum;
- vwap recomputed exactly as Σ(vwap·volume)/Σvolume over the bucket
  (a mean of vwaps would be wrong whenever volume varies).

Scale: a single hash shuffle on (ticker, bucket); map-side partial
aggregation does most of the reduction since input rows per bucket are
contiguous within scanned files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def align_to_calendar(
    df: DataFrame,
    calendar: DataFrame,
    value_cols: list[str],
    ticker_col: str = "ticker",
    date_col: str = "date",
    max_ffill_days: int | None = None,
) -> DataFrame:
    """Reindex a panel onto the trading calendar with forward-fill —
    Polars' ``upsample``/``forward_fill`` idiom on the reference's own
    calendar table: every (ticker, trading day) appears exactly once,
    missing observations carry the last value forward, and
    ``max_ffill_days`` bounds staleness (a halted ticker stops filling
    after that many calendar days — null beyond).

    Shape: the grid is tickers × calendar (the exact output size —
    calendar broadcast under the cross join), one left join on the panel
    grain, then per-ticker ordered ``last(ignorenulls)`` windows. One
    hash shuffle on ticker; fill never crosses tickers.
    """
    from pyspark.sql.window import Window as W

    tickers = df.select(ticker_col).distinct()
    cal = calendar.select(F.col(date_col))
    grid = tickers.crossJoin(F.broadcast(cal))
    joined = grid.join(df, [ticker_col, date_col], "left")
    w = W.partitionBy(ticker_col).orderBy(date_col).rowsBetween(W.unboundedPreceding, 0)
    cols = [F.col(ticker_col), F.col(date_col)]
    for c in value_cols:
        filled = F.last(F.col(c), ignorenulls=True).over(w)
        if max_ffill_days is not None:
            # staleness is measured per column: value columns may have
            # different null patterns, so each gets its own last-observed
            # date (all windows share one partitioning — still one shuffle)
            obs_date = F.last(
                F.when(F.col(c).isNotNull(), F.col(date_col)), ignorenulls=True
            ).over(w)
            filled = F.when(
                F.datediff(F.col(date_col), obs_date) <= max_ffill_days, filled
            )
        cols.append(filled.alias(c))
    return joined.select(*cols)


def adjust_bars(
    bars: DataFrame,
    actions: DataFrame,
    ts_col: str = "timestamp",
    ticker_col: str = "ticker",
    price_cols: tuple[str, ...] = ("open", "high", "low", "close", "vwap"),
    volume_col: str = "volume",
) -> DataFrame:
    """Back-adjust raw bars for splits/dividends — what the reference
    delegates to its API's ``Adjustment.ALL`` flag
    (``pipelines/stock_prices_flow.py:36``), computed here from a raw
    feed plus an actions table ``(ticker, effective_ts, factor)``: every
    bar BEFORE an action's effective time has its prices multiplied (and
    volume divided) by the product of all later factors, so the latest
    bar is always unadjusted — the standard back-adjustment convention.

    Shape: actions are dimension-sized (a few rows per ticker ever), so
    the cumulative factor attaches via a broadcast join + groupBy over
    matching actions — no window over the bar table, one shuffle on the
    bar grain for the aggregate-free path (the join is broadcast, the
    product aggregation groups on the BAR key). Factors multiply in
    log-space via ``exp(sum(log(...)))`` — exact to fp rounding, which
    adjustment factors inherently carry anyway.
    """
    acts = actions.select(
        F.col(ticker_col).alias("_a_ticker"),
        F.col("effective_ts").alias("_eff"),
        F.col("factor").alias("_factor"),
    )
    joined = bars.join(
        F.broadcast(acts),
        (F.col(ticker_col) == F.col("_a_ticker")) & (F.col("_eff") > F.col(ts_col)),
        "left",
    )
    group_cols = [F.col(c) for c in bars.columns]
    adj = (
        joined.groupBy(*group_cols)
        .agg(
            F.coalesce(
                F.exp(F.sum(F.log(F.col("_factor")))), F.lit(1.0)
            ).alias("_adj")
        )
    )
    out_cols = []
    for c in bars.columns:
        if c in price_cols:
            out_cols.append((F.col(c) * F.col("_adj")).alias(c))
        elif c == volume_col:
            out_cols.append((F.col(c) / F.col("_adj")).alias(c))
        else:
            out_cols.append(F.col(c))
    return adj.select(*out_cols)


def resample_bars(
    bars: DataFrame,
    interval: str = "5 minutes",
    ts_col: str = "timestamp",
    ticker_col: str = "ticker",
) -> DataFrame:
    """OHLCV resample of a bar table with columns
    (ticker, timestamp, open, high, low, close, volume, trade_count,
    vwap) into ``interval`` buckets. Empty buckets simply don't appear
    (no artificial fill rows — forward-filling is a consumer policy).
    """
    w = F.window(F.col(ts_col), interval)
    notional = F.col("vwap") * F.col("volume")
    out = (
        bars.groupBy(F.col(ticker_col), w.alias("win"))
        .agg(
            F.min_by("open", ts_col).alias("open"),
            F.max("high").alias("high"),
            F.min("low").alias("low"),
            F.max_by("close", ts_col).alias("close"),
            F.sum("volume").alias("volume"),
            F.sum("trade_count").alias("trade_count"),
            F.sum(notional).alias("_notional"),
        )
        .select(
            ticker_col,
            F.col("win.start").alias(ts_col),
            "open",
            "high",
            "low",
            "close",
            "volume",
            "trade_count",
            # volume-weighted vwap; 0-volume buckets fall back to close
            F.when(
                F.col("volume") > 0, F.col("_notional") / F.col("volume")
            ).otherwise(F.col("close")).alias("vwap"),
        )
    )
    return out


def cascade_rollup(
    fine: DataFrame,
    fine_bucket_col: str,
    coarse_seconds: int,
    fine_seconds: int,
    group_cols: list[str],
    sum_cols: list[str],
    count_col: str | None = None,
) -> DataFrame:
    """Derive a coarser time-bucket aggregate FROM a finer one — the
    continuous-aggregate cascade (TimescaleDB hypertable rollups,
    Druid/Pinot star-tree levels): hourly = sum of twelve 5-minute
    partials, daily = sum of 24 hourlies. Sums and counts are algebraic,
    so reusing partials is exact while scanning ``coarse/fine``× fewer
    rows than re-aggregating raw events — at 100 TB the raw scan is the
    whole cost, and a maintained fine rollup (e.g. the streaming
    ``windowed_aggregation`` → lakehouse sink) makes every coarser
    granularity nearly free.

    ``fine_bucket_col`` holds the fine bucket start in epoch SECONDS
    (int); the output carries the coarse bucket start in the same
    currency. ``count_col`` names a fine-level event count to roll up
    via SUM (a COUNT of counts would be wrong).
    """
    if coarse_seconds % fine_seconds != 0:
        raise ValueError(
            f"coarse bucket ({coarse_seconds}s) must be a multiple of the "
            f"fine bucket ({fine_seconds}s) for exact partial-aggregate reuse"
        )
    coarse = (
        F.col(fine_bucket_col)
        - F.pmod(F.col(fine_bucket_col), F.lit(coarse_seconds))
    ).alias("bucket_start_s")
    aggs = [F.sum(c).alias(c) for c in sum_cols]
    if count_col is not None:
        aggs.append(F.sum(count_col).alias(count_col))
    return fine.groupBy(coarse, *group_cols).agg(*aggs)
