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
