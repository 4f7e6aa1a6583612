"""Synthetic market-data fixtures (FIXTURES.md §B).

Deterministic (seeded) generator for the reference's input tables:
NYSE-like trading calendar, evolving ticker universe, geometric-random-walk
daily bars for stocks and the 5 factor ETFs. Sized for fast tests
(~50 tickers × 24 months) but the generator is O(rows) and seed-stable at
any size.
"""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession

BAR_COLS = ["open", "high", "low", "close", "volume", "trade_count", "vwap"]


def trading_calendar(start: dt.date, end: dt.date, holidays_per_year: int = 9) -> list[dt.date]:
    """Weekday calendar minus deterministic pseudo-holidays (reference S10:
    pandas_market_calendars NYSE — pipelines/calendar_flow.py:11-28)."""
    days = pd.bdate_range(start, end).date.tolist()
    out = []
    for d in days:
        # deterministic "holiday" pick: a fixed hash spread over the year
        key = (d.timetuple().tm_yday * 7919 + d.year * 104729) % 260
        if key >= holidays_per_year:
            out.append(d)
    return out


def generate_market(
    spark: SparkSession,
    n_tickers: int = 50,
    start: dt.date = dt.date(2022, 1, 3),
    end: dt.date = dt.date(2023, 12, 29),
    factors: list[str] | None = None,
    seed: int = 42,
) -> dict[str, DataFrame]:
    """Returns {'calendar', 'universe', 'stock_bars', 'etf_bars'} DataFrames."""
    factors = factors or sorted(["MTUM", "QUAL", "USMV", "VLUE", "SPY"])
    rng = np.random.default_rng(seed)
    cal = trading_calendar(start, end)
    n_days = len(cal)
    tickers = [f"T{i:03d}" for i in range(n_tickers)]

    def bars_for(names: list[str], vol: float) -> pd.DataFrame:
        frames = []
        for name in names:
            drift = rng.normal(0.0002, 0.0003)
            rets = rng.normal(drift, vol, n_days)
            close = 100 * np.exp(np.cumsum(rets))
            openp = close * (1 + rng.normal(0, vol / 2, n_days))
            high = np.maximum(openp, close) * (1 + np.abs(rng.normal(0, vol / 2, n_days)))
            low = np.minimum(openp, close) * (1 - np.abs(rng.normal(0, vol / 2, n_days)))
            volume = rng.integers(1e5, 5e6, n_days).astype(float)
            trade_count = np.floor(volume / rng.integers(5, 50, n_days)).astype(float)
            vwap = (high + low + close) / 3
            frames.append(
                pd.DataFrame(
                    {
                        "ticker": name,
                        "date": cal,
                        "open": np.round(openp, 2),
                        "high": np.round(high, 2),
                        "low": np.round(low, 2),
                        "close": np.round(close, 2),
                        "volume": volume,
                        "trade_count": trade_count,
                        "vwap": np.round(vwap, 2),
                    }
                )
            )
        return pd.concat(frames, ignore_index=True)

    stock_bars = bars_for(tickers, vol=0.02)
    etf_bars = bars_for(factors, vol=0.01)

    # evolving universe: ~90% of tickers active; a few membership changes
    active = set(tickers[: int(n_tickers * 0.9)])
    changes = {  # date index → (added, removed)
        n_days // 4: ({tickers[-1]}, {tickers[0]}),
        n_days // 2: ({tickers[-2]}, {tickers[1]}),
        3 * n_days // 4: ({tickers[0]}, {tickers[-1]}),
    }
    uni_rows = []
    for i, d in enumerate(cal):
        if i in changes:
            add, rem = changes[i]
            active |= add
            active -= rem
        for t in sorted(active):
            uni_rows.append((d, d.year, t))
    universe = pd.DataFrame(uni_rows, columns=["date", "year", "ticker"])

    calendar = pd.DataFrame({"date": cal})
    return {
        "calendar": spark.createDataFrame(calendar),
        "universe": spark.createDataFrame(universe),
        "stock_bars": spark.createDataFrame(stock_bars),
        "etf_bars": spark.createDataFrame(etf_bars),
    }
