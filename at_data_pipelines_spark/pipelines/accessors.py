"""Lakehouse query accessors — the reference's data-access layer
(pipelines/utils/data.py) rebuilt 1:1 on Spark DataFrames.

Every accessor is the same lazy shape as its Polars original: scan →
join → range filter → project → sort; Catalyst pushes the date range and
projection into the parquet scan, and the `year` partition filter is
derived from the date range so partition pruning fires (SURVEY §7.4's
derive-year-from-date helper).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..catalog import Lakehouse


def _between(df: DataFrame, start: dt.date, end: dt.date) -> DataFrame:
    """Inclusive date-range filter + derived year predicate for partition
    pruning (reference `is_between`, pipelines/utils/data.py:14)."""
    out = df.filter(F.col("date").between(F.lit(start), F.lit(end)))
    if "year" in df.columns:
        out = out.filter(F.col("year").between(start.year, end.year))
    return out


def get_universe_returns(lake: Lakehouse, start: dt.date, end: dt.date) -> DataFrame:
    """pipelines/utils/data.py:21-29 — universe ⟕ stock_returns (J1)."""
    uni = lake.table("universe")
    ret = lake.table("stock_returns").select("ticker", "date", "return")
    return (
        _between(uni, start, end)
        .join(ret, ["date", "ticker"], "left")
        .select("date", "ticker", "return")
        .orderBy("date", "ticker")
    )


def get_alphas(lake: Lakehouse, start: dt.date, end: dt.date) -> DataFrame:
    """pipelines/utils/data.py:53-64 — universe ⟕ alphas, null-filtered
    (J2; the left-join + isNotNull the planner folds to inner)."""
    uni = lake.table("universe")
    al = lake.table("alphas").select("ticker", "date", "alpha")
    return (
        _between(uni, start, end)
        .join(al, ["date", "ticker"], "left")
        .filter(F.col("alpha").isNotNull())
        .select("date", "ticker", "alpha")
        .orderBy("date", "ticker")
    )


def get_benchmark_weights(lake: Lakehouse, start: dt.date, end: dt.date) -> DataFrame:
    """pipelines/utils/data.py:67-77 (J3)."""
    uni = lake.table("universe")
    bw = lake.table("benchmark_weights").select("ticker", "date", "weight")
    return (
        _between(uni, start, end)
        .join(bw, ["date", "ticker"], "left")
        .select("date", "ticker", "weight")
        .orderBy("date", "ticker")
    )


def get_factor_loadings(lake: Lakehouse, start: dt.date, end: dt.date) -> DataFrame:
    """pipelines/utils/data.py:86-99 — null-filtered (J4)."""
    uni = lake.table("universe")
    fl = lake.table("factor_loadings").select("ticker", "date", "factor", "loading")
    return (
        _between(uni, start, end)
        .join(fl, ["date", "ticker"], "left")
        .filter(F.col("loading").isNotNull())
        .select("date", "ticker", "factor", "loading")
        .orderBy("date", "ticker", "factor")
    )


def get_idio_vol(lake: Lakehouse, start: dt.date, end: dt.date) -> DataFrame:
    """pipelines/utils/data.py:109-121 — null-filtered (J5)."""
    uni = lake.table("universe")
    iv = lake.table("idio_vol").select("ticker", "date", "idio_vol")
    return (
        _between(uni, start, end)
        .join(iv, ["date", "ticker"], "left")
        .filter(F.col("idio_vol").isNotNull())
        .select("date", "ticker", "idio_vol")
        .orderBy("date", "ticker")
    )


def get_prices(lake: Lakehouse, start: dt.date, end: dt.date) -> DataFrame:
    """pipelines/utils/data.py:131-142 — universe ⟕ stock_prices (J6)."""
    uni = lake.table("universe")
    pr = lake.table("stock_prices").drop("year")
    return (
        _between(uni, start, end)
        .join(pr, ["date", "ticker"], "left")
        .orderBy("date", "ticker")
    )


def get_factor_covariances(lake: Lakehouse, start: dt.date, end: dt.date) -> DataFrame:
    """pipelines/utils/data.py factor-covariance accessor."""
    fc = lake.table("factor_covariances")
    return _between(fc, start, end).orderBy("date", "factor_1", "factor_2")


def get_last_market_dates(lake: Lakehouse, n: int) -> list[dt.date]:
    """pipelines/utils/calendar.py:15-19 — last n trading dates
    (sort desc + head → TakeOrderedAndProject)."""
    rows = lake.table("calendar").orderBy(F.desc("date")).limit(n).collect()
    return sorted(r.date for r in rows)
