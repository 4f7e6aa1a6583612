"""Rolling pairwise covariance of factor returns (SURVEY §2.10 U2 / W8).

Reference: pandas ``.rolling(252, min_periods=252).cov()`` on the wide
5-factor frame (pipelines/factor_covariances_flow.py:11-29), unpivoted to
(date, factor_1, factor_2, covariance).

The factor panel is intrinsically tiny (n_dates × 5), so the kernel runs
as a single-group ``applyInPandas`` (stays in the Spark job for
composability; the data never justifies a shuffle). For a wide-asset
version (hundreds of columns) the scalable shape is the self-join +
``covar_samp`` window per pair — provided by ``rolling_cov_pairs_sql``.
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window as W


def rolling_pairwise_cov(
    wide: DataFrame,
    factor_cols: Sequence[str],
    date_col: str = "date",
    window: int = 252,
    min_periods: int | None = None,
) -> DataFrame:
    """Long (date, factor_1, factor_2, covariance) rolling covariances."""
    mp = window if min_periods is None else min_periods
    factor_cols = list(factor_cols)
    schema = T.StructType(
        [
            wide.schema[date_col],
            T.StructField("factor_1", T.StringType()),
            T.StructField("factor_2", T.StringType()),
            T.StructField("covariance", T.DoubleType()),
        ]
    )

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(date_col).set_index(date_col)
        cov = pdf[factor_cols].rolling(window, min_periods=mp).cov()
        cov = cov.stack().reset_index()
        cov.columns = [date_col, "factor_1", "factor_2", "covariance"]
        return cov

    # single logical group — the frame is (n_dates × n_factors), tiny
    return (
        wide.withColumn("_g", F.lit(1))
        .groupBy("_g")
        .applyInPandas(lambda _, pdf: fn(pdf.drop(columns="_g")), schema)
    )


def rolling_cov_pairs_sql(
    long_df: DataFrame,
    entity_col: str,
    date_col: str,
    value_col: str,
    window: int = 252,
) -> DataFrame:
    """Scalable alternative: all entity pairs via self-join on date, then
    ``covar_samp`` over a bounded row window per pair — shuffle on the
    pair key, no wide frame ever materialized."""
    a = long_df.select(
        F.col(date_col), F.col(entity_col).alias("factor_1"), F.col(value_col).alias("x")
    )
    b = long_df.select(
        F.col(date_col), F.col(entity_col).alias("factor_2"), F.col(value_col).alias("y")
    )
    pairs = a.join(b, date_col)
    w = (
        W.partitionBy("factor_1", "factor_2")
        .orderBy(date_col)
        .rowsBetween(-(window - 1), 0)
    )
    guarded = F.when(
        F.count(F.lit(1)).over(w) >= window, F.covar_samp("x", "y").over(w)
    )
    return pairs.select(date_col, "factor_1", "factor_2", guarded.alias("covariance"))
