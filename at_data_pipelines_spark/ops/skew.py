"""Skew mitigation operators.

AQE's skew-join handling (`spark.sql.adaptive.skewJoin.enabled`, on in our
session factory) covers sort-merge joins automatically; these helpers cover
the cases AQE can't:

- **salted_join** — hot-key equi-join against a broadcastable-but-not-tiny
  dimension: the big side gets a deterministic salt, the small side is
  replicated per salt value, so one hot key spreads over ``salt_n``
  partitions.
- **two_phase_agg** — high-cardinality aggregation whose groups are few but
  enormous (so even map-side partial aggregation leaves one reducer hot):
  aggregate on (key, salt) first, then merge per key. Only associative
  aggregates apply.

Both use deterministic salts (hash of a high-entropy column, or a
row-local spread) — results are reproducible, unlike ``F.rand()``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, entropy_col: str | Column, salt_n: int, out: str = "_salt") -> DataFrame:
    """Deterministic salt in [0, salt_n) from a high-entropy column."""
    c = F.col(entropy_col) if isinstance(entropy_col, str) else entropy_col
    return df.withColumn(out, F.pmod(F.hash(c), F.lit(salt_n)))


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str] | str,
    entropy_col: str,
    salt_n: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``big`` has hot keys: salt the big side, replicate
    the small side ``salt_n``×, join on (keys + salt). The small side must
    tolerate ``salt_n×`` inflation (dimension-sized)."""
    on = [on] if isinstance(on, str) else list(on)
    b = with_salt(big, entropy_col, salt_n)
    salts = big.sparkSession.range(salt_n).select(F.col("id").cast("int").alias("_salt"))
    s = small.crossJoin(F.broadcast(salts))
    return b.join(s, on + ["_salt"], how).drop("_salt")


def two_phase_agg(
    df: DataFrame,
    keys: list[str],
    entropy_col: str,
    partial_aggs: list[Column],
    final_aggs: list[Column],
    salt_n: int = 16,
) -> DataFrame:
    """Aggregate in two hops: groupBy(keys + salt) with ``partial_aggs``
    (aliases consumed by ``final_aggs``), then groupBy(keys) to merge.

    Example (mean): partial = [sum(x) as s, count(x) as c];
    final = [(sum(s)/sum(c)).alias('mean_x')].
    """
    salted = with_salt(df, entropy_col, salt_n)
    partial = salted.groupBy(*keys, "_salt").agg(*partial_aggs)
    return partial.groupBy(*keys).agg(*final_aggs)
