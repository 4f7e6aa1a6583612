"""Distributed global ranking — the scale path for total-order window
functions (``row_number``/``percent_rank``/``ntile`` over ``ORDER BY``
with no ``PARTITION BY``).

A bare ``Window.orderBy(...)`` plans a single sorted partition: the whole
table serializes through one task — the classic 100 TB killer. The
two-pass shape here keeps every stage distributed:

1. ``repartitionByRange`` on the order keys → P range-sorted partitions
   (Spark samples the keys for balanced bounds — its built-in answer to
   order skew);
2. local ``row_number`` within each range partition (window partitioned
   by the materialized partition id — P parallel groups, never one);
3. per-partition row counts → P-row prefix-sum (driver-scale metadata,
   the same intrinsically-tiny pattern as partition-value listings) →
   broadcast-joined offsets;
4. ``global_rank = offset + local_rank``; ``percent_rank`` and ``ntile``
   derive from (global_rank, total) closed-form, matching Spark/ANSI
   semantics exactly.

Equivalent output to the single-partition window whenever the order keys
are a total order (add a unique tiebreak column — same requirement any
deterministic global rank has).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def with_global_rank(
    df: DataFrame,
    order_cols: list[str],
    rank_col: str = "global_rank",
    total_col: str = "_total",
    num_partitions: int | None = None,
) -> DataFrame:
    """Attach a dense 1-based global rank over ``order_cols`` (which must
    form a total order) plus the table row count, without a global
    single-partition sort. Extra column ``total_col`` carries N for
    downstream percent_rank/ntile math; callers drop it.
    """
    parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = df.repartitionByRange(parts, *[F.col(c) for c in order_cols]).withColumn(
        "_pid", F.spark_partition_id()
    )
    local = ranged.withColumn(
        "_lrank", F.row_number().over(W.partitionBy("_pid").orderBy(*order_cols))
    )
    # P-row metadata: per-partition counts → exclusive prefix sum + total.
    # The window below runs on P rows (not data rows) — intrinsically tiny.
    counts = local.groupBy("_pid").agg(F.count("*").alias("_n"))
    wc = W.orderBy("_pid").rowsBetween(W.unboundedPreceding, -1)
    offsets = counts.select(
        "_pid",
        F.coalesce(F.sum("_n").over(wc), F.lit(0)).alias("_offset"),
        F.sum("_n").over(W.orderBy("_pid").rowsBetween(W.unboundedPreceding, W.unboundedFollowing)).alias(total_col),
    )
    return (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn(rank_col, (F.col("_offset") + F.col("_lrank")).cast("long"))
        .drop("_pid", "_lrank", "_offset")
    )


def percent_rank_from(rank: Column, total: Column) -> Column:
    """ANSI percent_rank from a precomputed global rank: (r−1)/(N−1),
    0.0 for a single-row table."""
    return F.when(total > 1, (rank - 1).cast("double") / (total - 1)).otherwise(F.lit(0.0))


def ntile_from(rank: Column, total: Column, n: int) -> Column:
    """ANSI NTILE(n) from a precomputed global rank: the first N mod n
    buckets get ⌈N/n⌉ rows, the rest ⌊N/n⌋ — identical bucketing to the
    window function, closed-form."""
    q = F.floor(total / n)  # base bucket size
    r = total % n  # buckets that get one extra row
    cut = r * (q + 1)  # rows covered by the bigger buckets
    big = F.ceil(rank.cast("double") / (q + 1))
    # greatest() guards the q=0 division; that branch is unreachable then
    # (rank ≤ N = cut when q=0) but ANSI mode must never see a /0.
    small = r + F.ceil((rank - cut).cast("double") / F.greatest(q, F.lit(1)))
    return F.when(rank <= cut, big).otherwise(small).cast("int")
