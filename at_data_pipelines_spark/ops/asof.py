"""As-of (backward) join — an operator Spark lacks natively.

For each left row, attach the most recent right row with
``right.time <= left.time`` within the same ``by`` key (DuckDB/pandas
``merge_asof`` backward semantics, inclusive).

Implementation is the scalable union+window shape, NOT a pandas UDF:
tag both sides, union, then ``last(value, ignorenulls=True)`` over an
unbounded-preceding window per key ordered by (time, side) with the right
side first at equal timestamps. One shuffle on the key, whole-stage
codegen, no Python — at 100 TB this is just a window over a single
hash-partitioned sort, where a per-key ``merge_asof`` UDF would pay
Arrow + Python per group. (The pyspark guide's bucketed-range-join
alternative trades one shuffle for two; this shape wins when the key
cardinality is high, which is the common case.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str] | str,
    value_cols: list[str] | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Backward as-of join.

    left/right share the ``on`` (ordering) column and ``by`` key columns;
    ``value_cols`` (default: all right columns except on/by) are attached
    to each left row from the latest right row at-or-before it.
    """
    by = [by] if isinstance(by, str) else list(by)
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in set(by) | {on}]
    out_names = {c: f"{c}{suffix}" if c in left.columns else c for c in value_cols}

    lhs = left.withColumn("_side", F.lit(1))
    for c in value_cols:
        lhs = lhs.withColumn(out_names[c], F.lit(None).cast(right.schema[c].dataType))
    rhs = right.select(
        *by, on, *[F.col(c).alias(out_names[c]) for c in value_cols]
    ).withColumn("_side", F.lit(0))
    for c in left.columns:
        if c not in set(by) | {on}:
            rhs = rhs.withColumn(c, F.lit(None).cast(left.schema[c].dataType))

    unioned = lhs.unionByName(rhs)
    # right rows sort before left rows at equal time ⇒ inclusive (<=) match
    w = (
        W.partitionBy(*by)
        .orderBy(F.col(on).asc(), F.col("_side").asc())
        .rowsBetween(W.unboundedPreceding, 0)
    )
    filled = unioned.select(
        "*",
        *[
            F.last(out_names[c], ignorenulls=True).over(w).alias(f"_f_{c}")
            for c in value_cols
        ],
    )
    return (
        filled.filter(F.col("_side") == 1)
        .drop("_side", *[out_names[c] for c in value_cols])
        .select(
            *left.columns,
            *[F.col(f"_f_{c}").alias(out_names[c]) for c in value_cols],
        )
    )
