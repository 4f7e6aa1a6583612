"""Bucketized range (interval) join — the batch counterpart of the
stream-stream interval join (``streaming.purchase_attribution_stream``).

Problem shape: match each left row to every right row whose ordering
value falls in ``[left.on + lower, left.on + upper]``, optionally within
the same equi-key. Declared naively (equi-key + range predicates), Spark
plans a SortMergeJoin on the key with the range as a post-join filter —
acceptable when keys are selective, but a key-free or low-cardinality-key
interval join degenerates to a per-key cross product: the O(n²) shape
that dies at corpus scale.

This operator makes the range itself an equi-key: time is bucketed into
bins of width ``upper - lower``; a right row lives in exactly one bin,
and any matching left interval overlaps at most TWO consecutive bins
(the interval's width equals the bin width), so each left row is
exploded to its ≤2 candidate bins and the join becomes a uniform
equi-join on (key..., bin) followed by the exact range filter. Shuffle
volume is ≤2× the left side, candidate work is bounded by real temporal
locality instead of key cardinality — the standard interval-join
bucketization (DuckDB's IEJoin and Flink's interval join use the same
binning idea).

100 TB notes: bins inherit the uniformity of event time, so no skew
beyond genuine hot windows; both sides prune columns before the
shuffle; the exact filter runs inside codegen. For intervals much
NARROWER than the data's time span the bin count is huge and harmless
(bins are derived values, not state); for very WIDE intervals prefer
the plain equi-key join + filter, which this degenerates into.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    left: DataFrame,
    right: DataFrame,
    on_left: str,
    on_right: str,
    lower: int,
    upper: int,
    by: list[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join rows where ``right[on_right]`` ∈ ``[left[on_left] + lower,
    left[on_left] + upper]`` (inclusive both ends), equi-matched on the
    optional ``by`` keys. ``on_left``/``on_right`` must be integral
    (epoch micros int64 is the intended currency — timezone-independent
    and codegen-friendly). Returns all left and right columns; name
    collisions outside ``by`` must be resolved by the caller up front.

    ``how='inner'`` emits matched pairs; ``how='left'`` keeps unmatched
    left rows with nulls on the right side.
    """
    if upper <= lower:
        raise ValueError(f"empty range: lower={lower}, upper={upper}")
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how}")
    by = list(by or [])
    width = upper - lower

    out_cols = list(left.columns) + [c for c in right.columns if c not in set(by)]
    if how == "left":
        # surrogate key so the unmatched-row anti-join below is null-safe
        # and per-row (anti-joining on the raw left columns would both drop
        # duplicate left rows and re-emit matched rows that contain NULLs,
        # since join equality never matches NULL to NULL).
        # localCheckpoint pins the ids: monotonically_increasing_id is
        # nondeterministic under re-evaluation, and this plan feeds TWO
        # subplans (the join and the anti-join) — without materialization
        # a shuffled input could assign different ids per branch and
        # corrupt the reattachment
        left = left.withColumn(
            "_rj_id", F.monotonically_increasing_id()
        ).localCheckpoint(eager=False)

    lo = F.col(on_left) + F.lit(lower)
    hi = F.col(on_left) + F.lit(upper)

    def _floordiv(c):
        # exact integer floor-division (pmod keeps it correct for negative
        # values); a double `/` + floor could misbin a value sitting
        # exactly on a bin boundary via quotient rounding
        return ((c - F.pmod(c, F.lit(width))) / F.lit(width)).cast("long")

    # interval width == bin width ⇒ the interval spans ≤2 consecutive bins
    lhs = left.withColumn(
        "_bin",
        F.explode(F.array_distinct(F.array(_floordiv(lo), _floordiv(hi)))),
    )
    rhs = right.withColumn("_bin", _floordiv(F.col(on_right)))
    cond = (F.col(on_right) >= lo) & (F.col(on_right) <= hi)
    joined = lhs.join(rhs, [*by, "_bin"]).filter(cond).drop("_bin")
    if how == "inner":
        return joined
    # left outer: re-attach left rows that matched nothing, keyed by the
    # surrogate id (single non-null key ⇒ null-safe, duplicate-safe)
    missed = left.join(joined.select("_rj_id").distinct(), "_rj_id", "left_anti")
    for c in right.columns:
        if c not in set(by):
            missed = missed.withColumn(c, F.lit(None).cast(right.schema[c].dataType))
    return joined.unionByName(missed.select(*joined.columns)).select(*out_cols)
