"""Incremental view maintenance: a materialized aggregate kept exact
against its source table by applying the CHANGE FEED instead of
recomputing.

The classic IVM result for algebraic aggregates (sum/count/avg): every
source change decomposes into signed delta rows — insert = +row,
delete = −row, update = −preimage +postimage — and
``SUM(sign·x), SUM(sign)`` grouped by the view keys IS the exact
correction to the materialized state. Refresh cost is therefore
O(changes since last refresh), independent of both source and view
size — the property that makes a 100 TB rollup maintainable at all.

Composition of this engine's lakehouse primitives:
- ``table_changes`` (snapshot-derived CDC) produces the signed deltas;
- ``merge`` applies the corrected groups in one read-modify-write
  commit, with ``delete_condition`` dropping groups whose count reaches
  zero;
- table ``properties`` record the last source version applied, so
  refreshes chain correctly and replays are idempotent by construction
  (re-running refresh sees an empty change window). The property
  commits ATOMICALLY with the data (``insert``/``merge`` take a
  ``properties=`` rider applied in the same manifest PUT) — a crash can
  never leave the correction applied but the watermark stale, which
  would double-apply the same change window on the next refresh.

Determinism note: float sums accumulate in different orders under
incremental vs full recomputation, so the invariant is counts exactly
equal + sums equal to ~1e-9 relative (asserted by the differential
test); use scaled-integer measures when bit-exactness is required.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SRC_VERSION_PROP = "ivm.src_version"


def _aggregate(df: DataFrame, group_cols: list[str], sum_cols: list[str]) -> DataFrame:
    # NULL measures contribute 0 (not SQL's all-NULL→NULL): the only
    # convention under which incremental correction and full
    # recomputation provably agree for every change sequence
    aggs = [F.count(F.lit(1)).alias("n")] + [
        F.sum(F.coalesce(F.col(c), F.lit(0.0))).alias(f"sum_{c}") for c in sum_cols
    ]
    return df.groupBy(*group_cols).agg(*aggs)


def build_aggregate(
    lake,
    src: str,
    dst: str,
    group_cols: list[str],
    sum_cols: list[str],
) -> None:
    """Full (re)build of the materialized aggregate ``dst`` =
    ``SELECT group_cols, COUNT(*) AS n, SUM(c) AS sum_c... FROM src
    GROUP BY group_cols``, recording the source version it reflects.
    The source must have primary keys (table_changes needs them) and
    ``retain_versions`` covering the refresh cadence."""
    from pyspark.sql import types as T

    src_meta = lake._load_meta(src)
    agg = _aggregate(lake.table(src), group_cols, sum_cols)
    fields = [src_meta.schema[c] for c in group_cols]
    fields.append(T.StructField("n", T.LongType()))
    for c in sum_cols:
        fields.append(T.StructField(f"sum_{c}", T.DoubleType()))
    lake.create(dst, T.StructType(fields), [], list(group_cols), mode="skip")
    # data + watermark in ONE manifest PUT: a crash mid-build either
    # leaves the old state entirely or the new state entirely
    lake.insert(
        dst, agg, mode="overwrite", properties={_SRC_VERSION_PROP: src_meta.version}
    )


def refresh_aggregate(
    lake,
    src: str,
    dst: str,
    group_cols: list[str],
    sum_cols: list[str],
) -> bool:
    """Apply all source changes since the last build/refresh to ``dst``.
    Returns True if a correction was applied, False for an empty change
    window (no-op). Cost ∝ the change feed (manifest-pruned to the
    partitions changes touched), never the source size."""
    props = lake.get_properties(dst)
    since = props.get(_SRC_VERSION_PROP)
    if since is None:
        raise ValueError(
            f"{dst!r} has no {_SRC_VERSION_PROP} property — run build_aggregate first"
        )
    src_version = lake._load_meta(src).version
    if src_version == since:
        return False
    ch = lake.table_changes(src, since, to_version=src_version)
    sign = F.when(
        F.col("_change_type").isin("insert", "update_postimage"), F.lit(1)
    ).otherwise(F.lit(-1))
    delta = ch.withColumn("_sign", sign)
    corr = delta.groupBy(*group_cols).agg(
        F.sum("_sign").alias("_dn"),
        *[
            F.sum(F.coalesce(F.col(c), F.lit(0.0)) * F.col("_sign")).alias(
                f"_ds_{c}"
            )
            for c in sum_cols
        ],
    )
    cur = lake.table(dst)
    # null-SAFE group join: SQL GROUP BY keeps a NULL group, and a plain
    # equi-join would lose its prior count and duplicate its view row
    c_a, v_a = corr.alias("_ivc"), cur.alias("_ivv")
    cond = F.lit(True)
    for g in group_cols:
        cond = cond & F.col(f"_ivc.{g}").eqNullSafe(F.col(f"_ivv.{g}"))
    joined = c_a.join(v_a, cond, "left")
    post = joined.select(
        *[F.col(f"_ivc.{g}").alias(g) for g in group_cols],
        (F.coalesce(F.col("_ivv.n"), F.lit(0)) + F.col("_dn")).alias("n"),
        *[
            (
                F.coalesce(F.col(f"_ivv.sum_{c}"), F.lit(0.0))
                + F.col(f"_ds_{c}")
            ).alias(f"sum_{c}")
            for c in sum_cols
        ],
    )
    # groups whose count reaches zero disappear from the view; the
    # consumed-version watermark rides the SAME manifest PUT, so the
    # correction and its bookkeeping are atomic (no crash window in
    # which the next refresh would re-apply this change window)
    lake.merge(
        dst,
        post,
        delete_condition=F.col("n") <= 0,
        properties={_SRC_VERSION_PROP: src_version},
    )
    return True
