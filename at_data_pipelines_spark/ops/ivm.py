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

MIN/MAX (``min_cols``/``max_cols``) are NOT algebraic under deletes —
removing the current extreme cannot be corrected from the delta alone.
The classic fix (e.g. Gupta-Mumick's IVM taxonomy) is a scoped
fallback, implemented here: inserts tighten incrementally
(``least(stored, batch_min)``), and a delete whose value TIES OR BEATS
the stored extreme flags ITS GROUP for recompute — one source scan
semi-joined to exactly the flagged groups, never the whole view. Cost
is O(changes) when no extreme is deleted, O(source rows of the flagged
groups' scan) when one is; a workload that routinely deletes extremes
should keep a sorted/zone-mapped layout on the measure so that scan
prunes.

Determinism note: float sums accumulate in different orders under
incremental vs full recomputation, so the invariant is counts exactly
equal + sums equal to ~1e-9 relative (asserted by the differential
test); use scaled-integer measures when bit-exactness is required.
MIN/MAX are order-free and therefore exactly equal.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SRC_VERSION_PROP = "ivm.src_version"


def _logical_source(lake, src: str, meta=None) -> DataFrame:
    """The source's LOGICAL rows (latest per primary key): ``table()``
    exposes raw pending-delta duplicates until optimize(), but the CDC
    feed — and therefore the view — reflects keep-latest semantics, so
    every full read the view derives from must too (shared dedup:
    ``Lakehouse._read_logical``).

    ``meta`` PINS the snapshot: the caller passes the manifest it
    recorded ``src_version`` from, so the read is exactly the
    watermarked version even when a concurrent writer commits between
    the change feed and this scan (r7 advisory: re-loading here let
    min/max run ahead of n/sum for one window)."""
    return lake._read_logical(src, meta if meta is not None else lake._load_meta(src))


def _aggregate(
    df: DataFrame,
    group_cols: list[str],
    sum_cols: list[str],
    min_cols: list[str] | None = None,
    max_cols: list[str] | None = None,
) -> DataFrame:
    # NULL sum measures contribute 0 (not SQL's all-NULL→NULL): the only
    # convention under which incremental correction and full
    # recomputation provably agree for every change sequence. MIN/MAX
    # keep SQL semantics (NULLs skipped; all-NULL group → NULL).
    aggs = [F.count(F.lit(1)).alias("n")] + [
        F.sum(F.coalesce(F.col(c), F.lit(0.0))).alias(f"sum_{c}") for c in sum_cols
    ]
    aggs += [F.min(c).alias(f"min_{c}") for c in (min_cols or [])]
    aggs += [F.max(c).alias(f"max_{c}") for c in (max_cols or [])]
    return df.groupBy(*group_cols).agg(*aggs)


def build_aggregate(
    lake,
    src: str,
    dst: str,
    group_cols: list[str],
    sum_cols: list[str],
    min_cols: list[str] | None = None,
    max_cols: list[str] | None = None,
) -> None:
    """Full (re)build of the materialized aggregate ``dst`` =
    ``SELECT group_cols, COUNT(*) AS n, SUM(c) AS sum_c...,
    MIN(c) AS min_c..., MAX(c) AS max_c... FROM src GROUP BY
    group_cols``, recording the source version it reflects. The source
    must have primary keys (table_changes needs them) and
    ``retain_versions`` covering the refresh cadence."""
    from pyspark.sql import types as T

    src_meta = lake._load_meta(src)
    # one manifest load feeds BOTH the scan and the recorded version, so
    # the watermark can never disagree with the data it stamps
    agg = _aggregate(
        _logical_source(lake, src, src_meta), group_cols, sum_cols, min_cols, max_cols
    )
    fields = [src_meta.schema[c] for c in group_cols]
    fields.append(T.StructField("n", T.LongType()))
    for c in sum_cols:
        fields.append(T.StructField(f"sum_{c}", T.DoubleType()))
    for c in min_cols or []:
        fields.append(T.StructField(f"min_{c}", src_meta.schema[c].dataType))
    for c in max_cols or []:
        fields.append(T.StructField(f"max_{c}", src_meta.schema[c].dataType))
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
    min_cols: list[str] | None = None,
    max_cols: list[str] | None = None,
) -> bool:
    """Apply all source changes since the last build/refresh to ``dst``.
    Returns True if a correction was applied, False for an empty change
    window (no-op). Cost ∝ the change feed (manifest-pruned to the
    partitions changes touched) — plus, ONLY when a delete removed a
    group's stored min/max, one source scan semi-joined to the flagged
    groups (see module docstring)."""
    min_cols = list(min_cols or [])
    max_cols = list(max_cols or [])
    props = lake.get_properties(dst)
    since = props.get(_SRC_VERSION_PROP)
    if since is None:
        raise ValueError(
            f"{dst!r} has no {_SRC_VERSION_PROP} property — run build_aggregate first"
        )
    src_meta = lake._load_meta(src)
    src_version = src_meta.version
    if src_version == since:
        return False
    ch = lake.table_changes(src, since, to_version=src_version)
    ins = F.col("_change_type").isin("insert", "update_postimage")
    delta = ch.withColumn("_sign", F.when(ins, F.lit(1)).otherwise(F.lit(-1)))
    extreme_aggs = []
    for c in min_cols:
        extreme_aggs += [
            F.min(F.when(ins, F.col(c))).alias(f"_mni_{c}"),
            F.min(F.when(~ins, F.col(c))).alias(f"_mnd_{c}"),
        ]
    for c in max_cols:
        extreme_aggs += [
            F.max(F.when(ins, F.col(c))).alias(f"_mxi_{c}"),
            F.max(F.when(~ins, F.col(c))).alias(f"_mxd_{c}"),
        ]
    corr = delta.groupBy(*group_cols).agg(
        F.sum("_sign").alias("_dn"),
        *[
            F.sum(F.coalesce(F.col(c), F.lit(0.0)) * F.col("_sign")).alias(
                f"_ds_{c}"
            )
            for c in sum_cols
        ],
        *extreme_aggs,
    )
    # PIN the correction before it branches (merge source AND the
    # flagged-groups semi-join below): the CDC dedup's row_number tie is
    # nondeterministic across re-evaluations, and the snapshot-diff join
    # is the expensive part of a refresh — one execution, reused
    corr = corr.localCheckpoint(eager=False)
    cur = lake.table(dst)
    # null-SAFE group join: SQL GROUP BY keeps a NULL group, and a plain
    # equi-join would lose its prior count and duplicate its view row
    c_a, v_a = corr.alias("_ivc"), cur.alias("_ivv")
    cond = F.lit(True)
    for g in group_cols:
        cond = cond & F.col(f"_ivc.{g}").eqNullSafe(F.col(f"_ivv.{g}"))
    joined = c_a.join(v_a, cond, "left")
    # a deleted value that TIES OR BEATS the stored extreme may have BEEN
    # the extreme (duplicates unknowable from the delta) -> flag the
    # group for a scoped recompute of its min/max from the source
    need_re = F.lit(False)
    for c in min_cols:
        need_re = need_re | (
            F.col(f"_mnd_{c}").isNotNull()
            & F.col(f"_ivv.min_{c}").isNotNull()
            & (F.col(f"_mnd_{c}") <= F.col(f"_ivv.min_{c}"))
        )
    for c in max_cols:
        need_re = need_re | (
            F.col(f"_mxd_{c}").isNotNull()
            & F.col(f"_ivv.max_{c}").isNotNull()
            & (F.col(f"_mxd_{c}") >= F.col(f"_ivv.max_{c}"))
        )
    joined = joined.withColumn("_re", need_re)
    min_max_exprs = []
    if min_cols or max_cols:
        flagged = joined.filter(F.col("_re")).select(
            *[F.col(f"_ivc.{g}").alias(g) for g in group_cols]
        )
        re_agg = (
            # pinned to the SAME manifest src_version was read from: a
            # source commit racing this refresh must not leak newer rows
            # into the recompute than the watermark claims
            _logical_source(lake, src, src_meta)
            .alias("_ivs")
            .join(
                F.broadcast(flagged.alias("_ivg")),
                # null-safe: a NULL group key is a real group
                reduce(
                    lambda a, g: a & F.col(f"_ivs.{g}").eqNullSafe(F.col(f"_ivg.{g}")),
                    group_cols,
                    F.lit(True),
                ),
                "leftsemi",
            )
            .groupBy(*group_cols)
            .agg(
                *[F.min(c).alias(f"_re_min_{c}") for c in min_cols],
                *[F.max(c).alias(f"_re_max_{c}") for c in max_cols],
            )
            .alias("_ivr")
        )
        rcond = F.lit(True)
        for g in group_cols:
            rcond = rcond & F.col(f"_ivc.{g}").eqNullSafe(F.col(f"_ivr.{g}"))
        joined = joined.join(re_agg, rcond, "left")
        for c in min_cols:
            min_max_exprs.append(
                F.when(F.col("_re"), F.col(f"_ivr._re_min_{c}"))
                .otherwise(F.least(F.col(f"_ivv.min_{c}"), F.col(f"_mni_{c}")))
                .alias(f"min_{c}")
            )
        for c in max_cols:
            min_max_exprs.append(
                F.when(F.col("_re"), F.col(f"_ivr._re_max_{c}"))
                .otherwise(F.greatest(F.col(f"_ivv.max_{c}"), F.col(f"_mxi_{c}")))
                .alias(f"max_{c}")
            )
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
        *min_max_exprs,
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
