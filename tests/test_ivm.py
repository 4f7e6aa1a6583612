"""Incremental view maintenance (ops/ivm.py): the materialized aggregate
must track the source EXACTLY through arbitrary change sequences, with
refresh cost proportional to the changes, and refreshes idempotent."""

from __future__ import annotations

import random

import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from at_data_pipelines_spark.catalog import Lakehouse
from at_data_pipelines_spark.ops.ivm import build_aggregate, refresh_aggregate

SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType()),
        T.StructField("grp", T.StringType()),
        T.StructField("v", T.DoubleType()),
    ]
)


def _rows_df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


@pytest.fixture()
def lake(spark, tmp_path):
    return Lakehouse(spark, str(tmp_path / "lake"))


def _full(lake):
    return {
        r.grp: (r.n, r.sum_v)
        for r in lake.table("src")
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.coalesce(F.col("v"), F.lit(0.0))).alias("sum_v"),
        )
        .collect()
    }


def _view(lake):
    return {r.grp: (r.n, r.sum_v) for r in lake.table("view").collect()}


def _assert_matches(lake):
    got, exp = _view(lake), _full(lake)
    assert set(got) == set(exp)
    for g in exp:
        assert got[g][0] == exp[g][0], f"count mismatch for {g}"
        np.testing.assert_allclose(got[g][1], exp[g][1], rtol=1e-9, atol=1e-9)


def test_ivm_tracks_random_change_stream(lake, spark):
    rng = random.Random(5)
    lake.create("src", SCHEMA, [], ["k"], retain_versions=500)

    def batch(n):
        ks = rng.sample(range(300), n)
        return [
            (k, f"g{rng.randrange(6)}", round(rng.uniform(-50, 50), 2))
            for k in ks
        ]

    lake.upsert("src", _rows_df(spark, batch(60)))
    build_aggregate(lake, "src", "view", ["grp"], ["v"])
    _assert_matches(lake)

    for step in range(6):
        op = rng.choice(["upsert", "delete", "merge_del"])
        if op == "upsert":
            lake.upsert("src", _rows_df(spark, batch(rng.randrange(5, 40))))
        elif op == "delete":
            lo = rng.randrange(0, 300)
            lake.delete_where(
                "src", (F.col("k") >= lo) & (F.col("k") < lo + 40)
            )
        else:
            lake.merge(
                "src",
                _rows_df(spark, batch(rng.randrange(5, 30))),
                delete_condition=F.col("v") > 25,
            )
        assert refresh_aggregate(lake, "src", "view", ["grp"], ["v"]) is True
        _assert_matches(lake)

    # idempotence: nothing new => no-op, view untouched
    before = _view(lake)
    assert refresh_aggregate(lake, "src", "view", ["grp"], ["v"]) is False
    assert _view(lake) == before


def _full_minmax(lake):
    return {
        r.grp: (r.n, r.sum_v, r.min_v, r.max_v)
        for r in _logical(lake)
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.coalesce(F.col("v"), F.lit(0.0))).alias("sum_v"),
            F.min("v").alias("min_v"),
            F.max("v").alias("max_v"),
        )
        .collect()
    }


def _logical(lake):
    from at_data_pipelines_spark.ops.ivm import _logical_source

    return _logical_source(lake, "src")


def _assert_minmax_matches(lake):
    got = {
        r.grp: (r.n, r.sum_v, r.min_v, r.max_v)
        for r in lake.table("view").collect()
    }
    exp = _full_minmax(lake)
    assert set(got) == set(exp)
    for g in exp:
        assert got[g][0] == exp[g][0], f"count mismatch for {g}"
        np.testing.assert_allclose(got[g][1], exp[g][1], rtol=1e-9, atol=1e-9)
        # min/max are order-free: EXACT equality required
        assert got[g][2] == exp[g][2], f"min mismatch for {g}: {got[g]} vs {exp[g]}"
        assert got[g][3] == exp[g][3], f"max mismatch for {g}: {got[g]} vs {exp[g]}"


def test_ivm_min_max_tracks_random_change_stream(lake, spark):
    """r6 verdict #7: MIN/MAX materialized views must survive arbitrary
    change streams — inserts tighten incrementally; deletes that remove
    a stored extreme trigger the scoped per-group recompute. Exact
    equality against full recomputation after every step."""
    rng = random.Random(11)
    lake.create("src", SCHEMA, [], ["k"], retain_versions=500)

    def batch(n):
        ks = rng.sample(range(200), n)
        return [
            # coarse values => frequent duplicate extremes (the hard case:
            # deleting ONE copy of a duplicated min must keep the min)
            (k, f"g{rng.randrange(4)}", float(rng.randrange(-5, 6)))
            for k in ks
        ]

    lake.upsert("src", _rows_df(spark, batch(50)))
    build_aggregate(lake, "src", "view", ["grp"], ["v"], min_cols=["v"], max_cols=["v"])
    _assert_minmax_matches(lake)

    for step in range(8):
        op = rng.choice(["upsert", "delete", "merge_del", "delete_extreme"])
        if op == "upsert":
            lake.upsert("src", _rows_df(spark, batch(rng.randrange(5, 30))))
        elif op == "delete":
            lo = rng.randrange(0, 200)
            lake.delete_where("src", (F.col("k") >= lo) & (F.col("k") < lo + 30))
        elif op == "merge_del":
            lake.merge(
                "src",
                _rows_df(spark, batch(rng.randrange(5, 20))),
                delete_condition=F.col("v") > 3,
            )
        else:
            # surgically delete one row holding a group's current minimum
            rows = lake.table("view").collect()
            if rows:
                g = rng.choice(rows)
                lake.delete_where(
                    "src",
                    F.col("grp").eqNullSafe(F.lit(g.grp)) & (F.col("v") == g.min_v),
                )
        refresh_aggregate(
            lake, "src", "view", ["grp"], ["v"], min_cols=["v"], max_cols=["v"]
        )
        _assert_minmax_matches(lake)

    # idempotence with min/max columns
    before = {tuple(r) for r in lake.table("view").collect()}
    assert (
        refresh_aggregate(
            lake, "src", "view", ["grp"], ["v"], min_cols=["v"], max_cols=["v"]
        )
        is False
    )
    assert {tuple(r) for r in lake.table("view").collect()} == before


def test_ivm_min_max_duplicate_extreme_survives_single_delete(lake, spark):
    """Deleting ONE of two rows that tie for the minimum must keep the
    minimum (the recompute path proves the tie from the source — the
    delta alone cannot)."""
    lake.create("src", SCHEMA, [], ["k"], retain_versions=100)
    lake.upsert(
        "src",
        _rows_df(spark, [(1, "a", 1.0), (2, "a", 1.0), (3, "a", 5.0)]),
    )
    build_aggregate(lake, "src", "view", ["grp"], ["v"], min_cols=["v"], max_cols=["v"])
    lake.delete_where("src", F.col("k") == 1)  # one copy of the min
    refresh_aggregate(lake, "src", "view", ["grp"], ["v"], min_cols=["v"], max_cols=["v"])
    r = lake.table("view").collect()[0]
    assert (r.n, r.min_v, r.max_v) == (2, 1.0, 5.0)
    lake.delete_where("src", F.col("k") == 2)  # the last copy
    refresh_aggregate(lake, "src", "view", ["grp"], ["v"], min_cols=["v"], max_cols=["v"])
    r = lake.table("view").collect()[0]
    assert (r.n, r.min_v, r.max_v) == (1, 5.0, 5.0)


def test_ivm_refresh_commits_data_and_watermark_atomically(lake, spark):
    """The applied correction and the consumed-source-version property
    must land in ONE manifest PUT: a crash at any point either applies
    both or neither, so a replayed refresh can never double-count."""
    lake.create("src", SCHEMA, [], ["k"], retain_versions=100)
    lake.upsert("src", _rows_df(spark, [(1, "a", 10.0), (2, "b", 5.0)]))
    build_aggregate(lake, "src", "view", ["grp"], ["v"])
    lake.upsert("src", _rows_df(spark, [(3, "a", 7.0)]))

    # one refresh == exactly one view commit, carrying the watermark
    v_before = lake._load_meta("view").version
    assert refresh_aggregate(lake, "src", "view", ["grp"], ["v"]) is True
    meta = lake._load_meta("view")
    assert meta.version == v_before + 1, "refresh must be a single commit"
    assert meta.properties["ivm.src_version"] == lake._load_meta("src").version
    _assert_matches(lake)

    # crash AFTER the commit point (post-commit cleanup dies): the data
    # and watermark are both already visible; the re-run is a no-op
    lake.upsert("src", _rows_df(spark, [(4, "b", -2.0)]))
    orig = Lakehouse._clean_superseded
    try:
        def boom(self, *a, **k):
            raise RuntimeError("crash after commit")

        Lakehouse._clean_superseded = boom
        with pytest.raises(RuntimeError, match="crash after commit"):
            refresh_aggregate(lake, "src", "view", ["grp"], ["v"])
    finally:
        Lakehouse._clean_superseded = orig
    assert refresh_aggregate(lake, "src", "view", ["grp"], ["v"]) is False
    _assert_matches(lake)

    # crash BEFORE the commit point (manifest PUT dies): neither is
    # visible; the re-run applies the window exactly once
    lake.upsert("src", _rows_df(spark, [(5, "a", 1.0)]))
    orig_commit = Lakehouse._commit_meta
    try:
        def boom2(self, *a, **k):
            raise RuntimeError("crash before commit")

        Lakehouse._commit_meta = boom2
        with pytest.raises(RuntimeError, match="crash before commit"):
            refresh_aggregate(lake, "src", "view", ["grp"], ["v"])
    finally:
        Lakehouse._commit_meta = orig_commit
    assert refresh_aggregate(lake, "src", "view", ["grp"], ["v"]) is True
    _assert_matches(lake)


def test_ivm_group_vanishes_at_zero_count(lake, spark):
    lake.create("src", SCHEMA, [], ["k"], retain_versions=100)
    lake.upsert(
        "src", _rows_df(spark, [(1, "a", 10.0), (2, "a", 5.0), (3, "b", 1.0)])
    )
    build_aggregate(lake, "src", "view", ["grp"], ["v"])
    lake.delete_where("src", F.col("grp") == "a")
    refresh_aggregate(lake, "src", "view", ["grp"], ["v"])
    got = _view(lake)
    assert "a" not in got and got["b"] == (1, 1.0)


def test_ivm_null_measures(lake, spark):
    lake.create("src", SCHEMA, [], ["k"], retain_versions=100)
    lake.upsert("src", _rows_df(spark, [(1, "a", None), (2, "a", 3.0)]))
    build_aggregate(lake, "src", "view", ["grp"], ["v"])
    assert _view(lake) == {"a": (2, 3.0)}
    lake.upsert("src", _rows_df(spark, [(3, "a", None)]))
    refresh_aggregate(lake, "src", "view", ["grp"], ["v"])
    assert _view(lake) == {"a": (3, 3.0)}
    lake.delete_where("src", F.col("k") == 2)
    refresh_aggregate(lake, "src", "view", ["grp"], ["v"])
    assert _view(lake) == {"a": (2, 0.0)}


def test_ivm_requires_build_first(lake, spark):
    lake.create("src", SCHEMA, [], ["k"], retain_versions=10)
    lake.create(
        "view",
        T.StructType(
            [
                T.StructField("grp", T.StringType()),
                T.StructField("n", T.LongType()),
                T.StructField("sum_v", T.DoubleType()),
            ]
        ),
        [],
        ["grp"],
    )
    with pytest.raises(ValueError, match="build_aggregate"):
        refresh_aggregate(lake, "src", "view", ["grp"], ["v"])


def test_ivm_null_group_and_pending_delta(lake, spark):
    """r6 review regressions: a NULL group must keep its running count
    through refreshes (null-safe joins end-to-end), and un-optimized
    source deltas must not fan out the CDC diff."""
    lake.create("src", SCHEMA, [], ["k"], retain_versions=100)
    lake.upsert(
        "src", _rows_df(spark, [(1, None, 2.0), (2, None, 3.0), (3, "b", 1.0)])
    )
    build_aggregate(lake, "src", "view", ["grp"], ["v"])
    none_key = [r for r in lake.table("view").collect() if r.grp is None]
    assert len(none_key) == 1 and none_key[0].n == 2
    # change the NULL group via a PK-overwriting APPEND (delta, no optimize)
    lake.insert("src", _rows_df(spark, [(1, None, 10.0)]))
    refresh_aggregate(lake, "src", "view", ["grp"], ["v"])
    # reference: compact first — table() exposes raw delta rows until
    # optimize, while the CDC view reflects latest-per-PK semantics
    lake.optimize("src")
    _assert_matches_with_nulls(lake)


def _assert_matches_with_nulls(lake):
    got = {r.grp: (r.n, r.sum_v) for r in lake.table("view").collect()}
    exp = {
        r.grp: (r.n, r.sum_v)
        for r in lake.table("src")
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.coalesce(F.col("v"), F.lit(0.0))).alias("sum_v"),
        )
        .collect()
    }
    assert set(got) == set(exp)
    for g in exp:
        assert got[g][0] == exp[g][0], f"count mismatch for {g!r}: {got[g]} vs {exp[g]}"
        np.testing.assert_allclose(got[g][1], exp[g][1], rtol=1e-9, atol=1e-9)


def test_streaming_materialized_view_via_cdc_refresh(spark, tmp_path):
    """End-to-end composition: a stream upserts into a source table and
    refreshes its materialized aggregate from the CHANGE FEED inside the
    same foreachBatch — after the drain (and an idempotent replay) the
    view equals a full recomputation exactly."""
    import os

    from at_data_pipelines_spark.streaming.events import (
        read_events_stream,
        windowed_aggregation,
    )

    sf_dir = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    lake = Lakehouse(spark, str(tmp_path / "lake"))
    src_schema = T.StructType(
        [
            T.StructField("window_start", T.TimestampType()),
            T.StructField("window_end", T.TimestampType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("total_value", T.DoubleType()),
        ]
    )
    lake.create(
        "rollup", src_schema, [], ["window_start", "event_type"], retain_versions=100
    )
    build_aggregate(lake, "rollup", "by_type", ["event_type"], ["total_value"])

    def sink(batch_df, epoch_id):
        if batch_df.isEmpty():
            return
        lake.upsert("rollup", batch_df)
        refresh_aggregate(lake, "rollup", "by_type", ["event_type"], ["total_value"])

    for i in range(2):  # second run = full replay, must be a no-op overall
        stream = read_events_stream(spark, f"{sf_dir}/events.parquet")
        q = (
            windowed_aggregation(stream)
            .writeStream.outputMode("update")
            .foreachBatch(sink)
            .option("checkpointLocation", str(tmp_path / f"ck{i}"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    got = {
        r.event_type: (r.n, r.sum_total_value)
        for r in lake.table("by_type").collect()
    }
    exp = {
        r.event_type: (r.n, r.s)
        for r in lake.table("rollup")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.coalesce(F.col("total_value"), F.lit(0.0))).alias("s"),
        )
        .collect()
    }
    assert set(got) == set(exp)
    for k in exp:
        assert got[k][0] == exp[k][0]
        np.testing.assert_allclose(got[k][1], exp[k][1], rtol=1e-9)


def test_ivm_recompute_pinned_to_watermarked_source_version(lake, spark):
    """r7 advisory: the flagged-group min/max recompute must read the
    source AT the version the watermark records — a source commit racing
    the refresh (interleaved here right after the change feed is built)
    must NOT leak newer rows into min/max while n/sum and the watermark
    reflect the older window. The next refresh then absorbs it."""
    import types as _types

    lake.create("src", SCHEMA, [], ["k"], retain_versions=100)
    lake.upsert("src", _rows_df(spark, [(1, "a", 2.0), (2, "a", 5.0)]))
    build_aggregate(lake, "src", "view", ["grp"], ["v"], min_cols=["v"], max_cols=["v"])
    # delete the stored minimum -> flags group 'a' for recompute
    lake.delete_where("src", F.col("k") == 1)

    orig = Lakehouse.table_changes
    fired = {"done": False}

    def interleaved(self, name, since, to_version=None):
        ch = orig(self, name, since, to_version=to_version)
        if not fired["done"]:
            fired["done"] = True
            # rival insert AFTER the feed window closes: a new global min
            rival = Lakehouse(spark, self.root)
            rival.upsert("src", _rows_df(spark, [(9, "a", -99.0)]))
        return ch

    lake.table_changes = _types.MethodType(interleaved, lake)
    refresh_aggregate(
        lake, "src", "view", ["grp"], ["v"], min_cols=["v"], max_cols=["v"]
    )
    del lake.__dict__["table_changes"]

    r = lake.table("view").collect()[0]
    # exactly the watermarked snapshot: min recomputed to 5.0 — NOT the
    # raced-in -99.0, which the watermark says we have not consumed yet
    assert (r.n, r.min_v, r.max_v) == (1, 5.0, 5.0)
    # and the next refresh picks the raced commit up exactly once
    refresh_aggregate(
        lake, "src", "view", ["grp"], ["v"], min_cols=["v"], max_cols=["v"]
    )
    r = lake.table("view").collect()[0]
    assert (r.n, r.min_v, r.max_v) == (2, -99.0, 5.0)
