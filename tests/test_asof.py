"""as-of join vs pandas merge_asof ground truth."""

from __future__ import annotations

import numpy as np
import pandas as pd

from at_data_pipelines_spark.ops import asof_join


def test_asof_join_matches_merge_asof(spark):
    rng = np.random.default_rng(17)
    left_rows, right_rows = [], []
    for key in ["A", "B", "C"]:
        lts = np.sort(rng.choice(np.arange(1000), 60, replace=False))
        rts = np.sort(rng.choice(np.arange(1000), 15, replace=False))
        left_rows += [(key, int(t), float(i)) for i, t in enumerate(lts)]
        right_rows += [(key, int(t), float(t) * 2) for t in rts]
    lpdf = pd.DataFrame(left_rows, columns=["k", "t", "x"])
    rpdf = pd.DataFrame(right_rows, columns=["k", "t", "v"])
    got = (
        asof_join(
            spark.createDataFrame(lpdf), spark.createDataFrame(rpdf), on="t", by="k"
        )
        .toPandas()
        .sort_values(["k", "t"])
        .reset_index(drop=True)
    )
    exp = pd.merge_asof(
        lpdf.sort_values("t"), rpdf.sort_values("t"), on="t", by="k", direction="backward"
    ).sort_values(["k", "t"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[["k", "t", "x", "v"]], exp[["k", "t", "x", "v"]])


def test_asof_join_inclusive_at_equal_ts(spark):
    l = spark.createDataFrame([("A", 10, 1.0)], ["k", "t", "x"])
    r = spark.createDataFrame([("A", 10, 99.0), ("A", 11, 100.0)], ["k", "t", "v"])
    out = asof_join(l, r, on="t", by="k").collect()
    assert out[0].v == 99.0  # right row at the same t matches (<= semantics)


def test_asof_join_no_match_is_null(spark):
    l = spark.createDataFrame([("A", 5, 1.0)], ["k", "t", "x"])
    r = spark.createDataFrame([("A", 10, 99.0)], ["k", "t", "v"])
    out = asof_join(l, r, on="t", by="k").collect()
    assert out[0].v is None


def test_asof_join_name_collision_suffix(spark):
    l = spark.createDataFrame([("A", 5, 1.0)], ["k", "t", "v"])
    r = spark.createDataFrame([("A", 4, 99.0)], ["k", "t", "v"])
    out = asof_join(l, r, on="t", by="k")
    assert "v_right" in out.columns
    assert out.collect()[0].v_right == 99.0


def test_range_join_matches_brute_force(spark):
    """Bucketized interval join must equal the naive inequality join on a
    randomized fixture, including interval endpoints ON bin boundaries
    (inclusive both ends) and windows expressed with negative offsets."""
    import random

    from at_data_pipelines_spark.ops import range_join

    rng = random.Random(13)
    left = [(i, rng.randrange(0, 3), rng.randrange(0, 10_000)) for i in range(120)]
    right = [(1000 + i, rng.randrange(0, 3), rng.randrange(0, 10_000)) for i in range(150)]
    # plant exact boundary hits: right at left_ts + lower and left_ts + upper
    left += [(900, 9, 5000)]
    right += [(1900, 9, 5000 - 600), (1901, 9, 5000), (1902, 9, 5000 - 601), (1903, 9, 5001)]
    ldf = spark.createDataFrame(left, ["lid", "k", "lts"])
    rdf = spark.createDataFrame(right, ["rid", "k", "rts"])

    got = {
        (r.lid, r.rid)
        for r in range_join(
            ldf, rdf, "lts", "rts", lower=-600, upper=0, by=["k"]
        ).collect()
    }
    want = {
        (lid, rid)
        for (lid, lk, lts) in left
        for (rid, rk, rts) in right
        if lk == rk and lts - 600 <= rts <= lts
    }
    assert got == want
    assert (900, 1900) in got and (900, 1901) in got  # inclusive endpoints
    assert (900, 1902) not in got and (900, 1903) not in got

    # left outer keeps unmatched left rows exactly once, nulls on the right
    louter = range_join(ldf, rdf, "lts", "rts", -600, 0, by=["k"], how="left")
    matched_left = {lid for lid, _ in want}
    rows = louter.collect()
    assert len([r for r in rows if r.rid is None]) == len(
        {r.lid for r in ldf.collect()} - matched_left
    )
    assert {(r.lid, r.rid) for r in rows if r.rid is not None} == want

    # key-free variant (pure temporal join) must also be exact
    got_nokey = {
        (r.lid, r.rid)
        for r in range_join(
            ldf.drop("k"), rdf.drop("k"), "lts", "rts", -600, 0
        ).collect()
    }
    want_nokey = {
        (lid, rid)
        for (lid, _lk, lts) in left
        for (rid, _rk, rts) in right
        if lts - 600 <= rts <= lts
    }
    assert got_nokey == want_nokey
