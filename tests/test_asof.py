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
