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


def test_range_join_left_nulls_and_duplicates_vs_duckdb(spark):
    """range_join(how='left') vs a DuckDB left interval join, on a fixture
    that stresses every edge the advisor flagged: left rows whose PAYLOAD
    columns contain NULLs (a null-unsafe anti-join re-emits matched rows as
    spurious unmatched ones), exact duplicate left rows (each copy must
    survive independently), and timestamps sitting exactly on interval and
    bin boundaries."""
    import random

    import duckdb
    import pandas as pd

    from at_data_pipelines_spark.ops import range_join

    rng = random.Random(29)
    left_rows = []
    for i in range(150):
        payload = None if i % 3 == 0 else float(i)  # NULLs in a left column
        left_rows.append((i, rng.randrange(0, 3), rng.randrange(0, 5_000), payload))
    # exact duplicate left rows (same values incl. a NULL payload)
    left_rows += [(7_000, 1, 1200, None)] * 3
    # boundary-exact: right rows planted at lts+lower and lts+upper below
    left_rows += [(8_000, 2, 2400, 1.5)]
    right_rows = [
        (1000 + i, rng.randrange(0, 3), rng.randrange(0, 5_000))
        for i in range(120)
    ]
    right_rows += [(9_000, 2, 2400 - 600), (9_001, 2, 2400), (9_002, 2, 2400 - 601)]

    lpdf = pd.DataFrame(left_rows, columns=["lid", "k", "lts", "payload"])
    rpdf = pd.DataFrame(right_rows, columns=["rid", "k", "rts"])
    ldf = spark.createDataFrame(lpdf)
    rdf = spark.createDataFrame(rpdf)

    got = (
        range_join(ldf, rdf, "lts", "rts", lower=-600, upper=0, by=["k"], how="left")
        .toPandas()
        .sort_values(["lid", "payload", "rid"], na_position="first")
        .reset_index(drop=True)
    )

    con = duckdb.connect()
    con.register("l", lpdf)
    con.register("r", rpdf)
    exp = con.execute(
        """
        SELECT l.lid, l.k, l.lts, l.payload, r.rid, r.rts
        FROM l LEFT JOIN r
          ON l.k = r.k AND r.rts BETWEEN l.lts - 600 AND l.lts
        ORDER BY lid, payload NULLS FIRST, rid
        """
    ).fetchdf().reset_index(drop=True)
    con.close()

    assert len(got) == len(exp), f"row count {len(got)} != oracle {len(exp)}"
    pd.testing.assert_frame_equal(
        got[["lid", "k", "lts", "payload", "rid", "rts"]].astype(
            {"rid": "float64", "rts": "float64"}
        ),
        exp.astype({"rid": "float64", "rts": "float64"}),
    )
    # duplicate left rows: all 3 copies present (unmatched or matched alike)
    assert (got.lid == 7_000).sum() >= 3
    # matched-with-NULL-payload rows must NOT be re-emitted as unmatched:
    # every lid appears with nulls on the right ONLY IF it truly had no match
    matched_lids = set(got.loc[got.rid.notna(), "lid"])
    null_lids = set(got.loc[got.rid.isna(), "lid"])
    assert not (matched_lids & null_lids)


def test_range_join_left_deterministic_under_shuffled_input(spark):
    """r6 review: the left-outer surrogate id must be PINNED across the
    join and anti-join branches even when the left side is produced by a
    shuffle (aggregation) — re-evaluated monotonically_increasing_id
    would corrupt the reattachment."""
    import random

    from pyspark.sql import functions as F

    from at_data_pipelines_spark.ops.range_join import range_join

    rng = random.Random(3)
    raw = [(i, rng.randrange(0, 4), rng.randrange(0, 10_000), 1) for i in range(600)]
    # left comes out of a groupBy (shuffle): nondeterministic row order
    left = (
        spark.createDataFrame(raw, ["lid", "k", "lts", "one"])
        .groupBy("lid", "k", "lts")
        .agg(F.sum("one").alias("n"))
        .repartition(11)
    )
    right = spark.createDataFrame(
        [(j, rng.randrange(0, 4), rng.randrange(0, 10_000)) for j in range(300)],
        ["rid", "k", "rts"],
    )
    out = range_join(left, right, "lts", "rts", -500, 0, by=["k"], how="left")
    rows = out.collect()
    # per-left-row accounting: matched rows OR exactly one null row, never both
    by_lid = {}
    for r in rows:
        by_lid.setdefault(r.lid, []).append(r.rid)
    assert set(by_lid) == {t[0] for t in raw}  # every left row present
    rvals = [(r.rid, r.k, r.rts) for r in right.collect()]
    for lid, k, lts, _ in raw:
        expect = sorted(rid for rid, rk, rts in rvals if rk == k and lts - 500 <= rts <= lts)
        got = sorted(x for x in by_lid[lid] if x is not None)
        if expect:
            assert got == expect, f"lid={lid}"
            assert None not in by_lid[lid], f"matched lid={lid} also null-padded"
        else:
            assert by_lid[lid] == [None], f"unmatched lid={lid} wrong: {by_lid[lid]}"
