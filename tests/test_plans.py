"""Physical-plan audits: the 100 TB questions. Filters must reach the
parquet scan, column pruning must shrink ReadSchema, small dims must
broadcast, top-k must compile to TakeOrderedAndProject — asserted on the
actual executed plans so regressions are caught."""

from __future__ import annotations

from at_data_pipelines_spark.queries import QUERIES


def _plan(spark, sf_dir, name) -> str:
    df = QUERIES[name](spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def test_q01_filter_pushdown_and_column_pruning(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q01_pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # projection pushdown: untouched wide columns must not be read
    assert "l_partkey" not in plan.split("ReadSchema")[1][:400]
    assert "l_shipdate" in plan


def test_q02_broadcasts_dimensions(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q02_local_supplier_revenue")
    assert "BroadcastHashJoin" in plan
    # the orderdate range predicate reaches the orders scan
    assert "PushedFilters: [IsNotNull(o_orderdate)" in plan or "GreaterThanOrEqual(o_orderdate" in plan


def test_q03_topk_is_take_ordered(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q03_top_orders")
    assert "TakeOrderedAndProject" in plan


def test_q06_multi_predicate_pushdown(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q06_forecast_revenue")
    seg = plan.split("PushedFilters")[1][:300]
    assert "l_discount" in seg and "l_quantity" in seg


def test_q11_single_shuffle_for_window(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q11_top_suppliers_per_nation")
    assert plan.count("Exchange") <= 1  # one hash partition by nation, no extra shuffle


def test_near_dup_queries_have_no_theta_join(spark, sf_dir):
    """The near-dup operators must never plan an all-pairs scan: every
    join in q45/q46/q51/q53 carries an equi-key (prefix shingle, LSH
    bucket, or simhash band), so no BroadcastNestedLoopJoin or
    CartesianProduct may appear — the O(n²) shape that dies at corpus
    scale."""
    for name in [
        "q42_quality_filters",
        "q45_minhash_lsh_candidates",
        "q46_jaccard_near_dups",
        "q49_embedding_near_dups",
        "q51_simhash_near_dup_pairs",
        "q53_dup_clusters",
        "q62_purchase_attribution",  # bucketized range join: equi on (user, bin)
        "q64_purchase_attribution_left",  # outer path: equi-join + anti-join only
    ]:
        plan = _plan(spark, sf_dir, name)
        assert "NestedLoop" not in plan, name
        assert "CartesianProduct" not in plan, name


def test_whole_stage_codegen_coverage(spark, sf_dir):
    """Relational queries must run inside WholeStageCodegen (JVM, no
    Python in the hot path). AQE only finalizes the plan on execution,
    so run the query first."""
    for name in ["q01_pricing_summary", "q06_forecast_revenue", "q20_rolling_window_stats"]:
        df = QUERIES[name](spark, sf_dir)
        df.collect()  # count() would build a new QueryExecution; collect
        # finalizes THIS plan so AQE's isFinalPlan flips
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan, name
        # '*(n)' prefixes mark WholeStageCodegen stages in the tree string
        assert "*(" in plan, name
    # HOF-heavy text queries legitimately fall out of codegen (lambda
    # expressions are CodegenFallback) but must still be pure JVM: no
    # Python row/Arrow eval anywhere in their plans
    for name in ["q41_text_features", "q42_quality_filters"]:
        plan = _plan(spark, sf_dir, name)
        assert "BatchEvalPython" not in plan, name
        assert "ArrowEvalPython" not in plan, name
        assert "FlatMapGroupsInPandas" not in plan, name
