"""The pinned driver-gate query set.

The driver's correctness harness checks the FIRST 50 entries of
``__spark_entry__.queries()`` in dict order (verified against
``CORRECTNESS_r05.json``: its keys are exactly registry positions 0-49).
Registration order is module-import order, so adding a query used to
silently rotate a tail query out of the gate — q35-q38 fell out of the
round-5 gate exactly that way.

This module makes the gate set an explicit, committed decision instead
of an import-order accident:

* ``GATE`` — the 50 queries the driver must check, in gate order.
  Pinned to the round-5 gate set so round-over-round CORRECTNESS deltas
  stay comparable.
* ``PYTEST_ONLY`` — registered queries deliberately outside the driver
  window. They remain fully oracle-checked by
  ``tests/test_oracle_parity.py``, which parametrizes over the WHOLE
  registry; the driver gate is a 50-slot subset, not the test surface.

``order_registry()`` rebuilds the registry dict in (GATE + PYTEST_ONLY)
order and FAILS LOUDLY if the two lists don't exactly partition the
registry — so a future query addition must update this file explicitly,
and can never silently evict a gated query again.
"""

from __future__ import annotations

GATE: list[str] = [
    "q01_pricing_summary",
    "q02_local_supplier_revenue",
    "q03_top_orders",
    "q04_priority_semi",
    "q05_customers_without_orders",
    "q06_forecast_revenue",
    "q07_pivot_status_by_nation",
    "q08_unpivot_part_metrics",
    "q09_union_tagged",
    "q10_distinct_flag_status",
    "q11_top_suppliers_per_nation",
    "q12_rollup_acctbal",
    "q13_orders_with_optional_lineitems",
    "q14_rolling_beta_supplier",
    "q15_json_remap",
    "q16_segment_extremes",
    "q17_date_roundtrip",
    "q18_percentiles",
    "q20_rolling_window_stats",
    "q23_zscore_global",
    "q24_equal_weight_daily",
    "q25_sessionization",
    "q26_tumbling_5min",
    "q27_event_types_per_user",
    "q19_asof_last_purchase",
    "q28_ewm_halflife10",
    "q54_funnel",
    "q55_cohort_retention",
    "q29_keep_latest_event",
    "q62_purchase_attribution",
    "q63_hourly_rollup_cascade",
    "q40_exact_dedup",
    "q41_text_features",
    "q44_word_frequency",
    "q45_minhash_lsh_candidates",
    "q46_jaccard_near_dups",
    "q47_simhash32",
    "q48_cosine_top5",
    "q53_dup_clusters",
    "q51_simhash_near_dup_pairs",
    "q42_quality_filters",
    "q49_embedding_near_dups",
    "q50_temperature_mixture",
    "q60_stream_tumbling_5min",
    "q61_stream_sessionization",
    "q31_important_parts",
    "q32_top_supplier",
    "q33_small_quantity_revenue",
    "q34_lost_customers",
    "q39_customer_retention",
]

# Deliberately outside the 50-slot driver window (still oracle-checked by
# tests/test_oracle_parity.py over the full registry). These four cover
# operators whose siblings already sit in the gate: cube ≈ rollup (q12),
# time-RANGE frame ≈ row-frame rolling (q20), first/last ≈ keep-latest
# (q29), ntile/percent_rank ≈ percentiles (q18).
#
# PROMOTION ORDER (r6 verdict #6, an explicit decision — never rotate
# silently): if the driver window ever widens, or a redundant gate row is
# deliberately retired, promote in this order:
#   1. q64_purchase_attribution_left  (left/outer range-join semantics —
#      the one join surface the gate's q62 inner variant doesn't cover)
#   2. q66_kmv_distinct_users         (sketch-state semantics shared by
#      the streaming bounded-state distinct)
#   3. q65_bm25_search, q68_cms_heavy_hitters, q67_weighted_sample,
#      then the q35-q38 sibling variants.
PYTEST_ONLY: list[str] = [
    "q35_cube_orders",
    "q36_trailing_10min_sum",
    "q37_user_day_open_close",
    "q38_customer_deciles",
    # r6: left-outer variant of the gated q62 interval join (the outer
    # path's null/duplicate edges also carry a dedicated DuckDB property
    # test in tests/test_asof.py)
    "q64_purchase_attribution_left",
    # r6: BM25 ranked retrieval (llmops/retrieval.py) and the KMV
    # bottom-k distinct sketch (ops/sketch.py) — both oracle-checked by
    # tests/test_oracle_parity.py like every registry entry
    "q65_bm25_search",
    "q66_kmv_distinct_users",
    # r6: deterministic A-ES weighted reservoir (llmops/sampling.py) —
    # even the sampling sits under the exact hash-parity oracle
    "q67_weighted_sample",
    # r6: count-min heavy hitters (ops/sketch.py) — the frequency-domain
    # sibling of q66's KMV, same engine-reproducible md5 hashing
    "q68_cms_heavy_hitters",
    # r7: sparse distributed Bloom membership (ops/sketch.py) — small
    # (m=512) on purpose so even the FALSE POSITIVES reproduce exactly
    # across engines under the hash-parity oracle
    "q69_bloom_membership",
    # r7: overlapping character chunking (llmops/packing.py) — the
    # RAG-prep sibling of sequence packing, window arithmetic under
    # exact parity incl. the empty-text edge
    "q70_chunk_documents",
    # r7: deterministic quantile sketch (ops/sketch.py) — the fourth
    # sketch family (bottom-k-hash row sample + PERCENTILE_CONT), same
    # md5 parity discipline as q66/q68/q69
    "q71_quantile_sketch",
    # r10: Bloom data skipping end-to-end — documents round-tripped
    # through a bloom_columns lakehouse table, IN-list point lookup via
    # scan()'s equality predicates, oracle = plain WHERE doc_id IN (...)
    "q72_bloom_point_lookup",
    # r10: exact substring dedup (Lee et al. 2022) — maximal duplicated
    # 8-gram token spans via gaps-and-islands merge; Spark xxhash64 gram
    # digests vs the oracle's gram-string grouping, spans under exact
    # parity (llmops/dedup.py duplicate_ngram_spans)
    "q73_dup_ngram_spans",
    # r11: deletion vectors + merge-on-read update end-to-end — the
    # masked lakehouse read after a vector delete and a vector update
    # must equal plain SQL's WHERE + CASE of the source exactly
    "q74_dv_update_roundtrip",
]

GATE_SIZE = 50


def order_registry(queries: dict, oracles: dict) -> None:
    """Reorder the registry dicts in place to (GATE + PYTEST_ONLY) order,
    asserting the two lists exactly partition the registered names."""
    declared = GATE + PYTEST_ONLY
    if len(GATE) != GATE_SIZE:
        raise RuntimeError(f"GATE must hold exactly {GATE_SIZE} queries, has {len(GATE)}")
    dup = {n for n in declared if declared.count(n) > 1}
    if dup:
        raise RuntimeError(f"duplicate names in gate declaration: {sorted(dup)}")
    registered = set(queries)
    missing = [n for n in declared if n not in registered]
    undeclared = sorted(registered - set(declared))
    if missing or undeclared:
        raise RuntimeError(
            "gate declaration out of sync with registry: "
            f"declared-but-unregistered={missing}, "
            f"registered-but-undeclared={undeclared} — "
            "update at_data_pipelines_spark/queries/gate.py"
        )
    ordered_q = {n: queries[n] for n in declared}
    ordered_o = {n: oracles[n] for n in declared if n in oracles}
    queries.clear()
    queries.update(ordered_q)
    oracles.clear()
    oracles.update(ordered_o)
