"""Deterministic hash-threshold sampling: stability, nesting, split
disjointness, stratified fractions, mixture realization."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from at_data_pipelines_spark.io import load_table
from at_data_pipelines_spark.llmops.sampling import (
    deterministic_split,
    mixture_fractions,
    mixture_sample,
    sample_fraction,
    stratified_sample,
)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


def test_split_is_deterministic_and_partitions_rows(docs):
    s1 = deterministic_split(docs, val_frac=0.1, test_frac=0.1)
    s2 = deterministic_split(docs, val_frac=0.1, test_frac=0.1)
    a = {(r.doc_id, r.split) for r in s1.select("doc_id", "split").collect()}
    b = {(r.doc_id, r.split) for r in s2.select("doc_id", "split").collect()}
    assert a == b  # rerun-stable
    counts = {r.split: r.n for r in s1.groupBy("split").agg(F.count("*").alias("n")).collect()}
    n = docs.count()
    assert sum(counts.values()) == n  # every row labeled exactly once
    assert 0.05 < counts["val"] / n < 0.15
    assert 0.05 < counts["test"] / n < 0.15


def test_split_is_append_safe(docs):
    """A document's split label must not depend on what else is in the
    corpus: labeling a subset then the full set agrees on the subset."""
    subset = docs.filter(F.col("doc_id") % 3 == 0)
    full = {
        r.doc_id: r.split
        for r in deterministic_split(docs, val_frac=0.2).select("doc_id", "split").collect()
    }
    sub = {
        r.doc_id: r.split
        for r in deterministic_split(subset, val_frac=0.2).select("doc_id", "split").collect()
    }
    assert all(full[k] == v for k, v in sub.items())


def test_sample_fractions_nest(docs):
    small = {r.doc_id for r in sample_fraction(docs, 0.05).select("doc_id").collect()}
    big = {r.doc_id for r in sample_fraction(docs, 0.30).select("doc_id").collect()}
    assert small <= big  # threshold sampling composes across scales
    n = docs.count()
    assert 0.15 < len(big) / n < 0.45


def test_stratified_sample_respects_per_stratum_fractions(docs):
    sources = [r.source for r in docs.select("source").distinct().collect()]
    assert len(sources) >= 2
    fracs = {sources[0]: 1.0, sources[1]: 0.0}
    out = stratified_sample(docs, fracs, "source", "doc_id")
    got = {r.source: r.n for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    full = {r.source: r.n for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert got.get(sources[0], 0) == full[sources[0]]  # frac 1.0 keeps all
    assert sources[1] not in got  # frac 0.0 drops all
    # strata not listed default to 0
    assert set(got) <= {sources[0]}


def test_mixture_fractions_no_upsampling_and_realized_weights(docs):
    sources = sorted(r.source for r in docs.select("source").distinct().collect())
    s0, s1 = sources[0], sources[1]
    fr = mixture_fractions(docs, {s0: 0.8, s1: 0.2}, "source")
    assert all(0.0 <= f <= 1.0 for f in fr.values())
    # the binding source is fully used (keep fraction 1) — no upsampling
    assert max(fr.values()) == pytest.approx(1.0, abs=1e-9)
    out = mixture_sample(docs, {s0: 0.8, s1: 0.2}, "source", "doc_id")
    got = {r.source: r.n for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert set(got) <= {s0, s1}  # unlisted sources dropped
    realized = got[s0] / (got[s0] + got[s1])
    assert 0.7 < realized < 0.9  # hash-threshold sampling noise at fixture size


def test_mixture_missing_source_raises(docs):
    with pytest.raises(ValueError, match="absent"):
        mixture_fractions(docs, {"no_such_source": 1.0}, "source")


def test_cap_per_key_deterministic_quota(docs):
    from at_data_pipelines_spark.llmops.sampling import cap_per_key

    capped = cap_per_key(docs, 20, "source", "doc_id")
    per = {r.source: r.n for r in capped.groupBy("source").agg(F.count("*").alias("n")).collect()}
    full = {r.source: r.n for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()}
    for s, n in per.items():
        assert n == min(20, full[s])
    # deterministic winners
    a = {r.doc_id for r in cap_per_key(docs, 20, "source", "doc_id").collect()}
    b = {r.doc_id for r in cap_per_key(docs, 20, "source", "doc_id").collect()}
    assert a == b
    # stability: capping a SUBSET keeps a subset-consistent winner rule
    # (hash order is per-doc, independent of what else exists) — winners
    # of the full corpus that survive into the subset stay winners there
    sub = docs.filter(F.col("doc_id") % 2 == 0)
    sub_winners = {r.doc_id for r in cap_per_key(sub, 20, "source", "doc_id").collect()}
    # every full-corpus winner that is in the subset and whose source has
    # spare quota in the subset must still win
    assert len(sub_winners) > 0
