"""Property pins for the banked Bloom repair (r13): for ANY value
multiset and ANY density (bank counts 1..32 and past the cap), a value
the builder saw must NEVER be excluded by the probe — a Bloom filter's
one hard guarantee. The integration tests in test_bloom_skipping.py pin
write-path bit-identity and scan-level pruning at fixed densities; this
file sweeps the no-false-negative invariant across random inputs,
driving the REAL builder (`Lakehouse._arrow_leaf_stats`, the arrow fast
path, whose bits are pinned identical to the Spark job's) and the REAL
prober (`_bloom_entry_excludes` with the same `_bloom_bank_of` /
`_bloom_probe_positions` closure scan() builds).
"""

from __future__ import annotations

import pyarrow as pa
import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import types as T

from at_data_pipelines_spark.catalog import (
    Lakehouse,
    _bloom_bank_of,
    _bloom_entry_excludes,
    _bloom_probe_positions,
    _bloom_value_str,
)

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("bucket", T.IntegerType()),
        T.StructField("score", T.DoubleType()),
    ]
)


@pytest.fixture(scope="module")
def stats_builder(spark, tmp_path_factory):
    """One manifest-only table per module; _arrow_leaf_stats runs no
    Spark jobs, so each hypothesis example is pure-Python fast."""
    lake = Lakehouse(spark, str(tmp_path_factory.mktemp("pblake") / "lake"))
    # tiny lattice (base 64 bits -> 4096-bit cap) so a few hundred
    # values already push the leaf through every bank count
    lake.create(
        "t", SCHEMA, [], [], bloom_columns=["doc_id"], bloom_m_bits=64
    )
    meta = lake._load_meta("t")

    def build(values: list[str]) -> dict:
        tbl = pa.table(
            {
                "doc_id": pa.array(values, pa.string()),
                "bucket": pa.array([0] * len(values), pa.int32()),
                "score": pa.array([0.0] * len(values), pa.float64()),
            }
        )
        return lake._arrow_leaf_stats(meta, tbl)

    return build


def _probe_closure(sval: str):
    """The scan()-side positions closure, banked exactly as scan builds
    it: global bit positions offset by the value's own bank."""

    def positions_for(m_bits, k, banks=1):
        base = _bloom_probe_positions(sval, m_bits, k)
        if banks > 1:
            off = _bloom_bank_of(sval, banks) * m_bits
            base = [off + p for p in base]
        return base

    return positions_for


# mixes ascii, unicode, whitespace-y and long strings
_VALUE = st.one_of(
    st.text(min_size=0, max_size=40),
    st.integers(0, 10**12).map(lambda i: f"doc-{i}"),
    st.text(alphabet="=/\\#%é世 ", min_size=1, max_size=8),
)


@settings(max_examples=40, deadline=None)
@given(st.lists(_VALUE, min_size=1, max_size=300, unique=True))
def test_present_values_are_never_excluded(stats_builder, values):
    stats = stats_builder(values)
    ent = stats.get("doc_id#bloom")
    assert ent is not None
    for v in values:
        sval = _bloom_value_str(v)
        assert sval is not None
        assert not _bloom_entry_excludes(
            stats, {"doc_id": [_probe_closure(sval)]}
        ), f"present value {v!r} excluded (banks={ent[3] if len(ent) > 3 else 1})"


@settings(max_examples=8, deadline=None)
@given(
    st.integers(1, 6),  # density exponent: ~2^d * 100 values
    st.integers(0, 10**9),  # value-space offset so runs don't collide
)
def test_no_false_negatives_at_every_bank_count(stats_builder, d, off):
    """Sweep densities through the bank lattice (1 -> 32 banks and past
    the bank cap) with sequential ids — the common key shape — and
    check every present id plus: an absent id must never crash the
    probe (exclusion is allowed, it's what the filter is FOR)."""
    values = [f"id-{off + i}" for i in range(100 * (2**d))]
    stats = stats_builder(values)
    ent = stats["doc_id#bloom"]
    banks = int(ent[3]) if len(ent) > 3 else 1
    assert banks in (1, 2, 4, 8, 16, 32)
    step = max(1, len(values) // 64)
    for v in values[::step]:
        assert not _bloom_entry_excludes(
            stats, {"doc_id": [_probe_closure(v)]}
        ), f"present {v!r} excluded at banks={banks}"
    _bloom_entry_excludes(stats, {"doc_id": [_probe_closure(f"absent-{off}")]})
