"""Sequence packing: budget respected, every doc assigned once,
deterministic, reasonable fill efficiency."""

from __future__ import annotations

from pyspark.sql import functions as F

from at_data_pipelines_spark.io import load_table
from at_data_pipelines_spark.llmops.packing import pack_sequences


def test_pack_sequences_invariants(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    max_tokens = 256
    packed = pack_sequences(d, max_tokens, n_bins=8)
    rows = packed.collect()
    assert len(rows) == d.count()  # every doc assigned exactly once
    assert len({r.doc_id for r in rows}) == len(rows)
    per_seq = (
        packed.filter(~F.col("overflow"))
        .groupBy("seq_id")
        .agg(F.sum("n_tokens").alias("fill"), F.count("*").alias("n_docs"))
        .collect()
    )
    assert all(r.fill <= max_tokens for r in per_seq)
    # fixture docs are 10-99 tokens → no overflows, and packing should
    # land well above half-full on average
    assert packed.filter(F.col("overflow")).count() == 0
    fills = [r.fill for r in per_seq]
    assert sum(fills) / (len(fills) * max_tokens) > 0.6
    # positions are dense within each sequence
    pos_ok = (
        packed.groupBy("seq_id")
        .agg(F.count("*").alias("n"), F.max("pos").alias("mx"))
        .filter(F.col("mx") != F.col("n") - 1)
        .count()
    )
    assert pos_ok == 0


def test_pack_sequences_deterministic_and_overflow(spark):
    docs = [(i, " ".join(["w"] * n)) for i, n in enumerate([50, 60, 70, 300, 40, 30, 20])]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    a = {(r.doc_id, r.seq_id, r.pos) for r in pack_sequences(df, 128, n_bins=2).collect()}
    b = {(r.doc_id, r.seq_id, r.pos) for r in pack_sequences(df, 128, n_bins=2).collect()}
    assert a == b  # rerun-stable
    over = [r for r in pack_sequences(df, 128, n_bins=2).collect() if r.overflow]
    assert [r.doc_id for r in over] == [3]  # the 300-token doc, alone, flagged
    # the oversized doc sits alone in its sequence
    packed = pack_sequences(df, 128, n_bins=2)
    seq_of_3 = packed.filter(F.col("doc_id") == 3).collect()[0].seq_id
    assert packed.filter(F.col("seq_id") == seq_of_3).count() == 1


def test_chunk_documents_boundaries_and_overlap(spark):
    """Window arithmetic: full coverage, exact overlap bytes, one chunk
    for short/empty/NULL text, boundary-exact lengths."""
    from at_data_pipelines_spark.llmops.packing import chunk_documents

    import pytest

    docs = spark.createDataFrame(
        [
            (1, "a" * 10),          # < chunk: one chunk
            (2, "b" * 20),          # == chunk: exactly one chunk
            (3, "x" * 21),          # chunk+1: two chunks
            (4, "".join(chr(ord("a") + i % 26) for i in range(53))),
            (5, ""),                # empty: one empty chunk
            (6, None),              # NULL: one empty chunk
        ],
        ["doc_id", "text"],
    )
    out = chunk_documents(docs, chunk_chars=20, overlap=5).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    for rows in by_doc.values():
        rows.sort(key=lambda r: r.chunk_id)
    assert [len(by_doc[i]) for i in (1, 2, 3, 5, 6)] == [1, 1, 2, 1, 1]
    assert by_doc[5][0].chunk_text == "" and by_doc[6][0].chunk_text == ""
    # doc 4 (len 53, step 15): chunks at 0/15/30/45 — reassembling the
    # de-overlapped pieces reproduces the text exactly
    rows = by_doc[4]
    assert [r.chunk_start for r in rows] == [0, 15, 30, 45]
    text = "".join(chr(ord("a") + i % 26) for i in range(53))
    rebuilt = rows[0].chunk_text + "".join(r.chunk_text[5:] for r in rows[1:])
    assert rebuilt == text
    # consecutive chunks share exactly `overlap` characters
    for a, b in zip(rows, rows[1:]):
        assert a.chunk_text[-5:] == b.chunk_text[:5] or len(a.chunk_text) < 20
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(docs, chunk_chars=10, overlap=10)
