"""Streaming near-dup document ingest: a self-maintaining MinHash-LSH
corpus index.

The batch dedup operators answer "which documents in this corpus are
near-dups of each other?"; a training-data pipeline's ingest asks the
ONLINE version — "is this incoming document a near-dup of anything we
already kept?" — continuously. This module runs that as Structured
Streaming with a ``foreachBatch`` sink (inside the sink each micro-batch
is a plain batch DataFrame, so the tested batch MinHash/LSH operators
apply unchanged):

1. signature the batch (``minhash_signatures`` → ``lsh_bands``);
2. drop documents sharing ANY band bucket with the persisted corpus
   index — an equi-join on (band, band_key) against a PK table, i.e.
   an index lookup, never a corpus scan;
3. collapse near-dup groups WITHIN the batch (LSH candidate pairs →
   connected components → keep the min-id representative);
4. upsert survivors into the documents table and their band keys into
   the index table. Both writes are PK upserts, so replayed batches are
   idempotent: a re-delivered document either collides with its own
   bands (filtered) or re-upserts onto its own primary key.

Recall semantics are the production ones (Gopher/RefinedWeb-style LSH
dedup): a band collision is a probabilistic near-dup verdict with
P(miss) = (1 − j^r)^b per pair. For exact-threshold guarantees, verify
candidates with ``jaccard_pairs(candidates=...)`` against the matched
corpus documents before dropping — same index, one extra join.

Scale: the index table is (band, band_key, doc_id) — ``bands`` rows per
kept document, hive-partitionable by band, hash-joined on uniform
digest keys. State lives in the lakehouse, not the stream: the query
restarts with no state-store recovery concerns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..catalog import Lakehouse
from ..llmops.dedup import (
    connected_components,
    lsh_bands,
    lsh_candidate_pairs,
    minhash_signatures,
)

BAND_INDEX_SCHEMA = T.StructType(
    [
        T.StructField("band", T.IntegerType(), False),
        T.StructField("band_key", T.StringType(), False),
        T.StructField("doc_id", T.LongType(), False),
    ]
)


def create_ingest_tables(
    lake: Lakehouse, docs_table: str, index_table: str, doc_schema: T.StructType
) -> None:
    lake.create(docs_table, doc_schema, [], ["doc_id"])
    lake.create(index_table, BAND_INDEX_SCHEMA, [], ["band", "band_key", "doc_id"])


def near_dup_ingest_stream(
    doc_stream: DataFrame,
    lake: Lakehouse,
    docs_table: str,
    index_table: str,
    checkpoint_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    bands: int = 4,
    shingle_n: int = 3,
    available_now: bool = True,
):
    """Start the ingest query (see module docstring for the protocol)."""
    assert num_hashes % bands == 0

    def sink(batch: DataFrame, epoch_id: int) -> None:
        if batch.isEmpty():
            return
        batch = batch.dropDuplicates([id_col])
        sig = minhash_signatures(batch, text_col, id_col, num_hashes, shingle_n)
        batch_bands = lsh_bands(sig, id_col, bands, num_hashes // bands)

        # documents with fewer than shingle_n tokens have no shingles, so
        # no signature and no band rows — without a guard they would bypass
        # both the index lookup and within-batch clustering entirely. Give
        # them a synthetic exact-fingerprint band (band = -1, key = md5 of
        # the raw text): exact duplicates of short docs then collide through
        # the very same joins, with exact- instead of near-dup semantics.
        # NULL text coalesces to '' first: md5(NULL) is NULL, and a NULL
        # band_key would never join-collide (every NULL-text re-delivery
        # kept as "novel") AND would violate the index PK (r6 review).
        short = batch.join(
            batch_bands.select(id_col).distinct(), id_col, "left_anti"
        ).select(
            F.lit(-1).alias("band"),
            F.md5(F.coalesce(F.col(text_col), F.lit(""))).alias("band_key"),
            F.col(id_col),
        )
        batch_bands = batch_bands.unionByName(short)

        # index lookup: any shared bucket with the kept corpus → near-dup
        idx = lake.table(index_table).select("band", "band_key")
        dup_hits = (
            batch_bands.join(idx, ["band", "band_key"], "left_semi")
            .select(id_col)
            .distinct()
        )
        novel = batch.join(dup_hits, id_col, "left_anti")

        # collapse near-dup groups WITHIN the batch: candidates from the
        # batch's own buckets, min-id representative per component
        novel_bands = batch_bands.join(novel.select(id_col), id_col, "left_semi")
        pairs = lsh_candidate_pairs(novel_bands, id_col)
        comps = connected_components(novel.select(id_col), pairs, id_col)
        reps = comps.filter(F.col(id_col) == F.col("cluster")).select(id_col)
        survivors = novel.join(reps, id_col, "left_semi")

        lake.upsert(docs_table, survivors)
        lake.upsert(
            index_table,
            novel_bands.join(reps, id_col, "left_semi").select(
                "band", "band_key", F.col(id_col).alias("doc_id")
            ),
        )

    writer = (
        doc_stream.writeStream.outputMode("update")
        .foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def ann_index_maintenance_stream(
    vec_stream: DataFrame,
    lake: Lakehouse,
    prefix: str,
    checkpoint_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    available_now: bool = True,
    compact_every: int = 1,
):
    """Incrementally maintain a persisted IVF+PQ index
    (``llmops.ann_index``) from a stream of embeddings: each micro-batch
    is assigned + residual-encoded under the SAVED quantizer (loaded once
    at query start — a few KB, closure-broadcast) and merged into
    ``{prefix}_codes``. This is the online counterpart of
    ``ann_index.encode_corpus``: new/changed vectors become probeable
    without re-encoding the corpus, and replayed batches are idempotent
    (re-encoding the same vector under the same quantizer yields the same
    code row, merged on its PK).

    The quantizer itself is intentionally frozen for the stream's
    lifetime — retraining changes every code's meaning, so a retrain is a
    batch event: ``save_index`` (full snapshot replace) + fresh stream.

    Scale: the ENCODE is one Arrow pass per micro-batch (no shuffle) —
    O(batch) regardless of index size. The COMMIT is the knob:
    ``compact_every=1`` (default) runs the full PK upsert per batch —
    strongest read guarantees, but compacting the codes table costs
    O(index) per batch. ``compact_every=N>1`` is the LSM shape: each
    batch is an O(batch) append-only ``insert`` and only every Nth batch
    pays the PK compaction, amortizing it to O(index/N). Between
    compactions a RE-encoded id can briefly hold two code rows (both
    decoding the same vector under the frozen quantizer — probes see a
    duplicate candidate, not a wrong one); fresh-id streams have no
    duplicates at all. Replays stay idempotent: the next compaction's
    keep-latest dedup collapses any re-inserted rows.
    """
    from ..llmops.ann_index import _codes_schema, encode_corpus, load_index

    index = load_index(lake, prefix)
    lake.create(f"{prefix}_codes", _codes_schema(id_col), [], [id_col])

    def sink(batch: DataFrame, epoch_id: int) -> None:
        if batch.isEmpty():
            return
        batch = batch.dropDuplicates([id_col])
        encoded = encode_corpus(batch, index, id_col, vec_col)
        if compact_every <= 1:
            lake.upsert(f"{prefix}_codes", encoded)
            return
        lake.insert(f"{prefix}_codes", encoded)
        # amortization cadence is derived from the MANIFEST (pending
        # live-delta count), not a driver-local counter: a stream
        # restart therefore resumes the cadence where the table actually
        # is, instead of deferring compaction indefinitely under
        # frequent restarts
        if lake.pending_deltas(f"{prefix}_codes") >= compact_every:
            lake.optimize(f"{prefix}_codes")

    writer = (
        vec_stream.writeStream.outputMode("update")
        .foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
