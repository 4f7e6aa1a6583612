"""Structured Streaming tests: drive the events parquet through streaming
plans with availableNow and check agreement with the batch oracles
(q25/q26 shapes), plus idempotent foreachBatch upsert into the Lakehouse."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from at_data_pipelines_spark.catalog import Lakehouse
from at_data_pipelines_spark.io import load_table
from at_data_pipelines_spark.queries import QUERIES
from at_data_pipelines_spark.streaming import (
    read_events_stream,
    sessionize_stream,
    stream_to_lakehouse,
    windowed_aggregation,
)


@pytest.fixture(scope="module")
def events_stream(spark, sf_dir):
    return read_events_stream(spark, f"{sf_dir}/events.parquet")


def _run_to_memory(spark, df, name):
    q = (
        df.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}")


def test_windowed_agg_matches_batch(spark, sf_dir, events_stream):
    got = _run_to_memory(
        spark, windowed_aggregation(events_stream), "win_agg"
    ).toPandas()
    batch = QUERIES["q26_tumbling_5min"](spark, sf_dir).toPandas()
    got["bucket_start_s"] = got["window_start"].astype("int64") // 10**9
    g = got.set_index(["bucket_start_s", "event_type"])["n_events"].sort_index()
    b = batch.set_index(["bucket_start_s", "event_type"])["n_events"].sort_index()
    assert len(g) == len(b)
    assert (g == b).all()


def test_sessionization_matches_batch(spark, sf_dir, events_stream):
    got = _run_to_memory(spark, sessionize_stream(events_stream), "sess").toPandas()
    batch = QUERIES["q25_sessionization"](spark, sf_dir).toPandas()
    g = got.groupby("user_id").size().sort_index()
    b = batch.groupby("user_id").size().sort_index()
    assert (g == b).all(), "per-user session counts disagree with batch lag+cumsum"
    ge = got.groupby("user_id")["n_events"].sum().sort_index()
    be = batch.groupby("user_id")["n_events"].sum().sort_index()
    assert (ge == be).all()


def test_stateful_running_stats(spark, sf_dir, events_stream):
    from at_data_pipelines_spark.streaming import running_user_stats

    q = (
        running_user_stats(events_stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("rstats")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql(
        "SELECT user_id, n_events, total_value, max_value FROM rstats"
    ).toPandas()
    # last emitted state per user must equal the batch ground truth
    got = got.groupby("user_id").last()
    from at_data_pipelines_spark.io import load_table
    import pyspark.sql.functions as F

    exp = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("value").alias("total_value"),
            F.max("value").alias("max_value"),
        )
        .toPandas()
        .set_index("user_id")
        .sort_index()
    )
    assert (got["n_events"].sort_index() == exp["n_events"]).all()
    assert (got["max_value"].sort_index() == exp["max_value"]).all()
    import numpy as np

    np.testing.assert_allclose(
        got["total_value"].sort_index(), exp["total_value"], rtol=1e-9
    )


def test_stream_upsert_idempotent(spark, sf_dir, tmp_path, events_stream):
    lake = Lakehouse(spark, str(tmp_path / "lake"))
    schema = T.StructType(
        [
            T.StructField("window_start", T.TimestampType()),
            T.StructField("window_end", T.TimestampType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("total_value", T.DoubleType()),
        ]
    )
    lake.create("event_rollup", schema, [], ["window_start", "event_type"])
    for i in range(2):  # replay the whole stream twice: fresh checkpoint
        q = stream_to_lakehouse(
            windowed_aggregation(events_stream),
            lake,
            "event_rollup",
            str(tmp_path / f"ckpt{i}"),
        )
        q.awaitTermination(120)
    out = lake.table("event_rollup")
    total = out.count()
    distinct_pk = out.select("window_start", "event_type").distinct().count()
    assert total == distinct_pk, "replay produced PK duplicates — upsert not idempotent"
    batch = QUERIES["q26_tumbling_5min"](spark, sf_dir)
    assert total == batch.count()


def test_dedup_stream_drops_redeliveries(spark, sf_dir, tmp_path):
    """A doubled feed (every file delivered twice) must dedup back to the
    distinct event_id count — bounded-state streaming exact-dedup."""
    import shutil

    from at_data_pipelines_spark.streaming import dedup_stream
    from at_data_pipelines_spark.streaming.events import EVENTS_SCHEMA, read_events_stream

    src = tmp_path / "doubled"
    src.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", src / "a.parquet")
    shutil.copy(f"{sf_dir}/events.parquet", src / "b.parquet")
    stream = read_events_stream(spark, str(src))
    got = _run_to_memory_append(spark, dedup_stream(stream), "dedup_stream_t")
    n_distinct = load_table(spark, sf_dir, "events").select("event_id").distinct().count()
    assert got.count() == n_distinct


def test_enrich_stream_matches_batch_join(spark, sf_dir, events_stream):
    from at_data_pipelines_spark.streaming import enrich_stream

    dim = spark.createDataFrame(
        [(i, f"segment_{i % 3}") for i in range(200)], ["user_id", "segment"]
    )
    got = _run_to_memory_append(
        spark, enrich_stream(events_stream, dim), "enrich_t"
    )
    batch = load_table(spark, sf_dir, "events").join(F.broadcast(dim), "user_id", "left")
    assert got.count() == batch.count()
    g = got.groupBy("segment").count().toPandas().set_index("segment")["count"].sort_index()
    b = batch.groupBy("segment").count().toPandas().set_index("segment")["count"].sort_index()
    assert (g == b).all()


def test_purchase_attribution_matches_batch(spark, sf_dir, events_stream):
    """Stream-stream interval join result must equal the equivalent batch
    join (the watermark only bounds state, never drops pairs when the
    whole feed replays in order)."""
    from at_data_pipelines_spark.streaming import purchase_attribution_stream

    got = _run_to_memory_append(
        spark, purchase_attribution_stream(events_stream), "attr_t"
    )
    e = load_table(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("event_id").alias("click_id"),
        F.col("ts_us").alias("click_us"),
    )
    purch = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("event_id").alias("purchase_id"),
        F.col("ts_us").alias("purchase_us"),
    )
    batch = purch.join(
        clicks,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("click_us") <= F.col("purchase_us"))
        & (F.col("click_us") >= F.col("purchase_us") - 30 * 60 * 1_000_000),
    )
    assert got.count() == batch.count()
    gp = {(r.purchase_id, r.click_id) for r in got.select("purchase_id", "click_id").collect()}
    bp = {(r.purchase_id, r.click_id) for r in batch.select("purchase_id", "click_id").collect()}
    assert gp == bp


def _run_to_memory_append(spark, df, name):
    q = (
        df.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return spark.sql(f"SELECT * FROM {name}")


def test_near_dup_ingest_stream(spark, tmp_path):
    """Streaming LSH ingest: batch 2's near-dups of batch 1 are dropped
    via the persisted index, within-batch dup groups collapse to one
    representative, and a full replay adds nothing (idempotent)."""
    from at_data_pipelines_spark.streaming import (
        create_ingest_tables,
        near_dup_ingest_stream,
    )

    doc_schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
    )
    base = "the quick brown fox jumps over the lazy dog again and again today"
    uniq = [
        "completely different content about spark structured streaming state stores",
        "yet another unrelated document mentioning parquet row groups and statistics",
    ]
    batch1 = [(1, base), (2, base + " extra"), (3, uniq[0])]  # 1≈2 near-dups
    batch2 = [(10, base + " yes"), (11, uniq[1])]  # 10 ≈ corpus doc 1
    src = tmp_path / "docs_src"
    src.mkdir()
    spark.createDataFrame(batch1, doc_schema).coalesce(1).write.parquet(str(src / "b1"))

    lake = Lakehouse(spark, str(tmp_path / "ingest_lake"))
    create_ingest_tables(lake, "docs", "band_index", doc_schema)

    def run(ckpt):
        stream = spark.readStream.schema(doc_schema).option(
            "maxFilesPerTrigger", "1"
        ).parquet(f"{src}/*")
        q = near_dup_ingest_stream(
            stream, lake, "docs", "band_index", str(tmp_path / ckpt)
        )
        q.awaitTermination(180)

    run("ck1")
    kept1 = {r.doc_id for r in lake.table("docs").collect()}
    assert 3 in kept1 and len(kept1 & {1, 2}) == 1  # one rep of the dup pair

    spark.createDataFrame(batch2, doc_schema).coalesce(1).write.parquet(str(src / "b2"))
    run("ck2")  # fresh checkpoint: reprocesses b1 (replay) + b2
    kept2 = {r.doc_id for r in lake.table("docs").collect()}
    assert kept2 >= kept1  # replay added no duplicates of batch-1 content
    assert 10 not in kept2  # near-dup of corpus doc dropped by index lookup
    assert 11 in kept2  # novel doc admitted
    # index holds exactly the bands of kept docs
    idx_ids = {r.doc_id for r in lake.table("band_index").collect()}
    assert idx_ids == kept2


def test_near_dup_ingest_short_docs_guarded(spark, tmp_path):
    """Documents with fewer than shingle_n tokens have no MinHash bands;
    the exact-fingerprint guard (band = -1, key = md5(text)) must still
    dedup their exact copies within a batch and across batches."""
    from at_data_pipelines_spark.streaming import (
        create_ingest_tables,
        near_dup_ingest_stream,
    )

    doc_schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
    )
    batch1 = [(1, "hi"), (2, "hi"), (3, "ok then")]  # all < 3 tokens; 1≡2
    batch2 = [(10, "hi"), (11, "new two")]  # 10 is an exact copy of corpus
    src = tmp_path / "short_src"
    src.mkdir()
    spark.createDataFrame(batch1, doc_schema).coalesce(1).write.parquet(str(src / "b1"))

    lake = Lakehouse(spark, str(tmp_path / "short_lake"))
    create_ingest_tables(lake, "docs", "band_index", doc_schema)

    def run(ckpt):
        stream = spark.readStream.schema(doc_schema).option(
            "maxFilesPerTrigger", "1"
        ).parquet(f"{src}/*")
        q = near_dup_ingest_stream(
            stream, lake, "docs", "band_index", str(tmp_path / ckpt)
        )
        q.awaitTermination(180)

    run("ck1")
    kept1 = {r.doc_id for r in lake.table("docs").collect()}
    assert len(kept1 & {1, 2}) == 1  # within-batch exact dup collapsed
    assert 3 in kept1

    spark.createDataFrame(batch2, doc_schema).coalesce(1).write.parquet(str(src / "b2"))
    run("ck2")
    kept2 = {r.doc_id for r in lake.table("docs").collect()}
    assert 10 not in kept2  # exact copy of a kept short doc is dropped
    assert 11 in kept2


def test_ann_index_maintenance_stream(spark, sf_dir, tmp_path):
    """Streaming index maintenance: embeddings arriving as a stream are
    encoded under the saved quantizer and upserted into {prefix}_codes.
    Post-stream probes must match a batch-built index exactly, and a
    full replay (fresh checkpoint) must add nothing."""
    import numpy as np

    from at_data_pipelines_spark.llmops import ann_index
    from at_data_pipelines_spark.streaming import ann_index_maintenance_stream

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    n_total = emb.count()

    # train on the full corpus, save ONLY the quantizer (no codes yet)
    lake = Lakehouse(spark, str(tmp_path / "ann_stream_lake"))
    idx = ann_index.train_index(emb, n_centroids=8, m=4, k=16, seed=42)
    ann_index.save_index(lake, "corpus", idx)

    # stream the embeddings in two parquet files
    src = tmp_path / "vec_src"
    src.mkdir()
    emb.filter(F.col("vec_id") % 2 == 0).write.parquet(str(src / "b1"))
    emb.filter(F.col("vec_id") % 2 == 1).write.parquet(str(src / "b2"))

    schema = emb.schema

    def run(ckpt):
        stream = spark.readStream.schema(schema).option(
            "maxFilesPerTrigger", "1"
        ).parquet(f"{src}/*")
        q = ann_index_maintenance_stream(
            stream, lake, "corpus", str(tmp_path / ckpt)
        )
        q.awaitTermination(180)

    run("ck1")
    codes = lake.table("corpus_codes")
    assert codes.count() == n_total

    # probes against streamed codes == probes against a batch encode
    queries = emb.filter(F.col("vec_id") < 8)
    batch_enc = ann_index.encode_corpus(emb, idx)
    want = {
        (r.query_id, r.neighbor_id, round(r.cosine, 12))
        for r in ann_index.topk(emb, queries, idx, encoded=batch_enc, k=5).collect()
    }
    got = {
        (r.query_id, r.neighbor_id, round(r.cosine, 12))
        for r in ann_index.topk(emb, queries, idx, encoded=codes, k=5).collect()
    }
    assert got == want

    # replay everything with a fresh checkpoint: idempotent
    run("ck2")
    assert lake.table("corpus_codes").count() == n_total
    again = {
        (r.query_id, r.neighbor_id, round(r.cosine, 12))
        for r in ann_index.topk(
            emb, queries, idx, encoded=lake.table("corpus_codes"), k=5
        ).collect()
    }
    assert again == want


def test_sessionize_to_lakehouse_multi_batch_matches_q61(spark, sf_dir, tmp_path):
    """Production sessionization shape: append-mode (watermark-finalized)
    session windows through the lakehouse PK-upsert sink, fed in FOUR
    chronological micro-batches (maxFilesPerTrigger=1) plus a sentinel
    file past the watermark horizon (forces a full flush of a finite
    feed), then the whole feed REPLAYED with a fresh checkpoint. Final
    table must equal the q61 batch oracle exactly, with zero PK dups."""
    from pyspark.sql.window import Window

    from at_data_pipelines_spark.streaming import (
        read_events_stream,
        sessionize_to_lakehouse,
    )

    ev = load_table(spark, sf_dir, "events")
    feed_df = ev.select(
        "event_id",
        F.col("ts_ns").alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    ).withColumn("_chunk", F.ntile(4).over(Window.orderBy("ts")))
    feed = str(tmp_path / "feed")
    for i in range(1, 5):  # chronological chunk files => in-order arrival
        feed_df.filter(F.col("_chunk") == i).drop("_chunk").coalesce(1).write.mode(
            "append"
        ).parquet(feed)
    # sentinel: one fake-user event 3 hours past the max ts pushes the final
    # watermark beyond every real session's close so append emits them all
    max_ns = feed_df.agg(F.max("ts")).collect()[0][0]
    sentinel = [(999_999, max_ns + 3 * 3600 * 10**9, -1, "sentinel", 0.0, "{}")]
    import time as _time

    _time.sleep(1.1)  # later mtime => processed last
    spark.createDataFrame(
        sentinel, feed_df.drop("_chunk").schema
    ).coalesce(1).write.mode("append").parquet(feed)

    lake = Lakehouse(spark, str(tmp_path / "slake"))
    for i in range(2):  # second pass = full replay, fresh checkpoint
        stream = read_events_stream(spark, feed, max_files_per_trigger=1)
        q = sessionize_to_lakehouse(stream, lake, "sessions", str(tmp_path / f"sck{i}"))
        q.awaitTermination(300)

    out = lake.table("sessions").filter(F.col("user_id") >= 0)
    assert out.count() == out.select("user_id", "session_start_us").distinct().count()
    got = {
        (r.user_id, r.session_start_us, r.session_end_us, r.n_events,
         round(r.total_value, 2))
        for r in out.collect()
    }
    exp = {
        (r.user_id, r.session_start_us, r.session_end_us, r.n_events,
         round(r.total_value, 2))
        for r in QUERIES["q61_stream_sessionization"](spark, sf_dir).collect()
    }
    assert got == exp


def test_sessionize_to_lakehouse_merges_late_bridge(spark, tmp_path):
    """A late bridging event must MERGE two open partial sessions in state
    before emission: batch1 = A@10:00 and A@10:40 (30-min gap => two open
    sessions), batch2 = A@10:20 (late but inside the 1-hour watermark),
    batch3 = sentinel far ahead (flushes). Exactly ONE final session
    10:00-11:10 with 3 events may land in the table — no stale partials,
    and a full replay converges to the same row."""
    import time as _time

    from at_data_pipelines_spark.streaming import (
        read_events_stream,
        sessionize_to_lakehouse,
    )

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.LongType()),  # epoch nanos
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )
    base_us = 1_700_000_000_000_000  # arbitrary epoch micros anchor
    m = 60 * 1_000_000

    def ns(mins):
        return (base_us + mins * m) * 1000

    feed = str(tmp_path / "mfeed")
    batches = [
        [(1, ns(0), 7, "click", 1.0, "{}"), (2, ns(40), 7, "click", 2.0, "{}")],
        [(3, ns(20), 7, "click", 4.0, "{}")],  # late bridge, inside watermark
        [(9, ns(600), -1, "sentinel", 0.0, "{}")],  # watermark flush
    ]
    for b in batches:
        spark.createDataFrame(b, schema).coalesce(1).write.mode("append").parquet(feed)
        _time.sleep(1.1)  # distinct mtimes => deterministic batch order

    lake = Lakehouse(spark, str(tmp_path / "mlake"))
    for i in range(2):  # replay idempotence on the merge case too
        stream = read_events_stream(spark, feed, max_files_per_trigger=1)
        q = sessionize_to_lakehouse(stream, lake, "sessions", str(tmp_path / f"mck{i}"))
        q.awaitTermination(120)

    rows = lake.table("sessions").filter(F.col("user_id") >= 0).collect()
    got = {
        (r.user_id, r.session_start_us, r.session_end_us, r.n_events, r.total_value)
        for r in rows
    }
    assert got == {(7, base_us, base_us + 70 * m, 3, 7.0)}, got


def test_ann_index_maintenance_stream_lsm_mode(spark, sf_dir, tmp_path):
    """compact_every=N: each batch is an O(batch) append-only insert;
    every Nth batch pays the PK compaction. After a replay plus a final
    optimize, the codes table must be exactly the deduped corpus and
    probe identically to a batch-built index."""
    from at_data_pipelines_spark.llmops import ann_index
    from at_data_pipelines_spark.streaming import ann_index_maintenance_stream

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    n_total = emb.count()

    lake = Lakehouse(spark, str(tmp_path / "lsm_lake"))
    idx = ann_index.train_index(emb, n_centroids=8, m=4, k=16, seed=42)
    ann_index.save_index(lake, "corpus", idx)

    src = tmp_path / "lsm_src"
    src.mkdir()
    for i in range(4):
        emb.filter(F.col("vec_id") % 4 == i).write.parquet(str(src / f"b{i}"))

    def run(ckpt):
        stream = spark.readStream.schema(emb.schema).option(
            "maxFilesPerTrigger", "1"
        ).parquet(f"{src}/*")
        q = ann_index_maintenance_stream(
            stream, lake, "corpus", str(tmp_path / ckpt), compact_every=3
        )
        q.awaitTermination(180)

    run("ck1")
    run("ck2")  # full replay: duplicate inserts pending compaction
    lake.optimize("corpus_codes")  # end-of-stream compaction
    codes = lake.table("corpus_codes")
    assert codes.count() == n_total

    queries = emb.filter(F.col("vec_id") < 8)
    batch_enc = ann_index.encode_corpus(emb, idx)
    want = {
        (r.query_id, r.neighbor_id, round(r.cosine, 12))
        for r in ann_index.topk(emb, queries, idx, encoded=batch_enc, k=5).collect()
    }
    got = {
        (r.query_id, r.neighbor_id, round(r.cosine, 12))
        for r in ann_index.topk(emb, queries, idx, encoded=codes, k=5).collect()
    }
    assert got == want


def test_stream_sink_maintains_zone_maps(spark, sf_dir, tmp_path, events_stream):
    """A streaming sink into a stats-enabled table must keep manifest zone
    maps consistent across micro-batch upserts: scan() stays exactly
    equal to table().filter() and prunes once windows diverge."""
    import pyspark.sql.functions as F

    lake = Lakehouse(spark, str(tmp_path / "lake"))
    schema = T.StructType(
        [
            T.StructField("window_start", T.TimestampType()),
            T.StructField("window_end", T.TimestampType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("total_value", T.DoubleType()),
        ]
    )
    lake.create(
        "event_rollup",
        schema,
        [],
        ["window_start", "event_type"],
        stats_columns=["n_events", "total_value"],
    )
    q = stream_to_lakehouse(
        windowed_aggregation(events_stream),
        lake,
        "event_rollup",
        str(tmp_path / "ckpt_zm"),
    )
    q.awaitTermination(120)
    meta = lake._load_meta("event_rollup")
    assert meta.zone_maps, "streaming upserts must record zone maps"
    hi = lake.table("event_rollup").agg(F.max("n_events")).collect()[0][0]
    got = lake.scan("event_rollup", where={"n_events": (hi, None)})
    exp = lake.table("event_rollup").filter(F.col("n_events") >= hi)
    assert got.count() == exp.count() > 0


def test_windowed_distinct_users_matches_batch_kmv(spark, sf_dir, tmp_path):
    """Bounded-state streaming distinct (KMV in applyInPandasWithState)
    must converge to EXACTLY the batch kmv_distinct estimate per
    (window, type) — same md5 hash spec, same bottom-k, same estimator."""
    import pyspark.sql.functions as F

    from at_data_pipelines_spark.io import load_table
    from at_data_pipelines_spark.ops.sketch import kmv_distinct
    from at_data_pipelines_spark.streaming import read_events_stream, windowed_distinct_users

    stream = read_events_stream(spark, f"{sf_dir}/events.parquet")
    out = windowed_distinct_users(stream, window_minutes=60, k=32)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("wdu")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    emitted = spark.sql("select * from wdu").toPandas()
    # last emission per key is the converged sketch
    last = (
        emitted.groupby(["win_start_us", "event_type"]).last().reset_index()
    )
    got = {
        (int(r.win_start_us), r.event_type): r.distinct_est
        for r in last.itertuples()
    }
    width_us = 60 * 60 * 1_000_000
    ev = load_table(spark, sf_dir, "events").withColumn(
        "win_start_us", F.col("ts_us") - F.pmod(F.col("ts_us"), F.lit(width_us))
    )
    exp = {
        (r.win_start_us, r.event_type): r.distinct_est
        for r in kmv_distinct(
            ev, ["win_start_us", "event_type"], "user_id", k=32
        ).collect()
    }
    assert got == exp
    # bounded state: never more than k hashes per group
    assert (emitted["state_size"] <= 32).all()


def test_windowed_distinct_users_evicts_closed_windows(spark, tmp_path):
    """r6 verdict #2: (window, type) groups must leave the state store
    once the event-time watermark passes window end + lateness —
    otherwise closed windows accrete forever on an infinite stream. The
    state row count must FALL back after later events advance the
    watermark past the old windows."""
    import pyspark.sql.types as T

    from at_data_pipelines_spark.streaming import windowed_distinct_users

    schema = T.StructType(
        [
            T.StructField("ts_us", T.LongType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
        ]
    )
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    (tmp_path / "src").mkdir()
    W = 5 * 60 * 1_000_000  # 5-minute window in µs
    emitted: list = []

    def drain():
        stream = spark.readStream.schema(schema).parquet(src)
        out = windowed_distinct_users(
            stream, window_minutes=5, k=8, evict_lateness_ms=60_000
        )
        q = (
            out.writeStream.outputMode("update")
            .foreachBatch(lambda df, eid: emitted.extend(df.collect()))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    def state_keys():
        st = spark.read.format("statestore").load(ckpt)
        return sorted(r.key.win_start_us for r in st.collect())

    # run 1: two live windows (1 and 2)
    spark.createDataFrame(
        [(W + 1, 1, "click"), (W + 2, 2, "click"), (2 * W + 1, 3, "click")], schema
    ).coalesce(1).write.mode("append").parquet(src)
    drain()
    assert state_keys() == [W, 2 * W]

    # run 2: one event far in the future sweeps the watermark past both
    # old windows' close + lateness -> they are evicted; only the new
    # window's group remains
    spark.createDataFrame([(50 * W, 4, "click")], schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    drain()
    assert state_keys() == [50 * W], "closed windows must leave the state store"

    # the evicted windows' estimates were emitted while they were live
    got = {(r.win_start_us, r.event_type): r.distinct_est for r in emitted}
    assert got[(W, "click")] == 2.0
    assert got[(2 * W, "click")] == 1.0
    assert got[(50 * W, "click")] == 1.0


def test_stream_to_lakehouse_lsm_mode(spark, sf_dir, tmp_path, events_stream):
    """compact_every=N: append-only batches with amortized PK compaction
    must converge (after a final optimize) to the same table the
    per-batch-upsert mode produces."""
    lake = Lakehouse(spark, str(tmp_path / "lake"))
    schema = T.StructType(
        [
            T.StructField("window_start", T.TimestampType()),
            T.StructField("window_end", T.TimestampType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("total_value", T.DoubleType()),
        ]
    )
    for t in ("rollup_upsert", "rollup_lsm"):
        lake.create(t, schema, [], ["window_start", "event_type"])
    q = stream_to_lakehouse(
        windowed_aggregation(events_stream), lake, "rollup_upsert",
        str(tmp_path / "ck_u"),
    )
    q.awaitTermination(120)
    q = stream_to_lakehouse(
        windowed_aggregation(events_stream), lake, "rollup_lsm",
        str(tmp_path / "ck_l"), compact_every=4,
    )
    q.awaitTermination(120)
    lake.optimize("rollup_lsm")  # close the final partial window
    a = sorted(map(tuple, lake.table("rollup_upsert").collect()))
    b = sorted(map(tuple, lake.table("rollup_lsm").collect()))
    assert a == b


def test_run_sessions_daily_heals_trailing_horizon(spark, sf_dir, tmp_path):
    """r6 verdict #8: the daily lambda entry point must (1) drain the
    stream sink, (2) batch-repair ONLY the trailing horizon — a planted
    replay-divergence fragment inside the horizon is healed, one before
    the horizon is deliberately left alone (scoped cost), and every
    session starting in the horizon equals the batch truth."""
    import pyspark.sql.functions as F

    from at_data_pipelines_spark.io import load_table
    from at_data_pipelines_spark.streaming import (
        read_events_stream,
        repair_sessions,
        run_sessions_daily,
    )
    from at_data_pipelines_spark.streaming.events import (
        SESSION_TABLE_SCHEMA,
        _interval_us,
    )

    lake = Lakehouse(spark, str(tmp_path / "lake"))
    events = load_table(spark, sf_dir, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    repair_sessions(events, lake, "truth")  # batch ground truth
    truth = lake.table("truth")
    b = truth.agg(
        F.min("session_start_us").alias("first"),
        F.max("session_end_us").alias("last"),
    ).collect()[0]
    span_us = int(b.last) - int(b.first)
    # horizon covering the second half of the data
    horizon_hours = max(1, (span_us // 2) // 3_600_000_000)
    horizon = f"{horizon_hours} hours"
    cut = int(b.last) - horizon_hours * 3_600_000_000

    # seed the sessions table with the truth plus two stale fragments:
    # one inside the repair horizon (must be healed), one before it
    # (must be left untouched — repair is scoped)
    lake.create("sessions", SESSION_TABLE_SCHEMA, [], ["user_id", "session_start_us"])
    stale_out = (int(b.first) + cut) // 2  # before the horizon
    stale_in = (cut + int(b.last)) // 2  # inside the horizon
    stale = spark.createDataFrame(
        [
            (11, stale_out, stale_out + 60_000_000, 4, 2.0),
            (12, stale_in, stale_in + 60_000_000, 5, 3.0),
        ],
        SESSION_TABLE_SCHEMA,
    )
    lake.upsert("sessions", truth.unionByName(stale))

    stream = read_events_stream(spark, f"{sf_dir}/events.parquet")
    run_sessions_daily(
        stream,
        events,
        lake,
        "sessions",
        str(tmp_path / "ckpt"),
        repair_horizon=horizon,
    )

    got = lake.table("sessions")
    # inside the horizon: exactly the batch truth (fragment healed)
    got_in = sorted(
        map(tuple, got.filter(F.col("session_start_us") >= cut).collect())
    )
    exp_in = sorted(
        map(tuple, truth.filter(F.col("session_start_us") >= cut).collect())
    )
    assert got_in == exp_in
    assert (stale_in,) not in {(r.session_start_us,) for r in got.collect()}
    # before the horizon: untouched — including the planted fragment
    assert got.filter(F.col("session_start_us") == stale_out).count() == 1
    # repair_from derivation used the stored hi; slice extended by gap
    assert _interval_us("30 minutes") == 1_800_000_000


def test_repair_sessions_removes_stale_fragments(spark, sf_dir, tmp_path):
    """The documented append-sink caveat, repaired: plant a stale
    overlapping session fragment, run the batch repair over the full
    event slice, and the table must equal the batch truth exactly."""
    import pyspark.sql.functions as F

    from at_data_pipelines_spark.io import load_table
    from at_data_pipelines_spark.streaming import repair_sessions
    from at_data_pipelines_spark.streaming.events import SESSION_TABLE_SCHEMA

    lake = Lakehouse(spark, str(tmp_path / "lake"))
    events = load_table(spark, sf_dir, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    # ground truth via the same batch sessionization
    repair_sessions(events, lake, "truth")
    truth = sorted(map(tuple, lake.table("truth").collect()))
    # sessions table with a planted stale fragment: a fake session for a
    # real user starting mid-range that the live run could have left
    lake.create("sessions", SESSION_TABLE_SCHEMA, [], ["user_id", "session_start_us"])
    real = lake.table("truth")
    mid = real.agg(F.expr("percentile(session_start_us, 0.5)")).collect()[0][0]
    b = real.agg(
        F.max("session_start_us").alias("last_start"),
        F.max("session_end_us").alias("last_end"),
    ).collect()[0]
    stale = spark.createDataFrame(
        [
            (1, int(mid) + 123_456, int(mid) + 999_999, 7, 1.23),
            # TAIL fragment: starts AFTER every true session start (but
            # inside the last true session's span) — the case a
            # max(start) delete bound would leave alive (r6 review)
            (2, (int(b.last_start) + int(b.last_end)) // 2, int(b.last_end), 3, 0.5),
        ],
        SESSION_TABLE_SCHEMA,
    )
    lake.upsert("sessions", real.unionByName(stale))
    assert len(sorted(map(tuple, lake.table("sessions").collect()))) == len(truth) + 2
    repair_sessions(events, lake, "sessions")
    assert sorted(map(tuple, lake.table("sessions").collect())) == truth


def test_stream_to_lakehouse_pkless_append_sink(spark, sf_dir, tmp_path):
    """compact_every on a PK-LESS table: the LSM maintenance pass is
    compact() — every streamed row survives (duplicates are data
    without a PK), pending deltas stay bounded by the cadence, and the
    history shows real compact commits interleaved with the appends."""
    from at_data_pipelines_spark.io import load_table

    batch = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value", "ts_us"
    )
    src = str(tmp_path / "src")
    batch.repartition(6).write.parquet(src)
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("ts_us", T.LongType()),
        ]
    )
    lake = Lakehouse(spark, str(tmp_path / "lake"))
    lake.create("raw_events", schema, ["event_type"], [])  # append-only sink
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 2).parquet(src)
    )
    q = stream_to_lakehouse(
        stream, lake, "raw_events", str(tmp_path / "ck"), compact_every=2
    )
    q.awaitTermination(120)
    cols = ["event_id", "user_id", "event_type", "value", "ts_us"]
    got = sorted(map(tuple, lake.table("raw_events").select(*cols).collect()))
    want = sorted(map(tuple, batch.select(*cols).collect()))
    assert got == want, "PK-less sink must preserve every streamed row"
    assert lake.pending_deltas("raw_events") < 2, "cadence not honored"
    actions = [h["action"] for h in lake.history("raw_events")]
    assert "compact" in actions and "insert(append)" in actions
