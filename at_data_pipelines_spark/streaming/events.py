"""Structured Streaming ops over the events table (SURVEY §2.9 extension).

The reference is strictly daily batch; its streaming-adjacent semantics —
idempotent late/duplicate handling via append + PK dedup, incremental
trailing-window recompute — map to watermarked windowed aggregation and a
``foreachBatch`` upsert into the Lakehouse (same optimize() dedup, so the
sink stays idempotent under replays: effectively exactly-once).

Local smoke tests drive parquet files through the stream with
``availableNow`` + ``processAllAvailable``; on a cluster the same plans
run against Kafka unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..catalog import Lakehouse
from ..io import _normalize_events_ts, events_ts_kind


def _events_schema(ts_type: T.DataType) -> T.StructType:
    return T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", ts_type),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )


#: default schema (current driver testdata: TIMESTAMP_NTZ µs — see io.py)
EVENTS_SCHEMA = _events_schema(T.TimestampNTZType())


def read_events_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Streaming read of events parquet. The ``ts`` physical type is
    sniffed from the footer (TIMESTAMP_NTZ µs / TIMESTAMP(NANOS) / raw
    int64 — same variants as the batch loader, ``io.py``) and normalized
    to ``ts_ns``/``ts_us`` int64 plus a proper event-time ``ts`` column,
    all timezone-independently. File sources must be directories; a
    single-file path is wrapped via a symlink dir.
    ``max_files_per_trigger`` chunks the backlog into multiple
    micro-batches (also under availableNow), for exercising cross-batch
    state paths."""
    import hashlib
    import os
    import tempfile

    if os.path.isfile(path):
        d = os.path.join(
            tempfile.gettempdir(),
            f"stream_src_{hashlib.md5(path.encode()).hexdigest()[:12]}",
        )
        os.makedirs(d, exist_ok=True)
        link = os.path.join(d, os.path.basename(path))
        if not os.path.exists(link):
            os.symlink(path, link)
        path = d
    kind = events_ts_kind(path)
    if kind in ("long", "ns"):
        if kind == "ns":
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        schema = _events_schema(T.LongType())
    elif kind == "ntz":
        schema = _events_schema(T.TimestampNTZType())
    else:
        schema = _events_schema(T.TimestampType())
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", int(max_files_per_trigger))
    raw = reader.parquet(path)
    return _normalize_events_ts(raw, kind)


def windowed_aggregation(
    events: DataFrame, window: str = "5 minutes", watermark: str = "10 minutes"
) -> DataFrame:
    """Tumbling-window counts/sums per event type with late-data watermark.
    (The batch-equivalent oracle is q26_tumbling_5min.)"""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), "event_type")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("total_value"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sessionize_stream(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "1 hour"
) -> DataFrame:
    """Session windows per user (inactivity gap) — the streaming version of
    q25_sessionization's lag+cumsum batch idiom."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("win"), "user_id")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("total_value"))
        .select(
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "user_id",
            "n_events",
            "total_value",
        )
    )


def running_user_stats(events: DataFrame) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: per-user
    running (count, sum, max) emitted per micro-batch — the streaming
    analogue of the reference's incremental warm-up recompute, but with
    state held by the engine instead of re-reads.

    State is a single row per user (bounded memory); at cluster scale
    state lives in the state store keyed by the shuffle partitioning.
    """
    import pandas as pd  # noqa: F811
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = "user_id long, n_events long, total_value double, max_value double"
    state_schema = "n long, s double, m double"

    def fn(key, pdfs, state: GroupState):
        n, s, m = state.get if state.exists else (0, 0.0, float("-inf"))
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf["value"].sum())
            if len(pdf):
                m = max(m, float(pdf["value"].max()))
        state.update((n, s, m))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [s], "max_value": [m]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        fn, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def dedup_stream(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Streaming exact-dedup of an at-least-once feed:
    ``dropDuplicatesWithinWatermark`` on the event id keeps the first
    arrival and drops re-deliveries that land within the watermark.

    This is the streaming counterpart of the batch ``exact_dedup`` /
    PK-upsert pair: state is one key per id with event-time expiry, so
    memory is bounded by the watermark horizon × arrival rate, not the
    stream's lifetime (plain ``dropDuplicates`` on a stream would grow
    state forever)."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def enrich_stream(events: DataFrame, dim: DataFrame, on: str = "user_id") -> DataFrame:
    """Stream-static dimension enrichment: the static side broadcasts per
    micro-batch (re-resolved each batch, so a slowly-changing dimension
    refreshes without restarting the query). No state, no watermark — the
    canonical decorate-a-feed join."""
    return events.join(F.broadcast(dim), on, "left")


def purchase_attribution_stream(
    events: DataFrame, attribution_window: str = "30 minutes", watermark: str = "1 hour"
) -> DataFrame:
    """Stream-stream event-time interval join: attribute each ``purchase``
    event to the same user's ``click`` events in the preceding
    ``attribution_window``.

    Both sides carry watermarks and the join condition bounds event time
    on both ends, so the state store can expire rows once the watermark
    passes the interval — the requirement for an unbounded-input join to
    run with bounded state. At cluster scale this is a hash shuffle on
    user_id with per-key interval state, Spark's canonical
    click-attribution shape."""
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", watermark)
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
            F.col("value").alias("amount"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    return purchases.join(
        clicks,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (F.col("click_ts") >= F.col("purchase_ts") - F.expr(f"INTERVAL {attribution_window}")),
    ).select(
        F.col("p_user").alias("user_id"),
        "purchase_id",
        "purchase_ts",
        "amount",
        "click_id",
        "click_ts",
    )


#: lakehouse session table written by ``sessionize_to_lakehouse`` —
#: event-time boundaries as int64 epoch micros (timezone-independent),
#: PK (user_id, session_start_us)
SESSION_TABLE_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start_us", T.LongType()),
        T.StructField("session_end_us", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)


def _session_agg(events: DataFrame, gap: str) -> DataFrame:
    """ONE definition of the session aggregate shape, shared by the
    streaming sink and the batch repair — the repair only reconverges to
    the sink's rows if the cents scaling, epoch-µs boundaries, and
    column names are byte-equivalent (they had been two copies)."""
    return (
        events.groupBy(F.session_window("ts", gap).alias("win"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"),
        )
        .select(
            "user_id",
            F.unix_micros(F.col("win.start")).alias("session_start_us"),
            F.unix_micros(F.col("win.end")).alias("session_end_us"),
            "n_events",
            (F.col("cents").cast("double") / 100).alias("total_value"),
        )
    )


def sessionize_to_lakehouse(
    events: DataFrame,
    lake: Lakehouse,
    table: str,
    checkpoint_dir: str,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    available_now: bool = True,
):
    """Production-shaped sessionization: ``session_window`` sessions land
    in a lakehouse PK table, instead of only in a memory sink (the q61
    gate shape).

    Output mode is APPEND — watermark-finalized sessions. Spark rejects
    update mode for session-window aggregations outright
    (STREAMING_OUTPUT_MODE.UNSUPPORTED_OPERATION: merging sessions would
    emit evolving rows under CHANGING keys, which no keyed sink can
    retract) — and that restriction is exactly why append is the correct
    production shape: a session is emitted once, when the watermark
    passes its close, with all merges of late events already applied in
    the state store. The sink is then a plain PK upsert
    (``insert + optimize``), so a replayed micro-batch — or a full
    re-feed with a fresh checkpoint that sees the SAME events inside the
    watermark — reconverges to the identical table (effective
    exactly-once). One honest caveat: reconvergence is keyed by
    (user, session_start). If a replay observes DIFFERENT watermark
    drops than the original run (e.g. a bridging late event was dropped
    live but survives a single-batch replay, merging two sessions into
    one), the merged session overwrites its own start key but the other
    fragment's row remains — stale overlap that no insert-only keyed
    sink can retract. That is inherent to append-mode session sinks;
    the repair is the batch backfill (the q61 batch query overwriting
    the affected horizon), same as any streaming/batch lambda pair.
    Emission latency is bounded by the
    watermark delay; an infinite feed flushes continuously, a finite
    availableNow drain leaves sessions younger than the watermark
    horizon in state (they emit on the next run — or append a sentinel
    event past the horizon, as the tests do, to force a full flush).

    Event-time boundaries are stored as int64 epoch micros and sums as
    exact cents, per the repo determinism policy (timezone-independent,
    replay-bit-stable)."""
    sessions = _session_agg(events.withWatermark("ts", watermark), gap)
    lake.create(
        table, SESSION_TABLE_SCHEMA, [], ["user_id", "session_start_us"], mode="skip"
    )

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        lake.upsert(table, batch_df)

    writer = (
        sessions.writeStream.outputMode("append")
        .foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_to_lakehouse(
    agg: DataFrame,
    lake: Lakehouse,
    table: str,
    checkpoint_dir: str,
    available_now: bool = True,
    compact_every: int = 1,
):
    """foreachBatch upsert sink: each micro-batch runs the Lakehouse
    append + PK-dedup optimize, so replayed batches are idempotent
    (exactly-once effect on the table).

    ``compact_every=N>1`` is the LSM shape (same knob as the ANN ingest
    sink): each batch is an O(batch) append-only insert and the
    compaction runs only when the manifest's pending-delta count
    reaches N — amortized to O(touched/N), restart-proof because the
    cadence is read from the manifest, not a driver counter. The
    maintenance pass is ``compact()``: PK tables get the keep-latest
    optimize, PK-LESS tables (raw event sinks) get the row-preserving
    small-file merge — so this one sink serves both shapes. Between
    compactions readers see append semantics (PK duplicates resolve at
    the next optimize); use the default for strongest per-batch
    guarantees. The compaction may also be run OUT-OF-BAND (a separate
    maintenance job) while the stream keeps appending: a rewrite now
    rebases over appends to partitions it didn't touch instead of
    losing the race to every micro-batch."""

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if compact_every <= 1:
            lake.upsert(table, batch_df)
            return
        lake.insert(table, batch_df)
        if lake.pending_deltas(table) >= compact_every:
            lake.compact(table)

    writer = agg.writeStream.outputMode("update").foreachBatch(sink).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_distinct_users(
    events: DataFrame,
    window_minutes: int = 5,
    k: int = 64,
    evict_lateness_ms: int | None = 30 * 60 * 1000,
) -> DataFrame:
    """Bounded-state streaming distinct-count: per (tumbling window,
    event_type), maintain the k SMALLEST md5-48-bit user hashes in state
    (``ops/sketch.py``'s KMV bottom-k) and emit the running distinct-user
    estimate each micro-batch.

    Why this exists: an EXACT streaming distinct needs a per-group set
    that grows with cardinality — the classic state-store explosion. The
    KMV sketch caps state at k doubles per group, forever, with
    ~1/sqrt(k-2) relative error, and — because the hash is the engine-
    reproducible md5 spec — the converged estimate equals the BATCH
    ``kmv_distinct`` on the same data exactly (asserted in
    test_streaming.py), replay-deterministic like every sink here.

    State shape: array<double> of ≤k hashes; merging a batch is
    merge+sort+truncate in the Arrow-batched python fn. The window id is
    a derived epoch bucket, so group keys are (window_start_us, type) —
    a uniform shuffle.

    State EVICTION (r6 verdict #2): per-group state is bounded at k
    doubles, but on an infinite stream the NUMBER of (window, type)
    groups grows without bound unless closed windows are dropped.
    ``evict_lateness_ms`` arms an EVENT-TIME timeout per group at
    ``window_end + lateness``: an internal watermark on the event time
    (derived from ``ts_us`` — timezone-independent epoch arithmetic)
    advances with the data, and once it passes a window's end plus the
    lateness bound the group is removed from the state store — exactly
    a watermark-finalized window close, deterministic under replay
    (processing-time timeouts would evict on wall clock, which replays
    differently; they also interact badly with availableNow drains).
    An event arriving AFTER its window was evicted re-creates the group
    from empty — the same undercount a watermark drop would have
    produced. ``evict_lateness_ms=None`` restores the unbounded
    NoTimeout behavior for finite replays."""
    import pandas as pd  # noqa: F811
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    width_us = window_minutes * 60 * 1_000_000
    keyed = events.withColumn(
        "win_start_us",
        (F.col("ts_us") - F.pmod(F.col("ts_us"), F.lit(width_us))),
    )
    if evict_lateness_ms is not None:
        # event-time clock for the eviction watermark, derived from the
        # int64 epoch micros so any input (with or without a typed ts
        # column) gets the same timezone-independent behavior
        keyed = keyed.withColumn(
            "_evt_ts", F.timestamp_micros(F.col("ts_us"))
        ).withWatermark("_evt_ts", f"{int(evict_lateness_ms)} milliseconds")
    out_schema = (
        "win_start_us long, event_type string, distinct_est double, state_size int"
    )
    state_schema = "hashes array<double>"

    def fn(key, pdfs, state: GroupState):
        import hashlib

        if state.hasTimedOut:
            # watermark passed window end + lateness: the window is
            # final — drop the group from the state store and emit
            # nothing (its last estimate was emitted when it last
            # updated). The empty Arrow iterator must still be drained
            # or the worker protocol desynchronizes.
            for _ in pdfs:
                pass
            state.remove()
            return
        held = list(state.get[0]) if state.exists else []
        for pdf in pdfs:
            for uid in pdf["user_id"]:
                if pd.isna(uid):
                    continue  # NULL is not a distinct value (batch parity)
                h = hashlib.md5(str(int(uid)).encode()).hexdigest()[:12]
                held.append(int(h, 16) / 16**12)
        held = sorted(set(held))[:k]
        state.update((held,))
        if evict_lateness_ms is not None:
            # int(): the grouping key arrives as numpy int64, which the
            # state-properties JSON encoder refuses
            close_ms = (int(key[0]) + width_us) // 1000 + int(evict_lateness_ms)
            # a timeout timestamp must sit beyond the current watermark
            # (a window already past it closes at the next batch)
            state.setTimeoutTimestamp(
                max(close_ms, int(state.getCurrentWatermarkMs()) + 1)
            )
        if len(held) < k:
            est = float(len(held))
        else:
            est = round((k - 1) / held[-1], 6)
        yield pd.DataFrame(
            {
                "win_start_us": [key[0]],
                "event_type": [key[1]],
                "distinct_est": [est],
                "state_size": [len(held)],
            }
        )

    timeout = (
        GroupStateTimeout.NoTimeout
        if evict_lateness_ms is None
        else GroupStateTimeout.EventTimeTimeout
    )
    return keyed.groupBy("win_start_us", "event_type").applyInPandasWithState(
        fn, out_schema, state_schema, "update", timeout
    )


def _interval_us(spec: str) -> int:
    """Parse a Spark-style interval string ('30 minutes', '1 hour',
    '2 days', '45 seconds') into microseconds."""
    n, unit = spec.strip().split()
    per = {
        "second": 1_000_000,
        "seconds": 1_000_000,
        "minute": 60_000_000,
        "minutes": 60_000_000,
        "hour": 3_600_000_000,
        "hours": 3_600_000_000,
        "day": 86_400_000_000,
        "days": 86_400_000_000,
    }[unit.lower()]
    return int(n) * per


def repair_sessions(
    events: DataFrame,
    lake: Lakehouse,
    table: str,
    gap: str = "30 minutes",
    repair_from_us: int | None = None,
) -> None:
    """Batch repair for the append-mode session sink's documented caveat:
    when replays observe different watermark drops than the live run,
    stale overlapping session fragments can persist (see
    ``sessionize_to_lakehouse``). This is the lambda-architecture
    backfill: recompute sessions over the given events slice with the
    BATCH ``session_window`` (state-free, sees everything — no watermark
    to drop anything) and REPLACE every stored session that starts in
    the repaired range in one delete + upsert.

    ``repair_from_us=None`` treats the whole slice as truth (the caller
    owns horizon hygiene: the slice must cover full sessions).
    ``repair_from_us=R`` is the SCOPED trailing repair: the events slice
    must extend back to at least ``R - gap``, and only recomputed
    sessions with ``session_start_us >= R`` are trusted and written. The
    cutoff is sound because a true session starting at ``s >= R`` has
    all its events at or after ``s`` (a session's start IS its first
    event), so it is fully inside the slice; conversely a left-truncated
    fragment of a session that began before the slice must have its
    first in-slice event chained within ``gap`` of a pre-slice event,
    i.e. its start lands strictly below ``R`` — never inside the trusted
    range. Stored sessions starting before ``R`` are left untouched."""
    sessions = _session_agg(events, gap)
    if repair_from_us is not None:
        sessions = sessions.filter(
            F.col("session_start_us") >= F.lit(int(repair_from_us))
        )
    # pin the recomputed sessions ONCE: the bounds collect below and the
    # upsert both consume the shuffle-heavy session aggregate — without
    # this the whole slice's sessionization runs twice per repair
    sessions = sessions.localCheckpoint(eager=False)
    lake.create(
        table, SESSION_TABLE_SCHEMA, [], ["user_id", "session_start_us"], mode="skip"
    )
    # delete bound: [repair start, max END]. A stale fragment starts at
    # some real event time inside its merged true session, so its start
    # can exceed every TRUE session's start (a tail fragment) but never
    # the last true session's end — bounding by max(start) would leave
    # tail fragments alive (r6 review)
    bounds = sessions.agg(
        F.min("session_start_us").alias("lo"), F.max("session_end_us").alias("hi")
    ).collect()[0]
    if bounds.lo is not None:
        lo = bounds.lo if repair_from_us is None else int(repair_from_us)
        lake.delete_where(
            table,
            (F.col("session_start_us") >= F.lit(lo))
            & (F.col("session_start_us") <= F.lit(bounds.hi)),
        )
    lake.upsert(table, sessions)


def run_sessions_daily(
    events_stream: DataFrame,
    events_batch: DataFrame,
    lake: Lakehouse,
    table: str,
    checkpoint_dir: str,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    repair_horizon: str = "1 day",
    await_secs: int = 600,
) -> None:
    """The streaming/batch lambda pair as ONE daily entry point (r6
    verdict #8, the orchestration the sink/repair docstrings describe):

    1. drain new events through the streaming session sink
       (``sessionize_to_lakehouse``, availableNow) — low-latency path,
       exactly-once per the PK upsert;
    2. batch-repair the trailing ``repair_horizon``: recompute sessions
       from ``events_batch`` over ``[hi - horizon - gap, ∞)`` (``hi`` =
       newest stored session end) and replace every stored session
       starting in ``[hi - horizon, ∞)`` — healing both the
       replay-divergence caveat (stale fragments from differing
       watermark drops) and sessions the watermark had not yet flushed.

    Sessions older than the horizon are never touched, so daily cost is
    O(horizon's events), not O(history). Choose the horizon at least as
    large as the replay window you expect (watermark delay + redelivery
    spread)."""
    q = sessionize_to_lakehouse(
        events_stream,
        lake,
        table,
        checkpoint_dir,
        gap=gap,
        watermark=watermark,
        available_now=True,
    )
    if not q.awaitTermination(await_secs):
        # the repair must NEVER run concurrently with a still-draining
        # sink (delete_where/upsert would race its foreachBatch commits
        # on the same table, and the horizon would anchor on a
        # half-drained hi)
        q.stop()
        raise TimeoutError(
            f"session sink did not drain within {await_secs}s; stopped the "
            "query — re-run with a larger await_secs (the checkpoint "
            "resumes where it left off)"
        )
    hi = lake.table(table).agg(F.max("session_end_us")).collect()[0][0]
    if hi is None:
        return  # nothing stored yet: nothing to repair
    repair_from = int(hi) - _interval_us(repair_horizon)
    slice_df = events_batch.filter(
        F.col("ts_us") >= F.lit(repair_from - _interval_us(gap))
    )
    repair_sessions(slice_df, lake, table, gap=gap, repair_from_us=repair_from)
