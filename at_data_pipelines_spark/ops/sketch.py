"""KMV (k-minimum-values / bottom-k) distinct-count sketch.

The sketch behind Theta/KMV cardinality estimation (Bar-Yossef et al.
2002; the DataSketches theta family): hash every value to a uniform
number in [0, 1), keep only the k smallest DISTINCT hashes per group,
and estimate ``distinct ≈ (k-1) / u_(k)`` where ``u_(k)`` is the k-th
smallest hash. With fewer than k distinct hashes the count is exact.

Why this instead of Spark's builtin ``approx_count_distinct`` (HLL++):
same job — but this one is an ENGINE-INDEPENDENT deterministic
computation. The hash is ``md5(value)`` truncated to 48 bits, a plain
SQL expression any engine evaluates bit-identically, so the estimate is
exactly reproducible in DuckDB for the correctness oracle
(``oracle_sql`` in queries/sketches.py) — something no builtin sketch
with engine-private hashing can offer. Use the builtin when parity
doesn't matter; use this when two systems must agree on the estimate
(cross-engine reconciliation, contract tests, incremental re-checks).

Scale shape: one map-side projection computes the hash, ``distinct``
is a uniform shuffle on (group, hash) with map-side partial dedup, and
the bottom-k per group sorts only each group's DISTINCT hashes. Memory
per group downstream is O(k). No skew beyond genuine group skew — the
hash itself is uniform by construction.
"""

from __future__ import annotations

import weakref

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

_HEX_BITS = 48  # 12 hex chars: exact in a double (< 2^53), cheap to compare

# per-Lakehouse-handle memo of Bloom words tables already verified PK-free
# (see bloom_update_table's migration guard); weak so a dropped handle
# frees its entry rather than pinning the Lakehouse object forever
_BLOOM_PK_MIGRATED: "weakref.WeakKeyDictionary[object, dict]" = (
    weakref.WeakKeyDictionary()
)


def uniform_hash(col: F.Column | str) -> F.Column:
    """Deterministic uniform hash of a value into [0, 1): the first 12 hex
    chars of md5 as a 48-bit integer, scaled. Exact in float64, and
    reproducible in any engine with md5 + string ops."""
    h = F.md5(F.col(col).cast("string") if isinstance(col, str) else col.cast("string"))
    return F.conv(F.substring(h, 1, 12), 16, 10).cast("double") / F.lit(
        float(16**12)
    )


def kmv_distinct(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int = 64,
    out_col: str = "distinct_est",
) -> DataFrame:
    """Per-group distinct-count estimate of ``value_col`` via a bottom-k
    sketch (see module docstring). Exact below k distinct values;
    relative error ~ 1/sqrt(k-2) above it. Result is rounded to 6
    decimals (the engine-parity convention for irrational floats)."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    # NULL values are not counted as a distinct value (SQL COUNT(DISTINCT)
    # semantics) — and a NULL hash would sort before every real hash and
    # corrupt the k-th-smallest statistic.
    # r17 (guide §2.3, the same aggregate-before-the-expensive-expression
    # move as cms_build): dedup the RAW (group, value) pairs first — a
    # plain shuffle with map-side partial dedup of narrow native values —
    # and evaluate the md5 uniform hash once per DISTINCT pair instead of
    # once per input row (at corpus scale the md5 bill drops from |rows|
    # to |distinct pairs|). The second distinct on (group, u) preserves
    # the sketch's exact semantics (the oracle dedups on u, so a 48-bit
    # hash collision between two values must still collapse to one row);
    # it runs on already-deduped pairs, so its partial agg is ~free.
    hashed = (
        df.select(*group_cols, F.col(value_col).alias("_v"))
        .filter(F.col("_v").isNotNull())
        .distinct()
        .select(*group_cols, uniform_hash(F.col("_v")).alias("_u"))
        .distinct()
    )
    w = W.partitionBy(*group_cols).orderBy("_u")
    ranked = hashed.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") <= k
    )
    agg = ranked.groupBy(*group_cols).agg(
        F.count("*").alias("_n"), F.max("_u").alias("_kth")
    )
    est = F.when(F.col("_n") < k, F.col("_n").cast("double")).otherwise(
        F.lit(float(k - 1)) / F.col("_kth")
    )
    return agg.select(*group_cols, F.round(est, 6).alias(out_col))


def _cms_cells(col: F.Column | str, d: int, w: int, salt: str) -> F.Column:
    """Array of (row, col) sketch coordinates for one value: row i uses
    the 48-bit md5 of (value, salt, i) mod w — independent-enough hash
    rows, each a plain SQL expression any engine reproduces exactly."""
    c = F.col(col) if isinstance(col, str) else col
    return F.array(
        *[
            F.struct(
                F.lit(i).alias("row"),
                F.pmod(
                    F.conv(
                        F.substring(
                            F.md5(F.concat(c.cast("string"), F.lit(salt), F.lit(str(i)))),
                            1,
                            12,
                        ),
                        16,
                        10,
                    ).cast("long"),
                    F.lit(w),
                ).alias("col"),
            )
            for i in range(d)
        ]
    )


def cms_build(
    df: DataFrame, value_col: str, d: int = 4, w: int = 1024, salt: str = "cms"
) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan 2005) of value
    frequencies: d hash rows × w counters as a (row, col, cnt)
    DataFrame of at most d·w rows — a fixed-size summary of an
    arbitrarily large stream, mergeable by simple cnt addition.
    Estimates only ever OVER-count (collisions add), by ≤ n·e/w with
    probability 1-e^-d. Like the KMV sketch, the hashes are md5-derived
    SQL expressions, so an external engine reproduces the sketch and
    its estimates bit-for-bit (the oracle for q68).

    r16 (guide §2.3, aggregate before you explode): frequencies are
    pre-aggregated per VALUE first — a cheap partial-agg count — and the
    d md5 cells are computed once per distinct value with the count as
    the weight, instead of d md5+concat evaluations per input ROW. The
    summed sketch is identical (Σ per-cell of per-value counts); at
    sf0.1 q68 measured 0.65 s vs 1.03 s (interleaved min-of-4), and at
    corpus scale the md5 bill drops from d·|rows| to d·|distinct|."""
    counts = df.groupBy(value_col).agg(F.count(F.lit(1)).alias("_c"))
    cells = counts.select(
        F.col("_c"), F.explode(_cms_cells(value_col, d, w, salt)).alias("c")
    ).select("_c", "c.row", "c.col")
    return cells.groupBy("row", "col").agg(F.sum("_c").alias("cnt"))


def cms_estimate(
    sketch: DataFrame,
    items: DataFrame,
    value_col: str,
    d: int = 4,
    w: int = 1024,
    salt: str = "cms",
    out_col: str = "est",
) -> DataFrame:
    """Point-frequency estimate for each item: min over the d probed
    counters (absent counter = 0). The sketch side is ≤ d·w rows —
    broadcast — so estimating any number of items is one map-side join."""
    probes = items.select(
        value_col, F.explode(_cms_cells(value_col, d, w, salt)).alias("c")
    ).select(value_col, "c.row", "c.col")
    joined = probes.join(F.broadcast(sketch), ["row", "col"], "left").fillna(
        {"cnt": 0}
    )
    return joined.groupBy(value_col).agg(F.min("cnt").alias(out_col))


def _bloom_positions(col: F.Column | str, k: int, m_bits: int, salt: str) -> F.Column:
    """Array of the k bit positions for one value: position i is the
    48-bit md5 of (value, salt, i) mod m — the same engine-reproducible
    hash family as the CMS rows."""
    c = F.col(col) if isinstance(col, str) else col
    return F.array(
        *[
            F.pmod(
                F.conv(
                    F.substring(
                        F.md5(F.concat(c.cast("string"), F.lit(salt), F.lit(str(i)))),
                        1,
                        12,
                    ),
                    16,
                    10,
                ).cast("long"),
                F.lit(m_bits),
            )
            for i in range(k)
        ]
    )


def bloom_build(
    df: DataFrame,
    value_col: str,
    m_bits: int = 1 << 20,
    k: int = 5,
    salt: str = "bloom",
) -> DataFrame:
    """SPARSE distributed Bloom filter of ``value_col``'s members:
    m bits packed into 64-bit words, returned as a (word, bits)
    DataFrame holding only the non-zero words. Everything is codegen
    SQL (md5 positions, shiftleft masks, bit_or aggregate) — no UDF, no
    driver-side bitset — so the build is one uniform shuffle of ≤ k·n
    (word, mask) pairs and the filter itself scales past driver memory
    (a dense m=2^33 filter is just more rows). md5-derived positions
    make the sketch bit-reproducible across engines, like the KMV/CMS
    sketches. NULL is never a member. Mergeable: union two sketches and
    re-aggregate (``bloom_merge``) — exactly equal to building from the
    union, since bit_or is associative and the hashes deterministic.

    Why alongside KMV/CMS: the membership sketch a 100 TB incremental
    dedup needs — "have we EVER ingested this content hash?" — with
    O(m/64) state instead of O(distinct), no false negatives, and FPR
    ≈ (1 - e^(-k·n/m))^k chosen at build time."""
    if m_bits % 64:
        raise ValueError(f"m_bits must be a multiple of 64, got {m_bits}")
    cells = (
        df.filter(F.col(value_col).isNotNull())
        .select(F.explode(_bloom_positions(value_col, k, m_bits, salt)).alias("pos"))
        .select(
            (F.col("pos") / F.lit(64)).cast("long").alias("word"),
            F.expr("shiftleft(1L, cast(pmod(pos, 64) as int))").alias("mask"),
        )
    )
    return cells.groupBy("word").agg(F.expr("bit_or(mask)").alias("bits"))


def bloom_probe(
    sketch: DataFrame,
    items: DataFrame,
    value_col: str,
    m_bits: int = 1 << 20,
    k: int = 5,
    salt: str = "bloom",
    out_col: str = "maybe_member",
    broadcast: bool = True,
) -> DataFrame:
    """Membership probe: one row per distinct ``value_col`` with
    ``maybe_member`` — False is definitive (no false negatives), True
    is membership up to the filter's FPR. The probe explodes each item
    into its k (word, mask) coordinates and equi-joins the sparse
    sketch on ``word`` — ``broadcast=True`` (default) for the common
    small-filter case; pass ``broadcast=False`` for a dense multi-GB
    filter, which then probes via a uniform shuffle equi-join instead
    of an impossible broadcast. Both shapes are skew-free (md5
    positions are uniform). NULL probes report False: a NULL value
    hashes to k NULL positions, whose NULL words never join and whose
    NULL-mask hits are NULL, so the final coalesced bool_and is False —
    no special-case branch needed. Duplicate ``word`` rows in the
    sketch (the append-only LSM shape ``bloom_update_table`` writes
    between compactions) are OR-collapsed before the mask test, so
    probing an uncompacted filter is exactly as correct as probing a
    compacted one."""
    if value_col in ("word", "bits"):
        raise ValueError(
            f"value_col {value_col!r} collides with the sketch's internal "
            "(word, bits) columns — rename the probe column first"
        )
    probes = items.select(
        F.col(value_col),
        F.explode(_bloom_positions(value_col, k, m_bits, salt)).alias("_bloom_pos"),
    ).select(
        value_col,
        (F.col("_bloom_pos") / F.lit(64)).cast("long").alias("word"),
        F.expr("shiftleft(1L, cast(pmod(_bloom_pos, 64) as int))").alias(
            "_bloom_mask"
        ),
    )
    sk = sketch.groupBy("word").agg(F.expr("bit_or(bits)").alias("bits"))
    sk = F.broadcast(sk) if broadcast else sk
    joined = probes.join(sk, ["word"], "left")
    hit = (
        F.coalesce(F.col("bits"), F.lit(0)).bitwiseAND(F.col("_bloom_mask"))
        != F.lit(0)
    ).alias("_bloom_hit")
    return (
        joined.select(value_col, hit)
        .groupBy(value_col)
        .agg(F.coalesce(F.expr("bool_and(_bloom_hit)"), F.lit(False)).alias(out_col))
    )


def bloom_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """OR-merge two Bloom sketches built with identical (m, k, salt):
    exactly the sketch of the union of their inputs."""
    return (
        a.unionByName(b)
        .groupBy("word")
        .agg(F.expr("bit_or(bits)").alias("bits"))
    )


def bloom_table_sketch(lake, table: str) -> DataFrame:
    """The persisted filter's LOGICAL (word, bits) view: OR-collapse the
    append-only word rows ``bloom_update_table`` wrote. bit_or over
    duplicate word rows is exact (associative, idempotent), so the view
    equals the one-shot build of everything ever ingested, compacted or
    not. Feed this to ``bloom_probe``/``bloom_merge`` (probe also
    collapses internally, so passing the raw table works too)."""
    return (
        lake.table(table)
        .groupBy("word")
        .agg(F.expr("bit_or(bits)").alias("bits"))
    )


def bloom_compact_table(lake, table: str) -> None:
    """Rewrite the persisted filter to one row per word (bit_or of the
    accumulated deltas) in a single read-modify-write commit — the LSM
    compaction. NOT keep-latest-per-PK (that would drop bits recorded
    by older rows), which is why the table is created WITHOUT primary
    keys: ``optimize()`` must never touch it. Built on
    ``Lakehouse.rewrite``, whose read is pinned to one manifest load
    and whose commit conflicts with ANY concurrent commit — an append
    landing mid-compaction raises ConcurrentWriteError rather than
    being silently dropped from the compacted output (r8 review: a
    bloom_table_sketch-then-overwrite compaction had a read/load gap an
    append could fall into)."""
    lake.rewrite(
        table,
        lambda df: df.groupBy("word").agg(F.expr("bit_or(bits)").alias("bits")),
    )


def bloom_update_table(
    lake,
    table: str,
    df: DataFrame,
    value_col: str,
    m_bits: int = 1 << 20,
    k: int = 5,
    salt: str = "bloom",
    compact_every: int = 8,
) -> None:
    """Incrementally maintain a lakehouse-PERSISTED Bloom filter (the
    'have we ever ingested this?' membership set of an incremental
    corpus dedup) in LSM shape: APPEND the batch's sparse (word, bits)
    sketch as a new delta generation — cost truly O(batch's distinct
    words) per update, never O(filter) — and compact to one row per
    word every ``compact_every`` pending deltas (cadence read from the
    table manifest, so it is restart-proof). The r7 version PK-upserted
    into an unpartitioned words table, which recompacted the WHOLE
    filter on every batch — O(filter) per update for the dense multi-GB
    filters this module advertises.

    Readers use ``bloom_table_sketch`` (or ``bloom_probe`` directly,
    which OR-collapses duplicate word rows itself). bit_or is
    idempotent and associative, so replayed and out-of-order batches
    converge to exactly the union filter regardless of when compaction
    runs. Appends commute (the commit protocol rebases them), so
    concurrent updaters never conflict; a compaction racing an append
    surfaces as ConcurrentWriteError and is simply skipped — the next
    update retries it. The table is created WITHOUT primary keys:
    duplicate words are state, and keep-latest dedup would lose bits
    (mirrors ann_index_maintenance_stream's compact_every design,
    streaming/ingest.py)."""
    from pyspark.sql import types as T

    from ..catalog import ConcurrentWriteError

    lake.create(
        table,
        T.StructType(
            [T.StructField("word", T.LongType()), T.StructField("bits", T.LongType())]
        ),
        [],
        [],
        mode="skip",
    )
    # Migration guard: a words table created by the r7 (PK-upsert) layout
    # carries primary_keys=["word"]. Appending duplicate-word deltas into
    # a PK table is a trap — any routine optimize() would keep-latest and
    # silently DROP OR'd bits (Bloom false negatives). Migrate in place:
    # collapse to one row per word (bit_or preserves every bit present),
    # then clear the PK so duplicates become legitimate LSM state. Both
    # steps are idempotent — a crash between them re-runs the (no-op)
    # collapse on the next update before the PK is cleared, and no append
    # lands in between because the guard runs before this batch's insert.
    # The check needs a manifest load, which on the hot append path would
    # cost one read PER BATCH just to re-learn a one-time fact — so each
    # handle remembers which tables passed the check and skips it after
    # the first clean pass. The memo is stamped with the handle's DDL
    # epoch (bumped by every drop()/real create()), so a SAME-handle
    # drop + recreate — possibly WITH the r7 primary keys — invalidates
    # it and the guard re-verifies instead of trusting a memo about a
    # dead table life. A recreate through a DIFFERENT handle remains
    # out-of-band, the same hazard class set_primary_keys itself guards.
    migrated = _BLOOM_PK_MIGRATED.setdefault(lake, {})
    epoch = getattr(lake, "_ddl_epoch", 0)
    if migrated.get(table) != epoch:
        if lake._load_meta(table).primary_keys:
            try:
                lake.rewrite(
                    table,
                    lambda d: d.groupBy("word").agg(
                        F.expr("bit_or(bits)").alias("bits")
                    ),
                )
                lake.set_primary_keys(table, [])
            except ConcurrentWriteError as e:
                # refusing to append is right (the PK trap is still
                # armed), but tell the caller the fix is just to retry:
                # the migration is idempotent and a rival updater's own
                # guard may already have completed it.
                raise ConcurrentWriteError(
                    f"the one-time r7→r9 Bloom-table layout migration of "
                    f"{table!r} raced a concurrent commit; retry "
                    "bloom_update_table — the migration is idempotent and "
                    "the batch was NOT appended (appending into the "
                    "primary-key layout risks Bloom false negatives)"
                ) from e
        migrated[table] = epoch
    batch = bloom_build(df, value_col, m_bits=m_bits, k=k, salt=salt)
    lake.insert(table, batch, mode="append")
    if compact_every and lake.pending_deltas(table) >= compact_every:
        try:
            bloom_compact_table(lake, table)
        except ConcurrentWriteError:
            pass  # a concurrent append won the commit; next update recompacts


def quantile_sketch(
    df: DataFrame,
    value_col: str,
    key_col: str,
    k: int = 256,
    salt: str = "qsk",
) -> DataFrame:
    """The quartet's QUANTILE member (next to KMV cardinality, CMS
    frequency, Bloom membership): a deterministic row sample — the k
    rows whose md5-uniform hash of (key, salt) is smallest — kept as
    (value, hash) rows. Because the hash orders ROWS (by their key),
    not values, the sample is uniform over rows and any quantile of the
    sample estimates the population quantile with the standard
    O(1/sqrt(k)) error; because it is md5-derived it is deterministic,
    layout-independent, engine-reproducible, and MERGEABLE: union two
    sketches and re-take the bottom-k (``quantile_sketch_merge``) —
    exactly the sketch of the union. Spark's builtin approx_percentile
    does this job faster but with engine-private internals no oracle
    can replay. NULL values and NULL keys are excluded (a quantile of
    NULLs is undefined; a NULL key cannot be hashed).

    ``key_col`` MUST identify rows uniquely (a PK or row id): the hash
    draws once per KEY, so duplicate keys share one draw and the
    (h, value) tiebreak then keeps the smallest values of the tied
    cluster — with non-unique keys the sample, and every quantile from
    it, is biased LOW, not uniform. Synthesize a unique key (e.g.
    ``concat(key, '#', file, '#', pos)``) when no natural one exists;
    the hash input just has to be a deterministic row identity both
    engines can rebuild."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    h = uniform_hash(F.concat(F.col(key_col).cast("string"), F.lit(salt)))
    base = df.filter(
        F.col(value_col).isNotNull() & F.col(key_col).isNotNull()
    ).select(F.col(value_col).alias("value"), h.alias("h"))
    # bottom-k via sort+limit = TakeOrderedAndProject: per-partition
    # top-k then a k-row merge on the driver side of the exchange —
    # never a global single-task window. `value` tiebreak keeps
    # duplicate-key ties deterministic.
    return base.orderBy("h", "value").limit(k)


def quantile_sketch_merge(a: DataFrame, b: DataFrame, k: int = 256) -> DataFrame:
    """Bottom-k of the union of two sketches — exactly the sketch of the
    combined input (hashes are deterministic, so the k smallest of the
    union's rows are the k smallest among the two bottom-k sets)."""
    return a.unionByName(b).orderBy("h", "value").limit(k)


def quantile_estimate(
    sketch: DataFrame, quantiles: list[float], out_col: str = "q"
) -> DataFrame:
    """Quantile estimates from the sample: the ANSI PERCENTILE_CONT
    (linear interpolation) of the sampled values at each requested
    quantile — one row per quantile, deterministic given the sketch."""
    qs = list(quantiles)
    aggs = [
        F.expr(f"percentile(value, {float(p)!r})").alias(f"_q{i}")
        for i, p in enumerate(qs)
    ]
    row = sketch.agg(*aggs)
    pairs = F.array(
        *[
            F.struct(F.lit(float(p)).alias(out_col), F.col(f"_q{i}").alias("value"))
            for i, p in enumerate(qs)
        ]
    )
    return row.select(F.explode(pairs).alias("p")).select(f"p.{out_col}", "p.value")
