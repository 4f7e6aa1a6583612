"""Sketch queries — engine-independent deterministic approximations.

Spark ships HLL++ (``approx_count_distinct``), but its hash is engine-
private, so no external system can reproduce the estimate. The KMV
bottom-k sketch (ops/sketch.py) hashes with plain ``md5`` truncated to
48 bits — a SQL expression DuckDB evaluates bit-identically — so even
the APPROXIMATE answer sits under the exact-hash oracle gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..io import load_table
from .registry import register


# --------------------------------------------------------------------------
# q66 — per-event-type distinct-user estimate via the KMV bottom-k sketch
#        (k=64). The oracle replays the identical computation: same md5
#        48-bit uniform hash, same distinct/bottom-k/(k-1)/u_k estimator —
#        an approximate algorithm under an EXACT cross-engine parity check.
# --------------------------------------------------------------------------
@register(
    "q66_kmv_distinct_users",
    oracle="""
    WITH hashed AS (
      SELECT DISTINCT event_type,
             ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 12))::BIGINT
               / power(16, 12) AS u
      FROM events
    ),
    ranked AS (
      SELECT event_type, u,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY u) AS rn
      FROM hashed
    ),
    agg AS (
      SELECT event_type, COUNT(*) AS n, MAX(u) AS kth
      FROM ranked WHERE rn <= 64 GROUP BY event_type
    )
    SELECT event_type,
           ROUND(CASE WHEN n < 64 THEN CAST(n AS DOUBLE) ELSE 63.0 / kth END,
                 6) AS distinct_est
    FROM agg ORDER BY event_type
    """,
)
def q66_kmv_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ops.sketch import kmv_distinct

    e = load_table(spark, sf_dir, "events")
    return kmv_distinct(e, ["event_type"], "user_id", k=64).orderBy("event_type")


# --------------------------------------------------------------------------
# q67 — per-source weighted sample (5 docs per source, weight = n_chars)
#        via the deterministic A-ES reservoir. The oracle replays the
#        identical md5-uniform draw and ln(u)/w ranking, so even the
#        SAMPLING is under the exact cross-engine parity gate. Output is
#        integer/string columns only — selection, not float emission.
# --------------------------------------------------------------------------
@register(
    "q67_weighted_sample",
    oracle="""
    WITH h AS (
      SELECT source, doc_id, n_chars,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || 'ws'), 1, 12))::BIGINT
               / power(16, 12) AS u
      FROM documents WHERE n_chars > 0
    ),
    r AS (
      SELECT source, doc_id, n_chars,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY ln(u) / n_chars DESC, doc_id) AS rn
      FROM h
    )
    SELECT source, doc_id, n_chars FROM r WHERE rn <= 5
    ORDER BY source, doc_id
    """,
)
def q67_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llmops.sampling import weighted_sample

    d = load_table(spark, sf_dir, "documents")
    return (
        weighted_sample(d, "n_chars", 5, by=["source"])
        .select("source", "doc_id", "n_chars")
        .orderBy("source", "doc_id")
    )


# --------------------------------------------------------------------------
# q68 — count-min heavy hitters: users with an estimated >= 80 events via
#        a 4x1024 CMS. The oracle rebuilds the identical sketch (same md5
#        row hashes, same min-over-rows estimator) — the second
#        engine-reproducible sketch family (frequency, next to q66's
#        cardinality), both under the exact hash-parity gate.
# --------------------------------------------------------------------------
@register(
    "q68_cms_heavy_hitters",
    oracle="""
    WITH rows_i AS (SELECT unnest([0, 1, 2, 3]) AS i),
    cells AS (
      SELECT i,
             ('0x' || substr(md5(CAST(user_id AS VARCHAR) || 'cms' || i), 1, 12))::BIGINT
               % 1024 AS col
      FROM events CROSS JOIN rows_i
    ),
    sk AS (SELECT i, col, COUNT(*) AS cnt FROM cells GROUP BY 1, 2),
    cand AS (SELECT DISTINCT user_id FROM events),
    probes AS (
      SELECT user_id, i,
             ('0x' || substr(md5(CAST(user_id AS VARCHAR) || 'cms' || i), 1, 12))::BIGINT
               % 1024 AS col
      FROM cand CROSS JOIN rows_i
    ),
    est AS (
      SELECT user_id, MIN(COALESCE(cnt, 0)) AS est
      FROM probes LEFT JOIN sk USING (i, col) GROUP BY user_id
    )
    SELECT user_id, est FROM est WHERE est >= 80 ORDER BY user_id
    """,
)
def q68_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from ..ops.sketch import cms_build, cms_estimate

    e = load_table(spark, sf_dir, "events")
    sketch = cms_build(e, "user_id")
    cand = e.select("user_id").distinct()
    est = cms_estimate(sketch, cand, "user_id")
    return est.filter(F.col("est") >= 80).orderBy("user_id")


# --------------------------------------------------------------------------
# q69 — Bloom-filter membership: build a small (m=512, k=3) filter over
#        the src1 source doc_ids and probe EVERY doc_id. The filter is
#        deliberately small enough to produce false positives — and
#        because the positions are the md5-derived SQL expressions both
#        engines evaluate bit-identically, even the FALSE POSITIVES
#        match exactly: the approximate structure sits under the exact
#        cross-engine parity gate like q66/q68.
# --------------------------------------------------------------------------
@register(
    "q69_bloom_membership",
    oracle="""
    WITH ks AS (SELECT unnest([0, 1, 2]) AS i),
    members AS (SELECT DISTINCT doc_id FROM documents WHERE source = 'src1'),
    setbits AS (
      SELECT DISTINCT
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || 'bloom' || i), 1, 12))::BIGINT
               % 512 AS pos
      FROM members CROSS JOIN ks
    ),
    cand AS (SELECT DISTINCT doc_id FROM documents),
    probes AS (
      SELECT doc_id,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || 'bloom' || i), 1, 12))::BIGINT
               % 512 AS pos
      FROM cand CROSS JOIN ks
    ),
    hit AS (
      SELECT p.doc_id, bool_and(s.pos IS NOT NULL) AS m
      FROM probes p LEFT JOIN setbits s USING (pos)
      GROUP BY p.doc_id
    )
    SELECT doc_id FROM hit WHERE m ORDER BY doc_id
    """,
)
def q69_bloom_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from ..ops.sketch import bloom_build, bloom_probe

    d = load_table(spark, sf_dir, "documents")
    sketch = bloom_build(
        d.filter(F.col("source") == "src1"), "doc_id", m_bits=512, k=3
    )
    probed = bloom_probe(
        sketch, d.select("doc_id").distinct(), "doc_id", m_bits=512, k=3
    )
    return probed.filter(F.col("maybe_member")).select("doc_id").orderBy("doc_id")


# --------------------------------------------------------------------------
# q71 — quantile sketch: n_chars quartile/median/p90 estimated from the
#        deterministic bottom-256-hash row sample (ops/sketch.py). The
#        oracle replays the identical md5 draw, the identical ORDER BY
#        (h, value) LIMIT 256 sample, and PERCENTILE_CONT over it — the
#        fourth sketch family (quantiles, after cardinality/frequency/
#        membership), all under the exact hash-parity gate.
# --------------------------------------------------------------------------
@register(
    "q71_quantile_sketch",
    oracle="""
    WITH h AS (
      SELECT CAST(n_chars AS DOUBLE) AS value,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || 'qsk'), 1, 12))::BIGINT
               / power(16, 12) AS h
      FROM documents WHERE n_chars IS NOT NULL AND doc_id IS NOT NULL
    ),
    s AS (SELECT value FROM h ORDER BY h, value LIMIT 256)
    SELECT q, ROUND(v, 6) AS value FROM (
      SELECT 0.25 AS q, (SELECT quantile_cont(value, 0.25) FROM s) AS v
      UNION ALL
      SELECT 0.5 AS q, (SELECT quantile_cont(value, 0.5) FROM s) AS v
      UNION ALL
      SELECT 0.9 AS q, (SELECT quantile_cont(value, 0.9) FROM s) AS v
    ) ORDER BY q
    """,
)
def q71_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from ..ops.sketch import quantile_estimate, quantile_sketch

    d = load_table(spark, sf_dir, "documents")
    sk = quantile_sketch(d, "n_chars", "doc_id", k=256)
    est = quantile_estimate(sk, [0.25, 0.5, 0.9])
    return est.select("q", F.round("value", 6).alias("value")).orderBy("q")


# --------------------------------------------------------------------------
# q72 — Bloom data skipping end-to-end (r10): round-trip the documents
#        table through a lakehouse table with bloom_columns=['doc_id']
#        and answer a two-point IN-list lookup via scan()'s equality
#        predicates — the per-leaf membership filters prune the read to
#        the leaves holding the probed ids (tests assert the files-
#        opened shape; here the oracle pins the SEMANTICS: scan(IN) is
#        exactly WHERE doc_id IN (...)). Probe ids are the table's own
#        min/max doc_id so the query is deterministic at every SF.
# --------------------------------------------------------------------------
@register(
    "q72_bloom_point_lookup",
    oracle="""
    SELECT CAST(doc_id AS BIGINT) AS doc_id, source,
           CAST(n_chars AS BIGINT) AS n_chars
    FROM documents
    WHERE doc_id IN (SELECT MIN(doc_id) FROM documents)
       OR doc_id IN (SELECT MAX(doc_id) FROM documents)
    """,
)
def q72_bloom_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from pyspark.sql import functions as F

    from ..catalog import Lakehouse

    d = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "source",
        F.col("n_chars").cast("long").alias("n_chars"),
    )
    # the temp lakehouse must outlive this function: the returned
    # DataFrame reads from it lazily (the driver collects later)
    lake = Lakehouse(spark, tempfile.mkdtemp(prefix="q72_bloom_") + "/lake")
    lake.create("docs", d.schema, [], [], bloom_columns=["doc_id"])
    lake.insert("docs", d)
    lo, hi = d.agg(F.min("doc_id"), F.max("doc_id")).first()
    return lake.scan("docs", where={"doc_id": {int(lo), int(hi)}})


# --------------------------------------------------------------------------
# q74 — deletion vectors + merge-on-read update end-to-end (r11):
#        round-trip the documents table through a PK-less lakehouse
#        table, vector-DELETE one decile of doc_ids and vector-UPDATE
#        another (both mode='dv' — no data file is rewritten; the
#        originals are masked by the manifest's vectors and the updated
#        copies land as one delta generation in a single atomic
#        commit), then return the final table. The oracle pins the
#        SEMANTICS: the masked read must equal plain SQL's
#        WHERE-filter + CASE projection of the source exactly.
# --------------------------------------------------------------------------
@register(
    "q74_dv_update_roundtrip",
    oracle="""
    SELECT CAST(doc_id AS BIGINT) AS doc_id, source,
           CAST(CASE WHEN doc_id % 10 = 7 THEN n_chars + 1000000
                     ELSE n_chars END AS BIGINT) AS n_chars
    FROM documents
    WHERE doc_id % 10 <> 3
    """,
)
def q74_dv_update_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from pyspark.sql import functions as F

    from ..catalog import Lakehouse

    d = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "source",
        F.col("n_chars").cast("long").alias("n_chars"),
    )
    # the temp lakehouse must outlive this function: the returned
    # DataFrame reads from it lazily (the driver collects later)
    lake = Lakehouse(spark, tempfile.mkdtemp(prefix="q74_dv_") + "/lake")
    lake.create("docs", d.schema, [], [])
    lake.insert("docs", d)
    lake.delete_where("docs", F.col("doc_id") % 10 == 3, mode="dv")
    lake.update_where(
        "docs",
        F.col("doc_id") % 10 == 7,
        {"n_chars": F.col("n_chars") + 1_000_000},
        mode="dv",
    )
    return lake.table("docs")
