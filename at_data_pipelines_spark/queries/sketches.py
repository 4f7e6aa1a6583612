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
