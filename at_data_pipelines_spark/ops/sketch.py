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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

_HEX_BITS = 48  # 12 hex chars: exact in a double (< 2^53), cheap to compare


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
    # corrupt the k-th-smallest statistic
    hashed = (
        df.select(*group_cols, uniform_hash(value_col).alias("_u"))
        .filter(F.col("_u").isNotNull())
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
