"""Query registry — the driver-checkable correctness surface.

Every implemented operator from SURVEY §2 gets a named query here, built
from (spark, sf_dir) on the driver test tables, plus (where SQL-expressible)
a DuckDB oracle SQL string over the same tables. The driver compares
row-count + schema + order-insensitive value hash.

Determinism policy (why the oracles can hash-match at all):

* All monetary / measure columns in the test data are exact 2-decimal
  fixed-point doubles. Sums are therefore computed as **scaled integer
  sums** (``SUM(CAST(ROUND(x * 100) AS BIGINT))``) then divided back —
  bit-identical in any engine and any summation order, which a plain
  double SUM is not.
* Event-time arithmetic is done on int64 epoch nanoseconds (``ts_ns`` /
  DuckDB ``epoch_ns(ts)``), never on session-timezone-dependent
  timestamps.
* Any query with a LIMIT carries a total-order tiebreak so the selected
  row set is unique.
* Irrational float paths (log1p, ewm, cosine) are rounded to 6 decimals
  on both sides; the residual mismatch probability is ~1e-8 per value.
"""

from __future__ import annotations

from collections.abc import Callable
from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = " ".join(oracle.split())
        return fn

    return deco
