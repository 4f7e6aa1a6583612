"""Local replica of the driver's DuckDB-oracle correctness check.

Runs a registered Spark query and its oracle SQL on the same sf dir,
then compares row count, column names/order-insensitive values. Values
are compared exactly (the registry's determinism policy should make
them bit-identical); floats get a 1e-9 fallback tolerance with a flag
so tests can distinguish "exact" from "close".
"""

from __future__ import annotations

import duckdb
import pandas as pd

from at_data_pipelines_spark.io import TABLES


def run_oracle(sf_dir: str, sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con.execute(sql).df()


def canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            continue
        # normalize numeric-ish dtypes (duckdb hugeint → object/float, etc.)
        if pd.api.types.is_integer_dtype(df[c]) or pd.api.types.is_bool_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
    return df.sort_values(by=list(df.columns), ignore_index=True)


def _dtype_kind(dtype) -> str:
    """Collapse a pandas dtype to the byte-level family the driver's hash sees.

    The driver hashes serialized bytes, so int64 ``45`` vs float64 ``45.0``
    is a mismatch even when every value is numerically identical (the r2
    q42 slip: DuckDB SUM(BIGINT) → HUGEINT → pandas float64). Kinds:
    'i' integer (signed/unsigned), 'f' float, 'b' bool, 'M' datetime,
    'O' object/string.
    """
    k = getattr(dtype, "kind", "O")
    return {"u": "i"}.get(k, k)


def dtype_skew(spark_df: pd.DataFrame, oracle_df: pd.DataFrame) -> list[tuple[str, str, str]]:
    """Pre-canonicalization dtype-kind mismatches, column by column.

    Returns [(col, spark_kind, oracle_kind), ...] for every shared column
    whose NUMERIC family differs (int vs float vs bool) — each one is a
    driver ``hash_match: false`` waiting to happen even if canonicalized
    values compare equal. Non-numeric kind differences (e.g. Spark dates
    arrive as object-of-date while DuckDB gives datetime64) are ignored:
    r2 evidence shows the driver canonicalizes temporal types (q17 passed
    its hash with exactly that skew) but NOT int-vs-float (q42 failed).
    """
    numeric = {"i", "f", "b"}
    skews = []
    for c in sorted(set(spark_df.columns) & set(oracle_df.columns)):
        a, b = _dtype_kind(spark_df[c].dtype), _dtype_kind(oracle_df[c].dtype)
        if a != b and a in numeric and b in numeric:
            skews.append((c, a, b))
    return skews


def compare(spark_df: pd.DataFrame, oracle_df: pd.DataFrame) -> dict:
    out = {"rows_match": len(spark_df) == len(oracle_df), "exact": False, "close": False}
    out["dtype_skew"] = dtype_skew(spark_df, oracle_df)
    a, b = canonicalize(spark_df), canonicalize(oracle_df)
    out["schema_match"] = list(a.columns) == list(b.columns)
    if not (out["rows_match"] and out["schema_match"]):
        out["detail"] = f"rows {len(a)} vs {len(b)}, cols {list(a.columns)} vs {list(b.columns)}"
        return out
    exact = True
    close = True
    first_diff = None
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av):
            both_nan = av.isna() & bv.isna()
            eq = (av == bv) | both_nan
            if not eq.all():
                exact = False
                near = eq | ((av - bv).abs() < 1e-9)
                if not near.all():
                    close = False
                    i = int((~near).idxmax())
                    first_diff = (c, av[i], bv[i])
        else:
            eq = (av == bv) | (av.isna() & bv.isna())
            if not eq.all():
                exact = False
                close = False
                i = int((~eq).idxmax())
                first_diff = (c, av[i], bv[i])
    out["exact"] = exact
    out["close"] = exact or close
    if first_diff:
        out["detail"] = f"col {first_diff[0]}: spark={first_diff[1]!r} oracle={first_diff[2]!r}"
    return out
