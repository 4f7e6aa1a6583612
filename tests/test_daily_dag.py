"""Gold-standard incremental correctness: a daily update on top of a
T-day backfill must reproduce the full (T+1)-day backfill exactly, table
by table, for the new date (warm-up covering full history ⇒ no EWM
truncation error)."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pytest
from pyspark.sql import functions as F

from at_data_pipelines_spark.catalog import Lakehouse
from at_data_pipelines_spark.pipelines import PipelineConfig, flows, synthetic

CFG = PipelineConfig(window=30, ewm_half_life=10.0, reversal_window=11)

COMPARE_TABLES = [
    ("stock_returns", ["ticker", "date"], ["return"]),
    ("etf_returns", ["ticker", "date"], ["return"]),
    ("signals", ["ticker", "date", "signal"], ["value"]),
    ("scores", ["ticker", "date", "signal"], ["score"]),
    ("alphas", ["ticker", "date", "signal"], ["alpha"]),
    ("factor_loadings", ["ticker", "date", "factor"], ["loading"]),
    ("idio_vol", ["ticker", "date"], ["idio_vol"]),
    ("factor_covariances", ["date", "factor_1", "factor_2"], ["covariance"]),
    ("benchmark_weights", ["ticker", "date"], ["weight"]),
    ("benchmark_returns", ["date"], ["return"]),
    ("betas", ["ticker", "date"], ["historical_beta", "predicted_beta"]),
    ("portfolio_weights", ["ticker", "date"], ["weight"]),
    ("portfolio_metrics", ["date"], ["lambda", "active_risk"]),
]


@pytest.mark.slow
def test_daily_equals_backfill(spark, tmp_path):
    fx = synthetic.generate_market(
        spark, n_tickers=12, start=dt.date(2023, 1, 2), end=dt.date(2023, 7, 31)
    )
    cal = sorted(r.date for r in fx["calendar"].collect())
    last = cal[-1]

    # full-history reference
    lake_full = Lakehouse(spark, str(tmp_path / "full"))
    flows.run_backfill(lake_full, fx, CFG)

    # T-1 backfill + one daily step
    cut = {
        "calendar": fx["calendar"].filter(F.col("date") < F.lit(last)),
        "universe": fx["universe"].filter(F.col("date") < F.lit(last)),
        "stock_bars": fx["stock_bars"].filter(F.col("date") < F.lit(last)),
        "etf_bars": fx["etf_bars"].filter(F.col("date") < F.lit(last)),
    }
    lake_inc = Lakehouse(spark, str(tmp_path / "inc"))
    flows.run_backfill(lake_inc, cut, CFG)
    stages: dict[str, float] = {}
    ran = flows.run_daily(
        lake_inc,
        CFG,
        run_date=last + dt.timedelta(days=1),
        new_stock_bars=fx["stock_bars"].filter(F.col("date") == F.lit(last)),
        new_etf_bars=fx["etf_bars"].filter(F.col("date") == F.lit(last)),
        new_calendar=fx["calendar"].filter(F.col("date") == F.lit(last)),
        new_universe=fx["universe"].filter(F.col("date") == F.lit(last)),
        warm_days=10_000,  # full history ⇒ exact EWM parity
        stage_times=stages,
    )
    assert ran is True
    # bench instrumentation contract (r11): one wall per DAG stage
    assert set(stages) == {
        "ingest", "returns", "factor_model", "factor_cov",
        "reversal", "benchmark", "betas", "portfolio",
    }
    assert all(v >= 0 for v in stages.values())

    for name, keys, vals in COMPARE_TABLES:
        a = (
            lake_inc.table(name).filter(F.col("date") == F.lit(last))
            .toPandas().set_index(keys).sort_index()
        )
        b = (
            lake_full.table(name).filter(F.col("date") == F.lit(last))
            .toPandas().set_index(keys).sort_index()
        )
        assert len(a) == len(b) and len(b) > 0, f"{name}: {len(a)} vs {len(b)} rows"
        assert list(a.index) == list(b.index), f"{name}: key sets differ"
        for v in vals:
            np.testing.assert_allclose(
                a[v].to_numpy(dtype=float),
                b[v].to_numpy(dtype=float),
                rtol=1e-9,
                atol=1e-12,
                err_msg=f"{name}.{v}",
            )
