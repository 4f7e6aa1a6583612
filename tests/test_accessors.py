"""Accessor-layer parity (pipelines/utils/data.py rebuild): shapes,
null-filter semantics, and partition pruning through the derived year
predicate."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from at_data_pipelines_spark.catalog import Lakehouse
from at_data_pipelines_spark.pipelines import PipelineConfig, accessors, flows, synthetic

CFG = PipelineConfig(window=30, ewm_half_life=10.0, reversal_window=11)


@pytest.fixture(scope="module")
def alake(spark, tmp_path_factory):
    lake = Lakehouse(spark, str(tmp_path_factory.mktemp("acclake")))
    fx = synthetic.generate_market(
        spark, n_tickers=10, start=dt.date(2023, 1, 2), end=dt.date(2023, 6, 30)
    )
    flows.run_backfill(lake, fx, CFG)
    return lake


def test_universe_returns_left_join_keeps_nulls(alake):
    df = accessors.get_universe_returns(alake, dt.date(2023, 1, 2), dt.date(2023, 1, 31))
    # first universe date has no return (pct_change null dropped) → null row kept
    first = df.orderBy("date", "ticker").first()
    assert first["return"] is None
    assert df.columns == ["date", "ticker", "return"]


def test_alphas_null_filtered(alake):
    df = accessors.get_alphas(alake, dt.date(2023, 1, 2), dt.date(2023, 6, 30))
    assert df.filter(F.col("alpha").isNull()).count() == 0
    assert df.count() > 0


def test_idio_vol_and_loadings_nonempty(alake):
    assert accessors.get_idio_vol(alake, dt.date(2023, 1, 2), dt.date(2023, 6, 30)).count() > 0
    fl = accessors.get_factor_loadings(alake, dt.date(2023, 1, 2), dt.date(2023, 6, 30))
    assert set(r.factor for r in fl.select("factor").distinct().collect()) == set(CFG.factors)


def test_derived_year_predicate_prunes(alake):
    df = accessors.get_universe_returns(alake, dt.date(2023, 2, 1), dt.date(2023, 2, 28))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "year" in plan  # derived year filter present → partition pruning


def test_last_market_dates(alake):
    dates = accessors.get_last_market_dates(alake, 5)
    assert len(dates) == 5 and dates == sorted(dates)
    all_dates = sorted(r.date for r in alake.table("calendar").collect())
    assert dates == all_dates[-5:]


def test_cli_help():
    from at_data_pipelines_spark.__main__ import main

    with pytest.raises(SystemExit):
        main(["--help"])


def test_cli_curate_end_to_end(spark, sf_dir, tmp_path, capsys):
    """`python -m at_data_pipelines_spark curate` runs the full funnel and
    prints the one-line funnel JSON."""
    import json

    from at_data_pipelines_spark.__main__ import main

    out = tmp_path / "curated"
    rc = main(
        [
            "curate",
            "--input", f"{sf_dir}/documents.parquet",
            "--output", str(out),
            "--langs", "en",
            "--redact",
        ]
    )
    assert rc == 0
    funnel = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert funnel["n_input"] > funnel["n_after_lang"] >= funnel["n_after_mixture"] > 0
    got = spark.read.parquet(str(out))
    assert got.count() == funnel["n_after_mixture"]
