"""SQL frontend over the Lakehouse: same results as the DSL path."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import types as T

from at_data_pipelines_spark.catalog import Lakehouse
from at_data_pipelines_spark.sql import attach_views, sql


def test_sql_over_lakehouse(spark, tmp_path):
    lake = Lakehouse(spark, str(tmp_path / "sqllake"))
    schema = T.StructType(
        [
            T.StructField("ticker", T.StringType()),
            T.StructField("date", T.DateType()),
            T.StructField("year", T.IntegerType()),
            T.StructField("close", T.DoubleType()),
        ]
    )
    lake.create("prices", schema, ["year"], ["date", "ticker"])
    lake.upsert(
        "prices",
        spark.createDataFrame(
            [
                ("A", dt.date(2024, 1, 2), 2024, 10.0),
                ("A", dt.date(2024, 1, 3), 2024, 11.0),
                ("B", dt.date(2024, 1, 2), 2024, 20.0),
            ],
            schema,
        ),
    )
    assert attach_views(lake) == ["prices"]
    out = sql(
        lake,
        """
        SELECT ticker, COUNT(*) AS n, ROUND(AVG(close), 2) AS avg_close
        FROM prices WHERE year = 2024 GROUP BY ticker ORDER BY ticker
        """,
    ).collect()
    assert [(r.ticker, r.n, r.avg_close) for r in out] == [("A", 2, 10.5), ("B", 1, 20.0)]
    # partition pruning also fires through the SQL path
    plan = (
        sql(lake, "SELECT * FROM prices WHERE year = 2024")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters" in plan
