"""SQL frontend over the Lakehouse (SURVEY §3.3).

The reference's only query language is the dataframe DSL; on Spark a SQL
frontend comes free — register every lakehouse table as a temp view and
``spark.sql`` away. Views are lazy scans, so pushdown/pruning work the
same as the DSL path (same Catalyst plans).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .catalog import Lakehouse


def attach_views(lake: Lakehouse, prefix: str = "") -> list[str]:
    """Register all lakehouse tables as temp views; returns view names."""
    names = []
    for t in lake.tables():
        name = f"{prefix}{t}"
        lake.table(t).createOrReplaceTempView(name)
        names.append(name)
    return names


def sql(lake: Lakehouse, query: str) -> DataFrame:
    """One-shot: attach views then run a SQL query against them."""
    attach_views(lake)
    spark: SparkSession = lake.spark
    return spark.sql(query)
