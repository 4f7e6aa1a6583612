"""The reference's daily pipeline DAG re-expressed as Spark jobs.

Reference topology (pipelines/__main__.py:22-37):
calendar → universe → prices (stocks, ETFs) → returns → factor model /
factor covariances → reversal (signal → score → alpha) → benchmark →
betas → portfolio weights.

Connectors (Alpaca REST, Wikipedia scrape — SURVEY §2.1 S5-S10) are
injected as DataFrames: production would fetch on the driver and
``createDataFrame``; tests inject the synthetic fixtures. Orchestration is
a plain ordered function list — Spark distributes the compute; no
Prefect/Ray layer is needed.
"""

from .config import PipelineConfig  # noqa: F401
from . import flows, synthetic  # noqa: F401
