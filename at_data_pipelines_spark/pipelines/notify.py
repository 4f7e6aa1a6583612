"""Notification sink (SURVEY §2.1 S11) — driver-side callbacks.

Reference: Slack failure alerts + daily trade summaries
(pipelines/utils/slack.py:8-62, slack_failure_handler.py:11-103,
slack_daily_summary.py:47-203). Out of the engine core by design: the
sender is an injected callable (a real deployment wires a webhook); the
engine's part is the failure-capture wrapper and the summary rendering
from lakehouse tables, both testable without a network.
"""

from __future__ import annotations

import traceback
from collections.abc import Callable

from pyspark.sql import functions as F

from ..catalog import Lakehouse

Sender = Callable[[str], None]


def with_failure_notification(flow: Callable, sender: Sender, flow_name: str):
    """Wrap a flow so exceptions post a traceback message before
    re-raising (reference on_failure hook, pipelines/__main__.py:22)."""

    def wrapped(*args, **kwargs):
        try:
            return flow(*args, **kwargs)
        except Exception:
            sender(f":rotating_light: {flow_name} failed\n```{traceback.format_exc()[-1500:]}```")
            raise

    return wrapped


def daily_summary(lake: Lakehouse, sender: Sender) -> str:
    """Render + send the daily portfolio summary (top weights + risk)."""
    pw = lake.table("portfolio_weights")
    last = pw.agg(F.max("date").alias("d")).collect()[0].d
    if last is None:
        msg = "No portfolio weights yet."
        sender(msg)
        return msg
    top = (
        pw.filter(F.col("date") == F.lit(last))
        .orderBy(F.desc("weight"))
        .limit(5)
        .collect()
    )
    metrics = lake.table("portfolio_metrics").filter(F.col("date") == F.lit(last)).collect()
    risk = metrics[0].active_risk if metrics else float("nan")
    lines = [f"Portfolio {last} — active risk {risk:.4f}"] + [
        f"  {r.ticker}: {r.weight:.4f}" for r in top
    ]
    msg = "\n".join(lines)
    sender(msg)
    return msg
