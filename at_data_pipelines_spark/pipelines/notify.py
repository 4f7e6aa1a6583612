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

from pyspark.sql import DataFrame
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


def actual_trades_summary(filled_orders: DataFrame, sender: Sender) -> str:
    """Render + send the executed-trades report, line-for-line with the
    reference's second Slack renderer (pipelines/utils/slack.py:8-62):
    no-trades short-circuit, header with trade count + total notional,
    then one 📈/📉 line per fill in order."""
    notional = (F.col("filled_qty") * F.col("filled_avg_price")).alias("notional")
    rows = (
        filled_orders.select("ticker", "side", "filled_qty", "filled_avg_price", notional, "filled_at")
        .orderBy("filled_at", "ticker")
        .collect()
    )
    if not rows:
        msg = "✅ No trades executed today"
        sender(msg)
        return msg
    total = sum(r.notional for r in rows)
    lines = [
        "✅ Executed Trades Report",
        f"*Total Trades Executed:* {len(rows)}",
        f"*Total Notional:* ${total:,.2f}",
    ]
    for r in rows:
        emoji = "📈" if r.side == "buy" else "📉"
        lines.append(
            f"{emoji} {r.side.upper()} {r.filled_qty:.2f} shares of {r.ticker}"
            f" @ ${r.filled_avg_price:.2f} = ${r.notional:,.2f}"
        )
    msg = "\n".join(lines)
    sender(msg)
    return msg


def daily_trading_summary(
    filled_orders: DataFrame,
    account_value: float,
    sender: Sender,
    previous_account_value: float | None = None,
    positions: list[dict] | None = None,
) -> str:
    """Render + send the filled-orders/position-delta daily summary,
    section-for-section with the reference's Slack message
    (pipelines/utils/slack_daily_summary.py:47-203):

    - no-trades short-circuit with portfolio value;
    - header fields: portfolio value, day P&L vs previous value (or trade
      count when no previous), total traded notional, open positions;
    - buys/sells counts + notionals; top-3 buys and sells by notional
      ("qty `TICKER` @ $price = $notional");
    - top-5 current positions by value.

    ``filled_orders`` is the ORDER_SCHEMA frame (sources/rest.py);
    ``positions`` is the injected broker-position list [{ticker, value}]
    (the reference pulls it from the trading API — out of engine scope).
    A day's fills are intrinsically tiny; the aggregation still runs
    Spark-side so the same code handles a backfill of any size.
    """
    n_orders = filled_orders.count()
    if n_orders == 0:
        msg = f"✅ No trades executed today\nPortfolio value: ${account_value:,.2f}"
        sender(msg)
        return msg

    notional = (F.col("filled_qty") * F.col("filled_avg_price")).alias("notional")
    orders = filled_orders.select("ticker", "side", "filled_qty", "filled_avg_price", notional)
    by_side = {
        r.side: (r.n, r.total)
        for r in orders.groupBy("side")
        .agg(F.count("*").alias("n"), F.sum("notional").alias("total"))
        .collect()
    }
    total_notional = sum(t for _, t in by_side.values())
    tops = {
        side: orders.filter(F.col("side") == side)
        .orderBy(F.desc("notional"), "ticker")
        .limit(3)
        .collect()
        for side in ("buy", "sell")
    }

    positions = sorted(positions or [], key=lambda p: p["value"], reverse=True)
    lines = ["📊 Daily Trading Summary", f"*Portfolio Value* ${account_value:,.2f}"]
    if previous_account_value:
        pnl = account_value - previous_account_value
        lines.append(
            f"*Day P&L* ${pnl:,.2f} ({pnl / previous_account_value * 100:+.2f}%)"
        )
    else:
        lines.append(f"*Trades Executed* {n_orders}")
    lines.append(f"*Total Volume* ${total_notional:,.2f}")
    lines.append(f"*Positions* {len(positions)} open")
    for side, label in (("buy", "Buys"), ("sell", "Sells")):
        if side in by_side:
            n, total = by_side[side]
            lines.append(f"*{label}:* {n} · ${total:,.2f}")
    for side, label in (("buy", "Top 3 Buys"), ("sell", "Top 3 Sells")):
        if tops[side]:
            lines.append(f"*{label}*")
            lines.extend(
                f"{i}. {t.filled_qty:.2f} `{t.ticker}` @ ${t.filled_avg_price:.2f}"
                f" = ${t.notional:,.2f}"
                for i, t in enumerate(tops[side], 1)
            )
    if positions:
        lines.append(f"*Top {min(5, len(positions))} Positions*")
        lines.extend(
            f"{i}. `{p['ticker']}`: ${p['value']:,.2f}"
            for i, p in enumerate(positions[:5], 1)
        )
    msg = "\n".join(lines)
    sender(msg)
    return msg


def compute_target_trades(
    weights: DataFrame,
    prices: DataFrame,
    account_value: float,
    min_notional: float = 1.0,
) -> DataFrame:
    """Target trade list from consecutive portfolio weights: for each
    ticker on each date, ``Δweight·account/price`` shares (buy when the
    new weight is higher). This is the engine-side counterpart of the
    reference's broker-diff summary — the reference reads FILLED orders
    back from the API; this derives the INTENDED orders from the
    weights table, so the two can be reconciled.

    Entering tickers trade from weight 0 (lag defaults to 0).
    LIMITATION: a ticker that leaves the weights table entirely emits no
    sell row — full-exit orders need the prior holdings frame, which
    lives with the broker state, not the weights table; reconcile exits
    there. ``min_notional`` drops dust rebalances. One window over
    (ticker, date) — the weights table's natural grain.
    """
    from pyspark.sql.window import Window as W

    w = W.partitionBy("ticker").orderBy("date")
    delta = F.col("weight") - F.coalesce(F.lag("weight").over(w), F.lit(0.0))
    d = (
        weights.select("ticker", "date", "weight")
        .withColumn("d_weight", delta)
        .join(prices.select("ticker", "date", "close"), ["ticker", "date"])
        .withColumn("notional", F.abs(F.col("d_weight")) * F.lit(account_value))
        .filter(F.col("notional") >= min_notional)
    )
    return d.select(
        "ticker",
        "date",
        F.when(F.col("d_weight") >= 0, F.lit("buy")).otherwise(F.lit("sell")).alias("side"),
        (F.col("notional") / F.col("close")).alias("qty"),
        "notional",
    )
