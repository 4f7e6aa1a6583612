"""Pipeline constants (reference pipelines/variables.py:1-8)."""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class PipelineConfig:
    factors: list[str] = field(
        default_factory=lambda: sorted(["MTUM", "QUAL", "USMV", "VLUE", "SPY"])
    )
    window: int = 252  # rolling window (1 trading year)
    ewm_half_life: float = 60.0
    reversal_window: int = 21
    ic: float = 0.05  # information coefficient (Grinold alpha rule)
    target_active_risk: float = 0.05
    risk_tolerance: float = 0.005
    benchmark_ticker: str = "SPY"
    # the alpha signal the portfolio QP consumes — the alphas table's
    # grain is (ticker, date, SIGNAL), so the fan-out must select one
    signal: str = "reversal"
