"""Portfolio optimization kernel (SURVEY §2.10 U4-U6).

Reference: cvxpy QP ``maximize wᵀα − (λ/2) wᵀΣw  s.t. Σw = 1, w ≥ 0``
(pipelines/utils/portfolio.py:6-27) plus a ≤5-iteration λ search to hit a
target annualized active risk of 0.05 ± 0.005
(pipelines/utils/portfolio.py:47-121, variables.py:8).

cvxpy/scipy are not in this container, so the QP is solved with
accelerated projected gradient ascent (FISTA) + exact Euclidean simplex
projection (Duchi et al. 2008) — deterministic, dependency-free, and
verifiable via KKT conditions (see tests). The λ search uses the standard
risk-scaling secant (risk ≈ c/λ ⇒ λ ← λ·risk/target), matching the
reference's ≤5-step / 0.005-tolerance contract.

Runs inside ``groupBy(date).applyInPandas`` — one date per group, numpy
scale (n ≈ 500 assets). This replaces the reference's Ray fan-out
(pipelines/portfolio_weights_flow.py:102-132): Spark is the scheduler.
"""

from __future__ import annotations

import numpy as np

ANNUALIZATION = np.sqrt(252.0)


def project_simplex(v: np.ndarray) -> np.ndarray:
    """Euclidean projection onto {w : Σw = 1, w ≥ 0}."""
    if not np.all(np.isfinite(v)):
        # an all-False support mask below would otherwise die with an
        # opaque IndexError deep inside the executor task
        raise ValueError(
            "project_simplex: non-finite input — NaN/inf alphas or "
            "covariance entries must be filtered before the QP"
        )
    u = np.sort(v)[::-1]
    css = np.cumsum(u)
    rho = np.nonzero(u * np.arange(1, len(v) + 1) > (css - 1))[0][-1]
    theta = (css[rho] - 1.0) / (rho + 1)
    return np.maximum(v - theta, 0.0)


def solve_qp_simplex(
    alpha: np.ndarray,
    lam: float,
    sigma: np.ndarray,
    max_iter: int = 5000,
    tol: float = 1e-11,
) -> np.ndarray:
    """maximize αᵀw − (λ/2) wᵀΣw on the simplex (FISTA)."""
    n = len(alpha)
    # Lipschitz constant of the gradient: λ·λmax(Σ) (power iteration)
    v = np.ones(n) / n
    for _ in range(50):
        nv = sigma @ v
        nrm = np.linalg.norm(nv)
        if nrm < 1e-300:
            break
        v = nv / nrm
    lmax = float(v @ sigma @ v)
    step = 1.0 / max(lam * lmax, 1e-12)
    w = np.ones(n) / n
    z = w.copy()
    t = 1.0
    for _ in range(max_iter):
        grad = alpha - lam * (sigma @ z)
        w_new = project_simplex(z + step * grad)
        t_new = (1 + np.sqrt(1 + 4 * t * t)) / 2
        z = w_new + ((t - 1) / t_new) * (w_new - w)
        if np.max(np.abs(w_new - w)) < tol:
            return w_new
        w, t = w_new, t_new
    return w


def active_risk(w: np.ndarray, w_bench: np.ndarray, sigma: np.ndarray) -> float:
    """Annualized tracking error √((w−wb)ᵀΣ(w−wb))·√252
    (pipelines/utils/portfolio.py:65-87)."""
    d = w - w_bench
    return float(np.sqrt(max(d @ sigma @ d, 0.0)) * ANNUALIZATION)


def optimize_portfolio(
    alpha: np.ndarray,
    sigma: np.ndarray,
    w_bench: np.ndarray,
    target_active_risk: float = 0.05,
    tolerance: float = 0.005,
    max_steps: int = 12,
    lam0: float = 1.0,
) -> tuple[np.ndarray, float, float]:
    """λ-calibrated optimization: returns (weights, λ, achieved risk).

    risk(λ) is decreasing but far from ∝1/λ once the w≥0 constraint binds,
    so the search is a secant in log(λ)-log(risk) space — it extrapolates
    along the locally-measured power law and typically lands within
    tolerance in 3-6 solves. (The reference needs ≤5 because it warm-starts
    λ from a fitted predictor over past (λ, risk) pairs —
    pipelines/utils/portfolio.py:47-121; we bootstrap cold, hence a higher
    step cap.) If the target is unreachable the last iterate is returned.
    """
    lam = lam0
    w = solve_qp_simplex(alpha, lam, sigma)
    risk = active_risk(w, w_bench, sigma)
    prev: tuple[float, float] | None = None  # (log lam, log risk)
    for _ in range(max_steps):
        if abs(risk - target_active_risk) <= tolerance or risk <= 0:
            break
        if prev is not None and abs(np.log(risk) - prev[1]) < 1e-4:
            break  # risk saturated — target unreachable (λ→∞ = min-var floor)
        if prev is not None and abs(np.log(risk) - prev[1]) > 1e-12:
            slope = (np.log(lam) - prev[0]) / (np.log(risk) - prev[1])
            # clamp the exponent to the damping band before exp() so a wild
            # slope can't overflow float64 (the damping below would discard
            # the excess anyway)
            exponent = np.clip(
                np.log(lam) + slope * (np.log(target_active_risk) - np.log(risk)),
                np.log(lam) - 7.0,
                np.log(lam) + 7.0,
            )
            new_lam = float(np.exp(exponent))
        else:
            new_lam = lam * (risk / target_active_risk)
        prev = (np.log(lam), np.log(risk))
        lam = min(max(new_lam, lam * 1e-3), lam * 1e3)  # damp wild extrapolation
        w = solve_qp_simplex(alpha, lam, sigma)
        risk = active_risk(w, w_bench, sigma)
    return w, lam, risk
