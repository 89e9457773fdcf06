"""GARCH volatility models via Gaussian MLE.

Reference: src/models/garch.rs:48-600 (Nelder-Mead MLE over
(omega, alpha, beta) with positivity + alpha+beta<1 constraints; the
volatility recursion sigma2_t = omega + alpha*e_{t-1}^2 +
beta*sigma2_{t-1} seeded with the sample variance; mean forecast is the
series mean, the interesting output is the volatility path).

Two families:
- ``garch_fit`` / ``garch_fit_fixed``: the original (1,1)-only
  residual-recursion form (kept bit-stable — forecast_garch_w8's
  DuckDB list_reduce oracle replays it).
- ``garch_fit_pq`` + ``garch_forecast_variance_pq``: the FULL
  garch.rs/statsforecast config surface — arbitrary (p,q), flipped
  coefficients, sigma^2 computed on the ORIGINAL values with NaN
  warmup, NLL on residuals from k = max(p,q), the reference's exact
  start-point list/bounds/tolerance and its non-stationary constructor
  fallback (garch.rs:79-104,173-330).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np

from .optimization import NelderMeadConfig, nelder_mead


@dataclass
class GARCHState:
    omega: float
    alpha: float
    beta: float
    mean: float
    sigma2: np.ndarray      # conditional variance path
    residuals: np.ndarray
    log_likelihood: float
    n: int


def _garch_nll(e2: list, omega: float, alpha: float, beta: float,
               s2_0: float) -> float:
    if omega <= 0 or alpha < 0 or beta < 0 or alpha + beta >= 0.999:
        return np.finfo(np.float64).max
    s2 = s2_0
    nll = 0.0
    for x in e2:
        if s2 <= 0:
            return np.finfo(np.float64).max
        nll += math.log(s2) + x / s2
        s2 = omega + alpha * x + beta * s2
    return 0.5 * nll


def garch_fit(y: np.ndarray) -> GARCHState:
    y = np.asarray(y, dtype=np.float64)
    if y.size < 10:
        raise ValueError("need >= 10 points")
    mu = float(y.mean())
    e = y - mu
    e2 = (e * e).tolist()
    var = float(np.var(e))
    cfg = NelderMeadConfig(max_iter=1000, tolerance=1e-8)
    res = nelder_mead(
        lambda p: _garch_nll(e2, p[0], p[1], p[2], var),
        [0.1 * var, 0.1, 0.8],
        [(1e-8, 10 * var if var > 0 else 1.0), (0.0, 0.998), (0.0, 0.998)],
        cfg,
    )
    omega, alpha, beta = (float(v) for v in res.optimal_point)
    s2 = np.empty(y.size)
    s2[0] = var
    for t in range(1, y.size):
        s2[t] = omega + alpha * e[t - 1] ** 2 + beta * s2[t - 1]
    return GARCHState(
        omega=omega, alpha=alpha, beta=beta, mean=mu, sigma2=s2,
        residuals=e, log_likelihood=-float(res.optimal_value), n=y.size,
    )


def garch_fit_fixed(y: np.ndarray, alpha: float = 0.1, beta: float = 0.8,
                    omega: float | None = None) -> GARCHState:
    """GARCH(1,1) volatility path with FIXED parameters (no MLE) — the
    reference recursion (src/models/garch.rs:340-420) seeded at the
    optimizer's starting point omega = 0.1 * var when omega is None.

    Every float sum is a sequential cumsum fold so the DuckDB list_reduce
    oracle replays it bitwise (CLAUDE.md float-fold rule); the sigma2
    recursion itself is inherently sequential on both sides.
    """
    y = np.asarray(y, dtype=np.float64)
    if y.size < 10:
        raise ValueError("need >= 10 points")
    n = y.size
    mu = float(np.cumsum(y)[-1]) / n
    e = y - mu
    e2 = e * e
    var = float(np.cumsum(e2)[-1]) / n
    w = 0.1 * var if omega is None else float(omega)
    s2 = np.empty(n)
    s2[0] = var
    for t in range(1, n):
        s2[t] = w + alpha * e2[t - 1] + beta * s2[t - 1]
    return GARCHState(
        omega=w, alpha=alpha, beta=beta, mean=mu, sigma2=s2,
        residuals=e, log_likelihood=float("nan"), n=n,
    )


def garch_forecast_variance(state: GARCHState, horizon: int) -> np.ndarray:
    """h-step conditional variance forecast."""
    out = np.empty(horizon)
    last_e2 = float(state.residuals[-1] ** 2)
    s2 = state.omega + state.alpha * last_e2 + state.beta * float(state.sigma2[-1])
    persist = state.alpha + state.beta
    uncond = (
        state.omega / (1.0 - persist) if persist < 1.0 else float(state.sigma2[-1])
    )
    for h in range(horizon):
        out[h] = s2
        s2 = state.omega + persist * s2
        # converges to the unconditional variance
    return out


def garch_predict(state: GARCHState, horizon: int) -> np.ndarray:
    return np.full(horizon, state.mean)


# --------------------------------------------------------------------------
# General-order GARCH(p,q) — full garch.rs config surface (r5 depth item)
# --------------------------------------------------------------------------

@dataclass
class GARCHPQState:
    p: int
    q: int
    omega: float
    alpha: np.ndarray
    beta: np.ndarray
    mean: float
    sigma2: np.ndarray        # conditional variance path (NaN warmup)
    residuals: np.ndarray
    y_vals: np.ndarray        # last p ORIGINAL values (garch.rs:432-447)
    sigma2_vals: np.ndarray   # last q sigma2 values
    log_likelihood: float
    n: int

    def unconditional_variance(self) -> float:
        s = float(self.alpha.sum() + self.beta.sum())
        # garch.rs:160-168: non-stationary fallback omega*10
        return self.omega / (1.0 - s) if s < 1.0 else self.omega * 10.0


def garch_sigma2_pq(x: np.ndarray, omega: float, alpha, beta,
                    p: int, q: int) -> np.ndarray:
    """statsforecast-exact sigma^2 path (garch.rs:173-220): computed on
    the ORIGINAL x values (x^2, not residuals^2), seeded sigma2[0] =
    population var of x, coefficients applied FLIPPED
    (alpha[p-1-i] * x[k-p+i]^2), NaN sigma2 lags skipped; entries
    1..max(p,q)-1 stay NaN (warmup)."""
    x = np.asarray(x, dtype=np.float64)
    n = x.size
    mean = float(x.sum()) / n
    d = x - mean
    sample_var = float(np.dot(d, d)) / n
    sigma2 = np.full(n, np.nan)
    sigma2[0] = sample_var
    max_lag = max(p, q)
    if n <= max_lag:
        return sigma2
    x2 = x * x
    # omega + alpha part vectorized over k with the SAME per-k add order
    # as the scalar recursion (start at omega, += each flipped-alpha
    # term in i-ascending order) — bitwise-identical, ~(p+2)x less
    # Python per optimizer evaluation
    base = np.full(n - max_lag, omega)
    for i in range(p):
        base += alpha[p - 1 - i] * x2[max_lag - p + i : n - p + i]
    for k in range(max_lag, n):
        s = base[k - max_lag]
        for j in range(q):
            sj = sigma2[k - q + j]
            if not math.isnan(sj):
                s += beta[q - 1 - j] * sj
        sigma2[k] = s
    return sigma2


def _garch_nll_pq(x: np.ndarray, z: np.ndarray, params, p: int,
                  q: int) -> float:
    """Reference objective (garch.rs:240-280): NLL over k >= max(p,q)
    with sigma2 from the ORIGINAL values and residuals z in the density;
    stationarity sum < 0.9999 and positivity enforced as hard walls."""
    omega = params[0]
    alpha = params[1 : 1 + p]
    beta = params[1 + p :]
    if sum(alpha) + sum(beta) >= 0.9999:
        return np.finfo(np.float64).max
    if omega < 0.0 or any(a < 0.0 for a in alpha) or any(
        b < 0.0 for b in beta
    ):
        return np.finfo(np.float64).max
    sigma2 = garch_sigma2_pq(x, omega, alpha, beta, p, q)
    log2pi = math.log(2.0 * math.pi)
    s = sigma2[max(p, q) :]
    zz = z[max(p, q) :]
    valid = (s > 0.0) & ~np.isnan(s)
    if not valid.any():
        return 0.0
    sv = s[valid]
    zv = zz[valid]
    # per-term expression + cumsum left fold == the scalar k-ascending
    # accumulation bitwise
    terms = 0.5 * (log2pi + np.log(sv) + zv * zv / sv)
    nll = float(np.cumsum(terms)[-1])
    return nll if math.isfinite(nll) else np.finfo(np.float64).max


def garch_fit_pq(y: np.ndarray, p: int = 1, q: int = 1) -> GARCHPQState:
    """GARCH(p,q) MLE with the reference's exact discipline
    (garch.rs:222-330): bounds omega in (0, 10000), alpha/beta in
    (0, 0.999); the reference's 7 fixed starting points filtered to
    length p+q+1 (for orders beyond (1,1) only the uniform-0.1 start
    survives, exactly as the Rust length check leaves it); NM
    tolerance 1e-10; non-stationary optimum keeps the constructor
    defaults omega=0.01, alpha=0.1/p, beta=0.85/q."""
    y = np.asarray(y, dtype=np.float64)
    p, q = max(p, 1), max(q, 1)
    if y.size < p + q + 10:
        raise ValueError(f"need >= {p + q + 10} points")
    n = y.size
    mean = float(y.sum()) / n
    z = y - mean
    k_params = p + q + 1
    bounds = [(0.0, 10000.0)] + [(0.0, 0.999)] * (p + q)
    cfg = NelderMeadConfig(max_iter=1000, tolerance=1e-10)
    # the reference's 7 starting points (garch.rs:288-296). Its length
    # filter silently drops all but the uniform-0.1 start for orders
    # beyond (1,1); here each (omega, alpha, beta) triple generalizes by
    # splitting alpha/beta mass evenly across the p/q lags, so higher
    # orders keep the full multi-start coverage.
    base_triples = [
        (0.01, 0.05, 0.9),
        (0.0, 0.01, 0.95),
        (0.001, 0.001, 0.99),
        (0.02, 0.02, 0.02),
        (0.1, 0.1, 0.1),
        (0.5, 0.1, 0.8),
    ]
    starting_points = [[0.1] * k_params] + [
        [w] + [a / p] * p + [b / q] * q for w, a, b in base_triples
    ]

    def objective(prm):
        return _garch_nll_pq(y, z, list(prm), p, q)

    best_val = np.finfo(np.float64).max
    best = [0.1] * k_params
    for s0 in starting_points:
        res = nelder_mead(objective, s0, bounds, cfg)
        if res.optimal_value < best_val:
            best_val = res.optimal_value
            best = list(res.optimal_point)
    # one deterministic NM restart from the incumbent: a fresh simplex
    # around the optimum escapes the collapsed-simplex terminations that
    # lose the last ~1e-3 of likelihood on some series
    res = nelder_mead(objective, best, bounds, cfg)
    if res.optimal_value < best_val:
        best_val = res.optimal_value
        best = list(res.optimal_point)
    omega = max(float(best[0]), 0.0)
    alpha = np.maximum(np.asarray(best[1 : 1 + p], dtype=np.float64), 0.0)
    beta = np.maximum(np.asarray(best[1 + p :], dtype=np.float64), 0.0)
    if float(alpha.sum() + beta.sum()) >= 1.0:
        omega = 0.01
        alpha = np.full(p, 0.1 / p)
        beta = np.full(q, 0.85 / q)
    sigma2 = garch_sigma2_pq(y, omega, alpha, beta, p, q)
    return GARCHPQState(
        p=p, q=q, omega=omega, alpha=alpha, beta=beta, mean=mean,
        sigma2=sigma2, residuals=z, y_vals=y[-p:].copy(),
        sigma2_vals=sigma2[-q:].copy(),
        log_likelihood=-float(best_val), n=n,
    )


def garch_forecast_variance_pq(state: GARCHPQState,
                               horizon: int) -> np.ndarray:
    """h-step variance forecast, garch.rs:332-392: roll the flipped
    recursion forward seeding future |y| with sqrt(sigma2hat)."""
    p, q = state.p, state.q
    y_vals = np.full(horizon + p, np.nan)
    s_vals = np.full(horizon + q, np.nan)
    y_vals[: state.y_vals.size] = state.y_vals
    s_vals[: state.sigma2_vals.size] = state.sigma2_vals
    for k in range(horizon):
        s = state.omega
        for i in range(p):
            yv = y_vals[k + i]
            if not math.isnan(yv):
                s += state.alpha[p - 1 - i] * yv * yv
        for j in range(q):
            sv = s_vals[k + j]
            if not math.isnan(sv):
                s += state.beta[q - 1 - j] * sv
        y_vals[p + k] = math.sqrt(s) if s > 0 else 0.0
        s_vals[q + k] = s
    return s_vals[q:].copy()
