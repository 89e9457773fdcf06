"""TBATS (core): Box-Cox + damped trend + trigonometric seasonality.

Core of src/models/tbats/model.rs:41-780 (De Livera/Hyndman/Snyder 2011)
in innovations state-space form:

    y*_t  = Box-Cox(y_t, lambda)
    yhat  = w' x_{t-1};  eps = y*_t - yhat;  x_t = F x_{t-1} + g eps
    x     = [level, trend?, (cos_j, sin_j) x K per period]
    w     = [1, phi, 1,0, 1,0, ...]
    g     = [alpha, beta, gamma1/gamma2 per trig pair]
    F     = blockdiag(level/trend block, rotation(2*pi*j/m) blocks)

Reference-matching pieces: Box-Cox transform/inverse and the
coefficient-of-variation lambda search (model.rs:330-384, NM 50 iters,
lambda in [0,1]); w/g layout (:396-450); gamma initialized 0 (:103-104).
Simplifications (documented): harmonics K default min(3, m//2) instead of
the AIC search; no ARMA error terms; parameters via SSE Nelder-Mead.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np

from .optimization import NelderMeadConfig, nelder_mead


def box_cox(v: np.ndarray, lam: float) -> np.ndarray:
    if abs(lam) < 1e-10:
        return np.log(v)
    return (np.power(v, lam) - 1.0) / lam


def inv_box_cox(v: np.ndarray, lam: float) -> np.ndarray:
    if abs(lam) < 1e-10:
        return np.exp(v)
    inner = lam * v + 1.0
    return np.where(inner > 0, np.power(np.maximum(inner, 1e-300), 1.0 / lam), 0.0)


def estimate_lambda(y: np.ndarray) -> float:
    """CV-minimizing lambda (model.rs:351-384)."""
    if (y <= 0).any():
        return 1.0

    def obj(p):
        lam = p[0]
        z = box_cox(y, lam)
        m = z.mean()
        if abs(m) < 1e-10:
            return np.finfo(np.float64).max
        return float(np.var(z)) / (m * m)

    cfg = NelderMeadConfig(max_iter=50, tolerance=1e-4)
    res = nelder_mead(obj, [0.5], [(0.0, 1.0)], cfg)
    return float(np.clip(res.optimal_point[0], 0.0, 1.0))


def _build_matrices(periods, ks, phi, alpha, beta, gammas, use_trend):
    base = 2 if use_trend else 1
    tau = sum(2 * k for k in ks)
    dim = base + tau
    F = np.zeros((dim, dim))
    w = np.zeros(dim)
    g = np.zeros(dim)
    F[0, 0] = 1.0
    w[0] = 1.0
    g[0] = alpha
    if use_trend:
        F[0, 1] = phi
        F[1, 1] = phi
        w[1] = phi
        g[1] = beta
    pos = base
    for (m, k), (g1, g2) in zip(zip(periods, ks), gammas):
        for j in range(1, k + 1):
            lam = 2.0 * math.pi * j / m
            c, s = math.cos(lam), math.sin(lam)
            F[pos, pos] = c
            F[pos, pos + 1] = s
            F[pos + 1, pos] = -s
            F[pos + 1, pos + 1] = c
            w[pos] = 1.0
            g[pos] = g1
            g[pos + 1] = g2
            pos += 2
    return F, w, g


def _sse(z, periods, ks, phi, alpha, beta, gammas, use_trend, x0):
    F, w, g = _build_matrices(periods, ks, phi, alpha, beta, gammas, use_trend)
    x = x0.copy()
    sse = 0.0
    for yt in z:
        yhat = float(w @ x)
        e = yt - yhat
        sse += e * e
        x = F @ x + g * e
    return sse


@dataclass
class TBATSState:
    periods: list
    ks: list
    lam: float | None
    phi: float
    alpha: float
    beta: float
    gammas: list
    use_trend: bool
    x: np.ndarray
    F: np.ndarray
    w: np.ndarray
    fitted: np.ndarray
    residuals: np.ndarray
    variance: float
    n: int


def tbats_fit(
    y: np.ndarray,
    periods=(12,),
    use_trend: bool = True,
    damped: bool = False,
    use_box_cox: bool | None = None,
) -> TBATSState:
    y = np.asarray(y, dtype=np.float64)
    periods = [int(p) for p in periods if p >= 2 and y.size >= 2 * p]
    if y.size < 8:
        raise ValueError("need >= 8 points")
    ks = [max(1, min(3, p // 2)) for p in periods]

    if use_box_cox is None:
        use_box_cox = bool((y > 0).all())
    lam = estimate_lambda(y) if use_box_cox else None
    z = box_cox(y, lam) if lam is not None else y.copy()

    base = 2 if use_trend else 1
    tau = sum(2 * k for k in ks)
    x0 = np.zeros(base + tau)
    # seed level/trend with OLS and the trig states with a Fourier
    # regression on the detrended series (statsforecast-style warm start;
    # without it the SSE landscape parks alpha at 1 and never learns the
    # seasonal states)
    n0 = z.size
    tt = np.arange(n0, dtype=np.float64)
    if use_trend:
        A = np.column_stack([np.ones(n0), tt])
        coeff, *_ = np.linalg.lstsq(A, z, rcond=None)
        x0[0], x0[1] = coeff[0], coeff[1]
        detrended = z - A @ coeff
    else:
        x0[0] = float(z.mean())
        detrended = z - x0[0]
    pos = base
    for m, k in zip(periods, ks):
        cols = []
        for j in range(1, k + 1):
            wj = 2.0 * math.pi * j * tt / m
            cols.append(np.cos(wj))
            cols.append(np.sin(wj))
        X = np.column_stack(cols)
        coef, *_ = np.linalg.lstsq(X, detrended, rcond=None)
        for j in range(k):
            x0[pos + 2 * j] = coef[2 * j]
            x0[pos + 2 * j + 1] = coef[2 * j + 1]
        pos += 2 * k

    phi = 0.98 if damped else 1.0
    zl = z.tolist()

    n_g = len(periods)
    init = [0.1, 0.01] + [0.001, 0.001] * n_g
    bounds = [(1e-4, 0.9999), (1e-4, 0.9999)] + [(-0.5, 0.5)] * (2 * n_g)
    cfg = NelderMeadConfig(max_iter=400, tolerance=1e-7)

    def unpack(p):
        gammas = [(p[2 + 2 * i], p[3 + 2 * i]) for i in range(n_g)]
        return p[0], p[1], gammas

    res = nelder_mead(
        lambda p: _sse(zl, periods, ks, phi, p[0], p[1], unpack(p)[2],
                       use_trend, x0),
        init, bounds, cfg,
    )
    alpha, beta, gammas = unpack(res.optimal_point)

    F, w, g = _build_matrices(periods, ks, phi, alpha, beta, gammas, use_trend)
    x = x0.copy()
    n = y.size
    fitted_z = np.empty(n)
    for t in range(n):
        fitted_z[t] = float(w @ x)
        e = zl[t] - fitted_z[t]
        x = F @ x + g * e
    fitted = inv_box_cox(fitted_z, lam) if lam is not None else fitted_z
    residuals = y - fitted
    valid = residuals[1:]
    return TBATSState(
        periods=periods, ks=ks, lam=lam, phi=phi, alpha=alpha, beta=beta,
        gammas=gammas, use_trend=use_trend, x=x, F=F, w=w, fitted=fitted,
        residuals=residuals,
        variance=float(np.dot(valid, valid) / valid.size) if valid.size else 0.0,
        n=n,
    )


def tbats_predict(state: TBATSState, horizon: int) -> np.ndarray:
    x = state.x.copy()
    out = np.empty(horizon)
    for h in range(horizon):
        out[h] = float(state.w @ x)
        x = state.F @ x
    if state.lam is not None:
        return inv_box_cox(out, state.lam)
    return out
