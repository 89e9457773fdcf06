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
lambda in [0,1]); w/g layout (:396-450); gamma initialized 0 (:103-104);
default_k period ladder (:127-138); AIC = -2ll + 2k with k counting
level/sigma2/lambda/trend/damping/gammas/seed states/ARMA orders
(:742-770, :856-861); the AutoTBATS candidate sweep (auto.rs:150-230)
extended with a per-K harmonics-by-AIC search. ARMA(p,q) error terms are
FIT AND USED here (CSS on the state-space residuals, error forecasts
added to the trig extrapolation) — the reference declares the orders and
counts them in AIC but never estimates coefficients (model.rs:105-106
stay empty), so this is a strict superset of its behavior.
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


def default_k(period: int) -> int:
    """Default harmonics count before AIC selection (model.rs:127-138)."""
    if period <= 2:
        return 1
    if period <= 12:
        return period // 2
    if period <= 24:
        return 6
    if period <= 52:
        return 10
    return 15


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
    aic: float = float("nan")
    arma: object = None  # ARIMAState of the error model, when fit


def _n_parameters(state_like) -> int:
    """AIC parameter count (model.rs:742-770): level + sigma2 + lambda? +
    beta (+phi if damped) + 2 gammas per period + seed states + ARMA."""
    periods, ks, lam, use_trend, damped, arma_p, arma_q = state_like
    k = 2
    if lam is not None:
        k += 1
    if use_trend:
        k += 1
        if damped:
            k += 1
    k += 2 * len(periods)
    k += sum(2 * kk for kk in ks)
    k += arma_p + arma_q
    return k


def tbats_fit(
    y: np.ndarray,
    periods=(12,),
    use_trend: bool = True,
    damped: bool = False,
    use_box_cox: bool | None = None,
    fourier_k=None,
    box_cox_lambda: float | None = None,
    phi_fixed: float | None = None,
    arma_p: int = 0,
    arma_q: int = 0,
) -> TBATSState:
    y = np.asarray(y, dtype=np.float64)
    periods = [int(p) for p in periods if p >= 2 and y.size >= 2 * p]
    if y.size < 8:
        raise ValueError("need >= 8 points")
    if fourier_k is None:
        ks = [max(1, min(default_k(p), p // 2)) for p in periods]
    else:
        ks = [max(1, min(int(k), p // 2))
              for k, p in zip(fourier_k, periods)]

    if box_cox_lambda is not None:
        lam = float(box_cox_lambda) if (y > 0).all() else None
    else:
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

    phi = (phi_fixed if phi_fixed is not None else 0.98) if damped else 1.0
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
    resid_z = z - fitted_z

    # ARMA(p,q) error model on the state-space residuals: fit by CSS (the
    # arima kernel with d=0) and fold its one-step fits into fitted_z.
    # Strictly more than the reference, which only counts the orders in
    # AIC (model.rs:105-106 never estimate coefficients).
    arma_state = None
    if (arma_p or arma_q) and n > max(arma_p, arma_q) + 4:
        from .arima import arima_fit

        try:
            arma_state = arima_fit(resid_z, p=arma_p, d=0, q=arma_q)
            arma_fitted = resid_z - arma_state.residuals
            start = max(arma_p, arma_q)
            arma_fitted[:start] = 0.0  # warm-up: no correction
            fitted_z = fitted_z + arma_fitted
            resid_z = z - fitted_z
        except Exception:
            arma_state = None

    sse = float(np.dot(resid_z, resid_z))
    sigma2 = max(sse / n, 1e-300)
    ll = -0.5 * n * (1.0 + math.log(2.0 * math.pi * sigma2))
    k_params = _n_parameters(
        (periods, ks, lam, use_trend, damped,
         arma_p if arma_state is not None else 0,
         arma_q if arma_state is not None else 0)
    )
    aic = -2.0 * ll + 2.0 * k_params

    fitted = inv_box_cox(fitted_z, lam) if lam is not None else fitted_z.copy()
    residuals = y - fitted
    valid = residuals[1:]
    return TBATSState(
        periods=periods, ks=ks, lam=lam, phi=phi, alpha=alpha, beta=beta,
        gammas=gammas, use_trend=use_trend, x=x, F=F, w=w, fitted=fitted,
        residuals=residuals,
        variance=float(np.dot(valid, valid) / valid.size) if valid.size else 0.0,
        n=n, aic=aic, arma=arma_state,
    )


def tbats_predict(state: TBATSState, horizon: int) -> np.ndarray:
    x = state.x.copy()
    out = np.empty(horizon)
    for h in range(horizon):
        out[h] = float(state.w @ x)
        x = state.F @ x
    if state.arma is not None:
        from .arima import arima_predict

        out = out + arima_predict(state.arma, horizon)
    if state.lam is not None:
        return inv_box_cox(out, state.lam)
    return out


def auto_tbats_fit(
    y: np.ndarray,
    periods=(12,),
    try_box_cox: bool = True,
    try_no_trend: bool = True,
    try_damped: bool = True,
    k_sweep: bool = True,
    try_arma: bool = False,
) -> TBATSState:
    """AIC-minimizing sweep over TBATS configurations (auto.rs:150-230):
    trend / no-trend / damped phi grid / Box-Cox lambda grid / reduced and
    increased K, plus (beyond the reference's 3-point K set) a full
    harmonics-by-AIC sweep K = 1..default_k for the first period and an
    optional ARMA(1,1)/(1,0)/(0,1) error sweep on the winner."""
    y = np.asarray(y, dtype=np.float64)
    eligible = [int(p) for p in periods if p >= 2 and y.size >= 2 * p]

    cands: list[dict] = [dict(use_trend=True, use_box_cox=False)]
    if try_no_trend:
        cands.append(dict(use_trend=False, use_box_cox=False))
    if try_damped:
        for ph in (0.9, 0.95, 0.98):
            cands.append(dict(use_trend=True, damped=True, phi_fixed=ph,
                              use_box_cox=False))
    if try_box_cox and (y > 0).all():
        for lamv in (0.0, 0.25, 0.5, 0.75, 1.0):
            cands.append(dict(use_trend=True, box_cox_lambda=lamv))
            if try_damped:
                cands.append(dict(use_trend=True, damped=True,
                                  phi_fixed=0.95, box_cox_lambda=lamv))
    # stage 1: base configuration by AIC (default K)
    best = None
    for kw in cands:
        try:
            st = tbats_fit(y, periods=periods, **kw)
        except Exception:
            continue
        if math.isfinite(st.aic) and (best is None or st.aic < best[1].aic):
            best = (kw, st)
    if best is None:
        raise ValueError("no TBATS candidate could be fit")
    kw, st = best

    # stage 2: harmonics by AIC under the winning base config — the
    # reference tries only {default, K/2, 1.5K} (auto.rs:205-230); the
    # full sweep K = 1..default_k for the dominant period subsumes it
    if eligible:
        dk = [max(1, min(default_k(p), p // 2)) for p in eligible]
        k_cands = (
            range(1, dk[0] + 1) if k_sweep
            else sorted({max(1, dk[0] // 2), dk[0],
                         min(int(dk[0] * 1.5), eligible[0] // 2)})
        )
        for kk in k_cands:
            fk = [kk] + dk[1:]
            try:
                st2 = tbats_fit(y, periods=periods, fourier_k=fk, **kw)
            except Exception:
                continue
            if math.isfinite(st2.aic) and st2.aic < st.aic:
                kw2 = dict(kw, fourier_k=fk)
                kw, st = kw2, st2

    # stage 3: ARMA error orders by AIC on the winner
    if try_arma:
        for p_, q_ in ((1, 0), (0, 1), (1, 1)):
            try:
                st2 = tbats_fit(y, periods=periods, arma_p=p_, arma_q=q_,
                                **kw)
            except Exception:
                continue
            if math.isfinite(st2.aic) and st2.aic < st.aic:
                st = st2
    return st
