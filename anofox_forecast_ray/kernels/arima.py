"""ARIMA(p,d,q) via conditional sum of squares + AutoARIMA order search.

Reference semantics (src/models/arima/, re-derived not ported):
- difference / integrate   diff.rs:11-90 (iterative first differences;
  integration continues from the last value of each differencing level)
- CSS objective            model.rs:220-256: residual recursion
  ``pred = c + sum ar_i*(y[t-1-i] - c) + sum ma_j*e[t-1-j]`` starting at
  t = max(p, q), squared-error sum
- estimation               model.rs:258-320: Nelder-Mead over
  (intercept, ar..., ma...), AR/MA bounded to (-0.99, 0.99), init
  intercept = mean and coefficients 0.1/(i+1), max_iter=1000 tol=1e-8
- fitted/IC                model.rs:322-366: variance = SSE/n_eff,
  Gaussian ll, AIC = -2ll + 2k, BIC with ln(n_eff), k = p+q+1
- forecast                 model.rs:420-470: extend the recursion with
  future residuals = 0, then integrate d times
- AutoARIMA                auto_arima.rs: candidate orders up to
  (max_p, max_d, max_q), d chosen by successive differencing while a
  KPSS-style test rejects stationarity, select min AIC. The reference's
  rayon par_iter over candidates maps to per-series actor parallelism
  here (many series in flight), so candidates are evaluated serially
  within one fit.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np

from .optimization import NelderMeadConfig, nelder_mead
from .stats import quantile_normal


def difference(y: np.ndarray, d: int) -> np.ndarray:
    out = np.asarray(y, dtype=np.float64)
    for _ in range(d):
        if out.size <= 1:
            break
        out = np.diff(out)
    return out


def integrate(forecast_diff: np.ndarray, original: np.ndarray, d: int) -> np.ndarray:
    result = np.asarray(forecast_diff, dtype=np.float64).copy()
    original = np.asarray(original, dtype=np.float64)
    for level in range(d - 1, -1, -1):
        init = difference(original, level)[-1] if original.size else 0.0
        result = init + np.cumsum(result)
    return result


def _css(diff: np.ndarray, p: int, q: int, ar, ma, intercept: float) -> float:
    n = diff.size
    start = max(p, q)
    if n <= start:
        return np.finfo(np.float64).max
    if q == 0:
        # Pure-AR candidates (every AutoARIMA grid row with q=0) have no
        # residual feedback, so the recursion is a lag-matrix residual.
        # Bitwise-identical to the sequential loop below: the i-fold is
        # kept sequential (one elementwise += per AR lag, same add order
        # per t) and the squared-error sum is a cumsum left fold (numpy
        # pairwise sums would NOT bit-match the scalar accumulation the
        # optimizer goldens replay).
        pred = np.full(n - start, intercept, dtype=np.float64)
        for i in range(p):
            pred += ar[i] * (diff[start - 1 - i : n - 1 - i] - intercept)
        e = diff[start:] - pred
        e2 = e * e
        return float(np.cumsum(e2)[-1])
    resid = [0.0] * n
    css = 0.0
    y = diff.tolist()
    for t in range(start, n):
        pred = intercept
        for i in range(p):
            pred += ar[i] * (y[t - 1 - i] - intercept)
        for j in range(q):
            pred += ma[j] * resid[t - 1 - j]
        e = y[t] - pred
        resid[t] = e
        css += e * e
    return css


@dataclass
class ARIMAState:
    p: int
    d: int
    q: int
    intercept: float
    ar: np.ndarray
    ma: np.ndarray
    original: np.ndarray
    differenced: np.ndarray
    residuals: np.ndarray
    fitted_diff: np.ndarray
    variance: float
    aic: float
    bic: float
    method: str = "css"
    loglik: float = float("nan")
    a_end: np.ndarray | None = None  # ML: final Kalman state (forecasting)


def _harvey_ss(ar: np.ndarray, ma: np.ndarray):
    """Harvey (1989) state-space form of ARMA(p,q): dim r = max(p, q+1),
    transition T = companion(phi) (phi in the first column, identity
    superdiagonal), shock loading R = (1, theta_1..theta_{r-1})',
    observation Z = e_1. Public textbook construction (Durbin & Koopman
    ch. 3); NOT in the reference — the reference is CSS-only
    (src/models/arima/model.rs has no likelihood path), this is the
    engine's exact-ML depth extension."""
    p, q = ar.size, ma.size
    r = max(p, q + 1)
    T = np.zeros((r, r))
    T[:p, 0] = ar
    T[:-1, 1:] = np.eye(r - 1)
    R = np.zeros(r)
    R[0] = 1.0
    R[1 : q + 1] = ma
    return T, R


def _kalman_r2(z: np.ndarray, phi: float, theta: float, r: int):
    """Scalar specialization of the filter for state dim <= 2 (p <= 1,
    q <= 1 — every default/driver order): T = [[phi,1],[0,0]],
    R = (1, theta)'. After one step p12 == theta and p22 == theta^2, so
    only p11 recurses; stationary init is the closed form
    p11 = (2*phi*theta + theta^2 + 1) / (1 - phi^2). ~20x faster than
    the generic matrix loop (no per-step numpy dispatch)."""
    n = z.size
    den = 1.0 - phi * phi
    if den <= 1e-12:
        return -np.inf, np.nan, None, None, None
    p11 = (2.0 * phi * theta + theta * theta + 1.0) / den
    p12 = theta
    p22 = theta * theta
    a1 = a2 = 0.0
    v = np.empty(n)
    F = np.empty(n)
    ssq = 0.0
    sumlogf = 0.0
    zl = z.tolist()
    for t in range(n):
        f = p11
        if not (f > 1e-12 and math.isfinite(f)):
            return -np.inf, np.nan, None, None, None
        vt = zl[t] - a1
        v[t] = vt
        F[t] = f
        k1 = (phi * p11 + p12) / f
        a1 = phi * a1 + a2 + k1 * vt
        a2 = 0.0
        p11 = phi * phi * p11 + 2.0 * phi * p12 + p22 + 1.0 - k1 * k1 * f
        p12 = theta
        p22 = theta * theta
        ssq += vt * vt / f
        sumlogf += math.log(f)
    sigma2 = ssq / n
    if not (sigma2 > 0 and math.isfinite(sigma2)):
        return -np.inf, np.nan, None, None, None
    ll = -0.5 * n * (math.log(2 * math.pi) + 1.0 + math.log(sigma2)) \
        - 0.5 * sumlogf
    a = np.array([a1, a2])[:r]
    return ll, sigma2, v, F, a


def _kalman_concentrated(z: np.ndarray, ar: np.ndarray, ma: np.ndarray):
    """Concentrated Gaussian log-likelihood of a zero-mean ARMA via the
    Kalman filter with exact stationary initialization (Lyapunov solve).
    Returns (loglik, sigma2_hat, innovations v, prediction variances F,
    final state a). Non-stationary / numerically unstable parameter
    points return -inf so the optimizer steps away."""
    n = z.size
    if ar.size <= 1 and ma.size <= 1:
        return _kalman_r2(
            z,
            float(ar[0]) if ar.size else 0.0,
            float(ma[0]) if ma.size else 0.0,
            max(ar.size, ma.size + 1),
        )
    T, R = _harvey_ss(ar, ma)
    r = T.shape[0]
    RR = np.outer(R, R)
    eye = np.eye(r * r)
    try:
        vecP = np.linalg.solve(eye - np.kron(T, T), RR.reshape(-1))
    except np.linalg.LinAlgError:
        return -np.inf, np.nan, None, None, None
    P = vecP.reshape(r, r)
    if not np.all(np.isfinite(P)):
        return -np.inf, np.nan, None, None, None
    a = np.zeros(r)
    v = np.empty(n)
    F = np.empty(n)
    for t in range(n):
        Ft = P[0, 0]
        if not (Ft > 1e-12 and np.isfinite(Ft)):
            return -np.inf, np.nan, None, None, None
        vt = z[t] - a[0]
        v[t] = vt
        F[t] = Ft
        K = T @ P[:, 0] / Ft
        a = T @ a + K * vt
        P = T @ P @ T.T + RR - np.outer(K, K) * Ft
    sigma2 = float(np.dot(v / F, v) / n)
    if not (sigma2 > 0 and np.isfinite(sigma2)):
        return -np.inf, np.nan, None, None, None
    ll = -0.5 * n * (math.log(2 * math.pi) + 1.0 + math.log(sigma2)) \
        - 0.5 * float(np.sum(np.log(F)))
    return ll, sigma2, v, F, a


def arima_fit_ml(y: np.ndarray, p: int = 1, d: int = 1,
                 q: int = 1) -> ARIMAState:
    """Exact maximum-likelihood ARIMA: Nelder-Mead (the engine's
    reference-exact optimizer discipline) over (mu, ar, ma) maximizing
    the Kalman concentrated likelihood. Warm-started from the CSS
    optimum plus the CSS path's deterministic standard starts, so the
    result is reproducible bit-for-bit across runs and cluster sizes."""
    y = np.asarray(y, dtype=np.float64)
    min_len = max(p, q) + d + 2
    if y.size < min_len:
        raise ValueError(f"need >= {min_len} points, got {y.size}")
    diff = difference(y, d)
    mean = float(diff.mean())
    n = diff.size

    if p == 0 and q == 0:
        mu, ar, ma = mean, np.zeros(0), np.zeros(0)
        ll, sigma2, v, F, a = _kalman_concentrated(diff - mu, ar, ma)
    else:
        def nll(params):
            mu0 = params[0]
            ar0 = np.asarray(params[1 : 1 + p], dtype=np.float64)
            ma0 = np.asarray(params[1 + p :], dtype=np.float64)
            ll0, _, _, _, _ = _kalman_concentrated(diff - mu0, ar0, ma0)
            if not np.isfinite(ll0):
                return np.finfo(np.float64).max
            return -ll0

        css = arima_fit(y, p, d, q)

        def start(a0: float, m0: float):
            return (
                [mean]
                + [a0] + [0.1 / (i + 2) for i in range(p - 1)]
                + [m0] + [0.1 / (i + 2) for i in range(q - 1)]
            )

        # same multi-start family as the CSS fit (the ML surface is just
        # as multimodal; a single warm start loses to the independent
        # golden optimizer on ~1% of series) plus the CSS optimum
        starts = [
            [css.intercept] + list(css.ar) + list(css.ma),
            [mean] + [0.1 / (i + 1) for i in range(p)]
            + [0.1 / (i + 1) for i in range(q)],
        ]
        if p and q:
            starts += [start(0.5, -0.3), start(-0.3, 0.5),
                       start(0.8, 0.05), start(-0.8, 0.8),
                       start(0.8, -0.8)]
        elif p or q:
            starts += [start(0.5, 0.5)[: 1 + p + q],
                       start(-0.5, -0.5)[: 1 + p + q]]
        bounds = [(-np.inf, np.inf)] + [(-0.99, 0.99)] * (p + q)
        cfg = NelderMeadConfig(max_iter=1000, tolerance=1e-8)
        best = None
        for s0 in starts:
            res = nelder_mead(nll, s0, bounds, cfg)
            if best is None or res.optimal_value < best.optimal_value:
                best = res
        mu = float(best.optimal_point[0])
        ar = np.asarray(best.optimal_point[1 : 1 + p], dtype=np.float64)
        ma = np.asarray(best.optimal_point[1 + p :], dtype=np.float64)
        ll, sigma2, v, F, a = _kalman_concentrated(diff - mu, ar, ma)

    if v is None:  # pathological optimum; fall back to CSS state
        st = arima_fit(y, p, d, q)
        st.method = "ml"
        return st
    fitted = (diff - v)  # one-step predictions mu + Z a_t
    resid = v.copy()
    k = p + q + 1
    aic = -2 * ll + 2 * k
    bic = -2 * ll + k * math.log(n) if n > 0 else float("nan")
    return ARIMAState(
        p=p, d=d, q=q, intercept=mu, ar=ar, ma=ma, original=y,
        differenced=diff, residuals=resid, fitted_diff=fitted,
        variance=float(sigma2), aic=aic, bic=bic, method="ml",
        loglik=ll, a_end=a,
    )


def arima_predict_ml(state: ARIMAState, horizon: int) -> np.ndarray:
    """Forecast from the filtered final state: a_{h+1} = T a_h,
    yhat_h = mu + Z a_h; then integrate d levels."""
    T, _ = _harvey_ss(state.ar, state.ma)
    a = state.a_end.copy()
    fdiff = np.empty(horizon)
    for h in range(horizon):
        fdiff[h] = state.intercept + a[0]
        a = T @ a
    if state.d > 0:
        return integrate(fdiff, state.original, state.d)
    return fdiff


def arima_fit(y: np.ndarray, p: int = 1, d: int = 1, q: int = 1) -> ARIMAState:
    y = np.asarray(y, dtype=np.float64)
    min_len = max(p, q) + d + 2
    if y.size < min_len:
        raise ValueError(f"need >= {min_len} points, got {y.size}")
    diff = difference(y, d)
    mean = float(diff.mean())

    if p == 0 and q == 0:
        intercept, ar, ma = mean, np.zeros(0), np.zeros(0)
    else:
        # multi-start Nelder-Mead: the CSS surface of mixed ARMA models is
        # multimodal and a single start from tiny coefficients lands in a
        # visibly worse optimum on ~2% of series (caught by the
        # independent-optimizer golden check). Same pattern the reference
        # uses for ETS(A,A,N) (ets.rs:531-545).
        def start(a0: float, m0: float):
            return (
                [mean]
                + [a0] + [0.1 / (i + 2) for i in range(p - 1)]
                + [m0] + [0.1 / (i + 2) for i in range(q - 1)]
            )

        starts = [
            [mean] + [0.1 / (i + 1) for i in range(p)]
            + [0.1 / (i + 1) for i in range(q)]
        ]
        if p and q:
            starts += [start(0.5, -0.3), start(-0.3, 0.5), start(0.8, 0.05),
                       start(-0.8, 0.8), start(0.8, -0.8)]
        elif p or q:
            starts += [start(0.5, 0.5)[: 1 + p + q],
                       start(-0.5, -0.5)[: 1 + p + q]]
        bounds = [(-np.inf, np.inf)] + [(-0.99, 0.99)] * (p + q)
        cfg = NelderMeadConfig(max_iter=1000, tolerance=1e-8)
        best = None
        for s0 in starts:
            res = nelder_mead(
                lambda params: _css(
                    diff, p, q, params[1 : 1 + p], params[1 + p :], params[0]
                ),
                s0,
                bounds,
                cfg,
            )
            if best is None or res.optimal_value < best.optimal_value:
                best = res
        intercept = float(best.optimal_point[0])
        ar = np.array(best.optimal_point[1 : 1 + p])
        ma = np.array(best.optimal_point[1 + p :])

    # fitted / residuals on the differenced scale
    n = diff.size
    start = max(p, q)
    fitted = np.full(n, np.nan)
    resid = np.zeros(n)
    yl = diff.tolist()
    for t in range(start, n):
        pred = intercept
        for i in range(p):
            pred += ar[i] * (yl[t - 1 - i] - intercept)
        for j in range(q):
            pred += ma[j] * resid[t - 1 - j]
        fitted[t] = pred
        resid[t] = yl[t] - pred
    valid = resid[start:]
    variance = float(np.dot(valid, valid) / valid.size) if valid.size else 0.0
    n_eff = float(valid.size)
    k = p + q + 1
    if variance > 0 and n_eff > 0:
        ll = -0.5 * n_eff * (1.0 + math.log(variance) + math.log(2 * math.pi))
        aic = -2 * ll + 2 * k
        bic = -2 * ll + k * math.log(n_eff)
    else:
        aic = bic = float("nan")
    return ARIMAState(
        p=p, d=d, q=q, intercept=intercept, ar=ar, ma=ma, original=y,
        differenced=diff, residuals=resid, fitted_diff=fitted,
        variance=variance, aic=aic, bic=bic,
    )


def arima_predict(state: ARIMAState, horizon: int) -> np.ndarray:
    ext = state.differenced.tolist()
    res = state.residuals.tolist()
    p, q = state.p, state.q
    for _ in range(horizon):
        t = len(ext)
        pred = state.intercept
        for i in range(p):
            if t > i:
                pred += state.ar[i] * (ext[t - 1 - i] - state.intercept)
        for j in range(q):
            if t > j:
                pred += state.ma[j] * res[t - 1 - j]
        ext.append(pred)
        res.append(0.0)
    fdiff = np.array(ext[state.differenced.size :])
    if state.d > 0:
        return integrate(fdiff, state.original, state.d)
    return fdiff


def psi_weights(ar: np.ndarray, ma: np.ndarray, d: int, horizon: int):
    """MA(inf) psi weights of an ARIMA(p,d,q): the AR polynomial of the
    integrated process is phi(B)(1-B)^d; psi_0 = 1,
    psi_j = theta_j + sum_i phi*_i psi_{j-i}."""
    ar = np.asarray(ar, dtype=np.float64)
    ma = np.asarray(ma, dtype=np.float64)
    # phi*(B) = phi(B) (1-B)^d  ->  coefficients of B^1.. (sign convention:
    # (1 - phi1 B - ...)(1-B)^d = 1 - phistar1 B - ...)
    full = np.concatenate(([1.0], -ar))
    for _ in range(d):
        full = np.convolve(full, [1.0, -1.0])
    phistar = -full[1:]  # phi*_1..; full[0] == 1
    psis = np.empty(horizon)
    for j in range(horizon):
        if j == 0:
            psis[0] = 1.0
            continue
        v = ma[j - 1] if j - 1 < ma.size else 0.0
        for i in range(min(j, phistar.size)):
            v += phistar[i] * psis[j - 1 - i]
        psis[j] = v
    return psis


def arima_intervals(state: ARIMAState, horizon: int, level: float = 0.95,
                    method: str = "reference"):
    """Interval widening. ``method="reference"`` reproduces the
    reference's simplified cumulative variance sigma^2 * h
    (model.rs:594-624); ``method="psi"`` is the exact MA(inf) recursion
    var_h = sigma^2 * sum_{j<h} psi_j^2 (Box-Jenkins) — a strict
    refinement the reference does not implement."""
    point = arima_predict(state, horizon)
    if method == "psi":
        psis = psi_weights(state.ar, state.ma, state.d, horizon)
        var_h = state.variance * np.cumsum(psis * psis)
        se = np.sqrt(var_h)
    else:
        h = np.arange(1, horizon + 1, dtype=np.float64)
        se = np.sqrt(state.variance * h)
    z = quantile_normal((1.0 + level) / 2.0)
    return point, point - z * se, point + z * se


def sarima_intervals(state, horizon: int, level: float = 0.95):
    """Reference SARIMA widening: sigma^2 * (1 + 0.1*h)
    (model.rs:1523-1545)."""
    point = sarima_predict(state, horizon)
    h = np.arange(1, horizon + 1, dtype=np.float64)
    se = np.sqrt(state.variance * (1.0 + 0.1 * h))
    z = quantile_normal((1.0 + level) / 2.0)
    return point, point - z * se, point + z * se


# --- SARIMA (multiplicative seasonal) --------------------------------------

def seasonal_difference(y: np.ndarray, cap_d: int, s: int) -> np.ndarray:
    out = np.asarray(y, dtype=np.float64)
    for _ in range(cap_d):
        if out.size <= s:
            break
        out = out[s:] - out[:-s]
    return out


def _sarima_css(diff, p, q, P, Q, s, ar, ma, sar, sma, intercept):
    """Multiplicative-seasonal CSS (model.rs:876-1000): interaction terms
    at lag (i+1)+(j+1)*s with signs -ar*sar (AR) / +ma*sma (MA)."""
    n = len(diff)
    max_ar = p + P * s if (P > 0 and s > 1) else max(p, P * s)
    max_ma = q + Q * s if (Q > 0 and s > 1) else max(q, Q * s)
    start = max(max_ar, max_ma)
    if n <= start:
        return np.finfo(np.float64).max
    resid = [0.0] * n
    css = 0.0
    for t in range(start, n):
        pred = intercept
        for i in range(p):
            pred += ar[i] * diff[t - (i + 1)]
        for j in range(P):
            pred += sar[j] * diff[t - (j + 1) * s]
        for i in range(p):
            for j in range(P):
                lag = (i + 1) + (j + 1) * s
                if t >= lag:
                    pred -= ar[i] * sar[j] * diff[t - lag]
        for i in range(q):
            pred += ma[i] * resid[t - (i + 1)]
        for j in range(Q):
            pred += sma[j] * resid[t - (j + 1) * s]
        for i in range(q):
            for j in range(Q):
                lag = (i + 1) + (j + 1) * s
                if t >= lag:
                    pred += ma[i] * sma[j] * resid[t - lag]
        e = diff[t] - pred
        resid[t] = e
        css += e * e
    return css


@dataclass
class SARIMAState:
    p: int
    d: int
    q: int
    P: int
    D: int
    Q: int
    s: int
    intercept: float
    ar: np.ndarray
    ma: np.ndarray
    sar: np.ndarray
    sma: np.ndarray
    original: np.ndarray
    nonseasonal_diff: np.ndarray
    differenced: np.ndarray
    residuals: np.ndarray
    variance: float
    aic: float
    bic: float


def sarima_fit(y, p=1, d=0, q=1, P=1, D=0, Q=1, s=12) -> SARIMAState:
    y = np.asarray(y, dtype=np.float64)
    nd = difference(y, d)
    diff = seasonal_difference(nd, D, s)
    max_lag = max(p + P * s, q + Q * s)
    if diff.size <= max_lag + 2:
        raise ValueError("series too short for the requested orders")
    mean = float(diff.mean())
    k = p + q + P + Q
    if k == 0:
        intercept, ar, ma, sar, sma = mean, [], [], [], []
    else:
        initial = [mean] + [0.1 / (i + 1) for i in range(k)]
        bounds = [(-np.inf, np.inf)] + [(-0.99, 0.99)] * k
        cfg = NelderMeadConfig(max_iter=1000, tolerance=1e-8)
        dl = diff.tolist()
        res = nelder_mead(
            lambda prm: _sarima_css(
                dl, p, q, P, Q, s,
                prm[1 : 1 + p],
                prm[1 + p : 1 + p + q],
                prm[1 + p + q : 1 + p + q + P],
                prm[1 + p + q + P :],
                prm[0],
            ),
            initial, bounds, cfg,
        )
        pt = res.optimal_point
        intercept = float(pt[0])
        ar = pt[1 : 1 + p]
        ma = pt[1 + p : 1 + p + q]
        sar = pt[1 + p + q : 1 + p + q + P]
        sma = pt[1 + p + q + P :]

    # residuals via one pass
    n = diff.size
    start = max(p + P * s if P else p, q + Q * s if Q else q)
    resid = np.zeros(n)
    dl = diff.tolist()
    for t in range(start, n):
        pred = intercept
        for i in range(p):
            pred += ar[i] * dl[t - (i + 1)]
        for j in range(P):
            pred += sar[j] * dl[t - (j + 1) * s]
        for i in range(p):
            for j in range(P):
                lag = (i + 1) + (j + 1) * s
                if t >= lag:
                    pred -= ar[i] * sar[j] * dl[t - lag]
        for i in range(q):
            pred += ma[i] * resid[t - (i + 1)]
        for j in range(Q):
            pred += sma[j] * resid[t - (j + 1) * s]
        for i in range(q):
            for j in range(Q):
                lag = (i + 1) + (j + 1) * s
                if t >= lag:
                    pred += ma[i] * sma[j] * resid[t - lag]
        resid[t] = dl[t] - pred
    valid = resid[start:]
    variance = float(np.dot(valid, valid) / valid.size) if valid.size else 0.0
    n_eff = float(valid.size)
    kk = p + q + P + Q + 1
    if variance > 0 and n_eff > 0:
        ll = -0.5 * n_eff * (1.0 + math.log(variance) + math.log(2 * math.pi))
        aic = -2 * ll + 2 * kk
        bic = -2 * ll + kk * math.log(n_eff)
    else:
        aic = bic = float("nan")
    return SARIMAState(
        p=p, d=d, q=q, P=P, D=D, Q=Q, s=s, intercept=intercept,
        ar=np.asarray(ar), ma=np.asarray(ma), sar=np.asarray(sar),
        sma=np.asarray(sma), original=y, nonseasonal_diff=nd,
        differenced=diff, residuals=resid, variance=variance,
        aic=aic, bic=bic,
    )


def sarima_predict(state: SARIMAState, horizon: int) -> np.ndarray:
    p, q, P, Q, s = state.p, state.q, state.P, state.Q, state.s
    ext = state.differenced.tolist()
    res = state.residuals.tolist()
    base = len(state.differenced)
    for _ in range(horizon):
        t = len(ext)
        pred = state.intercept
        for i in range(p):
            if t > i:
                pred += state.ar[i] * ext[t - (i + 1)]
        for j in range(P):
            lag = (j + 1) * s
            if t >= lag:
                pred += state.sar[j] * ext[t - lag]
        for i in range(p):
            for j in range(P):
                lag = (i + 1) + (j + 1) * s
                if t >= lag:
                    pred -= state.ar[i] * state.sar[j] * ext[t - lag]
        for i in range(q):
            if t > i:
                pred += state.ma[i] * res[t - (i + 1)]
        for j in range(Q):
            lag = (j + 1) * s
            if t >= lag:
                pred += state.sma[j] * res[t - lag]
        for i in range(q):
            for j in range(Q):
                lag = (i + 1) + (j + 1) * s
                if t >= lag:
                    pred += state.ma[i] * state.sma[j] * res[t - lag]
        ext.append(pred)
        res.append(0.0)
    fdiff = np.array(ext[base:])
    # undo seasonal differencing (model.rs:846-870 history-seeded cumsum)
    out = fdiff.copy()
    hist = state.nonseasonal_diff
    for _ in range(state.D):
        integrated = np.empty(out.size)
        for h in range(out.size):
            if h < s:
                idx = hist.size - s + h
                prev = hist[idx] if 0 <= idx < hist.size else 0.0
            else:
                prev = integrated[h - s]
            integrated[h] = out[h] + prev
        out = integrated
    if state.d > 0:
        out = integrate(out, state.original, state.d)
    return out


def select_d(y: np.ndarray, max_d: int = 2, kpss_crit: float = 0.463) -> int:
    """Successive differencing while the KPSS statistic rejects level
    stationarity (auto_arima.rs d-selection approach)."""
    from .validation import kpss_test

    d = 0
    cur = np.asarray(y, dtype=np.float64)
    while d < max_d:
        stat = kpss_test(cur).get("statistic", float("nan"))
        if not math.isfinite(stat) or stat < kpss_crit:
            break
        cur = np.diff(cur)
        d += 1
    return d


def auto_arima_fit(
    y: np.ndarray, max_p: int = 3, max_q: int = 3, max_d: int = 2,
    criterion: str = "aic", stepwise: bool = False,
) -> ARIMAState:
    """Order search: exhaustive grid, or Hyndman-Khandakar-style stepwise
    hill climbing (auto_arima.rs stepwise/true_stepwise — the reference's
    60-70%-fewer-evaluations mode)."""
    y = np.asarray(y, dtype=np.float64)
    d = select_d(y, max_d)

    def fit(p, q):
        if p == 0 and q == 0 and d == 0:
            return None
        try:
            st = arima_fit(y, p, d, q)
        except Exception:
            return None
        return None if math.isnan(getattr(st, criterion)) else st

    best = None

    def consider(st):
        nonlocal best
        if st is not None and (
            best is None or getattr(st, criterion) < getattr(best, criterion)
        ):
            best = st
            return True
        return False

    if stepwise:
        seen = set()

        def try_order(p, q):
            if (p, q) in seen or not (0 <= p <= max_p and 0 <= q <= max_q):
                return False
            seen.add((p, q))
            return consider(fit(p, q))

        for p, q in ((2, 2), (0, 0), (1, 0), (0, 1)):
            try_order(min(p, max_p), min(q, max_q))
        improved = True
        while improved and best is not None:
            improved = False
            bp, bq = best.p, best.q
            for dp, dq in ((1, 0), (-1, 0), (0, 1), (0, -1), (1, 1), (-1, -1)):
                if try_order(bp + dp, bq + dq):
                    improved = True
    else:
        for p in range(max_p + 1):
            for q in range(max_q + 1):
                consider(fit(p, q))

    if best is None:
        raise ValueError("no ARIMA candidate could be fit")
    return best
