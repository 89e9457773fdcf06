"""Exponential-smoothing kernels: SES scan, ETS state-space recurrences.

Semantics re-derived from the reference (NOT ported):
- SES: src/models/exponential/ses.rs:97-239 — level recurrence
  ``l = a*y + (1-a)*l`` with l0=y[0]; fitted[0]=y[0], residuals[0]=0;
  flat forecast at final level; interval variance factor
  ``1 + b^2*(1-b^(2(h-1)))/(1-b^2)`` with b=1-a; auto-alpha minimizes SSE
  via Nelder-Mead (start 0.5, bounds [1e-4, 0.9999], max_iter 500, tol 1e-8).
- ETS: src/models/exponential/ets.rs — 2 error x 3 trend x 3 seasonal
  state-space arms (:406-495), heuristic init (:284-356), simplified
  Gaussian NLL (:499-512), Nelder-Mead optimize with statsforecast-style
  multi-start for (A,A,N) incl. init states (:521-732), damped sum
  (:735-741), AIC/AICc/BIC on the full sample (:938-950).

The SES level scan is vectorized with a numerically-stable chunked
exponential rescaling (no scipy in this environment): within a chunk of
size K chosen so beta^-K <= 1e13,
``l_t = beta^t * (l0 + a * cumsum(beta^-i * y_i))`` — intermediate
magnitudes are bounded and scale back down, keeping relative error at
~K*eps. ETS recurrences with coupled level/trend/seasonal state remain
explicit loops (they run per-series inside actor-pool stages).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np

from .optimization import NelderMeadConfig, nelder_mead
from .stats import quantile_normal, residual_variance


def ses_scan(y: np.ndarray, alpha: float) -> np.ndarray:
    """Level path of SES: out[t] = level AFTER observing y[t] (l0=y[0]).

    Vectorized chunked scan; bitwise-close (~1e-15 rel) to the sequential
    recurrence, identical semantics.
    """
    y = np.asarray(y, dtype=np.float64)
    n = y.size
    if n == 0:
        return y.copy()
    beta = 1.0 - alpha
    out = np.empty(n)
    out[0] = y[0]
    if n == 1:
        return out
    if beta <= 0.0:
        out[1:] = y[1:]
        return out
    if n <= 512:
        # exact sequential recurrence for short series: bitwise identical
        # to the reference loop (and to a sequential SQL list_reduce
        # oracle); the chunked scan below is for long series only
        level = y[0]
        for i in range(1, n):
            level = alpha * y[i] + beta * level
            out[i] = level
        return out
    # chunk size: beta^-K <= 1e13
    K = max(8, min(4096, int(13.0 / max(1e-12, -math.log10(beta)))))
    level = y[0]
    i = 1
    while i < n:
        j = min(n, i + K)
        m = j - i
        powers = beta ** np.arange(1, m + 1)          # beta^1..beta^m
        inv = 1.0 / powers                             # beta^-1..beta^-m
        c = np.cumsum(inv * y[i:j])
        out[i:j] = powers * (level + alpha * c)
        level = out[j - 1]
        i = j
    return out


def linear_recurrence_scan(y: np.ndarray, lam: complex, w: complex, z0: complex):
    """z_t = lam*z_{t-1} + w*y[t] for t=0..n-1 (z_{-1}=z0), vectorized.

    Same chunked exponential-rescaling trick as ``ses_scan``, generalized
    to complex coefficients (eigen-channels of small linear state spaces).
    Chunk size bounds |lam|^{+-K} to keep intermediates finite.
    """
    y = np.asarray(y)
    n = y.size
    out = np.empty(n, dtype=np.complex128)
    if n == 0:
        return out
    alam = abs(lam)
    if alam < 1e-300:
        np.multiply(y, w, out=out)
        return out
    mag = max(alam, 1.0 / alam)
    K = max(8, min(4096, int(13.0 / max(1e-12, math.log10(mag)))))
    z = complex(z0)
    i = 0
    while i < n:
        j = min(n, i + K)
        m = j - i
        powers = lam ** np.arange(1, m + 1)
        c = np.cumsum((w / powers) * y[i:j])
        out[i:j] = powers * (z + c)
        z = out[j - 1]
        i = j
    return out


def ets_aan_sse_path(y: np.ndarray, alpha: float, beta: float,
                     l0: float, b0: float):
    """Vectorized one-step forecasts for ETS(A,A,N).

    State recurrence x_t = A x_{t-1} + c y_t with
    A = [[1-a, 1-a], [-ab, 1-ab]], c = [a, ab] (substituted form of the
    level/trend updates, ets.rs:455-459). A is diagonalized; each
    eigen-channel is a scalar linear recurrence computed by
    ``linear_recurrence_scan``. Returns the one-step forecast path
    f_t = l_{t-1} + b_{t-1} (f_0 = l0 + b0). Falls back to the loop when A
    is defective.
    """
    y = np.asarray(y, dtype=np.float64)
    n = y.size
    a, b = alpha, beta
    A = np.array([[1 - a, 1 - a], [-a * b, 1 - a * b]])
    tr = A[0, 0] + A[1, 1]
    det = A[0, 0] * A[1, 1] - A[0, 1] * A[1, 0]
    disc = complex(tr * tr - 4 * det) ** 0.5
    lam1 = (tr + disc) / 2
    lam2 = (tr - disc) / 2
    if abs(lam1 - lam2) < 1e-9:
        return None  # defective / near-defective: caller uses the loop
    # eigenvectors v_i = [A01, lam_i - A00]
    v1 = np.array([A[0, 1], lam1 - A[0, 0]], dtype=np.complex128)
    v2 = np.array([A[0, 1], lam2 - A[0, 0]], dtype=np.complex128)
    P = np.column_stack([v1, v2])
    try:
        Pinv = np.linalg.inv(P)
    except np.linalg.LinAlgError:
        return None
    c = np.array([a, a * b], dtype=np.complex128)
    x0 = np.array([l0, b0], dtype=np.complex128)
    w = Pinv @ c
    z0 = Pinv @ x0
    ch1 = linear_recurrence_scan(y, lam1, w[0], z0[0])
    ch2 = linear_recurrence_scan(y, lam2, w[1], z0[1])
    # x_t = P [z1, z2]; f_{t+1} = l_t + b_t = (P row sums) . z_t
    r1 = P[0, 0] + P[1, 0]
    r2 = P[0, 1] + P[1, 1]
    f = np.empty(n)
    f[0] = l0 + b0
    f[1:] = (r1 * ch1[:-1] + r2 * ch2[:-1]).real
    return f


def ses_sse(y: np.ndarray, alpha: float) -> float:
    """SSE of one-step errors vs the running level (ses.rs:97-112)."""
    if y.size == 0:
        return np.finfo(np.float64).max
    levels = ses_scan(y, alpha)
    err = y[1:] - levels[:-1]
    return float(np.dot(err, err))


def ses_optimize_alpha(y: np.ndarray) -> float:
    cfg = NelderMeadConfig(max_iter=500, tolerance=1e-8)
    res = nelder_mead(
        lambda p: ses_sse(y, p[0]), [0.5], [(0.0001, 0.9999)], cfg
    )
    return float(np.clip(res.optimal_point[0], 0.0001, 0.9999))


@dataclass
class SESState:
    alpha: float
    level: float
    fitted: np.ndarray
    residuals: np.ndarray
    variance: float
    n: int


def ses_fit(y: np.ndarray, alpha: float | None = None) -> SESState:
    y = np.asarray(y, dtype=np.float64)
    if y.size == 0:
        raise ValueError("empty series")
    if alpha is None:
        alpha = ses_optimize_alpha(y)
    alpha = float(np.clip(alpha, 0.0001, 0.9999))
    levels = ses_scan(y, alpha)
    fitted = np.empty_like(y)
    fitted[0] = y[0]
    fitted[1:] = levels[:-1]
    residuals = np.empty_like(y)
    residuals[0] = 0.0
    residuals[1:] = y[1:] - fitted[1:]
    return SESState(
        alpha=alpha,
        level=float(levels[-1]),
        fitted=fitted,
        residuals=residuals,
        variance=residual_variance(residuals, skip=1),
        n=y.size,
    )


def ses_predict(state: SESState, horizon: int) -> np.ndarray:
    return np.full(horizon, state.level)


def ses_intervals(state: SESState, horizon: int, level: float = 0.95):
    """(point, lower, upper); variance factor per ses.rs:200-239."""
    z = quantile_normal((1.0 + level) / 2.0)
    beta = 1.0 - state.alpha
    beta2 = beta * beta
    h = np.arange(1, horizon + 1, dtype=np.float64)
    if abs(1.0 - beta2) < 1e-10:
        factor = h.copy()
        factor[0] = 1.0
    else:
        factor = 1.0 + beta2 * (1.0 - beta2 ** (h - 1)) / (1.0 - beta2)
        factor[0] = 1.0
    se = np.sqrt(state.variance * factor)
    point = ses_predict(state, horizon)
    return point, point - z * se, point + z * se


# ---------------------------------------------------------------------------
# ETS state space
# ---------------------------------------------------------------------------

VALID_TRENDS = ("N", "A", "Ad")
VALID_SEASONALS = ("N", "A", "M")


@dataclass
class ETSSpec:
    error: str = "A"      # A | M
    trend: str = "N"      # N | A | Ad
    seasonal: str = "N"   # N | A | M

    @property
    def has_trend(self):
        return self.trend != "N"

    @property
    def has_seasonal(self):
        return self.seasonal != "N"

    @property
    def damped(self):
        return self.trend == "Ad"

    def short_name(self) -> str:
        return f"ETS({self.error},{self.trend},{self.seasonal})"


@dataclass
class ETSState:
    spec: ETSSpec
    period: int
    alpha: float
    beta: float | None
    gamma: float | None
    phi: float | None
    level: float
    trend: float
    seasonals: np.ndarray | None
    fitted: np.ndarray
    residuals: np.ndarray
    variance: float
    n: int
    aic: float = float("nan")
    aicc: float = float("nan")
    bic: float = float("nan")
    log_likelihood: float = float("nan")


def _ets_initial_state(y: np.ndarray, spec: ETSSpec, period: int):
    """Heuristic init (ets.rs:284-356): regression on first maxn points for
    trended non-seasonal; first-period mean + cross-period slope for
    seasonal; first value otherwise."""
    n = y.size
    if spec.has_trend and not spec.has_seasonal:
        maxn = min(n, max(10, 2 * period))
        x = np.arange(1, maxn + 1, dtype=np.float64)
        yy = y[:maxn]
        x_mean = (maxn + 1) / 2.0
        # sequential folds (cumsum), not pairwise sums: bitwise parity
        # with the DuckDB list_reduce oracle (see kernels/theta.py)
        y_mean = float(np.cumsum(yy)[-1]) / maxn
        ss_xx = float(np.cumsum((x - x_mean) ** 2)[-1])
        ss_xy = float(np.cumsum((x - x_mean) * (yy - y_mean))[-1])
        b = ss_xy / ss_xx if ss_xx > 0 else 0.0
        a = y_mean - b * x_mean
        level, trend = a, b
    elif spec.has_seasonal and n >= period:
        level = float(y[:period].sum()) / period
        if spec.has_trend and n >= 2 * period:
            trend = float(
                np.mean((y[period : 2 * period] - y[:period]) / period)
            )
        else:
            trend = 0.0
    else:
        level = float(y[0])
        trend = float(y[1] - y[0]) if spec.has_trend and n >= 2 else 0.0

    if spec.has_seasonal and n >= period:
        if spec.seasonal == "A":
            seasonals = (y[:period] - level).astype(np.float64)
        else:
            seasonals = np.where(
                abs(level) > 1e-10, y[:period] / level, 1.0
            ).astype(np.float64)
    else:
        seasonals = np.zeros(0)
    return level, trend, seasonals


def _ets_one_step(spec: ETSSpec, level, trend, s, phi):
    t, se = spec.trend, spec.seasonal
    if t == "N":
        base = level
    elif t == "A":
        base = level + trend
    else:
        base = level + phi * trend
    if se == "N":
        return base
    if se == "A":
        return base + s
    return base * s


def _ets_update(spec: ETSSpec, level, trend, s, y, alpha, beta, gamma, phi):
    """One state update; returns (level, trend, new_s)."""
    t, se = spec.trend, spec.seasonal
    level_prev = level
    damp = phi if t == "Ad" else 1.0
    if se == "N":
        target = y
    elif se == "A":
        target = y - s
    else:
        target = y / s if abs(s) > 1e-10 else y
    if t == "N":
        level = alpha * target + (1.0 - alpha) * level
    else:
        level = alpha * target + (1.0 - alpha) * (level_prev + damp * trend)
        trend = beta * (level - level_prev) + (1.0 - beta) * damp * trend
    if se == "A":
        s = gamma * (y - level) + (1.0 - gamma) * s
    elif se == "M":
        s = gamma * (y / level) + (1.0 - gamma) * s if abs(level) > 1e-10 else s
    return level, trend, s


def _ets_nll(y, spec, period, alpha, beta, gamma, phi, init_level, init_trend):
    """Simplified Gaussian NLL (ets.rs:358-512)."""
    n = y.size
    start = period if spec.has_seasonal else 0
    if n <= start + 1:
        return np.finfo(np.float64).max
    # fast paths for the two hot non-seasonal additive specs: tight scalar
    # loop at small n (numpy call overhead dominates there), vectorized
    # eigen-channel scan for long series
    if spec.seasonal == "N" and spec.error == "A":
        if spec.trend == "N":
            level = (
                _ets_initial_state(y, spec, period)[0]
                if init_level is None
                else init_level
            )
            if n <= 8192:
                sse = 0.0
                beta_c = 1.0 - alpha
                for yt in y.tolist():
                    e = yt - level
                    sse += e * e
                    level = alpha * yt + beta_c * level
            else:
                f = np.empty(n)
                f[0] = level
                lev = linear_recurrence_scan(y, 1.0 - alpha, alpha, level).real
                f[1:] = lev[:-1]
                err = y - f
                sse = float(np.dot(err, err))
            sigma2 = max(sse / n, 1e-300)
            return 0.5 * n * (1.0 + math.log(sigma2) + math.log(2 * math.pi))
        if spec.trend == "A":
            if init_level is None or init_trend is None:
                h_level, h_trend, _ = _ets_initial_state(y, spec, period)
            else:
                h_level = h_trend = 0.0
            l0 = h_level if init_level is None else init_level
            b0 = h_trend if init_trend is None else init_trend
            b = 0.0 if beta is None else beta
            if n <= 8192:
                level, trend = l0, b0
                sse = 0.0
                a1 = 1.0 - alpha
                b1 = 1.0 - b
                for yt in y.tolist():
                    f = level + trend
                    e = yt - f
                    sse += e * e
                    lp = level
                    level = alpha * yt + a1 * f
                    trend = b * (level - lp) + b1 * trend
                sigma2 = max(sse / n, 1e-300)
                return 0.5 * n * (
                    1.0 + math.log(sigma2) + math.log(2 * math.pi)
                )
            f = ets_aan_sse_path(y, alpha, b, l0, b0)
            if f is not None:
                err = y - f
                sse = float(np.dot(err, err))
                sigma2 = max(sse / n, 1e-300)
                return 0.5 * n * (
                    1.0 + math.log(sigma2) + math.log(2 * math.pi)
                )
        if spec.trend == "Ad" and n <= 8192:
            # damped-trend tight loop (the remaining AutoETS candidate)
            if init_level is None or init_trend is None:
                h_level, h_trend, _ = _ets_initial_state(y, spec, period)
            else:
                h_level = h_trend = 0.0
            level = h_level if init_level is None else init_level
            trend = h_trend if init_trend is None else init_trend
            b = 0.0 if beta is None else beta
            ph = 1.0 if phi is None else phi
            a1 = 1.0 - alpha
            b1 = 1.0 - b
            sse = 0.0
            for yt in y.tolist():
                dt = ph * trend
                f = level + dt
                e = yt - f
                sse += e * e
                lp = level
                level = alpha * yt + a1 * f
                trend = b * (level - lp) + b1 * dt
            sigma2 = max(sse / n, 1e-300)
            return 0.5 * n * (1.0 + math.log(sigma2) + math.log(2 * math.pi))
    if spec.seasonal == "N" and spec.error == "M" and n <= 8192:
        # multiplicative-error non-seasonal arms (MNN / MAN / MAdN):
        # same recursions as the additive loops above, err normalized by
        # the forecast and the Jacobian sum(log|y|) added to the NLL
        if init_level is None or init_trend is None:
            h_level, h_trend, _ = _ets_initial_state(y, spec, period)
        else:
            h_level = h_trend = 0.0
        level = h_level if init_level is None else init_level
        trend = h_trend if init_trend is None else init_trend
        b = 0.0 if beta is None else beta
        ph = phi if (spec.trend == "Ad" and phi is not None) else 1.0
        a1 = 1.0 - alpha
        b1 = 1.0 - b
        sse = 0.0
        sly = 0.0
        if spec.trend == "N":
            for yt in y.tolist():
                e = yt - level
                if abs(level) > 1e-10:
                    e = e / level
                sse += e * e
                sly += math.log(abs(yt)) if yt != 0 else 0.0
                level = alpha * yt + a1 * level
        else:
            for yt in y.tolist():
                dt = ph * trend
                f = level + dt
                e = yt - f
                if abs(f) > 1e-10:
                    e = e / f
                sse += e * e
                sly += math.log(abs(yt)) if yt != 0 else 0.0
                lp = level
                level = alpha * yt + a1 * f
                trend = b * (level - lp) + b1 * dt
        sigma2 = sse / n
        if sigma2 <= 0:
            sigma2 = 1e-300
        return 0.5 * n * (1.0 + math.log(sigma2) + math.log(2.0 * math.pi)) + sly

    h_level, h_trend, seasonals = _ets_initial_state(y, spec, period)
    level = h_level if init_level is None else init_level
    trend = h_trend if init_trend is None else init_trend
    seasonals = seasonals.copy()
    phi_ = 1.0 if phi is None else phi
    beta_ = 0.0 if beta is None else beta
    gamma_ = 0.0 if gamma is None else gamma

    if spec.error == "A" and spec.seasonal == "A" and spec.trend in ("N", "A"):
        # tight loops for the additive seasonal specs (ANA / AAA) — the
        # AutoETS grid evaluates these thousands of times per series
        sl = seasonals.tolist()
        yl = y.tolist()
        m = period
        a1 = 1.0 - alpha
        g1 = 1.0 - gamma_
        sse = 0.0
        if spec.trend == "N":
            for t in range(start, n):
                yt = yl[t]
                sidx = t % m
                s = sl[sidx]
                e = yt - (level + s)
                sse += e * e
                level = alpha * (yt - s) + a1 * level
                sl[sidx] = gamma_ * (yt - level) + g1 * s
        else:
            b1 = 1.0 - beta_
            for t in range(start, n):
                yt = yl[t]
                sidx = t % m
                s = sl[sidx]
                e = yt - (level + trend + s)
                sse += e * e
                lp = level
                level = alpha * (yt - s) + a1 * (lp + trend)
                trend = beta_ * (level - lp) + b1 * trend
                sl[sidx] = gamma_ * (yt - level) + g1 * s
        count = n - start
        if count == 0:
            return np.finfo(np.float64).max
        sigma2 = max(sse / count, 1e-300)
        return 0.5 * count * (1.0 + math.log(sigma2) + math.log(2.0 * math.pi))

    # remaining arms (multiplicative-seasonal and M-error seasonal
    # specs): the _ets_one_step/_ets_update arithmetic inlined as one
    # scalar loop — per-step function dispatch + np.float64 boxing cost
    # ~2-3x on the AutoETS grid. Branch semantics, guards and operation
    # order are identical, so the NLL is bitwise-equal to the dispatch
    # path.
    yl = y.tolist()
    sl = seasonals.tolist()
    trend_kind = spec.trend
    seas_kind = spec.seasonal
    mult_err = spec.error == "M"
    damp = phi_ if trend_kind == "Ad" else 1.0
    sse = 0.0
    sum_log_y = 0.0
    count = n - start
    if count <= 0:
        return np.finfo(np.float64).max
    sidx = 0
    s = 1.0
    for t in range(start, n):
        yt = yl[t]
        if seas_kind != "N":
            sidx = t % period
            s = sl[sidx]
        if trend_kind == "N":
            base = level
        else:
            base = level + damp * trend
        if seas_kind == "N":
            f = base
        elif seas_kind == "A":
            f = base + s
        else:
            f = base * s
        err = yt - f
        if mult_err:
            if abs(f) > 1e-10:
                err = err / f
            sum_log_y += math.log(abs(yt)) if yt != 0 else 0.0
        sse += err * err
        if seas_kind == "N":
            target = yt
        elif seas_kind == "A":
            target = yt - s
        else:
            target = yt / s if abs(s) > 1e-10 else yt
        lp = level
        if trend_kind == "N":
            level = alpha * target + (1.0 - alpha) * level
        else:
            level = alpha * target + (1.0 - alpha) * (lp + damp * trend)
            trend = beta_ * (level - lp) + (1.0 - beta_) * damp * trend
        if seas_kind == "A":
            sl[sidx] = gamma_ * (yt - level) + (1.0 - gamma_) * s
        elif seas_kind == "M" and abs(level) > 1e-10:
            sl[sidx] = gamma_ * (yt / level) + (1.0 - gamma_) * s
    sigma2 = sse / count
    if sigma2 <= 0:
        sigma2 = 1e-300
    ll = -0.5 * count * (1.0 + math.log(sigma2) + math.log(2.0 * math.pi))
    if spec.error == "M":
        ll -= sum_log_y
    return -ll


def _ets_optimize(y, spec, period):
    """Parameter (+init state for AAN) optimization (ets.rs:521-732)."""
    cfg = NelderMeadConfig(max_iter=2000, tolerance=1e-10)
    init_level, init_trend, _ = _ets_initial_state(y, spec, period)
    y_min, y_max = float(y.min()), float(y.max())
    y_range = y_max - y_min
    level_bounds = (y_min - y_range, y_max + y_range)
    trend_bounds = (-y_range, y_range)
    ht, hs, d = spec.has_trend, spec.has_seasonal, spec.damped

    if ht and not d and not hs:
        best = None
        for a0 in (0.1, 0.3, 0.5, 0.8, 0.99):
            res = nelder_mead(
                lambda p: _ets_nll(
                    y, spec, period, p[0], p[1], None, None, p[2], p[3]
                ),
                [a0, 0.01, init_level, init_trend],
                [(0.0001, 0.9999), (0.0001, 0.9999), level_bounds, trend_bounds],
                cfg,
            )
            if best is None or res.optimal_value < best.optimal_value:
                best = res
        p = best.optimal_point
        return (
            float(np.clip(p[0], 0.0001, 0.9999)),
            float(np.clip(p[1], 0.0001, 0.9999)),
            None,
            None,
            float(p[2]),
            float(p[3]),
        )
    if not ht and not hs:
        res = nelder_mead(
            lambda p: _ets_nll(y, spec, period, p[0], None, None, None, None, None),
            [0.3],
            [(0.0001, 0.9999)],
            cfg,
        )
        return (
            float(np.clip(res.optimal_point[0], 0.0001, 0.9999)),
            None, None, None, init_level, init_trend,
        )
    if not ht and hs:
        res = nelder_mead(
            lambda p: _ets_nll(y, spec, period, p[0], None, p[1], None, None, None),
            [0.3, 0.1],
            [(0.0001, 0.9999)] * 2,
            cfg,
        )
        p = res.optimal_point
        return (
            float(np.clip(p[0], 0.0001, 0.9999)),
            None,
            float(np.clip(p[1], 0.0001, 0.9999)),
            None, init_level, init_trend,
        )
    if ht and hs and not d:
        res = nelder_mead(
            lambda p: _ets_nll(y, spec, period, p[0], p[1], p[2], None, None, None),
            [0.3, 0.1, 0.1],
            [(0.0001, 0.9999)] * 3,
            cfg,
        )
        p = res.optimal_point
        return (
            float(np.clip(p[0], 0.0001, 0.9999)),
            float(np.clip(p[1], 0.0001, 0.9999)),
            float(np.clip(p[2], 0.0001, 0.9999)),
            None, init_level, init_trend,
        )
    if ht and not hs and d:
        res = nelder_mead(
            lambda p: _ets_nll(y, spec, period, p[0], p[1], None, p[2], None, None),
            [0.3, 0.1, 0.98],
            [(0.0001, 0.9999), (0.0001, 0.9999), (0.8, 0.98)],
            cfg,
        )
        p = res.optimal_point
        return (
            float(np.clip(p[0], 0.0001, 0.9999)),
            float(np.clip(p[1], 0.0001, 0.9999)),
            None,
            float(np.clip(p[2], 0.8, 0.98)),
            init_level, init_trend,
        )
    # full damped seasonal
    res = nelder_mead(
        lambda p: _ets_nll(y, spec, period, p[0], p[1], p[2], p[3], None, None),
        [0.3, 0.1, 0.1, 0.98],
        [(0.0001, 0.9999), (0.0001, 0.9999), (0.0001, 0.9999), (0.8, 0.98)],
        cfg,
    )
    p = res.optimal_point
    return (
        float(np.clip(p[0], 0.0001, 0.9999)),
        float(np.clip(p[1], 0.0001, 0.9999)),
        float(np.clip(p[2], 0.0001, 0.9999)),
        float(np.clip(p[3], 0.8, 0.98)),
        init_level, init_trend,
    )


def _ets_num_params(spec: ETSSpec, period: int) -> int:
    k = 2  # alpha + initial level
    if spec.has_trend:
        k += 2  # beta + initial trend
    if spec.has_seasonal:
        k += 1 + period  # gamma + initial seasonal states
    if spec.damped:
        k += 1
    return k


def ets_fit(
    y: np.ndarray,
    spec: ETSSpec | str = "ANN",
    period: int = 12,
    alpha: float | None = None,
    beta: float | None = None,
    gamma: float | None = None,
    phi: float | None = None,
    optimize: bool = True,
) -> ETSState:
    if isinstance(spec, str):
        s = spec
        trend = "Ad" if len(s) == 4 else s[1]
        spec = ETSSpec(s[0], trend, s[-1])
    y = np.asarray(y, dtype=np.float64)
    min_len = 2 * period if spec.has_seasonal else 2
    if y.size < min_len:
        raise ValueError(f"need >= {min_len} points, got {y.size}")

    init_level, init_trend, seasonals = _ets_initial_state(y, spec, period)
    if optimize and alpha is None:
        alpha, beta, gamma, phi, init_level, init_trend = _ets_optimize(
            y, spec, period
        )
    a = alpha if alpha is not None else 0.3
    b = beta if beta is not None else 0.1
    g = gamma if gamma is not None else 0.1
    ph = phi if phi is not None else 1.0

    n = y.size
    start = period if spec.has_seasonal else 0
    level, trend = init_level, init_trend
    seasonals = seasonals.copy()
    fitted = np.empty(n)
    residuals = np.empty(n)
    fitted[:start] = y[:start]
    residuals[:start] = 0.0
    if spec.error == "A" and spec.seasonal == "N" and spec.trend in ("N", "A"):
        # tight scalar loops for the hot non-seasonal additive specs (the
        # generic arm dispatch below costs ~2x in per-step overhead)
        yl = y.tolist()
        if spec.trend == "N":
            a1 = 1.0 - a
            for t in range(n):
                yt = yl[t]
                fitted[t] = level
                residuals[t] = yt - level
                level = a * yt + a1 * level
        else:
            a1 = 1.0 - a
            b1 = 1.0 - b
            for t in range(n):
                yt = yl[t]
                f = level + trend
                fitted[t] = f
                residuals[t] = yt - f
                lp = level
                level = a * yt + a1 * f
                trend = b * (level - lp) + b1 * trend
    else:
        for t in range(start, n):
            yt = y[t]
            sidx = t % period if spec.has_seasonal else 0
            s = seasonals[sidx] if spec.has_seasonal else 1.0
            f = _ets_one_step(spec, level, trend, s, ph)
            fitted[t] = f
            residuals[t] = yt - f
            level, trend, s_new = _ets_update(
                spec, level, trend, s, yt, a, b, g, ph
            )
            if spec.has_seasonal:
                seasonals[sidx] = s_new

    variance = residual_variance(residuals, skip=start)
    k = _ets_num_params(spec, period)
    nf = float(n)
    ll = -0.5 * nf * (1.0 + math.log(variance) + math.log(2 * math.pi)) if variance > 0 else float("nan")
    return ETSState(
        spec=spec, period=period,
        alpha=a,
        beta=b if spec.has_trend else None,
        gamma=g if spec.has_seasonal else None,
        phi=ph if spec.damped else None,
        level=level, trend=trend,
        seasonals=seasonals if spec.has_seasonal else None,
        fitted=fitted, residuals=residuals, variance=variance, n=n,
        log_likelihood=ll,
        aic=-2 * ll + 2 * k if not math.isnan(ll) else float("nan"),
        aicc=-2 * ll + 2 * k * nf / max(nf - k - 1.0, 1.0) if not math.isnan(ll) else float("nan"),
        bic=-2 * ll + k * math.log(nf) if not math.isnan(ll) else float("nan"),
    )


def _damped_sum(phi: float, h: int) -> float:
    if abs(phi - 1.0) < 1e-10:
        return float(h)
    return phi * (1.0 - phi**h) / (1.0 - phi)


def ets_predict(state: ETSState, horizon: int) -> np.ndarray:
    spec = state.spec
    phi = state.phi if state.phi is not None else 1.0
    out = np.empty(horizon)
    for i in range(horizon):
        h = i + 1
        s = (
            state.seasonals[(state.n + h - 1) % state.period]
            if spec.has_seasonal
            else 1.0
        )
        if spec.has_trend:
            tc = (
                _damped_sum(phi, h) * state.trend
                if spec.damped
                else h * state.trend
            )
        else:
            tc = 0.0
        if spec.seasonal == "N":
            out[i] = state.level + tc
        elif spec.seasonal == "A":
            out[i] = state.level + tc + s
        else:
            out[i] = (state.level + tc) * s
    return out


def ets_intervals(state: ETSState, horizon: int, level: float = 0.95):
    """Simplified variance widening (ets.rs:1041-1048): k = h for
    non-seasonal, k = (h-1)//period + 1 for seasonal."""
    z = quantile_normal((1.0 + level) / 2.0)
    point = ets_predict(state, horizon)
    h = np.arange(1, horizon + 1, dtype=np.float64)
    if state.spec.has_seasonal:
        k = (h - 1) // state.period + 1
    else:
        k = h
    se = np.sqrt(state.variance * k)
    return point, point - z * se, point + z * se
