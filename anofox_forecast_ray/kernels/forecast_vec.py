"""Lockstep-vectorized forecasters: fit K series at once, bitwise-equal.

The flagship forecast stage fits cheap fixed-parameter models
(SeasonalNaive / SES / ETS-AAN / Theta) on ~10^5 short series per batch;
the per-series Python path costs ~0.8 ms/doc, dominated by interpreter
dispatch, not arithmetic. These kernels run the SAME float operations in
the SAME per-series order, but across K lanes at once (numpy ops over
lane vectors) — the exact trick used by ``gorilla.gorilla_decode_many``:

- recurrences (SES / ETS level-trend scans) loop over TIME STEPS with all
  active lanes updated per step; lanes are sorted by length ascending so
  the active set is always a contiguous suffix (plain slices, no masks);
- sums an oracle replays via ``list_reduce`` stay sequential left folds:
  2D ``np.cumsum(axis=1)`` over zero-padded rows is bitwise-identical to
  the per-series 1D cumsum because the interleaved ``+ 0.0`` terms cannot
  change any partial (squares are never ``-0.0``; CLAUDE.md float-fold
  rule);
- every model's closed-form predict/interval math follows the scalar
  kernel's operation ORDER exactly (e.g. ``sqrt(var * factor)`` not
  ``sqrt(var) * sqrt(factor)``).

Each ``*_vec`` mirrors one scalar kernel (cited inline) and is pinned
bitwise against it in tests/test_forecast_vec.py. Lanes violating a
model's minimum-length contract yield NaN rows — the same surface as the
stage's per-series try/except. Lanes longer than 512 points are NOT
eligible (``ses_scan`` switches to the chunked algorithm there); the
stage routes them to the per-series path.
"""

from __future__ import annotations

import numpy as np

from .stats import quantile_normal

#: above this length ses_scan (kernels/smoothing.py:35) switches from the
#: exact sequential recurrence to the chunked scan — lockstep lanes must
#: stay on the sequential regime to be bitwise-equal.
MAX_VEC_LEN = 512


def _pad2d(series: list[np.ndarray], lengths: np.ndarray) -> np.ndarray:
    """Zero-padded (K, n_max) float64 matrix from per-lane 1D arrays."""
    K = len(series)
    n_max = int(lengths.max()) if K else 0
    Y = np.zeros((K, n_max), dtype=np.float64)
    for k, y in enumerate(series):
        Y[k, : lengths[k]] = y
    return Y


def _row_last(cs: np.ndarray, idx: np.ndarray) -> np.ndarray:
    """cs[k, idx[k]] per row (gather the fold value at each lane's end)."""
    return cs[np.arange(cs.shape[0]), idx]


def _masked_cumsum_last(terms: np.ndarray, counts: np.ndarray) -> np.ndarray:
    """Sequential left-fold sum of the first ``counts[k]`` terms per row.

    Zeroes the tail, cumsums along axis=1 (sequential per row) and reads
    the value at ``counts-1``; bitwise == 1D cumsum of the unpadded row.
    Rows with counts == 0 return 0.0.
    """
    K, n_max = terms.shape
    col = np.arange(n_max)
    t = np.where(col[None, :] < counts[:, None], terms, 0.0)
    cs = np.cumsum(t, axis=1)
    out = _row_last(cs, np.maximum(counts - 1, 0))
    out[counts <= 0] = 0.0
    return out


def _ses_levels_lockstep(Y: np.ndarray, n: np.ndarray, alpha: float):
    """Last level + sequential residual-square fold of the SES recurrence.

    Mirrors kernels/smoothing.py ses_scan (n<=512 sequential branch) +
    ses_fit residuals (fitted[t] = level after y[t-1]; residuals[0]=0,
    variance = cumsum(r[1:]^2)[-1] / (n-1), stats.residual_variance).

    Lanes MUST be pre-sorted by n ascending. Returns (last_level, rss)
    where rss is the left-fold sum of squared residuals r[1:].
    """
    K, n_max = Y.shape
    beta = 1.0 - alpha
    level = Y[:, 0].copy() if n_max else np.zeros(K)
    rss = np.zeros(K)
    for t in range(1, n_max):
        s = int(np.searchsorted(n, t, side="right"))
        yt = Y[s:, t]
        r = yt - level[s:]
        rss[s:] += r * r
        if beta <= 0.0:
            level[s:] = yt
        else:
            level[s:] = alpha * yt + beta * level[s:]
    return level, rss


def _ses_style_intervals(point, variance, alpha, n_valid, horizon, level):
    """(point, lo, hi) with the SES variance-widening factor
    (kernels/smoothing.py ses_intervals / theta.py theta_intervals —
    identical formula, factor[0] = 1.0)."""
    z = quantile_normal((1.0 + level) / 2.0)
    beta = 1.0 - alpha
    beta2 = beta * beta
    h = np.arange(1, horizon + 1, dtype=np.float64)
    if abs(1.0 - beta2) < 1e-10:
        factor = h.copy()
        factor[0] = 1.0
    else:
        factor = 1.0 + beta2 * (1.0 - beta2 ** (h - 1)) / (1.0 - beta2)
        factor[0] = 1.0
    se = np.sqrt(variance[:, None] * factor[None, :])
    return point, point - z * se, point + z * se


def ses_vec(Y, n, alpha: float, horizon: int, level: float = 0.95):
    """SES with fixed alpha over K lanes == models.SES per series.

    Y: (K, n_max) zero-padded, n: int64 lengths SORTED ASCENDING,
    4 <= n <= MAX_VEC_LEN. Returns (point, lo, hi) each (K, horizon).
    """
    a = float(np.clip(alpha, 0.0001, 0.9999))
    last, rss = _ses_levels_lockstep(Y, n, a)
    variance = rss / (n - 1)
    point = np.repeat(last[:, None], horizon, axis=1)
    return _ses_style_intervals(point, variance, a, n, horizon, level)


def theta_vec(Y, n, horizon: int, level: float = 0.95,
              theta: float = 2.0, alpha: float = 0.1):
    """Theta (STM, fixed alpha, period<4: no decomposition) over K lanes
    == kernels/theta.py theta_fit/theta_predict/theta_intervals.

    deseason == y; OLS slope via sequential cumsum folds; SES(alpha) scan.
    """
    K, n_max = Y.shape
    col = np.arange(n_max, dtype=np.float64)
    nf = n.astype(np.float64)
    x_mean = (nf - 1.0) / 2.0
    xc = col[None, :] - x_mean[:, None]
    y_sum = _masked_cumsum_last(Y, n)
    y_mean = y_sum / nf
    ss_xx = _masked_cumsum_last(xc * xc, n)
    ss_xy = _masked_cumsum_last(xc * (Y - y_mean[:, None]), n)
    b = np.where(ss_xx > 0, ss_xy / np.where(ss_xx > 0, ss_xx, 1.0), 0.0)

    a = float(np.clip(alpha, 0.0001, 0.9999))
    last, rss = _ses_levels_lockstep(Y, n, a)
    variance = rss / (n - 1)

    h = np.arange(1, horizon + 1, dtype=np.float64)
    point = last[:, None] + ((1.0 - 1.0 / theta) * b)[:, None] * (
        1.0 / a + h - 1.0
    )[None, :]
    # theta_intervals uses threshold 1e-12 (vs ses 1e-10) — replicate
    z = quantile_normal((1.0 + level) / 2.0)
    beta = 1.0 - a
    beta2 = beta * beta
    if abs(1.0 - beta2) < 1e-12:
        factor = h.copy()
    else:
        factor = 1.0 + beta2 * (1.0 - beta2 ** (h - 1)) / (1.0 - beta2)
    factor[0] = 1.0
    se = np.sqrt(variance[:, None] * factor[None, :])
    return point, point - z * se, point + z * se


def seasonal_naive_vec(Y, n, period: int, horizon: int, level: float = 0.95):
    """SeasonalNaive over K lanes == kernels/baseline.py seasonal_naive_fit
    + simple_intervals. Lanes with n < period get NaN rows (the stage's
    try/except surface for the ValueError)."""
    K, n_max = Y.shape
    m = int(period)
    valid = n >= m
    r2 = np.zeros_like(Y)
    if n_max > m:
        d = Y[:, m:] - Y[:, :-m]
        r2[:, m:] = d * d
    # residual_variance(skip=0) drops the first m NaN fitted slots via
    # isfinite; here they are simply absent from the fold
    rss = _masked_cumsum_last(r2, n)  # zero-padded tail already zero
    cnt = n - m
    variance = np.where(cnt > 0, rss / np.where(cnt > 0, cnt, 1), 0.0)

    hz = np.arange(horizon)
    # point[k, i] = y[k, n_k - m + (i % m)]
    idx = (n[:, None] - m) + (hz[None, :] % m)
    idx = np.clip(idx, 0, max(n_max - 1, 0))
    point = Y[np.arange(K)[:, None], idx]
    z = quantile_normal((1.0 + level) / 2.0)
    h = np.arange(1, horizon + 1, dtype=np.float64)
    mult = np.sqrt((h - 1) // m + 1.0)
    se = np.sqrt(variance)[:, None] * mult[None, :]
    point = np.where(valid[:, None], point, np.nan)
    lo = point - z * se
    hi = point + z * se
    return point, lo, hi


def ets_fixed_vec(Y, n, spec: str, alpha: float, beta: float,
                  period: int, horizon: int, level: float = 0.95):
    """ETS ANN/AAN with fixed parameters over K lanes == kernels/smoothing
    ets_fit(optimize=False) tight scalar loops + ets_predict/ets_intervals.

    Lanes must be SORTED ASCENDING by n. Only the additive non-seasonal
    specs are supported (the flagship set).
    """
    if spec not in ("ANN", "AAN"):
        raise ValueError(f"unsupported vectorized ETS spec {spec!r}")
    has_trend = spec == "AAN"
    K, n_max = Y.shape
    a = alpha if alpha is not None else 0.3
    b = beta if beta is not None else 0.1
    a1 = 1.0 - a
    b1 = 1.0 - b

    if has_trend:
        # _ets_initial_state trended non-seasonal arm (smoothing.py:284):
        # OLS on the first maxn points, sums as sequential cumsum folds
        maxn = np.minimum(n, max(10, 2 * period))
        mf = maxn.astype(np.float64)
        col1 = np.arange(1, n_max + 1, dtype=np.float64)
        x_mean = (mf + 1.0) / 2.0
        xc = col1[None, :] - x_mean[:, None]
        y_mean = _masked_cumsum_last(Y, maxn) / mf
        ss_xx = _masked_cumsum_last(xc * xc, maxn)
        ss_xy = _masked_cumsum_last(xc * (Y - y_mean[:, None]), maxn)
        slope = np.where(ss_xx > 0, ss_xy / np.where(ss_xx > 0, ss_xx, 1.0),
                         0.0)
        lvl = y_mean - slope * x_mean
        trd = slope.copy()
    else:
        lvl = Y[:, 0].copy() if n_max else np.zeros(K)
        trd = np.zeros(K)

    rss = np.zeros(K)
    if has_trend:
        for t in range(n_max):
            s = int(np.searchsorted(n, t, side="right"))
            yt = Y[s:, t]
            f = lvl[s:] + trd[s:]
            r = yt - f
            rss[s:] += r * r
            lp = lvl[s:].copy()
            lvl[s:] = a * yt + a1 * f
            trd[s:] = b * (lvl[s:] - lp) + b1 * trd[s:]
    else:
        for t in range(n_max):
            s = int(np.searchsorted(n, t, side="right"))
            yt = Y[s:, t]
            r = yt - lvl[s:]
            rss[s:] += r * r
            lvl[s:] = a * yt + a1 * lvl[s:]
    variance = rss / n

    h = np.arange(1, horizon + 1, dtype=np.float64)
    if has_trend:
        # ets_predict: out[i] = level + h * trend (int h * float trend —
        # same promotion as the scalar loop)
        point = lvl[:, None] + h[None, :] * trd[:, None]
    else:
        point = np.repeat(lvl[:, None], horizon, axis=1)
    z = quantile_normal((1.0 + level) / 2.0)
    se = np.sqrt(variance[:, None] * h[None, :])
    return point, point - z * se, point + z * se


# --------------------------------------------------------------------------
# stage-facing plan: which (name, kwargs) model configs have a vec kernel
# --------------------------------------------------------------------------


def plan_vec_models(models) -> list | None:
    """Return a per-model vec plan, or None if ANY model lacks a lockstep
    kernel (the stage then keeps the per-series path for the whole batch).

    Each entry is ``(fn, max_len)`` where ``fn(Y, n_sorted, horizon,
    level) -> (point, lo, hi)`` and ``max_len`` is the longest lane the
    lockstep kernel may process while staying bitwise-equal to the
    per-series path:

    - SES/Theta: MAX_VEC_LEN — ses_scan switches to the chunked
      algorithm above 512 points, so longer lanes must go through the
      per-series kernel to reproduce today's bytes;
    - SeasonalNaive/ETS: unbounded — both scalar paths are closed-form /
      exactly-sequential at EVERY length, so the lockstep result is
      bitwise-identical regardless (the stage still cost-splits extreme
      lanes to the scalar path for speed, which cannot change output).
    """
    plan = []
    for name, kw in models:
        kw = dict(kw)
        if name == "seasonal_naive":
            m = int(kw.get("period", 12))
            plan.append((
                lambda Y, n, hz, lv, m=m: seasonal_naive_vec(Y, n, m, hz, lv),
                None,
            ))
        elif name == "ses":
            alpha = kw.get("alpha")
            if alpha is None:  # optimized alpha -> per-series NM path
                return None
            plan.append((
                lambda Y, n, hz, lv, a=alpha: ses_vec(Y, n, a, hz, lv),
                MAX_VEC_LEN,
            ))
        elif name == "ets":
            spec = kw.get("spec", "ANN")
            if kw.get("optimize", True) or spec not in ("ANN", "AAN"):
                return None
            if kw.get("alpha") is None:
                return None
            plan.append((
                lambda Y, n, hz, lv, s=spec, a=kw.get("alpha"),
                b=kw.get("beta"), p=int(kw.get("period", 12)):
                    ets_fixed_vec(Y, n, s, a, b, p, hz, lv),
                None,
            ))
        elif name == "theta":
            if int(kw.get("period", 0)) >= 4:
                return None  # decomposition path is data-dependent
            alpha = kw.get("alpha", 0.1)
            if alpha is None:
                return None
            plan.append((
                lambda Y, n, hz, lv, th=float(kw.get("theta", 2.0)),
                a=float(alpha): theta_vec(Y, n, hz, lv, th, a),
                MAX_VEC_LEN,
            ))
        else:
            return None
    return plan
