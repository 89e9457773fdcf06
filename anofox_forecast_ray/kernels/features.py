"""Per-series feature catalog (tsfresh-style).

Re-implementation of the reference's feature modules (semantics per cited
file:line; all citations into /root/reference/src/features/):

- basic.rs:12-151          abs_energy .. variance_sample
- distribution.rs:10-153   skewness .. ratio_beyond_r_sigma
- autocorrelation.rs:14-157
- counting.rs:8-236
- entropy.rs:14-240        (O(n^2) entropies guarded by ENTROPY_MAX_N)
- complexity.rs:13-116
- change.rs:15-160
- trend.rs:23-452          linear_trend, agg_linear_trend, ar_coefficient,
                           augmented_dickey_fuller

All NumPy-vectorized except the inherently sequential LZ76 scans and the
template-matching entropies (quadratic; capped). Intended to run inside a
features actor stage over per-series windows.
"""

from __future__ import annotations

import math

import numpy as np

ENTROPY_MAX_N = 2000  # O(n^2) guard: longer series are subsampled


# --- basic.rs ---------------------------------------------------------------

def abs_energy(y):
    y = np.asarray(y, float)
    return float(np.dot(y, y))


def absolute_maximum(y):
    return float(np.max(np.abs(y))) if len(y) else float("nan")


def absolute_sum_of_changes(y):
    y = np.asarray(y, float)
    # sequential fold (SQL-oracle replayable, CLAUDE.md float-fold rule)
    d = np.abs(np.diff(y))
    return float(np.cumsum(d)[-1]) if d.size else 0.0


def maximum(y):
    return float(np.max(y)) if len(y) else float("nan")


def minimum(y):
    return float(np.min(y)) if len(y) else float("nan")


def mean(y):
    return float(np.mean(y)) if len(y) else float("nan")


def median(y):
    return float(np.median(y)) if len(y) else float("nan")


def length(y):
    return float(len(y))


def sum_values(y):
    return float(np.sum(y))


def mean_abs_change(y):
    y = np.asarray(y, float)
    if y.size <= 1:
        return float("nan")
    d = np.abs(np.diff(y))
    return float(np.cumsum(d)[-1] / d.size)


def mean_change(y):
    y = np.asarray(y, float)
    return float((y[-1] - y[0]) / (y.size - 1)) if y.size > 1 else float("nan")


def mean_second_derivative_central(y):
    y = np.asarray(y, float)
    if y.size < 3:
        return float("nan")
    d = y[2:] - 2 * y[1:-1] + y[:-2]
    return float(np.cumsum(d)[-1] / d.size / 2.0)


def mean_n_absolute_max(y, n: int):
    y = np.abs(np.asarray(y, float))
    if n == 0 or y.size < n:
        return float("nan")
    return float(np.partition(y, y.size - n)[y.size - n :].mean())


def root_mean_square(y):
    y = np.asarray(y, float)
    return float(np.sqrt(np.dot(y, y) / y.size)) if y.size else float("nan")


def variance(y):
    """Population variance (basic.rs:140)."""
    return float(np.var(np.asarray(y, float)))


def variance_sample(y):
    y = np.asarray(y, float)
    return float(np.var(y, ddof=1)) if y.size > 1 else float("nan")


def standard_deviation(y):
    """Population std (basic.rs:127)."""
    return float(np.std(np.asarray(y, float)))


# --- distribution.rs --------------------------------------------------------

def skewness(y):
    """Adjusted Fisher-Pearson (distribution.rs:10-26). Sequential
    (cumsum) folds + explicit z*z*z so the doc_dist_features SQL oracle
    replays every sum with list_reduce (CLAUDE.md float-fold invariant)."""
    y = np.asarray(y, float)
    n = y.size
    if n < 3:
        return float("nan")
    m = float(np.cumsum(y)[-1]) / n
    d = y - m
    s = math.sqrt(float(np.cumsum(d * d)[-1]) / n)
    if s < 1e-10:
        return 0.0
    z = d / s
    return float(n / ((n - 1) * (n - 2)) * float(np.cumsum(z * z * z)[-1]))


def kurtosis(y):
    """Excess kurtosis, bias-adjusted (distribution.rs:32-49).
    Sequential folds + (zz)*(zz) powers — SQL-replayable like skewness."""
    y = np.asarray(y, float)
    n = y.size
    if n < 4:
        return float("nan")
    m = float(np.cumsum(y)[-1]) / n
    d = y - m
    s = math.sqrt(float(np.cumsum(d * d)[-1]) / n)
    if s < 1e-10:
        return float("nan")
    z = d / s
    zz = z * z
    k = n * (n + 1) / ((n - 1) * (n - 2) * (n - 3)) * float(
        np.cumsum(zz * zz)[-1]
    )
    return float(k - 3.0 * (n - 1) ** 2 / ((n - 2) * (n - 3)))


def quantile(y, q: float):
    """Linear interpolation on sorted values (distribution.rs:56-84) —
    numpy's default 'linear' method matches."""
    y = np.asarray(y, float)
    if y.size == 0:
        return float("nan")
    return float(np.quantile(y, min(max(q, 0.0), 1.0)))


def large_standard_deviation(y, r: float):
    y = np.asarray(y, float)
    return bool(np.std(y) > r * (np.max(y) - np.min(y)))


def variance_larger_than_standard_deviation(y):
    v = variance(y)
    return bool(v > math.sqrt(v))


def variation_coefficient(y):
    # sequential folds (SQL-replayable, see skewness)
    y = np.asarray(y, float)
    n = y.size
    m = float(np.cumsum(y)[-1]) / n
    if abs(m) < 1e-10:
        return float("nan")
    d = y - m
    return math.sqrt(float(np.cumsum(d * d)[-1]) / n) / m


def symmetry_looking(y, r: float):
    y = np.asarray(y, float)
    return bool(
        abs(y.mean() - np.median(y)) < r * (np.max(y) - np.min(y))
    )


def ratio_beyond_r_sigma(y, r: float):
    # sequential folds; the returned value is an exact int/n division
    y = np.asarray(y, float)
    n = y.size
    m = float(np.cumsum(y)[-1]) / n
    d = y - m
    s = math.sqrt(float(np.cumsum(d * d)[-1]) / n)
    return int((np.abs(d) > r * s).sum()) / n


# --- autocorrelation.rs -----------------------------------------------------

def autocorrelation(y, lag: int):
    """ACF at one lag, normalized by n*variance (autocorrelation.rs:14-40).
    Sequential (cumsum) folds — SQL-replayable (CLAUDE.md invariant)."""
    y = np.asarray(y, float)
    n = y.size
    if lag >= n or n < 2:
        return float("nan")
    m = float(np.cumsum(y)[-1]) / n
    d = y - m
    var = float(np.cumsum(d * d)[-1]) / n
    if var < 1e-10:
        return float("nan")
    return float(np.cumsum(d[:-lag] * d[lag:])[-1] / (n * var)) if lag else 1.0


def acf(y, nlags: int):
    # sequential (cumsum) folds, not np.dot/pairwise: the Ljung-Box /
    # Box-Pierce SQL oracles replay these sums with list_reduce, which is
    # a left fold (see the CLAUDE.md float-fold invariant)
    y = np.asarray(y, float)
    n = y.size
    m = float(np.cumsum(y)[-1]) / n
    d = y - m
    var = float(np.cumsum(d * d)[-1]) / n
    out = np.empty(nlags + 1)
    out[0] = 1.0
    for k in range(1, nlags + 1):
        out[k] = (
            float(np.cumsum(d[:-k] * d[k:])[-1] / (n * var))
            if k < n and var >= 1e-10
            else 0.0
        )
    return out


def partial_autocorrelation(y, lag: int):
    """PACF via Durbin-Levinson (autocorrelation.rs:47-100)."""
    y = np.asarray(y, float)
    if lag == 0:
        return 1.0
    if lag >= y.size:
        return float("nan")
    r = acf(y, lag)
    phi = np.zeros((lag + 1, lag + 1))
    phi[1, 1] = r[1]
    for k in range(2, lag + 1):
        # sequential scalar folds, not np.dot: BLAS ddot's accumulation
        # order is not the left fold the SQL oracle replays
        sn = 0.0
        sd = 0.0
        for j in range(1, k):
            sn += phi[k - 1, j] * r[k - j]
            sd += phi[k - 1, j] * r[j]
        num = r[k] - sn
        den = 1.0 - sd
        phi[k, k] = num / den if abs(den) > 1e-12 else 0.0
        for j in range(1, k):
            phi[k, j] = phi[k - 1, j] - phi[k, k] * phi[k - 1, k - j]
    return float(phi[lag, lag])


def agg_autocorrelation(y, max_lag: int, agg: str = "mean"):
    y = np.asarray(y, float)
    vals = np.array([autocorrelation(y, k) for k in range(1, max_lag + 1)])
    vals = vals[~np.isnan(vals)]
    if vals.size == 0:
        return float("nan")
    if agg == "mean":
        return float(vals.mean())
    if agg == "median":
        return float(np.median(vals))
    if agg == "var":
        return float(np.var(vals))
    if agg == "std":
        return float(np.std(vals))
    raise ValueError(agg)


def time_reversal_asymmetry_statistic(y, lag: int):
    y = np.asarray(y, float)
    n = y.size
    if n <= 2 * lag:
        return 0.0
    a = y[2 * lag :]
    b = y[lag : n - lag]
    c = y[: n - 2 * lag]
    return float(np.cumsum(a * a * b - b * c * c)[-1] / (n - 2 * lag))


# --- counting.rs ------------------------------------------------------------

def count_above(y, t):
    return int(np.sum(np.asarray(y, float) > t))


def count_below(y, t):
    return int(np.sum(np.asarray(y, float) < t))


def count_above_mean(y):
    y = np.asarray(y, float)
    # sequential mean: the > comparison near the mean must see the same
    # float the SQL fold produces
    return int(np.sum(y > np.cumsum(y)[-1] / y.size))


def count_below_mean(y):
    y = np.asarray(y, float)
    return int(np.sum(y < np.cumsum(y)[-1] / y.size))


def number_peaks(y, support: int):
    """Peak = strictly greater than its `support` neighbors both sides
    (counting.rs:42-58)."""
    y = np.asarray(y, float)
    n = y.size
    if n < 2 * support + 1 or support == 0:
        return 0
    ok = np.ones(n - 2 * support, dtype=bool)
    center = y[support : n - support]
    for j in range(1, support + 1):
        ok &= (center > y[support - j : n - support - j]) & (
            center > y[support + j : n - support + j]
        )
    return int(ok.sum())


def number_crossing_m(y, m_val: float):
    y = np.asarray(y, float)
    above = y > m_val
    return int(np.sum(above[1:] != above[:-1]))


def _longest_run(mask: np.ndarray) -> int:
    if mask.size == 0 or not mask.any():
        return 0
    padded = np.concatenate(([False], mask, [False]))
    changes = np.flatnonzero(padded[1:] != padded[:-1])
    return int((changes[1::2] - changes[0::2]).max())


def longest_strike_above_mean(y):
    y = np.asarray(y, float)
    return _longest_run(y > np.cumsum(y)[-1] / y.size)


def longest_strike_below_mean(y):
    y = np.asarray(y, float)
    return _longest_run(y < np.cumsum(y)[-1] / y.size)


def first_location_of_maximum(y):
    y = np.asarray(y, float)
    return float(np.argmax(y)) / y.size if y.size else float("nan")


def first_location_of_minimum(y):
    y = np.asarray(y, float)
    return float(np.argmin(y)) / y.size if y.size else float("nan")


def last_location_of_maximum(y):
    y = np.asarray(y, float)
    if not y.size:
        return float("nan")
    return float(y.size - np.argmax(y[::-1])) / y.size


def last_location_of_minimum(y):
    y = np.asarray(y, float)
    if not y.size:
        return float("nan")
    return float(y.size - np.argmin(y[::-1])) / y.size


def has_duplicate(y):
    y = np.asarray(y, float)
    return bool(np.unique(y).size < y.size)


def has_duplicate_max(y):
    y = np.asarray(y, float)
    return bool(np.sum(y == y.max()) > 1) if y.size else False


def has_duplicate_min(y):
    y = np.asarray(y, float)
    return bool(np.sum(y == y.min()) > 1) if y.size else False


def index_mass_quantile(y, q: float):
    """Relative index where q of the total |y| mass lies left of it
    (counting.rs:199-224)."""
    y = np.abs(np.asarray(y, float))
    if y.size == 0:
        return float("nan")
    total = y.sum()
    if total < 1e-10:
        return 0.0
    target = min(max(q, 0.0), 1.0) * total
    cs = np.cumsum(y)
    i = int(np.searchsorted(cs, target, side="left"))
    if i >= y.size:
        return 1.0
    return float(i + 1) / y.size


def value_count(y, value: float):
    return int(np.sum(np.abs(np.asarray(y, float) - value) < 1e-10))


def range_count(y, lo: float, hi: float):
    y = np.asarray(y, float)
    return int(np.sum((y >= lo) & (y <= hi)))


# --- entropy.rs -------------------------------------------------------------

def _subsample(y):
    y = np.asarray(y, float)
    if y.size > ENTROPY_MAX_N:
        idx = np.linspace(0, y.size - 1, ENTROPY_MAX_N).astype(np.int64)
        return y[idx]
    return y


def sample_entropy(y, m: int = 2, r: float | None = None):
    """-ln(A/B) with template matches at m and m+1 excluding self
    (entropy.rs:14-30). Chebyshev distance; vectorized over templates."""
    y = _subsample(y)
    n = y.size
    if n < m + 2:
        return float("nan")
    if r is None:
        # sequential-fold std (SQL-replayable, see skewness): the match
        # counts are integers, so r is the only float the oracle must
        # reproduce bitwise
        mu = float(np.cumsum(y)[-1]) / n
        d0 = y - mu
        r = 0.2 * math.sqrt(float(np.cumsum(d0 * d0)[-1]) / n)

    def count(mm):
        nt = n - mm
        tem = np.lib.stride_tricks.sliding_window_view(y, mm)[:nt]
        c = 0
        for i in range(nt - 1):
            d = np.max(np.abs(tem[i + 1 :] - tem[i]), axis=1)
            c += int(np.sum(d <= r))
        return 2 * c

    b = count(m)
    a = count(m + 1)
    if a == 0 or b == 0:
        return float("nan")
    return float(-math.log(a / b))


def approximate_entropy(y, m: int = 2, r: float | None = None):
    y = _subsample(y)
    n = y.size
    if n < m + 2:
        return float("nan")
    if r is None:
        # sequential-fold std (SQL-replayable, see sample_entropy)
        mu = float(np.cumsum(y)[-1]) / n
        d0 = y - mu
        r = 0.2 * math.sqrt(float(np.cumsum(d0 * d0)[-1]) / n)

    def phi(mm):
        nt = n - mm + 1
        tem = np.lib.stride_tricks.sliding_window_view(y, mm)[:nt]
        s = 0.0
        for i in range(nt):
            d = np.max(np.abs(tem - tem[i]), axis=1)
            c = int(np.sum(d <= r))
            if c > 0:
                s += math.log(c / nt)
        return s / nt

    return float(phi(m) - phi(m + 1))


def permutation_entropy(y, order: int = 3, delay: int = 1):
    """Shannon entropy of ordinal patterns, raw nats (entropy.rs:119-150)."""
    y = np.asarray(y, float)
    n = y.size
    if order < 2 or n < (order - 1) * delay + 1:
        return float("nan")
    n_pat = n - (order - 1) * delay
    emb = np.empty((n_pat, order))
    for j in range(order):
        emb[:, j] = y[j * delay : j * delay + n_pat]
    ranks = np.argsort(np.argsort(emb, axis=1, kind="stable"), axis=1)
    # encode each pattern to an integer
    code = np.zeros(n_pat, dtype=np.int64)
    for j in range(order):
        code = code * order + ranks[:, j]
    _, counts = np.unique(code, return_counts=True)
    # scalar math.log in code-ascending order (np.unique sorts): numpy's
    # SIMD array log does not match DuckDB ln; the scalar libm does
    ent = 0.0
    for c in counts:
        p = int(c) / n_pat
        ent += p * math.log(p)
    return float(-ent)


def permutation_entropy_normalized(y, order: int = 3, delay: int = 1):
    h = permutation_entropy(y, order, delay)
    if math.isnan(h):
        return h
    return h / math.log(math.factorial(order))


def binned_entropy(y, max_bins: int = 10):
    """Histogram entropy with equal-width bins (entropy.rs:198-233)."""
    y = np.asarray(y, float)
    if y.size == 0 or max_bins == 0:
        return float("nan")
    lo, hi = float(y.min()), float(y.max())
    if abs(hi - lo) < 1e-10:
        return 0.0
    n_bins = min(max_bins, y.size)
    width = (hi - lo) / n_bins
    bins = np.minimum(
        np.floor((y - lo) / width).astype(np.int64), n_bins - 1
    )
    counts = np.bincount(bins, minlength=n_bins)
    # sequential fold with scalar math.log over the (<= max_bins) bins:
    # numpy's SIMD log and pairwise sum are not bit-identical to the
    # DuckDB ln()/list_reduce replay (CLAUDE.md float-fold rule)
    total = 0.0
    for c in counts:
        if c > 0:
            p = c / y.size
            total += p * math.log(p)
    return float(-total)


def fourier_entropy(y):
    y = np.asarray(y, float)
    if y.size < 4:
        return float("nan")
    psd = np.abs(np.fft.rfft(y)) ** 2
    total = psd.sum()
    if total < 1e-10:
        return 0.0
    p = psd / total
    p = p[p > 1e-10]
    return float(-(p * np.log(p)).sum())


# --- complexity.rs ----------------------------------------------------------

def cid_ce(y, normalize: bool = False):
    y = np.asarray(y, float)
    if normalize:
        s = np.std(y)
        if s < 1e-10:
            return 0.0
        y = (y - y.mean()) / s
    d = np.diff(y)
    # sequential fold (not BLAS np.dot): SQL-oracle replayable
    return float(np.sqrt(np.cumsum(d * d)[-1])) if d.size else 0.0


def c3(y, lag: int = 1):
    y = np.asarray(y, float)
    n = y.size
    if n <= 2 * lag:
        return 0.0
    prod = y[2 * lag :] * y[lag : n - lag] * y[: n - 2 * lag]
    return float(np.cumsum(prod)[-1] / (n - 2 * lag))


def lempel_ziv_complexity(y, bins: int = 10):
    """LZ76 over an equal-width discretization (complexity.rs:66-112)."""
    y = np.asarray(y, float)
    n = y.size
    if n < 2 or bins == 0:
        return 0.0
    lo, hi = float(y.min()), float(y.max())
    if abs(hi - lo) < 1e-10:
        return 1.0 / n
    width = (hi - lo) / bins
    seq = np.minimum(((y - lo) / width).astype(np.int64), bins - 1).tolist()
    subs = set()
    ind, inc = 0, 1
    while ind + inc <= n:
        sub = tuple(seq[ind : ind + inc])
        if sub in subs:
            inc += 1
        else:
            subs.add(sub)
            ind += inc
            inc = 1
    return len(subs) / n


# --- change.rs --------------------------------------------------------------

def change_quantiles(y, ql: float, qh: float, isabs: bool = True, agg: str = "mean"):
    """Aggregate of changes where both endpoints are inside the [ql,qh]
    value corridor (change.rs:15-56)."""
    y = np.asarray(y, float)
    if y.size < 2 or ql >= qh:
        return 0.0
    lo = np.quantile(y, ql)
    hi = np.quantile(y, qh)
    inside = (y >= lo) & (y <= hi)
    sel = inside[1:] & inside[:-1]
    d = np.diff(y)[sel]
    if d.size == 0:
        return 0.0
    if isabs:
        d = np.abs(d)
    if agg == "mean":
        return float(d.mean())
    if agg == "median":
        return float(np.median(d))
    if agg == "var":
        return float(np.var(d))
    if agg == "std":
        return float(np.std(d))
    raise ValueError(agg)


def energy_ratio_by_chunks(y, n_chunks: int = 10, chunk_index: int = 0):
    y = np.asarray(y, float)
    if y.size == 0 or n_chunks == 0 or chunk_index >= n_chunks:
        return float("nan")
    total = float(np.dot(y, y))
    if total < 1e-10:
        return float("nan")
    size = -(-y.size // n_chunks)  # ceil-div chunks like np.array_split-ish
    seg = y[chunk_index * size : (chunk_index + 1) * size]
    return float(np.dot(seg, seg) / total)


def percentage_of_reoccurring_datapoints_to_all_datapoints(y):
    y = np.asarray(y, float)
    if y.size == 0:
        return float("nan")
    _, counts = np.unique(y, return_counts=True)
    return float(counts[counts > 1].sum() / y.size)


def percentage_of_reoccurring_values_to_all_values(y):
    y = np.asarray(y, float)
    if y.size == 0:
        return float("nan")
    _, counts = np.unique(y, return_counts=True)
    if counts.size == 0:
        return 0.0
    return float(np.sum(counts > 1) / counts.size)


def ratio_value_number_to_time_series_length(y):
    y = np.asarray(y, float)
    if y.size == 0:
        return float("nan")
    return float(np.unique(y).size / y.size)


def sum_of_reoccurring_data_points(y):
    y = np.asarray(y, float)
    vals, counts = np.unique(y, return_counts=True)
    m = counts > 1
    return float(np.sum(vals[m] * counts[m]))


def sum_of_reoccurring_values(y):
    y = np.asarray(y, float)
    vals, counts = np.unique(y, return_counts=True)
    return float(np.sum(vals[counts > 1]))


# --- trend.rs ---------------------------------------------------------------

def linear_trend(y):
    """OLS on x=0..n-1; returns dict slope/intercept/rvalue/pvalue-ish/stderr
    (trend.rs:23-110; pvalue omitted — no scipy; stderr classical)."""
    y = np.asarray(y, float)
    n = y.size
    if n < 2:
        return {"slope": float("nan"), "intercept": float("nan"),
                "rvalue": float("nan"), "stderr": float("nan")}
    x = np.arange(n, dtype=float)
    xm, ym = x.mean(), y.mean()
    ss_xx = float(np.dot(x - xm, x - xm))
    ss_xy = float(np.dot(x - xm, y - ym))
    ss_yy = float(np.dot(y - ym, y - ym))
    slope = ss_xy / ss_xx if ss_xx > 0 else 0.0
    intercept = ym - slope * xm
    r = ss_xy / math.sqrt(ss_xx * ss_yy) if ss_xx > 0 and ss_yy > 0 else 0.0
    resid = y - (intercept + slope * x)
    dof = n - 2
    stderr = (
        math.sqrt(float(np.dot(resid, resid)) / dof / ss_xx)
        if dof > 0 and ss_xx > 0
        else float("nan")
    )
    return {"slope": slope, "intercept": intercept, "rvalue": r, "stderr": stderr}


def agg_linear_trend(y, chunk_len: int, agg: str = "mean", attribute: str = "slope"):
    y = np.asarray(y, float)
    n_chunks = y.size // chunk_len
    if n_chunks < 2:
        return float("nan")
    chunks = y[: n_chunks * chunk_len].reshape(n_chunks, chunk_len)
    if agg == "mean":
        series = chunks.mean(axis=1)
    elif agg == "min":
        series = chunks.min(axis=1)
    elif agg == "max":
        series = chunks.max(axis=1)
    elif agg == "var":
        series = chunks.var(axis=1)
    else:
        raise ValueError(agg)
    return linear_trend(series)[attribute]


def ar_coefficient_yule_walker(y, k: int = 1):
    """AR(k) first coefficient via Yule-Walker (trend.rs:386-450)."""
    y = np.asarray(y, float)
    if y.size <= k:
        return float("nan")
    r = acf(y, k)
    R = np.empty((k, k))
    for i in range(k):
        for j in range(k):
            R[i, j] = r[abs(i - j)]
    try:
        phi = np.linalg.solve(R, r[1 : k + 1])
    except np.linalg.LinAlgError:
        return float("nan")
    return float(phi[0])


def adf_stat_lag0(y) -> float:
    """ADF t-statistic with lag order 0 (Dickey-Fuller), constant-only
    regression dy_t = c + rho*y_{t-1}, solved in closed form via Cramer's
    rule — the SQL-oracle-exact path (the lstsq QR path in
    ``augmented_dickey_fuller`` agrees to ~1e-9 but not bitwise).

    All sums are sequential cumsum folds over t = 2..n in series order so
    a DuckDB list_reduce oracle replays them bitwise.
    """
    y = np.asarray(y, float)
    n = y.size
    if n < 10:
        return float("nan")
    x = y[:-1]
    dy = y[1:] - y[:-1]
    m = float(n - 1)
    sx = float(np.cumsum(x)[-1])
    sxx = float(np.cumsum(x * x)[-1])
    sy = float(np.cumsum(dy)[-1])
    sxy = float(np.cumsum(x * dy)[-1])
    det = m * sxx - sx * sx
    if det == 0:
        return float("nan")
    rho = (m * sxy - sx * sy) / det
    c = (sy - rho * sx) / m
    resid = dy - c - rho * x
    sse = float(np.cumsum(resid * resid)[-1])
    dof = m - 2.0
    if dof <= 0:
        return float("nan")
    var_rho = sse / dof * m / det
    if var_rho <= 0:
        return float("nan")
    return float(rho / math.sqrt(var_rho))


def augmented_dickey_fuller(y, max_lag: int | None = None):
    """ADF t-statistic, constant-only regression (trend.rs:452-530 /
    standard formulation). Lag order: Schwert rule capped by data."""
    y = np.asarray(y, float)
    n = y.size
    if n < 10:
        return float("nan")
    if max_lag is None:
        max_lag = min(int(12 * (n / 100.0) ** 0.25), n // 2 - 2)
    dy = np.diff(y)
    k = max_lag
    rows = n - 1 - k
    if rows < k + 3:
        k = max(0, rows - 3)
        rows = n - 1 - k
    X = np.empty((rows, k + 2))
    X[:, 0] = 1.0
    X[:, 1] = y[k : n - 1]
    for j in range(1, k + 1):
        X[:, j + 1] = dy[k - j : n - 1 - j]
    target = dy[k:]
    beta, *_ = np.linalg.lstsq(X, target, rcond=None)
    resid = target - X @ beta
    dof = rows - (k + 2)
    if dof <= 0:
        return float("nan")
    s2 = float(np.dot(resid, resid)) / dof
    xtx_inv = np.linalg.pinv(X.T @ X)
    se = math.sqrt(s2 * xtx_inv[1, 1])
    if se == 0:
        return float("nan")
    return float(beta[1] / se)


# --- registry ---------------------------------------------------------------

FEATURES: dict[str, callable] = {
    "abs_energy": abs_energy,
    "absolute_maximum": absolute_maximum,
    "absolute_sum_of_changes": absolute_sum_of_changes,
    "length": length,
    "maximum": maximum,
    "minimum": minimum,
    "mean": mean,
    "median": median,
    "sum_values": sum_values,
    "mean_abs_change": mean_abs_change,
    "mean_change": mean_change,
    "mean_second_derivative_central": mean_second_derivative_central,
    "root_mean_square": root_mean_square,
    "standard_deviation": standard_deviation,
    "variance": variance,
    "variance_sample": variance_sample,
    "skewness": skewness,
    "kurtosis": kurtosis,
    "variation_coefficient": variation_coefficient,
    "count_above_mean": count_above_mean,
    "count_below_mean": count_below_mean,
    "longest_strike_above_mean": longest_strike_above_mean,
    "longest_strike_below_mean": longest_strike_below_mean,
    "first_location_of_maximum": first_location_of_maximum,
    "first_location_of_minimum": first_location_of_minimum,
    "last_location_of_maximum": last_location_of_maximum,
    "last_location_of_minimum": last_location_of_minimum,
    "has_duplicate": has_duplicate,
    "has_duplicate_max": has_duplicate_max,
    "has_duplicate_min": has_duplicate_min,
    "cid_ce": cid_ce,
    "c3": c3,
    "binned_entropy": binned_entropy,
    "fourier_entropy": fourier_entropy,
    "permutation_entropy": permutation_entropy,
    "lempel_ziv_complexity": lempel_ziv_complexity,
    "time_reversal_asymmetry_statistic": lambda y: time_reversal_asymmetry_statistic(y, 1),
    "autocorrelation_lag1": lambda y: autocorrelation(y, 1),
    "percentage_of_reoccurring_datapoints_to_all_datapoints":
        percentage_of_reoccurring_datapoints_to_all_datapoints,
    "ratio_value_number_to_time_series_length":
        ratio_value_number_to_time_series_length,
    "mean_n_absolute_max_7": lambda y: mean_n_absolute_max(y, 7),
    "index_mass_quantile_0.5": lambda y: index_mass_quantile(y, 0.5),
    "linear_trend_slope": lambda y: linear_trend(y)["slope"],
    "linear_trend_intercept": lambda y: linear_trend(y)["intercept"],
    "linear_trend_rvalue": lambda y: linear_trend(y)["rvalue"],
    "quantile_0.25": lambda y: quantile(y, 0.25),
    "quantile_0.75": lambda y: quantile(y, 0.75),
    "large_standard_deviation_0.25": lambda y: float(large_standard_deviation(y, 0.25)),
    "variance_larger_than_standard_deviation": lambda y: float(
        variance_larger_than_standard_deviation(y)
    ),
    "symmetry_looking_0.1": lambda y: float(symmetry_looking(y, 0.1)),
    "ratio_beyond_2_sigma": lambda y: ratio_beyond_r_sigma(y, 2.0),
    "partial_autocorrelation_lag2": lambda y: partial_autocorrelation(y, 2),
    "agg_autocorrelation_mean_10": lambda y: agg_autocorrelation(y, 10, "mean"),
    "number_peaks_3": lambda y: float(number_peaks(y, 3)),
    "number_crossing_mean": lambda y: float(number_crossing_m(y, float(np.mean(y)))),
    "longest_strike_below_mean": longest_strike_below_mean,
    "change_quantiles_mid": lambda y: change_quantiles(y, 0.25, 0.75),
    "energy_ratio_first_chunk": lambda y: energy_ratio_by_chunks(y, 10, 0),
    "percentage_of_reoccurring_values_to_all_values":
        percentage_of_reoccurring_values_to_all_values,
    "sum_of_reoccurring_values": sum_of_reoccurring_values,
    "sum_of_reoccurring_data_points": sum_of_reoccurring_data_points,
    "sample_entropy": sample_entropy,
    "approximate_entropy": approximate_entropy,
    "fourier_entropy": fourier_entropy,
    "permutation_entropy_normalized": permutation_entropy_normalized,
    "lempel_ziv_complexity_binary": lambda y: lempel_ziv_complexity(y, 2),
    "time_reversal_asymmetry_lag2": lambda y: time_reversal_asymmetry_statistic(y, 2),
    "c3_lag2": lambda y: c3(y, 2),
    "cid_ce_normalized": lambda y: cid_ce(y, True),
    "ar_coefficient_yw_1": lambda y: ar_coefficient_yule_walker(y, 1),
    "augmented_dickey_fuller": augmented_dickey_fuller,
    "index_mass_quantile_0.25": lambda y: index_mass_quantile(y, 0.25),
    "agg_linear_trend_mean4_slope": lambda y: agg_linear_trend(y, 4, "mean", "slope"),
}
