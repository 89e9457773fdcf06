"""Kernel-math tests for waves 32-37: CUSUM identity, Gini histogram
collapse, sweep-line carry, OHLC windows, largest remainder."""
import numpy as np


def test_cusum_identity_matches_recursion():
    rng = np.random.default_rng(5)
    x = rng.integers(0, 200, 300).astype(np.int64)
    k = 85
    # literal recursion
    s_ref, s = [], 0
    for xi in x:
        s = max(0, s + int(xi) - k)
        s_ref.append(s)
    # identity: S_t = C_t - min(0, running min C)
    c = np.cumsum(x - k)
    rmin = np.minimum.accumulate(c)
    s_vec = c - np.minimum(rmin, 0)
    assert s_vec.tolist() == s_ref


def test_gini_histogram_collapse_matches_sorted():
    rng = np.random.default_rng(1)
    vals = rng.integers(1, 40, 57).astype(np.int64)
    uv, c = np.unique(vals, return_counts=True)
    n = vals.size
    cum = np.cumsum(c)
    before = cum - c
    coeff = (2 * before + c + 1) * c - (n + 1) * c
    s_hist = int((coeff * uv).sum())
    xs = np.sort(vals)
    s_sorted = int(
        ((2 * np.arange(1, n + 1) - n - 1) * xs).sum()
    )
    assert s_hist == s_sorted


def test_sweepline_day_carry_matches_global():
    rng = np.random.default_rng(2)
    starts = np.sort(rng.integers(0, 1000, 60).astype(np.int64))
    ends = starts + rng.integers(1, 300, 60).astype(np.int64)
    ts = np.concatenate((starts, ends))
    delta = np.concatenate(
        (np.ones(60, dtype=np.int64), -np.ones(60, dtype=np.int64))
    )
    order = np.lexsort((delta, ts))
    global_peak = int(np.cumsum(delta[order]).max())
    # day-partitioned: day = ts // 100
    day = ts // 100
    peaks = []
    totals = {}
    for d in np.unique(day):
        m = day == d
        o = np.lexsort((delta[m], ts[m]))
        run = np.cumsum(delta[m][o])
        peaks.append((int(d), int(run.max())))
        totals[int(d)] = int(run[-1])
    carry, best = 0, -1 << 60
    for d, pk in sorted(peaks):
        best = max(best, carry + pk)
        carry += totals[d]
    assert best == global_peak


def test_ohlc_window_bounds():
    v = np.array([3, 1, 4, 1, 5, 9, 2, 6, 5, 3], dtype=np.int64)
    w = 4
    nwin = -(-len(v) // w)
    for wi in range(nwin):
        seg = v[wi * w:(wi + 1) * w]
        assert seg[0] == v[wi * w]          # open
        assert seg[-1] == v[min((wi + 1) * w, len(v)) - 1]  # close


def test_largest_remainder_allocates_exactly_k():
    counts = np.array([17, 5, 3, 41, 9], dtype=np.int64)
    k, n = 100, int(counts.sum())
    base = (k * counts) // n
    rem = (k * counts) % n
    deficit = k - int(base.sum())
    order = np.lexsort((np.arange(counts.size), -rem))
    quota = base.copy()
    quota[order[:deficit]] += 1
    assert int(quota.sum()) == k
    assert (quota >= base).all()
