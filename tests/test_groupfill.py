"""Unit tests for the vectorized MULTI-group kernels (kernels/groupfill)
against per-group sequential references."""

import numpy as np
import pytest

from anofox_forecast_ray.kernels.groupfill import (
    locf_fill_multi,
    rolling_mean_multi,
    sessionize_multi,
    zscore_multi,
)


def _locf_one(wids, vals, start, drop):
    lo = wids.min() if start is None else start
    grid = np.arange(lo, wids.max() + 1)
    out = np.full(grid.size, np.nan)
    filled = np.ones(grid.size, dtype=bool)
    for w, v in zip(wids, vals):
        out[w - lo] = v
        filled[w - lo] = False
    last = np.nan
    for i in range(grid.size):
        if filled[i]:
            out[i] = last
        else:
            last = out[i]
    if drop:
        ok = np.isfinite(out)
        return grid[ok], out[ok], filled[ok]
    return grid, out, filled


@pytest.mark.parametrize("start,drop", [(None, True), (0, True), (0, False)])
def test_locf_multi_matches_per_group(start, drop):
    rng = np.random.default_rng(0)
    codes, wids, vals = [], [], []
    groups = {}
    for g in range(25):
        n = rng.integers(1, 12)
        w = np.sort(rng.choice(np.arange(1, 40), size=n, replace=False))
        v = rng.normal(0, 1, n)
        groups[g] = (w, v)
        codes.extend([g] * n)
        wids.extend(w.tolist())
        vals.extend(v.tolist())
    codes = np.array(codes)
    wids = np.array(wids)
    vals = np.array(vals)
    row_idx, out_w, out_v, out_f = locf_fill_multi(
        codes, wids, vals, start=start, drop_leading_nan=drop
    )
    out_g = codes[row_idx]
    for g, (w, v) in groups.items():
        m = out_g == g
        gw, gv, gf = _locf_one(w, v, start, drop)
        assert out_w[m].tolist() == gw.tolist(), g
        got_v = out_v[m]
        same = (got_v == gv) | (np.isnan(got_v) & np.isnan(gv))
        assert same.all(), g
        assert out_f[m].tolist() == gf.tolist(), g


def test_locf_multi_empty_and_single():
    z = np.zeros(0, dtype=np.int64)
    r = locf_fill_multi(z, z, np.zeros(0))
    assert all(a.size == 0 for a in r)
    r2 = locf_fill_multi(np.array([7]), np.array([3]), np.array([2.5]),
                         start=None)
    assert r2[1].tolist() == [3] and r2[2].tolist() == [2.5]


def test_rolling_mean_multi_matches_per_group():
    rng = np.random.default_rng(1)
    codes = np.repeat(np.arange(10), rng.integers(1, 20, 10))
    codes.sort()
    cents = rng.integers(0, 1000, codes.size)
    ok, rm = rolling_mean_multi(codes, cents, 4)
    for g in np.unique(codes):
        m = codes == g
        c = cents[m].astype(float)
        want = [c[i - 3 : i + 1].sum() / 4 for i in range(3, c.size)]
        assert rm[m][ok[m]].tolist() == want, g


def test_sessionize_multi():
    codes = np.array([1, 1, 1, 2, 2, 3])
    tus = np.array([0, 10, 100, 5, 6, 0])
    sid = sessionize_multi(codes, tus, gap_us=20)
    # user 1: gap 10 (same), gap 90 (new); user 2: gap 1; user 3: first
    assert sid.tolist() == [0, 0, 1, 0, 0, 0]


def test_zscore_multi_matches_formula():
    rng = np.random.default_rng(2)
    codes = np.repeat(np.arange(5), 50)
    cents = rng.integers(0, 10000, codes.size)
    z = zscore_multi(codes, cents)
    for g in np.unique(codes):
        c = cents[codes == g]
        n = c.size
        s, ss = int(c.sum()), int(np.dot(c, c))
        mean = s / n
        std = np.sqrt(max((ss - s * s / n) / n, 0.0))
        want = np.abs(c - mean) / std
        np.testing.assert_array_equal(z[codes == g], want)


def test_zscore_multi_constant_group():
    codes = np.array([1, 1, 1])
    z = zscore_multi(codes, np.array([5, 5, 5]))
    assert z.tolist() == [0.0, 0.0, 0.0]
