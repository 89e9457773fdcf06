"""Independent brute checks for wave-227 operators."""

import numpy as np

from anofox_forecast_ray.pipelines.queries_wave227 import (
    blomqvist,
    hc0_regression,
)


def test_blomqvist_on_dependent_and_independent():
    rng = np.random.default_rng(451)
    # strong positive monotone dependence
    x = rng.integers(0, 24, 5000)
    y = x * 100 + rng.integers(0, 50, 5000)
    hist = {}
    for a, b in zip(x, y):
        hist[(int(a), int(b))] = hist.get((int(a), int(b)),
                                          0) + 1
    mx, my, used, beta = blomqvist(hist)
    assert beta > 0.8
    # independent
    y2 = rng.integers(0, 2400, 5000)
    hist2 = {}
    for a, b in zip(x, y2):
        hist2[(int(a), int(b))] = hist2.get((int(a), int(b)),
                                            0) + 1
    _, _, _, beta2 = blomqvist(hist2)
    assert abs(beta2) < 0.08
    # brute recount for the dependent case
    agree = sum(c for (h, cc), c in hist.items()
                if h != mx and cc != my
                and (h > mx) == (cc > my))
    assert abs(beta - (2 * agree - used) / used) < 1e-12


def test_hc0_matches_statsmodels_free_formulas():
    rng = np.random.default_rng(452)
    x = rng.integers(1, 51, 2000).astype(np.int64)
    # heteroskedastic noise growing with x
    y = (100 * x + rng.normal(0, 5, 2000) * x).astype(np.int64)
    import collections

    cnt = collections.Counter(zip(x, y))
    cells = sorted((int(a), int(b), c)
                   for (a, b), c in cnt.items())
    b, se_ols, se_hc0 = hc0_regression(cells)
    xf, yf = x.astype(float), y.astype(float)
    bref = np.polyfit(xf, yf, 1)[0]
    assert abs(b - bref) < 1e-7 * max(1.0, abs(bref))
    e = yf - (yf.mean() - bref * xf.mean() + bref * xf)
    sxx = ((xf - xf.mean()) ** 2).sum()
    ref_ols = np.sqrt(((e**2).sum() / (len(x) - 2)) / sxx)
    ref_hc0 = np.sqrt((e**2 * (xf - xf.mean()) ** 2).sum()
                      / sxx**2)
    assert abs(se_ols - ref_ols) < 1e-7 * ref_ols
    assert abs(se_hc0 - ref_hc0) < 1e-7 * ref_hc0
    # with variance growing in x, HC0 should exceed classical
    assert se_hc0 > se_ols
