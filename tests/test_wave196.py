"""Independent brute checks for wave-196 estimators."""

import numpy as np

from anofox_forecast_ray.pipelines.queries_wave196 import (
    mediation,
    partial_corr,
)


def _moments3(x, y, z):
    return (len(x), int(x.sum()), int(y.sum()), int(z.sum()),
            int((x * x).sum()), int((y * y).sum()),
            int((z * z).sum()), int((x * y).sum()),
            int((x * z).sum()), int((y * z).sum()))


def test_partial_corr_matches_residual_definition():
    """r_xy.z must equal the correlation of the residuals of x~z
    and y~z — the definition."""
    rng = np.random.default_rng(151)
    for trial in range(8):
        n = 500
        z = rng.integers(0, 7, n).astype(np.int64)
        x = (z * 2 + rng.integers(0, 10, n)).astype(np.int64)
        y = (z * 30 + rng.integers(0, 100, n)).astype(np.int64)
        pr, rxy, rxz, ryz = partial_corr(*_moments3(x, y, z))
        xf, yf, zf = (v.astype(float) for v in (x, y, z))
        rx = xf - np.polyval(np.polyfit(zf, xf, 1), zf)
        ry = yf - np.polyval(np.polyfit(zf, yf, 1), zf)
        ref = np.corrcoef(rx, ry)[0, 1]
        assert abs(pr - ref) < 1e-8, trial


def test_mediation_identity_and_lstsq():
    """total c = direct c' + a*b (exact OLS identity), and the
    two-regressor coefficients match numpy.lstsq."""
    rng = np.random.default_rng(152)
    for trial in range(8):
        n = 800
        x = rng.integers(0, 2, n).astype(np.int64)
        m = ((x + rng.integers(0, 2, n)) >= 1).astype(np.int64)
        y = (1000 + 200 * x + 500 * m
             + rng.integers(0, 100, n)).astype(np.int64)
        a, b, c, direct, indirect = mediation(
            len(x), int(x.sum()), int(m.sum()), int(y.sum()),
            int((x * x).sum()), int((x * m).sum()),
            int((x * y).sum()), int((m * m).sum()),
            int((m * y).sum()))
        assert abs(c - (direct + indirect)) < 1e-8 * max(
            1.0, abs(c))
        X = np.column_stack([np.ones(n), x, m]).astype(float)
        coef, *_ = np.linalg.lstsq(X, y.astype(float),
                                   rcond=None)
        assert abs(direct - coef[1]) < 1e-6 * max(
            1.0, abs(coef[1])), trial
        assert abs(b - coef[2]) < 1e-6 * max(1.0, abs(coef[2]))
