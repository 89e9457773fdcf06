"""Scale transforms, Box-Cox, and accuracy-metric kernels
(src/transform/scale.rs, boxcox.rs; src/utils/metrics.rs)."""

import numpy as np
import pytest

from anofox_forecast_ray.kernels import metrics as M
from anofox_forecast_ray.kernels import scale as S


Y = np.array([2.0, 4.0, 6.0, 8.0])


def test_standardize_roundtrip():
    z, mu, sd = S.standardize(Y)
    assert mu == 5.0 and sd == pytest.approx(np.sqrt(5.0))
    assert z.mean() == pytest.approx(0.0, abs=1e-12)
    assert z.std() == pytest.approx(1.0)
    np.testing.assert_allclose(z * sd + mu, Y)
    zc, mu0, sd0 = S.standardize(np.full(4, 3.0))
    assert zc.tolist() == [0, 0, 0, 0] and sd0 == 0.0


def test_normalize_and_range():
    n, lo, hi = S.normalize(Y)
    assert n.tolist() == [0, 1 / 3, 2 / 3, 1]
    r, mn, mx = S.scale_to_range(Y, -1.0, 1.0)
    np.testing.assert_allclose(r, [-1, -1 / 3, 1 / 3, 1], rtol=1e-12)


def test_robust_scale():
    y = np.array([1.0, 2.0, 3.0, 4.0, 100.0])
    z, med, iqr = S.robust_scale(y)
    assert med == 3.0 and iqr == 2.0
    assert z[2] == 0.0 and z[4] == pytest.approx(48.5)


def test_center():
    c, mu = S.center(Y)
    assert mu == 5.0 and c.tolist() == [-3, -1, 1, 3]


def test_boxcox_roundtrip_and_log_branch():
    y = np.array([1.0, 2.0, 10.0, 50.0])
    for lam in (0.0, 0.5, 1.0, -0.3):
        z = S.boxcox(y, lam)
        np.testing.assert_allclose(S.inv_boxcox(z, lam), y, rtol=1e-12)
    np.testing.assert_allclose(S.boxcox(y, 0.0), np.log(y))
    with pytest.raises(ValueError):
        S.boxcox(np.array([-1.0, 2.0]), 0.5)
    z, shift = S.boxcox_shifted(np.array([-5.0, 0.0, 5.0]), 0.5)
    assert shift == 6.0 and np.isfinite(z).all()
    assert not S.is_boxcox_suitable(np.array([-1.0]))


def test_guerrero_lambda_prefers_log_for_multiplicative():
    t = np.arange(120)
    level = 10 * np.exp(0.02 * t)
    rng = np.random.default_rng(3)
    y = level * (1 + 0.2 * np.sin(2 * np.pi * t / 12)) * (1 + rng.normal(0, 0.02, 120))
    lam = S.boxcox_lambda_guerrero(y, period=12)
    assert lam < 0.4  # near log for level-proportional variance
    # (for flat/homoskedastic data the Guerrero CV objective is nearly
    # constant in lambda, so the argmin is unidentified — no assertion)


def test_metrics_formulas():
    a = np.array([10.0, 20.0, 30.0])
    p = np.array([12.0, 18.0, 33.0])
    assert M.mae(a, p) == pytest.approx((2 + 2 + 3) / 3)
    assert M.mse(a, p) == pytest.approx((4 + 4 + 9) / 3)
    assert M.rmse(a, p) == pytest.approx(np.sqrt((4 + 4 + 9) / 3))
    assert M.mape(a, p) == pytest.approx((0.2 + 0.1 + 0.1) / 3 * 100)
    smape = M.smape(a, p)
    want = np.mean([2 / 11, 2 / 19, 3 / 31.5]) * 100
    assert smape == pytest.approx(want)
    train = np.array([1.0, 3.0, 2.0, 5.0])
    scale = np.mean(np.abs(np.diff(train)))
    assert M.mase(a, p, train) == pytest.approx(M.mae(a, p) / scale)
    assert M.r2(a, a) == 1.0
    full = M.calculate_metrics(a, p, train=train)
    assert set(full) >= {"mae", "mse", "rmse", "mape", "smape", "r2", "mase"}


def test_croston_sba_opt():
    from anofox_forecast_ray.kernels.intermittent import croston_fit

    rng = np.random.default_rng(4)
    y = np.where(rng.random(80) < 0.3, rng.poisson(5, 80) + 1, 0).astype(float)
    st = croston_fit(y, "sba_opt")
    assert 0.01 <= st.alpha <= 0.99
    assert st.point > 0
    # optimized alpha should do no worse on the pooled MSE than default
    from anofox_forecast_ray.kernels.intermittent import _croston_mse

    assert _croston_mse(y, st.alpha) <= _croston_mse(y, 0.1) + 1e-9
