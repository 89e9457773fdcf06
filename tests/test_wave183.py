"""Independent brute checks for wave-183 SPC statistics."""

import numpy as np

from anofox_forecast_ray.pipelines.queries_wave183 import imr_stats


def test_imr_matches_explicit_chart():
    rng = np.random.default_rng(21)
    for trial in range(10):
        x = rng.poisson(6, 40).astype(np.int64)
        mr_bar, ucl, lcl, nvx, nvm = imr_stats(x)
        mrs = [abs(int(x[i]) - int(x[i - 1]))
               for i in range(1, len(x))]
        bmr = sum(mrs) / (len(x) - 1)
        bx = sum(int(v) for v in x) / len(x)
        bucl = bx + 2.66 * bmr
        blcl = bx - 2.66 * bmr
        assert abs(mr_bar - bmr) < 1e-12
        assert abs(ucl - bucl) < 1e-12 and abs(lcl - blcl) < 1e-12
        assert nvx == sum(1 for v in x if v > bucl or v < blcl)
        assert nvm == sum(1 for m in mrs if m > 3.267 * bmr)


def test_ppk_matches_numpy_reference():
    rng = np.random.default_rng(22)
    qty = rng.integers(1, 51, 5000).astype(np.int64)
    n = qty.size
    s1 = int(qty.sum())
    s2 = int((qty * qty).sum())
    mu = s1 / n
    s = np.sqrt((s2 - (s1 * s1) / n) / (n - 1))
    # independent: numpy ddof=1 std
    ref_mu = qty.mean()
    ref_s = qty.std(ddof=1)
    assert abs(mu - ref_mu) < 1e-9
    assert abs(s - ref_s) < 1e-9 * ref_s
    pp = (50 - 1) / (6.0 * s)
    ppk = min(50 - mu, mu - 1) / (3.0 * s)
    assert abs(pp - (49 / (6 * ref_s))) < 1e-9
    assert abs(ppk - min(50 - ref_mu, ref_mu - 1) / (3 * ref_s)) \
        < 1e-9
