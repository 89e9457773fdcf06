"""Independent brute checks for wave-192 smoother/filter."""

import numpy as np

from anofox_forecast_ray.pipelines.queries_wave192 import rts_smooth


def _matrix_rts(y, qv=1.0, rv=25.0):
    """Textbook RTS with explicit arrays (independent spelling)."""
    n = len(y)
    a = np.zeros(n)
    p = np.zeros(n)
    a[0], p[0] = y[0], rv
    for t in range(1, n):
        pp = p[t - 1] + qv
        k = pp / (pp + rv)
        a[t] = a[t - 1] + k * (y[t] - a[t - 1])
        p[t] = (1 - k) * pp
    sa = np.zeros(n)
    sp = np.zeros(n)
    sa[-1], sp[-1] = a[-1], p[-1]
    for t in range(n - 2, -1, -1):
        pp = p[t] + qv
        c = p[t] / pp
        sa[t] = a[t] + c * (sa[t + 1] - a[t])
        sp[t] = p[t] + c * c * (sp[t + 1] - pp)
    return sa


def test_rts_matches_textbook_arrays():
    rng = np.random.default_rng(111)
    y = rng.poisson(30, 200).astype(float)
    got = np.array(rts_smooth(list(y)))
    want = _matrix_rts(list(y))
    assert np.allclose(got, want, atol=1e-10)


def test_rts_smooths_more_than_filter():
    """Smoothed estimates must have lower variance around a constant
    level than the filtered ones — the defining RTS property."""
    rng = np.random.default_rng(112)
    y = 50 + rng.normal(0, 5, 300)
    sm = np.array(rts_smooth(list(y)))
    # filtered levels (forward only)
    a, p = y[0], 25.0
    filt = [a]
    for t in range(1, len(y)):
        pp = p + 1.0
        k = pp / (pp + 25.0)
        a = a + k * (y[t] - a)
        p = (1 - k) * pp
        filt.append(a)
    filt = np.array(filt)
    burn = 20
    assert np.var(sm[burn:-burn] - 50) < np.var(filt[burn:-burn]
                                                - 50)


def test_hampel_flags_injected_spike():
    s = np.array([100, 102, 98, 101, 99, 500, 100, 101, 103, 99],
                 dtype=np.int64)
    flags = []
    for j in range(2, len(s) - 2):
        win = np.sort(s[j - 2: j + 3])
        med = int(win[2])
        dev = np.sort(np.abs(s[j - 2: j + 3] - med))
        mad = int(dev[2])
        flags.append(abs(int(s[j]) - med) > 3 * 1.4826 * mad)
    assert flags[3] is True or flags[3] == True  # noqa: E712
    assert sum(flags) == 1
