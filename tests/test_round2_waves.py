"""Unit tests for round-2 wave machinery (pure functions, no Ray).

These pin the numeric contracts the DuckDB oracles rely on, so a
refactor cannot silently change fold order or integer exactness.
"""

import math

import numpy as np
import pytest


def test_kn_log_tables_match_formula():
    from anofox_forecast_ray.extras.lm import SHIFT, kn_log_tables

    # tiny hand model: bigrams (1,2)x3, (1,3)x1, (2,2)x2
    keys = np.array([1 * SHIFT + 2, 1 * SHIFT + 3, 2 * SHIFT + 2],
                    dtype=np.int64)
    c2 = np.array([3, 1, 2], dtype=np.int64)
    a_keys = np.array([1, 2], dtype=np.int64)
    c1 = np.array([4, 2], dtype=np.int64)
    model = (keys, c2, a_keys, c1, 2, None)
    out_keys, ltab = kn_log_tables(model, discount=0.75)
    assert (out_keys == keys).all()
    ntypes = 3.0
    # (1,2): max(3-.75,0)/4 + (.75*2/4)*(n1b(2)=2/3)
    exp0 = math.log(max(3 - 0.75, 0.0) / 4.0
                    + (0.75 * 2.0 / 4.0) * (2.0 / ntypes))
    assert ltab[0] == exp0
    # (2,2): max(2-.75,0)/2 + (.75*1/2)*(2/3)
    exp2 = math.log(max(2 - 0.75, 0.0) / 2.0
                    + (0.75 * 1.0 / 2.0) * (2.0 / ntypes))
    assert ltab[2] == exp2


def test_runs_segment_stitching():
    # simulate three contiguous segments of the indicator stream and
    # check the boundary-merged run count equals the direct count
    full = np.array([0, 0, 1, 1, 0, 1, 0, 0, 1, 1, 1, 0],
                    dtype=np.int8)
    direct = 1 + int((full[1:] != full[:-1]).sum())
    cuts = [0, 4, 7, len(full)]
    segs = []
    for a, b in zip(cuts, cuts[1:]):
        s = full[a:b]
        segs.append({
            "runs": 1 + int((s[1:] != s[:-1]).sum()),
            "first": int(s[0]), "last": int(s[-1]),
        })
    runs = 0
    prev_last = None
    for s in segs:
        runs += s["runs"]
        if prev_last is not None and prev_last == s["first"]:
            runs -= 1
        prev_last = s["last"]
    assert runs == direct


def test_fixed_point_kmeans_update_is_exact():
    rng = np.random.default_rng(7)
    x = rng.normal(size=(1000, 16))
    scale = 1 << 20
    xq = np.round(x * scale).astype(np.int64)
    # any partitioning of the rows sums to the same int64 total
    for split in (1, 3, 7, 250):
        parts = np.array_split(xq, split)
        total = np.zeros(16, dtype=np.int64)
        for p in parts:
            total += p.sum(axis=0)
        assert (total == xq.sum(axis=0)).all()
    cent = total.astype(np.float64) / 1000.0 / float(scale)
    assert np.abs(cent - x.mean(axis=0)).max() < 1e-5


def test_hurst_integer_ndev_matches_float_cusum():
    rng = np.random.default_rng(0)
    y = rng.integers(30, 200, size=64).astype(np.int64)
    n = y.size
    cums = np.cumsum(y)
    s = cums[-1]
    k = np.arange(1, n + 1)
    ndev = n * cums - k * s                     # integer
    dev_float = cums - k * (s / n)              # classic float form
    # same R up to the n scaling
    r_int = (ndev.max() - ndev.min()) / n
    r_flt = dev_float.max() - dev_float.min()
    assert abs(r_int - r_flt) < 1e-9


def test_viterbi_fold_matches_dp():
    import math as m
    rng = np.random.default_rng(1)
    x = rng.poisson(12, size=50).astype(float)
    ls, lw = m.log(0.95), m.log(0.05)
    l0, l1 = 10.0, 18.0
    v0 = m.log(0.5) + x[0] * m.log(l0) - l0
    v1 = m.log(0.5) + x[0] * m.log(l1) - l1
    for xi in x[1:]:
        n0 = max(v0 + ls, v1 + lw) + xi * m.log(l0) - l0
        n1 = max(v0 + lw, v1 + ls) + xi * m.log(l1) - l1
        v0, v1 = n0, n1
    # full DP table reference
    V = np.zeros((len(x), 2))
    V[0] = [m.log(0.5) + x[0] * m.log(l0) - l0,
            m.log(0.5) + x[0] * m.log(l1) - l1]
    for t in range(1, len(x)):
        V[t, 0] = max(V[t - 1, 0] + ls, V[t - 1, 1] + lw) \
            + x[t] * m.log(l0) - l0
        V[t, 1] = max(V[t - 1, 0] + lw, V[t - 1, 1] + ls) \
            + x[t] * m.log(l1) - l1
    assert v0 == V[-1, 0] and v1 == V[-1, 1]


def test_centered_correlation_beats_raw_moments():
    # the wave-92 lesson as a regression test: y nearly constant
    rng = np.random.default_rng(3)
    x = rng.integers(100, 500, size=500).astype(float)
    y = 1.0 + 1e-4 * rng.normal(size=500)
    ref = np.corrcoef(x, y)[0, 1]
    # raw moments
    n = float(len(x))
    sx, sy = x.sum(), y.sum()
    sxx, syy, sxy = (x * x).sum(), (y * y).sum(), (x * y).sum()
    raw = (n * sxy - sx * sy) / math.sqrt(
        (n * sxx - sx * sx) * (n * syy - sy * sy))
    # two-pass centered
    xc, yc = x - x.mean(), y - y.mean()
    cen = (xc * yc).sum() / math.sqrt(
        (xc * xc).sum() * (yc * yc).sum())
    assert abs(cen - ref) < 1e-12
    assert abs(cen - ref) <= abs(raw - ref)


def test_ensemble_registry_mean():
    from anofox_forecast_ray.models import make_model

    y = np.array([10.0, 12.0, 11.0, 13.0, 12.0])
    m = make_model("ensemble", members=[
        ("naive", {}), ("ses", {"alpha": 0.3}),
        ("holt", {"alpha": 0.3, "beta": 0.1})])
    m.fit(y)
    got = float(m.predict(1)[0])
    preds = []
    for name, kw in [("naive", {}), ("ses", {"alpha": 0.3}),
                     ("holt", {"alpha": 0.3, "beta": 0.1})]:
        mm = make_model(name, **kw)
        mm.fit(y)
        preds.append(float(mm.predict(1)[0]))
    assert got == float(np.mean(preds))


def test_dod_bit_buckets_match_encoder():
    from anofox_forecast_ray.kernels.gorilla import (
        gorilla_decode, gorilla_encode)

    ts = np.array([0, 10, 20, 30, 95, 100, 5000, 5060, 5120],
                  dtype=np.int64)
    vals = np.zeros(len(ts))
    blob = gorilla_encode(ts, vals)
    rt, _ = gorilla_decode(blob)
    assert (rt == ts).all()
    # bit accounting: first 64; dod==0 ->1; |dod|<=63 ->9; <=255
    # ->12; <=2047 ->16; else 68. values: 64 + (n-1)*1
    bits = 64
    prev_d = 0
    for i in range(1, len(ts)):
        d = int(ts[i] - ts[i - 1])
        dod = d - prev_d
        prev_d = d
        if dod == 0:
            bits += 1
        elif -64 <= dod <= 63:
            bits += 9
        elif -256 <= dod <= 255:
            bits += 12
        elif -2048 <= dod <= 2047:
            bits += 16
        else:
            bits += 68
    total = bits + 64 + (len(ts) - 1) * 1
    assert 0 <= len(blob) * 8 - total <= 80  # header + padding
