"""Independent brute checks for wave-185 survival statistics."""

import numpy as np


def _km_curve(dur, ev):
    """(times, S) Kaplan-Meier step curve, censored-at-t still at
    risk at t (matches the engine's 1-PRECEDING convention)."""
    order = np.argsort(dur, kind="stable")
    dur, ev = dur[order], ev[order]
    times, svals = [], []
    s = 1.0
    n = len(dur)
    i = 0
    while i < n:
        t = dur[i]
        j = i
        deaths = 0
        while j < n and dur[j] == t:
            deaths += int(ev[j])
            j += 1
        at_risk = n - i
        if deaths:
            s *= 1.0 - deaths / at_risk
            times.append(t)
            svals.append(s)
        i = j
    return np.array(times), np.array(svals)


def _brute_rmst(dur, ev, tau):
    times, svals = _km_curve(dur, ev)
    area = 0.0
    prev = 0.0
    s = 1.0
    for t, sv in zip(times, svals):
        area += s * (t - prev)
        s, prev = sv, t
    return area + s * (tau - prev)


def _engine_rmst(dur, ev, tau):
    import pandas as pd

    u = pd.DataFrame({"day": dur, "d": ev})
    byday = (u.groupby("day")
             .agg(d=("d", "sum"), removed=("d", "size"))
             .reset_index().sort_values("day"))
    days = byday["day"].to_numpy(np.int64)
    d = byday["d"].to_numpy(np.int64)
    removed = byday["removed"].to_numpy(np.int64)
    before = np.concatenate(([0], np.cumsum(removed)[:-1]))
    at_risk = len(u) - before
    area, s, prev = 0.0, 1.0, 0.0
    for i in range(days.size):
        if d[i] > 0:
            t = float(int(days[i]))
            area += s * (t - prev)
            s *= 1.0 - int(d[i]) / int(at_risk[i])
            prev = t
    return area + s * (tau - prev)


def test_rmst_matches_stepcurve_brute():
    rng = np.random.default_rng(41)
    for trial in range(10):
        n = int(rng.integers(10, 60))
        dur = rng.integers(0, 30, n).astype(np.int64)
        ev = rng.integers(0, 2, n).astype(np.int64)
        if ev.sum() == 0:
            ev[0] = 1
        tau = int(dur.max())
        got = _engine_rmst(dur, ev, tau)
        want = _brute_rmst(dur, ev, tau)
        assert abs(got - want) < 1e-9, trial


def test_harrell_c_matches_double_loop():
    rng = np.random.default_rng(42)
    for trial in range(10):
        n = int(rng.integers(5, 40))
        dur = rng.integers(0, 20, n).astype(np.int64)
        ev = rng.integers(0, 2, n).astype(np.int64)
        risk = rng.integers(0, 10, n).astype(np.int64)
        comp = conc = tied = 0
        for i in range(n):
            for j in range(n):
                if i == j:
                    continue
                if dur[i] < dur[j] and ev[i] == 1:
                    comp += 1
                    if risk[i] > risk[j]:
                        conc += 1
                    elif risk[i] == risk[j]:
                        tied += 1
        lt = dur[:, None] < dur[None, :]
        comp_m = lt & (ev[:, None] == 1)
        assert int(comp_m.sum()) == comp
        assert int((comp_m
                    & (risk[:, None] > risk[None, :])).sum()) == conc
        assert int((comp_m
                    & (risk[:, None] == risk[None, :])).sum()) == tied
