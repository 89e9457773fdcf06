"""Independent check for the wave-195 Cox PH replay: the day-table
formulation must match a per-subject Breslow partial-likelihood
implementation written from the definition."""

import math

import numpy as np

from anofox_forecast_ray.pipelines.queries_wave195 import cox_newton


def _per_subject_u_i(dur, ev, x, beta):
    """Breslow score/information from raw subjects."""
    u = 0.0
    info = 0.0
    for t in sorted(set(dur[ev == 1])):
        at_risk = dur >= t
        deaths = (dur == t) & (ev == 1)
        s0 = np.sum(np.exp(beta * x[at_risk]))
        s1 = np.sum(x[at_risk] * np.exp(beta * x[at_risk]))
        d = int(deaths.sum())
        d1 = int(x[deaths].sum())
        u += d1 - d * (s1 / s0)
        info += d * (s1 / s0 - (s1 / s0) ** 2)
    return u, info


def _day_table(dur, ev, x):
    days = np.sort(np.unique(dur))
    tot = len(dur)
    tot1 = int(x.sum())
    d1 = []
    dt = []
    r1 = []
    r0 = []
    for t in days:
        at_risk1 = int(x[dur >= t].sum())
        at_risk = int((dur >= t).sum())
        deaths = (dur == t) & (ev == 1)
        dd = int(deaths.sum())
        if dd > 0:
            d1.append(int(x[deaths].sum()))
            dt.append(dd)
            r1.append(at_risk1)
            r0.append(at_risk - at_risk1)
    return (np.arange(len(dt)), np.array(d1), np.array(dt),
            np.array(r1), np.array(r0))


def test_cox_newton_matches_per_subject_partial_likelihood():
    rng = np.random.default_rng(141)
    for trial in range(6):
        n = int(rng.integers(30, 100))
        x = rng.integers(0, 2, n).astype(np.int64)
        # weekend-heavy users buy later
        lam = np.where(x == 1, 0.08, 0.15)
        dur = np.ceil(rng.exponential(1 / lam)).astype(np.int64)
        ev = (dur < 25).astype(np.int64)
        dur = np.minimum(dur, 25)
        day, d1, dt, r1, r0 = _day_table(dur, ev, x)
        if dt.sum() < 5 or d1.sum() in (0, dt.sum()):
            continue
        beta, chi2 = cox_newton(day, d1, dt, r1, r0)
        # replicate with the definitional implementation
        b = 0.0
        for _ in range(2):
            u, info = _per_subject_u_i(dur, ev, x, b)
            b = b + u / info
        u0, i0 = _per_subject_u_i(dur, ev, x, 0.0)
        assert abs(beta - b) < 1e-8, trial
        assert abs(chi2 - u0 * u0 / i0) < 1e-8, trial


def test_cox_sign_recovers_direction():
    """Group with lower hazard (x=1) must get beta < 0."""
    rng = np.random.default_rng(142)
    n = 400
    x = rng.integers(0, 2, n).astype(np.int64)
    lam = np.where(x == 1, 0.05, 0.2)
    dur = np.ceil(rng.exponential(1 / lam)).astype(np.int64)
    ev = np.ones(n, dtype=np.int64)
    day, d1, dt, r1, r0 = _day_table(dur, ev, x)
    beta, _ = cox_newton(day, d1, dt, r1, r0)
    true = math.log(0.05 / 0.2)
    assert beta < 0
    assert abs(beta - true) < 0.45
