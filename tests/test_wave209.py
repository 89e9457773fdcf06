"""Independent brute checks for wave-209 operators."""

import numpy as np

from anofox_forecast_ray.pipelines.queries_wave209 import (
    cvm_from_hist,
    hazard_rows,
)


def _hist_two(x0, x1):
    allv = np.union1d(np.unique(x0), np.unique(x1))
    c0 = np.array([(x0 == v).sum() for v in allv], dtype=np.int64)
    c1 = np.array([(x1 == v).sum() for v in allv], dtype=np.int64)
    return c0, c1


def test_cvm_matches_pooled_ecdf_brute():
    rng = np.random.default_rng(281)
    for trial in range(10):
        x0 = rng.integers(0, 25, int(rng.integers(10, 50)))
        x1 = rng.integers(0, 25, int(rng.integers(10, 50)))
        c0, c1 = _hist_two(x0, x1)
        num, den, t = cvm_from_hist(c0, c1)
        # brute: T = nm/N^2 * sum over pooled obs of (F-G)^2
        n0, n1 = len(x0), len(x1)
        N = n0 + n1
        pooled = np.concatenate([x0, x1])
        ref = 0.0
        for z in pooled:
            F = (x0 <= z).sum() / n0
            G = (x1 <= z).sum() / n1
            ref += (F - G) ** 2
        ref *= n0 * n1 / N**2
        assert abs(t - ref) < 1e-12, trial


def test_hazard_rows_reconstruct_survival():
    rng = np.random.default_rng(282)
    counts = rng.integers(0, 100, 31).astype(np.int64)
    counts[5] += 500
    rows = hazard_rows(counts)
    total = int(counts.sum())
    # product of (1 - h_k) over rows = fraction surviving past cap
    surv = 1.0
    for k, at_risk, ev, h in rows:
        assert ev == counts[k]
        surv *= 1 - h
    # exact survival identity
    remaining = total - sum(r[2] for r in rows)
    assert abs(surv - remaining / total) < 1e-12
