"""Independent brute checks for wave-188 training loops."""

import numpy as np

from anofox_forecast_ray.pipelines.queries_wave188 import (
    hits_replay,
    perceptron_replay,
)


def test_perceptron_matches_per_sample_batch_epochs():
    """Replaying the cell-collapsed loop must equal a per-sample
    batch-update perceptron over the expanded dataset."""
    rng = np.random.default_rng(71)
    for trial in range(6):
        hs = rng.integers(0, 24, 300)
        ys = np.where(rng.random(300) < 0.3, 1, -1)
        cells = {}
        for h, y in zip(hs, ys):
            cells[(int(h), int(y))] = \
                cells.get((int(h), int(y)), 0) + 1
        cell_list = sorted((h, y, c)
                           for (h, y), c in cells.items())
        w = perceptron_replay(cell_list)
        # brute: batch epochs over raw samples
        w0 = w1 = w2 = 0
        for _ in range(4):
            d0 = d1 = d2 = 0
            for h, y in zip(hs, ys):
                s = w0 + w1 * h + w2 * h * h
                if y * s <= 0:
                    d0 += y
                    d1 += y * h
                    d2 += y * h * h
            w0, w1, w2 = w0 + int(d0), w1 + int(d1), w2 + int(d2)
        miss = sum(1 for h, y in zip(hs, ys)
                   if y * (w0 + w1 * h + w2 * h * h) <= 0)
        assert w == (w0, w1, w2, miss), trial


def test_hits_matches_numpy_power_iteration():
    rng = np.random.default_rng(72)
    types = ["a", "b", "c", "d"]
    m = rng.integers(0, 50, (4, 4))
    counts = {(types[i], types[j]): int(m[i, j])
              for i in range(4) for j in range(4) if m[i, j] > 0}
    h, a = hits_replay(counts, types)
    A = m.astype(float)
    hv = np.ones(4)
    for _ in range(3):
        ar = A.T @ hv
        av = ar / ar.sum()
        hr = A @ av
        hv = hr / hr.sum()
    for i, t in enumerate(types):
        assert abs(h[t] - hv[i]) < 1e-12, t
        assert abs(a[t] - av[i]) < 1e-12, t
