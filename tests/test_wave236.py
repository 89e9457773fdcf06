"""Independent brute check for the wave-236 integer PAVA."""

import numpy as np

from anofox_forecast_ray.pipelines.queries_wave236 import (
    pava_fitted,
)


def _stack_pava(r, n):
    """Classic stack-based weighted PAVA (independent impl)."""
    blocks = []  # (r, n, w)
    for rr, nn in zip(r, n):
        blocks.append([int(rr), int(nn), 1])
        while (len(blocks) > 1
               and blocks[-2][0] * blocks[-1][1]
               > blocks[-1][0] * blocks[-2][1]):
            b = blocks.pop()
            blocks[-1][0] += b[0]
            blocks[-1][1] += b[1]
            blocks[-1][2] += b[2]
    out = []
    for rr, nn, w in blocks:
        out.extend([rr / nn] * w)
    return out


def test_pava_matches_stack_reference():
    rng = np.random.default_rng(541)
    for trial in range(20):
        n = rng.integers(50, 500, 24).astype(np.int64)
        r = np.array([rng.integers(0, v + 1) for v in n],
                     dtype=np.int64)
        got = [v for _, v in pava_fitted(r, n)]
        want = _stack_pava(list(r), list(n))
        assert np.allclose(got, want, atol=1e-12), trial
        # monotone nondecreasing
        assert all(got[i] <= got[i + 1] + 1e-12
                   for i in range(23))
        # weighted mean preserved
        assert abs(sum(g * nn for g, nn in zip(got, n))
                   - r.sum()) < 1e-6
