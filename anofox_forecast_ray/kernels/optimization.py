"""Bounded Nelder-Mead simplex optimizer.

Re-implementation of the reference optimizer's exact algorithm and defaults
(src/utils/optimization.rs:18-230) so optimizer-dependent models (SES auto,
ETS, Theta optimized, Croston SBA-opt) land on the same optima:

- config: max_iter=1000, tol=1e-8, alpha=1, gamma=2, rho=0.5, sigma=0.5,
  initial_step=0.05
- simplex init: vertex i = initial + step*e_i where step = 0.05*|x_i| (or
  0.05 when |x_i|<=1e-10), clamped to bounds
- convergence: value range < tol, OR max vertex distance to centroid < tol
- reflection accepted when second_worst > f_r >= best; expansion when
  f_r < best; outside contraction when f_r < worst (accept if <= f_r);
  inside contraction otherwise; shrink toward best as last resort.

Implemented in pure Python scalars: problem dimension here is 1-4, where
per-iteration numpy array overhead dominates the actual arithmetic (the
optimizer runs thousands of iterations per series inside actor stages).
"""

from __future__ import annotations

import math
from dataclasses import dataclass


@dataclass
class NelderMeadConfig:
    max_iter: int = 1000
    tolerance: float = 1e-8
    alpha: float = 1.0
    gamma: float = 2.0
    rho: float = 0.5
    sigma: float = 0.5
    initial_step: float = 0.05


@dataclass
class NelderMeadResult:
    optimal_point: list
    optimal_value: float
    iterations: int
    converged: bool


def _clip(x: list, bounds) -> list:
    if bounds is None:
        return list(x)
    return [min(max(v, b[0]), b[1]) for v, b in zip(x, bounds)]


def nelder_mead(objective, initial, bounds=None, config: NelderMeadConfig | None = None):
    cfg = config or NelderMeadConfig()
    x0 = [float(v) for v in initial]
    n = len(x0)
    if n == 0:
        return NelderMeadResult([], float("nan"), 0, False)

    simplex = [list(x0)]
    for i in range(n):
        v = list(x0)
        step = cfg.initial_step * abs(x0[i]) if abs(x0[i]) > 1e-10 else cfg.initial_step
        v[i] += step
        simplex.append(_clip(v, bounds))
    values = [float(objective(v)) for v in simplex]

    iterations = 0
    converged = False
    ca, cg, cr, cs = cfg.alpha, cfg.gamma, cfg.rho, cfg.sigma
    while iterations < cfg.max_iter:
        iterations += 1
        order = sorted(range(n + 1), key=values.__getitem__)
        best, worst, second_worst = order[0], order[n], order[n - 1]

        if values[worst] - values[best] < cfg.tolerance:
            converged = True
            break
        centroid = [0.0] * n
        for i in range(n + 1):
            if i != worst:
                vi = simplex[i]
                for j in range(n):
                    centroid[j] += vi[j]
        for j in range(n):
            centroid[j] /= n
        max_dist = 0.0
        for v in simplex:
            d = 0.0
            for j in range(n):
                dj = v[j] - centroid[j]
                d += dj * dj
            max_dist = max(max_dist, d)
        if math.sqrt(max_dist) < cfg.tolerance:
            converged = True
            break

        wv = simplex[worst]
        reflected = _clip(
            [centroid[j] + ca * (centroid[j] - wv[j]) for j in range(n)], bounds
        )
        f_r = float(objective(reflected))

        if values[best] <= f_r < values[second_worst]:
            simplex[worst], values[worst] = reflected, f_r
            continue
        if f_r < values[best]:
            expanded = _clip(
                [centroid[j] + cg * (reflected[j] - centroid[j]) for j in range(n)],
                bounds,
            )
            f_e = float(objective(expanded))
            if f_e < f_r:
                simplex[worst], values[worst] = expanded, f_e
            else:
                simplex[worst], values[worst] = reflected, f_r
            continue
        if f_r < values[worst]:
            contracted = _clip(
                [centroid[j] + cr * (reflected[j] - centroid[j]) for j in range(n)],
                bounds,
            )
            f_c = float(objective(contracted))
            if f_c <= f_r:
                simplex[worst], values[worst] = contracted, f_c
                continue
        else:
            contracted = _clip(
                [centroid[j] + cr * (wv[j] - centroid[j]) for j in range(n)],
                bounds,
            )
            f_c = float(objective(contracted))
            if f_c < values[worst]:
                simplex[worst], values[worst] = contracted, f_c
                continue

        best_v = list(simplex[best])
        for i in range(n + 1):
            if i != best:
                simplex[i] = _clip(
                    [
                        best_v[j] + cs * (simplex[i][j] - best_v[j])
                        for j in range(n)
                    ],
                    bounds,
                )
                values[i] = float(objective(simplex[i]))

    best_idx = min(range(n + 1), key=values.__getitem__)
    return NelderMeadResult(
        list(simplex[best_idx]), values[best_idx], iterations, converged
    )
