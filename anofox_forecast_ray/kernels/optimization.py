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
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


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
    optimal_point: np.ndarray
    optimal_value: float
    iterations: int
    converged: bool


def _clip(x: np.ndarray, bounds) -> np.ndarray:
    if bounds is None:
        return x
    lo = np.array([b[0] for b in bounds])
    hi = np.array([b[1] for b in bounds])
    return np.clip(x, lo, hi)


def nelder_mead(objective, initial, bounds=None, config: NelderMeadConfig | None = None):
    cfg = config or NelderMeadConfig()
    x0 = np.asarray(initial, dtype=np.float64)
    n = x0.size
    if n == 0:
        return NelderMeadResult(np.zeros(0), float("nan"), 0, False)

    simplex = [x0.copy()]
    for i in range(n):
        v = x0.copy()
        step = cfg.initial_step * abs(x0[i]) if abs(x0[i]) > 1e-10 else cfg.initial_step
        v[i] += step
        simplex.append(_clip(v, bounds))
    values = [float(objective(v)) for v in simplex]

    iterations = 0
    converged = False
    while iterations < cfg.max_iter:
        iterations += 1
        order = sorted(range(n + 1), key=lambda i: values[i])
        best, worst, second_worst = order[0], order[n], order[n - 1]

        if values[worst] - values[best] < cfg.tolerance:
            converged = True
            break
        centroid = (
            np.sum([simplex[i] for i in range(n + 1) if i != worst], axis=0) / n
        )
        max_dist = max(float(np.linalg.norm(v - centroid)) for v in simplex)
        if max_dist < cfg.tolerance:
            converged = True
            break

        reflected = _clip(centroid + cfg.alpha * (centroid - simplex[worst]), bounds)
        f_r = float(objective(reflected))

        if values[best] <= f_r < values[second_worst]:
            simplex[worst], values[worst] = reflected, f_r
            continue
        if f_r < values[best]:
            expanded = _clip(centroid + cfg.gamma * (reflected - centroid), bounds)
            f_e = float(objective(expanded))
            if f_e < f_r:
                simplex[worst], values[worst] = expanded, f_e
            else:
                simplex[worst], values[worst] = reflected, f_r
            continue
        if f_r < values[worst]:
            contracted = _clip(centroid + cfg.rho * (reflected - centroid), bounds)
            f_c = float(objective(contracted))
            if f_c <= f_r:
                simplex[worst], values[worst] = contracted, f_c
                continue
        else:
            contracted = _clip(
                centroid + cfg.rho * (simplex[worst] - centroid), bounds
            )
            f_c = float(objective(contracted))
            if f_c < values[worst]:
                simplex[worst], values[worst] = contracted, f_c
                continue

        best_v = simplex[best].copy()
        for i in range(n + 1):
            if i != best:
                simplex[i] = _clip(
                    best_v + cfg.sigma * (simplex[i] - best_v), bounds
                )
                values[i] = float(objective(simplex[i]))

    best_idx = int(np.argmin(values))
    return NelderMeadResult(
        simplex[best_idx], values[best_idx], iterations, converged
    )
