"""Quick host-speed probe — run BEFORE benchmarking to classify the VM's
current state (this sandbox oscillates 2-4x; see BASELINE.md).

    python tools/host_probe.py

Two measurements, because they degrade INDEPENDENTLY here:
  - single-core loop: quiet ~0.4-0.9 s, degraded ~1.3-1.6 s
  - 8-way parallel loop (per-process wall): quiet ≈ the single-core
    time; under CPU steal it inflates 2-3x while the single-core probe
    still reads quiet (observed 2026-08-17: loop 0.47 s "quiet" while
    8-CPU Ray legs ran 2-3x slow with 3x repeat-to-repeat swings).
Trust a benchmark only when BOTH probes are quiet; re-probe right
before the run — the state flips on minute timescales.
"""
import multiprocessing as mp
import time

import numpy as np


def _loop(n: int = 10_000_000) -> float:
    t0 = time.perf_counter()
    s = 0
    for i in range(n):
        s += i
    return time.perf_counter() - t0


def _worker(q):
    q.put(_loop())


def main():
    a = np.random.default_rng(0).normal(size=(2000, 2000))
    a @ a
    best = 9e9
    for _ in range(5):
        t0 = time.perf_counter()
        a @ a
        best = min(best, time.perf_counter() - t0)
    loop = _loop()
    ctx = mp.get_context("spawn")
    q = ctx.Queue()
    procs = [ctx.Process(target=_worker, args=(q,)) for _ in range(8)]
    for p in procs:
        p.start()
    par = [q.get() for _ in procs]
    for p in procs:
        p.join()
    par_med = sorted(par)[len(par) // 2]
    ratio = par_med / loop if loop else float("inf")
    state = "quiet" if loop < 1.1 and ratio < 1.6 else "DEGRADED"
    print(f"matmul_ms={best*1000:.0f} loop_s={loop:.2f} "
          f"par8_med_s={par_med:.2f} par_ratio={ratio:.2f} state={state}")


if __name__ == "__main__":
    main()
