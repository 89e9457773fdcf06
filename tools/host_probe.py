"""Quick host-speed probe — run BEFORE benchmarking to classify the VM's
current state (this sandbox oscillates 2-4x; see BASELINE.md).

    python tools/host_probe.py

Reference points measured across round 2:
  - quiet host:    loop ~0.7-0.9 s, matmul ~150-200 ms
  - degraded host: loop ~1.3-1.6 s, matmul ~280-400 ms
Interpret flagship/scaling numbers only against the matching state.
"""
import time

import numpy as np


def main():
    a = np.random.default_rng(0).normal(size=(2000, 2000))
    a @ a
    best = 9e9
    for _ in range(5):
        t0 = time.perf_counter()
        a @ a
        best = min(best, time.perf_counter() - t0)
    t0 = time.perf_counter()
    s = 0
    for i in range(10_000_000):
        s += i
    loop = time.perf_counter() - t0
    state = "quiet" if loop < 1.1 else "DEGRADED"
    print(f"matmul_ms={best*1000:.0f} loop_s={loop:.2f} state={state}")
    return loop


if __name__ == "__main__":
    main()
