"""Wave-198 queries: greedy bandit replay, MCMC-style diagnostics.

- events_bandit_replay: an offline multi-armed-bandit policy replay
  — the evaluation harness behind every recommender A/B: arms are
  the 5 event types, the reward of arm a on day d is the exact
  count of type-a events that day, and a greedy policy (per-arm
  mean, optimistic n=1/s=0 init) is replayed over the day grid.
  The argmax uses CROSS-MULTIPLIED integer comparisons
  s_i * n_j > s_j * n_i with lexical tiebreak, so no float ever
  decides an action — the replay is exact by construction. Emits
  per-arm pulls and collected reward (the SQL unrolls the decision
  into generated beats(i,j) conjunctions inside a 10-slot fold).
- events_geweke_ess: two MCMC convergence diagnostics applied to
  the hourly count series as a "chain": the Geweke z between the
  first 10% and last 50% windows (moment variances), and the
  effective sample size n / (1 + 2 sum_{k=1..8} rho_k) with
  autocorrelations from centered two-pass folds in t order.
"""

from __future__ import annotations

import math
from fractions import Fraction

import numpy as np
import pyarrow as pa

from .queries import _num_read_blocks
from ._scaffold import read_cols
from .queries_wave137 import _hourly_counts

US_PER_DAY = 86_400_000_000
ARMS = ["click", "error", "purchase", "signup", "view"]


def bandit_replay(daily: np.ndarray):
    """daily: (n_days, 5) int rewards. Greedy replay with
    cross-multiplied integer mean comparisons; returns
    (pulls[5], collected[5])."""
    k = daily.shape[1]
    n = [1] * k
    s = [0] * k
    pulls = [0] * k
    for d in range(daily.shape[0]):
        best = 0
        for i in range(1, k):
            # beats(i, best): s_i/n_i > s_b/n_b, lexical tiebreak
            if (s[i] * n[best] > s[best] * n[i]):
                best = i
        pulls[best] += 1
        s[best] += int(daily[d, best])
        n[best] += 1
    return pulls, s


def _brute_bandit(daily: np.ndarray):
    """Independent replay using Fraction comparisons."""
    k = daily.shape[1]
    n = [1] * k
    s = [0] * k
    pulls = [0] * k
    for d in range(daily.shape[0]):
        best = max(range(k),
                   key=lambda i: (Fraction(s[i], n[i]), -i))
        pulls[best] += 1
        s[best] += int(daily[d, best])
        n[best] += 1
    return pulls, s


# ------------------------------------------------- events_bandit_replay
def _bandit_query():
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            tus = t.column("ts").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            if tus.size == 0:
                return pa.table({
                    "day": pa.array([], type=pa.int64()),
                    **{f"r{i}": pa.array([], type=pa.int64())
                       for i in range(5)},
                    "lo": pa.array([], type=pa.int64()),
                    "hi": pa.array([], type=pa.int64()),
                })
            day = tus // US_PER_DAY
            et = np.asarray(t.column("event_type").to_pylist())
            lo = int(day.min())
            hi = int(day.max())
            span = hi - lo + 1
            cols = {"day": pa.array(
                np.arange(lo, hi + 1, dtype=np.int64))}
            for i, a in enumerate(ARMS):
                sel = day[et == a]
                cols[f"r{i}"] = pa.array(np.bincount(
                    (sel - lo).astype(np.int64),
                    minlength=span).astype(np.int64))
            cols["lo"] = pa.array(np.full(span, lo,
                                          dtype=np.int64))
            cols["hi"] = pa.array(np.full(span, hi,
                                          dtype=np.int64))
            return pa.table(cols)

        def merge(t: pa.Table) -> pa.Table:
            import pandas as pd

            df = t.to_pandas()
            lo = int(df["lo"].min())
            hi = int(df["hi"].max())
            grid = np.arange(lo, hi + 1, dtype=np.int64)
            cols = {"day": pa.array(grid)}
            g = df.groupby("day").sum()
            for i in range(5):
                c = np.zeros(grid.size, dtype=np.int64)
                c[g.index.to_numpy(np.int64) - lo] = (
                    g[f"r{i}"].to_numpy(np.int64))
                cols[f"r{i}"] = pa.array(c)
            cols["lo"] = pa.array(np.full(grid.size, lo,
                                          dtype=np.int64))
            cols["hi"] = pa.array(np.full(grid.size, hi,
                                          dtype=np.int64))
            return pa.table(cols)

        refs = list(
            read_cols(sf_dir, "events", ["ts", "event_type"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        h = tree_reduce_tables(refs, merge).to_pandas()
        h = h.sort_values("day").reset_index(drop=True)
        daily = np.column_stack(
            [h[f"r{i}"].to_numpy(np.int64) for i in range(5)])
        pulls, s = bandit_replay(daily)
        return pa.table({
            "event_type": pa.array(ARMS, type=pa.string()),
            "pulls": pa.array(pulls, type=pa.int64()),
            "reward_sum": pa.array(s, type=pa.int64()),
        })

    # generated SQL: chosen_i = AND_j<i NOT beats(j,i)
    #                         AND AND_j>i beats... simplified to the
    # sequential-scan semantics of the engine loop:
    # best = argmax scanning i=0..4, replace only on STRICT beat.
    # chosen_k iff (k beats all later challengers' scan)... The
    # scan semantics equal: chosen = first index of the max under
    # (mean, -index) order == k iff for all j < k: s_k n_j > s_j n_k
    # and for all j > k: NOT (s_j n_k > s_k n_j).
    def chosen(k):
        conds = []
        for j in range(5):
            if j < k:
                conds.append(f"(a[{6 + k}] * a[{1 + j}] "
                             f"> a[{6 + j}] * a[{1 + k}])")
            elif j > k:
                conds.append(f"NOT (a[{6 + j}] * a[{1 + k}] "
                             f"> a[{6 + k}] * a[{1 + j}])")
        return "(" + " AND ".join(conds) + ")"

    upd_n = ", ".join(
        f"a[{1 + k}] + CASE WHEN {chosen(k)} THEN 1 ELSE 0 END"
        for k in range(5))
    upd_s = ", ".join(
        f"a[{6 + k}] + CASE WHEN {chosen(k)} THEN e[{1 + k}] "
        f"ELSE 0 END" for k in range(5))
    upd_p = ", ".join(
        f"a[{11 + k}] + CASE WHEN {chosen(k)} THEN 1 ELSE 0 END"
        for k in range(5))

    arm_case = " ".join(
        f"WHEN '{a}' THEN {i}" for i, a in enumerate(ARMS))
    sql = f"""
    WITH e AS (
        SELECT epoch_us(ts) // {US_PER_DAY} AS day,
               CASE event_type {arm_case} END AS arm
        FROM events
    ),
    span AS (SELECT min(day) AS lo, max(day) AS hi FROM e),
    grid AS (
        SELECT CAST(unnest(generate_series(lo, hi)) AS BIGINT)
                   AS day
        FROM span
    ),
    daily AS (
        SELECT g.day,
               {", ".join(
                   f"CAST(coalesce(sum(CASE WHEN c.arm = {i} "
                   f"THEN 1 END), 0) AS BIGINT) AS r{i}"
                   for i in range(5))}
        FROM grid g LEFT JOIN e c ON g.day = c.day
        GROUP BY g.day
    ),
    fold AS (
        SELECT list_reduce(
                   list_prepend(
                       [1.0e0, 1.0e0, 1.0e0, 1.0e0, 1.0e0,
                        0.0e0, 0.0e0, 0.0e0, 0.0e0, 0.0e0,
                        0.0e0, 0.0e0, 0.0e0, 0.0e0, 0.0e0],
                       (SELECT list([{", ".join(
                           f"CAST(r{i} AS DOUBLE)"
                           for i in range(5))}]
                           ORDER BY day) FROM daily)),
                   (a, e) -> [{upd_n}, {upd_s}, {upd_p}]) AS a
        FROM (SELECT 1)
    ),
    arms(event_type, idx) AS (VALUES
        {", ".join(f"('{a}', {i})" for i, a in enumerate(ARMS))})
    SELECT arms.event_type,
           CAST(fold.a[11 + arms.idx] AS BIGINT) AS pulls,
           CAST(fold.a[6 + arms.idx] AS BIGINT) AS reward_sum
    FROM arms CROSS JOIN fold
    """
    return q, sql


# --------------------------------------------------- events_geweke_ess
def _geweke_query(kmax: int = 8):
    def q(sf_dir: str):
        x = [int(v) for v in _hourly_counts(sf_dir)]
        n = len(x)
        na = n // 10
        nb = n // 2
        xa = x[:na]
        xb = x[n - nb:]

        def mv(xs):
            s = 0
            for v in xs:
                s += v
            m = s / len(xs)
            acc = 0.0
            for v in xs:
                acc = acc + (v - m) * (v - m)
            return m, acc / (len(xs) - 1)

        ma, va = mv(xa)
        mb, vb = mv(xb)
        z = (ma - mb) / math.sqrt(va / na + vb / nb)
        stot = 0
        for v in x:
            stot += v
        m = stot / n
        den = 0.0
        for v in x:
            den = den + (v - m) * (v - m)
        acsum = 0.0
        for k in range(1, kmax + 1):
            num = 0.0
            for t in range(n - k):
                num = num + (x[t] - m) * (x[t + k] - m)
            acsum = acsum + num / den
        ess = n / (1.0e0 + 2.0e0 * acsum)
        return pa.table({
            "n_hours": pa.array([n], type=pa.int64()),
            "geweke_z": pa.array([z], type=pa.float64()),
            "ess": pa.array([ess], type=pa.float64()),
        })

    US_PER_HOUR = 3_600_000_000
    rho_terms = " + ".join(
        f"""(list_reduce(list_prepend(0.0e0,
            list_transform(generate_series(1,
                CAST(n - {k} AS INTEGER)),
                i -> (ys[i] - mu) * (ys[i + {k}] - mu))),
            (p, v) -> p + v) / den)"""
        for k in range(1, kmax + 1))
    sql = f"""
    WITH hc AS (
        SELECT epoch_us(ts) // {US_PER_HOUR} AS hour,
               CAST(count(*) AS BIGINT) AS cnt
        FROM events GROUP BY 1
    ),
    grid AS (
        SELECT g.h AS hour, COALESCE(hc.cnt, 0) AS cnt
        FROM (SELECT unnest(generate_series(
                  (SELECT min(hour) FROM hc),
                  (SELECT max(hour) FROM hc))) AS h) g
        LEFT JOIN hc ON hc.hour = g.h
    ),
    l AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               list(CAST(cnt AS DOUBLE) ORDER BY hour) AS ys
        FROM grid
    ),
    seg AS (
        SELECT n, ys, n // 10 AS na, n // 2 AS nb FROM l
    ),
    gw AS (
        SELECT n, ys,
            list_reduce(list_prepend(0.0e0, ys[1:CAST(na
                AS INTEGER)]), (p, v) -> p + v)
                / CAST(na AS DOUBLE) AS ma,
            list_reduce(list_prepend(0.0e0,
                ys[CAST(n - nb + 1 AS INTEGER):CAST(n
                    AS INTEGER)]), (p, v) -> p + v)
                / CAST(nb AS DOUBLE) AS mb,
            na, nb
        FROM seg
    ),
    gv AS (
        SELECT n, ys, ma, mb, na, nb,
            list_reduce(list_prepend(0.0e0,
                list_transform(ys[1:CAST(na AS INTEGER)],
                    v -> (v - ma) * (v - ma))),
                (p, v) -> p + v) / CAST(na - 1 AS DOUBLE) AS va,
            list_reduce(list_prepend(0.0e0,
                list_transform(ys[CAST(n - nb + 1
                    AS INTEGER):CAST(n AS INTEGER)],
                    v -> (v - mb) * (v - mb))),
                (p, v) -> p + v) / CAST(nb - 1 AS DOUBLE) AS vb
        FROM gw
    ),
    ac AS (
        SELECT n, ma, mb, na, nb, va, vb,
            list_reduce(list_prepend(0.0e0, ys),
                (p, v) -> p + v) / CAST(n AS DOUBLE) AS mu,
            ys
        FROM gv
    ),
    ac2 AS (
        SELECT n, ma, mb, na, nb, va, vb, mu, ys,
            list_reduce(list_prepend(0.0e0,
                list_transform(ys, v -> (v - mu) * (v - mu))),
                (p, v) -> p + v) AS den
        FROM ac
    )
    SELECT n AS n_hours,
           (ma - mb) / sqrt(va / CAST(na AS DOUBLE)
                            + vb / CAST(nb AS DOUBLE))
               AS geweke_z,
           CAST(n AS DOUBLE)
           / (1.0e0 + 2.0e0 * ({rho_terms})) AS ess
    FROM ac2
    """
    return q, sql


def build_wave198_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("events_bandit_replay",) + _bandit_query()))
    add(*(("events_geweke_ess",) + _geweke_query()))
    return queries, oracles
