"""Wave-296 query: exact Clopper-Pearson interval.

events_clopper_pearson: the exact 95% binomial confidence interval
for the monthly error rate.  Both bounds solve exact binomial tail
equations — T_ge(L) = P(X ≥ x | L) = α/2 and
T_le(U) = P(X ≤ x | U) = α/2 — by FORTY bitwise-replayed bisection
layers each.  Underflow-safe and gamma-free: both tails START AT THE
MODE k = x via the one-time integer-ratio fold
ln C(n,x) = Σ_{i≤x} ln((n−x+i)/i), then recurse outward
(t_{k+1} = t_k·((n−k)/(k+1))·(p/q) upward; t_{k−1} = t_k·(k/(n−k+1))
·(q/p) downward), so the dominant terms are always representable and
far-tail underflow to 0.0 is identical on both sides.  Checked
against math.comb exact sums, the x = 0 closed form, and Wilson
interval nesting.
"""

from __future__ import annotations

import math

import pyarrow as pa

ALPHA = 0.05
N_BI = 40


def _lnc(n, x):
    s = 0.0
    for i in range(1, x + 1):
        s = s + math.log(float(n - x + i) / float(i))
    return s


def tail_ge(p, n, x, lnc):
    """P(X >= x | p) — upward recurrence from the mode."""
    q = 1.0 - p
    t = math.exp(lnc + float(x) * math.log(p)
                 + float(n - x) * math.log(q))
    s = t
    r = p / q
    for k in range(x, n):
        t = t * ((float(n - k) / float(k + 1)) * r)
        s = s + t
    return s


def tail_le(p, n, x, lnc):
    """P(X <= x | p) — downward recurrence from the mode."""
    q = 1.0 - p
    t = math.exp(lnc + float(x) * math.log(p)
                 + float(n - x) * math.log(q))
    s = t
    r = q / p
    for k in range(x, 0, -1):
        t = t * ((float(k) / float(n - k + 1)) * r)
        s = s + t
    return s


def clopper_pearson(x, n):
    """(p_hat, lo, hi) — 40 bisection steps per bound."""
    p_hat = float(x) / float(n)
    half = ALPHA / 2.0
    lnc = _lnc(n, x)
    if x == 0:
        lower = 0.0
    else:
        # bracket [0, p_hat]: with the mode-at-x anchor,
        # tail_ge <= (n-x+1)*t0 here, so an underflowed 0.0
        # always coincides with the correct branch
        lo, hi = 0.0, p_hat
        for _ in range(N_BI):
            mid = (lo + hi) / 2.0
            if tail_ge(mid, n, x, lnc) > half:
                hi = mid
            else:
                lo = mid
        lower = (lo + hi) / 2.0
    if x == n:
        upper = 1.0
    else:
        lo, hi = p_hat, 1.0
        for _ in range(N_BI):
            mid = (lo + hi) / 2.0
            if tail_le(mid, n, x, lnc) > half:
                lo = mid
            else:
                hi = mid
        upper = (lo + hi) / 2.0
    return p_hat, lower, upper


def _cp_query():
    def q(sf_dir: str):
        import pyarrow.parquet as pq
        import numpy as np

        t = pq.read_table(f"{sf_dir}/events.parquet",
                          columns=["event_type"])
        et = np.asarray(t.column("event_type").to_pylist())
        n = len(et)
        x = int((et == "error").sum())
        p_hat, lo, hi = clopper_pearson(x, n)
        return pa.table({
            "x": pa.array([x], type=pa.int64()),
            "n": pa.array([n], type=pa.int64()),
            "p_hat": pa.array([p_hat], type=pa.float64()),
            "cp_lower": pa.array([lo], type=pa.float64()),
            "cp_upper": pa.array([hi], type=pa.float64()),
        })

    t0 = ("exp(cc.lnc + CAST(cc.x AS DOUBLE) * ln({mid})"
          " + CAST(cc.n - cc.x AS DOUBLE)"
          " * ln(1.0e0 - ({mid})))")

    def tail_expr(mid: str, up: bool) -> str:
        start = t0.format(mid=mid)
        if up:
            series = ("generate_series(CAST(cc.x AS INT),"
                      " CAST(cc.n AS INT) - 1)")
            ratio = (f"((CAST(cc.n AS DOUBLE)"
                     f" - CAST(e[1] AS DOUBLE))"
                     f" / (CAST(e[1] AS DOUBLE) + 1.0e0))"
                     f" * (({mid}) / (1.0e0 - ({mid})))")
        else:
            series = ("list_transform(generate_series(1,"
                      " CAST(cc.x AS INT)),"
                      " j -> CAST(cc.x AS INT) - j + 1)")
            ratio = (f"(CAST(e[1] AS DOUBLE)"
                     f" / (CAST(cc.n AS DOUBLE)"
                     f" - CAST(e[1] AS DOUBLE) + 1.0e0))"
                     f" * ((1.0e0 - ({mid})) / ({mid}))")
        if up:
            elems = (f"list_transform({series},"
                     f" k -> [CAST(k AS DOUBLE), 0.0e0])")
        else:
            elems = (f"list_transform({series},"
                     f" k -> [CAST(k AS DOUBLE), 0.0e0])")
        return f"""list_reduce(
            list_prepend([{start}, {start}], {elems}),
            (st, e) -> [st[1] * ({ratio}),
                        st[2] + st[1] * ({ratio})])[2]"""

    def chain(tag: str, up: bool, thresh: str,
              gt_sets_hi: bool) -> str:
        ph = "CAST(cc.x AS DOUBLE) / CAST(cc.n AS DOUBLE)"
        if up:      # lower bound: bracket [0, p_hat]
            init = f"SELECT 0.0e0 AS lo, {ph} AS hi FROM cc"
        else:       # upper bound: bracket [p_hat, 1]
            init = f"SELECT {ph} AS lo, 1.0e0 AS hi FROM cc"
        out = [f"{tag}0 AS MATERIALIZED ({init})"]
        for t in range(1, N_BI + 1):
            mid = f"(({tag}{t - 1}.lo + {tag}{t - 1}.hi) / 2.0e0)"
            tl = tail_expr(mid, up)
            if gt_sets_hi:
                lo_e = f"CASE WHEN {tl} > {thresh} " \
                       f"THEN {tag}{t - 1}.lo ELSE {mid} END"
                hi_e = f"CASE WHEN {tl} > {thresh} " \
                       f"THEN {mid} ELSE {tag}{t - 1}.hi END"
            else:
                lo_e = f"CASE WHEN {tl} > {thresh} " \
                       f"THEN {mid} ELSE {tag}{t - 1}.lo END"
                hi_e = f"CASE WHEN {tl} > {thresh} " \
                       f"THEN {tag}{t - 1}.hi ELSE {mid} END"
            out.append(
                f"{tag}{t} AS MATERIALIZED (SELECT {lo_e} AS lo,"
                f" {hi_e} AS hi FROM {tag}{t - 1} CROSS JOIN cc)")
        return ",\n    ".join(out)

    half = repr(ALPHA / 2.0)
    lower_chain = chain("bl", True, half, gt_sets_hi=True)
    upper_chain = chain("bu", False, half, gt_sets_hi=False)

    sql = f"""
    WITH cnts AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CASE WHEN event_type = 'error'
                        THEN 1 ELSE 0 END) AS BIGINT) AS x
        FROM events
    ),
    cc AS MATERIALIZED (
        SELECT n, x,
               list_reduce(list_prepend(0.0e0,
                   list_transform(generate_series(1,
                       CAST(x AS INT)),
                       i -> ln(CAST(n - x + i AS DOUBLE)
                               / CAST(i AS DOUBLE)))),
                   (a, b) -> a + b) AS lnc
        FROM cnts
    ),
    {lower_chain},
    {upper_chain}
    SELECT cc.x, cc.n,
           CAST(cc.x AS DOUBLE) / CAST(cc.n AS DOUBLE) AS p_hat,
           (bl{N_BI}.lo + bl{N_BI}.hi) / 2.0e0 AS cp_lower,
           (bu{N_BI}.lo + bu{N_BI}.hi) / 2.0e0 AS cp_upper
    FROM cc CROSS JOIN bl{N_BI} CROSS JOIN bu{N_BI}
    """
    return q, sql


def build_wave296_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("events_clopper_pearson",) + _cp_query()))
    return queries, oracles
