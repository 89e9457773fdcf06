"""Wave-221 queries: Tukey HSD q statistics, bootstrap CI.

- events_tukey_q: the post-hoc step the hour-of-day ANOVA (wave 62)
  calls for — studentized-range q statistics between the four
  6-hour blocks' mean event values (exact cents): q_ij =
  |m_i - m_j| / sqrt(MSE/2 (1/n_i + 1/n_j)) with the pooled
  within-group MSE from integer moments. Emits all 6 pairs.
- lineitem_bootstrap_ci: a sha-seeded percentile bootstrap CI for the
  mean monthly revenue: B = 64 resamples, the b-th resample picks
  month index sha256('bs|b|i') mod T for each of T slots, so every
  resample SUM is an exact int64 and the 5%/95% percentile picks
  are integer order statistics (rank 4 and 61 of 64) — the
  bootstrap with zero float nondeterminism.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pyarrow as pa

from .queries import _num_read_blocks
from ._scaffold import read_cols

US_PER_HOUR = 3_600_000_000
BOOT_B = 64
HEX = 12


def tukey_pairs(ns, s1s, s2s):
    """[(i, j, q_ij)] over 6-hour blocks; exact int moments."""
    k = len(ns)
    N = sum(ns)
    sse = 0.0
    for n, s1, s2 in zip(ns, s1s, s2s):
        sse = sse + (float(s2)
                     - float(s1) * float(s1) / n)
    mse = sse / (N - k)
    out = []
    for i in range(k):
        for j in range(i + 1, k):
            mi = s1s[i] / ns[i]
            mj = s1s[j] / ns[j]
            q = abs(mi - mj) / math.sqrt(
                mse / 2.0e0 * (1.0e0 / ns[i] + 1.0e0 / ns[j]))
            out.append((i, j, q))
    return out


def boot_indices(b: int, i: int, t: int) -> int:
    h = hashlib.sha256(f"bs|{b}|{i}".encode()).hexdigest()
    return int(h[:HEX], 16) % t


def bootstrap_means(y):
    """[(b, sum_b)] exact integer resample sums."""
    t = len(y)
    out = []
    for b in range(BOOT_B):
        s = 0
        for i in range(t):
            s += int(y[boot_indices(b, i, t)])
        out.append((b, s))
    return out


# -------------------------------------------------------- events_tukey_q
def _tukey_query():
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            tus = t.column("ts").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            blk = ((tus // US_PER_HOUR) % 24) // 6
            cents = np.round(t.column("value").to_numpy(
                zero_copy_only=False) * 100.0).astype(np.int64)
            rows = {"g": [], "n": [], "s1": [], "s2": []}
            for g in range(4):
                m = blk == g
                x = cents[m]
                rows["g"].append(g)
                rows["n"].append(int(m.sum()))
                rows["s1"].append(int(x.sum()))
                rows["s2"].append(int((x * x).sum()))
            return pa.table({c: pa.array(v, type=pa.int64())
                             for c, v in rows.items()})

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by("g").aggregate(
                [("n", "sum"), ("s1", "sum"), ("s2", "sum")])
            return pa.table({
                "g": g.column("g").cast(pa.int64()),
                "n": g.column("n_sum").cast(pa.int64()),
                "s1": g.column("s1_sum").cast(pa.int64()),
                "s2": g.column("s2_sum").cast(pa.int64()),
            })

        refs = list(
            read_cols(sf_dir, "events", ["ts", "value"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        h = tree_reduce_tables(refs, merge).to_pandas()
        h = h.sort_values("g").reset_index(drop=True)
        rows = tukey_pairs([int(v) for v in h["n"]],
                           [int(v) for v in h["s1"]],
                           [int(v) for v in h["s2"]])
        return pa.table({
            "block_i": pa.array([r[0] for r in rows],
                                type=pa.int64()),
            "block_j": pa.array([r[1] for r in rows],
                                type=pa.int64()),
            "tukey_q": pa.array([r[2] for r in rows],
                                type=pa.float64()),
        })

    sql = f"""
    WITH e AS (
        SELECT ((epoch_us(ts) // {US_PER_HOUR}) % 24) // 6 AS g,
               CAST(round_even(value * 100, 0) AS BIGINT) AS y
        FROM events
    ),
    gr AS (
        SELECT g, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(y) AS BIGINT) AS s1,
               CAST(sum(y * y) AS BIGINT) AS s2
        FROM e GROUP BY g
    ),
    mse AS (
        SELECT
            list_reduce(list_prepend(0.0e0,
                list(CAST(s2 AS DOUBLE)
                     - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
                       / CAST(n AS DOUBLE) ORDER BY g)),
                (p, v) -> p + v)
            / CAST((SELECT sum(n) FROM gr)
                   - (SELECT count(*) FROM gr) AS DOUBLE) AS m
        FROM gr
    )
    SELECT a.g AS block_i, b.g AS block_j,
           abs(CAST(a.s1 AS DOUBLE) / CAST(a.n AS DOUBLE)
               - CAST(b.s1 AS DOUBLE) / CAST(b.n AS DOUBLE))
           / sqrt((SELECT m FROM mse) / 2.0e0
                  * (1.0e0 / CAST(a.n AS DOUBLE)
                     + 1.0e0 / CAST(b.n AS DOUBLE)))
               AS tukey_q
    FROM gr a JOIN gr b ON a.g < b.g
    """
    return q, sql


# ---------------------------------------------------- orders_bootstrap_ci
def _boot_query():
    def q(sf_dir: str):
        from .queries_wave191 import _monthly_cents

        _, cents = _monthly_cents(sf_dir)
        y = [int(v) for v in cents]
        t = len(y)
        sums = bootstrap_means(y)
        vals = sorted(s for _, s in sums)
        lo_rank = (5 * BOOT_B + 99) // 100   # ceil(0.05 B) = 4
        hi_rank = (95 * BOOT_B) // 100       # floor(0.95 B) = 60
        lo = vals[lo_rank - 1]
        hi = vals[hi_rank - 1]
        return pa.table({
            "n_months": pa.array([t], type=pa.int64()),
            "ci_lo_mean": pa.array([lo / t], type=pa.float64()),
            "ci_hi_mean": pa.array([hi / t], type=pa.float64()),
        })

    sql = f"""
    WITH mm AS (
        SELECT (year(l_shipdate) - 1970) * 12
                   + (month(l_shipdate) - 1) AS month,
               CAST(sum(CAST(round_even(l_extendedprice * 100, 0)
                             AS BIGINT)) AS BIGINT) AS cents
        FROM lineitem GROUP BY 1
    ),
    idx AS (
        SELECT row_number() OVER (ORDER BY month) - 1 AS i,
               cents
        FROM mm
    ),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS t FROM idx),
    draws AS (
        SELECT b.b, s.i AS slot,
               CAST(concat('0x', substr(sha256(
                   'bs|' || CAST(b.b AS VARCHAR) || '|'
                   || CAST(s.i AS VARCHAR)), 1, {HEX}))
                   AS BIGINT) % (SELECT t FROM nn) AS pick
        FROM (SELECT CAST(unnest(generate_series(0,
                  {BOOT_B - 1})) AS BIGINT) AS b) b
        CROSS JOIN idx s
    ),
    sums AS (
        SELECT d.b, CAST(sum(idx.cents) AS BIGINT) AS s
        FROM draws d JOIN idx ON idx.i = d.pick
        GROUP BY d.b
    ),
    ranked AS (
        SELECT s, row_number() OVER (ORDER BY s) AS r FROM sums
    )
    SELECT (SELECT t FROM nn) AS n_months,
           CAST((SELECT s FROM ranked
                 WHERE r = (5 * {BOOT_B} + 99) // 100)
                AS DOUBLE) / CAST((SELECT t FROM nn) AS DOUBLE)
               AS ci_lo_mean,
           CAST((SELECT s FROM ranked
                 WHERE r = (95 * {BOOT_B}) // 100)
                AS DOUBLE) / CAST((SELECT t FROM nn) AS DOUBLE)
               AS ci_hi_mean
    FROM (SELECT 1)
    """
    return q, sql


def build_wave221_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("events_tukey_q",) + _tukey_query()))
    add(*(("lineitem_bootstrap_ci",) + _boot_query()))
    return queries, oracles
