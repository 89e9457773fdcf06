"""Wave-286 query: exact Bayesian A/B superiority probability.

events_bayes_ab: P(p2 > p1) for the first-half vs second-half error
rates under independent Beta(1+x, 1+n−x) posteriors — the EXACT
closed form h = Σ_{i<c} t_i with the integer-ratio recurrence
t_{i+1} = t_i·(a+i)(d+i)/((a+b+d+i)(1+i)) and
t_0 = Π_{j<a} (b+j)/(b+d+j), where (a,b) are the A-posterior and
(c,d) the B-posterior parameters.  Both the t_0 product and the term
sum are SINGLE ordered list folds of exact integer ratios (about a
thousand terms each) — no gamma functions anywhere.  Checked against
Monte-Carlo Beta sampling, the symmetry identity
h(A,B) = 1 − h(B,A), and the uniform-priors anchor h = 1/2.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from ._scaffold import read_cols

US_PER_DAY = 86_400_000_000


def beta_superiority(a, b, c, d):
    """P(Beta(c,d) > Beta(a,b)) — exact integer-ratio folds."""
    lt = 0.0
    for j in range(a):
        lt = lt + math.log(float(b + j) / float(b + d + j))
    t = math.exp(lt)
    total = t
    for i in range(c - 1):
        t = t * (float((a + i) * (d + i))
                 / float((a + b + d + i) * (1 + i)))
        total = total + t
    return total


def _bayes_ab_query():
    def q(sf_dir: str):
        import ray.data as rd

        from .queries import _num_read_blocks
        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "day": pa.array([], type=pa.int64()),
                "e": pa.array([], type=pa.int64()),
                "n": pa.array([], type=pa.int64()),
            })
            if "ts" not in t.column_names or t.num_rows == 0:
                return empty
            tus = t.column("ts").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            et = np.asarray(t.column("event_type").to_pylist())
            day = tus // US_PER_DAY
            ud, inv = np.unique(day, return_inverse=True)
            e = np.bincount(inv[et == "error"],
                            minlength=ud.size)
            n = np.bincount(inv, minlength=ud.size)
            return pa.table({
                "day": pa.array(ud.astype(np.int64)),
                "e": pa.array(e.astype(np.int64)),
                "n": pa.array(n.astype(np.int64)),
            })

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by("day").aggregate(
                [("e", "sum"), ("n", "sum")])
            return pa.table({
                "day": g.column("day").cast(pa.int64()),
                "e": g.column("e_sum").cast(pa.int64()),
                "n": g.column("n_sum").cast(pa.int64()),
            })

        refs = list(
            read_cols(sf_dir, "events", ["ts", "event_type"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        aa = (tree_reduce_tables(refs, merge).to_pandas()
              .sort_values("day"))
        lo = int(aa["day"].min())
        hi = int(aa["day"].max())
        mid = lo + (hi - lo + 1) // 2
        f1 = aa[aa["day"] < mid]
        f2 = aa[aa["day"] >= mid]
        e1, t1 = int(f1["e"].sum()), int(f1["n"].sum())
        e2, t2 = int(f2["e"].sum()), int(f2["n"].sum())
        a, b = 1 + e1, 1 + t1 - e1
        c, d = 1 + e2, 1 + t2 - e2
        p = beta_superiority(a, b, c, d)
        return pa.table({
            "a": pa.array([a], type=pa.int64()),
            "b": pa.array([b], type=pa.int64()),
            "c": pa.array([c], type=pa.int64()),
            "d": pa.array([d], type=pa.int64()),
            "p_b_gt_a": pa.array([p], type=pa.float64()),
        })

    sql = f"""
    WITH ev AS (
        SELECT epoch_us(ts) // {US_PER_DAY} AS day,
               CASE WHEN event_type = 'error' THEN 1 ELSE 0 END
                   AS is_e
        FROM events
    ),
    span AS (
        SELECT min(day) AS lo,
               min(day) + (max(day) - min(day) + 1) // 2 AS mid
        FROM ev
    ),
    halves AS (
        SELECT CASE WHEN day < (SELECT mid FROM span)
                    THEN 0 ELSE 1 END AS h,
               CAST(sum(is_e) AS BIGINT) AS e,
               CAST(count(*) AS BIGINT) AS n
        FROM ev GROUP BY 1
    ),
    par AS (
        SELECT
            1 + (SELECT e FROM halves WHERE h = 0) AS a,
            1 + (SELECT n - e FROM halves WHERE h = 0) AS b,
            1 + (SELECT e FROM halves WHERE h = 1) AS c,
            1 + (SELECT n - e FROM halves WHERE h = 1) AS d
    ),
    t0 AS (
        SELECT exp(list_reduce(list_prepend(0.0e0,
            list_transform(generate_series(0,
                CAST(par.a AS INT) - 1),
                j -> ln(CAST(par.b + j AS DOUBLE)
                        / CAST(par.b + par.d + j AS DOUBLE)))),
            (x, y) -> x + y)) AS t
        FROM par
    ),
    acc AS (
        SELECT list_reduce(
            list_prepend([
                (SELECT t FROM t0), (SELECT t FROM t0)],
                list_transform(generate_series(0,
                    CAST(par.c AS INT) - 2),
                    i -> [CAST(i AS DOUBLE), 0.0e0])),
            (st, e) -> [
                st[1] * (CAST((par.a + CAST(e[1] AS BIGINT))
                              * (par.d + CAST(e[1] AS BIGINT))
                              AS DOUBLE)
                         / CAST((par.a + par.b + par.d
                                 + CAST(e[1] AS BIGINT))
                                * (1 + CAST(e[1] AS BIGINT))
                                AS DOUBLE)),
                st[2] + st[1]
                * (CAST((par.a + CAST(e[1] AS BIGINT))
                        * (par.d + CAST(e[1] AS BIGINT))
                        AS DOUBLE)
                   / CAST((par.a + par.b + par.d
                           + CAST(e[1] AS BIGINT))
                          * (1 + CAST(e[1] AS BIGINT))
                          AS DOUBLE))]) AS st
        FROM par
    )
    SELECT par.a, par.b, par.c, par.d,
           acc.st[2] AS p_b_gt_a
    FROM par CROSS JOIN acc
    """
    return q, sql


def build_wave286_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("events_bayes_ab",) + _bayes_ab_query()))
    return queries, oracles
