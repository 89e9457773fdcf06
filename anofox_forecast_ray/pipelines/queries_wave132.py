"""Wave-132 queries: Pettitt change-point, Mantel-Haenszel OR.

- events_pettitt: Pettitt's nonparametric change-point test on the
  dense hourly count series. With doubled midranks (the repo's
  fully-integer tie handling) the statistic is
  U_t = S2_t - t*(n+1), an exact integer for every split t; the
  prefix S2_t is an integer window SUM (order-free, safe), the
  argmax tie-breaks to the earliest t, and the only floats are the
  classic approximate p-value 2*exp(-6K^2/(n^3+n^2)) — one scalar
  exp on both sides.
- events_mantel_haenszel: Mantel-Haenszel pooled odds ratio and the
  Cochran-MH chi-square across day-of-week strata (exposure = the
  multiplicative-hash user cohort bit, outcome = error event). The
  seven 2x2 tables are bounded integer cells; the three MH folds
  (sum a*d/n, sum b*c/n, sum E_i and V_i) walk strata in ascending
  dow order so DuckDB's list_reduce replays them bitwise.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from .queries import _num_read_blocks
from ._scaffold import read_cols

US_PER_HOUR = 3_600_000_000
US_PER_DAY = 86_400_000_000
HASH_A = 2654435761


# ------------------------------------------------------------- events_pettitt
def _pettitt_query():
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "hour": pa.array([], type=pa.int64()),
                "cnt": pa.array([], type=pa.int64()),
            })
            if "ts" not in t.column_names or t.num_rows == 0:
                return empty
            tus = t.column("ts").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            hour = tus // US_PER_HOUR
            uh, c = np.unique(hour, return_counts=True)
            return pa.table({
                "hour": pa.array(uh.astype(np.int64)),
                "cnt": pa.array(c.astype(np.int64)),
            })

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by("hour").aggregate([("cnt", "sum")])
            return pa.table({
                "hour": g.column("hour").cast(pa.int64()),
                "cnt": g.column("cnt_sum").cast(pa.int64()),
            })

        refs = list(
            read_cols(sf_dir, "events", ["ts"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        h = tree_reduce_tables(refs, merge).to_pandas()
        h = h.sort_values("hour").reset_index(drop=True)
        hmin, hmax = int(h["hour"].min()), int(h["hour"].max())
        n_grid = hmax - hmin + 1
        y = np.zeros(n_grid, dtype=np.int64)
        y[h["hour"].to_numpy(np.int64) - hmin] = (
            h["cnt"].to_numpy(np.int64))
        n = int(n_grid)

        # doubled midranks from the value histogram (integer)
        uv, c = np.unique(y, return_counts=True)
        less = np.concatenate([[0], np.cumsum(c)[:-1]])
        r2_of = {int(v): 2 * int(lo) + int(cc) + 1
                 for v, lo, cc in zip(uv, less, c)}
        r2 = [r2_of[int(v)] for v in y]

        best_k = -1
        best_t = -1
        best_u = 0
        s2 = 0
        for t_i in range(1, n):
            s2 += r2[t_i - 1]
            u = s2 - t_i * (n + 1)
            if abs(u) > best_k:
                best_k = abs(u)
                best_t = t_i
                best_u = u
        p = 2.0 * math.exp(
            (-6.0 * float(best_k) * float(best_k))
            / (float(n) * float(n) * float(n)
               + float(n) * float(n)))
        return pa.table({
            "n_hours": pa.array([n], type=pa.int64()),
            "k_stat": pa.array([best_k], type=pa.int64()),
            "u_at_k": pa.array([best_u], type=pa.int64()),
            "t_hat": pa.array([best_t], type=pa.int64()),
            "p_approx": pa.array([p], type=pa.float64()),
        })

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
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM grid),
    hist AS (
        SELECT cnt AS v, CAST(count(*) AS BIGINT) AS c
        FROM grid GROUP BY cnt
    ),
    rk AS (
        SELECT v,
               2 * (SELECT CAST(COALESCE(sum(c), 0) AS BIGINT)
                    FROM hist h2 WHERE h2.v < hist.v)
                   + c + 1 AS r2
        FROM hist
    ),
    seq AS (
        SELECT CAST(row_number() OVER (ORDER BY g.hour)
                    AS BIGINT) AS t,
               rk.r2
        FROM grid g JOIN rk ON rk.v = g.cnt
    ),
    u AS (
        SELECT t,
               CAST(sum(r2) OVER (ORDER BY t
                    ROWS UNBOUNDED PRECEDING) AS BIGINT)
                   - t * ((SELECT n FROM nn) + 1) AS ut
        FROM seq
    ),
    best AS (
        SELECT t AS t_hat, abs(ut) AS k_stat, ut AS u_at_k
        FROM u, nn
        WHERE t < nn.n
        ORDER BY abs(ut) DESC, t ASC
        LIMIT 1
    )
    SELECT nn.n AS n_hours,
           best.k_stat AS k_stat,
           best.u_at_k AS u_at_k,
           best.t_hat AS t_hat,
           2.0e0 * exp((-6.0e0 * CAST(best.k_stat AS DOUBLE)
                        * CAST(best.k_stat AS DOUBLE))
                       / (CAST(nn.n AS DOUBLE)
                          * CAST(nn.n AS DOUBLE)
                          * CAST(nn.n AS DOUBLE)
                          + CAST(nn.n AS DOUBLE)
                            * CAST(nn.n AS DOUBLE)))
               AS p_approx
    FROM best CROSS JOIN nn
    """
    return q, sql


# ---------------------------------------------------- events_mantel_haenszel
def _mantel_haenszel_query():
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "dow": pa.array([], type=pa.int64()),
                "g": pa.array([], type=pa.int64()),
                "err": pa.array([], type=pa.int64()),
                "c": pa.array([], type=pa.int64()),
            })
            if "ts" not in t.column_names or t.num_rows == 0:
                return empty
            tus = t.column("ts").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            uid = t.column("user_id").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            et = np.asarray(t.column("event_type").to_pylist())
            dow = (tus // US_PER_DAY) % 7
            g = ((uid * np.int64(HASH_A)) % np.int64(1 << 32)) \
                >> np.int64(31)
            err = (et == "error").astype(np.int64)
            key = dow * 4 + g * 2 + err
            uk, c = np.unique(key, return_counts=True)
            return pa.table({
                "dow": pa.array(uk // 4),
                "g": pa.array((uk // 2) % 2),
                "err": pa.array(uk % 2),
                "c": pa.array(c.astype(np.int64)),
            })

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by(["dow", "g", "err"]).aggregate(
                [("c", "sum")])
            return pa.table({
                "dow": g.column("dow").cast(pa.int64()),
                "g": g.column("g").cast(pa.int64()),
                "err": g.column("err").cast(pa.int64()),
                "c": g.column("c_sum").cast(pa.int64()),
            })

        refs = list(
            read_cols(sf_dir, "events", ["ts", "user_id", "event_type"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        cells = tree_reduce_tables(refs, merge).to_pandas()
        tab = {}
        for _, r in cells.iterrows():
            tab[(int(r["dow"]), int(r["g"]),
                 int(r["err"]))] = int(r["c"])

        num = 0.0
        den = 0.0
        sum_a = 0
        sum_e = 0.0
        sum_v = 0.0
        for dow in sorted(set(int(v) for v in cells["dow"])):
            a = tab.get((dow, 1, 1), 0)
            b = tab.get((dow, 1, 0), 0)
            cc = tab.get((dow, 0, 1), 0)
            d = tab.get((dow, 0, 0), 0)
            nt = a + b + cc + d
            num = num + (float(a) * float(d)) / float(nt)
            den = den + (float(b) * float(cc)) / float(nt)
            sum_a += a
            sum_e = sum_e + (float(a + b) * float(a + cc)) \
                / float(nt)
            sum_v = sum_v + (float(a + b) * float(cc + d)
                             * float(a + cc) * float(b + d)) \
                / (float(nt) * float(nt) * float(nt - 1))
        or_mh = num / den
        diff = float(sum_a) - sum_e
        chi2 = (diff * diff) / sum_v
        return pa.table({
            "sum_a": pa.array([sum_a], type=pa.int64()),
            "e_a": pa.array([sum_e], type=pa.float64()),
            "v_a": pa.array([sum_v], type=pa.float64()),
            "or_mh": pa.array([or_mh], type=pa.float64()),
            "chi2_cmh": pa.array([chi2], type=pa.float64()),
        })

    sql = f"""
    WITH e AS (
        SELECT (epoch_us(ts) // {US_PER_DAY}) % 7 AS dow,
               ((user_id * {HASH_A}) % 4294967296)
                   // 2147483648 AS g,
               CASE WHEN event_type = 'error' THEN 1 ELSE 0 END
                   AS err
        FROM events
    ),
    strata AS (
        SELECT dow,
               CAST(sum(CASE WHEN g = 1 AND err = 1
                        THEN 1 ELSE 0 END) AS BIGINT) AS a,
               CAST(sum(CASE WHEN g = 1 AND err = 0
                        THEN 1 ELSE 0 END) AS BIGINT) AS b,
               CAST(sum(CASE WHEN g = 0 AND err = 1
                        THEN 1 ELSE 0 END) AS BIGINT) AS c,
               CAST(sum(CASE WHEN g = 0 AND err = 0
                        THEN 1 ELSE 0 END) AS BIGINT) AS d
        FROM e GROUP BY dow
    ),
    folds AS (
        SELECT
            list_reduce(list_prepend(0.0e0,
                list((CAST(a AS DOUBLE) * CAST(d AS DOUBLE))
                     / CAST(a + b + c + d AS DOUBLE)
                     ORDER BY dow)),
                (x, y) -> x + y) AS num,
            list_reduce(list_prepend(0.0e0,
                list((CAST(b AS DOUBLE) * CAST(c AS DOUBLE))
                     / CAST(a + b + c + d AS DOUBLE)
                     ORDER BY dow)),
                (x, y) -> x + y) AS den,
            CAST(sum(a) AS BIGINT) AS sum_a,
            list_reduce(list_prepend(0.0e0,
                list((CAST(a + b AS DOUBLE)
                      * CAST(a + c AS DOUBLE))
                     / CAST(a + b + c + d AS DOUBLE)
                     ORDER BY dow)),
                (x, y) -> x + y) AS e_a,
            list_reduce(list_prepend(0.0e0,
                list((CAST(a + b AS DOUBLE)
                      * CAST(c + d AS DOUBLE)
                      * CAST(a + c AS DOUBLE)
                      * CAST(b + d AS DOUBLE))
                     / (CAST(a + b + c + d AS DOUBLE)
                        * CAST(a + b + c + d AS DOUBLE)
                        * CAST(a + b + c + d - 1 AS DOUBLE))
                     ORDER BY dow)),
                (x, y) -> x + y) AS v_a
        FROM strata
    )
    SELECT sum_a,
           e_a,
           v_a,
           num / den AS or_mh,
           ((CAST(sum_a AS DOUBLE) - e_a)
            * (CAST(sum_a AS DOUBLE) - e_a)) / v_a AS chi2_cmh
    FROM folds
    """
    return q, sql


def build_wave132_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("events_pettitt",) + _pettitt_query()))
    add(*(("events_mantel_haenszel",) + _mantel_haenszel_query()))
    return queries, oracles
