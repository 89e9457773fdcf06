"""Wave-138 queries: split-conformal coverage, distance correlation.

- events_conformal_hod: split-conformal prediction intervals for
  the hour-of-day profile predictor — train third fits the profile
  (integer sums, one division per hod), calibration third supplies
  the conformal quantile q_hat = the ceil((n+1)(1-alpha))-th
  smallest absolute residual (an ORDER BY (r, hour) rank selection,
  deterministic because equal doubles tie-break on the hour), and
  the test third reports the realized coverage of pred +/- q_hat.
  The 90% target and the finite-sample guarantee make this the
  forecasting engine's distribution-free interval layer.
- events_distance_corr: Szekely's distance correlation between
  daily total and daily error counts. Pairwise distances are exact
  integers; double-centering and the three V-statistics fold in
  lexicographic (i, j) order on both sides (3600 terms at 60 days),
  and dCor^2 = dCov^2/sqrt(dVarX^2 dVarY^2) is scalar arithmetic.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from .queries import _num_read_blocks
from ._scaffold import read_cols
from .queries_wave137 import _hourly_counts

US_PER_HOUR = 3_600_000_000
CONF_ALPHA = 0.1


# ------------------------------------------------------ events_conformal_hod
def _conformal_query(alpha: float = CONF_ALPHA):
    def q(sf_dir: str):
        cnt = _hourly_counts(sf_dir)
        n = len(cnt)
        d1 = (n // 3) // 24 * 24
        d2 = (2 * n // 3) // 24 * 24

        # hod profile from the train third (integer sums)
        s = [0] * 24
        c = [0] * 24
        for i in range(d1):
            s[i % 24] += int(cnt[i])
            c[i % 24] += 1
        prof = [float(s[h]) / float(c[h]) for h in range(24)]

        cal = []
        for i in range(d1, d2):
            r = abs(float(cnt[i]) - prof[i % 24])
            cal.append((r, i))
        cal.sort()
        n_cal = len(cal)
        k = math.ceil((n_cal + 1) * (1.0 - alpha))
        if k > n_cal:
            k = n_cal
        qhat = cal[k - 1][0]

        n_test = n - d2
        covered = 0
        for i in range(d2, n):
            r = abs(float(cnt[i]) - prof[i % 24])
            if r <= qhat:
                covered += 1
        return pa.table({
            "n_cal": pa.array([n_cal], type=pa.int64()),
            "n_test": pa.array([n_test], type=pa.int64()),
            "k_rank": pa.array([k], type=pa.int64()),
            "q_hat": pa.array([qhat], type=pa.float64()),
            "covered": pa.array([covered], type=pa.int64()),
            "coverage": pa.array(
                [float(covered) / float(n_test)],
                type=pa.float64()),
        })

    sql = f"""
    WITH hc AS (
        SELECT epoch_us(ts) // {US_PER_HOUR} AS hour,
               CAST(count(*) AS BIGINT) AS cnt
        FROM events GROUP BY 1
    ),
    grid AS (
        SELECT CAST(row_number() OVER (ORDER BY g.h) - 1
                    AS BIGINT) AS i,
               COALESCE(hc.cnt, 0) AS cnt
        FROM (SELECT unnest(generate_series(
                  (SELECT min(hour) FROM hc),
                  (SELECT max(hour) FROM hc))) AS h) g
        LEFT JOIN hc ON hc.hour = g.h
    ),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM grid),
    cuts AS (
        SELECT (n // 3) // 24 * 24 AS d1,
               (2 * n // 3) // 24 * 24 AS d2, n
        FROM nn
    ),
    prof AS (
        SELECT i % 24 AS hod,
               CAST(sum(cnt) AS DOUBLE)
                   / CAST(count(*) AS DOUBLE) AS p
        FROM grid, cuts WHERE i < cuts.d1
        GROUP BY 1
    ),
    cal AS (
        SELECT abs(CAST(g.cnt AS DOUBLE) - prof.p) AS r,
               g.i
        FROM grid g JOIN prof ON prof.hod = g.i % 24
        CROSS JOIN cuts
        WHERE g.i >= cuts.d1 AND g.i < cuts.d2
    ),
    ncal AS (SELECT CAST(count(*) AS BIGINT) AS n_cal
             FROM cal),
    kk AS (
        SELECT n_cal,
               LEAST(CAST(ceil(CAST(n_cal + 1 AS DOUBLE)
                               * {1.0 - alpha!r}) AS BIGINT),
                     n_cal) AS k
        FROM ncal
    ),
    qh AS (
        SELECT r AS q_hat
        FROM (SELECT r, row_number() OVER (ORDER BY r, i)
                     AS rn FROM cal), kk
        WHERE rn = kk.k
    ),
    test AS (
        SELECT abs(CAST(g.cnt AS DOUBLE) - prof.p) AS r
        FROM grid g JOIN prof ON prof.hod = g.i % 24
        CROSS JOIN cuts
        WHERE g.i >= cuts.d2
    ),
    ev AS (
        SELECT CAST(count(*) AS BIGINT) AS n_test,
               CAST(sum(CASE WHEN test.r <= qh.q_hat
                        THEN 1 ELSE 0 END) AS BIGINT)
                   AS covered
        FROM test CROSS JOIN qh
    )
    SELECT kk.n_cal AS n_cal,
           ev.n_test AS n_test,
           kk.k AS k_rank,
           qh.q_hat AS q_hat,
           ev.covered AS covered,
           CAST(ev.covered AS DOUBLE)
               / CAST(ev.n_test AS DOUBLE) AS coverage
    FROM kk CROSS JOIN qh CROSS JOIN ev
    """
    return q, sql


# ----------------------------------------------------- events_distance_corr
def _dcor_query():
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "hour": pa.array([], type=pa.int64()),
                "tot": pa.array([], type=pa.int64()),
                "err": pa.array([], type=pa.int64()),
            })
            if "ts" not in t.column_names or t.num_rows == 0:
                return empty
            tus = t.column("ts").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            et = np.asarray(t.column("event_type").to_pylist())
            hour = tus // US_PER_HOUR
            uh, inv = np.unique(hour, return_inverse=True)
            tot = np.bincount(inv, minlength=uh.size)
            err = np.bincount(inv[et == "error"],
                              minlength=uh.size)
            return pa.table({
                "hour": pa.array(uh.astype(np.int64)),
                "tot": pa.array(tot.astype(np.int64)),
                "err": pa.array(err.astype(np.int64)),
            })

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by("hour").aggregate(
                [("tot", "sum"), ("err", "sum")])
            return pa.table({
                "hour": g.column("hour").cast(pa.int64()),
                "tot": g.column("tot_sum").cast(pa.int64()),
                "err": g.column("err_sum").cast(pa.int64()),
            })

        refs = list(
            read_cols(sf_dir, "events", ["ts", "event_type"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        h = tree_reduce_tables(refs, merge).to_pandas()
        h = h.sort_values("hour").reset_index(drop=True)
        day = h["hour"].to_numpy(np.int64) // 24
        g = h.groupby(day).agg(
            x=("tot", "sum"), yv=("err", "sum"))
        x = [int(v) for v in g["x"]]
        yv = [int(v) for v in g["yv"]]
        n = len(x)
        nf = float(n)

        def rowmeans(v):
            rm = []
            for i in range(n):
                acc = 0.0
                for j in range(n):
                    acc = acc + float(abs(v[i] - v[j]))
                rm.append(acc / nf)
            return rm

        amx = rowmeans(x)
        amy = rowmeans(yv)
        gx = 0.0
        gy = 0.0
        for i in range(n):
            gx = gx + amx[i]
            gy = gy + amy[i]
        gx = gx / nf
        gy = gy / nf

        dcov = 0.0
        dvx = 0.0
        dvy = 0.0
        for i in range(n):
            for j in range(n):
                a = ((float(abs(x[i] - x[j])) - amx[i])
                     - amx[j]) + gx
                b = ((float(abs(yv[i] - yv[j])) - amy[i])
                     - amy[j]) + gy
                dcov = dcov + a * b
                dvx = dvx + a * a
                dvy = dvy + b * b
        dcov = dcov / (nf * nf)
        dvx = dvx / (nf * nf)
        dvy = dvy / (nf * nf)
        dcor2 = dcov / math.sqrt(dvx * dvy)
        return pa.table({
            "n_days": pa.array([n], type=pa.int64()),
            "dcov2": pa.array([dcov], type=pa.float64()),
            "dvarx2": pa.array([dvx], type=pa.float64()),
            "dvary2": pa.array([dvy], type=pa.float64()),
            "dcor2": pa.array([dcor2], type=pa.float64()),
        })

    sql = f"""
    WITH hc AS (
        SELECT epoch_us(ts) // {US_PER_HOUR} AS hour,
               CAST(count(*) AS BIGINT) AS tot,
               CAST(sum(CASE WHEN event_type = 'error'
                        THEN 1 ELSE 0 END) AS BIGINT) AS err
        FROM events GROUP BY 1
    ),
    days AS (
        SELECT hour // 24 AS day,
               CAST(sum(tot) AS BIGINT) AS x,
               CAST(sum(err) AS BIGINT) AS y
        FROM hc GROUP BY 1
    ),
    idx AS (
        SELECT CAST(row_number() OVER (ORDER BY day) - 1
                    AS BIGINT) AS i, x, y
        FROM days
    ),
    nn AS (SELECT CAST(count(*) AS DOUBLE) AS nf FROM idx),
    rm AS (
        SELECT a.i,
               list_reduce(list_prepend(0.0e0,
                   list(CAST(abs(a.x - b.x) AS DOUBLE)
                        ORDER BY b.i)),
                   (p, v) -> p + v) / nn.nf AS amx,
               list_reduce(list_prepend(0.0e0,
                   list(CAST(abs(a.y - b.y) AS DOUBLE)
                        ORDER BY b.i)),
                   (p, v) -> p + v) / nn.nf AS amy
        FROM idx a JOIN idx b ON TRUE CROSS JOIN nn
        GROUP BY a.i, nn.nf
    ),
    gm AS (
        SELECT list_reduce(list_prepend(0.0e0,
                   list(amx ORDER BY i)), (p, v) -> p + v)
                   / nn.nf AS gx,
               list_reduce(list_prepend(0.0e0,
                   list(amy ORDER BY i)), (p, v) -> p + v)
                   / nn.nf AS gy
        FROM rm CROSS JOIN nn GROUP BY nn.nf
    ),
    cent AS (
        SELECT a.i AS i, b.i AS j,
               ((CAST(abs(a.x - b.x) AS DOUBLE) - ra.amx)
                - rb.amx) + gm.gx AS ac,
               ((CAST(abs(a.y - b.y) AS DOUBLE) - ra.amy)
                - rb.amy) + gm.gy AS bc
        FROM idx a JOIN idx b ON TRUE
        JOIN rm ra ON ra.i = a.i
        JOIN rm rb ON rb.i = b.i
        CROSS JOIN gm
    ),
    folds AS (
        SELECT
            list_reduce(list_prepend(0.0e0,
                list(ac * bc ORDER BY i, j)),
                (p, v) -> p + v) / (nn.nf * nn.nf) AS dcov2,
            list_reduce(list_prepend(0.0e0,
                list(ac * ac ORDER BY i, j)),
                (p, v) -> p + v) / (nn.nf * nn.nf) AS dvarx2,
            list_reduce(list_prepend(0.0e0,
                list(bc * bc ORDER BY i, j)),
                (p, v) -> p + v) / (nn.nf * nn.nf) AS dvary2
        FROM cent CROSS JOIN nn GROUP BY nn.nf
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM idx)
               AS n_days,
           dcov2, dvarx2, dvary2,
           dcov2 / sqrt(dvarx2 * dvary2) AS dcor2
    FROM folds
    """
    return q, sql


def build_wave138_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("events_conformal_hod",) + _conformal_query()))
    add(*(("events_distance_corr",) + _dcor_query()))
    return queries, oracles
