"""Wave-144 queries: distributed EM for a 2-Gaussian mixture,
beta-binomial empirical Bayes.

- events_gmm_em3: three UNROLLED EM iterations fitting a
  two-component Gaussian mixture to the hourly count distribution.
  The E/M steps run entirely over the bounded value HISTOGRAM
  (cells, not rows): responsibilities are scalar exp ratios per
  cell, and every M-step sum folds cells in ascending value order,
  so DuckDB replays the whole trajectory with three generated CTE
  layers. Deterministic init (q25/q75 order-stat means, pooled
  variance, p=1/2). The score column is the un-normalized mixture
  log-likelihood (2-pi constant dropped identically on both sides).
- events_user_beta_binomial: empirical-Bayes shrinkage of per-user
  error rates — method-of-moments Beta(alpha, beta) fit over users
  with >= 20 events, and the shrunken posterior-mean rate
  (k+alpha)/(n+alpha+beta) for the most extreme raw-rate user. The
  per-user (errors, events) cells are bounded; the rate mean and
  variance fold users in ascending uid order.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from .queries import _num_read_blocks
from ._scaffold import read_cols

US_PER_HOUR = 3_600_000_000
EM_ITERS = 3
BB_MIN_N = 20
HASH_A = 2654435761


# ------------------------------------------------------------ events_gmm_em3
def _gmm_query(iters: int = EM_ITERS):
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
        hmin, hmax = int(h["hour"].min()), int(h["hour"].max())
        cnt = np.zeros(hmax - hmin + 1, dtype=np.int64)
        cnt[h["hour"].to_numpy(np.int64) - hmin] = (
            h["cnt"].to_numpy(np.int64))
        uv, cc = np.unique(cnt, return_counts=True)
        cells = [(int(v), int(c)) for v, c in zip(uv, cc)]
        n = sum(c for _v, c in cells)

        # deterministic init: exact q25/q75 order stats + pooled var
        cum = 0
        k25 = (n + 3) // 4
        k75 = (3 * n + 3) // 4
        m1 = m2 = None
        for v, c in cells:
            cum += c
            if m1 is None and cum >= k25:
                m1 = float(v)
            if m2 is None and cum >= k75:
                m2 = float(v)
        sv = sum(v * c for v, c in cells)
        svv = sum(v * v * c for v, c in cells)
        nf = float(n)
        var0 = (float(svv) - (float(sv) * float(sv)) / nf) \
            / nf
        s1 = var0
        s2 = var0
        p1 = 0.5

        score = 0.0
        for _it in range(iters):
            n1 = 0.0
            n2 = 0.0
            sv1 = 0.0
            sv2 = 0.0
            svv1 = 0.0
            svv2 = 0.0
            score = 0.0
            for v, c in cells:
                vf = float(v)
                cf = float(c)
                d1 = vf - m1
                d2 = vf - m2
                l1 = p1 * (math.exp(-0.5 * (d1 * d1) / s1)
                           / math.sqrt(s1))
                l2 = (1.0 - p1) \
                    * (math.exp(-0.5 * (d2 * d2) / s2)
                       / math.sqrt(s2))
                r1 = l1 / (l1 + l2)
                n1 = n1 + cf * r1
                n2 = n2 + cf * (1.0 - r1)
                sv1 = sv1 + cf * r1 * vf
                sv2 = sv2 + cf * (1.0 - r1) * vf
                svv1 = svv1 + cf * r1 * (vf * vf)
                svv2 = svv2 + cf * (1.0 - r1) * (vf * vf)
                score = score + cf * math.log(l1 + l2)
            m1 = sv1 / n1
            m2 = sv2 / n2
            s1 = svv1 / n1 - m1 * m1
            s2 = svv2 / n2 - m2 * m2
            p1 = n1 / nf
        return pa.table({
            "n_hours": pa.array([n], type=pa.int64()),
            "m1": pa.array([m1], type=pa.float64()),
            "m2": pa.array([m2], type=pa.float64()),
            "var1": pa.array([s1], type=pa.float64()),
            "var2": pa.array([s2], type=pa.float64()),
            "p1": pa.array([p1], type=pa.float64()),
            "score": pa.array([score], type=pa.float64()),
        })

    # generated CTE chain: params0 -> (resp_i, params_i) x iters
    lik = ("{p} * (exp(-0.5e0 * ((CAST(v AS DOUBLE) - {m})"
           " * (CAST(v AS DOUBLE) - {m})) / {s})"
           " / sqrt({s}))")
    layers = []
    prev = "params0"
    for i in range(1, iters + 1):
        l1 = lik.format(p=f"{prev}.p1", m=f"{prev}.m1",
                        s=f"{prev}.s1")
        l2 = lik.format(p=f"(1.0e0 - {prev}.p1)",
                        m=f"{prev}.m2", s=f"{prev}.s2")
        layers.append(f"""
    resp{i} AS (
        SELECT cells.v, cells.c,
               {l1} AS l1, {l2} AS l2,
               {l1} / ({l1} + {l2}) AS r1
        FROM cells CROSS JOIN {prev}
    ),
    folds{i} AS (
        SELECT
            list_reduce(list_prepend(0.0e0,
                list(CAST(c AS DOUBLE) * r1 ORDER BY v)),
                (x, y) -> x + y) AS n1,
            list_reduce(list_prepend(0.0e0,
                list(CAST(c AS DOUBLE) * (1.0e0 - r1)
                     ORDER BY v)), (x, y) -> x + y) AS n2,
            list_reduce(list_prepend(0.0e0,
                list(CAST(c AS DOUBLE) * r1
                     * CAST(v AS DOUBLE) ORDER BY v)),
                (x, y) -> x + y) AS sv1,
            list_reduce(list_prepend(0.0e0,
                list(CAST(c AS DOUBLE) * (1.0e0 - r1)
                     * CAST(v AS DOUBLE) ORDER BY v)),
                (x, y) -> x + y) AS sv2,
            list_reduce(list_prepend(0.0e0,
                list(CAST(c AS DOUBLE) * r1
                     * (CAST(v AS DOUBLE)
                        * CAST(v AS DOUBLE)) ORDER BY v)),
                (x, y) -> x + y) AS svv1,
            list_reduce(list_prepend(0.0e0,
                list(CAST(c AS DOUBLE) * (1.0e0 - r1)
                     * (CAST(v AS DOUBLE)
                        * CAST(v AS DOUBLE)) ORDER BY v)),
                (x, y) -> x + y) AS svv2,
            list_reduce(list_prepend(0.0e0,
                list(CAST(c AS DOUBLE) * ln(l1 + l2)
                     ORDER BY v)), (x, y) -> x + y) AS score
        FROM resp{i}
    ),
    params{i} AS (
        SELECT sv1 / n1 AS m1,
               sv2 / n2 AS m2,
               svv1 / n1 - (sv1 / n1) * (sv1 / n1) AS s1,
               svv2 / n2 - (sv2 / n2) * (sv2 / n2) AS s2,
               n1 / (SELECT nf FROM nn) AS p1,
               score
        FROM folds{i}
    )""")
        prev = f"params{i}"
    layers_sql = ",".join(layers)

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
    cells AS (
        SELECT cnt AS v, CAST(count(*) AS BIGINT) AS c
        FROM grid GROUP BY cnt
    ),
    nn AS (SELECT CAST(sum(c) AS BIGINT) AS n,
                  CAST(sum(c) AS DOUBLE) AS nf FROM cells),
    mom AS (
        SELECT CAST(sum(CAST(v AS HUGEINT) * c) AS HUGEINT)
                   AS sv,
               CAST(sum(CAST(v AS HUGEINT) * v * c)
                    AS HUGEINT) AS svv
        FROM cells
    ),
    q25 AS (
        SELECT min(v) AS m FROM (
            SELECT v, sum(c) OVER (ORDER BY v
                ROWS UNBOUNDED PRECEDING) AS cum
            FROM cells), nn
        WHERE cum >= (nn.n + 3) // 4
    ),
    q75 AS (
        SELECT min(v) AS m FROM (
            SELECT v, sum(c) OVER (ORDER BY v
                ROWS UNBOUNDED PRECEDING) AS cum
            FROM cells), nn
        WHERE cum >= (3 * nn.n + 3) // 4
    ),
    params0 AS (
        SELECT CAST(q25.m AS DOUBLE) AS m1,
               CAST(q75.m AS DOUBLE) AS m2,
               (CAST(mom.svv AS DOUBLE)
                - (CAST(mom.sv AS DOUBLE)
                   * CAST(mom.sv AS DOUBLE)) / nn.nf) / nn.nf
                   AS s1,
               (CAST(mom.svv AS DOUBLE)
                - (CAST(mom.sv AS DOUBLE)
                   * CAST(mom.sv AS DOUBLE)) / nn.nf) / nn.nf
                   AS s2,
               0.5e0 AS p1
        FROM q25 CROSS JOIN q75 CROSS JOIN mom CROSS JOIN nn
    ),{layers_sql}
    SELECT (SELECT n FROM nn) AS n_hours,
           m1, m2, s1 AS var1, s2 AS var2, p1, score
    FROM params{iters}
    """
    return q, sql


# ------------------------------------------------ events_user_beta_binomial
def _beta_binomial_query(min_n: int = BB_MIN_N):
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "uid": pa.array([], type=pa.int64()),
                "n": pa.array([], type=pa.int64()),
                "k": pa.array([], type=pa.int64()),
            })
            if "ts" not in t.column_names or t.num_rows == 0:
                return empty
            uid = t.column("user_id").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            et = np.asarray(t.column("event_type").to_pylist())
            err = (et == "error").astype(np.int64)
            uu, inv = np.unique(uid, return_inverse=True)
            n = np.bincount(inv, minlength=uu.size)
            k = np.bincount(inv[err == 1], minlength=uu.size)
            return pa.table({
                "uid": pa.array(uu.astype(np.int64)),
                "n": pa.array(n.astype(np.int64)),
                "k": pa.array(k.astype(np.int64)),
            })

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by("uid").aggregate(
                [("n", "sum"), ("k", "sum")])
            return pa.table({
                "uid": g.column("uid").cast(pa.int64()),
                "n": g.column("n_sum").cast(pa.int64()),
                "k": g.column("k_sum").cast(pa.int64()),
            })

        refs = list(
            read_cols(sf_dir, "events", ["user_id", "ts", "event_type"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        u = tree_reduce_tables(refs, merge).to_pandas()
        u = u[u["n"] >= min_n].sort_values("uid").reset_index(
            drop=True)
        nu = len(u)
        uf = float(nu)

        pbar = 0.0
        for _, r in u.iterrows():
            pbar = pbar + float(int(r["k"])) \
                / float(int(r["n"]))
        pbar = pbar / uf
        vp = 0.0
        for _, r in u.iterrows():
            d = float(int(r["k"])) / float(int(r["n"])) - pbar
            vp = vp + d * d
        vp = vp / (uf - 1.0)
        common = pbar * (1.0 - pbar) / vp - 1.0
        alpha = pbar * common
        beta = (1.0 - pbar) * common

        rate = u["k"].to_numpy(np.int64).astype(np.float64) \
            / u["n"].to_numpy(np.int64).astype(np.float64)
        order = np.lexsort((u["uid"].to_numpy(np.int64),
                            -rate))
        top = order[0]
        t_uid = int(u["uid"].iloc[top])
        t_k = int(u["k"].iloc[top])
        t_n = int(u["n"].iloc[top])
        p_raw = float(t_k) / float(t_n)
        p_shrunk = (float(t_k) + alpha) \
            / (float(t_n) + alpha + beta)
        return pa.table({
            "n_users": pa.array([nu], type=pa.int64()),
            "p_bar": pa.array([pbar], type=pa.float64()),
            "var_p": pa.array([vp], type=pa.float64()),
            "alpha": pa.array([alpha], type=pa.float64()),
            "beta": pa.array([beta], type=pa.float64()),
            "top_uid": pa.array([t_uid], type=pa.int64()),
            "p_raw": pa.array([p_raw], type=pa.float64()),
            "p_shrunk": pa.array([p_shrunk],
                                 type=pa.float64()),
        })

    sql = f"""
    WITH u AS (
        SELECT user_id AS uid,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CASE WHEN event_type = 'error'
                        THEN 1 ELSE 0 END) AS BIGINT) AS k
        FROM events GROUP BY user_id
        HAVING count(*) >= {min_n}
    ),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS nu,
                  CAST(count(*) AS DOUBLE) AS uf FROM u),
    pb AS (
        SELECT list_reduce(list_prepend(0.0e0,
                   list(CAST(k AS DOUBLE) / CAST(n AS DOUBLE)
                        ORDER BY uid)), (x, y) -> x + y)
                   / nn.uf AS pbar
        FROM u CROSS JOIN nn GROUP BY nn.uf
    ),
    vp AS (
        SELECT list_reduce(list_prepend(0.0e0,
                   list((CAST(k AS DOUBLE) / CAST(n AS DOUBLE)
                         - pb.pbar)
                        * (CAST(k AS DOUBLE)
                           / CAST(n AS DOUBLE) - pb.pbar)
                        ORDER BY uid)), (x, y) -> x + y)
                   / (nn.uf - 1.0e0) AS vp
        FROM u CROSS JOIN pb CROSS JOIN nn
        GROUP BY pb.pbar, nn.uf
    ),
    ab AS (
        SELECT pb.pbar, vp.vp,
               pb.pbar * (pb.pbar * (1.0e0 - pb.pbar)
                          / vp.vp - 1.0e0) AS alpha,
               (1.0e0 - pb.pbar)
                   * (pb.pbar * (1.0e0 - pb.pbar)
                      / vp.vp - 1.0e0) AS beta
        FROM pb CROSS JOIN vp
    ),
    top AS (
        SELECT uid, k, n
        FROM u
        ORDER BY CAST(k AS DOUBLE) / CAST(n AS DOUBLE) DESC,
                 uid ASC
        LIMIT 1
    )
    SELECT nn.nu AS n_users,
           ab.pbar AS p_bar,
           ab.vp AS var_p,
           ab.alpha AS alpha,
           ab.beta AS beta,
           top.uid AS top_uid,
           CAST(top.k AS DOUBLE) / CAST(top.n AS DOUBLE)
               AS p_raw,
           (CAST(top.k AS DOUBLE) + ab.alpha)
               / (CAST(top.n AS DOUBLE) + ab.alpha + ab.beta)
               AS p_shrunk
    FROM nn CROSS JOIN ab CROSS JOIN top
    """
    return q, sql


def build_wave144_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("events_gmm_em3",) + _gmm_query()))
    add(*(("events_user_beta_binomial",)
          + _beta_binomial_query()))
    return queries, oracles
