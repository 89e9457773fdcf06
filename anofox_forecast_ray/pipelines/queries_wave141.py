"""Wave-141 queries: tail dependence, log-odds keyword extraction.

- events_tail_dependence: empirical upper-tail dependence between
  daily total and daily error counts at q = 0.5 / 0.8 / 0.9. The
  thresholds are exact order statistics (k = ceil(q n) as pure
  integer arithmetic), exceedance and joint-exceedance counts are
  integers, and lambda_U = joint / x-exceedances is one division —
  the copula-style dependence diagnostic for "do bad days cluster?".
- source_log_odds_terms: Monroe et al.'s log-odds-ratio with a
  Dirichlet prior ("fightin' words") — for each source, the top-5
  tokens whose usage is most over-represented vs the REST of the
  corpus, z = delta / sqrt(1/(y_s+a) + 1/(y_r+a)) with uniform
  prior a = 0.5. Everything comes from the bounded (source, token)
  count matrix; the only transcendentals are two scalar lns per
  cell, and the per-source top-k breaks exact ties on the integer
  token.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from .queries import SQL_TOK, _num_read_blocks, corpus_ds
from ._scaffold import read_cols

US_PER_HOUR = 3_600_000_000
LO_K = 5
LO_A = 0.5
TD_QS = [(1, 2), (4, 5), (9, 10)]  # q as exact fractions


# -------------------------------------------------- events_tail_dependence
def _tail_dep_query():
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
        day = h["hour"].to_numpy(np.int64) // 24
        g = h.groupby(day).agg(x=("tot", "sum"),
                               yv=("err", "sum"))
        x = g["x"].to_numpy(np.int64)
        yv = g["yv"].to_numpy(np.int64)
        n = len(x)
        xs = np.sort(x)
        ys = np.sort(yv)

        out = {"q_num": [], "q_den": [], "thresh_x": [],
               "thresh_y": [], "n_exc_x": [], "n_exc_y": [],
               "n_joint": [], "lambda_u": []}
        for num, den in TD_QS:
            k = (n * num + den - 1) // den  # ceil(q*n)
            tx = int(xs[k - 1])
            ty = int(ys[k - 1])
            ex = int((x > tx).sum())
            ey = int((yv > ty).sum())
            joint = int(((x > tx) & (yv > ty)).sum())
            lam = float(joint) / float(ex) if ex > 0 else 0.0
            out["q_num"].append(num)
            out["q_den"].append(den)
            out["thresh_x"].append(tx)
            out["thresh_y"].append(ty)
            out["n_exc_x"].append(ex)
            out["n_exc_y"].append(ey)
            out["n_joint"].append(joint)
            out["lambda_u"].append(lam)
        return pa.table({
            "q_num": pa.array(out["q_num"], type=pa.int64()),
            "q_den": pa.array(out["q_den"], type=pa.int64()),
            "thresh_x": pa.array(out["thresh_x"],
                                 type=pa.int64()),
            "thresh_y": pa.array(out["thresh_y"],
                                 type=pa.int64()),
            "n_exc_x": pa.array(out["n_exc_x"],
                                type=pa.int64()),
            "n_exc_y": pa.array(out["n_exc_y"],
                                type=pa.int64()),
            "n_joint": pa.array(out["n_joint"],
                                type=pa.int64()),
            "lambda_u": pa.array(out["lambda_u"],
                                 type=pa.float64()),
        })

    qs_rows = ", ".join(f"({num}, {den})"
                        for num, den in TD_QS)
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
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM days),
    qs AS (SELECT * FROM (VALUES {qs_rows})
           AS t(q_num, q_den)),
    ks AS (
        SELECT q_num, q_den,
               (nn.n * q_num + q_den - 1) // q_den AS k
        FROM qs CROSS JOIN nn
    ),
    rx AS (SELECT x, row_number() OVER (ORDER BY x) AS r
           FROM days),
    ry AS (SELECT y, row_number() OVER (ORDER BY y) AS r
           FROM days),
    th AS (
        SELECT ks.q_num, ks.q_den,
               (SELECT x FROM rx WHERE r = ks.k) AS tx,
               (SELECT y FROM ry WHERE r = ks.k) AS ty
        FROM ks
    )
    SELECT CAST(th.q_num AS BIGINT) AS q_num,
           CAST(th.q_den AS BIGINT) AS q_den,
           th.tx AS thresh_x,
           th.ty AS thresh_y,
           (SELECT CAST(count(*) AS BIGINT) FROM days
            WHERE x > th.tx) AS n_exc_x,
           (SELECT CAST(count(*) AS BIGINT) FROM days
            WHERE y > th.ty) AS n_exc_y,
           (SELECT CAST(count(*) AS BIGINT) FROM days
            WHERE x > th.tx AND y > th.ty) AS n_joint,
           CASE WHEN (SELECT count(*) FROM days
                      WHERE x > th.tx) > 0
                THEN CAST((SELECT count(*) FROM days
                           WHERE x > th.tx AND y > th.ty)
                          AS DOUBLE)
                     / CAST((SELECT count(*) FROM days
                             WHERE x > th.tx) AS DOUBLE)
                ELSE 0.0e0 END AS lambda_u
    FROM th
    ORDER BY th.q_den, th.q_num
    """
    return q, sql


# --------------------------------------------------- source_log_odds_terms
def _log_odds_query(k: int = LO_K, a: float = LO_A):
    def q(sf_dir: str):
        from ..stages.rollup import _flat_tokens
        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "source": pa.array([], type=pa.string()),
                "token": pa.array([], type=pa.int64()),
                "cnt": pa.array([], type=pa.int64()),
            })
            if "tokens" not in t.column_names or t.num_rows == 0:
                return empty
            values, lengths = _flat_tokens(t)
            if values.size == 0:
                return empty
            src = np.asarray(t.column("source").to_pylist())
            shift = np.int64(1 << 21)
            names, inv = np.unique(src, return_inverse=True)
            keys = (np.repeat(inv, lengths).astype(np.int64)
                    * shift + values.astype(np.int64))
            uk, cnt = np.unique(keys, return_counts=True)
            return pa.table({
                "source": pa.array(names[uk // shift],
                                   type=pa.string()),
                "token": pa.array(uk % shift, type=pa.int64()),
                "cnt": pa.array(cnt.astype(np.int64)),
            })

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by(["source", "token"]).aggregate(
                [("cnt", "sum")])
            return pa.table({
                "source": g.column("source"),
                "token": g.column("token").cast(pa.int64()),
                "cnt": g.column("cnt_sum").cast(pa.int64()),
            })

        refs = list(
            corpus_ds(sf_dir)
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        m = tree_reduce_tables(refs, merge).to_pandas()
        tok_tot = m.groupby("token")["cnt"].sum()
        src_tot = m.groupby("source")["cnt"].sum()
        n_all = int(m["cnt"].sum())

        out = {"source": [], "token": [], "y_s": [],
               "y_rest": [], "z": []}
        for src, grp in m.groupby("source", sort=True):
            n_s = int(src_tot.loc[src])
            n_r = n_all - n_s
            scored = []
            for tok, y_s in zip(grp["token"], grp["cnt"]):
                y_s = int(y_s)
                y_r = int(tok_tot.loc[int(tok)]) - y_s
                d = (math.log((float(y_s) + a)
                              / (float(n_s - y_s) + a))
                     - math.log((float(y_r) + a)
                                / (float(n_r - y_r) + a)))
                var = 1.0 / (float(y_s) + a) \
                    + 1.0 / (float(y_r) + a)
                z = d / math.sqrt(var)
                scored.append((z, int(tok), y_s, y_r))
            scored.sort(key=lambda r: (-r[0], r[1]))
            for z, tok, y_s, y_r in scored[:k]:
                out["source"].append(src)
                out["token"].append(tok)
                out["y_s"].append(y_s)
                out["y_rest"].append(y_r)
                out["z"].append(z)
        return pa.table({
            "source": pa.array(out["source"],
                               type=pa.string()),
            "token": pa.array(out["token"], type=pa.int64()),
            "y_s": pa.array(out["y_s"], type=pa.int64()),
            "y_rest": pa.array(out["y_rest"],
                               type=pa.int64()),
            "z": pa.array(out["z"], type=pa.float64()),
        })

    sql = f"""
    WITH tok AS ({SQL_TOK}),
    tc AS (
        SELECT source, token, CAST(count(*) AS BIGINT) AS y_s
        FROM tok GROUP BY source, token
    ),
    tt AS (
        SELECT token, CAST(sum(y_s) AS BIGINT) AS y_all
        FROM tc GROUP BY token
    ),
    st AS (
        SELECT source, CAST(sum(y_s) AS BIGINT) AS n_s
        FROM tc GROUP BY source
    ),
    na AS (SELECT CAST(sum(y_s) AS BIGINT) AS n_all FROM tc),
    scored AS (
        SELECT tc.source,
               CAST(tc.token AS BIGINT) AS token,
               tc.y_s,
               tt.y_all - tc.y_s AS y_rest,
               (ln((CAST(tc.y_s AS DOUBLE) + {a!r})
                   / (CAST(st.n_s - tc.y_s AS DOUBLE)
                      + {a!r}))
                - ln((CAST(tt.y_all - tc.y_s AS DOUBLE)
                      + {a!r})
                     / (CAST((na.n_all - st.n_s)
                             - (tt.y_all - tc.y_s)
                             AS DOUBLE) + {a!r})))
               / sqrt(1.0e0 / (CAST(tc.y_s AS DOUBLE)
                               + {a!r})
                      + 1.0e0
                        / (CAST(tt.y_all - tc.y_s AS DOUBLE)
                           + {a!r})) AS z
        FROM tc
        JOIN tt ON tt.token = tc.token
        JOIN st ON st.source = tc.source
        CROSS JOIN na
    ),
    rk AS (
        SELECT *, row_number() OVER (
                   PARTITION BY source
                   ORDER BY z DESC, token ASC) AS rn
        FROM scored
    )
    SELECT source, token, y_s, y_rest, z
    FROM rk WHERE rn <= {k}
    ORDER BY source, token
    """
    return q, sql


def build_wave141_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("events_tail_dependence",) + _tail_dep_query()))
    add(*(("source_log_odds_terms",) + _log_odds_query()))
    return queries, oracles
