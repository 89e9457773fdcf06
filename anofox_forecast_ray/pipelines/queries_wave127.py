"""Wave-127 queries: TF-IDF ranking, Newey-West HAC trend test.

- source_tfidf_topk: smooth-idf TF-IDF (sklearn convention
  idf = ln((1+S)/(1+df)) + 1) over the bounded (source, token)
  codepoint matrix, top-5 terms per source. Everything that leaves
  a task is a bounded count partial (sources x vocab); df is a
  column-count over the merged matrix, the score is one scalar ln +
  one multiply per cell on both sides, and the per-source top-k
  breaks float ties deterministically (score desc, token asc) —
  identical doubles order identically, exact ties fall to the
  integer token.
- events_newey_west: OLS trend of hourly event counts with
  heteroskedasticity-and-autocorrelation-consistent (Newey-West,
  Bartlett kernel L=6) slope inference next to the iid t-stat.
  Slope/intercept come from integer moments (HUGEINT in the oracle)
  with ONE division each; residual products fold in strict t order
  (Python left folds == DuckDB list_reduce); the lag-j
  autocovariances join on t = t + j and fold per lag; the kernel
  combination folds lags in ascending order. Verified independently
  against a numpy polyfit + definitional NW recompute.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from .queries import SQL_TOK, _num_read_blocks, corpus_ds
from ._scaffold import read_cols

TFIDF_K = 5
NW_LAGS = 6
US_PER_HOUR = 3_600_000_000


# ---------------------------------------------------------- source_tfidf_topk
def _tfidf_query(k: int = TFIDF_K):
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
        a = tree_reduce_tables(refs, merge).to_pandas()
        n_sources = int(a["source"].nunique())
        df = a.groupby("token")["source"].nunique()

        out = {"source": [], "token": [], "tf": [], "df": [],
               "tfidf": []}
        for src, grp in a.groupby("source", sort=True):
            scored = []
            for tok, tf in zip(grp["token"], grp["cnt"]):
                d = int(df.loc[int(tok)])
                idf = math.log(
                    (1.0 + float(n_sources)) / (1.0 + float(d))
                ) + 1.0
                scored.append((float(tf) * idf, int(tok),
                               int(tf), d))
            scored.sort(key=lambda r: (-r[0], r[1]))
            for s, tok, tf, d in scored[:k]:
                out["source"].append(src)
                out["token"].append(tok)
                out["tf"].append(tf)
                out["df"].append(d)
                out["tfidf"].append(s)
        return pa.table({
            "source": pa.array(out["source"], type=pa.string()),
            "token": pa.array(out["token"], type=pa.int64()),
            "tf": pa.array(out["tf"], type=pa.int64()),
            "df": pa.array(out["df"], type=pa.int64()),
            "tfidf": pa.array(out["tfidf"], type=pa.float64()),
        })

    sql = f"""
    WITH tok AS ({SQL_TOK}),
    tc AS (
        SELECT source, token, CAST(count(*) AS BIGINT) AS tf
        FROM tok GROUP BY source, token
    ),
    dfc AS (
        SELECT token,
               CAST(count(DISTINCT source) AS BIGINT) AS df
        FROM tc GROUP BY token
    ),
    s AS (SELECT CAST(count(DISTINCT source) AS BIGINT) AS ns
          FROM tc),
    scored AS (
        SELECT tc.source, tc.token, tc.tf, dfc.df,
               CAST(tc.tf AS DOUBLE)
               * (ln((1.0e0 + CAST(s.ns AS DOUBLE))
                     / (1.0e0 + CAST(dfc.df AS DOUBLE)))
                  + 1.0e0) AS tfidf
        FROM tc JOIN dfc ON dfc.token = tc.token CROSS JOIN s
    ),
    rk AS (
        SELECT *, row_number() OVER (
                   PARTITION BY source
                   ORDER BY tfidf DESC, token ASC) AS rn
        FROM scored
    )
    SELECT source, CAST(token AS BIGINT) AS token, tf, df, tfidf
    FROM rk WHERE rn <= {k}
    ORDER BY source, token
    """
    return q, sql


# ---------------------------------------------------------- events_newey_west
def _newey_west_query(lags: int = NW_LAGS):
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
        y = [int(v) for v in h["cnt"]]
        n = len(y)

        st = stt = sy = sty = 0
        for t_i in range(n):
            st += t_i
            stt += t_i * t_i
            sy += y[t_i]
            sty += t_i * y[t_i]
        denom = n * stt - st * st
        b = float(n * sty - st * sy) / float(denom)
        a = float(sy * stt - st * sty) / float(denom)
        mt = float(st) / float(n)
        sxxc = float(denom) / float(n)

        e = [(float(y[t_i]) - a) - (b * float(t_i))
             for t_i in range(n)]
        u = [(float(t_i) - mt) * e[t_i] for t_i in range(n)]

        sse = 0.0
        for t_i in range(n):
            sse = sse + e[t_i] * e[t_i]
        gam = []
        for j in range(lags + 1):
            g = 0.0
            for t_i in range(n - j):
                g = g + u[t_i] * u[t_i + j]
            gam.append(g)
        acc = 0.0
        for j in range(1, lags + 1):
            acc = acc + (1.0 - float(j) / float(lags + 1)) \
                * gam[j]
        nw_s = gam[0] + 2.0 * acc
        var_nw = nw_s / (sxxc * sxxc)
        t_nw = b / math.sqrt(var_nw)
        var_iid = (sse / float(n - 2)) / sxxc
        t_iid = b / math.sqrt(var_iid)

        return pa.table({
            "n_hours": pa.array([n], type=pa.int64()),
            "slope": pa.array([b], type=pa.float64()),
            "intercept": pa.array([a], type=pa.float64()),
            "sse": pa.array([sse], type=pa.float64()),
            "gamma0": pa.array([gam[0]], type=pa.float64()),
            "nw_s": pa.array([nw_s], type=pa.float64()),
            "t_iid": pa.array([t_iid], type=pa.float64()),
            "t_nw": pa.array([t_nw], type=pa.float64()),
        })

    sql = f"""
    WITH hc AS (
        SELECT epoch_us(ts) // {US_PER_HOUR} AS hour,
               CAST(count(*) AS BIGINT) AS cnt
        FROM events GROUP BY 1
    ),
    idx AS (
        SELECT CAST(row_number() OVER (ORDER BY hour) - 1
                    AS BIGINT) AS t,
               cnt
        FROM hc
    ),
    mom AS (
        SELECT CAST(count(*) AS HUGEINT) AS n,
               CAST(sum(CAST(t AS HUGEINT)) AS HUGEINT) AS st,
               CAST(sum(CAST(t AS HUGEINT) * t) AS HUGEINT)
                   AS stt,
               CAST(sum(CAST(cnt AS HUGEINT)) AS HUGEINT) AS sy,
               CAST(sum(CAST(t AS HUGEINT) * cnt) AS HUGEINT)
                   AS sty
        FROM idx
    ),
    ab AS (
        SELECT CAST(n AS BIGINT) AS n,
               CAST(n * sty - st * sy AS DOUBLE)
                   / CAST(n * stt - st * st AS DOUBLE) AS b,
               CAST(sy * stt - st * sty AS DOUBLE)
                   / CAST(n * stt - st * st AS DOUBLE) AS a,
               CAST(st AS DOUBLE) / CAST(n AS DOUBLE) AS mt,
               CAST(n * stt - st * st AS DOUBLE)
                   / CAST(n AS DOUBLE) AS sxxc
        FROM mom
    ),
    res AS (
        SELECT idx.t,
               (CAST(idx.cnt AS DOUBLE) - ab.a)
                   - (ab.b * CAST(idx.t AS DOUBLE)) AS e,
               (CAST(idx.t AS DOUBLE) - ab.mt)
                   * ((CAST(idx.cnt AS DOUBLE) - ab.a)
                      - (ab.b * CAST(idx.t AS DOUBLE))) AS u
        FROM idx CROSS JOIN ab
    ),
    ssef AS (
        SELECT list_reduce(list_prepend(0.0e0,
                   list(e * e ORDER BY t)),
                   (x, y) -> x + y) AS sse
        FROM res
    ),
    lagp AS (
        SELECT j.j, a.t, a.u * b.u AS p
        FROM (SELECT unnest(generate_series(0, {lags})) AS j) j
        JOIN res a ON TRUE
        JOIN res b ON b.t = a.t + j.j
    ),
    gam AS (
        SELECT j,
               list_reduce(list_prepend(0.0e0,
                   list(p ORDER BY t)),
                   (x, y) -> x + y) AS g
        FROM lagp GROUP BY j
    ),
    nwf AS (
        SELECT (SELECT g FROM gam WHERE j = 0)
               + 2.0e0 * list_reduce(list_prepend(0.0e0,
                     list((1.0e0 - CAST(j AS DOUBLE)
                           / {float(lags + 1)}) * g
                          ORDER BY j)),
                     (x, y) -> x + y) AS nw_s,
               (SELECT g FROM gam WHERE j = 0) AS gamma0
        FROM gam WHERE j >= 1
    )
    SELECT ab.n AS n_hours,
           ab.b AS slope,
           ab.a AS intercept,
           ssef.sse AS sse,
           nwf.gamma0 AS gamma0,
           nwf.nw_s AS nw_s,
           ab.b / sqrt((ssef.sse / CAST(ab.n - 2 AS DOUBLE))
                       / ab.sxxc) AS t_iid,
           ab.b / sqrt(nwf.nw_s / (ab.sxxc * ab.sxxc)) AS t_nw
    FROM ab CROSS JOIN ssef CROSS JOIN nwf
    """
    return q, sql


def build_wave127_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("source_tfidf_topk",) + _tfidf_query()))
    add(*(("events_newey_west",) + _newey_west_query()))
    return queries, oracles
