"""Wave-70 queries: AR(2) Yule-Walker fit, Jensen-Shannon divergence
matrix, and per-doc KS drift screen.

- events_ar2_hourly: AR(2) fit to the dense hourly count series by
  Yule-Walker. The autocovariances are spelled as float expressions
  of pure-integer sums (A_k = sum x_t x_{t+k}, prefix/suffix sums,
  n, S) so both sides compute gamma_k = A_k - m*B_k - m*C_k +
  (n-k)*m^2 identically (np.dot on int64 is exact integer math, not
  BLAS); phi1/phi2 from the 2x2 Cramer solve, plus the one-step
  forecast m + phi1*(x_{n-1}-m) + phi2*(x_{n-2}-m).
- source_jsd_matrix: pairwise Jensen-Shannon divergence between
  source unigram distributions — the symmetric companion of
  source_token_kl. Histograms are bounded (source x alphabet) and
  tree-reduce; each of the k(k-1)/2 pairs folds its union-token term
  list in ascending token order (zero-count sides contribute exactly
  their q*ln(q/m) halves).
- doc_ks_uniform: per-doc Kolmogorov-Smirnov distance between the
  doc's token distribution and the CORPUS distribution (drift/outlier
  screen over documents). The sup is attained at corpus jump points;
  the comparison is kept in integers via cross-multiplied CDFs
  (|cum_doc*N - cum_corpus*n_d|, the source_ks_matrix discipline)
  with ONE final division. The bounded corpus histogram broadcasts
  via ray.put; per-doc CDF evaluation is one searchsorted.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from .queries import SQL_TOK, _cast, _num_read_blocks, corpus_ds
from ._scaffold import read_cols


# --------------------------------------------------------- events_ar2_hourly
def _ar2_query():
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            if "ts" not in t.column_names or t.num_rows == 0:
                return pa.table({
                    "hour": pa.array([], type=pa.int64()),
                    "cnt": pa.array([], type=pa.int64()),
                })
            tus = t.column("ts").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            hour = tus // 3_600_000_000
            uk, cnt = np.unique(hour, return_counts=True)
            return pa.table({
                "hour": pa.array(uk, type=pa.int64()),
                "cnt": pa.array(cnt.astype(np.int64)),
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
        a = tree_reduce_tables(refs, merge).to_pandas()
        h0 = int(a["hour"].min())
        span = int(a["hour"].max()) - h0 + 1
        x = np.zeros(span, dtype=np.int64)
        x[a["hour"].to_numpy(np.int64) - h0] = (
            a["cnt"].to_numpy(np.int64))
        n = span
        s = int(x.sum())
        m = float(s) / float(n)

        def gamma(k: int) -> float:
            ak = float(int((x[:n - k] * x[k:]).sum()))
            bk = float(int(x[:n - k].sum()))
            ck = float(int(x[k:].sum()))
            return (ak - m * bk - m * ck
                    + float(n - k) * m * m)

        g0, g1, g2 = gamma(0), gamma(1), gamma(2)
        den = g0 * g0 - g1 * g1
        phi1 = (g1 * g0 - g1 * g2) / den
        phi2 = (g0 * g2 - g1 * g1) / den
        yhat = (m + phi1 * (float(int(x[n - 1])) - m)
                + phi2 * (float(int(x[n - 2])) - m))
        return pa.table({
            "n_hours": pa.array([n], type=pa.int64()),
            "phi1": pa.array([phi1], type=pa.float64()),
            "phi2": pa.array([phi2], type=pa.float64()),
            "yhat1": pa.array([yhat], type=pa.float64()),
        })

    mexpr = ("((SELECT CAST(sum(x) AS DOUBLE) FROM dense)"
             " / (SELECT CAST(count(*) AS DOUBLE) FROM dense))")

    def gsql(k: int) -> str:
        # every m occurrence is the parenthesized (S/N) so the
        # float op order matches the engine's precomputed m exactly
        return f"""(
            (SELECT CAST(sum(a.x * b.x) AS DOUBLE)
             FROM dense a JOIN dense b ON b.hour = a.hour + {k})
            - {mexpr}
              * (SELECT CAST(sum(x) AS DOUBLE) FROM dense
                 WHERE hour <= (SELECT max(hour) FROM dense) - {k})
            - {mexpr}
              * (SELECT CAST(sum(x) AS DOUBLE) FROM dense
                 WHERE hour >= (SELECT min(hour) FROM dense) + {k})
            + (SELECT CAST(count(*) - {k} AS DOUBLE) FROM dense)
              * {mexpr} * {mexpr}
        )"""

    sql = f"""
    WITH e AS (
        SELECT epoch_us(ts) // 3600000000 AS hour FROM events
    ),
    bounds AS (SELECT min(hour) AS h0, max(hour) AS h1 FROM e),
    cnts AS (
        SELECT hour, CAST(count(*) AS BIGINT) AS c
        FROM e GROUP BY hour
    ),
    dense AS (
        SELECT gs.hour, CAST(COALESCE(c.c, 0) AS BIGINT) AS x
        FROM (SELECT unnest(generate_series(
                  (SELECT h0 FROM bounds),
                  (SELECT h1 FROM bounds))) AS hour) gs
        LEFT JOIN cnts c ON c.hour = gs.hour
    ),
    g AS (
        SELECT CAST((SELECT count(*) FROM dense) AS BIGINT)
                   AS n_hours,
               (SELECT CAST(sum(x) AS DOUBLE) FROM dense)
                   / (SELECT CAST(count(*) AS DOUBLE) FROM dense)
                   AS m,
               {gsql(0)} AS g0,
               {gsql(1)} AS g1,
               {gsql(2)} AS g2,
               (SELECT CAST(x AS DOUBLE) FROM dense
                ORDER BY hour DESC LIMIT 1) AS xn1,
               (SELECT CAST(x AS DOUBLE) FROM dense
                ORDER BY hour DESC LIMIT 1 OFFSET 1) AS xn2
    )
    SELECT n_hours,
           (g1 * g0 - g1 * g2) / (g0 * g0 - g1 * g1) AS phi1,
           (g0 * g2 - g1 * g1) / (g0 * g0 - g1 * g1) AS phi2,
           m + (g1 * g0 - g1 * g2) / (g0 * g0 - g1 * g1)
               * (xn1 - m)
             + (g0 * g2 - g1 * g1) / (g0 * g0 - g1 * g1)
               * (xn2 - m) AS yhat1
    FROM g
    """
    return q, sql


# ---------------------------------------------------------- source_jsd_matrix
def _jsd_matrix_query():
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
        h = tree_reduce_tables(refs, merge).to_pandas()
        h = h.sort_values(["source", "token"]).reset_index(
            drop=True)
        sources = sorted(h["source"].unique())
        hists = {}
        totals = {}
        for src, grp in h.groupby("source", sort=True):
            hists[src] = dict(zip(
                grp["token"].to_numpy(np.int64),
                grp["cnt"].to_numpy(np.int64)))
            totals[src] = int(grp["cnt"].sum())
        out = {"s1": [], "s2": [], "jsd": []}
        for i, s1 in enumerate(sources):
            for s2 in sources[i + 1:]:
                h1, h2 = hists[s1], hists[s2]
                n1 = float(totals[s1])
                n2 = float(totals[s2])
                jsd = 0.0
                for tok in sorted(set(h1) | set(h2)):
                    p = float(h1.get(tok, 0)) / n1
                    qq = float(h2.get(tok, 0)) / n2
                    mm = 0.5 * (p + qq)
                    term = 0.0
                    if p > 0:
                        term = term + 0.5 * (p * math.log(p / mm))
                    if qq > 0:
                        term = term + 0.5 * (qq * math.log(qq / mm))
                    jsd = jsd + term
                out["s1"].append(s1)
                out["s2"].append(s2)
                out["jsd"].append(jsd)
        return pa.table({
            "s1": pa.array(out["s1"], type=pa.string()),
            "s2": pa.array(out["s2"], type=pa.string()),
            "jsd": pa.array(out["jsd"], type=pa.float64()),
        })

    sql = f"""
    WITH tok AS ({SQL_TOK}),
    hist AS (
        SELECT source, token, CAST(count(*) AS BIGINT) AS c
        FROM tok GROUP BY source, token
    ),
    tot AS (
        SELECT source, CAST(sum(c) AS DOUBLE) AS n
        FROM hist GROUP BY source
    ),
    pairs AS (
        SELECT a.source AS s1, b.source AS s2
        FROM tot a JOIN tot b ON a.source < b.source
    ),
    terms AS (
        SELECT p.s1, p.s2, u.token,
               (CASE WHEN COALESCE(h1.c, 0) > 0
                     THEN 0.5e0 * ((CAST(h1.c AS DOUBLE) / t1.n)
                          * ln((CAST(h1.c AS DOUBLE) / t1.n)
                               / (0.5e0 * (CAST(COALESCE(h1.c, 0)
                                              AS DOUBLE) / t1.n
                                  + CAST(COALESCE(h2.c, 0)
                                         AS DOUBLE) / t2.n))))
                     ELSE 0.0e0 END)
               + (CASE WHEN COALESCE(h2.c, 0) > 0
                     THEN 0.5e0 * ((CAST(h2.c AS DOUBLE) / t2.n)
                          * ln((CAST(h2.c AS DOUBLE) / t2.n)
                               / (0.5e0 * (CAST(COALESCE(h1.c, 0)
                                              AS DOUBLE) / t1.n
                                  + CAST(COALESCE(h2.c, 0)
                                         AS DOUBLE) / t2.n))))
                     ELSE 0.0e0 END) AS term
        FROM pairs p
        JOIN (SELECT DISTINCT hist.source, hist.token
              FROM hist) u
          ON u.source IN (p.s1, p.s2)
        JOIN tot t1 ON t1.source = p.s1
        JOIN tot t2 ON t2.source = p.s2
        LEFT JOIN hist h1 ON h1.source = p.s1
                         AND h1.token = u.token
        LEFT JOIN hist h2 ON h2.source = p.s2
                         AND h2.token = u.token
    ),
    dedup AS (
        SELECT DISTINCT s1, s2, token, term FROM terms
    )
    SELECT s1, s2,
           list_reduce(list_prepend(0.0e0,
               list(term ORDER BY token)), (a, b) -> a + b) AS jsd
    FROM dedup GROUP BY s1, s2
    """
    return q, sql


# ------------------------------------------------------------ doc_ks_uniform
def _ks_corpus_query():
    def q(sf_dir: str):
        import ray

        from ..stages.rollup import _flat_tokens
        from ..stages.source_rollup import tree_reduce_tables

        def hist_partial(t: pa.Table) -> pa.Table:
            if "tokens" not in t.column_names or t.num_rows == 0:
                return pa.table({
                    "token": pa.array([], type=pa.int64()),
                    "cnt": pa.array([], type=pa.int64()),
                })
            values, _l = _flat_tokens(t)
            uk, cnt = np.unique(
                values.astype(np.int64), return_counts=True)
            return pa.table({
                "token": pa.array(uk),
                "cnt": pa.array(cnt.astype(np.int64)),
            })

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by("token").aggregate([("cnt", "sum")])
            return pa.table({
                "token": g.column("token").cast(pa.int64()),
                "cnt": g.column("cnt_sum").cast(pa.int64()),
            })

        refs = list(
            corpus_ds(sf_dir)
            .map_batches(hist_partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        hist = tree_reduce_tables(refs, merge).to_pandas()
        hist = hist.sort_values("token").reset_index(drop=True)
        vals = hist["token"].to_numpy(np.int64)
        ccum = np.cumsum(hist["cnt"].to_numpy(np.int64))
        big_n = int(ccum[-1])
        bref = ray.put((vals, ccum, big_n))

        class KSStage:
            def __init__(self, bref):
                self.vals, self.ccum, self.N = ray.get(bref)

            def __call__(self, t: pa.Table) -> pa.Table:
                empty = pa.table({
                    "doc_id": pa.array([], type=pa.string()),
                    "n_tok": pa.array([], type=pa.int64()),
                    "sup_num": pa.array([], type=pa.int64()),
                    "d_stat": pa.array([], type=pa.float64()),
                })
                if ("tokens" not in t.column_names
                        or t.num_rows == 0):
                    return empty
                values, lengths = _flat_tokens(t)
                lens = np.asarray(lengths, dtype=np.int64)
                ids = t.column("doc_id").to_pylist()
                nd = len(ids)
                keep = lens > 0
                sup = np.zeros(nd, dtype=np.int64)
                v64 = values.astype(np.int64)
                off = 0
                for i in range(nd):
                    seg = np.sort(v64[off: off + int(lens[i])])
                    off += int(lens[i])
                    if lens[i] == 0:
                        continue
                    # doc CDF counts at each corpus jump point
                    dcum = np.searchsorted(
                        seg, self.vals, side="right")
                    num = np.abs(dcum * self.N
                                 - self.ccum * int(lens[i]))
                    sup[i] = int(num.max())
                d = np.zeros(nd, dtype=np.float64)
                d[keep] = (sup[keep].astype(np.float64)
                           / (float(self.N)
                              * lens[keep].astype(np.float64)))
                return pa.table({
                    "doc_id": pa.array(ids, type=pa.string()),
                    "n_tok": pa.array(lens),
                    "sup_num": pa.array(sup),
                    "d_stat": pa.array(d, type=pa.float64()),
                })

        out = corpus_ds(sf_dir).map_batches(
            KSStage, batch_format="pyarrow", concurrency=2,
            fn_constructor_args=(bref,),
        )
        return _cast(out, {
            "doc_id": pa.string(),
            "n_tok": pa.int64(),
            "sup_num": pa.int64(),
            "d_stat": pa.float64(),
        })

    sql = f"""
    WITH tok AS ({SQL_TOK}),
    corp AS (
        SELECT token, CAST(count(*) AS BIGINT) AS c
        FROM tok GROUP BY token
    ),
    ccum AS (
        SELECT token,
               CAST(sum(c) OVER (ORDER BY token) AS BIGINT)
                   AS cum,
               CAST((SELECT sum(c) FROM corp) AS BIGINT) AS n
        FROM corp
    ),
    dl AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS nd
        FROM tok GROUP BY doc_id
    ),
    dcum AS (
        SELECT d.doc_id, cc.token, cc.cum, cc.n, d.nd,
               CAST(COALESCE(sum(CASE WHEN t.token <= cc.token
                             THEN 1 ELSE 0 END), 0) AS BIGINT)
                   AS dcnt
        FROM dl d
        CROSS JOIN ccum cc
        LEFT JOIN tok t ON t.doc_id = d.doc_id
        GROUP BY d.doc_id, cc.token, cc.cum, cc.n, d.nd
    ),
    sup AS (
        SELECT doc_id, nd, n,
               CAST(max(abs(dcnt * n - cum * nd)) AS BIGINT)
                   AS sup_num
        FROM dcum GROUP BY doc_id, nd, n
    )
    SELECT CAST(d.doc_id AS VARCHAR) AS doc_id,
           COALESCE(s.nd, 0) AS n_tok,
           COALESCE(s.sup_num, 0) AS sup_num,
           CASE WHEN COALESCE(s.nd, 0) > 0
                THEN CAST(s.sup_num AS DOUBLE)
                     / (CAST(s.n AS DOUBLE)
                        * CAST(s.nd AS DOUBLE))
                ELSE 0.0e0 END AS d_stat
    FROM documents d LEFT JOIN sup s
      ON s.doc_id = CAST(d.doc_id AS VARCHAR)
    """
    return q, sql


def build_wave70_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("events_ar2_hourly",) + _ar2_query()))
    add(*(("source_jsd_matrix",) + _jsd_matrix_query()))
    add(*(("doc_ks_uniform",) + _ks_corpus_query()))
    return queries, oracles
