"""Wave-75 queries: hour-of-day ANOVA, return-rate SES on the
monthly lineitem tier, and Grubbs max-outlier statistic.

- events_hod_anova: one-way ANOVA F of the dense hourly counts
  grouped by hour-of-day (k = 24) — the significance test behind
  "is there daily seasonality" on the rollup tier (complements the
  descriptive events_dow_hod_profile). Integer (n, sum, sumsq)
  partials per hod cell; the wave-60 source-ordered LIST fold with
  hod as the fold key.
- lineitem_returnrate_ses: cross-domain composition — the monthly
  return-flag rate series (returned lineitems / all lineitems per
  shipdate month, exact integer counts) smoothed with fixed-alpha
  SES; h=1 forecast plus the final level per month count. The SES
  fold over the bounded month series is the engine's ses kernel
  recursion; DuckDB replays it with list_reduce (the proven
  forecast_ses_w8 fold shape).
- doc_grubbs_max_z: Grubbs' max-outlier statistic per doc: G =
  max|y - mean| / s. With z_t = n*y_t - S the max deviation is
  INTEGER; G = maxz / sqrt(n * (n*SS - S*S) / (n-1)) is one scalar
  expression of exact int64s (the formal test behind the
  doc_sigma_outliers screen).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .queries import SQL_TOK, _cast, _num_read_blocks, corpus_ds
from ._scaffold import read_cols

SES_ALPHA = 0.3


# ----------------------------------------------------------- events_hod_anova
def _hod_anova_query():
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
        dense = np.zeros(span, dtype=np.int64)
        dense[a["hour"].to_numpy(np.int64) - h0] = (
            a["cnt"].to_numpy(np.int64))
        hod = (np.arange(span, dtype=np.int64) + h0) % 24
        rows = []
        for h in range(24):
            y = dense[hod == h]
            rows.append((h, int(y.size), int(y.sum()),
                         int((y * y).sum())))
        k = 24
        ssb_acc = ssw_acc = gn = gs = 0.0
        for _h, n, s, ss in rows:
            nf, sf, ssf = float(n), float(s), float(ss)
            cg = sf * sf / nf
            ssb_acc = ssb_acc + cg
            ssw_acc = ssw_acc + (ssf - cg)
            gn = gn + nf
            gs = gs + sf
        ssb = ssb_acc - gs * gs / gn
        ssw = ssw_acc
        f_stat = (ssb / float(k - 1)) / (ssw / (gn - float(k)))
        return pa.table({
            "hod": pa.array([r[0] for r in rows], type=pa.int64()),
            "n": pa.array([r[1] for r in rows], type=pa.int64()),
            "sum_cnt": pa.array([r[2] for r in rows],
                                type=pa.int64()),
            "sumsq_cnt": pa.array([r[3] for r in rows],
                                  type=pa.int64()),
            "f_stat": pa.array(np.full(k, f_stat),
                               type=pa.float64()),
        })

    sql = """
    WITH e AS (
        SELECT epoch_us(ts) // 3600000000 AS hour FROM events
    ),
    bounds AS (SELECT min(hour) AS h0, max(hour) AS h1 FROM e),
    cnts AS (
        SELECT hour, CAST(count(*) AS BIGINT) AS c
        FROM e GROUP BY hour
    ),
    dense AS (
        SELECT gs.hour, gs.hour % 24 AS hod,
               CAST(COALESCE(c.c, 0) AS BIGINT) AS x
        FROM (SELECT unnest(generate_series(
                  (SELECT h0 FROM bounds),
                  (SELECT h1 FROM bounds))) AS hour) gs
        LEFT JOIN cnts c ON c.hour = gs.hour
    ),
    g AS (
        SELECT hod,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x) AS BIGINT) AS s,
               CAST(sum(x * x) AS BIGINT) AS ss
        FROM dense GROUP BY hod
    ),
    fold AS (
        SELECT list_reduce(
            list_prepend(
                [0.0e0, 0.0e0, 0.0e0, 0.0e0],
                list([CAST(n AS DOUBLE), CAST(s AS DOUBLE),
                      CAST(ss AS DOUBLE)] ORDER BY hod)),
            (acc, e) -> [
                acc[1] + e[2] * e[2] / e[1],
                acc[2] + (e[3] - e[2] * e[2] / e[1]),
                acc[3] + e[1],
                acc[4] + e[2]]) AS f,
            CAST(count(*) AS BIGINT) AS k
        FROM g
    )
    SELECT g.hod, g.n,
           g.s AS sum_cnt,
           g.ss AS sumsq_cnt,
           ((fold.f[1] - fold.f[4] * fold.f[4] / fold.f[3])
                / CAST(fold.k - 1 AS DOUBLE))
           / (fold.f[2] / (fold.f[3] - CAST(fold.k AS DOUBLE)))
               AS f_stat
    FROM g CROSS JOIN fold
    """
    return q, sql


# ----------------------------------------------------- lineitem_returnrate_ses
def _returnrate_ses_query(alpha: float = SES_ALPHA):
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            if "l_shipdate" not in t.column_names or t.num_rows == 0:
                return pa.table({
                    "month": pa.array([], type=pa.int64()),
                    "n": pa.array([], type=pa.int64()),
                    "ret": pa.array([], type=pa.int64()),
                })
            ship = t.column("l_shipdate").cast(
                pa.int64()).to_numpy(zero_copy_only=False)
            month = (ship.astype("datetime64[us]")
                     .astype("datetime64[M]").astype(np.int64))
            rf = np.asarray(
                [f == "R"
                 for f in t.column("l_returnflag").to_pylist()],
                dtype=np.int64)
            uk, inv = np.unique(month, return_inverse=True)
            return pa.table({
                "month": pa.array(uk),
                "n": pa.array(np.bincount(
                    inv, minlength=uk.size).astype(np.int64)),
                "ret": pa.array(np.bincount(
                    inv, weights=rf,
                    minlength=uk.size).astype(np.int64)),
            })

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by("month").aggregate(
                [("n", "sum"), ("ret", "sum")])
            return pa.table({
                "month": g.column("month").cast(pa.int64()),
                "n": g.column("n_sum").cast(pa.int64()),
                "ret": g.column("ret_sum").cast(pa.int64()),
            })

        refs = list(
            read_cols(sf_dir, "lineitem", ["l_shipdate", "l_returnflag"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        a = tree_reduce_tables(refs, merge).to_pandas()
        a = a.sort_values("month").reset_index(drop=True)
        rate = (a["ret"].to_numpy(np.int64).astype(np.float64)
                / a["n"].to_numpy(np.int64).astype(np.float64))
        level = rate[0]
        for v in rate[1:]:
            level = alpha * v + (1.0 - alpha) * level
        return pa.table({
            "n_months": pa.array([len(a)], type=pa.int64()),
            "last_rate": pa.array([float(rate[-1])],
                                  type=pa.float64()),
            "ses_level": pa.array([level], type=pa.float64()),
        })

    a = f"{alpha}e0"
    sql = f"""
    WITH m AS (
        SELECT date_trunc('month', l_shipdate) AS month,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CASE WHEN l_returnflag = 'R'
                        THEN 1 ELSE 0 END) AS BIGINT) AS ret
        FROM lineitem GROUP BY month
    ),
    l AS (
        SELECT list(CAST(ret AS DOUBLE) / CAST(n AS DOUBLE)
                    ORDER BY month) AS ms,
               CAST(count(*) AS BIGINT) AS n_months
        FROM m
    )
    SELECT n_months,
           ms[CAST(n_months AS INTEGER)] AS last_rate,
           list_reduce(ms,
               (acc, x) -> {a} * x + (1.0e0 - {a}) * acc)
               AS ses_level
    FROM l
    """
    return q, sql


# --------------------------------------------------------- doc_grubbs_max_z
def _grubbs_query():
    def q(sf_dir: str):
        def grubbs(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "doc_id": pa.array([], type=pa.string()),
                "n_tok": pa.array([], type=pa.int64()),
                "max_dev": pa.array([], type=pa.int64()),
                "g_stat": pa.array([], type=pa.float64()),
            })
            if "tokens" not in t.column_names or t.num_rows == 0:
                return empty
            toks = t.column("tokens").combine_chunks()
            flat = toks.flatten().to_numpy(
                zero_copy_only=False).astype(np.int64)
            offs = toks.offsets.to_numpy(
                zero_copy_only=False).astype(np.int64)
            offs = offs - offs[0]
            lens = np.diff(offs)
            keep = lens >= 3
            if not keep.any():
                return empty
            ids = [d for d, k in zip(
                t.column("doc_id").to_pylist(), keep) if k]
            starts = offs[:-1][keep]
            dlens = lens[keep]
            nd = len(ids)
            tot = int(dlens.sum())
            g = np.repeat(np.arange(nd), dlens)
            pos = (np.arange(tot)
                   - np.repeat(np.cumsum(dlens) - dlens, dlens))
            y = flat[starts[g] + pos]
            s = np.bincount(g, weights=y, minlength=nd).astype(
                np.int64)
            ss = np.bincount(g, weights=y * y,
                             minlength=nd).astype(np.int64)
            z = np.abs(dlens[g] * y - s[g])
            mz = np.zeros(nd, dtype=np.int64)
            np.maximum.at(mz, g, z)
            nf = dlens.astype(np.float64)
            var_num = (nf * ss.astype(np.float64)
                       - s.astype(np.float64)
                       * s.astype(np.float64))
            gs = np.zeros(nd, dtype=np.float64)
            ok = var_num > 0
            gs[ok] = (mz[ok].astype(np.float64)
                      / np.sqrt(nf[ok] * var_num[ok]
                                / (nf[ok] - 1.0)))
            return pa.table({
                "doc_id": pa.array(ids, type=pa.string()),
                "n_tok": pa.array(dlens, type=pa.int64()),
                "max_dev": pa.array(mz),
                "g_stat": pa.array(gs, type=pa.float64()),
            })

        ds = corpus_ds(sf_dir).map_batches(
            grubbs, batch_format="pyarrow")
        return _cast(ds, {
            "doc_id": pa.string(),
            "n_tok": pa.int64(),
            "max_dev": pa.int64(),
            "g_stat": pa.float64(),
        })

    sql = f"""
    WITH tok AS ({SQL_TOK}),
    st AS (
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(token) AS BIGINT) AS s,
               CAST(sum(token * token) AS BIGINT) AS ss
        FROM tok GROUP BY doc_id HAVING count(*) >= 3
    ),
    mz AS (
        SELECT t.doc_id,
               CAST(max(abs(st.n * t.token - st.s)) AS BIGINT)
                   AS max_dev
        FROM tok t JOIN st ON st.doc_id = t.doc_id
        GROUP BY t.doc_id
    )
    SELECT st.doc_id, st.n AS n_tok, mz.max_dev,
           CASE WHEN CAST(st.n AS DOUBLE) * CAST(st.ss AS DOUBLE)
                     - CAST(st.s AS DOUBLE) * CAST(st.s AS DOUBLE)
                     > 0
                THEN CAST(mz.max_dev AS DOUBLE)
                     / sqrt(CAST(st.n AS DOUBLE)
                            * (CAST(st.n AS DOUBLE)
                               * CAST(st.ss AS DOUBLE)
                               - CAST(st.s AS DOUBLE)
                                 * CAST(st.s AS DOUBLE))
                            / (CAST(st.n AS DOUBLE) - 1.0e0))
                ELSE 0.0e0 END AS g_stat
    FROM st JOIN mz ON mz.doc_id = st.doc_id
    """
    return q, sql


def build_wave75_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("events_hod_anova",) + _hod_anova_query()))
    add(*(("lineitem_returnrate_ses",) + _returnrate_ses_query()))
    add(*(("doc_grubbs_max_z",) + _grubbs_query()))
    return queries, oracles
