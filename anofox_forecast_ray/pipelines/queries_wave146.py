"""Wave-146 queries: token adaptation, exact ROC AUC.

- doc_token_adaptation: Church's adaptation statistic
  P(k >= 2 | k >= 1) per token — the classic word-burstiness
  measure for LM corpora. Docs are whole rows, so per-block
  (token -> docs-with-1+, docs-with-2+) partials are complete and
  bounded by the vocabulary; adaptation is one division, and the
  top-10 (min df 20) breaks ties on the integer token.
- events_next_hour_auc: does hour t's total volume predict an
  error-heavy hour t+1? The label is "error count above the exact
  q90 order statistic", the score is the previous hour's total,
  and the ROC AUC is computed EXACTLY through the Mann-Whitney
  identity with doubled midranks over the bounded score histogram
  — AUC = U2 / (2 n1 n0), all integers until the final division.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .queries import SQL_TOK, _num_read_blocks, corpus_ds
from ._scaffold import read_cols

US_PER_HOUR = 3_600_000_000
AD_MIN_DF = 20
AD_K = 10


# ------------------------------------------------------ doc_token_adaptation
def _adaptation_query(min_df: int = AD_MIN_DF, k: int = AD_K):
    def q(sf_dir: str):
        from ..stages.rollup import _flat_tokens
        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "token": pa.array([], type=pa.int64()),
                "df1": pa.array([], type=pa.int64()),
                "df2": pa.array([], type=pa.int64()),
            })
            if "tokens" not in t.column_names or t.num_rows == 0:
                return empty
            values, lengths = _flat_tokens(t)
            if values.size == 0:
                return empty
            doc_ix = np.repeat(
                np.arange(t.num_rows, dtype=np.int64), lengths)
            key = doc_ix * np.int64(1 << 21) \
                + values.astype(np.int64)
            uk, cnt = np.unique(key, return_counts=True)
            tok = uk % (1 << 21)
            ut = np.unique(tok)
            df1 = np.zeros(ut.size, dtype=np.int64)
            df2 = np.zeros(ut.size, dtype=np.int64)
            pos = np.searchsorted(ut, tok)
            np.add.at(df1, pos, 1)
            np.add.at(df2, pos[cnt >= 2],
                      np.ones((cnt >= 2).sum(),
                              dtype=np.int64))
            return pa.table({
                "token": pa.array(ut),
                "df1": pa.array(df1),
                "df2": pa.array(df2),
            })

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by("token").aggregate(
                [("df1", "sum"), ("df2", "sum")])
            return pa.table({
                "token": g.column("token").cast(pa.int64()),
                "df1": g.column("df1_sum").cast(pa.int64()),
                "df2": g.column("df2_sum").cast(pa.int64()),
            })

        refs = list(
            corpus_ds(sf_dir)
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        a = tree_reduce_tables(refs, merge).to_pandas()
        a = a[a["df1"] >= min_df]
        rows = []
        for _, r in a.iterrows():
            adapt = float(int(r["df2"])) / float(int(r["df1"]))
            rows.append((adapt, int(r["token"]),
                         int(r["df1"]), int(r["df2"])))
        rows.sort(key=lambda x: (-x[0], x[1]))
        rows = rows[:k]
        return pa.table({
            "token": pa.array([r[1] for r in rows],
                              type=pa.int64()),
            "df1": pa.array([r[2] for r in rows],
                            type=pa.int64()),
            "df2": pa.array([r[3] for r in rows],
                            type=pa.int64()),
            "adaptation": pa.array([r[0] for r in rows],
                                   type=pa.float64()),
        })

    sql = f"""
    WITH tok AS ({SQL_TOK}),
    dc AS (
        SELECT token, doc_id, CAST(count(*) AS BIGINT) AS c
        FROM tok GROUP BY token, doc_id
    ),
    ad AS (
        SELECT CAST(token AS BIGINT) AS token,
               CAST(count(*) AS BIGINT) AS df1,
               CAST(sum(CASE WHEN c >= 2 THEN 1 ELSE 0 END)
                    AS BIGINT) AS df2
        FROM dc GROUP BY token
        HAVING count(*) >= {min_df}
    ),
    rk AS (
        SELECT *, row_number() OVER (
                   ORDER BY CAST(df2 AS DOUBLE)
                            / CAST(df1 AS DOUBLE) DESC,
                            token ASC) AS rn
        FROM ad
    )
    SELECT token, df1, df2,
           CAST(df2 AS DOUBLE) / CAST(df1 AS DOUBLE)
               AS adaptation
    FROM rk WHERE rn <= {k}
    ORDER BY token
    """
    return q, sql


# ------------------------------------------------------ events_next_hour_auc
def _auc_query():
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
        hmin, hmax = int(h["hour"].min()), int(h["hour"].max())
        n = hmax - hmin + 1
        tot = np.zeros(n, dtype=np.int64)
        err = np.zeros(n, dtype=np.int64)
        idx = h["hour"].to_numpy(np.int64) - hmin
        tot[idx] = h["tot"].to_numpy(np.int64)
        err[idx] = h["err"].to_numpy(np.int64)

        # label: err_{t} above the exact q90 order statistic
        es = np.sort(err)
        kq = (9 * n + 9) // 10  # ceil(0.9 n)
        thr = int(es[kq - 1])
        # pairs (score = tot_{t-1}, label_t), t = 1..n-1
        score = tot[:-1]
        lab = (err[1:] > thr).astype(np.int64)
        n1 = int(lab.sum())
        n0 = int(len(lab) - n1)

        # doubled-midrank U over the bounded score histogram
        uv = np.sort(np.unique(score))
        pos_c = np.zeros(uv.size, dtype=np.int64)
        neg_c = np.zeros(uv.size, dtype=np.int64)
        pi = np.searchsorted(uv, score[lab == 1])
        ni = np.searchsorted(uv, score[lab == 0])
        np.add.at(pos_c, pi, 1)
        np.add.at(neg_c, ni, 1)
        neg_cum = np.concatenate([[0],
                                  np.cumsum(neg_c)[:-1]])
        u2 = 0
        for i in range(uv.size):
            u2 += int(pos_c[i]) * (2 * int(neg_cum[i])
                                   + int(neg_c[i]))
        auc = float(u2) / float(2 * n1 * n0)
        return pa.table({
            "n_pairs": pa.array([n - 1], type=pa.int64()),
            "thr_err": pa.array([thr], type=pa.int64()),
            "n_pos": pa.array([n1], type=pa.int64()),
            "u2": pa.array([u2], type=pa.int64()),
            "auc": pa.array([auc], type=pa.float64()),
        })

    sql = f"""
    WITH hc AS (
        SELECT epoch_us(ts) // {US_PER_HOUR} AS hour,
               CAST(count(*) AS BIGINT) AS tot,
               CAST(sum(CASE WHEN event_type = 'error'
                        THEN 1 ELSE 0 END) AS BIGINT) AS err
        FROM events GROUP BY 1
    ),
    grid AS (
        SELECT CAST(row_number() OVER (ORDER BY g.h) - 1
                    AS BIGINT) AS i,
               COALESCE(hc.tot, 0) AS tot,
               COALESCE(hc.err, 0) AS err
        FROM (SELECT unnest(generate_series(
                  (SELECT min(hour) FROM hc),
                  (SELECT max(hour) FROM hc))) AS h) g
        LEFT JOIN hc ON hc.hour = g.h
    ),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM grid),
    thr AS (
        SELECT err AS thr FROM (
            SELECT err, row_number() OVER (ORDER BY err)
                   AS r FROM grid), nn
        WHERE r = (9 * nn.n + 9) // 10
    ),
    pairs AS (
        SELECT p.tot AS score,
               CASE WHEN c.err > thr.thr THEN 1 ELSE 0 END
                   AS lab
        FROM grid c JOIN grid p ON p.i = c.i - 1
        CROSS JOIN thr
    ),
    hist AS (
        SELECT score,
               CAST(sum(lab) AS BIGINT) AS pos_c,
               CAST(sum(1 - lab) AS BIGINT) AS neg_c
        FROM pairs GROUP BY score
    ),
    scan AS (
        SELECT score, pos_c, neg_c,
               CAST(COALESCE(sum(neg_c) OVER (ORDER BY score
                    ROWS BETWEEN UNBOUNDED PRECEDING
                    AND 1 PRECEDING), 0) AS BIGINT)
                   AS neg_cum
        FROM hist
    ),
    agg AS (
        SELECT CAST(sum(pos_c * (2 * neg_cum + neg_c))
                    AS BIGINT) AS u2,
               CAST(sum(pos_c) AS BIGINT) AS n1,
               CAST(sum(neg_c) AS BIGINT) AS n0
        FROM scan
    )
    SELECT (SELECT n - 1 FROM nn) AS n_pairs,
           thr.thr AS thr_err,
           agg.n1 AS n_pos,
           agg.u2 AS u2,
           CAST(agg.u2 AS DOUBLE)
               / CAST(2 * agg.n1 * agg.n0 AS DOUBLE) AS auc
    FROM thr CROSS JOIN agg
    """
    return q, sql


def build_wave146_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("doc_token_adaptation",) + _adaptation_query()))
    add(*(("events_next_hour_auc",) + _auc_query()))
    return queries, oracles
