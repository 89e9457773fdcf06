"""Wave-46 queries: Kolmogorov-Smirnov matrix, seasonal lag
autocorrelation, and mode tokens.

- source_ks_matrix: pairwise two-sample KS statistic between source
  length distributions, computed EXACTLY: over the merged value grid,
  D = max |cumA * nB - cumB * nA| / (nA * nB) keeps the sup in
  integers (cross-multiplication instead of comparing float CDFs);
  only the final normalization divides.
- events_hourly_acf24: lag-24 autocorrelation of the hourly event-count
  series — the seasonality diagnostic a monitoring tier runs. The
  series is the bounded per-hour count table densified to a calendar
  grid; covariance/variance moments are exact int64 sums and r24 is
  the identical f64 expression on both sides.
- doc_mode_token: the most frequent token per doc (count tiebreak:
  smaller token) — arg_max over the per-doc token histogram, exact.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .queries import SQL_TOK, _cast, _num_read_blocks, corpus_ds
from ._scaffold import read_cols


# --------------------------------------------------------- source_ks_matrix
def _ks_matrix_query():
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            if "source" not in t.column_names:
                return pa.table(
                    {"source": pa.array([], type=pa.string()),
                     "v": pa.array([], type=pa.int64()),
                     "cnt": pa.array([], type=pa.int64())}
                )
            g = pa.table(
                {"source": t.column("source"),
                 "v": t.column("n_chars").cast(pa.int64())}
            ).group_by(["source", "v"]).aggregate([("v", "count")])
            return pa.table(
                {"source": g.column("source"), "v": g.column("v"),
                 "cnt": g.column("v_count").cast(pa.int64())}
            )

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by(["source", "v"]).aggregate([("cnt", "sum")])
            return pa.table(
                {"source": g.column("source"), "v": g.column("v"),
                 "cnt": g.column("cnt_sum").cast(pa.int64())}
            )

        refs = list(
            read_cols(sf_dir, "documents", ["source", "n_chars"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        hp = tree_reduce_tables(refs, merge).to_pandas()
        sources = sorted(hp["source"].unique())
        hist = {}
        for s in sources:
            g = hp[hp["source"] == s].sort_values("v")
            hist[s] = (g["v"].to_numpy(np.int64),
                       g["cnt"].to_numpy(np.int64))
        rows = {"source_a": [], "source_b": [], "d_num": [],
                "n_a": [], "n_b": [], "ks": []}
        for i, a in enumerate(sources):
            va, ca = hist[a]
            na = int(ca.sum())
            cuma = np.cumsum(ca)
            for b in sources[i + 1:]:
                vb, cb = hist[b]
                nb = int(cb.sum())
                cumb = np.cumsum(cb)
                grid = np.union1d(va, vb)
                fa = cuma[np.searchsorted(va, grid, side="right") - 1]
                fa = np.where(
                    np.searchsorted(va, grid, side="right") > 0,
                    fa, 0)
                fb = cumb[np.searchsorted(vb, grid, side="right") - 1]
                fb = np.where(
                    np.searchsorted(vb, grid, side="right") > 0,
                    fb, 0)
                d_num = int(np.abs(fa * nb - fb * na).max())
                rows["source_a"].append(a)
                rows["source_b"].append(b)
                rows["d_num"].append(d_num)
                rows["n_a"].append(na)
                rows["n_b"].append(nb)
                rows["ks"].append(
                    float(np.float64(d_num) / np.float64(na * nb))
                )
        return pa.table(
            {"source_a": pa.array(rows["source_a"],
                                  type=pa.string()),
             "source_b": pa.array(rows["source_b"],
                                  type=pa.string()),
             "d_num": pa.array(rows["d_num"], type=pa.int64()),
             "n_a": pa.array(rows["n_a"], type=pa.int64()),
             "n_b": pa.array(rows["n_b"], type=pa.int64()),
             "ks": pa.array(rows["ks"], type=pa.float64())}
        )

    sql = """
    WITH h AS (
        SELECT source, CAST(n_chars AS BIGINT) AS v,
               CAST(count(*) AS BIGINT) AS cnt
        FROM documents GROUP BY source, n_chars
    ),
    n AS (
        SELECT source, CAST(sum(cnt) AS BIGINT) AS n FROM h
        GROUP BY source
    ),
    grid AS (
        SELECT sa.source AS source_a, sb.source AS source_b, g.v
        FROM n sa JOIN n sb ON sa.source < sb.source
        CROSS JOIN (SELECT DISTINCT v FROM h) g
    ),
    cdf AS (
        SELECT gr.source_a, gr.source_b, gr.v,
               CAST(COALESCE((SELECT sum(h2.cnt) FROM h h2
                    WHERE h2.source = gr.source_a
                      AND h2.v <= gr.v), 0) AS BIGINT) AS fa,
               CAST(COALESCE((SELECT sum(h2.cnt) FROM h h2
                    WHERE h2.source = gr.source_b
                      AND h2.v <= gr.v), 0) AS BIGINT) AS fb
        FROM grid gr
    )
    SELECT c.source_a, c.source_b,
           CAST(max(abs(c.fa * nb.n - c.fb * na.n)) AS BIGINT)
               AS d_num,
           CAST(na.n AS BIGINT) AS n_a,
           CAST(nb.n AS BIGINT) AS n_b,
           CAST(max(abs(c.fa * nb.n - c.fb * na.n)) AS DOUBLE)
               / CAST(na.n * nb.n AS DOUBLE) AS ks
    FROM cdf c
    JOIN n na ON na.source = c.source_a
    JOIN n nb ON nb.source = c.source_b
    GROUP BY c.source_a, c.source_b, na.n, nb.n
    """
    return q, sql


# --------------------------------------------------------- events_hourly_acf24
def _hourly_acf_query(lag: int = 24):
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            if "ts" not in t.column_names:
                return pa.table(
                    {"hour": pa.array([], type=pa.int64()),
                     "cnt": pa.array([], type=pa.int64())}
                )
            hour = (t.column("ts").cast(pa.int64()).to_numpy(
                zero_copy_only=False) // 1_000_000 // 3600)
            uh, uc = np.unique(hour, return_counts=True)
            return pa.table(
                {"hour": pa.array(uh),
                 "cnt": pa.array(uc.astype(np.int64))}
            )

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by("hour").aggregate([("cnt", "sum")])
            return pa.table(
                {"hour": g.column("hour"),
                 "cnt": g.column("cnt_sum").cast(pa.int64())}
            )

        refs = list(
            read_cols(sf_dir, "events", ["ts"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        a = tree_reduce_tables(refs, merge).to_pandas().sort_values(
            "hour"
        )
        hours = a["hour"].to_numpy(np.int64)
        cnt = a["cnt"].to_numpy(np.int64)
        lo, hi = int(hours[0]), int(hours[-1])
        y = np.zeros(hi - lo + 1, dtype=np.int64)
        y[hours - lo] = cnt
        n = int(y.size)
        s = int(y.sum())
        s2 = int((y * y).sum())
        sl = int((y[:-lag] * y[lag:]).sum())
        sa = int(y[:-lag].sum())
        sb = int(y[lag:].sum())
        m = n - lag
        # r24 = (m*sl - sa*sb) / sqrt((m*saa - sa^2)(m*sbb - sb^2))
        saa = int((y[:-lag] * y[:-lag]).sum())
        sbb = int((y[lag:] * y[lag:]).sum())
        num = m * sl - sa * sb
        dena = m * saa - sa * sa
        denb = m * sbb - sb * sb
        r = (float(np.float64(num))
             / float(np.sqrt(np.float64(dena)
                             * np.float64(denb))))
        return pa.table(
            {"n_hours": pa.array([n], type=pa.int64()),
             "total": pa.array([s], type=pa.int64()),
             "sum_sq": pa.array([s2], type=pa.int64()),
             "r24": pa.array([r], type=pa.float64())}
        )

    sql = f"""
    WITH hc AS (
        SELECT epoch_us(ts) // 1000000 // 3600 AS hour,
               CAST(count(*) AS BIGINT) AS cnt
        FROM events GROUP BY 1
    ),
    bounds AS (SELECT min(hour) AS lo, max(hour) AS hi FROM hc),
    grid AS (
        SELECT unnest(generate_series(b.lo, b.hi)) AS hour
        FROM bounds b
    ),
    y AS (
        SELECT g.hour, CAST(COALESCE(hc.cnt, 0) AS BIGINT) AS y
        FROM grid g LEFT JOIN hc ON hc.hour = g.hour
    ),
    pairs AS (
        SELECT a.y AS ya, b.y AS yb
        FROM y a JOIN y b ON b.hour = a.hour + {lag}
    ),
    mom AS (
        SELECT CAST(count(*) AS BIGINT) AS m,
               CAST(sum(ya * yb) AS BIGINT) AS sl,
               CAST(sum(ya) AS BIGINT) AS sa,
               CAST(sum(yb) AS BIGINT) AS sb,
               CAST(sum(ya * ya) AS BIGINT) AS saa,
               CAST(sum(yb * yb) AS BIGINT) AS sbb
        FROM pairs
    ),
    tot AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(y) AS BIGINT) AS s,
               CAST(sum(y * y) AS BIGINT) AS s2
        FROM y
    )
    SELECT tot.n AS n_hours, tot.s AS total, tot.s2 AS sum_sq,
           CAST(mom.m * mom.sl - mom.sa * mom.sb AS DOUBLE)
               / sqrt(CAST(mom.m * mom.saa - mom.sa * mom.sa
                           AS DOUBLE)
                      * CAST(mom.m * mom.sbb - mom.sb * mom.sb
                             AS DOUBLE)) AS r24
    FROM tot, mom
    """
    return q, sql


# ------------------------------------------------------------ doc_mode_token
def _mode_token_query():
    def q(sf_dir: str):
        from ..stages.rollup import _flat_tokens

        def mode(t: pa.Table) -> pa.Table:
            empty = pa.table(
                {"doc_id": pa.array([], type=pa.int64()),
                 "mode_token": pa.array([], type=pa.int64()),
                 "mode_cnt": pa.array([], type=pa.int64())}
            )
            if "tokens" not in t.column_names:
                return empty
            values, lengths = _flat_tokens(t)
            if values.size == 0:
                return empty
            v = values.astype(np.int64)
            lens = lengths.astype(np.int64)
            seg = np.repeat(np.arange(lens.size, dtype=np.int64),
                            lens)
            key = (seg << np.int64(21)) | v
            uk, uc = np.unique(key, return_counts=True)
            kd = uk >> np.int64(21)
            kv = uk & ((np.int64(1) << 21) - 1)
            # per doc argmax by (count desc, token asc): encode order
            # key = cnt * 2^21 + (2^21 - 1 - token), take max per doc
            ordk = uc.astype(np.int64) * (1 << 21) + (
                (1 << 21) - 1 - kv
            )
            starts = np.flatnonzero(
                np.r_[True, kd[1:] != kd[:-1]]
            )
            best = np.maximum.reduceat(ordk, starts)
            bt = (1 << 21) - 1 - (best & ((1 << 21) - 1))
            bc = best >> 21
            ids = np.asarray(
                [int(x) for x in t.column("doc_id").to_pylist()],
                dtype=np.int64,
            )
            return pa.table(
                {"doc_id": pa.array(ids[kd[starts]]),
                 "mode_token": pa.array(bt),
                 "mode_cnt": pa.array(bc)}
            )

        return _cast(
            corpus_ds(sf_dir).map_batches(mode,
                                          batch_format="pyarrow"),
            {"doc_id": pa.int64(), "mode_token": pa.int64(),
             "mode_cnt": pa.int64()},
        )

    sql = f"""
    WITH tok AS ({SQL_TOK}),
    c AS (
        SELECT doc_id, token, CAST(count(*) AS BIGINT) AS cnt
        FROM tok GROUP BY doc_id, token
    )
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(mode_token AS BIGINT) AS mode_token,
           CAST(mode_cnt AS BIGINT) AS mode_cnt
    FROM (
        SELECT doc_id, token AS mode_token, cnt AS mode_cnt,
               row_number() OVER (PARTITION BY doc_id
                                  ORDER BY cnt DESC, token) AS rk
        FROM c
    ) WHERE rk = 1
    """
    return q, sql


def build_wave46_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("source_ks_matrix",) + _ks_matrix_query()))
    add(*(("events_hourly_acf24",) + _hourly_acf_query(24)))
    add(*(("doc_mode_token",) + _mode_token_query()))
    return queries, oracles
