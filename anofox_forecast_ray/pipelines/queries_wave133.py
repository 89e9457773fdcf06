"""Wave-133 queries: Breusch-Pagan LM test, Mood's median test.

- events_breusch_pagan: Koenker's studentized Breusch-Pagan
  heteroskedasticity test on the hourly-count trend regression.
  The base OLS comes from exact integer moments (one division per
  coefficient); the auxiliary regression of e^2 on t uses
  hour-ordered float folds for Se2/Ste2/RSS/TSS (Python left folds
  == DuckDB list_reduce), and LM = n * R2_aux. Expression strings
  are shared with the oracle, so the independent verify recomputes
  everything from np.linalg.lstsq residuals.
- doc_mood_median: Mood's median test of doc lengths across the 20
  sources. The grand median is the exact lower median from the
  bounded length histogram (integer selection); per-source
  above/at-or-below counts are bounded integer cells, and the
  chi-square folds (O-E)^2/E over (source, cell) in deterministic
  order.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .queries import _num_read_blocks, corpus_ds
from ._scaffold import read_cols

US_PER_HOUR = 3_600_000_000


# ------------------------------------------------------ events_breusch_pagan
def _breusch_pagan_query():
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
        n = hmax - hmin + 1
        cnt = np.zeros(n, dtype=np.int64)
        cnt[h["hour"].to_numpy(np.int64) - hmin] = (
            h["cnt"].to_numpy(np.int64))
        y = [int(v) for v in cnt]

        st = stt = sy = sty = 0
        for t_i in range(n):
            st += t_i
            stt += t_i * t_i
            sy += y[t_i]
            sty += t_i * y[t_i]
        denom = n * stt - st * st
        b = float(n * sty - st * sy) / float(denom)
        a = float(sy * stt - st * sty) / float(denom)

        nf = float(n)
        stf = float(st)
        sttf = float(stt)
        denf = float(denom)

        se2 = 0.0
        ste2 = 0.0
        for t_i in range(n):
            e = (float(y[t_i]) - a) - (b * float(t_i))
            e2 = e * e
            se2 = se2 + e2
            ste2 = ste2 + float(t_i) * e2
        c1 = (nf * ste2 - stf * se2) / denf
        c0 = (se2 * sttf - stf * ste2) / denf
        me2 = se2 / nf

        rss = 0.0
        tss = 0.0
        for t_i in range(n):
            e = (float(y[t_i]) - a) - (b * float(t_i))
            e2 = e * e
            ra = (e2 - c0) - (c1 * float(t_i))
            rss = rss + ra * ra
            d = e2 - me2
            tss = tss + d * d
        r2 = 1.0 - rss / tss
        lm = nf * r2
        return pa.table({
            "n_hours": pa.array([n], type=pa.int64()),
            "c1_aux": pa.array([c1], type=pa.float64()),
            "r2_aux": pa.array([r2], type=pa.float64()),
            "lm_stat": pa.array([lm], type=pa.float64()),
        })

    sql = f"""
    WITH hc AS (
        SELECT epoch_us(ts) // {US_PER_HOUR} AS hour,
               CAST(count(*) AS BIGINT) AS cnt
        FROM events GROUP BY 1
    ),
    grid AS (
        SELECT g.h AS hour, COALESCE(hc.cnt, 0) AS cnt,
               CAST(row_number() OVER (ORDER BY g.h) - 1
                    AS BIGINT) AS t
        FROM (SELECT unnest(generate_series(
                  (SELECT min(hour) FROM hc),
                  (SELECT max(hour) FROM hc))) AS h) g
        LEFT JOIN hc ON hc.hour = g.h
    ),
    mom AS (
        SELECT CAST(count(*) AS HUGEINT) AS n,
               CAST(sum(CAST(t AS HUGEINT)) AS HUGEINT) AS st,
               CAST(sum(CAST(t AS HUGEINT) * t) AS HUGEINT)
                   AS stt,
               CAST(sum(CAST(cnt AS HUGEINT)) AS HUGEINT) AS sy,
               CAST(sum(CAST(t AS HUGEINT) * cnt) AS HUGEINT)
                   AS sty
        FROM grid
    ),
    ab AS (
        SELECT CAST(n AS BIGINT) AS n,
               CAST(n * sty - st * sy AS DOUBLE)
                   / CAST(n * stt - st * st AS DOUBLE) AS b,
               CAST(sy * stt - st * sty AS DOUBLE)
                   / CAST(n * stt - st * st AS DOUBLE) AS a,
               CAST(n AS DOUBLE) AS nf,
               CAST(st AS DOUBLE) AS stf,
               CAST(stt AS DOUBLE) AS sttf,
               CAST(n * stt - st * st AS DOUBLE) AS denf
        FROM mom
    ),
    e2s AS (
        SELECT grid.t,
               ((CAST(grid.cnt AS DOUBLE) - ab.a)
                - (ab.b * CAST(grid.t AS DOUBLE)))
               * ((CAST(grid.cnt AS DOUBLE) - ab.a)
                  - (ab.b * CAST(grid.t AS DOUBLE))) AS e2
        FROM grid CROSS JOIN ab
    ),
    f1 AS (
        SELECT list_reduce(list_prepend(0.0e0,
                   list(e2 ORDER BY t)), (x, y) -> x + y)
                   AS se2,
               list_reduce(list_prepend(0.0e0,
                   list(CAST(t AS DOUBLE) * e2 ORDER BY t)),
                   (x, y) -> x + y) AS ste2
        FROM e2s
    ),
    cc AS (
        SELECT ab.n, ab.nf,
               (ab.nf * f1.ste2 - ab.stf * f1.se2) / ab.denf
                   AS c1,
               (f1.se2 * ab.sttf - ab.stf * f1.ste2) / ab.denf
                   AS c0,
               f1.se2 / ab.nf AS me2
        FROM ab CROSS JOIN f1
    ),
    f2 AS (
        SELECT cc.n, cc.nf, cc.c1,
               list_reduce(list_prepend(0.0e0,
                   list(((e2s.e2 - cc.c0)
                         - (cc.c1 * CAST(e2s.t AS DOUBLE)))
                        * ((e2s.e2 - cc.c0)
                           - (cc.c1 * CAST(e2s.t AS DOUBLE)))
                        ORDER BY e2s.t)),
                   (x, y) -> x + y) AS rss,
               list_reduce(list_prepend(0.0e0,
                   list((e2s.e2 - cc.me2) * (e2s.e2 - cc.me2)
                        ORDER BY e2s.t)),
                   (x, y) -> x + y) AS tss
        FROM e2s CROSS JOIN cc
        GROUP BY cc.n, cc.nf, cc.c1, cc.c0, cc.me2
    )
    SELECT n AS n_hours,
           c1 AS c1_aux,
           1.0e0 - rss / tss AS r2_aux,
           nf * (1.0e0 - rss / tss) AS lm_stat
    FROM f2
    """
    return q, sql


# ----------------------------------------------------------- doc_mood_median
def _mood_median_query():
    def q(sf_dir: str):
        from ..stages.rollup import _flat_tokens
        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "source": pa.array([], type=pa.string()),
                "len": pa.array([], type=pa.int64()),
                "cnt": pa.array([], type=pa.int64()),
            })
            if "tokens" not in t.column_names or t.num_rows == 0:
                return empty
            _values, lengths = _flat_tokens(t)
            src = np.asarray(t.column("source").to_pylist())
            names, inv = np.unique(src, return_inverse=True)
            shift = np.int64(1 << 22)
            keys = inv.astype(np.int64) * shift \
                + lengths.astype(np.int64)
            uk, cnt = np.unique(keys, return_counts=True)
            return pa.table({
                "source": pa.array(names[uk // shift],
                                   type=pa.string()),
                "len": pa.array(uk % shift, type=pa.int64()),
                "cnt": pa.array(cnt.astype(np.int64)),
            })

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by(["source", "len"]).aggregate(
                [("cnt", "sum")])
            return pa.table({
                "source": g.column("source"),
                "len": g.column("len").cast(pa.int64()),
                "cnt": g.column("cnt_sum").cast(pa.int64()),
            })

        refs = list(
            corpus_ds(sf_dir)
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        h = tree_reduce_tables(refs, merge).to_pandas()
        g_hist = h.groupby("len")["cnt"].sum().sort_index()
        n = int(g_hist.sum())
        cum = g_hist.cumsum()
        # lower median: smallest v with 2*cum >= n
        v_med = int(cum.index[(2 * cum >= n).argmax()])

        above_tot = int(h.loc[h["len"] > v_med, "cnt"].sum())
        chi2 = 0.0
        rows = []
        for src, grp in h.groupby("source", sort=True):
            n_s = int(grp["cnt"].sum())
            a_s = int(grp.loc[grp["len"] > v_med, "cnt"].sum())
            rows.append((src, n_s, a_s))
        for src, n_s, a_s in rows:
            e_a = (float(n_s) * float(above_tot)) / float(n)
            e_b = (float(n_s) * float(n - above_tot)) \
                / float(n)
            da = float(a_s) - e_a
            db = float(n_s - a_s) - e_b
            # one fold element per source (termA + termB), matching
            # the oracle's list element grouping exactly
            chi2 = chi2 + ((da * da) / e_a + (db * db) / e_b)
        return pa.table({
            "n_docs": pa.array([n], type=pa.int64()),
            "median_len": pa.array([v_med], type=pa.int64()),
            "above_total": pa.array([above_tot],
                                    type=pa.int64()),
            "k_sources": pa.array([len(rows)],
                                  type=pa.int64()),
            "chi2": pa.array([chi2], type=pa.float64()),
        })

    sql = """
    WITH lens AS (
        SELECT source, CAST(length(text) AS BIGINT) AS len
        FROM documents
    ),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM lens),
    med AS (
        SELECT min(len) AS v_med
        FROM (
            SELECT len,
                   2 * CAST(sum(c) OVER (ORDER BY len
                        ROWS UNBOUNDED PRECEDING) AS BIGINT)
                       AS cum2
            FROM (SELECT len, count(*) AS c FROM lens
                  GROUP BY len)
        ), nn
        WHERE cum2 >= nn.n
    ),
    cells AS (
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_s,
               CAST(sum(CASE WHEN len > (SELECT v_med FROM med)
                        THEN 1 ELSE 0 END) AS BIGINT) AS a_s
        FROM lens GROUP BY source
    ),
    tots AS (
        SELECT CAST(sum(a_s) AS BIGINT) AS above_tot,
               CAST(sum(n_s) AS BIGINT) AS n,
               CAST(count(*) AS BIGINT) AS k
        FROM cells
    ),
    chi AS (
        SELECT list_reduce(list_prepend(0.0e0,
                   list(
                     ((CAST(a_s AS DOUBLE)
                       - (CAST(n_s AS DOUBLE)
                          * CAST(t.above_tot AS DOUBLE))
                         / CAST(t.n AS DOUBLE))
                      * (CAST(a_s AS DOUBLE)
                         - (CAST(n_s AS DOUBLE)
                            * CAST(t.above_tot AS DOUBLE))
                           / CAST(t.n AS DOUBLE)))
                     / ((CAST(n_s AS DOUBLE)
                         * CAST(t.above_tot AS DOUBLE))
                        / CAST(t.n AS DOUBLE))
                     +
                     ((CAST(n_s - a_s AS DOUBLE)
                       - (CAST(n_s AS DOUBLE)
                          * CAST(t.n - t.above_tot AS DOUBLE))
                         / CAST(t.n AS DOUBLE))
                      * (CAST(n_s - a_s AS DOUBLE)
                         - (CAST(n_s AS DOUBLE)
                            * CAST(t.n - t.above_tot
                                   AS DOUBLE))
                           / CAST(t.n AS DOUBLE)))
                     / ((CAST(n_s AS DOUBLE)
                         * CAST(t.n - t.above_tot AS DOUBLE))
                        / CAST(t.n AS DOUBLE))
                     ORDER BY source)),
                   (x, y) -> x + y) AS chi2
        FROM cells CROSS JOIN tots t
        GROUP BY t.n, t.above_tot
    )
    SELECT tots.n AS n_docs,
           med.v_med AS median_len,
           tots.above_tot AS above_total,
           tots.k AS k_sources,
           chi.chi2 AS chi2
    FROM tots CROSS JOIN med CROSS JOIN chi
    """
    return q, sql


def build_wave133_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("events_breusch_pagan",) + _breusch_pagan_query()))
    add(*(("doc_mood_median",) + _mood_median_query()))
    return queries, oracles
