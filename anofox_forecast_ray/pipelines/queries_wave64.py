"""Wave-64 queries: Brown-Forsythe Levene test, Higuchi fractal
dimension, and Page-Hinkley drift detection.

- source_levene: Brown-Forsythe robust variance-equality test of doc
  token counts across sources (the companion of wave-60's
  source_anova_f, which assumes equal variances). Group medians are
  LOWER nearest-rank order stats taken from per-source n_tok
  HISTOGRAMS (bounded: doc lengths are small ints) tree-reduced
  exactly — never a distributed sort; z = |n_tok - median_s| stays
  integer, and the F statistic re-uses the wave-60 integer-partials +
  ordered LIST-fold decomposition.
- doc_higuchi_fd: Higuchi fractal dimension (Higuchi 1988) of the
  raw token series at lags k = 1/2/4 — the fractal sibling of
  doc_hurst_rs. Per-offset curve lengths are sums of |y[j+k]-y[j]| —
  pure int64 (bincount over (doc, j%k) keys); the normalization and
  the ln-ln Cramer slope are scalar float expressions spelled
  identically in SQL. FD ~ 2 - H for fGn-like series, giving a
  cross-check against the Hurst query.
- events_page_hinkley: Page-Hinkley mean-shift detector (Page 1954;
  Hinkley 1971) over the DENSE hourly event-count series (zeros
  filled), baseline mu0 = mean of the first 24 hours, drift delta
  and threshold lambda fixed. The detector is a 3-slot sequential
  fold [cum, min, alarms] with reset-on-alarm — deterministic by
  construction, replayed in DuckDB with a LIST accumulator over the
  same 720-element list. Counting is distributed (bounded (hour)
  keys tree-reduce); only the fold runs on the driver.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from .queries import SQL_TOK, _cast, _num_read_blocks, corpus_ds
from ._scaffold import read_cols

HIGUCHI_KS = (1, 2, 4)
PH_BASELINE_H = 24
PH_DELTA = 0.1   # tuned so the alarm/reset branch genuinely fires
PH_LAMBDA = 10.0  # (6 alarms at sf0.001, 15 at sf0.01)


# ------------------------------------------------------------ source_levene
def _levene_query():
    def q(sf_dir: str):
        from ..stages.rollup import _flat_tokens
        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "source": pa.array([], type=pa.string()),
                "y": pa.array([], type=pa.int64()),
                "cnt": pa.array([], type=pa.int64()),
            })
            if "tokens" not in t.column_names or t.num_rows == 0:
                return empty
            _v, lengths = _flat_tokens(t)
            y = np.asarray(lengths, dtype=np.int64)
            src = np.asarray(t.column("source").to_pylist())
            key = np.char.add(np.char.add(
                src, "|"), y.astype(str))
            uk, inv = np.unique(key, return_inverse=True)
            cnt = np.bincount(inv, minlength=uk.size).astype(
                np.int64)
            parts = np.char.partition(uk, "|")
            return pa.table({
                "source": pa.array(list(parts[:, 0]),
                                   type=pa.string()),
                "y": pa.array(parts[:, 2].astype(np.int64)),
                "cnt": pa.array(cnt),
            })

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by(["source", "y"]).aggregate(
                [("cnt", "sum")])
            return pa.table({
                "source": g.column("source"),
                "y": g.column("y").cast(pa.int64()),
                "cnt": g.column("cnt_sum").cast(pa.int64()),
            })

        refs = list(
            corpus_ds(sf_dir)
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        h = tree_reduce_tables(refs, merge).to_pandas()
        h = h.sort_values(["source", "y"]).reset_index(drop=True)
        rows = []
        for src, grp in h.groupby("source", sort=True):
            n = int(grp["cnt"].sum())
            # lower nearest-rank median: value at index (n-1)//2
            target = (n - 1) // 2
            cum = grp["cnt"].cumsum().to_numpy(np.int64)
            med = int(grp["y"].to_numpy(np.int64)[
                np.searchsorted(cum, target + 1)])
            z = np.abs(grp["y"].to_numpy(np.int64) - med)
            c = grp["cnt"].to_numpy(np.int64)
            rows.append((src, n, med,
                         int((z * c).sum()),
                         int((z * z * c).sum())))
        k = len(rows)
        ssb_acc = ssw_acc = gn = gs = 0.0
        for _src, n, _med, s, ss in rows:
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
            "source": pa.array([r[0] for r in rows],
                               type=pa.string()),
            "n": pa.array([r[1] for r in rows], type=pa.int64()),
            "median_ntok": pa.array([r[2] for r in rows],
                                    type=pa.int64()),
            "sum_z": pa.array([r[3] for r in rows],
                              type=pa.int64()),
            "sumsq_z": pa.array([r[4] for r in rows],
                                type=pa.int64()),
            "f_stat": pa.array(np.full(k, f_stat),
                               type=pa.float64()),
        })

    sql = f"""
    WITH tok AS ({SQL_TOK}),
    len AS (
        SELECT CAST(d.doc_id AS VARCHAR) AS doc_id, d.source,
               CAST(COALESCE(c.n, 0) AS BIGINT) AS y
        FROM documents d
        LEFT JOIN (SELECT doc_id, count(*) AS n
                   FROM tok GROUP BY doc_id) c
          ON c.doc_id = CAST(d.doc_id AS VARCHAR)
    ),
    med AS (
        SELECT source, y AS median_ntok FROM (
            SELECT source, y,
                   row_number() OVER (PARTITION BY source
                                      ORDER BY y) AS rn,
                   count(*) OVER (PARTITION BY source) AS n
            FROM len)
        WHERE rn = (n - 1) // 2 + 1
    ),
    z AS (
        SELECT len.source, abs(len.y - med.median_ntok) AS z
        FROM len JOIN med ON med.source = len.source
    ),
    g AS (
        SELECT source,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(z) AS BIGINT) AS s,
               CAST(sum(z * z) AS BIGINT) AS ss
        FROM z GROUP BY source
    ),
    fold AS (
        SELECT list_reduce(
            list_prepend(
                [0.0e0, 0.0e0, 0.0e0, 0.0e0],
                list([CAST(n AS DOUBLE), CAST(s AS DOUBLE),
                      CAST(ss AS DOUBLE)] ORDER BY source)),
            (acc, e) -> [
                acc[1] + e[2] * e[2] / e[1],
                acc[2] + (e[3] - e[2] * e[2] / e[1]),
                acc[3] + e[1],
                acc[4] + e[2]]) AS f,
            CAST(count(*) AS BIGINT) AS k
        FROM g
    )
    SELECT g.source, g.n, med.median_ntok,
           g.s AS sum_z, g.ss AS sumsq_z,
           ((fold.f[1] - fold.f[4] * fold.f[4] / fold.f[3])
                / CAST(fold.k - 1 AS DOUBLE))
           / (fold.f[2] / (fold.f[3] - CAST(fold.k AS DOUBLE)))
               AS f_stat
    FROM g JOIN med ON med.source = g.source CROSS JOIN fold
    """
    return q, sql


# ---------------------------------------------------------- doc_higuchi_fd
def _higuchi_query(ks: tuple = HIGUCHI_KS):
    kmax = max(ks)
    min_len = 4 * kmax

    def q(sf_dir: str):
        def higuchi(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "doc_id": pa.array([], type=pa.string()),
                "n_tok": pa.array([], type=pa.int64()),
                **{f"l{k}": pa.array([], type=pa.float64())
                   for k in ks},
                "fd": pa.array([], type=pa.float64()),
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
            keep = lens >= min_len
            if not keep.any():
                return empty
            ids = [d for d, kp in zip(
                t.column("doc_id").to_pylist(), keep) if kp]
            starts = offs[:-1][keep]
            dlens = lens[keep]
            nd = len(ids)
            lcols = {}
            for k in ks:
                # abs diffs at lag k, grouped by (doc, j % k)
                tot = int((dlens - k).sum())
                g = np.repeat(np.arange(nd), dlens - k)
                j = (np.arange(tot)
                     - np.repeat(np.cumsum(dlens - k)
                                 - (dlens - k), dlens - k))
                pos = starts[g] + j
                ad = np.abs(flat[pos + k] - flat[pos])
                m = j % k
                key = g * k + m
                sums = np.bincount(
                    key, weights=ad, minlength=nd * k
                ).astype(np.int64).reshape(nd, k)
                nterm = ((dlens[:, None] - 1
                          - np.arange(k)[None, :]) // k)
                nf = dlens.astype(np.float64)
                # L_m(k) = sum * (N-1) / (nterm * k) / k, mean over m
                lm = (sums.astype(np.float64)
                      * (nf[:, None] - 1.0)
                      / (nterm.astype(np.float64) * float(k))
                      / float(k))
                # sequential mean over the k offsets (k <= 4)
                lk = np.cumsum(lm, axis=1)[:, -1] / float(k)
                lcols[k] = lk
            fd = np.full(nd, np.nan)
            lx = [math.log(1.0 / float(k)) for k in ks]
            kf = float(len(ks))
            for i in range(nd):
                vals = [lcols[k][i] for k in ks]
                if any(not (v > 0) for v in vals):
                    continue
                ly = [math.log(v) for v in vals]
                sx = lx[0] + lx[1] + lx[2]
                sy = ly[0] + ly[1] + ly[2]
                sxx = lx[0] * lx[0] + lx[1] * lx[1] + lx[2] * lx[2]
                sxy = lx[0] * ly[0] + lx[1] * ly[1] + lx[2] * ly[2]
                fd[i] = ((kf * sxy - sx * sy)
                         / (kf * sxx - sx * sx))
            return pa.table({
                "doc_id": pa.array(ids, type=pa.string()),
                "n_tok": pa.array(dlens, type=pa.int64()),
                **{f"l{k}": pa.array(lcols[k], type=pa.float64())
                   for k in ks},
                "fd": pa.array(fd, type=pa.float64()),
            })

        ds = corpus_ds(sf_dir).map_batches(
            higuchi, batch_format="pyarrow")
        return _cast(ds, {
            "doc_id": pa.string(),
            "n_tok": pa.int64(),
            **{f"l{k}": pa.float64() for k in ks},
            "fd": pa.float64(),
        })

    def k_cte(k: int) -> str:
        return f"""
    d{k} AS (
        SELECT a.doc_id, a.pos % {k} AS m,
               CAST(sum(abs(b.token - a.token)) AS BIGINT) AS s,
               CAST(count(*) AS BIGINT) AS nterm
        FROM tok a JOIN tok b
          ON b.doc_id = a.doc_id AND b.pos = a.pos + {k}
        GROUP BY a.doc_id, a.pos % {k}
    ),
    l{k} AS (
        SELECT d.doc_id,
               list_reduce(list_prepend(0.0e0, list(
                   CAST(d.s AS DOUBLE)
                   * (CAST(tl.len AS DOUBLE) - 1.0e0)
                   / (CAST(d.nterm AS DOUBLE) * {float(k)}e0)
                   / {float(k)}e0 ORDER BY d.m)),
                   (a, b) -> a + b) / {float(k)}e0 AS lk
        FROM d{k} d JOIN tl ON tl.doc_id = d.doc_id
        GROUP BY d.doc_id
    )"""

    lx1, lx2, lx4 = (f"ln(1.0e0 / {float(k)}e0)" for k in ks)
    sx = f"({lx1} + {lx2} + {lx4})"
    sxx = f"({lx1} * {lx1} + {lx2} * {lx2} + {lx4} * {lx4})"
    sql = f"""
    WITH tok AS ({SQL_TOK}),
    tl AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS len
        FROM tok GROUP BY doc_id HAVING count(*) >= {min_len}
    ),{k_cte(1)},{k_cte(2)},{k_cte(4)}
    SELECT tl.doc_id, tl.len AS n_tok,
           l1.lk AS l1, l2.lk AS l2, l4.lk AS l4,
           CASE WHEN l1.lk > 0 AND l2.lk > 0 AND l4.lk > 0
                THEN (3.0e0 * ({lx1} * ln(l1.lk)
                               + {lx2} * ln(l2.lk)
                               + {lx4} * ln(l4.lk))
                      - {sx} * (ln(l1.lk) + ln(l2.lk)
                                + ln(l4.lk)))
                     / (3.0e0 * {sxx} - {sx} * {sx})
                ELSE 'nan'::DOUBLE END AS fd
    FROM tl
    JOIN l1 ON l1.doc_id = tl.doc_id
    JOIN l2 ON l2.doc_id = tl.doc_id
    JOIN l4 ON l4.doc_id = tl.doc_id
    """
    return q, sql


# ------------------------------------------------------ events_page_hinkley
def _page_hinkley_query(baseline: int = PH_BASELINE_H,
                        delta: float = PH_DELTA,
                        lam: float = PH_LAMBDA):
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
        mu0 = float(int(dense[:baseline].sum())) / float(baseline)
        cum = 0.0
        mn = 0.0
        alarms = 0
        for x in dense[baseline:]:
            cum = cum + (float(int(x)) - mu0 - delta)
            if cum < mn:
                mn = cum
            if cum - mn > lam:
                alarms += 1
                cum = 0.0
                mn = 0.0
        return pa.table({
            "n_hours": pa.array([span], type=pa.int64()),
            "mu0": pa.array([mu0], type=pa.float64()),
            "alarms": pa.array([alarms], type=pa.int64()),
            "final_cum": pa.array([cum], type=pa.float64()),
            "final_min": pa.array([mn], type=pa.float64()),
        })

    d = f"{delta}e0"
    lm = f"{lam}e0"
    mu_terms = " + ".join(f"ms[{j + 1}]" for j in range(baseline))
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
        SELECT gs.hour, CAST(COALESCE(c.c, 0) AS DOUBLE) AS x
        FROM (SELECT unnest(generate_series(
                  (SELECT h0 FROM bounds),
                  (SELECT h1 FROM bounds))) AS hour) gs
        LEFT JOIN cnts c ON c.hour = gs.hour
    ),
    l AS (
        SELECT list(x ORDER BY hour) AS ms,
               CAST(count(*) AS BIGINT) AS n
        FROM dense
    ),
    st AS (
        SELECT n, ({mu_terms}) / {float(baseline)}e0 AS mu0,
               list_reduce(
                   list_prepend([0.0e0, 0.0e0, 0.0e0, 0.0e0],
                       list_transform(
                           generate_series({baseline + 1},
                                           CAST(n AS INTEGER)),
                           i -> [ms[i], 0.0e0, 0.0e0, 0.0e0])),
                   (acc, e) -> CASE
                       WHEN (acc[1] + (e[1]
                                - (({mu_terms})
                                   / {float(baseline)}e0)
                                - {d}))
                            - LEAST(acc[2],
                                    acc[1] + (e[1]
                                - (({mu_terms})
                                   / {float(baseline)}e0)
                                - {d})) > {lm}
                       THEN [0.0e0, 0.0e0, acc[3] + 1.0e0, 0.0e0]
                       ELSE [acc[1] + (e[1]
                                - (({mu_terms})
                                   / {float(baseline)}e0)
                                - {d}),
                             LEAST(acc[2],
                                   acc[1] + (e[1]
                                - (({mu_terms})
                                   / {float(baseline)}e0)
                                - {d})),
                             acc[3], 0.0e0]
                   END) AS fin
        FROM l
    )
    SELECT n AS n_hours, mu0,
           CAST(fin[3] AS BIGINT) AS alarms,
           fin[1] AS final_cum,
           fin[2] AS final_min
    FROM st
    """
    return q, sql


def build_wave64_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("source_levene",) + _levene_query()))
    add(*(("doc_higuchi_fd",) + _higuchi_query()))
    add(*(("events_page_hinkley",) + _page_hinkley_query()))
    return queries, oracles
