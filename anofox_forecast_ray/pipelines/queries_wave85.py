"""Wave-85 queries: Allan variance, RLE size estimate, and the
daily-cycle spectral power.

- doc_allan_var: overlapping-free Allan variance of the token
  series at cluster sizes tau = 8/16/32 (the clock-stability metric;
  distinct from Hurst R/S and Higuchi FD in how it weights drift):
  AVAR(tau) = sum_k (S_(k+1) - S_k)^2 / (2*(m-1)*tau^2) over
  adjacent non-overlapping cluster SUMS — the numerator is a pure
  int64; the log-log slope over the 3 taus gives the noise-type
  exponent. Reuses the wave-65 contiguous-window discipline
  (window all docs, filter rows after).
- doc_rle_size: run-length-encoding size estimate — runs of equal
  adjacent tokens, runs longer than 255 split: bytes = 3 * sum_runs
  ceil(len/255) (token ~2B + count 1B per emitted run). Pure integer
  CASE logic; the islands pattern (pos - row_number) on the oracle
  side. Completes the codec-cost family (varint / zlib / Gorilla /
  RLE).
- events_daily_cycle_power: Goertzel-style DFT power of the dense
  hourly count series at the 24-hour frequency — "how strong is the
  daily cycle" as ONE number (the spectral twin of events_hod_anova
  and events_hourly_acf24): c/s folds over the mean-centered series
  in hour order with shared-libm scalar cos/sin.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from .queries import SQL_TOK, _cast, _num_read_blocks, corpus_ds
from ._scaffold import read_cols

ALLAN_TAUS = (8, 16, 32)


# ---------------------------------------------------------------- doc_allan_var
def _allan_query(taus: tuple = ALLAN_TAUS):
    min_len = 2 * max(taus)

    def q(sf_dir: str):
        def allan(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "doc_id": pa.array([], type=pa.string()),
                "n_tok": pa.array([], type=pa.int64()),
                **{f"avar{x}": pa.array([], type=pa.float64())
                   for x in taus},
                "slope": pa.array([], type=pa.float64()),
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
            ids = [d for d, k in zip(
                t.column("doc_id").to_pylist(), keep) if k]
            starts = offs[:-1][keep]
            dlens = lens[keep]
            nd = len(ids)
            cols = {}
            for tau in taus:
                m = dlens // tau
                av = np.zeros(nd, dtype=np.float64)
                for i in range(nd):
                    mi = int(m[i])
                    seg = flat[starts[i]: starts[i] + mi * tau]
                    s = seg.reshape(mi, tau).sum(axis=1)
                    d = np.diff(s)
                    num = int((d * d).sum())
                    av[i] = (float(num)
                             / (2.0 * float(mi - 1)
                                * float(tau) * float(tau)))
                cols[tau] = av
            lx = [math.log(float(x)) for x in taus]
            kf = float(len(taus))
            slope = np.full(nd, np.nan)
            for i in range(nd):
                vals = [cols[x][i] for x in taus]
                if any(not (v > 0) for v in vals):
                    continue
                ly = [math.log(v) for v in vals]
                sx = lx[0] + lx[1] + lx[2]
                sy = ly[0] + ly[1] + ly[2]
                sxx = (lx[0] * lx[0] + lx[1] * lx[1]
                       + lx[2] * lx[2])
                sxy = (lx[0] * ly[0] + lx[1] * ly[1]
                       + lx[2] * ly[2])
                slope[i] = ((kf * sxy - sx * sy)
                            / (kf * sxx - sx * sx))
            return pa.table({
                "doc_id": pa.array(ids, type=pa.string()),
                "n_tok": pa.array(dlens, type=pa.int64()),
                **{f"avar{x}": pa.array(cols[x],
                                        type=pa.float64())
                   for x in taus},
                "slope": pa.array(slope, type=pa.float64()),
            })

        ds = corpus_ds(sf_dir).map_batches(
            allan, batch_format="pyarrow")
        return _cast(ds, {
            "doc_id": pa.string(),
            "n_tok": pa.int64(),
            **{f"avar{x}": pa.float64() for x in taus},
            "slope": pa.float64(),
        })

    def tau_cte(tau: int) -> str:
        return f"""
    s{tau} AS (
        SELECT t.doc_id, t.pos // {tau} AS k,
               CAST(sum(t.token) AS BIGINT) AS s
        FROM tok t JOIN tl ON tl.doc_id = t.doc_id
        WHERE t.pos < (tl.len // {tau}) * {tau}
        GROUP BY t.doc_id, t.pos // {tau}
    ),
    a{tau} AS (
        SELECT doc_id,
               CAST(sum((s - ps) * (s - ps)) AS DOUBLE)
               / (2.0e0 * CAST(count(ps) AS DOUBLE)
                  * {float(tau)}e0 * {float(tau)}e0) AS avar
        FROM (SELECT doc_id, s,
                     lag(s) OVER (PARTITION BY doc_id
                                  ORDER BY k) AS ps
              FROM s{tau})
        GROUP BY doc_id
    )"""

    l8, l16, l32 = (f"ln({float(x)}e0)" for x in taus)
    sx = f"({l8} + {l16} + {l32})"
    sxx = f"({l8} * {l8} + {l16} * {l16} + {l32} * {l32})"
    sql = f"""
    WITH tok AS ({SQL_TOK}),
    tl AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS len
        FROM tok GROUP BY doc_id HAVING count(*) >= {min_len}
    ),{tau_cte(8)},{tau_cte(16)},{tau_cte(32)}
    SELECT tl.doc_id, tl.len AS n_tok,
           a8.avar AS avar8, a16.avar AS avar16,
           a32.avar AS avar32,
           CASE WHEN a8.avar > 0 AND a16.avar > 0
                     AND a32.avar > 0
                THEN (3.0e0 * ({l8} * ln(a8.avar)
                               + {l16} * ln(a16.avar)
                               + {l32} * ln(a32.avar))
                      - {sx} * (ln(a8.avar) + ln(a16.avar)
                                + ln(a32.avar)))
                     / (3.0e0 * {sxx} - {sx} * {sx})
                ELSE 'nan'::DOUBLE END AS slope
    FROM tl
    JOIN a8 ON a8.doc_id = tl.doc_id
    JOIN a16 ON a16.doc_id = tl.doc_id
    JOIN a32 ON a32.doc_id = tl.doc_id
    """
    return q, sql


# ------------------------------------------------------------------ doc_rle_size
def _rle_query():
    def q(sf_dir: str):
        def rle(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "doc_id": pa.array([], type=pa.string()),
                "n_tok": pa.array([], type=pa.int64()),
                "n_runs": pa.array([], type=pa.int64()),
                "rle_bytes": pa.array([], type=pa.int64()),
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
            ids = t.column("doc_id").to_pylist()
            nd = len(ids)
            if flat.size == 0:
                z = np.zeros(nd, dtype=np.int64)
                return pa.table({
                    "doc_id": pa.array(ids, type=pa.string()),
                    "n_tok": pa.array(z), "n_runs": pa.array(z),
                    "rle_bytes": pa.array(z),
                })
            g = np.repeat(np.arange(nd), lens)
            new = np.r_[True, (flat[1:] != flat[:-1])
                        | (g[1:] != g[:-1])]
            rstart = np.flatnonzero(new)
            rlen = np.diff(np.r_[rstart, flat.size]).astype(
                np.int64)
            rdoc = g[rstart]
            n_runs = np.bincount(rdoc, minlength=nd).astype(
                np.int64)
            emitted = (rlen + 254) // 255
            bytes_ = 3 * np.bincount(
                rdoc, weights=emitted, minlength=nd
            ).astype(np.int64)
            return pa.table({
                "doc_id": pa.array(ids, type=pa.string()),
                "n_tok": pa.array(lens, type=pa.int64()),
                "n_runs": pa.array(n_runs),
                "rle_bytes": pa.array(bytes_),
            })

        ds = corpus_ds(sf_dir).map_batches(
            rle, batch_format="pyarrow")
        return _cast(ds, {
            "doc_id": pa.string(),
            "n_tok": pa.int64(),
            "n_runs": pa.int64(),
            "rle_bytes": pa.int64(),
        })

    sql = f"""
    WITH tok AS ({SQL_TOK}),
    isl AS (
        SELECT doc_id, token,
               pos - row_number() OVER (PARTITION BY doc_id, token
                                        ORDER BY pos) AS grp
        FROM tok
    ),
    runs AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS rlen
        FROM isl GROUP BY doc_id, token, grp
    ),
    agg AS (
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n_runs,
               CAST(3 * sum((rlen + 254) // 255) AS BIGINT)
                   AS rle_bytes
        FROM runs GROUP BY doc_id
    )
    SELECT CAST(d.doc_id AS VARCHAR) AS doc_id,
           CAST(COALESCE(tl.n, 0) AS BIGINT) AS n_tok,
           COALESCE(agg.n_runs, 0) AS n_runs,
           COALESCE(agg.rle_bytes, 0) AS rle_bytes
    FROM documents d
    LEFT JOIN (SELECT doc_id, count(*) AS n FROM tok
               GROUP BY doc_id) tl
      ON tl.doc_id = CAST(d.doc_id AS VARCHAR)
    LEFT JOIN agg ON agg.doc_id = CAST(d.doc_id AS VARCHAR)
    """
    return q, sql


# ---------------------------------------------------- events_daily_cycle_power
def _daily_cycle_query(period: int = 24):
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
        n = span
        s_tot = int(dense.sum())
        m = float(s_tot) / float(n)
        c = 0.0
        s = 0.0
        for t_idx in range(n):
            x = float(int(dense[t_idx])) - m
            ang = (2.0 * math.pi * float(t_idx)
                   / float(period))
            c = c + x * math.cos(ang)
            s = s + x * math.sin(ang)
        power = (c * c + s * s) / float(n)
        return pa.table({
            "n_hours": pa.array([n], type=pa.int64()),
            "c": pa.array([c], type=pa.float64()),
            "s": pa.array([s], type=pa.float64()),
            "power24": pa.array([power], type=pa.float64()),
        })

    p = period
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
        SELECT gs.hour - (SELECT h0 FROM bounds) AS t,
               CAST(COALESCE(c.c, 0) AS BIGINT) AS x
        FROM (SELECT unnest(generate_series(
                  (SELECT h0 FROM bounds),
                  (SELECT h1 FROM bounds))) AS hour) gs
        LEFT JOIN cnts c ON c.hour = gs.hour
    ),
    st AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               (SELECT CAST(sum(x) AS DOUBLE) FROM dense)
                   / (SELECT CAST(count(*) AS DOUBLE)
                      FROM dense) AS m
        FROM dense
    ),
    folds AS (
        SELECT st.n, st.m,
               list_reduce(list_prepend(0.0e0,
                   (SELECT list((CAST(x AS DOUBLE) - st.m)
                        * cos(2.0e0 * pi() * CAST(t AS DOUBLE)
                              / {float(p)}e0) ORDER BY t)
                    FROM dense)), (a, b) -> a + b) AS c,
               list_reduce(list_prepend(0.0e0,
                   (SELECT list((CAST(x AS DOUBLE) - st.m)
                        * sin(2.0e0 * pi() * CAST(t AS DOUBLE)
                              / {float(p)}e0) ORDER BY t)
                    FROM dense)), (a, b) -> a + b) AS s
        FROM st
    )
    SELECT n AS n_hours, c, s,
           (c * c + s * s) / CAST(n AS DOUBLE) AS power24
    FROM folds
    """
    return q, sql


def build_wave85_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("doc_allan_var",) + _allan_query()))
    add(*(("doc_rle_size",) + _rle_query()))
    add(*(("events_daily_cycle_power",) + _daily_cycle_query()))
    return queries, oracles
