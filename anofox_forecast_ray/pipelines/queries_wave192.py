"""Wave-192 queries: RTS Kalman smoother, Hampel filter.

- events_kalman_smoother: the Rauch-Tung-Striebel backward pass over
  the wave-137 local-level filter (q=1, r=25) on the dense hourly
  count series — the full fixed-interval smoother, emitting EVERY
  smoothed level as a row. The forward filter is a history-growing
  fold (list_concat appends [a_t, P_t] per step; the current state
  is read with len(acc)); the backward RTS recursion
  a_t^s = a_t + C_t (a_{t+1}^s - a_t), C_t = P_t/(P_t+q),
  P_t^s = P_t + C_t^2 (P_{t+1}^s - (P_t+q)) prepends each smoothed
  state so the final list is in ascending t order. Bitwise-replayed
  by DuckDB list folds.
- doc_hampel_w8: the Hampel outlier filter over each doc's w8
  token-window SUM series (integers): window median and MAD of the
  5-point neighborhood are exact integer selections (sorted-list
  middle), a point is an outlier iff |x - med| > 3 * 1.4826 * MAD;
  emits the per-doc outlier count — pure int64 output.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .queries import SQL_TOK, _num_read_blocks
from .queries_wave137 import _hourly_counts

KF_Q = 1.0
KF_R = 25.0
HAMPEL_K = 3.0e0 * 1.4826e0


def rts_smooth(y, qv=KF_Q, rv=KF_R):
    """Forward local-level filter then RTS backward pass; returns
    the smoothed level sequence (list, ascending t). Ops are spelled
    to match the SQL folds term-for-term."""
    n = len(y)
    a = [float(y[0])]
    p = [rv]
    for t in range(1, n):
        pp = p[-1] + qv
        f = pp + rv
        k = pp / f
        a.append(a[-1] + k * (float(y[t]) - a[-1]))
        p.append((1.0 - k) * pp)
    sm_a = [a[-1]]
    sm_p = [p[-1]]
    for t in range(n - 2, -1, -1):
        c = p[t] / (p[t] + qv)
        na = a[t] + c * (sm_a[0] - a[t])
        np_ = p[t] + c * c * (sm_p[0] - (p[t] + qv))
        sm_a.insert(0, na)
        sm_p.insert(0, np_)
    return sm_a


# ---------------------------------------------- events_kalman_smoother
def _rts_query(qv: float = KF_Q, rv: float = KF_R):
    def q(sf_dir: str):
        import ray.data as rd

        y = [int(v) for v in _hourly_counts(sf_dir)]
        sm = rts_smooth(y, qv, rv)
        tbl = pa.table({
            "t": pa.array(np.arange(1, len(sm) + 1,
                                    dtype=np.int64)),
            "level_smooth": pa.array(sm, type=pa.float64()),
        })
        return rd.from_arrow(tbl)

    US_PER_HOUR = 3_600_000_000
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
    l AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               list(CAST(cnt AS DOUBLE) ORDER BY hour) AS ys
        FROM grid
    ),
    fwd AS (
        SELECT n,
               list_reduce(
                   list_prepend([ys[1], {rv!r}],
                       list_transform(ys[2:CAST(n AS INTEGER)],
                                      v -> [v])),
                   (acc, e) -> list_concat(acc, [
                       acc[len(acc) - 1]
                       + ((acc[len(acc)] + {qv!r})
                          / (acc[len(acc)] + {qv!r} + {rv!r}))
                         * (e[1] - acc[len(acc) - 1]),
                       (1.0e0 - (acc[len(acc)] + {qv!r})
                                / (acc[len(acc)] + {qv!r}
                                   + {rv!r}))
                           * (acc[len(acc)] + {qv!r})])) AS h
        FROM l
    ),
    filt AS (
        SELECT fwd.n,
               CAST(unnest(generate_series(1,
                    CAST(fwd.n AS INTEGER))) AS BIGINT) AS t,
               fwd.h AS h
        FROM fwd
    ),
    states AS (
        SELECT n, t, h[CAST(2 * t - 1 AS INTEGER)] AS a,
               h[CAST(2 * t AS INTEGER)] AS p
        FROM filt
    ),
    bwd AS (
        SELECT list_reduce(
                   list_prepend(
                       (SELECT [a, p] FROM states s2
                        WHERE s2.t = s2.n),
                       (SELECT list([a, p] ORDER BY t DESC)
                        FROM states s3 WHERE s3.t < s3.n)),
                   (acc, e) -> list_concat([
                       e[1] + (e[2] / (e[2] + {qv!r}))
                              * (acc[1] - e[1]),
                       e[2] + (e[2] / (e[2] + {qv!r}))
                              * (e[2] / (e[2] + {qv!r}))
                              * (acc[2] - (e[2] + {qv!r}))],
                       acc)) AS sm
        FROM (SELECT 1)
    )
    SELECT states.t,
           bwd.sm[CAST(2 * states.t - 1 AS INTEGER)]
               AS level_smooth
    FROM states CROSS JOIN bwd
    """
    return q, sql


# ----------------------------------------------------- doc_hampel_w8
def _hampel_query(width: int = 8):
    def q(sf_dir: str):
        from .queries import _cast, corpus_ds

        def ham(t: pa.Table) -> pa.Table:
            toks = t.column("tokens")
            dids = t.column("doc_id").to_pylist()
            out_d, out_c, out_n = [], [], []
            for i in range(len(dids)):
                arr = np.asarray(toks[i].as_py(), dtype=np.int64)
                if arr.size == 0:
                    continue
                nw = (arr.size + width - 1) // width
                if nw < 5:
                    continue
                bounds = np.arange(0, arr.size, width)
                s = np.add.reduceat(arr, bounds)
                cnt = 0
                for j in range(2, nw - 2):
                    win = np.sort(s[j - 2: j + 3])
                    med = int(win[2])
                    dev = np.sort(np.abs(s[j - 2: j + 3] - med))
                    mad = int(dev[2])
                    if abs(int(s[j]) - med) > HAMPEL_K * mad:
                        cnt += 1
                out_d.append(dids[i])
                out_c.append(cnt)
                out_n.append(nw - 4)
            return pa.table({
                "doc_id": pa.array(out_d, type=pa.string()),
                "n_outliers": pa.array(out_c, type=pa.int64()),
                "n_interior": pa.array(out_n, type=pa.int64()),
            })

        ds = corpus_ds(sf_dir).map_batches(
            ham, batch_format="pyarrow")
        return _cast(ds, {"doc_id": pa.string(),
                          "n_outliers": pa.int64(),
                          "n_interior": pa.int64()})

    sql = f"""
    WITH tok AS ({SQL_TOK}),
    w AS (
        SELECT doc_id, pos // {width} AS wid,
               CAST(sum(token) AS BIGINT) AS s
        FROM tok GROUP BY doc_id, wid
    ),
    f AS (
        SELECT doc_id, wid,
               lag(s, 2) OVER win AS a,
               lag(s, 1) OVER win AS b,
               s AS c,
               lead(s, 1) OVER win AS d,
               lead(s, 2) OVER win AS e,
               CAST(count(*) OVER
                    (PARTITION BY doc_id) AS BIGINT) AS nw
        FROM w
        WINDOW win AS (PARTITION BY doc_id ORDER BY wid)
    ),
    interior AS (
        SELECT doc_id, nw, a, b, c, d, e,
               list_sort([a, b, c, d, e])[3] AS med
        FROM f
        WHERE a IS NOT NULL AND b IS NOT NULL
          AND d IS NOT NULL AND e IS NOT NULL AND nw >= 5
    ),
    marked AS (
        SELECT doc_id, nw,
               CASE WHEN CAST(abs(c - med) AS DOUBLE)
                    > {HAMPEL_K!r}
                      * CAST(list_sort([abs(a - med),
                                        abs(b - med),
                                        abs(c - med),
                                        abs(d - med),
                                        abs(e - med)])[3]
                             AS DOUBLE)
                    THEN 1 ELSE 0 END AS is_out
        FROM interior
    )
    SELECT doc_id,
           CAST(sum(is_out) AS BIGINT) AS n_outliers,
           CAST(count(*) AS BIGINT) AS n_interior
    FROM marked GROUP BY doc_id
    """
    return q, sql


def build_wave192_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("events_kalman_smoother",) + _rts_query()))
    add(*(("doc_hampel_w8",) + _hampel_query()))
    return queries, oracles
