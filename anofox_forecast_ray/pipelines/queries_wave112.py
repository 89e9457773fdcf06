"""Wave-112 queries: probabilistic-forecast evaluation and L-moments.

- events_brier_decomposition: Brier score of the hour-of-day base-rate
  predictor of "any error event this hour", trained on the FIRST half
  of the hourly timeline and scored on the SECOND half, plus the
  Murphy decomposition REL / RES / UNC over the 24 hod bins (the
  forecast is constant within a bin, so binning by hod IS binning by
  forecast value). Train rates p_k and test rates ybar_k are single
  divisions of exact ints; every squared term folds in hour order
  (BS) or hod order (REL/RES) so DuckDB replays the sums with
  list_reduce. Out-of-sample split keeps REL genuinely nonzero —
  in-sample Murphy REL is identically 0 by construction.
- events_value_lmoments: first four L-moments (and L-CV, L-skewness,
  L-kurtosis ratios) of event values via probability-weighted moments
  on exact cents. The global sort is avoided entirely: PWM weighted
  sums only depend on sorted POSITIONS, which a bounded value
  histogram yields in closed form (prefix falling-factorial sums
  P_r(M) = ff(M+1, r+1)/(r+1)); per-block cents histograms are the
  only thing that moves. Weighted sums are arbitrary-precision ints
  (HUGEINT in the oracle), each b_r one float division.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .queries import _num_read_blocks
from ._scaffold import read_cols


def _hourly_err_table(sf_dir: str):
    """(hour, err) merged hourly table from bounded per-block partials."""
    import ray.data as rd

    from ..stages.source_rollup import tree_reduce_tables

    def partial(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "hour": pa.array([], type=pa.int64()),
            "err": pa.array([], type=pa.int64()),
        })
        if "ts" not in t.column_names or t.num_rows == 0:
            return empty
        tus = t.column("ts").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        hour = tus // 3_600_000_000
        et = t.column("event_type").to_pandas().to_numpy()
        is_err = (et == "error").astype(np.int64)
        uk, inv = np.unique(hour, return_inverse=True)
        err = np.bincount(inv, weights=is_err).astype(np.int64)
        return pa.table({
            "hour": pa.array(uk, type=pa.int64()),
            "err": pa.array(err),
        })

    def merge(t: pa.Table) -> pa.Table:
        g = t.group_by("hour").aggregate([("err", "sum")])
        return pa.table({
            "hour": g.column("hour").cast(pa.int64()),
            "err": g.column("err_sum").cast(pa.int64()),
        })

    refs = list(
        read_cols(sf_dir, "events", ["ts", "event_type"])
        .map_batches(partial, batch_format="pyarrow")
        .to_arrow_refs()
    )
    return tree_reduce_tables(refs, merge).to_pandas()


# ------------------------------------------------ events_brier_decomposition
def _brier_query():
    def q(sf_dir: str):
        a = _hourly_err_table(sf_dir)
        h0 = int(a["hour"].min())
        h1 = int(a["hour"].max())
        span = h1 - h0 + 1
        err = np.zeros(span, dtype=np.int64)
        err[a["hour"].to_numpy(np.int64) - h0] = (
            a["err"].to_numpy(np.int64))
        y = (err > 0).astype(np.int64)
        hod = (np.arange(span, dtype=np.int64) + h0) % 24
        h_mid = h0 + span // 2
        train = np.arange(span) + h0 < h_mid
        test = ~train
        s_k = np.zeros(24, dtype=np.int64)
        n_k = np.zeros(24, dtype=np.int64)
        np.add.at(s_k, hod[train], y[train])
        np.add.at(n_k, hod[train], 1)
        m_k = np.zeros(24, dtype=np.int64)
        t_k = np.zeros(24, dtype=np.int64)
        np.add.at(m_k, hod[test], 1)
        np.add.at(t_k, hod[test], y[test])
        n_test = int(m_k.sum())
        ybar = float(int(t_k.sum())) / float(n_test)
        p = [float(int(s_k[k])) / float(int(n_k[k])) for k in range(24)]
        # BS: hour-ordered fold over the test half
        bs = 0.0
        for t_i in np.flatnonzero(test):
            d = p[int(hod[t_i])] - float(int(y[t_i]))
            bs = bs + d * d
        bs = bs / float(n_test)
        # REL / RES: hod-ordered folds
        rel = 0.0
        res = 0.0
        for k in range(24):
            if m_k[k] == 0:
                continue
            yb_k = float(int(t_k[k])) / float(int(m_k[k]))
            d1 = p[k] - yb_k
            rel = rel + float(int(m_k[k])) * (d1 * d1)
            d2 = yb_k - ybar
            res = res + float(int(m_k[k])) * (d2 * d2)
        rel = rel / float(n_test)
        res = res / float(n_test)
        unc = ybar * (1.0 - ybar)
        return pa.table({
            "n_test": pa.array([n_test], type=pa.int64()),
            "ybar": pa.array([ybar], type=pa.float64()),
            "bs": pa.array([bs], type=pa.float64()),
            "rel": pa.array([rel], type=pa.float64()),
            "res": pa.array([res], type=pa.float64()),
            "unc": pa.array([unc], type=pa.float64()),
        })

    sql = """
    WITH e AS (
        SELECT epoch_us(ts) // 3600000000 AS hour,
               CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS ise
        FROM events
    ),
    bounds AS (
        SELECT min(hour) AS h0, max(hour) AS h1,
               min(hour) + (max(hour) - min(hour) + 1) // 2 AS hmid
        FROM e
    ),
    cnts AS (
        SELECT hour, CAST(sum(ise) AS BIGINT) AS errc
        FROM e GROUP BY hour
    ),
    dense AS (
        SELECT gs.hour, gs.hour % 24 AS hod,
               CASE WHEN COALESCE(c.errc, 0) > 0 THEN 1 ELSE 0 END AS y,
               CASE WHEN gs.hour < b.hmid THEN 1 ELSE 0 END AS tr
        FROM (SELECT unnest(generate_series(
                  (SELECT h0 FROM bounds),
                  (SELECT h1 FROM bounds))) AS hour) gs
        LEFT JOIN cnts c ON c.hour = gs.hour
        CROSS JOIN bounds b
    ),
    prof AS (
        SELECT hod,
               CAST(sum(y) AS BIGINT) AS s,
               CAST(count(*) AS BIGINT) AS n
        FROM dense WHERE tr = 1 GROUP BY hod
    ),
    test AS (
        SELECT d.hour, d.hod, d.y,
               CAST(p.s AS DOUBLE) / CAST(p.n AS DOUBLE) AS pk
        FROM dense d JOIN prof p ON p.hod = d.hod
        WHERE d.tr = 0
    ),
    tstats AS (
        SELECT CAST(count(*) AS BIGINT) AS n_test,
               CAST(sum(y) AS BIGINT) AS ysum
        FROM test
    ),
    tk AS (
        SELECT hod,
               CAST(count(*) AS BIGINT) AS m,
               CAST(sum(y) AS BIGINT) AS t,
               any_value(pk) AS pk
        FROM test GROUP BY hod
    ),
    bs_t AS (
        SELECT list_reduce(list_prepend(0.0e0,
                   list((pk - CAST(y AS DOUBLE))
                        * (pk - CAST(y AS DOUBLE)) ORDER BY hour)),
               (a, b) -> a + b)
               / CAST((SELECT n_test FROM tstats) AS DOUBLE) AS bs
        FROM test
    ),
    relres AS (
        SELECT
            list_reduce(list_prepend(0.0e0,
                list(CAST(m AS DOUBLE)
                     * ((pk - CAST(t AS DOUBLE) / CAST(m AS DOUBLE))
                        * (pk - CAST(t AS DOUBLE) / CAST(m AS DOUBLE)))
                     ORDER BY hod)),
                (a, b) -> a + b)
                / CAST((SELECT n_test FROM tstats) AS DOUBLE) AS rel,
            list_reduce(list_prepend(0.0e0,
                list(CAST(m AS DOUBLE)
                     * ((CAST(t AS DOUBLE) / CAST(m AS DOUBLE)
                         - CAST((SELECT ysum FROM tstats) AS DOUBLE)
                           / CAST((SELECT n_test FROM tstats) AS DOUBLE))
                        * (CAST(t AS DOUBLE) / CAST(m AS DOUBLE)
                           - CAST((SELECT ysum FROM tstats) AS DOUBLE)
                             / CAST((SELECT n_test FROM tstats)
                                    AS DOUBLE)))
                     ORDER BY hod)),
                (a, b) -> a + b)
                / CAST((SELECT n_test FROM tstats) AS DOUBLE) AS res
        FROM tk
    )
    SELECT ts.n_test,
           CAST(ts.ysum AS DOUBLE) / CAST(ts.n_test AS DOUBLE) AS ybar,
           bs_t.bs AS bs,
           relres.rel AS rel,
           relres.res AS res,
           (CAST(ts.ysum AS DOUBLE) / CAST(ts.n_test AS DOUBLE))
               * (1.0e0 - CAST(ts.ysum AS DOUBLE)
                          / CAST(ts.n_test AS DOUBLE)) AS unc
    FROM tstats ts, bs_t, relres
    """
    return q, sql


# --------------------------------------------------- events_value_lmoments
def _lmoments_query():
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "cents": pa.array([], type=pa.int64()),
                "c": pa.array([], type=pa.int64()),
            })
            if "value" not in t.column_names or t.num_rows == 0:
                return empty
            v = t.column("value").to_numpy(zero_copy_only=False)
            cents = np.round(v * 100.0).astype(np.int64)
            uk, cnt = np.unique(cents, return_counts=True)
            return pa.table({
                "cents": pa.array(uk, type=pa.int64()),
                "c": pa.array(cnt.astype(np.int64)),
            })

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by("cents").aggregate([("c", "sum")])
            return pa.table({
                "cents": g.column("cents").cast(pa.int64()),
                "c": g.column("c_sum").cast(pa.int64()),
            })

        refs = list(
            read_cols(sf_dir, "events", ["value"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        h = tree_reduce_tables(refs, merge).to_pandas()
        h = h.sort_values("cents").reset_index(drop=True)
        vals = [int(x) for x in h["cents"]]
        cnts = [int(x) for x in h["c"]]
        n = sum(cnts)

        def pref(mm: int, r: int) -> int:
            # sum_{i=0..mm} ff(i, r) = ff(mm+1, r+1) / (r+1), exact
            if mm < r:
                return 0
            num = 1
            for j in range(r + 1):
                num *= (mm + 1 - j)
            return num // (r + 1)

        s0 = s1 = s2 = s3 = 0
        m = 0
        for v, c in zip(vals, cnts):
            hi = m + c - 1
            lo = m - 1
            s0 += v * c
            s1 += v * (pref(hi, 1) - pref(lo, 1))
            s2 += v * (pref(hi, 2) - pref(lo, 2))
            s3 += v * (pref(hi, 3) - pref(lo, 3))
            m += c
        b0 = float(s0) / float(n)
        b1 = float(s1) / float(n * (n - 1))
        b2 = float(s2) / float(n * (n - 1) * (n - 2))
        b3 = float(s3) / float(n * (n - 1) * (n - 2) * (n - 3))
        l1 = b0
        l2 = 2.0 * b1 - b0
        l3 = 6.0 * b2 - 6.0 * b1 + b0
        l4 = 20.0 * b3 - 30.0 * b2 + 12.0 * b1 - b0
        return pa.table({
            "n": pa.array([n], type=pa.int64()),
            "l1": pa.array([l1], type=pa.float64()),
            "l2": pa.array([l2], type=pa.float64()),
            "lcv": pa.array([l2 / l1], type=pa.float64()),
            "tau3": pa.array([l3 / l2], type=pa.float64()),
            "tau4": pa.array([l4 / l2], type=pa.float64()),
        })

    sql = """
    WITH hist AS (
        SELECT CAST(round(value * 100.0e0) AS BIGINT) AS cents,
               CAST(count(*) AS BIGINT) AS c
        FROM events GROUP BY 1
    ),
    cum AS (
        SELECT cents, c,
               CAST(sum(c) OVER (ORDER BY cents) - c AS BIGINT) AS m
        FROM hist
    ),
    nn AS (SELECT CAST(sum(c) AS HUGEINT) AS n FROM hist),
    sums AS (
        SELECT
            CAST(sum(CAST(cents AS HUGEINT) * c) AS HUGEINT) AS s0,
            CAST(sum(CAST(cents AS HUGEINT) * (
                (CAST(m + c AS HUGEINT) * (m + c - 1)) // 2
              - (CAST(m AS HUGEINT) * (m - 1)) // 2
            )) AS HUGEINT) AS s1,
            CAST(sum(CAST(cents AS HUGEINT) * (
                (CAST(m + c AS HUGEINT) * (m + c - 1) * (m + c - 2)) // 3
              - (CAST(m AS HUGEINT) * (m - 1) * (m - 2)) // 3
            )) AS HUGEINT) AS s2,
            CAST(sum(CAST(cents AS HUGEINT) * (
                (CAST(m + c AS HUGEINT) * (m + c - 1) * (m + c - 2)
                 * (m + c - 3)) // 4
              - (CAST(m AS HUGEINT) * (m - 1) * (m - 2) * (m - 3)) // 4
            )) AS HUGEINT) AS s3
        FROM cum
    ),
    bs AS (
        SELECT
            CAST(s.s0 AS DOUBLE) / CAST(n.n AS DOUBLE) AS b0,
            CAST(s.s1 AS DOUBLE)
                / CAST(n.n * (n.n - 1) AS DOUBLE) AS b1,
            CAST(s.s2 AS DOUBLE)
                / CAST(n.n * (n.n - 1) * (n.n - 2) AS DOUBLE) AS b2,
            CAST(s.s3 AS DOUBLE)
                / CAST(n.n * (n.n - 1) * (n.n - 2) * (n.n - 3)
                       AS DOUBLE) AS b3,
            n.n AS n
        FROM sums s CROSS JOIN nn n
    )
    SELECT CAST(n AS BIGINT) AS n,
           b0 AS l1,
           2.0e0 * b1 - b0 AS l2,
           (2.0e0 * b1 - b0) / b0 AS lcv,
           (6.0e0 * b2 - 6.0e0 * b1 + b0) / (2.0e0 * b1 - b0) AS tau3,
           (20.0e0 * b3 - 30.0e0 * b2 + 12.0e0 * b1 - b0)
               / (2.0e0 * b1 - b0) AS tau4
    FROM bs
    """
    return q, sql


def build_wave112_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("events_brier_decomposition",) + _brier_query()))
    add(*(("events_value_lmoments",) + _lmoments_query()))
    return queries, oracles
