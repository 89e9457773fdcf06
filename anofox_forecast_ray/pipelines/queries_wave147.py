"""Wave-147 queries: Erlang-B blocking, Fisher's exact test.

- events_erlang_b: the Erlang-B blocking curve for the event
  arrival stream — offered load a = mean hourly arrivals / 20
  (a documented 3-minute holding time), and the classic recursion
  B_k = a B_{k-1} / (k + a B_{k-1}) for k = 1..12 servers. Each
  row's blocking probability is the k-prefix of the left fold,
  which the oracle re-folds per row with list_reduce (prefix of a
  left fold == fold of the prefix).
- events_fisher_exact: Fisher's exact test (one-tailed) on the
  2x2 table cohort-bit x error-prone-user (per-user error rate
  above the exact median user rate). The hypergeometric tail sums
  exp(ln pmf) over k in ascending order, with every log-binomial
  built from a LANCZOS (g=7) log-gamma spelled term-for-term on
  both sides — DuckDB's lgamma does NOT bit-match libm (probed in
  wave 135), the shared rational polynomial does.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from .queries import _num_read_blocks
from ._scaffold import read_cols
from .queries_wave135 import LANCZOS, _sql_gamma

US_PER_HOUR = 3_600_000_000
EB_MAX_C = 12
EB_HOLD_DIV = 20.0
HASH_A = 2654435761


def _lanczos_lgamma(z: float) -> float:
    """ln Gamma(z) for z >= 0.5, same Lanczos series as wave 135."""
    x = LANCZOS[0]
    for i in range(1, 9):
        x = x + LANCZOS[i] / (z + float(i) - 1.0)
    t = z + 6.5
    return (0.5 * math.log(2.0 * math.pi)
            + (z - 0.5) * math.log(t) - t + math.log(x))


def _sql_lgamma(zexpr: str) -> str:
    terms = " + ".join(
        f"{LANCZOS[i]!r} / (({zexpr}) + {float(i)!r} - 1.0e0)"
        for i in range(1, 9)
    )
    return (f"(0.5e0 * ln(2.0e0 * pi()) "
            f"+ (({zexpr}) - 0.5e0) * ln(({zexpr}) + 6.5e0) "
            f"- (({zexpr}) + 6.5e0) "
            f"+ ln({LANCZOS[0]!r} + {terms}))")


# ------------------------------------------------------------ events_erlang_b
def _erlang_query(max_c: int = EB_MAX_C):
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
        hmin, hmax = int(h["hour"].min()), int(h["hour"].max())
        n = hmax - hmin + 1
        total = int(h["cnt"].sum())
        a = (float(total) / float(n)) / EB_HOLD_DIV

        out_k, out_b = [], []
        b = 1.0
        for k in range(1, max_c + 1):
            b = (a * b) / (float(k) + a * b)
            out_k.append(k)
            out_b.append(b)
        return pa.table({
            "servers": pa.array(out_k, type=pa.int64()),
            "offered_erlangs": pa.array([a] * max_c,
                                        type=pa.float64()),
            "blocking": pa.array(out_b, type=pa.float64()),
        })

    sql = f"""
    WITH hc AS (
        SELECT epoch_us(ts) // {US_PER_HOUR} AS hour,
               CAST(count(*) AS BIGINT) AS cnt
        FROM events GROUP BY 1
    ),
    aa AS (
        SELECT (CAST(sum(cnt) AS DOUBLE)
                / CAST(max(hour) - min(hour) + 1 AS DOUBLE))
               / {EB_HOLD_DIV!r} AS a
        FROM hc
    ),
    ks AS (SELECT unnest(generate_series(1, {max_c})) AS k)
    SELECT CAST(ks.k AS BIGINT) AS servers,
           aa.a AS offered_erlangs,
           list_reduce(
               list_prepend(1.0e0,
                   list_transform(generate_series(1, ks.k),
                                  v -> CAST(v AS DOUBLE))),
               (b, j) -> (aa.a * b) / (j + aa.a * b))
               AS blocking
    FROM ks CROSS JOIN aa
    ORDER BY ks.k
    """
    return q, sql


# -------------------------------------------------------- events_fisher_exact
def _fisher_query():
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "uid": pa.array([], type=pa.int64()),
                "n": pa.array([], type=pa.int64()),
                "k": pa.array([], type=pa.int64()),
            })
            if "ts" not in t.column_names or t.num_rows == 0:
                return empty
            uid = t.column("user_id").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            et = np.asarray(t.column("event_type").to_pylist())
            err = (et == "error").astype(np.int64)
            uu, inv = np.unique(uid, return_inverse=True)
            nn = np.bincount(inv, minlength=uu.size)
            kk = np.bincount(inv[err == 1], minlength=uu.size)
            return pa.table({
                "uid": pa.array(uu.astype(np.int64)),
                "n": pa.array(nn.astype(np.int64)),
                "k": pa.array(kk.astype(np.int64)),
            })

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by("uid").aggregate(
                [("n", "sum"), ("k", "sum")])
            return pa.table({
                "uid": g.column("uid").cast(pa.int64()),
                "n": g.column("n_sum").cast(pa.int64()),
                "k": g.column("k_sum").cast(pa.int64()),
            })

        refs = list(
            read_cols(sf_dir, "events", ["user_id", "ts", "event_type"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        u = tree_reduce_tables(refs, merge).to_pandas()
        u = u.sort_values("uid").reset_index(drop=True)
        # error-prone = rate strictly above the median user rate,
        # compared exactly via cross-multiplication
        pairs = [(int(r["k"]), int(r["n"]),
                  int(r["uid"])) for _, r in u.iterrows()]
        pairs.sort(key=lambda t: (t[0] / t[1], t[2]))
        nu = len(pairs)
        kmed, nmed, _ = pairs[(nu + 1) // 2 - 1]

        g = ((u["uid"].to_numpy(np.int64)
              * np.int64(HASH_A)) % np.int64(1 << 32)) \
            >> np.int64(31)
        prone = (u["k"].to_numpy(np.int64) * nmed
                 > u["n"].to_numpy(np.int64) * kmed)
        a = int((prone & (g == 1)).sum())
        b = int((~prone & (g == 1)).sum())
        c = int((prone & (g == 0)).sum())
        d = int((~prone & (g == 0)).sum())
        n_tot = a + b + c + d
        row1 = a + b     # treated
        col1 = a + c     # prone

        def lnC(nn_, kk_):
            return (_lanczos_lgamma(float(nn_) + 1.0)
                    - _lanczos_lgamma(float(kk_) + 1.0)
                    - _lanczos_lgamma(float(nn_ - kk_) + 1.0))

        kmax = min(row1, col1)
        # anchor pmf(a) with ONE Lanczos/exp evaluation, then walk
        # the hypergeometric recurrence with exact integer ratios
        lp0 = (lnC(col1, a)
               + lnC(n_tot - col1, row1 - a)
               - lnC(n_tot, row1))
        pmf = math.exp(lp0)
        p = pmf
        for kx in range(a, kmax):
            pmf = pmf * (float((col1 - kx) * (row1 - kx))
                         / float((kx + 1)
                                 * (n_tot - col1 - row1
                                    + kx + 1)))
            p = p + pmf
        return pa.table({
            "a_cell": pa.array([a], type=pa.int64()),
            "b_cell": pa.array([b], type=pa.int64()),
            "c_cell": pa.array([c], type=pa.int64()),
            "d_cell": pa.array([d], type=pa.int64()),
            "p_one_tail": pa.array([p], type=pa.float64()),
        })

    lg = _sql_lgamma

    # ln C(n, k) with n, k as SQL expressions
    def lnc(nn_, kk_):
        t1 = lg("(" + nn_ + ") + 1.0e0")
        t2 = lg("(" + kk_ + ") + 1.0e0")
        t3 = lg("((" + nn_ + ") - (" + kk_ + ")) + 1.0e0")
        return "(" + t1 + " - " + t2 + " - " + t3 + ")"

    lnc_col = lnc("CAST(cells.a + cells.c AS DOUBLE)",
                  "CAST(cells.a AS DOUBLE)")
    lnc_row = lnc("CAST(cells.b + cells.d AS DOUBLE)",
                  "CAST(cells.b AS DOUBLE)")
    lnc_tot = lnc(
        "CAST(cells.a + cells.b + cells.c + cells.d AS DOUBLE)",
        "CAST(cells.a + cells.b AS DOUBLE)")

    sql = f"""
    WITH u AS (
        SELECT user_id AS uid,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CASE WHEN event_type = 'error'
                        THEN 1 ELSE 0 END) AS BIGINT) AS k
        FROM events GROUP BY user_id
    ),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS nu FROM u),
    med AS (
        SELECT k AS kmed, n AS nmed
        FROM (SELECT k, n, row_number() OVER (
                  ORDER BY CAST(k AS DOUBLE)
                           / CAST(n AS DOUBLE), uid) AS r
              FROM u), nn
        WHERE r = (nn.nu + 1) // 2
    ),
    cells AS (
        SELECT
            CAST(sum(CASE WHEN k * med.nmed > n * med.kmed
                     AND ((uid * {HASH_A}) % 4294967296)
                         // 2147483648 = 1
                     THEN 1 ELSE 0 END) AS BIGINT) AS a,
            CAST(sum(CASE WHEN NOT (k * med.nmed
                                    > n * med.kmed)
                     AND ((uid * {HASH_A}) % 4294967296)
                         // 2147483648 = 1
                     THEN 1 ELSE 0 END) AS BIGINT) AS b,
            CAST(sum(CASE WHEN k * med.nmed > n * med.kmed
                     AND ((uid * {HASH_A}) % 4294967296)
                         // 2147483648 = 0
                     THEN 1 ELSE 0 END) AS BIGINT) AS c,
            CAST(sum(CASE WHEN NOT (k * med.nmed
                                    > n * med.kmed)
                     AND ((uid * {HASH_A}) % 4294967296)
                         // 2147483648 = 0
                     THEN 1 ELSE 0 END) AS BIGINT) AS d
        FROM u CROSS JOIN med
    ),
    anchor AS (
        SELECT cells.a, cells.b, cells.c, cells.d,
               exp({lnc_col} + {lnc_row} - {lnc_tot}) AS p0
        FROM cells
    ),
    tail AS (
        -- hypergeometric recurrence from pmf(a): exact integer
        -- ratios, 2-slot LIST accumulator [pmf, cum]
        SELECT a, b, c, d,
               list_reduce(
                   list_prepend([p0, p0],
                       list_transform(
                           generate_series(
                               CAST(a AS BIGINT),
                               LEAST(a + b, a + c) - 1),
                           kx -> [CAST(kx AS DOUBLE), 0.0e0])),
                   (acc, e) -> [
                       acc[1] * (CAST(((a + c) - e[1])
                                 * ((a + b) - e[1]) AS DOUBLE)
                                 / CAST((e[1] + 1)
                                   * ((a + b + c + d)
                                      - (a + c) - (a + b)
                                      + e[1] + 1) AS DOUBLE)),
                       acc[2] + acc[1]
                           * (CAST(((a + c) - e[1])
                              * ((a + b) - e[1]) AS DOUBLE)
                              / CAST((e[1] + 1)
                                * ((a + b + c + d)
                                   - (a + c) - (a + b)
                                   + e[1] + 1) AS DOUBLE))])
                   AS fin
        FROM anchor
    )
    SELECT a AS a_cell, b AS b_cell, c AS c_cell, d AS d_cell,
           fin[2] AS p_one_tail
    FROM tail
    """
    return q, sql


def build_wave147_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("events_erlang_b",) + _erlang_query()))
    add(*(("events_fisher_exact",) + _fisher_query()))
    return queries, oracles
