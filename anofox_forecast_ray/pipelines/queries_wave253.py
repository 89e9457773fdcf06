"""Wave-253 queries: Quade blocked rank test and Krippendorff alpha.

events_quade_quadrants: the Quade (1979) test — Friedman's blocked
rank ANOVA weighted by block ranges, more powerful when effect size
scales with block level — over the day×quadrant lattice (blocks =
days, treatments = four six-hour quadrants).  Doubled midranks
within blocks and doubled range-midranks across blocks make the
weighted scores S4 = Q2·(r2−5) exact integers (4·S), and the whole
statistic collapses to ONE division:
T3 = (b−1)·ΣB² / (b·ΣS² − ΣB²).  Companion of events_friedman_daily
and events_page_trend on the same design.

events_krippendorff_alpha: Krippendorff's nominal alpha for the
wave-173 three-detector anomaly ensemble (MAD / q90 / 2-sigma rules,
reused verbatim).  For binary, complete, m=3 data the coincidence
algebra collapses to alpha = 1 − Σ(n0·n1)·(3n−1) / (2·N0·N1) — all
exact integers, one division.  The chance-corrected-disagreement
companion of events_fleiss_kappa.
"""

from __future__ import annotations

import pyarrow as pa

from ._scaffold import read_cols

US_PER_DAY = 86_400_000_000
US_PER_HOUR = 3_600_000_000


def quade(cells):
    """(b, k, top_q, t3) from a list of b blocks of k integer values.

    Doubled midranks within blocks; doubled range midranks across
    blocks; T3 = (b-1)*SB / (b*A16 - SB)."""
    b = len(cells)
    k = len(cells[0])

    def dm2(vals):
        return [2 * sum(1 for w in vals if w < v)
                + sum(1 for w in vals if w == v) + 1
                for v in vals]

    r2 = [dm2(row) for row in cells]
    ranges = [max(row) - min(row) for row in cells]
    q2 = dm2(ranges)
    s4 = [[q2[i] * (r2[i][j] - (k + 1)) for j in range(k)]
          for i in range(b)]
    a16 = sum(v * v for row in s4 for v in row)
    bj4 = [sum(s4[i][j] for i in range(b)) for j in range(k)]
    sb = sum(v * v for v in bj4)
    t3 = float((b - 1) * sb) / float(b * a16 - sb)
    top_q = bj4.index(max(bj4))
    return b, k, top_q, t3


def krippendorff_binary(r1, r2, r3):
    """(n, alpha) for 3 complete binary raters (nominal metric)."""
    n = len(r1)
    sn0n1 = 0
    tot1 = 0
    for a, c, d in zip(r1, r2, r3):
        n1 = a + c + d
        sn0n1 += (3 - n1) * n1
        tot1 += n1
    tot0 = 3 * n - tot1
    alpha = 1.0 - (float(sn0n1 * (3 * n - 1))
                   / float(2 * tot0 * tot1))
    return n, alpha


# -------------------------------------------- events_quade_quadrants
def _quade_query():
    def q(sf_dir: str):
        import numpy as np
        import ray.data as rd

        from .queries import _num_read_blocks
        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "cell": pa.array([], type=pa.int64()),
                "cnt": pa.array([], type=pa.int64()),
            })
            if "ts" not in t.column_names or t.num_rows == 0:
                return empty
            tus = t.column("ts").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            cell = ((tus // US_PER_DAY) * 4
                    + ((tus // US_PER_HOUR) % 24) // 6)
            uk, cnt = np.unique(cell, return_counts=True)
            return pa.table({
                "cell": pa.array(uk, type=pa.int64()),
                "cnt": pa.array(cnt.astype(np.int64)),
            })

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by("cell").aggregate([("cnt", "sum")])
            return pa.table({
                "cell": g.column("cell").cast(pa.int64()),
                "cnt": g.column("cnt_sum").cast(pa.int64()),
            })

        refs = list(
            read_cols(sf_dir, "events", ["ts"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        a = tree_reduce_tables(refs, merge).to_pandas()
        cells = a["cell"].to_numpy(np.int64)
        cnts = a["cnt"].to_numpy(np.int64)
        d0 = int(cells.min()) // 4
        d1 = int(cells.max()) // 4
        nd = d1 - d0 + 1
        grid = np.zeros((nd, 4), dtype=np.int64)
        grid[cells // 4 - d0, cells % 4] = cnts
        b, k, top_q, t3 = quade(
            [[int(v) for v in row] for row in grid])
        return pa.table({
            "n_blocks": pa.array([b], type=pa.int64()),
            "top_quadrant": pa.array([top_q], type=pa.int64()),
            "quade_t3": pa.array([t3], type=pa.float64()),
        })

    sql = f"""
    WITH ev AS (
        SELECT epoch_us(ts) // {US_PER_DAY} AS day,
               ((epoch_us(ts) // {US_PER_HOUR}) % 24) // 6 AS qd
        FROM events
    ),
    span AS (SELECT min(day) AS lo, max(day) AS hi FROM ev),
    lattice AS (
        SELECT d.day, h.qd
        FROM (SELECT CAST(unnest(generate_series(lo, hi))
                          AS BIGINT) AS day FROM span) d
        CROSS JOIN (SELECT CAST(unnest(generate_series(0, 3))
                                AS BIGINT) AS qd) h
    ),
    cells AS (
        SELECT l.day, l.qd,
               CAST(coalesce(c.cnt, 0) AS BIGINT) AS x
        FROM lattice l LEFT JOIN (
            SELECT day, qd, count(*) AS cnt
            FROM ev GROUP BY day, qd
        ) c ON l.day = c.day AND l.qd = c.qd
    ),
    wr AS (
        SELECT a.day, a.qd,
               2 * CAST(sum(CASE WHEN b.x < a.x THEN 1 ELSE 0 END)
                        AS BIGINT)
               + CAST(sum(CASE WHEN b.x = a.x THEN 1 ELSE 0 END)
                      AS BIGINT) + 1 AS r2
        FROM cells a JOIN cells b ON a.day = b.day
        GROUP BY a.day, a.qd
    ),
    rng AS (
        SELECT day, max(x) - min(x) AS rg
        FROM cells GROUP BY day
    ),
    rhist AS (
        SELECT rg, CAST(count(*) AS BIGINT) AS c,
               CAST(coalesce(sum(count(*)) OVER (ORDER BY rg
                    ROWS BETWEEN UNBOUNDED PRECEDING
                    AND 1 PRECEDING), 0) AS BIGINT) AS cumb
        FROM rng GROUP BY rg
    ),
    q2 AS (
        SELECT r.day, 2 * h.cumb + h.c + 1 AS q2
        FROM rng r JOIN rhist h ON r.rg = h.rg
    ),
    s4 AS (
        SELECT wr.qd, q2.q2 * (wr.r2 - 5) AS s
        FROM wr JOIN q2 ON wr.day = q2.day
    ),
    agg AS (
        SELECT CAST(sum(s * s) AS BIGINT) AS a16,
               (SELECT CAST(count(*) AS BIGINT) FROM rng) AS b
        FROM s4
    ),
    cols AS (
        SELECT qd, CAST(sum(s) AS BIGINT) AS bj
        FROM s4 GROUP BY qd
    ),
    sb AS (
        SELECT CAST(sum(bj * bj) AS BIGINT) AS sb FROM cols
    ),
    top AS (
        SELECT qd FROM cols ORDER BY bj DESC, qd ASC LIMIT 1
    )
    SELECT agg.b AS n_blocks,
           (SELECT CAST(qd AS BIGINT) FROM top) AS top_quadrant,
           CAST((agg.b - 1) * sb.sb AS DOUBLE)
           / CAST(agg.b * agg.a16 - sb.sb AS DOUBLE) AS quade_t3
    FROM agg CROSS JOIN sb
    """
    return q, sql


# ---------------------------------------- events_krippendorff_alpha
def _krippendorff_query():
    def q(sf_dir: str):
        from .queries_wave173 import _daily_errors

        h = _daily_errors(sf_dir)
        xs = [int(v) for v in h["err"]]
        n = len(xs)
        srt = sorted(xs)
        med2 = srt[(n - 1) // 2] + srt[n // 2]
        q1 = srt[(n + 3) // 4 - 1]
        q3 = srt[(3 * n + 3) // 4 - 1]
        iqr = q3 - q1
        q90 = srt[(9 * n + 9) // 10 - 1]
        s = sum(xs)
        ss = sum(v * v for v in xs)
        r1 = [1 if abs(2 * x - med2) * 2 > 3 * 2 * iqr else 0
              for x in xs]
        r2 = [1 if x > q90 else 0 for x in xs]
        r3 = [1 if (n * x - s) * (n * x - s) > 4 * (n * ss - s * s)
              else 0 for x in xs]
        n_out, alpha = krippendorff_binary(r1, r2, r3)
        return pa.table({
            "n_days": pa.array([n_out], type=pa.int64()),
            "n_flags": pa.array([sum(r1) + sum(r2) + sum(r3)],
                                type=pa.int64()),
            "kripp_alpha": pa.array([alpha], type=pa.float64()),
        })

    sql = f"""
    WITH dc AS (
        SELECT epoch_us(ts) // {US_PER_DAY} AS day,
               CAST(sum(CASE WHEN event_type = 'error'
                        THEN 1 ELSE 0 END) AS BIGINT) AS x
        FROM events GROUP BY 1
    ),
    nn AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(x AS HUGEINT)) AS BIGINT) AS s,
               CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS ss
        FROM dc
    ),
    os AS (
        SELECT
            (SELECT x FROM (SELECT x, row_number()
                 OVER (ORDER BY x) AS r FROM dc), nn
             WHERE r = (nn.n - 1) // 2 + 1)
            + (SELECT x FROM (SELECT x, row_number()
                 OVER (ORDER BY x) AS r FROM dc), nn
               WHERE r = nn.n // 2 + 1) AS med2,
            (SELECT x FROM (SELECT x, row_number()
                 OVER (ORDER BY x) AS r FROM dc), nn
             WHERE r = (3 * nn.n + 3) // 4)
            - (SELECT x FROM (SELECT x, row_number()
                 OVER (ORDER BY x) AS r FROM dc), nn
               WHERE r = (nn.n + 3) // 4) AS iqr,
            (SELECT x FROM (SELECT x, row_number()
                 OVER (ORDER BY x) AS r FROM dc), nn
             WHERE r = (9 * nn.n + 9) // 10) AS q90
    ),
    rated AS (
        SELECT
            CASE WHEN abs(2 * dc.x - os.med2) * 2 > 3 * 2 * os.iqr
                 THEN 1 ELSE 0 END
            + CASE WHEN dc.x > os.q90 THEN 1 ELSE 0 END
            + CASE WHEN CAST(nn.n * dc.x - nn.s AS HUGEINT)
                        * (nn.n * dc.x - nn.s)
                        > 4 * (nn.n * nn.ss
                               - CAST(nn.s AS HUGEINT) * nn.s)
                   THEN 1 ELSE 0 END AS n1
        FROM dc CROSS JOIN os CROSS JOIN nn
    ),
    agg AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum((3 - n1) * n1) AS BIGINT) AS sn0n1,
               CAST(sum(n1) AS BIGINT) AS tot1
        FROM rated
    )
    SELECT n AS n_days,
           tot1 AS n_flags,
           1.0 - CAST(sn0n1 * (3 * n - 1) AS DOUBLE)
                 / CAST(2 * (3 * n - tot1) * tot1 AS DOUBLE)
               AS kripp_alpha
    FROM agg
    """
    return q, sql


def build_wave253_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("events_quade_quadrants",) + _quade_query()))
    add(*(("events_krippendorff_alpha",) + _krippendorff_query()))
    return queries, oracles
