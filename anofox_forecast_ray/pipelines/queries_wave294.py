"""Wave-294 query: Tukey median polish.

lineitem_median_polish: Tukey's two-way median polish (the exact
R medpolish sweep order) on the 3×2 returnflag × linestatus table of
DOUBLED median extended prices.  All state stays integer: 3-element
medians are exact middles, and every 2-element median uses FLOOR
halving mirrored into DuckDB via the positive-shift trick
((a+b+2^40)//2 − 2^39), since DuckDB's // truncates toward zero
while Python floors (the NOTES signed-division rule).  Two sweeps
unroll into four generated scalar CTE stages.  Emits the grand
effect and the max |row|/|col|/|residual| magnitudes (doubled
cents).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

SHIFT = 1 << 40
HALF_SHIFT = 1 << 39


def _med2(a, b):
    """Floor median of two ints (matches the SQL shift trick)."""
    return (a + b + SHIFT) // 2 - HALF_SHIFT


def _med3(a, b, c):
    return a + b + c - min(a, b, c) - max(a, b, c)


def median_polish(cells2):
    """(grand, re, ce, resid) on {(ri, ci): doubled-int} for the
    fixed 3x2 layout; two R-medpolish sweeps."""
    rows = sorted({r for r, _ in cells2})
    cols = sorted({c for _, c in cells2})
    t = dict(cells2)
    re = {r: 0 for r in rows}
    ce = {c: 0 for c in cols}
    grand = 0
    for _ in range(2):
        for r in rows:
            m = _med2(t[(r, cols[0])], t[(r, cols[1])])
            for c in cols:
                t[(r, c)] -= m
            re[r] += m
        d = _med3(*(ce[c] for c in cols)) if len(cols) == 3 \
            else _med2(ce[cols[0]], ce[cols[1]])
        for c in cols:
            ce[c] -= d
        grand += d
        for c in cols:
            m = _med3(*(t[(r, c)] for r in rows))
            for r in rows:
                t[(r, c)] -= m
            ce[c] += m
        d = _med3(*(re[r] for r in rows))
        for r in rows:
            re[r] -= d
        grand += d
    return grand, re, ce, t


def _polish_query():
    def q(sf_dir: str):
        import pyarrow.parquet as pq

        t = pq.read_table(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_returnflag", "l_linestatus",
                     "l_extendedprice"])
        rf = t.column("l_returnflag").to_pylist()
        ls = t.column("l_linestatus").to_pylist()
        cents = np.round(
            t.column("l_extendedprice").to_numpy(
                zero_copy_only=False) * 100.0).astype(np.int64)
        groups = {}
        for r, c, v in zip(rf, ls, cents):
            groups.setdefault((r, c), []).append(int(v))
        cells2 = {}
        for k, vals in groups.items():
            s = sorted(vals)
            n = len(s)
            cells2[k] = s[(n - 1) // 2] + s[n // 2]
        grand, re, ce, resid = median_polish(cells2)
        return pa.table({
            "grand2": pa.array([grand], type=pa.int64()),
            "grand_cents": pa.array([float(grand) / 2.0],
                                    type=pa.float64()),
            "max_row2": pa.array(
                [max(abs(v) for v in re.values())],
                type=pa.int64()),
            "max_col2": pa.array(
                [max(abs(v) for v in ce.values())],
                type=pa.int64()),
            "max_resid2": pa.array(
                [max(abs(v) for v in resid.values())],
                type=pa.int64()),
        })

    def med2(a, b):
        return (f"(({a}) + ({b}) + {SHIFT}) // 2 - {HALF_SHIFT}")

    def med3(a, b, c):
        return (f"(({a}) + ({b}) + ({c})"
                f" - least({a}, {b}, {c})"
                f" - greatest({a}, {b}, {c}))")

    # state columns: t11..t32 (row-major 3x2), r1..r3, c1, c2, g
    stages = []
    prev = "s0"
    step = 0
    for _ in range(2):
        step += 1
        rms = [med2(f"{prev}.t{r}1", f"{prev}.t{r}2")
               for r in (1, 2, 3)]
        cd = med2(f"{prev}.c1", f"{prev}.c2")
        cols = [f"{prev}.t{r}{c} - ({rms[r - 1]}) AS t{r}{c}"
                for r in (1, 2, 3) for c in (1, 2)]
        cols += [f"{prev}.r{r} + ({rms[r - 1]}) AS r{r}"
                 for r in (1, 2, 3)]
        cols += [f"{prev}.c{c} - ({cd}) AS c{c}" for c in (1, 2)]
        cols += [f"{prev}.g + ({cd}) AS g"]
        stages.append(f"s{step} AS MATERIALIZED (SELECT "
                      + ", ".join(cols) + f" FROM {prev})")
        prev = f"s{step}"
        step += 1
        cms = [med3(f"{prev}.t1{c}", f"{prev}.t2{c}",
                    f"{prev}.t3{c}") for c in (1, 2)]
        rd = med3(f"{prev}.r1", f"{prev}.r2", f"{prev}.r3")
        cols = [f"{prev}.t{r}{c} - ({cms[c - 1]}) AS t{r}{c}"
                for r in (1, 2, 3) for c in (1, 2)]
        cols += [f"{prev}.r{r} - ({rd}) AS r{r}"
                 for r in (1, 2, 3)]
        cols += [f"{prev}.c{c} + ({cms[c - 1]}) AS c{c}"
                 for c in (1, 2)]
        cols += [f"{prev}.g + ({rd}) AS g"]
        stages.append(f"s{step} AS MATERIALIZED (SELECT "
                      + ", ".join(cols) + f" FROM {prev})")
        prev = f"s{step}"
    stages_sql = ",\n    ".join(stages)

    sql = f"""
    WITH base AS (
        SELECT l_returnflag AS r, l_linestatus AS c,
               CAST(round_even(l_extendedprice * 100, 0)
                    AS BIGINT) AS y
        FROM lineitem
    ),
    ranked AS (
        SELECT r, c, y,
               row_number() OVER (PARTITION BY r, c ORDER BY y)
                   AS rk,
               count(*) OVER (PARTITION BY r, c) AS n
        FROM base
    ),
    cells AS (
        SELECT a.r, a.c, a.y + b.y AS v2,
               dense_rank() OVER (ORDER BY a.r) AS ri,
               dense_rank() OVER (ORDER BY a.c) AS ci
        FROM ranked a JOIN ranked b
          ON a.r = b.r AND a.c = b.c
         AND a.rk = (a.n - 1) // 2 + 1 AND b.rk = b.n // 2 + 1
    ),
    s0 AS MATERIALIZED (
        SELECT
            (SELECT v2 FROM cells WHERE ri = 1 AND ci = 1)
                AS t11,
            (SELECT v2 FROM cells WHERE ri = 1 AND ci = 2)
                AS t12,
            (SELECT v2 FROM cells WHERE ri = 2 AND ci = 1)
                AS t21,
            (SELECT v2 FROM cells WHERE ri = 2 AND ci = 2)
                AS t22,
            (SELECT v2 FROM cells WHERE ri = 3 AND ci = 1)
                AS t31,
            (SELECT v2 FROM cells WHERE ri = 3 AND ci = 2)
                AS t32,
            CAST(0 AS BIGINT) AS r1, CAST(0 AS BIGINT) AS r2,
            CAST(0 AS BIGINT) AS r3,
            CAST(0 AS BIGINT) AS c1, CAST(0 AS BIGINT) AS c2,
            CAST(0 AS BIGINT) AS g
    ),
    {stages_sql}
    SELECT g AS grand2,
           CAST(g AS DOUBLE) / 2.0 AS grand_cents,
           greatest(abs(r1), abs(r2), abs(r3)) AS max_row2,
           greatest(abs(c1), abs(c2)) AS max_col2,
           greatest(abs(t11), abs(t12), abs(t21), abs(t22),
                    abs(t31), abs(t32)) AS max_resid2
    FROM s4
    """
    return q, sql


def build_wave294_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("lineitem_median_polish",) + _polish_query()))
    return queries, oracles
