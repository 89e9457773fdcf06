"""Wave-202 queries: Stuart-Maxwell test, Markov mixing distance.

- events_stuart_maxwell: the Stuart-Maxwell test of MARGINAL
  homogeneity (did the overall mix of states change between
  consecutive steps?) on the 3x3 transition matrix of collapsed
  event classes (browse = click/view, convert = purchase/signup,
  error). For k=3 the (k-1)-dim covariance is 2x2 and closed-form:
  d_i = row_i - col_i, V_ii = row_i + col_i - 2 n_ii,
  V_12 = -(n_12 + n_21), chi2 = (d1^2 V22 - 2 d1 d2 V12 +
  d2^2 V11)/(V11 V22 - V12^2) — an exact integer ratio, ONE
  division. df = 2.
- events_markov_mixing: how fast the event-type Markov chain
  forgets its start: from the point mass on the lexically-first
  type, apply the row-normalized transition matrix K=4 times
  (synchronous replay, component folds in type order) and emit the
  total-variation distance to the EMPIRICAL type distribution
  after each step — the mixing-time diagnostic.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .queries import _num_read_blocks
from ._scaffold import read_cols

CLASS_CASE = {"click": "browse", "view": "browse",
              "purchase": "convert", "signup": "convert",
              "error": "error"}
CLASSES = ["browse", "convert", "error"]
MIX_K = 4


def stuart_maxwell(n: dict) -> tuple[int, int, float]:
    """n: {(i,j): cnt} over CLASSES; returns (num, den, chi2)."""
    def g(i, j):
        return n.get((CLASSES[i], CLASSES[j]), 0)

    row = [sum(g(i, j) for j in range(3)) for i in range(3)]
    col = [sum(g(i, j) for i in range(3)) for j in range(3)]
    d1 = row[0] - col[0]
    d2 = row[1] - col[1]
    v11 = row[0] + col[0] - 2 * g(0, 0)
    v22 = row[1] + col[1] - 2 * g(1, 1)
    v12 = -(g(0, 1) + g(1, 0))
    num = d1 * d1 * v22 - 2 * d1 * d2 * v12 + d2 * d2 * v11
    den = v11 * v22 - v12 * v12
    return num, den, num / den


def markov_mixing(counts: dict, types: list):
    """TV distance to the empirical distribution after each of
    MIX_K synchronous steps from the point mass on types[0]."""
    rowsum = {a: 0 for a in types}
    colall = 0
    for (a, b), c in counts.items():
        rowsum[a] += c
        colall += c
    # empirical stationary proxy: to-state frequencies
    tofreq = {b: 0 for b in types}
    for (a, b), c in counts.items():
        tofreq[b] += c
    pi = {b: tofreq[b] / colall for b in types}
    rho = {t: 0.0 for t in types}
    rho[types[0]] = 1.0
    out = []
    for k in range(1, MIX_K + 1):
        nxt = {}
        for b in types:
            s = 0.0
            for a in types:
                if (a, b) in counts and rowsum[a] > 0:
                    s = s + rho[a] * (counts[(a, b)] / rowsum[a])
            nxt[b] = s
        rho = nxt
        tv = 0.0
        for t in types:
            tv = tv + abs(rho[t] - pi[t])
        out.append((k, 0.5e0 * tv))
    return out


def _class_transitions(sf_dir: str):
    import ray.data as rd

    from ..stages.source_rollup import tree_reduce_tables

    def prune(t: pa.Table) -> pa.Table:
        et = np.asarray(t.column("event_type").to_pylist(),
                        dtype=object)
        cls = np.array([CLASS_CASE[x] for x in et], dtype=object)
        return pa.table({
            "user_id": t.column("user_id").cast(pa.int64()),
            "tus": t.column("ts").cast(pa.int64()),
            "eid": t.column("event_id").cast(pa.int64()),
            "et": pa.array(cls, type=pa.string()),
        })

    def per_user(g: pa.Table) -> pa.Table:
        # eid unique -> total order; (ft, tt) counts via NUL-key sort
        # + run length (exact int counts)
        g = g.sort_by([("tus", "ascending"),
                       ("eid", "ascending")])
        et = np.asarray(g.column("et").to_pylist(), dtype=object)
        if et.size < 2:
            return pa.table(
                {"ft": pa.array([], type=pa.string()),
                 "tt": pa.array([], type=pa.string()),
                 "cnt": pa.array([], type=pa.int64())}
            )
        key = np.asarray(
            [a + "\x00" + b for a, b in zip(et[:-1], et[1:])],
            dtype=object,
        )
        order = np.argsort(key, kind="stable")
        uk, start = np.unique(key[order], return_index=True)
        cnt = np.diff(np.r_[start, key.size]).astype(np.int64)
        sm = [k.split("\x00", 1) for k in uk]
        return pa.table(
            {"ft": pa.array([x[0] for x in sm],
                            type=pa.string()),
             "tt": pa.array([x[1] for x in sm],
                            type=pa.string()),
             "cnt": pa.array(cnt)}
        )

    def merge(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        g = (df.groupby(["ft", "tt"], sort=True)["cnt"].sum()
             .reset_index())
        return pa.table({
            "ft": pa.array(g["ft"], type=pa.string()),
            "tt": pa.array(g["tt"], type=pa.string()),
            "cnt": pa.array(g["cnt"].astype("int64")),
        })

    refs = list(
        read_cols(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])
        .map_batches(prune, batch_format="pyarrow")
        .groupby("user_id")
        .map_groups(per_user, batch_format="pyarrow")
        .to_arrow_refs()
    )
    m = tree_reduce_tables(refs, merge).to_pandas()
    return {(r["ft"], r["tt"]): int(r["cnt"])
            for _, r in m.iterrows()}

_SQL_TRANS = """
    o AS (
        SELECT CASE event_type
                   WHEN 'click' THEN 'browse'
                   WHEN 'view' THEN 'browse'
                   WHEN 'purchase' THEN 'convert'
                   WHEN 'signup' THEN 'convert'
                   ELSE 'error' END AS ft,
               lead(CASE event_type
                        WHEN 'click' THEN 'browse'
                        WHEN 'view' THEN 'browse'
                        WHEN 'purchase' THEN 'convert'
                        WHEN 'signup' THEN 'convert'
                        ELSE 'error' END) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS tt
        FROM events
    ),
    t AS (
        SELECT ft, tt, CAST(count(*) AS BIGINT) AS cnt
        FROM o WHERE tt IS NOT NULL GROUP BY 1, 2
    )
"""


# ------------------------------------------------ events_stuart_maxwell
def _sm_query():
    def q(sf_dir: str):
        counts = _class_transitions(sf_dir)
        num, den, chi2 = stuart_maxwell(counts)
        return pa.table({
            "sm_num": pa.array([num], type=pa.int64()),
            "sm_den": pa.array([den], type=pa.int64()),
            "chi2_sm": pa.array([chi2], type=pa.float64()),
        })

    def cell(i, j):
        return (f"CAST(coalesce((SELECT cnt FROM t WHERE "
                f"ft = '{CLASSES[i]}' AND tt = '{CLASSES[j]}'),"
                f" 0) AS BIGINT)")

    def margin_row(i):
        return " + ".join(cell(i, j) for j in range(3))

    def margin_col(j):
        return " + ".join(cell(i, j) for i in range(3))

    sql = f"""
    WITH {_SQL_TRANS},
    m AS (
        SELECT ({margin_row(0)}) - ({margin_col(0)}) AS d1,
               ({margin_row(1)}) - ({margin_col(1)}) AS d2,
               ({margin_row(0)}) + ({margin_col(0)})
                   - 2 * {cell(0, 0)} AS v11,
               ({margin_row(1)}) + ({margin_col(1)})
                   - 2 * {cell(1, 1)} AS v22,
               -({cell(0, 1)} + {cell(1, 0)}) AS v12
        FROM (SELECT 1)
    )
    SELECT CAST(d1 * d1 * v22 - 2 * d1 * d2 * v12
                + d2 * d2 * v11 AS BIGINT) AS sm_num,
           CAST(v11 * v22 - v12 * v12 AS BIGINT) AS sm_den,
           CAST(d1 * d1 * v22 - 2 * d1 * d2 * v12
                + d2 * d2 * v11 AS DOUBLE)
               / CAST(v11 * v22 - v12 * v12 AS DOUBLE)
               AS chi2_sm
    FROM m
    """
    return q, sql


# ------------------------------------------------ events_markov_mixing
def _mixing_query():
    def q(sf_dir: str):
        import ray.data as rd

        counts = _class_transitions(sf_dir)
        out = markov_mixing(counts, CLASSES)
        tbl = pa.table({
            "k": pa.array([r[0] for r in out], type=pa.int64()),
            "tv_distance": pa.array([r[1] for r in out],
                                    type=pa.float64()),
        })
        return rd.from_arrow(tbl)

    # unrolled synchronous steps; rho_k as 3 columns per layer
    def step(prev, it):
        comps = []
        for b in CLASSES:
            terms = " + ".join(
                f"""coalesce((SELECT CAST(cnt AS DOUBLE)
                     / CAST((SELECT sum(cnt) FROM t t2
                             WHERE t2.ft = '{a}') AS DOUBLE)
                     FROM t WHERE ft = '{a}' AND tt = '{b}'),
                     0.0e0) * {prev}.r_{a}"""
                for a in CLASSES)
            comps.append(f"({terms}) AS r_{b}")
        return (f"rho{it} AS MATERIALIZED (SELECT "
                + ", ".join(comps) + f" FROM {prev})")

    layers = ["rho0 AS MATERIALIZED (SELECT 1.0e0 AS r_browse, "
              "0.0e0 AS r_convert, 0.0e0 AS r_error "
              "FROM (SELECT 1))"]
    for it in range(1, MIX_K + 1):
        layers.append(step(f"rho{it - 1}", it))

    tv_rows = " UNION ALL ".join(
        f"""SELECT CAST({it} AS BIGINT) AS k,
            0.5e0 * (abs(rho{it}.r_browse
                         - (SELECT CAST(sum(cnt) AS DOUBLE)
                            FROM t WHERE tt = 'browse')
                           / (SELECT CAST(sum(cnt) AS DOUBLE)
                              FROM t))
                     + abs(rho{it}.r_convert
                           - (SELECT CAST(sum(cnt) AS DOUBLE)
                              FROM t WHERE tt = 'convert')
                             / (SELECT CAST(sum(cnt) AS DOUBLE)
                                FROM t))
                     + abs(rho{it}.r_error
                           - (SELECT CAST(sum(cnt) AS DOUBLE)
                              FROM t WHERE tt = 'error')
                             / (SELECT CAST(sum(cnt) AS DOUBLE)
                                FROM t))) AS tv_distance
            FROM rho{it}"""
        for it in range(1, MIX_K + 1))

    sql = f"""
    WITH {_SQL_TRANS},
    {",".join(layers)}
    {tv_rows}
    """
    return q, sql


def build_wave202_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("events_stuart_maxwell",) + _sm_query()))
    add(*(("events_markov_mixing",) + _mixing_query()))
    return queries, oracles
