"""Wave-273 query: rank-1 PPMI factorization of the bigram matrix.

corpus_pmi_svd1: the top singular direction of the positive-PMI
matrix of within-doc token bigrams — the Levy-Goldberg bridge
between count models and embeddings, at rank 1.  PPMI cells
m_ab = max(0, ln(n_ab·N/(n_a·n_b))) come from exact integer counts;
EIGHT power-iteration steps on MᵀM run as strictly ordered float
folds (u = Mv folded in b order, w = Mᵀu folded in a order, one
norm per step) — the sixth bitwise-replayed training loop, with the
SQL layers MATERIALIZED per the NOTES rule.  Emits σ1, its share of
the squared Frobenius energy, and the dominant context token.
Verified against numpy SVD (σ1 to power-iteration tolerance) and an
independently coded numpy power iteration (1e-9).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

N_POW = 8


def pmi_svd1(bi):
    """(sigma1, energy_share, top_token) from {(a,b): n}."""
    na = {}
    nb = {}
    n = 0
    for (a, b), c in bi.items():
        na[a] = na.get(a, 0) + c
        nb[b] = nb.get(b, 0) + c
        n += c
    rows = sorted(na)
    cols = sorted(nb)
    m = {}
    frob = 0.0
    for a in rows:
        for b in cols:
            c = bi.get((a, b), 0)
            if c == 0:
                continue
            v = math.log(float(c * n) / float(na[a] * nb[b]))
            if v > 0.0:
                m[(a, b)] = v
                frob = frob + v * v
    k = len(cols)
    v = [1.0 / math.sqrt(float(k))] * k
    for _ in range(N_POW):
        u = []
        for a in rows:
            s = 0.0
            for j, b in enumerate(cols):
                s = s + m.get((a, b), 0.0) * v[j]
            u.append(s)
        w = []
        for j, b in enumerate(cols):
            s = 0.0
            for i, a in enumerate(rows):
                s = s + m.get((a, b), 0.0) * u[i]
            w.append(s)
        nrm = 0.0
        for x in w:
            nrm = nrm + x * x
        nrm = math.sqrt(nrm)
        v = [x / nrm for x in w]
    u = []
    for a in rows:
        s = 0.0
        for j, b in enumerate(cols):
            s = s + m.get((a, b), 0.0) * v[j]
        u.append(s)
    s1sq = 0.0
    for x in u:
        s1sq = s1sq + x * x
    sigma1 = math.sqrt(s1sq)
    share = s1sq / frob
    best = None
    for j, b in enumerate(cols):
        av = abs(v[j])
        if best is None or av > best[0]:
            best = (av, b)
    return sigma1, share, best[1]


def _pmi_query():
    def q(sf_dir: str):
        from .queries import corpus_ds
        from ..stages.rollup import _flat_tokens
        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "key": pa.array([], type=pa.int64()),
                "cnt": pa.array([], type=pa.int64()),
            })
            if "tokens" not in t.column_names or t.num_rows == 0:
                return empty
            values, lengths = _flat_tokens(t)
            if values.size < 2:
                return empty
            row = np.repeat(
                np.arange(lengths.size, dtype=np.int64), lengths)
            v = values.astype(np.int64)
            ok = row[:-1] == row[1:]
            key = (v[:-1][ok] << 21) | v[1:][ok]
            uk, cnt = np.unique(key, return_counts=True)
            return pa.table({
                "key": pa.array(uk),
                "cnt": pa.array(cnt.astype(np.int64)),
            })

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by("key").aggregate([("cnt", "sum")])
            return pa.table({
                "key": g.column("key").cast(pa.int64()),
                "cnt": g.column("cnt_sum").cast(pa.int64()),
            })

        refs = list(
            corpus_ds(sf_dir)
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        h = tree_reduce_tables(refs, merge).to_pandas()
        mask = (1 << 21) - 1
        bi = {(int(kk) >> 21, int(kk) & mask): int(nn)
              for kk, nn in zip(h["key"], h["cnt"])}
        sigma1, share, top = pmi_svd1(bi)
        return pa.table({
            "sigma1": pa.array([sigma1], type=pa.float64()),
            "energy_share": pa.array([share], type=pa.float64()),
            "top_context": pa.array([top], type=pa.int64()),
        })

    from .queries import SQL_TOK

    pow_layers = []
    for t in range(1, N_POW + 1):
        pow_layers.append(f"""
    u{t} AS MATERIALIZED (
        SELECT m.a,
               list_reduce(list_prepend(0.0e0,
                   (SELECT list(m2.m * vv.v ORDER BY m2.b)
                    FROM m m2 JOIN v{t - 1} vv ON m2.b = vv.b
                    WHERE m2.a = m.a)),
                   (x, y) -> x + y) AS u
        FROM (SELECT DISTINCT a FROM m) m
    ),
    w{t} AS MATERIALIZED (
        SELECT b.b,
               list_reduce(list_prepend(0.0e0,
                   (SELECT list(m2.m * uu.u ORDER BY m2.a)
                    FROM m m2 JOIN u{t} uu ON m2.a = uu.a
                    WHERE m2.b = b.b)),
                   (x, y) -> x + y) AS w
        FROM (SELECT DISTINCT b FROM m) b
    ),
    n{t} AS MATERIALIZED (
        SELECT sqrt(list_reduce(list_prepend(0.0e0,
                   (SELECT list(w * w ORDER BY b) FROM w{t})),
                   (x, y) -> x + y)) AS nrm
    ),
    v{t} AS MATERIALIZED (
        SELECT b, w / (SELECT nrm FROM n{t}) AS v FROM w{t}
    )""")
    pow_sql = ",".join(pow_layers)

    sql = f"""
    WITH tok AS ({SQL_TOK}),
    big AS (
        SELECT token AS a,
               lead(token) OVER (PARTITION BY doc_id
                                 ORDER BY pos) AS b
        FROM tok
    ),
    h AS (
        SELECT a, b, CAST(count(*) AS BIGINT) AS n
        FROM big WHERE b IS NOT NULL GROUP BY a, b
    ),
    ma AS (SELECT a, CAST(sum(n) AS BIGINT) AS na
           FROM h GROUP BY a),
    mb AS (SELECT b, CAST(sum(n) AS BIGINT) AS nb
           FROM h GROUP BY b),
    nn AS (SELECT CAST(sum(n) AS BIGINT) AS n FROM h),
    m AS MATERIALIZED (
        SELECT h.a, h.b,
               ln(CAST(h.n * nn.n AS DOUBLE)
                  / CAST(ma.na * mb.nb AS DOUBLE)) AS m
        FROM h JOIN ma ON h.a = ma.a
        JOIN mb ON h.b = mb.b CROSS JOIN nn
        WHERE ln(CAST(h.n * nn.n AS DOUBLE)
                 / CAST(ma.na * mb.nb AS DOUBLE)) > 0.0e0
    ),
    kk AS (SELECT CAST(count(*) AS BIGINT) AS k FROM mb),
    frob AS (
        SELECT list_reduce(list_prepend(0.0e0,
            (SELECT list(m * m ORDER BY a, b) FROM m)),
            (x, y) -> x + y) AS f
    ),
    v0 AS MATERIALIZED (
        SELECT b, 1.0e0 / sqrt(CAST((SELECT k FROM kk)
                                    AS DOUBLE)) AS v
        FROM mb
    ),{pow_sql},
    uf AS (
        SELECT m.a,
               list_reduce(list_prepend(0.0e0,
                   (SELECT list(m2.m * vv.v ORDER BY m2.b)
                    FROM m m2 JOIN v{N_POW} vv ON m2.b = vv.b
                    WHERE m2.a = m.a)),
                   (x, y) -> x + y) AS u
        FROM (SELECT DISTINCT a FROM m) m
    ),
    s1 AS (
        SELECT list_reduce(list_prepend(0.0e0,
            (SELECT list(u * u ORDER BY a) FROM uf)),
            (x, y) -> x + y) AS s1sq
    ),
    top AS (
        SELECT b FROM v{N_POW}
        ORDER BY abs(v) DESC, b ASC LIMIT 1
    )
    SELECT sqrt(s1.s1sq) AS sigma1,
           s1.s1sq / frob.f AS energy_share,
           (SELECT CAST(b AS BIGINT) FROM top) AS top_context
    FROM s1 CROSS JOIN frob
    """
    return q, sql


def build_wave273_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("corpus_pmi_svd1",) + _pmi_query()))
    return queries, oracles
