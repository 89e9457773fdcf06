"""Wave-233 query: Dunn's post-hoc multiple comparisons.

source_dunn_posthoc: the nonparametric post-hoc step after the
wave-71 Kruskal-Wallis — Dunn's z for every source pair over doc
lengths, z_ij = (Rbar_i - Rbar_j) / sqrt((N(N+1)/12 -
sum(t^3-t)/(12(N-1))) (1/n_i + 1/n_j)). DOUBLED pooled midranks
keep tie handling exact-integer: per-source doubled-rank sums
S2_i = sum c*m2 are int64, Rbar2 = S2/n single divisions, and
z = (Rbar2_i - Rbar2_j) / (2 sqrt(Var)). Emits the top-5 pairs by
|z| (DESC, then source names) — "which sources really differ".
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from .queries import _num_read_blocks
from ._scaffold import read_cols

DUNN_TOP = 5


def dunn_pairs(srcs, values, counts):
    """(rows) from (source, value, count) histogram; rows =
    [(sa, sb, z)] top DUNN_TOP by (|z| DESC, sa, sb)."""
    import collections

    per = collections.defaultdict(dict)
    for s, v, c in zip(srcs, values, counts):
        per[s][v] = per[s].get(v, 0) + int(c)
    names = sorted(per)
    allv = sorted({v for s in per for v in per[s]})
    h = {v: sum(per[s].get(v, 0) for s in names) for v in allv}
    N = sum(h.values())
    cum = 0
    m2 = {}
    for v in allv:
        c = h[v]
        m2[v] = 2 * cum + c + 1
        cum += c
    s2 = {}
    ns = {}
    for s in names:
        tot = 0
        n_i = 0
        for v, c in per[s].items():
            tot += c * m2[v]
            n_i += c
        s2[s] = tot
        ns[s] = n_i
    tie = 0
    for v in allv:
        t = h[v]
        tie += t * t * t - t
    base = (N * (N + 1)) / 12.0e0 - tie / (12.0e0 * (N - 1))
    rows = []
    for i in range(len(names)):
        for j in range(i + 1, len(names)):
            a, b = names[i], names[j]
            ra = s2[a] / ns[a]
            rb = s2[b] / ns[b]
            var = base * (1.0e0 / ns[a] + 1.0e0 / ns[b])
            z = (ra - rb) / (2.0e0 * math.sqrt(var))
            rows.append((a, b, z))
    rows.sort(key=lambda r: (-abs(r[2]), r[0], r[1]))
    return rows[:DUNN_TOP]


# ---------------------------------------------- source_dunn_posthoc
def _dunn_query():
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            src = np.asarray(t.column("source").to_pylist(),
                             dtype=object)
            v = t.column("n_chars").to_numpy(
                zero_copy_only=False).astype(np.int64)
            import pandas as pd

            df = pd.DataFrame({"s": src, "v": v})
            g = df.groupby(["s", "v"]).size().reset_index(
                name="c")
            return pa.table({
                "s": pa.array(g["s"], type=pa.string()),
                "v": pa.array(g["v"].astype("int64")),
                "c": pa.array(g["c"].astype("int64")),
            })

        def merge(t: pa.Table) -> pa.Table:
            import pandas as pd

            df = t.to_pandas()
            g = df.groupby(["s", "v"])["c"].sum().reset_index()
            return pa.table({
                "s": pa.array(g["s"], type=pa.string()),
                "v": pa.array(g["v"].astype("int64")),
                "c": pa.array(g["c"].astype("int64")),
            })

        refs = list(
            read_cols(sf_dir, "documents", ["source", "n_chars"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        h = tree_reduce_tables(refs, merge).to_pandas()
        rows = dunn_pairs(list(h["s"]),
                          [int(x) for x in h["v"]],
                          [int(x) for x in h["c"]])
        return pa.table({
            "src_a": pa.array([r[0] for r in rows],
                              type=pa.string()),
            "src_b": pa.array([r[1] for r in rows],
                              type=pa.string()),
            "dunn_z": pa.array([r[2] for r in rows],
                               type=pa.float64()),
        })

    sql = f"""
    WITH g AS (
        SELECT source AS s, n_chars AS v,
               CAST(count(*) AS BIGINT) AS c
        FROM documents GROUP BY 1, 2
    ),
    vv AS (
        SELECT v, CAST(sum(c) AS BIGINT) AS h,
               CAST(coalesce(sum(sum(c)) OVER (ORDER BY v
                    ROWS BETWEEN UNBOUNDED PRECEDING
                    AND 1 PRECEDING), 0) AS BIGINT) AS cum_b
        FROM g GROUP BY v
    ),
    nn AS (
        SELECT CAST(sum(h) AS BIGINT) AS n,
               CAST(sum(h * h * h - h) AS BIGINT) AS tie
        FROM vv
    ),
    ranks AS (
        SELECT g.s, g.c, 2 * vv.cum_b + vv.h + 1 AS m2
        FROM g JOIN vv ON g.v = vv.v
    ),
    per AS (
        SELECT s, CAST(sum(c) AS BIGINT) AS n_i,
               CAST(sum(c * m2) AS BIGINT) AS s2
        FROM ranks GROUP BY s
    ),
    base AS (
        SELECT CAST(n * (n + 1) AS DOUBLE) / 12.0e0
               - CAST(tie AS DOUBLE)
                 / (12.0e0 * CAST(n - 1 AS DOUBLE)) AS b
        FROM nn
    ),
    pairs AS (
        SELECT a.s AS sa, b.s AS sb,
               (CAST(a.s2 AS DOUBLE) / CAST(a.n_i AS DOUBLE)
                - CAST(b.s2 AS DOUBLE) / CAST(b.n_i AS DOUBLE))
               / (2.0e0 * sqrt((SELECT b FROM base)
                   * (1.0e0 / CAST(a.n_i AS DOUBLE)
                      + 1.0e0 / CAST(b.n_i AS DOUBLE)))) AS z
        FROM per a JOIN per b ON a.s < b.s
    ),
    pick AS (
        SELECT sa, sb, z,
               row_number() OVER (ORDER BY abs(z) DESC,
                   sa ASC, sb ASC) AS rk
        FROM pairs
    )
    SELECT sa AS src_a, sb AS src_b, z AS dunn_z
    FROM pick WHERE rk <= {DUNN_TOP}
    """
    return q, sql


def build_wave233_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("source_dunn_posthoc",) + _dunn_query()))
    return queries, oracles
