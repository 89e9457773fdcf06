"""Wave-208 queries: Daubechies-4 wavelet energies, Katz FD.

- doc_db4_energy: two levels of the Daubechies-4 DWT over each
  doc's w8 token-window SUM series (the non-trivial sibling of the
  wave-38 Haar energy): analysis taps h0..h3 = ((1±sqrt3)/(4 sqrt2))
  injected as IDENTICAL float literals on both sides, approximation
  a1_k and detail d1_k from the 4-tap stride-2 convolution, detail
  energies e1 = sum d1^2 and e2 (level 2 on a1) folded in k order.
  Docs need >= 12 windows so both levels exist.
- doc_katz_fd: Katz's fractal dimension of the same series:
  FD = log10(m) / (log10(m) + log10(d/L)) with m = n-1 steps,
  L = total path length sum|dx| (exact int) and d = max distance
  from the first point (exact int) — one division, three log10s.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from .queries import SQL_TOK, _num_read_blocks

SQRT3 = math.sqrt(3.0)
SQRT2 = math.sqrt(2.0)
H0 = (1.0 + SQRT3) / (4.0 * SQRT2)
H1 = (3.0 + SQRT3) / (4.0 * SQRT2)
H2 = (3.0 - SQRT3) / (4.0 * SQRT2)
H3 = (1.0 - SQRT3) / (4.0 * SQRT2)
MIN_WIN = 12


def db4_energies(s):
    """(e1, e2) detail energies; folds in k order. s: int list."""
    def level(x):
        n = len(x)
        n1 = (n - 2) // 2
        a = []
        e = 0.0
        for k in range(n1):
            x0, x1, x2, x3 = (float(x[2 * k]),
                              float(x[2 * k + 1]),
                              float(x[2 * k + 2]),
                              float(x[2 * k + 3]))
            ak = H0 * x0 + H1 * x1 + H2 * x2 + H3 * x3
            dk = H3 * x0 - H2 * x1 + H1 * x2 - H0 * x3
            a.append(ak)
            e = e + dk * dk
        return a, e

    a1, e1 = level(s)
    _, e2 = level(a1)
    return e1, e2


def katz_fd(s):
    """(L, d, fd) from the int series."""
    L = 0
    d = 0
    for i in range(1, len(s)):
        L += abs(int(s[i]) - int(s[i - 1]))
        dd = abs(int(s[i]) - int(s[0]))
        if dd > d:
            d = dd
    m = len(s) - 1
    fd = (math.log10(float(m))
          / (math.log10(float(m)) + math.log10(d / L)))
    return L, d, fd


# ------------------------------------------------------ doc_db4_energy
def _db4_query(width: int = 8):
    def q(sf_dir: str):
        from .queries import _cast, corpus_ds

        def fn(t: pa.Table) -> pa.Table:
            toks = t.column("tokens")
            dids = t.column("doc_id").to_pylist()
            out = {"doc_id": [], "e1": [], "e2": []}
            for i in range(len(dids)):
                arr = np.asarray(toks[i].as_py(), dtype=np.int64)
                if arr.size == 0:
                    continue
                nw = (arr.size + width - 1) // width
                if nw < MIN_WIN:
                    continue
                bounds = np.arange(0, arr.size, width)
                s = [int(v) for v in np.add.reduceat(arr, bounds)]
                e1, e2 = db4_energies(s)
                out["doc_id"].append(dids[i])
                out["e1"].append(e1)
                out["e2"].append(e2)
            return pa.table({
                "doc_id": pa.array(out["doc_id"],
                                   type=pa.string()),
                "e1": pa.array(out["e1"], type=pa.float64()),
                "e2": pa.array(out["e2"], type=pa.float64()),
            })

        ds = corpus_ds(sf_dir).map_batches(
            fn, batch_format="pyarrow")
        return _cast(ds, {"doc_id": pa.string(),
                          "e1": pa.float64(),
                          "e2": pa.float64()})

    def a_expr(src, k):
        return (f"{H0!r} * {src}[2*{k} + 1] "
                f"+ {H1!r} * {src}[2*{k} + 2] "
                f"+ {H2!r} * {src}[2*{k} + 3] "
                f"+ {H3!r} * {src}[2*{k} + 4]")

    def d_expr(src, k):
        return (f"{H3!r} * {src}[2*{k} + 1] "
                f"- {H2!r} * {src}[2*{k} + 2] "
                f"+ {H1!r} * {src}[2*{k} + 3] "
                f"- {H0!r} * {src}[2*{k} + 4]")

    sql = f"""
    WITH tok AS ({SQL_TOK}),
    w AS (
        SELECT doc_id, pos // {width} AS wid,
               CAST(sum(token) AS DOUBLE) AS s
        FROM tok GROUP BY doc_id, wid
    ),
    l AS (
        SELECT doc_id, list(s ORDER BY wid) AS xs,
               CAST(count(*) AS BIGINT) AS n
        FROM w GROUP BY doc_id
        HAVING count(*) >= {MIN_WIN}
    ),
    lvl1 AS (
        SELECT doc_id, n,
               list_transform(
                   generate_series(0,
                       CAST((n - 2) // 2 - 1 AS INTEGER)),
                   k -> {a_expr("xs", "k")}) AS a1,
               list_reduce(list_prepend(0.0e0,
                   list_transform(
                       generate_series(0,
                           CAST((n - 2) // 2 - 1 AS INTEGER)),
                       k -> ({d_expr("xs", "k")})
                            * ({d_expr("xs", "k")}))),
                   (p, v) -> p + v) AS e1
        FROM l
    )
    SELECT doc_id, e1,
           list_reduce(list_prepend(0.0e0,
               list_transform(
                   generate_series(0,
                       CAST((len(a1) - 2) // 2 - 1
                            AS INTEGER)),
                   k -> ({d_expr("a1", "k")})
                        * ({d_expr("a1", "k")}))),
               (p, v) -> p + v) AS e2
    FROM lvl1
    """
    return q, sql


# -------------------------------------------------------- doc_katz_fd
def _katz_query(width: int = 8):
    def q(sf_dir: str):
        from .queries import _cast, corpus_ds

        def fn(t: pa.Table) -> pa.Table:
            toks = t.column("tokens")
            dids = t.column("doc_id").to_pylist()
            out = {"doc_id": [], "path_l": [], "diam_d": [],
                   "katz_fd": []}
            for i in range(len(dids)):
                arr = np.asarray(toks[i].as_py(), dtype=np.int64)
                if arr.size == 0:
                    continue
                nw = (arr.size + width - 1) // width
                if nw < 4:
                    continue
                bounds = np.arange(0, arr.size, width)
                s = [int(v) for v in np.add.reduceat(arr, bounds)]
                L, d, fd = katz_fd(s)
                if L == 0 or d == 0:
                    continue
                out["doc_id"].append(dids[i])
                out["path_l"].append(L)
                out["diam_d"].append(d)
                out["katz_fd"].append(fd)
            return pa.table({
                "doc_id": pa.array(out["doc_id"],
                                   type=pa.string()),
                "path_l": pa.array(out["path_l"],
                                   type=pa.int64()),
                "diam_d": pa.array(out["diam_d"],
                                   type=pa.int64()),
                "katz_fd": pa.array(out["katz_fd"],
                                    type=pa.float64()),
            })

        ds = corpus_ds(sf_dir).map_batches(
            fn, batch_format="pyarrow")
        return _cast(ds, {"doc_id": pa.string(),
                          "path_l": pa.int64(),
                          "diam_d": pa.int64(),
                          "katz_fd": pa.float64()})

    sql = f"""
    WITH tok AS ({SQL_TOK}),
    w AS (
        SELECT doc_id, pos // {width} AS wid,
               CAST(sum(token) AS BIGINT) AS s
        FROM tok GROUP BY doc_id, wid
    ),
    f AS (
        SELECT doc_id, wid, s,
               lag(s) OVER win AS prev,
               first_value(s) OVER win AS s0,
               CAST(count(*) OVER (PARTITION BY doc_id)
                    AS BIGINT) AS n
        FROM w WINDOW win AS (PARTITION BY doc_id ORDER BY wid)
    ),
    agg AS (
        SELECT doc_id, max(n) AS n,
               CAST(sum(abs(s - prev)) AS BIGINT) AS l,
               CAST(max(abs(s - s0)) AS BIGINT) AS d
        FROM f WHERE prev IS NOT NULL
        GROUP BY doc_id
        HAVING max(n) >= 4
    )
    SELECT doc_id, l AS path_l, d AS diam_d,
           log10(CAST(n - 1 AS DOUBLE))
           / (log10(CAST(n - 1 AS DOUBLE))
              + log10(CAST(d AS DOUBLE) / CAST(l AS DOUBLE)))
               AS katz_fd
    FROM agg
    WHERE l > 0 AND d > 0
    """
    return q, sql


def build_wave208_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("doc_db4_energy",) + _db4_query()))
    add(*(("doc_katz_fd",) + _katz_query()))
    return queries, oracles
