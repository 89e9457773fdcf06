"""Wave-161 queries: rank-2 NMF topic model, price-ending audit.

- source_nmf_rank2: a rank-2 NMF "topic model" of the source x
  token count matrix trained with THREE Lee-Seung multiplicative
  updates — the third (after GMM-EM and Sinkhorn) and most
  intricate bitwise-replayed training loop. Every matrix product
  entry is a fold in a fixed index order (sources for W'V/W'W,
  tokens for VH'/HH', k2 for the 2-term inner products),
  deterministic parity-split initialization, and the reported
  Frobenius reconstruction error folds cells in (source, token)
  order. The oracle generates 8 MATERIALIZED CTE layers per
  iteration.
- lineitem_price_endings: the pricing-psychology audit — the
  distribution of the last two cent digits of extended prices,
  chi-square against uniform(100), and the top-3 endings. All
  integer until the chi-square division.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .queries import SQL_TOK, corpus_ds
from ._scaffold import read_cols

NMF_ITERS = 3
NMF_EPS = 1e-9


# --------------------------------------------------------- source_nmf_rank2
def _nmf_query(iters: int = NMF_ITERS):
    def q(sf_dir: str):
        from ..stages.rollup import _flat_tokens
        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "source": pa.array([], type=pa.string()),
                "token": pa.array([], type=pa.int64()),
                "cnt": pa.array([], type=pa.int64()),
            })
            if "tokens" not in t.column_names or t.num_rows == 0:
                return empty
            values, lengths = _flat_tokens(t)
            if values.size == 0:
                return empty
            src = np.asarray(t.column("source").to_pylist())
            shift = np.int64(1 << 21)
            names, inv = np.unique(src, return_inverse=True)
            keys = (np.repeat(inv, lengths).astype(np.int64)
                    * shift + values.astype(np.int64))
            uk, cnt = np.unique(keys, return_counts=True)
            return pa.table({
                "source": pa.array(names[uk // shift],
                                   type=pa.string()),
                "token": pa.array(uk % shift,
                                  type=pa.int64()),
                "cnt": pa.array(cnt.astype(np.int64)),
            })

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by(["source", "token"]).aggregate(
                [("cnt", "sum")])
            return pa.table({
                "source": g.column("source"),
                "token": g.column("token").cast(pa.int64()),
                "cnt": g.column("cnt_sum").cast(pa.int64()),
            })

        refs = list(
            corpus_ds(sf_dir)
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        cells = tree_reduce_tables(refs, merge).to_pandas()
        sources = sorted(cells["source"].unique())
        tokens = sorted(int(v)
                        for v in cells["token"].unique())
        si = {s: i for i, s in enumerate(sources)}
        ti = {t: j for j, t in enumerate(tokens)}
        ns, nt = len(sources), len(tokens)
        v = [[0.0] * nt for _ in range(ns)]
        for _, r in cells.iterrows():
            v[si[r["source"]]][ti[int(r["token"])]] = float(
                int(r["cnt"]))

        # deterministic init: W by source parity, H all ones
        w = [[1.0 + float((i + k) % 2) for k in range(2)]
             for i in range(ns)]
        hm = [[1.0] * nt for _ in range(2)]

        for _it in range(iters):
            # H update
            wtv = [[0.0] * nt for _ in range(2)]
            for k in range(2):
                for j in range(nt):
                    acc = 0.0
                    for i in range(ns):
                        acc = acc + w[i][k] * v[i][j]
                    wtv[k][j] = acc
            wtw = [[0.0] * 2 for _ in range(2)]
            for k1 in range(2):
                for k2 in range(2):
                    acc = 0.0
                    for i in range(ns):
                        acc = acc + w[i][k1] * w[i][k2]
                    wtw[k1][k2] = acc
            h_new = [[0.0] * nt for _ in range(2)]
            for k in range(2):
                for j in range(nt):
                    den = 0.0
                    for k2 in range(2):
                        den = den + wtw[k][k2] * hm[k2][j]
                    h_new[k][j] = hm[k][j] * (
                        wtv[k][j] / (den + NMF_EPS))
            hm = h_new
            # W update
            vht = [[0.0] * 2 for _ in range(ns)]
            for i in range(ns):
                for k in range(2):
                    acc = 0.0
                    for j in range(nt):
                        acc = acc + v[i][j] * hm[k][j]
                    vht[i][k] = acc
            hht = [[0.0] * 2 for _ in range(2)]
            for k1 in range(2):
                for k2 in range(2):
                    acc = 0.0
                    for j in range(nt):
                        acc = acc + hm[k1][j] * hm[k2][j]
                    hht[k1][k2] = acc
            w_new = [[0.0] * 2 for _ in range(ns)]
            for i in range(ns):
                for k in range(2):
                    den = 0.0
                    for k2 in range(2):
                        den = den + w[i][k2] * hht[k2][k]
                    w_new[i][k] = w[i][k] * (
                        vht[i][k] / (den + NMF_EPS))
            w = w_new

        err = 0.0
        for i in range(ns):
            for j in range(nt):
                rec = 0.0
                for k in range(2):
                    rec = rec + w[i][k] * hm[k][j]
                d = v[i][j] - rec
                err = err + d * d
        tot = 0.0
        for i in range(ns):
            for j in range(nt):
                tot = tot + v[i][j] * v[i][j]
        return pa.table({
            "n_sources": pa.array([ns], type=pa.int64()),
            "n_tokens": pa.array([nt], type=pa.int64()),
            "frob_err": pa.array([err], type=pa.float64()),
            "err_ratio": pa.array([err / tot],
                                  type=pa.float64()),
            "w_0_0": pa.array([w[0][0]], type=pa.float64()),
            "h_0_0": pa.array([hm[0][0]],
                              type=pa.float64()),
        })

    eps = repr(NMF_EPS)
    layers = []
    wp, hp = "w0", "h0"
    for it in range(1, iters + 1):
        layers.append(f"""
    wtv{it} AS MATERIALIZED (
        SELECT w.k, v.tj,
               list_reduce(list_prepend(0.0e0,
                   list(w.val * v.val ORDER BY w.si)),
                   (x, y) -> x + y) AS val
        FROM {wp} w JOIN vmat v ON v.si = w.si
        GROUP BY w.k, v.tj
    ),
    wtw{it} AS MATERIALIZED (
        SELECT a.k AS k1, b.k AS k2,
               list_reduce(list_prepend(0.0e0,
                   list(a.val * b.val ORDER BY a.si)),
                   (x, y) -> x + y) AS val
        FROM {wp} a JOIN {wp} b ON b.si = a.si
        GROUP BY a.k, b.k
    ),
    h{it} AS MATERIALIZED (
        SELECT h.k, h.tj,
               h.val * (wtv.val /
                   (list_reduce(list_prepend(0.0e0,
                        list(ww.val * h2.val
                             ORDER BY ww.k2)),
                        (x, y) -> x + y) + {eps})) AS val
        FROM {hp} h
        JOIN wtv{it} wtv ON wtv.k = h.k AND wtv.tj = h.tj
        JOIN wtw{it} ww ON ww.k1 = h.k
        JOIN {hp} h2 ON h2.k = ww.k2 AND h2.tj = h.tj
        GROUP BY h.k, h.tj, h.val, wtv.val
    ),
    vht{it} AS MATERIALIZED (
        SELECT v.si, h.k,
               list_reduce(list_prepend(0.0e0,
                   list(v.val * h.val ORDER BY v.tj)),
                   (x, y) -> x + y) AS val
        FROM vmat v JOIN h{it} h ON h.tj = v.tj
        GROUP BY v.si, h.k
    ),
    hht{it} AS MATERIALIZED (
        SELECT a.k AS k1, b.k AS k2,
               list_reduce(list_prepend(0.0e0,
                   list(a.val * b.val ORDER BY a.tj)),
                   (x, y) -> x + y) AS val
        FROM h{it} a JOIN h{it} b ON b.tj = a.tj
        GROUP BY a.k, b.k
    ),
    w{it} AS MATERIALIZED (
        SELECT w.si, w.k,
               w.val * (vht.val /
                   (list_reduce(list_prepend(0.0e0,
                        list(w2.val * hh.val
                             ORDER BY w2.k)),
                        (x, y) -> x + y) + {eps})) AS val
        FROM {wp} w
        JOIN vht{it} vht ON vht.si = w.si AND vht.k = w.k
        JOIN hht{it} hh ON hh.k2 = w.k
        JOIN {wp} w2 ON w2.si = w.si AND w2.k = hh.k1
        GROUP BY w.si, w.k, w.val, vht.val
    )""")
        wp, hp = f"w{it}", f"h{it}"
    layers_sql = ",".join(layers)

    sql = f"""
    WITH tok AS ({SQL_TOK}),
    tc AS (
        SELECT source, token, CAST(count(*) AS BIGINT) AS c
        FROM tok GROUP BY source, token
    ),
    srcs AS (
        SELECT source,
               CAST(row_number() OVER (ORDER BY source) - 1
                    AS BIGINT) AS si
        FROM (SELECT DISTINCT source FROM tc)
    ),
    toks AS (
        SELECT token,
               CAST(row_number() OVER (ORDER BY token) - 1
                    AS BIGINT) AS tj
        FROM (SELECT DISTINCT token FROM tc)
    ),
    vmat AS MATERIALIZED (
        SELECT s.si, t.tj,
               CAST(COALESCE(tc.c, 0) AS DOUBLE) AS val
        FROM srcs s CROSS JOIN toks t
        LEFT JOIN tc ON tc.source = s.source
                    AND tc.token = t.token
    ),
    w0 AS MATERIALIZED (
        SELECT s.si, k.k,
               1.0e0 + CAST((s.si + k.k) % 2 AS DOUBLE)
                   AS val
        FROM srcs s
        CROSS JOIN (SELECT unnest(generate_series(0, 1))
                        AS k) k
    ),
    h0 AS MATERIALIZED (
        SELECT k.k, t.tj, 1.0e0 AS val
        FROM (SELECT unnest(generate_series(0, 1)) AS k) k
        CROSS JOIN toks t
    ),{layers_sql},
    rec AS (
        SELECT v.si, v.tj,
               v.val - list_reduce(list_prepend(0.0e0,
                   list(w.val * h.val ORDER BY w.k)),
                   (x, y) -> x + y) AS d
        FROM vmat v
        JOIN w{iters} w ON w.si = v.si
        JOIN h{iters} h ON h.k = w.k AND h.tj = v.tj
        GROUP BY v.si, v.tj, v.val
    ),
    fro AS (
        SELECT
            list_reduce(list_prepend(0.0e0,
                list(d * d ORDER BY si, tj)),
                (x, y) -> x + y) AS err
        FROM rec
    ),
    tot AS (
        SELECT
            list_reduce(list_prepend(0.0e0,
                list(val * val ORDER BY si, tj)),
                (x, y) -> x + y) AS t
        FROM vmat
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM srcs)
               AS n_sources,
           (SELECT CAST(count(*) AS BIGINT) FROM toks)
               AS n_tokens,
           fro.err AS frob_err,
           fro.err / tot.t AS err_ratio,
           (SELECT val FROM w{iters}
            WHERE si = 0 AND k = 0) AS w_0_0,
           (SELECT val FROM h{iters}
            WHERE k = 0 AND tj = 0) AS h_0_0
    FROM fro CROSS JOIN tot
    """
    return q, sql


# ------------------------------------------------------ lineitem_price_endings
def _endings_query():
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables
        from .queries import _num_read_blocks

        def partial(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "ending": pa.array([], type=pa.int64()),
                "c": pa.array([], type=pa.int64()),
            })
            if ("l_extendedprice" not in t.column_names
                    or t.num_rows == 0):
                return empty
            cents = np.round(
                t.column("l_extendedprice").to_numpy(
                    zero_copy_only=False) * 100.0
            ).astype(np.int64)
            e = cents % 100
            uv, c = np.unique(e, return_counts=True)
            return pa.table({
                "ending": pa.array(uv.astype(np.int64)),
                "c": pa.array(c.astype(np.int64)),
            })

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by("ending").aggregate([("c", "sum")])
            return pa.table({
                "ending": g.column("ending").cast(pa.int64()),
                "c": g.column("c_sum").cast(pa.int64()),
            })

        refs = list(
            read_cols(sf_dir, "lineitem", ["l_extendedprice"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        h = tree_reduce_tables(refs, merge).to_pandas()
        n = int(h["c"].sum())
        e_exp = float(n) / 100.0
        chi2 = 0.0
        cnt = {int(r["ending"]): int(r["c"])
               for _, r in h.iterrows()}
        for d in range(100):
            o = float(cnt.get(d, 0))
            chi2 = chi2 + ((o - e_exp) * (o - e_exp)) / e_exp
        top = sorted(cnt.items(),
                     key=lambda kv: (-kv[1], kv[0]))[:3]
        return pa.table({
            "n_rows": pa.array([n], type=pa.int64()),
            "chi2_uniform": pa.array([chi2],
                                     type=pa.float64()),
            "top1_ending": pa.array([top[0][0]],
                                    type=pa.int64()),
            "top1_count": pa.array([top[0][1]],
                                   type=pa.int64()),
        })

    sql = """
    WITH endings AS (
        SELECT CAST(round_even(l_extendedprice * 100, 0)
                    AS BIGINT) % 100 AS e,
               CAST(count(*) AS BIGINT) AS c
        FROM lineitem GROUP BY 1
    ),
    nn AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM endings),
    grid AS (
        SELECT g.d, CAST(COALESCE(endings.c, 0) AS DOUBLE)
                   AS o
        FROM (SELECT unnest(generate_series(0, 99)) AS d) g
        LEFT JOIN endings ON endings.e = g.d
    ),
    chi AS (
        SELECT list_reduce(list_prepend(0.0e0,
                   list(((o - CAST(nn.n AS DOUBLE) / 100.0e0)
                         * (o - CAST(nn.n AS DOUBLE)
                            / 100.0e0))
                        / (CAST(nn.n AS DOUBLE) / 100.0e0)
                        ORDER BY d)),
                   (x, y) -> x + y) AS chi2
        FROM grid CROSS JOIN nn GROUP BY nn.n
    ),
    top AS (
        SELECT e, c FROM endings
        ORDER BY c DESC, e ASC LIMIT 1
    )
    SELECT nn.n AS n_rows,
           chi.chi2 AS chi2_uniform,
           top.e AS top1_ending,
           top.c AS top1_count
    FROM nn CROSS JOIN chi CROSS JOIN top
    """
    return q, sql


def build_wave161_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("source_nmf_rank2",) + _nmf_query()))
    add(*(("lineitem_price_endings",) + _endings_query()))
    return queries, oracles
