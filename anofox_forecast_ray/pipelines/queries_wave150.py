"""Wave-150 queries: Taylor's law, rank-biased overlap.

- source_taylor_law: Taylor's fluctuation-scaling law — across the
  20 sources, ln(variance of doc length) regressed on ln(mean doc
  length). Per-source moments are exact integers; each source
  contributes exactly two scalar lns, the centered OLS folds walk
  sources in ascending name order, and the slope b (power-law
  exponent) plus r^2 are scalar arithmetic. b near 2 means
  aggregation-dominated variance, near 1 Poisson-like.
- source_rank_rbo: rank-biased overlap (p = 0.9, depth 50) between
  the token-frequency rankings of the two multiplicative-hash doc
  halves — the IR-grade answer to "is the vocabulary ranking
  stable under resampling?". Rankings break count ties on the
  integer token; prefix overlaps X_d are integers; the truncated
  RBO folds depths in order with the p^(d-1) weight carried in the
  accumulator.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from .queries import SQL_TOK, corpus_ds

HASH_A = 2654435761
RBO_P = 0.9
RBO_K = 50


# ---------------------------------------------------------- source_taylor_law
def _taylor_query():
    def q(sf_dir: str):
        from ..stages.rollup import _flat_tokens
        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "source": pa.array([], type=pa.string()),
                "n": pa.array([], type=pa.int64()),
                "s": pa.array([], type=pa.int64()),
                "ss": pa.array([], type=pa.int64()),
            })
            if "tokens" not in t.column_names or t.num_rows == 0:
                return empty
            _values, lengths = _flat_tokens(t)
            src = np.asarray(t.column("source").to_pylist())
            names, inv = np.unique(src, return_inverse=True)
            ln = lengths.astype(np.int64)
            n = np.bincount(inv, minlength=names.size)
            s = np.bincount(inv, weights=ln.astype(np.float64)
                            ).astype(np.int64)
            ss = np.bincount(inv, weights=(ln * ln).astype(
                np.float64)).astype(np.int64)
            return pa.table({
                "source": pa.array(names, type=pa.string()),
                "n": pa.array(n.astype(np.int64)),
                "s": pa.array(s),
                "ss": pa.array(ss),
            })

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by("source").aggregate(
                [("n", "sum"), ("s", "sum"), ("ss", "sum")])
            return pa.table({
                "source": g.column("source"),
                "n": g.column("n_sum").cast(pa.int64()),
                "s": g.column("s_sum").cast(pa.int64()),
                "ss": g.column("ss_sum").cast(pa.int64()),
            })

        refs = list(
            corpus_ds(sf_dir)
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        m = tree_reduce_tables(refs, merge).to_pandas()
        m = m.sort_values("source").reset_index(drop=True)
        xs = []
        ys = []
        for _, r in m.iterrows():
            nf = float(int(r["n"]))
            mean = float(int(r["s"])) / nf
            var = (float(int(r["ss"]))
                   - (float(int(r["s"]))
                      * float(int(r["s"]))) / nf) / nf
            xs.append(math.log(mean))
            ys.append(math.log(var))
        k = len(xs)
        kf = float(k)
        sx = 0.0
        sy = 0.0
        for i in range(k):
            sx = sx + xs[i]
            sy = sy + ys[i]
        mx = sx / kf
        my = sy / kf
        sxy = 0.0
        sxx = 0.0
        syy = 0.0
        for i in range(k):
            dx = xs[i] - mx
            dy = ys[i] - my
            sxy = sxy + dx * dy
            sxx = sxx + dx * dx
            syy = syy + dy * dy
        b = sxy / sxx
        a = my - b * mx
        r2 = (sxy * sxy) / (sxx * syy)
        return pa.table({
            "n_sources": pa.array([k], type=pa.int64()),
            "slope_b": pa.array([b], type=pa.float64()),
            "intercept": pa.array([a], type=pa.float64()),
            "r2": pa.array([r2], type=pa.float64()),
        })

    sql = """
    WITH lens AS (
        SELECT source, CAST(length(text) AS BIGINT) AS len
        FROM documents
    ),
    per AS (
        SELECT source,
               CAST(count(*) AS DOUBLE) AS nf,
               CAST(sum(len) AS BIGINT) AS s,
               CAST(sum(CAST(len AS HUGEINT) * len)
                    AS HUGEINT) AS ss
        FROM lens GROUP BY source
    ),
    xy AS (
        SELECT source,
               ln(CAST(s AS DOUBLE) / nf) AS x,
               ln((CAST(ss AS DOUBLE)
                   - (CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
                     / nf) / nf) AS y
        FROM per
    ),
    mu AS (
        SELECT CAST(count(*) AS BIGINT) AS k,
               list_reduce(list_prepend(0.0e0,
                   list(x ORDER BY source)), (p, v) -> p + v)
                   / CAST(count(*) AS DOUBLE) AS mx,
               list_reduce(list_prepend(0.0e0,
                   list(y ORDER BY source)), (p, v) -> p + v)
                   / CAST(count(*) AS DOUBLE) AS my
        FROM xy
    ),
    folds AS (
        SELECT mu.k, mu.mx, mu.my,
               list_reduce(list_prepend(0.0e0,
                   list((x - mu.mx) * (y - mu.my)
                        ORDER BY source)), (p, v) -> p + v)
                   AS sxy,
               list_reduce(list_prepend(0.0e0,
                   list((x - mu.mx) * (x - mu.mx)
                        ORDER BY source)), (p, v) -> p + v)
                   AS sxx,
               list_reduce(list_prepend(0.0e0,
                   list((y - mu.my) * (y - mu.my)
                        ORDER BY source)), (p, v) -> p + v)
                   AS syy
        FROM xy CROSS JOIN mu
        GROUP BY mu.k, mu.mx, mu.my
    )
    SELECT k AS n_sources,
           sxy / sxx AS slope_b,
           my - (sxy / sxx) * mx AS intercept,
           (sxy * sxy) / (sxx * syy) AS r2
    FROM folds
    """
    return q, sql


# ------------------------------------------------------------ source_rank_rbo
def _rbo_query(p: float = RBO_P, k: int = RBO_K):
    def q(sf_dir: str):
        from ..stages.rollup import _flat_tokens
        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "g": pa.array([], type=pa.int64()),
                "token": pa.array([], type=pa.int64()),
                "cnt": pa.array([], type=pa.int64()),
            })
            if "tokens" not in t.column_names or t.num_rows == 0:
                return empty
            values, lengths = _flat_tokens(t)
            if values.size == 0:
                return empty
            did = t.column("doc_id").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            g = ((did * np.int64(HASH_A)) % np.int64(1 << 32)) \
                >> np.int64(31)
            gr = np.repeat(g, lengths)
            keys = gr.astype(np.int64) * np.int64(1 << 21) \
                + values.astype(np.int64)
            uk, cnt = np.unique(keys, return_counts=True)
            return pa.table({
                "g": pa.array(uk // (1 << 21)),
                "token": pa.array(uk % (1 << 21),
                                  type=pa.int64()),
                "cnt": pa.array(cnt.astype(np.int64)),
            })

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by(["g", "token"]).aggregate(
                [("cnt", "sum")])
            return pa.table({
                "g": g.column("g").cast(pa.int64()),
                "token": g.column("token").cast(pa.int64()),
                "cnt": g.column("cnt_sum").cast(pa.int64()),
            })

        refs = list(
            corpus_ds(sf_dir)
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        m = tree_reduce_tables(refs, merge).to_pandas()

        def ranking(gv):
            sub = m[m["g"] == gv]
            rows = sorted(zip(sub["cnt"], sub["token"]),
                          key=lambda r: (-int(r[0]),
                                         int(r[1])))
            return [int(tok) for _c, tok in rows[:k]]

        ra = ranking(0)
        rb = ranking(1)
        sa = set()
        sb = set()
        rbo = 0.0
        w = 1.0  # p^(d-1)
        xd = 0
        for d in range(1, k + 1):
            if d <= len(ra):
                sa.add(ra[d - 1])
            if d <= len(rb):
                sb.add(rb[d - 1])
            xd = len(sa & sb)
            rbo = rbo + w * (float(xd) / float(d))
            w = w * p
        rbo = (1.0 - p) * rbo
        return pa.table({
            "depth": pa.array([k], type=pa.int64()),
            "overlap_at_k": pa.array([xd], type=pa.int64()),
            "rbo": pa.array([rbo], type=pa.float64()),
        })

    sql = f"""
    WITH tok AS ({SQL_TOK}),
    tc AS (
        SELECT ((CAST(doc_id AS BIGINT) * {HASH_A})
                % 4294967296) // 2147483648 AS g,
               token, CAST(count(*) AS BIGINT) AS cnt
        FROM tok GROUP BY 1, 2
    ),
    ra AS (
        SELECT token, row_number() OVER (
                   ORDER BY cnt DESC, token ASC) AS r
        FROM tc WHERE g = 0
    ),
    rb AS (
        SELECT token, row_number() OVER (
                   ORDER BY cnt DESC, token ASC) AS r
        FROM tc WHERE g = 1
    ),
    depths AS (SELECT unnest(generate_series(1, {k})) AS d),
    xs AS (
        SELECT d.d,
               (SELECT CAST(count(*) AS BIGINT)
                FROM ra JOIN rb ON rb.token = ra.token
                WHERE ra.r <= d.d AND rb.r <= d.d) AS xd
        FROM depths d
    ),
    fold AS (
        SELECT list_reduce(
                   list_prepend([1.0e0, 0.0e0],
                       list_transform(
                           list(CAST(xd AS DOUBLE)
                                / CAST(d AS DOUBLE)
                                ORDER BY d),
                           v -> [v, 0.0e0])),
                   (acc, e) -> [acc[1] * {p!r},
                                acc[2] + acc[1] * e[1]])
                   AS fin
        FROM xs
    )
    SELECT CAST({k} AS BIGINT) AS depth,
           (SELECT xd FROM xs WHERE d = {k}) AS overlap_at_k,
           (1.0e0 - {p!r}) * fold.fin[2] AS rbo
    FROM fold
    """
    return q, sql


def build_wave150_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("source_taylor_law",) + _taylor_query()))
    add(*(("source_rank_rbo",) + _rbo_query()))
    return queries, oracles
