"""Wave-73 queries: hash-randomization permutation test, TPC-H Q13
customer order distribution, and the varint compression scaling fit.

- source_perm_test: two-sample randomization test for the doc-length
  difference between the two lexicographically-first sources. True
  RNG cannot be replayed by an oracle, so the relabeling uses the
  Knuth multiplicative hash parity (the wave-24 SQL-replayable
  pattern): round r assigns doc i to group hash(r*P + doc_id) & 1.
  All per-round sums are integers; the two-sided p-value counts
  rounds with |perm diff| >= |observed diff| (both sides compute the
  identical float expression, so the comparison cannot flip). B=200.
- orders_q13_custdist: TPC-H Q13 — distribution of customers by
  order count INCLUDING the zero bucket (the LEFT JOIN semantics):
  per-customer counts histogram + (total customers - customers with
  orders) for bucket 0. Integer-only; the per-customer count uses
  bounded partial (custkey, cnt) merges (custkey cardinality =
  customers, which is the table being histogrammed anyway).
- corpus_varint_scaling: corpus-level OLS of per-doc varint byte
  size (wave-67 zigzag/LEB128 CASE logic) against token count —
  the compression scaling law bytes ~ a + b*n_tok. ALL moment sums
  are int64 (order-free, tree-reduced partials); slope/intercept/r2
  are scalar Cramer expressions — scale-clean: no ordered float fold
  over an unbounded row set.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .queries import SQL_TOK, _cast, _num_read_blocks, corpus_ds
from ._scaffold import read_cols

PERM_ROUNDS = 200
PERM_MULT = 2654435761
PERM_MOD = 4294967296
PERM_RSTRIDE = 1000003


# ------------------------------------------------------------ source_perm_test
def _perm_test_query(rounds: int = PERM_ROUNDS):
    def q(sf_dir: str):
        from ..stages.rollup import _flat_tokens
        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "source": pa.array([], type=pa.string()),
                "doc": pa.array([], type=pa.int64()),
                "y": pa.array([], type=pa.int64()),
            })
            if "tokens" not in t.column_names or t.num_rows == 0:
                return empty
            _v, lengths = _flat_tokens(t)
            return pa.table({
                "source": t.column("source").cast(pa.string()),
                "doc": pa.array(
                    [int(d)
                     for d in t.column("doc_id").to_pylist()],
                    type=pa.int64()),
                "y": pa.array(np.asarray(lengths,
                                         dtype=np.int64)),
            })

        refs = list(
            corpus_ds(sf_dir)
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        a = tree_reduce_tables(refs, lambda t: t).to_pandas()
        a = a.drop_duplicates("doc")
        srcs = sorted(a["source"].unique())[:2]
        sub = a[a["source"].isin(srcs)].sort_values(
            "doc").reset_index(drop=True)
        doc = sub["doc"].to_numpy(np.int64)
        y = sub["y"].to_numpy(np.int64)
        in_a = (sub["source"] == srcs[0]).to_numpy()
        na = int(in_a.sum())
        nb = int((~in_a).sum())
        sa = int(y[in_a].sum())
        sb = int(y[~in_a].sum())
        obs = float(sa) / float(na) - float(sb) / float(nb)
        n_extreme = 0
        for r in range(1, rounds + 1):
            h = ((r * PERM_RSTRIDE + doc)
                 * PERM_MULT) % PERM_MOD
            grp_a = (h % 2) == 0
            ka = int(grp_a.sum())
            kb = len(doc) - ka
            if ka == 0 or kb == 0:
                continue
            pa_ = int(y[grp_a].sum())
            pb_ = int(y[~grp_a].sum())
            d = float(pa_) / float(ka) - float(pb_) / float(kb)
            if abs(d) >= abs(obs):
                n_extreme += 1
        return pa.table({
            "src_a": pa.array([srcs[0]], type=pa.string()),
            "src_b": pa.array([srcs[1]], type=pa.string()),
            "obs_diff": pa.array([obs], type=pa.float64()),
            "n_rounds": pa.array([rounds], type=pa.int64()),
            "n_extreme": pa.array([n_extreme], type=pa.int64()),
            "p_value": pa.array(
                [float(n_extreme) / float(rounds)],
                type=pa.float64()),
        })

    sql = f"""
    WITH tok AS ({SQL_TOK}),
    len AS (
        SELECT CAST(d.doc_id AS BIGINT) AS doc, d.source,
               CAST(COALESCE(c.n, 0) AS BIGINT) AS y
        FROM documents d
        LEFT JOIN (SELECT doc_id, count(*) AS n
                   FROM tok GROUP BY doc_id) c
          ON c.doc_id = CAST(d.doc_id AS VARCHAR)
    ),
    pick AS (
        SELECT source, row_number() OVER (ORDER BY source) AS rn
        FROM (SELECT DISTINCT source FROM len) ORDER BY source
    ),
    sub AS (
        SELECT len.doc, len.source, len.y,
               (len.source = (SELECT source FROM pick
                              WHERE rn = 1)) AS in_a
        FROM len JOIN pick ON pick.source = len.source
        WHERE pick.rn <= 2
    ),
    obs AS (
        SELECT CAST(sum(CASE WHEN in_a THEN y END) AS DOUBLE)
                   / CAST(sum(CASE WHEN in_a THEN 1 END)
                          AS DOUBLE)
               - CAST(sum(CASE WHEN NOT in_a THEN y END)
                      AS DOUBLE)
                   / CAST(sum(CASE WHEN NOT in_a THEN 1 END)
                          AS DOUBLE) AS d
        FROM sub
    ),
    rounds AS (
        SELECT unnest(generate_series(1, {rounds})) AS r
    ),
    perm AS (
        SELECT r.r,
               CAST(sum(CASE WHEN
                       ((r.r * {PERM_RSTRIDE} + s.doc)
                        * {PERM_MULT}) % {PERM_MOD} % 2 = 0
                   THEN s.y END) AS DOUBLE)
                 / CAST(sum(CASE WHEN
                       ((r.r * {PERM_RSTRIDE} + s.doc)
                        * {PERM_MULT}) % {PERM_MOD} % 2 = 0
                   THEN 1 END) AS DOUBLE)
               - CAST(sum(CASE WHEN
                       ((r.r * {PERM_RSTRIDE} + s.doc)
                        * {PERM_MULT}) % {PERM_MOD} % 2 = 1
                   THEN s.y END) AS DOUBLE)
                 / CAST(sum(CASE WHEN
                       ((r.r * {PERM_RSTRIDE} + s.doc)
                        * {PERM_MULT}) % {PERM_MOD} % 2 = 1
                   THEN 1 END) AS DOUBLE) AS d
        FROM rounds r CROSS JOIN sub s
        GROUP BY r.r
    )
    SELECT (SELECT source FROM pick WHERE rn = 1) AS src_a,
           (SELECT source FROM pick WHERE rn = 2) AS src_b,
           obs.d AS obs_diff,
           CAST({rounds} AS BIGINT) AS n_rounds,
           CAST((SELECT count(*) FROM perm
                 WHERE abs(perm.d) >= abs(obs.d)) AS BIGINT)
               AS n_extreme,
           CAST((SELECT count(*) FROM perm
                 WHERE abs(perm.d) >= abs(obs.d)) AS DOUBLE)
               / {float(rounds)}e0 AS p_value
    FROM obs
    """
    return q, sql


# ---------------------------------------------------------- orders_q13_custdist
def _q13_query():
    def q(sf_dir: str):
        import pyarrow.parquet as pq
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        n_cust = pq.read_metadata(
            f"{sf_dir}/customer.parquet").num_rows

        def partial(t: pa.Table) -> pa.Table:
            if "o_custkey" not in t.column_names or t.num_rows == 0:
                return pa.table({
                    "custkey": pa.array([], type=pa.int64()),
                    "cnt": pa.array([], type=pa.int64()),
                })
            ck = t.column("o_custkey").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            uk, cnt = np.unique(ck, return_counts=True)
            return pa.table({
                "custkey": pa.array(uk),
                "cnt": pa.array(cnt.astype(np.int64)),
            })

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by("custkey").aggregate([("cnt", "sum")])
            return pa.table({
                "custkey": g.column("custkey").cast(pa.int64()),
                "cnt": g.column("cnt_sum").cast(pa.int64()),
            })

        refs = list(
            read_cols(sf_dir, "orders", ["o_custkey"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        a = tree_reduce_tables(refs, merge).to_pandas()
        counts = a["cnt"].to_numpy(np.int64)
        uc, cd = np.unique(counts, return_counts=True)
        zero = n_cust - len(a)
        order_counts = ([0] if zero > 0 else []) + [
            int(v) for v in uc]
        custdist = ([int(zero)] if zero > 0 else []) + [
            int(v) for v in cd]
        out = sorted(zip(order_counts, custdist),
                     key=lambda p: (-p[1], -p[0]))
        return pa.table({
            "c_count": pa.array([p[0] for p in out],
                                type=pa.int64()),
            "custdist": pa.array([p[1] for p in out],
                                 type=pa.int64()),
        })

    sql = """
    WITH oc AS (
        SELECT c.c_custkey,
               CAST(count(o.o_orderkey) AS BIGINT) AS c_count
        FROM customer c
        LEFT JOIN orders o ON o.o_custkey = c.c_custkey
        GROUP BY c.c_custkey
    )
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM oc GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """
    return q, sql


# ------------------------------------------------------ corpus_varint_scaling
def _varint_scaling_query():
    def q(sf_dir: str):
        from ..stages.rollup import _flat_tokens
        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            zero = pa.table({
                "m": pa.array([0], type=pa.int64()),
                "sx": pa.array([0], type=pa.int64()),
                "sy": pa.array([0], type=pa.int64()),
                "sxx": pa.array([0], type=pa.int64()),
                "sxy": pa.array([0], type=pa.int64()),
                "syy": pa.array([0], type=pa.int64()),
            })
            if "tokens" not in t.column_names or t.num_rows == 0:
                return zero
            values, lengths = _flat_tokens(t)
            lens = np.asarray(lengths, dtype=np.int64)
            keep = lens > 0
            if not keep.any():
                return zero
            flat = values.astype(np.int64)
            nd = lens.size
            grp = np.repeat(np.arange(nd), lens)
            delta = np.r_[np.int64(0), flat[1:] - flat[:-1]]
            starts = np.concatenate(
                ([0], np.cumsum(lens)))[:-1]
            first = np.zeros(flat.size, dtype=bool)
            first[starts[keep]] = True
            delta[first] = flat[first]
            zz = np.where(delta >= 0, 2 * delta, -2 * delta - 1)
            nbytes = (1 + (zz >= 128).astype(np.int64)
                      + (zz >= 16384).astype(np.int64)
                      + (zz >= 2097152).astype(np.int64))
            by = np.bincount(
                grp, weights=nbytes, minlength=nd).astype(
                np.int64)[keep]
            x = lens[keep]
            return pa.table({
                "m": pa.array([int(keep.sum())], type=pa.int64()),
                "sx": pa.array([int(x.sum())], type=pa.int64()),
                "sy": pa.array([int(by.sum())], type=pa.int64()),
                "sxx": pa.array([int((x * x).sum())],
                                type=pa.int64()),
                "sxy": pa.array([int((x * by).sum())],
                                type=pa.int64()),
                "syy": pa.array([int((by * by).sum())],
                                type=pa.int64()),
            })

        def merge(t: pa.Table) -> pa.Table:
            return pa.table({
                c: pa.array(
                    [int(t.column(c).to_numpy(
                        zero_copy_only=False).sum())],
                    type=pa.int64())
                for c in t.column_names
            })

        refs = list(
            corpus_ds(sf_dir)
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        a = tree_reduce_tables(refs, merge)
        m = float(int(a.column("m")[0].as_py()))
        sx = float(int(a.column("sx")[0].as_py()))
        sy = float(int(a.column("sy")[0].as_py()))
        sxx = float(int(a.column("sxx")[0].as_py()))
        sxy = float(int(a.column("sxy")[0].as_py()))
        syy = float(int(a.column("syy")[0].as_py()))
        vx = m * sxx - sx * sx
        vy = m * syy - sy * sy
        num = m * sxy - sx * sy
        slope = num / vx
        intercept = (sy - slope * sx) / m
        r2 = (num * num) / (vx * vy) if vx * vy > 0 else 0.0
        return pa.table({
            "n_docs": pa.array([int(m)], type=pa.int64()),
            "bytes_per_token": pa.array([slope],
                                        type=pa.float64()),
            "intercept": pa.array([intercept], type=pa.float64()),
            "r2": pa.array([r2], type=pa.float64()),
        })

    sql = f"""
    WITH tok AS ({SQL_TOK}),
    d AS (
        SELECT doc_id, token,
               COALESCE(token - lag(token) OVER (
                   PARTITION BY doc_id ORDER BY pos), token)
                   AS delta
        FROM tok
    ),
    per AS (
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS x,
               CAST(sum(1
                   + CASE WHEN (CASE WHEN delta >= 0 THEN 2 * delta
                                ELSE -2 * delta - 1 END) >= 128
                          THEN 1 ELSE 0 END
                   + CASE WHEN (CASE WHEN delta >= 0 THEN 2 * delta
                                ELSE -2 * delta - 1 END) >= 16384
                          THEN 1 ELSE 0 END
                   + CASE WHEN (CASE WHEN delta >= 0 THEN 2 * delta
                                ELSE -2 * delta - 1 END) >= 2097152
                          THEN 1 ELSE 0 END) AS BIGINT) AS y
        FROM d GROUP BY doc_id
    ),
    s AS (
        SELECT CAST(count(*) AS DOUBLE) AS m,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(x) AS DOUBLE) AS sx,
               CAST(sum(y) AS DOUBLE) AS sy,
               CAST(sum(x * x) AS DOUBLE) AS sxx,
               CAST(sum(x * y) AS DOUBLE) AS sxy,
               CAST(sum(y * y) AS DOUBLE) AS syy
        FROM per
    )
    SELECT n_docs,
           (m * sxy - sx * sy) / (m * sxx - sx * sx)
               AS bytes_per_token,
           (sy - (m * sxy - sx * sy) / (m * sxx - sx * sx) * sx)
               / m AS intercept,
           CASE WHEN (m * sxx - sx * sx) * (m * syy - sy * sy) > 0
                THEN ((m * sxy - sx * sy) * (m * sxy - sx * sy))
                     / ((m * sxx - sx * sx) * (m * syy - sy * sy))
                ELSE 0.0e0 END AS r2
    FROM s
    """
    return q, sql


def build_wave73_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("source_perm_test",) + _perm_test_query()))
    add(*(("orders_q13_custdist",) + _q13_query()))
    add(*(("corpus_varint_scaling",) + _varint_scaling_query()))
    return queries, oracles
