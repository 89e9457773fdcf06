"""Wave-76 queries: TPC-H Q22 anti-join, PSI drift, and CUSUM
changepoint location.

- orders_q22_antijoin: TPC-H Q22 reshaped to the synthetic schema
  (nationkey plays the phone country code, and "no orders" becomes
  "no orders since 2000-06-01" — every customer here has SOME order,
  so the literal Q22 set is empty): wealthy LAPSED customers
  (acctbal above the positive-balance average, no recent order),
  grouped by nation. The distributed anti-join broadcasts a dense
  has-recent-orders bitmap (custkey domain is the customer table
  itself); the global threshold is one float division of exact cent
  sums.
- events_psi_halves: Population Stability Index of the event-type
  mix between the first and second half of the time range (the
  standard ML-monitoring drift score): PSI = sum (p1 - p2) *
  ln(p1 / p2) over types — integer counts, scalar logs, type-ordered
  fold. The halves split on the midpoint hour, computed from exact
  int bounds.
- doc_cusum_argmax: most-likely mean-shift location per doc = argmax
  of |CUSUM| (the location statistic behind the wave-12 alarms):
  with S_k = k-prefix sums, the statistic n*S_k - k*S_n is INTEGER;
  argmax tie-breaks to the earliest k via the encoded order-key max
  (the doc_max_jump discipline).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .queries import SQL_TOK, _cast, _num_read_blocks, corpus_ds
from ._scaffold import read_cols


Q22_CUTOFF = "2000-06-01"


# ------------------------------------------------------ orders_q22_antijoin
def _q22_query(cutoff: str = Q22_CUTOFF):
    def q(sf_dir: str):
        import pyarrow.parquet as pq
        import ray
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        # distributed pass over orders -> has-orders bitmap
        cust_meta = pq.read_table(
            f"{sf_dir}/customer.parquet", columns=["c_custkey"])
        max_ck = int(cust_meta.column("c_custkey").to_numpy(
            zero_copy_only=False).max())

        cutoff_us = int(np.datetime64(cutoff)
                        .astype("datetime64[us]").astype(np.int64))

        def order_partial(t: pa.Table) -> pa.Table:
            if "o_custkey" not in t.column_names or t.num_rows == 0:
                return pa.table({
                    "custkey": pa.array([], type=pa.int64())})
            od = t.column("o_orderdate").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            keep = od >= cutoff_us
            ck = np.unique(t.column("o_custkey").cast(
                pa.int64()).to_numpy(zero_copy_only=False)[keep])
            return pa.table({"custkey": pa.array(ck)})

        def order_merge(t: pa.Table) -> pa.Table:
            ck = np.unique(t.column("custkey").to_numpy(
                zero_copy_only=False))
            return pa.table({"custkey": pa.array(ck)})

        refs = list(
            read_cols(sf_dir, "orders", ["o_custkey", "o_orderdate"])
            .map_batches(order_partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        with_orders = tree_reduce_tables(
            refs, order_merge).column("custkey").to_numpy(
            zero_copy_only=False)
        bitmap = np.zeros(max_ck + 1, dtype=bool)
        bitmap[with_orders] = True
        bref = ray.put(bitmap)

        # pass 1 over customers: positive-balance average (int cents)
        def bal_partial(t: pa.Table) -> pa.Table:
            bal = np.round(
                t.column("c_acctbal").to_numpy(
                    zero_copy_only=False) * 100.0).astype(np.int64)
            pos = bal > 0
            return pa.table({
                "n": pa.array([int(pos.sum())], type=pa.int64()),
                "s": pa.array([int(bal[pos].sum())],
                              type=pa.int64()),
            })

        def bal_merge(t: pa.Table) -> pa.Table:
            return pa.table({
                c: pa.array(
                    [int(t.column(c).to_numpy(
                        zero_copy_only=False).sum())],
                    type=pa.int64())
                for c in ("n", "s")
            })

        cust_src = read_cols(sf_dir, "customer", ["c_custkey", "c_nationkey", "c_acctbal"])
        refs2 = list(cust_src.map_batches(
            bal_partial, batch_format="pyarrow").to_arrow_refs())
        agg = tree_reduce_tables(refs2, bal_merge)
        n_pos = int(agg.column("n")[0].as_py())
        s_pos = int(agg.column("s")[0].as_py())
        thresh = float(s_pos) / float(n_pos)

        class Finals:
            def __init__(self, bref):
                self.bitmap = ray.get(bref)

            def __call__(self, t: pa.Table) -> pa.Table:
                if ("c_custkey" not in t.column_names
                        or t.num_rows == 0):
                    return pa.table({
                        "nationkey": pa.array([], type=pa.int64()),
                        "numcust": pa.array([], type=pa.int64()),
                        "totacctbal_cents": pa.array(
                            [], type=pa.int64()),
                    })
                ck = t.column("c_custkey").cast(
                    pa.int64()).to_numpy(zero_copy_only=False)
                nk = t.column("c_nationkey").cast(
                    pa.int64()).to_numpy(zero_copy_only=False)
                bal = np.round(
                    t.column("c_acctbal").to_numpy(
                        zero_copy_only=False) * 100.0
                ).astype(np.int64)
                keep = ((bal.astype(np.float64) > thresh)
                        & ~self.bitmap[ck])
                nk = nk[keep]
                bal = bal[keep]
                uk, inv = np.unique(nk, return_inverse=True)
                sums = np.zeros(uk.size, dtype=np.int64)
                np.add.at(sums, inv, bal)
                # sentinel row keeps every partial non-empty (an
                # all-empty tree-reduce fan-in cannot concat)
                return pa.table({
                    "nationkey": pa.array(
                        np.r_[uk, np.int64(-1)]),
                    "numcust": pa.array(np.r_[
                        np.bincount(inv, minlength=uk.size)
                        .astype(np.int64), np.int64(0)]),
                    "totacctbal_cents": pa.array(
                        np.r_[sums, np.int64(0)]),
                })

        def fin_merge(t: pa.Table) -> pa.Table:
            g = t.group_by("nationkey").aggregate(
                [("numcust", "sum"), ("totacctbal_cents", "sum")])
            return pa.table({
                "nationkey": g.column("nationkey").cast(
                    pa.int64()),
                "numcust": g.column("numcust_sum").cast(
                    pa.int64()),
                "totacctbal_cents": g.column(
                    "totacctbal_cents_sum").cast(pa.int64()),
            })

        refs3 = list(cust_src.map_batches(
            Finals, batch_format="pyarrow", concurrency=2,
            fn_constructor_args=(bref,)).to_arrow_refs())
        out = tree_reduce_tables(refs3, fin_merge).to_pandas()
        out = out[out["nationkey"] >= 0]
        out = out.sort_values("nationkey").reset_index(drop=True)
        return pa.table({
            "nationkey": pa.array(
                out["nationkey"].to_numpy(np.int64)),
            "numcust": pa.array(
                out["numcust"].to_numpy(np.int64)),
            "totacctbal_cents": pa.array(
                out["totacctbal_cents"].to_numpy(np.int64)),
        })

    sql = f"""
    WITH thresh AS (
        SELECT CAST(sum(CAST(round_even(c_acctbal * 100, 0)
                             AS BIGINT)) AS DOUBLE)
               / CAST(count(*) AS DOUBLE) AS t
        FROM customer
        WHERE CAST(round_even(c_acctbal * 100, 0) AS BIGINT) > 0
    )
    SELECT CAST(c.c_nationkey AS BIGINT) AS nationkey,
           CAST(count(*) AS BIGINT) AS numcust,
           CAST(sum(CAST(round_even(c.c_acctbal * 100, 0)
                         AS BIGINT)) AS BIGINT)
               AS totacctbal_cents
    FROM customer c CROSS JOIN thresh
    WHERE CAST(CAST(round_even(c.c_acctbal * 100, 0) AS BIGINT)
               AS DOUBLE) > thresh.t
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >=
                            TIMESTAMP '{cutoff}')
    GROUP BY c.c_nationkey
    """
    return q, sql


# --------------------------------------------------------- events_psi_halves
def _psi_query():
    def q(sf_dir: str):
        import math

        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        # exact global bounds first (tiny partials)
        def bounds_partial(t: pa.Table) -> pa.Table:
            tus = t.column("ts").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            return pa.table({
                "lo": pa.array([int(tus.min())], type=pa.int64()),
                "hi": pa.array([int(tus.max())], type=pa.int64()),
            })

        def bounds_merge(t: pa.Table) -> pa.Table:
            return pa.table({
                "lo": pa.array(
                    [int(t.column("lo").to_numpy(
                        zero_copy_only=False).min())],
                    type=pa.int64()),
                "hi": pa.array(
                    [int(t.column("hi").to_numpy(
                        zero_copy_only=False).max())],
                    type=pa.int64()),
            })

        src = read_cols(sf_dir, "events", ["ts", "event_type"])
        refs = list(src.map_batches(
            bounds_partial, batch_format="pyarrow").to_arrow_refs())
        b = tree_reduce_tables(refs, bounds_merge)
        lo = int(b.column("lo")[0].as_py())
        hi = int(b.column("hi")[0].as_py())
        mid = (lo + hi) // 2

        def cnt_partial(t: pa.Table) -> pa.Table:
            tus = t.column("ts").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            et = np.asarray(t.column("event_type").to_pylist())
            half = (tus > mid).astype(np.int64)
            key = np.char.add(np.char.add(
                et, "|"), half.astype(str))
            uk, inv = np.unique(key, return_inverse=True)
            cnt = np.bincount(inv, minlength=uk.size).astype(
                np.int64)
            parts = np.char.partition(uk, "|")
            return pa.table({
                "event_type": pa.array(list(parts[:, 0]),
                                       type=pa.string()),
                "half": pa.array(parts[:, 2].astype(np.int64)),
                "cnt": pa.array(cnt),
            })

        def cnt_merge(t: pa.Table) -> pa.Table:
            g = t.group_by(["event_type", "half"]).aggregate(
                [("cnt", "sum")])
            return pa.table({
                "event_type": g.column("event_type"),
                "half": g.column("half").cast(pa.int64()),
                "cnt": g.column("cnt_sum").cast(pa.int64()),
            })

        refs2 = list(src.map_batches(
            cnt_partial, batch_format="pyarrow").to_arrow_refs())
        a = tree_reduce_tables(refs2, cnt_merge).to_pandas()
        types = sorted(a["event_type"].unique())
        c1 = {r.event_type: int(r.cnt)
              for r in a[a["half"] == 0].itertuples()}
        c2 = {r.event_type: int(r.cnt)
              for r in a[a["half"] == 1].itertuples()}
        n1 = float(sum(c1.values()))
        n2 = float(sum(c2.values()))
        psi = 0.0
        rows = []
        for et in types:
            p1 = float(c1.get(et, 0)) / n1
            p2 = float(c2.get(et, 0)) / n2
            term = (p1 - p2) * math.log(p1 / p2)
            psi = psi + term
            rows.append((et, c1.get(et, 0), c2.get(et, 0), term))
        return pa.table({
            "event_type": pa.array([r[0] for r in rows],
                                   type=pa.string()),
            "n_first": pa.array([r[1] for r in rows],
                                type=pa.int64()),
            "n_second": pa.array([r[2] for r in rows],
                                 type=pa.int64()),
            "term": pa.array([r[3] for r in rows],
                             type=pa.float64()),
            "psi": pa.array([psi] * len(rows),
                            type=pa.float64()),
        })

    sql = """
    WITH b AS (
        SELECT min(epoch_us(ts)) AS lo, max(epoch_us(ts)) AS hi
        FROM events
    ),
    lab AS (
        SELECT event_type,
               CASE WHEN epoch_us(ts) >
                    ((SELECT lo FROM b) + (SELECT hi FROM b)) // 2
                    THEN 1 ELSE 0 END AS half
        FROM events
    ),
    c AS (
        SELECT event_type, half, CAST(count(*) AS BIGINT) AS cnt
        FROM lab GROUP BY event_type, half
    ),
    tot AS (
        SELECT half, CAST(sum(cnt) AS DOUBLE) AS n
        FROM c GROUP BY half
    ),
    terms AS (
        SELECT t.event_type,
               COALESCE(a.cnt, 0) AS n_first,
               COALESCE(bb.cnt, 0) AS n_second,
               (CAST(COALESCE(a.cnt, 0) AS DOUBLE)
                    / (SELECT n FROM tot WHERE half = 0)
                - CAST(COALESCE(bb.cnt, 0) AS DOUBLE)
                    / (SELECT n FROM tot WHERE half = 1))
               * ln((CAST(COALESCE(a.cnt, 0) AS DOUBLE)
                     / (SELECT n FROM tot WHERE half = 0))
                    / (CAST(COALESCE(bb.cnt, 0) AS DOUBLE)
                       / (SELECT n FROM tot WHERE half = 1)))
                   AS term
        FROM (SELECT DISTINCT event_type FROM events) t
        LEFT JOIN c a ON a.event_type = t.event_type AND a.half = 0
        LEFT JOIN c bb ON bb.event_type = t.event_type
                      AND bb.half = 1
    )
    SELECT event_type, n_first, n_second, term,
           (SELECT list_reduce(list_prepend(0.0e0,
                list(term ORDER BY event_type)), (x, y) -> x + y)
            FROM terms) AS psi
    FROM terms
    """
    return q, sql


# ----------------------------------------------------------- doc_cusum_argmax
def _cusum_argmax_query():
    def q(sf_dir: str):
        def cus(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "doc_id": pa.array([], type=pa.string()),
                "n_tok": pa.array([], type=pa.int64()),
                "k_star": pa.array([], type=pa.int64()),
                "max_cusum": pa.array([], type=pa.int64()),
            })
            if "tokens" not in t.column_names or t.num_rows == 0:
                return empty
            toks = t.column("tokens").combine_chunks()
            flat = toks.flatten().to_numpy(
                zero_copy_only=False).astype(np.int64)
            offs = toks.offsets.to_numpy(
                zero_copy_only=False).astype(np.int64)
            offs = offs - offs[0]
            lens = np.diff(offs)
            keep = lens >= 2
            if not keep.any():
                return empty
            ids = [d for d, kk in zip(
                t.column("doc_id").to_pylist(), keep) if kk]
            starts = offs[:-1][keep]
            dlens = lens[keep]
            nd = len(ids)
            tot = int(dlens.sum())
            g = np.repeat(np.arange(nd), dlens)
            pos = (np.arange(tot)
                   - np.repeat(np.cumsum(dlens) - dlens, dlens))
            y = flat[starts[g] + pos]
            # per-doc prefix sums via global cumsum reset per doc
            cs = np.cumsum(y)
            ds0 = np.concatenate(([0], np.cumsum(dlens)))[:-1]
            base = np.repeat(cs[ds0] - y[ds0], dlens)
            sk = cs - base                 # within-doc prefix sums
            s = np.bincount(g, weights=y, minlength=nd).astype(
                np.int64)
            k = pos + 1
            stat = np.abs(dlens[g] * sk - k * s[g])
            # valid interior split points only: 1 <= k <= n-1
            valid = k < dlens[g]
            statv = np.where(valid, stat, -1)
            # earliest-k argmax via encoded key (doc_max_jump trick)
            enc = statv * (int(dlens.max()) + 1) + (
                dlens[g] - k)  # larger k -> smaller encode on ties
            best = np.zeros(nd, dtype=np.int64)
            np.maximum.at(best, g, enc)
            width = int(dlens.max()) + 1
            max_c = best // width
            k_star = dlens - (best % width)
            return pa.table({
                "doc_id": pa.array(ids, type=pa.string()),
                "n_tok": pa.array(dlens, type=pa.int64()),
                "k_star": pa.array(k_star, type=pa.int64()),
                "max_cusum": pa.array(max_c, type=pa.int64()),
            })

        ds = corpus_ds(sf_dir).map_batches(
            cus, batch_format="pyarrow")
        return _cast(ds, {
            "doc_id": pa.string(),
            "n_tok": pa.int64(),
            "k_star": pa.int64(),
            "max_cusum": pa.int64(),
        })

    sql = f"""
    WITH tok AS ({SQL_TOK}),
    st AS (
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(token) AS BIGINT) AS s
        FROM tok GROUP BY doc_id HAVING count(*) >= 2
    ),
    pre AS (
        SELECT t.doc_id, t.pos + 1 AS k, st.n, st.s,
               CAST(sum(t.token) OVER (PARTITION BY t.doc_id
                                       ORDER BY t.pos
                                       ROWS UNBOUNDED PRECEDING)
                    AS BIGINT) AS sk
        FROM tok t JOIN st ON st.doc_id = t.doc_id
    ),
    stat AS (
        SELECT doc_id, k, n,
               abs(n * sk - k * s) AS c
        FROM pre WHERE k < n
    ),
    best AS (
        SELECT doc_id, n, k, c FROM (
            SELECT doc_id, n, k, c,
                   row_number() OVER (PARTITION BY doc_id
                                      ORDER BY c DESC, k ASC)
                       AS rn
            FROM stat)
        WHERE rn = 1
    )
    SELECT doc_id, n AS n_tok,
           CAST(k AS BIGINT) AS k_star,
           CAST(c AS BIGINT) AS max_cusum
    FROM best
    """
    return q, sql


def build_wave76_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("orders_q22_antijoin",) + _q22_query()))
    add(*(("events_psi_halves",) + _psi_query()))
    add(*(("doc_cusum_argmax",) + _cusum_argmax_query()))
    return queries, oracles
