"""Wave-66 queries: spectral entropy, TPC-H Q18 big-quantity orders,
and user-LTV regression.

- doc_spectral_entropy: Shannon entropy of the normalized DFT power
  spectrum at k = 1..4 over the mean-centered w8 series (tsfresh's
  spectral-entropy feature; extends doc_dft_power's scalar
  cos/sin-fold machinery, kernels/detection.dft_power_seq). H =
  -sum p_k ln p_k with p_k = power_k / sum(power), folded in k
  order; ln == math.log (shared libm).
- orders_q18_bigqty: TPC-H Q18 (large-volume orders) — the one
  query family that NEEDS an unbounded-key shuffle: per-order
  quantity totals run through Ray's hash groupby (l_orderkey
  cardinality scales with the data, so tree-reducing a bounded
  partial table does not apply), then the small survivor set joins
  orders via a broadcast ray.put lookup and top-ks on the driver.
  l_quantity is integer-valued (asserted by round_even parity), so
  totals are exact int64.
- events_ltv_ols: cross-table lifetime-value regression — per user
  x = total event count, y = total purchase value in CENTS (exact
  round_even int64), OLS slope/intercept/R^2 from the k=1 Cramer
  closed form. Per-user partials are integers (order-free); the
  driver folds the bounded per-user table in user_id order.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .queries import SQL_TOK, _cast, _num_read_blocks, corpus_ds
from ._scaffold import read_cols
from .queries_wave5 import _doc_series_rows

Q18_MIN_QTY = 250
Q18_TOPK = 20


# ----------------------------------------------------- doc_spectral_entropy
def _spectral_entropy_query(width: int = 8, max_k: int = 4):
    def q(sf_dir: str):
        import math

        from ..kernels.detection import dft_power_seq

        ks = list(range(1, max_k + 1))

        def tx(t: pa.Table) -> pa.Table:
            out = {"doc_id": [], "total_power": [], "entropy": []}
            for doc, y in _doc_series_rows(t, width):
                powers = [p for _c, _s, p in dft_power_seq(y, ks)]
                tot = 0.0
                for p in powers:           # sequential left fold
                    tot = tot + p
                h = 0.0
                if tot > 0:
                    for p in powers:
                        if p > 0:
                            pk = p / tot
                            h = h - pk * math.log(pk)
                out["doc_id"].append(doc)
                out["total_power"].append(tot)
                out["entropy"].append(h)
            return pa.table({
                "doc_id": pa.array(out["doc_id"], type=pa.string()),
                "total_power": pa.array(out["total_power"],
                                        type=pa.float64()),
                "entropy": pa.array(out["entropy"],
                                    type=pa.float64()),
            })

        return _cast(
            corpus_ds(sf_dir).map_batches(tx, batch_format="pyarrow"),
            {"doc_id": pa.string(), "total_power": pa.float64(),
             "entropy": pa.float64()},
        )

    from .queries import _series_list_sql
    fold = "(acc, x) -> acc + x"
    sql = f"""
    {_series_list_sql(width)},
    st AS (
        SELECT doc_id, ms, n,
               list_reduce(ms, {fold}) / n AS m
        FROM l
    ),
    cs AS (
        SELECT doc_id, n, CAST(kk.k AS INTEGER) AS k,
            list_reduce(list_transform(
                generate_series(1, CAST(n AS INTEGER)),
                i -> (ms[i] - m)
                     * cos(2.0e0 * pi() * kk.k
                           * CAST(i - 1 AS DOUBLE) / n)),
                {fold}) AS c,
            list_reduce(list_transform(
                generate_series(1, CAST(n AS INTEGER)),
                i -> (ms[i] - m)
                     * sin(2.0e0 * pi() * kk.k
                           * CAST(i - 1 AS DOUBLE) / n)),
                {fold}) AS s
        FROM st CROSS JOIN
             (SELECT unnest(generate_series(1, {max_k})) AS k) kk
    ),
    pw AS (
        SELECT doc_id, k, (c * c + s * s) / n AS p FROM cs
    ),
    tot AS (
        SELECT doc_id,
               list_reduce(list_prepend(0.0e0,
                   list(p ORDER BY k)), {fold}) AS tp
        FROM pw GROUP BY doc_id
    )
    SELECT pw.doc_id,
           tot.tp AS total_power,
           CASE WHEN tot.tp > 0 THEN
               -list_reduce(list_prepend(0.0e0,
                   list(CASE WHEN pw.p > 0
                             THEN (pw.p / tot.tp)
                                  * ln(pw.p / tot.tp)
                             ELSE 0.0e0 END ORDER BY pw.k)),
                   {fold})
           ELSE 0.0e0 END AS entropy
    FROM pw JOIN tot ON tot.doc_id = pw.doc_id
    GROUP BY pw.doc_id, tot.tp
    """
    return q, sql


# ------------------------------------------------------- orders_q18_bigqty
def _q18_query(min_qty: int = Q18_MIN_QTY, topk: int = Q18_TOPK):
    def q(sf_dir: str):
        import pyarrow.parquet as pq
        import ray
        import ray.data as rd

        def prep(t: pa.Table) -> pa.Table:
            qty = np.round(
                t.column("l_quantity").to_numpy(
                    zero_copy_only=False)).astype(np.int64)
            return pa.table({
                "l_orderkey": t.column("l_orderkey").cast(
                    pa.int64()),
                "qty": pa.array(qty),
            })

        # unbounded-key aggregate: Ray hash-shuffle groupby
        totals = (
            read_cols(sf_dir, "lineitem", ["l_orderkey", "l_quantity"])
            .map_batches(prep, batch_format="pyarrow")
            .groupby("l_orderkey")
            .sum("qty")
        )

        def survivors(t: pa.Table) -> pa.Table:
            tq = t.column("sum(qty)").to_numpy(
                zero_copy_only=False).astype(np.int64)
            keep = tq > min_qty
            return pa.table({
                "o_orderkey": t.column("l_orderkey").cast(
                    pa.int64()).filter(pa.array(keep)),
                "total_qty": pa.array(tq[keep]),
            })

        big = totals.map_batches(
            survivors, batch_format="pyarrow").to_pandas()
        # broadcast-side join with orders (small survivor set)
        orders = pq.read_table(
            f"{sf_dir}/orders.parquet",
            columns=["o_orderkey", "o_custkey", "o_totalprice"])
        ok = orders.column("o_orderkey").to_numpy(
            zero_copy_only=False)
        order_sort = np.argsort(ok)
        ok_s = ok[order_sort]
        ck = orders.column("o_custkey").to_numpy(
            zero_copy_only=False)[order_sort]
        tp = orders.column("o_totalprice").to_numpy(
            zero_copy_only=False)[order_sort]
        idx = np.searchsorted(ok_s, big["o_orderkey"].to_numpy())
        big["o_custkey"] = ck[idx]
        big["price_cents"] = np.round(tp[idx] * 100.0).astype(
            np.int64)
        big = big.sort_values(
            ["total_qty", "o_orderkey"],
            ascending=[False, True]).head(topk)
        return pa.table({
            "o_orderkey": pa.array(
                big["o_orderkey"].to_numpy(np.int64)),
            "o_custkey": pa.array(
                big["o_custkey"].to_numpy(np.int64)),
            "total_qty": pa.array(
                big["total_qty"].to_numpy(np.int64)),
            "price_cents": pa.array(
                big["price_cents"].to_numpy(np.int64)),
        })

    sql = f"""
    WITH tq AS (
        SELECT l_orderkey,
               CAST(sum(CAST(round_even(l_quantity, 0) AS BIGINT))
                    AS BIGINT) AS total_qty
        FROM lineitem GROUP BY l_orderkey
        HAVING sum(CAST(round_even(l_quantity, 0) AS BIGINT))
               > {min_qty}
    )
    SELECT o.o_orderkey, o.o_custkey, tq.total_qty,
           CAST(round_even(o.o_totalprice * 100, 0) AS BIGINT)
               AS price_cents
    FROM tq JOIN orders o ON o.o_orderkey = tq.l_orderkey
    ORDER BY tq.total_qty DESC, o.o_orderkey ASC
    LIMIT {topk}
    """
    return q, sql


# --------------------------------------------------------- events_ltv_ols
def _ltv_ols_query():
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            if "user_id" not in t.column_names or t.num_rows == 0:
                return pa.table({
                    "user_id": pa.array([], type=pa.int64()),
                    "n": pa.array([], type=pa.int64()),
                    "cents": pa.array([], type=pa.int64()),
                })
            uid = t.column("user_id").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            val = t.column("value").to_numpy(zero_copy_only=False)
            is_p = np.asarray(
                [et == "purchase"
                 for et in t.column("event_type").to_pylist()])
            cents = np.where(
                is_p, np.round(val * 100.0), 0.0).astype(np.int64)
            uk, inv = np.unique(uid, return_inverse=True)
            return pa.table({
                "user_id": pa.array(uk, type=pa.int64()),
                "n": pa.array(np.bincount(
                    inv, minlength=uk.size).astype(np.int64)),
                "cents": pa.array(np.bincount(
                    inv, weights=cents,
                    minlength=uk.size).astype(np.int64)),
            })

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by("user_id").aggregate(
                [("n", "sum"), ("cents", "sum")])
            return pa.table({
                "user_id": g.column("user_id").cast(pa.int64()),
                "n": g.column("n_sum").cast(pa.int64()),
                "cents": g.column("cents_sum").cast(pa.int64()),
            })

        refs = list(
            read_cols(sf_dir, "events", ["user_id", "event_type", "value"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        a = tree_reduce_tables(refs, merge).to_pandas()
        a = a.sort_values("user_id").reset_index(drop=True)
        x = a["n"].to_numpy(np.int64)
        y = a["cents"].to_numpy(np.int64)
        m = len(a)
        # integer sums: order-free exact
        sx = float(int(x.sum()))
        sy = float(int(y.sum()))
        sxx = float(int((x * x).sum()))
        sxy = float(int((x * y).sum()))
        syy = float(int((y * y).sum()))
        mf = float(m)
        vx = mf * sxx - sx * sx
        vy = mf * syy - sy * sy
        num = mf * sxy - sx * sy
        slope = num / vx
        intercept = (sy - slope * sx) / mf
        r2 = (num * num) / (vx * vy) if vx * vy > 0 else 0.0
        return pa.table({
            "n_users": pa.array([m], type=pa.int64()),
            "slope": pa.array([slope], type=pa.float64()),
            "intercept": pa.array([intercept], type=pa.float64()),
            "r2": pa.array([r2], type=pa.float64()),
        })

    sql = """
    WITH u AS (
        SELECT user_id,
               CAST(count(*) AS BIGINT) AS x,
               CAST(COALESCE(sum(CASE WHEN event_type = 'purchase'
                   THEN CAST(round_even(value * 100, 0) AS BIGINT)
                   ELSE 0 END), 0) AS BIGINT) AS y
        FROM events GROUP BY user_id
    ),
    s AS (
        SELECT CAST(count(*) AS DOUBLE) AS mf,
               CAST(sum(x) AS DOUBLE) AS sx,
               CAST(sum(y) AS DOUBLE) AS sy,
               CAST(sum(x * x) AS DOUBLE) AS sxx,
               CAST(sum(x * y) AS DOUBLE) AS sxy,
               CAST(sum(y * y) AS DOUBLE) AS syy,
               CAST(count(*) AS BIGINT) AS n_users
        FROM u
    )
    SELECT n_users,
           (mf * sxy - sx * sy) / (mf * sxx - sx * sx) AS slope,
           (sy - (mf * sxy - sx * sy) / (mf * sxx - sx * sx) * sx)
               / mf AS intercept,
           CASE WHEN (mf * sxx - sx * sx)
                     * (mf * syy - sy * sy) > 0
                THEN ((mf * sxy - sx * sy) * (mf * sxy - sx * sy))
                     / ((mf * sxx - sx * sx)
                        * (mf * syy - sy * sy))
                ELSE 0.0e0 END AS r2
    FROM s
    """
    return q, sql


def build_wave66_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("doc_spectral_entropy",) + _spectral_entropy_query()))
    add(*(("orders_q18_bigqty",) + _q18_query()))
    add(*(("events_ltv_ols",) + _ltv_ols_query()))
    return queries, oracles
