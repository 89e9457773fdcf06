"""Wave-37 queries: vocabulary Jaccard matrix, Welch A/B t-statistic,
and grouped top-k over a distributed join.

- source_vocab_jaccard: pairwise Jaccard similarity of per-source
  vocabularies. The alphabet is bounded (<64 token types), so each
  source's vocabulary is ONE int64 bitmask merged by bitwise-or —
  the cheapest possible distinct-set partial; the 20x20 matrix is
  driver popcounts and one f64 division per pair.
- events_ab_tstat: Welch's t-statistic between purchase values of the
  user_id-parity A/B cohorts. Each cohort reduces to exact int64
  (n, S, S2); the unbiased variances and t are the identical f64
  expression on both sides — the A/B significance scan a product
  pipeline runs continuously.
- orders_top_customers_per_segment: top-3 customers by total order
  revenue per market segment — a grouped top-k over a big x big join:
  orders pre-aggregate per custkey per block, co-locate with customer
  (segment, custkey) by hash bucket, per-bucket revenue sums, then
  per-block/segment top-k partials tree-reduced by the same kernel.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .queries import _num_read_blocks, corpus_ds
from ._scaffold import read_cols

_MIX = np.uint64(0x9E3779B97F4A7C15)


# ---------------------------------------------------- source_vocab_jaccard
def _vocab_jaccard_query():
    def q(sf_dir: str):
        from ..stages.rollup import _flat_tokens
        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            empty = pa.table(
                {"source": pa.array([], type=pa.string()),
                 "mask": pa.array([], type=pa.int64())}
            )
            if "tokens" not in t.column_names:
                return empty
            values, lengths = _flat_tokens(t)
            if values.size == 0:
                return empty
            # bounded alphabet, FIXED injective bit map (consistent
            # across every block): space -> bit 0, 'a'..'z' -> 1..26.
            # Anything else breaks the 63-bit envelope and must fail
            # loudly rather than alias bits.
            t64 = values.astype(np.int64)
            v = np.where(t64 == 32, 0, t64 - 96)
            if v.size and (v.min() < 0 or v.max() >= 63):
                raise ValueError("alphabet outside the 63-bit envelope")
            src_names, src_code = np.unique(
                np.asarray(t.column("source").to_pylist()),
                return_inverse=True,
            )
            rep = np.repeat(src_code.astype(np.int64),
                            lengths.astype(np.int64))
            masks = np.zeros(src_names.size, dtype=np.int64)
            np.bitwise_or.at(masks, rep, np.int64(1) << v)
            return pa.table(
                {"source": pa.array(src_names, type=pa.string()),
                 "mask": pa.array(masks)}
            )

        def merge(t: pa.Table) -> pa.Table:
            df = t.to_pandas()
            a = df.groupby("source")["mask"].agg(
                lambda x: int(np.bitwise_or.reduce(
                    x.to_numpy(np.int64)))
            ).reset_index()
            a["mask"] = a["mask"].astype(np.int64)
            return pa.Table.from_pandas(a, preserve_index=False)

        refs = list(
            corpus_ds(sf_dir)
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        m = tree_reduce_tables(refs, merge).to_pandas()
        srcs = sorted(m["source"])
        mask = dict(zip(m["source"], m["mask"].astype(int)))
        rows = {"source_a": [], "source_b": [], "n_inter": [],
                "n_union": [], "jaccard": []}
        for i, a in enumerate(srcs):
            for b in srcs[i + 1:]:
                inter = bin(mask[a] & mask[b]).count("1")
                union = bin(mask[a] | mask[b]).count("1")
                rows["source_a"].append(a)
                rows["source_b"].append(b)
                rows["n_inter"].append(inter)
                rows["n_union"].append(union)
                rows["jaccard"].append(
                    float(np.float64(inter) / np.float64(union))
                    if union else 0.0
                )
        return pa.table(
            {"source_a": pa.array(rows["source_a"],
                                  type=pa.string()),
             "source_b": pa.array(rows["source_b"],
                                  type=pa.string()),
             "n_inter": pa.array(rows["n_inter"], type=pa.int64()),
             "n_union": pa.array(rows["n_union"], type=pa.int64()),
             "jaccard": pa.array(rows["jaccard"],
                                 type=pa.float64())}
        )

    from .queries import SQL_TOK

    sql = f"""
    WITH tok AS ({SQL_TOK}),
    v AS (SELECT DISTINCT source, token FROM tok),
    pairs AS (
        SELECT a.source AS source_a, b.source AS source_b,
               CAST(count(*) AS BIGINT) AS n_inter
        FROM v a JOIN v b
          ON a.token = b.token AND a.source < b.source
        GROUP BY a.source, b.source
    ),
    sizes AS (
        SELECT source, CAST(count(*) AS BIGINT) AS sz FROM v
        GROUP BY source
    )
    SELECT p.source_a, p.source_b, p.n_inter,
           sa.sz + sb.sz - p.n_inter AS n_union,
           CAST(p.n_inter AS DOUBLE)
               / CAST(sa.sz + sb.sz - p.n_inter AS DOUBLE)
               AS jaccard
    FROM pairs p
    JOIN sizes sa ON sa.source = p.source_a
    JOIN sizes sb ON sb.source = p.source_b
    """
    return q, sql


# --------------------------------------------------------- events_ab_tstat
def _ab_tstat_query():
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            empty = pa.table(
                {"cohort": pa.array([], type=pa.int64()),
                 "n": pa.array([], type=pa.int64()),
                 "s": pa.array([], type=pa.int64()),
                 "s2": pa.array([], type=pa.int64())}
            )
            if "user_id" not in t.column_names:
                return empty
            et = np.asarray(t.column("event_type").to_pylist())
            keep = et == "purchase"
            if not keep.any():
                return empty
            sub = pa.table(
                {"user_id": t.column("user_id").cast(pa.int64()),
                 "value": t.column("value")}
            ).filter(pa.array(keep))
            u = sub.column("user_id").to_numpy(zero_copy_only=False)
            cents = np.round(
                sub.column("value").to_numpy(zero_copy_only=False)
                * 100.0
            ).astype(np.int64)
            cohort = u % 2
            out = []
            for c in (0, 1):
                m = cohort == c
                out.append(
                    (c, int(m.sum()), int(cents[m].sum()),
                     int((cents[m] * cents[m]).sum()))
                )
            return pa.table(
                {"cohort": pa.array([o[0] for o in out],
                                    type=pa.int64()),
                 "n": pa.array([o[1] for o in out], type=pa.int64()),
                 "s": pa.array([o[2] for o in out], type=pa.int64()),
                 "s2": pa.array([o[3] for o in out],
                                type=pa.int64())}
            )

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by("cohort").aggregate(
                [("n", "sum"), ("s", "sum"), ("s2", "sum")]
            )
            return pa.table(
                {"cohort": g.column("cohort"),
                 "n": g.column("n_sum").cast(pa.int64()),
                 "s": g.column("s_sum").cast(pa.int64()),
                 "s2": g.column("s2_sum").cast(pa.int64())}
            )

        refs = list(
            read_cols(sf_dir, "events", ["user_id", "event_type", "value"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        a = tree_reduce_tables(refs, merge).to_pandas().sort_values(
            "cohort"
        )
        n0, s0, q0 = (int(a.iloc[0]["n"]), int(a.iloc[0]["s"]),
                      int(a.iloc[0]["s2"]))
        n1, s1, q1 = (int(a.iloc[1]["n"]), int(a.iloc[1]["s"]),
                      int(a.iloc[1]["s2"]))
        m0 = float(np.float64(s0) / np.float64(n0))
        m1 = float(np.float64(s1) / np.float64(n1))
        v0 = (float(np.float64(n0 * q0 - s0 * s0))
              / float(np.float64(n0) * np.float64(n0 - 1)))
        v1 = (float(np.float64(n1 * q1 - s1 * s1))
              / float(np.float64(n1) * np.float64(n1 - 1)))
        t_stat = (m0 - m1) / float(
            np.sqrt(v0 / np.float64(n0) + v1 / np.float64(n1))
        )
        return pa.table(
            {"n_a": pa.array([n0], type=pa.int64()),
             "n_b": pa.array([n1], type=pa.int64()),
             "mean_a": pa.array([m0], type=pa.float64()),
             "mean_b": pa.array([m1], type=pa.float64()),
             "t_stat": pa.array([t_stat], type=pa.float64())}
        )

    sql = """
    WITH p AS (
        SELECT CAST(user_id % 2 AS BIGINT) AS cohort,
               CAST(round_even(value * 100, 0) AS BIGINT) AS cents
        FROM events WHERE event_type = 'purchase'
    ),
    g AS (
        SELECT cohort, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(cents) AS BIGINT) AS s,
               CAST(sum(cents * cents) AS BIGINT) AS s2
        FROM p GROUP BY cohort
    ),
    w AS (
        SELECT
            max(CASE WHEN cohort = 0 THEN n END) AS n0,
            max(CASE WHEN cohort = 0 THEN s END) AS s0,
            max(CASE WHEN cohort = 0 THEN s2 END) AS q0,
            max(CASE WHEN cohort = 1 THEN n END) AS n1,
            max(CASE WHEN cohort = 1 THEN s END) AS s1,
            max(CASE WHEN cohort = 1 THEN s2 END) AS q1
        FROM g
    )
    SELECT CAST(n0 AS BIGINT) AS n_a, CAST(n1 AS BIGINT) AS n_b,
           CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE) AS mean_a,
           CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS mean_b,
           (CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE)
            - CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE))
           / sqrt(
               (CAST(n0 * q0 - s0 * s0 AS DOUBLE)
                / (CAST(n0 AS DOUBLE) * CAST(n0 - 1 AS DOUBLE)))
                   / CAST(n0 AS DOUBLE)
               + (CAST(n1 * q1 - s1 * s1 AS DOUBLE)
                  / (CAST(n1 AS DOUBLE) * CAST(n1 - 1 AS DOUBLE)))
                     / CAST(n1 AS DOUBLE)) AS t_stat
    FROM w
    """
    return q, sql


# ---------------------------------------- orders_top_customers_per_segment
def _top_customers_query(k: int = 3, n_buckets: int = 64):
    def q(sf_dir: str):
        import pandas as pd
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def ord_prep(t: pa.Table) -> pa.Table:
            empty = pa.table(
                {"key": pa.array([], type=pa.int64()),
                 "cents": pa.array([], type=pa.int64()),
                 "seg": pa.array([], type=pa.string()),
                 "kind": pa.array([], type=pa.int8()),
                 "bucket": pa.array([], type=pa.int64())}
            )
            if "o_custkey" not in t.column_names:
                return empty
            k_ = t.column("o_custkey").cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
            cents = np.round(
                t.column("o_totalprice").to_numpy(zero_copy_only=False)
                * 100.0
            ).astype(np.int64)
            tab = pa.table(
                {"key": pa.array(k_), "cents": pa.array(cents)}
            ).group_by("key").aggregate([("cents", "sum")])
            kk = tab.column("key").to_numpy(zero_copy_only=False)
            return pa.table(
                {"key": tab.column("key"),
                 "cents": tab.column("cents_sum").cast(pa.int64()),
                 "seg": pa.array([""] * len(kk), type=pa.string()),
                 "kind": pa.array(np.ones(len(kk), dtype=np.int8),
                                  type=pa.int8()),
                 "bucket": pa.array(
                     (((kk.astype(np.uint64) * _MIX)
                       >> np.uint64(48)).astype(np.int64))
                     % n_buckets)}
            )

        def cust_prep(t: pa.Table) -> pa.Table:
            empty = pa.table(
                {"key": pa.array([], type=pa.int64()),
                 "cents": pa.array([], type=pa.int64()),
                 "seg": pa.array([], type=pa.string()),
                 "kind": pa.array([], type=pa.int8()),
                 "bucket": pa.array([], type=pa.int64())}
            )
            if "c_custkey" not in t.column_names:
                return empty
            k_ = t.column("c_custkey").cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
            return pa.table(
                {"key": pa.array(k_),
                 "cents": pa.array(np.zeros(len(k_), dtype=np.int64)),
                 "seg": t.column("c_mktsegment"),
                 "kind": pa.array(np.zeros(len(k_), dtype=np.int8),
                                  type=pa.int8()),
                 "bucket": pa.array(
                     (((k_.astype(np.uint64) * _MIX)
                       >> np.uint64(48)).astype(np.int64))
                     % n_buckets)}
            )

        def bucket_topk(g: pa.Table) -> pa.Table:
            kind = g.column("kind").to_numpy(zero_copy_only=False)
            cust = g.filter(pa.array(kind == 0))
            orders = g.filter(pa.array(kind == 1))
            okk = orders.column("key").to_numpy(zero_copy_only=False)
            ocents = orders.column("cents").to_numpy(
                zero_copy_only=False)
            ck = cust.column("key").to_numpy(zero_copy_only=False)
            empty = pa.table(
                {"seg": pa.array([], type=pa.string()),
                 "key": pa.array([], type=pa.int64()),
                 "revenue_cents": pa.array([], type=pa.int64())}
            )
            if ck.size == 0:
                return empty
            if okk.size:
                order = np.argsort(okk, kind="stable")
                ok_s, oc_s = okk[order], ocents[order]
                starts = np.flatnonzero(
                    np.r_[True, ok_s[1:] != ok_s[:-1]]
                )
                uk = ok_s[starts]
                urev = np.add.reduceat(oc_s, starts)
                idx = np.clip(np.searchsorted(uk, ck), 0,
                              uk.size - 1)
                hit = uk[idx] == ck
                rev = np.where(hit, urev[idx], np.int64(0))
            else:
                rev = np.zeros(ck.size, dtype=np.int64)
            seg = np.asarray(cust.column("seg").to_pylist(),
                             dtype=object)
            # per-seg top-k under (rev desc, key asc): lexsort by
            # (seg, -rev, key) then keep the first k rows of each seg
            o2 = np.lexsort((ck, -rev, seg))
            seg_s, key_s, rev_s = seg[o2], ck[o2], rev[o2]
            starts2 = np.flatnonzero(
                np.r_[True, seg_s[1:] != seg_s[:-1]]
            )
            seg_start = np.repeat(
                starts2, np.diff(np.r_[starts2, seg_s.size])
            )
            rank = np.arange(seg_s.size) - seg_start
            keep = rank < k
            return pa.table(
                {"seg": pa.array(seg_s[keep], type=pa.string()),
                 "key": pa.array(key_s[keep], type=pa.int64()),
                 "revenue_cents": pa.array(rev_s[keep],
                                           type=pa.int64())}
            )

        def topk_merge(t: pa.Table) -> pa.Table:
            df = t.to_pandas()
            df = (df.sort_values(
                ["revenue_cents", "key"], ascending=[False, True])
                .groupby("seg", sort=False).head(k))
            return pa.Table.from_pandas(df, preserve_index=False)

        orders = read_cols(sf_dir, "orders", ["o_custkey", "o_totalprice"]).map_batches(ord_prep, batch_format="pyarrow")
        cust = read_cols(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).map_batches(cust_prep, batch_format="pyarrow")
        refs = list(
            cust.union(orders)
            .groupby("bucket")
            .map_groups(bucket_topk, batch_format="pyarrow")
            .to_arrow_refs()
        )
        m = tree_reduce_tables(refs, topk_merge).to_pandas()
        m = m.sort_values(
            ["seg", "revenue_cents", "key"],
            ascending=[True, False, True],
        ).reset_index(drop=True)
        m["rk"] = m.groupby("seg").cumcount() + 1
        return pa.table(
            {"segment": pa.array(m["seg"], type=pa.string()),
             "rk": pa.array(m["rk"].to_numpy(np.int64)),
             "custkey": pa.array(m["key"].to_numpy(np.int64)),
             "revenue_cents": pa.array(
                 m["revenue_cents"].to_numpy(np.int64))}
        )

    sql = f"""
    WITH rev AS (
        SELECT c.c_mktsegment AS segment,
               CAST(c.c_custkey AS BIGINT) AS custkey,
               CAST(COALESCE(sum(CAST(round_even(
                   o.o_totalprice * 100, 0) AS BIGINT)), 0)
                   AS BIGINT) AS revenue_cents
        FROM customer c
        LEFT JOIN orders o ON o.o_custkey = c.c_custkey
        GROUP BY c.c_mktsegment, c.c_custkey
    )
    SELECT segment, CAST(rk AS BIGINT) AS rk, custkey, revenue_cents
    FROM (
        SELECT segment, custkey, revenue_cents,
               row_number() OVER (PARTITION BY segment
                                  ORDER BY revenue_cents DESC,
                                           custkey) AS rk
        FROM rev
    ) WHERE rk <= {k}
    """
    return q, sql


def build_wave37_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("source_vocab_jaccard",) + _vocab_jaccard_query()))
    add(*(("events_ab_tstat",) + _ab_tstat_query()))
    add(*(("orders_top_customers_per_segment",)
          + _top_customers_query()))
    return queries, oracles
