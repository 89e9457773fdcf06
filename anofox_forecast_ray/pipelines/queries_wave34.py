"""Wave-34 queries: runs test, Gini coefficient, star-schema 3-table
join, and CUSUM control-chart alarms.

- doc_runs_test: Wald-Wolfowitz runs test per doc against the doc's
  lower-median (nearest-rank keeps it integer; ties at the median are
  dropped, the classic convention). R, n1, n2 are exact ints; the
  z-statistic is the identical f64 expression on both sides.
- source_gini: Gini coefficient of doc lengths per source from the
  bounded (source, length) histogram — the sorted-position sum
  S = sum_i (2i - n - 1) x_(i) collapses to an exact int64 per
  histogram bucket (tie order cannot matter: equal values), and
  G = S / (n * total) is one f64 division. Zero row shuffle.
- region_revenue: 3-table star join — orders x customer (bucketed
  hash co-location on custkey; both sides big) with the nation->region
  dimension broadcast into the kernel (small side NEVER shuffles).
  Revenue stays integer cents.
- doc_cusum_alarms: one-sided CUSUM control chart per doc. The
  recursion S_t = max(0, S_{t-1} + x_t - k) equals C_t - min_{s<=t} C_s
  for C = cumsum(x - k), so the whole chart vectorizes as one cumsum +
  one running-min over the flat buffer (segment-offset trick) — exact
  int64, alarms = count of S_t > h.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .queries import SQL_TOK, _cast, _num_read_blocks, corpus_ds
from ._scaffold import read_cols

CUSUM_K = 85   # drift allowance (near the token mean)
CUSUM_H = 400  # alarm threshold
_MIX = np.uint64(0x9E3779B97F4A7C15)
_SEG_SHIFT = np.int64(34)  # |C| < 2^33 for docs under ~2^21 tokens


# --------------------------------------------------------------- doc_runs_test
def _runs_test_query():
    def q(sf_dir: str):
        from ..stages.rollup import _flat_tokens

        def runs(t: pa.Table) -> pa.Table:
            empty = pa.table(
                {"doc_id": pa.array([], type=pa.int64()),
                 "r": pa.array([], type=pa.int64()),
                 "n1": pa.array([], type=pa.int64()),
                 "n2": pa.array([], type=pa.int64()),
                 "z": pa.array([], type=pa.float64())}
            )
            if "tokens" not in t.column_names:
                return empty
            values, lengths = _flat_tokens(t)
            if values.size == 0:
                return empty
            v = values.astype(np.int64)
            lens = lengths.astype(np.int64)
            ids = np.asarray(
                [int(x) for x in t.column("doc_id").to_pylist()],
                dtype=np.int64,
            )
            out = {k: [] for k in ("doc_id", "r", "n1", "n2", "z")}
            off = 0
            for did, ln in zip(ids, lens):  # per-series stat (like
                x = v[off:off + ln]         # forecasts): bounded work
                off += ln                   # per doc, vector ops inside
                if ln == 0:
                    continue
                s = np.sort(x)
                med = int(s[(ln + 1) // 2 - 1])
                sign = x[x != med] > med
                n1 = int(sign.sum())
                n2 = int(sign.size - n1)
                if n1 == 0 or n2 == 0:
                    continue
                r = int(1 + (sign[1:] != sign[:-1]).sum())
                n = n1 + n2
                mu = 2.0 * float(n1 * n2) / float(n) + 1.0
                var = (2.0 * float(n1 * n2)
                       * float(2 * n1 * n2 - n)
                       / (float(n * n) * float(n - 1)))
                z = (float(r) - mu) / np.sqrt(var)
                out["doc_id"].append(int(did))
                out["r"].append(r)
                out["n1"].append(n1)
                out["n2"].append(n2)
                out["z"].append(float(z))
            return pa.table(
                {"doc_id": pa.array(out["doc_id"], type=pa.int64()),
                 "r": pa.array(out["r"], type=pa.int64()),
                 "n1": pa.array(out["n1"], type=pa.int64()),
                 "n2": pa.array(out["n2"], type=pa.int64()),
                 "z": pa.array(out["z"], type=pa.float64())}
            )

        return _cast(
            corpus_ds(sf_dir).map_batches(runs, batch_format="pyarrow"),
            {"doc_id": pa.int64(), "r": pa.int64(), "n1": pa.int64(),
             "n2": pa.int64(), "z": pa.float64()},
        )

    sql = f"""
    WITH tok AS ({SQL_TOK}),
    med AS (
        SELECT doc_id, token AS med FROM (
            SELECT doc_id, token,
                   row_number() OVER (PARTITION BY doc_id
                                      ORDER BY token) AS rn,
                   count(*) OVER (PARTITION BY doc_id) AS n
            FROM tok
        ) WHERE rn = (n + 1) // 2
    ),
    s AS (
        SELECT t.doc_id, t.pos,
               CASE WHEN t.token > m.med THEN 1 ELSE 0 END AS up
        FROM tok t JOIN med m ON m.doc_id = t.doc_id
        WHERE t.token <> m.med
    ),
    rr AS (
        SELECT doc_id, up,
               lag(up) OVER (PARTITION BY doc_id ORDER BY pos) AS prv
        FROM s
    ),
    g AS (
        SELECT doc_id,
               CAST(1 + sum(CASE WHEN prv IS NOT NULL AND up <> prv
                            THEN 1 ELSE 0 END) AS BIGINT) AS r,
               CAST(sum(up) AS BIGINT) AS n1,
               CAST(sum(1 - up) AS BIGINT) AS n2
        FROM rr GROUP BY doc_id
    )
    SELECT CAST(doc_id AS BIGINT) AS doc_id, r, n1, n2,
           (CAST(r AS DOUBLE)
            - (2.0 * CAST(n1 * n2 AS DOUBLE)
               / CAST(n1 + n2 AS DOUBLE) + 1.0))
           / sqrt(2.0 * CAST(n1 * n2 AS DOUBLE)
                  * CAST(2 * n1 * n2 - (n1 + n2) AS DOUBLE)
                  / (CAST((n1 + n2) * (n1 + n2) AS DOUBLE)
                     * CAST(n1 + n2 - 1 AS DOUBLE))) AS z
    FROM g WHERE n1 > 0 AND n2 > 0
    """
    return q, sql


# ---------------------------------------------------------------- source_gini
def _gini_query():
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            if "source" not in t.column_names:
                return pa.table(
                    {"source": pa.array([], type=pa.string()),
                     "v": pa.array([], type=pa.int64()),
                     "cnt": pa.array([], type=pa.int64())}
                )
            tab = pa.table(
                {"source": t.column("source"),
                 "v": t.column("n_chars").cast(pa.int64())}
            )
            g = tab.group_by(["source", "v"]).aggregate(
                [("v", "count")]
            )
            return pa.table(
                {"source": g.column("source"), "v": g.column("v"),
                 "cnt": g.column("v_count").cast(pa.int64())}
            )

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by(["source", "v"]).aggregate([("cnt", "sum")])
            return pa.table(
                {"source": g.column("source"), "v": g.column("v"),
                 "cnt": g.column("cnt_sum").cast(pa.int64())}
            )

        refs = list(
            read_cols(sf_dir, "documents", ["source", "n_chars"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        hp = tree_reduce_tables(refs, merge).to_pandas()
        rows = {"source": [], "n": [], "s_num": [], "gini": []}
        for src, g in hp.groupby("source"):
            g = g.sort_values("v")
            v = g["v"].to_numpy(np.int64)
            c = g["cnt"].to_numpy(np.int64)
            n = int(c.sum())
            total = int((v * c).sum())
            cum = np.cumsum(c)
            before = cum - c
            # sum over the c positions of value v of (2i - n - 1)*v:
            # positions i = before+1 .. before+c (1-based)
            coeff = (2 * before + c + 1) * c - (n + 1) * c
            s = int((coeff * v).sum())
            rows["source"].append(str(src))
            rows["n"].append(n)
            rows["s_num"].append(s)
            rows["gini"].append(
                float(np.float64(s) / np.float64(n * total))
                if total > 0 else 0.0
            )
        return pa.table(
            {"source": pa.array(rows["source"], type=pa.string()),
             "n": pa.array(rows["n"], type=pa.int64()),
             "s_num": pa.array(rows["s_num"], type=pa.int64()),
             "gini": pa.array(rows["gini"], type=pa.float64())}
        )

    sql = """
    WITH r AS (
        SELECT source, CAST(n_chars AS BIGINT) AS v,
               row_number() OVER (PARTITION BY source
                                  ORDER BY n_chars, doc_id) AS rn,
               count(*) OVER (PARTITION BY source) AS n
        FROM documents
    )
    SELECT source, CAST(max(n) AS BIGINT) AS n,
           CAST(sum((2 * rn - n - 1) * v) AS BIGINT) AS s_num,
           CASE WHEN sum(v) > 0
                THEN CAST(sum((2 * rn - n - 1) * v) AS DOUBLE)
                     / CAST(max(n) * sum(v) AS DOUBLE)
                ELSE 0.0 END AS gini
    FROM r GROUP BY source
    """
    return q, sql


# -------------------------------------------------------------- region_revenue
def _region_revenue_query(n_buckets: int = 64):
    def q(sf_dir: str):
        import pandas as pd
        import pyarrow.parquet as pq
        import ray
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        # small dims read once on the driver, broadcast via ray.put
        nation = pq.read_table(
            f"{sf_dir}/nation.parquet",
            columns=["n_nationkey", "n_regionkey"],
        ).to_pandas()
        region = pq.read_table(
            f"{sf_dir}/region.parquet",
            columns=["r_regionkey", "r_name"],
        ).to_pandas()
        # dense lookup ARRAYS (keys are small ints): per-row lookups in
        # the bucket kernel become one numpy fancy-index, not a Python
        # loop (r2-verdict anti-pattern)
        nk = nation["n_nationkey"].to_numpy(np.int64)
        nat2reg = np.zeros(int(nk.max()) + 1, dtype=np.int64)
        nat2reg[nk] = nation["n_regionkey"].to_numpy(np.int64)
        rk = region["r_regionkey"].to_numpy(np.int64)
        reg2name = np.empty(int(rk.max()) + 1, dtype=object)
        reg2name[rk] = region["r_name"].astype(str).to_numpy()
        dim_ref = ray.put((nat2reg, reg2name))

        def cust_prep(t: pa.Table) -> pa.Table:
            empty = pa.table(
                {"key": pa.array([], type=pa.int64()),
                 "nkey": pa.array([], type=pa.int64()),
                 "cents": pa.array([], type=pa.int64()),
                 "kind": pa.array([], type=pa.int8()),
                 "bucket": pa.array([], type=pa.int64())}
            )
            if "c_custkey" not in t.column_names:
                return empty
            k = t.column("c_custkey").cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
            return pa.table(
                {"key": pa.array(k),
                 "nkey": t.column("c_nationkey").cast(pa.int64()),
                 "cents": pa.array(
                     np.zeros(len(k), dtype=np.int64)),
                 "kind": pa.array(
                     np.zeros(len(k), dtype=np.int8), type=pa.int8()),
                 "bucket": pa.array(
                     (((k.astype(np.uint64) * _MIX) >> np.uint64(48))
                      .astype(np.int64)) % n_buckets)}
            )

        def ord_prep(t: pa.Table) -> pa.Table:
            empty = pa.table(
                {"key": pa.array([], type=pa.int64()),
                 "nkey": pa.array([], type=pa.int64()),
                 "cents": pa.array([], type=pa.int64()),
                 "kind": pa.array([], type=pa.int8()),
                 "bucket": pa.array([], type=pa.int64())}
            )
            if "o_custkey" not in t.column_names:
                return empty
            k = t.column("o_custkey").cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
            cents = np.round(
                t.column("o_totalprice").to_numpy(zero_copy_only=False)
                * 100.0
            ).astype(np.int64)
            # pre-aggregate per custkey inside the block
            tab = pa.table(
                {"key": pa.array(k), "cents": pa.array(cents)}
            ).group_by("key").aggregate([("cents", "sum")])
            kk = tab.column("key").to_numpy(zero_copy_only=False)
            return pa.table(
                {"key": tab.column("key"),
                 "nkey": pa.array(
                     np.full(len(kk), -1, dtype=np.int64)),
                 "cents": tab.column("cents_sum").cast(pa.int64()),
                 "kind": pa.array(
                     np.ones(len(kk), dtype=np.int8), type=pa.int8()),
                 "bucket": pa.array(
                     (((kk.astype(np.uint64) * _MIX) >> np.uint64(48))
                      .astype(np.int64)) % n_buckets)}
            )

        def bucket_join(g: pa.Table) -> pa.Table:
            # the dim maps are tiny (25 nations, 5 regions): captured
            # in the closure and fetched once per task deserialization
            nat2reg_l, reg2name_l = ray.get(dim_ref)
            kind = g.column("kind").to_numpy(zero_copy_only=False)
            cust = g.filter(pa.array(kind == 0))
            orders = g.filter(pa.array(kind == 1))
            ck = cust.column("key").to_numpy(zero_copy_only=False)
            cn = cust.column("nkey").to_numpy(zero_copy_only=False)
            okk = orders.column("key").to_numpy(zero_copy_only=False)
            ocents = orders.column("cents").to_numpy(
                zero_copy_only=False)
            empty = pa.table(
                {"region": pa.array([], type=pa.string()),
                 "revenue_cents": pa.array([], type=pa.int64())}
            )
            if ck.size == 0 or okk.size == 0:
                return empty
            order = np.argsort(ck, kind="stable")
            ck_s, cn_s = ck[order], cn[order]
            idx = np.clip(np.searchsorted(ck_s, okk), 0,
                          ck_s.size - 1)
            hit = ck_s[idx] == okk
            if not hit.any():
                return empty
            nkv = cn_s[idx[hit]].astype(int)
            cents = ocents[hit]
            names = reg2name_l[nat2reg_l[nkv]]
            a = pa.table(
                {"region": pa.array(names, type=pa.string()),
                 "revenue_cents": pa.array(cents, type=pa.int64())}
            ).group_by("region").aggregate([("revenue_cents", "sum")])
            return pa.table(
                {"region": a.column("region"),
                 "revenue_cents": a.column(
                     "revenue_cents_sum").cast(pa.int64())}
            )

        cust = read_cols(sf_dir, "customer", ["c_custkey", "c_nationkey"]).map_batches(cust_prep, batch_format="pyarrow")
        orders = read_cols(sf_dir, "orders", ["o_custkey", "o_totalprice"]).map_batches(ord_prep, batch_format="pyarrow")

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by("region").aggregate(
                [("revenue_cents", "sum")]
            )
            return pa.table(
                {"region": g.column("region"),
                 "revenue_cents":
                     g.column("revenue_cents_sum").cast(pa.int64())}
            )

        refs = list(
            cust.union(orders)
            .groupby("bucket")
            .map_groups(bucket_join, batch_format="pyarrow")
            .to_arrow_refs()
        )
        out = tree_reduce_tables(refs, merge)
        return pa.table(
            {"region": out.column("region").cast(pa.string()),
             "revenue_cents":
                 out.column("revenue_cents").cast(pa.int64())}
        )

    sql = """
    SELECT r.r_name AS region,
           CAST(sum(CAST(round_even(o.o_totalprice * 100, 0)
                         AS BIGINT)) AS BIGINT) AS revenue_cents
    FROM orders o
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    GROUP BY r.r_name
    """
    return q, sql


# ------------------------------------------------------------ doc_cusum_alarms
def _cusum_query(k: int = CUSUM_K, h: int = CUSUM_H):
    def q(sf_dir: str):
        from ..stages.rollup import _flat_tokens

        def cusum(t: pa.Table) -> pa.Table:
            empty = pa.table(
                {"doc_id": pa.array([], type=pa.int64()),
                 "n_tok": pa.array([], type=pa.int64()),
                 "max_s": pa.array([], type=pa.int64()),
                 "n_alarms": pa.array([], type=pa.int64())}
            )
            if "tokens" not in t.column_names:
                return empty
            values, lengths = _flat_tokens(t)
            if values.size == 0:
                return empty
            v = values.astype(np.int64)
            lens = lengths.astype(np.int64)
            seg = np.repeat(np.arange(lens.size, dtype=np.int64), lens)
            c = np.cumsum(v - k)
            # reset cumsum at doc starts: subtract C just before start
            starts_all = np.concatenate(([0], np.cumsum(lens)))[:-1]
            base = np.repeat(
                np.concatenate(([0], c[np.cumsum(lens) - 1][:-1]))
                if lens.size else np.zeros(0, np.int64),
                lens,
            )
            cd = c - base  # per-doc cumsum of (x - k)
            # running min with reset via the segment-offset trick:
            # |cd| < 2^33 (tokens < 2^21 over < 2^12-length docs)
            shifted = cd - (seg << _SEG_SHIFT)
            rmin = np.minimum.accumulate(shifted) + (seg << _SEG_SHIFT)
            # S_t = cd_t - min(0, running min of cd) — the chart starts
            # at S_0' = 0 before the first point
            s = cd - np.minimum(rmin, 0)
            keep = lens > 0
            starts = starts_all[keep]
            max_s = np.maximum.reduceat(s, starts)
            alarms = np.add.reduceat(
                (s > h).astype(np.int64), starts
            )
            ids = np.asarray(
                [int(x) for x in t.column("doc_id").to_pylist()],
                dtype=np.int64,
            )[keep]
            return pa.table(
                {"doc_id": pa.array(ids),
                 "n_tok": pa.array(lens[keep]),
                 "max_s": pa.array(max_s),
                 "n_alarms": pa.array(alarms)}
            )

        return _cast(
            corpus_ds(sf_dir).map_batches(cusum,
                                          batch_format="pyarrow"),
            {"doc_id": pa.int64(), "n_tok": pa.int64(),
             "max_s": pa.int64(), "n_alarms": pa.int64()},
        )

    sql = f"""
    WITH tok AS ({SQL_TOK}),
    c AS (
        SELECT doc_id, pos,
               sum(token - {k}) OVER (PARTITION BY doc_id ORDER BY pos
                                      ROWS UNBOUNDED PRECEDING) AS cd
        FROM tok
    ),
    s AS (
        SELECT doc_id,
               cd - least(min(cd) OVER (PARTITION BY doc_id
                                        ORDER BY pos
                                        ROWS UNBOUNDED PRECEDING),
                          0) AS st
        FROM c
    )
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(count(*) AS BIGINT) AS n_tok,
           CAST(max(st) AS BIGINT) AS max_s,
           CAST(sum(CASE WHEN st > {h} THEN 1 ELSE 0 END) AS BIGINT)
               AS n_alarms
    FROM s GROUP BY doc_id
    """
    return q, sql


def build_wave34_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("doc_runs_test",) + _runs_test_query()))
    add(*(("source_gini",) + _gini_query()))
    add(*(("region_revenue",) + _region_revenue_query()))
    add(*(("doc_cusum_alarms",) + _cusum_query()))
    return queries, oracles
