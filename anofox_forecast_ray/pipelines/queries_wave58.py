"""Wave-58 queries: TPC-H Q10 returned-item revenue, exact-midrank
Spearman trend, and zlib compressibility quality signal.

- orders_q10_returned_revenue: TPC-H Q10 (top customers by revenue
  lost to returned items in a quarter). Scale shape: per-(okey)
  integer revenue partials from lineitem (l_returnflag filter at the
  read), bucketed okey groupby joins them with the date-filtered
  orders rows; the per-bucket output is (custkey, ru) partials which
  re-shuffle BY CUSTKEY for a per-bucket top-k — two shuffles, both
  of integer partials, never raw rows; the driver merges 64 x k rows
  and point-reads the k winners' names with a pushed-down parquet
  filter. Grouping key is per-customer (high cardinality at scale) —
  that is why the second shuffle exists instead of a driver merge.
- doc_spearman_trend: Spearman rank correlation between token
  position and token value per doc — monotonic-trend screen that the
  OLS slope (doc_ols_trend) misses under outliers. Doubled midranks
  keep every aggregate integer (dmid = 2*min_rank + tie_count - 1);
  rho is one scalar num / math.sqrt(d1 * d2) per doc (scalar libm ==
  DuckDB sqrt; numpy ARRAY sqrt would not bit-match — see NOTES.md).
- doc_compress_ratio: Gopher/FineWeb-style compressibility filter —
  zlib level-6 compressed size over raw utf-8 size per document
  (high ratio = low redundancy, near-zero = degenerate repetition).
  C-level codec per doc inside map_batches; golden-checked by a
  sequential replay (tools/golden_oracles.check_compress).
"""

from __future__ import annotations

import math
import zlib

import numpy as np
import pyarrow as pa

from .queries import SQL_TOK, _cast, _num_read_blocks, corpus_ds
from ._scaffold import read_cols

Q10_LO = "1997-01-01"
Q10_HI = "1997-04-01"
Q10_TOPK = 20
ZLIB_LEVEL = 6
N_BUCKETS = 64

_MIX = np.uint64(0x9E3779B97F4A7C15)


def _hash_bucket(k: np.ndarray) -> np.ndarray:
    mix = k.astype(np.uint64) * _MIX
    return ((mix >> np.uint64(48)).astype(np.int64)) % N_BUCKETS


# ---------------------------------------------- orders_q10_returned_revenue
def _q10_query(lo: str = Q10_LO, hi: str = Q10_HI,
               topk: int = Q10_TOPK):
    def q(sf_dir: str):
        import pandas as pd
        import pyarrow.compute as pc
        import pyarrow.parquet as pq
        import ray.data as rd

        lo_us = int(np.datetime64(lo).astype("datetime64[us]")
                    .astype(np.int64))
        hi_us = int(np.datetime64(hi).astype("datetime64[us]")
                    .astype(np.int64))

        def orders_prep(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "okey": pa.array([], type=pa.int64()),
                "val": pa.array([], type=pa.int64()),
                "kind": pa.array([], type=pa.int8()),
            })
            if "o_orderkey" not in t.column_names:
                return empty
            okey = t.column("o_orderkey").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            ckey = t.column("o_custkey").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            odate = t.column("o_orderdate").cast(
                pa.int64()).to_numpy(zero_copy_only=False)
            keep = (odate >= lo_us) & (odate < hi_us)
            n = int(keep.sum())
            return pa.table({
                "okey": pa.array(okey[keep]),
                "val": pa.array(ckey[keep]),
                "kind": pa.array(np.zeros(n, dtype=np.int8),
                                 type=pa.int8()),
            })

        def lineitem_partial(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "okey": pa.array([], type=pa.int64()),
                "val": pa.array([], type=pa.int64()),
                "kind": pa.array([], type=pa.int8()),
            })
            if "l_orderkey" not in t.column_names:
                return empty
            flag = t.column("l_returnflag").to_numpy(
                zero_copy_only=False)
            keep = flag == "R"
            okey = t.column("l_orderkey").cast(pa.int64()).to_numpy(
                zero_copy_only=False)[keep]
            cents = np.round(
                t.column("l_extendedprice").to_numpy(
                    zero_copy_only=False)[keep] * 100.0
            ).astype(np.int64)
            bp = np.round(
                t.column("l_discount").to_numpy(
                    zero_copy_only=False)[keep] * 10000.0
            ).astype(np.int64)
            ru = cents * (10000 - bp)
            df = pd.DataFrame({"okey": okey, "ru": ru})
            g = df.groupby("okey", sort=False)["ru"].sum()
            return pa.table({
                "okey": pa.array(g.index.to_numpy(np.int64)),
                "val": pa.array(g.to_numpy(np.int64)),
                "kind": pa.array(np.ones(len(g), dtype=np.int8),
                                 type=pa.int8()),
            })

        def okey_bucket(t: pa.Table) -> pa.Table:
            b = _hash_bucket(
                t.column("okey").to_numpy(zero_copy_only=False))
            return t.append_column("__bucket", pa.array(b))

        def bucket_cust_partial(g: pa.Table) -> pa.Table:
            # okey unique on the orders side -> sorted searchsorted
            # lookup; per-custkey int64 sums via sort + reduceat (exact)
            kind = g.column("kind").to_numpy(zero_copy_only=False)
            od = g.filter(pa.array(kind == 0))
            li = g.filter(pa.array(kind == 1))
            ok = od.column("okey").to_numpy(zero_copy_only=False)
            cust = od.column("val").to_numpy(zero_copy_only=False)
            lk = li.column("okey").to_numpy(zero_copy_only=False)
            lv = li.column("val").to_numpy(zero_copy_only=False)
            if ok.size == 0 or lk.size == 0:
                return pa.table({
                    "custkey": pa.array([], type=pa.int64()),
                    "ru": pa.array([], type=pa.int64()),
                })
            order = np.argsort(ok, kind="stable")
            ok_s, cust_s = ok[order], cust[order]
            idx = np.clip(np.searchsorted(ok_s, lk), 0, ok_s.size - 1)
            hit = ok_s[idx] == lk
            ck = cust_s[idx[hit]]
            vv = lv[hit]
            if ck.size == 0:
                return pa.table({
                    "custkey": pa.array([], type=pa.int64()),
                    "ru": pa.array([], type=pa.int64()),
                })
            o2 = np.argsort(ck, kind="stable")
            ck_s, vv_s = ck[o2], vv[o2]
            starts = np.flatnonzero(
                np.r_[True, ck_s[1:] != ck_s[:-1]]
            )
            return pa.table({
                "custkey": pa.array(ck_s[starts], type=pa.int64()),
                "ru": pa.array(np.add.reduceat(vv_s, starts),
                               type=pa.int64()),
            })

        def cust_bucket(t: pa.Table) -> pa.Table:
            b = _hash_bucket(
                t.column("custkey").to_numpy(zero_copy_only=False))
            return t.append_column("__bucket", pa.array(b))

        def bucket_topk(g: pa.Table) -> pa.Table:
            ck = g.column("custkey").to_numpy(zero_copy_only=False)
            ru = g.column("ru").to_numpy(zero_copy_only=False)
            o2 = np.argsort(ck, kind="stable")
            ck_s, ru_s = ck[o2], ru[o2]
            starts = np.flatnonzero(
                np.r_[True, ck_s[1:] != ck_s[:-1]]
            )
            uk = ck_s[starts]
            tot = np.add.reduceat(ru_s, starts)
            # (-ru, custkey) lexsort == sort_values(desc ru, asc key)
            sel = np.lexsort((uk, -tot))[:topk]
            return pa.table({
                "custkey": pa.array(uk[sel], type=pa.int64()),
                "ru": pa.array(tot[sel], type=pa.int64()),
            })

        orders = (
            read_cols(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])
            .map_batches(orders_prep, batch_format="pyarrow")
        )
        line = (
            read_cols(sf_dir, "lineitem", ["l_orderkey", "l_returnflag",
                         "l_extendedprice", "l_discount"])
            .map_batches(lineitem_partial, batch_format="pyarrow")
        )
        cand = (
            orders.union(line)
            .map_batches(okey_bucket, batch_format="pyarrow")
            .groupby("__bucket")
            .map_groups(bucket_cust_partial, batch_format="pyarrow")
            .map_batches(cust_bucket, batch_format="pyarrow")
            .groupby("__bucket")
            .map_groups(bucket_topk, batch_format="pyarrow")
            .to_pandas()
        )
        top = cand.sort_values(
            ["ru", "custkey"], ascending=[False, True]
        ).head(topk).reset_index(drop=True)

        # point-read the k winners' dims with a pushed-down filter
        win = top["custkey"].to_numpy(np.int64)
        cust = pq.read_table(
            f"{sf_dir}/customer.parquet",
            columns=["c_custkey", "c_name", "c_nationkey"],
            filters=pc.field("c_custkey").isin(win.tolist()),
        ).to_pandas()
        nat = pq.read_table(
            f"{sf_dir}/nation.parquet",
            columns=["n_nationkey", "n_name"],
        ).to_pandas()
        m = top.rename(columns={"custkey": "c_custkey"}).merge(
            cust, on="c_custkey").merge(
            nat, left_on="c_nationkey", right_on="n_nationkey")
        m = m.sort_values(["ru", "c_custkey"],
                          ascending=[False, True])
        ru = m["ru"].to_numpy(np.int64)
        return pa.table({
            "c_custkey": pa.array(
                m["c_custkey"].to_numpy(np.int64)),
            "c_name": pa.array(m["c_name"], type=pa.string()),
            "n_name": pa.array(m["n_name"], type=pa.string()),
            "rev_units": pa.array(ru),
            "revenue": pa.array(ru.astype(np.float64) / 1e6,
                                type=pa.float64()),
        })

    sql = f"""
    WITH l AS (
        SELECT l_orderkey AS okey,
               CAST(round_even(l_extendedprice * 100, 0) AS BIGINT)
               * (10000 - CAST(round_even(l_discount * 10000, 0)
                               AS BIGINT)) AS ru
        FROM lineitem WHERE l_returnflag = 'R'
    ),
    j AS (
        SELECT o_custkey AS custkey, CAST(sum(ru) AS BIGINT) AS ru
        FROM l JOIN orders ON okey = o_orderkey
        WHERE o_orderdate >= TIMESTAMP '{lo}'
          AND o_orderdate < TIMESTAMP '{hi}'
        GROUP BY o_custkey
    )
    SELECT c_custkey, c_name, n_name,
           j.ru AS rev_units,
           CAST(j.ru AS DOUBLE) / 1000000.0 AS revenue
    FROM j
    JOIN customer ON c_custkey = j.custkey
    JOIN nation ON n_nationkey = c_nationkey
    ORDER BY j.ru DESC, c_custkey ASC
    LIMIT {topk}
    """
    return q, sql


# --------------------------------------------------------- doc_spearman_trend
def _spearman_query():
    def q(sf_dir: str):
        def spearman(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "doc_id": pa.array([], type=pa.string()),
                "n": pa.array([], type=pa.int64()),
                "num": pa.array([], type=pa.int64()),
                "den_x": pa.array([], type=pa.int64()),
                "den_y": pa.array([], type=pa.int64()),
                "rho": pa.array([], type=pa.float64()),
            })
            if "tokens" not in t.column_names:
                return empty
            toks = t.column("tokens").combine_chunks()
            flat = toks.flatten().to_numpy(
                zero_copy_only=False).astype(np.int64)
            offs = toks.offsets.to_numpy(
                zero_copy_only=False).astype(np.int64)
            offs = offs - offs[0]
            lens = np.diff(offs)
            keep = lens > 0
            if not keep.any():
                return empty
            ids = [d for d, k in zip(
                t.column("doc_id").to_pylist(), keep) if k]
            starts = offs[:-1][keep]
            n = lens[keep]
            ndocs = len(n)
            doc_idx = np.repeat(np.arange(ndocs, dtype=np.int64), n)
            pos = np.arange(len(flat), dtype=np.int64) - np.repeat(
                starts, n)
            # doubled midranks of token within doc: sort by
            # (doc, token); tie group -> dmid = 2*min_rank + c - 1
            order = np.lexsort((flat, doc_idx))
            sd, st = doc_idx[order], flat[order]
            rank_in_doc = np.arange(len(st), dtype=np.int64) - \
                np.repeat(np.cumsum(n) - n, n) + 1
            new_grp = np.r_[True, (sd[1:] != sd[:-1])
                            | (st[1:] != st[:-1])]
            gid = np.cumsum(new_grp) - 1
            gstart = np.flatnonzero(new_grp)
            gcnt = np.diff(np.r_[gstart, len(st)])
            dmid_sorted = (2 * rank_in_doc[gstart][gid]
                           + gcnt[gid] - 1)
            dmid = np.empty(len(st), dtype=np.int64)
            dmid[order] = dmid_sorted
            dx = 2 * (pos + 1)
            # per-doc integer sums (rows are doc-contiguous)
            sl = np.add.reduceat
            bounds = np.cumsum(n) - n
            s_xy = sl(dx * dmid, bounds)
            s_yy = sl(dmid * dmid, bounds)
            s_y = sl(dmid, bounds)  # == n*(n+1), kept for clarity
            s_x = s_y.copy()
            s_xx = sl(dx * dx, bounds)
            num = n * s_xy - s_x * s_y
            den_x = n * s_xx - s_x * s_x
            den_y = n * s_yy - s_y * s_y
            rho = np.zeros(ndocs, dtype=np.float64)
            for i in range(ndocs):
                d = float(den_x[i]) * float(den_y[i])
                if d > 0:
                    rho[i] = float(num[i]) / math.sqrt(d)
            return pa.table({
                "doc_id": pa.array(ids, type=pa.string()),
                "n": pa.array(n),
                "num": pa.array(num),
                "den_x": pa.array(den_x),
                "den_y": pa.array(den_y),
                "rho": pa.array(rho, type=pa.float64()),
            })

        ds = corpus_ds(sf_dir).map_batches(
            spearman, batch_format="pyarrow")
        return _cast(ds, {
            "doc_id": pa.string(),
            "n": pa.int64(),
            "num": pa.int64(),
            "den_x": pa.int64(),
            "den_y": pa.int64(),
            "rho": pa.float64(),
        })

    sql = f"""
    WITH tok AS ({SQL_TOK}),
    r AS (
        SELECT doc_id, pos, token,
               2 * (pos + 1) AS dx,
               2 * rank() OVER (PARTITION BY doc_id
                                ORDER BY token)
               + count(*) OVER (PARTITION BY doc_id, token)
               - 1 AS dmid
        FROM tok
    ),
    s AS (
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(dx * dmid) AS BIGINT) AS s_xy,
               CAST(sum(dx) AS BIGINT) AS s_x,
               CAST(sum(dmid) AS BIGINT) AS s_y,
               CAST(sum(dx * dx) AS BIGINT) AS s_xx,
               CAST(sum(dmid * dmid) AS BIGINT) AS s_yy
        FROM r GROUP BY doc_id
    )
    SELECT doc_id, n,
           n * s_xy - s_x * s_y AS num,
           n * s_xx - s_x * s_x AS den_x,
           n * s_yy - s_y * s_y AS den_y,
           CASE WHEN (n * s_xx - s_x * s_x) = 0
                  OR (n * s_yy - s_y * s_y) = 0 THEN 0.0
                ELSE CAST(n * s_xy - s_x * s_y AS DOUBLE)
                     / sqrt(CAST(n * s_xx - s_x * s_x AS DOUBLE)
                            * CAST(n * s_yy - s_y * s_y AS DOUBLE))
           END AS rho
    FROM s
    """
    return q, sql


# --------------------------------------------------------- doc_compress_ratio
def _compress_query(level: int = ZLIB_LEVEL):
    def q(sf_dir: str):
        import ray.data as rd

        def comp(t: pa.Table) -> pa.Table:
            if "doc_id" not in t.column_names:
                return pa.table({
                    "doc_id": pa.array([], type=pa.int64()),
                    "raw_bytes": pa.array([], type=pa.int64()),
                    "comp_bytes": pa.array([], type=pa.int64()),
                    "ratio": pa.array([], type=pa.float64()),
                })
            texts = t.column("text").to_pylist()
            raw = np.empty(len(texts), dtype=np.int64)
            cmp_ = np.empty(len(texts), dtype=np.int64)
            for i, txt in enumerate(texts):
                b = (txt or "").encode("utf-8")
                raw[i] = len(b)
                cmp_[i] = len(zlib.compress(b, level))
            ratio = np.where(
                raw > 0,
                cmp_.astype(np.float64)
                / np.maximum(raw, 1).astype(np.float64),
                0.0,
            )
            return pa.table({
                "doc_id": t.column("doc_id").cast(pa.int64()),
                "raw_bytes": pa.array(raw),
                "comp_bytes": pa.array(cmp_),
                "ratio": pa.array(ratio, type=pa.float64()),
            })

        return (
            read_cols(sf_dir, "documents", ["doc_id", "text"])
            .map_batches(comp, batch_format="pyarrow")
        )

    return q, None  # golden-checked (zlib is not SQL-expressible)


def build_wave58_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("orders_q10_returned_revenue",) + _q10_query()))
    add(*(("doc_spearman_trend",) + _spearman_query()))
    add(*(("doc_compress_ratio",) + _compress_query()))
    return queries, oracles
