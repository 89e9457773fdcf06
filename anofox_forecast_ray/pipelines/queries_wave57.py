"""Wave-57 queries: TPC-H Q5 multi-join, market-basket part pairs,
and integer-exact SAX symbolization.

- lineitem_q5_nation_revenue: TPC-H Q5 (local-supplier volume by
  nation within a region/year). Scale shape: customer/supplier
  nationkeys are broadcast once as DENSE int8 arrays indexed by key
  (1 byte per customer — ~150 MB at sf1000, a legitimate broadcast;
  assumption documented: keys are dense ints, nationkey < 128).
  Lineitem revenue collapses to per-(okey, s_nation) integer partials
  BEFORE the shuffle; one bucketed groupby co-locates them with the
  filtered orders rows (okey, c_nation); per-bucket equality filter +
  per-nation sums; driver merges <= 64 x 25 rows. Revenue in exact
  integer units: cents x (10000 - discount_bp).
- lineitem_basket_pairs: top-k co-occurring DISTINCT part pairs
  within an order (frequent-itemset pair counting). Per-block
  distinct (okey, pkey) partials, bucketed groupby okey co-locates
  each order's lines, vectorized per-order pair expansion (sorted
  offsets + repeat/arange, no Python loop over orders), local pair
  counts, driver merges bounded (pair, cnt) partials and takes the
  global top-k (cnt desc, p1 asc, p2 asc).
- doc_sax_w8: SAX-style symbolization of each doc's token series —
  w8 window sums quantized to a 4-letter alphabet with ALL-INTEGER
  arithmetic: sym = ((s - cnt*mn) * 4) // (cnt*(mx - mn) + 1) with
  per-doc min/max, so the engine and DuckDB agree bitwise with no
  float breakpoints. Emits the symbol string + distinct-symbol count
  per doc, computed in-row (reduceat over list offsets, zero
  shuffle).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .queries import SQL_TOK, _cast, _num_read_blocks, corpus_ds
from ._scaffold import read_cols

Q5_REGIONKEY = 2  # 'ASIA'
Q5_LO = "1996-01-01"
Q5_HI = "1997-01-01"
BASKET_TOPK = 15
SAX_W = 8
SAX_A = 4
N_BUCKETS = 64

_MIX = np.uint64(0x9E3779B97F4A7C15)


def _okey_bucket(t: pa.Table, col: str = "okey") -> pa.Table:
    k = t.column(col).to_numpy(zero_copy_only=False)
    mix = k.astype(np.uint64) * _MIX
    b = ((mix >> np.uint64(48)).astype(np.int64)) % N_BUCKETS
    return t.append_column("__bucket", pa.array(b))


# ------------------------------------------------- lineitem_q5_nation_revenue
def _q5_query(regionkey: int = Q5_REGIONKEY, lo: str = Q5_LO,
              hi: str = Q5_HI):
    def q(sf_dir: str):
        import pandas as pd
        import ray
        import ray.data as rd

        lo_us = int(np.datetime64(lo).astype("datetime64[us]")
                    .astype(np.int64))
        hi_us = int(np.datetime64(hi).astype("datetime64[us]")
                    .astype(np.int64))

        # Dims: nation names/regions are tiny; customer/supplier
        # nationkeys become dense int8 lookup arrays (broadcast once).
        nat = rd.read_parquet(f"{sf_dir}/nation.parquet").to_pandas()
        in_region = nat[nat["n_regionkey"] == regionkey]
        nat_names = dict(zip(in_region["n_nationkey"].astype(int),
                             in_region["n_name"]))
        region_nats = np.zeros(
            int(nat["n_nationkey"].max()) + 1, dtype=bool)
        region_nats[in_region["n_nationkey"].to_numpy(int)] = True

        cust = rd.read_parquet(
            f"{sf_dir}/customer.parquet",
            columns=["c_custkey", "c_nationkey"],
        ).to_pandas()
        c_nat = np.full(int(cust["c_custkey"].max()) + 1, -1,
                        dtype=np.int8)
        c_nat[cust["c_custkey"].to_numpy(np.int64)] = (
            cust["c_nationkey"].to_numpy(np.int8))

        supp = rd.read_parquet(
            f"{sf_dir}/supplier.parquet",
            columns=["s_suppkey", "s_nationkey"],
        ).to_pandas()
        s_nat = np.full(int(supp["s_suppkey"].max()) + 1, -1,
                        dtype=np.int8)
        s_nat[supp["s_suppkey"].to_numpy(np.int64)] = (
            supp["s_nationkey"].to_numpy(np.int8))

        c_nat_ref = ray.put(c_nat)
        s_nat_ref = ray.put(s_nat)
        region_ref = ray.put(region_nats)

        def orders_prep(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "okey": pa.array([], type=pa.int64()),
                "nat": pa.array([], type=pa.int8()),
                "val": pa.array([], type=pa.int64()),
                "kind": pa.array([], type=pa.int8()),
            })
            if "o_orderkey" not in t.column_names:
                return empty
            lut = ray.get(c_nat_ref)
            keep_nat = ray.get(region_ref)
            okey = t.column("o_orderkey").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            ckey = t.column("o_custkey").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            odate = t.column("o_orderdate").cast(
                pa.int64()).to_numpy(zero_copy_only=False)
            nt = lut[ckey]
            keep = ((odate >= lo_us) & (odate < hi_us)
                    & (nt >= 0) & keep_nat[np.maximum(nt, 0)])
            n = int(keep.sum())
            return pa.table({
                "okey": pa.array(okey[keep]),
                "nat": pa.array(nt[keep], type=pa.int8()),
                "val": pa.array(np.zeros(n, dtype=np.int64)),
                "kind": pa.array(np.zeros(n, dtype=np.int8),
                                 type=pa.int8()),
            })

        def lineitem_partial(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "okey": pa.array([], type=pa.int64()),
                "nat": pa.array([], type=pa.int8()),
                "val": pa.array([], type=pa.int64()),
                "kind": pa.array([], type=pa.int8()),
            })
            if "l_orderkey" not in t.column_names:
                return empty
            lut = ray.get(s_nat_ref)
            keep_nat = ray.get(region_ref)
            okey = t.column("l_orderkey").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            skey = t.column("l_suppkey").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            nt = lut[skey]
            keep = (nt >= 0) & keep_nat[np.maximum(nt, 0)]
            okey, nt = okey[keep], nt[keep]
            cents = np.round(
                t.column("l_extendedprice").to_numpy(
                    zero_copy_only=False)[keep] * 100.0
            ).astype(np.int64)
            bp = np.round(
                t.column("l_discount").to_numpy(
                    zero_copy_only=False)[keep] * 10000.0
            ).astype(np.int64)
            ru = cents * (10000 - bp)
            df = pd.DataFrame({"okey": okey, "nat": nt, "ru": ru})
            g = df.groupby(["okey", "nat"], sort=False)["ru"].sum()
            idx = g.index.to_frame(index=False)
            n = len(g)
            return pa.table({
                "okey": pa.array(idx["okey"].to_numpy(np.int64)),
                "nat": pa.array(idx["nat"].to_numpy(np.int8),
                                type=pa.int8()),
                "val": pa.array(g.to_numpy(np.int64)),
                "kind": pa.array(np.ones(n, dtype=np.int8),
                                 type=pa.int8()),
            })

        def bucket_rev(g: pa.Table) -> pa.Table:
            # semi-join on the composite (okey, nat): since okey is
            # unique on the orders side, a lineitem row matches iff the
            # order exists AND carries the same nat — one sorted lookup
            # + equality check; per-nat int64 sums via sort + reduceat
            kind = g.column("kind").to_numpy(zero_copy_only=False)
            od = g.filter(pa.array(kind == 0))
            li = g.filter(pa.array(kind == 1))
            ok = od.column("okey").to_numpy(zero_copy_only=False)
            onat = od.column("nat").to_numpy(zero_copy_only=False)
            lk = li.column("okey").to_numpy(zero_copy_only=False)
            lnat = li.column("nat").to_numpy(zero_copy_only=False)
            lval = li.column("val").to_numpy(zero_copy_only=False)
            if ok.size == 0 or lk.size == 0:
                return pa.table({
                    "nat": pa.array([], type=pa.int8()),
                    "rev_units": pa.array([], type=pa.int64()),
                })
            order = np.argsort(ok, kind="stable")
            ok_s, onat_s = ok[order], onat[order]
            idx = np.clip(np.searchsorted(ok_s, lk), 0, ok_s.size - 1)
            hit = (ok_s[idx] == lk) & (onat_s[idx] == lnat)
            nn = lnat[hit]
            vv = lval[hit]
            if nn.size == 0:
                return pa.table({
                    "nat": pa.array([], type=pa.int8()),
                    "rev_units": pa.array([], type=pa.int64()),
                })
            o2 = np.argsort(nn, kind="stable")
            nn_s, vv_s = nn[o2], vv[o2]
            starts = np.flatnonzero(
                np.r_[True, nn_s[1:] != nn_s[:-1]]
            )
            return pa.table({
                "nat": pa.array(nn_s[starts].astype(np.int8),
                                type=pa.int8()),
                "rev_units": pa.array(np.add.reduceat(vv_s, starts),
                                      type=pa.int64()),
            })

        orders = (
            read_cols(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])
            .map_batches(orders_prep, batch_format="pyarrow")
        )
        line = (
            read_cols(sf_dir, "lineitem", ["l_orderkey", "l_suppkey",
                         "l_extendedprice", "l_discount"])
            .map_batches(lineitem_partial, batch_format="pyarrow")
        )
        part = (
            orders.union(line)
            .map_batches(_okey_bucket, batch_format="pyarrow")
            .groupby("__bucket")
            .map_groups(bucket_rev, batch_format="pyarrow")
            .to_pandas()
        )
        s = part.groupby("nat", sort=False)["rev_units"].sum()
        out = s.reset_index().rename(columns={"rev_units": "ru"})
        out["n_name"] = [nat_names[int(k)] for k in out["nat"]]
        out = out.sort_values(
            ["ru", "n_name"], ascending=[False, True]
        ).reset_index(drop=True)
        ru = out["ru"].to_numpy(np.int64)
        return pa.table({
            "n_name": pa.array(out["n_name"], type=pa.string()),
            "rev_units": pa.array(ru),
            "revenue": pa.array(ru.astype(np.float64) / 1e6,
                                type=pa.float64()),
        })

    sql = f"""
    WITH rn AS (
        SELECT n_nationkey, n_name
        FROM nation WHERE n_regionkey = {regionkey}
    ),
    j AS (
        SELECT rn.n_name,
               CAST(round_even(l_extendedprice * 100, 0) AS BIGINT)
               * (10000 - CAST(round_even(l_discount * 10000, 0)
                               AS BIGINT)) AS ru
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN rn ON rn.n_nationkey = s_nationkey
        WHERE c_nationkey = s_nationkey
          AND o_orderdate >= TIMESTAMP '{lo}'
          AND o_orderdate < TIMESTAMP '{hi}'
    )
    SELECT n_name,
           CAST(sum(ru) AS BIGINT) AS rev_units,
           CAST(sum(ru) AS DOUBLE) / 1000000.0 AS revenue
    FROM j GROUP BY n_name
    ORDER BY rev_units DESC, n_name ASC
    """
    return q, sql


# ---------------------------------------------------- lineitem_basket_pairs
def _basket_query(topk: int = BASKET_TOPK):
    def q(sf_dir: str):
        import pandas as pd
        import ray.data as rd

        def _dedup2(ok: np.ndarray, pk: np.ndarray):
            """Sorted distinct (ok, pk) rows without int packing
            (ok * P + pk overflows int64 at real TPC-H key ranges)."""
            order = np.lexsort((pk, ok))
            ok, pk = ok[order], pk[order]
            keep = np.r_[True, (ok[1:] != ok[:-1])
                         | (pk[1:] != pk[:-1])]
            return ok[keep], pk[keep]

        def distinct_partial(t: pa.Table) -> pa.Table:
            if "l_orderkey" not in t.column_names:
                return pa.table({
                    "okey": pa.array([], type=pa.int64()),
                    "pkey": pa.array([], type=pa.int64()),
                })
            ok = t.column("l_orderkey").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            pk = t.column("l_partkey").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            ok, pk = _dedup2(ok, pk)
            return pa.table({
                "okey": pa.array(ok),
                "pkey": pa.array(pk),
            })

        def bucket_pairs(g: pa.Table) -> pa.Table:
            # re-dedup: the same (order, part) can arrive from
            # several input blocks
            ok, pk = _dedup2(
                g.column("okey").to_numpy(zero_copy_only=False),
                g.column("pkey").to_numpy(zero_copy_only=False),
            )
            # per-order offsets (ok sorted, pk sorted within order)
            first = np.r_[True, ok[1:] != ok[:-1]]
            starts = np.flatnonzero(first)
            counts = np.diff(np.r_[starts, len(ok)])
            # vectorized pair expansion via per-order cross product
            # (baskets are tiny: c^2 vs c(c-1)/2 is a 2x constant),
            # then keep i < j
            sq = counts * counts
            tot = int(sq.sum())
            if tot == 0:
                return pa.table({
                    "p1": pa.array([], type=pa.int64()),
                    "p2": pa.array([], type=pa.int64()),
                    "cnt": pa.array([], type=pa.int64()),
                })
            grp = np.repeat(np.arange(len(counts)), sq)
            within = (np.arange(tot)
                      - np.repeat(np.cumsum(sq) - sq, sq))
            c = counts[grp]
            ii = within // c
            jj = within % c
            m = ii < jj
            base = starts[grp[m]]
            a = pk[base + ii[m]]
            b = pk[base + jj[m]]
            if a.size == 0:  # every order in the bucket is a singleton
                return pa.table({
                    "p1": pa.array([], type=pa.int64()),
                    "p2": pa.array([], type=pa.int64()),
                    "cnt": pa.array([], type=pa.int64()),
                })
            # pair counts via lexsort + run-length (exact ints; the
            # composite a*P+b key would overflow int64 at TPC-H ranges)
            o3 = np.lexsort((b, a))
            a_s, b_s = a[o3], b[o3]
            firstp = np.r_[True, (a_s[1:] != a_s[:-1])
                           | (b_s[1:] != b_s[:-1])]
            pstarts = np.flatnonzero(firstp)
            cnt = np.diff(np.r_[pstarts, a_s.size]).astype(np.int64)
            return pa.table({
                "p1": pa.array(a_s[pstarts], type=pa.int64()),
                "p2": pa.array(b_s[pstarts], type=pa.int64()),
                "cnt": pa.array(cnt),
            })

        cand = (
            read_cols(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
            .map_batches(distinct_partial, batch_format="pyarrow")
            .map_batches(_okey_bucket, batch_format="pyarrow")
            .groupby("__bucket")
            .map_groups(bucket_pairs, batch_format="pyarrow")
            .to_pandas()
        )
        s = cand.groupby(["p1", "p2"], sort=False)["cnt"].sum()
        out = s.reset_index().sort_values(
            ["cnt", "p1", "p2"], ascending=[False, True, True]
        ).head(topk)
        return pa.table({
            "p1": pa.array(out["p1"].to_numpy(np.int64)),
            "p2": pa.array(out["p2"].to_numpy(np.int64)),
            "cnt": pa.array(out["cnt"].to_numpy(np.int64)),
        })

    sql = f"""
    WITH d AS (
        SELECT DISTINCT l_orderkey AS okey, l_partkey AS pkey
        FROM lineitem
    )
    SELECT a.pkey AS p1, b.pkey AS p2,
           CAST(count(*) AS BIGINT) AS cnt
    FROM d a JOIN d b
      ON a.okey = b.okey AND a.pkey < b.pkey
    GROUP BY a.pkey, b.pkey
    ORDER BY cnt DESC, p1 ASC, p2 ASC
    LIMIT {topk}
    """
    return q, sql


# ------------------------------------------------------------------ doc_sax_w8
def _sax_query(width: int = SAX_W, alpha: int = SAX_A):
    def q(sf_dir: str):
        def sax(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "doc_id": pa.array([], type=pa.string()),
                "n_windows": pa.array([], type=pa.int64()),
                "sax": pa.array([], type=pa.string()),
                "n_syms": pa.array([], type=pa.int64()),
            })
            if "tokens" not in t.column_names:
                return empty
            toks = t.column("tokens").combine_chunks()
            flat = toks.flatten().to_numpy(
                zero_copy_only=False).astype(np.int64)
            offs = toks.offsets.to_numpy(
                zero_copy_only=False).astype(np.int64)
            offs = offs - offs[0]  # flatten() starts at offsets[0]
            lens = np.diff(offs)
            keep = lens > 0
            if not keep.any():
                return empty
            ids = t.column("doc_id").to_pylist()
            # per-doc min/max over ragged rows
            starts = offs[:-1][keep]
            ends = offs[1:][keep]
            mn = np.minimum.reduceat(flat, starts)
            mx = np.maximum.reduceat(flat, starts)
            # window boundaries: every `width` positions within a doc
            nw = (ends - starts + width - 1) // width
            tot = int(nw.sum())
            grp = np.repeat(np.arange(len(starts)), nw)
            wid = (np.arange(tot)
                   - np.repeat(np.cumsum(nw) - nw, nw))
            wstart = starts[grp] + wid * width
            wend = np.minimum(wstart + width, ends[grp])
            cnt = wend - wstart
            s = np.add.reduceat(flat, wstart)
            # trailing zero-length reduceat segments can't occur:
            # wstart < ends by construction
            num = (s - cnt * mn[grp]) * alpha
            den = cnt * (mx[grp] - mn[grp]) + 1
            sym = (num // den).astype(np.int64)
            letters = np.frombuffer(
                bytes(range(97, 97 + alpha)), dtype=np.uint8)
            sax_codes = letters[sym]
            # assemble per-doc strings
            out_ids, out_sax, out_nw, out_ns = [], [], [], []
            kept_ids = [d for d, k in zip(ids, keep) if k]
            pos = 0
            for i, d in enumerate(kept_ids):
                k = int(nw[i])
                chunk = sax_codes[pos:pos + k]
                out_ids.append(d)
                out_sax.append(chunk.tobytes().decode("ascii"))
                out_nw.append(k)
                out_ns.append(len(np.unique(chunk)))
                pos += k
            return pa.table({
                "doc_id": pa.array(out_ids, type=pa.string()),
                "n_windows": pa.array(
                    np.asarray(out_nw, dtype=np.int64)),
                "sax": pa.array(out_sax, type=pa.string()),
                "n_syms": pa.array(
                    np.asarray(out_ns, dtype=np.int64)),
            })

        ds = corpus_ds(sf_dir).map_batches(
            sax, batch_format="pyarrow")
        return _cast(ds, {
            "doc_id": pa.string(),
            "n_windows": pa.int64(),
            "sax": pa.string(),
            "n_syms": pa.int64(),
        })

    sql = f"""
    WITH tok AS ({SQL_TOK}),
    ext AS (
        SELECT doc_id, min(token) AS mn, max(token) AS mx
        FROM tok GROUP BY doc_id
    ),
    w AS (
        SELECT t.doc_id,
               t.pos // {width} AS window_id,
               CAST(count(*) AS BIGINT) AS cnt,
               CAST(sum(t.token) AS BIGINT) AS s,
               any_value(e.mn) AS mn,
               any_value(e.mx) AS mx
        FROM tok t JOIN ext e ON e.doc_id = t.doc_id
        GROUP BY t.doc_id, t.pos // {width}
    ),
    sym AS (
        SELECT doc_id, window_id,
               ((s - cnt * mn) * {alpha})
               // (cnt * (mx - mn) + 1) AS k
        FROM w
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_windows,
           string_agg(chr(97 + CAST(k AS INTEGER)), ''
                      ORDER BY window_id) AS sax,
           CAST(count(DISTINCT k) AS BIGINT) AS n_syms
    FROM sym GROUP BY doc_id
    """
    return q, sql


def build_wave57_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("lineitem_q5_nation_revenue",) + _q5_query()))
    add(*(("lineitem_basket_pairs",) + _basket_query()))
    add(*(("doc_sax_w8",) + _sax_query()))
    return queries, oracles
