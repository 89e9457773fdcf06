"""Wave-56 queries: Gopher repetition quality rules, user growth
curve, and TPC-H Q3.

- doc_repetition_stats: the Rae et al. 2021 (Gopher) repetition
  filters per document — duplicate-word fraction, duplicate
  word-trigram fraction, and top-word share — computed fully
  vectorized: one pd.factorize per batch, distinct counting via
  packed (doc, code) int64 keys, trigram identity via two-level
  exact code packing (pair-factorize then triple pack — injective,
  never hashed). All counts integer; fractions are one f64 division
  of identical ints on both sides.
- events_user_growth: per-day new users + cumulative user count —
  per-user first day via bucketed min (only (user, day) partials
  shuffle), bounded per-day histogram tree-reduced, cumsum on the
  driver over a few hundred day rows.
- orders_q3_topk: TPC-H Q3 (shipping-priority top-k) — customer
  segment filter broadcast via ray.put, lineitem revenue collapsed
  to per-orderkey integer partials BEFORE the shuffle, one bucketed
  groupby co-locates orders rows with lineitem partials, per-bucket
  local top-k (keys are bucket-complete), driver merges 64 x k rows.
  Revenue in exact integer units: cents x (10000 - discount_bp).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .queries import _cast, _num_read_blocks
from ._scaffold import read_cols

DAY_US = 86_400_000_000
Q3_SEGMENT = "BUILDING"
Q3_CUT = "1998-06-01"
Q3_TOPK = 10
N_BUCKETS = 64

_MIX = np.uint64(0x9E3779B97F4A7C15)


# -------------------------------------------------------- doc_repetition_stats
def _repetition_query():
    def q(sf_dir: str):
        import pandas as pd
        import ray.data as rd

        def stats(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "doc_id": pa.array([], type=pa.int64()),
                "n_words": pa.array([], type=pa.int64()),
                "n_distinct_words": pa.array([], type=pa.int64()),
                "n_trigrams": pa.array([], type=pa.int64()),
                "n_distinct_trigrams": pa.array([], type=pa.int64()),
                "top_word": pa.array([], type=pa.string()),
                "top_word_cnt": pa.array([], type=pa.int64()),
                "dup_word_frac": pa.array([], type=pa.float64()),
                "dup_trigram_frac": pa.array([], type=pa.float64()),
            })
            if "doc_id" not in t.column_names:
                return empty
            ids, counts, flat = [], [], []
            for did, txt in zip(
                t.column("doc_id").to_pylist(),
                t.column("text").to_pylist(),
            ):
                ws = [w for w in (txt or "").split(" ") if w]
                if not ws:
                    continue  # SQL emits no row for wordless docs
                ids.append(int(did))
                counts.append(len(ws))
                flat.extend(ws)
            if not ids:
                return empty
            ndocs = len(ids)
            counts = np.asarray(counts, dtype=np.int64)
            codes, uniques = pd.factorize(
                np.asarray(flat, dtype=object)
            )
            codes = codes.astype(np.int64)
            K = np.int64(len(uniques))
            doc_idx = np.repeat(
                np.arange(ndocs, dtype=np.int64), counts
            )

            # distinct words per doc: packed (doc, code) keys
            dw_keys = np.unique(doc_idx * K + codes)
            n_distinct_w = np.bincount(
                (dw_keys // K).astype(np.intp), minlength=ndocs
            ).astype(np.int64)

            # trigrams: factorize adjacent pairs, then pack with the
            # third code — exact identity, bounded int64 range
            n_tri = np.maximum(counts - 2, 0)
            if codes.size >= 3:
                pair = codes[:-2] * K + codes[1:-1]
                pu, pc = np.unique(pair, return_inverse=True)
                tri = pc.astype(np.int64) * K + codes[2:]
                valid = doc_idx[:-2] == doc_idx[2:]
                tu, tc = np.unique(tri[valid], return_inverse=True)
                T = np.int64(len(tu))
                dt_keys = np.unique(
                    doc_idx[:-2][valid] * T + tc.astype(np.int64)
                )
                n_distinct_t = np.bincount(
                    (dt_keys // T).astype(np.intp), minlength=ndocs
                ).astype(np.int64)
            else:
                n_distinct_t = np.zeros(ndocs, dtype=np.int64)

            # top word per doc: count (doc, code), order by
            # (cnt desc, lexicographic word asc)
            uk, uc = np.unique(doc_idx * K + codes,
                               return_counts=True)
            d = uk // K
            c = uk % K
            lexrank = np.empty(int(K), dtype=np.int64)
            lexrank[np.argsort(uniques)] = np.arange(
                int(K), dtype=np.int64
            )
            order = np.lexsort((lexrank[c], -uc, d))
            ds_, cs_, ccode = d[order], uc[order], c[order]
            first = np.r_[True, ds_[1:] != ds_[:-1]]
            top_code = ccode[first]
            top_cnt = cs_[first].astype(np.int64)

            dup_w = (counts - n_distinct_w).astype(
                np.float64
            ) / counts.astype(np.float64)
            denom = np.maximum(n_tri, 1)
            dup_t = np.where(
                n_tri == 0,
                0.0,
                (n_tri - n_distinct_t).astype(np.float64)
                / denom.astype(np.float64),
            )
            return pa.table({
                "doc_id": pa.array(
                    np.asarray(ids, dtype=np.int64)),
                "n_words": pa.array(counts),
                "n_distinct_words": pa.array(n_distinct_w),
                "n_trigrams": pa.array(n_tri),
                "n_distinct_trigrams": pa.array(n_distinct_t),
                "top_word": pa.array(
                    [str(uniques[i]) for i in top_code],
                    type=pa.string()),
                "top_word_cnt": pa.array(top_cnt),
                "dup_word_frac": pa.array(dup_w,
                                          type=pa.float64()),
                "dup_trigram_frac": pa.array(dup_t,
                                             type=pa.float64()),
            })

        ds = (
            read_cols(sf_dir, "documents", ["doc_id", "text"])
            .map_batches(stats, batch_format="pyarrow")
        )
        return _cast(ds, {
            "doc_id": pa.int64(),
            "n_words": pa.int64(),
            "n_distinct_words": pa.int64(),
            "n_trigrams": pa.int64(),
            "n_distinct_trigrams": pa.int64(),
            "top_word": pa.string(),
            "top_word_cnt": pa.int64(),
            "dup_word_frac": pa.float64(),
            "dup_trigram_frac": pa.float64(),
        })

    sql = """
    WITH w0 AS (
        SELECT doc_id,
               generate_subscripts(string_split(text, ' '), 1) AS pos,
               unnest(string_split(text, ' ')) AS word
        FROM documents
    ),
    w2 AS (
        SELECT doc_id, word,
               row_number() OVER (PARTITION BY doc_id
                                  ORDER BY pos) AS rpos
        FROM w0 WHERE word <> ''
    ),
    tri AS (
        SELECT a.doc_id,
               a.word || chr(1) || b.word || chr(1) || c.word AS t
        FROM w2 a
        JOIN w2 b ON b.doc_id = a.doc_id AND b.rpos = a.rpos + 1
        JOIN w2 c ON c.doc_id = a.doc_id AND c.rpos = a.rpos + 2
    ),
    wn AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS nw,
               CAST(count(DISTINCT word) AS BIGINT) AS ndw
        FROM w2 GROUP BY doc_id
    ),
    tn AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS nt,
               CAST(count(DISTINCT t) AS BIGINT) AS ndt
        FROM tri GROUP BY doc_id
    ),
    tw AS (
        SELECT doc_id, word, CAST(count(*) AS BIGINT) AS c,
               row_number() OVER (PARTITION BY doc_id
                                  ORDER BY count(*) DESC,
                                           word ASC) AS rn
        FROM w2 GROUP BY doc_id, word
    )
    SELECT CAST(wn.doc_id AS BIGINT) AS doc_id,
           nw AS n_words,
           ndw AS n_distinct_words,
           CAST(COALESCE(nt, 0) AS BIGINT) AS n_trigrams,
           CAST(COALESCE(ndt, 0) AS BIGINT) AS n_distinct_trigrams,
           tw.word AS top_word,
           tw.c AS top_word_cnt,
           CAST(nw - ndw AS DOUBLE) / CAST(nw AS DOUBLE)
               AS dup_word_frac,
           CASE WHEN COALESCE(nt, 0) = 0 THEN 0.0
                ELSE CAST(nt - ndt AS DOUBLE) / CAST(nt AS DOUBLE)
           END AS dup_trigram_frac
    FROM wn
    LEFT JOIN tn ON tn.doc_id = wn.doc_id
    JOIN tw ON tw.doc_id = wn.doc_id AND tw.rn = 1
    """
    return q, sql


# ---------------------------------------------------------- events_user_growth
def _user_growth_query():
    def q(sf_dir: str):
        import pandas as pd
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables
        from .queries_ext import _add_user_bucket

        def first_day_partial(t: pa.Table) -> pa.Table:
            if "user_id" not in t.column_names:
                return pa.table({
                    "user_id": pa.array([], type=pa.int64()),
                    "day": pa.array([], type=pa.int64()),
                })
            user = t.column("user_id").cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
            day = (t.column("ts").cast(pa.int64()).to_numpy(
                zero_copy_only=False) // DAY_US)
            df = pd.DataFrame({"user_id": user, "day": day})
            g = df.groupby("user_id", sort=False)["day"].min()
            return pa.table({
                "user_id": pa.array(g.index.to_numpy(np.int64)),
                "day": pa.array(g.to_numpy(np.int64)),
            })

        def per_bucket(g: pa.Table) -> pa.Table:
            a = g.group_by("user_id").aggregate([("day", "min")])
            ud, uc = np.unique(
                a.column("day_min").to_numpy(zero_copy_only=False),
                return_counts=True,
            )
            return pa.table({
                "day": pa.array(ud, type=pa.int64()),
                "new_users": pa.array(uc.astype(np.int64)),
            })

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by("day").aggregate([("new_users", "sum")])
            return pa.table({
                "day": g.column("day"),
                "new_users": g.column("new_users_sum").cast(
                    pa.int64()),
            })

        refs = list(
            read_cols(sf_dir, "events", ["user_id", "ts"])
            .map_batches(first_day_partial, batch_format="pyarrow")
            .map_batches(_add_user_bucket, batch_format="pyarrow")
            .groupby("__bucket")
            .map_groups(per_bucket, batch_format="pyarrow")
            .to_arrow_refs()
        )
        a = tree_reduce_tables(refs, merge).to_pandas()
        a = a.sort_values("day").reset_index(drop=True)
        nu = a["new_users"].to_numpy(np.int64)
        return pa.table({
            "day": pa.array(a["day"].to_numpy(np.int64)),
            "new_users": pa.array(nu),
            "cum_users": pa.array(np.cumsum(nu).astype(np.int64)),
        })

    sql = f"""
    WITH f AS (
        SELECT user_id, min(epoch_us(ts) // {DAY_US}) AS day
        FROM events GROUP BY user_id
    ),
    n AS (
        SELECT day, CAST(count(*) AS BIGINT) AS new_users
        FROM f GROUP BY day
    )
    SELECT day, new_users,
           CAST(sum(new_users) OVER (ORDER BY day
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_users
    FROM n
    """
    return q, sql


# -------------------------------------------------------------- orders_q3_topk
def _q3_query(segment: str = Q3_SEGMENT, cut: str = Q3_CUT,
              topk: int = Q3_TOPK):
    def q(sf_dir: str):
        import pandas as pd
        import ray
        import ray.data as rd

        cut_us = int(np.datetime64(cut).astype(
            "datetime64[us]").astype(np.int64))

        # small side: qualifying customers, broadcast once
        cust = (
            rd.read_parquet(
                f"{sf_dir}/customer.parquet",
                columns=["c_custkey", "c_mktsegment"],
            )
            .filter(lambda r: r["c_mktsegment"] == segment)
            .to_pandas()
        )
        ckeys = np.sort(cust["c_custkey"].to_numpy(np.int64))
        ckeys_ref = ray.put(ckeys)

        def orders_prep(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "okey": pa.array([], type=pa.int64()),
                "val": pa.array([], type=pa.int64()),
                "kind": pa.array([], type=pa.int8()),
            })
            if "o_orderkey" not in t.column_names:
                return empty
            keys = ray.get(ckeys_ref)
            okey = t.column("o_orderkey").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            ckey = t.column("o_custkey").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            odate = t.column("o_orderdate").cast(
                pa.int64()).to_numpy(zero_copy_only=False)
            keep = (odate < cut_us) & np.isin(ckey, keys)
            return pa.table({
                "okey": pa.array(okey[keep]),
                "val": pa.array(odate[keep]),
                "kind": pa.array(
                    np.zeros(int(keep.sum()), dtype=np.int8),
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
            ship = t.column("l_shipdate").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            keep = ship > cut_us
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
                "kind": pa.array(
                    np.ones(len(g), dtype=np.int8),
                    type=pa.int8()),
            })

        def add_bucket(t: pa.Table) -> pa.Table:
            k = t.column("okey").to_numpy(zero_copy_only=False)
            mix = k.astype(np.uint64) * _MIX
            b = ((mix >> np.uint64(48)).astype(np.int64)
                 % N_BUCKETS)
            return t.append_column("__bucket", pa.array(b))

        def bucket_topk(g: pa.Table) -> pa.Table:
            # per-okey revenue sums (sort+reduceat), inner join onto the
            # orders side via sorted lookup, then a (-rev, okey) lexsort
            # top-k — all-int arithmetic, exact
            kind = g.column("kind").to_numpy(zero_copy_only=False)
            li_t = g.filter(pa.array(kind == 1))
            od_t = g.filter(pa.array(kind == 0))
            lk = li_t.column("okey").to_numpy(zero_copy_only=False)
            lv = li_t.column("val").to_numpy(zero_copy_only=False)
            ok = od_t.column("okey").to_numpy(zero_copy_only=False)
            ov = od_t.column("val").to_numpy(zero_copy_only=False)
            empty = pa.table({
                "okey": pa.array([], type=pa.int64()),
                "rev_units": pa.array([], type=pa.int64()),
                "odate_us": pa.array([], type=pa.int64()),
            })
            if lk.size == 0 or ok.size == 0:
                return empty
            order = np.argsort(lk, kind="stable")
            lk_s, lv_s = lk[order], lv[order]
            starts = np.flatnonzero(
                np.r_[True, lk_s[1:] != lk_s[:-1]]
            )
            uk = lk_s[starts]
            urev = np.add.reduceat(lv_s, starts)
            idx = np.clip(np.searchsorted(uk, ok), 0, uk.size - 1)
            hit = uk[idx] == ok
            if not hit.any():
                return empty
            okey_m = ok[hit]
            rev_m = urev[idx[hit]]
            odate_m = ov[hit]
            sel = np.lexsort((okey_m, -rev_m))[:topk]
            return pa.table({
                "okey": pa.array(okey_m[sel], type=pa.int64()),
                "rev_units": pa.array(rev_m[sel], type=pa.int64()),
                "odate_us": pa.array(odate_m[sel], type=pa.int64()),
            })

        orders = (
            read_cols(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])
            .map_batches(orders_prep, batch_format="pyarrow")
        )
        line = (
            read_cols(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice",
                         "l_discount", "l_shipdate"])
            .map_batches(lineitem_partial, batch_format="pyarrow")
        )
        cand = (
            orders.union(line)
            .map_batches(add_bucket, batch_format="pyarrow")
            .groupby("__bucket")
            .map_groups(bucket_topk, batch_format="pyarrow")
            .to_pandas()
        )
        cand = cand.sort_values(
            ["rev_units", "okey"], ascending=[False, True]
        ).head(topk)
        ru = cand["rev_units"].to_numpy(np.int64)
        return pa.table({
            "o_orderkey": pa.array(cand["okey"].to_numpy(np.int64)),
            "rev_units": pa.array(ru),
            "revenue": pa.array(ru.astype(np.float64) / 1e6,
                                type=pa.float64()),
            "odate_us": pa.array(
                cand["odate_us"].to_numpy(np.int64)),
        })

    sql = f"""
    WITH l AS (
        SELECT l_orderkey AS okey,
               CAST(round_even(l_extendedprice * 100, 0) AS BIGINT)
               * (10000 - CAST(round_even(l_discount * 10000, 0)
                               AS BIGINT)) AS ru
        FROM lineitem
        WHERE l_shipdate > TIMESTAMP '{cut}'
    ),
    o AS (
        SELECT o_orderkey AS okey, epoch_us(o_orderdate) AS odate_us
        FROM orders JOIN customer ON c_custkey = o_custkey
        WHERE c_mktsegment = '{segment}'
          AND o_orderdate < TIMESTAMP '{cut}'
    ),
    r AS (
        SELECT okey, CAST(sum(ru) AS BIGINT) AS rev_units
        FROM l GROUP BY okey
    )
    SELECT o.okey AS o_orderkey,
           r.rev_units,
           CAST(r.rev_units AS DOUBLE) / 1000000.0 AS revenue,
           o.odate_us
    FROM r JOIN o ON r.okey = o.okey
    ORDER BY r.rev_units DESC, o.okey ASC
    LIMIT {topk}
    """
    return q, sql


def build_wave56_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("doc_repetition_stats",) + _repetition_query()))
    add(*(("events_user_growth",) + _user_growth_query()))
    # wave125 ships the canonical orders_q3_topk (it overwrote this
    # one under the old sequential registration); keep this variant
    # under a distinct name.
    add(*(("orders_q3_topk_v1",) + _q3_query()))
    return queries, oracles
