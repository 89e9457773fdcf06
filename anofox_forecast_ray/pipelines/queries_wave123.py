"""Wave-123 queries: TPC-H Q17 small-quantity revenue, Kruskal-Wallis.

- lineitem_q17_small_qty: the Q17 shape on the available columns —
  revenue locked up in below-20%-of-part-average order lines. The
  per-part (count, sum_qty) profile is a BOUNDED aggregate built from
  per-block partials (no row shuffle), broadcast once via ray.put;
  the qualifying test is the exact integer cross-multiplication
  5 * qty * cnt_p < sum_qty_p (no float avg), and revenue is summed
  in integer cents so the partials are order-free. One float
  division (/ 700) at the end.
- source_kruskal_wallis: rank ANOVA over per-source document lengths.
  Global ranks come from the bounded length histogram (never a sort):
  doubled midranks 2*cum + c + 1 keep every tie exact in integers;
  per-source doubled-rank sums S2_g are int64-safe, the H statistic
  folds the per-source terms t*t/(4*n_g) in source order (the
  CAST-to-double of S2_g is exact below 2^53), and the tie
  correction 1 - sum(c^3-c)/(N^3-N) is a single float division.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .queries import _num_read_blocks
from ._scaffold import read_cols


# -------------------------------------------------- lineitem_q17_small_qty
def _q17_query():
    def q(sf_dir: str):
        import ray
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def part_partial(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "p": pa.array([], type=pa.int64()),
                "c": pa.array([], type=pa.int64()),
                "sq": pa.array([], type=pa.int64()),
            })
            if "l_partkey" not in t.column_names or t.num_rows == 0:
                return empty
            p = t.column("l_partkey").to_numpy(
                zero_copy_only=False).astype(np.int64)
            qty = np.round(t.column("l_quantity").to_numpy(
                zero_copy_only=False)).astype(np.int64)
            uk, inv = np.unique(p, return_inverse=True)
            c = np.bincount(inv).astype(np.int64)
            sq = np.bincount(inv, weights=qty.astype(
                np.float64)).astype(np.int64)
            return pa.table({
                "p": pa.array(uk, type=pa.int64()),
                "c": pa.array(c),
                "sq": pa.array(sq),
            })

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by("p").aggregate([("c", "sum"),
                                           ("sq", "sum")])
            return pa.table({
                "p": g.column("p").cast(pa.int64()),
                "c": g.column("c_sum").cast(pa.int64()),
                "sq": g.column("sq_sum").cast(pa.int64()),
            })

        refs = list(
            read_cols(sf_dir, "lineitem", ["l_partkey", "l_quantity"])
            .map_batches(part_partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        prof = tree_reduce_tables(refs, merge)
        pk = prof.column("p").to_numpy(zero_copy_only=False)
        order = np.argsort(pk)
        pk = pk[order]
        pc = prof.column("c").to_numpy(zero_copy_only=False)[order]
        psq = prof.column("sq").to_numpy(zero_copy_only=False)[order]
        prof_ref = ray.put((pk, pc, psq))

        def qualify(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "n": pa.array([0], type=pa.int64()),
                "rev": pa.array([0], type=pa.int64()),
            })
            if "l_partkey" not in t.column_names or t.num_rows == 0:
                return empty
            kk, cc, ss = ray.get(prof_ref)
            p = t.column("l_partkey").to_numpy(
                zero_copy_only=False).astype(np.int64)
            qty = np.round(t.column("l_quantity").to_numpy(
                zero_copy_only=False)).astype(np.int64)
            cents = np.round(t.column("l_extendedprice").to_numpy(
                zero_copy_only=False) * 100.0).astype(np.int64)
            idx = np.searchsorted(kk, p)
            keep = 5 * qty * cc[idx] < ss[idx]
            return pa.table({
                "n": pa.array([int(keep.sum())], type=pa.int64()),
                "rev": pa.array([int(cents[keep].sum())],
                                type=pa.int64()),
            })

        qrefs = list(
            read_cols(sf_dir, "lineitem", ["l_partkey", "l_quantity",
                         "l_extendedprice"])
            .map_batches(qualify, batch_format="pyarrow")
            .to_arrow_refs()
        )
        acc = pa.concat_tables(ray.get(qrefs)).to_pandas()
        n = int(acc["n"].sum())
        rev = int(acc["rev"].sum())
        return pa.table({
            "n_items": pa.array([n], type=pa.int64()),
            "rev_cents": pa.array([rev], type=pa.int64()),
            "avg_yearly": pa.array(
                [float(np.float64(rev) / 700.0)],
                type=pa.float64()),
        })

    sql = """
    WITH prof AS (
        SELECT l_partkey AS p,
               CAST(count(*) AS BIGINT) AS c,
               CAST(sum(CAST(round(l_quantity) AS BIGINT))
                    AS BIGINT) AS sq
        FROM lineitem GROUP BY 1
    ),
    hit AS (
        SELECT CAST(round_even(l.l_extendedprice * 100, 0)
                    AS BIGINT) AS cents
        FROM lineitem l JOIN prof ON prof.p = l.l_partkey
        WHERE 5 * CAST(round(l.l_quantity) AS BIGINT) * prof.c
              < prof.sq
    )
    SELECT CAST(count(*) AS BIGINT) AS n_items,
           CAST(COALESCE(sum(cents), 0) AS BIGINT) AS rev_cents,
           CAST(COALESCE(sum(cents), 0) AS DOUBLE) / 700.0
               AS avg_yearly
    FROM hit
    """
    return q, sql


# -------------------------------------------------- source_kruskal_wallis
def _kruskal_query():
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "src": pa.array([], type=pa.string()),
                "v": pa.array([], type=pa.int64()),
                "c": pa.array([], type=pa.int64()),
            })
            if "source" not in t.column_names or t.num_rows == 0:
                return empty
            src = t.column("source").to_pylist()
            v = t.column("n_chars").to_numpy(
                zero_copy_only=False).astype(np.int64)
            import collections
            cnt = collections.Counter(zip(src, v.tolist()))
            keys = sorted(cnt)
            return pa.table({
                "src": pa.array([k[0] for k in keys],
                                type=pa.string()),
                "v": pa.array([k[1] for k in keys],
                              type=pa.int64()),
                "c": pa.array([cnt[k] for k in keys],
                              type=pa.int64()),
            })

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by(["src", "v"]).aggregate([("c", "sum")])
            return pa.table({
                "src": g.column("src").cast(pa.string()),
                "v": g.column("v").cast(pa.int64()),
                "c": g.column("c_sum").cast(pa.int64()),
            })

        refs = list(
            read_cols(sf_dir, "documents", ["source", "n_chars"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        import ray

        hist = tree_reduce_tables(refs, merge).to_pandas()

        hv: dict[int, int] = {}
        for _, r in hist.iterrows():
            hv[int(r["v"])] = hv.get(int(r["v"]), 0) + int(r["c"])
        mr: dict[int, int] = {}
        cum = 0
        for val in sorted(hv):
            c = hv[val]
            mr[val] = 2 * cum + c + 1
            cum += c
        n = cum
        groups: dict[str, tuple[int, int]] = {}
        for _, r in hist.iterrows():
            s = str(r["src"])
            ng, s2 = groups.get(s, (0, 0))
            groups[s] = (ng + int(r["c"]),
                         s2 + int(r["c"]) * mr[int(r["v"])])
        s_terms = 0.0
        for s in sorted(groups):
            ng, s2 = groups[s]
            t_ = float(s2)
            s_terms = s_terms + t_ * t_ / (4.0 * float(ng))
        h = (12.0 / (float(n) * float(n + 1)) * s_terms
             - 3.0 * float(n + 1))
        tsum = sum(c * c * c - c for c in hv.values())
        tie_c = 1.0 - float(tsum) / float(n * n * n - n)
        h_adj = h / tie_c
        return pa.table({
            "n_total": pa.array([n], type=pa.int64()),
            "k_groups": pa.array([len(groups)], type=pa.int64()),
            "h": pa.array([h], type=pa.float64()),
            "tie_c": pa.array([tie_c], type=pa.float64()),
            "h_adj": pa.array([h_adj], type=pa.float64()),
        })

    sql = """
    WITH base AS (
        SELECT source AS src, CAST(n_chars AS BIGINT) AS v
        FROM documents
    ),
    hv AS (
        SELECT v, CAST(count(*) AS BIGINT) AS c
        FROM base GROUP BY v
    ),
    mr AS (
        SELECT v, c,
               CAST(2 * (sum(c) OVER (ORDER BY v) - c) + c + 1
                    AS BIGINT) AS mr
        FROM hv
    ),
    sv AS (
        SELECT src, v, CAST(count(*) AS BIGINT) AS c
        FROM base GROUP BY src, v
    ),
    grp AS (
        SELECT sv.src,
               CAST(sum(sv.c) AS BIGINT) AS ng,
               CAST(sum(sv.c * mr.mr) AS BIGINT) AS s2
        FROM sv JOIN mr ON mr.v = sv.v
        GROUP BY sv.src
    ),
    tot AS (
        SELECT CAST(sum(c) AS BIGINT) AS n,
               CAST(sum(c * c * c - c) AS BIGINT) AS tsum
        FROM hv
    ),
    folded AS (
        SELECT list_reduce(list_prepend(0.0e0,
                   list(CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE)
                        / (4.0e0 * CAST(ng AS DOUBLE))
                        ORDER BY src)),
                   (a, b) -> a + b) AS s_terms,
               CAST(count(*) AS BIGINT) AS k
        FROM grp
    )
    SELECT tot.n AS n_total,
           folded.k AS k_groups,
           12.0e0 / (CAST(tot.n AS DOUBLE)
                     * CAST(tot.n + 1 AS DOUBLE)) * folded.s_terms
               - 3.0e0 * CAST(tot.n + 1 AS DOUBLE) AS h,
           1.0e0 - CAST(tot.tsum AS DOUBLE)
               / CAST(tot.n * tot.n * tot.n - tot.n AS DOUBLE)
               AS tie_c,
           (12.0e0 / (CAST(tot.n AS DOUBLE)
                      * CAST(tot.n + 1 AS DOUBLE)) * folded.s_terms
                - 3.0e0 * CAST(tot.n + 1 AS DOUBLE))
               / (1.0e0 - CAST(tot.tsum AS DOUBLE)
                  / CAST(tot.n * tot.n * tot.n - tot.n AS DOUBLE))
               AS h_adj
    FROM tot, folded
    """
    return q, sql


def build_wave123_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("lineitem_q17_small_qty",) + _q17_query()))
    add(*(("source_kruskal_wallis",) + _kruskal_query()))
    return queries, oracles
