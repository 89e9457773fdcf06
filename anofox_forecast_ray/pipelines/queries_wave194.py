"""Wave-194 queries: link prediction scores, k x k contingency chi2.

- events_link_prediction: Adamic-Adar and resource-allocation link
  prediction scores for every event-type pair on the bipartite
  user-type graph: AA(a,b) = sum over users doing both of
  1/ln(deg u), RA = sum 1/deg u. Per-user type sets collapse to the
  bounded 32-cell BITMASK histogram (types are bits in lexical
  order), so each pair score is a fold over masks containing both
  bits — cnt/ln(popcount) with one scalar ln per mask (deg >= 2 so
  ln > 0). Emits all 10 pairs with exact common-neighbor counts.
- customer_seg_nation_chi2: the k x k chi-square test of
  independence between c_mktsegment and c_nationkey from the
  bounded integer contingency table, INCLUDING zero-observed cells
  (margins cross join): term (o - e)^2/e with e = row*col/N, folded
  in (nation, segment) order.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from .queries import _num_read_blocks
from ._scaffold import read_cols
from .queries_ext import _add_user_bucket

TYPE_BITS = {"click": 1, "error": 2, "purchase": 4,
             "signup": 8, "view": 16}


def link_scores(mask_counts: dict):
    """{mask: n_users} -> rows of (a, b, common, aa, ra) for every
    type pair a<b; folds over ascending masks."""
    types = sorted(TYPE_BITS)
    rows = []
    for i in range(len(types)):
        for j in range(i + 1, len(types)):
            ba = TYPE_BITS[types[i]]
            bb = TYPE_BITS[types[j]]
            common = 0
            aa = 0.0
            ra = 0.0
            for m in sorted(mask_counts):
                if (m & ba) > 0 and (m & bb) > 0:
                    c = mask_counts[m]
                    deg = bin(m).count("1")
                    common += c
                    aa = aa + c / math.log(float(deg))
                    ra = ra + c / float(deg)
            rows.append((types[i], types[j], common, aa, ra))
    return rows


# ---------------------------------------------- events_link_prediction
def _link_query():
    def q(sf_dir: str):
        import pandas as pd
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            u = t.column("user_id").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            et = np.asarray(t.column("event_type").to_pylist())
            bits = np.array([TYPE_BITS[x] for x in et],
                            dtype=np.int64)
            df = pd.DataFrame({"user_id": u, "b": bits})
            a = (df.groupby("user_id")["b"]
                 .agg(lambda s: int(np.bitwise_or.reduce(
                     s.to_numpy(np.int64))))
                 .reset_index().rename(columns={"b": "mask"}))
            a["mask"] = a["mask"].astype("int64")
            return pa.Table.from_pandas(a, preserve_index=False)

        def merge_bucket(g: pa.Table) -> pa.Table:
            u = g.column("user_id").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            m = g.column("mask").to_numpy(zero_copy_only=False)
            order = np.argsort(u, kind="stable")
            u_s, m_s = u[order], m[order]
            starts = np.flatnonzero(
                np.r_[True, u_s[1:] != u_s[:-1]]
            )
            per_user = np.bitwise_or.reduceat(m_s, starts)
            um, uc = np.unique(per_user, return_counts=True)
            return pa.table({
                "mask": pa.array(um, type=pa.int64()),
                "cnt": pa.array(uc.astype(np.int64)),
            })

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by("mask").aggregate([("cnt", "sum")])
            return pa.table({
                "mask": g.column("mask").cast(pa.int64()),
                "cnt": g.column("cnt_sum").cast(pa.int64()),
            })

        refs = list(
            read_cols(sf_dir, "events", ["user_id", "event_type"])
            .map_batches(partial, batch_format="pyarrow")
            .map_batches(_add_user_bucket, batch_format="pyarrow")
            .groupby("__bucket")
            .map_groups(merge_bucket, batch_format="pyarrow")
            .to_arrow_refs()
        )
        h = tree_reduce_tables(refs, merge).to_pandas()
        mask_counts = {int(r["mask"]): int(r["cnt"])
                       for _, r in h.iterrows()}
        rows = link_scores(mask_counts)
        return pa.table({
            "type_a": pa.array([r[0] for r in rows],
                               type=pa.string()),
            "type_b": pa.array([r[1] for r in rows],
                               type=pa.string()),
            "n_common": pa.array([r[2] for r in rows],
                                 type=pa.int64()),
            "adamic_adar": pa.array([r[3] for r in rows],
                                    type=pa.float64()),
            "resource_alloc": pa.array([r[4] for r in rows],
                                       type=pa.float64()),
        })

    bit_case = ("CASE event_type WHEN 'click' THEN 1 "
                "WHEN 'error' THEN 2 WHEN 'purchase' THEN 4 "
                "WHEN 'signup' THEN 8 WHEN 'view' THEN 16 END")
    sql = f"""
    WITH um AS (
        SELECT user_id,
               CAST(sum(DISTINCT {bit_case}) AS BIGINT) AS mask
        FROM events GROUP BY user_id
    ),
    h AS (
        SELECT mask, CAST(count(*) AS BIGINT) AS cnt
        FROM um GROUP BY mask
    ),
    ty AS (
        SELECT * FROM (VALUES
            ('click', CAST(1 AS BIGINT)),
            ('error', CAST(2 AS BIGINT)),
            ('purchase', CAST(4 AS BIGINT)),
            ('signup', CAST(8 AS BIGINT)),
            ('view', CAST(16 AS BIGINT))) t(name, bit)
    ),
    pairs AS (
        SELECT a.name AS ta, a.bit AS ba, b.name AS tb,
               b.bit AS bb
        FROM ty a JOIN ty b ON a.name < b.name
    )
    SELECT pairs.ta AS type_a, pairs.tb AS type_b,
           CAST(coalesce((SELECT sum(h.cnt) FROM h
                 WHERE (h.mask & pairs.ba) > 0
                   AND (h.mask & pairs.bb) > 0), 0) AS BIGINT)
               AS n_common,
           coalesce((SELECT list_reduce(list_prepend(0.0e0,
                 list(CAST(h.cnt AS DOUBLE)
                      / ln(CAST(bit_count(h.mask) AS DOUBLE))
                      ORDER BY h.mask)), (p, x) -> p + x)
                 FROM h
                 WHERE (h.mask & pairs.ba) > 0
                   AND (h.mask & pairs.bb) > 0), 0.0e0)
               AS adamic_adar,
           coalesce((SELECT list_reduce(list_prepend(0.0e0,
                 list(CAST(h.cnt AS DOUBLE)
                      / CAST(bit_count(h.mask) AS DOUBLE)
                      ORDER BY h.mask)), (p, x) -> p + x)
                 FROM h
                 WHERE (h.mask & pairs.ba) > 0
                   AND (h.mask & pairs.bb) > 0), 0.0e0)
               AS resource_alloc
    FROM pairs
    """
    return q, sql


# ------------------------------------------ customer_seg_nation_chi2
def _contingency_query():
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            nk = t.column("c_nationkey").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            seg = np.asarray(t.column("c_mktsegment").to_pylist(),
                             dtype=object)
            import pandas as pd

            df = pd.DataFrame({"n": nk, "s": seg})
            g = (df.groupby(["n", "s"]).size()
                 .reset_index(name="c"))
            return pa.table({
                "n": pa.array(g["n"].astype("int64")),
                "s": pa.array(g["s"], type=pa.string()),
                "c": pa.array(g["c"].astype("int64")),
            })

        def merge(t: pa.Table) -> pa.Table:
            import pandas as pd

            df = t.to_pandas()
            g = (df.groupby(["n", "s"])["c"].sum().reset_index())
            return pa.table({
                "n": pa.array(g["n"].astype("int64")),
                "s": pa.array(g["s"], type=pa.string()),
                "c": pa.array(g["c"].astype("int64")),
            })

        refs = list(
            read_cols(sf_dir, "customer", ["c_nationkey", "c_mktsegment"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        h = tree_reduce_tables(refs, merge).to_pandas()
        obs = {(int(r["n"]), r["s"]): int(r["c"])
               for _, r in h.iterrows()}
        rows = sorted({k[0] for k in obs})
        cols = sorted({k[1] for k in obs})
        rt = {r: sum(obs.get((r, c), 0) for c in cols)
              for r in rows}
        ct = {c: sum(obs.get((r, c), 0) for r in rows)
              for c in cols}
        N = sum(rt.values())
        chi2 = 0.0
        for r in rows:
            for c in cols:
                e = (rt[r] * ct[c]) / N
                o = float(obs.get((r, c), 0))
                chi2 = chi2 + (o - e) * (o - e) / e
        df_ = (len(rows) - 1) * (len(cols) - 1)
        return pa.table({
            "n_customers": pa.array([N], type=pa.int64()),
            "chi2_indep": pa.array([chi2], type=pa.float64()),
            "df": pa.array([df_], type=pa.int64()),
        })

    sql = """
    WITH o AS (
        SELECT CAST(c_nationkey AS BIGINT) AS n,
               c_mktsegment AS s,
               CAST(count(*) AS BIGINT) AS c
        FROM customer GROUP BY 1, 2
    ),
    rt AS (SELECT n, CAST(sum(c) AS BIGINT) AS t FROM o
           GROUP BY n),
    ct AS (SELECT s, CAST(sum(c) AS BIGINT) AS t FROM o
           GROUP BY s),
    nn AS (SELECT CAST(sum(c) AS BIGINT) AS total FROM o),
    cells AS (
        SELECT rt.n, ct.s, rt.t AS r_tot, ct.t AS c_tot,
               CAST(coalesce(o.c, 0) AS BIGINT) AS obs
        FROM rt CROSS JOIN ct
        LEFT JOIN o ON o.n = rt.n AND o.s = ct.s
    ),
    fold AS (
        SELECT list_reduce(list_prepend(0.0e0,
               list((CAST(obs AS DOUBLE)
                     - CAST(r_tot * c_tot AS DOUBLE)
                       / CAST((SELECT total FROM nn) AS DOUBLE))
                    * (CAST(obs AS DOUBLE)
                       - CAST(r_tot * c_tot AS DOUBLE)
                         / CAST((SELECT total FROM nn)
                                AS DOUBLE))
                    / (CAST(r_tot * c_tot AS DOUBLE)
                       / CAST((SELECT total FROM nn) AS DOUBLE))
                    ORDER BY n, s)), (p, x) -> p + x) AS chi2
        FROM cells
    )
    SELECT (SELECT total FROM nn) AS n_customers,
           fold.chi2 AS chi2_indep,
           CAST(((SELECT count(*) FROM rt) - 1)
                * ((SELECT count(*) FROM ct) - 1) AS BIGINT)
               AS df
    FROM fold
    """
    return q, sql


def build_wave194_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("events_link_prediction",) + _link_query()))
    add(*(("customer_seg_nation_chi2",) + _contingency_query()))
    return queries, oracles
