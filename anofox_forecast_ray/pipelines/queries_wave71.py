"""Wave-71 queries: PageRank on the event-type graph, Poisson-HMM
Viterbi decoding, and TPC-H Q7 nation-pair trade volume.

- events_pagerank_types: PageRank (d = 0.85, 64 fixed iterations)
  over the 5-node event-type transition graph — bounded transition
  counts tree-reduce, then the power iteration is a 5-slot LIST fold
  replayed in DuckDB (the wave-60 absorbing-Markov discipline; fixed
  iteration count makes the match bitwise by construction). The
  teleport term is spelled (1 - d)/n identically on both sides.
- events_viterbi_hmm: 2-state Poisson HMM Viterbi decode of the
  dense hourly count series (lambda = 10/18, p_stay = 0.95) — the
  classic regime-detection DP as a sequential [v0, v1] max-fold;
  emission x*ln(lambda) - lambda drops the state-independent
  ln(x!) term (affects the absolute score only, identically on both
  sides). Emits the final Viterbi scores and the arg-max end state.
- lineitem_q7_nation_pairs: TPC-H Q7 generalized to ALL ordered
  supplier-nation x customer-nation pairs (bounded 25x25x2 cells):
  lineitem rows carry their supplier nation via a dense broadcast
  int8 lookup; orders rows carry the customer nation; the two
  streams co-locate on a hashed orderkey bucket (the wave-57 Q5
  dense-broadcast multi-join), join inside the bucket, and the
  bounded (s_nat, c_nat, year) cells tree-reduce. Revenue in exact
  integer cents x basis points.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from .queries import _cast, _num_read_blocks
from ._scaffold import read_cols

PR_DAMP = 0.85
PR_ITERS = 64
PR_STATES = ("click", "error", "purchase", "signup", "view")
HMM_L0 = 10.0
HMM_L1 = 18.0
HMM_STAY = 0.95
Q7_LO = "1996-01-01"
Q7_HI = "1998-01-01"


# ------------------------------------------------------ events_pagerank_types
def _pagerank_query(damp: float = PR_DAMP, iters: int = PR_ITERS):
    states = PR_STATES
    ns = len(states)

    def q(sf_dir: str):
        import pandas as pd
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables
        from .queries_ext import _add_user_bucket

        def prep(t: pa.Table) -> pa.Table:
            return pa.table(
                {"user_id": t.column("user_id"),
                 "tus": t.column("ts").cast(pa.int64()),
                 "event_id": t.column("event_id").cast(pa.int64()),
                 "event_type": t.column("event_type")}
            )

        def transitions(g: pa.Table) -> pa.Table:
            g = g.sort_by([("user_id", "ascending"),
                           ("tus", "ascending"),
                           ("event_id", "ascending")])
            users = g.column("user_id").cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
            et = np.asarray(g.column("event_type").to_pylist(),
                            dtype=object)
            same = users[1:] == users[:-1]
            src = et[:-1][same]
            dst = et[1:][same]
            if src.size == 0:
                return pa.table(
                    {"f": pa.array([""], type=pa.string()),
                     "t": pa.array([""], type=pa.string()),
                     "cnt": pa.array([0], type=pa.int64())}
                )
            key = np.char.add(np.char.add(
                src.astype(str), "|"), dst.astype(str))
            uk, uc = np.unique(key, return_counts=True)
            parts = np.char.partition(uk, "|")
            return pa.table(
                {"f": pa.array(list(parts[:, 0]) + [""],
                               type=pa.string()),
                 "t": pa.array(list(parts[:, 2]) + [""],
                               type=pa.string()),
                 "cnt": pa.array(
                     np.r_[uc.astype(np.int64), 0])}
            )

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by(["f", "t"]).aggregate([("cnt", "sum")])
            return pa.table(
                {"f": g.column("f"), "t": g.column("t"),
                 "cnt": g.column("cnt_sum").cast(pa.int64())}
            )

        refs = list(
            read_cols(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])
            .map_batches(prep, batch_format="pyarrow")
            .map_batches(_add_user_bucket, batch_format="pyarrow")
            .groupby("__bucket")
            .map_groups(transitions, batch_format="pyarrow")
            .to_arrow_refs()
        )
        a = tree_reduce_tables(refs, merge).to_pandas()
        a = a[(a["f"] != "") & (a["cnt"] > 0)]
        cnt = {(r.f, r.t): int(r.cnt) for r in a.itertuples()}
        rowsum = [
            sum(cnt.get((f, t), 0) for t in states)
            for f in states
        ]
        p = [[(float(cnt.get((states[i], states[j]), 0))
               / float(rowsum[i])) if rowsum[i] > 0 else 0.0
              for j in range(ns)] for i in range(ns)]
        tele = (1.0 - damp) / float(ns)
        r = [1.0 / float(ns)] * ns
        for _ in range(iters):
            r = [
                tele + damp * (r[0] * p[0][j] + r[1] * p[1][j]
                               + r[2] * p[2][j] + r[3] * p[3][j]
                               + r[4] * p[4][j])
                for j in range(ns)
            ]
        return pa.table({
            "state": pa.array(list(states), type=pa.string()),
            "n_out": pa.array(rowsum, type=pa.int64()),
            "pagerank": pa.array(r, type=pa.float64()),
        })

    d = f"{damp}e0"
    qcols = ",\n               ".join(
        f"COALESCE(max(CASE WHEN f = '{a}' AND t = '{b}' "
        f"THEN CAST(cnt AS DOUBLE) END), 0.0e0) "
        f"/ CAST(max(CASE WHEN f = '{a}' THEN r END) AS DOUBLE) "
        f"AS q{i}{j}"
        for i, a in enumerate(states) for j, b in enumerate(states)
    )
    rcols = ",\n               ".join(
        f"CAST(max(CASE WHEN f = '{a}' THEN r END) AS BIGINT) "
        f"AS r{i}"
        for i, a in enumerate(states)
    )
    steps = ",\n                    ".join(
        f"(1.0e0 - {d}) / {float(ns)}e0 + {d} * "
        f"(acc[1] * qm.q0{j} + acc[2] * qm.q1{j} "
        f"+ acc[3] * qm.q2{j} + acc[4] * qm.q3{j} "
        f"+ acc[5] * qm.q4{j})"
        for j in range(ns)
    )
    init = ", ".join(f"1.0e0 / {float(ns)}e0" for _ in range(ns))
    rows = " UNION ALL ".join(
        f"SELECT '{a}' AS state, {i + 1} AS idx"
        for i, a in enumerate(states)
    )
    sql = f"""
    WITH e AS (
        SELECT user_id, epoch_us(ts) AS tus, event_id, event_type
        FROM events
    ),
    tr AS (
        SELECT event_type AS f,
               lead(event_type) OVER (PARTITION BY user_id
                                      ORDER BY tus, event_id) AS t
        FROM e
    ),
    c AS (
        SELECT f, t, CAST(count(*) AS BIGINT) AS cnt FROM tr
        WHERE t IS NOT NULL GROUP BY f, t
    ),
    rowm AS (
        SELECT f, CAST(sum(cnt) AS BIGINT) AS r FROM c GROUP BY f
    ),
    qm AS (
        SELECT {qcols},
               {rcols}
        FROM c JOIN rowm USING (f)
    ),
    solved AS (
        SELECT qm.*,
               list_reduce(
                   list_prepend(
                       [{init}],
                       list_transform(
                           generate_series(1, {iters}),
                           i -> [CAST(i AS DOUBLE)
                                 {", 0.0e0" * (ns - 1)}])),
                   (acc, i) -> [{steps}]) AS pr
        FROM qm
    ),
    names AS ({rows})
    SELECT names.state,
           CASE names.idx WHEN 1 THEN solved.r0
                WHEN 2 THEN solved.r1 WHEN 3 THEN solved.r2
                WHEN 4 THEN solved.r3 ELSE solved.r4 END AS n_out,
           solved.pr[names.idx] AS pagerank
    FROM names CROSS JOIN solved
    """
    return q, sql


# -------------------------------------------------------- events_viterbi_hmm
def _viterbi_query(l0: float = HMM_L0, l1: float = HMM_L1,
                   stay: float = HMM_STAY):
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            if "ts" not in t.column_names or t.num_rows == 0:
                return pa.table({
                    "hour": pa.array([], type=pa.int64()),
                    "cnt": pa.array([], type=pa.int64()),
                })
            tus = t.column("ts").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            hour = tus // 3_600_000_000
            uk, cnt = np.unique(hour, return_counts=True)
            return pa.table({
                "hour": pa.array(uk, type=pa.int64()),
                "cnt": pa.array(cnt.astype(np.int64)),
            })

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by("hour").aggregate([("cnt", "sum")])
            return pa.table({
                "hour": g.column("hour").cast(pa.int64()),
                "cnt": g.column("cnt_sum").cast(pa.int64()),
            })

        refs = list(
            read_cols(sf_dir, "events", ["ts"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        a = tree_reduce_tables(refs, merge).to_pandas()
        h0 = int(a["hour"].min())
        span = int(a["hour"].max()) - h0 + 1
        x = np.zeros(span, dtype=np.int64)
        x[a["hour"].to_numpy(np.int64) - h0] = (
            a["cnt"].to_numpy(np.int64))
        ls = math.log(stay)
        lw = math.log(1.0 - stay)
        ll0 = math.log(l0)
        ll1 = math.log(l1)
        li = math.log(0.5)
        xf = float(int(x[0]))
        v0 = li + (xf * ll0 - l0)
        v1 = li + (xf * ll1 - l1)
        for xi in x[1:]:
            xf = float(int(xi))
            n0 = max(v0 + ls, v1 + lw) + (xf * ll0 - l0)
            n1 = max(v0 + lw, v1 + ls) + (xf * ll1 - l1)
            v0, v1 = n0, n1
        return pa.table({
            "n_hours": pa.array([span], type=pa.int64()),
            "v_low": pa.array([v0], type=pa.float64()),
            "v_high": pa.array([v1], type=pa.float64()),
            "end_state": pa.array(
                [0 if v0 >= v1 else 1], type=pa.int64()),
        })

    ls = f"ln({stay}e0)"
    lw = f"ln(1.0e0 - {stay}e0)"
    ll0 = f"ln({l0}e0)"
    ll1 = f"ln({l1}e0)"
    sql = f"""
    WITH e AS (
        SELECT epoch_us(ts) // 3600000000 AS hour FROM events
    ),
    bounds AS (SELECT min(hour) AS h0, max(hour) AS h1 FROM e),
    cnts AS (
        SELECT hour, CAST(count(*) AS BIGINT) AS c
        FROM e GROUP BY hour
    ),
    dense AS (
        SELECT gs.hour, CAST(COALESCE(c.c, 0) AS DOUBLE) AS x
        FROM (SELECT unnest(generate_series(
                  (SELECT h0 FROM bounds),
                  (SELECT h1 FROM bounds))) AS hour) gs
        LEFT JOIN cnts c ON c.hour = gs.hour
    ),
    l AS (
        SELECT list(x ORDER BY hour) AS ms,
               CAST(count(*) AS BIGINT) AS n
        FROM dense
    ),
    st AS (
        SELECT n,
               list_reduce(
                   list_prepend(
                       [ln(0.5e0) + (ms[1] * {ll0} - {l0}e0),
                        ln(0.5e0) + (ms[1] * {ll1} - {l1}e0)],
                       list_transform(
                           ms[2:CAST(n AS INTEGER)],
                           v -> [v, 0.0e0])),
                   (acc, e) -> [
                       GREATEST(acc[1] + {ls}, acc[2] + {lw})
                           + (e[1] * {ll0} - {l0}e0),
                       GREATEST(acc[1] + {lw}, acc[2] + {ls})
                           + (e[1] * {ll1} - {l1}e0)]) AS fin
        FROM l
    )
    SELECT n AS n_hours,
           fin[1] AS v_low,
           fin[2] AS v_high,
           CAST(CASE WHEN fin[1] >= fin[2] THEN 0 ELSE 1 END
                AS BIGINT) AS end_state
    FROM st
    """
    return q, sql


# ------------------------------------------------- lineitem_q7_nation_pairs
def _q7_query(lo: str = Q7_LO, hi: str = Q7_HI):
    def q(sf_dir: str):
        import pandas as pd
        import ray
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables
        from .queries_wave58 import _hash_bucket

        lo_us = int(np.datetime64(lo).astype("datetime64[us]")
                    .astype(np.int64))
        hi_us = int(np.datetime64(hi).astype("datetime64[us]")
                    .astype(np.int64))

        nat = rd.read_parquet(
            f"{sf_dir}/nation.parquet").to_pandas()
        nat_names = dict(zip(nat["n_nationkey"].astype(int),
                             nat["n_name"]))
        cust = rd.read_parquet(
            f"{sf_dir}/customer.parquet",
            columns=["c_custkey", "c_nationkey"]).to_pandas()
        c_nat = np.full(int(cust["c_custkey"].max()) + 1, -1,
                        dtype=np.int8)
        c_nat[cust["c_custkey"].to_numpy(np.int64)] = (
            cust["c_nationkey"].to_numpy(np.int8))
        supp = rd.read_parquet(
            f"{sf_dir}/supplier.parquet",
            columns=["s_suppkey", "s_nationkey"]).to_pandas()
        s_nat = np.full(int(supp["s_suppkey"].max()) + 1, -1,
                        dtype=np.int8)
        s_nat[supp["s_suppkey"].to_numpy(np.int64)] = (
            supp["s_nationkey"].to_numpy(np.int8))
        c_ref = ray.put(c_nat)
        s_ref = ray.put(s_nat)

        def orders_prep(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "okey": pa.array([], type=pa.int64()),
                "nat": pa.array([], type=pa.int8()),
                "year": pa.array([], type=pa.int16()),
                "val": pa.array([], type=pa.int64()),
                "kind": pa.array([], type=pa.int8()),
            })
            if "o_orderkey" not in t.column_names:
                return empty
            lut = ray.get(c_ref)
            okey = t.column("o_orderkey").cast(
                pa.int64()).to_numpy(zero_copy_only=False)
            ckey = t.column("o_custkey").cast(
                pa.int64()).to_numpy(zero_copy_only=False)
            nt = lut[ckey]
            keep = nt >= 0
            n = int(keep.sum())
            return pa.table({
                "okey": pa.array(okey[keep]),
                "nat": pa.array(nt[keep], type=pa.int8()),
                "year": pa.array(
                    np.zeros(n, dtype=np.int16), type=pa.int16()),
                "val": pa.array(np.zeros(n, dtype=np.int64)),
                "kind": pa.array(np.zeros(n, dtype=np.int8),
                                 type=pa.int8()),
            })

        def line_prep(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "okey": pa.array([], type=pa.int64()),
                "nat": pa.array([], type=pa.int8()),
                "year": pa.array([], type=pa.int16()),
                "val": pa.array([], type=pa.int64()),
                "kind": pa.array([], type=pa.int8()),
            })
            if "l_orderkey" not in t.column_names:
                return empty
            lut = ray.get(s_ref)
            okey = t.column("l_orderkey").cast(
                pa.int64()).to_numpy(zero_copy_only=False)
            skey = t.column("l_suppkey").cast(
                pa.int64()).to_numpy(zero_copy_only=False)
            ship = t.column("l_shipdate").cast(
                pa.int64()).to_numpy(zero_copy_only=False)
            nt = lut[skey]
            keep = (nt >= 0) & (ship >= lo_us) & (ship < hi_us)
            okey, nt, ship = okey[keep], nt[keep], ship[keep]
            year = (ship.astype("datetime64[us]")
                    .astype("datetime64[Y]").astype(np.int64)
                    + 1970).astype(np.int16)
            cents = np.round(
                t.column("l_extendedprice").to_numpy(
                    zero_copy_only=False)[keep] * 100.0
            ).astype(np.int64)
            bp = np.round(
                t.column("l_discount").to_numpy(
                    zero_copy_only=False)[keep] * 10000.0
            ).astype(np.int64)
            return pa.table({
                "okey": pa.array(okey),
                "nat": pa.array(nt, type=pa.int8()),
                "year": pa.array(year, type=pa.int16()),
                "val": pa.array(cents * (10000 - bp)),
                "kind": pa.array(
                    np.ones(len(okey), dtype=np.int8),
                    type=pa.int8()),
            })

        def add_bucket(t: pa.Table) -> pa.Table:
            k = t.column("okey").to_numpy(zero_copy_only=False)
            return t.append_column(
                "__bucket", pa.array(_hash_bucket(k)))

        def bucket_join(g: pa.Table) -> pa.Table:
            # vectorized inner join on okey (sort + searchsorted — the
            # join_bucket_tables shape) then an Arrow hash aggregate;
            # all-int arithmetic so the pandas merge/groupby replacement
            # is exact
            kind = g.column("kind").to_numpy(zero_copy_only=False)
            od = g.filter(pa.array(kind == 0))
            li = g.filter(pa.array(kind == 1))
            ok = od.column("okey").to_numpy(zero_copy_only=False)
            onat = od.column("nat").to_numpy(zero_copy_only=False)
            lk = li.column("okey").to_numpy(zero_copy_only=False)
            if ok.size == 0 or lk.size == 0:
                return pa.table({
                    "snat": pa.array([], type=pa.int8()),
                    "cnat": pa.array([], type=pa.int8()),
                    "year": pa.array([], type=pa.int16()),
                    "rev": pa.array([], type=pa.int64()),
                })
            order = np.argsort(ok, kind="stable")
            ok_s, onat_s = ok[order], onat[order]
            idx = np.clip(np.searchsorted(ok_s, lk), 0, ok_s.size - 1)
            hit = ok_s[idx] == lk
            cnat = onat_s[idx[hit]]
            li_h = li.filter(pa.array(hit))
            snat = li_h.column("nat").to_numpy(zero_copy_only=False)
            keep = snat != cnat
            tab = pa.table({
                "snat": pa.array(snat[keep].astype(np.int8),
                                 type=pa.int8()),
                "cnat": pa.array(cnat[keep].astype(np.int8),
                                 type=pa.int8()),
                "year": li_h.filter(pa.array(keep)).column("year"),
                "val": li_h.filter(pa.array(keep)).column("val"),
            })
            a = tab.group_by(["snat", "cnat", "year"]).aggregate(
                [("val", "sum")]
            )
            return pa.table({
                "snat": a.column("snat"),
                "cnat": a.column("cnat"),
                "year": a.column("year"),
                "rev": a.column("val_sum").cast(pa.int64()),
            })

        orders = read_cols(sf_dir, "orders", ["o_orderkey", "o_custkey"]).map_batches(orders_prep, batch_format="pyarrow")
        line = read_cols(sf_dir, "lineitem", ["l_orderkey", "l_suppkey", "l_shipdate",
                     "l_extendedprice", "l_discount"]).map_batches(line_prep, batch_format="pyarrow")
        refs = list(
            orders.union(line)
            .map_batches(add_bucket, batch_format="pyarrow")
            .groupby("__bucket")
            .map_groups(bucket_join, batch_format="pyarrow")
            .to_arrow_refs()
        )

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by(["snat", "cnat", "year"]).aggregate(
                [("rev", "sum")])
            return pa.table({
                "snat": g.column("snat").cast(pa.int8()),
                "cnat": g.column("cnat").cast(pa.int8()),
                "year": g.column("year").cast(pa.int16()),
                "rev": g.column("rev_sum").cast(pa.int64()),
            })

        cells = tree_reduce_tables(refs, merge).to_pandas()
        cells["supp_nation"] = [
            nat_names[int(i)] for i in cells["snat"]]
        cells["cust_nation"] = [
            nat_names[int(i)] for i in cells["cnat"]]
        cells = cells.sort_values(
            ["supp_nation", "cust_nation", "year"]).reset_index(
            drop=True)
        return pa.table({
            "supp_nation": pa.array(cells["supp_nation"],
                                    type=pa.string()),
            "cust_nation": pa.array(cells["cust_nation"],
                                    type=pa.string()),
            "l_year": pa.array(
                cells["year"].to_numpy(np.int16).astype(np.int32),
                type=pa.int32()),
            "rev_units": pa.array(
                cells["rev"].to_numpy(np.int64)),
        })

    sql = f"""
    SELECT n1.n_name AS supp_nation,
           n2.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS INTEGER) AS l_year,
           CAST(sum(CAST(round_even(l.l_extendedprice * 100, 0)
                         AS BIGINT)
                    * (10000 - CAST(round_even(l.l_discount
                                               * 10000, 0)
                               AS BIGINT))) AS BIGINT) AS rev_units
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
    JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
    WHERE n1.n_nationkey <> n2.n_nationkey
      AND l.l_shipdate >= TIMESTAMP '{lo}'
      AND l.l_shipdate < TIMESTAMP '{hi}'
    GROUP BY supp_nation, cust_nation, l_year
    """
    return q, sql


def build_wave71_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("events_pagerank_types",) + _pagerank_query()))
    add(*(("events_viterbi_hmm",) + _viterbi_query()))
    add(*(("lineitem_q7_nation_pairs",) + _q7_query()))
    return queries, oracles
