"""Wave-39 queries: pivot reshape, session path mining, and Haar
wavelet energy.

- events_user_type_pivot: long -> wide reshape — one row per user with
  a count column per event type (the bounded type vocabulary IS the
  schema). Bounded (user, type) partials collapse per block; the
  bucket kernel pivots vectorized.
- events_top_journeys: top-10 3-step type paths within 30-min sessions
  — path mining over the session machinery. Ordered type trigrams are
  bounded (5^3), so partials are tiny; ordering is (ts, event_id)
  exact.
- doc_haar_energy: Haar wavelet detail energy at 3 levels per doc
  (series truncated to a multiple of 8 so every level is exact).
  Detail coefficients and their squared sums stay int64 end to end —
  the multi-resolution feature a signal-compression pipeline extracts.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .queries import SQL_TOK, _cast, _num_read_blocks, corpus_ds
from ._scaffold import read_cols
from .queries_ext import _add_user_bucket

EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]
GAP_US = 1_800_000_000


# ------------------------------------------------ events_user_type_pivot
def _pivot_query():
    def q(sf_dir: str):
        import pandas as pd
        import ray.data as rd

        def partial(t: pa.Table) -> pa.Table:
            if "user_id" not in t.column_names:
                return pa.table(
                    {"user_id": pa.array([], type=pa.int64()),
                     "event_type": pa.array([], type=pa.string()),
                     "cnt": pa.array([], type=pa.int64())}
                )
            g = pa.table(
                {"user_id": t.column("user_id").cast(pa.int64()),
                 "event_type": t.column("event_type")}
            ).group_by(["user_id", "event_type"]).aggregate(
                [("user_id", "count")]
            )
            return pa.table(
                {"user_id": g.column("user_id"),
                 "event_type": g.column("event_type"),
                 "cnt": g.column("user_id_count").cast(pa.int64())}
            )

        def pivot(g: pa.Table) -> pa.Table:
            # manual pivot: per-(user, type-code) sums via sort +
            # reduceat scattered into a dense (n_users x n_types) int64
            # matrix — exact, replaces the pandas unstack
            u = g.column("user_id").cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
            et = np.asarray(g.column("event_type").to_pylist(),
                            dtype=object)
            cnt = g.column("cnt").to_numpy(zero_copy_only=False)
            uu = np.unique(u)
            urow = np.searchsorted(uu, u)
            type_idx = {e: i for i, e in enumerate(EVENT_TYPES)}
            col = np.asarray([type_idx[e] for e in et],
                             dtype=np.int64)
            mat = np.zeros((uu.size, len(EVENT_TYPES)),
                           dtype=np.int64)
            np.add.at(mat, (urow, col), cnt)
            cols = {"user_id": pa.array(uu, type=pa.int64())}
            for i, e in enumerate(EVENT_TYPES):
                cols[f"n_{e}"] = pa.array(mat[:, i], type=pa.int64())
            return pa.table(cols)

        ds = (
            read_cols(sf_dir, "events", ["user_id", "event_type"])
            .map_batches(partial, batch_format="pyarrow")
            .map_batches(_add_user_bucket, batch_format="pyarrow")
            .groupby("__bucket")
            .map_groups(pivot, batch_format="pyarrow")
        )
        schema = {"user_id": pa.int64()}
        schema.update({f"n_{e}": pa.int64() for e in EVENT_TYPES})
        return _cast(ds, schema)

    cols = ",\n           ".join(
        f"CAST(sum(CASE WHEN event_type = '{e}' THEN 1 ELSE 0 END)"
        f" AS BIGINT) AS n_{e}"
        for e in EVENT_TYPES
    )
    sql = f"""
    SELECT CAST(user_id AS BIGINT) AS user_id,
           {cols}
    FROM events GROUP BY user_id
    """
    return q, sql


# -------------------------------------------------- events_top_journeys
def _journeys_query(topk: int = 10, gap_us: int = GAP_US):
    def q(sf_dir: str):
        import pandas as pd
        import ray.data as rd

        from ..kernels.groupfill import sessionize_multi
        from ..stages.source_rollup import tree_reduce_tables

        def prep(t: pa.Table) -> pa.Table:
            return pa.table(
                {"user_id": t.column("user_id"),
                 "tus": t.column("ts").cast(pa.int64()),
                 "event_id": t.column("event_id").cast(pa.int64()),
                 "event_type": t.column("event_type")}
            )

        def trigrams(g: pa.Table) -> pa.Table:
            g = g.sort_by([("user_id", "ascending"),
                           ("tus", "ascending"),
                           ("event_id", "ascending")])
            users = g.column("user_id").cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
            tus = g.column("tus").to_numpy(zero_copy_only=False)
            sid = sessionize_multi(users, tus, gap_us)
            types, code = np.unique(
                np.asarray(g.column("event_type").to_pylist(),
                           dtype=object),
                return_inverse=True,
            )
            code = code.astype(np.int64)
            same2 = ((users[2:] == users[:-2])
                     & (sid[2:] == sid[:-2]))
            t1 = code[:-2][same2]
            t2 = code[1:-1][same2]
            t3 = code[2:][same2]
            key = (t1 * 64 + t2) * 64 + t3
            uk, uc = np.unique(key, return_counts=True)
            k1 = uk // (64 * 64)
            k2 = (uk // 64) % 64
            k3 = uk % 64
            # zero-count sentinel keeps every tree-reduce input
            # non-empty (a merge node with only empty tables throws);
            # dropped by the cnt > 0 filter at the end
            return pa.table(
                {"s1": pa.array(list(types[k1]) + [""],
                                type=pa.string()),
                 "s2": pa.array(list(types[k2]) + [""],
                                type=pa.string()),
                 "s3": pa.array(list(types[k3]) + [""],
                                type=pa.string()),
                 "cnt": pa.array(
                     np.r_[uc.astype(np.int64), 0])}
            )

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by(["s1", "s2", "s3"]).aggregate(
                [("cnt", "sum")]
            )
            return pa.table(
                {"s1": g.column("s1"), "s2": g.column("s2"),
                 "s3": g.column("s3"),
                 "cnt": g.column("cnt_sum").cast(pa.int64())}
            )

        refs = list(
            read_cols(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])
            .map_batches(prep, batch_format="pyarrow")
            .map_batches(_add_user_bucket, batch_format="pyarrow")
            .groupby("__bucket")
            .map_groups(trigrams, batch_format="pyarrow")
            .to_arrow_refs()
        )
        a = tree_reduce_tables(refs, merge).to_pandas()
        a = a[a["cnt"] > 0]
        a = a.sort_values(
            ["cnt", "s1", "s2", "s3"],
            ascending=[False, True, True, True],
        ).head(topk).reset_index(drop=True)
        a["rk"] = np.arange(1, len(a) + 1, dtype=np.int64)
        return pa.table(
            {"rk": pa.array(a["rk"].to_numpy(np.int64)),
             "s1": pa.array(a["s1"], type=pa.string()),
             "s2": pa.array(a["s2"], type=pa.string()),
             "s3": pa.array(a["s3"], type=pa.string()),
             "cnt": pa.array(a["cnt"].to_numpy(np.int64))}
        )

    sql = f"""
    WITH e AS (
        SELECT user_id, epoch_us(ts) AS tus, event_id, event_type
        FROM events
    ),
    flags AS (
        SELECT user_id, tus, event_id, event_type,
               CASE WHEN lag(tus) OVER w IS NULL
                      OR tus - lag(tus) OVER w > {gap_us}
                    THEN 1 ELSE 0 END AS new_s
        FROM e WINDOW w AS (PARTITION BY user_id
                            ORDER BY tus, event_id)
    ),
    sess AS (
        SELECT user_id, tus, event_id, event_type,
               sum(new_s) OVER (PARTITION BY user_id
                                ORDER BY tus, event_id
                                ROWS UNBOUNDED PRECEDING) AS sid
        FROM flags
    ),
    tri AS (
        SELECT event_type AS s1,
               lead(event_type, 1) OVER w AS s2,
               lead(event_type, 2) OVER w AS s3,
               sid,
               lead(sid, 2) OVER w AS sid3
        FROM sess
        WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id)
    ),
    c AS (
        SELECT s1, s2, s3, CAST(count(*) AS BIGINT) AS cnt
        FROM tri WHERE sid3 = sid
        GROUP BY s1, s2, s3
    )
    SELECT CAST(row_number() OVER (ORDER BY cnt DESC, s1, s2, s3)
                AS BIGINT) AS rk, s1, s2, s3, cnt
    FROM c ORDER BY cnt DESC, s1, s2, s3 LIMIT {topk}
    """
    return q, sql


# ----------------------------------------------------- doc_haar_energy
def _haar_query():
    def q(sf_dir: str):
        from ..stages.rollup import _flat_tokens

        def haar(t: pa.Table) -> pa.Table:
            empty = pa.table(
                {"doc_id": pa.array([], type=pa.int64()),
                 "n_used": pa.array([], type=pa.int64()),
                 "e1": pa.array([], type=pa.int64()),
                 "e2": pa.array([], type=pa.int64()),
                 "e3": pa.array([], type=pa.int64())}
            )
            if "tokens" not in t.column_names:
                return empty
            values, lengths = _flat_tokens(t)
            lens = lengths.astype(np.int64)
            ids = np.asarray(
                [int(x) for x in t.column("doc_id").to_pylist()],
                dtype=np.int64,
            )
            out = {k: [] for k in
                   ("doc_id", "n_used", "e1", "e2", "e3")}
            off = 0
            v = values.astype(np.int64)
            for did, ln in zip(ids, lens):
                x = v[off:off + ln]
                off += ln
                m = (ln // 8) * 8
                if m == 0:
                    continue
                x = x[:m]
                e = []
                cur = x
                for _ in range(3):
                    a = cur[0::2]
                    b = cur[1::2]
                    d = a - b
                    e.append(int((d * d).sum()))
                    cur = a + b
                out["doc_id"].append(int(did))
                out["n_used"].append(int(m))
                out["e1"].append(e[0])
                out["e2"].append(e[1])
                out["e3"].append(e[2])
            return pa.table(
                {k: pa.array(out[k], type=pa.int64()) for k in out}
            )

        return _cast(
            corpus_ds(sf_dir).map_batches(haar,
                                          batch_format="pyarrow"),
            {"doc_id": pa.int64(), "n_used": pa.int64(),
             "e1": pa.int64(), "e2": pa.int64(), "e3": pa.int64()},
        )

    sql = f"""
    WITH tok AS ({SQL_TOK}),
    lens AS (
        SELECT doc_id, (count(*) // 8) * 8 AS m FROM tok
        GROUP BY doc_id
    ),
    t0 AS (
        SELECT t.doc_id, t.pos, CAST(t.token AS BIGINT) AS x, l.m
        FROM tok t JOIN lens l ON l.doc_id = t.doc_id
        WHERE t.pos < l.m AND l.m > 0
    ),
    l1 AS (
        SELECT doc_id, pos // 2 AS p,
               sum(CASE WHEN pos % 2 = 0 THEN x ELSE -x END) AS d,
               sum(x) AS s
        FROM t0 GROUP BY doc_id, pos // 2
    ),
    l2 AS (
        SELECT doc_id, p // 2 AS p,
               sum(CASE WHEN p % 2 = 0 THEN s ELSE -s END) AS d,
               sum(s) AS s
        FROM l1 GROUP BY doc_id, p // 2
    ),
    l3 AS (
        SELECT doc_id, p // 2 AS p,
               sum(CASE WHEN p % 2 = 0 THEN s ELSE -s END) AS d,
               sum(s) AS s
        FROM l2 GROUP BY doc_id, p // 2
    )
    SELECT CAST(t0.doc_id AS BIGINT) AS doc_id,
           CAST(max(t0.m) AS BIGINT) AS n_used,
           CAST((SELECT sum(d * d) FROM l1
                 WHERE l1.doc_id = t0.doc_id) AS BIGINT) AS e1,
           CAST((SELECT sum(d * d) FROM l2
                 WHERE l2.doc_id = t0.doc_id) AS BIGINT) AS e2,
           CAST((SELECT sum(d * d) FROM l3
                 WHERE l3.doc_id = t0.doc_id) AS BIGINT) AS e3
    FROM t0 GROUP BY t0.doc_id
    """
    return q, sql


def build_wave39_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("events_user_type_pivot",) + _pivot_query()))
    add(*(("events_top_journeys",) + _journeys_query()))
    add(*(("doc_haar_energy",) + _haar_query()))
    return queries, oracles
