"""Wave-188 queries: batch perceptron replay, HITS hubs/authorities.

Two more bitwise-REPLAYED training loops (joining GMM-EM, Sinkhorn,
NMF, Bradley-Terry, Elo):

- events_perceptron_hour: a batch perceptron classifying error vs
  non-error events from hour-of-day with the integer feature map
  phi(h) = [1, h, h^2]. Training data collapses to 48 bounded cells
  (hod x label, counts); each of the K=4 synchronous epochs adds
  sum over misclassified cells of y * phi * count to the weights —
  ALL-INTEGER weights, so the replay is exact by construction
  (y*score <= 0 counts as misclassified). SQL unrolls the epochs as
  MATERIALIZED CTE layers (DuckDB re-expands un-materialized
  recursive layers 3^depth).
- events_hits_types: Kleinberg's HITS on the 5x5 event-type
  transition matrix, K=3 synchronous iterations of a <- A^T h,
  h <- A a with L1 (sum) normalization — no sqrt, every float op a
  short fold in type order (list_reduce), every matrix entry an
  exact int64 count.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .queries import _num_read_blocks
from ._scaffold import read_cols

US_PER_HOUR = 3_600_000_000
EPOCHS = 4
HITS_K = 3


def perceptron_replay(cells):
    """cells: list of (h, y, c) with y in {-1,+1}; returns
    (w0, w1, w2, n_misclassified_final) — all exact ints.
    Cells must be iterated in (h, y) sorted order (integer sums are
    order-free, but fixing it documents the replay)."""
    w0 = w1 = w2 = 0
    for _ in range(EPOCHS):
        d0 = d1 = d2 = 0
        for h, y, c in cells:
            s = w0 + w1 * h + w2 * h * h
            if y * s <= 0:
                d0 += y * c
                d1 += y * h * c
                d2 += y * h * h * c
        w0, w1, w2 = w0 + d0, w1 + d1, w2 + d2
    miss = 0
    for h, y, c in cells:
        s = w0 + w1 * h + w2 * h * h
        if y * s <= 0:
            miss += c
    return w0, w1, w2, miss


def hits_replay(counts, types):
    """Synchronous HITS with L1 normalization; folds in sorted type
    order mirror the SQL list_reduce folds term-for-term."""
    a = {t: 1.0 for t in types}
    h = {t: 1.0 for t in types}
    for _ in range(HITS_K):
        araw = {}
        for ty in types:
            s = 0.0
            for ft in types:
                if (ft, ty) in counts:
                    s = s + float(counts[(ft, ty)]) * h[ft]
            araw[ty] = s
        tot = 0.0
        for ty in types:
            tot = tot + araw[ty]
        a = {ty: araw[ty] / tot for ty in types}
        hraw = {}
        for ty in types:
            s = 0.0
            for tt in types:
                if (ty, tt) in counts:
                    s = s + float(counts[(ty, tt)]) * a[tt]
            hraw[ty] = s
        tot = 0.0
        for ty in types:
            tot = tot + hraw[ty]
        h = {ty: hraw[ty] / tot for ty in types}
    return h, a


# ---------------------------------------------- events_perceptron_hour
def _perceptron_query():
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            tus = t.column("ts").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            hod = (tus // US_PER_HOUR) % 24
            err = (np.asarray(t.column("event_type").to_pylist())
                   == "error").astype(np.int64)
            key = hod * 2 + err
            cnt = np.bincount(key, minlength=48).astype(np.int64)
            return pa.table({
                "cell": pa.array(np.arange(48, dtype=np.int64)),
                "c": pa.array(cnt),
            })

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by("cell").aggregate([("c", "sum")])
            return pa.table({
                "cell": g.column("cell").cast(pa.int64()),
                "c": g.column("c_sum").cast(pa.int64()),
            })

        refs = list(
            read_cols(sf_dir, "events", ["ts", "event_type"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        m = tree_reduce_tables(refs, merge).to_pandas()
        m = m.sort_values("cell").reset_index(drop=True)
        cells = []
        for _, r in m.iterrows():
            cell = int(r["cell"])
            c = int(r["c"])
            if c == 0:
                continue
            hh = cell // 2
            y = 1 if cell % 2 == 1 else -1
            cells.append((hh, y, c))
        w0, w1, w2, miss = perceptron_replay(cells)
        return pa.table({
            "w0": pa.array([w0], type=pa.int64()),
            "w1": pa.array([w1], type=pa.int64()),
            "w2": pa.array([w2], type=pa.int64()),
            "n_miss": pa.array([miss], type=pa.int64()),
        })

    # unrolled epochs; every layer MATERIALIZED
    layers = []
    prev = "w0"
    layers.append("w0 AS MATERIALIZED (SELECT CAST(0 AS BIGINT) AS "
                  "a0, CAST(0 AS BIGINT) AS a1, CAST(0 AS BIGINT) "
                  "AS a2 FROM (SELECT 1))")
    for e in range(1, EPOCHS + 1):
        layers.append(f"""
    w{e} AS MATERIALIZED (
        SELECT {prev}.a0 + CAST(coalesce(sum(CASE WHEN
                   cells.y * ({prev}.a0 + {prev}.a1 * cells.h
                              + {prev}.a2 * cells.h * cells.h) <= 0
                   THEN cells.y * cells.c ELSE 0 END), 0) AS BIGINT)
                   AS a0,
               {prev}.a1 + CAST(coalesce(sum(CASE WHEN
                   cells.y * ({prev}.a0 + {prev}.a1 * cells.h
                              + {prev}.a2 * cells.h * cells.h) <= 0
                   THEN cells.y * cells.h * cells.c ELSE 0 END), 0)
                   AS BIGINT) AS a1,
               {prev}.a2 + CAST(coalesce(sum(CASE WHEN
                   cells.y * ({prev}.a0 + {prev}.a1 * cells.h
                              + {prev}.a2 * cells.h * cells.h) <= 0
                   THEN cells.y * cells.h * cells.h * cells.c
                   ELSE 0 END), 0) AS BIGINT) AS a2
        FROM cells CROSS JOIN {prev}
        GROUP BY {prev}.a0, {prev}.a1, {prev}.a2
    )""")
        prev = f"w{e}"

    sql = f"""
    WITH e AS (
        SELECT (epoch_us(ts) // {US_PER_HOUR}) % 24 AS h,
               CASE WHEN event_type = 'error' THEN 1 ELSE -1 END
                   AS y
        FROM events
    ),
    cells AS (
        SELECT h, y, CAST(count(*) AS BIGINT) AS c
        FROM e GROUP BY h, y
    ),
    {",".join(layers)}
    SELECT {prev}.a0 AS w0, {prev}.a1 AS w1, {prev}.a2 AS w2,
           CAST(coalesce((SELECT sum(cells.c) FROM cells
                 WHERE cells.y * ({prev}.a0 + {prev}.a1 * cells.h
                       + {prev}.a2 * cells.h * cells.h) <= 0), 0)
                AS BIGINT) AS n_miss
    FROM {prev}
    """
    return q, sql


# -------------------------------------------------- events_hits_types
def _hits_query():
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def prune(t: pa.Table) -> pa.Table:
            return pa.table({
                "user_id": t.column("user_id").cast(pa.int64()),
                "tus": t.column("ts").cast(pa.int64()),
                "eid": t.column("event_id").cast(pa.int64()),
                "et": t.column("event_type").cast(pa.string()),
            })

        def per_user(g: pa.Table) -> pa.Table:
            # eid unique -> total order; (ft, tt) counts via NUL-key sort
            # + run length (exact int counts)
            g = g.sort_by([("tus", "ascending"),
                           ("eid", "ascending")])
            et = np.asarray(g.column("et").to_pylist(), dtype=object)
            if et.size < 2:
                return pa.table(
                    {"ft": pa.array([], type=pa.string()),
                     "tt": pa.array([], type=pa.string()),
                     "cnt": pa.array([], type=pa.int64())}
                )
            key = np.asarray(
                [a + "\x00" + b for a, b in zip(et[:-1], et[1:])],
                dtype=object,
            )
            order = np.argsort(key, kind="stable")
            uk, start = np.unique(key[order], return_index=True)
            cnt = np.diff(np.r_[start, key.size]).astype(np.int64)
            sm = [k.split("\x00", 1) for k in uk]
            return pa.table(
                {"ft": pa.array([x[0] for x in sm],
                                type=pa.string()),
                 "tt": pa.array([x[1] for x in sm],
                                type=pa.string()),
                 "cnt": pa.array(cnt)}
            )

        def merge(t: pa.Table) -> pa.Table:
            df = t.to_pandas()
            g = (df.groupby(["ft", "tt"], sort=True)["cnt"].sum()
                 .reset_index())
            return pa.table({
                "ft": pa.array(g["ft"], type=pa.string()),
                "tt": pa.array(g["tt"], type=pa.string()),
                "cnt": pa.array(g["cnt"].astype("int64")),
            })

        refs = list(
            read_cols(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])
            .map_batches(prune, batch_format="pyarrow")
            .groupby("user_id")
            .map_groups(per_user, batch_format="pyarrow")
            .to_arrow_refs()
        )
        m = tree_reduce_tables(refs, merge).to_pandas()
        counts = {(r["ft"], r["tt"]): int(r["cnt"])
                  for _, r in m.iterrows()}
        types = sorted({k[0] for k in counts}
                       | {k[1] for k in counts})
        h, a = hits_replay(counts, types)
        return pa.table({
            "event_type": pa.array(types, type=pa.string()),
            "hub": pa.array([h[t] for t in types],
                            type=pa.float64()),
            "authority": pa.array([a[t] for t in types],
                                  type=pa.float64()),
        })

    def fold_over(expr_list: str) -> str:
        return (f"coalesce(list_reduce(list_prepend(0.0e0, "
                f"{expr_list}), (p, x) -> p + x), 0.0e0)")

    layers = ["""
    h0 AS MATERIALIZED (
        SELECT ty, 1.0e0 AS v FROM types
    )"""]
    hv = "h0"
    av = None
    for it in range(1, HITS_K + 1):
        layers.append(f"""
    a{it}r AS MATERIALIZED (
        SELECT ty, {fold_over(
            f"(SELECT list(CAST(t.cnt AS DOUBLE) * hh.v "
            f"ORDER BY t.ft) FROM t JOIN {hv} hh ON hh.ty = t.ft "
            f"WHERE t.tt = types.ty)")} AS raw
        FROM types
    ),
    a{it} AS MATERIALIZED (
        SELECT ty, raw / (SELECT {fold_over(
            f'(SELECT list(raw ORDER BY ty) FROM a{it}r)')})
            AS v
        FROM a{it}r
    ),
    h{it}r AS MATERIALIZED (
        SELECT ty, {fold_over(
            f"(SELECT list(CAST(t.cnt AS DOUBLE) * aa.v "
            f"ORDER BY t.tt) FROM t JOIN a{it} aa ON aa.ty = t.tt "
            f"WHERE t.ft = types.ty)")} AS raw
        FROM types
    ),
    h{it} AS MATERIALIZED (
        SELECT ty, raw / (SELECT {fold_over(
            f'(SELECT list(raw ORDER BY ty) FROM h{it}r)')})
            AS v
        FROM h{it}r
    )""")
        hv = f"h{it}"
        av = f"a{it}"

    sql = f"""
    WITH o AS (
        SELECT event_type AS ft,
               lead(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS tt
        FROM events
    ),
    t AS (
        SELECT ft, tt, CAST(count(*) AS BIGINT) AS cnt
        FROM o WHERE tt IS NOT NULL GROUP BY 1, 2
    ),
    types AS (
        SELECT DISTINCT ft AS ty FROM t
        UNION
        SELECT DISTINCT tt AS ty FROM t
    ),
    {",".join(layers)}
    SELECT types.ty AS event_type,
           (SELECT v FROM {hv} WHERE {hv}.ty = types.ty) AS hub,
           (SELECT v FROM {av} WHERE {av}.ty = types.ty)
               AS authority
    FROM types
    """
    return q, sql


def build_wave188_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("events_perceptron_hour",) + _perceptron_query()))
    add(*(("events_hits_types",) + _hits_query()))
    return queries, oracles
