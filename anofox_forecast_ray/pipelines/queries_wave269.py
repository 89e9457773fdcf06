"""Wave-269 query: Markov removal-effect channel attribution.

events_markov_attribution: the first-order Markov attribution model
(the industry companion of events_shapley_attribution, same user-day
journeys): transitions start→channel→…→{conv, null} are exact
integer counts (ordering ties broken by (tus, event_id) on BOTH
sides); the absorption probability P(conv | start) solves
x = b + Q·x by TWELVE Jacobi iterations — the fifth bitwise-replayed
training loop in the suite — and each channel's removal effect zeros
its row and column and replays the same twelve layers.  Attribution
shares normalize the removal effects.  Convergence error after 12
iterations is ~ρ(Q)^12 (documented estimate, identical on both
sides by construction).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ._scaffold import read_cols

US_PER_DAY = 86_400_000_000

CHANNELS = ["click", "error", "signup", "view"]
N_ITERS = 12
CONV = 5
NULL = 6


def jacobi_absorption(q, b, iters=N_ITERS):
    """x after `iters` Jacobi steps of x = b + Qx (5 transient)."""
    x = [0.0] * 5
    for _ in range(iters):
        nx = []
        for i in range(5):
            v = b[i]
            for j in range(5):
                v = v + q[i][j] * x[j]
            nx.append(v)
        x = nx
    return x


def markov_attribution(counts):
    """rows (channel, p_removed, removal_effect, attribution) plus
    p_base, from {(i, j): n} transition counts."""
    tot = [0] * 5
    for (i, j), n in counts.items():
        if i < 5:
            tot[i] += n

    def qb(removed=None):
        q = [[0.0] * 5 for _ in range(5)]
        b = [0.0] * 5
        for i in range(5):
            if tot[i] == 0 or i == removed:
                continue
            for j in range(5):
                if j == removed:
                    continue
                q[i][j] = (float(counts.get((i, j), 0))
                           / float(tot[i]))
            b[i] = float(counts.get((i, CONV), 0)) / float(tot[i])
        return q, b

    q0, b0 = qb()
    p0 = jacobi_absorption(q0, b0)[0]
    out = []
    res = []
    for c in range(1, 5):
        qc, bc = qb(removed=c)
        pc = jacobi_absorption(qc, bc)[0]
        re = (p0 - pc) / p0
        res.append(re)
        out.append((CHANNELS[c - 1], pc, re))
    total = res[0] + res[1] + res[2] + res[3]
    rows = [(ch, p0, pc, re, re / total)
            for (ch, pc, re), re in zip(out, res)]
    return rows


def _attr_query():
    def q(sf_dir: str):
        import pandas as pd
        import ray.data as rd

        from .queries import _num_read_blocks
        from .queries_ext import _add_user_bucket
        from ..stages.source_rollup import tree_reduce_tables

        state_of = {ch: i + 1 for i, ch in enumerate(CHANNELS)}

        def prep(t: pa.Table) -> pa.Table:
            tus = t.column("ts").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            return pa.table({
                "user_id": t.column("user_id"),
                "day": pa.array(
                    (tus // US_PER_DAY).astype(np.int64)),
                "tus": pa.array(tus),
                "event_id": t.column("event_id"),
                "event_type": t.column("event_type"),
            })

        def trans(g: pd.DataFrame) -> pa.Table:
            import collections

            cnt = collections.Counter()
            for (_u, _d), grp in g.groupby(["user_id", "day"],
                                           sort=False):
                pur = grp.loc[grp["event_type"] == "purchase",
                              "tus"]
                cut = int(pur.min()) if len(pur) else None
                absorb = CONV if cut is not None else NULL
                sub = grp[grp["event_type"] != "purchase"]
                if cut is not None:
                    sub = sub[sub["tus"] < cut]
                sub = sub.sort_values(["tus", "event_id"])
                seq = [state_of[e] for e in sub["event_type"]]
                prev = 0
                for st in seq:
                    cnt[(prev, st)] += 1
                    prev = st
                cnt[(prev, absorb)] += 1
            keys = sorted(cnt)
            return pa.table({
                "i": pa.array([x[0] for x in keys],
                              type=pa.int64()),
                "j": pa.array([x[1] for x in keys],
                              type=pa.int64()),
                "c": pa.array([cnt[x] for x in keys],
                              type=pa.int64()),
            })

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by(["i", "j"]).aggregate([("c", "sum")])
            return pa.table({
                "i": g.column("i").cast(pa.int64()),
                "j": g.column("j").cast(pa.int64()),
                "c": g.column("c_sum").cast(pa.int64()),
            })

        refs = list(
            read_cols(sf_dir, "events", ["user_id", "ts", "event_id",
                         "event_type"])
            .map_batches(prep, batch_format="pyarrow")
            .map_batches(_add_user_bucket, batch_format="pyarrow")
            .groupby("__bucket")
            .map_groups(trans, batch_format="pandas")
            .to_arrow_refs()
        )
        cells = tree_reduce_tables(refs, merge).to_pandas()
        counts = {(int(r.i), int(r.j)): int(r.c)
                  for r in cells.itertuples()}
        rows = markov_attribution(counts)
        return pa.table({
            "channel": pa.array([r[0] for r in rows],
                                type=pa.string()),
            "p_base": pa.array([r[1] for r in rows],
                               type=pa.float64()),
            "p_removed": pa.array([r[2] for r in rows],
                                  type=pa.float64()),
            "removal_effect": pa.array([r[3] for r in rows],
                                       type=pa.float64()),
            "attribution": pa.array([r[4] for r in rows],
                                    type=pa.float64()),
        })

    # ---- generated SQL: journeys -> counts -> qm -> 5x12 layers
    chan_case = " ".join(
        f"WHEN '{ch}' THEN {i + 1}" for i, ch in
        enumerate(CHANNELS))

    def qcol(i, j):
        return (f"CASE WHEN t{i} = 0 THEN 0.0e0 ELSE "
                f"CAST(coalesce(c{i}{j}, 0) AS DOUBLE)"
                f" / CAST(t{i} AS DOUBLE) END")

    qm_cols = []
    for i in range(5):
        qm_cols.append(
            f"CAST(coalesce(sum(CASE WHEN i = {i} THEN c END), 0)"
            f" AS BIGINT) AS t{i}")
        for j in range(5):
            qm_cols.append(
                f"CAST(coalesce(sum(CASE WHEN i = {i} AND j = {j}"
                f" THEN c END), 0) AS BIGINT) AS c{i}{j}")
        qm_cols.append(
            f"CAST(coalesce(sum(CASE WHEN i = {i} AND j = {CONV}"
            f" THEN c END), 0) AS BIGINT) AS b{i}")

    def layers(sys: str, removed: int | None) -> str:
        out = [f"it{sys}_0 AS MATERIALIZED (SELECT "
               + ", ".join(f"0.0e0 AS x{i}" for i in range(5))
               + ")"]
        for t in range(1, N_ITERS + 1):
            exprs = []
            for i in range(5):
                if i == removed:
                    exprs.append(f"0.0e0 AS x{i}")
                    continue
                e = (f"CASE WHEN t{i} = 0 THEN 0.0e0 ELSE "
                     f"CAST(b{i} AS DOUBLE)"
                     f" / CAST(t{i} AS DOUBLE) END")
                for j in range(5):
                    if j == removed:
                        continue
                    e += f" + {qcol(i, j)} * p.x{j}"
                exprs.append(f"{e} AS x{i}")
            out.append(
                f"it{sys}_{t} AS MATERIALIZED (SELECT "
                + ", ".join(exprs)
                + f" FROM it{sys}_{t - 1} p CROSS JOIN qm)")
        return ",\n    ".join(out)

    sys_layers = [layers("b", None)]
    for c in range(1, 5):
        sys_layers.append(layers(f"r{c}", c))
    re_exprs = [
        f"((SELECT x0 FROM itb_{N_ITERS})"
        f" - (SELECT x0 FROM itr{c}_{N_ITERS}))"
        f" / (SELECT x0 FROM itb_{N_ITERS})"
        for c in range(1, 5)]
    total_re = " + ".join(f"({e})" for e in re_exprs)
    union_rows = []
    for c in range(1, 5):
        union_rows.append(
            f"SELECT '{CHANNELS[c - 1]}' AS channel,"
            f" (SELECT x0 FROM itb_{N_ITERS}) AS p_base,"
            f" (SELECT x0 FROM itr{c}_{N_ITERS}) AS p_removed,"
            f" {re_exprs[c - 1]} AS removal_effect,"
            f" ({re_exprs[c - 1]}) / ({total_re}) AS attribution")

    qm_cols_sql = ", ".join(qm_cols)
    sys_layers_sql = ",\n    ".join(sys_layers)
    union_rows_sql = " UNION ALL ".join(union_rows)
    sql = f"""
    WITH prep AS (
        SELECT user_id,
               epoch_us(ts) // {US_PER_DAY} AS day,
               epoch_us(ts) AS tus,
               event_id, event_type
        FROM events
    ),
    cuts AS (
        SELECT user_id, day,
               min(CASE WHEN event_type = 'purchase'
                        THEN tus END) AS cut
        FROM prep GROUP BY user_id, day
    ),
    chan AS (
        SELECT p.user_id, p.day, p.tus, p.event_id,
               CASE p.event_type {chan_case} END AS st,
               row_number() OVER (PARTITION BY p.user_id, p.day
                   ORDER BY p.tus, p.event_id) AS rn,
               lead(CASE p.event_type {chan_case} END)
                   OVER (PARTITION BY p.user_id, p.day
                         ORDER BY p.tus, p.event_id) AS nxt
        FROM prep p JOIN cuts ON p.user_id = cuts.user_id
                            AND p.day = cuts.day
        WHERE p.event_type <> 'purchase'
          AND (cuts.cut IS NULL OR p.tus < cuts.cut)
    ),
    jstats AS (
        SELECT cuts.user_id, cuts.day,
               CASE WHEN cuts.cut IS NULL
                    THEN {NULL} ELSE {CONV} END AS absorb,
               max(chan.rn) AS last_rn,
               CAST(min(CASE WHEN chan.rn = 1 THEN chan.st END)
                    AS BIGINT) AS first_st
        FROM cuts LEFT JOIN chan
          ON cuts.user_id = chan.user_id AND cuts.day = chan.day
        GROUP BY cuts.user_id, cuts.day, cuts.cut
    ),
    trans AS (
        SELECT st AS i, nxt AS j, count(*) AS c
        FROM chan WHERE nxt IS NOT NULL GROUP BY st, nxt
        UNION ALL
        SELECT 0 AS i,
               coalesce(first_st, absorb) AS j, count(*) AS c
        FROM jstats GROUP BY coalesce(first_st, absorb)
        UNION ALL
        SELECT ch.st AS i, js.absorb AS j, count(*) AS c
        FROM jstats js JOIN chan ch
          ON js.user_id = ch.user_id AND js.day = ch.day
         AND ch.rn = js.last_rn
        GROUP BY ch.st, js.absorb
    ),
    qm AS MATERIALIZED (
        SELECT {qm_cols_sql}
        FROM trans
    ),
    {sys_layers_sql}
    {union_rows_sql}
    ORDER BY channel
    """
    return q, sql


def build_wave269_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("events_markov_attribution",) + _attr_query()))
    return queries, oracles
