"""Wave-236 query: isotonic regression by unrolled integer PAVA.

events_isotonic_rate: the pool-adjacent-violators fit of a
MONOTONE-INCREASING error rate over hour-of-day — the isotonic
regression every calibration pipeline runs. The entire PAVA replay
is INTEGER: blocks carry (error_sum r, weight n); a violation is
the exact cross-multiplication r_i n_{i+1} > r_{i+1} n_i; each of
the 23 unrolled layers merges the LEFTMOST violating pair (merging
reduces the block count by one, so 23 layers always suffice);
fitted rates are single divisions at emission. The SQL replays the
same layers with list slicing/concat on BIGINT lists. Emits the
24 (hod, iso_rate) rows.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .queries import _num_read_blocks
from ._scaffold import read_cols

US_PER_HOUR = 3_600_000_000
N_CELLS = 24


def pava_replay(r, n):
    """Integer leftmost-merge PAVA; returns (rs, ns, ws) block
    lists (ws = cell widths) after N_CELLS-1 layers (idempotent
    once monotone)."""
    rs = [int(v) for v in r]
    ns = [int(v) for v in n]
    ws = [1] * len(rs)
    for _ in range(N_CELLS - 1):
        k = 0
        for i in range(len(rs) - 1):
            if rs[i] * ns[i + 1] > rs[i + 1] * ns[i]:
                k = i + 1
                break
        if k:
            rs = (rs[: k - 1] + [rs[k - 1] + rs[k]]
                  + rs[k + 1:])
            ns = (ns[: k - 1] + [ns[k - 1] + ns[k]]
                  + ns[k + 1:])
            ws = (ws[: k - 1] + [ws[k - 1] + ws[k]]
                  + ws[k + 1:])
    return rs, ns, ws


def pava_fitted(r, n):
    """[(hod, rate)] expanded back to the 24 cells by widths."""
    rs, ns, ws = pava_replay(r, n)
    out = []
    b = 0
    used = 0
    for h in range(N_CELLS):
        if used >= ws[b]:
            b += 1
            used = 0
        out.append((h, rs[b] / ns[b]))
        used += 1
    return out


# ----------------------------------------------- events_isotonic_rate
def _iso_query():
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            tus = t.column("ts").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            hod = (tus // US_PER_HOUR) % 24
            err = (np.asarray(t.column("event_type").to_pylist())
                   == "error").astype(np.int64)
            n = np.bincount(hod, minlength=24).astype(np.int64)
            r = np.bincount(hod, weights=err.astype(np.float64),
                            minlength=24).astype(np.int64)
            return pa.table({
                "k": pa.array(np.arange(24, dtype=np.int64)),
                "n": pa.array(n), "r": pa.array(r),
            })

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by("k").aggregate(
                [("n", "sum"), ("r", "sum")])
            return pa.table({
                "k": g.column("k").cast(pa.int64()),
                "n": g.column("n_sum").cast(pa.int64()),
                "r": g.column("r_sum").cast(pa.int64()),
            })

        refs = list(
            read_cols(sf_dir, "events", ["ts", "event_type"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        h = tree_reduce_tables(refs, merge).to_pandas()
        h = h.sort_values("k").reset_index(drop=True)
        rows = pava_fitted(h["r"].to_numpy(np.int64),
                           h["n"].to_numpy(np.int64))
        tbl = pa.table({
            "hod": pa.array([x[0] for x in rows],
                            type=pa.int64()),
            "iso_rate": pa.array([x[1] for x in rows],
                                 type=pa.float64()),
        })
        return rd.from_arrow(tbl)

    # one PAVA layer: merge the leftmost violating pair (if any)
    def layer(prev, it):
        return f"""
    p{it} AS MATERIALIZED (
        SELECT CASE WHEN kk.k = 0 THEN {prev}.rs
               ELSE list_concat(list_concat(
                    {prev}.rs[1:kk.k - 1],
                    [{prev}.rs[kk.k] + {prev}.rs[kk.k + 1]]),
                    {prev}.rs[kk.k + 2:len({prev}.rs)]) END
                   AS rs,
               CASE WHEN kk.k = 0 THEN {prev}.ns
               ELSE list_concat(list_concat(
                    {prev}.ns[1:kk.k - 1],
                    [{prev}.ns[kk.k] + {prev}.ns[kk.k + 1]]),
                    {prev}.ns[kk.k + 2:len({prev}.ns)]) END
                   AS ns,
               CASE WHEN kk.k = 0 THEN {prev}.ws
               ELSE list_concat(list_concat(
                    {prev}.ws[1:kk.k - 1],
                    [{prev}.ws[kk.k] + {prev}.ws[kk.k + 1]]),
                    {prev}.ws[kk.k + 2:len({prev}.ws)]) END
                   AS ws
        FROM {prev} CROSS JOIN (
            SELECT coalesce(list_position(
                list_transform(generate_series(1,
                    len({prev}.rs) - 1),
                    i -> CASE WHEN {prev}.rs[i]
                              * {prev}.ns[i + 1]
                              > {prev}.rs[i + 1]
                                * {prev}.ns[i]
                         THEN 1 ELSE 0 END), 1), 0) AS k
            FROM {prev}
        ) kk
    )"""

    layers = ["""
    p0 AS MATERIALIZED (
        SELECT list(CAST(r AS BIGINT) ORDER BY k) AS rs,
               list(CAST(n AS BIGINT) ORDER BY k) AS ns,
               list(CAST(1 AS BIGINT) ORDER BY k) AS ws
        FROM h
    )"""]
    prev = "p0"
    for it in range(1, N_CELLS):
        layers.append(layer(prev, it))
        prev = f"p{it}"

    sql = f"""
    WITH e AS (
        SELECT (epoch_us(ts) // {US_PER_HOUR}) % 24 AS k,
               CASE WHEN event_type = 'error' THEN 1 ELSE 0 END
                   AS is_err
        FROM events
    ),
    g24 AS (
        SELECT CAST(unnest(generate_series(0, 23)) AS BIGINT)
                   AS k
    ),
    h AS (
        SELECT g24.k,
               CAST(coalesce(c.n, 0) AS BIGINT) AS n,
               CAST(coalesce(c.r, 0) AS BIGINT) AS r
        FROM g24 LEFT JOIN (
            SELECT k, count(*) AS n, sum(is_err) AS r
            FROM e GROUP BY k
        ) c ON g24.k = c.k
    ),
    {",".join(layers)},
    blocks AS (
        SELECT rs, ns,
               list_transform(generate_series(1, len(ws)),
                   i -> list_reduce(ws[1:i],
                        (a, b) -> a + b)) AS cums
        FROM {prev}
    )
    SELECT g24.k AS hod,
           CAST(blocks.rs[
               CAST(len(list_filter(blocks.cums,
                    c -> c < g24.k + 1)) + 1 AS INTEGER)]
               AS DOUBLE)
           / CAST(blocks.ns[
               CAST(len(list_filter(blocks.cums,
                    c -> c < g24.k + 1)) + 1 AS INTEGER)]
               AS DOUBLE) AS iso_rate
    FROM g24 CROSS JOIN blocks
    """
    return q, sql


def build_wave236_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("events_isotonic_rate",) + _iso_query()))
    return queries, oracles
