"""Fifteenth query wave: event-analytics operators — funnel conversion,
cohort retention, per-hour top event types. Classic warehouse shapes
re-expressed Ray-Data-first, each with a bitwise DuckDB oracle.

Scale shapes:
  - funnel: prune to the two funnel steps at the read, shuffle only
    (user, ts, step) triples, per-user logic vectorized in map_groups;
  - cohort: distinct (user, day) pairs deduped per block BEFORE the
    user shuffle; the (cohort, offset) matrix is bounded (days^2) so the
    final count is partials + tree reduce, not a second shuffle;
  - top types: the (hour, type) space is bounded — no shuffle at all,
    per-block partials tree-reduce and the top-k runs on the tiny
    merged table.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .queries import _cast, _num_read_blocks

HOUR_US = 3_600_000_000
DAY_US = 86_400_000_000


def _events(sf_dir: str, columns):
    import ray.data as rd

    return rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=columns,
        override_num_blocks=_num_read_blocks(),
    )


def _funnel_query(step_a: str = "view", step_b: str = "purchase",
                  window_us: int = 24 * HOUR_US):
    """Two-step funnel: a user converts iff some step-B event lands in
    [first_A, first_A + window]. One row out: entered / converted /
    rate (single f64 division of the two int64 counts)."""

    def q(sf_dir: str):
        import ray.data as rd

        def prune(t: pa.Table) -> pa.Table:
            et = t.column("event_type").to_numpy(zero_copy_only=False)
            keep = (et == step_a) | (et == step_b)
            ts = t.column("ts").cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )[keep]
            return pa.table(
                {
                    "user_id": t.column("user_id").filter(
                        pa.array(keep)
                    ).cast(pa.int64()),
                    "tus": pa.array(ts, type=pa.int64()),
                    "is_a": pa.array(
                        (et[keep] == step_a).astype(np.int32),
                        type=pa.int32()),
                }
            )

        def per_user(g: pa.Table) -> pa.Table:
            tus = g.column("tus").to_numpy(zero_copy_only=False)
            is_a = g.column("is_a").to_numpy(
                zero_copy_only=False
            ) == 1
            if not is_a.any():
                return pa.table(
                    {"entered": pa.array([0], type=pa.int64()),
                     "converted": pa.array([0], type=pa.int64())}
                )
            t0 = int(tus[is_a].min())
            tb = tus[~is_a]
            conv = bool(((tb >= t0) & (tb <= t0 + window_us)).any())
            return pa.table(
                {"entered": pa.array([1], type=pa.int64()),
                 "converted": pa.array([1 if conv else 0],
                                       type=pa.int64())}
            )

        per = (
            _events(sf_dir, ["ts", "user_id", "event_type"])
            .map_batches(prune, batch_format="pyarrow")
            .groupby("user_id")
            .map_groups(per_user, batch_format="pyarrow")
        )
        entered = per.sum("entered")
        converted = per.sum("converted")
        entered = int(entered or 0)
        converted = int(converted or 0)
        rate = (
            np.float64(converted) / np.float64(entered)
            if entered
            else float("nan")
        )
        return rd.from_arrow(
            pa.table(
                {
                    "entered": pa.array([entered], type=pa.int64()),
                    "converted": pa.array([converted], type=pa.int64()),
                    "rate": pa.array([rate], type=pa.float64()),
                }
            )
        )

    sql = f"""
    WITH f AS (
        SELECT user_id, epoch_us(ts) AS tus,
               CASE WHEN event_type = '{step_a}' THEN 1 ELSE 0 END AS is_a
        FROM events
        WHERE event_type IN ('{step_a}', '{step_b}')
    ),
    a AS (
        SELECT user_id, min(tus) AS t0 FROM f WHERE is_a = 1
        GROUP BY user_id
    ),
    conv AS (
        SELECT a.user_id,
               max(CASE WHEN f.is_a = 0 AND f.tus >= a.t0
                         AND f.tus <= a.t0 + {window_us}
                        THEN 1 ELSE 0 END) AS c
        FROM a LEFT JOIN f ON f.user_id = a.user_id
        GROUP BY a.user_id
    )
    SELECT CAST(count(*) AS BIGINT) AS entered,
           CAST(sum(c) AS BIGINT) AS converted,
           CAST(sum(c) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS rate
    FROM conv
    """
    return q, sql


def _cohort_query():
    """Cohort retention: cohort = first active day per user; count users
    active at each (cohort, day offset)."""

    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def pairs(t: pa.Table) -> pa.Table:
            ts = t.column("ts").cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
            day = ts // DAY_US
            user = t.column("user_id").to_numpy(zero_copy_only=False)
            key = np.stack([user, day], axis=1)
            uniq = np.unique(key, axis=0)
            return pa.table(
                {"user_id": pa.array(uniq[:, 0], type=pa.int64()),
                 "day": pa.array(uniq[:, 1], type=pa.int64())}
            )

        def per_user(g: pa.Table) -> pa.Table:
            days = np.unique(
                g.column("day").to_numpy(zero_copy_only=False)
            )
            cohort = int(days[0])
            return pa.table(
                {
                    "cohort_day": pa.array(
                        np.full(days.size, cohort, np.int64)),
                    "day_offset": pa.array(days - cohort,
                                           type=pa.int64()),
                    "n": pa.array(np.ones(days.size, np.int64)),
                }
            )

        def merge(t: pa.Table) -> pa.Table:
            c = t.column("cohort_day").to_numpy(zero_copy_only=False)
            o = t.column("day_offset").to_numpy(zero_copy_only=False)
            n = t.column("n").to_numpy(zero_copy_only=False)
            key = c * 100_000 + o
            order = np.argsort(key, kind="stable")
            uk, start = np.unique(key[order], return_index=True)
            return pa.table(
                {"cohort_day": pa.array(uk // 100_000, type=pa.int64()),
                 "day_offset": pa.array(uk % 100_000, type=pa.int64()),
                 "n": pa.array(
                     np.add.reduceat(n[order], start).astype(np.int64),
                     type=pa.int64())}
            )

        per = (
            _events(sf_dir, ["ts", "user_id"])
            .map_batches(pairs, batch_format="pyarrow")
            .groupby("user_id")
            .map_groups(per_user, batch_format="pyarrow")
        )
        refs = list(
            per.map_batches(merge, batch_format="pyarrow").to_arrow_refs()
        )
        final = tree_reduce_tables(refs, merge)
        out = pa.table(
            {
                "cohort_day": final.column("cohort_day"),
                "day_offset": final.column("day_offset"),
                "n_users": final.column("n"),
            }
        )
        return rd.from_arrow(out)

    sql = f"""
    WITH ud AS (
        SELECT DISTINCT user_id,
               CAST(epoch_us(ts) // {DAY_US} AS BIGINT) AS day
        FROM events
    ),
    c AS (SELECT user_id, min(day) AS cohort FROM ud GROUP BY user_id)
    SELECT c.cohort AS cohort_day,
           ud.day - c.cohort AS day_offset,
           CAST(count(*) AS BIGINT) AS n_users
    FROM ud JOIN c USING (user_id)
    GROUP BY cohort_day, day_offset
    """
    return q, sql


TOP_K_TYPES = 3


def _hourly_top_types_query():
    """Top-{TOP_K_TYPES} event types per hour (count desc, type asc)."""

    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            ts = t.column("ts").cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
            hour = ts // HOUR_US
            et = np.asarray(
                t.column("event_type").to_pylist(), dtype=object
            )
            key = np.asarray(
                [f"{h}\x00{e}" for h, e in zip(hour, et)], dtype=object
            )
            order = np.argsort(key, kind="stable")
            uk, start = np.unique(key[order], return_index=True)
            cnt = np.add.reduceat(
                np.ones(key.size, np.int64)[order], start
            )
            sp = [k.split("\x00", 1) for k in uk]
            return pa.table(
                {"hour_id": pa.array([int(x[0]) for x in sp],
                                     type=pa.int64()),
                 "event_type": pa.array([x[1] for x in sp],
                                        type=pa.string()),
                 "cnt": pa.array(cnt.astype(np.int64), type=pa.int64())}
            )

        def merge(t: pa.Table) -> pa.Table:
            h = t.column("hour_id").to_numpy(zero_copy_only=False)
            e = np.asarray(t.column("event_type").to_pylist(),
                           dtype=object)
            c = t.column("cnt").to_numpy(zero_copy_only=False)
            key = np.asarray(
                [f"{a}\x00{b}" for a, b in zip(h, e)], dtype=object
            )
            order = np.argsort(key, kind="stable")
            uk, start = np.unique(key[order], return_index=True)
            cm = np.add.reduceat(c[order], start).astype(np.int64)
            sp = [k.split("\x00", 1) for k in uk]
            return pa.table(
                {"hour_id": pa.array([int(x[0]) for x in sp],
                                     type=pa.int64()),
                 "event_type": pa.array([x[1] for x in sp],
                                        type=pa.string()),
                 "cnt": pa.array(cm, type=pa.int64())}
            )

        refs = list(
            _events(sf_dir, ["ts", "event_type"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        final = merge(tree_reduce_tables(refs, merge))
        h = final.column("hour_id").to_numpy(zero_copy_only=False)
        e = np.asarray(final.column("event_type").to_pylist(),
                       dtype=object)
        c = final.column("cnt").to_numpy(zero_copy_only=False)
        # rank within hour by (cnt desc, type asc)
        order = np.lexsort((e, -c, h))
        h, e, c = h[order], e[order], c[order]
        newgrp = np.concatenate(([True], h[1:] != h[:-1]))
        starts = np.flatnonzero(newgrp)
        rank = np.arange(h.size) - np.repeat(
            starts, np.diff(np.concatenate((starts, [h.size])))
        ) + 1
        keep = rank <= TOP_K_TYPES
        out = pa.table(
            {
                "hour_id": pa.array(h[keep], type=pa.int64()),
                "event_type": pa.array(list(e[keep]), type=pa.string()),
                "cnt": pa.array(c[keep], type=pa.int64()),
                "rnk": pa.array(rank[keep].astype(np.int64),
                                type=pa.int64()),
            }
        )
        return rd.from_arrow(out)

    sql = f"""
    WITH hc AS (
        SELECT CAST(epoch_us(ts) // {HOUR_US} AS BIGINT) AS hour_id,
               event_type, CAST(count(*) AS BIGINT) AS cnt
        FROM events GROUP BY hour_id, event_type
    ),
    r AS (
        SELECT hour_id, event_type, cnt,
               CAST(row_number() OVER (
                   PARTITION BY hour_id
                   ORDER BY cnt DESC, event_type ASC) AS BIGINT) AS rnk
        FROM hc
    )
    SELECT hour_id, event_type, cnt, rnk FROM r WHERE rnk <= {TOP_K_TYPES}
    """
    return q, sql


def build_wave15_queries():
    queries, oracles = {}, {}

    q, sql = _funnel_query()
    queries["events_funnel_view_purchase"] = q
    oracles["events_funnel_view_purchase"] = sql

    q, sql = _cohort_query()
    # wave128 ships the canonical events_cohort_retention (it overwrote
    # this one under the old sequential registration); keep this variant
    # under a distinct name.
    queries["events_cohort_retention_v1"] = q
    oracles["events_cohort_retention_v1"] = sql

    q, sql = _hourly_top_types_query()
    queries["events_hourly_top_types"] = q
    oracles["events_hourly_top_types"] = sql

    return queries, oracles
