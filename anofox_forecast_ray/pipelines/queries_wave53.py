"""Wave-53 queries: calendar profiles, largest-jump detection, and
time-travel reads.

- events_dow_hod_profile: the weekly heatmap — event counts per
  (day-of-week, hour-of-day) cell with the number of calendar slots of
  that cell in the observed range, rate as one division. Bounded 168
  cells.
- doc_max_jump: largest absolute first-difference per doc and the
  FIRST position attaining it — change-detection's cheap screen.
  Exact integers; the argmax tiebreak (earliest) is replayed with a
  row_number oracle.
- events_time_travel_state: AS-OF snapshot semantics — the latest
  (ts, type, value) per user considering only events at or before the
  cutoff (here: observed midpoint) — the time-travel read a versioned
  store serves. Same partial-collapse shape as events_latest_state
  with the predicate pushed into the scan.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .queries import _cast, _num_read_blocks
from ._scaffold import read_cols

_MIX = np.uint64(0x9E3779B97F4A7C15)
DAY_US = 86_400_000_000
# deterministic cutoff: 2024-01-16 00:00:00 UTC (mid-corpus)
CUTOFF_US = 1_705_363_200_000_000


# ---------------------------------------------------- events_dow_hod_profile
def _dow_hod_query():
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            if "ts" not in t.column_names:
                return pa.table(
                    {"dow": pa.array([], type=pa.int64()),
                     "hod": pa.array([], type=pa.int64()),
                     "cnt": pa.array([], type=pa.int64()),
                     "min_h": pa.array([], type=pa.int64()),
                     "max_h": pa.array([], type=pa.int64())}
                )
            hour = (t.column("ts").cast(pa.int64()).to_numpy(
                zero_copy_only=False) // 1_000_000 // 3600)
            # epoch day 0 = Thursday; dow 0 = Monday like DuckDB's
            # isodow-1
            dow = ((hour // 24) + 3) % 7
            hod = hour % 24
            key = dow * 24 + hod
            uk, uc = np.unique(key, return_counts=True)
            return pa.table(
                {"dow": pa.array(uk // 24),
                 "hod": pa.array(uk % 24),
                 "cnt": pa.array(uc.astype(np.int64)),
                 "min_h": pa.array(
                     np.full(uk.size, int(hour.min()),
                             dtype=np.int64)),
                 "max_h": pa.array(
                     np.full(uk.size, int(hour.max()),
                             dtype=np.int64))}
            )

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by(["dow", "hod"]).aggregate(
                [("cnt", "sum"), ("min_h", "min"), ("max_h", "max")]
            )
            return pa.table(
                {"dow": g.column("dow"), "hod": g.column("hod"),
                 "cnt": g.column("cnt_sum").cast(pa.int64()),
                 "min_h": g.column("min_h_min").cast(pa.int64()),
                 "max_h": g.column("max_h_max").cast(pa.int64())}
            )

        refs = list(
            read_cols(sf_dir, "events", ["ts"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        a = tree_reduce_tables(refs, merge).to_pandas()
        lo = int(a["min_h"].min())
        hi = int(a["max_h"].max())
        hours = np.arange(lo, hi + 1, dtype=np.int64)
        slot_key = ((hours // 24 + 3) % 7) * 24 + hours % 24
        sk, sc = np.unique(slot_key, return_counts=True)
        slots = dict(zip(sk, sc))
        a = a.sort_values(["dow", "hod"])
        key = (a["dow"].to_numpy(np.int64) * 24
               + a["hod"].to_numpy(np.int64))
        n_slots = np.asarray([slots[int(k)] for k in key],
                             dtype=np.int64)
        cnt = a["cnt"].to_numpy(np.int64)
        return pa.table(
            {"dow": pa.array(a["dow"].to_numpy(np.int64)),
             "hod": pa.array(a["hod"].to_numpy(np.int64)),
             "cnt": pa.array(cnt),
             "n_slots": pa.array(n_slots),
             "rate": pa.array(
                 cnt.astype(np.float64)
                 / n_slots.astype(np.float64),
                 type=pa.float64())}
        )

    sql = """
    WITH h AS (
        SELECT epoch_us(ts) // 1000000 // 3600 AS hour FROM events
    ),
    cells AS (
        SELECT ((hour // 24) + 3) % 7 AS dow, hour % 24 AS hod,
               CAST(count(*) AS BIGINT) AS cnt
        FROM h GROUP BY 1, 2
    ),
    bounds AS (SELECT min(hour) AS lo, max(hour) AS hi FROM h),
    grid AS (
        SELECT unnest(generate_series(b.lo, b.hi)) AS hour
        FROM bounds b
    ),
    slots AS (
        SELECT ((hour // 24) + 3) % 7 AS dow, hour % 24 AS hod,
               CAST(count(*) AS BIGINT) AS n_slots
        FROM grid GROUP BY 1, 2
    )
    SELECT CAST(c.dow AS BIGINT) AS dow,
           CAST(c.hod AS BIGINT) AS hod,
           c.cnt, s.n_slots,
           CAST(c.cnt AS DOUBLE) / CAST(s.n_slots AS DOUBLE)
               AS rate
    FROM cells c JOIN slots s
      ON s.dow = c.dow AND s.hod = c.hod
    """
    return q, sql


# ------------------------------------------------------------- doc_max_jump
def _max_jump_query():
    def q(sf_dir: str):
        from ..stages.rollup import _flat_tokens
        from .queries import corpus_ds

        def jump(t: pa.Table) -> pa.Table:
            empty = pa.table(
                {"doc_id": pa.array([], type=pa.int64()),
                 "pos": pa.array([], type=pa.int64()),
                 "jump": pa.array([], type=pa.int64())}
            )
            if "tokens" not in t.column_names:
                return empty
            values, lengths = _flat_tokens(t)
            if values.size == 0:
                return empty
            v = values.astype(np.int64)
            lens = lengths.astype(np.int64)
            seg = np.repeat(np.arange(lens.size, dtype=np.int64),
                            lens)
            d = np.abs(np.diff(v))
            same = seg[1:] == seg[:-1]
            d = np.where(same, d, -1)  # cross-doc positions invalid
            pos_in_doc = (np.arange(v.size, dtype=np.int64)
                          - np.repeat(np.concatenate(
                              ([0], np.cumsum(lens)))[:-1], lens))
            # encoded argmax: jump * 2^22 + (2^22 - 1 - pos) -> max
            LIM = np.int64(1) << 22
            ordk = np.where(
                d >= 0,
                d * LIM + (LIM - 1 - pos_in_doc[:-1]),
                np.int64(-1),
            )
            starts_all = np.concatenate(([0], np.cumsum(lens)))[:-1]
            keep = lens >= 2
            # diff array segment for doc i = positions
            # [starts_i, starts_i + len_i - 1) plus the invalid
            # boundary slot; reduceat over starts works as in doc_rsi
            best = np.maximum.reduceat(
                np.r_[ordk, np.int64(-1)], starts_all
            )[keep]
            jump_v = best // LIM
            pos_v = (LIM - 1) - (best % LIM)
            ids = np.asarray(
                [int(x) for x in t.column("doc_id").to_pylist()],
                dtype=np.int64,
            )[keep]
            return pa.table(
                {"doc_id": pa.array(ids),
                 "pos": pa.array(pos_v),
                 "jump": pa.array(jump_v)}
            )

        return _cast(
            corpus_ds(sf_dir).map_batches(jump,
                                          batch_format="pyarrow"),
            {"doc_id": pa.int64(), "pos": pa.int64(),
             "jump": pa.int64()},
        )

    from .queries import SQL_TOK

    sql = f"""
    WITH tok AS ({SQL_TOK}),
    d AS (
        SELECT doc_id, pos,
               abs(lead(token) OVER (PARTITION BY doc_id
                                     ORDER BY pos) - token) AS j
        FROM tok
    )
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(pos AS BIGINT) AS pos,
           CAST(j AS BIGINT) AS jump
    FROM (
        SELECT doc_id, pos, j,
               row_number() OVER (PARTITION BY doc_id
                                  ORDER BY j DESC, pos) AS rk
        FROM d WHERE j IS NOT NULL
    ) WHERE rk = 1
    """
    return q, sql


# ----------------------------------------------- events_time_travel_state
def _time_travel_query(cutoff_us: int = CUTOFF_US, n_buckets: int = 128):
    def q(sf_dir: str):
        import pandas as pd
        import ray.data as rd

        def partial(t: pa.Table) -> pa.Table:
            empty = pa.table(
                {"bucket": pa.array([], type=pa.int64()),
                 "user_id": pa.array([], type=pa.int64()),
                 "ts_us": pa.array([], type=pa.int64()),
                 "event_id": pa.array([], type=pa.int64()),
                 "event_type": pa.array([], type=pa.string()),
                 "cents": pa.array([], type=pa.int64())}
            )
            if "user_id" not in t.column_names:
                return empty
            tus = t.column("ts").cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
            keep = tus <= cutoff_us  # the AS-OF predicate, pushed
            if not keep.any():
                return empty
            cents = np.round(
                t.column("value").to_numpy(zero_copy_only=False)
                * 100.0
            ).astype(np.int64)
            df = pa.table(
                {"user_id": t.column("user_id").cast(pa.int64()),
                 "ts_us": pa.array(tus),
                 "event_id": t.column("event_id").cast(pa.int64()),
                 "event_type": t.column("event_type"),
                 "cents": pa.array(cents)}
            ).filter(pa.array(keep)).to_pandas()
            df = df.sort_values(["user_id", "ts_us", "event_id"])
            df = df.groupby("user_id", sort=False).tail(1)
            u = df["user_id"].to_numpy(np.int64)
            b = (((u.astype(np.uint64) * _MIX) >> np.uint64(48))
                 .astype(np.int64)) % n_buckets
            df.insert(0, "bucket", b)
            return pa.Table.from_pandas(df, preserve_index=False)

        def bucket_latest(g: pa.Table) -> pa.Table:
            # last row per user after the (user, ts, eid) total-order
            # sort == segment-end take, exact
            g = g.sort_by([("user_id", "ascending"),
                           ("ts_us", "ascending"),
                           ("event_id", "ascending")])
            u = g.column("user_id").cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
            ends = np.r_[np.flatnonzero(u[1:] != u[:-1]),
                         u.size - 1]
            return g.take(pa.array(ends, type=pa.int64())).select(
                ["user_id", "ts_us", "event_id", "event_type",
                 "cents"]
            )

        ds = (
            read_cols(sf_dir, "events", ["user_id", "ts", "event_id", "event_type",
                         "value"])
            .map_batches(partial, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(bucket_latest, batch_format="pyarrow")
        )
        return _cast(
            ds,
            {"user_id": pa.int64(), "ts_us": pa.int64(),
             "event_id": pa.int64(), "event_type": pa.string(),
             "cents": pa.int64()},
        )

    sql = f"""
    SELECT CAST(user_id AS BIGINT) AS user_id,
           CAST(epoch_us(ts) AS BIGINT) AS ts_us,
           CAST(event_id AS BIGINT) AS event_id,
           event_type,
           CAST(round_even(value * 100, 0) AS BIGINT) AS cents
    FROM (
        SELECT *, row_number() OVER (
                      PARTITION BY user_id
                      ORDER BY epoch_us(ts) DESC,
                               event_id DESC) AS rn
        FROM events WHERE epoch_us(ts) <= {cutoff_us}
    ) WHERE rn = 1
    """
    return q, sql


def build_wave53_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("events_dow_hod_profile",) + _dow_hod_query()))
    add(*(("doc_max_jump",) + _max_jump_query()))
    add(*(("events_time_travel_state",) + _time_travel_query()))
    return queries, oracles
