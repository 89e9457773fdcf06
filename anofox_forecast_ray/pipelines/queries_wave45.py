"""Wave-45 queries: Burrows' Delta stylometry and log2 gap histograms.

- corpus_burrows_delta: the classic stylometric distance between
  sources — z-scores of per-source relative token frequencies against
  the across-source mean/std per token, Delta(a,b) = mean_t
  |z_at - z_bt|. Every stage follows the repo's float-fold discipline:
  relative frequencies are single divisions of exact ints; per-token
  mean and variance are sequential folds over sources in source order
  (two-pass); the final Delta folds over tokens in token order. The
  oracle replays each fold with an ordered list_reduce.
- events_gap_log2_histogram: inter-event gap distribution in log2
  buckets — bucket = bit length of the gap in seconds, computed
  EXACTLY on both sides (searchsorted over powers of two in the
  engine, length(printf('%b', gap)) in DuckDB) so power-of-two
  boundary gaps cannot mis-bucket the way floor(log2(x)) would.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from .queries import SQL_TOK, _num_read_blocks, corpus_ds
from ._scaffold import read_cols
from .queries_ext import _add_user_bucket


# ------------------------------------------------------ corpus_burrows_delta
def _burrows_query():
    def q(sf_dir: str):
        from ..stages.rollup import _flat_tokens
        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            empty = pa.table(
                {"source": pa.array([], type=pa.string()),
                 "token": pa.array([], type=pa.int64()),
                 "cnt": pa.array([], type=pa.int64())}
            )
            if "tokens" not in t.column_names:
                return empty
            values, lengths = _flat_tokens(t)
            if values.size == 0:
                return empty
            src_names, src_code = np.unique(
                np.asarray(t.column("source").to_pylist()),
                return_inverse=True,
            )
            rep = np.repeat(src_code.astype(np.int64),
                            lengths.astype(np.int64))
            key = rep * (1 << 21) + values.astype(np.int64)
            uk, uc = np.unique(key, return_counts=True)
            return pa.table(
                {"source": pa.array(src_names[uk >> 21],
                                    type=pa.string()),
                 "token": pa.array(uk & ((1 << 21) - 1)),
                 "cnt": pa.array(uc.astype(np.int64))}
            )

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by(["source", "token"]).aggregate(
                [("cnt", "sum")]
            )
            return pa.table(
                {"source": g.column("source"),
                 "token": g.column("token"),
                 "cnt": g.column("cnt_sum").cast(pa.int64())}
            )

        refs = list(
            corpus_ds(sf_dir)
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        hp = tree_reduce_tables(refs, merge).to_pandas()
        sources = sorted(hp["source"].unique())
        tokens = sorted(hp["token"].unique())
        totals = hp.groupby("source")["cnt"].sum().to_dict()
        cnt = {(r.source, int(r.token)): int(r.cnt)
               for r in hp.itertuples()}
        ns = len(sources)
        # relative frequency: ONE division of exact ints
        f = {
            (s, t): float(cnt.get((s, t), 0)) / float(totals[s])
            for s in sources for t in tokens
        }
        mean, std = {}, {}
        for t in tokens:
            m = 0.0  # fold over sources in source order
            for s in sources:
                m = m + f[(s, t)]
            m = m / float(ns)
            v = 0.0
            for s in sources:
                d = f[(s, t)] - m
                v = v + d * d
            v = v / float(ns)
            mean[t] = m
            std[t] = math.sqrt(v)
        rows = {"source_a": [], "source_b": [], "delta": []}
        for i, a in enumerate(sources):
            for b in sources[i + 1:]:
                dsum = 0.0  # fold over tokens in token order
                for t in tokens:
                    za = (f[(a, t)] - mean[t]) / std[t]
                    zb = (f[(b, t)] - mean[t]) / std[t]
                    dsum = dsum + abs(za - zb)
                rows["source_a"].append(a)
                rows["source_b"].append(b)
                rows["delta"].append(dsum / float(len(tokens)))
        return pa.table(
            {"source_a": pa.array(rows["source_a"],
                                  type=pa.string()),
             "source_b": pa.array(rows["source_b"],
                                  type=pa.string()),
             "delta": pa.array(rows["delta"], type=pa.float64())}
        )

    sql = f"""
    WITH tok AS ({SQL_TOK}),
    c AS (
        SELECT source, token, CAST(count(*) AS BIGINT) AS cnt
        FROM tok GROUP BY source, token
    ),
    tot AS (
        SELECT source, CAST(sum(cnt) AS BIGINT) AS total FROM c
        GROUP BY source
    ),
    srcs AS (SELECT DISTINCT source FROM c),
    toks AS (SELECT DISTINCT token FROM c),
    ns AS (SELECT CAST(count(*) AS BIGINT) AS ns FROM srcs),
    nt AS (SELECT CAST(count(*) AS BIGINT) AS nt FROM toks),
    f AS (
        SELECT s.source, k.token,
               CAST(COALESCE(c.cnt, 0) AS DOUBLE)
                   / CAST(t.total AS DOUBLE) AS f
        FROM srcs s CROSS JOIN toks k
        JOIN tot t ON t.source = s.source
        LEFT JOIN c ON c.source = s.source AND c.token = k.token
    ),
    m AS (
        SELECT token,
               list_reduce(
                   list_prepend(CAST(0.0 AS DOUBLE),
                       list(f ORDER BY source)),
                   (a, b) -> a + b) / CAST(ns.ns AS DOUBLE) AS mean
        FROM f CROSS JOIN ns GROUP BY token, ns.ns
    ),
    v AS (
        SELECT f.token,
               sqrt(list_reduce(
                   list_prepend(CAST(0.0 AS DOUBLE),
                       list((f.f - m.mean) * (f.f - m.mean)
                            ORDER BY f.source)),
                   (a, b) -> a + b) / CAST(ns.ns AS DOUBLE)) AS std
        FROM f JOIN m ON m.token = f.token
        CROSS JOIN ns
        GROUP BY f.token, ns.ns
    ),
    z AS (
        SELECT f.source, f.token,
               (f.f - m.mean) / v.std AS z
        FROM f JOIN m ON m.token = f.token
        JOIN v ON v.token = f.token
    ),
    pairs AS (
        SELECT a.source AS source_a, b.source AS source_b,
               a.token, abs(a.z - b.z) AS dz
        FROM z a JOIN z b
          ON a.token = b.token AND a.source < b.source
    )
    SELECT source_a, source_b,
           list_reduce(
               list_prepend(CAST(0.0 AS DOUBLE),
                   list(dz ORDER BY token)),
               (a, b) -> a + b) / CAST(nt.nt AS DOUBLE) AS delta
    FROM pairs CROSS JOIN nt
    GROUP BY source_a, source_b, nt.nt
    """
    return q, sql


# ------------------------------------------------ events_gap_log2_histogram
def _gap_log2_query():
    def q(sf_dir: str):
        import pandas as pd
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def prep(t: pa.Table) -> pa.Table:
            tus = t.column("ts").cast(pa.int64())
            return pa.table(
                {"user_id": t.column("user_id"),
                 "tus": tus,
                 "tss": pa.array(
                     tus.to_numpy(zero_copy_only=False)
                     // 1_000_000),
                 "event_id": t.column("event_id").cast(pa.int64())}
            )

        POW2 = (np.int64(1) << np.arange(40, dtype=np.int64))

        def gaps(g: pa.Table) -> pa.Table:
            g = g.sort_by([("user_id", "ascending"),
                           ("tus", "ascending"),
                           ("event_id", "ascending")])
            users = g.column("user_id").cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
            tss = g.column("tss").to_numpy(zero_copy_only=False)
            dt = np.diff(tss)
            same = users[1:] == users[:-1]
            dt = dt[same]
            dt = dt[dt > 0]
            # bucket = bit length of the gap (exact integer)
            b = np.searchsorted(POW2, dt, side="right").astype(
                np.int64
            )
            ub, uc = np.unique(b, return_counts=True)
            # sentinel keeps tree-reduce inputs non-empty
            return pa.table(
                {"bucket": pa.array(np.r_[ub, -1]),
                 "cnt": pa.array(
                     np.r_[uc.astype(np.int64), 0])}
            )

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by("bucket").aggregate([("cnt", "sum")])
            return pa.table(
                {"bucket": g.column("bucket"),
                 "cnt": g.column("cnt_sum").cast(pa.int64())}
            )

        refs = list(
            read_cols(sf_dir, "events", ["user_id", "ts", "event_id"])
            .map_batches(prep, batch_format="pyarrow")
            .map_batches(_add_user_bucket, batch_format="pyarrow")
            .groupby("__bucket")
            .map_groups(gaps, batch_format="pyarrow")
            .to_arrow_refs()
        )
        a = tree_reduce_tables(refs, merge).to_pandas()
        a = a[a["bucket"] >= 0].sort_values("bucket")
        return pa.table(
            {"bucket": pa.array(a["bucket"].to_numpy(np.int64)),
             "cnt": pa.array(a["cnt"].to_numpy(np.int64))}
        )

    sql = """
    WITH e AS (
        SELECT user_id, epoch_us(ts) // 1000000 AS tss,
               lead(epoch_us(ts) // 1000000) OVER (
                   PARTITION BY user_id
                   ORDER BY epoch_us(ts), event_id) AS nxt
        FROM events
    ),
    g AS (
        SELECT nxt - tss AS gap FROM e
        WHERE nxt IS NOT NULL AND nxt - tss > 0
    )
    SELECT CAST(length(printf('%b', gap)) AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS cnt
    FROM g GROUP BY 1
    """
    return q, sql


def build_wave45_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("corpus_burrows_delta",) + _burrows_query()))
    add(*(("events_gap_log2_histogram",) + _gap_log2_query()))
    return queries, oracles
