"""Wave-90 queries: inter-order cadence, weekly profile stability,
and sign-sketch fidelity.

- orders_interorder_median: repeat-purchase cadence — the median and
  P90 of per-customer inter-order gaps in days, taken as LOWER
  nearest-rank order stats from the bounded day-gap HISTOGRAM
  (gaps are small ints; the distributed sort is a histogram
  tree-reduce, never a row sort — the wave-64 Levene discipline).
- events_week_profile_stability: cosine similarity of the hour-of-
  week activity profile between consecutive weeks (the seasonality-
  stability monitor): bounded (week, how) integer cells; per
  week-pair cosine folds over the 168 hour slots in slot order.
- embedding_signsketch_fidelity: 1-bit (sign) sketch fidelity — for
  the 496 pairs among the 32 lowest vec_ids, the integer Hamming
  distance between sign vectors next to the exact cosine (dim-
  ordered folds), plus the corpus Pearson correlation between the
  two across pairs (folded in (a, b) order). Measures how much
  angular information survives 1-bit quantization.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from .queries import _cast, _num_read_blocks
from ._scaffold import read_cols

SK_NVEC = 32


# --------------------------------------------------- orders_interorder_median
def _interorder_query():
    def q(sf_dir: str):
        import pandas as pd
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables
        from .queries_ext import _add_user_bucket

        def prep(t: pa.Table) -> pa.Table:
            return pa.table({
                "user_id": t.column("o_custkey").cast(pa.int64()),
                "day": (t.column("o_orderdate").cast(pa.int64())
                        .to_numpy(zero_copy_only=False)
                        // 86_400_000_000),
                "okey": t.column("o_orderkey").cast(pa.int64()),
            })

        def gaps(g: pa.Table) -> pa.Table:
            g = g.sort_by([("user_id", "ascending"),
                           ("day", "ascending"),
                           ("okey", "ascending")])
            users = g.column("user_id").cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
            day = g.column("day").to_numpy(zero_copy_only=False)
            same = users[1:] == users[:-1]
            gp = (day[1:] - day[:-1])[same]
            uk, cnt = np.unique(gp, return_counts=True)
            return pa.table({
                "gap": pa.array(np.r_[uk, np.int64(-1)]),
                "cnt": pa.array(np.r_[cnt.astype(np.int64),
                                      np.int64(0)]),
            })

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by("gap").aggregate([("cnt", "sum")])
            return pa.table({
                "gap": g.column("gap").cast(pa.int64()),
                "cnt": g.column("cnt_sum").cast(pa.int64()),
            })

        refs = list(
            read_cols(sf_dir, "orders", ["o_custkey", "o_orderdate",
                         "o_orderkey"])
            .map_batches(prep, batch_format="pyarrow")
            .map_batches(_add_user_bucket, batch_format="pyarrow")
            .groupby("__bucket")
            .map_groups(gaps, batch_format="pyarrow")
            .to_arrow_refs()
        )
        h = tree_reduce_tables(refs, merge).to_pandas()
        h = h[(h["gap"] >= 0) & (h["cnt"] > 0)].sort_values(
            "gap").reset_index(drop=True)
        n = int(h["cnt"].sum())
        cum = h["cnt"].cumsum().to_numpy(np.int64)
        vals = h["gap"].to_numpy(np.int64)

        def rank_stat(q100: int) -> int:
            # LOWER nearest rank at index floor((n-1)*q/100)
            target = (n - 1) * q100 // 100
            return int(vals[np.searchsorted(cum, target + 1)])

        return pa.table({
            "n_gaps": pa.array([n], type=pa.int64()),
            "median_days": pa.array([rank_stat(50)],
                                    type=pa.int64()),
            "p90_days": pa.array([rank_stat(90)],
                                 type=pa.int64()),
        })

    sql = """
    WITH o AS (
        SELECT o_custkey,
               epoch_us(o_orderdate) // 86400000000 AS day,
               o_orderkey
        FROM orders
    ),
    g AS (
        SELECT day - lag(day) OVER (PARTITION BY o_custkey
                                    ORDER BY day, o_orderkey)
                   AS gap
        FROM o
    ),
    v AS (SELECT gap FROM g WHERE gap IS NOT NULL),
    r AS (
        SELECT gap,
               row_number() OVER (ORDER BY gap) AS rn,
               CAST(count(*) OVER () AS BIGINT) AS n
        FROM v
    )
    SELECT CAST(max(n) AS BIGINT) AS n_gaps,
           CAST(max(CASE WHEN rn = (n - 1) * 50 // 100 + 1
                    THEN gap END) AS BIGINT) AS median_days,
           CAST(max(CASE WHEN rn = (n - 1) * 90 // 100 + 1
                    THEN gap END) AS BIGINT) AS p90_days
    FROM r
    """
    return q, sql


# ---------------------------------------------- events_week_profile_stability
def _week_profile_query():
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            if "ts" not in t.column_names or t.num_rows == 0:
                return pa.table({
                    "week": pa.array([], type=pa.int64()),
                    "how": pa.array([], type=pa.int64()),
                    "cnt": pa.array([], type=pa.int64()),
                })
            tus = t.column("ts").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            hour = tus // 3_600_000_000
            week = hour // 168
            how = hour % 168
            key = week * 1000 + how
            uk, cnt = np.unique(key, return_counts=True)
            return pa.table({
                "week": pa.array(uk // 1000),
                "how": pa.array(uk % 1000),
                "cnt": pa.array(cnt.astype(np.int64)),
            })

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by(["week", "how"]).aggregate(
                [("cnt", "sum")])
            return pa.table({
                "week": g.column("week").cast(pa.int64()),
                "how": g.column("how").cast(pa.int64()),
                "cnt": g.column("cnt_sum").cast(pa.int64()),
            })

        refs = list(
            read_cols(sf_dir, "events", ["ts"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        a = tree_reduce_tables(refs, merge).to_pandas()
        weeks = sorted(a["week"].unique())
        prof = {}
        for w, grp in a.groupby("week"):
            v = np.zeros(168, dtype=np.int64)
            v[grp["how"].to_numpy(np.int64)] = (
                grp["cnt"].to_numpy(np.int64))
            prof[int(w)] = v
        out_w, out_c = [], []
        for w1, w2 in zip(weeks, weeks[1:]):
            va, vb = prof[int(w1)], prof[int(w2)]
            # integer dot/norms: order-free exact
            dot = int((va * vb).sum())
            na = int((va * va).sum())
            nb = int((vb * vb).sum())
            cos = (float(dot)
                   / (math.sqrt(float(na))
                      * math.sqrt(float(nb)))
                   if na > 0 and nb > 0 else 0.0)
            out_w.append(int(w2))
            out_c.append(cos)
        w0 = int(weeks[0])
        return pa.table({
            "week_idx": pa.array(
                [w - w0 for w in out_w], type=pa.int64()),
            "cosine_prev": pa.array(out_c, type=pa.float64()),
        })

    sql = """
    WITH e AS (
        SELECT epoch_us(ts) // 3600000000 AS hour FROM events
    ),
    c AS (
        SELECT hour // 168 AS week, hour % 168 AS how,
               CAST(count(*) AS BIGINT) AS cnt
        FROM e GROUP BY week, how
    ),
    pairs AS (
        SELECT a.week AS w1, b.week AS w2,
               CAST(sum(a.cnt * b.cnt) AS BIGINT) AS dot
        FROM c a JOIN c b
          ON b.week = a.week + 1 AND b.how = a.how
        GROUP BY a.week, b.week
    ),
    norms AS (
        SELECT week, CAST(sum(cnt * cnt) AS BIGINT) AS nn
        FROM c GROUP BY week
    ),
    w0 AS (SELECT min(week) AS w0 FROM c)
    SELECT CAST(p.w2 - (SELECT w0 FROM w0) AS BIGINT)
               AS week_idx,
           CAST(p.dot AS DOUBLE)
               / (sqrt(CAST(na.nn AS DOUBLE))
                  * sqrt(CAST(nb.nn AS DOUBLE))) AS cosine_prev
    FROM pairs p
    JOIN norms na ON na.week = p.w1
    JOIN norms nb ON nb.week = p.w2
    """
    return q, sql


# ---------------------------------------------- embedding_signsketch_fidelity
def _signsketch_query(nvec: int = SK_NVEC):
    def q(sf_dir: str):
        import pyarrow.parquet as pq

        from ..extras.ann import _to_matrix

        head = pq.read_table(
            f"{sf_dir}/embeddings.parquet",
            columns=["vec_id", "embedding"])
        vid = head.column("vec_id").to_numpy(zero_copy_only=False)
        order = np.argsort(vid)[:nvec]
        ids = vid[order]
        x = _to_matrix(head.column("embedding"))[order]
        signs = x >= 0
        out_a, out_b, out_h, out_c = [], [], [], []
        for i in range(nvec):
            for j in range(i + 1, nvec):
                ham = int((signs[i] != signs[j]).sum())
                dot = float(np.cumsum(x[i] * x[j])[-1])
                ni = float(np.cumsum(x[i] * x[i])[-1])
                nj = float(np.cumsum(x[j] * x[j])[-1])
                cos = dot / (math.sqrt(ni) * math.sqrt(nj))
                out_a.append(int(ids[i]))
                out_b.append(int(ids[j]))
                out_h.append(ham)
                out_c.append(cos)
        # Pearson between hamming (int) and cosine across pairs,
        # folded in (a, b) order
        n = sx = sy = sxx = syy = sxy = 0.0
        for h, c in zip(out_h, out_c):
            hf = float(h)
            n = n + 1.0
            sx = sx + hf
            sy = sy + c
            sxx = sxx + hf * hf
            syy = syy + c * c
            sxy = sxy + hf * c
        num = n * sxy - sx * sy
        den = math.sqrt((n * sxx - sx * sx)
                        * (n * syy - sy * sy))
        corr = num / den if den > 0 else 0.0
        return pa.table({
            "vec_a": pa.array(out_a, type=pa.int64()),
            "vec_b": pa.array(out_b, type=pa.int64()),
            "hamming": pa.array(out_h, type=pa.int64()),
            "cosine": pa.array(out_c, type=pa.float64()),
            "fidelity_corr": pa.array(
                [corr] * len(out_a), type=pa.float64()),
        })

    fold = "(acc, x) -> acc + x"
    sql = f"""
    WITH sel AS (
        SELECT vec_id, embedding
        FROM embeddings ORDER BY vec_id LIMIT {nvec}
    ),
    pairs AS (
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
               (SELECT CAST(sum(CASE WHEN
                    (CAST(a.embedding[d] AS DOUBLE) >= 0)
                    <> (CAST(b.embedding[d] AS DOUBLE) >= 0)
                    THEN 1 ELSE 0 END) AS BIGINT)
                FROM unnest(generate_series(1,
                    len(a.embedding))) AS t(d)) AS hamming,
               list_reduce(list_prepend(0.0e0, list_transform(
                   generate_series(1, len(a.embedding)),
                   d -> CAST(a.embedding[d] AS DOUBLE)
                        * CAST(b.embedding[d] AS DOUBLE))),
                   {fold})
               / (sqrt(list_reduce(list_prepend(0.0e0,
                      list_transform(
                          generate_series(1, len(a.embedding)),
                          d -> CAST(a.embedding[d] AS DOUBLE)
                               * CAST(a.embedding[d]
                                      AS DOUBLE))), {fold}))
                  * sqrt(list_reduce(list_prepend(0.0e0,
                      list_transform(
                          generate_series(1, len(b.embedding)),
                          d -> CAST(b.embedding[d] AS DOUBLE)
                               * CAST(b.embedding[d]
                                      AS DOUBLE))), {fold})))
                   AS cosine
        FROM sel a JOIN sel b ON a.vec_id < b.vec_id
    ),
    f AS (
        SELECT list_reduce(
            list_prepend([0.0e0, 0.0e0, 0.0e0, 0.0e0, 0.0e0,
                          0.0e0],
                list([CAST(hamming AS DOUBLE), cosine]
                     ORDER BY vec_a, vec_b)),
            (acc, e) -> [
                acc[1] + 1.0e0,
                acc[2] + e[1],
                acc[3] + e[2],
                acc[4] + e[1] * e[1],
                acc[5] + e[2] * e[2],
                acc[6] + e[1] * e[2]]) AS v
        FROM pairs
    )
    SELECT p.vec_a, p.vec_b, p.hamming, p.cosine,
           CASE WHEN (f.v[1] * f.v[4] - f.v[2] * f.v[2])
                     * (f.v[1] * f.v[5] - f.v[3] * f.v[3]) > 0
                THEN (f.v[1] * f.v[6] - f.v[2] * f.v[3])
                     / sqrt((f.v[1] * f.v[4] - f.v[2] * f.v[2])
                            * (f.v[1] * f.v[5]
                               - f.v[3] * f.v[3]))
                ELSE 0.0e0 END AS fidelity_corr
    FROM pairs p CROSS JOIN f
    """
    return q, sql


def build_wave90_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("orders_interorder_median",) + _interorder_query()))
    add(*(("events_week_profile_stability",)
          + _week_profile_query()))
    add(*(("embedding_signsketch_fidelity",)
          + _signsketch_query()))
    return queries, oracles
