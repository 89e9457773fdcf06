"""Wave-152 queries: collocations by t-score, token-bucket limits.

- doc_collocations_t: Church & Hanks collocation extraction over
  the word stream — for adjacent word bigrams,
  t = (f_ab - f_a f_b / N) / sqrt(f_ab), the classic significance
  score that separates grammatical glue from real collocations.
  Word bigrams are complete per row (docs are rows), the (wa, wb)
  cell table is bounded by the small synthetic vocabulary, and the
  only float per cell is one expected-count division + one sqrt.
  Top-10 by (t desc, wa asc, wb asc).
- events_token_bucket: a token-bucket rate limiter replayed over
  the real arrival stream in pure int64 microseconds — cost per
  event = 2x the mean within-day gap (admitting at half the
  average rate), capacity = 10 costs (a burst of 10). Per
  day the bucket starts full (same drain-overnight convention as
  the Lindley queue); the fold is a 3-slot integer LIST
  accumulator [bucket, allowed, rejected].
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .queries import _num_read_blocks
from ._scaffold import read_cols

US_PER_DAY = 86_400_000_000
TB_BURST = 10  # capacity = TB_BURST * cost
COLL_K = 10


# -------------------------------------------------------- doc_collocations_t
def _collocation_query(k: int = COLL_K):
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "wa": pa.array([], type=pa.string()),
                "wb": pa.array([], type=pa.string()),
                "c": pa.array([], type=pa.int64()),
            })
            if "text" not in t.column_names or t.num_rows == 0:
                return empty
            import collections
            cnt = collections.Counter()
            for txt in t.column("text").to_pylist():
                words = txt.split(" ")
                for i in range(len(words) - 1):
                    cnt[(words[i], words[i + 1])] += 1
            keys = sorted(cnt)
            return pa.table({
                "wa": pa.array([x[0] for x in keys],
                               type=pa.string()),
                "wb": pa.array([x[1] for x in keys],
                               type=pa.string()),
                "c": pa.array([cnt[x] for x in keys],
                              type=pa.int64()),
            })

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by(["wa", "wb"]).aggregate(
                [("c", "sum")])
            return pa.table({
                "wa": g.column("wa").cast(pa.string()),
                "wb": g.column("wb").cast(pa.string()),
                "c": g.column("c_sum").cast(pa.int64()),
            })

        refs = list(
            read_cols(sf_dir, "documents", ["text"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        bg = tree_reduce_tables(refs, merge).to_pandas()
        n = int(bg["c"].sum())
        fa = bg.groupby("wa")["c"].sum()
        fb = bg.groupby("wb")["c"].sum()

        import math
        scored = []
        for _, r in bg.iterrows():
            f_ab = int(r["c"])
            f_a = int(fa.loc[r["wa"]])
            f_b = int(fb.loc[r["wb"]])
            e = (float(f_a) * float(f_b)) / float(n)
            t_sc = (float(f_ab) - e) / math.sqrt(float(f_ab))
            scored.append((t_sc, r["wa"], r["wb"], f_ab))
        scored.sort(key=lambda x: (-x[0], x[1], x[2]))
        top = scored[:k]
        return pa.table({
            "wa": pa.array([x[1] for x in top],
                           type=pa.string()),
            "wb": pa.array([x[2] for x in top],
                           type=pa.string()),
            "f_ab": pa.array([x[3] for x in top],
                             type=pa.int64()),
            "t_score": pa.array([x[0] for x in top],
                                type=pa.float64()),
        })

    sql = f"""
    WITH w AS (
        SELECT doc_id,
               generate_subscripts(string_split(text, ' '), 1)
                   AS pos,
               unnest(string_split(text, ' ')) AS word
        FROM documents
    ),
    bg AS (
        SELECT a.word AS wa, b.word AS wb,
               CAST(count(*) AS BIGINT) AS c
        FROM w a JOIN w b
          ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
        GROUP BY 1, 2
    ),
    nn AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM bg),
    fa AS (SELECT wa, CAST(sum(c) AS BIGINT) AS f
           FROM bg GROUP BY wa),
    fb AS (SELECT wb, CAST(sum(c) AS BIGINT) AS f
           FROM bg GROUP BY wb),
    scored AS (
        SELECT bg.wa, bg.wb, bg.c AS f_ab,
               (CAST(bg.c AS DOUBLE)
                - (CAST(fa.f AS DOUBLE)
                   * CAST(fb.f AS DOUBLE))
                  / CAST(nn.n AS DOUBLE))
               / sqrt(CAST(bg.c AS DOUBLE)) AS t_score
        FROM bg
        JOIN fa ON fa.wa = bg.wa
        JOIN fb ON fb.wb = bg.wb
        CROSS JOIN nn
    ),
    rk AS (
        SELECT *, row_number() OVER (
                   ORDER BY t_score DESC, wa ASC, wb ASC)
                   AS rn
        FROM scored
    )
    SELECT wa, wb, f_ab, t_score
    FROM rk WHERE rn <= {k}
    ORDER BY wa, wb
    """
    return q, sql


# -------------------------------------------------------- events_token_bucket
def _token_bucket_query(burst: int = TB_BURST):
    def q(sf_dir: str):
        import pandas as pd
        import ray
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def prep(t: pa.Table) -> pa.Table:
            tus = t.column("ts").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            return pa.table({
                "day": pa.array(
                    (tus // US_PER_DAY).astype(np.int64)),
                "tus": pa.array(tus),
            })

        def read():
            return read_cols(sf_dir, "events", ["ts"]).map_batches(prep, batch_format="pyarrow")

        def gap_stats(g: pa.Table) -> pa.Table:
            tus = np.sort(
                g.column("tus").to_numpy(zero_copy_only=False)
            )
            gaps = np.diff(tus)
            return pa.table({
                "s": pa.array([int(gaps.sum())],
                              type=pa.int64()),
                "c": pa.array([int(gaps.size)],
                              type=pa.int64()),
            })

        def sum_merge(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            return pa.table({
                "s": pa.array([pc.sum(t.column("s")).as_py()],
                              type=pa.int64()),
                "c": pa.array([pc.sum(t.column("c")).as_py()],
                              type=pa.int64()),
            })

        refs = list(
            read().groupby("day")
            .map_groups(gap_stats, batch_format="pyarrow")
            .to_arrow_refs()
        )
        gs = tree_reduce_tables(refs, sum_merge).to_pandas()
        cost = (int(gs["s"].iloc[0]) * 2) \
            // int(gs["c"].iloc[0])
        cap = burst * cost
        c_ref = ray.put((cost, cap))

        def day_bucket(g: pa.Table) -> pa.Table:
            cst, cap = ray.get(c_ref)
            tus = np.sort(
                g.column("tus").to_numpy(zero_copy_only=False)
            )
            bucket = cap
            allowed = 0
            rejected = 0
            prev = None
            for t_i in tus.tolist():
                if prev is not None:
                    bucket = bucket + (t_i - prev)
                    if bucket > cap:
                        bucket = cap
                prev = t_i
                if bucket >= cst:
                    bucket -= cst
                    allowed += 1
                else:
                    rejected += 1
            return pa.table({
                "n": pa.array([len(tus)], type=pa.int64()),
                "allowed": pa.array([allowed],
                                    type=pa.int64()),
                "rejected": pa.array([rejected],
                                     type=pa.int64()),
            })

        def merge(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            return pa.table({
                "n": pa.array([pc.sum(t.column("n")).as_py()],
                              type=pa.int64()),
                "allowed": pa.array(
                    [pc.sum(t.column("allowed")).as_py()],
                    type=pa.int64()),
                "rejected": pa.array(
                    [pc.sum(t.column("rejected")).as_py()],
                    type=pa.int64()),
            })

        refs = list(
            read().groupby("day")
            .map_groups(day_bucket, batch_format="pyarrow")
            .to_arrow_refs()
        )
        w = tree_reduce_tables(refs, merge).to_pandas()
        n = int(w["n"].iloc[0])
        al = int(w["allowed"].iloc[0])
        rj = int(w["rejected"].iloc[0])
        return pa.table({
            "n_events": pa.array([n], type=pa.int64()),
            "cost_us": pa.array([cost], type=pa.int64()),
            "allowed": pa.array([al], type=pa.int64()),
            "rejected": pa.array([rj], type=pa.int64()),
            "reject_rate": pa.array(
                [float(rj) / float(n)], type=pa.float64()),
        })

    sql = f"""
    WITH e AS (
        SELECT epoch_us(ts) // {US_PER_DAY} AS day,
               epoch_us(ts) AS tus
        FROM events
    ),
    gaps AS (
        SELECT day,
               tus - lag(tus) OVER (PARTITION BY day
                                    ORDER BY tus) AS g,
               tus
        FROM e
    ),
    cost AS (
        SELECT CAST(sum(g) AS BIGINT) * 2
                   // CAST(count(g) AS BIGINT) AS c,
               (CAST(sum(g) AS BIGINT) * 2
                   // CAST(count(g) AS BIGINT)) * {burst}
                   AS cap
        FROM gaps WHERE g IS NOT NULL
    ),
    perday AS (
        SELECT day,
               CAST(count(*) AS BIGINT) AS n,
               list_reduce(
                   list_prepend([cost.cap, 0, 0],
                       list_transform(
                           list(COALESCE(g, 0) ORDER BY tus),
                           v -> [CAST(v AS BIGINT), 0, 0])),
                   (acc, e2) -> [
                       CASE WHEN LEAST(cost.cap,
                                       acc[1] + e2[1])
                                 >= cost.c
                            THEN LEAST(cost.cap,
                                       acc[1] + e2[1])
                                 - cost.c
                            ELSE LEAST(cost.cap,
                                       acc[1] + e2[1])
                       END,
                       acc[2] + CASE WHEN
                           LEAST(cost.cap, acc[1] + e2[1])
                           >= cost.c THEN 1 ELSE 0 END,
                       acc[3] + CASE WHEN
                           LEAST(cost.cap, acc[1] + e2[1])
                           >= cost.c THEN 0 ELSE 1 END])
                   AS fin
        FROM gaps CROSS JOIN cost
        GROUP BY day, cost.c, cost.cap
    )
    SELECT CAST(sum(n) AS BIGINT) AS n_events,
           (SELECT c FROM cost) AS cost_us,
           CAST(sum(fin[2]) AS BIGINT) AS allowed,
           CAST(sum(fin[3]) AS BIGINT) AS rejected,
           CAST(sum(fin[3]) AS DOUBLE)
               / CAST(sum(n) AS DOUBLE) AS reject_rate
    FROM perday
    """
    return q, sql


def build_wave152_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("doc_collocations_t",) + _collocation_query()))
    add(*(("events_token_bucket",) + _token_bucket_query()))
    return queries, oracles
