"""Wave-31 queries: inter-event burstiness, funnel latency quantiles,
embedding per-dimension statistics, and edit-distance-verified near-dup
pairs.

- events_burstiness: per-user burstiness index B = (s-m)/(s+m) over
  inter-event gaps (Goh & Barabasi 2008). Gaps reduce to exact int64
  (k, sum_dt, sum_dt2) inside the user-bucket kernel; s/m and B are the
  IDENTICAL f64 expression on both sides (np.sqrt is IEEE-exact, so the
  vectorized engine matches DuckDB's scalar sqrt bitwise).
- events_funnel_latency: quartiles of first-view -> first-purchase
  latency. Per-block (user, min view ts, min purchase ts) partials
  collapse before the shuffle; the delta stream feeds the existing
  exact-quantile machinery (two-pass bucketed counts, no global sort).
- embedding_dim_stats: per-dimension count/mean/variance of the vector
  table in exact integer micro-units (round_even(x*1e6)) so the sums
  are order-free int64 and survive resharding; mean/var are the same
  f64 expressions both sides. Bounded (dim) partials, zero shuffle.
- dedup_minhash_verified: the VERIFY stage of the LSH dedup pipeline —
  exact Levenshtein distance over the bounded candidate-pair set from
  extras/dedup.minhash_candidate_pairs. Pair texts are gathered with a
  filtered scan (candidates are bounded by the LSH cap), the DP runs on
  the driver; sim = 1 - lev/max_len as one f64 division.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .queries import _cast, _num_read_blocks
from ._scaffold import read_cols
from .queries_ext import _add_user_bucket

VIEW, PURCHASE = "view", "purchase"


# ------------------------------------------------------ events_burstiness
def _burstiness_query():
    def q(sf_dir: str):
        import pandas as pd
        import ray.data as rd

        def prep(t: pa.Table) -> pa.Table:
            # gap VALUES in whole seconds (µs gaps squared can overflow
            # int64 for month-long gaps); ordering stays µs-exact
            tus = t.column("ts").cast(pa.int64())
            return pa.table(
                {"user_id": t.column("user_id"),
                 "tus": tus,
                 "tss": pa.array(
                     tus.to_numpy(zero_copy_only=False) // 1_000_000),
                 "event_id": t.column("event_id").cast(pa.int64())}
            )

        def bucket_stats(g: pa.Table) -> pa.Table:
            g = g.sort_by([("user_id", "ascending"),
                           ("tus", "ascending"),
                           ("event_id", "ascending")])
            users = g.column("user_id").cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
            tus = g.column("tss").to_numpy(zero_copy_only=False)
            dt = np.diff(tus)
            same = users[1:] == users[:-1]
            dt = np.where(same, dt, 0)
            starts = np.flatnonzero(
                np.r_[True, users[1:] != users[:-1]]
            )
            k = np.diff(np.r_[starts, users.size]) - 1
            # per-user gap sums via reduceat over the masked diffs
            seg = np.r_[starts, users.size - 1]
            sum_dt = np.add.reduceat(
                np.r_[dt, 0].astype(np.int64), starts
            )
            sum_dt2 = np.add.reduceat(
                (np.r_[dt, 0].astype(np.int64)) ** 2, starts
            )
            del seg
            keep = (k >= 2) & (sum_dt > 0)
            uid = users[starts][keep]
            kk = k[keep].astype(np.int64)
            s1 = sum_dt[keep]
            s2 = sum_dt2[keep]
            m1 = s1.astype(np.float64) / kk.astype(np.float64)
            sig = np.sqrt(
                s2.astype(np.float64) / kk.astype(np.float64)
                - m1 * m1
            )
            burst = (sig - m1) / (sig + m1)
            return pa.table(
                {"user_id": pa.array(uid, type=pa.int64()),
                 "k": pa.array(kk), "sum_dt": pa.array(s1),
                 "sum_dt2": pa.array(s2),
                 "burstiness": pa.array(burst, type=pa.float64())}
            )

        ds = (
            read_cols(sf_dir, "events", ["user_id", "ts", "event_id"])
            .map_batches(prep, batch_format="pyarrow")
            .map_batches(_add_user_bucket, batch_format="pyarrow")
            .groupby("__bucket")
            .map_groups(bucket_stats, batch_format="pyarrow")
        )
        return _cast(
            ds,
            {"user_id": pa.int64(), "k": pa.int64(),
             "sum_dt": pa.int64(), "sum_dt2": pa.int64(),
             "burstiness": pa.float64()},
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
        SELECT user_id,
               CAST(count(nxt) AS BIGINT) AS k,
               CAST(sum(nxt - tss) AS BIGINT) AS sum_dt,
               CAST(sum((nxt - tss) * (nxt - tss)) AS BIGINT)
                   AS sum_dt2
        FROM e WHERE nxt IS NOT NULL
        GROUP BY user_id
        HAVING count(nxt) >= 2 AND sum(nxt - tss) > 0
    )
    SELECT user_id, k, sum_dt, sum_dt2,
           (sqrt(CAST(sum_dt2 AS DOUBLE) / CAST(k AS DOUBLE)
                 - (CAST(sum_dt AS DOUBLE) / CAST(k AS DOUBLE))
                   * (CAST(sum_dt AS DOUBLE) / CAST(k AS DOUBLE)))
            - CAST(sum_dt AS DOUBLE) / CAST(k AS DOUBLE))
           / (sqrt(CAST(sum_dt2 AS DOUBLE) / CAST(k AS DOUBLE)
                   - (CAST(sum_dt AS DOUBLE) / CAST(k AS DOUBLE))
                     * (CAST(sum_dt AS DOUBLE) / CAST(k AS DOUBLE)))
              + CAST(sum_dt AS DOUBLE) / CAST(k AS DOUBLE))
               AS burstiness
    FROM g
    """
    return q, sql


# --------------------------------------------------- events_funnel_latency
def _funnel_latency_query():
    def q(sf_dir: str):
        import pandas as pd
        import ray.data as rd

        from ..stages.quantile import exact_quantiles

        def partial(t: pa.Table) -> pa.Table:
            empty = pa.table(
                {"user_id": pa.array([], type=pa.int64()),
                 "v": pa.array([], type=pa.int64()),
                 "p": pa.array([], type=pa.int64())}
            )
            if "user_id" not in t.column_names:
                return empty
            et = np.asarray(t.column("event_type").to_pylist())
            keep = (et == VIEW) | (et == PURCHASE)
            if not keep.any():
                return empty
            sub = pa.table(
                {"user_id": t.column("user_id").cast(pa.int64()),
                 "tus": t.column("ts").cast(pa.int64()),
                 "is_v": pa.array(
                     (et == VIEW).astype(np.int8), type=pa.int8())}
            ).filter(pa.array(keep))
            df = sub.to_pandas()
            BIG = np.int64(1) << 62
            df["v"] = np.where(df["is_v"] == 1, df["tus"], BIG)
            df["p"] = np.where(df["is_v"] == 0, df["tus"], BIG)
            a = (df.groupby("user_id")
                 .agg(v=("v", "min"), p=("p", "min")).reset_index())
            return pa.Table.from_pandas(a, preserve_index=False)

        def make_deltas():
            def merge_bucket(g: pa.Table) -> pa.Table:
                a = g.group_by("user_id").aggregate(
                    [("v", "min"), ("p", "min")]
                )
                BIG = np.int64(1) << 62
                v = a.column("v_min").to_numpy(zero_copy_only=False)
                p = a.column("p_min").to_numpy(zero_copy_only=False)
                ok = (v < BIG) & (p < BIG) & (p > v)
                return pa.table(
                    {"cents": pa.array((p - v)[ok].astype(np.int64))}
                )

            return (
                read_cols(sf_dir, "events", ["user_id", "ts", "event_type"])
                .map_batches(partial, batch_format="pyarrow")
                .map_batches(_add_user_bucket, batch_format="pyarrow")
                .groupby("__bucket")
                .map_groups(merge_bucket, batch_format="pyarrow")
            )

        tab = exact_quantiles(make_deltas, qs=(0.25, 0.5, 0.75))
        return pa.table(
            {"q": tab.column("q").cast(pa.float64()),
             "delta_us": tab.column("value").cast(pa.float64())}
        )

    sql = f"""
    WITH f AS (
        SELECT user_id,
               min(CASE WHEN event_type = '{VIEW}'
                        THEN epoch_us(ts) END) AS v,
               min(CASE WHEN event_type = '{PURCHASE}'
                        THEN epoch_us(ts) END) AS p
        FROM events GROUP BY user_id
    ),
    d AS (
        SELECT p - v AS delta FROM f
        WHERE v IS NOT NULL AND p IS NOT NULL AND p > v
    ),
    agg AS (
        SELECT quantile_cont(delta, [0.25, 0.5, 0.75]) AS vs FROM d
    )
    SELECT unnest([0.25, 0.5, 0.75]) AS q,
           CAST(unnest(vs) AS DOUBLE) AS delta_us
    FROM agg
    """
    return q, sql


# ----------------------------------------------------- embedding_dim_stats
def _dim_stats_query():
    def q(sf_dir: str):
        import ray.data as rd

        from ..extras.ann import _to_matrix
        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            empty = pa.table(
                {"dim": pa.array([], type=pa.int64()),
                 "cnt": pa.array([], type=pa.int64()),
                 "sum_m": pa.array([], type=pa.int64()),
                 "sum_m2": pa.array([], type=pa.int64())}
            )
            if "embedding" not in t.column_names:
                return empty
            mat = _to_matrix(t.column("embedding"))
            if mat.size == 0:
                return empty
            m = np.round(mat * 1_000_000.0).astype(np.int64)
            return pa.table(
                {"dim": pa.array(
                    np.arange(m.shape[1], dtype=np.int64)),
                 "cnt": pa.array(np.full(m.shape[1], m.shape[0],
                                         dtype=np.int64)),
                 "sum_m": pa.array(m.sum(axis=0)),
                 "sum_m2": pa.array((m * m).sum(axis=0))}
            )

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by("dim").aggregate(
                [("cnt", "sum"), ("sum_m", "sum"), ("sum_m2", "sum")]
            )
            return pa.table(
                {"dim": g.column("dim"),
                 "cnt": g.column("cnt_sum").cast(pa.int64()),
                 "sum_m": g.column("sum_m_sum").cast(pa.int64()),
                 "sum_m2": g.column("sum_m2_sum").cast(pa.int64())}
            )

        refs = list(
            read_cols(sf_dir, "embeddings", ["embedding"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        a = tree_reduce_tables(refs, merge).to_pandas().sort_values(
            "dim"
        )
        cnt = a["cnt"].to_numpy(np.int64)
        s1 = a["sum_m"].to_numpy(np.int64)
        s2 = a["sum_m2"].to_numpy(np.int64)
        mean = s1.astype(np.float64) / cnt.astype(np.float64)
        var = (s2.astype(np.float64) / cnt.astype(np.float64)
               - mean * mean)
        return pa.table(
            {"dim": pa.array(a["dim"].to_numpy(np.int64)),
             "cnt": pa.array(cnt),
             "sum_m": pa.array(s1), "sum_m2": pa.array(s2),
             "mean_m": pa.array(mean, type=pa.float64()),
             "var_m": pa.array(var, type=pa.float64())}
        )

    sql = """
    WITH u AS (
        SELECT generate_subscripts(embedding, 1) - 1 AS dim,
               CAST(round_even(
                   CAST(unnest(embedding) AS DOUBLE) * 1000000, 0)
                   AS BIGINT) AS m
        FROM embeddings
    ),
    g AS (
        SELECT CAST(dim AS BIGINT) AS dim,
               CAST(count(*) AS BIGINT) AS cnt,
               CAST(sum(m) AS BIGINT) AS sum_m,
               CAST(sum(m * m) AS BIGINT) AS sum_m2
        FROM u GROUP BY dim
    )
    SELECT dim, cnt, sum_m, sum_m2,
           CAST(sum_m AS DOUBLE) / CAST(cnt AS DOUBLE) AS mean_m,
           CAST(sum_m2 AS DOUBLE) / CAST(cnt AS DOUBLE)
               - (CAST(sum_m AS DOUBLE) / CAST(cnt AS DOUBLE))
                 * (CAST(sum_m AS DOUBLE) / CAST(cnt AS DOUBLE))
               AS var_m
    FROM g
    """
    return q, sql


# ------------------------------------------------- dedup_minhash_verified
def _levenshtein(a: str, b: str) -> int:
    """Unit-cost edit distance, two-row DP vectorized over the inner
    loop (matches DuckDB levenshtein)."""
    if a == b:
        return 0
    if not a:
        return len(b)
    if not b:
        return len(a)
    ca = np.frombuffer(a.encode("utf-32-le"), dtype="<u4")
    cb = np.frombuffer(b.encode("utf-32-le"), dtype="<u4")
    prev = np.arange(cb.size + 1, dtype=np.int64)
    cur = np.empty_like(prev)
    for i in range(ca.size):
        cur[0] = i + 1
        sub = prev[:-1] + (cb != ca[i])
        # cur[j] = min(sub[j-1], prev[j]+1, cur[j-1]+1) — the cur[j-1]
        # dependency needs a running minimum scan
        best = np.minimum(sub, prev[1:] + 1)
        run = cur[0]
        for j in range(cb.size):  # small candidate set; exactness first
            run = min(best[j], run + 1)
            cur[j + 1] = run
        prev, cur = cur, prev
    return int(prev[-1])


def _minhash_verified_query():
    def q(sf_dir: str):
        import ray.data as rd

        from ..extras.dedup import minhash_candidate_pairs

        docs = read_cols(sf_dir, "documents", ["doc_id", "text"])
        pairs = minhash_candidate_pairs(
            docs, threshold=0.5, max_bucket=None, shuffle_partitions=8
        ).to_pandas()  # bounded by the LSH bucket cap
        ids = sorted(
            set(pairs["doc_a"]).union(pairs["doc_b"])
        )
        idset = set(ids)

        def gather(t: pa.Table) -> pa.Table:
            dd = t.column("doc_id").cast(pa.string()).to_pylist()
            keep = np.fromiter((d in idset for d in dd), dtype=bool,
                               count=len(dd))
            return pa.table(
                {"doc_id": pa.array(
                    [d for d, k in zip(dd, keep) if k],
                    type=pa.string()),
                 "text": pa.array(
                     [x for x, k in zip(
                         t.column("text").to_pylist(), keep) if k],
                     type=pa.string())}
            )

        import ray

        trefs = list(
            read_cols(sf_dir, "documents", ["doc_id", "text"]).map_batches(gather, batch_format="pyarrow")
            .to_arrow_refs()
        )
        tt = pa.concat_tables(ray.get(trefs))
        texts = dict(
            zip(tt.column("doc_id").to_pylist(),
                tt.column("text").to_pylist())
        )
        rows = {"doc_a": [], "doc_b": [], "lev": [], "sim": []}
        for r in pairs.sort_values(["doc_a", "doc_b"]).itertuples():
            a, b = texts[r.doc_a], texts[r.doc_b]
            d = _levenshtein(a, b)
            mx = max(len(a), len(b))
            rows["doc_a"].append(r.doc_a)
            rows["doc_b"].append(r.doc_b)
            rows["lev"].append(d)
            rows["sim"].append(
                1.0 - float(d) / float(mx) if mx else 1.0
            )
        return pa.table(
            {"doc_a": pa.array(rows["doc_a"], type=pa.string()),
             "doc_b": pa.array(rows["doc_b"], type=pa.string()),
             "lev": pa.array(rows["lev"], type=pa.int64()),
             "sim": pa.array(rows["sim"], type=pa.float64())}
        )

    from ..extras.dedup import minhash_pairs_sql

    base = minhash_pairs_sql(threshold=0.5)
    sql = f"""
    WITH pairs AS ({base})
    SELECT p.doc_a, p.doc_b,
           CAST(levenshtein(da.text, db.text) AS BIGINT) AS lev,
           CASE WHEN greatest(length(da.text), length(db.text)) = 0
                THEN 1.0
                ELSE 1.0 - CAST(levenshtein(da.text, db.text)
                                AS DOUBLE)
                     / CAST(greatest(length(da.text),
                                     length(db.text)) AS DOUBLE)
           END AS sim
    FROM pairs p
    JOIN documents da ON CAST(da.doc_id AS VARCHAR) = p.doc_a
    JOIN documents db ON CAST(db.doc_id AS VARCHAR) = p.doc_b
    """
    return q, sql


def build_wave31_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("events_burstiness",) + _burstiness_query()))
    add(*(("events_funnel_latency",) + _funnel_latency_query()))
    add(*(("embedding_dim_stats",) + _dim_stats_query()))
    add(*(("dedup_minhash_verified",) + _minhash_verified_query()))
    return queries, oracles
