"""Second query wave: per-doc token features, event-stream windowing
(rolling / session), ANN top-k, text stats — each with a DuckDB oracle
where expressible (same exactness discipline as pipelines.queries:
integer aggregates, power-of-two divisors for exact float division).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .queries import SQL_TOK, _cast, _num_read_blocks, corpus_docs, corpus_ds

N_USER_BUCKETS = 64


def _add_user_bucket(t: pa.Table, n_buckets: int = N_USER_BUCKETS) -> pa.Table:
    """Hash-bucket column over user_id: groupby('__bucket') keeps the
    single shuffle but replaces per-user pandas dispatch with ~n_buckets
    vectorized multi-group calls (kernels/groupfill)."""
    k = t.column("user_id").to_numpy(zero_copy_only=False)
    b = (k.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
         >> np.uint64(48)).astype(np.int64) % n_buckets
    return t.append_column("__bucket", pa.array(b))


def _doc_token_features_query():
    """Per-doc features over the token series — int-exact where possible.

    abs_energy / sum_abs_change are exact int64; count_above/below_mean
    compare ints against the exact double mean; mean_abs_change divides an
    exact int by (n-1).
    """

    def q(sf_dir: str):
        def feats(t: pa.Table) -> pa.Table:
            from ..stages.rollup import _flat_tokens

            values, lengths = _flat_tokens(t)
            v = values.astype(np.int64)
            starts = np.concatenate(([0], np.cumsum(lengths)))
            n = lengths.size
            out = {
                "doc_id": [], "n_tok": [], "abs_energy": [],
                "count_above_mean": [], "count_below_mean": [],
                "n_distinct": [], "sum_abs_change": [],
                "mean_abs_change": [],
            }
            ids = t.column("doc_id").to_pylist()
            for i in range(n):
                y = v[starts[i] : starts[i + 1]]
                if y.size == 0:
                    continue
                m = float(y.sum()) / y.size
                d = np.abs(np.diff(y))
                out["doc_id"].append(str(ids[i]))
                out["n_tok"].append(y.size)
                out["abs_energy"].append(int(np.dot(y, y)))
                out["count_above_mean"].append(int(np.sum(y > m)))
                out["count_below_mean"].append(int(np.sum(y < m)))
                out["n_distinct"].append(int(np.unique(y).size))
                out["sum_abs_change"].append(int(d.sum()))
                out["mean_abs_change"].append(
                    float(int(d.sum()) / (y.size - 1)) if y.size > 1 else 0.0
                )
            return pa.table(
                {
                    "doc_id": pa.array(out["doc_id"], type=pa.string()),
                    "n_tok": pa.array(out["n_tok"], type=pa.int64()),
                    "abs_energy": pa.array(out["abs_energy"], type=pa.int64()),
                    "count_above_mean": pa.array(out["count_above_mean"], type=pa.int64()),
                    "count_below_mean": pa.array(out["count_below_mean"], type=pa.int64()),
                    "n_distinct": pa.array(out["n_distinct"], type=pa.int64()),
                    "sum_abs_change": pa.array(out["sum_abs_change"], type=pa.int64()),
                    "mean_abs_change": pa.array(out["mean_abs_change"], type=pa.float64()),
                }
            )

        return corpus_ds(sf_dir).map_batches(feats, batch_format="pyarrow")

    sql = f"""
    WITH tok AS ({SQL_TOK}),
    stats AS (
        SELECT doc_id, CAST(sum(token) AS DOUBLE) / count(*) AS m,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(token * token) AS BIGINT) AS abs_energy,
               CAST(count(DISTINCT token) AS BIGINT) AS n_distinct
        FROM tok GROUP BY doc_id
    ),
    diffs AS (
        SELECT doc_id,
               abs(token - lag(token) OVER (PARTITION BY doc_id ORDER BY pos)) AS d
        FROM tok
    ),
    dsum AS (
        SELECT doc_id, CAST(sum(d) AS BIGINT) AS sum_abs_change
        FROM diffs WHERE d IS NOT NULL GROUP BY doc_id
    ),
    counts AS (
        SELECT t.doc_id,
               CAST(sum(CASE WHEN t.token > s.m THEN 1 ELSE 0 END) AS BIGINT)
                 AS count_above_mean,
               CAST(sum(CASE WHEN t.token < s.m THEN 1 ELSE 0 END) AS BIGINT)
                 AS count_below_mean
        FROM tok t JOIN stats s USING (doc_id) GROUP BY t.doc_id
    )
    SELECT s.doc_id, s.n AS n_tok, s.abs_energy, c.count_above_mean,
           c.count_below_mean, s.n_distinct,
           COALESCE(d.sum_abs_change, 0) AS sum_abs_change,
           CASE WHEN s.n > 1
                THEN CAST(COALESCE(d.sum_abs_change, 0) AS DOUBLE) / (s.n - 1)
                ELSE 0.0 END AS mean_abs_change
    FROM stats s
    JOIN counts c USING (doc_id)
    LEFT JOIN dsum d USING (doc_id)
    """
    return q, sql


def _events_rolling_mean_query(window: int = 4):
    """Per-user trailing rolling mean (reference rolling_mean semantics:
    warm-up prefix dropped) over event value cents, ordered by (ts,
    event_id). window=4 keeps the division exact (power of two)."""

    def q(sf_dir: str):
        import ray.data as rd

        from ..kernels.windows import rolling_mean

        def prep(t: pa.Table) -> pa.Table:
            cents = np.round(
                t.column("value").to_numpy(zero_copy_only=False) * 100.0
            ).astype(np.int64)
            return pa.table(
                {
                    "user_id": t.column("user_id"),
                    "event_id": t.column("event_id"),
                    "ts": t.column("ts").cast(pa.int64()),
                    "cents": pa.array(cents),
                }
            )

        def roll_bucket(g: pa.Table) -> pa.Table:
            # vectorized across every user in the bucket (pyarrow-native)
            from ..kernels.groupfill import rolling_mean_multi

            g = g.sort_by([("user_id", "ascending"), ("ts", "ascending"),
                           ("event_id", "ascending")])
            users = g.column("user_id").to_numpy(zero_copy_only=False)
            cents = g.column("cents").to_numpy(zero_copy_only=False)
            ok, rm = rolling_mean_multi(users, cents, window)
            evs = g.column("event_id").to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "user_id": pa.array(users[ok]),
                    "event_id": pa.array(evs[ok]),
                    "roll_mean_cents": pa.array(rm[ok]),
                }
            )

        ds = (
            rd.read_parquet(
                f"{sf_dir}/events.parquet",
                columns=["user_id", "event_id", "ts", "value"],
                override_num_blocks=_num_read_blocks(),
            )
            .map_batches(prep, batch_format="pyarrow")
            .map_batches(_add_user_bucket, batch_format="pyarrow")
            .groupby("__bucket")
            .map_groups(roll_bucket, batch_format="pyarrow")
        )
        return _cast(
            ds,
            {
                "user_id": pa.int64(),
                "event_id": pa.int64(),
                "roll_mean_cents": pa.float64(),
            },
        )

    sql = f"""
    WITH e AS (
        SELECT user_id, event_id, ts,
               CAST(round(value * 100) AS BIGINT) AS cents
        FROM events
    )
    SELECT user_id, event_id,
           CAST(sum(cents) OVER w AS DOUBLE) / {window} AS roll_mean_cents
    FROM e
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN {window - 1} PRECEDING AND CURRENT ROW)
    QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
            >= {window}
    """
    return q, sql


def _events_session_query(gap_us: int = 1_800_000_000):
    """Session windows: a new session starts when the gap to the previous
    event of the same user exceeds 30 minutes (streaming-shaped operator,
    ray_guide 'Streaming-shaped workloads')."""

    def q(sf_dir: str):
        import ray.data as rd

        def sessions_bucket(g: pa.Table) -> pa.Table:
            # vectorized sessionization + per-session reduceat aggregation
            # across every user in the bucket (pyarrow-native)
            from ..kernels.groupfill import _group_bounds, sessionize_multi

            g = g.sort_by([("user_id", "ascending"), ("tus", "ascending")])
            users = g.column("user_id").to_numpy(zero_copy_only=False)
            tus = g.column("tus").to_numpy(zero_copy_only=False)
            sid = sessionize_multi(users, tus, gap_us)
            # session boundary = change of (user, sid)
            key_change = np.concatenate(
                ([True], (users[1:] != users[:-1]) | (sid[1:] != sid[:-1]))
            )
            starts = np.flatnonzero(key_change)
            ends = np.concatenate((starts[1:], [users.size]))
            return pa.table(
                {
                    "user_id": pa.array(users[starts]),
                    "session_id": pa.array(sid[starts]),
                    "cnt": pa.array((ends - starts).astype(np.int64)),
                    "start_us": pa.array(tus[starts]),
                    "end_us": pa.array(tus[ends - 1]),
                }
            )

        def prep(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "user_id": t.column("user_id"),
                    "tus": t.column("ts").cast(pa.int64()),
                }
            )

        ds = (
            rd.read_parquet(
                f"{sf_dir}/events.parquet",
                columns=["user_id", "ts"],
                override_num_blocks=_num_read_blocks(),
            )
            .map_batches(prep, batch_format="pyarrow")
            .map_batches(_add_user_bucket, batch_format="pyarrow")
            .groupby("__bucket")
            .map_groups(sessions_bucket, batch_format="pyarrow")
        )
        return _cast(
            ds,
            {
                "user_id": pa.int64(),
                "session_id": pa.int64(),
                "cnt": pa.int64(),
                "start_us": pa.int64(),
                "end_us": pa.int64(),
            },
        )

    sql = f"""
    WITH e AS (SELECT user_id, epoch_us(ts) AS tus FROM events),
    flags AS (
        SELECT user_id, tus,
               CASE WHEN lag(tus) OVER w IS NULL
                      OR tus - lag(tus) OVER w > {gap_us}
                    THEN 1 ELSE 0 END AS new_s
        FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tus)
    ),
    sess AS (
        SELECT user_id, tus,
               sum(new_s) OVER (PARTITION BY user_id ORDER BY tus
                                ROWS UNBOUNDED PRECEDING) - 1 AS session_id
        FROM flags
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           CAST(count(*) AS BIGINT) AS cnt,
           CAST(min(tus) AS BIGINT) AS start_us,
           CAST(max(tus) AS BIGINT) AS end_us
    FROM sess GROUP BY user_id, session_id
    """
    return q, sql


def _ann_topk_query(k: int = 5, n_queries: int = 3):
    """Brute-force cosine top-k; oracle ranks via list_cosine_similarity.
    Only integer rank/ids are compared (float scores differ in summation
    order between numpy and the SQL engine)."""

    def q(sf_dir: str):
        import ray.data as rd

        from ..extras.ann import brute_force_topk

        emb = rd.read_parquet(
            f"{sf_dir}/embeddings.parquet",
            override_num_blocks=_num_read_blocks(),
        )
        head = (
            emb.map_batches(
                lambda t: t.filter(pc.less(t["vec_id"], n_queries)),
                batch_format="pyarrow",
            )
            .to_pandas()
            .sort_values("vec_id")
        )
        queries = np.array(head["embedding"].tolist(), dtype=np.float64)
        res = brute_force_topk(
            rd.read_parquet(
                f"{sf_dir}/embeddings.parquet",
                override_num_blocks=_num_read_blocks(),
            ), queries, k=k
        ).to_pandas()
        # query_id is positional == vec_id because queries are vec_id 0..n-1
        out = pa.table(
            {
                "query_id": pa.array(res["query_id"].astype(np.int64)),
                "rank": pa.array(res["rank"].astype(np.int64)),
                "vec_id": pa.array(res["vec_id"].astype(np.int64)),
            }
        )
        return out

    sql = f"""
    WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings
               WHERE vec_id < {n_queries}),
    scored AS (
        SELECT q.qid, e.vec_id,
               list_cosine_similarity(q.qe, e.embedding) AS s
        FROM embeddings e CROSS JOIN q
    ),
    ranked AS (
        SELECT qid, vec_id,
               row_number() OVER (PARTITION BY qid ORDER BY s DESC, vec_id)
                 AS rank
        FROM scored
    )
    SELECT CAST(qid AS BIGINT) AS query_id, CAST(rank AS BIGINT) AS rank,
           CAST(vec_id AS BIGINT) AS vec_id
    FROM ranked WHERE rank <= {k}
    """
    return q, sql


def _token_count_query():
    def q(sf_dir: str):
        from ..extras.textstats import TokenCountStage

        return _cast(
            corpus_docs(sf_dir).map_batches(
                # pre-built instance -> plain TASK pool: the only state
                # is a compiled regex (pickles fine), so actor spin-up
                # bought nothing and cost ~1 s; parallelism now tracks
                # CPUs with no read-stage deadlock to guard against
                TokenCountStage(), batch_format="pyarrow",
            ),
            {"doc_id": pa.string(), "n_ws_tokens": pa.int64()},
        )

    sql = """
    SELECT CAST(doc_id AS VARCHAR) AS doc_id,
           CAST(length(string_split_regex(trim(text), '\\s+')) AS BIGINT)
             AS n_ws_tokens
    FROM documents
    """
    # n_bpe_tokens has no clean SQL analogue (regex engine differences) —
    # expose the whitespace half with an oracle and the full stage rows-only
    return q, sql


def build_ext_queries():
    queries, oracles = {}, {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("doc_token_features",) + _doc_token_features_query()))
    add(*(("events_rolling_mean",) + _events_rolling_mean_query()))
    add(*(("events_sessionization",) + _events_session_query()))
    add(*(("ann_brute_topk",) + _ann_topk_query()))

    from ..extras.dedup import minhash_pairs_sql, simhash_sql

    def minhash_q(sf_dir: str):
        import ray.data as rd

        from ..extras.dedup import minhash_candidate_pairs

        ds = rd.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"],
            override_num_blocks=_num_read_blocks(),
        )
        return _cast(
            minhash_candidate_pairs(ds, threshold=0.5, max_bucket=None,
                                    shuffle_partitions=8),
            {"doc_a": pa.string(), "doc_b": pa.string(),
             "est_jaccard": pa.float64()},
        )

    def simhash_q(sf_dir: str):
        import ray.data as rd

        from ..extras.dedup import SimHashStage

        return _cast(
            rd.read_parquet(
                f"{sf_dir}/documents.parquet", columns=["doc_id", "text"],
                override_num_blocks=_num_read_blocks(),
            ).map_batches(SimHashStage(), batch_format="pyarrow")
            .select_columns(["doc_id", "simhash"]),
            {"doc_id": pa.string(), "simhash": pa.int64()},
        )

    from ..extras.textstats import (
        FingerprintStage,
        LangIdStage,
        QualityScoreStage,
    )

    def langid_q(sf_dir: str):
        return _cast(
            corpus_docs(sf_dir).map_batches(
                LangIdStage, batch_format="pyarrow", concurrency=2
            ),
            {"doc_id": pa.string(), "lang_pred": pa.string(),
             "lang_score": pa.float64()},
        )

    def quality_q(sf_dir: str):
        return _cast(
            corpus_docs(sf_dir).map_batches(
                QualityScoreStage, batch_format="pyarrow", concurrency=2
            ),
            {"doc_id": pa.string(), "n_chars": pa.int64(),
             "n_words": pa.int64(), "mean_word_len": pa.float64(),
             "stopword_ratio": pa.float64(), "punct_ratio": pa.float64(),
             "digit_ratio": pa.float64(), "quality_score": pa.float64()},
        )

    def fingerprint_q(sf_dir: str):
        return _cast(
            corpus_docs(sf_dir).map_batches(
                FingerprintStage, batch_format="pyarrow", concurrency=2
            ).select_columns(["doc_id", "fingerprint", "fp_hex"]),
            {"doc_id": pa.string(), "fingerprint": pa.int64(),
             "fp_hex": pa.string()},
        )

    def features_q(sf_dir: str):
        from ..config import EngineConfig, SMALL_TIERS
        from ..stages.features_stage import extract_features

        cfg = EngineConfig(tiers=SMALL_TIERS[:1], forecast_concurrency=2)
        return extract_features(corpus_ds(sf_dir), cfg)

    def ivf_q(sf_dir: str):
        """IVF machinery with EXHAUSTIVE probing (n_probe = n_clusters):
        the result is exactly brute-force cosine top-k, so the rank oracle
        is a hard check of the sample/centroid/assign/search plumbing."""
        import ray.data as rd

        from ..extras.ann import ivf_topk

        emb = rd.read_parquet(
            f"{sf_dir}/embeddings.parquet",
            override_num_blocks=_num_read_blocks(),
        )
        head = (
            emb.map_batches(
                lambda t: t.filter(pc.less(t["vec_id"], 3)),
                batch_format="pyarrow",
            ).to_pandas().sort_values("vec_id")
        )
        queries = np.array(head["embedding"].tolist(), dtype=np.float64)
        res = ivf_topk(
            rd.read_parquet(
                f"{sf_dir}/embeddings.parquet",
                override_num_blocks=_num_read_blocks(),
            ), queries, k=5,
            n_clusters=16, n_probe=16,
        )
        return pa.table(
            {
                "query_id": res.column("query_id").cast(pa.int64()),
                "rank": res.column("rank").cast(pa.int64()),
                "vec_id": res.column("vec_id").cast(pa.int64()),
            }
        )

    def multimodal_q(sf_dir: str):
        from ..extras.multimodal import (
            media_from_documents,
            multimodal_pipeline,
        )

        media = media_from_documents(corpus_docs(sf_dir))
        return _cast(
            multimodal_pipeline(media, kind="image",
                                concurrency=2).select_columns(
                ["doc_id", "mean_r", "mean_g", "mean_b", "std_gray",
                 "width", "height"]
            ),
            {"doc_id": pa.string(), "mean_r": pa.float64(),
             "mean_g": pa.float64(), "mean_b": pa.float64(),
             "std_gray": pa.float64(), "width": pa.int32(),
             "height": pa.int32()},
        )

    add("dedup_minhash_pairs", minhash_q, minhash_pairs_sql(threshold=0.5))
    add("simhash_fingerprints", simhash_q, simhash_sql())
    add("lang_id", langid_q, LangIdStage().oracle_sql())
    add("text_quality", quality_q, QualityScoreStage.oracle_sql())
    add("doc_fingerprints", fingerprint_q, FingerprintStage.oracle_sql())
    add("series_features_w8", features_q)
    # exhaustive probe == brute force: reuse the rank oracle (k=5, 3 queries)
    _, ann_sql = _ann_topk_query(k=5, n_queries=3)
    add("ann_ivf_topk", ivf_q, ann_sql)
    from ..extras.multimodal import image_features_sql

    add("multimodal_image_features", multimodal_q, image_features_sql())
    add(*(("token_counts",) + _token_count_query()))
    return queries, oracles
