"""Wave-27 queries: grouped top-k, source style similarity, session
co-occurrence lift, and multi-window burn-rate monitoring.

- source_top_docs: per-GROUP top-k (top-3 docs by length per source) —
  per-block top-k partials tree-reduced with the same kernel, so only
  k rows per (block, source) ever move; no global sort.
- source_style_cosine: pairwise cosine similarity between per-source
  char-bigram profiles (256 hash buckets). Bounded (source, bucket)
  count partials tree-reduce; the 20x20 cosine matrix is driver math.
  Dot products are exact int64 (documented envelope: per-bucket counts
  must stay < ~2^29 for the int64 dot; shard the profile by time range
  beyond that).
- events_type_lift: market-basket lift between event types co-occurring
  in the same 30-min session. Sessions come from the wave's existing
  sessionize_multi kernel; per-session distinct-type sets become
  BITMASKS (bounded type vocabulary), so pair counting is a vectorized
  popcount per (a, b) over session masks — bounded partials, no pair
  explosion, no shuffle beyond the user-bucket groupby.
- events_error_burn_rate: SRE-style burn rate — hourly error ratio vs
  the trailing 6-hour ratio, composed from bounded per-hour partials
  (dense-grid cumulative sums on the driver). Both ratios and their
  quotient are single f64 divisions of exact integers on both sides.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .queries import SQL_TOK, _cast, _num_read_blocks
from ._scaffold import read_cols
from .queries_ext import _add_user_bucket

GAP_US = 1_800_000_000  # 30-min session gap (== events_sessionization)


# ------------------------------------------------------ source_top_docs
def _top_docs_per_source_query(k: int = 3):
    def q(sf_dir: str):
        import pandas as pd
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def topk(t: pa.Table) -> pa.Table:
            if "source" not in t.column_names:
                return pa.table(
                    {"source": pa.array([], type=pa.string()),
                     "doc_id": pa.array([], type=pa.int64()),
                     "n_chars": pa.array([], type=pa.int64())}
                )
            df = pa.table(
                {"source": t.column("source"),
                 "doc_id": t.column("doc_id").cast(pa.int64()),
                 "n_chars": t.column("n_chars").cast(pa.int64())}
            ).to_pandas()
            df = (df.sort_values(["n_chars", "doc_id"],
                                 ascending=[False, True])
                  .groupby("source", sort=False).head(k))
            return pa.Table.from_pandas(df, preserve_index=False)

        refs = list(
            read_cols(sf_dir, "documents", ["source", "doc_id", "n_chars"])
            .map_batches(topk, batch_format="pyarrow")
            .to_arrow_refs()
        )
        merged = tree_reduce_tables(refs, topk)
        df = merged.to_pandas().sort_values(
            ["source", "n_chars", "doc_id"],
            ascending=[True, False, True],
        )
        df["rk"] = df.groupby("source").cumcount() + 1
        return pa.table(
            {"source": pa.array(df["source"], type=pa.string()),
             "rk": pa.array(df["rk"].to_numpy(np.int64)),
             "doc_id": pa.array(df["doc_id"].to_numpy(np.int64)),
             "n_chars": pa.array(df["n_chars"].to_numpy(np.int64))}
        )

    sql = f"""
    SELECT source, CAST(rk AS BIGINT) AS rk,
           CAST(doc_id AS BIGINT) AS doc_id,
           CAST(n_chars AS BIGINT) AS n_chars
    FROM (
        SELECT source, doc_id, n_chars,
               row_number() OVER (PARTITION BY source
                                  ORDER BY n_chars DESC, doc_id) AS rk
        FROM documents
    ) WHERE rk <= {k}
    """
    return q, sql


# --------------------------------------------------- source_style_cosine
_NB = 256  # bigram hash buckets


def _style_cosine_query():
    def q(sf_dir: str):
        import ray.data as rd

        from ..corpus import tokens_from_text_batch
        from ..stages.rollup import _flat_tokens
        from ..stages.source_rollup import tree_reduce_tables

        def profile(t: pa.Table) -> pa.Table:
            # fully vectorized over the FLAT token buffer: bigram start
            # positions per doc via the repeat-range trick, no per-doc
            # Python list materialization.
            empty = pa.table(
                {"source": pa.array([], type=pa.string()),
                 "b": pa.array([], type=pa.int64()),
                 "c": pa.array([], type=pa.int64())}
            )
            if "tokens" not in t.column_names:
                return empty
            values, lengths = _flat_tokens(t)
            if values.size < 2:
                return empty
            v = values.astype(np.int64)
            counts = np.maximum(lengths.astype(np.int64) - 1, 0)
            total = int(counts.sum())
            if total == 0:
                return empty
            starts = np.concatenate(
                ([0], np.cumsum(lengths))
            )[:-1].astype(np.int64)
            idx = (np.repeat(
                starts - np.concatenate(([0], np.cumsum(counts)))[:-1],
                counts,
            ) + np.arange(total, dtype=np.int64))
            b = (v[idx] * 31 + v[idx + 1]) % _NB
            src_names, src_code = np.unique(
                np.asarray(t.column("source").to_pylist()),
                return_inverse=True,
            )
            key = np.repeat(src_code.astype(np.int64), counts) * _NB + b
            uk, uc = np.unique(key, return_counts=True)
            return pa.table(
                {"source": pa.array(src_names[uk // _NB],
                                    type=pa.string()),
                 "b": pa.array(uk % _NB),
                 "c": pa.array(uc.astype(np.int64))}
            )

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by(["source", "b"]).aggregate([("c", "sum")])
            return pa.table(
                {"source": g.column("source"), "b": g.column("b"),
                 "c": g.column("c_sum").cast(pa.int64())}
            )

        refs = list(
            read_cols(sf_dir, "documents", ["doc_id", "source", "text"])
            .map_batches(tokens_from_text_batch, batch_format="pyarrow")
            .map_batches(profile, batch_format="pyarrow")
            .to_arrow_refs()
        )
        prof = tree_reduce_tables(refs, merge).to_pandas()
        sources = sorted(prof["source"].unique())
        vec = {}
        for s in sources:
            v = np.zeros(_NB, dtype=np.int64)
            g = prof[prof["source"] == s]
            v[g["b"].to_numpy(np.int64)] = g["c"].to_numpy(np.int64)
            vec[s] = v
        import math

        sa, sb, dots, cos = [], [], [], []
        for i, a in enumerate(sources):
            for b in sources[i + 1:]:
                dot = int((vec[a] * vec[b]).sum())
                na2 = int((vec[a] * vec[a]).sum())
                nb2 = int((vec[b] * vec[b]).sum())
                sa.append(a)
                sb.append(b)
                dots.append(dot)
                cos.append(float(dot)
                           / (math.sqrt(float(na2))
                              * math.sqrt(float(nb2))))
        return pa.table(
            {"source_a": pa.array(sa, type=pa.string()),
             "source_b": pa.array(sb, type=pa.string()),
             "dot": pa.array(dots, type=pa.int64()),
             "cosine": pa.array(cos, type=pa.float64())}
        )

    sql = f"""
    WITH tok AS ({SQL_TOK}),
    bg AS (
        SELECT source,
               (token * 31 + lead(token) OVER (
                    PARTITION BY doc_id ORDER BY pos)) % {_NB} AS b
        FROM tok
    ),
    cnts AS (
        SELECT source, b, CAST(count(*) AS BIGINT) AS c
        FROM bg WHERE b IS NOT NULL GROUP BY source, b
    ),
    norms AS (
        SELECT source, CAST(sum(c * c) AS BIGINT) AS n2 FROM cnts
        GROUP BY source
    )
    SELECT x.source AS source_a, y.source AS source_b,
           CAST(sum(x.c * y.c) AS BIGINT) AS dot,
           CAST(CAST(sum(x.c * y.c) AS BIGINT) AS DOUBLE)
               / (sqrt(CAST(na.n2 AS DOUBLE))
                  * sqrt(CAST(nb.n2 AS DOUBLE))) AS cosine
    FROM cnts x
    JOIN cnts y ON x.b = y.b AND x.source < y.source
    JOIN norms na ON na.source = x.source
    JOIN norms nb ON nb.source = y.source
    GROUP BY x.source, y.source, na.n2, nb.n2
    """
    return q, sql


# ------------------------------------------------------ events_type_lift
def _type_lift_query(gap_us: int = GAP_US):
    def q(sf_dir: str):
        import pandas as pd
        import ray.data as rd

        from ..kernels.groupfill import sessionize_multi
        from ..stages.source_rollup import tree_reduce_tables

        def prep(t: pa.Table) -> pa.Table:
            return pa.table(
                {"user_id": t.column("user_id"),
                 "tus": t.column("ts").cast(pa.int64()),
                 "event_type": t.column("event_type")}
            )

        def bucket_counts(g: pa.Table) -> pa.Table:
            # sessionize the bucket, then represent each session's
            # distinct-type set as a bitmask over the LOCAL sorted type
            # vocabulary; pair counts are vectorized bit tests. Partial
            # rows are keyed by type STRINGS so merging across buckets
            # (with different local vocabularies) is safe.
            g = g.sort_by([("user_id", "ascending"),
                           ("tus", "ascending")])
            users = g.column("user_id").to_numpy(zero_copy_only=False)
            tus = g.column("tus").to_numpy(zero_copy_only=False)
            sid = sessionize_multi(users, tus, gap_us)
            types, tcode = np.unique(
                np.asarray(g.column("event_type").to_pylist(),
                           dtype=object),
                return_inverse=True,
            )
            key_change = np.concatenate(
                ([True],
                 (users[1:] != users[:-1]) | (sid[1:] != sid[:-1]))
            )
            session_idx = np.cumsum(key_change) - 1
            n_sessions = int(session_idx[-1]) + 1 if users.size else 0
            masks = np.zeros(n_sessions, dtype=np.int64)
            np.bitwise_or.at(
                masks, session_idx, np.int64(1) << tcode.astype(np.int64)
            )
            ta, tb, cnt = [], [], []
            for i, a in enumerate(types):
                bit_a = np.int64(1) << np.int64(i)
                has_a = (masks & bit_a) != 0
                ta.append(str(a))
                tb.append("")
                cnt.append(int(has_a.sum()))
                for j in range(i + 1, len(types)):
                    bit_b = np.int64(1) << np.int64(j)
                    c = int((has_a & ((masks & bit_b) != 0)).sum())
                    if c:
                        ta.append(str(types[i]))
                        tb.append(str(types[j]))
                        cnt.append(c)
            ta.append("")
            tb.append("")
            cnt.append(n_sessions)
            return pa.table(
                {"ta": pa.array(ta, type=pa.string()),
                 "tb": pa.array(tb, type=pa.string()),
                 "cnt": pa.array(np.asarray(cnt, dtype=np.int64))}
            )

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by(["ta", "tb"]).aggregate([("cnt", "sum")])
            return pa.table(
                {"ta": g.column("ta"), "tb": g.column("tb"),
                 "cnt": g.column("cnt_sum").cast(pa.int64())}
            )

        refs = list(
            read_cols(sf_dir, "events", ["user_id", "ts", "event_type"])
            .map_batches(prep, batch_format="pyarrow")
            .map_batches(_add_user_bucket, batch_format="pyarrow")
            .groupby("__bucket")
            .map_groups(bucket_counts, batch_format="pyarrow")
            .to_arrow_refs()
        )
        agg = tree_reduce_tables(refs, merge).to_pandas()
        total = int(agg.loc[(agg["ta"] == "") & (agg["tb"] == ""),
                            "cnt"].iloc[0])
        singles = {r.ta: int(r.cnt)
                   for r in agg[(agg["tb"] == "")
                                & (agg["ta"] != "")].itertuples()}
        pairs = agg[(agg["ta"] != "") & (agg["tb"] != "")]
        rows = {"type_a": [], "type_b": [], "n_ab": [], "n_a": [],
                "n_b": [], "n_sessions": [], "lift": []}
        for r in pairs.sort_values(["ta", "tb"]).itertuples():
            n_ab, n_a, n_b = int(r.cnt), singles[r.ta], singles[r.tb]
            rows["type_a"].append(r.ta)
            rows["type_b"].append(r.tb)
            rows["n_ab"].append(n_ab)
            rows["n_a"].append(n_a)
            rows["n_b"].append(n_b)
            rows["n_sessions"].append(total)
            rows["lift"].append(
                float(np.float64(n_ab * total)
                      / np.float64(n_a * n_b))
            )
        return pa.table(
            {"type_a": pa.array(rows["type_a"], type=pa.string()),
             "type_b": pa.array(rows["type_b"], type=pa.string()),
             "n_ab": pa.array(rows["n_ab"], type=pa.int64()),
             "n_a": pa.array(rows["n_a"], type=pa.int64()),
             "n_b": pa.array(rows["n_b"], type=pa.int64()),
             "n_sessions": pa.array(rows["n_sessions"],
                                    type=pa.int64()),
             "lift": pa.array(rows["lift"], type=pa.float64())}
        )

    sql = f"""
    WITH e AS (
        SELECT user_id, epoch_us(ts) AS tus, event_type FROM events
    ),
    flags AS (
        SELECT user_id, tus, event_type,
               CASE WHEN lag(tus) OVER w IS NULL
                      OR tus - lag(tus) OVER w > {gap_us}
                    THEN 1 ELSE 0 END AS new_s
        FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tus)
    ),
    sess AS (
        SELECT user_id, event_type,
               sum(new_s) OVER (PARTITION BY user_id ORDER BY tus
                                ROWS UNBOUNDED PRECEDING) AS sid
        FROM flags
    ),
    st AS (SELECT DISTINCT user_id, sid, event_type FROM sess),
    tot AS (
        SELECT CAST(count(*) AS BIGINT) AS n FROM (
            SELECT DISTINCT user_id, sid FROM st)
    ),
    singles AS (
        SELECT event_type, CAST(count(*) AS BIGINT) AS n
        FROM st GROUP BY event_type
    ),
    pairs AS (
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               CAST(count(*) AS BIGINT) AS n_ab
        FROM st a JOIN st b
          ON a.user_id = b.user_id AND a.sid = b.sid
         AND a.event_type < b.event_type
        GROUP BY a.event_type, b.event_type
    )
    SELECT p.type_a, p.type_b, p.n_ab,
           sa.n AS n_a, sb.n AS n_b, tot.n AS n_sessions,
           CAST(p.n_ab * tot.n AS DOUBLE)
               / CAST(sa.n * sb.n AS DOUBLE) AS lift
    FROM pairs p, tot
    JOIN singles sa ON sa.event_type = p.type_a
    JOIN singles sb ON sb.event_type = p.type_b
    """
    return q, sql


# -------------------------------------------- events_error_burn_rate
def _burn_rate_query(long_hours: int = 6):
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            if "ts" not in t.column_names:
                return pa.table(
                    {"hour": pa.array([], type=pa.int64()),
                     "n_err": pa.array([], type=pa.int64()),
                     "n_tot": pa.array([], type=pa.int64())}
                )
            hour = (t.column("ts").cast(pa.int64()).to_numpy(
                zero_copy_only=False) // 1_000_000 // 3600)
            et = t.column("event_type").to_pylist()
            err = np.fromiter((1 if x == "error" else 0 for x in et),
                              dtype=np.int64, count=len(et))
            tab = pa.table(
                {"hour": pa.array(hour), "err": pa.array(err)}
            )
            g = tab.group_by("hour").aggregate(
                [("err", "sum"), ("err", "count")]
            )
            return pa.table(
                {"hour": g.column("hour"),
                 "n_err": g.column("err_sum").cast(pa.int64()),
                 "n_tot": g.column("err_count").cast(pa.int64())}
            )

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by("hour").aggregate(
                [("n_err", "sum"), ("n_tot", "sum")]
            )
            return pa.table(
                {"hour": g.column("hour"),
                 "n_err": g.column("n_err_sum").cast(pa.int64()),
                 "n_tot": g.column("n_tot_sum").cast(pa.int64())}
            )

        refs = list(
            read_cols(sf_dir, "events", ["ts", "event_type"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        hp = tree_reduce_tables(refs, merge).to_pandas().sort_values(
            "hour"
        )
        hours = hp["hour"].to_numpy(np.int64)
        e = hp["n_err"].to_numpy(np.int64)
        n = hp["n_tot"].to_numpy(np.int64)
        # dense grid so the trailing window is CALENDAR hours
        lo, hi = int(hours[0]), int(hours[-1])
        grid_e = np.zeros(hi - lo + 1, dtype=np.int64)
        grid_n = np.zeros(hi - lo + 1, dtype=np.int64)
        grid_e[hours - lo] = e
        grid_n[hours - lo] = n
        ce = np.concatenate(([0], np.cumsum(grid_e)))
        cn = np.concatenate(([0], np.cumsum(grid_n)))
        idx = hours - lo
        start = np.maximum(idx - (long_hours - 1), 0)
        e6 = ce[idx + 1] - ce[start]
        n6 = cn[idx + 1] - cn[start]
        short = e.astype(np.float64) / n.astype(np.float64)
        long_r = e6.astype(np.float64) / n6.astype(np.float64)
        # e6 == 0 implies e == 0: define burn = 0 there (avoids 0/0,
        # which DuckDB and IEEE disagree on)
        burn = np.where(
            e6 > 0,
            short / np.where(e6 > 0, long_r, 1.0),
            0.0,
        )
        return pa.table(
            {"hour": pa.array(hours),
             "n_err": pa.array(e), "n_tot": pa.array(n),
             "n_err6": pa.array(e6.astype(np.int64)),
             "n_tot6": pa.array(n6.astype(np.int64)),
             "burn": pa.array(burn, type=pa.float64())}
        )

    sql = f"""
    WITH h AS (
        SELECT epoch_us(ts) // 1000000 // 3600 AS hour,
               CAST(sum(CASE WHEN event_type = 'error' THEN 1
                        ELSE 0 END) AS BIGINT) AS n_err,
               CAST(count(*) AS BIGINT) AS n_tot
        FROM events GROUP BY 1
    ),
    w AS (
        SELECT hour, n_err, n_tot,
               CAST(sum(n_err) OVER win AS BIGINT) AS n_err6,
               CAST(sum(n_tot) OVER win AS BIGINT) AS n_tot6
        FROM h WINDOW win AS (
            ORDER BY hour RANGE BETWEEN {long_hours - 1} PRECEDING
                              AND CURRENT ROW)
    )
    SELECT CAST(hour AS BIGINT) AS hour, n_err, n_tot, n_err6, n_tot6,
           CASE WHEN n_err6 = 0 THEN 0.0
                ELSE (CAST(n_err AS DOUBLE) / CAST(n_tot AS DOUBLE))
                     / (CAST(n_err6 AS DOUBLE)
                        / CAST(n_tot6 AS DOUBLE))
           END AS burn
    FROM w
    """
    return q, sql


def build_wave27_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("source_top_docs",) + _top_docs_per_source_query(3)))
    add(*(("source_style_cosine",) + _style_cosine_query()))
    add(*(("events_type_lift",) + _type_lift_query()))
    add(*(("events_error_burn_rate",) + _burn_rate_query(6)))
    return queries, oracles
