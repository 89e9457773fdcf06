"""Wave-22 queries: online/streaming corpus-maintenance ops.

- streaming_online_dedup: query-before-insert LSH dedup over an ordered
  doc stream (dup iff an EARLIER doc collides in >=1 band and verifies
  at signature-Jaccard >= 0.5; dup_of = the earliest such doc). The
  batch formulation shuffles only band rows; `extras.dedup.
  OnlineLSHIndex` is the literal one-doc-at-a-time index and is
  pytest-asserted bitwise-equal to it.
"""

from __future__ import annotations

import pyarrow as pa

from .queries import _cast, _num_read_blocks
from ._scaffold import read_cols


def _online_dedup_query():
    def q(sf_dir: str):
        import ray.data as rd

        from ..extras.dedup import minhash_online_dedup

        docs = read_cols(sf_dir, "documents", ["doc_id", "text"])
        return _cast(
            minhash_online_dedup(docs, shuffle_partitions=8),
            {"doc_id": pa.int64(), "dup_of": pa.int64()},
        )

    from ..extras.dedup import minhash_online_dedup_sql

    return q, minhash_online_dedup_sql()


def _bpe_encode_stats_query(k: int = 6):
    """Tokenizer APPLICATION at corpus scale: train the k-merge BPE
    (distributed trainer, golden-checked elsewhere), apply the rules to
    every doc, and report per-source fertility — tokens before/after and
    the compression ratio. The aggregate is bounded (source, ints)
    partials tree-reduced; token rows never shuffle. Golden oracle:
    the sequential reference BPE aggregated the same way."""

    def q(sf_dir: str):
        import numpy as np
        import ray.data as rd

        from ..extras.bpe import train_bpe
        from ..stages.source_rollup import tree_reduce_tables
        from .queries import corpus_ds

        def partial(t: pa.Table) -> pa.Table:
            src = t.column("source")
            n = t.column("n_tok").cast(pa.int64())
            g = pa.table({"source": src, "n": n}).group_by("source")
            agg = g.aggregate([("n", "sum"), ("n", "count")])
            return pa.table(
                {
                    "source": agg.column("source"),
                    "toks": agg.column("n_sum"),
                    "docs": agg.column("n_count"),
                }
            )

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by("source").aggregate(
                [("toks", "sum"), ("docs", "sum")]
            )
            return pa.table(
                {
                    "source": g.column("source"),
                    "toks": g.column("toks_sum"),
                    "docs": g.column("docs_sum"),
                }
            )

        ds = corpus_ds(sf_dir)
        _, encoded = train_bpe(ds, k=k)
        before = tree_reduce_tables(
            list(ds.map_batches(partial, batch_format="pyarrow")
                 .to_arrow_refs()),
            merge,
        )
        after = tree_reduce_tables(
            list(encoded.map_batches(partial, batch_format="pyarrow")
                 .to_arrow_refs()),
            merge,
        )
        bd = {s: (int(t), int(d)) for s, t, d in zip(
            before.column("source").to_pylist(),
            before.column("toks").to_pylist(),
            before.column("docs").to_pylist())}
        ad = {s: int(t) for s, t in zip(
            after.column("source").to_pylist(),
            after.column("toks").to_pylist())}
        srcs = sorted(bd)
        tb = np.array([bd[s][0] for s in srcs], dtype=np.int64)
        ta = np.array([ad[s] for s in srcs], dtype=np.int64)
        return rd.from_arrow(
            pa.table(
                {
                    "source": pa.array(srcs, type=pa.string()),
                    "n_docs": pa.array(
                        [bd[s][1] for s in srcs], type=pa.int64()
                    ),
                    "tokens_before": pa.array(tb),
                    "tokens_after": pa.array(ta),
                    "ratio": pa.array(
                        tb.astype(np.float64) / ta.astype(np.float64)
                    ),
                }
            )
        )

    return (q,)


def _business_day_query():
    """Calendar-aware rollup (the reference's CalendarAnnotations /
    holiday-lookup surface, src/core/time_series.rs:109-160): per
    event_type per DAY, business days only — weekday Mon-Fri and not in
    the broadcast holiday set (2024-01-01, 2024-01-15). The holiday set
    is the canonical broadcast small side; the filter is a vectorized
    day-ordinal mask, applied BEFORE the shuffle so holiday rows never
    move."""
    HOLIDAYS_S = (1704067200, 1705276800)  # 2024-01-01, 2024-01-15 UTC
    HOLIDAY_DAYS = tuple(h // 86400 for h in HOLIDAYS_S)

    def q(sf_dir: str):
        import numpy as np
        import ray.data as rd

        from ..kernels.frequency import CalendarAnnotations
        from ..stages.bucket_agg import grouped_int_rollup

        cal = CalendarAnnotations(holidays=HOLIDAYS_S)

        def prep(t: pa.Table) -> pa.Table:
            tus = t.column("ts").cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
            es = tus // 1_000_000
            mask = cal.business_day_mask(es)
            cents = np.round(
                t.column("value").to_numpy(zero_copy_only=False) * 100.0
            ).astype(np.int64)
            keep = pa.array(mask)
            return pa.table(
                {
                    "event_type": t.column("event_type").filter(keep),
                    "window_id": pa.array((es // 86400)[mask]),
                    "cents": pa.array(cents[mask]),
                }
            )

        ds = read_cols(sf_dir, "events", ["ts", "event_type", "value"]).map_batches(prep, batch_format="pyarrow")
        agg = grouped_int_rollup(
            ds, keys=["event_type", "window_id"], value_col="cents",
            shuffle_partitions=4,
            aliases={"cnt": "cnt", "sum": "sum_cents",
                     "min": "min_cents", "max": "max_cents"},
        )
        return _cast(
            agg,
            {
                "event_type": pa.string(),
                "window_id": pa.int64(),
                "cnt": pa.int64(),
                "sum_cents": pa.int64(),
                "min_cents": pa.int64(),
                "max_cents": pa.int64(),
            },
        )

    days = ", ".join(str(d) for d in HOLIDAY_DAYS)
    sql = f"""
    WITH e AS (
        SELECT event_type,
               epoch_us(ts) // 1000000 // 86400 AS day,
               CAST(round(value * 100) AS BIGINT) AS cents
        FROM events
    )
    SELECT event_type,
           CAST(day AS BIGINT) AS window_id,
           CAST(count(*) AS BIGINT) AS cnt,
           CAST(sum(cents) AS BIGINT) AS sum_cents,
           CAST(min(cents) AS BIGINT) AS min_cents,
           CAST(max(cents) AS BIGINT) AS max_cents
    FROM e
    WHERE ((day + 3) % 7) < 5 AND day NOT IN ({days})
    GROUP BY event_type, day
    """
    return q, sql


def _range_mean_mixed_query():
    """Mixed-tier range serving — the tiered retention store's read
    path: the exact mean over a per-doc token range [a, b) (both ends
    8-aligned) is answered WITHOUT touching raw tokens by composing
    w128 blocks for the aligned interior, w32 for the mid edges and w8
    for the fine edges, summing their (cnt, sum) partials. The span
    counts per tier are emitted as evidence of the decomposition; the
    oracle recomputes the same mean directly from token positions and
    the same span counts from closed-form integer arithmetic."""

    def q(sf_dir: str):
        import numpy as np

        from ..kernels.rollup import rollup_flat
        from ..stages.rollup import _flat_tokens
        from .queries import corpus_ds

        def serve(batch: pa.Table) -> pa.Table:
            values, lengths = _flat_tokens(batch)
            n = lengths
            a = ((n // 5) // 8) * 8
            b = (((4 * n) // 5) // 8) * 8
            keep = b > a
            a32 = ((a + 31) // 32) * 32
            b32 = (b // 32) * 32
            inner32 = b32 > a32
            a128 = np.where(inner32, ((a32 + 127) // 128) * 128, 0)
            b128 = np.where(inner32, (b32 // 128) * 128, 0)
            inner128 = inner32 & (b128 > a128)

            # per-tier window prefix sums (windows contiguous per doc)
            tiers = {}
            for w in (8, 32, 128):
                r = rollup_flat(values, lengths, w)
                nw = (n + w - 1) // w
                first = np.concatenate(([0], np.cumsum(nw)))[:-1]
                psum = np.concatenate(([0], np.cumsum(r["sum"])))
                pcnt = np.concatenate(([0], np.cumsum(r["cnt"])))
                tiers[w] = (first, psum, pcnt)

            def span(w, lo, hi):
                """(sum, cnt) over window indices [lo//w, hi//w) per doc
                (lo/hi arrays of aligned positions, hi >= lo)."""
                first, psum, pcnt = tiers[w]
                i0 = first + lo // w
                i1 = first + hi // w
                return psum[i1] - psum[i0], pcnt[i1] - pcnt[i0]

            z = np.zeros_like(a)
            # w8 edges: [a, min(a32,b)) and [max(b32,a), b) when there
            # is a 32-aligned interior; else the whole range in w8
            e1_hi = np.where(inner32, np.minimum(a32, b), b)
            s8a, c8a = span(8, a, e1_hi)
            t_lo = np.where(inner32, b32, b)
            s8b, c8b = span(8, t_lo, b)
            # w32 spans: [a32, a128) and [b128, b32) (or [a32,b32))
            m_lo = np.where(inner32, a32, z)
            m_hi = np.where(inner128, a128, np.where(inner32, b32, z))
            s32a, c32a = span(32, m_lo, m_hi)
            h_lo = np.where(inner128, b128, z)
            h_hi = np.where(inner128, b32, z)
            s32b, c32b = span(32, h_lo, h_hi)
            # w128 interior
            i_lo = np.where(inner128, a128, z)
            i_hi = np.where(inner128, b128, z)
            s128, c128 = span(128, i_lo, i_hi)

            total_s = s8a + s8b + s32a + s32b + s128
            total_c = c8a + c8b + c32a + c32b + c128
            n128 = (i_hi - i_lo) // 128
            n32 = ((m_hi - m_lo) + (h_hi - h_lo)) // 32
            n8 = ((e1_hi - a) + (b - t_lo)) // 8

            col = batch.column("doc_id")
            col = (col.combine_chunks()
                   if isinstance(col, pa.ChunkedArray) else col)
            kidx = pa.array(np.flatnonzero(keep))
            return pa.table(
                {
                    "doc_id": col.take(kidx),
                    "a": pa.array(a[keep]),
                    "b": pa.array(b[keep]),
                    "cnt": pa.array(total_c[keep]),
                    "sum": pa.array(total_s[keep]),
                    "mean": pa.array(
                        total_s[keep].astype(np.float64) / total_c[keep]
                    ),
                    "n128": pa.array(n128[keep]),
                    "n32": pa.array(n32[keep]),
                    "n8": pa.array(n8[keep]),
                }
            )

        ds = corpus_ds(sf_dir).map_batches(serve, batch_format="pyarrow")
        return _cast(
            ds,
            {
                "doc_id": pa.string(), "a": pa.int64(), "b": pa.int64(),
                "cnt": pa.int64(), "sum": pa.int64(),
                "mean": pa.float64(), "n128": pa.int64(),
                "n32": pa.int64(), "n8": pa.int64(),
            },
        )

    from .queries import SQL_TOK

    sql = f"""
    WITH tok AS ({SQL_TOK}),
    r0 AS (
        SELECT CAST(doc_id AS VARCHAR) AS doc_id,
               ((length(text) // 5) // 8) * 8 AS a,
               (((4 * length(text)) // 5) // 8) * 8 AS b
        FROM documents
    ),
    r AS (
        SELECT doc_id, a, b,
               ((a + 31) // 32) * 32 AS a32,
               (b // 32) * 32 AS b32
        FROM r0 WHERE b > a
    ),
    r2 AS (
        SELECT doc_id, a, b, a32, b32,
               CASE WHEN b32 > a32
                    THEN ((a32 + 127) // 128) * 128 ELSE 0 END AS a128,
               CASE WHEN b32 > a32 THEN (b32 // 128) * 128 ELSE 0 END AS b128
        FROM r
    ),
    agg AS (
        SELECT t.doc_id, CAST(count(*) AS BIGINT) AS cnt,
               CAST(sum(t.token) AS BIGINT) AS s
        FROM tok t JOIN r2 ON r2.doc_id = t.doc_id
        WHERE t.pos >= r2.a AND t.pos < r2.b
        GROUP BY t.doc_id
    )
    SELECT r2.doc_id, CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b,
           agg.cnt, agg.s AS "sum",
           CAST(agg.s AS DOUBLE) / agg.cnt AS mean,
           CAST(CASE WHEN b32 > a32 AND b128 > a128
                THEN (b128 - a128) // 128 ELSE 0 END AS BIGINT) AS n128,
           CAST(CASE WHEN b32 > a32 AND b128 > a128
                THEN ((a128 - a32) + (b32 - b128)) // 32
                WHEN b32 > a32 THEN (b32 - a32) // 32
                ELSE 0 END AS BIGINT) AS n32,
           CAST(CASE WHEN b32 > a32
                THEN ((a32 - a) + (b - b32)) // 8
                ELSE (b - a) // 8 END AS BIGINT) AS n8
    FROM r2 JOIN agg ON agg.doc_id = r2.doc_id
    """
    return q, sql


def build_wave22_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("streaming_online_dedup",) + _online_dedup_query()))
    add(*(("bpe_encode_stats_k6",) + _bpe_encode_stats_query(6)))
    add(*(("events_business_day_rollup",) + _business_day_query()))
    add(*(("retention_range_mean_mixed",) + _range_mean_mixed_query()))
    return queries, oracles
