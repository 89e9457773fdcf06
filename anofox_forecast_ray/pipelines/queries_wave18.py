"""Eighteenth query wave: corpus information content and training-set
plumbing — global bigram conditional entropy H(next|prev) (the
information-theoretic compressibility signal), deterministic
train/val/test split assignment by content hash, and RAG-style
overlapping chunking with per-chunk stats (hop = half window, partial
tail kept).

Scale shapes: the entropy query reuses the vocab²-bounded bigram
partials (token rows never shuffle); the split assignment is a pure
per-row hash map + bounded (source, split) partials; the chunker is
in-row index math over the flat token buffer — zero shuffle all three.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from .queries import SQL_TOK, _num_read_blocks, corpus_ds

_FOLD = "(a, b) -> a + b"
_TOK_BITS = 21


def _docs(sf_dir: str, columns):
    import ray.data as rd

    return rd.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=columns,
        override_num_blocks=_num_read_blocks(),
    )


# ------------------------------------------------ bigram cond. entropy
def _cond_entropy_query():
    """H(X_t | X_{t-1}) of the corpus token stream from the global
    bigram table: -sum p(a,b) ln(p(a,b)/p(a)). One output row. The fold
    runs in (t0, t1) order so the SQL list_reduce replays it bitwise."""

    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.rollup import _flat_tokens
        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            values, lengths = _flat_tokens(t)
            empty = pa.table(
                {
                    "t0": pa.array([], type=pa.int64()),
                    "t1": pa.array([], type=pa.int64()),
                    "cnt": pa.array([], type=pa.int64()),
                }
            )
            if values.size < 2:
                return empty
            valid = np.ones(values.size - 1, dtype=bool)
            ends = np.cumsum(lengths)[:-1]
            valid[ends - 1] = False
            a = values[:-1][valid].astype(np.int64)
            b = values[1:][valid].astype(np.int64)
            if a.size == 0:
                return empty
            key = (a << _TOK_BITS) | b
            uk, cnt = np.unique(key, return_counts=True)
            return pa.table(
                {
                    "t0": pa.array(uk >> _TOK_BITS, type=pa.int64()),
                    "t1": pa.array(
                        uk & ((1 << _TOK_BITS) - 1), type=pa.int64()
                    ),
                    "cnt": pa.array(cnt.astype(np.int64), type=pa.int64()),
                }
            )

        def merge(t: pa.Table) -> pa.Table:
            t0 = t.column("t0").to_numpy(zero_copy_only=False)
            t1 = t.column("t1").to_numpy(zero_copy_only=False)
            c = t.column("cnt").to_numpy(zero_copy_only=False)
            key = (t0 << _TOK_BITS) | t1
            order = np.argsort(key, kind="stable")
            uk, start = np.unique(key[order], return_index=True)
            return pa.table(
                {
                    "t0": pa.array(uk >> _TOK_BITS, type=pa.int64()),
                    "t1": pa.array(
                        uk & ((1 << _TOK_BITS) - 1), type=pa.int64()
                    ),
                    "cnt": pa.array(
                        np.add.reduceat(c[order], start).astype(np.int64),
                        type=pa.int64(),
                    ),
                }
            )

        refs = list(
            corpus_ds(sf_dir)
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        final = tree_reduce_tables(refs, merge)
        t0 = final.column("t0").to_numpy(zero_copy_only=False)
        c = final.column("cnt").to_numpy(zero_copy_only=False)
        tot = int(c.sum())
        left: dict[int, int] = {}
        for a, ci in zip(t0, c):
            left[int(a)] = left.get(int(a), 0) + int(ci)
        # fold in (t0, t1) order — the table is already key-sorted
        h = 0.0
        for a, ci in zip(t0, c):
            p_ab = int(ci) / tot
            p_a = left[int(a)] / tot
            h += p_ab * math.log(p_ab / p_a)
        return rd.from_arrow(
            pa.table(
                {
                    "n_bigrams": pa.array([tot], type=pa.int64()),
                    "n_pairs": pa.array([len(c)], type=pa.int64()),
                    "cond_entropy": pa.array([-h], type=pa.float64()),
                }
            )
        )

    sql = f"""
    WITH tok AS ({SQL_TOK}),
    b AS (
        SELECT doc_id,
               lag(token) OVER (PARTITION BY doc_id ORDER BY pos) AS t0,
               token AS t1
        FROM tok
    ),
    c AS (
        SELECT CAST(t0 AS BIGINT) AS t0, CAST(t1 AS BIGINT) AS t1,
               CAST(count(*) AS BIGINT) AS cnt
        FROM b WHERE t0 IS NOT NULL GROUP BY t0, t1
    ),
    lft AS (SELECT t0, CAST(sum(cnt) AS BIGINT) AS lc FROM c GROUP BY t0),
    tt AS (SELECT CAST(sum(cnt) AS BIGINT) AS tot FROM c),
    terms AS (
        SELECT list(
                   (CAST(c.cnt AS DOUBLE) / CAST(tt.tot AS DOUBLE))
                   * ln((CAST(c.cnt AS DOUBLE) / CAST(tt.tot AS DOUBLE))
                        / (CAST(lft.lc AS DOUBLE) / CAST(tt.tot AS DOUBLE)))
                   ORDER BY c.t0, c.t1) AS tl,
               CAST(count(*) AS BIGINT) AS n_pairs,
               any_value(tt.tot) AS n_bigrams
        FROM c JOIN lft USING (t0) CROSS JOIN tt
    )
    SELECT n_bigrams, n_pairs, -list_reduce(tl, {_FOLD}) AS cond_entropy
    FROM terms
    """
    return q, sql


# ------------------------------------------------------ split assignment
TRAIN_HEX, VAL_HEX = "f5", "fa"  # <0xf5 train (~96%), <0xfa val (~2%)


def _split_assign_query():
    """Deterministic train/val/test assignment: first sha256(doc_id)
    byte < 0xf5 -> train, < 0xfa -> val, else test. Stable under
    resharding/retry (pure content hash, no RNG state). Emits the
    bounded (source, split) membership matrix — per-block partials,
    zero shuffle."""

    def q(sf_dir: str):
        import hashlib

        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            ids = t.column("doc_id").to_pylist()
            src = np.asarray(t.column("source").to_pylist(), dtype=object)
            n = t.column("n_chars").to_numpy(zero_copy_only=False).astype(
                np.int64
            )
            hx = np.asarray(
                [
                    hashlib.sha256(str(d).encode()).hexdigest()[:2]
                    for d in ids
                ],
                dtype=object,
            )
            split = np.where(
                hx < TRAIN_HEX, "train", np.where(hx < VAL_HEX, "val", "test")
            ).astype(object)
            key = np.asarray(
                [f"{s}\x00{p}" for s, p in zip(src, split)], dtype=object
            )
            order = np.argsort(key, kind="stable")
            uk, start = np.unique(key[order], return_index=True)
            cnt = (
                np.add.reduceat(np.ones_like(n), start).astype(np.int64)
                if n.size
                else np.zeros(0, np.int64)
            )
            sm = (
                np.add.reduceat(n[order], start).astype(np.int64)
                if n.size
                else np.zeros(0, np.int64)
            )
            parts = [k.split("\x00", 1) for k in uk]
            return pa.table(
                {
                    "source": pa.array(
                        [x[0] for x in parts], type=pa.string()
                    ),
                    "split": pa.array(
                        [x[1] for x in parts], type=pa.string()
                    ),
                    "n_docs": pa.array(cnt, type=pa.int64()),
                    "n_chars": pa.array(sm, type=pa.int64()),
                }
            )

        def merge(t: pa.Table) -> pa.Table:
            s = np.asarray(t.column("source").to_pylist(), dtype=object)
            p = np.asarray(t.column("split").to_pylist(), dtype=object)
            d = t.column("n_docs").to_numpy(zero_copy_only=False)
            c = t.column("n_chars").to_numpy(zero_copy_only=False)
            key = np.asarray(
                [a + "\x00" + b for a, b in zip(s, p)], dtype=object
            )
            order = np.argsort(key, kind="stable")
            uk, start = np.unique(key[order], return_index=True)
            parts = [k.split("\x00", 1) for k in uk]
            return pa.table(
                {
                    "source": pa.array(
                        [x[0] for x in parts], type=pa.string()
                    ),
                    "split": pa.array(
                        [x[1] for x in parts], type=pa.string()
                    ),
                    "n_docs": pa.array(
                        np.add.reduceat(d[order], start).astype(np.int64),
                        type=pa.int64(),
                    ),
                    "n_chars": pa.array(
                        np.add.reduceat(c[order], start).astype(np.int64),
                        type=pa.int64(),
                    ),
                }
            )

        refs = list(
            _docs(sf_dir, ["doc_id", "source", "n_chars"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        return rd.from_arrow(tree_reduce_tables(refs, merge))

    sql = f"""
    WITH a AS (
        SELECT source, n_chars,
               CASE WHEN substr(lower(sha256(CAST(doc_id AS VARCHAR))), 1, 2)
                         < '{TRAIN_HEX}' THEN 'train'
                    WHEN substr(lower(sha256(CAST(doc_id AS VARCHAR))), 1, 2)
                         < '{VAL_HEX}' THEN 'val'
                    ELSE 'test' END AS split
        FROM documents
    )
    SELECT source, split,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS n_chars
    FROM a GROUP BY source, split
    """
    return q, sql


# ------------------------------------------------- overlapping chunker
CHUNK_W, CHUNK_HOP = 128, 64


def _chunk_overlap_query():
    """RAG-style overlapping chunk index: windows of {CHUNK_W} tokens
    every {CHUNK_HOP} (50% overlap), partial tail kept. Emits
    (doc_id, chunk_id, start, len, sum) — per-chunk sums read off a
    per-doc prefix sum, so overlapping windows cost O(1) each and
    nothing shuffles (the chunk table is the retrieval index a vector
    store would ingest)."""

    def q(sf_dir: str):
        from ..stages.rollup import _flat_tokens

        def per_doc(t: pa.Table) -> pa.Table:
            values, lengths = _flat_tokens(t)
            ids = t.column("doc_id").to_pylist()
            empty = pa.table(
                {
                    "doc_id": pa.array([], type=pa.string()),
                    "chunk_id": pa.array([], type=pa.int64()),
                    "start": pa.array([], type=pa.int64()),
                    "len": pa.array([], type=pa.int64()),
                    "sum": pa.array([], type=pa.int64()),
                }
            )
            if values.size == 0:
                return empty
            n_chunks = np.where(
                lengths > 0, (lengths + CHUNK_HOP - 1) // CHUNK_HOP, 0
            ).astype(np.int64)
            row_idx = np.repeat(
                np.arange(lengths.size, dtype=np.int64), n_chunks
            )
            if row_idx.size == 0:
                return empty
            first = np.concatenate(([0], np.cumsum(n_chunks)))[:-1]
            chunk_id = (
                np.arange(row_idx.size, dtype=np.int64)
                - np.repeat(first, n_chunks)
            )
            start = chunk_id * CHUNK_HOP
            ln = np.minimum(CHUNK_W, lengths[row_idx] - start)
            pref = np.concatenate(
                ([0], np.cumsum(values.astype(np.int64)))
            )
            doc0 = np.concatenate(([0], np.cumsum(lengths)))[:-1]
            s = pref[doc0[row_idx] + start + ln] - pref[
                doc0[row_idx] + start
            ]
            return pa.table(
                {
                    "doc_id": pa.array(
                        [ids[i] for i in row_idx], type=pa.string()
                    ),
                    "chunk_id": pa.array(chunk_id, type=pa.int64()),
                    "start": pa.array(start, type=pa.int64()),
                    "len": pa.array(ln, type=pa.int64()),
                    "sum": pa.array(s, type=pa.int64()),
                }
            )

        return corpus_ds(sf_dir).map_batches(
            per_doc, batch_format="pyarrow"
        )

    sql = f"""
    WITH tok AS ({SQL_TOK}),
    n AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n
        FROM tok GROUP BY doc_id
    ),
    ch AS (
        SELECT doc_id,
               unnest(generate_series(
                   0, CAST(n - 1 AS INTEGER), {CHUNK_HOP})) AS start,
               n
        FROM n
    )
    SELECT ch.doc_id,
           CAST(ch.start // {CHUNK_HOP} AS BIGINT) AS chunk_id,
           CAST(ch.start AS BIGINT) AS start,
           CAST(least({CHUNK_W}, ch.n - ch.start) AS BIGINT) AS len,
           CAST(sum(tok.token) AS BIGINT) AS sum
    FROM ch
    JOIN tok ON tok.doc_id = ch.doc_id
            AND tok.pos >= ch.start
            AND tok.pos < ch.start + {CHUNK_W}
    GROUP BY ch.doc_id, ch.start, ch.n
    """
    return q, sql


def build_wave18_queries():
    queries, oracles = {}, {}

    def add(name, q, sql):
        queries[name] = q
        oracles[name] = sql

    add(*(("corpus_bigram_cond_entropy",) + _cond_entropy_query()))
    add(*(("doc_split_assign",) + _split_assign_query()))
    add(*(("doc_chunk_overlap",) + _chunk_overlap_query()))
    return queries, oracles
