"""Wave-52 queries: the word-level family — canonical WordCount, doc
vocabulary, and word-length statistics.

The corpus separates words with single spaces, so word ops split on
' ' on both sides (DuckDB string_split(text, ' ')); empty fragments
from leading/trailing/double spaces are dropped identically.

- corpus_word_count_topk: THE canonical distributed WordCount — per
  block word-count partials, one groupby on the word, top-20 by
  (count desc, word asc).
- doc_word_vocab: distinct words and hapax (once-only) words per doc —
  the lexical-richness pair.
- doc_word_len_stats: words, exact character-sum and max word length
  per doc; mean length one division.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .queries import _cast, _num_read_blocks
from ._scaffold import read_cols

TOPK = 20

SQL_WORDS = """
    SELECT CAST(doc_id AS BIGINT) AS doc_id, w AS word
    FROM (
        SELECT doc_id, unnest(string_split(text, ' ')) AS w
        FROM documents
    ) WHERE w <> ''
"""


def _words_of(txt: str) -> list:
    return [w for w in (txt or "").split(" ") if w]


# ---------------------------------------------------- corpus_word_count_topk
def _word_count_query(topk: int = TOPK):
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            if "text" not in t.column_names:
                return pa.table(
                    {"word": pa.array([], type=pa.string()),
                     "cnt": pa.array([], type=pa.int64())}
                )
            counts: dict = {}
            for txt in t.column("text").to_pylist():
                for w in _words_of(txt):
                    counts[w] = counts.get(w, 0) + 1
            words = sorted(counts)
            return pa.table(
                {"word": pa.array(words, type=pa.string()),
                 "cnt": pa.array([counts[w] for w in words],
                                 type=pa.int64())}
            )

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by("word").aggregate([("cnt", "sum")])
            return pa.table(
                {"word": g.column("word"),
                 "cnt": g.column("cnt_sum").cast(pa.int64())}
            )

        refs = list(
            read_cols(sf_dir, "documents", ["text"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        a = tree_reduce_tables(refs, merge).to_pandas()
        a = a.sort_values(["cnt", "word"],
                          ascending=[False, True]).head(topk)
        a = a.reset_index(drop=True)
        a["rk"] = np.arange(1, len(a) + 1, dtype=np.int64)
        return pa.table(
            {"rk": pa.array(a["rk"].to_numpy(np.int64)),
             "word": pa.array(a["word"], type=pa.string()),
             "cnt": pa.array(a["cnt"].to_numpy(np.int64))}
        )

    sql = f"""
    WITH w AS ({SQL_WORDS}),
    c AS (
        SELECT word, CAST(count(*) AS BIGINT) AS cnt FROM w
        GROUP BY word
    )
    SELECT CAST(row_number() OVER (ORDER BY cnt DESC, word)
                AS BIGINT) AS rk, word, cnt
    FROM c ORDER BY cnt DESC, word LIMIT {topk}
    """
    return q, sql


# -------------------------------------------------------- doc_word_vocab
def _word_vocab_query():
    def q(sf_dir: str):
        import ray.data as rd

        def vocab(t: pa.Table) -> pa.Table:
            empty = pa.table(
                {"doc_id": pa.array([], type=pa.int64()),
                 "n_words": pa.array([], type=pa.int64()),
                 "n_distinct": pa.array([], type=pa.int64()),
                 "n_hapax": pa.array([], type=pa.int64())}
            )
            if "doc_id" not in t.column_names:
                return empty
            out = {k: [] for k in
                   ("doc_id", "n_words", "n_distinct", "n_hapax")}
            for did, txt in zip(
                t.column("doc_id").to_pylist(),
                t.column("text").to_pylist(),
            ):
                ws = _words_of(txt)
                if not ws:
                    continue
                u, c = np.unique(np.asarray(ws), return_counts=True)
                out["doc_id"].append(int(did))
                out["n_words"].append(len(ws))
                out["n_distinct"].append(int(u.size))
                out["n_hapax"].append(int((c == 1).sum()))
            return pa.table(
                {k: pa.array(out[k], type=pa.int64()) for k in out}
            )

        ds = read_cols(sf_dir, "documents", ["doc_id", "text"]).map_batches(vocab, batch_format="pyarrow")
        return _cast(
            ds,
            {"doc_id": pa.int64(), "n_words": pa.int64(),
             "n_distinct": pa.int64(), "n_hapax": pa.int64()},
        )

    sql = f"""
    WITH w AS ({SQL_WORDS}),
    c AS (
        SELECT doc_id, word, CAST(count(*) AS BIGINT) AS cnt
        FROM w GROUP BY doc_id, word
    )
    SELECT doc_id,
           CAST(sum(cnt) AS BIGINT) AS n_words,
           CAST(count(*) AS BIGINT) AS n_distinct,
           CAST(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_hapax
    FROM c GROUP BY doc_id
    """
    return q, sql


# ----------------------------------------------------- doc_word_len_stats
def _word_len_query():
    def q(sf_dir: str):
        import ray.data as rd

        def stats(t: pa.Table) -> pa.Table:
            empty = pa.table(
                {"doc_id": pa.array([], type=pa.int64()),
                 "n_words": pa.array([], type=pa.int64()),
                 "sum_len": pa.array([], type=pa.int64()),
                 "max_len": pa.array([], type=pa.int64()),
                 "mean_len": pa.array([], type=pa.float64())}
            )
            if "doc_id" not in t.column_names:
                return empty
            out_id, out_n, out_s, out_m, out_mean = (
                [], [], [], [], []
            )
            for did, txt in zip(
                t.column("doc_id").to_pylist(),
                t.column("text").to_pylist(),
            ):
                ws = _words_of(txt)
                if not ws:
                    continue
                lens = np.asarray([len(w) for w in ws],
                                  dtype=np.int64)
                s = int(lens.sum())
                out_id.append(int(did))
                out_n.append(int(lens.size))
                out_s.append(s)
                out_m.append(int(lens.max()))
                out_mean.append(
                    float(np.float64(s)
                          / np.float64(int(lens.size)))
                )
            return pa.table(
                {"doc_id": pa.array(out_id, type=pa.int64()),
                 "n_words": pa.array(out_n, type=pa.int64()),
                 "sum_len": pa.array(out_s, type=pa.int64()),
                 "max_len": pa.array(out_m, type=pa.int64()),
                 "mean_len": pa.array(out_mean,
                                      type=pa.float64())}
            )

        ds = read_cols(sf_dir, "documents", ["doc_id", "text"]).map_batches(stats, batch_format="pyarrow")
        return _cast(
            ds,
            {"doc_id": pa.int64(), "n_words": pa.int64(),
             "sum_len": pa.int64(), "max_len": pa.int64(),
             "mean_len": pa.float64()},
        )

    sql = f"""
    WITH w AS ({SQL_WORDS})
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_words,
           CAST(sum(length(word)) AS BIGINT) AS sum_len,
           CAST(max(length(word)) AS BIGINT) AS max_len,
           CAST(sum(length(word)) AS DOUBLE)
               / CAST(count(*) AS DOUBLE) AS mean_len
    FROM w GROUP BY doc_id
    """
    return q, sql


def build_wave52_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("corpus_word_count_topk",) + _word_count_query()))
    add(*(("doc_word_vocab",) + _word_vocab_query()))
    add(*(("doc_word_len_stats",) + _word_len_query()))
    return queries, oracles
