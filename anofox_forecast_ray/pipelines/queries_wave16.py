"""Sixteenth query wave: corpus-hygiene + event-sequence operators —
passage-level exact dedup (Lee et al. duplicated-span stats), event-type
Markov transition counts, per-source log2 length histogram, embedding
nearest-seed cluster assignment. Every query carries a bitwise DuckDB
oracle.

Scale shapes:
  - passage dedup: per-block (hash, doc) pre-aggregation BEFORE the
    shuffle; both shuffles move only (16-hex hash, int64, int64) rows,
    never document text;
  - transitions: shuffle is (user, ts, type) triples pruned at the read;
    the (from, to) key space is bounded, so the final aggregate is
    per-block partials + tree reduce, not a second shuffle;
  - histogram: (source, bucket) space is bounded — zero shuffle;
  - cluster assign: seed matrix broadcast once via ray.put; per-batch
    distance fold is a vectorized cumsum (sequential fold, SQL-exact).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from .queries import _cast, _num_read_blocks
from ._scaffold import read_cols

PASSAGE_W = 3
N_SEEDS = 8


def _docs(sf_dir: str, columns):
    import ray.data as rd

    return rd.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=columns,
        override_num_blocks=_num_read_blocks(),
    )


def _events(sf_dir: str, columns):
    import ray.data as rd

    return rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=columns,
        override_num_blocks=_num_read_blocks(),
    )


# ----------------------------------------------------------- passage dedup
def _passage_dedup_query(w: int = PASSAGE_W):
    """Duplicated-passage stats per doc (Lee et al., "Deduplicating
    Training Data Makes Language Models Better"): segment each doc into
    consecutive non-overlapping ``w``-word passages, hash each passage
    (sha256 prefix, collision-free at any corpus size that fits 2^64),
    count occurrences corpus-wide, and report per doc how many of its
    passages are duplicated anywhere (multiplicity counted).

    dup_frac is one f64 division of two int64s — bit-identical to SQL.
    """

    def q(sf_dir: str):
        def passages(t: pa.Table) -> pa.Table:
            rows: dict[tuple, int] = {}
            for did, txt in zip(
                t.column("doc_id").to_pylist(),
                t.column("text").to_pylist(),
            ):
                words = (txt or "").split(" ")
                for s in range(len(words) // w):
                    seg = " ".join(words[s * w : s * w + w])
                    ph = hashlib.sha256(seg.encode()).hexdigest()[:16]
                    k = (ph, did)
                    rows[k] = rows.get(k, 0) + 1
            ks = sorted(rows)
            return pa.table(
                {
                    "ph": pa.array([k[0] for k in ks], type=pa.string()),
                    "doc_id": pa.array(
                        [k[1] for k in ks], type=pa.int64()
                    ),
                    "c": pa.array([rows[k] for k in ks], type=pa.int64()),
                }
            )

        def mark_dups(g: pa.Table) -> pa.Table:
            c = g.column("c").to_numpy(zero_copy_only=False)
            total = int(c.sum())
            dup = c if total > 1 else np.zeros_like(c)
            return pa.table(
                {
                    "doc_id": g.column("doc_id").cast(pa.int64()),
                    "c": pa.array(c, type=pa.int64()),
                    "dup": pa.array(dup, type=pa.int64()),
                }
            )

        def per_doc(g: pa.Table) -> pa.Table:
            c = g.column("c").to_numpy(zero_copy_only=False)
            d = int(g.column("dup").to_numpy(
                zero_copy_only=False).sum())
            n = int(c.sum())
            return pa.table(
                {
                    "doc_id": pa.array(
                        [int(g.column("doc_id")[0].as_py())],
                        type=pa.int64(),
                    ),
                    "n_passages": pa.array([n], type=pa.int64()),
                    "n_dup_passages": pa.array([d], type=pa.int64()),
                    "dup_frac": pa.array(
                        [float(np.float64(d) / np.float64(n))],
                        type=pa.float64(),
                    ),
                }
            )

        ds = (
            _docs(sf_dir, ["doc_id", "text"])
            .map_batches(passages, batch_format="pyarrow")
            .groupby("ph")
            .map_groups(mark_dups, batch_format="pyarrow")
            .groupby("doc_id")
            .map_groups(per_doc, batch_format="pyarrow")
        )
        return _cast(
            ds,
            {
                "doc_id": pa.int64(),
                "n_passages": pa.int64(),
                "n_dup_passages": pa.int64(),
                "dup_frac": pa.float64(),
            },
        )

    sql = f"""
    WITH words AS (
        SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ),
    seg AS (
        SELECT doc_id, unnest(range(0, len(ws) // {w})) AS s, ws
        FROM words
    ),
    p AS (
        SELECT doc_id,
               substr(sha256(array_to_string(
                   list_slice(ws, s * {w} + 1, s * {w} + {w}), ' ')),
                   1, 16) AS ph
        FROM seg
    ),
    per AS (
        SELECT ph, doc_id, CAST(count(*) AS BIGINT) AS c
        FROM p GROUP BY 1, 2
    ),
    tot AS (SELECT ph, sum(c) AS t FROM per GROUP BY 1)
    SELECT per.doc_id,
           CAST(sum(per.c) AS BIGINT) AS n_passages,
           CAST(sum(CASE WHEN tot.t > 1 THEN per.c ELSE 0 END)
                AS BIGINT) AS n_dup_passages,
           CAST(sum(CASE WHEN tot.t > 1 THEN per.c ELSE 0 END) AS DOUBLE)
               / CAST(sum(per.c) AS DOUBLE) AS dup_frac
    FROM per JOIN tot USING (ph) GROUP BY 1
    """
    return q, sql


# ------------------------------------------------------- type transitions
def _transitions_query():
    """Markov transition counts over per-user event-type sequences
    (ordered by ts with event_id tie-break). The per-user shuffle moves
    pruned (user, ts, type, id) rows; per-user pair counting is
    vectorized; the bounded (from, to) matrix tree-reduces with no
    second shuffle."""

    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def prune(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "user_id": t.column("user_id").cast(pa.int64()),
                    "tus": t.column("ts").cast(pa.int64()),
                    "eid": t.column("event_id").cast(pa.int64()),
                    "et": t.column("event_type").cast(pa.string()),
                }
            )

        def per_user(g: pa.Table) -> pa.Table:
            # eid unique -> total order; per-user transition counts via
            # a NUL-joined key sort + reduceat (exact int counts,
            # replaces the pandas groupby-size)
            g = g.sort_by([("tus", "ascending"), ("eid", "ascending")])
            et = np.asarray(g.column("et").to_pylist(), dtype=object)
            if et.size < 2:
                return pa.table(
                    {"from_type": pa.array([], type=pa.string()),
                     "to_type": pa.array([], type=pa.string()),
                     "cnt": pa.array([], type=pa.int64())}
                )
            key = np.asarray(
                [a + "\x00" + b for a, b in zip(et[:-1], et[1:])],
                dtype=object,
            )
            order = np.argsort(key, kind="stable")
            uk, start = np.unique(key[order], return_index=True)
            cnt = np.diff(np.r_[start, key.size]).astype(np.int64)
            sm = [k.split("\x00", 1) for k in uk]
            return pa.table(
                {
                    "from_type": pa.array(
                        [x[0] for x in sm], type=pa.string()
                    ),
                    "to_type": pa.array(
                        [x[1] for x in sm], type=pa.string()
                    ),
                    "cnt": pa.array(cnt, type=pa.int64()),
                }
            )

        def merge(t: pa.Table) -> pa.Table:
            f = np.asarray(t.column("from_type").to_pylist(), dtype=object)
            to = np.asarray(t.column("to_type").to_pylist(), dtype=object)
            c = t.column("cnt").to_numpy(zero_copy_only=False)
            key = np.asarray(
                [a + "\x00" + b for a, b in zip(f, to)], dtype=object
            )
            order = np.argsort(key, kind="stable")
            uk, start = np.unique(key[order], return_index=True)
            cm = np.add.reduceat(c[order], start).astype(np.int64)
            sm = [k.split("\x00", 1) for k in uk]
            return pa.table(
                {
                    "from_type": pa.array(
                        [x[0] for x in sm], type=pa.string()
                    ),
                    "to_type": pa.array(
                        [x[1] for x in sm], type=pa.string()
                    ),
                    "cnt": pa.array(cm, type=pa.int64()),
                }
            )

        refs = list(
            _events(sf_dir, ["user_id", "ts", "event_id", "event_type"])
            .map_batches(prune, batch_format="pyarrow")
            .groupby("user_id")
            .map_groups(per_user, batch_format="pyarrow")
            .to_arrow_refs()
        )
        # blocks hold per-user rows, so a lone block still needs one merge
        return rd.from_arrow(merge(tree_reduce_tables(refs, merge)))

    sql = """
    WITH o AS (
        SELECT user_id, event_type AS ft,
               lead(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS tt
        FROM events
    )
    SELECT ft AS from_type, tt AS to_type,
           CAST(count(*) AS BIGINT) AS cnt
    FROM o WHERE tt IS NOT NULL GROUP BY 1, 2
    """
    return q, sql


# ------------------------------------------------------ length histogram
def _length_histogram_query():
    """Per-source log2 histogram of document lengths: bucket =
    bit_length(n_chars) (np.frexp exponent — exact for ints < 2^53).
    (source, bucket) space is bounded: per-block partials + tree reduce,
    zero shuffle."""

    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            src = np.asarray(t.column("source").to_pylist(), dtype=object)
            n = t.column("n_chars").to_numpy(zero_copy_only=False).astype(
                np.int64
            )
            bucket = np.frexp(n.astype(np.float64))[1].astype(np.int64)
            bucket[n == 0] = 1  # '0' prints as one binary digit
            key = np.asarray(
                [f"{s}\x00{b:03d}" for s, b in zip(src, bucket)],
                dtype=object,
            )
            order = np.argsort(key, kind="stable")
            uk, start = np.unique(key[order], return_index=True)
            cnt = np.add.reduceat(
                np.ones_like(n), start
            ).astype(np.int64) if n.size else np.zeros(0, np.int64)
            sm = np.add.reduceat(n[order], start).astype(np.int64) \
                if n.size else np.zeros(0, np.int64)
            parts = [k.split("\x00", 1) for k in uk]
            return pa.table(
                {
                    "source": pa.array(
                        [x[0] for x in parts], type=pa.string()
                    ),
                    "bucket": pa.array(
                        [int(x[1]) for x in parts], type=pa.int64()
                    ),
                    "cnt": pa.array(cnt, type=pa.int64()),
                    "sum_chars": pa.array(sm, type=pa.int64()),
                }
            )

        def merge(t: pa.Table) -> pa.Table:
            src = np.asarray(t.column("source").to_pylist(), dtype=object)
            b = t.column("bucket").to_numpy(zero_copy_only=False)
            c = t.column("cnt").to_numpy(zero_copy_only=False)
            s = t.column("sum_chars").to_numpy(zero_copy_only=False)
            key = np.asarray(
                [f"{a}\x00{bb:03d}" for a, bb in zip(src, b)], dtype=object
            )
            order = np.argsort(key, kind="stable")
            uk, start = np.unique(key[order], return_index=True)
            cm = np.add.reduceat(c[order], start).astype(np.int64)
            sm = np.add.reduceat(s[order], start).astype(np.int64)
            parts = [k.split("\x00", 1) for k in uk]
            return pa.table(
                {
                    "source": pa.array(
                        [x[0] for x in parts], type=pa.string()
                    ),
                    "bucket": pa.array(
                        [int(x[1]) for x in parts], type=pa.int64()
                    ),
                    "cnt": pa.array(cm, type=pa.int64()),
                    "sum_chars": pa.array(sm, type=pa.int64()),
                }
            )

        refs = list(
            _docs(sf_dir, ["source", "n_chars"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        return rd.from_arrow(tree_reduce_tables(refs, merge))

    sql = """
    SELECT source,
           CAST(length(format('{:b}', n_chars)) AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS cnt,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars
    FROM documents GROUP BY 1, 2
    """
    return q, sql


# ------------------------------------------------------- cluster assign
def _cluster_assign_query(k: int = N_SEEDS):
    """Nearest-seed assignment (the SemDeDup / k-means assignment step):
    the first ``k`` vectors by vec_id are the seed centroids, broadcast
    once via ray.put; each batch computes squared-L2 distances with a
    vectorized cumsum fold over the feature axis (sequential left fold —
    bit-identical to DuckDB's list_reduce) and assigns argmin with
    (dist, sid) tie-break."""

    def q(sf_dir: str):
        import ray
        import ray.data as rd

        from ..extras.ann import _to_matrix

        emb = read_cols(sf_dir, "embeddings", ["vec_id", "embedding"])
        seed_rows = sorted(
            emb.filter(lambda r: r["vec_id"] < k).take_all(),
            key=lambda r: r["vec_id"],
        )
        seeds = np.asarray(
            [r["embedding"] for r in seed_rows], dtype=np.float64
        )
        sids = np.asarray([r["vec_id"] for r in seed_rows], dtype=np.int64)
        seeds_ref = ray.put((sids, seeds))

        class Assign:
            def __init__(self, ref):
                self.sids, self.seeds = ray.get(ref)

            def __call__(self, t: pa.Table) -> pa.Table:
                x = _to_matrix(t.column("embedding"))
                diff = x[:, None, :] - self.seeds[None, :, :]
                # cumsum = sequential left fold == DuckDB list_reduce
                dist = np.cumsum(diff * diff, axis=2)[:, :, -1]
                j = np.argmin(dist, axis=1)  # first min -> lowest sid
                return pa.table(
                    {
                        "vec_id": t.column("vec_id").cast(pa.int64()),
                        "cluster": pa.array(
                            self.sids[j], type=pa.int64()
                        ),
                        "dist": pa.array(
                            dist[np.arange(len(j)), j],
                            type=pa.float64(),
                        ),
                    }
                )

        ds = emb.map_batches(
            Assign,
            fn_constructor_args=(seeds_ref,),
            batch_format="pyarrow",
            concurrency=2,
        )
        return _cast(
            ds,
            {"vec_id": pa.int64(), "cluster": pa.int64(),
             "dist": pa.float64()},
        )

    sql = f"""
    WITH seeds AS (
        SELECT vec_id AS sid, embedding AS se FROM embeddings
        WHERE vec_id < {k}
    ),
    d AS (
        SELECT e.vec_id, s.sid,
               list_reduce(list_transform(
                   range(1, len(e.embedding) + 1),
                   i -> (CAST(e.embedding[i] AS DOUBLE)
                         - CAST(s.se[i] AS DOUBLE))
                        * (CAST(e.embedding[i] AS DOUBLE)
                           - CAST(s.se[i] AS DOUBLE))),
                   (acc, x) -> acc + x) AS dist
        FROM embeddings e CROSS JOIN seeds s
    ),
    r AS (
        SELECT vec_id, sid, dist,
               row_number() OVER (
                   PARTITION BY vec_id ORDER BY dist, sid
               ) AS rn
        FROM d
    )
    SELECT vec_id, sid AS cluster, dist FROM r WHERE rn = 1
    """
    return q, sql


def build_wave16_queries():
    queries, oracles = {}, {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("doc_passage_dedup",) + _passage_dedup_query()))
    add(*(("events_type_transitions",) + _transitions_query()))
    add(*(("doc_length_histogram",) + _length_histogram_query()))
    add(*(("embedding_cluster_assign",) + _cluster_assign_query()))
    return queries, oracles
