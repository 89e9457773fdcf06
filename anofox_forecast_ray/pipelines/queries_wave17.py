"""Seventeenth query wave: corpus-mixing / data-diet operators for
LLM training pipelines — per-source token-distribution KL divergence
vs the global mix, Zipf rank-frequency slope, vocabulary novelty curve
(first-occurrence token types per doc), pow-2 padding-waste buckets,
global bigram top-k, and temperature-based source sampling weights
(the XLM-R / Gopher alpha-mixing rule, alpha=0.5).

Scale shape shared by the token-distribution queries: the (source,
token) space is bounded by |sources| x |vocab| — per-block vectorized
partial counts, tree-combined; token rows never shuffle. The final
arithmetic runs on a vocabulary-sized table. Every float fold is a
sequential left fold so the DuckDB ``list_reduce`` oracle replays it
bitwise (see CLAUDE.md invariants).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from .queries import SQL_TOK, _num_read_blocks, corpus_ds

_FOLD = "(a, b) -> a + b"
_TOK_BITS = 21  # unicode codepoints < 2^21


def _docs(sf_dir: str, columns):
    import ray.data as rd

    return rd.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=columns,
        override_num_blocks=_num_read_blocks(),
    )


def _merge_src_tok(t: pa.Table) -> pa.Table:
    s = np.asarray(t.column("source").to_pylist(), dtype=object)
    tok = t.column("token").to_numpy(zero_copy_only=False)
    c = t.column("cnt").to_numpy(zero_copy_only=False)
    order = np.lexsort((tok, s))
    s, tok, c = s[order], tok[order], c[order]
    new = np.concatenate(([True], (s[1:] != s[:-1]) | (tok[1:] != tok[:-1])))
    start = np.flatnonzero(new)
    return pa.table(
        {
            "source": pa.array(list(s[start]), type=pa.string()),
            "token": pa.array(tok[start], type=pa.int64()),
            "cnt": pa.array(
                np.add.reduceat(c, start).astype(np.int64), type=pa.int64()
            ),
        }
    )


def _src_tok_counts(sf_dir: str) -> pa.Table:
    """Distributed (source, token) counts: bounded-cardinality partials
    per block + tree reduce. Returns a vocabulary-sized driver table."""
    from ..stages.rollup import _flat_tokens
    from ..stages.source_rollup import tree_reduce_tables

    def partial(t: pa.Table) -> pa.Table:
        values, lengths = _flat_tokens(t)
        src = np.asarray(t.column("source").to_pylist(), dtype=object)
        if values.size == 0:
            return pa.table(
                {
                    "source": pa.array([], type=pa.string()),
                    "token": pa.array([], type=pa.int64()),
                    "cnt": pa.array([], type=pa.int64()),
                }
            )
        usrc, inv = np.unique(src, return_inverse=True)
        row_idx = np.repeat(np.arange(lengths.size, dtype=np.int64), lengths)
        key = (inv[row_idx].astype(np.int64) << _TOK_BITS) | values.astype(
            np.int64
        )
        uk, cnt = np.unique(key, return_counts=True)
        return pa.table(
            {
                "source": pa.array(
                    [usrc[k >> _TOK_BITS] for k in uk], type=pa.string()
                ),
                "token": pa.array(
                    uk & ((1 << _TOK_BITS) - 1), type=pa.int64()
                ),
                "cnt": pa.array(cnt.astype(np.int64), type=pa.int64()),
            }
        )

    refs = list(
        corpus_ds(sf_dir)
        .map_batches(partial, batch_format="pyarrow")
        .to_arrow_refs()
    )
    return tree_reduce_tables(refs, _merge_src_tok)


def _counts_by_source(counts: pa.Table):
    """-> sorted dict source -> list[(token, cnt)] (token asc), plus
    the global per-token counts and the global total."""
    s = np.asarray(counts.column("source").to_pylist(), dtype=object)
    tok = counts.column("token").to_numpy(zero_copy_only=False)
    c = counts.column("cnt").to_numpy(zero_copy_only=False)
    per_src: dict[str, list[tuple[int, int]]] = {}
    glob: dict[int, int] = {}
    for si, ti, ci in zip(s, tok, c):
        per_src.setdefault(si, []).append((int(ti), int(ci)))
        glob[int(ti)] = glob.get(int(ti), 0) + int(ci)
    for v in per_src.values():
        v.sort()
    gtot = int(c.sum())
    return per_src, glob, gtot


# ------------------------------------------------------------ KL vs global
def _kl_query():
    """KL(source || global) of token distributions — the data-mixing
    skew diagnostic. Distributed part: bounded (source, token) partial
    counts (no token-row shuffle); KL itself is a vocabulary-sized
    sequential fold per source, bit-replayed by the SQL list_reduce."""

    def q(sf_dir: str):
        import ray.data as rd

        per_src, glob, gtot = _counts_by_source(_src_tok_counts(sf_dir))
        out = {"source": [], "n_tokens": [], "n_types": [], "kl": []}
        for src in sorted(per_src):
            rows = per_src[src]
            tot = sum(ci for _, ci in rows)
            kl = 0.0
            for ti, ci in rows:  # token asc — the oracle's fold order
                p = ci / tot
                qg = glob[ti] / gtot
                kl += p * math.log(p / qg)
            out["source"].append(src)
            out["n_tokens"].append(tot)
            out["n_types"].append(len(rows))
            out["kl"].append(kl)
        return rd.from_arrow(
            pa.table(
                {
                    "source": pa.array(out["source"], type=pa.string()),
                    "n_tokens": pa.array(out["n_tokens"], type=pa.int64()),
                    "n_types": pa.array(out["n_types"], type=pa.int64()),
                    "kl": pa.array(out["kl"], type=pa.float64()),
                }
            )
        )

    sql = f"""
    WITH tok AS ({SQL_TOK}),
    wc AS (
        SELECT source, token, CAST(count(*) AS BIGINT) AS cnt
        FROM tok GROUP BY source, token
    ),
    tot AS (
        SELECT source, CAST(sum(cnt) AS BIGINT) AS tot,
               CAST(count(*) AS BIGINT) AS n_types
        FROM wc GROUP BY source
    ),
    g AS (
        SELECT token, CAST(sum(cnt) AS BIGINT) AS gcnt FROM wc GROUP BY token
    ),
    gt AS (SELECT CAST(sum(cnt) AS BIGINT) AS gtot FROM wc),
    terms AS (
        SELECT wc.source,
               list(
                   (CAST(wc.cnt AS DOUBLE) / CAST(tot.tot AS DOUBLE))
                   * ln((CAST(wc.cnt AS DOUBLE) / CAST(tot.tot AS DOUBLE))
                        / (CAST(g.gcnt AS DOUBLE) / CAST(gt.gtot AS DOUBLE)))
                   ORDER BY wc.token) AS tl
        FROM wc
        JOIN tot USING (source)
        JOIN g USING (token)
        CROSS JOIN gt
        GROUP BY wc.source
    )
    SELECT tot.source, tot.tot AS n_tokens, tot.n_types,
           list_reduce(tl, {_FOLD}) AS kl
    FROM terms JOIN tot ON terms.source = tot.source
    """
    return q, sql


# ------------------------------------------------------------- Zipf slope
ZIPF_K = 16


def _zipf_query():
    """OLS slope of ln(freq) on ln(rank) over each source's top-K token
    types (rank by cnt desc, token asc — total order). The four OLS sums
    are sequential left folds in rank order (doc_ols_trend's Cramer
    pattern)."""

    def q(sf_dir: str):
        import ray.data as rd

        per_src, _, _ = _counts_by_source(_src_tok_counts(sf_dir))
        out = {"source": [], "m": [], "slope": [], "intercept": []}
        for src in sorted(per_src):
            ranked = sorted(per_src[src], key=lambda tc: (-tc[1], tc[0]))
            ranked = ranked[:ZIPF_K]
            m = len(ranked)
            if m < 2:
                continue
            sx = sy = sxx = sxy = 0.0
            for r, (_, ci) in enumerate(ranked, start=1):
                x = math.log(float(r))
                y = math.log(float(ci))
                sx += x
                sy += y
                sxx += x * x
                sxy += x * y
            nf = float(m)
            det = nf * sxx - sx * sx
            slope = 0.0 if det == 0 else (nf * sxy - sx * sy) / det
            intercept = (
                sy / nf
                if det == 0
                else (sy - (nf * sxy - sx * sy) / det * sx) / nf
            )
            out["source"].append(src)
            out["m"].append(m)
            out["slope"].append(slope)
            out["intercept"].append(intercept)
        return rd.from_arrow(
            pa.table(
                {
                    "source": pa.array(out["source"], type=pa.string()),
                    "m": pa.array(out["m"], type=pa.int64()),
                    "slope": pa.array(out["slope"], type=pa.float64()),
                    "intercept": pa.array(
                        out["intercept"], type=pa.float64()
                    ),
                }
            )
        )

    sql = f"""
    WITH tok AS ({SQL_TOK}),
    wc AS (
        SELECT source, token, CAST(count(*) AS BIGINT) AS cnt
        FROM tok GROUP BY source, token
    ),
    rk AS (
        SELECT source, cnt,
               row_number() OVER (
                   PARTITION BY source ORDER BY cnt DESC, token ASC
               ) AS r
        FROM wc
    ),
    top AS (SELECT * FROM rk WHERE r <= {ZIPF_K}),
    s AS (
        SELECT source,
               CAST(count(*) AS BIGINT) AS m,
               CAST(count(*) AS DOUBLE) AS nf,
               list_reduce(
                   list(ln(CAST(r AS DOUBLE)) ORDER BY r), {_FOLD}) AS sx,
               list_reduce(
                   list(ln(CAST(cnt AS DOUBLE)) ORDER BY r), {_FOLD}) AS sy,
               list_reduce(
                   list(ln(CAST(r AS DOUBLE)) * ln(CAST(r AS DOUBLE))
                        ORDER BY r), {_FOLD}) AS sxx,
               list_reduce(
                   list(ln(CAST(r AS DOUBLE)) * ln(CAST(cnt AS DOUBLE))
                        ORDER BY r), {_FOLD}) AS sxy
        FROM top GROUP BY source HAVING count(*) >= 2
    )
    SELECT source, m,
           CASE WHEN nf * sxx - sx * sx = 0 THEN 0.0e0
                ELSE (nf * sxy - sx * sy) / (nf * sxx - sx * sx) END AS slope,
           CASE WHEN nf * sxx - sx * sx = 0 THEN sy / nf
                ELSE (sy - (nf * sxy - sx * sy) / (nf * sxx - sx * sx) * sx)
                     / nf END AS intercept
    FROM s
    """
    return q, sql


# ------------------------------------------------------- vocabulary novelty
def _novelty_query():
    """Vocabulary novelty curve: for each doc, how many of its distinct
    token types occur for the FIRST time in the corpus (first occurrence
    = minimum numeric doc_id). Two passes, both shuffle-free: (1)
    per-block (token, min doc) partials tree-reduced to a vocab-sized
    first-occurrence map; (2) the map is broadcast via ray.put and each
    block counts its docs' new types locally. All-integer — exact."""

    def q(sf_dir: str):
        import ray

        from ..stages.rollup import _flat_tokens
        from ..stages.source_rollup import tree_reduce_tables

        def first_partial(t: pa.Table) -> pa.Table:
            values, lengths = _flat_tokens(t)
            if values.size == 0:
                return pa.table(
                    {
                        "token": pa.array([], type=pa.int64()),
                        "first_doc": pa.array([], type=pa.int64()),
                    }
                )
            docs = np.asarray(
                [int(d) for d in t.column("doc_id").to_pylist()],
                dtype=np.int64,
            )
            row_idx = np.repeat(
                np.arange(lengths.size, dtype=np.int64), lengths
            )
            dnum = docs[row_idx]
            order = np.lexsort((dnum, values))
            vs, ds_ = values[order].astype(np.int64), dnum[order]
            first = np.concatenate(([True], vs[1:] != vs[:-1]))
            return pa.table(
                {
                    "token": pa.array(vs[first], type=pa.int64()),
                    "first_doc": pa.array(ds_[first], type=pa.int64()),
                }
            )

        def merge_first(t: pa.Table) -> pa.Table:
            tok = t.column("token").to_numpy(zero_copy_only=False)
            fd = t.column("first_doc").to_numpy(zero_copy_only=False)
            order = np.lexsort((fd, tok))
            tok, fd = tok[order], fd[order]
            first = np.concatenate(([True], tok[1:] != tok[:-1]))
            return pa.table(
                {
                    "token": pa.array(tok[first], type=pa.int64()),
                    "first_doc": pa.array(fd[first], type=pa.int64()),
                }
            )

        refs = list(
            corpus_ds(sf_dir)
            .map_batches(first_partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        fmap = tree_reduce_tables(refs, merge_first)
        fmap_ref = ray.put(
            (
                fmap.column("token").to_numpy(zero_copy_only=False),
                fmap.column("first_doc").to_numpy(zero_copy_only=False),
            )
        )

        class NoveltyStage:
            def __init__(self, fmap_ref):
                self.toks, self.firsts = ray.get(fmap_ref)

            def __call__(self, t: pa.Table) -> pa.Table:
                values, lengths = _flat_tokens(t)
                ids = t.column("doc_id").to_pylist()
                if values.size == 0:
                    return pa.table(
                        {
                            "doc_id": pa.array([], type=pa.string()),
                            "n_types": pa.array([], type=pa.int64()),
                            "n_new": pa.array([], type=pa.int64()),
                        }
                    )
                docs = np.asarray([int(d) for d in ids], dtype=np.int64)
                row_idx = np.repeat(
                    np.arange(lengths.size, dtype=np.int64), lengths
                )
                key = (row_idx << _TOK_BITS) | values.astype(np.int64)
                uk = np.unique(key)
                rid = uk >> _TOK_BITS
                tk = uk & ((1 << _TOK_BITS) - 1)
                pos = np.searchsorted(self.toks, tk)
                is_new = self.firsts[pos] == docs[rid]
                n_types = np.bincount(rid, minlength=lengths.size)
                n_new = np.bincount(
                    rid, weights=is_new.astype(np.int64),
                    minlength=lengths.size,
                ).astype(np.int64)
                keep = n_types > 0
                idx = np.flatnonzero(keep)
                return pa.table(
                    {
                        "doc_id": pa.array(
                            [ids[i] for i in idx], type=pa.string()
                        ),
                        "n_types": pa.array(
                            n_types[keep].astype(np.int64), type=pa.int64()
                        ),
                        "n_new": pa.array(n_new[keep], type=pa.int64()),
                    }
                )

        return corpus_ds(sf_dir).map_batches(
            NoveltyStage,
            fn_constructor_args=(fmap_ref,),
            batch_format="pyarrow",
            concurrency=(1, 4),
            num_cpus=1,
        )

    sql = """
    WITH tok AS (
        SELECT doc_id, unicode(unnest(string_split(text, ''))) AS token
        FROM documents
    ),
    dt AS (SELECT DISTINCT doc_id, token FROM tok),
    f AS (SELECT token, min(doc_id) AS first_doc FROM dt GROUP BY token)
    SELECT CAST(dt.doc_id AS VARCHAR) AS doc_id,
           CAST(count(*) AS BIGINT) AS n_types,
           CAST(sum(CASE WHEN f.first_doc = dt.doc_id THEN 1 ELSE 0 END)
                AS BIGINT) AS n_new
    FROM dt JOIN f USING (token)
    GROUP BY dt.doc_id
    """
    return q, sql


# -------------------------------------------------------- pad-waste buckets
def _pad_waste_query():
    """Padding efficiency of pow-2 sequence-length bucketing (the
    batching layout a trainer would use): bucket = next power of two
    >= n_chars; per bucket report docs, real tokens, padded slots and
    the fill ratio. Integer bit math on both sides (np.frexp exponent ==
    1 << length(bin(n-1)))."""

    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            n = t.column("n_chars").to_numpy(zero_copy_only=False).astype(
                np.int64
            )
            bucket = np.ones(n.size, dtype=np.int64)
            big = n > 1
            bucket[big] = np.int64(1) << np.frexp(
                (n[big] - 1).astype(np.float64)
            )[1].astype(np.int64)
            order = np.argsort(bucket, kind="stable")
            ub, start = np.unique(bucket[order], return_index=True)
            return pa.table(
                {
                    "bucket": pa.array(ub, type=pa.int64()),
                    "n_docs": pa.array(
                        np.add.reduceat(np.ones_like(n), start).astype(
                            np.int64
                        )
                        if n.size
                        else np.zeros(0, np.int64),
                        type=pa.int64(),
                    ),
                    "sum_tok": pa.array(
                        np.add.reduceat(n[order], start).astype(np.int64)
                        if n.size
                        else np.zeros(0, np.int64),
                        type=pa.int64(),
                    ),
                }
            )

        def merge(t: pa.Table) -> pa.Table:
            b = t.column("bucket").to_numpy(zero_copy_only=False)
            d = t.column("n_docs").to_numpy(zero_copy_only=False)
            s = t.column("sum_tok").to_numpy(zero_copy_only=False)
            order = np.argsort(b, kind="stable")
            ub, start = np.unique(b[order], return_index=True)
            return pa.table(
                {
                    "bucket": pa.array(ub, type=pa.int64()),
                    "n_docs": pa.array(
                        np.add.reduceat(d[order], start).astype(np.int64),
                        type=pa.int64(),
                    ),
                    "sum_tok": pa.array(
                        np.add.reduceat(s[order], start).astype(np.int64),
                        type=pa.int64(),
                    ),
                }
            )

        refs = list(
            _docs(sf_dir, ["n_chars"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        final = tree_reduce_tables(refs, merge)
        b = final.column("bucket").to_numpy(zero_copy_only=False)
        d = final.column("n_docs").to_numpy(zero_copy_only=False)
        s = final.column("sum_tok").to_numpy(zero_copy_only=False)
        padded = b * d
        return rd.from_arrow(
            pa.table(
                {
                    "bucket": pa.array(b, type=pa.int64()),
                    "n_docs": pa.array(d, type=pa.int64()),
                    "sum_tok": pa.array(s, type=pa.int64()),
                    "padded": pa.array(padded, type=pa.int64()),
                    "fill_ratio": pa.array(
                        s.astype(np.float64) / padded.astype(np.float64),
                        type=pa.float64(),
                    ),
                }
            )
        )

    sql = """
    WITH b AS (
        SELECT CASE WHEN n_chars <= 1 THEN CAST(1 AS BIGINT)
                    ELSE CAST(1 AS BIGINT) << length(bin(n_chars - 1))
               END AS bucket,
               n_chars
        FROM documents
    ),
    agg AS (
        SELECT bucket,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS sum_tok
        FROM b GROUP BY bucket
    )
    SELECT bucket, n_docs, sum_tok,
           bucket * n_docs AS padded,
           CAST(sum_tok AS DOUBLE) / CAST(bucket * n_docs AS DOUBLE)
               AS fill_ratio
    FROM agg
    """
    return q, sql


# ---------------------------------------------------------- bigram top-k
BIGRAM_K = 16


def _bigram_topk_query():
    """Global top-K adjacent token bigrams: per-block vectorized bigram
    counts over the flat token buffer (doc boundaries masked out),
    vocab^2-bounded partials tree-reduced, driver-side top-K with total
    tie order (cnt desc, t0 asc, t1 asc)."""

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
        t1 = final.column("t1").to_numpy(zero_copy_only=False)
        c = final.column("cnt").to_numpy(zero_copy_only=False)
        order = np.lexsort((t1, t0, -c))[:BIGRAM_K]
        return rd.from_arrow(
            pa.table(
                {
                    "rnk": pa.array(
                        np.arange(1, order.size + 1, dtype=np.int64),
                        type=pa.int64(),
                    ),
                    "t0": pa.array(t0[order], type=pa.int64()),
                    "t1": pa.array(t1[order], type=pa.int64()),
                    "cnt": pa.array(c[order], type=pa.int64()),
                }
            )
        )

    sql = f"""
    WITH tok AS ({SQL_TOK}),
    b AS (
        SELECT lag(token) OVER (PARTITION BY doc_id ORDER BY pos) AS t0,
               token AS t1
        FROM tok
    ),
    c AS (
        SELECT CAST(t0 AS BIGINT) AS t0, CAST(t1 AS BIGINT) AS t1,
               CAST(count(*) AS BIGINT) AS cnt
        FROM b WHERE t0 IS NOT NULL GROUP BY t0, t1
    )
    SELECT * FROM (
        SELECT row_number() OVER (ORDER BY cnt DESC, t0 ASC, t1 ASC)
                   AS rnk,
               t0, t1, cnt
        FROM c
    ) WHERE rnk <= {BIGRAM_K}
    """
    return q, sql


# ----------------------------------------------------- temperature mixing
def _temperature_mix_query():
    """Temperature-based source sampling weights, the multilingual /
    multi-source data-diet rule (alpha = 0.5): w_s = n_s^alpha / sum,
    epochs_s = expected passes over source s when drawing one global
    token budget. The denominator is a sequential fold over sources in
    name order so the SQL list_reduce replays it bitwise."""

    def q(sf_dir: str):
        import ray.data as rd

        per_src, _, gtot = _counts_by_source(_src_tok_counts(sf_dir))
        n_by_src = {
            src: sum(ci for _, ci in rows) for src, rows in per_src.items()
        }
        denom = 0.0
        for src in sorted(n_by_src):  # source asc — the oracle fold order
            denom += math.sqrt(float(n_by_src[src]))
        out = {"source": [], "n_tok": [], "weight": [], "epochs": []}
        for src in sorted(n_by_src):
            n = n_by_src[src]
            w = math.sqrt(float(n)) / denom
            out["source"].append(src)
            out["n_tok"].append(n)
            out["weight"].append(w)
            out["epochs"].append(w * float(gtot) / float(n))
        return rd.from_arrow(
            pa.table(
                {
                    "source": pa.array(out["source"], type=pa.string()),
                    "n_tok": pa.array(out["n_tok"], type=pa.int64()),
                    "weight": pa.array(out["weight"], type=pa.float64()),
                    "epochs": pa.array(out["epochs"], type=pa.float64()),
                }
            )
        )

    sql = f"""
    WITH tok AS ({SQL_TOK}),
    s AS (
        SELECT source, CAST(count(*) AS BIGINT) AS n_tok
        FROM tok GROUP BY source
    ),
    d AS (
        SELECT list_reduce(
                   list(sqrt(CAST(n_tok AS DOUBLE)) ORDER BY source),
                   {_FOLD}) AS denom,
               CAST(sum(n_tok) AS BIGINT) AS gtot
        FROM s
    ),
    w AS (
        SELECT s.source, s.n_tok,
               sqrt(CAST(s.n_tok AS DOUBLE)) / d.denom AS weight,
               d.gtot AS gtot
        FROM s CROSS JOIN d
    )
    SELECT source, n_tok, weight,
           weight * CAST(gtot AS DOUBLE) / CAST(n_tok AS DOUBLE) AS epochs
    FROM w
    """
    return q, sql


def build_wave17_queries():
    queries, oracles = {}, {}

    def add(name, q, sql):
        queries[name] = q
        oracles[name] = sql

    add(*(("source_token_kl",) + _kl_query()))
    add(*(("source_zipf_slope",) + _zipf_query()))
    add(*(("vocab_novelty",) + _novelty_query()))
    add(*(("doc_pad_waste",) + _pad_waste_query()))
    add(*(("corpus_bigram_topk",) + _bigram_topk_query()))
    add(*(("source_mix_temperature",) + _temperature_mix_query()))
    return queries, oracles
