"""Char-bigram language-model scoring for corpus quality filtering.

CCNet-style (Wenzek et al. 2019) perplexity filtering, reduced to a
char-bigram LM with add-one smoothing so the whole thing is
deterministic scalar math and a DuckDB oracle replays it bit-for-bit:

  logprob(doc) = sum over DISTINCT bigrams (a,b) of the doc, in
                 ascending (a,b) order, of
                 n_ab * ln((C(a,b) + 1) / (C(a,·) + V))

where C are corpus-wide bigram counts and V = count of distinct
continuation chars. Grouping by distinct bigram (instead of folding per
position) cuts ln() calls ~5x and gives both sides one canonical fold
order; ln is scalar math.log == DuckDB ln (same libm — the repo's
float-fold invariant), and the fold is a sequential left sum.

Two passes, both scale-shaped:
  1. TRAIN: per-batch np.unique partial counts -> groupby-sum over
     bigram keys (bounded by observed-alphabet^2, not corpus size);
     the merged model broadcasts once via ray.put. Scale envelope:
     fine for char/codepoint vocabularies; at a 50k-BPE vocab the
     observed-bigram table can reach 10^9+ keys — there, shard the
     merge with a hash-partitioned groupby and back the model with a
     count-min sketch or top-K table (see DESIGN_100TB.md).
  2. SCORE: map_batches actor pool; per doc np.unique + searchsorted
     into the broadcast model arrays; only the scalar ln loop over
     the doc's distinct bigrams is Python.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

SHIFT = np.int64(1 << 21)  # codepoints < 2^21; key = a * SHIFT + b


def _bigram_keys(values: np.ndarray, lengths: np.ndarray) -> np.ndarray:
    """Flat token values + per-doc lengths -> flat int64 bigram keys
    (per-doc adjacent pairs; doc boundaries excluded)."""
    v = values.astype(np.int64)
    if v.size == 0:
        return np.empty(0, dtype=np.int64)
    keys = v[:-1] * SHIFT + v[1:]
    # drop the pair spanning each doc boundary (last pos of each doc)
    ends = np.cumsum(lengths)[:-1] - 1
    keep = np.ones(v.size - 1, dtype=bool)
    keep[ends[(ends >= 0) & (ends < keep.size)]] = False
    # docs of length 0 contribute nothing; length-1 docs have no pairs
    return keys[keep]


class BigramCountStage:
    """map_batches(pyarrow): corpus(tokens) -> per-batch (key, cnt)
    partial bigram counts (algebraic: combine = sum)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..stages.rollup import _flat_tokens

        values, lengths = _flat_tokens(batch)
        keys = _bigram_keys(values, lengths)
        uk, cnt = np.unique(keys, return_counts=True)
        return pa.table(
            {
                "key": pa.array(uk, type=pa.int64()),
                "cnt": pa.array(cnt.astype(np.int64), type=pa.int64()),
            }
        )


def _merge_bigram_counts(t: pa.Table) -> pa.Table:
    k = t.column("key").to_numpy(zero_copy_only=False)
    c = t.column("cnt").to_numpy(zero_copy_only=False)
    order = np.argsort(k, kind="stable")
    uk, start = np.unique(k[order], return_index=True)
    return pa.table(
        {
            "key": pa.array(uk, type=pa.int64()),
            "cnt": pa.array(
                np.add.reduceat(c[order], start).astype(np.int64),
                type=pa.int64(),
            ),
        }
    )


#: which merge path the last train_bigram_model call took
#: ("tree" | "sharded") — exposed so the scale-envelope regression test
#: can assert the sharded path actually fired.
LAST_MERGE_PATH = {"path": None, "partial_rows": 0}


def _sharded_merge(partials, n_shards: int):
    """Hash-partitioned groupby merge for huge observed-bigram tables
    (the DESIGN_100TB envelope): partial rows shuffle by hash(key) into
    ``n_shards`` coarse shards, each shard merges vectorized — the
    per-key combine never funnels through one task the way the
    tree-reduce root does. Only (int64, int64) rows move."""
    gold = np.uint64(0x9E3779B97F4A7C15)

    def add_shard(t: pa.Table) -> pa.Table:
        k = t.column("key").to_numpy(zero_copy_only=False)
        shard = (((k.astype(np.uint64) * gold) >> np.uint64(48))
                 .astype(np.int64)) % n_shards
        return t.append_column("__shard", pa.array(shard))

    def merge_shard(g: pa.Table) -> pa.Table:
        k = g.column("key").to_numpy(zero_copy_only=False).astype(np.int64)
        c = g.column("cnt").to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(k, kind="stable")
        uk, start = np.unique(k[order], return_index=True)
        return pa.table(
            {
                "key": pa.array(uk, type=pa.int64()),
                "cnt": pa.array(
                    np.add.reduceat(c[order], start), type=pa.int64()
                ),
            }
        )

    return (
        partials.map_batches(add_shard, batch_format="pyarrow")
        .groupby("__shard")
        .map_groups(merge_shard, batch_format="pyarrow")
    )


def train_bigram_model(corpus_ds, shard_merge_threshold: int = 5_000_000,
                       n_merge_shards: int = 64):
    """corpus -> (keys sorted, c2, a_keys sorted, c1, V) numpy arrays.

    The count table is bounded by observed-alphabet^2. For char/codepoint
    vocabularies the partials tree-reduce (log-depth Ray tasks) instead
    of paying an all-to-all groupby — the source-rollup discipline. When
    the summed partial row count exceeds ``shard_merge_threshold`` (a
    50k-BPE vocab can push observed bigrams toward 10^9 keys) the merge
    switches to a hash-partitioned groupby over ``n_merge_shards`` coarse
    shards so no single reduce task ever holds the whole table — same
    merged counts bitwise (integer sums are order-free; the final model
    assembly sorts by key). Next envelope beyond THAT (model too big to
    broadcast at all): keep the model sharded and route score lookups by
    key hash — see DESIGN_100TB.md."""
    import ray

    from ..stages.source_rollup import tree_reduce_tables

    # stateless counting: plain TASK pool (an instance, not the class)
    # — no actor spin-up, parallelism tracks available CPUs instead of
    # a fixed 2-actor pool that throttled every LM pipeline at 32 cpus
    partials = corpus_ds.map_batches(
        BigramCountStage(), batch_format="pyarrow"
    ).materialize()
    n_partial_rows = partials.count()
    LAST_MERGE_PATH["partial_rows"] = int(n_partial_rows)
    if n_partial_rows > shard_merge_threshold:
        LAST_MERGE_PATH["path"] = "sharded"
        merged = _sharded_merge(partials, n_merge_shards)
        tbls = [t for t in ray.get(merged.to_arrow_refs())
                if t.num_rows > 0]
        if tbls:
            rows = pa.concat_tables(tbls)
            order = np.argsort(
                rows.column("key").to_numpy(zero_copy_only=False),
                kind="stable",
            )
            rows = rows.take(pa.array(order))
        else:
            rows = pa.table({"key": pa.array([], type=pa.int64()),
                             "cnt": pa.array([], type=pa.int64())})
    else:
        LAST_MERGE_PATH["path"] = "tree"
        refs = list(partials.to_arrow_refs())
        if not refs:
            rows = pa.table({"key": pa.array([], type=pa.int64()),
                             "cnt": pa.array([], type=pa.int64())})
        else:
            rows = tree_reduce_tables(refs, _merge_bigram_counts)
    keys = rows.column("key").to_numpy(zero_copy_only=False)
    c2 = rows.column("cnt").to_numpy(zero_copy_only=False)
    a = keys // SHIFT
    a_keys, start = np.unique(a, return_index=True)
    c1 = np.add.reduceat(c2, start)
    v = int(np.unique(keys % SHIFT).size)
    # precompute the smoothed log term per GLOBAL bigram once (scalar
    # math.log == DuckDB ln); scoring then only gathers — the per-doc ln
    # loop moves here, bounded by alphabet^2 instead of corpus size
    c1k = c1[np.searchsorted(a_keys, a)]
    vf = float(v)
    ltab = np.fromiter(
        (
            math.log((float(n2) + 1.0) / (float(n1) + vf))
            for n2, n1 in zip(c2, c1k)
        ),
        np.float64,
        keys.size,
    )
    return keys, c2, a_keys, c1, v, ltab


class BigramScoreStage:
    """map_batches(pyarrow) actor stage: corpus(tokens) ->
    (doc_id, n_bigrams, logprob, mean_logprob). Model read once per
    actor from the object store (zero-copy numpy)."""

    def __init__(self, model_ref):
        import ray

        (self.keys, self.c2, self.a_keys, self.c1, self.v,
         self.ltab) = ray.get(model_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..stages.rollup import _flat_tokens

        values, lengths = _flat_tokens(batch)
        doc_ids = batch.column("doc_id").to_pylist()
        n_out = np.zeros(len(doc_ids), dtype=np.int64)
        lp_out = np.zeros(len(doc_ids), dtype=np.float64)
        mean_out = np.zeros(len(doc_ids), dtype=np.float64)
        off = 0
        for i, ln_ in enumerate(lengths):
            seg = values[off: off + ln_]
            off += ln_
            if ln_ < 2:
                continue
            v64 = seg.astype(np.int64)
            dkeys = v64[:-1] * SHIFT + v64[1:]
            uk, n_ab = np.unique(dkeys, return_counts=True)
            # gather precomputed log terms; cumsum is the same
            # sequential left fold in ascending (a,b) order as the old
            # scalar loop — bitwise-identical, ~no Python math in here
            prods = n_ab.astype(np.float64) * self.ltab[
                np.searchsorted(self.keys, uk)
            ]
            logprob = float(np.cumsum(prods)[-1])
            nb = int(ln_ - 1)
            n_out[i] = nb
            lp_out[i] = logprob
            mean_out[i] = logprob / nb
        cols = {
            "doc_id": pa.array(doc_ids, type=pa.string()),
            "n_bigrams": pa.array(n_out, type=pa.int64()),
            "logprob": pa.array(lp_out, type=pa.float64()),
            "mean_logprob": pa.array(mean_out, type=pa.float64()),
        }
        if "source" in batch.column_names:  # pass-through for consumers
            cols["source"] = batch.column("source").cast(pa.string())
        return pa.table(cols)


def shard_bigram_model(model, n_shards: int = 16):
    """Split a trained bigram model's (keys, ltab) lookup into
    ``n_shards`` hash shards, each its own object-store ref — the final
    LM scale envelope (DESIGN_100TB): when the assembled model is too
    large to broadcast as ONE object, scorers fetch per-shard objects
    (zero-copy plasma; a node only ever maps the shards its batches
    touch). Returns (shard_refs, (a_keys, c1, v)) — the unigram side is
    alphabet-bounded and stays broadcast."""
    import ray

    keys, c2, a_keys, c1, v, ltab = model
    gold = np.uint64(0x9E3779B97F4A7C15)
    shard = (((keys.astype(np.uint64) * gold) >> np.uint64(48))
             .astype(np.int64)) % n_shards
    refs = []
    for sid in range(n_shards):
        m = shard == sid
        refs.append(ray.put((keys[m], ltab[m])))  # ascending within shard
    return refs


class BigramScoreStageSharded:
    """Scoring against a HASH-SHARDED model: per batch, distinct bigram
    keys route to their shard by the same hash, each shard's log terms
    gather via searchsorted, and the per-doc fold runs in the same
    ascending-key order as the broadcast scorer — bitwise-identical
    output (pytest-pinned)."""

    def __init__(self, shard_refs):
        self.shard_refs = list(shard_refs)
        self.n_shards = len(self.shard_refs)
        self._shards: dict = {}

    def _shard(self, sid: int):
        if sid not in self._shards:
            import ray

            self._shards[sid] = ray.get(self.shard_refs[sid])
        return self._shards[sid]

    def _gather(self, uk: np.ndarray) -> np.ndarray:
        gold = np.uint64(0x9E3779B97F4A7C15)
        sid = (((uk.astype(np.uint64) * gold) >> np.uint64(48))
               .astype(np.int64)) % self.n_shards
        out = np.empty(uk.size, dtype=np.float64)
        for s in np.unique(sid):
            m = sid == s
            skeys, sltab = self._shard(int(s))
            out[m] = sltab[np.searchsorted(skeys, uk[m])]
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..stages.rollup import _flat_tokens

        values, lengths = _flat_tokens(batch)
        doc_ids = batch.column("doc_id").to_pylist()
        n_out = np.zeros(len(doc_ids), dtype=np.int64)
        lp_out = np.zeros(len(doc_ids), dtype=np.float64)
        mean_out = np.zeros(len(doc_ids), dtype=np.float64)
        off = 0
        for i, ln_ in enumerate(lengths):
            seg = values[off: off + ln_]
            off += ln_
            if ln_ < 2:
                continue
            v64 = seg.astype(np.int64)
            dkeys = v64[:-1] * SHIFT + v64[1:]
            uk, n_ab = np.unique(dkeys, return_counts=True)
            prods = n_ab.astype(np.float64) * self._gather(uk)
            logprob = float(np.cumsum(prods)[-1])
            nb = int(ln_ - 1)
            n_out[i] = nb
            lp_out[i] = logprob
            mean_out[i] = logprob / nb
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, type=pa.string()),
                "n_bigrams": pa.array(n_out, type=pa.int64()),
                "logprob": pa.array(lp_out, type=pa.float64()),
                "mean_logprob": pa.array(mean_out, type=pa.float64()),
            }
        )


def kn_log_tables(model, discount: float = 0.75):
    """Interpolated Kneser-Ney per-bigram log terms from a trained
    bigram model (Kneser & Ney 1995; Chen & Goodman 1998 eq. 4.26):

      P_KN(b|a) = max(C(a,b) - D, 0)/C(a,.)
                  + (D * N1+(a,.)/C(a,.)) * (N1+(.,b) / N1+(.,.))

    with N1+ the distinct-bigram-type counts. All inputs are int64
    counts from the tree-reduced model; the log term is one scalar
    math.log per OBSERVED bigram type (alphabet^2-bounded), the same
    order-free precompute discipline as the add-one table in
    train_bigram_model. Returns (keys, ltab) for KNScoreStage."""
    keys, c2, a_keys, c1, _v, _ltab = model
    if keys.size == 0:
        return keys, np.empty(0, dtype=np.float64)
    a = keys // SHIFT
    b = keys % SHIFT
    c1k = c1[np.searchsorted(a_keys, a)]
    # N1+(a,.): distinct continuations per a = run length of each
    # unique-a block in the sorted unique-bigram key table
    ua, ua_counts = np.unique(a, return_counts=True)
    n1a = ua_counts[np.searchsorted(ua, a)]
    # N1+(.,b): distinct left contexts per b
    _ub, b_inv, b_counts = np.unique(
        b, return_inverse=True, return_counts=True)
    n1b = b_counts[b_inv]
    ntypes = float(keys.size)
    d = float(discount)
    ltab = np.fromiter(
        (
            math.log(
                max(float(n2) - d, 0.0) / float(n1)
                + (d * float(na) / float(n1)) * (float(nb) / ntypes)
            )
            for n2, n1, na, nb in zip(c2, c1k, n1a, n1b)
        ),
        np.float64,
        keys.size,
    )
    return keys, ltab


class KNScoreStage(BigramScoreStage):
    """BigramScoreStage with a Kneser-Ney log-term table: the scoring
    gather/fold is identical, only (keys, ltab) differ."""

    def __init__(self, tables_ref):
        import ray

        self.keys, self.ltab = ray.get(tables_ref)


def bigram_perplexity(corpus_ds, score_ds=None, concurrency=None):
    """Train the corpus-wide bigram model, broadcast it, score every doc.
    score_ds defaults to a second pass over corpus_ds (self-perplexity,
    the CCNet quality signal).

    Scoring is a plain TASK pool by default (``concurrency=None``):
    ``ray.get`` of the broadcast model is a zero-copy plasma read per
    task, and parallelism then tracks available CPUs instead of a fixed
    actor count (the r3 LM-task-pool change missed this stage — a
    2-actor pool throttled scoring at 32 cpus). Pass an int to pin an
    actor pool for long-lived pipelines."""
    import ray

    if score_ds is None:
        # train + score both consume the corpus: materialize the
        # tokenized blocks once instead of re-reading + re-tokenizing
        # (the flagship shared-read discipline; bounded by input size,
        # object store spills past memory)
        corpus_ds = corpus_ds.materialize()
    model = train_bigram_model(corpus_ds)
    model_ref = ray.put(model)
    target = score_ds or corpus_ds
    if concurrency is not None:
        return target.map_batches(
            BigramScoreStage,
            batch_format="pyarrow",
            concurrency=concurrency,
            fn_constructor_args=(model_ref,),
        )

    def score(batch: pa.Table, _ref=model_ref) -> pa.Table:
        stage = BigramScoreStage(_ref)  # zero-copy plasma read
        return stage(batch)

    return target.map_batches(score, batch_format="pyarrow")


def bigram_perplexity_sql() -> str:
    """DuckDB oracle: same counts, same smoothing, same distinct-bigram
    ascending fold order, ln == math.log (shared libm)."""
    from ..pipelines.queries import SQL_TOK

    return f"""
    WITH tok AS ({SQL_TOK}),
    pr AS (
        SELECT t1.doc_id, t1.token AS a, t2.token AS b
        FROM tok t1 JOIN tok t2
          ON t1.doc_id = t2.doc_id AND t2.pos = t1.pos + 1
    ),
    c2 AS (SELECT a, b, CAST(count(*) AS BIGINT) AS c
           FROM pr GROUP BY a, b),
    c1 AS (SELECT a, CAST(sum(c) AS BIGINT) AS c FROM c2 GROUP BY a),
    vv AS (SELECT CAST(count(DISTINCT b) AS DOUBLE) AS v FROM pr),
    dterm AS (
        SELECT doc_id, a, b, CAST(count(*) AS BIGINT) AS n
        FROM pr GROUP BY doc_id, a, b
    ),
    terms AS (
        SELECT d.doc_id, d.a, d.b, d.n,
               CAST(d.n AS DOUBLE) *
               ln((CAST(c2.c AS DOUBLE) + 1.0) /
                  (CAST(c1.c AS DOUBLE) + vv.v)) AS term
        FROM dterm d
        JOIN c2 ON c2.a = d.a AND c2.b = d.b
        JOIN c1 ON c1.a = d.a
        CROSS JOIN vv
    ),
    folded AS (
        SELECT doc_id,
               CAST(sum(n) AS BIGINT) AS n_bigrams,
               list_reduce(
                   list_prepend(0.0, list(term ORDER BY a, b)),
                   (acc, x) -> acc + x) AS logprob
        FROM terms GROUP BY doc_id
    )
    SELECT CAST(d.doc_id AS VARCHAR) AS doc_id,
           COALESCE(f.n_bigrams, 0) AS n_bigrams,
           COALESCE(f.logprob, 0.0) AS logprob,
           CASE WHEN COALESCE(f.n_bigrams, 0) > 0
                THEN f.logprob / f.n_bigrams ELSE 0.0 END
               AS mean_logprob
    FROM documents d LEFT JOIN folded f
      ON f.doc_id = CAST(d.doc_id AS VARCHAR)
    """

# --------------------------------------------------------------- DSIR
def model_score_tables(model):
    """Gather tables for scoring docs that may contain bigrams UNSEEN in
    training (needed whenever the scoring corpus is a superset of the
    training corpus, e.g. DSIR's target model). All three cases evaluate
    the same smoothed formula ln((c2 + 1)/(c1 + V)) with c2/c1 = 0 when
    absent — exactly the oracle's COALESCE expression."""
    keys, c2, a_keys, c1, v, ltab = model
    if keys.size == 0:
        raise ValueError("empty bigram model (no training pairs)")
    vf = float(v)
    miss_a = np.fromiter(
        (math.log(1.0 / (float(n1) + vf)) for n1 in c1),
        np.float64, c1.size,
    )
    miss_default = math.log(1.0 / vf)
    return keys, ltab, a_keys, miss_a, miss_default


def _score_rows(tables, values, lengths):
    """-> (n_bigrams, logprob) per row, unseen-safe; the per-doc sum is
    the same ascending-(a,b) cumsum left fold as BigramScoreStage."""
    keys, ltab, a_keys, miss_a, miss_default = tables
    n_out = np.zeros(lengths.size, dtype=np.int64)
    lp_out = np.zeros(lengths.size, dtype=np.float64)
    off = 0
    for i, ln_ in enumerate(lengths):
        seg = values[off: off + ln_]
        off += ln_
        if ln_ < 2:
            continue
        v64 = seg.astype(np.int64)
        dkeys = v64[:-1] * SHIFT + v64[1:]
        uk, n_ab = np.unique(dkeys, return_counts=True)
        idx = np.searchsorted(keys, uk).clip(0, keys.size - 1)
        hit = keys[idx] == uk
        term = np.empty(uk.size, dtype=np.float64)
        term[hit] = ltab[idx[hit]]
        if not hit.all():
            am = uk[~hit] // SHIFT
            aidx = np.searchsorted(a_keys, am).clip(0, a_keys.size - 1)
            ahit = a_keys[aidx] == am
            mterm = np.where(ahit, miss_a[aidx], miss_default)
            term[~hit] = mterm
        prods = n_ab.astype(np.float64) * term
        n_out[i] = int(ln_ - 1)
        lp_out[i] = float(np.cumsum(prods)[-1])
    return n_out, lp_out


class BigramRatioStage:
    """map_batches(pyarrow) actor stage: DSIR importance weights.
    logw(doc) = logprob under the TARGET model - logprob under the
    SOURCE model (Xie et al. 2023, reduced to the repo's char-bigram
    LM). Both models broadcast once per actor."""

    def __init__(self, target_ref, source_ref):
        import ray

        self.t = model_score_tables(ray.get(target_ref))
        self.s = model_score_tables(ray.get(source_ref))

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..stages.rollup import _flat_tokens

        values, lengths = _flat_tokens(batch)
        doc_ids = batch.column("doc_id").to_pylist()
        nb, lp_t = _score_rows(self.t, values, lengths)
        _, lp_s = _score_rows(self.s, values, lengths)
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, type=pa.string()),
                "n_bigrams": pa.array(nb, type=pa.int64()),
                "logw": pa.array(lp_t - lp_s, type=pa.float64()),
            }
        )


def dsir_importance(corpus_factory, target_source: str,
                    concurrency=None):
    """corpus_factory: zero-arg callable -> corpus Dataset (fresh per
    pass). Trains the target model on the docs of ``target_source``
    only, the source model on the whole corpus, then scores every doc.
    Both trainings are bounded-cardinality partial counts; the models
    broadcast via ray.put — nothing corpus-sized is collected."""
    import pyarrow.compute as pc
    import ray

    def only_target(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t.column("source"), target_source))

    # three passes (target train / source train / score) share ONE
    # tokenized read via a materialize checkpoint (round-3: was 3x
    # read+tokenize; the flagship shared-read discipline)
    corpus = corpus_factory().materialize()
    target_model = train_bigram_model(
        corpus.map_batches(only_target, batch_format="pyarrow")
    )
    source_model = train_bigram_model(corpus)
    t_ref, s_ref = ray.put(target_model), ray.put(source_model)
    if concurrency is not None:
        return corpus.map_batches(
            BigramRatioStage,
            batch_format="pyarrow",
            concurrency=concurrency,
            fn_constructor_args=(t_ref, s_ref),
        )

    # task pool (see bigram_perplexity): zero-copy model reads per task,
    # parallelism tracks CPUs; score tables are alphabet-bounded so the
    # per-task rebuild is trivial next to the scoring work
    def score(batch: pa.Table, _t=t_ref, _s=s_ref) -> pa.Table:
        stage = BigramRatioStage(_t, _s)
        return stage(batch)

    return corpus.map_batches(score, batch_format="pyarrow")


def dsir_importance_sql(target_source: str) -> str:
    """Oracle: target counts from the target source's docs only, source
    counts from the whole corpus; unseen target bigrams replay the same
    COALESCE-smoothed term. Each fold is referenced exactly once."""
    from ..pipelines.queries import SQL_TOK

    return f"""
    WITH tok AS ({SQL_TOK}),
    pr AS (
        SELECT t1.doc_id, t1.source, t1.token AS a, t2.token AS b
        FROM tok t1 JOIN tok t2
          ON t1.doc_id = t2.doc_id AND t2.pos = t1.pos + 1
    ),
    c2s AS (SELECT a, b, CAST(count(*) AS BIGINT) AS c
            FROM pr GROUP BY a, b),
    c1s AS (SELECT a, CAST(sum(c) AS BIGINT) AS c FROM c2s GROUP BY a),
    vvs AS (SELECT CAST(count(DISTINCT b) AS DOUBLE) AS v FROM pr),
    prt AS (SELECT * FROM pr WHERE source = '{target_source}'),
    c2t AS (SELECT a, b, CAST(count(*) AS BIGINT) AS c
            FROM prt GROUP BY a, b),
    c1t AS (SELECT a, CAST(sum(c) AS BIGINT) AS c FROM c2t GROUP BY a),
    vvt AS (SELECT CAST(count(DISTINCT b) AS DOUBLE) AS v FROM prt),
    dterm AS (
        SELECT doc_id, a, b, CAST(count(*) AS BIGINT) AS n
        FROM pr GROUP BY doc_id, a, b
    ),
    terms AS (
        SELECT d.doc_id, d.a, d.b, d.n,
               CAST(d.n AS DOUBLE) *
               ln((CAST(COALESCE(c2t.c, 0) AS DOUBLE) + 1.0) /
                  (CAST(COALESCE(c1t.c, 0) AS DOUBLE) + vvt.v)) AS term_t,
               CAST(d.n AS DOUBLE) *
               ln((CAST(c2s.c AS DOUBLE) + 1.0) /
                  (CAST(c1s.c AS DOUBLE) + vvs.v)) AS term_s
        FROM dterm d
        JOIN c2s ON c2s.a = d.a AND c2s.b = d.b
        JOIN c1s ON c1s.a = d.a
        LEFT JOIN c2t ON c2t.a = d.a AND c2t.b = d.b
        LEFT JOIN c1t ON c1t.a = d.a
        CROSS JOIN vvs CROSS JOIN vvt
    ),
    folded AS (
        SELECT doc_id,
               CAST(sum(n) AS BIGINT) AS n_bigrams,
               list_reduce(
                   list_prepend(0.0, list(term_t ORDER BY a, b)),
                   (acc, x) -> acc + x)
               - list_reduce(
                   list_prepend(0.0, list(term_s ORDER BY a, b)),
                   (acc, x) -> acc + x) AS logw
        FROM terms GROUP BY doc_id
    )
    SELECT CAST(d.doc_id AS VARCHAR) AS doc_id,
           COALESCE(f.n_bigrams, 0) AS n_bigrams,
           COALESCE(f.logw, 0.0) AS logw
    FROM documents d LEFT JOIN folded f
      ON f.doc_id = CAST(d.doc_id AS VARCHAR)
    """
