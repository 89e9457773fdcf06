"""Distinct-count sketches over token streams.

HyperLogLog (Flajolet et al. 2007) with sha256-derived hashes so every
register update is a deterministic integer operation — which makes the
whole sketch, including its float estimate, replayable bit-for-bit by a
DuckDB oracle (the estimate's harmonic sum is a SEQUENTIAL fold over
registers in index order, per the repo's float-fold invariant).

Scale shape: per-batch partial registers (one uint8[m] per key) are
ALGEBRAIC — combine = elementwise max — so they tree-reduce like the
source rollup: token bytes never shuffle, only (key, register, rank)
rows bounded by keys × m. This is the sketch answer to "how many
distinct tokens per source" at 10^12 docs, where an exact
count(DISTINCT) would shuffle every token.

An exact companion (`distinct_tokens_exact`) hashes tokens FIRST and
shuffles only int64 hashes (the hash-first dedup discipline), providing
both the small-scale ground truth for the sketch's error and the
oracle-checked exact path.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

P_BITS = 8          # m = 256 registers
M = 1 << P_BITS


def _token_registers(tokens) -> tuple[np.ndarray, np.ndarray]:
    """(register_index, rank) per token; sha256-based, deterministic.

    register = first hex byte of sha256(token); rank = leading zeros of
    the NEXT 64 hash bits + 1 (65 when those bits are all zero).
    """
    regs = np.empty(len(tokens), dtype=np.int64)
    ranks = np.empty(len(tokens), dtype=np.int64)
    for i, tok in enumerate(tokens):
        hx = hashlib.sha256(tok.encode()).hexdigest()
        regs[i] = int(hx[:2], 16)
        v = int(hx[2:18], 16)
        ranks[i] = 65 - v.bit_length() if v else 65
    return regs, ranks


class HLLPartialStage:
    """map_batches(pyarrow): docs -> per-(source, register) max-rank
    partial rows. At most keys*256 rows leave each task."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        srcs = batch.column("source").to_pylist()
        texts = batch.column("text").to_pylist()
        acc: dict[str, np.ndarray] = {}
        for src, text in zip(srcs, texts):
            toks = list(set((text or "").split()))
            if not toks:
                continue
            regs, ranks = _token_registers(toks)
            r = acc.setdefault(src, np.zeros(M, dtype=np.int64))
            np.maximum.at(r, regs, ranks)
        out_src, out_reg, out_rank = [], [], []
        for src, r in acc.items():
            nz = np.flatnonzero(r)
            out_src.extend([src] * nz.size)
            out_reg.extend(nz.tolist())
            out_rank.extend(r[nz].tolist())
        return pa.table(
            {
                "source": pa.array(out_src, type=pa.string()),
                "register": pa.array(out_reg, type=pa.int64()),
                "rank": pa.array(out_rank, type=pa.int64()),
            }
        )


def hll_estimate(registers: np.ndarray) -> tuple[float, int]:
    """HLL estimate from a dense rank vector (len M). Sequential float
    fold in register-index order; linear-counting correction below
    2.5m when empty registers remain (reference formula)."""
    import math

    alpha = 0.7213 / (1.0 + 1.079 / M)
    s = 0.0
    for r in registers:            # sequential — SQL list_reduce replays
        s += 2.0 ** (-float(r))
    est = alpha * M * M / s
    zeros = int((registers == 0).sum())
    if est <= 2.5 * M and zeros > 0:
        est = M * math.log(M / zeros)  # scalar math.log == DuckDB ln
    return est, zeros


def distinct_tokens_hll(docs, concurrency: int = 2):
    """Dataset(doc_id, source, text) -> (source, est_distinct,
    n_zero_registers). Combine is groupby-max over (source, register)
    — bounded cardinality, shuffle of ≤ keys*256 rows."""
    import math

    partial = docs.map_batches(
        HLLPartialStage, batch_format="pyarrow", concurrency=concurrency
    )
    merged = partial.groupby(["source", "register"]).max("rank")

    def finalize(group: pa.Table) -> pa.Table:
        dense = np.zeros(M, dtype=np.int64)
        regs = group.column("register").to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        dense[regs] = group.column("max(rank)").to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        est, zeros = hll_estimate(dense)
        return pa.table(
            {
                "source": pa.array(
                    [group.column("source")[0].as_py()],
                    type=pa.string(),
                ),
                "est_distinct": pa.array([est]),
                "n_zero_registers": pa.array([zeros]),
            }
        )

    return merged.groupby("source").map_groups(
        finalize, batch_format="pyarrow"
    )


def hll_sql() -> str:
    """DuckDB oracle: replays register assignment (sha256 string math),
    the max-rank merge, and the sequential estimate fold."""
    alpha = "0.7213 / (1.0 + 1.079 / 256.0)"
    return f"""
    WITH w AS (
        SELECT DISTINCT source,
               unnest(string_split_regex(trim(text), '\\s+')) AS word
        FROM documents WHERE trim(text) <> ''
    ),
    h AS (
        SELECT source,
               CAST(('0x' || substr(sha256(word), 1, 2)) AS BIGINT)
                   AS register,
               CAST(('0x' || substr(sha256(word), 3, 16)) AS UBIGINT)
                   AS v
        FROM w
    ),
    r AS (
        SELECT source, register,
               max(CASE WHEN v = 0 THEN 65
                        ELSE 65 - (64 - length(ltrim(
                            lpad(bin(v), 64, '0'), '0'))) END) AS rank
        FROM h GROUP BY source, register
    ),
    dense AS (
        SELECT s.source, g.register,
               COALESCE(r.rank, 0) AS rank
        FROM (SELECT DISTINCT source FROM r) s
        CROSS JOIN (SELECT unnest(generate_series(0, 255)) AS register) g
        LEFT JOIN r ON r.source = s.source AND r.register = g.register
    ),
    folded AS (
        SELECT source,
               list_reduce(
                   list_prepend(0.0, list(pow(2.0, -CAST(rank AS DOUBLE))
                                          ORDER BY register)),
                   (acc, x) -> acc + x) AS s,
               CAST(sum(CASE WHEN rank = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS zeros
        FROM dense GROUP BY source
    )
    SELECT source,
           CASE WHEN ({alpha}) * 256.0 * 256.0 / s <= 2.5 * 256.0
                     AND zeros > 0
                THEN 256.0 * ln(256.0 / zeros)
                ELSE ({alpha}) * 256.0 * 256.0 / s END AS est_distinct,
           zeros AS n_zero_registers
    FROM folded
    """


class TokenHashStage:
    """Hash-first exact distinct: docs -> (source, int64 token hash)
    rows, deduped per batch — only 8-byte hashes ever shuffle."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        srcs = batch.column("source").to_pylist()
        texts = batch.column("text").to_pylist()
        out_src, out_h = [], []
        for src, text in zip(srcs, texts):
            toks = set((text or "").split())
            for tok in toks:
                out_src.append(src)
                out_h.append(
                    int(hashlib.sha256(tok.encode()).hexdigest()[:15], 16)
                )
        return pa.table(
            {
                "source": pa.array(out_src, type=pa.string()),
                "h": pa.array(out_h, type=pa.int64()),
            }
        )


def distinct_tokens_exact(docs, concurrency: int = 2):
    """Exact per-source distinct token count via hash-first shuffle."""

    def count_group(group: pa.Table) -> pa.Table:
        h = group.column("h").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "source": pa.array(
                    [group.column("source")[0].as_py()],
                    type=pa.string(),
                ),
                "n_distinct": pa.array(
                    [int(np.unique(h).size)], type=pa.int64()
                ),
            }
        )

    return (
        docs.map_batches(TokenHashStage, batch_format="pyarrow",
                         concurrency=concurrency)
        .groupby("source")
        .map_groups(count_group, batch_format="pyarrow")
    )


def distinct_exact_sql() -> str:
    return """
    SELECT source,
           CAST(count(DISTINCT word) AS BIGINT) AS n_distinct
    FROM (
        SELECT source,
               unnest(string_split_regex(trim(text), '\\s+')) AS word
        FROM documents WHERE trim(text) <> ''
    ) GROUP BY source
    """


# --- Count-min sketch -------------------------------------------------------

CMS_D = 4           # hash rows
CMS_W = 256         # cells per row (one sha256 hex byte)


def _cms_cell(j: int, word: str) -> int:
    return int(
        hashlib.sha256(f"{j}:{word}".encode()).hexdigest()[:2], 16
    )


class CMSPartialStage:
    """map_batches(pyarrow): docs -> per-(source, row, cell) partial
    counts. Counters are ALGEBRAIC (combine = elementwise sum), so the
    merge is a bounded groupby-sum of <= keys * d * w rows — token bytes
    never shuffle. Cormode & Muthukrishnan 2005, sha256-derived cells so
    every update is deterministic integer math (bitwise SQL-replayable).
    """

    def __call__(self, batch: pa.Table) -> pa.Table:
        from collections import Counter

        srcs = batch.column("source").to_pylist()
        texts = batch.column("text").to_pylist()
        counts: Counter = Counter()
        for src, text in zip(srcs, texts):
            for w in (text or "").split():
                counts[(src, w)] += 1
        acc: dict[tuple[str, int, int], int] = {}
        cell_cache: dict[str, tuple[int, ...]] = {}
        for (src, w), c in counts.items():
            cells = cell_cache.get(w)
            if cells is None:
                cells = tuple(_cms_cell(j, w) for j in range(CMS_D))
                cell_cache[w] = cells
            for j, cell in enumerate(cells):
                key = (src, j, cell)
                acc[key] = acc.get(key, 0) + c
        if not acc:
            return pa.table(
                {"source": pa.array([], type=pa.string()),
                 "j": pa.array([], type=pa.int64()),
                 "cell": pa.array([], type=pa.int64()),
                 "cnt": pa.array([], type=pa.int64())}
            )
        keys = list(acc)
        return pa.table(
            {
                "source": pa.array([k[0] for k in keys], type=pa.string()),
                "j": pa.array([k[1] for k in keys], type=pa.int64()),
                "cell": pa.array([k[2] for k in keys], type=pa.int64()),
                "cnt": pa.array([acc[k] for k in keys], type=pa.int64()),
            }
        )


class CandidateCountStage:
    """map_batches(pyarrow): docs -> per-batch (source, token, cnt) rows
    for the deterministic candidate subset (sha256 first hex nibble '0',
    ~1/16 of the token space). Pre-aggregated per batch so the groupby
    shuffles one row per (source, candidate token) per batch."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        from collections import Counter

        srcs = batch.column("source").to_pylist()
        texts = batch.column("text").to_pylist()
        counts: Counter = Counter()
        is_cand: dict[str, bool] = {}
        for src, text in zip(srcs, texts):
            for w in (text or "").split():
                c = is_cand.get(w)
                if c is None:
                    c = hashlib.sha256(w.encode()).hexdigest()[0] == "0"
                    is_cand[w] = c
                if c:
                    counts[(src, w)] += 1
        keys = list(counts)
        return pa.table(
            {
                "source": pa.array([k[0] for k in keys], type=pa.string()),
                "token": pa.array([k[1] for k in keys], type=pa.string()),
                "cnt": pa.array([counts[k] for k in keys],
                                type=pa.int64()),
            }
        )


class CMSEstimateStage:
    """Adds est_count = min_j counter[j][cell_j(token)] from the merged
    sketch (broadcast once via ray.put; bounded keys*d*w ints)."""

    def __init__(self, sketch_ref):
        import ray

        self.sketch = ray.get(sketch_ref)  # dict[(source, j, cell)] -> cnt

    def __call__(self, batch: pa.Table) -> pa.Table:
        srcs = batch.column("source").to_pylist()
        toks = batch.column("token").to_pylist()
        exact = batch.column("exact_count").cast(pa.int64())
        sk = self.sketch
        est = np.empty(len(srcs), dtype=np.int64)
        for i, (src, tok) in enumerate(zip(srcs, toks)):
            est[i] = min(
                sk[(src, j, _cms_cell(j, tok))] for j in range(CMS_D)
            )
        return pa.table(
            {
                "source": pa.array(srcs, type=pa.string()),
                "token": pa.array(toks, type=pa.string()),
                "est_count": pa.array(est, type=pa.int64()),
                "exact_count": exact,
            }
        )


def cms_heavy_hitters(docs, concurrency: int = 2):
    """Dataset(source, text) -> (source, token, est_count, exact_count)
    for the deterministic candidate-token subset. The sketch answers
    point frequency queries without shuffling tokens (partials tree-sum
    per batch); the exact companion quantifies the CMS overestimate
    (est >= exact always). Two passes over the input: one builds the
    sketch, one counts candidates — at scale, fuse or cache the read."""
    import ray

    sketch_rows = (
        docs.map_batches(CMSPartialStage, batch_format="pyarrow",
                         concurrency=concurrency)
        .groupby(["source", "j", "cell"])
        .sum("cnt")
    ).to_pandas()
    sketch = {
        (r.source, int(r.j), int(r.cell)): int(r[3])
        for r in sketch_rows.itertuples(index=False)
    }
    sketch_ref = ray.put(sketch)

    exact = (
        docs.map_batches(CandidateCountStage, batch_format="pyarrow",
                         concurrency=concurrency)
        .groupby(["source", "token"])
        .sum("cnt")
    )

    def rename(t: pa.Table) -> pa.Table:
        return t.rename_columns(["source", "token", "exact_count"])

    return exact.map_batches(rename, batch_format="pyarrow").map_batches(
        CMSEstimateStage,
        batch_format="pyarrow",
        concurrency=2,
        fn_constructor_args=(sketch_ref,),
    )


def cms_sql() -> str:
    """DuckDB oracle: replays cell assignment, the groupby-sum merge and
    the min-over-rows estimate with the same sha256 integer math."""
    return f"""
    WITH w AS (
        SELECT source,
               unnest(string_split_regex(trim(text), '\\s+')) AS word
        FROM documents WHERE trim(text) <> ''
    ),
    rows_j AS (SELECT unnest(generate_series(0, {CMS_D - 1})) AS j),
    cells AS (
        SELECT source, j,
               CAST(('0x' || substr(sha256(CAST(j AS VARCHAR) || ':' ||
                                           word), 1, 2)) AS BIGINT)
                   AS cell,
               count(*) AS cnt
        FROM w CROSS JOIN rows_j
        GROUP BY source, j, cell
    ),
    exact AS (
        SELECT source, word AS token,
               CAST(count(*) AS BIGINT) AS exact_count
        FROM w
        WHERE substr(sha256(word), 1, 1) = '0'
        GROUP BY source, word
    ),
    est AS (
        SELECT e.source, e.token,
               min(c.cnt) AS est_count
        FROM exact e
        JOIN cells c
          ON c.source = e.source
         AND c.cell = CAST(('0x' || substr(sha256(CAST(c.j AS VARCHAR)
                             || ':' || e.token), 1, 2)) AS BIGINT)
        GROUP BY e.source, e.token
    )
    SELECT e.source, e.token,
           CAST(est.est_count AS BIGINT) AS est_count,
           e.exact_count
    FROM exact e JOIN est ON est.source = e.source AND est.token = e.token
    """


# --- Bloom filter anti-join -------------------------------------------------

BLOOM_M = 4096      # bits
BLOOM_K = 3         # hash functions


def _bloom_positions(text: str) -> tuple[int, ...]:
    hx = hashlib.sha256((text or "").encode()).hexdigest()
    return tuple(
        int(hx[4 * i: 4 * i + 4], 16) % BLOOM_M for i in range(BLOOM_K)
    )


class BloomBuildStage:
    """map_batches(pyarrow): build-side docs -> distinct bit positions
    set by this batch (<= BLOOM_M rows per task). Combine = set union =
    DISTINCT, so the merged filter is a bounded groupby — the classic
    algebraic-partial shape."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        pos: set[int] = set()
        for text in texts:
            pos.update(_bloom_positions(text))
        return pa.table(
            {"pos": pa.array(sorted(pos), type=pa.int64())}
        )


class BloomProbeStage:
    """Probe side: flags docs whose BLOOM_K positions are all set.
    maybe_known = 1 -> doc is (probably) already in the reference set;
    0 -> definitely new. The bitset broadcasts once via ray.put."""

    def __init__(self, bits_ref):
        import ray

        bits = np.zeros(BLOOM_M, dtype=bool)
        bits[np.asarray(ray.get(bits_ref), dtype=np.int64)] = True
        self.bits = bits

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").cast(pa.int64())
        texts = batch.column("text").to_pylist()
        bits = self.bits
        flag = np.fromiter(
            (all(bits[p] for p in _bloom_positions(t)) for t in texts),
            dtype=np.int32, count=len(texts),
        )
        return pa.table(
            {"doc_id": ids,
             "maybe_known": pa.array(flag, type=pa.int32())}
        )


def bloom_anti_join(docs, mod: int = 5, concurrency: int = 2):
    """Dataset(doc_id, text) -> (doc_id, maybe_known) over the WHOLE
    corpus, where the reference ("already ingested") set is the docs
    with doc_id % mod == 0. False positives are a deterministic
    function of the hash layout, so the oracle replays them exactly —
    the query checks the sketch, not just the semantics."""
    import ray

    def keep_build(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        return t.filter(pa.array(ids % mod == 0))

    pos = (
        docs.map_batches(keep_build, batch_format="pyarrow")
        .map_batches(BloomBuildStage, batch_format="pyarrow",
                     concurrency=concurrency)
        .groupby("pos")
        .count()
    ).to_pandas()["pos"].to_numpy(np.int64)
    bits_ref = ray.put(pos)

    return docs.map_batches(
        BloomProbeStage,
        batch_format="pyarrow",
        concurrency=concurrency,
        fn_constructor_args=(bits_ref,),
    )


def bloom_sql(mod: int = 5) -> str:
    """DuckDB oracle: same sha256 slice positions, DISTINCT-merged bits,
    probe passes iff all BLOOM_K positions are set."""
    pos_expr = (
        "CAST(('0x' || substr(sha256(text), 1 + 4 * i, 4)) AS BIGINT) "
        f"% {BLOOM_M}"
    )
    return f"""
    WITH ks AS (SELECT unnest(generate_series(0, {BLOOM_K - 1})) AS i),
    bits AS (
        SELECT DISTINCT {pos_expr} AS pos
        FROM documents CROSS JOIN ks
        WHERE doc_id % {mod} = 0
    ),
    probe AS (
        SELECT doc_id, i, {pos_expr} AS pos
        FROM documents CROSS JOIN ks
    )
    SELECT p.doc_id,
           CAST(CASE WHEN count(b.pos) = {BLOOM_K} THEN 1 ELSE 0 END
                AS INTEGER) AS maybe_known
    FROM probe p LEFT JOIN bits b ON b.pos = p.pos
    GROUP BY p.doc_id
    """
