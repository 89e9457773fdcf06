"""Deduplication operators for large-scale training-data pipelines.

- exact_dedup:      sha256 content hash -> groupby on the 16-byte hash ->
                    keep first. The shuffle moves hashes, never documents
                    (grouping by raw text would shuffle the full corpus).
- minhash_lsh:      char-shingle -> minhash signatures -> banded LSH
                    buckets -> candidate pairs -> signature-Jaccard verify
- simhash:          64-bit fingerprints, near-dup via banded hamming
- ngram_jaccard:    exact Jaccard on char n-gram sets (verification kernel)
- embedding_near_dups: cosine near-duplicates via random-hyperplane
                    signatures + the same banded-LSH bucketing (streaming;
                    nothing is materialized on the driver)

Scale notes: shingling/minhashing is stateless map_batches (vectorized
universal hashing); the only shuffle is the groupby on (band, band_hash)
whose input is k-per-doc band rows (tiny vs the corpus); candidate groups
are capped to defend against degenerate buckets.

Oracle-exactness: the shingle hash is a rolling polynomial mod 2^64 over
codepoints and the minhash permutations use p = 2^31 - 1 universal
hashing, so every intermediate fits exact BIGINT/HUGEINT arithmetic —
``minhash_pairs_sql`` / ``simhash_sql`` emit DuckDB SQL that reproduces
the engine output bitwise (the driver's hard check).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

_P31 = 2147483647  # 2^31 - 1, Mersenne prime: a*x + b stays under 2^62
_BASE = 1000003
_M64 = 1 << 64

_SQL_TOK = """
    SELECT CAST(doc_id AS VARCHAR) AS doc_id,
           generate_subscripts(string_split(text, ''), 1) - 1 AS pos,
           unicode(unnest(string_split(text, ''))) AS token
    FROM documents
"""


def _char_shingle_hashes(text: str, k: int = 5) -> np.ndarray:
    """Rolling polynomial hashes of char k-grams (uint64 wrap = mod 2^64,
    deduped)."""
    if len(text) < k:
        return np.zeros(0, dtype=np.uint64)
    codes = np.frombuffer(text.encode("utf-32-le"), dtype="<u4").astype(np.uint64)
    base = np.uint64(_BASE)
    h = np.zeros(len(codes) - k + 1, dtype=np.uint64)
    for j in range(k):  # k small (5); vectorized over positions
        h = h * base + codes[j : len(codes) - k + 1 + j]
    return np.unique(h)


def _shingle_sql(k: int) -> str:
    """CTE chain tok -> win -> sh(doc_id, h UBIGINT): the identical
    rolling polynomial mod 2^64, HUGEINT-exact, DISTINCT per doc."""
    leads = ", ".join(
        f"lead(token, {j}) OVER w AS c{j}" for j in range(1, k)
    )
    poly = "c0"
    for j in range(1, k):
        poly = f"({poly} * {_BASE} + c{j})"
    return f"""
    tok AS ({_SQL_TOK}),
    win AS (
        SELECT doc_id, CAST(token AS HUGEINT) AS c0, {leads}
        FROM tok WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
    ),
    sh AS (
        SELECT DISTINCT doc_id,
               CAST({poly} % {_M64} AS UBIGINT) AS h
        FROM win WHERE c{k - 1} IS NOT NULL
    )"""


class MinHasher:
    """k-permutation minhash, h_i(x) = (a_i * x + b_i) mod (2^31 - 1)
    over x = shingle_hash mod (2^31 - 1). All products stay below 2^62:
    exact in int64 on the engine side and BIGINT on the oracle side."""

    def __init__(self, num_perm: int = 64, seed: int = 42, shingle_k: int = 5):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _P31, num_perm, dtype=np.int64)
        self.b = rng.integers(0, _P31, num_perm, dtype=np.int64)
        self.num_perm = num_perm
        self.shingle_k = shingle_k

    def signature(self, text: str) -> np.ndarray | None:
        """int64 signature, or None when the doc has no shingles (shorter
        than k — such docs are excluded from LSH, as in the oracle)."""
        sh = _char_shingle_hashes(text, self.shingle_k)
        if sh.size == 0:
            return None
        x = (sh % np.uint64(_P31)).astype(np.int64)
        hv = (self.a[:, None] * x[None, :] + self.b[:, None]) % _P31
        return hv.min(axis=1)


def signature_jaccard(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
    # mean of num_perm equality bits; num_perm a power of two -> exact
    return float(np.mean(sig_a == sig_b))


def ngram_jaccard(text_a: str, text_b: str, k: int = 5) -> float:
    a = _char_shingle_hashes(text_a, k)
    b = _char_shingle_hashes(text_b, k)
    if a.size == 0 and b.size == 0:
        return 1.0
    inter = np.intersect1d(a, b, assume_unique=True).size
    union = a.size + b.size - inter
    return inter / union if union else 0.0


class MinHashStage:
    """map_batches: documents(text) -> (doc_id, band_id, band_hash, sig)."""

    def __init__(self, num_perm: int = 64, bands: int = 16, seed: int = 42,
                 shingle_k: int = 5):
        assert num_perm % bands == 0
        self.hasher = MinHasher(num_perm, seed, shingle_k)
        self.bands = bands
        self.rows_per_band = num_perm // bands

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        # lockstep across docs: ONE (num_perm, total_shingles) product +
        # mod for the whole batch with per-doc segment mins — identical
        # int64 arithmetic to the per-doc loop, so signatures (and the
        # SQL oracle) are bitwise unchanged; the per-doc Python matmul
        # overhead was ~4 ms/doc (the minhash stage's dominant cost)
        shingle_arrs = []
        keep_docs = []
        for doc, text in zip(doc_ids, texts):
            sh = _char_shingle_hashes(text or "", self.hasher.shingle_k)
            if sh.size == 0:
                continue  # shorter than k: excluded from LSH (oracle too)
            shingle_arrs.append(sh)
            keep_docs.append(str(doc))
        n_docs = len(keep_docs)
        if n_docs == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], type=pa.string()),
                    "band_id": pa.array([], type=pa.int32()),
                    "band_hash": pa.array([], type=pa.int64()),
                    "sig": pa.array([], type=pa.binary()),
                }
            )
        lengths = np.fromiter((a.size for a in shingle_arrs), np.int64,
                              n_docs)
        starts = np.concatenate(([0], np.cumsum(lengths)[:-1]))
        x = (np.concatenate(shingle_arrs) % np.uint64(_P31)).astype(
            np.int64
        )
        a, b = self.hasher.a, self.hasher.b
        hv = (a[:, None] * x[None, :] + b[:, None]) % _P31
        # per-doc min over each shingle segment, per permutation row
        sigs = np.minimum.reduceat(hv, starts, axis=1).T  # (n_docs, P)
        bands3 = sigs.reshape(n_docs, self.bands, self.rows_per_band)
        bh = np.zeros((n_docs, self.bands), dtype=np.uint64)
        with np.errstate(over="ignore"):
            for j in range(self.rows_per_band):
                bh = bh * np.uint64(1099511628211) + bands3[:, :, j].astype(
                    np.uint64
                )
        bh = (bh & np.uint64(0x7FFFFFFFFFFFFFFF)).astype(np.int64)
        sig_bytes = [s.tobytes() for s in sigs]
        out_doc, out_sig = [], []
        for d, sb in zip(keep_docs, sig_bytes):
            out_doc.extend([d] * self.bands)
            out_sig.extend([sb] * self.bands)
        return pa.table(
            {
                "doc_id": pa.array(out_doc, type=pa.string()),
                "band_id": pa.array(
                    np.tile(np.arange(self.bands, dtype=np.int32), n_docs)
                ),
                "band_hash": pa.array(bh.reshape(-1)),
                "sig": pa.array(out_sig, type=pa.binary()),
            }
        )


def _fnv64(s: str) -> int:
    h = 0xCBF29CE484222325
    for ch in s.encode():
        h = ((h ^ ch) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def minhash_candidate_pairs(ds, num_perm: int = 64, bands: int = 16,
                            seed: int = 42, threshold: float = 0.5,
                            shingle_k: int = 5,
                            max_bucket: int | None = 64,
                            n_buckets: int = 64,
                            shuffle_partitions: int | None = None):
    """documents Dataset -> near-duplicate pairs
    (doc_a, doc_b, est_jaccard). LSH buckets larger than ``max_bucket``
    are truncated (degenerate-content defense; pass None for oracle-exact
    output).

    Shuffle shape: one groupby on ``n_buckets`` COARSE buckets of
    hash(band_id, band_hash) — not one map_groups call per LSH bucket.
    Ray's per-group UDF overhead at ~16 band-rows/doc means per-bucket
    grouping costs seconds per 100k docs (measured 25 s at 5k docs);
    the coarse kernel sorts each bucket once and walks the LSH runs
    vectorized, same output bitwise."""

    band_rows = ds.map_batches(
        MinHashStage(num_perm, bands, seed, shingle_k), batch_format="pyarrow"
    )

    def add_bucket(t: pa.Table) -> pa.Table:
        band = t.column("band_id").to_numpy(zero_copy_only=False)
        bh = t.column("band_hash").to_numpy(zero_copy_only=False)
        mix = (bh.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
               + band.astype(np.uint64))
        bucket = ((mix >> np.uint64(48)).astype(np.int64)) % n_buckets
        return t.append_column("__bucket", pa.array(bucket))

    def bucket_pairs(g: pa.Table) -> pa.Table:
        # pyarrow-native: ASCII doc_ids sort identically under Arrow's
        # bytewise and pandas' codepoint order, so pair orientation and
        # max_bucket truncation are unchanged
        g = g.sort_by([("band_id", "ascending"), ("band_hash", "ascending"),
                       ("doc_id", "ascending")])
        bandv = g.column("band_id").to_numpy(zero_copy_only=False)
        bhv = g.column("band_hash").to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(np.concatenate((
            [True], (bandv[1:] != bandv[:-1]) | (bhv[1:] != bhv[:-1]))))
        ends = np.concatenate((starts[1:], [g.num_rows]))
        docs_all = g.column("doc_id").to_pylist()
        sig_all = g.column("sig").to_pylist()
        out_a, out_b, out_e = [], [], []
        for s0, s1 in zip(starts, ends):
            if s1 - s0 < 2:
                continue
            if max_bucket is not None and s1 - s0 > max_bucket:
                s1 = s0 + max_bucket
            n = s1 - s0
            sigs = np.stack([np.frombuffer(s, dtype=np.int64)
                             for s in sig_all[s0:s1]])
            # (n, n) equal-permutation fractions; exact count/num_perm
            eq = (sigs[:, None, :] == sigs[None, :, :]).mean(axis=2)
            ii, jj = np.triu_indices(n, k=1)
            est = eq[ii, jj]
            keep = est >= threshold
            for i, j, v in zip(ii[keep], jj[keep], est[keep]):
                out_a.append(docs_all[s0 + i])
                out_b.append(docs_all[s0 + j])
                out_e.append(float(v))
        return pa.table(
            {
                "doc_a": pa.array(out_a, type=pa.string()),
                "doc_b": pa.array(out_b, type=pa.string()),
                "est_jaccard": pa.array(out_e, type=pa.float64()),
            }
        )

    tagged = band_rows.map_batches(add_bucket, batch_format="pyarrow")
    if shuffle_partitions is not None:
        # bound the sort-shuffle task count for small inputs (each
        # groupby spawns a map+reduce pair per block; coordination
        # dominates sub-GB exchanges — same trick as
        # gapfill_dataset_bucketed). Grouping is by key, so the result
        # is bitwise-independent of the pre-partitioning.
        tagged = tagged.repartition(shuffle_partitions, shuffle=False)
    cand = (
        tagged
        .groupby("__bucket")
        .map_groups(bucket_pairs, batch_format="pyarrow")
    )

    # dedupe pairs found in multiple bands (the estimate is a pure
    # function of the signatures, so duplicates carry identical values)
    def add_pair_bucket(t: pa.Table) -> pa.Table:
        b = [(_fnv64(a) ^ _fnv64(bb)) % 16
             for a, bb in zip(t.column("doc_a").to_pylist(),
                              t.column("doc_b").to_pylist())]
        return t.append_column("__bucket", pa.array(b, type=pa.int64()))

    def bucket_collapse(g: pa.Table) -> pa.Table:
        est = g.column("est_jaccard").to_numpy(zero_copy_only=False)
        a = g.column("doc_a").to_pylist()
        b = g.column("doc_b").to_pylist()
        order = np.argsort(-est, kind="stable")
        seen, keep = set(), []
        for i in order:
            k = (a[i], b[i])
            if k not in seen:
                seen.add(k)
                keep.append(int(i))
        return g.select(["doc_a", "doc_b", "est_jaccard"]).take(
            pa.array(keep, type=pa.int64())
        )

    return (
        cand.map_batches(add_pair_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(bucket_collapse, batch_format="pyarrow")
    )


def minhash_pairs_sql(num_perm: int = 64, bands: int = 16, seed: int = 42,
                      threshold: float = 0.5, shingle_k: int = 5) -> str:
    """DuckDB oracle for ``minhash_candidate_pairs`` (max_bucket=None):
    same shingles, same permutations (identical rng constants), candidate
    iff some band matches exactly, est = equal perms / num_perm."""
    h = MinHasher(num_perm, seed, shingle_k)
    r = num_perm // bands
    mins = ",\n           ".join(
        f"min(({int(h.a[i])} * x + {int(h.b[i])}) % {_P31}) AS mh{i}"
        for i in range(num_perm)
    )
    band_conds = " OR ".join(
        "(" + " AND ".join(
            f"a.mh{b * r + j} = b.mh{b * r + j}" for j in range(r)
        ) + ")"
        for b in range(bands)
    )
    eq_sum = " + ".join(
        f"(CASE WHEN a.mh{i} = b.mh{i} THEN 1 ELSE 0 END)"
        for i in range(num_perm)
    )
    return f"""
    WITH {_shingle_sql(shingle_k)},
    x AS (SELECT doc_id, CAST(h % {_P31} AS BIGINT) AS x FROM sh),
    sigs AS (
        SELECT doc_id,
           {mins}
        FROM x GROUP BY doc_id
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST({eq_sum} AS DOUBLE) / {num_perm} AS est_jaccard
    FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
    WHERE ({band_conds})
      AND CAST({eq_sum} AS DOUBLE) / {num_perm} >= {threshold}
    """


# --- SimHash ----------------------------------------------------------------

def simhash64(text: str, k: int = 5) -> int:
    sh = _char_shingle_hashes(text, k)
    if sh.size == 0:
        return 0
    bits = ((sh[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1))
    votes = bits.astype(np.int64).sum(axis=0) * 2 - sh.size
    fp = np.uint64(0)
    for i in range(64):
        if votes[i] > 0:
            fp |= np.uint64(1) << np.uint64(i)
    return int(fp)


class SimHashStage:
    def __init__(self, shingle_k: int = 5):
        self.k = shingle_k

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        fps = np.array([simhash64(t or "", self.k) for t in texts], dtype=np.uint64)
        out = {
            "doc_id": batch.column("doc_id").cast(pa.string()),
            "simhash": pa.array(fps.view(np.int64)),
        }
        # 4 x 16-bit chunks for banded hamming lookup
        for c in range(4):
            out[f"chunk{c}"] = pa.array(
                ((fps >> np.uint64(16 * c)) & np.uint64(0xFFFF)).astype(np.int32)
            )
        return pa.table(out)


def simhash_sql(shingle_k: int = 5) -> str:
    """DuckDB oracle for per-doc simhash64: majority vote per bit over the
    DISTINCT shingle hashes, bit 63 wrapped to signed via HUGEINT."""
    votes = ",\n           ".join(
        f"sum(CASE WHEN (h >> {j}) & 1 = 1 THEN 1 ELSE -1 END) AS v{j}"
        for j in range(64)
    )
    fp = " + ".join(
        f"(CASE WHEN v{j} > 0 THEN CAST({1 << j} AS HUGEINT) ELSE 0 END)"
        for j in range(64)
    )
    return f"""
    WITH {_shingle_sql(shingle_k)},
    votes AS (
        SELECT doc_id,
           {votes}
        FROM sh GROUP BY doc_id
    ),
    fp AS (
        SELECT doc_id, ({fp}) AS fph FROM votes
    )
    SELECT d.doc_id,
           CAST(COALESCE(
               f.fph - (CASE WHEN f.fph >= {1 << 63} THEN CAST({_M64} AS HUGEINT)
                             ELSE 0 END),
               0) AS BIGINT) AS simhash
    FROM (SELECT CAST(doc_id AS VARCHAR) AS doc_id FROM documents) d
    LEFT JOIN fp f USING (doc_id)
    """


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


_POP8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)


def simhash_near_dups(ds, max_distance: int = 3, max_bucket: int = 256,
                      n_buckets: int = 64):
    """documents -> (doc_a, doc_b, distance): any pair within
    ``max_distance`` shares at least one identical 16-bit chunk (pigeonhole
    for d<=3), so banding on each chunk finds all candidates.

    Shuffle shape: per chunk one groupby on chunk % ``n_buckets`` coarse
    buckets (not one map_groups per 16-bit value); the kernel sorts each
    bucket once, walks the chunk-value runs, and computes Hamming
    distances with a vectorized XOR + byte-popcount table."""

    fps = ds.map_batches(SimHashStage(), batch_format="pyarrow")

    def mk_bucket(c):
        def add(t: pa.Table) -> pa.Table:
            v = t.column(f"chunk{c}").to_numpy(zero_copy_only=False)
            return t.append_column(
                "__bucket", pa.array((v.astype(np.int64)) % n_buckets)
            )

        return add

    def mk_pairs(c):
        col = f"chunk{c}"

        def bucket_pairs(g: pa.Table) -> pa.Table:
            g = g.sort_by([(col, "ascending"), ("doc_id", "ascending")])
            cv = g.column(col).to_numpy(zero_copy_only=False)
            starts = np.flatnonzero(
                np.concatenate(([True], cv[1:] != cv[:-1]))
            )
            ends = np.concatenate((starts[1:], [g.num_rows]))
            docs = g.column("doc_id").to_pylist()
            hs = g.column("simhash").to_numpy(
                zero_copy_only=False
            ).astype(np.int64).view(np.uint64)
            out_a, out_b, out_d = [], [], []
            for s0, s1 in zip(starts, ends):
                if s1 - s0 < 2:
                    continue
                if s1 - s0 > max_bucket:
                    s1 = s0 + max_bucket
                n = s1 - s0
                sub = hs[s0:s1]
                xor = sub[:, None] ^ sub[None, :]
                pc = _POP8[xor.view(np.uint8).reshape(n, n, 8)].sum(
                    axis=2
                ).astype(np.int64)
                ii, jj = np.triu_indices(n, k=1)
                keep = pc[ii, jj] <= max_distance
                for i, j in zip(ii[keep], jj[keep]):
                    out_a.append(docs[s0 + i])
                    out_b.append(docs[s0 + j])
                    out_d.append(int(pc[i, j]))
            return pa.table(
                {
                    "doc_a": pa.array(out_a, type=pa.string()),
                    "doc_b": pa.array(out_b, type=pa.string()),
                    "distance": pa.array(out_d, type=pa.int64()),
                }
            )

        return bucket_pairs

    frames = []
    for c in range(4):
        cand = (
            fps.select_columns(["doc_id", "simhash", f"chunk{c}"])
            .map_batches(mk_bucket(c), batch_format="pyarrow")
            .groupby("__bucket")
            .map_groups(mk_pairs(c), batch_format="pyarrow")
        )
        frames.append(cand)
    allc = frames[0]
    for f in frames[1:]:
        allc = allc.union(f)

    # collapse pairs found via multiple chunks (distance is a pure
    # function of the two fingerprints -> duplicates carry equal values)
    def add_pair_bucket(t: pa.Table) -> pa.Table:
        b = [(_fnv64(a) ^ _fnv64(bb)) % 16
             for a, bb in zip(t.column("doc_a").to_pylist(),
                              t.column("doc_b").to_pylist())]
        return t.append_column("__bucket", pa.array(b, type=pa.int64()))

    def bucket_collapse(g: pa.Table) -> pa.Table:
        a = g.column("doc_a").to_pylist()
        b = g.column("doc_b").to_pylist()
        seen, keep = set(), []
        for i, k in enumerate(zip(a, b)):
            if k not in seen:
                seen.add(k)
                keep.append(i)
        return g.select(["doc_a", "doc_b", "distance"]).take(
            pa.array(keep, type=pa.int64())
        )

    return (
        allc.map_batches(add_pair_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(bucket_collapse, batch_format="pyarrow")
    )


# --- exact dedup ------------------------------------------------------------

def content_hash_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, text) -> (doc_id, content_hash): sha256 hex, C-level,
    stateless (plain function — no actor pool needed)."""
    texts = batch.column("text").to_pylist()
    hs = [hashlib.sha256((t or "").encode()).hexdigest() for t in texts]
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "content_hash": pa.array(hs, type=pa.string()),
        }
    )


def exact_dedup(ds):
    """documents -> (doc_id, keep, dup_count), keep = min doc_id per
    content group. Groups by the sha256 hash, so the shuffle carries
    32-byte keys instead of whole documents (~1000x less at corpus scale);
    within-group semantics are identical to grouping by text
    (collision-free for any practical corpus)."""

    def add_bucket(t: pa.Table) -> pa.Table:
        # 64 coarse buckets from the hash prefix: one vectorized
        # map_groups call per bucket instead of one per distinct hash
        b = [int(h[:4], 16) % 64
             for h in t.column("content_hash").to_pylist()]
        return t.append_column("__bucket", pa.array(b, type=pa.int64()))

    def bucket_keep_first(g: pa.Table) -> pa.Table:
        # pyarrow-native; np.unique on str arrays == pandas lexicographic
        # group min, so keep/dup_count values are unchanged
        h = np.asarray(g.column("content_hash").to_pylist(), dtype=object)
        d = np.asarray(g.column("doc_id").to_pylist(), dtype=object)
        uniq, inverse, counts = np.unique(
            h, return_inverse=True, return_counts=True
        )
        order = np.lexsort((d, h))
        hs = h[order]
        starts = np.flatnonzero(
            np.concatenate(([True], hs[1:] != hs[:-1]))
        )
        mins = d[order][starts]  # aligned with uniq (both hash-sorted)
        keep = d == mins[inverse]
        return pa.table(
            {
                "doc_id": g.column("doc_id"),  # original dtype, same order
                "keep": pa.array(keep.astype(bool)),
                "dup_count": pa.array(
                    counts[inverse].astype(np.int64), type=pa.int64()
                ),
            }
        )

    return (
        ds.map_batches(content_hash_batch, batch_format="pyarrow")
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(bucket_keep_first, batch_format="pyarrow")
    )


# --- embedding near-dup -----------------------------------------------------

class HyperplaneSigStage:
    """map_batches: (id, vec) -> one row per band with
    (id, band_id, band_key, vec float32 bytes). Random hyperplanes are
    built once per actor from the seed (deterministic — no broadcast
    needed); signatures are a single matmul + sign per batch."""

    def __init__(self, n_planes: int = 16, bands: int = 4, seed: int = 42,
                 id_col: str = "vec_id", vec_col: str = "embedding"):
        assert n_planes % bands == 0
        self.n_planes, self.bands, self.seed = n_planes, bands, seed
        self.r = n_planes // bands
        self.id_col, self.vec_col = id_col, vec_col
        self.planes = None  # built lazily (dim known at first batch)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .ann import _normalize, _to_matrix

        mat = _normalize(_to_matrix(batch.column(self.vec_col)))
        if self.planes is None:
            rng = np.random.default_rng(self.seed)
            self.planes = rng.standard_normal((self.n_planes, mat.shape[1]))
        bits = (mat @ self.planes.T) >= 0.0  # (n, n_planes)
        weights = (1 << np.arange(self.r)).astype(np.int64)
        ids = batch.column(self.id_col).to_numpy(zero_copy_only=False)
        v32 = mat.astype(np.float32)
        out_id, out_band, out_key, out_vec = [], [], [], []
        for b in range(self.bands):
            keys = bits[:, b * self.r : (b + 1) * self.r].astype(np.int64) @ weights
            out_id.extend(ids.tolist())
            out_band.extend([b] * len(ids))
            out_key.extend(keys.tolist())
            out_vec.extend([v.tobytes() for v in v32])
        return pa.table(
            {
                "id": pa.array(out_id, type=pa.int64()),
                "band_id": pa.array(out_band, type=pa.int32()),
                "band_key": pa.array(out_key, type=pa.int64()),
                "vec": pa.array(out_vec, type=pa.binary()),
            }
        )


def embedding_near_dups(ds, threshold: float = 0.98, id_col: str = "vec_id",
                        vec_col: str = "embedding", n_planes: int = 16,
                        bands: int = 4, seed: int = 42,
                        max_bucket: int = 1024):
    """Cosine near-duplicate pairs via random-hyperplane LSH: signature
    stage (stateless map_batches) -> groupby (band_id, band_key) ->
    within-bucket exact cosine verify -> pair dedup. Streaming end to end:
    the only shuffle is k-band signature rows; nothing touches the driver
    (the round-1 version ray.get the whole dataset and ran a full X @ X.T).

    Recall: a pair at cosine c survives a band with prob (1 - acos(c)/pi)^r;
    defaults give ~99.7% for c >= 0.98. Raise ``bands`` for higher recall.
    """

    sig = ds.map_batches(
        HyperplaneSigStage(n_planes, bands, seed, id_col, vec_col),
        batch_format="pyarrow",
    )

    def verify(ids: np.ndarray, vecs: list):
        """One (already id-sorted, max_bucket-capped) LSH bucket ->
        (id_a, id_b, cosine) arrays of exact-cosine hits."""
        X = np.stack(
            [np.frombuffer(v, dtype=np.float32) for v in vecs]
        ).astype(np.float64)
        X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
        sims = X @ X.T
        iu = np.triu_indices(ids.size, k=1)
        mask = sims[iu] >= threshold
        return (ids[iu[0][mask]].astype(np.int64),
                ids[iu[1][mask]].astype(np.int64),
                sims[iu][mask])

    def add_bucket(t: pa.Table) -> pa.Table:
        band = t.column("band_id").to_numpy(zero_copy_only=False)
        key = t.column("band_key").to_numpy(zero_copy_only=False)
        mix = (key.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
               + band.astype(np.uint64))
        return t.append_column(
            "__bucket",
            pa.array(((mix >> np.uint64(48)).astype(np.int64)) % 64),
        )

    def bucket_verify(g: pa.Table) -> pa.Table:
        g = g.sort_by([("band_id", "ascending"), ("band_key", "ascending"),
                       ("id", "ascending")])
        bandv = g.column("band_id").to_numpy(zero_copy_only=False)
        keyv = g.column("band_key").to_numpy(zero_copy_only=False)
        idv = g.column("id").to_numpy(zero_copy_only=False)
        vecs = g.column("vec").to_pylist()
        starts = np.flatnonzero(np.concatenate((
            [True], (bandv[1:] != bandv[:-1]) | (keyv[1:] != keyv[:-1]))))
        ends = np.concatenate((starts[1:], [g.num_rows]))
        out_a, out_b, out_c = [], [], []
        for s0, s1 in zip(starts, ends):
            if s1 - s0 < 2:
                continue
            s1 = min(s1, s0 + max_bucket)  # id-ascending within the run
            a, b, c = verify(idv[s0:s1], vecs[s0:s1])
            out_a.append(a)
            out_b.append(b)
            out_c.append(c)
        if not out_a:
            return pa.table(
                {
                    "id_a": pa.array([], type=pa.int64()),
                    "id_b": pa.array([], type=pa.int64()),
                    "cosine": pa.array([], type=pa.float64()),
                }
            )
        return pa.table(
            {
                "id_a": pa.array(np.concatenate(out_a), type=pa.int64()),
                "id_b": pa.array(np.concatenate(out_b), type=pa.int64()),
                "cosine": pa.array(np.concatenate(out_c),
                                   type=pa.float64()),
            }
        )

    cand = (
        sig.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(bucket_verify, batch_format="pyarrow")
    )

    def add_pair_bucket(t: pa.Table) -> pa.Table:
        a = t.column("id_a").to_numpy(zero_copy_only=False)
        b = t.column("id_b").to_numpy(zero_copy_only=False)
        mix = (a.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
               ^ b.astype(np.uint64))
        return t.append_column(
            "__bucket",
            pa.array(((mix >> np.uint64(48)).astype(np.int64)) % 16),
        )

    def bucket_collapse(g: pa.Table) -> pa.Table:
        a = g.column("id_a").to_numpy(zero_copy_only=False)
        b = g.column("id_b").to_numpy(zero_copy_only=False)
        seen, keep = set(), []
        for i, k in enumerate(zip(a.tolist(), b.tolist())):
            if k not in seen:
                seen.add(k)
                keep.append(i)
        return g.select(["id_a", "id_b", "cosine"]).take(
            pa.array(keep, type=pa.int64())
        )

    return (
        cand.map_batches(add_pair_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(bucket_collapse, batch_format="pyarrow")
    )


# --- Online (streaming) dedup ----------------------------------------------

def minhash_online_dedup(ds, num_perm: int = 64, bands: int = 16,
                         seed: int = 42, threshold: float = 0.5,
                         shingle_k: int = 5, n_buckets: int = 64,
                         shuffle_partitions: int | None = None):
    """Streaming-dedup SEMANTICS, batch-shaped: a doc is a duplicate iff
    it LSH-collides with an EARLIER doc (numeric doc_id = arrival order)
    whose signature similarity >= threshold; ``dup_of`` is the earliest
    such doc. This is exactly what an online query-before-insert LSH
    index (``OnlineLSHIndex``) computes doc by doc — equality is
    pytest-asserted — but expressed as one bucket-grouped pass so the
    scale shape stays the band-row shuffle, not a serial index actor.

    Returns Dataset(doc_id int64, dup_of int64), rows only for dup docs.
    """

    band_rows = ds.map_batches(
        MinHashStage(num_perm, bands, seed, shingle_k),
        batch_format="pyarrow",
    )

    def add_bucket(t: pa.Table) -> pa.Table:
        band = t.column("band_id").to_numpy(zero_copy_only=False)
        bh = t.column("band_hash").to_numpy(zero_copy_only=False)
        mix = (bh.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
               + band.astype(np.uint64))
        bucket = ((mix >> np.uint64(48)).astype(np.int64)) % n_buckets
        return t.append_column("__bucket", pa.array(bucket))

    def bucket_scan(g: pa.Table) -> pa.Table:
        ids = g.column("doc_id").to_pylist()
        idnum = np.array([int(d) for d in ids], dtype=np.int64)
        band0 = g.column("band_id").to_numpy(zero_copy_only=False)
        bh0 = g.column("band_hash").to_numpy(zero_copy_only=False)
        order = np.lexsort((idnum, bh0, band0))
        bandv = band0[order]
        bhv = bh0[order]
        idnum = idnum[order]
        sig_all = np.asarray(g.column("sig").to_pylist(),
                             dtype=object)[order]
        starts = np.flatnonzero(np.concatenate((
            [True], (bandv[1:] != bandv[:-1]) | (bhv[1:] != bhv[:-1]))))
        ends = np.concatenate((starts[1:], [len(g)]))
        out_doc, out_dup = [], []
        for s0, s1 in zip(starts, ends):
            n = s1 - s0
            if n < 2:
                continue
            sigs = np.stack([np.frombuffer(s, dtype=np.int64)
                             for s in sig_all[s0:s1]])
            eq = (sigs[:, None, :] == sigs[None, :, :]).mean(axis=2)
            sub = idnum[s0:s1]  # ascending within the run
            for i in range(1, n):
                ok = np.flatnonzero(eq[i, :i] >= threshold)
                if ok.size:
                    out_doc.append(sub[i])
                    out_dup.append(int(sub[ok].min()))
        return pa.table(
            {
                "doc_id": pa.array(
                    np.asarray(out_doc, dtype=np.int64), type=pa.int64()
                ),
                "dup_of": pa.array(
                    np.asarray(out_dup, dtype=np.int64), type=pa.int64()
                ),
            }
        )

    tagged = band_rows.map_batches(add_bucket, batch_format="pyarrow")
    if shuffle_partitions is not None:
        # bound the sort-shuffle task count on small inputs (see
        # minhash_candidate_pairs — bitwise-independent of partitioning)
        tagged = tagged.repartition(shuffle_partitions, shuffle=False)
    per_band = (
        tagged
        .groupby("__bucket")
        .map_groups(bucket_scan, batch_format="pyarrow")
    )

    def rename(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t.column("doc_id").cast(pa.int64()),
                "dup_of": t.column("min(dup_of)").cast(pa.int64()),
            }
        )

    # tiny shuffle: only (int64, int64) rows for docs with >=1 match
    return per_band.groupby("doc_id").min("dup_of").map_batches(
        rename, batch_format="pyarrow"
    )


class OnlineLSHIndex:
    """The literal online path: query-before-insert LSH index over an
    ordered doc stream. Mutable shared state -> one actor (the case the
    Dataset API can't express); used to PROVE the batch formulation
    above computes stream semantics (bitwise-equal keep decisions), and
    as the building block for a true per-band-sharded online service."""

    def __init__(self, num_perm: int = 64, bands: int = 16, seed: int = 42,
                 threshold: float = 0.5, shingle_k: int = 5):
        self.hasher = MinHasher(num_perm, seed, shingle_k)
        self.bands = bands
        self.rows_per_band = num_perm // bands
        self.threshold = threshold
        self.buckets: dict[tuple[int, int], list[tuple[int, np.ndarray]]] = {}

    def offer(self, doc_id: int, text: str):
        """Returns (is_dup, dup_of) then indexes the doc. Docs must be
        offered in ascending doc_id order."""
        sig = self.hasher.signature(text or "")
        if sig is None:
            return False, -1
        grid = sig.reshape(self.bands, self.rows_per_band)
        bh = np.zeros(self.bands, dtype=np.uint64)
        for j in range(self.rows_per_band):
            bh = bh * np.uint64(1099511628211) + grid[:, j].astype(np.uint64)
        keys = [(b, int(bh[b] & np.uint64(0x7FFFFFFFFFFFFFFF)))
                for b in range(self.bands)]
        best = -1
        num_perm = sig.size
        for key in keys:
            for prev_id, prev_sig in self.buckets.get(key, ()):
                if (prev_sig == sig).sum() / num_perm >= self.threshold:
                    if best < 0 or prev_id < best:
                        best = prev_id
        for key in keys:
            self.buckets.setdefault(key, []).append((int(doc_id), sig))
        return best >= 0, best


def minhash_online_dedup_sql(num_perm: int = 64, bands: int = 16,
                             seed: int = 42, threshold: float = 0.5,
                             shingle_k: int = 5) -> str:
    """DuckDB oracle: dup_of(x) = min earlier doc (BIGINT order) sharing
    >=1 exact band with signature similarity >= threshold — the same
    permutation constants as the engine."""
    h = MinHasher(num_perm, seed, shingle_k)
    r = num_perm // bands
    mins = ",\n           ".join(
        f"min(({int(h.a[i])} * x + {int(h.b[i])}) % {_P31}) AS mh{i}"
        for i in range(num_perm)
    )
    band_conds = " OR ".join(
        "(" + " AND ".join(
            f"a.mh{b * r + j} = b.mh{b * r + j}" for j in range(r)
        ) + ")"
        for b in range(bands)
    )
    eq_sum = " + ".join(
        f"(CASE WHEN a.mh{i} = b.mh{i} THEN 1 ELSE 0 END)"
        for i in range(num_perm)
    )
    return f"""
    WITH {_shingle_sql(shingle_k)},
    x AS (SELECT doc_id, CAST(h % {_P31} AS BIGINT) AS x FROM sh),
    sigs AS (
        SELECT doc_id,
           {mins}
        FROM x GROUP BY doc_id
    )
    SELECT CAST(b.doc_id AS BIGINT) AS doc_id,
           min(CAST(a.doc_id AS BIGINT)) AS dup_of
    FROM sigs a JOIN sigs b
      ON CAST(a.doc_id AS BIGINT) < CAST(b.doc_id AS BIGINT)
    WHERE ({band_conds})
      AND CAST({eq_sum} AS DOUBLE) / {num_perm} >= {threshold}
    GROUP BY b.doc_id
    """
