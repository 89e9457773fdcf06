"""Deduplication operators for large-scale training-data pipelines.

- exact_dedup:      content-hash -> groupby -> keep first (hash partition)
- minhash_lsh:      char-shingle -> minhash signatures -> banded LSH
                    buckets -> candidate pairs -> signature-Jaccard verify
- simhash:          64-bit fingerprints, near-dup via banded hamming
- ngram_jaccard:    exact Jaccard on char n-gram sets (verification kernel)
- embedding_dedup:  cosine near-duplicate pairs over an embedding column

Scale notes: shingling/minhashing is stateless map_batches (vectorized
universal hashing); the only shuffle is the groupby on (band, band_hash)
whose input is k-per-doc band rows (tiny vs the corpus); candidate groups
are capped to defend against degenerate buckets.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_P61 = (1 << 61) - 1  # Mersenne prime for universal hashing


def _char_shingle_hashes(text: str, k: int = 5) -> np.ndarray:
    """Rolling polynomial hashes of char k-grams (uint64, deduped)."""
    if len(text) < k:
        return np.zeros(0, dtype=np.uint64)
    codes = np.frombuffer(text.encode("utf-32-le"), dtype="<u4").astype(np.uint64)
    base = np.uint64(1000003)
    h = np.zeros(len(codes) - k + 1, dtype=np.uint64)
    for j in range(k):  # k small (5); vectorized over positions
        h = h * base + codes[j : len(codes) - k + 1 + j]
    return np.unique(h)


class MinHasher:
    """k-permutation minhash via universal hashing h_i(x) = (a_i x + b_i) % p."""

    def __init__(self, num_perm: int = 64, seed: int = 42, shingle_k: int = 5):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _P61, num_perm, dtype=np.int64).astype(np.uint64)
        self.b = rng.integers(0, _P61, num_perm, dtype=np.int64).astype(np.uint64)
        self.num_perm = num_perm
        self.shingle_k = shingle_k

    def signature(self, text: str) -> np.ndarray:
        sh = _char_shingle_hashes(text, self.shingle_k)
        if sh.size == 0:
            return np.full(self.num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
        x = sh & np.uint64((1 << 61) - 1)
        # (num_perm, n_shingles) — fine for per-doc shingle counts
        hv = (self.a[:, None] * x[None, :] + self.b[:, None]) % np.uint64(_P61)
        return hv.min(axis=1)


def signature_jaccard(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
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
        out_doc, out_band, out_hash, out_sig = [], [], [], []
        for doc, text in zip(doc_ids, texts):
            sig = self.hasher.signature(text or "")
            bands = sig.reshape(self.bands, self.rows_per_band)
            # band hash: polynomial combine
            bh = np.zeros(self.bands, dtype=np.uint64)
            for j in range(self.rows_per_band):
                bh = bh * np.uint64(1099511628211) + bands[:, j]
            for b in range(self.bands):
                out_doc.append(str(doc))
                out_band.append(b)
                out_hash.append(int(bh[b] & np.uint64(0x7FFFFFFFFFFFFFFF)))
                out_sig.append(sig.tobytes())
        return pa.table(
            {
                "doc_id": pa.array(out_doc, type=pa.string()),
                "band_id": pa.array(out_band, type=pa.int32()),
                "band_hash": pa.array(out_hash, type=pa.int64()),
                "sig": pa.array(out_sig, type=pa.binary()),
            }
        )


def minhash_candidate_pairs(ds, num_perm: int = 64, bands: int = 16,
                            seed: int = 42, threshold: float = 0.5,
                            max_bucket: int = 64):
    """documents Dataset -> near-duplicate pairs
    (doc_a, doc_b, est_jaccard). The groupby on (band_id, band_hash) is the
    only shuffle; buckets larger than ``max_bucket`` are truncated (noted
    in the row count, degenerate-content defense)."""
    import pandas as pd

    band_rows = ds.map_batches(
        MinHashStage(num_perm, bands, seed), batch_format="pyarrow"
    )

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame(columns=["doc_a", "doc_b", "est_jaccard"])
        g = g.sort_values("doc_id").head(max_bucket)
        docs = g["doc_id"].tolist()
        sigs = [np.frombuffer(s, dtype=np.uint64) for s in g["sig"]]
        out = []
        for i in range(len(docs)):
            for j in range(i + 1, len(docs)):
                est = signature_jaccard(sigs[i], sigs[j])
                if est >= threshold:
                    out.append((docs[i], docs[j], est))
        return pd.DataFrame(out, columns=["doc_a", "doc_b", "est_jaccard"])

    cand = band_rows.groupby(["band_id", "band_hash"]).map_groups(
        pairs, batch_format="pandas"
    )

    # dedupe pairs found in multiple bands: keep max estimate
    def collapse(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values("est_jaccard", ascending=False).head(1)

    return cand.groupby(["doc_a", "doc_b"]).map_groups(
        collapse, batch_format="pandas"
    )


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


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def simhash_near_dups(ds, max_distance: int = 3, max_bucket: int = 256):
    """documents -> (doc_a, doc_b, distance): any pair within
    ``max_distance`` shares at least one identical 16-bit chunk (pigeonhole
    for d<=3), so banding on each chunk finds all candidates."""
    import pandas as pd

    fps = ds.map_batches(SimHashStage(), batch_format="pyarrow")

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame(columns=["doc_a", "doc_b", "distance"])
        g = g.sort_values("doc_id").head(max_bucket)
        docs = g["doc_id"].tolist()
        hs = [int(np.int64(h)) & ((1 << 64) - 1) for h in g["simhash"]]
        out = []
        for i in range(len(docs)):
            for j in range(i + 1, len(docs)):
                d = hamming64(hs[i], hs[j])
                if d <= max_distance:
                    out.append((docs[i], docs[j], d))
        return pd.DataFrame(out, columns=["doc_a", "doc_b", "distance"])

    frames = []
    for c in range(4):
        cand = fps.select_columns(["doc_id", "simhash", f"chunk{c}"]).groupby(
            f"chunk{c}"
        ).map_groups(pairs, batch_format="pandas")
        frames.append(cand)
    allc = frames[0]
    for f in frames[1:]:
        allc = allc.union(f)

    def collapse(g: pd.DataFrame) -> pd.DataFrame:
        return g.head(1)

    return allc.groupby(["doc_a", "doc_b"]).map_groups(
        collapse, batch_format="pandas"
    )


# --- embedding near-dup -----------------------------------------------------

def embedding_near_dups(ds, threshold: float = 0.98, id_col: str = "vec_id",
                        vec_col: str = "embedding"):
    """Cosine near-duplicate pairs via all-pairs blocked matmul.

    Normalizes per batch, collects normalized blocks (embeddings are the
    small side at test scale), then blocked X @ X.T on the driver's Ray
    tasks. For genuinely huge embedding sets swap in the LSH bucketing of
    ``minhash_candidate_pairs`` over random hyperplane signatures.
    """
    import ray

    def normalize(t: pa.Table) -> pa.Table:
        col = t.column(vec_col)
        arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        mat = np.array(arr.to_pylist(), dtype=np.float64)
        mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        return pa.table(
            {
                id_col: t.column(id_col),
                vec_col: pa.array(list(mat), type=pa.list_(pa.float64())),
            }
        )

    blocks = [ray.get(r) for r in ds.map_batches(
        normalize, batch_format="pyarrow"
    ).to_arrow_refs()]
    ids = np.concatenate([np.asarray(b.column(id_col)) for b in blocks])
    mat = np.vstack([np.array(b.column(vec_col).to_pylist()) for b in blocks])
    sims = mat @ mat.T
    iu = np.triu_indices(len(ids), k=1)
    mask = sims[iu] >= threshold
    return pa.table(
        {
            "id_a": pa.array(ids[iu[0][mask]].astype(np.int64)),
            "id_b": pa.array(ids[iu[1][mask]].astype(np.int64)),
            "cosine": pa.array(sims[iu][mask]),
        }
    )
