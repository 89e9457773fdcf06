"""Text analysis stages: language-ID heuristic, quality scoring, token
counting, document fingerprinting.

All stateful setup (stopword sets, compiled regexes, n-gram profiles)
happens once per actor in ``__init__``; per-batch work is vectorized or
C-level (regex engine).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

# tiny trigram profiles for a handful of languages (hand-rolled heuristic —
# frequency-ranked common trigrams; adequate for a synthetic corpus)
_LANG_PROFILES = {
    "en": ["the", "and", "ing", "ion", "ent", "her", "for", "tha", "nth", "int"],
    "de": ["der", "ein", "sch", "ich", "nde", "die", "che", "den", "und", "ung"],
    "fr": ["les", "ent", "des", "que", "ion", "eur", "ait", "ans", "our", "une"],
    "es": ["que", "ent", "con", "ion", "ado", "los", "par", "cio", "nte", "una"],
}


class LangIdStage:
    """Trigram-overlap language scorer; emits best language + score."""

    def __init__(self, profiles=None):
        self.profiles = {
            lang: set(tris) for lang, tris in (profiles or _LANG_PROFILES).items()
        }
        self.word = re.compile(r"[a-zA-Z]+")

    def classify(self, text: str) -> tuple[str, float]:
        t = text.lower()
        tris = {t[i : i + 3] for i in range(len(t) - 2)}
        best, score = "unknown", 0.0
        for lang, prof in self.profiles.items():
            s = len(tris & prof) / len(prof)
            if s > score:
                best, score = lang, s
        return best, score

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        langs, scores = [], []
        for t in texts:
            lang, s = self.classify(t or "")
            langs.append(lang)
            scores.append(s)
        return pa.table(
            {
                "doc_id": batch.column("doc_id").cast(pa.string()),
                "lang_pred": pa.array(langs, type=pa.string()),
                "lang_score": pa.array(scores, type=pa.float64()),
            }
        )


_STOPWORDS = {
    "the", "and", "of", "a", "to", "in", "is", "it", "that", "for", "on",
    "with", "as", "at", "by", "an", "be", "this", "are", "or",
}


class QualityScoreStage:
    """Heuristic quality features: length, word stats, punctuation /
    stopword / digit ratios + a composite [0,1] score."""

    def __init__(self):
        self.word_re = re.compile(r"[A-Za-z]+")
        self.punct_re = re.compile(r"[^\w\s]")

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = [t or "" for t in batch.column("text").to_pylist()]
        n = len(texts)
        n_chars = np.fromiter((len(t) for t in texts), np.int64, n)
        words = [self.word_re.findall(t.lower()) for t in texts]
        n_words = np.fromiter((len(w) for w in words), np.int64, n)
        mean_wlen = np.array(
            [np.mean([len(x) for x in w]) if w else 0.0 for w in words]
        )
        stop_ratio = np.array(
            [
                sum(x in _STOPWORDS for x in w) / len(w) if w else 0.0
                for w in words
            ]
        )
        punct_ratio = np.array(
            [
                len(self.punct_re.findall(t)) / len(t) if t else 0.0
                for t in texts
            ]
        )
        digit_ratio = np.array(
            [sum(c.isdigit() for c in t) / len(t) if t else 0.0 for t in texts]
        )
        # composite: reasonable word length, some stopwords, low punct/digit
        score = (
            np.clip(1.0 - np.abs(mean_wlen - 5.0) / 5.0, 0, 1) * 0.3
            + np.clip(stop_ratio / 0.4, 0, 1) * 0.3
            + np.clip(1.0 - punct_ratio * 5, 0, 1) * 0.2
            + np.clip(1.0 - digit_ratio * 5, 0, 1) * 0.2
        )
        return pa.table(
            {
                "doc_id": batch.column("doc_id").cast(pa.string()),
                "n_chars": pa.array(n_chars),
                "n_words": pa.array(n_words),
                "mean_word_len": pa.array(mean_wlen),
                "stopword_ratio": pa.array(stop_ratio),
                "punct_ratio": pa.array(punct_ratio),
                "digit_ratio": pa.array(digit_ratio),
                "quality_score": pa.array(score),
            }
        )


class TokenCountStage:
    """Whitespace tokens + BPE-ish subword count (GPT-2-style regex)."""

    def __init__(self):
        # public GPT-2 pre-tokenizer pattern (simplified, no unicode cats)
        self.bpe_re = re.compile(
            r"'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+(?!\S)|\s+"
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = [t or "" for t in batch.column("text").to_pylist()]
        ws = np.fromiter((len(t.split()) for t in texts), np.int64, len(texts))
        bpe = np.fromiter(
            (len(self.bpe_re.findall(t)) for t in texts), np.int64, len(texts)
        )
        return pa.table(
            {
                "doc_id": batch.column("doc_id").cast(pa.string()),
                "n_ws_tokens": pa.array(ws),
                "n_bpe_tokens": pa.array(bpe),
            }
        )


class FingerprintStage:
    """Rolling-hash document fingerprints: full-content FNV-1a plus the
    min-k of window rolling hashes (winnowing-style sketch)."""

    def __init__(self, window: int = 16, sketch_k: int = 8):
        self.window = window
        self.sketch_k = sketch_k

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = [t or "" for t in batch.column("text").to_pylist()]
        full, sketches = [], []
        for t in texts:
            data = t.encode()
            h = np.uint64(0xCBF29CE484222325)
            for byte in data:  # FNV-1a (bounded by doc length)
                h = (h ^ np.uint64(byte)) * np.uint64(0x100000001B3)
            full.append(int(h & np.uint64(0x7FFFFFFFFFFFFFFF)))
            codes = np.frombuffer(t.encode("utf-32-le"), dtype="<u4").astype(
                np.uint64
            )
            w = self.window
            if codes.size >= w:
                rh = np.zeros(codes.size - w + 1, dtype=np.uint64)
                for j in range(w):
                    rh = rh * np.uint64(1000003) + codes[j : codes.size - w + 1 + j]
                k = min(self.sketch_k, rh.size)
                sketch = np.partition(rh, k - 1)[:k]
                sketch = np.sort(sketch)
            else:
                sketch = np.zeros(0, dtype=np.uint64)
            sketches.append(sketch.astype(np.int64).tobytes())
        return pa.table(
            {
                "doc_id": batch.column("doc_id").cast(pa.string()),
                "fingerprint": pa.array(full, type=pa.int64()),
                "sketch": pa.array(sketches, type=pa.binary()),
            }
        )
