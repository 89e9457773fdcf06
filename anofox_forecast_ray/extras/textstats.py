"""Text analysis stages: language-ID heuristic, quality scoring, token
counting, document fingerprinting.

All stateful setup (stopword sets, compiled regexes, n-gram profiles)
happens once per actor in ``__init__``; per-batch work is vectorized or
C-level (regex engine, hashlib).

Every stage here is ORACLE-EXACT: the driver compares lang_id,
text_quality and doc_fingerprints bitwise against DuckDB SQL, so the
semantics are defined in SQL-expressible terms — explicit codepoint
classes (not unicode-category regexes), integer counts with single float
divisions, sha256 content ids, and profile-trigram containment over a
capped prefix.
"""

from __future__ import annotations

import hashlib
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

# chars examined per doc: language id needs ~1 KB, not the whole document
# (a 100 MB doc must not cost 100 MB of scanning per language)
_LANGID_CAP = 1000


class LangIdStage:
    """Profile-trigram containment scorer over the first ``cap`` chars.

    score(lang) = |{p in profile : p substring of prefix}| / |profile|;
    best = highest score, ties broken by sorted language code, 'unknown'
    when every score is 0. Each containment test is a C-level substring
    search on a bounded prefix (the round-1 per-char set build scanned
    whole documents)."""

    def __init__(self, profiles=None, cap: int = _LANGID_CAP):
        self.profiles = sorted(
            (lang, list(tris))
            for lang, tris in (profiles or _LANG_PROFILES).items()
        )
        self.cap = cap

    def classify(self, text: str) -> tuple[str, float]:
        t = text[: self.cap].lower()
        best, score = "unknown", 0.0
        for lang, prof in self.profiles:
            s = sum(p in t for p in prof) / len(prof)
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

    def oracle_sql(self) -> str:
        """DuckDB SQL computing the identical classification."""
        cols = []
        for lang, prof in self.profiles:
            tests = " + ".join(
                f"CASE WHEN contains(pre, '{p}') THEN 1 ELSE 0 END"
                for p in prof
            )
            cols.append(f"CAST({tests} AS DOUBLE) / {len(prof)} AS s_{lang}")
        score_cols = ",\n               ".join(cols)
        m = "greatest(" + ", ".join(f"s_{lang}" for lang, _ in self.profiles) + ")"
        pick = "\n                ".join(
            f"WHEN s_{lang} = m THEN '{lang}'" for lang, _ in self.profiles[:-1]
        )
        last = self.profiles[-1][0]
        return f"""
        WITH pre AS (
            SELECT CAST(doc_id AS VARCHAR) AS doc_id,
                   substr(lower(text), 1, {self.cap}) AS pre
            FROM documents
        ),
        scored AS (
            SELECT doc_id,
               {score_cols}
            FROM pre
        ),
        best AS (SELECT doc_id, {m} AS m, * FROM scored)
        SELECT doc_id,
               CASE WHEN m <= 0.0e0 THEN 'unknown'
                {pick}
                ELSE '{last}' END AS lang_pred,
               m AS lang_score
        FROM best
        """


_STOPWORDS = (
    "the", "and", "of", "a", "to", "in", "is", "it", "that", "for", "on",
    "with", "as", "at", "by", "an", "be", "this", "are", "or",
)


def _flat_codepoints(texts: list[str]):
    """(flat uint32 codepoints, per-text lengths) — zero-copy-ish."""
    joined = "".join(texts)
    flat = np.frombuffer(joined.encode("utf-32-le"), dtype="<u4")
    lengths = np.fromiter((len(t) for t in texts), np.int64, len(texts))
    return flat, lengths


def _seg_sum(mask: np.ndarray, lengths: np.ndarray) -> np.ndarray:
    """Per-text sums of a flat 0/1 array."""
    n = lengths.size
    starts = np.concatenate(([0], np.cumsum(lengths)))[:-1]
    if mask.size == 0:
        return np.zeros(n, dtype=np.int64)
    out = np.add.reduceat(mask.astype(np.int64), np.minimum(mask.size - 1, starts))
    out[lengths == 0] = 0
    return out


class QualityScoreStage:
    """Heuristic quality features: length, word stats, punctuation /
    stopword / digit ratios + a composite [0,1] score.

    Definitions are codepoint-class exact (ASCII ranges; punct = not
    alnum/underscore/whitespace) so the DuckDB oracle reproduces every
    value bitwise; all ratios are single float divisions of int counts."""

    def __init__(self):
        self.word_re = re.compile(r"[a-z]+")
        self.stopwords = frozenset(_STOPWORDS)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = [t or "" for t in batch.column("text").to_pylist()]
        n = len(texts)
        words = [self.word_re.findall(t.lower()) for t in texts]
        n_words = np.fromiter((len(w) for w in words), np.int64, n)
        sum_wlen = np.fromiter(
            (sum(len(x) for x in w) for w in words), np.int64, n
        )
        n_stop = np.fromiter(
            (sum(x in self.stopwords for x in w) for w in words), np.int64, n
        )
        flat, lengths = _flat_codepoints(texts)
        digit = (flat >= 48) & (flat <= 57)
        alnum = (
            ((flat >= 97) & (flat <= 122))
            | ((flat >= 65) & (flat <= 90))
            | digit
            | (flat == 95)
        )
        ws = (flat == 32) | ((flat >= 9) & (flat <= 13))
        punct = ~(alnum | ws)
        n_digit = _seg_sum(digit, lengths)
        n_punct = _seg_sum(punct, lengths)

        with np.errstate(invalid="ignore", divide="ignore"):
            mean_wlen = np.where(
                n_words > 0, sum_wlen.astype(np.float64) / n_words, 0.0
            )
            stop_ratio = np.where(
                n_words > 0, n_stop.astype(np.float64) / n_words, 0.0
            )
            punct_ratio = np.where(
                lengths > 0, n_punct.astype(np.float64) / lengths, 0.0
            )
            digit_ratio = np.where(
                lengths > 0, n_digit.astype(np.float64) / lengths, 0.0
            )
        # composite: reasonable word length, some stopwords, low punct/digit
        score = (
            np.clip(1.0 - np.abs(mean_wlen - 5.0) / 5.0, 0.0, 1.0) * 0.3
            + np.clip(stop_ratio / 0.4, 0.0, 1.0) * 0.3
            + np.clip(1.0 - punct_ratio * 5.0, 0.0, 1.0) * 0.2
            + np.clip(1.0 - digit_ratio * 5.0, 0.0, 1.0) * 0.2
        )
        return pa.table(
            {
                "doc_id": batch.column("doc_id").cast(pa.string()),
                "n_chars": pa.array(lengths),
                "n_words": pa.array(n_words),
                "mean_word_len": pa.array(mean_wlen),
                "stopword_ratio": pa.array(stop_ratio),
                "punct_ratio": pa.array(punct_ratio),
                "digit_ratio": pa.array(digit_ratio),
                "quality_score": pa.array(score),
            }
        )

    @staticmethod
    def oracle_sql() -> str:
        stops = ", ".join(f"'{w}'" for w in _STOPWORDS)
        return f"""
        WITH base AS (
            SELECT CAST(doc_id AS VARCHAR) AS doc_id,
                   CAST(length(text) AS BIGINT) AS n_chars,
                   regexp_extract_all(lower(text), '[a-z]+') AS ws
            FROM documents
        ),
        wstats AS (
            SELECT doc_id, n_chars,
                   CAST(length(ws) AS BIGINT) AS n_words,
                   CAST(COALESCE(list_sum(
                       list_transform(ws, w -> length(w))), 0) AS BIGINT)
                     AS sum_wlen,
                   CAST(length(list_filter(
                       ws, w -> list_contains([{stops}], w))) AS BIGINT)
                     AS n_stop
            FROM base
        ),
        tokc AS (
            SELECT CAST(doc_id AS VARCHAR) AS doc_id,
                   unicode(unnest(string_split(text, ''))) AS token
            FROM documents
        ),
        cstats AS (
            SELECT doc_id,
                   CAST(sum(CASE WHEN token BETWEEN 48 AND 57
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_digit,
                   CAST(sum(CASE WHEN NOT (
                            (token BETWEEN 97 AND 122)
                            OR (token BETWEEN 65 AND 90)
                            OR (token BETWEEN 48 AND 57)
                            OR token = 95
                            OR token = 32
                            OR (token BETWEEN 9 AND 13))
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_punct
            FROM tokc GROUP BY doc_id
        ),
        ratios AS (
            SELECT w.doc_id, w.n_chars, w.n_words,
                   CASE WHEN w.n_words > 0
                        THEN CAST(w.sum_wlen AS DOUBLE) / w.n_words
                        ELSE 0.0e0 END AS mean_word_len,
                   CASE WHEN w.n_words > 0
                        THEN CAST(w.n_stop AS DOUBLE) / w.n_words
                        ELSE 0.0e0 END AS stopword_ratio,
                   CASE WHEN w.n_chars > 0
                        THEN CAST(COALESCE(c.n_punct, 0) AS DOUBLE) / w.n_chars
                        ELSE 0.0e0 END AS punct_ratio,
                   CASE WHEN w.n_chars > 0
                        THEN CAST(COALESCE(c.n_digit, 0) AS DOUBLE) / w.n_chars
                        ELSE 0.0e0 END AS digit_ratio
            FROM wstats w LEFT JOIN cstats c USING (doc_id)
        )
        SELECT doc_id, n_chars, n_words, mean_word_len, stopword_ratio,
               punct_ratio, digit_ratio,
               least(1.0e0, greatest(0.0e0,
                   1.0e0 - abs(mean_word_len - 5.0e0) / 5.0e0)) * 0.3e0
               + least(1.0e0, greatest(0.0e0, stopword_ratio / 0.4e0)) * 0.3e0
               + least(1.0e0, greatest(0.0e0,
                   1.0e0 - punct_ratio * 5.0e0)) * 0.2e0
               + least(1.0e0, greatest(0.0e0,
                   1.0e0 - digit_ratio * 5.0e0)) * 0.2e0 AS quality_score
        FROM ratios
        """


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
    """Document fingerprints: sha256 content id (C-level hashlib — the
    round-1 per-byte Python FNV loop was ~100 ns/byte) plus the min-k of
    window rolling hashes (winnowing-style sketch, vectorized).

    ``fingerprint`` = first 15 hex digits of sha256 as int64 (60 bits,
    always positive); ``fp_hex`` = full digest. Both reproducible in
    DuckDB (sha256 + hex cast) for the driver oracle."""

    def __init__(self, window: int = 16, sketch_k: int = 8):
        self.window = window
        self.sketch_k = sketch_k

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = [t or "" for t in batch.column("text").to_pylist()]
        full, hexes, sketches = [], [], []
        for t in texts:
            d = hashlib.sha256(t.encode()).hexdigest()
            hexes.append(d)
            full.append(int(d[:15], 16))
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
                "fp_hex": pa.array(hexes, type=pa.string()),
                "sketch": pa.array(sketches, type=pa.binary()),
            }
        )

    @staticmethod
    def oracle_sql() -> str:
        return """
        SELECT CAST(doc_id AS VARCHAR) AS doc_id,
               CAST(concat('0x', substr(sha256(text), 1, 15)) AS BIGINT)
                 AS fingerprint,
               sha256(text) AS fp_hex
        FROM documents
        """


class RepetitionStatsStage:
    """Gopher-style repetition signals per doc: distinct-word ratio,
    duplicated-word fraction, and the most-frequent-bigram fraction.
    All values are integer-count / single-division — bitwise in SQL.

    Splits on a single space (matching DuckDB string_split(text, ' '))
    so empty runs behave identically on both sides."""

    def __call__(self, batch):
        from collections import Counter

        import pyarrow as _pa

        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        out = {"doc_id": [], "n_words": [], "distinct_ratio": [],
               "dup_word_frac": [], "top_bigram_frac": []}
        for doc, text in zip(ids, texts):
            words = (text or "").split(" ")
            n = len(words)
            cnt = Counter(words)
            dupw = sum(c for c in cnt.values() if c > 1)
            if n > 1:
                bg = Counter(zip(words, words[1:]))
                top = max(bg.values()) / (n - 1)
            else:
                top = float("nan")
            out["doc_id"].append(str(doc))
            out["n_words"].append(n)
            out["distinct_ratio"].append(len(cnt) / n)
            out["dup_word_frac"].append(dupw / n)
            out["top_bigram_frac"].append(top)
        return _pa.table(
            {
                "doc_id": _pa.array(out["doc_id"], type=_pa.string()),
                "n_words": _pa.array(out["n_words"], type=_pa.int64()),
                "distinct_ratio": _pa.array(out["distinct_ratio"],
                                            type=_pa.float64()),
                "dup_word_frac": _pa.array(out["dup_word_frac"],
                                           type=_pa.float64()),
                "top_bigram_frac": _pa.array(out["top_bigram_frac"],
                                             type=_pa.float64()),
            }
        )


def repetition_stats_sql() -> str:
    """DuckDB oracle for RepetitionStatsStage (single-space split)."""
    return """
    WITH w AS (
        SELECT CAST(doc_id AS VARCHAR) AS doc_id,
               generate_subscripts(string_split(text, ' '), 1) AS pos,
               unnest(string_split(text, ' ')) AS word
        FROM documents
    ),
    wc AS (
        SELECT doc_id, word, CAST(count(*) AS BIGINT) AS c
        FROM w GROUP BY doc_id, word
    ),
    tot AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n,
               CAST(count(DISTINCT word) AS BIGINT) AS d
        FROM w GROUP BY doc_id
    ),
    dup AS (
        SELECT doc_id,
               CAST(COALESCE(sum(c) FILTER (WHERE c > 1), 0) AS BIGINT)
                   AS dupw
        FROM wc GROUP BY doc_id
    ),
    bg AS (
        SELECT doc_id,
               word || ' ' || lead(word) OVER
                   (PARTITION BY doc_id ORDER BY pos) AS bigram
        FROM w
    ),
    bgc AS (
        SELECT doc_id, CAST(max(c) AS BIGINT) AS mx
        FROM (SELECT doc_id, bigram, count(*) AS c FROM bg
              WHERE bigram IS NOT NULL GROUP BY doc_id, bigram)
        GROUP BY doc_id
    )
    SELECT t.doc_id, t.n AS n_words,
           CAST(t.d AS DOUBLE) / t.n AS distinct_ratio,
           CAST(dup.dupw AS DOUBLE) / t.n AS dup_word_frac,
           CASE WHEN t.n > 1
                THEN CAST(b.mx AS DOUBLE) / (t.n - 1)
                ELSE 'nan'::DOUBLE END AS top_bigram_frac
    FROM tot t
    JOIN dup ON dup.doc_id = t.doc_id
    LEFT JOIN bgc b ON b.doc_id = t.doc_id
    """


# --- TF-IDF top terms -------------------------------------------------------

class SourceTokenCountStage:
    """map_batches(pyarrow): docs -> per-batch (source, token, cnt)
    partial counts (algebraic; the groupby-sum merge shuffles one row
    per distinct (source, token) per batch, never raw text)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        from collections import Counter

        srcs = batch.column("source").to_pylist()
        texts = batch.column("text").to_pylist()
        counts: Counter = Counter()
        for src, text in zip(srcs, texts):
            for w in (text or "").split():
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


def source_tfidf_top(docs, k: int = 5, n_buckets: int = 64,
                     concurrency: int = 2):
    """Dataset(source, text) -> top-k tokens per source by
    tfidf = cnt * ln(n_sources / df), ties broken by token ascending.

    Scale shape: (source, token) counts merge by groupby-sum; document
    frequency joins back via ONE groupby on coarse token-hash buckets
    (the repo's coarse-bucket discipline — no vocab-sized broadcast, no
    per-token UDF call); the final per-source top-k groupby moves at
    most vocab-per-source rows. ln is scalar math.log, one call per
    distinct token, == DuckDB ln."""
    import math

    from .dedup import _fnv64

    agg = (
        docs.map_batches(SourceTokenCountStage, batch_format="pyarrow",
                         concurrency=concurrency)
        .groupby(["source", "token"])
        .sum("cnt")
    )

    def rename(t: pa.Table) -> pa.Table:
        return t.rename_columns(["source", "token", "cnt"])

    agg = agg.map_batches(rename, batch_format="pyarrow")
    # n_sources: bounded aggregate (one row per source)
    n_src = agg.groupby("source").count().count()

    def add_bucket(t: pa.Table) -> pa.Table:
        b = [_fnv64(tok) % n_buckets
             for tok in t.column("token").to_pylist()]
        return t.append_column("__bucket", pa.array(b, type=pa.int64()))

    def bucket_tfidf(g: pa.Table) -> pa.Table:
        g = g.sort_by([("token", "ascending"), ("source", "ascending")])
        toks = np.asarray(g.column("token").to_pylist(), dtype=object)
        cnts = g.column("cnt").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        n = g.num_rows
        starts = np.flatnonzero(
            np.concatenate(([True], toks[1:] != toks[:-1])))
        ends = np.concatenate((starts[1:], [n]))
        df_col = np.empty(n, dtype=np.int64)
        tfidf = np.empty(n, dtype=np.float64)
        for s0, s1 in zip(starts, ends):
            df = s1 - s0  # sources containing this token
            idf = math.log(float(n_src) / float(df))
            df_col[s0:s1] = df
            for i in range(s0, s1):
                tfidf[i] = float(cnts[i]) * idf
        return pa.table(
            {
                "source": g.column("source"),
                "token": g.column("token"),
                "cnt": g.column("cnt"),
                "df": pa.array(df_col, type=pa.int64()),
                "tfidf": pa.array(tfidf, type=pa.float64()),
            }
        )

    def topk(g: pa.Table) -> pa.Table:
        g = g.sort_by([("tfidf", "descending"), ("token", "ascending")])
        return g.slice(0, k)

    return (
        agg.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(bucket_tfidf, batch_format="pyarrow")
        .groupby("source")
        .map_groups(topk, batch_format="pyarrow")
    )


def source_tfidf_sql(k: int = 5) -> str:
    return f"""
    WITH w AS (
        SELECT source,
               unnest(string_split_regex(trim(text), '\\s+')) AS word
        FROM documents WHERE trim(text) <> ''
    ),
    tc AS (
        SELECT source, word AS token, CAST(count(*) AS BIGINT) AS cnt
        FROM w GROUP BY source, word
    ),
    ns AS (SELECT CAST(count(DISTINCT source) AS BIGINT) AS n
           FROM documents),
    dfreq AS (
        SELECT token, CAST(count(*) AS BIGINT) AS df
        FROM tc GROUP BY token
    ),
    scored AS (
        SELECT tc.source, tc.token, tc.cnt, d.df,
               CAST(tc.cnt AS DOUBLE) *
               ln(CAST(ns.n AS DOUBLE) / CAST(d.df AS DOUBLE)) AS tfidf
        FROM tc JOIN dfreq d ON d.token = tc.token CROSS JOIN ns
    ),
    ranked AS (
        SELECT *, row_number() OVER (PARTITION BY source
                   ORDER BY tfidf DESC, token ASC) AS rn
        FROM scored
    )
    SELECT source, token, cnt, df, tfidf
    FROM ranked WHERE rn <= {k}
    """


# --- PII / pattern scan -----------------------------------------------------

PII_PATTERNS = (
    ("n_emails", r"[A-Za-z0-9_.]+@[A-Za-z0-9.-]+"),
    ("n_urls", r"https?://[^ ]+"),
    ("n_digit_runs", r"[0-9]+"),
)


class PIIScanStage:
    """map_batches(pyarrow) actor stage: docs -> per-doc counts of
    PII-ish patterns (emails, URLs, digit runs) + has_pii flag.
    Regexes compile ONCE per actor (__init__), matching runs at C level
    per doc; Python `re` and DuckDB RE2 agree on these simple classes
    (non-overlapping left-to-right matches), so the counts replay
    bitwise in SQL via len(regexp_extract_all(...))."""

    def __init__(self):
        self.pats = [(name, re.compile(p)) for name, p in PII_PATTERNS]

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").cast(pa.int64())
        texts = batch.column("text").to_pylist()
        cols = {"doc_id": ids}
        counts = {
            name: np.fromiter(
                (len(pat.findall(t or "")) for t in texts),
                dtype=np.int64, count=len(texts),
            )
            for name, pat in self.pats
        }
        total = np.zeros(len(texts), dtype=np.int64)
        for name, _ in self.pats[:2]:  # emails + urls only for the flag
            total += counts[name]
        for name, _ in self.pats:
            cols[name] = pa.array(counts[name], type=pa.int64())
        cols["has_pii"] = pa.array(
            (total > 0).astype(np.int32), type=pa.int32()
        )
        return pa.table(cols)


def pii_scan(docs, concurrency: int = 2):
    """Dataset(doc_id, text) -> per-doc pattern counts."""
    return docs.map_batches(
        PIIScanStage, batch_format="pyarrow", concurrency=concurrency
    )


def pii_scan_sql() -> str:
    exprs = ",\n           ".join(
        f"CAST(len(regexp_extract_all(text, '{p}')) AS BIGINT)"
        f" AS {name}"
        for name, p in PII_PATTERNS
    )
    return f"""
    SELECT doc_id,
           {exprs},
           CAST(CASE WHEN len(regexp_extract_all(text,
                         '{PII_PATTERNS[0][1]}'))
                     + len(regexp_extract_all(text,
                         '{PII_PATTERNS[1][1]}')) > 0
                THEN 1 ELSE 0 END AS INTEGER) AS has_pii
    FROM documents
    """
