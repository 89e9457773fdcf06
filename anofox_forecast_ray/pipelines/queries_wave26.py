"""Wave-26 queries: time-weighted averages over irregular events, exact
trimmed means, exact-substring duplicate-span coverage, and a partition
integrity manifest.

- events_user_twa: TimescaleDB-toolkit-style time-weighted average with
  LOCF weighting per user — each observation holds until the next one;
  twa = sum(cents_i * dt_i) / sum(dt_i) over consecutive pairs. Both
  sums are exact int64 (cents x microseconds), so the f64 mean is ONE
  division of identical integers on both sides (the repo's bitwise-mean
  discipline). Shuffle moves only (user_id, ts_us, event_id, cents).
- source_trimmed_mean: exact 10%-trimmed mean of doc length per source.
  Bounded-cardinality histogram partials ((source, n_chars) counts) are
  tree-reduced — no row-level shuffle at all; the trim is computed from
  the histogram, so at 100 TB the cost is one streaming pass.
- doc_dup_span_coverage: the ExactSubstr-style dedup metric (Lee et al.
  2022, "Deduplicating Training Data Makes Language Models Better"):
  per doc, the fraction of char-16-gram positions whose gram occurs in
  >= 2 distinct docs. Two bounded shuffles — distinct (gram, doc) pairs
  with position multiplicity, then per-doc dup sums unioned with the
  zero rows — never a broadcast of the (unbounded) dup-gram set.
- corpus_partition_manifest: per doc_id-bucket row counts, id ranges
  and a content checksum (sum of 52-bit sha256 prefixes). This is the
  audit/resume artifact a 100-TB run checkpoints per partition; sums
  are order-free so retries/resharding cannot change it.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from ..extras.dedup import _BASE, _M64
from .queries import _cast, _num_read_blocks
from ._scaffold import read_cols

K_SPAN = 16  # chars per span gram (matches extras/decontam.K)


# --------------------------------------------------------------- helpers
def _span_hashes(text: str, k: int) -> np.ndarray:
    """Rolling polynomial hashes of ALL char k-gram positions (uint64
    wrap = per-step mod 2^64; extras/dedup._char_shingle_hashes without
    the final unique — span coverage needs position multiplicity)."""
    if len(text) < k:
        return np.zeros(0, dtype=np.uint64)
    codes = np.frombuffer(
        text.encode("utf-32-le"), dtype="<u4"
    ).astype(np.uint64)
    base = np.uint64(_BASE)
    h = np.zeros(len(codes) - k + 1, dtype=np.uint64)
    for j in range(k):
        h = h * base + codes[j : len(codes) - k + 1 + j]
    return h


def _span_sql_all_positions(k: int) -> str:
    """CTE chain tok -> win -> sh(doc_id, h) over ALL positions —
    extras/decontam._shingle_sql_modstep without the DISTINCT (per-step
    mod keeps every intermediate under 2^84, HUGEINT-exact)."""
    from .queries import SQL_TOK

    leads = ", ".join(
        f"lead(token, {j}) OVER w AS c{j}" for j in range(1, k)
    )
    poly = "c0"
    for j in range(1, k):
        poly = f"(({poly} * {_BASE} + c{j}) % {_M64})"
    return f"""
    tok AS ({SQL_TOK}),
    win AS (
        SELECT doc_id, CAST(token AS HUGEINT) AS c0, {leads}
        FROM tok WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
    ),
    sh AS (
        SELECT doc_id, CAST({poly} AS UBIGINT) AS h
        FROM win WHERE c{k - 1} IS NOT NULL
    )"""


# --------------------------------------------------- events_user_twa
def _twa_query():
    def q(sf_dir: str):
        import pandas as pd
        import ray.data as rd

        def project(t: pa.Table) -> pa.Table:
            cents = np.round(
                t.column("value").to_numpy(zero_copy_only=False) * 100.0
            ).astype(np.int64)
            return pa.table(
                {
                    "user_id": t.column("user_id").cast(pa.int64()),
                    "ts_us": t.column("ts").cast(pa.int64()),
                    "event_id": t.column("event_id").cast(pa.int64()),
                    "cents": pa.array(cents),
                }
            )

        _TWA_EMPTY = pa.table(
            {"user_id": pa.array([], type=pa.int64()),
             "n_intervals": pa.array([], type=pa.int64()),
             "total_us": pa.array([], type=pa.int64()),
             "wsum": pa.array([], type=pa.int64()),
             "twa_cents": pa.array([], type=pa.float64())}
        )

        def twa(g: pa.Table) -> pa.Table:
            # (ts_us, event_id) is a total order, so the sort is
            # deterministic regardless of kernel stability
            g = g.sort_by([("ts_us", "ascending"),
                           ("event_id", "ascending")])
            ts = g.column("ts_us").to_numpy(zero_copy_only=False)
            if ts.size < 2:
                return _TWA_EMPTY
            c = g.column("cents").to_numpy(zero_copy_only=False)
            dt = np.diff(ts)
            total = int(ts[-1] - ts[0])
            if total <= 0:
                return _TWA_EMPTY
            wsum = int((c[:-1] * dt).sum())
            return pa.table(
                {
                    "user_id": pa.array(
                        [int(g.column("user_id")[0].as_py())],
                        type=pa.int64(),
                    ),
                    "n_intervals": pa.array([int(dt.size)],
                                            type=pa.int64()),
                    "total_us": pa.array([total], type=pa.int64()),
                    "wsum": pa.array([wsum], type=pa.int64()),
                    "twa_cents": pa.array(
                        [float(np.float64(wsum) / np.float64(total))],
                        type=pa.float64(),
                    ),
                }
            )

        ds = (
            read_cols(sf_dir, "events", ["user_id", "ts", "event_id", "value"])
            .map_batches(project, batch_format="pyarrow")
            .groupby("user_id")
            .map_groups(twa, batch_format="pyarrow")
        )
        return _cast(
            ds,
            {"user_id": pa.int64(), "n_intervals": pa.int64(),
             "total_us": pa.int64(), "wsum": pa.int64(),
             "twa_cents": pa.float64()},
        )

    sql = """
    WITH e AS (
        SELECT user_id, epoch_us(ts) AS ts_us,
               CAST(round_even(value * 100, 0) AS BIGINT) AS cents,
               lead(epoch_us(ts)) OVER (
                   PARTITION BY user_id
                   ORDER BY epoch_us(ts), event_id) AS nxt
        FROM events
    )
    SELECT CAST(user_id AS BIGINT) AS user_id,
           CAST(count(*) AS BIGINT) AS n_intervals,
           CAST(sum(nxt - ts_us) AS BIGINT) AS total_us,
           CAST(sum(cents * (nxt - ts_us)) AS BIGINT) AS wsum,
           CAST(sum(cents * (nxt - ts_us)) AS DOUBLE)
               / CAST(sum(nxt - ts_us) AS DOUBLE) AS twa_cents
    FROM e WHERE nxt IS NOT NULL
    GROUP BY user_id HAVING sum(nxt - ts_us) > 0
    """
    return q, sql


# ----------------------------------------------- source_trimmed_mean
def _trimmed_mean_query(trim_denom: int = 10):
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            if "source" not in t.column_names:  # schemaless empty block
                return pa.table(
                    {"source": pa.array([], type=pa.string()),
                     "v": pa.array([], type=pa.int64()),
                     "cnt": pa.array([], type=pa.int64())}
                )
            tab = pa.table(
                {"source": t.column("source"),
                 "v": t.column("n_chars").cast(pa.int64())}
            )
            g = tab.group_by(["source", "v"]).aggregate([("v", "count")])
            return pa.table(
                {"source": g.column("source"), "v": g.column("v"),
                 "cnt": g.column("v_count").cast(pa.int64())}
            )

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by(["source", "v"]).aggregate([("cnt", "sum")])
            return pa.table(
                {"source": g.column("source"), "v": g.column("v"),
                 "cnt": g.column("cnt_sum").cast(pa.int64())}
            )

        refs = list(
            read_cols(sf_dir, "documents", ["source", "n_chars"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        hist = tree_reduce_tables(refs, merge)
        srcs, n_kept, sum_kept, tmean = [], [], [], []
        hp = hist.to_pandas()
        for src, g in hp.groupby("source"):
            g = g.sort_values("v")
            v = g["v"].to_numpy(np.int64)
            c = g["cnt"].to_numpy(np.int64)
            n = int(c.sum())
            k = n // trim_denom
            cum = np.cumsum(c)
            # kept count per value = overlap of its rank run [start, cum)
            # with the trim window [k, n-k)
            start = cum - c
            kept = np.clip(np.minimum(cum, n - k) - np.maximum(start, k),
                           0, None)
            nk = int(kept.sum())
            sk = int((kept * v).sum())
            srcs.append(str(src))
            n_kept.append(nk)
            sum_kept.append(sk)
            tmean.append(float(np.float64(sk) / np.float64(nk)))
        return pa.table(
            {
                "source": pa.array(srcs, type=pa.string()),
                "n_kept": pa.array(n_kept, type=pa.int64()),
                "sum_kept": pa.array(sum_kept, type=pa.int64()),
                "trimmed_mean": pa.array(tmean, type=pa.float64()),
            }
        )

    sql = f"""
    WITH v AS (
        SELECT source, CAST(n_chars AS BIGINT) AS v FROM documents
    ),
    r AS (
        SELECT source, v,
               row_number() OVER (PARTITION BY source ORDER BY v) - 1
                   AS rk,
               count(*) OVER (PARTITION BY source) AS n
        FROM v
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_kept,
           CAST(sum(v) AS BIGINT) AS sum_kept,
           CAST(sum(v) AS DOUBLE) / CAST(count(*) AS BIGINT)
               AS trimmed_mean
    FROM r
    WHERE rk >= n // {trim_denom} AND rk < n - n // {trim_denom}
    GROUP BY source
    """
    return q, sql


# ------------------------------------------- doc_dup_span_coverage
def _dup_span_query(k: int = K_SPAN):
    def q(sf_dir: str):
        import pandas as pd
        import ray.data as rd

        def grams(t: pa.Table) -> pa.Table:
            if "doc_id" not in t.column_names:
                return pa.table(
                    {"hb": pa.array([], type=pa.int64()),
                     "h": pa.array([], type=pa.int64()),
                     "doc": pa.array([], type=pa.int64()),
                     "cnt": pa.array([], type=pa.int64())}
                )
            hs, docs, cnts = [], [], []
            ids = t.column("doc_id").to_pylist()
            for did, txt in zip(ids, t.column("text").to_pylist()):
                h = _span_hashes(txt or "", k)
                if h.size == 0:
                    continue
                uh, uc = np.unique(h, return_counts=True)
                hs.append(uh.view(np.int64))
                docs.append(np.full(uh.size, int(did), dtype=np.int64))
                cnts.append(uc.astype(np.int64))
            if not hs:
                return pa.table(
                    {"hb": pa.array([], type=pa.int64()),
                     "h": pa.array([], type=pa.int64()),
                     "doc": pa.array([], type=pa.int64()),
                     "cnt": pa.array([], type=pa.int64())}
                )
            hcat = np.concatenate(hs)
            hb = (hcat.view(np.uint64) >> np.uint64(56)).astype(np.int64)
            return pa.table(
                {"hb": pa.array(hb),
                 "h": pa.array(hcat),
                 "doc": pa.array(np.concatenate(docs)),
                 "cnt": pa.array(np.concatenate(cnts))}
            )

        def dup_rows(g: pa.Table) -> pa.Table:
            # COARSE-bucket kernel (extras/dedup.py discipline): one
            # map_groups call per 2^-8 slice of hash space, vectorized
            # run-length scan inside — not one UDF call per gram. Each
            # (h, doc) pair is globally unique (grams dedups per doc and
            # a doc lives in one block), so a gram's run length IS its
            # distinct-doc count. Emit an ARROW table so the union with
            # the arrow zero-rows dataset sees one block type.
            h = g.column("h").to_numpy(zero_copy_only=False)
            order = np.argsort(h, kind="stable")
            hs = h[order]
            docs = g.column("doc").to_numpy(zero_copy_only=False)[order]
            cnts = g.column("cnt").to_numpy(zero_copy_only=False)[order]
            starts = np.flatnonzero(
                np.r_[True, hs[1:] != hs[:-1]]
            )
            runlen = np.diff(np.r_[starts, hs.size])
            keep = np.repeat(runlen >= 2, runlen)
            docs = docs[keep]
            return pa.table(
                {"doc": pa.array(docs),
                 "dup": pa.array(cnts[keep]),
                 "n_spans": pa.array(
                     np.zeros(docs.size, dtype=np.int64))}
            )

        def zero_rows(t: pa.Table) -> pa.Table:
            if "doc_id" not in t.column_names:
                return pa.table(
                    {"doc": pa.array([], type=pa.int64()),
                     "dup": pa.array([], type=pa.int64()),
                     "n_spans": pa.array([], type=pa.int64())}
                )
            ids = t.column("doc_id").cast(pa.int64())
            n = t.column("n_chars").cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
            spans = np.maximum(n - (k - 1), 0)
            return pa.table(
                {"doc": ids,
                 "dup": pa.array(np.zeros(len(t), dtype=np.int64)),
                 "n_spans": pa.array(spans)}
            )

        def final(g: pa.Table) -> pa.Table:
            # coarse doc-bucket kernel: vectorized per-doc sums inside
            # (sort + reduceat == the pandas sorted groupby-sum, int64
            # arithmetic so the replacement is exact)
            doc = g.column("doc").to_numpy(zero_copy_only=False)
            n_spans = g.column("n_spans").to_numpy(zero_copy_only=False)
            dupv = g.column("dup").to_numpy(zero_copy_only=False)
            order = np.argsort(doc, kind="stable")
            d_s = doc[order]
            starts = np.flatnonzero(np.r_[True, d_s[1:] != d_s[:-1]])
            uniq = d_s[starts]
            spans = np.add.reduceat(n_spans[order], starts)
            dup = np.add.reduceat(dupv[order], starts)
            frac = np.where(
                spans > 0,
                dup.astype(np.float64)
                / np.where(spans > 0, spans, 1).astype(np.float64),
                0.0,
            )
            return pa.table(
                {"doc_id": pa.array(uniq, type=pa.int64()),
                 "n_spans": pa.array(spans, type=pa.int64()),
                 "n_dup": pa.array(dup, type=pa.int64()),
                 "dup_frac": pa.array(frac, type=pa.float64())}
            )

        docs_read = read_cols(sf_dir, "documents", ["doc_id", "n_chars", "text"])
        dup_ds = (
            docs_read
            .map_batches(grams, batch_format="pyarrow")
            .groupby("hb")
            .map_groups(dup_rows, batch_format="pyarrow")
        )
        zeros = read_cols(sf_dir, "documents", ["doc_id", "n_chars"]).map_batches(zero_rows, batch_format="pyarrow")

        def add_doc_bucket(t: pa.Table) -> pa.Table:
            if "doc" not in t.column_names:
                return pa.table(
                    {"db": pa.array([], type=pa.int64()),
                     "doc": pa.array([], type=pa.int64()),
                     "dup": pa.array([], type=pa.int64()),
                     "n_spans": pa.array([], type=pa.int64())}
                )
            d = t.column("doc").to_numpy(zero_copy_only=False)
            return t.append_column(
                "db", pa.array((d % 256).astype(np.int64))
            )

        ds = (
            zeros.union(dup_ds)
            .map_batches(add_doc_bucket, batch_format="pyarrow")
            .groupby("db")
            .map_groups(final, batch_format="pyarrow")
        )
        return _cast(
            ds,
            {"doc_id": pa.int64(), "n_spans": pa.int64(),
             "n_dup": pa.int64(), "dup_frac": pa.float64()},
        )

    sql = f"""
    WITH {_span_sql_all_positions(k)},
    dup AS (
        SELECT h FROM sh GROUP BY h
        HAVING count(DISTINCT doc_id) >= 2
    ),
    cnt AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dup
        FROM sh WHERE h IN (SELECT h FROM dup)
        GROUP BY doc_id
    )
    SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
           CAST(greatest(d.n_chars - {k - 1}, 0) AS BIGINT) AS n_spans,
           COALESCE(c.n_dup, 0) AS n_dup,
           CASE WHEN d.n_chars - {k - 1} > 0
                THEN CAST(COALESCE(c.n_dup, 0) AS DOUBLE)
                     / CAST(greatest(d.n_chars - {k - 1}, 0) AS DOUBLE)
                ELSE 0.0 END AS dup_frac
    FROM documents d
    LEFT JOIN cnt c ON c.doc_id = CAST(d.doc_id AS VARCHAR)
    """
    return q, sql


# ------------------------------------------ corpus_partition_manifest
_BUCKET = 64
_HEX = 13  # 52-bit sha prefix: 64 per bucket sums < 2^58, int64-safe


def _manifest_query():
    def q(sf_dir: str):
        import pandas as pd
        import ray.data as rd

        def partial(t: pa.Table) -> pa.Table:
            if "doc_id" not in t.column_names:
                return pa.table(
                    {"bucket": pa.array([], type=pa.int64()),
                     "n_docs": pa.array([], type=pa.int64()),
                     "sum_h": pa.array([], type=pa.int64()),
                     "min_id": pa.array([], type=pa.int64()),
                     "max_id": pa.array([], type=pa.int64())}
                )
            ids = np.asarray(t.column("doc_id").to_pylist(),
                             dtype=np.int64)
            h = np.fromiter(
                (int(hashlib.sha256((txt or "").encode())
                     .hexdigest()[:_HEX], 16)
                 for txt in t.column("text").to_pylist()),
                dtype=np.int64, count=len(ids),
            )
            tab = pa.table(
                {"bucket": pa.array(ids // _BUCKET),
                 "h": pa.array(h), "id": pa.array(ids)}
            )
            g = tab.group_by("bucket").aggregate(
                [("h", "count"), ("h", "sum"),
                 ("id", "min"), ("id", "max")]
            )
            return pa.table(
                {"bucket": g.column("bucket"),
                 "n_docs": g.column("h_count").cast(pa.int64()),
                 "sum_h": g.column("h_sum").cast(pa.int64()),
                 "min_id": g.column("id_min").cast(pa.int64()),
                 "max_id": g.column("id_max").cast(pa.int64())}
            )

        def merge(g: pa.Table) -> pa.Table:
            return pa.table(
                {"bucket": pa.array(
                     [int(g.column("bucket")[0].as_py())],
                     type=pa.int64()),
                 "n_docs": pa.array(
                     [int(g.column("n_docs").to_numpy(
                         zero_copy_only=False).sum())],
                     type=pa.int64()),
                 "sum_h": pa.array(
                     [int(g.column("sum_h").to_numpy(
                         zero_copy_only=False).sum())],
                     type=pa.int64()),
                 "min_id": pa.array(
                     [int(g.column("min_id").to_numpy(
                         zero_copy_only=False).min())],
                     type=pa.int64()),
                 "max_id": pa.array(
                     [int(g.column("max_id").to_numpy(
                         zero_copy_only=False).max())],
                     type=pa.int64())}
            )

        ds = (
            read_cols(sf_dir, "documents", ["doc_id", "text"])
            .map_batches(partial, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(merge, batch_format="pyarrow")
        )
        return _cast(
            ds,
            {"bucket": pa.int64(), "n_docs": pa.int64(),
             "sum_h": pa.int64(), "min_id": pa.int64(),
             "max_id": pa.int64()},
        )

    sql = f"""
    SELECT CAST(doc_id // {_BUCKET} AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CAST(concat('0x', substr(sha256(text), 1, {_HEX}))
                         AS BIGINT)) AS BIGINT) AS sum_h,
           CAST(min(doc_id) AS BIGINT) AS min_id,
           CAST(max(doc_id) AS BIGINT) AS max_id
    FROM documents GROUP BY 1
    """
    return q, sql


def build_wave26_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("events_user_twa",) + _twa_query()))
    add(*(("source_trimmed_mean",) + _trimmed_mean_query(10)))
    add(*(("doc_dup_span_coverage",) + _dup_span_query(K_SPAN)))
    add(*(("corpus_partition_manifest",) + _manifest_query()))
    return queries, oracles
