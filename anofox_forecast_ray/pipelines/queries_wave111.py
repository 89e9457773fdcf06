"""Wave-111 queries: IR ranking evaluation and zone-map pruning stats.

- bm25_eval_metrics: evaluation layer over the proven-bitwise BM25
  ranking (wave 29) — graded relevance rel(d) = number of DISTINCT
  query tokens present in d (0..8). Reports DCG@25 / IDCG@25 / NDCG
  (linear gain, natural-log discount: the NDCG ratio is base-
  invariant and ln == DuckDB ln), reciprocal rank of the first
  binary-relevant doc and AP@25, with binary relevance rel >= 5
  (majority of query tokens present; rel == relmax is structurally
  absent from the top-25 here because the common query chars have
  negative idf).
  All gains are exact ints; every float term is a single division
  (rel / ln(rank+1), cum_hits / rank) folded in rank order so the
  oracle replays the sums with list_reduce. The ideal ranking needs
  only the 9-bucket rel histogram (bounded partials), never a sort.
- token_zonemap_pruning: storage-planning metric — docs grouped into
  zones of 64 consecutive doc_ids; for each query token, how many
  zones a point-query must read (zone-map hit count), how many docs
  actually contain it, and the zone read fraction. Per-block partials
  collapse to distinct (token, zone) pairs before the merge; at
  100 TB only zone-granularity rows move.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from .queries import SQL_TOK, corpus_ds
from .queries_wave29 import QUERY_TOKENS, TOP_K, _bm25_query

ZONE = 64
REL_T = 5


def _rel_per_doc(t: pa.Table, qtok: np.ndarray):
    """(doc_ids int64[], rel int64[]) for one tokens batch."""
    from ..stages.rollup import _flat_tokens

    values, lengths = _flat_tokens(t)
    starts = np.concatenate(([0], np.cumsum(lengths)))[:-1].astype(np.int64)
    rel = np.zeros(lengths.size, dtype=np.int64)
    if values.size:
        v64 = values.astype(np.int64)
        for tk in qtok:
            mask = (v64 == tk).astype(np.int64)
            per_doc = np.add.reduceat(mask, starts)
            per_doc[lengths == 0] = 0
            rel += (per_doc > 0).astype(np.int64)
    ids = np.asarray(
        [int(d) for d in t.column("doc_id").to_pylist()], dtype=np.int64
    )
    return ids, rel


# ------------------------------------------------------ bm25_eval_metrics
def _bm25_eval_query():
    def q(sf_dir: str):
        from ..stages.source_rollup import tree_reduce_tables

        qtok = np.asarray(sorted(QUERY_TOKENS), dtype=np.int64)
        ranked = _bm25_query()[0](sf_dir).to_pandas()
        rk_by_doc = dict(
            zip(ranked["doc_id"].astype(int), ranked["rk"].astype(int))
        )
        ranked_ids = frozenset(rk_by_doc)

        def partial(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "kind": pa.array([], type=pa.string()),
                "k": pa.array([], type=pa.int64()),
                "v": pa.array([], type=pa.int64()),
            })
            if "tokens" not in t.column_names or t.num_rows == 0:
                return empty
            ids, rel = _rel_per_doc(t, qtok)
            kinds, ks, vs = [], [], []
            uk, cnt = np.unique(rel, return_counts=True)
            for r, c in zip(uk, cnt):
                kinds.append("hist")
                ks.append(int(r))
                vs.append(int(c))
            for i in range(ids.size):
                if int(ids[i]) in ranked_ids:
                    kinds.append("doc")
                    ks.append(int(ids[i]))
                    vs.append(int(rel[i]))
            return pa.table({
                "kind": pa.array(kinds, type=pa.string()),
                "k": pa.array(ks, type=pa.int64()),
                "v": pa.array(vs, type=pa.int64()),
            })

        def merge(t: pa.Table) -> pa.Table:
            df = t.to_pandas()
            hist = (
                df[df["kind"] == "hist"].groupby("k", as_index=False)["v"]
                .sum()
            )
            docs = df[df["kind"] == "doc"].drop_duplicates("k")
            out_k = list(hist["k"].astype(int)) + list(docs["k"].astype(int))
            out_v = list(hist["v"].astype(int)) + list(docs["v"].astype(int))
            out_kind = ["hist"] * len(hist) + ["doc"] * len(docs)
            return pa.table({
                "kind": pa.array(out_kind, type=pa.string()),
                "k": pa.array(np.asarray(out_k, dtype=np.int64)),
                "v": pa.array(np.asarray(out_v, dtype=np.int64)),
            })

        refs = list(
            corpus_ds(sf_dir)
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        a = tree_reduce_tables(refs, merge).to_pandas()
        hist = {
            int(r["k"]): int(r["v"])
            for _, r in a[a["kind"] == "hist"].iterrows()
        }
        rel_of = {
            int(r["k"]): int(r["v"])
            for _, r in a[a["kind"] == "doc"].iterrows()
        }
        n_docs = sum(hist.values())
        relmax = max(r for r, c in hist.items() if c > 0)
        r_total = sum(c for r, c in hist.items() if r >= REL_T)
        k_eff = min(TOP_K, n_docs)

        # DCG over the BM25 ranking, rank order
        dcg = 0.0
        for _, row in ranked.sort_values("rk").iterrows():
            i = int(row["rk"])
            rel_i = rel_of[int(row["doc_id"])]
            dcg = dcg + float(rel_i) / math.log(float(i + 1))
        # IDCG from the rel histogram (descending rel sequence)
        idcg = 0.0
        i = 0
        for r in sorted(hist, reverse=True):
            c = hist[r]
            for _ in range(c):
                if i >= k_eff:
                    break
                i += 1
                idcg = idcg + float(r) / math.log(float(i + 1))
            if i >= k_eff:
                break
        ndcg = dcg / idcg if idcg > 0.0 else 0.0
        # reciprocal rank of the first rel == relmax doc
        rr = 0.0
        for _, row in ranked.sort_values("rk").iterrows():
            if rel_of[int(row["doc_id"])] >= REL_T:
                rr = 1.0 / float(int(row["rk"]))
                break
        # AP@K over binary rel == relmax, cumulative-hit fold in rank order
        s = 0.0
        hits = 0
        for _, row in ranked.sort_values("rk").iterrows():
            i = int(row["rk"])
            if rel_of[int(row["doc_id"])] >= REL_T:
                hits += 1
                s = s + float(hits) / float(i)
        ap = s / float(min(r_total, TOP_K))
        return pa.table({
            "k": pa.array([TOP_K], type=pa.int64()),
            "relmax": pa.array([relmax], type=pa.int64()),
            "r_total": pa.array([r_total], type=pa.int64()),
            "dcg": pa.array([dcg], type=pa.float64()),
            "idcg": pa.array([idcg], type=pa.float64()),
            "ndcg": pa.array([ndcg], type=pa.float64()),
            "rr": pa.array([rr], type=pa.float64()),
            "ap": pa.array([ap], type=pa.float64()),
        })

    toks = ", ".join(str(t) for t in sorted(QUERY_TOKENS))
    from .queries_wave29 import B, K1

    sql = f"""
    WITH tok AS ({SQL_TOK}),
    stats AS (
        SELECT CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS sum_dl
        FROM documents
    ),
    tf AS (
        SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
        FROM tok WHERE token IN ({toks})
        GROUP BY doc_id, token
    ),
    dfq AS (
        SELECT token, CAST(count(*) AS BIGINT) AS df
        FROM tf GROUP BY token
    ),
    terms AS (
        SELECT t.doc_id, t.token,
               ln((CAST(s.n_docs - d.df AS DOUBLE) + 0.5)
                  / (CAST(d.df AS DOUBLE) + 0.5))
               * (CAST(t.tf AS DOUBLE) * ({K1!r} + 1.0))
               / (CAST(t.tf AS DOUBLE)
                  + {K1!r} * (1.0 - {B!r}
                      + {B!r} * (CAST(dd.n_chars AS DOUBLE)
                                 / (CAST(s.sum_dl AS DOUBLE)
                                    / CAST(s.n_docs AS DOUBLE)))))
                   AS term
        FROM tf t
        JOIN dfq d ON d.token = t.token
        JOIN documents dd ON CAST(dd.doc_id AS VARCHAR) = t.doc_id
        CROSS JOIN stats s
    ),
    scores AS (
        SELECT doc_id,
               list_reduce(
                   list_prepend(CAST(0.0 AS DOUBLE),
                       list(term ORDER BY token)),
                   (a, b) -> a + b) AS score
        FROM terms GROUP BY doc_id
    ),
    allsc AS (
        SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
               COALESCE(s.score, 0.0) AS score
        FROM documents d
        LEFT JOIN scores s ON s.doc_id = CAST(d.doc_id AS VARCHAR)
    ),
    ranked AS (
        SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id)
                    AS BIGINT) AS rk, doc_id
        FROM allsc ORDER BY score DESC, doc_id LIMIT {TOP_K}
    ),
    drel AS (
        SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
               CAST(COALESCE(c.nd, 0) AS BIGINT) AS rel
        FROM documents d LEFT JOIN (
            SELECT doc_id, count(DISTINCT token) AS nd
            FROM tok WHERE token IN ({toks}) GROUP BY doc_id
        ) c ON c.doc_id = CAST(d.doc_id AS VARCHAR)
    ),
    mx AS (
        SELECT max(rel) AS relmax FROM drel
    ),
    rtot AS (
        SELECT CAST(count(*) AS BIGINT) AS r_total
        FROM drel WHERE rel >= {REL_T}
    ),
    rrel AS (
        SELECT r.rk, dr.rel FROM ranked r
        JOIN drel dr ON dr.doc_id = r.doc_id
    ),
    dcg_t AS (
        SELECT list_reduce(list_prepend(0.0e0,
                   list(CAST(rel AS DOUBLE)
                        / ln(CAST(rk + 1 AS DOUBLE)) ORDER BY rk)),
               (a, b) -> a + b) AS dcg
        FROM rrel
    ),
    ideal AS (
        SELECT rel, CAST(row_number() OVER (ORDER BY rel DESC, doc_id)
                         AS BIGINT) AS rn
        FROM drel
    ),
    idcg_t AS (
        SELECT list_reduce(list_prepend(0.0e0,
                   list(CAST(rel AS DOUBLE)
                        / ln(CAST(rn + 1 AS DOUBLE)) ORDER BY rn)),
               (a, b) -> a + b) AS idcg
        FROM ideal WHERE rn <= {TOP_K}
    ),
    rr_t AS (
        SELECT COALESCE(1.0e0 / CAST(min(rk) AS DOUBLE), 0.0e0) AS rr
        FROM rrel WHERE rel >= {REL_T}
    ),
    cums AS (
        SELECT rk, rel,
               CAST(sum(CASE WHEN rel >= {REL_T} THEN 1 ELSE 0 END)
                    OVER (ORDER BY rk) AS BIGINT) AS cum
        FROM rrel
    ),
    ap_t AS (
        SELECT COALESCE(list_reduce(list_prepend(0.0e0,
                   list(CAST(cum AS DOUBLE) / CAST(rk AS DOUBLE)
                        ORDER BY rk)),
               (a, b) -> a + b), 0.0e0)
               / CAST(least((SELECT r_total FROM rtot), {TOP_K})
                      AS DOUBLE) AS ap
        FROM cums WHERE rel >= {REL_T}
    )
    SELECT CAST({TOP_K} AS BIGINT) AS k,
           CAST(mx.relmax AS BIGINT) AS relmax,
           rtot.r_total AS r_total,
           dcg_t.dcg AS dcg,
           idcg_t.idcg AS idcg,
           CASE WHEN idcg_t.idcg > 0.0e0
                THEN dcg_t.dcg / idcg_t.idcg ELSE 0.0e0 END AS ndcg,
           (SELECT rr FROM rr_t) AS rr,
           COALESCE((SELECT ap FROM ap_t), 0.0e0) AS ap
    FROM mx, rtot, dcg_t, idcg_t
    """
    return q, sql


# -------------------------------------------------- token_zonemap_pruning
def _zonemap_query():
    def q(sf_dir: str):
        from ..stages.rollup import _flat_tokens
        from ..stages.source_rollup import tree_reduce_tables

        qtok = np.asarray(sorted(QUERY_TOKENS), dtype=np.int64)

        def partial(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "token": pa.array([], type=pa.int64()),
                "zone": pa.array([], type=pa.int64()),
                "docs": pa.array([], type=pa.int64()),
            })
            if "tokens" not in t.column_names or t.num_rows == 0:
                return empty
            values, lengths = _flat_tokens(t)
            starts = np.concatenate(
                ([0], np.cumsum(lengths)))[:-1].astype(np.int64)
            ids = np.asarray(
                [int(d) for d in t.column("doc_id").to_pylist()],
                dtype=np.int64)
            zones = ids // ZONE
            out_t, out_z, out_d = [], [], []
            # token = -1 marker rows: zones present in this block
            for z in np.unique(zones):
                out_t.append(-1)
                out_z.append(int(z))
                out_d.append(0)
            if values.size:
                v64 = values.astype(np.int64)
                for tk in qtok:
                    mask = (v64 == tk).astype(np.int64)
                    per_doc = np.add.reduceat(mask, starts)
                    per_doc[lengths == 0] = 0
                    present = per_doc > 0
                    if not present.any():
                        continue
                    zs = zones[present]
                    uz, cz = np.unique(zs, return_counts=True)
                    for z, c in zip(uz, cz):
                        out_t.append(int(tk))
                        out_z.append(int(z))
                        out_d.append(int(c))
            return pa.table({
                "token": pa.array(
                    np.asarray(out_t, dtype=np.int64)),
                "zone": pa.array(
                    np.asarray(out_z, dtype=np.int64)),
                "docs": pa.array(
                    np.asarray(out_d, dtype=np.int64)),
            })

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by(["token", "zone"]).aggregate(
                [("docs", "sum")])
            return pa.table({
                "token": g.column("token").cast(pa.int64()),
                "zone": g.column("zone").cast(pa.int64()),
                "docs": g.column("docs_sum").cast(pa.int64()),
            })

        refs = list(
            corpus_ds(sf_dir)
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        a = tree_reduce_tables(refs, merge).to_pandas()
        n_zones = int((a["token"] == -1).sum())
        rows = []
        for tk, grp in a[a["token"] >= 0].groupby("token", sort=True):
            zones_hit = len(grp)
            docs_hit = int(grp["docs"].sum())
            rows.append((
                int(tk), docs_hit, zones_hit, n_zones,
                float(zones_hit) / float(n_zones),
            ))
        return pa.table({
            "token": pa.array([r[0] for r in rows], type=pa.int64()),
            "docs_hit": pa.array([r[1] for r in rows],
                                 type=pa.int64()),
            "zones_hit": pa.array([r[2] for r in rows],
                                  type=pa.int64()),
            "n_zones": pa.array([r[3] for r in rows],
                                type=pa.int64()),
            "read_fraction": pa.array([r[4] for r in rows],
                                      type=pa.float64()),
        })

    toks = ", ".join(str(t) for t in sorted(QUERY_TOKENS))
    sql = f"""
    WITH tok AS ({SQL_TOK}),
    pres AS (
        SELECT DISTINCT CAST(token AS BIGINT) AS token,
               CAST(doc_id AS BIGINT) // {ZONE} AS zone,
               CAST(doc_id AS BIGINT) AS did
        FROM tok WHERE token IN ({toks})
    ),
    nz AS (
        SELECT CAST(count(DISTINCT CAST(doc_id AS BIGINT) // {ZONE})
                    AS BIGINT) AS n
        FROM documents
    )
    SELECT p.token,
           CAST(count(DISTINCT p.did) AS BIGINT) AS docs_hit,
           CAST(count(DISTINCT p.zone) AS BIGINT) AS zones_hit,
           nz.n AS n_zones,
           CAST(count(DISTINCT p.zone) AS DOUBLE)
               / CAST(nz.n AS DOUBLE) AS read_fraction
    FROM pres p CROSS JOIN nz
    GROUP BY p.token, nz.n
    """
    return q, sql


def build_wave111_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("bm25_eval_metrics",) + _bm25_eval_query()))
    add(*(("token_zonemap_pruning",) + _zonemap_query()))
    return queries, oracles
