"""Wave-118 queries: sortedness via inversions, tie-corrected Spearman.

- doc_inversions: Kendall distance to the sorted sequence over each
  doc's first 64 tokens (capped so the oracle's per-doc pair join
  stays bounded): the strict inversion count and its fraction of all
  pairs — the classic "how pre-sorted is this data" metric that
  drives adaptive-sort/encoding decisions. Pure integers plus one
  division.
- lineitem_qty_disc_spearman: Spearman rank correlation between
  l_quantity and l_discount — both domains are BOUNDED (50 and 11
  distinct values), so the global ranks come from histograms, never a
  sort: doubled midranks (2*cum_before + c + 1, the wave-43 trick)
  make tie handling fully integer, and all Pearson-on-ranks moments
  are exact int sums over the 50x11 joint contingency (HUGEINT in
  the oracle — n*Sxy overflows int64 at 60k rows already). One final
  division over two scalar sqrts.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from .queries import SQL_TOK, _cast, _num_read_blocks, corpus_ds
from ._scaffold import read_cols

INV_CAP = 64


# ------------------------------------------------------------ doc_inversions
def _inversions_query():
    def q(sf_dir: str):
        from ..stages.rollup import _flat_tokens

        def inv(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "doc_id": pa.array([], type=pa.string()),
                "m": pa.array([], type=pa.int64()),
                "inversions": pa.array([], type=pa.int64()),
                "inv_frac": pa.array([], type=pa.float64()),
            })
            if "tokens" not in t.column_names or t.num_rows == 0:
                return empty
            values, lengths = _flat_tokens(t)
            ids = t.column("doc_id").to_pylist()
            out_i, out_m, out_v, out_f = [], [], [], []
            off = 0
            for i, ln_ in enumerate(lengths):
                seg = values[off: off + int(ln_)].astype(np.int64)
                off += int(ln_)
                m = min(int(ln_), INV_CAP)
                if m < 2:
                    continue
                x = seg[:m]
                inv_cnt = int(
                    (x[:, None] > x[None, :])[
                        np.triu_indices(m, k=1)].sum())
                pairs = m * (m - 1) // 2
                out_i.append(ids[i])
                out_m.append(m)
                out_v.append(inv_cnt)
                out_f.append(float(inv_cnt) / float(pairs))
            return pa.table({
                "doc_id": pa.array(out_i, type=pa.string()),
                "m": pa.array(out_m, type=pa.int64()),
                "inversions": pa.array(out_v, type=pa.int64()),
                "inv_frac": pa.array(out_f, type=pa.float64()),
            })

        ds = corpus_ds(sf_dir).map_batches(inv, batch_format="pyarrow")
        return _cast(ds, {
            "doc_id": pa.string(),
            "m": pa.int64(),
            "inversions": pa.int64(),
            "inv_frac": pa.float64(),
        })

    sql = f"""
    WITH tok AS ({SQL_TOK}),
    head AS (
        SELECT doc_id, pos, token FROM tok WHERE pos < {INV_CAP}
    ),
    dims AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS m
        FROM head GROUP BY doc_id HAVING count(*) >= 2
    ),
    pairs AS (
        SELECT a.doc_id,
               CAST(sum(CASE WHEN a.token > b.token
                             THEN 1 ELSE 0 END) AS BIGINT) AS inv
        FROM head a JOIN head b
          ON b.doc_id = a.doc_id AND b.pos > a.pos
        GROUP BY a.doc_id
    )
    SELECT d.doc_id, d.m,
           COALESCE(p.inv, 0) AS inversions,
           CAST(COALESCE(p.inv, 0) AS DOUBLE)
               / CAST(d.m * (d.m - 1) // 2 AS DOUBLE) AS inv_frac
    FROM dims d LEFT JOIN pairs p ON p.doc_id = d.doc_id
    """
    return q, sql


# ---------------------------------------------- lineitem_qty_disc_spearman
def _spearman_query():
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "v": pa.array([], type=pa.int64()),
                "w": pa.array([], type=pa.int64()),
                "c": pa.array([], type=pa.int64()),
            })
            if "l_quantity" not in t.column_names or t.num_rows == 0:
                return empty
            v = np.round(t.column("l_quantity").to_numpy(
                zero_copy_only=False)).astype(np.int64)
            w = np.round(t.column("l_discount").to_numpy(
                zero_copy_only=False) * 100.0).astype(np.int64)
            key = v * np.int64(1 << 16) + w
            uk, cnt = np.unique(key, return_counts=True)
            return pa.table({
                "v": pa.array(uk >> np.int64(16), type=pa.int64()),
                "w": pa.array(uk % np.int64(1 << 16),
                              type=pa.int64()),
                "c": pa.array(cnt.astype(np.int64)),
            })

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by(["v", "w"]).aggregate([("c", "sum")])
            return pa.table({
                "v": g.column("v").cast(pa.int64()),
                "w": g.column("w").cast(pa.int64()),
                "c": g.column("c_sum").cast(pa.int64()),
            })

        refs = list(
            read_cols(sf_dir, "lineitem", ["l_quantity", "l_discount"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        a = tree_reduce_tables(refs, merge).to_pandas()

        def midranks(hist: dict) -> dict:
            mr = {}
            cum = 0
            for val in sorted(hist):
                c = hist[val]
                mr[val] = 2 * cum + c + 1
                cum += c
            return mr

        hx = {}
        hy = {}
        joint = {}
        for _, r in a.iterrows():
            v, w, c = int(r["v"]), int(r["w"]), int(r["c"])
            hx[v] = hx.get(v, 0) + c
            hy[w] = hy.get(w, 0) + c
            joint[(v, w)] = joint.get((v, w), 0) + c
        mrx = midranks(hx)
        mry = midranks(hy)
        n = sum(hx.values())
        sx = sum(c * mrx[v] for v, c in hx.items())
        sy = sum(c * mry[w] for w, c in hy.items())
        sxx = sum(c * mrx[v] * mrx[v] for v, c in hx.items())
        syy = sum(c * mry[w] * mry[w] for w, c in hy.items())
        sxy = sum(c * mrx[v] * mry[w]
                  for (v, w), c in joint.items())
        num = n * sxy - sx * sy
        dxx = n * sxx - sx * sx
        dyy = n * syy - sy * sy
        rho = float(num) / (math.sqrt(float(dxx))
                            * math.sqrt(float(dyy)))
        return pa.table({
            "n": pa.array([n], type=pa.int64()),
            "rho": pa.array([rho], type=pa.float64()),
        })

    sql = """
    WITH base AS (
        SELECT CAST(round(l_quantity) AS BIGINT) AS v,
               CAST(round(l_discount * 100.0e0) AS BIGINT) AS w
        FROM lineitem
    ),
    hx AS (
        SELECT v, CAST(count(*) AS BIGINT) AS c FROM base GROUP BY v
    ),
    hy AS (
        SELECT w, CAST(count(*) AS BIGINT) AS c FROM base GROUP BY w
    ),
    mrx AS (
        SELECT v, c,
               CAST(2 * (sum(c) OVER (ORDER BY v) - c) + c + 1
                    AS BIGINT) AS mr
        FROM hx
    ),
    mry AS (
        SELECT w, c,
               CAST(2 * (sum(c) OVER (ORDER BY w) - c) + c + 1
                    AS BIGINT) AS mr
        FROM hy
    ),
    joint AS (
        SELECT v, w, CAST(count(*) AS BIGINT) AS c
        FROM base GROUP BY v, w
    ),
    sums AS (
        SELECT
            (SELECT CAST(sum(c) AS HUGEINT) FROM hx) AS n,
            (SELECT CAST(sum(CAST(c AS HUGEINT) * mr) AS HUGEINT)
             FROM mrx) AS sx,
            (SELECT CAST(sum(CAST(c AS HUGEINT) * mr) AS HUGEINT)
             FROM mry) AS sy,
            (SELECT CAST(sum(CAST(c AS HUGEINT) * mr * mr) AS HUGEINT)
             FROM mrx) AS sxx,
            (SELECT CAST(sum(CAST(c AS HUGEINT) * mr * mr) AS HUGEINT)
             FROM mry) AS syy,
            (SELECT CAST(sum(CAST(j.c AS HUGEINT) * x.mr * y.mr)
                         AS HUGEINT)
             FROM joint j
             JOIN mrx x ON x.v = j.v
             JOIN mry y ON y.w = j.w) AS sxy
    )
    SELECT CAST(n AS BIGINT) AS n,
           CAST(n * sxy - sx * sy AS DOUBLE)
               / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                  * sqrt(CAST(n * syy - sy * sy AS DOUBLE))) AS rho
    FROM sums
    """
    return q, sql


def build_wave118_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("doc_inversions",) + _inversions_query()))
    add(*(("lineitem_qty_disc_spearman",) + _spearman_query()))
    return queries, oracles
