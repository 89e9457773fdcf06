"""Wave-149 queries: demand-pattern classification, triplet eval.

- lineitem_sba_classification: the Syntetos-Boylan demand-pattern
  quadrants (smooth / intermittent / erratic / lumpy) that decide
  when Croston-family models apply — directly relevant to the
  engine's Croston/ADIDA/TSB stack. Per part, ADI = global month
  span / demand months and CV^2 of monthly demand sizes; both
  threshold tests are EXACT integer cross-multiplications
  (ADI > 1.32 <=> 100*T > 132*m; CV^2 > 0.49 <=>
  100*(m*Sqq - Sq^2) > 49*Sq^2), so the quadrant counts admit no
  float drift at all.
- embedding_triplet_eval: representation-quality eval — for every
  vector, the nearest same-label and nearest different-label
  distances (exact int64 micro-unit squares), the violation rate
  (d_same >= d_diff) and the total integer margin. The argmins
  cannot float-flip; ties need no break because only the min
  DISTANCE enters.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .queries import _num_read_blocks
from ._scaffold import read_cols

ADI_NUM = 132   # ADI threshold 1.32
CV2_NUM = 49    # CV^2 threshold 0.49


# ------------------------------------------------ lineitem_sba_classification
def _sba_query():
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "pkey": pa.array([], type=pa.int64()),
                "month": pa.array([], type=pa.int64()),
                "qty": pa.array([], type=pa.int64()),
            })
            if "l_partkey" not in t.column_names:
                return empty
            pkey = t.column("l_partkey").cast(
                pa.int64()).to_numpy(zero_copy_only=False)
            ship = t.column("l_shipdate").cast(
                pa.int64()).to_numpy(zero_copy_only=False)
            m = (ship.astype("datetime64[us]")
                 .astype("datetime64[M]").astype(np.int64))
            qty = np.round(t.column("l_quantity").to_numpy(
                zero_copy_only=False)).astype(np.int64)
            key = pkey * np.int64(1 << 20) + (m + 1000)
            uk, inv = np.unique(key, return_inverse=True)
            qs = np.bincount(inv, weights=qty.astype(
                np.float64)).astype(np.int64)
            return pa.table({
                "pkey": pa.array(uk // (1 << 20)),
                "month": pa.array(uk % (1 << 20) - 1000),
                "qty": pa.array(qs),
            })

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by(["pkey", "month"]).aggregate(
                [("qty", "sum")])
            return pa.table({
                "pkey": g.column("pkey").cast(pa.int64()),
                "month": g.column("month").cast(pa.int64()),
                "qty": g.column("qty_sum").cast(pa.int64()),
            })

        refs = list(
            read_cols(sf_dir, "lineitem", ["l_partkey", "l_shipdate",
                         "l_quantity"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        cells = tree_reduce_tables(refs, merge).to_pandas()
        t_span = int(cells["month"].max()) \
            - int(cells["month"].min()) + 1

        counts = {"smooth": 0, "intermittent": 0,
                  "erratic": 0, "lumpy": 0}
        for _pk, grp in cells.groupby("pkey"):
            m = len(grp)
            sq = int(grp["qty"].sum())
            sqq = int((grp["qty"] * grp["qty"]).sum())
            adi_high = 100 * t_span > ADI_NUM * m
            cv2_high = (100 * (m * sqq - sq * sq)
                        > CV2_NUM * sq * sq)
            if adi_high and cv2_high:
                counts["lumpy"] += 1
            elif adi_high:
                counts["intermittent"] += 1
            elif cv2_high:
                counts["erratic"] += 1
            else:
                counts["smooth"] += 1
        return pa.table({
            "t_months": pa.array([t_span], type=pa.int64()),
            "smooth": pa.array([counts["smooth"]],
                               type=pa.int64()),
            "intermittent": pa.array(
                [counts["intermittent"]], type=pa.int64()),
            "erratic": pa.array([counts["erratic"]],
                                type=pa.int64()),
            "lumpy": pa.array([counts["lumpy"]],
                              type=pa.int64()),
        })

    sql = f"""
    WITH pm AS (
        SELECT l_partkey AS pkey,
               year(l_shipdate) * 12 + month(l_shipdate)
                   AS month,
               CAST(sum(CAST(round_even(l_quantity, 0)
                             AS BIGINT)) AS BIGINT) AS qty
        FROM lineitem GROUP BY 1, 2
    ),
    span AS (
        SELECT CAST(max(month) - min(month) + 1 AS BIGINT)
            AS t FROM pm
    ),
    per AS (
        SELECT pkey,
               CAST(count(*) AS BIGINT) AS m,
               CAST(sum(qty) AS BIGINT) AS sq,
               CAST(sum(CAST(qty AS HUGEINT) * qty)
                    AS HUGEINT) AS sqq
        FROM pm GROUP BY pkey
    ),
    cls AS (
        SELECT
            CASE WHEN 100 * span.t > {ADI_NUM} * m THEN 1
                 ELSE 0 END AS adi_high,
            CASE WHEN 100 * (m * sqq
                             - CAST(sq AS HUGEINT) * sq)
                      > {CV2_NUM} * CAST(sq AS HUGEINT) * sq
                 THEN 1 ELSE 0 END AS cv2_high
        FROM per CROSS JOIN span
    )
    SELECT (SELECT t FROM span) AS t_months,
           CAST(sum(CASE WHEN adi_high = 0 AND cv2_high = 0
                    THEN 1 ELSE 0 END) AS BIGINT) AS smooth,
           CAST(sum(CASE WHEN adi_high = 1 AND cv2_high = 0
                    THEN 1 ELSE 0 END) AS BIGINT)
               AS intermittent,
           CAST(sum(CASE WHEN adi_high = 0 AND cv2_high = 1
                    THEN 1 ELSE 0 END) AS BIGINT) AS erratic,
           CAST(sum(CASE WHEN adi_high = 1 AND cv2_high = 1
                    THEN 1 ELSE 0 END) AS BIGINT) AS lumpy
    FROM cls
    """
    return q, sql


# -------------------------------------------------- embedding_triplet_eval
def _triplet_query():
    def q(sf_dir: str):
        import ray
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        emb = rd.read_parquet(
            f"{sf_dir}/embeddings.parquet",
            columns=["vec_id", "embedding", "label"]
        ).to_pandas().sort_values("vec_id")
        mat = np.stack([
            np.round(np.asarray(v, dtype=np.float64)
                     * 1000000.0).astype(np.int64)
            for v in emb["embedding"]])
        vid = emb["vec_id"].to_numpy(np.int64)
        lab = emb["label"].to_numpy(np.int64)
        m_ref = ray.put((mat, vid, lab))

        def score(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "viol": pa.array([], type=pa.int64()),
                "margin": pa.array([], type=pa.int64()),
                "n": pa.array([], type=pa.int64()),
            })
            if "vec_id" not in t.column_names:
                return empty
            rmat, rvid, rlab = ray.get(m_ref)
            viol = 0
            margin = 0
            n = 0
            for i in range(t.num_rows):
                q_id = t.column("vec_id")[i].as_py()
                q_lab = t.column("label")[i].as_py()
                qv = np.round(np.asarray(
                    t.column("embedding")[i].as_py(),
                    dtype=np.float64) * 1000000.0).astype(
                    np.int64)
                d = rmat - qv
                dist = np.einsum("ij,ij->i", d, d)
                same = (rlab == q_lab) & (rvid != q_id)
                diff = rlab != q_lab
                ds = int(dist[same].min())
                dd = int(dist[diff].min())
                if ds >= dd:
                    viol += 1
                margin += dd - ds
                n += 1
            return pa.table({
                "viol": pa.array([viol], type=pa.int64()),
                "margin": pa.array([margin],
                                   type=pa.int64()),
                "n": pa.array([n], type=pa.int64()),
            })

        def merge(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            return pa.table({
                "viol": pa.array(
                    [pc.sum(t.column("viol")).as_py()],
                    type=pa.int64()),
                "margin": pa.array(
                    [pc.sum(t.column("margin")).as_py()],
                    type=pa.int64()),
                "n": pa.array(
                    [pc.sum(t.column("n")).as_py()],
                    type=pa.int64()),
            })

        refs = list(
            read_cols(sf_dir, "embeddings", ["vec_id", "embedding", "label"])
            .map_batches(score, batch_format="pyarrow")
            .to_arrow_refs()
        )
        a = tree_reduce_tables(refs, merge).to_pandas()
        n = int(a["n"].iloc[0])
        v = int(a["viol"].iloc[0])
        mg = int(a["margin"].iloc[0])
        return pa.table({
            "n_anchors": pa.array([n], type=pa.int64()),
            "violations": pa.array([v], type=pa.int64()),
            "viol_rate": pa.array(
                [float(v) / float(n)], type=pa.float64()),
            "sum_margin": pa.array([mg], type=pa.int64()),
        })

    sql = """
    WITH q AS (
        SELECT vec_id, label,
               generate_subscripts(embedding, 1) AS i,
               CAST(round_even(
                   CAST(unnest(embedding) AS DOUBLE) * 1000000,
                   0) AS BIGINT) AS m
        FROM embeddings
    ),
    d AS (
        SELECT a.vec_id AS qid, a.label AS qlab,
               b.vec_id AS rid, b.label AS rlab,
               CAST(sum((a.m - b.m) * (a.m - b.m)) AS BIGINT)
                   AS dist
        FROM q a JOIN q b ON a.i = b.i
                        AND a.vec_id <> b.vec_id
        GROUP BY 1, 2, 3, 4
    ),
    mins AS (
        SELECT qid,
               min(CASE WHEN qlab = rlab THEN dist END)
                   AS d_same,
               min(CASE WHEN qlab <> rlab THEN dist END)
                   AS d_diff
        FROM d GROUP BY qid
    )
    SELECT CAST(count(*) AS BIGINT) AS n_anchors,
           CAST(sum(CASE WHEN d_same >= d_diff
                    THEN 1 ELSE 0 END) AS BIGINT)
               AS violations,
           CAST(sum(CASE WHEN d_same >= d_diff
                    THEN 1 ELSE 0 END) AS DOUBLE)
               / CAST(count(*) AS DOUBLE) AS viol_rate,
           CAST(sum(d_diff - d_same) AS BIGINT) AS sum_margin
    FROM mins
    """
    return q, sql


def build_wave149_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("lineitem_sba_classification",) + _sba_query()))
    add(*(("embedding_triplet_eval",) + _triplet_query()))
    return queries, oracles
