"""Wave-283 query: 2-D Procrustes alignment of label centroids.

embedding_procrustes_2d: orthogonal Procrustes analysis between the
10 label centroids computed from even- vs odd-vec_id halves, in the
first two embedding dimensions — the 2-D case has a fully closed
form: θ* = atan2(Σ(a×b), Σ(a·b)) after centering, scale
s = (cosθ·Σdot + sinθ·Σcross)/Σ|a|², and the normalized disparity
Σ|b − s·Rθ·a|²/Σ|b|².  All sums are label-ordered sequential folds;
atan2/cos/sin are shared libm.  Split-half centroid stability is the
classic reliability check for a learned embedding.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

N_LABELS = 10


def procrustes_2d(a_pts, b_pts):
    """(theta, scale, disparity) — label-ordered centroid lists."""
    k = len(a_pts)
    fk = float(k)
    max_ = sum(p[0] for p in a_pts) / fk
    may_ = sum(p[1] for p in a_pts) / fk
    mbx = sum(p[0] for p in b_pts) / fk
    mby = sum(p[1] for p in b_pts) / fk
    sdot = scross = saa = sbb = 0.0
    for (ax, ay), (bx, by) in zip(a_pts, b_pts):
        ax = ax - max_
        ay = ay - may_
        bx = bx - mbx
        by = by - mby
        sdot = sdot + (ax * bx + ay * by)
        scross = scross + (ax * by - ay * bx)
        saa = saa + (ax * ax + ay * ay)
        sbb = sbb + (bx * bx + by * by)
    theta = math.atan2(scross, sdot)
    scale = ((math.cos(theta) * sdot + math.sin(theta) * scross)
             / saa)
    # disparity = (Sbb - (cos t Sdot + sin t Scross)^2 / Saa) / Sbb
    num = (math.cos(theta) * sdot + math.sin(theta) * scross)
    disparity = (sbb - (num * num) / saa) / sbb
    return theta, scale, disparity


def _procrustes_query():
    def q(sf_dir: str):
        import pyarrow.parquet as pq

        t = pq.read_table(
            f"{sf_dir}/embeddings.parquet",
            columns=["vec_id", "embedding", "label"])
        vid = np.asarray(t.column("vec_id").to_pylist(),
                         dtype=np.int64)
        lab = np.asarray(t.column("label").to_pylist(),
                         dtype=np.int64)
        emb = np.stack(t.column("embedding").to_pylist()).astype(
            np.float64)[:, :2]
        a_pts, b_pts = [], []
        for l in range(N_LABELS):
            for parity, out in ((0, a_pts), (1, b_pts)):
                m = (lab == l) & (vid % 2 == parity)
                ids = np.argsort(vid[m])
                sub = emb[m][ids]
                n = float(len(sub))
                sx = sy = 0.0
                for r in sub:            # vec_id order
                    sx = sx + r[0]
                    sy = sy + r[1]
                out.append((sx / n, sy / n))
        theta, scale, disp = procrustes_2d(a_pts, b_pts)
        return pa.table({
            "theta": pa.array([theta], type=pa.float64()),
            "scale": pa.array([scale], type=pa.float64()),
            "disparity": pa.array([disp], type=pa.float64()),
        })

    sql = f"""
    WITH rows_ AS (
        SELECT vec_id, label,
               vec_id % 2 AS parity,
               CAST(embedding[1] AS DOUBLE) AS x,
               CAST(embedding[2] AS DOUBLE) AS y
        FROM embeddings WHERE label < {N_LABELS}
    ),
    cents AS (
        SELECT label, parity,
               list_reduce(list_prepend(0.0e0,
                   list(x ORDER BY vec_id)), (a, b) -> a + b)
               / CAST(count(*) AS DOUBLE) AS cx,
               list_reduce(list_prepend(0.0e0,
                   list(y ORDER BY vec_id)), (a, b) -> a + b)
               / CAST(count(*) AS DOUBLE) AS cy
        FROM rows_ GROUP BY label, parity
    ),
    means AS (
        SELECT parity,
               list_reduce(list_prepend(0.0e0,
                   list(cx ORDER BY label)), (a, b) -> a + b)
               / CAST(count(*) AS DOUBLE) AS mx,
               list_reduce(list_prepend(0.0e0,
                   list(cy ORDER BY label)), (a, b) -> a + b)
               / CAST(count(*) AS DOUBLE) AS my
        FROM cents GROUP BY parity
    ),
    paired AS (
        SELECT a.label,
               a.cx - ma.mx AS ax, a.cy - ma.my AS ay,
               b.cx - mb.mx AS bx, b.cy - mb.my AS by
        FROM cents a
        JOIN cents b ON a.label = b.label AND b.parity = 1
        JOIN means ma ON ma.parity = 0
        JOIN means mb ON mb.parity = 1
        WHERE a.parity = 0
    ),
    s AS (
        SELECT
            list_reduce(list_prepend(0.0e0,
                list(ax * bx + ay * by ORDER BY label)),
                (a, b) -> a + b) AS sdot,
            list_reduce(list_prepend(0.0e0,
                list(ax * by - ay * bx ORDER BY label)),
                (a, b) -> a + b) AS scross,
            list_reduce(list_prepend(0.0e0,
                list(ax * ax + ay * ay ORDER BY label)),
                (a, b) -> a + b) AS saa,
            list_reduce(list_prepend(0.0e0,
                list(bx * bx + by * by ORDER BY label)),
                (a, b) -> a + b) AS sbb
        FROM paired
    )
    SELECT atan2(scross, sdot) AS theta,
           (cos(atan2(scross, sdot)) * sdot
            + sin(atan2(scross, sdot)) * scross) / saa AS scale,
           (sbb - ((cos(atan2(scross, sdot)) * sdot
                    + sin(atan2(scross, sdot)) * scross)
                   * (cos(atan2(scross, sdot)) * sdot
                      + sin(atan2(scross, sdot)) * scross))
                  / saa) / sbb AS disparity
    FROM s
    """
    return q, sql


def build_wave283_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("embedding_procrustes_2d",) + _procrustes_query()))
    return queries, oracles
