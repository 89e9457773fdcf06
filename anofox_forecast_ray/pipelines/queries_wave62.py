"""Wave-62 queries: Engle ARCH-LM heteroskedasticity test, int8
embedding quantization audit, and TPC-H Q14 promo revenue share.

- doc_arch_lm_w8: Engle's ARCH Lagrange-multiplier test on the
  differenced w8 window-mean series per doc (the validation sibling
  of the GARCH kernel, ref src/models/garch.rs): e_t = y_t - y_{t-1},
  regress e_t^2 on e_{t-1}^2, LM = m * R^2. R^2 comes from the k=1
  Cramer fold sums (n, Sx, Sy, Sxx, Sxy, Syy) computed as SEQUENTIAL
  cumsum left folds — the repo's float-fold invariant — replayed in
  DuckDB with list_reduce over the same ordered lists.
- embedding_int8_quant: symmetric per-dimension int8 quantization of
  the embeddings table (the vector-store compression audit): scale_d
  = max|x_d| over the corpus (exact max — order-free), q = round_even
  (x/scale*127) (int8, exact both sides), per-vector reconstruction
  SSE folded over dims in ascending order. The per-dim maxes
  tree-reduce as 64-float partials; no embedding row leaves its
  block.
- lineitem_q14_promo_share: TPC-H Q14 reshaped to the synthetic
  schema (p_type='ECONOMY' plays PROMO): promo revenue share over a
  one-month shipdate window. Revenue in exact integer units
  (price-cents x (10000 - discount-bp), the wave-35 Q6 discipline);
  the part side (p_partkey -> is_promo) is broadcast once via
  ray.put and probed with searchsorted inside each scan task — the
  canonical small-side broadcast join, zero shuffle; partials
  tree-reduce as four int64s.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .queries import _cast, _num_read_blocks, corpus_ds
from ._scaffold import read_cols
from .queries_wave5 import _doc_series_rows
from .queries import _series_list_sql

Q14_LO = "1996-03-01"
Q14_HI = "1996-04-01"
Q14_PROMO = "ECONOMY"


# ---------------------------------------------------------- doc_arch_lm_w8
def _arch_lm_query(width: int = 8):
    def q(sf_dir: str):
        def arch(t: pa.Table) -> pa.Table:
            out = {"doc_id": [], "m": [], "r2": [], "lm": []}
            for doc, y in _doc_series_rows(t, width, min_points=4):
                e = np.diff(y)
                s = e * e
                x = s[:-1]
                yy = s[1:]
                m = yy.size
                # sequential fold sums (cumsum == left fold)
                sx = float(np.cumsum(x)[-1])
                sy = float(np.cumsum(yy)[-1])
                sxx = float(np.cumsum(x * x)[-1])
                sxy = float(np.cumsum(x * yy)[-1])
                syy = float(np.cumsum(yy * yy)[-1])
                mf = float(m)
                vx = mf * sxx - sx * sx
                vy = mf * syy - sy * sy
                num = mf * sxy - sx * sy
                r2 = (num * num) / (vx * vy) if vx * vy > 0 else 0.0
                out["doc_id"].append(doc)
                out["m"].append(m)
                out["r2"].append(r2)
                out["lm"].append(mf * r2)
            return pa.table({
                "doc_id": pa.array(out["doc_id"], type=pa.string()),
                "m": pa.array(out["m"], type=pa.int64()),
                "r2": pa.array(out["r2"], type=pa.float64()),
                "lm": pa.array(out["lm"], type=pa.float64()),
            })

        ds = corpus_ds(sf_dir).map_batches(
            arch, batch_format="pyarrow")
        return _cast(ds, {
            "doc_id": pa.string(),
            "m": pa.int64(),
            "r2": pa.float64(),
            "lm": pa.float64(),
        })

    fold = "(acc, x) -> acc + x"
    sql = f"""
    {_series_list_sql(width)},
    sq AS (
        SELECT doc_id, n,
               list_transform(
                   generate_series(2, CAST(n AS INTEGER)),
                   i -> (ms[i] - ms[i - 1]) * (ms[i] - ms[i - 1]))
                   AS s
        FROM l
    ),
    f AS (
        SELECT doc_id,
               CAST(n - 2 AS BIGINT) AS m,
               CAST(n - 2 AS DOUBLE) AS mf,
               list_reduce(list_prepend(0.0e0, list_transform(
                   generate_series(1, CAST(n - 2 AS INTEGER)),
                   i -> s[i])), {fold}) AS sx,
               list_reduce(list_prepend(0.0e0, list_transform(
                   generate_series(1, CAST(n - 2 AS INTEGER)),
                   i -> s[i + 1])), {fold}) AS sy,
               list_reduce(list_prepend(0.0e0, list_transform(
                   generate_series(1, CAST(n - 2 AS INTEGER)),
                   i -> s[i] * s[i])), {fold}) AS sxx,
               list_reduce(list_prepend(0.0e0, list_transform(
                   generate_series(1, CAST(n - 2 AS INTEGER)),
                   i -> s[i] * s[i + 1])), {fold}) AS sxy,
               list_reduce(list_prepend(0.0e0, list_transform(
                   generate_series(1, CAST(n - 2 AS INTEGER)),
                   i -> s[i + 1] * s[i + 1])), {fold}) AS syy
        FROM sq
    )
    SELECT doc_id, m,
           CASE WHEN (mf * sxx - sx * sx) * (mf * syy - sy * sy) > 0
                THEN ((mf * sxy - sx * sy) * (mf * sxy - sx * sy))
                     / ((mf * sxx - sx * sx) * (mf * syy - sy * sy))
                ELSE 0.0e0 END AS r2,
           mf * (CASE WHEN (mf * sxx - sx * sx)
                           * (mf * syy - sy * sy) > 0
                 THEN ((mf * sxy - sx * sy) * (mf * sxy - sx * sy))
                      / ((mf * sxx - sx * sx) * (mf * syy - sy * sy))
                 ELSE 0.0e0 END) AS lm
    FROM f
    """
    return q, sql


# ------------------------------------------------------ embedding_int8_quant
def _int8_quant_query():
    def q(sf_dir: str):
        import ray
        import ray.data as rd

        from ..extras.ann import _to_matrix
        from ..stages.source_rollup import tree_reduce_tables

        def maxabs(t: pa.Table) -> pa.Table:
            if "embedding" not in t.column_names or t.num_rows == 0:
                return pa.table({
                    "mx": pa.array([], type=pa.list_(pa.float64()))})
            x = _to_matrix(t.column("embedding"))
            return pa.table({
                "mx": pa.array([np.abs(x).max(axis=0).tolist()],
                               type=pa.list_(pa.float64()))})

        def merge(t: pa.Table) -> pa.Table:
            m = _to_matrix(t.column("mx")).max(axis=0)
            return pa.table({
                "mx": pa.array([m.tolist()],
                               type=pa.list_(pa.float64()))})

        src = read_cols(sf_dir, "embeddings", ["vec_id", "embedding"])
        refs = list(
            src.map_batches(maxabs, batch_format="pyarrow")
            .to_arrow_refs()
        )
        scales = np.asarray(
            tree_reduce_tables(refs, merge).column("mx")[0].as_py(),
            dtype=np.float64)
        sref = ray.put(scales)

        class QuantStage:
            def __init__(self, sref):
                self.scales = ray.get(sref)

            def __call__(self, t: pa.Table) -> pa.Table:
                if ("embedding" not in t.column_names
                        or t.num_rows == 0):
                    return pa.table({
                        "vec_id": pa.array([], type=pa.int64()),
                        "sse": pa.array([], type=pa.float64()),
                        "mse": pa.array([], type=pa.float64()),
                        "max_abs_err": pa.array(
                            [], type=pa.float64()),
                    })
                x = _to_matrix(t.column("embedding"))
                sc = self.scales
                qv = np.round(x / sc * 127.0)  # half-even == SQL
                rec = qv * sc / 127.0
                err = x - rec
                e2 = err * err
                # ascending-dim sequential fold per row
                sse = np.cumsum(e2, axis=1)[:, -1]
                d = x.shape[1]
                return pa.table({
                    "vec_id": t.column("vec_id").cast(pa.int64()),
                    "sse": pa.array(sse, type=pa.float64()),
                    "mse": pa.array(sse / float(d),
                                    type=pa.float64()),
                    "max_abs_err": pa.array(
                        np.abs(err).max(axis=1), type=pa.float64()),
                })

        out = src.map_batches(
            QuantStage, batch_format="pyarrow", concurrency=2,
            fn_constructor_args=(sref,),
        )
        return _cast(out, {
            "vec_id": pa.int64(),
            "sse": pa.float64(),
            "mse": pa.float64(),
            "max_abs_err": pa.float64(),
        })

    sql = """
    WITH dims AS (
        SELECT vec_id,
               unnest(embedding) AS x,
               generate_subscripts(embedding, 1) AS d
        FROM embeddings
    ),
    sc AS (
        SELECT d, max(abs(CAST(x AS DOUBLE))) AS s FROM dims GROUP BY d
    ),
    err AS (
        SELECT dims.vec_id, dims.d,
               (CAST(dims.x AS DOUBLE)
                - round_even(CAST(dims.x AS DOUBLE) / sc.s * 127.0e0,
                             0) * sc.s / 127.0e0) AS e
        FROM dims JOIN sc ON sc.d = dims.d
    )
    SELECT vec_id,
           list_reduce(list_prepend(0.0e0,
               list(e * e ORDER BY d)), (acc, t) -> acc + t) AS sse,
           list_reduce(list_prepend(0.0e0,
               list(e * e ORDER BY d)), (acc, t) -> acc + t)
               / CAST(count(*) AS DOUBLE) AS mse,
           max(abs(e)) AS max_abs_err
    FROM err GROUP BY vec_id
    """
    return q, sql


# ----------------------------------------------- lineitem_q14_promo_share
def _q14_query(lo: str = Q14_LO, hi: str = Q14_HI,
               promo: str = Q14_PROMO):
    def q(sf_dir: str):
        import pyarrow.parquet as pq
        import ray
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        part = pq.read_table(
            f"{sf_dir}/part.parquet", columns=["p_partkey", "p_type"])
        pk = part.column("p_partkey").to_numpy(zero_copy_only=False)
        is_promo = np.asarray(
            [t == promo for t in part.column("p_type").to_pylist()],
            dtype=bool)
        order = np.argsort(pk)
        pk = pk[order]
        is_promo = is_promo[order]
        bref = ray.put((pk, is_promo))

        lo_us = int(np.datetime64(lo).astype("datetime64[us]")
                    .astype(np.int64))
        hi_us = int(np.datetime64(hi).astype("datetime64[us]")
                    .astype(np.int64))

        class Partial:
            def __init__(self, bref):
                self.pk, self.is_promo = ray.get(bref)

            def __call__(self, t: pa.Table) -> pa.Table:
                empty = pa.table({
                    "n": pa.array([], type=pa.int64()),
                    "np_": pa.array([], type=pa.int64()),
                    "rev": pa.array([], type=pa.int64()),
                    "prev": pa.array([], type=pa.int64()),
                })
                if "l_partkey" not in t.column_names:
                    return empty
                ship = t.column("l_shipdate").cast(
                    pa.int64()).to_numpy(zero_copy_only=False)
                keep = (ship >= lo_us) & (ship < hi_us)
                if not keep.any():
                    return pa.table({
                        "n": pa.array([0], type=pa.int64()),
                        "np_": pa.array([0], type=pa.int64()),
                        "rev": pa.array([0], type=pa.int64()),
                        "prev": pa.array([0], type=pa.int64()),
                    })
                lpk = t.column("l_partkey").to_numpy(
                    zero_copy_only=False)[keep]
                price = np.round(
                    t.column("l_extendedprice").to_numpy(
                        zero_copy_only=False)[keep] * 100.0
                ).astype(np.int64)
                disc = np.round(
                    t.column("l_discount").to_numpy(
                        zero_copy_only=False)[keep] * 10000.0
                ).astype(np.int64)
                rev = price * (10000 - disc)
                idx = np.searchsorted(self.pk, lpk)
                promo_mask = self.is_promo[idx]
                return pa.table({
                    "n": pa.array([int(keep.sum())],
                                  type=pa.int64()),
                    "np_": pa.array([int(promo_mask.sum())],
                                    type=pa.int64()),
                    "rev": pa.array([int(rev.sum())],
                                    type=pa.int64()),
                    "prev": pa.array([int(rev[promo_mask].sum())],
                                     type=pa.int64()),
                })

        def merge(t: pa.Table) -> pa.Table:
            return pa.table({
                c: pa.array(
                    [int(t.column(c).to_numpy(
                        zero_copy_only=False).sum())],
                    type=pa.int64())
                for c in ("n", "np_", "rev", "prev")
            })

        refs = list(
            read_cols(sf_dir, "lineitem", ["l_partkey", "l_extendedprice",
                         "l_discount", "l_shipdate"])
            .map_batches(Partial, batch_format="pyarrow",
                         concurrency=2,
                         fn_constructor_args=(bref,))
            .to_arrow_refs()
        )
        a = tree_reduce_tables(refs, merge)
        n = int(a.column("n")[0].as_py())
        np_ = int(a.column("np_")[0].as_py())
        rev = int(a.column("rev")[0].as_py())
        prev = int(a.column("prev")[0].as_py())
        share = (100.0 * (float(prev) / float(rev))
                 if rev > 0 else 0.0)
        return pa.table({
            "n_items": pa.array([n], type=pa.int64()),
            "n_promo": pa.array([np_], type=pa.int64()),
            "rev_units": pa.array([rev], type=pa.int64()),
            "promo_rev_units": pa.array([prev], type=pa.int64()),
            "promo_share_pct": pa.array([share],
                                        type=pa.float64()),
        })

    sql = f"""
    WITH li AS (
        SELECT CAST(round_even(l_extendedprice * 100, 0) AS BIGINT)
               * (10000 - CAST(round_even(l_discount * 10000, 0)
                               AS BIGINT)) AS rev,
               p.p_type = '{promo}' AS is_promo
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        WHERE l.l_shipdate >= TIMESTAMP '{lo}'
          AND l.l_shipdate < TIMESTAMP '{hi}'
    )
    SELECT CAST(count(*) AS BIGINT) AS n_items,
           CAST(COALESCE(sum(CASE WHEN is_promo THEN 1 ELSE 0 END),
                         0) AS BIGINT) AS n_promo,
           CAST(COALESCE(sum(rev), 0) AS BIGINT) AS rev_units,
           CAST(COALESCE(sum(CASE WHEN is_promo THEN rev
                             ELSE 0 END), 0) AS BIGINT)
               AS promo_rev_units,
           CASE WHEN COALESCE(sum(rev), 0) > 0
                THEN 100.0e0 * (CAST(sum(CASE WHEN is_promo THEN rev
                                          ELSE 0 END) AS DOUBLE)
                                / CAST(sum(rev) AS DOUBLE))
                ELSE 0.0e0 END AS promo_share_pct
    FROM li
    """
    return q, sql


def build_wave62_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("doc_arch_lm_w8",) + _arch_lm_query()))
    add(*(("embedding_int8_quant",) + _int8_quant_query()))
    add(*(("lineitem_q14_promo_share",) + _q14_query()))
    return queries, oracles
