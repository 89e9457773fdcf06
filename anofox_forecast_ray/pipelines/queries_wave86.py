"""Wave-86 queries: spectral flatness and supplier revenue HHI.

- doc_spectral_flatness: Wiener entropy of the w8 DFT power spectrum
  (k = 1..4): SF = exp(mean(ln p_k)) / mean(p_k) — 1.0 for white
  noise, -> 0 for pure tones. Reuses the proven scalar cos/sin DFT
  folds (kernels/detection.dft_power_seq); both means fold in k
  order; exp/ln are shared libm.
- lineitem_supplier_hhi: Herfindahl-Hirschman concentration of
  supplier revenue: HHI = sum r_i^2 / (sum r_i)^2 over exact integer
  revenue units. r_i^2 overflows int64 at ~1e13-unit revenues, so
  the engine squares PYTHON bigints over the bounded supplier table
  and the oracle uses HUGEINT — the proven
  lineitem_qty_price_corr discipline (NOTES.md).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from .queries import SQL_TOK, _cast, _num_read_blocks, corpus_ds
from ._scaffold import read_cols
from .queries_wave5 import _doc_series_rows


# ------------------------------------------------------ doc_spectral_flatness
def _flatness_query(width: int = 8, max_k: int = 4):
    def q(sf_dir: str):
        from ..kernels.detection import dft_power_seq

        ks = list(range(1, max_k + 1))

        def tx(t: pa.Table) -> pa.Table:
            out = {"doc_id": [], "flatness": []}
            for doc, y in _doc_series_rows(t, width):
                powers = [p for _c, _s, p in dft_power_seq(y, ks)]
                am = 0.0
                gm_log = 0.0
                ok = True
                for p in powers:       # sequential k-order folds
                    am = am + p
                    if p > 0:
                        gm_log = gm_log + math.log(p)
                    else:
                        ok = False
                kf = float(len(powers))
                am = am / kf
                sf = (math.exp(gm_log / kf) / am
                      if ok and am > 0 else 0.0)
                out["doc_id"].append(doc)
                out["flatness"].append(sf)
            return pa.table({
                "doc_id": pa.array(out["doc_id"],
                                   type=pa.string()),
                "flatness": pa.array(out["flatness"],
                                     type=pa.float64()),
            })

        return _cast(
            corpus_ds(sf_dir).map_batches(
                tx, batch_format="pyarrow"),
            {"doc_id": pa.string(), "flatness": pa.float64()},
        )

    from .queries import _series_list_sql
    fold = "(acc, x) -> acc + x"
    sql = f"""
    {_series_list_sql(width)},
    st AS (
        SELECT doc_id, ms, n,
               list_reduce(ms, {fold}) / n AS m
        FROM l
    ),
    cs AS (
        SELECT doc_id, n, CAST(kk.k AS INTEGER) AS k,
            list_reduce(list_transform(
                generate_series(1, CAST(n AS INTEGER)),
                i -> (ms[i] - m)
                     * cos(2.0e0 * pi() * kk.k
                           * CAST(i - 1 AS DOUBLE) / n)),
                {fold}) AS c,
            list_reduce(list_transform(
                generate_series(1, CAST(n AS INTEGER)),
                i -> (ms[i] - m)
                     * sin(2.0e0 * pi() * kk.k
                           * CAST(i - 1 AS DOUBLE) / n)),
                {fold}) AS s
        FROM st CROSS JOIN
             (SELECT unnest(generate_series(1, {max_k})) AS k) kk
    ),
    pw AS (
        SELECT doc_id, k, (c * c + s * s) / n AS p FROM cs
    ),
    folded AS (
        SELECT doc_id,
               list_reduce(list_prepend(0.0e0,
                   list(p ORDER BY k)), {fold})
                   / {float(max_k)}e0 AS am,
               list_reduce(list_prepend(0.0e0,
                   list(CASE WHEN p > 0 THEN ln(p)
                             ELSE 0.0e0 END ORDER BY k)),
                   {fold}) AS gml,
               CAST(sum(CASE WHEN p > 0 THEN 0 ELSE 1 END)
                    AS BIGINT) AS zeros
        FROM pw GROUP BY doc_id
    )
    SELECT doc_id,
           CASE WHEN zeros = 0 AND am > 0
                THEN exp(gml / {float(max_k)}e0) / am
                ELSE 0.0e0 END AS flatness
    FROM folded
    """
    return q, sql


# -------------------------------------------------------- lineitem_supplier_hhi
def _hhi_query():
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            if "l_suppkey" not in t.column_names or t.num_rows == 0:
                return pa.table({
                    "suppkey": pa.array([], type=pa.int64()),
                    "rev": pa.array([], type=pa.int64()),
                })
            sk = t.column("l_suppkey").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            cents = np.round(
                t.column("l_extendedprice").to_numpy(
                    zero_copy_only=False) * 100.0).astype(np.int64)
            bp = np.round(
                t.column("l_discount").to_numpy(
                    zero_copy_only=False) * 10000.0
            ).astype(np.int64)
            rev = cents * (10000 - bp)
            uk, inv = np.unique(sk, return_inverse=True)
            sums = np.zeros(uk.size, dtype=np.int64)
            np.add.at(sums, inv, rev)
            return pa.table({
                "suppkey": pa.array(uk),
                "rev": pa.array(sums),
            })

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by("suppkey").aggregate([("rev", "sum")])
            return pa.table({
                "suppkey": g.column("suppkey").cast(pa.int64()),
                "rev": g.column("rev_sum").cast(pa.int64()),
            })

        refs = list(
            read_cols(sf_dir, "lineitem", ["l_suppkey", "l_extendedprice",
                         "l_discount"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        a = tree_reduce_tables(refs, merge).to_pandas()
        revs = [int(v) for v in a["rev"]]  # python bigints
        tot = sum(revs)
        num = sum(r * r for r in revs)
        hhi = float(num) / (float(tot) * float(tot))
        return pa.table({
            "n_suppliers": pa.array([len(revs)],
                                    type=pa.int64()),
            "hhi": pa.array([hhi], type=pa.float64()),
            "hhi_x10000": pa.array([hhi * 10000.0],
                                   type=pa.float64()),
        })

    sql = """
    WITH r AS (
        SELECT l_suppkey,
               CAST(sum(CAST(round_even(l_extendedprice * 100, 0)
                             AS BIGINT)
                        * (10000 - CAST(round_even(
                              l_discount * 10000, 0) AS BIGINT)))
                    AS BIGINT) AS rev
        FROM lineitem GROUP BY l_suppkey
    )
    SELECT CAST(count(*) AS BIGINT) AS n_suppliers,
           CAST(sum(CAST(rev AS HUGEINT) * CAST(rev AS HUGEINT))
                AS DOUBLE)
               / (CAST(sum(rev) AS DOUBLE)
                  * CAST(sum(rev) AS DOUBLE)) AS hhi,
           CAST(sum(CAST(rev AS HUGEINT) * CAST(rev AS HUGEINT))
                AS DOUBLE)
               / (CAST(sum(rev) AS DOUBLE)
                  * CAST(sum(rev) AS DOUBLE)) * 10000.0e0
               AS hhi_x10000
    FROM r
    """
    return q, sql


def build_wave86_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("doc_spectral_flatness",) + _flatness_query()))
    add(*(("lineitem_supplier_hhi",) + _hhi_query()))
    return queries, oracles
