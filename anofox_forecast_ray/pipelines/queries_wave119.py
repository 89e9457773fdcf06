"""Wave-119 queries: systematic PPS sampling and effect sizes.

- doc_systematic_pps: systematic probability-proportional-to-size
  selection of K = 32 docs by n_chars — the deterministic sampler
  used for index/statistics construction: doc d is selected iff the
  scaled cumulative size crosses an integer boundary,
  floor(cum_after * K / total) > floor(cum_before * K / total).
  ENTIRELY integer (no random stream to replay); the prefix sums are
  a window sum in the oracle and a block-offset carry scan in the
  engine. Selection probability is proportional to n_chars by
  construction.
- source_cohens_d: Cohen's d and Hedges' g (small-sample corrected)
  for the doc-length difference between the two lexicographically
  first sources — the standard effect-size complement to the
  source_anova_f / perm-test rows. Means and variances are single
  divisions of exact integer power sums; the pooled s and the
  correction J = 1 - 3/(4 df - 1) are spelled identically on both
  sides.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from .queries import _num_read_blocks
from ._scaffold import read_cols

PPS_K = 32


# -------------------------------------------------------- doc_systematic_pps
def _pps_query():
    def q(sf_dir: str):
        import ray
        import ray.data as rd

        # pass 1: per-block n_chars totals in block order -> offsets
        ds = read_cols(sf_dir, "documents", ["doc_id", "n_chars"])
        refs = ds.to_arrow_refs()

        @ray.remote(num_cpus=1)
        def block_total(t: pa.Table):
            if t.num_rows == 0:
                return 0
            return int(
                t.column("n_chars").to_numpy(
                    zero_copy_only=False).sum())

        totals = ray.get([block_total.remote(r) for r in refs])
        offsets = np.concatenate(([0], np.cumsum(totals)))
        total = int(offsets[-1])

        @ray.remote(num_cpus=1)
        def select(t: pa.Table, offset: int):
            if t.num_rows == 0:
                return pa.table({
                    "doc_id": pa.array([], type=pa.int64()),
                    "n_chars": pa.array([], type=pa.int64()),
                    "cum": pa.array([], type=pa.int64()),
                })
            nc = t.column("n_chars").to_numpy(
                zero_copy_only=False).astype(np.int64)
            cum_after = offset + np.cumsum(nc)
            cum_before = cum_after - nc
            lo = (cum_before * PPS_K) // total
            hi = (cum_after * PPS_K) // total
            keep = hi > lo
            ids = t.column("doc_id").to_numpy(
                zero_copy_only=False).astype(np.int64)
            return pa.table({
                "doc_id": pa.array(ids[keep]),
                "n_chars": pa.array(nc[keep]),
                "cum": pa.array(cum_after[keep].astype(np.int64)),
            })

        parts = ray.get([
            select.remote(r, int(offsets[i]))
            for i, r in enumerate(refs)
        ])
        out = pa.concat_tables([p for p in parts if p.num_rows])
        df = out.to_pandas().sort_values("doc_id")
        return pa.table({
            "doc_id": pa.array(df["doc_id"].to_numpy(np.int64)),
            "n_chars": pa.array(df["n_chars"].to_numpy(np.int64)),
            "cum": pa.array(df["cum"].to_numpy(np.int64)),
        })

    sql = f"""
    WITH c AS (
        SELECT CAST(doc_id AS BIGINT) AS doc_id,
               CAST(n_chars AS BIGINT) AS n_chars,
               CAST(sum(n_chars) OVER (ORDER BY CAST(doc_id AS BIGINT))
                    AS BIGINT) AS cum
        FROM documents
    ),
    t AS (SELECT CAST(sum(n_chars) AS BIGINT) AS total FROM documents)
    SELECT doc_id, n_chars, cum
    FROM c CROSS JOIN t
    WHERE (cum * {PPS_K}) // total
          > ((cum - n_chars) * {PPS_K}) // total
    """
    return q, sql


# ---------------------------------------------------------- source_cohens_d
def _cohens_d_query():
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "source": pa.array([], type=pa.string()),
                "n": pa.array([], type=pa.int64()),
                "s": pa.array([], type=pa.int64()),
                "ss": pa.array([], type=pa.int64()),
            })
            if "source" not in t.column_names or t.num_rows == 0:
                return empty
            src = np.asarray(t.column("source").to_pylist())
            nc = t.column("n_chars").to_numpy(
                zero_copy_only=False).astype(np.int64)
            names, inv = np.unique(src, return_inverse=True)
            n = np.bincount(inv).astype(np.int64)
            s = np.bincount(inv, weights=nc).astype(np.int64)
            ss = np.bincount(inv, weights=nc * nc).astype(np.int64)
            return pa.table({
                "source": pa.array(names, type=pa.string()),
                "n": pa.array(n),
                "s": pa.array(s),
                "ss": pa.array(ss),
            })

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by("source").aggregate(
                [("n", "sum"), ("s", "sum"), ("ss", "sum")])
            return pa.table({
                "source": g.column("source"),
                "n": g.column("n_sum").cast(pa.int64()),
                "s": g.column("s_sum").cast(pa.int64()),
                "ss": g.column("ss_sum").cast(pa.int64()),
            })

        refs = list(
            read_cols(sf_dir, "documents", ["source", "n_chars"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        a = tree_reduce_tables(refs, merge).to_pandas()
        a = a.sort_values("source").reset_index(drop=True)
        r1, r2 = a.iloc[0], a.iloc[1]
        n1, s1, ss1 = int(r1["n"]), int(r1["s"]), int(r1["ss"])
        n2, s2, ss2 = int(r2["n"]), int(r2["s"]), int(r2["ss"])
        m1 = float(s1) / float(n1)
        m2 = float(s2) / float(n2)
        v1 = float(n1 * ss1 - s1 * s1) / float(n1 * (n1 - 1))
        v2 = float(n2 * ss2 - s2 * s2) / float(n2 * (n2 - 1))
        df_ = n1 + n2 - 2
        sp = math.sqrt((float(n1 - 1) * v1 + float(n2 - 1) * v2)
                       / float(df_))
        d = (m1 - m2) / sp
        j = 1.0 - 3.0 / float(4 * df_ - 1)
        g = j * d
        return pa.table({
            "src_a": pa.array([r1["source"]], type=pa.string()),
            "src_b": pa.array([r2["source"]], type=pa.string()),
            "n1": pa.array([n1], type=pa.int64()),
            "n2": pa.array([n2], type=pa.int64()),
            "cohens_d": pa.array([d], type=pa.float64()),
            "hedges_g": pa.array([g], type=pa.float64()),
        })

    sql = """
    WITH two AS (
        SELECT source FROM documents
        GROUP BY source ORDER BY source LIMIT 2
    ),
    stats AS (
        SELECT d.source,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(n_chars) AS BIGINT) AS s,
               CAST(sum(CAST(n_chars AS HUGEINT) * n_chars)
                    AS HUGEINT) AS ss
        FROM documents d JOIN two ON two.source = d.source
        GROUP BY d.source
    ),
    ab AS (
        SELECT
            (SELECT source FROM stats ORDER BY source LIMIT 1)
                AS src_a,
            (SELECT source FROM stats
             ORDER BY source DESC LIMIT 1) AS src_b,
            (SELECT n FROM stats ORDER BY source LIMIT 1) AS n1,
            (SELECT s FROM stats ORDER BY source LIMIT 1) AS s1,
            (SELECT ss FROM stats ORDER BY source LIMIT 1) AS ss1,
            (SELECT n FROM stats ORDER BY source DESC LIMIT 1) AS n2,
            (SELECT s FROM stats ORDER BY source DESC LIMIT 1) AS s2,
            (SELECT ss FROM stats ORDER BY source DESC LIMIT 1)
                AS ss2
    ),
    calc AS (
        SELECT src_a, src_b, n1, n2,
               (CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                - CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE))
               / sqrt((CAST(n1 - 1 AS DOUBLE)
                       * (CAST(n1 * ss1 - s1 * s1 AS DOUBLE)
                          / CAST(n1 * (n1 - 1) AS DOUBLE))
                       + CAST(n2 - 1 AS DOUBLE)
                         * (CAST(n2 * ss2 - s2 * s2 AS DOUBLE)
                            / CAST(n2 * (n2 - 1) AS DOUBLE)))
                      / CAST(n1 + n2 - 2 AS DOUBLE)) AS d
        FROM ab
    )
    SELECT src_a, src_b, n1, n2, d AS cohens_d,
           (1.0e0 - 3.0e0 / CAST(4 * (n1 + n2 - 2) - 1 AS DOUBLE))
               * d AS hedges_g
    FROM calc
    """
    return q, sql


def build_wave119_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("doc_systematic_pps",) + _pps_query()))
    add(*(("source_cohens_d",) + _cohens_d_query()))
    return queries, oracles
