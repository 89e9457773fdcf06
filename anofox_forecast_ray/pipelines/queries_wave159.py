"""Wave-159 queries: k-anonymity audit, DP noisy counts.

- customer_k_anonymity: the data-governance audit — treat
  (nation, acctbal $1k band) as the quasi-identifier over the
  customer table and report k-anonymity (minimum group size), the
  number of singled-out rows (k=1), the share of rows in groups
  smaller than 5, and the minimum l-diversity of the sensitive
  market segment within QI groups. All integers and one division.
- events_dp_noisy_hod: the Laplace mechanism for differentially-
  private hour-of-day counts, made REPLAYABLE by deriving each
  noise draw from a deterministic sha256 uniform (the repo's
  seeded-randomness convention): u = (int(hex[:15]) + 1)/2^60,
  noise = -b * sign(u - 1/2) * ln(1 - 2|u - 1/2|) with b = 1/eps,
  eps = 0.5. Emits per-hod true count, noisy count, and the
  realized max absolute error next to the 1/eps scale.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pyarrow as pa

from .queries import _num_read_blocks
from ._scaffold import read_cols

US_PER_HOUR = 3_600_000_000
U_DEN = float(1 << 60)
DP_EPS = 0.5
KA_BAND = 100000  # $1k in cents


# ---------------------------------------------------- customer_k_anonymity
def _k_anon_query(band: int = KA_BAND):
    def q(sf_dir: str):
        import ray.data as rd

        cust = rd.read_parquet(
            f"{sf_dir}/customer.parquet",
            columns=["c_custkey", "c_nationkey", "c_acctbal",
                     "c_mktsegment"]).to_pandas()
        cents = np.round(cust["c_acctbal"].to_numpy()
                         * 100.0).astype(np.int64)
        # numpy // floors, DuckDB integer // truncates: shift the
        # (possibly negative) cents positive so both agree
        cust["band"] = (cents + 1_000_000_000) // band
        g = cust.groupby(["c_nationkey", "band"])
        sizes = g.size()
        ldiv = g["c_mktsegment"].nunique()
        n = len(cust)
        k_min = int(sizes.min())
        n_unique = int((sizes == 1).sum())
        rows_u5 = int(sizes[sizes < 5].sum())
        return pa.table({
            "n_rows": pa.array([n], type=pa.int64()),
            "n_groups": pa.array([len(sizes)],
                                 type=pa.int64()),
            "k_anonymity": pa.array([k_min],
                                    type=pa.int64()),
            "singled_out": pa.array([n_unique],
                                    type=pa.int64()),
            "pct_under_5": pa.array(
                [float(rows_u5) / float(n)],
                type=pa.float64()),
            "min_l_diversity": pa.array(
                [int(ldiv.min())], type=pa.int64()),
        })

    sql = f"""
    WITH qi AS (
        SELECT c_nationkey AS nat,
               (CAST(round_even(c_acctbal * 100, 0) AS BIGINT)
                   + 1000000000) // {band} AS band,
               c_mktsegment AS seg
        FROM customer
    ),
    grp AS (
        SELECT nat, band,
               CAST(count(*) AS BIGINT) AS sz,
               CAST(count(DISTINCT seg) AS BIGINT) AS l
        FROM qi GROUP BY 1, 2
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM qi)
               AS n_rows,
           CAST(count(*) AS BIGINT) AS n_groups,
           CAST(min(sz) AS BIGINT) AS k_anonymity,
           CAST(sum(CASE WHEN sz = 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS singled_out,
           CAST(sum(CASE WHEN sz < 5 THEN sz ELSE 0 END)
                AS DOUBLE)
               / (SELECT CAST(count(*) AS DOUBLE) FROM qi)
               AS pct_under_5,
           CAST(min(l) AS BIGINT) AS min_l_diversity
    FROM grp
    """
    return q, sql


# ----------------------------------------------------- events_dp_noisy_hod
def _dp_query(eps: float = DP_EPS):
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "hod": pa.array([], type=pa.int64()),
                "c": pa.array([], type=pa.int64()),
            })
            if "ts" not in t.column_names or t.num_rows == 0:
                return empty
            tus = t.column("ts").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            hod = (tus // US_PER_HOUR) % 24
            uh, c = np.unique(hod, return_counts=True)
            return pa.table({
                "hod": pa.array(uh.astype(np.int64)),
                "c": pa.array(c.astype(np.int64)),
            })

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by("hod").aggregate([("c", "sum")])
            return pa.table({
                "hod": g.column("hod").cast(pa.int64()),
                "c": g.column("c_sum").cast(pa.int64()),
            })

        refs = list(
            read_cols(sf_dir, "events", ["ts"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        h = tree_reduce_tables(refs, merge).to_pandas()
        h = h.sort_values("hod").reset_index(drop=True)
        b = 1.0 / eps

        out = {"hod": [], "true_c": [], "noisy": []}
        for _, r in h.iterrows():
            hod = int(r["hod"])
            c = int(r["c"])
            hx = hashlib.sha256(
                str(hod).encode()).hexdigest()[:15]
            u = (float(int(hx, 16)) + 1.0) / U_DEN
            v = u - 0.5
            av = v if v >= 0.0 else -v
            noise = -b * (1.0 if v >= 0.0 else -1.0) \
                * math.log(1.0 - 2.0 * av)
            out["hod"].append(hod)
            out["true_c"].append(c)
            out["noisy"].append(float(c) + noise)
        return pa.table({
            "hod": pa.array(out["hod"], type=pa.int64()),
            "true_c": pa.array(out["true_c"],
                               type=pa.int64()),
            "noisy": pa.array(out["noisy"],
                              type=pa.float64()),
        })

    sql = f"""
    WITH hc AS (
        SELECT (epoch_us(ts) // {US_PER_HOUR}) % 24 AS hod,
               CAST(count(*) AS BIGINT) AS c
        FROM events GROUP BY 1
    ),
    u AS (
        SELECT hod, c,
               (CAST(concat('0x',
                    substr(sha256(CAST(hod AS VARCHAR)),
                           1, 15)) AS BIGINT) + 1.0e0)
                   / {U_DEN!r} AS uu
        FROM hc
    )
    SELECT hod,
           c AS true_c,
           CAST(c AS DOUBLE)
           + (-(1.0e0 / {eps!r}))
             * (CASE WHEN uu - 0.5e0 >= 0.0e0
                     THEN 1.0e0 ELSE -1.0e0 END)
             * ln(1.0e0 - 2.0e0
                  * abs(uu - 0.5e0)) AS noisy
    FROM u
    ORDER BY hod
    """
    return q, sql


def build_wave159_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("customer_k_anonymity",) + _k_anon_query()))
    add(*(("events_dp_noisy_hod",) + _dp_query()))
    return queries, oracles
