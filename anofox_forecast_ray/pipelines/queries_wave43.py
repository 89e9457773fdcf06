"""Wave-43 queries: Mann-Whitney U, z-order layout keys, and vocabulary
concentration.

- events_mannwhitney_u: the nonparametric A/B test — Mann-Whitney U
  between purchase values of the user-parity cohorts, computed EXACTLY
  from the (cents, cohort) count table with midranks in DOUBLED units
  (ties become integers, no float ever enters): for value v,
  doubled-midrank = 2*cum_before + c_v + 1; W2 = sum over A of
  cA_v * that; U2 = W2 - nA*(nA+1).
- events_zorder_buckets: Morton/z-order interleaved key of
  (user_id, hour-of-epoch mod 2^16) — the data-layout op a scan-pruning
  file organizer runs before writing. Bit interleave is exact integer
  arithmetic on both sides; output is per coarse z-bucket count and
  key range.
- corpus_token_gini: Gini coefficient of the GLOBAL token frequency
  distribution (how concentrated is the vocabulary) — the sorted-
  position sum collapses per frequency bucket exactly like
  source_gini, but over (token, count) rather than doc lengths.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .queries import SQL_TOK, _num_read_blocks, corpus_ds
from ._scaffold import read_cols

Z_BITS = 16


# ---------------------------------------------------- events_mannwhitney_u
def _mwu_query():
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            empty = pa.table(
                {"cents": pa.array([], type=pa.int64()),
                 "ca": pa.array([], type=pa.int64()),
                 "cb": pa.array([], type=pa.int64())}
            )
            if "user_id" not in t.column_names:
                return empty
            et = np.asarray(t.column("event_type").to_pylist())
            keep = et == "purchase"
            if not keep.any():
                return empty
            sub = pa.table(
                {"user_id": t.column("user_id").cast(pa.int64()),
                 "value": t.column("value")}
            ).filter(pa.array(keep))
            u = sub.column("user_id").to_numpy(zero_copy_only=False)
            cents = np.round(
                sub.column("value").to_numpy(zero_copy_only=False)
                * 100.0
            ).astype(np.int64)
            a = u % 2 == 0
            va, ca = np.unique(cents[a], return_counts=True)
            vb, cb = np.unique(cents[~a], return_counts=True)
            allv = np.union1d(va, vb)
            caa = np.zeros(allv.size, dtype=np.int64)
            cbb = np.zeros(allv.size, dtype=np.int64)
            caa[np.searchsorted(allv, va)] = ca
            cbb[np.searchsorted(allv, vb)] = cb
            return pa.table(
                {"cents": pa.array(allv),
                 "ca": pa.array(caa), "cb": pa.array(cbb)}
            )

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by("cents").aggregate(
                [("ca", "sum"), ("cb", "sum")]
            )
            return pa.table(
                {"cents": g.column("cents"),
                 "ca": g.column("ca_sum").cast(pa.int64()),
                 "cb": g.column("cb_sum").cast(pa.int64())}
            )

        refs = list(
            read_cols(sf_dir, "events", ["user_id", "event_type", "value"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        a = tree_reduce_tables(refs, merge).to_pandas().sort_values(
            "cents"
        )
        ca = a["ca"].to_numpy(np.int64)
        cb = a["cb"].to_numpy(np.int64)
        tot = ca + cb
        cum_before = np.concatenate(([0], np.cumsum(tot)[:-1]))
        midrank2 = 2 * cum_before + tot + 1  # doubled midranks
        na = int(ca.sum())
        nb = int(cb.sum())
        w2 = int((ca * midrank2).sum())
        u2 = w2 - na * (na + 1)
        return pa.table(
            {"n_a": pa.array([na], type=pa.int64()),
             "n_b": pa.array([nb], type=pa.int64()),
             "w2": pa.array([w2], type=pa.int64()),
             "u2": pa.array([u2], type=pa.int64())}
        )

    sql = """
    WITH p AS (
        SELECT CAST(user_id % 2 AS BIGINT) AS cohort,
               CAST(round_even(value * 100, 0) AS BIGINT) AS cents
        FROM events WHERE event_type = 'purchase'
    ),
    c AS (
        SELECT cents,
               CAST(sum(CASE WHEN cohort = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS ca,
               CAST(sum(CASE WHEN cohort = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS cb
        FROM p GROUP BY cents
    ),
    r AS (
        SELECT cents, ca, cb,
               CAST(2 * COALESCE(sum(ca + cb) OVER (
                   ORDER BY cents ROWS BETWEEN UNBOUNDED PRECEDING
                   AND 1 PRECEDING), 0) + (ca + cb) + 1
                   AS BIGINT) AS midrank2
        FROM c
    )
    SELECT CAST(sum(ca) AS BIGINT) AS n_a,
           CAST(sum(cb) AS BIGINT) AS n_b,
           CAST(sum(ca * midrank2) AS BIGINT) AS w2,
           CAST(sum(ca * midrank2)
                - sum(ca) * (sum(ca) + 1) AS BIGINT) AS u2
    FROM r
    """
    return q, sql


# ---------------------------------------------------- events_zorder_buckets
def _zorder_query(bits: int = Z_BITS):
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            if "user_id" not in t.column_names:
                return pa.table(
                    {"zbucket": pa.array([], type=pa.int64()),
                     "cnt": pa.array([], type=pa.int64()),
                     "zmin": pa.array([], type=pa.int64()),
                     "zmax": pa.array([], type=pa.int64())}
                )
            u = (t.column("user_id").cast(pa.int64()).to_numpy(
                zero_copy_only=False) & ((1 << bits) - 1))
            h = ((t.column("ts").cast(pa.int64()).to_numpy(
                zero_copy_only=False) // 1_000_000 // 3600)
                & ((1 << bits) - 1))
            z = np.zeros(u.size, dtype=np.int64)
            for i in range(bits):
                z |= ((u >> i) & 1) << (2 * i)
                z |= ((h >> i) & 1) << (2 * i + 1)
            g = pa.table(
                {"zbucket": pa.array(z >> 14), "z": pa.array(z)}
            ).group_by("zbucket").aggregate(
                [("z", "count"), ("z", "min"), ("z", "max")]
            )
            return pa.table(
                {"zbucket": g.column("zbucket"),
                 "cnt": g.column("z_count").cast(pa.int64()),
                 "zmin": g.column("z_min").cast(pa.int64()),
                 "zmax": g.column("z_max").cast(pa.int64())}
            )

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by("zbucket").aggregate(
                [("cnt", "sum"), ("zmin", "min"), ("zmax", "max")]
            )
            return pa.table(
                {"zbucket": g.column("zbucket"),
                 "cnt": g.column("cnt_sum").cast(pa.int64()),
                 "zmin": g.column("zmin_min").cast(pa.int64()),
                 "zmax": g.column("zmax_max").cast(pa.int64())}
            )

        refs = list(
            read_cols(sf_dir, "events", ["user_id", "ts"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        out = tree_reduce_tables(refs, merge)
        return pa.table(
            {"zbucket": out.column("zbucket").cast(pa.int64()),
             "cnt": out.column("cnt").cast(pa.int64()),
             "zmin": out.column("zmin").cast(pa.int64()),
             "zmax": out.column("zmax").cast(pa.int64())}
        )

    u_terms = " + ".join(
        f"(((user_id & {(1 << bits) - 1}) >> {i}) & 1) * {1 << (2 * i)}"
        for i in range(bits)
    )
    h_terms = " + ".join(
        f"((((epoch_us(ts) // 1000000 // 3600) & {(1 << bits) - 1})"
        f" >> {i}) & 1) * {1 << (2 * i + 1)}"
        for i in range(bits)
    )
    sql = f"""
    WITH z AS (
        SELECT CAST(({u_terms}) + ({h_terms}) AS BIGINT) AS zkey
        FROM events
    )
    SELECT CAST(zkey >> 14 AS BIGINT) AS zbucket,
           CAST(count(*) AS BIGINT) AS cnt,
           CAST(min(zkey) AS BIGINT) AS zmin,
           CAST(max(zkey) AS BIGINT) AS zmax
    FROM z GROUP BY 1
    """
    return q, sql


# ------------------------------------------------------- corpus_token_gini
def _token_gini_query():
    def q(sf_dir: str):
        from ..stages.rollup import _flat_tokens
        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            empty = pa.table(
                {"token": pa.array([], type=pa.int64()),
                 "cnt": pa.array([], type=pa.int64())}
            )
            if "tokens" not in t.column_names:
                return empty
            values, _ = _flat_tokens(t)
            if values.size == 0:
                return empty
            uv, uc = np.unique(values.astype(np.int64),
                               return_counts=True)
            return pa.table(
                {"token": pa.array(uv),
                 "cnt": pa.array(uc.astype(np.int64))}
            )

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by("token").aggregate([("cnt", "sum")])
            return pa.table(
                {"token": g.column("token"),
                 "cnt": g.column("cnt_sum").cast(pa.int64())}
            )

        refs = list(
            corpus_ds(sf_dir)
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        a = tree_reduce_tables(refs, merge).to_pandas()
        # Gini over the token-frequency values (one observation per
        # token type), sorted ascending with token id as tiebreak
        a = a.sort_values(["cnt", "token"])
        x = a["cnt"].to_numpy(np.int64)
        n = int(x.size)
        total = int(x.sum())
        i = np.arange(1, n + 1, dtype=np.int64)
        s = int(((2 * i - n - 1) * x).sum())
        return pa.table(
            {"n_types": pa.array([n], type=pa.int64()),
             "n_tokens": pa.array([total], type=pa.int64()),
             "s_num": pa.array([s], type=pa.int64()),
             "gini": pa.array(
                 [float(np.float64(s) / np.float64(n * total))],
                 type=pa.float64())}
        )

    sql = f"""
    WITH tok AS ({SQL_TOK}),
    c AS (
        SELECT token, CAST(count(*) AS BIGINT) AS cnt FROM tok
        GROUP BY token
    ),
    r AS (
        SELECT cnt,
               row_number() OVER (ORDER BY cnt, token) AS rn,
               count(*) OVER () AS n
        FROM c
    )
    SELECT CAST(max(n) AS BIGINT) AS n_types,
           CAST(sum(cnt) AS BIGINT) AS n_tokens,
           CAST(sum((2 * rn - n - 1) * cnt) AS BIGINT) AS s_num,
           CAST(sum((2 * rn - n - 1) * cnt) AS DOUBLE)
               / CAST(max(n) * sum(cnt) AS BIGINT) AS gini
    FROM r
    """
    return q, sql


def build_wave43_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("events_mannwhitney_u",) + _mwu_query()))
    add(*(("events_zorder_buckets",) + _zorder_query(Z_BITS)))
    add(*(("corpus_token_gini",) + _token_gini_query()))
    return queries, oracles
