"""Wave-181 queries: Bowker symmetry test, Cochran-Armitage trend test.

- events_bowker_symmetry: Bowker's chi-square for SYMMETRY of the
  event-type transition matrix (is i->j as likely as j->i?) — the
  k x k generalization of McNemar. chi2 = sum over unordered pairs
  {i<j} of (n_ij - n_ji)^2 / (n_ij + n_ji); df = #pairs with any
  off-diagonal mass. Counts come from the bounded per-user
  consecutive-pair matrix (ts, event_id order); every term is an
  exact integer ratio, folded in lexical pair order.
- events_cochran_armitage: the Cochran-Armitage test for a linear
  TREND in error proportion across the ordered hour-of-day groups
  (scores k = 0..23). From bounded per-hour partials (n_k, r_k):
  T = sum k*r_k, z = (T - pbar*S1) / sqrt(pbar*(1-pbar)*(S2 -
  S1^2/N)) with S1 = sum k*n_k, S2 = sum k^2*n_k, pbar = R/N —
  all integer sums, three divisions. Equals sqrt(N) * Pearson r
  between score and outcome (the identity the brute test uses).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .queries import _num_read_blocks
from ._scaffold import read_cols

US_PER_HOUR = 3_600_000_000


def bowker_from_counts(counts: dict) -> tuple[float, int, int]:
    """(chi2, df, n_offdiag) from {(from,to): cnt} transition counts.

    Folds terms in lexical (i, j) pair order — mirrored by the SQL
    list_reduce — each term an exact int ratio rounded once.
    """
    pairs = {}
    offdiag = 0
    for (a, b), c in counts.items():
        if a == b:
            continue
        offdiag += int(c)
        i, j = (a, b) if a < b else (b, a)
        nij, nji = pairs.get((i, j), (0, 0))
        if a < b:
            pairs[(i, j)] = (nij + int(c), nji)
        else:
            pairs[(i, j)] = (nij, nji + int(c))
    chi2 = 0.0
    df = 0
    for (i, j) in sorted(pairs):
        nij, nji = pairs[(i, j)]
        tot = nij + nji
        if tot > 0:
            chi2 = chi2 + ((nij - nji) * (nij - nji)) / tot
            df += 1
    return chi2, df, offdiag


# ---------------------------------------------- events_bowker_symmetry
def _bowker_query():
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def prune(t: pa.Table) -> pa.Table:
            return pa.table({
                "user_id": t.column("user_id").cast(pa.int64()),
                "tus": t.column("ts").cast(pa.int64()),
                "eid": t.column("event_id").cast(pa.int64()),
                "et": t.column("event_type").cast(pa.string()),
            })

        def per_user(g: pa.Table) -> pa.Table:
            # eid unique -> total order; (ft, tt) counts via NUL-key sort
            # + run length (exact int counts)
            g = g.sort_by([("tus", "ascending"),
                           ("eid", "ascending")])
            et = np.asarray(g.column("et").to_pylist(), dtype=object)
            if et.size < 2:
                return pa.table(
                    {"ft": pa.array([], type=pa.string()),
                     "tt": pa.array([], type=pa.string()),
                     "cnt": pa.array([], type=pa.int64())}
                )
            key = np.asarray(
                [a + "\x00" + b for a, b in zip(et[:-1], et[1:])],
                dtype=object,
            )
            order = np.argsort(key, kind="stable")
            uk, start = np.unique(key[order], return_index=True)
            cnt = np.diff(np.r_[start, key.size]).astype(np.int64)
            sm = [k.split("\x00", 1) for k in uk]
            return pa.table(
                {"ft": pa.array([x[0] for x in sm],
                                type=pa.string()),
                 "tt": pa.array([x[1] for x in sm],
                                type=pa.string()),
                 "cnt": pa.array(cnt)}
            )

        def merge(t: pa.Table) -> pa.Table:
            import pandas as pd

            df = t.to_pandas()
            g = (df.groupby(["ft", "tt"], sort=True)["cnt"].sum()
                 .reset_index())
            return pa.table({
                "ft": pa.array(g["ft"], type=pa.string()),
                "tt": pa.array(g["tt"], type=pa.string()),
                "cnt": pa.array(g["cnt"].astype("int64")),
            })

        refs = list(
            read_cols(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])
            .map_batches(prune, batch_format="pyarrow")
            .groupby("user_id")
            .map_groups(per_user, batch_format="pyarrow")
            .to_arrow_refs()
        )
        m = tree_reduce_tables(refs, merge).to_pandas()
        counts = {(r["ft"], r["tt"]): int(r["cnt"])
                  for _, r in m.iterrows()}
        chi2, df_, offdiag = bowker_from_counts(counts)
        return pa.table({
            "chi2_bowker": pa.array([chi2], type=pa.float64()),
            "df": pa.array([df_], type=pa.int64()),
            "n_offdiag": pa.array([offdiag], type=pa.int64()),
        })

    sql = """
    WITH o AS (
        SELECT event_type AS ft,
               lead(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS tt
        FROM events
    ),
    t AS (
        SELECT ft, tt, CAST(count(*) AS BIGINT) AS cnt
        FROM o WHERE tt IS NOT NULL GROUP BY 1, 2
    ),
    p AS (
        SELECT CASE WHEN ft < tt THEN ft ELSE tt END AS i,
               CASE WHEN ft < tt THEN tt ELSE ft END AS j,
               CAST(sum(CASE WHEN ft < tt THEN cnt ELSE 0 END)
                    AS BIGINT) AS nij,
               CAST(sum(CASE WHEN ft > tt THEN cnt ELSE 0 END)
                    AS BIGINT) AS nji
        FROM t WHERE ft <> tt GROUP BY 1, 2
    )
    SELECT
        list_reduce(list_prepend(0.0e0,
            list(CAST((nij - nji) * (nij - nji) AS DOUBLE)
                 / CAST(nij + nji AS DOUBLE) ORDER BY i, j)),
            (a, x) -> a + x) AS chi2_bowker,
        CAST(count(*) AS BIGINT) AS df,
        CAST(sum(nij + nji) AS BIGINT) AS n_offdiag
    FROM p
    """
    return q, sql


# -------------------------------------------- events_cochran_armitage
def _cochran_armitage_query():
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            tus = t.column("ts").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            hod = (tus // US_PER_HOUR) % 24
            err = (np.asarray(t.column("event_type").to_pylist())
                   == "error").astype(np.int64)
            n = np.bincount(hod, minlength=24).astype(np.int64)
            r = np.bincount(hod, weights=err.astype(np.float64),
                            minlength=24).astype(np.int64)
            return pa.table({
                "k": pa.array(np.arange(24, dtype=np.int64)),
                "n": pa.array(n), "r": pa.array(r),
            })

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by("k").aggregate(
                [("n", "sum"), ("r", "sum")])
            return pa.table({
                "k": g.column("k").cast(pa.int64()),
                "n": g.column("n_sum").cast(pa.int64()),
                "r": g.column("r_sum").cast(pa.int64()),
            })

        refs = list(
            read_cols(sf_dir, "events", ["ts", "event_type"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        h = tree_reduce_tables(refs, merge).to_pandas()
        h = h.sort_values("k").reset_index(drop=True)
        k = h["k"].to_numpy(np.int64)
        n = h["n"].to_numpy(np.int64)
        r = h["r"].to_numpy(np.int64)
        N = int(n.sum())
        R = int(r.sum())
        T = int((k * r).sum())
        s1 = int((k * n).sum())
        s2 = int((k * k * n).sum())
        pbar = R / N
        num = T - pbar * s1
        inner = s2 - (s1 * s1) / N
        z = num / np.sqrt(pbar * (1.0 - pbar) * inner)
        return pa.table({
            "n_total": pa.array([N], type=pa.int64()),
            "n_errors": pa.array([R], type=pa.int64()),
            "ca_t": pa.array([T], type=pa.int64()),
            "ca_z": pa.array([float(z)], type=pa.float64()),
        })

    sql = f"""
    WITH e AS (
        SELECT (epoch_us(ts) // {US_PER_HOUR}) % 24 AS k,
               CASE WHEN event_type = 'error' THEN 1 ELSE 0 END
                   AS is_err
        FROM events
    ),
    h AS (
        SELECT k, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(is_err) AS BIGINT) AS r
        FROM e GROUP BY k
    ),
    s AS (
        SELECT CAST(sum(n) AS BIGINT) AS nn,
               CAST(sum(r) AS BIGINT) AS rr,
               CAST(sum(k * r) AS BIGINT) AS t,
               CAST(sum(k * n) AS BIGINT) AS s1,
               CAST(sum(k * k * n) AS BIGINT) AS s2
        FROM h
    )
    SELECT nn AS n_total, rr AS n_errors, t AS ca_t,
           (CAST(t AS DOUBLE)
            - (CAST(rr AS DOUBLE) / CAST(nn AS DOUBLE))
              * CAST(s1 AS DOUBLE))
           / sqrt((CAST(rr AS DOUBLE) / CAST(nn AS DOUBLE))
                  * (1.0e0 - CAST(rr AS DOUBLE)
                             / CAST(nn AS DOUBLE))
                  * (CAST(s2 AS DOUBLE)
                     - CAST(s1 * s1 AS DOUBLE)
                       / CAST(nn AS DOUBLE))) AS ca_z
    FROM s
    """
    return q, sql


def build_wave181_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("events_bowker_symmetry",) + _bowker_query()))
    add(*(("events_cochran_armitage",) + _cochran_armitage_query()))
    return queries, oracles
