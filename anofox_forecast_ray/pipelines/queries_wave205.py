"""Wave-205 queries: Burrows' Zeta, Erlang C.

- source_burrows_zeta: Burrows' Zeta — the stylometry measure of
  PREFERRED tokens (document-proportion difference), complementing
  the wave-45 Burrows Delta: for each token, zeta = (share of src0
  docs containing it) - (share of src1 docs containing it). Doc
  counts are exact ints from bounded (token, source) presence
  partials, and the top-10 ranking orders by the exact INTEGER key
  c0*n1 - c1*n0 (descending, token ascending) — no float ever
  ranks. Emits token, both doc-fractions and zeta.
- events_erlang_c: the M/M/c Erlang-C delay probability for a
  10-agent queue with 5-minute mean service (mu = 12/h) and the
  observed arrival rate lambda = events/hour: Erlang B by the
  classic recursion B_k = a B_{k-1}/(k + a B_{k-1}) (10-step
  sequential fold), then C = B/(1 - rho(1-B)) and the mean queue
  wait Wq = C/(c mu - lambda).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .queries import _num_read_blocks

ZETA_K = 10
ERL_C = 10
ERL_MU = 12.0e0
US_PER_HOUR = 3_600_000_000


def zeta_top(doc_counts: dict, n0: int, n1: int):
    """doc_counts: {token: (c0, c1)} -> top-K rows by the exact
    integer key c0*n1 - c1*n0 DESC, token ASC."""
    keyed = sorted(
        ((-(c0 * n1 - c1 * n0), t, c0, c1)
         for t, (c0, c1) in doc_counts.items()))
    out = []
    for negk, t, c0, c1 in keyed[:ZETA_K]:
        out.append((t, c0 / n0, c1 / n1,
                    c0 / n0 - c1 / n1))
    return out


def erlang_c(lam: float, mu: float, c: int):
    """(a, C, Wq) via the Erlang-B recursion fold."""
    a = lam / mu
    b = 1.0e0
    for k in range(1, c + 1):
        b = a * b / (k + a * b)
    rho = a / c
    cc = b / (1.0e0 - rho * (1.0e0 - b))
    wq = cc / (c * mu - lam)
    return a, cc, wq


# -------------------------------------------------- source_burrows_zeta
def _zeta_query():
    def q(sf_dir: str):
        from .queries import corpus_ds
        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            toks = t.column("tokens")
            src = np.asarray(t.column("source").to_pylist(),
                             dtype=object)
            rows = {"token": [], "c0": [], "c1": []}
            agg = {}
            for i in range(len(src)):
                if src[i] not in ("src0", "src1"):
                    continue
                is0 = src[i] == "src0"
                for tok in set(toks[i].as_py()):
                    a = agg.setdefault(int(tok), [0, 0])
                    a[0 if is0 else 1] += 1
            for tok in sorted(agg):
                rows["token"].append(tok)
                rows["c0"].append(agg[tok][0])
                rows["c1"].append(agg[tok][1])
            return pa.table({k: pa.array(v, type=pa.int64())
                             for k, v in rows.items()})

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by("token").aggregate(
                [("c0", "sum"), ("c1", "sum")])
            return pa.table({
                "token": g.column("token").cast(pa.int64()),
                "c0": g.column("c0_sum").cast(pa.int64()),
                "c1": g.column("c1_sum").cast(pa.int64()),
            })

        # separate exact doc totals (block-independent)
        def doc_counts(t: pa.Table) -> pa.Table:
            src = np.asarray(t.column("source").to_pylist(),
                             dtype=object)
            return pa.table({
                "n0": pa.array([int((src == "src0").sum())],
                               type=pa.int64()),
                "n1": pa.array([int((src == "src1").sum())],
                               type=pa.int64()),
            })

        ds = corpus_ds(sf_dir)
        refs = list(ds.map_batches(partial,
                                   batch_format="pyarrow")
                    .to_arrow_refs())
        h = tree_reduce_tables(
            refs,
            lambda t: merge(t)).to_pandas()
        refs2 = list(ds.map_batches(doc_counts,
                                    batch_format="pyarrow")
                     .to_arrow_refs())

        def merge2(t: pa.Table) -> pa.Table:
            return pa.table({
                "n0": pa.array(
                    [int(t.column("n0").to_numpy().sum())],
                    type=pa.int64()),
                "n1": pa.array(
                    [int(t.column("n1").to_numpy().sum())],
                    type=pa.int64()),
            })

        tot = tree_reduce_tables(refs2, merge2).to_pandas()
        n0 = int(tot["n0"].iloc[0])
        n1 = int(tot["n1"].iloc[0])
        dc = {int(r["token"]): (int(r["c0"]), int(r["c1"]))
              for _, r in h.iterrows()}
        rows = zeta_top(dc, n0, n1)
        return pa.table({
            "token": pa.array([r[0] for r in rows],
                              type=pa.int64()),
            "frac_a": pa.array([r[1] for r in rows],
                               type=pa.float64()),
            "frac_b": pa.array([r[2] for r in rows],
                               type=pa.float64()),
            "zeta": pa.array([r[3] for r in rows],
                             type=pa.float64()),
        })

    sql = f"""
    WITH tok AS (
        SELECT CAST(doc_id AS VARCHAR) AS doc_id, source,
               unicode(unnest(string_split(text, ''))) AS token
        FROM documents WHERE source IN ('src0', 'src1')
    ),
    pres AS (
        SELECT DISTINCT token, doc_id, source FROM tok
    ),
    nn AS (
        SELECT
            CAST((SELECT count(*) FROM documents
                  WHERE source = 'src0') AS BIGINT) AS n0,
            CAST((SELECT count(*) FROM documents
                  WHERE source = 'src1') AS BIGINT) AS n1
        FROM (SELECT 1)
    ),
    dc AS (
        SELECT token,
               CAST(sum(CASE WHEN source = 'src0'
                             THEN 1 ELSE 0 END) AS BIGINT)
                   AS c0,
               CAST(sum(CASE WHEN source = 'src1'
                             THEN 1 ELSE 0 END) AS BIGINT)
                   AS c1
        FROM pres GROUP BY token
    ),
    ranked AS (
        SELECT token, c0, c1,
               row_number() OVER (ORDER BY
                   c0 * (SELECT n1 FROM nn)
                   - c1 * (SELECT n0 FROM nn) DESC,
                   token ASC) AS rk
        FROM dc
    )
    SELECT CAST(token AS BIGINT) AS token,
           CAST(c0 AS DOUBLE)
               / CAST((SELECT n0 FROM nn) AS DOUBLE) AS frac_a,
           CAST(c1 AS DOUBLE)
               / CAST((SELECT n1 FROM nn) AS DOUBLE) AS frac_b,
           CAST(c0 AS DOUBLE)
               / CAST((SELECT n0 FROM nn) AS DOUBLE)
           - CAST(c1 AS DOUBLE)
               / CAST((SELECT n1 FROM nn) AS DOUBLE) AS zeta
    FROM ranked WHERE rk <= {ZETA_K}
    """
    return q, sql


# ------------------------------------------------------ events_erlang_c
def _erlang_c_query():
    def q(sf_dir: str):
        from .queries_wave137 import _hourly_counts

        cnt = _hourly_counts(sf_dir)
        n = int(cnt.sum())
        hours = int(cnt.size)
        lam = n / hours
        a, cc, wq = erlang_c(lam, ERL_MU, ERL_C)
        return pa.table({
            "offered_a": pa.array([a], type=pa.float64()),
            "erlang_c": pa.array([cc], type=pa.float64()),
            "wq_hours": pa.array([wq], type=pa.float64()),
        })

    # 10-step Erlang-B fold with k carried in the element list
    sql = f"""
    WITH hc AS (
        SELECT epoch_us(ts) // {US_PER_HOUR} AS hour,
               count(*) AS cnt
        FROM events GROUP BY 1
    ),
    l AS (
        SELECT CAST(sum(cnt) AS BIGINT) AS n,
               CAST(max(hour) - min(hour) + 1 AS BIGINT) AS h
        FROM hc
    ),
    par AS (
        SELECT CAST(n AS DOUBLE) / CAST(h AS DOUBLE) AS lam,
               (CAST(n AS DOUBLE) / CAST(h AS DOUBLE))
                   / {ERL_MU!r} AS a
        FROM l
    ),
    fold AS (
        SELECT lam, a,
               list_reduce(
                   list_prepend(1.0e0,
                       list_transform(generate_series(1,
                           {ERL_C}), k -> CAST(k AS DOUBLE))),
                   (b, k) -> a * b / (k + a * b)) AS b
        FROM par
    )
    SELECT a AS offered_a,
           b / (1.0e0 - (a / {ERL_C}.0e0) * (1.0e0 - b))
               AS erlang_c,
           (b / (1.0e0 - (a / {ERL_C}.0e0) * (1.0e0 - b)))
           / ({ERL_C}.0e0 * {ERL_MU!r} - lam) AS wq_hours
    FROM fold
    """
    return q, sql


def build_wave205_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("source_burrows_zeta",) + _zeta_query()))
    add(*(("events_erlang_c",) + _erlang_c_query()))
    return queries, oracles
