"""Wave-92 queries: cross-modal correlation and ACF half-life.

- embedding_length_corr: Pearson correlation between each doc's
  token count and its embedding's squared norm — the cross-MODAL
  join (documents x embeddings on id) that checks whether the
  embedding magnitude leaks document length. Norms fold dim-ordered
  per vector; the correlation folds over id-ordered (x, y) pairs
  (bounded: one row per doc).
- events_acf_halflife: the first lag (1..48h) where the hourly-count
  autocorrelation drops below 0.5 — the memory-length number behind
  events_hourly_acf24. Each lag's r uses exact integer moment sums
  over the dense grid (the proven acf24 expressions); the arg-first
  selection is over identically-computed floats.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from .queries import _cast, _num_read_blocks
from ._scaffold import read_cols

ACF_MAX_LAG = 48


# ------------------------------------------------------ embedding_length_corr
def _length_corr_query():
    def q(sf_dir: str):
        import pyarrow.parquet as pq

        import ray.data as rd

        from ..extras.ann import _to_matrix
        from ..stages.rollup import _flat_tokens
        from ..stages.source_rollup import tree_reduce_tables

        def len_partial(t: pa.Table) -> pa.Table:
            if "tokens" not in t.column_names or t.num_rows == 0:
                return pa.table({
                    "id": pa.array([], type=pa.int64()),
                    "n_tok": pa.array([], type=pa.int64()),
                })
            _v, lengths = _flat_tokens(t)
            return pa.table({
                "id": pa.array(
                    [int(d)
                     for d in t.column("doc_id").to_pylist()],
                    type=pa.int64()),
                "n_tok": pa.array(
                    np.asarray(lengths, dtype=np.int64)),
            })

        from .queries import corpus_ds
        refs = list(
            corpus_ds(sf_dir)
            .map_batches(len_partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        lens = tree_reduce_tables(
            refs, lambda t: t).to_pandas().drop_duplicates("id")
        lmap = dict(zip(lens["id"].astype(int),
                        lens["n_tok"].astype(int)))

        def norm_partial(t: pa.Table) -> pa.Table:
            if "embedding" not in t.column_names or t.num_rows == 0:
                return pa.table({
                    "id": pa.array([], type=pa.int64()),
                    "nrm": pa.array([], type=pa.float64()),
                })
            x = _to_matrix(t.column("embedding"))
            nrm = np.cumsum(x * x, axis=1)[:, -1]
            return pa.table({
                "id": t.column("vec_id").cast(pa.int64()),
                "nrm": pa.array(nrm, type=pa.float64()),
            })

        refs2 = list(
            read_cols(sf_dir, "embeddings", ["vec_id", "embedding"])
            .map_batches(norm_partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        nrms = tree_reduce_tables(
            refs2, lambda t: t).to_pandas().drop_duplicates("id")
        nrms = nrms.sort_values("id").reset_index(drop=True)
        # two-pass CENTERED folds (id order): the raw-moment Cramer
        # form loses ~4% of a near-zero corr to cancellation here
        # (norms ~ 1 make n*syy - sy^2 catastrophic)
        pairs = [(float(lmap[int(r.id)]), float(r.nrm))
                 for r in nrms.itertuples()
                 if int(r.id) in lmap]
        m = len(pairs)
        n = sx = sy = 0.0
        for x, y in pairs:
            n = n + 1.0
            sx = sx + x
            sy = sy + y
        mx = sx / n
        my = sy / n
        cxy = cxx = cyy = 0.0
        for x, y in pairs:
            cxy = cxy + (x - mx) * (y - my)
            cxx = cxx + (x - mx) * (x - mx)
            cyy = cyy + (y - my) * (y - my)
        den = math.sqrt(cxx * cyy)
        corr = cxy / den if den > 0 else 0.0
        return pa.table({
            "n_pairs": pa.array([m], type=pa.int64()),
            "corr": pa.array([corr], type=pa.float64()),
        })

    sql = """
    WITH norms AS (
        SELECT vec_id AS id,
               list_reduce(list_prepend(0.0e0, list_transform(
                   generate_series(1, len(embedding)),
                   d -> CAST(embedding[d] AS DOUBLE)
                        * CAST(embedding[d] AS DOUBLE))),
                   (a, b) -> a + b) AS nrm
        FROM embeddings
    ),
    lens AS (
        SELECT CAST(doc_id AS BIGINT) AS id,
               CAST(length(string_split(text, '')) AS BIGINT)
                   AS n_tok
        FROM documents
    ),
    pairs AS (
        SELECT l.id, CAST(l.n_tok AS DOUBLE) AS x, n.nrm AS y
        FROM lens l JOIN norms n ON n.id = l.id
    ),
    f1 AS (
        SELECT list_reduce(
            list_prepend([0.0e0, 0.0e0, 0.0e0],
                list([x, y] ORDER BY id)),
            (acc, e) -> [acc[1] + 1.0e0,
                         acc[2] + e[1],
                         acc[3] + e[2]]) AS v
        FROM pairs
    ),
    f2 AS (
        SELECT f1.v[1] AS n,
               list_reduce(
                   list_prepend([0.0e0, 0.0e0, 0.0e0],
                       (SELECT list(
                           [(x - f1.v[2] / f1.v[1])
                            * (y - f1.v[3] / f1.v[1]),
                            (x - f1.v[2] / f1.v[1])
                            * (x - f1.v[2] / f1.v[1]),
                            (y - f1.v[3] / f1.v[1])
                            * (y - f1.v[3] / f1.v[1])]
                           ORDER BY id) FROM pairs)),
                   (acc, e) -> [acc[1] + e[1],
                                acc[2] + e[2],
                                acc[3] + e[3]]) AS c
        FROM f1
    )
    SELECT CAST(n AS BIGINT) AS n_pairs,
           CASE WHEN c[2] * c[3] > 0
                THEN c[1] / sqrt(c[2] * c[3])
                ELSE 0.0e0 END AS corr
    FROM f2
    """
    return q, sql


# --------------------------------------------------------- events_acf_halflife
def _acf_halflife_query(max_lag: int = ACF_MAX_LAG):
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            if "ts" not in t.column_names or t.num_rows == 0:
                return pa.table({
                    "hour": pa.array([], type=pa.int64()),
                    "cnt": pa.array([], type=pa.int64()),
                })
            tus = t.column("ts").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            hour = tus // 3_600_000_000
            uk, cnt = np.unique(hour, return_counts=True)
            return pa.table({
                "hour": pa.array(uk, type=pa.int64()),
                "cnt": pa.array(cnt.astype(np.int64)),
            })

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by("hour").aggregate([("cnt", "sum")])
            return pa.table({
                "hour": g.column("hour").cast(pa.int64()),
                "cnt": g.column("cnt_sum").cast(pa.int64()),
            })

        refs = list(
            read_cols(sf_dir, "events", ["ts"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        a = tree_reduce_tables(refs, merge).to_pandas()
        h0 = int(a["hour"].min())
        span = int(a["hour"].max()) - h0 + 1
        x = np.zeros(span, dtype=np.int64)
        x[a["hour"].to_numpy(np.int64) - h0] = (
            a["cnt"].to_numpy(np.int64))
        n = span
        s = int(x.sum())
        ss = int((x * x).sum())
        m = float(s) / float(n)
        # denominator: full-series centered SS (acf24 convention)
        den = float(ss) - float(n) * m * m
        half = 0
        r_at_half = 0.0
        for k in range(1, max_lag + 1):
            ak = float(int((x[:n - k] * x[k:]).sum()))
            bk = float(int(x[:n - k].sum()))
            ck = float(int(x[k:].sum()))
            num = ak - m * bk - m * ck + float(n - k) * m * m
            r = num / den
            if r < 0.5:
                half = k
                r_at_half = r
                break
        return pa.table({
            "n_hours": pa.array([n], type=pa.int64()),
            "halflife_h": pa.array([half], type=pa.int64()),
            "r_at_halflife": pa.array([r_at_half],
                                      type=pa.float64()),
        })

    mexpr = ("((SELECT CAST(sum(x) AS DOUBLE) FROM dense)"
             " / (SELECT CAST(count(*) AS DOUBLE) FROM dense))")
    sql = f"""
    WITH e AS (
        SELECT epoch_us(ts) // 3600000000 AS hour FROM events
    ),
    bounds AS (SELECT min(hour) AS h0, max(hour) AS h1 FROM e),
    cnts AS (
        SELECT hour, CAST(count(*) AS BIGINT) AS c
        FROM e GROUP BY hour
    ),
    dense AS (
        SELECT gs.hour, CAST(COALESCE(c.c, 0) AS BIGINT) AS x
        FROM (SELECT unnest(generate_series(
                  (SELECT h0 FROM bounds),
                  (SELECT h1 FROM bounds))) AS hour) gs
        LEFT JOIN cnts c ON c.hour = gs.hour
    ),
    den AS (
        SELECT (SELECT CAST(sum(x * x) AS DOUBLE) FROM dense)
               - (SELECT CAST(count(*) AS DOUBLE) FROM dense)
                 * {mexpr} * {mexpr} AS d,
               (SELECT CAST(count(*) AS BIGINT) FROM dense) AS n
    ),
    lags AS (
        SELECT k.k,
               ((SELECT CAST(sum(a.x * b.x) AS DOUBLE)
                 FROM dense a JOIN dense b
                   ON b.hour = a.hour + k.k)
                - {mexpr}
                  * (SELECT CAST(sum(x) AS DOUBLE) FROM dense
                     WHERE hour <= (SELECT max(hour) FROM dense)
                                   - k.k)
                - {mexpr}
                  * (SELECT CAST(sum(x) AS DOUBLE) FROM dense
                     WHERE hour >= (SELECT min(hour) FROM dense)
                                   + k.k)
                + (SELECT CAST(count(*) - k.k AS DOUBLE)
                   FROM dense) * {mexpr} * {mexpr})
               / (SELECT d FROM den) AS r
        FROM (SELECT unnest(generate_series(1, {max_lag}))
                  AS k) k
    ),
    first_half AS (
        SELECT k, r FROM lags WHERE r < 0.5e0
        ORDER BY k LIMIT 1
    )
    SELECT (SELECT n FROM den) AS n_hours,
           CAST(COALESCE((SELECT k FROM first_half), 0)
                AS BIGINT) AS halflife_h,
           COALESCE((SELECT r FROM first_half), 0.0e0)
               AS r_at_halflife
    """
    return q, sql


def build_wave92_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("embedding_length_corr",) + _length_corr_query()))
    add(*(("events_acf_halflife",) + _acf_halflife_query()))
    return queries, oracles
