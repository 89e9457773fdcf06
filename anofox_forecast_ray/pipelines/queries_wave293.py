"""Wave-293 query: circular Wasserstein distance on the 24-h ring.

events_circular_emd_hod: the exact circular earth-mover's distance
between the error and purchase hour-of-day distributions — the
classic identity EMD_circ = (1/nm)·Σ_h |D_h − median(D)| where
D_h = m·cum1_h − n·cum2_h is the cross-multiplied cumulative
difference (exact integers) and the median minimizes the rotation
offset.  With doubled medians the numerator Σ|2D_h − med2| stays an
exact integer; one division yields the distance in hours of mass
transport.  The transport-metric companion of events_watson_u2 /
events_bhattacharyya_hod on the same circular data.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ._scaffold import read_cols

US_PER_HOUR = 3_600_000_000


def circular_emd(c1, c2):
    """(n, m, emd_hours) from 24-bin counts."""
    n = sum(c1)
    m = sum(c2)
    d = []
    cum1 = cum2 = 0
    for a, b in zip(c1, c2):
        cum1 += a
        cum2 += b
        d.append(m * cum1 - n * cum2)
    s = sorted(d)
    k = len(s)
    med2 = s[(k - 1) // 2] + s[k // 2]
    num = sum(abs(2 * v - med2) for v in d)
    return n, m, float(num) / (2.0 * float(n) * float(m))


def _emd_query():
    def q(sf_dir: str):
        import ray.data as rd

        from .queries import _num_read_blocks
        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "hod": pa.array([], type=pa.int64()),
                "c1": pa.array([], type=pa.int64()),
                "c2": pa.array([], type=pa.int64()),
            })
            if "ts" not in t.column_names or t.num_rows == 0:
                return empty
            tus = t.column("ts").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            et = np.asarray(t.column("event_type").to_pylist())
            hod = (tus // US_PER_HOUR) % 24
            return pa.table({
                "hod": pa.array(np.arange(24, dtype=np.int64)),
                "c1": pa.array(np.bincount(
                    hod[et == "error"],
                    minlength=24).astype(np.int64)),
                "c2": pa.array(np.bincount(
                    hod[et == "purchase"],
                    minlength=24).astype(np.int64)),
            })

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by("hod").aggregate(
                [("c1", "sum"), ("c2", "sum")])
            return pa.table({
                "hod": g.column("hod").cast(pa.int64()),
                "c1": g.column("c1_sum").cast(pa.int64()),
                "c2": g.column("c2_sum").cast(pa.int64()),
            })

        refs = list(
            read_cols(sf_dir, "events", ["ts", "event_type"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        h = (tree_reduce_tables(refs, merge).to_pandas()
             .sort_values("hod"))
        n, m, emd = circular_emd(
            [int(v) for v in h["c1"]], [int(v) for v in h["c2"]])
        return pa.table({
            "n_errors": pa.array([n], type=pa.int64()),
            "n_purchases": pa.array([m], type=pa.int64()),
            "circular_emd_hours": pa.array([emd],
                                           type=pa.float64()),
        })

    sql = f"""
    WITH ev AS (
        SELECT (epoch_us(ts) // {US_PER_HOUR}) % 24 AS hod,
               CASE WHEN event_type = 'error' THEN 1 ELSE 0 END
                   AS i1,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
                   AS i2
        FROM events
        WHERE event_type IN ('error', 'purchase')
    ),
    grid AS (
        SELECT CAST(unnest(generate_series(0, 23)) AS BIGINT)
                   AS hod
    ),
    h AS (
        SELECT g.hod,
               CAST(coalesce(c.c1, 0) AS BIGINT) AS c1,
               CAST(coalesce(c.c2, 0) AS BIGINT) AS c2
        FROM grid g LEFT JOIN (
            SELECT hod, sum(i1) AS c1, sum(i2) AS c2
            FROM ev GROUP BY hod
        ) c ON g.hod = c.hod
    ),
    nn AS (
        SELECT CAST(sum(c1) AS BIGINT) AS n,
               CAST(sum(c2) AS BIGINT) AS m
        FROM h
    ),
    dd AS (
        SELECT hod,
               (SELECT m FROM nn)
                   * CAST(sum(c1) OVER (ORDER BY hod
                        ROWS UNBOUNDED PRECEDING) AS BIGINT)
               - (SELECT n FROM nn)
                   * CAST(sum(c2) OVER (ORDER BY hod
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS d
        FROM h
    ),
    med AS (
        SELECT
            (SELECT d FROM (SELECT d, row_number()
                 OVER (ORDER BY d) AS r FROM dd)
             WHERE r = (24 - 1) // 2 + 1)
            + (SELECT d FROM (SELECT d, row_number()
                 OVER (ORDER BY d) AS r FROM dd)
               WHERE r = 24 // 2 + 1) AS med2
    )
    SELECT nn.n AS n_errors,
           nn.m AS n_purchases,
           CAST((SELECT CAST(sum(abs(2 * d
                     - (SELECT med2 FROM med))) AS BIGINT)
                 FROM dd) AS DOUBLE)
           / (2.0 * CAST(nn.n AS DOUBLE) * CAST(nn.m AS DOUBLE))
               AS circular_emd_hours
    FROM nn
    """
    return q, sql


def build_wave293_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("events_circular_emd_hod",) + _emd_query()))
    return queries, oracles
