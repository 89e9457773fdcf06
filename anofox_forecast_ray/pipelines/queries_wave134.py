"""Wave-134 queries: Filliben PPCC normality, Cronbach's alpha.

- events_ppcc_normality: the probability-plot correlation
  coefficient (Filliben) of the hourly count distribution against
  normal order-statistic medians with Blom plotting positions
  p_i = (i - 0.375)/(n + 0.25). The normal quantile is the same
  A&S 26.2.23 rational approximation the interval layer uses
  (kernels/stats.quantile_normal; ref src/utils/stats.rs:21-50),
  spelled term-for-term in the oracle; the centered correlation
  folds walk i in order. Tied counts permute only equal x values,
  so the row_number tie order cannot change any fold term.
- events_cronbach_alpha: Cronbach's alpha treating the 5 event
  types as items and (user, active-day) pairs as units. All
  variances come from exact integer (sum, sum-of-squares) moments
  over bounded (user, day, type) count cells — zero cells
  contribute only to N — and the item-variance sum folds types in
  ascending order.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from .queries import _num_read_blocks
from ._scaffold import read_cols

US_PER_HOUR = 3_600_000_000
US_PER_DAY = 86_400_000_000


# ---------------------------------------------------- events_ppcc_normality
def _ppcc_query():
    def q(sf_dir: str):
        import ray.data as rd

        from ..kernels.stats import quantile_normal
        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "hour": pa.array([], type=pa.int64()),
                "cnt": pa.array([], type=pa.int64()),
            })
            if "ts" not in t.column_names or t.num_rows == 0:
                return empty
            tus = t.column("ts").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            hour = tus // US_PER_HOUR
            uh, c = np.unique(hour, return_counts=True)
            return pa.table({
                "hour": pa.array(uh.astype(np.int64)),
                "cnt": pa.array(c.astype(np.int64)),
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
        h = tree_reduce_tables(refs, merge).to_pandas()
        hmin, hmax = int(h["hour"].min()), int(h["hour"].max())
        n = hmax - hmin + 1
        cnt = np.zeros(n, dtype=np.int64)
        cnt[h["hour"].to_numpy(np.int64) - hmin] = (
            h["cnt"].to_numpy(np.int64))
        xs = sorted(int(v) for v in cnt)
        nf = float(n)

        sx = sum(xs)
        mx = float(sx) / nf
        ms = [quantile_normal((float(i) - 0.375)
                              / (nf + 0.25))
              for i in range(1, n + 1)]
        sm = 0.0
        for m in ms:
            sm = sm + m
        mm = sm / nf
        sxy = 0.0
        sxx = 0.0
        smm = 0.0
        for i in range(n):
            dx = float(xs[i]) - mx
            dm = ms[i] - mm
            sxy = sxy + dx * dm
            sxx = sxx + dx * dx
            smm = smm + dm * dm
        ppcc = sxy / (math.sqrt(sxx) * math.sqrt(smm))
        return pa.table({
            "n_hours": pa.array([n], type=pa.int64()),
            "ppcc": pa.array([ppcc], type=pa.float64()),
        })

    sql = f"""
    WITH hc AS (
        SELECT epoch_us(ts) // {US_PER_HOUR} AS hour,
               CAST(count(*) AS BIGINT) AS cnt
        FROM events GROUP BY 1
    ),
    grid AS (
        SELECT COALESCE(hc.cnt, 0) AS cnt
        FROM (SELECT unnest(generate_series(
                  (SELECT min(hour) FROM hc),
                  (SELECT max(hour) FROM hc))) AS h) g
        LEFT JOIN hc ON hc.hour = g.h
    ),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n,
                  CAST(count(*) AS DOUBLE) AS nf,
                  CAST(sum(CAST(cnt AS HUGEINT)) AS DOUBLE)
                      / CAST(count(*) AS DOUBLE) AS mx
           FROM grid),
    seq AS (
        SELECT CAST(row_number() OVER (ORDER BY cnt)
                    AS BIGINT) AS i,
               CAST(cnt AS DOUBLE) AS x
        FROM grid
    ),
    zq AS (
        SELECT i, x,
               CASE WHEN p < 0.5e0 THEN -(t - (2.515517e0
                        + 0.802853e0 * t + 0.010328e0 * t * t)
                        / (1.0e0 + 1.432788e0 * t
                           + 0.189269e0 * t * t
                           + 0.001308e0 * t * t * t))
                    ELSE t - (2.515517e0 + 0.802853e0 * t
                        + 0.010328e0 * t * t)
                        / (1.0e0 + 1.432788e0 * t
                           + 0.189269e0 * t * t
                           + 0.001308e0 * t * t * t)
               END AS m
        FROM (
            SELECT i, x, p,
                   sqrt(-2.0e0 * ln(CASE WHEN p < 0.5e0 THEN p
                                    ELSE 1.0e0 - p END)) AS t
            FROM (
                SELECT i, x,
                       (CAST(i AS DOUBLE) - 0.375e0)
                           / (nn.nf + 0.25e0) AS p
                FROM seq CROSS JOIN nn
            )
        )
    ),
    mmf AS (
        SELECT list_reduce(list_prepend(0.0e0,
                   list(m ORDER BY i)), (x, y) -> x + y)
                   / (SELECT nf FROM nn) AS mm
        FROM zq
    ),
    folds AS (
        SELECT
            list_reduce(list_prepend(0.0e0,
                list((zq.x - nn.mx) * (zq.m - mmf.mm)
                     ORDER BY zq.i)), (x, y) -> x + y) AS sxy,
            list_reduce(list_prepend(0.0e0,
                list((zq.x - nn.mx) * (zq.x - nn.mx)
                     ORDER BY zq.i)), (x, y) -> x + y) AS sxx,
            list_reduce(list_prepend(0.0e0,
                list((zq.m - mmf.mm) * (zq.m - mmf.mm)
                     ORDER BY zq.i)), (x, y) -> x + y) AS smm
        FROM zq CROSS JOIN nn CROSS JOIN mmf
        GROUP BY nn.mx, mmf.mm
    )
    SELECT (SELECT n FROM nn) AS n_hours,
           sxy / (sqrt(sxx) * sqrt(smm)) AS ppcc
    FROM folds
    """
    return q, sql


# --------------------------------------------------- events_cronbach_alpha
def _cronbach_query():
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "uid": pa.array([], type=pa.int64()),
                "day": pa.array([], type=pa.int64()),
                "etype": pa.array([], type=pa.string()),
                "c": pa.array([], type=pa.int64()),
            })
            if "ts" not in t.column_names or t.num_rows == 0:
                return empty
            tus = t.column("ts").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            uid = t.column("user_id").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            et = np.asarray(t.column("event_type").to_pylist(),
                            dtype=object)
            day = tus // US_PER_DAY
            import collections
            cnt = collections.Counter(
                zip(uid.tolist(), day.tolist(), et.tolist()))
            keys = sorted(cnt)
            return pa.table({
                "uid": pa.array([k[0] for k in keys],
                                type=pa.int64()),
                "day": pa.array([k[1] for k in keys],
                                type=pa.int64()),
                "etype": pa.array([k[2] for k in keys],
                                  type=pa.string()),
                "c": pa.array([cnt[k] for k in keys],
                              type=pa.int64()),
            })

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by(["uid", "day", "etype"]).aggregate(
                [("c", "sum")])
            return pa.table({
                "uid": g.column("uid").cast(pa.int64()),
                "day": g.column("day").cast(pa.int64()),
                "etype": g.column("etype").cast(pa.string()),
                "c": g.column("c_sum").cast(pa.int64()),
            })

        refs = list(
            read_cols(sf_dir, "events", ["ts", "user_id", "event_type"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        cells = tree_reduce_tables(refs, merge).to_pandas()
        units = cells.groupby(["uid", "day"])["c"].sum()
        n_units = int(len(units))
        nf = float(n_units)
        types = sorted(cells["etype"].unique())
        k = len(types)
        kf = float(k)

        sv = 0.0
        for ty in types:
            sub = cells.loc[cells["etype"] == ty, "c"]
            sx = int(sub.sum())
            sxx = int((sub * sub).sum())
            var_j = (float(sxx)
                     - (float(sx) * float(sx)) / nf) \
                / (nf - 1.0)
            sv = sv + var_j
        st = int(units.sum())
        stt = int((units * units).sum())
        var_t = (float(stt)
                 - (float(st) * float(st)) / nf) / (nf - 1.0)
        alpha = (kf / (kf - 1.0)) * (1.0 - sv / var_t)
        return pa.table({
            "n_units": pa.array([n_units], type=pa.int64()),
            "k_items": pa.array([k], type=pa.int64()),
            "sum_item_var": pa.array([sv], type=pa.float64()),
            "total_var": pa.array([var_t], type=pa.float64()),
            "alpha": pa.array([alpha], type=pa.float64()),
        })

    sql = f"""
    WITH ud AS (
        SELECT user_id AS uid,
               epoch_us(ts) // {US_PER_DAY} AS day,
               event_type AS etype,
               CAST(count(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2, 3
    ),
    nn AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(count(*) AS DOUBLE) AS nf
        FROM (SELECT DISTINCT uid, day FROM ud)
    ),
    items AS (
        SELECT etype,
               CAST(sum(CAST(c AS HUGEINT)) AS HUGEINT) AS sx,
               CAST(sum(CAST(c AS HUGEINT) * c) AS HUGEINT)
                   AS sxx
        FROM ud GROUP BY etype
    ),
    sv AS (
        SELECT list_reduce(list_prepend(0.0e0,
                   list((CAST(sxx AS DOUBLE)
                         - (CAST(sx AS DOUBLE)
                            * CAST(sx AS DOUBLE)) / nn.nf)
                        / (nn.nf - 1.0e0)
                        ORDER BY etype)),
                   (x, y) -> x + y) AS sv,
               CAST(count(*) AS BIGINT) AS k,
               CAST(count(*) AS DOUBLE) AS kf
        FROM items CROSS JOIN nn
        GROUP BY nn.nf
    ),
    tots AS (
        SELECT CAST(sum(CAST(t AS HUGEINT)) AS HUGEINT) AS st,
               CAST(sum(CAST(t AS HUGEINT) * t) AS HUGEINT)
                   AS stt
        FROM (SELECT uid, day, sum(c) AS t FROM ud
              GROUP BY uid, day)
    ),
    vt AS (
        SELECT (CAST(stt AS DOUBLE)
                - (CAST(st AS DOUBLE) * CAST(st AS DOUBLE))
                  / nn.nf) / (nn.nf - 1.0e0) AS var_t
        FROM tots CROSS JOIN nn
    )
    SELECT nn.n AS n_units,
           sv.k AS k_items,
           sv.sv AS sum_item_var,
           vt.var_t AS total_var,
           (sv.kf / (sv.kf - 1.0e0))
               * (1.0e0 - sv.sv / vt.var_t) AS alpha
    FROM nn CROSS JOIN sv CROSS JOIN vt
    """
    return q, sql


def build_wave134_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("events_ppcc_normality",) + _ppcc_query()))
    add(*(("events_cronbach_alpha",) + _cronbach_query()))
    return queries, oracles
