"""Wave-140 queries: IPW treatment effect, Shapley R2 attribution.

- events_ipw_ate: inverse-propensity-weighted average treatment
  effect of the hash-bit user cohort on the error outcome, with the
  propensity e(hod) = P(treated | hod) estimated from the same
  bounded (hod, cohort, error) cells. The estimator folds hod in
  ascending order (one term per stratum), the naive difference is
  reported next to it, and every input is an exact integer count.
- events_shapley_r2: exact Shapley decomposition of the explained
  variance of the error indicator between the two categorical
  features hod and dow. R2 of a feature set is the between-group
  variance share computed from bounded (hod, dow, error) cells
  (binary outcome => group SSE = n_g p_g (1 - p_g), all one
  division per group), and with two players the Shapley values are
  closed-form half-sums of the four subset R2s. A modern
  feature-attribution primitive with a fully-integer core.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .queries import _num_read_blocks
from ._scaffold import read_cols

US_PER_HOUR = 3_600_000_000
US_PER_DAY = 86_400_000_000
HASH_A = 2654435761


def _cells(sf_dir: str):
    """Bounded (hod, dow, cohort g, err) count cells."""
    import ray.data as rd

    from ..stages.source_rollup import tree_reduce_tables

    def partial(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "hod": pa.array([], type=pa.int64()),
            "dow": pa.array([], type=pa.int64()),
            "g": pa.array([], type=pa.int64()),
            "err": pa.array([], type=pa.int64()),
            "c": pa.array([], type=pa.int64()),
        })
        if "ts" not in t.column_names or t.num_rows == 0:
            return empty
        tus = t.column("ts").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        uid = t.column("user_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        et = np.asarray(t.column("event_type").to_pylist())
        hod = (tus // US_PER_HOUR) % 24
        dow = (tus // US_PER_DAY) % 7
        g = ((uid * np.int64(HASH_A)) % np.int64(1 << 32)) \
            >> np.int64(31)
        err = (et == "error").astype(np.int64)
        key = ((hod * 7 + dow) * 2 + g) * 2 + err
        uk, c = np.unique(key, return_counts=True)
        return pa.table({
            "hod": pa.array(uk // 28),
            "dow": pa.array((uk // 4) % 7),
            "g": pa.array((uk // 2) % 2),
            "err": pa.array(uk % 2),
            "c": pa.array(c.astype(np.int64)),
        })

    def merge(t: pa.Table) -> pa.Table:
        g = t.group_by(["hod", "dow", "g", "err"]).aggregate(
            [("c", "sum")])
        return pa.table({
            "hod": g.column("hod").cast(pa.int64()),
            "dow": g.column("dow").cast(pa.int64()),
            "g": g.column("g").cast(pa.int64()),
            "err": g.column("err").cast(pa.int64()),
            "c": g.column("c_sum").cast(pa.int64()),
        })

    refs = list(
        read_cols(sf_dir, "events", ["ts", "user_id", "event_type"])
        .map_batches(partial, batch_format="pyarrow")
        .to_arrow_refs()
    )
    return tree_reduce_tables(refs, merge).to_pandas()


# ------------------------------------------------------------ events_ipw_ate
def _ipw_query():
    def q(sf_dir: str):
        cells = _cells(sf_dir)
        n = int(cells["c"].sum())
        nf = float(n)

        acc = 0.0
        for hod in sorted(cells["hod"].unique()):
            sub = cells[cells["hod"] == hod]
            n1 = int(sub.loc[sub["g"] == 1, "c"].sum())
            n0 = int(sub.loc[sub["g"] == 0, "c"].sum())
            a = int(sub.loc[(sub["g"] == 1)
                            & (sub["err"] == 1), "c"].sum())
            c0 = int(sub.loc[(sub["g"] == 0)
                             & (sub["err"] == 1), "c"].sum())
            e = float(n1) / float(n1 + n0)
            acc = acc + (float(a) / e
                         - float(c0) / (1.0 - e))
        ate = acc / nf

        nt1 = int(cells.loc[cells["g"] == 1, "c"].sum())
        nt0 = int(cells.loc[cells["g"] == 0, "c"].sum())
        e1 = int(cells.loc[(cells["g"] == 1)
                           & (cells["err"] == 1), "c"].sum())
        e0 = int(cells.loc[(cells["g"] == 0)
                           & (cells["err"] == 1), "c"].sum())
        naive = float(e1) / float(nt1) - float(e0) / float(nt0)
        return pa.table({
            "n_events": pa.array([n], type=pa.int64()),
            "n_treated": pa.array([nt1], type=pa.int64()),
            "ate_ipw": pa.array([ate], type=pa.float64()),
            "ate_naive": pa.array([naive], type=pa.float64()),
        })

    sql = f"""
    WITH e AS (
        SELECT (epoch_us(ts) // {US_PER_HOUR}) % 24 AS hod,
               ((user_id * {HASH_A}) % 4294967296)
                   // 2147483648 AS g,
               CASE WHEN event_type = 'error' THEN 1 ELSE 0 END
                   AS err
        FROM events
    ),
    strata AS (
        SELECT hod,
               CAST(sum(g) AS BIGINT) AS n1,
               CAST(sum(1 - g) AS BIGINT) AS n0,
               CAST(sum(CASE WHEN g = 1 AND err = 1
                        THEN 1 ELSE 0 END) AS BIGINT) AS a,
               CAST(sum(CASE WHEN g = 0 AND err = 1
                        THEN 1 ELSE 0 END) AS BIGINT) AS c0
        FROM e GROUP BY hod
    ),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n,
                  CAST(count(*) AS DOUBLE) AS nf FROM e),
    ipw AS (
        SELECT list_reduce(list_prepend(0.0e0,
                   list(CAST(a AS DOUBLE)
                        / (CAST(n1 AS DOUBLE)
                           / CAST(n1 + n0 AS DOUBLE))
                        - CAST(c0 AS DOUBLE)
                          / (1.0e0 - CAST(n1 AS DOUBLE)
                             / CAST(n1 + n0 AS DOUBLE))
                        ORDER BY hod)),
                   (x, y) -> x + y) AS acc
        FROM strata
    ),
    naive AS (
        SELECT CAST(sum(CASE WHEN g = 1 AND err = 1
                        THEN 1 ELSE 0 END) AS DOUBLE)
                   / CAST(sum(g) AS DOUBLE)
               - CAST(sum(CASE WHEN g = 0 AND err = 1
                          THEN 1 ELSE 0 END) AS DOUBLE)
                   / CAST(sum(1 - g) AS DOUBLE) AS d,
               CAST(sum(g) AS BIGINT) AS nt1
        FROM e
    )
    SELECT nn.n AS n_events,
           naive.nt1 AS n_treated,
           ipw.acc / nn.nf AS ate_ipw,
           naive.d AS ate_naive
    FROM nn CROSS JOIN ipw CROSS JOIN naive
    """
    return q, sql


# -------------------------------------------------------- events_shapley_r2
def _shapley_query():
    def q(sf_dir: str):
        cells = _cells(sf_dir)
        n = int(cells["c"].sum())
        ne = int(cells.loc[cells["err"] == 1, "c"].sum())
        nf = float(n)
        p = float(ne) / nf
        sst = nf * (p * (1.0 - p))

        def r2(keys):
            if not keys:
                return 0.0
            grp = cells.groupby(keys + ["err"])["c"].sum()
            df = grp.reset_index()
            sse = 0.0
            gb = df.groupby(keys, sort=True)
            for _k, sub in gb:
                ng = int(sub["c"].sum())
                eg = int(sub.loc[sub["err"] == 1, "c"].sum())
                pg = float(eg) / float(ng)
                sse = sse + float(ng) * (pg * (1.0 - pg))
            return 1.0 - sse / sst

        r_h = r2(["hod"])
        r_d = r2(["dow"])
        r_hd = r2(["hod", "dow"])
        phi_h = 0.5 * (r_h - 0.0) + 0.5 * (r_hd - r_d)
        phi_d = 0.5 * (r_d - 0.0) + 0.5 * (r_hd - r_h)
        return pa.table({
            "n_events": pa.array([n], type=pa.int64()),
            "r2_hod": pa.array([r_h], type=pa.float64()),
            "r2_dow": pa.array([r_d], type=pa.float64()),
            "r2_both": pa.array([r_hd], type=pa.float64()),
            "shapley_hod": pa.array([phi_h],
                                    type=pa.float64()),
            "shapley_dow": pa.array([phi_d],
                                    type=pa.float64()),
        })

    sql = f"""
    WITH e AS (
        SELECT (epoch_us(ts) // {US_PER_HOUR}) % 24 AS hod,
               (epoch_us(ts) // {US_PER_DAY}) % 7 AS dow,
               CASE WHEN event_type = 'error' THEN 1 ELSE 0 END
                   AS err
        FROM events
    ),
    nn AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(count(*) AS DOUBLE) AS nf,
               CAST(sum(err) AS DOUBLE)
                   / CAST(count(*) AS DOUBLE) AS p
        FROM e
    ),
    sst AS (
        SELECT nf * (p * (1.0e0 - p)) AS sst FROM nn
    ),
    rh AS (
        SELECT 1.0e0 - list_reduce(list_prepend(0.0e0,
                   list(CAST(ng AS DOUBLE)
                        * ((CAST(eg AS DOUBLE)
                            / CAST(ng AS DOUBLE))
                           * (1.0e0 - CAST(eg AS DOUBLE)
                              / CAST(ng AS DOUBLE)))
                        ORDER BY hod)),
                   (x, y) -> x + y) / sst.sst AS r2
        FROM (SELECT hod, CAST(count(*) AS BIGINT) AS ng,
                     CAST(sum(err) AS BIGINT) AS eg
              FROM e GROUP BY hod) CROSS JOIN sst
        GROUP BY sst.sst
    ),
    rd_ AS (
        SELECT 1.0e0 - list_reduce(list_prepend(0.0e0,
                   list(CAST(ng AS DOUBLE)
                        * ((CAST(eg AS DOUBLE)
                            / CAST(ng AS DOUBLE))
                           * (1.0e0 - CAST(eg AS DOUBLE)
                              / CAST(ng AS DOUBLE)))
                        ORDER BY dow)),
                   (x, y) -> x + y) / sst.sst AS r2
        FROM (SELECT dow, CAST(count(*) AS BIGINT) AS ng,
                     CAST(sum(err) AS BIGINT) AS eg
              FROM e GROUP BY dow) CROSS JOIN sst
        GROUP BY sst.sst
    ),
    rhd AS (
        SELECT 1.0e0 - list_reduce(list_prepend(0.0e0,
                   list(CAST(ng AS DOUBLE)
                        * ((CAST(eg AS DOUBLE)
                            / CAST(ng AS DOUBLE))
                           * (1.0e0 - CAST(eg AS DOUBLE)
                              / CAST(ng AS DOUBLE)))
                        ORDER BY hod, dow)),
                   (x, y) -> x + y) / sst.sst AS r2
        FROM (SELECT hod, dow, CAST(count(*) AS BIGINT) AS ng,
                     CAST(sum(err) AS BIGINT) AS eg
              FROM e GROUP BY hod, dow) CROSS JOIN sst
        GROUP BY sst.sst
    )
    SELECT nn.n AS n_events,
           rh.r2 AS r2_hod,
           rd_.r2 AS r2_dow,
           rhd.r2 AS r2_both,
           0.5e0 * (rh.r2 - 0.0e0)
               + 0.5e0 * (rhd.r2 - rd_.r2) AS shapley_hod,
           0.5e0 * (rd_.r2 - 0.0e0)
               + 0.5e0 * (rhd.r2 - rh.r2) AS shapley_dow
    FROM nn CROSS JOIN rh CROSS JOIN rd_ CROSS JOIN rhd
    """
    return q, sql


def build_wave140_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("events_ipw_ate",) + _ipw_query()))
    add(*(("events_shapley_r2",) + _shapley_query()))
    return queries, oracles
