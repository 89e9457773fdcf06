"""Wave-117 queries: SPRT sequential test and Benjamini-Hochberg FDR.

- events_sprt_error: Wald's sequential probability ratio test on the
  per-event error rate, H0 p=0.10 vs H1 p=0.20, alpha = beta = 0.05,
  evaluated on the dense hourly timeline. The LLR after hour t is
  E_t*ln(p1/p0) + (N_t-E_t)*ln((1-p1)/(1-p0)) — INTEGER cumulative
  counts times two scalar-log constants, so no sequential float fold
  is needed at all (window integer sums are order-free); crossing
  hours and the decision are exact comparisons of identically-built
  floats. The true rate ~0.2 sits at H1, so the test decides fast.
- events_bh_fdr: multiple-testing layer — per-hod binomial z-tests of
  the error rate against the global rate, two-sided p-values via the
  Abramowitz-Stegun 26.2.17 normal-CDF polynomial (|eps| < 7.5e-8;
  DuckDB has no erf — exp/sqrt/pi probed bitwise == libm, and the
  Horner form is spelled identically on both sides), then the
  Benjamini-Hochberg step-up at q = 0.10 with (p, hod) rank
  tie-breaks. Counts come from bounded 24-cell partials.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from .queries import _num_read_blocks
from ._scaffold import read_cols

P0, P1 = 0.10, 0.20
ALPHA = BETA = 0.05
BH_Q = 0.10


def _hod_err_counts(sf_dir: str):
    """per-hour (hour, errs, evts) merged bounded table."""
    import ray.data as rd

    from ..stages.source_rollup import tree_reduce_tables

    def partial(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "hour": pa.array([], type=pa.int64()),
            "errs": pa.array([], type=pa.int64()),
            "evts": pa.array([], type=pa.int64()),
        })
        if "ts" not in t.column_names or t.num_rows == 0:
            return empty
        tus = t.column("ts").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        hour = tus // 3_600_000_000
        et = np.asarray(t.column("event_type").to_pylist())
        is_err = (et == "error").astype(np.int64)
        uk, inv = np.unique(hour, return_inverse=True)
        errs = np.bincount(inv, weights=is_err).astype(np.int64)
        evts = np.bincount(inv).astype(np.int64)
        return pa.table({
            "hour": pa.array(uk, type=pa.int64()),
            "errs": pa.array(errs),
            "evts": pa.array(evts),
        })

    def merge(t: pa.Table) -> pa.Table:
        g = t.group_by("hour").aggregate(
            [("errs", "sum"), ("evts", "sum")])
        return pa.table({
            "hour": g.column("hour").cast(pa.int64()),
            "errs": g.column("errs_sum").cast(pa.int64()),
            "evts": g.column("evts_sum").cast(pa.int64()),
        })

    refs = list(
        read_cols(sf_dir, "events", ["ts", "event_type"])
        .map_batches(partial, batch_format="pyarrow")
        .to_arrow_refs()
    )
    return tree_reduce_tables(refs, merge).to_pandas()


# --------------------------------------------------------- events_sprt_error
def _sprt_query():
    def q(sf_dir: str):
        a = _hod_err_counts(sf_dir).sort_values("hour")
        c1 = math.log(P1 / P0)
        c0 = math.log((1.0 - P1) / (1.0 - P0))
        ln_a = math.log((1.0 - BETA) / ALPHA)
        ln_b = math.log(BETA / (1.0 - ALPHA))
        h0 = int(a["hour"].min())
        ecum = 0
        ncum = 0
        cross_h1 = -1
        cross_h0 = -1
        llr = 0.0
        for _, r in a.iterrows():
            ecum += int(r["errs"])
            ncum += int(r["evts"])
            llr = float(ecum) * c1 + float(ncum - ecum) * c0
            if cross_h1 < 0 and llr >= ln_a:
                cross_h1 = int(r["hour"]) - h0
            if cross_h0 < 0 and llr <= ln_b:
                cross_h0 = int(r["hour"]) - h0
        if cross_h1 >= 0 and (cross_h0 < 0 or cross_h1 <= cross_h0):
            decision = "accept_h1"
            decided = cross_h1
        elif cross_h0 >= 0:
            decision = "accept_h0"
            decided = cross_h0
        else:
            decision = "continue"
            decided = -1
        return pa.table({
            "n_hours": pa.array([len(a)], type=pa.int64()),
            "errs": pa.array([ecum], type=pa.int64()),
            "evts": pa.array([ncum], type=pa.int64()),
            "llr_final": pa.array([llr], type=pa.float64()),
            "decision": pa.array([decision], type=pa.string()),
            "decided_hour": pa.array([decided], type=pa.int64()),
        })

    sql = f"""
    WITH e AS (
        SELECT epoch_us(ts) // 3600000000 AS hour,
               CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS ise
        FROM events
    ),
    h AS (
        SELECT hour, CAST(sum(ise) AS BIGINT) AS errs,
               CAST(count(*) AS BIGINT) AS evts
        FROM e GROUP BY hour
    ),
    c AS (
        SELECT hour - (SELECT min(hour) FROM h) AS t,
               CAST(sum(errs) OVER (ORDER BY hour) AS BIGINT) AS ec,
               CAST(sum(evts) OVER (ORDER BY hour) AS BIGINT) AS nc
        FROM h
    ),
    l AS (
        SELECT t, ec, nc,
               CAST(ec AS DOUBLE) * ln({P1!r} / {P0!r})
               + CAST(nc - ec AS DOUBLE)
                 * ln((1.0e0 - {P1!r}) / (1.0e0 - {P0!r})) AS llr
        FROM c
    ),
    cr AS (
        SELECT
            min(CASE WHEN llr >= ln((1.0e0 - {BETA!r}) / {ALPHA!r})
                     THEN t END) AS cross_h1,
            min(CASE WHEN llr <= ln({BETA!r} / (1.0e0 - {ALPHA!r}))
                     THEN t END) AS cross_h0,
            CAST(count(*) AS BIGINT) AS n_hours,
            max(ec) AS errs, max(nc) AS evts
        FROM l
    ),
    fin AS (
        SELECT llr FROM l ORDER BY t DESC LIMIT 1
    )
    SELECT cr.n_hours,
           cr.errs, cr.evts,
           fin.llr AS llr_final,
           CASE WHEN cr.cross_h1 IS NOT NULL
                     AND (cr.cross_h0 IS NULL
                          OR cr.cross_h1 <= cr.cross_h0)
                THEN 'accept_h1'
                WHEN cr.cross_h0 IS NOT NULL THEN 'accept_h0'
                ELSE 'continue' END AS decision,
           CAST(COALESCE(
               CASE WHEN cr.cross_h1 IS NOT NULL
                         AND (cr.cross_h0 IS NULL
                              OR cr.cross_h1 <= cr.cross_h0)
                    THEN cr.cross_h1
                    WHEN cr.cross_h0 IS NOT NULL THEN cr.cross_h0
               END, -1) AS BIGINT) AS decided_hour
    FROM cr, fin
    """
    return q, sql


# ----------------------------------------------------------- events_bh_fdr
def _phi_upper(ax: float) -> float:
    """1 - Phi(ax) for ax >= 0 via A&S 26.2.17 (identical SQL twin)."""
    k = 1.0 / (1.0 + 0.2316419 * ax)
    poly = k * (0.319381530 + k * (-0.356563782 + k * (
        1.781477937 + k * (-1.821255978 + k * 1.330274429))))
    dens = math.exp(-(ax * ax) / 2.0) / math.sqrt(2.0 * math.pi)
    return dens * poly


def _bh_query():
    def q(sf_dir: str):
        a = _hod_err_counts(sf_dir)
        hod = a["hour"].to_numpy(np.int64) % 24
        e_k = np.zeros(24, dtype=np.int64)
        n_k = np.zeros(24, dtype=np.int64)
        np.add.at(e_k, hod, a["errs"].to_numpy(np.int64))
        np.add.at(n_k, hod, a["evts"].to_numpy(np.int64))
        e_tot = int(e_k.sum())
        n_tot = int(n_k.sum())
        pbar = float(e_tot) / float(n_tot)
        rows = []
        for k in range(24):
            num = float(int(e_k[k])) - float(int(n_k[k])) * pbar
            den = math.sqrt(
                float(int(n_k[k])) * pbar * (1.0 - pbar))
            z = num / den
            ax = abs(z)
            p = 2.0 * _phi_upper(ax)
            rows.append((k, int(e_k[k]), int(n_k[k]), z, p))
        # BH step-up at q = BH_Q, rank ties broken by hod
        order = sorted(range(24), key=lambda i: (rows[i][4], rows[i][0]))
        imax = 0
        for rank, i in enumerate(order, start=1):
            if rows[i][4] <= float(rank) * BH_Q / 24.0:
                imax = rank
        rej = {i: (rank <= imax)
               for rank, i in enumerate(order, start=1)}
        return pa.table({
            "hod": pa.array([r[0] for r in rows], type=pa.int64()),
            "errs": pa.array([r[1] for r in rows], type=pa.int64()),
            "evts": pa.array([r[2] for r in rows], type=pa.int64()),
            "z": pa.array([r[3] for r in rows], type=pa.float64()),
            "p": pa.array([r[4] for r in rows], type=pa.float64()),
            "rejected": pa.array(
                [1 if rej[i] else 0 for i in range(24)],
                type=pa.int64()),
        })

    phi = """
        (exp(-(ax * ax) / 2.0e0) / sqrt(2.0e0 * pi()))
        * ((1.0e0 / (1.0e0 + 0.2316419e0 * ax))
           * (0.319381530e0 + (1.0e0 / (1.0e0 + 0.2316419e0 * ax))
              * (-0.356563782e0 + (1.0e0 / (1.0e0 + 0.2316419e0 * ax))
                 * (1.781477937e0
                    + (1.0e0 / (1.0e0 + 0.2316419e0 * ax))
                      * (-1.821255978e0
                         + (1.0e0 / (1.0e0 + 0.2316419e0 * ax))
                           * 1.330274429e0)))))
    """
    sql = f"""
    WITH e AS (
        SELECT (epoch_us(ts) // 3600000000) % 24 AS hod,
               CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS ise
        FROM events
    ),
    k AS (
        SELECT hod, CAST(sum(ise) AS BIGINT) AS errs,
               CAST(count(*) AS BIGINT) AS evts
        FROM e GROUP BY hod
    ),
    tot AS (
        SELECT CAST(sum(errs) AS DOUBLE)
                   / CAST(sum(evts) AS DOUBLE) AS pbar
        FROM k
    ),
    z AS (
        SELECT hod, errs, evts,
               (CAST(errs AS DOUBLE) - CAST(evts AS DOUBLE) * t.pbar)
               / sqrt(CAST(evts AS DOUBLE) * t.pbar
                      * (1.0e0 - t.pbar)) AS z
        FROM k CROSS JOIN tot t
    ),
    zz AS (
        SELECT hod, errs, evts, z, abs(z) AS ax FROM z
    ),
    p AS (
        SELECT hod, errs, evts, z,
               2.0e0 * ({phi}) AS p
        FROM zz
    ),
    ranked AS (
        SELECT *, CAST(row_number() OVER (ORDER BY p, hod)
                       AS BIGINT) AS rk
        FROM p
    ),
    cut AS (
        SELECT COALESCE(max(CASE WHEN p <= CAST(rk AS DOUBLE)
                                          * {BH_Q!r} / 24.0e0
                                 THEN rk END), 0) AS imax
        FROM ranked
    )
    SELECT r.hod, r.errs, r.evts, r.z, r.p,
           CAST(CASE WHEN r.rk <= c.imax THEN 1 ELSE 0 END
                AS BIGINT) AS rejected
    FROM ranked r CROSS JOIN cut c
    """
    return q, sql


def build_wave117_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("events_sprt_error",) + _sprt_query()))
    add(*(("events_bh_fdr",) + _bh_query()))
    return queries, oracles
