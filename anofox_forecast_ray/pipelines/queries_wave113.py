"""Wave-113 queries: Lomb-Scargle on irregular samples, Hodges-Lehmann.

- events_lomb_scargle: classical Lomb-Scargle periodogram at candidate
  periods 12 h / 24 h / 168 h over the IRREGULARLY-sampled hourly
  mean-value series (only hours with >= 1 event exist — the canonical
  uneven-sampling spectral problem that plain DFT queries like
  events_daily_cycle_power cannot handle). Bounded hourly
  (sum_cents, cnt) partials move; the driver folds the trig sums in
  hour order with SCALAR math.cos/sin/atan2, all verified bitwise ==
  DuckDB's cos/sin/atan2/pi (same libm — probed in this wave). Every
  sum the oracle replays is a t-ordered left fold; tau is the proper
  LS time offset atan2(sum sin 2wt, sum cos 2wt) / 2w.
- doc_hodges_lehmann_w8: Hodges-Lehmann pseudo-median of each doc's
  w8 window sums (first 32 complete windows — capped so the oracle's
  per-doc pair join stays bounded): median over Walsh-average
  numerators (s_i + s_j, i <= j), an exact integer selection; the
  final /16 and the even-count midpoint interpolation are exact
  binary ops. Reported next to the plain window-sum median — the
  robustness comparison the estimator exists for.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from .queries import SQL_TOK, _cast, _num_read_blocks, corpus_ds
from ._scaffold import read_cols

LS_PERIODS = (12, 24, 168)
HL_MAX_WINDOWS = 32


# ------------------------------------------------------ events_lomb_scargle
def _lomb_scargle_query():
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "hour": pa.array([], type=pa.int64()),
                "s": pa.array([], type=pa.int64()),
                "c": pa.array([], type=pa.int64()),
            })
            if "ts" not in t.column_names or t.num_rows == 0:
                return empty
            tus = t.column("ts").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            hour = tus // 3_600_000_000
            cents = np.round(
                t.column("value").to_numpy(zero_copy_only=False)
                * 100.0).astype(np.int64)
            uk, inv = np.unique(hour, return_inverse=True)
            s = np.bincount(inv, weights=cents).astype(np.int64)
            c = np.bincount(inv).astype(np.int64)
            return pa.table({
                "hour": pa.array(uk, type=pa.int64()),
                "s": pa.array(s),
                "c": pa.array(c),
            })

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by("hour").aggregate(
                [("s", "sum"), ("c", "sum")])
            return pa.table({
                "hour": g.column("hour").cast(pa.int64()),
                "s": g.column("s_sum").cast(pa.int64()),
                "c": g.column("c_sum").cast(pa.int64()),
            })

        refs = list(
            read_cols(sf_dir, "events", ["ts", "value"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        a = tree_reduce_tables(refs, merge).to_pandas()
        a = a.sort_values("hour").reset_index(drop=True)
        h0 = int(a["hour"].min())
        ts_ = (a["hour"].to_numpy(np.int64) - h0)
        ys = [float(int(s)) / float(int(c))
              for s, c in zip(a["s"], a["c"])]
        n = len(ys)
        sy = 0.0
        for v in ys:  # t-ordered fold
            sy = sy + v
        ybar = sy / float(n)
        out_p, out_tau, out_pow = [], [], []
        for T in LS_PERIODS:
            w = 2.0 * math.pi / float(T)
            c2 = 0.0
            s2 = 0.0
            for t_i in ts_:
                c2 = c2 + math.cos(2.0 * w * float(t_i))
                s2 = s2 + math.sin(2.0 * w * float(t_i))
            tau = math.atan2(s2, c2) / (2.0 * w)
            sc = ss = cc = ssq = 0.0
            for t_i, y in zip(ts_, ys):
                dy = y - ybar
                arg = w * (float(t_i) - tau)
                ca = math.cos(arg)
                sa = math.sin(arg)
                sc = sc + dy * ca
                ss = ss + dy * sa
                cc = cc + ca * ca
                ssq = ssq + sa * sa
            out_p.append(int(T))
            out_tau.append(tau)
            out_pow.append(0.5 * (sc * sc / cc + ss * ss / ssq))
        return pa.table({
            "period": pa.array(out_p, type=pa.int64()),
            "n": pa.array([n] * 3, type=pa.int64()),
            "tau": pa.array(out_tau, type=pa.float64()),
            "power": pa.array(out_pow, type=pa.float64()),
        })

    def block(T: int) -> str:
        w = f"(2.0e0 * pi() / {float(T)!r})"
        return f"""
        SELECT CAST({T} AS BIGINT) AS period,
               (SELECT n FROM st) AS n,
               tau,
               0.5e0 * (sc * sc / cc + ss * ss / ssq) AS power
        FROM (
            SELECT t4.tau,
                   list_reduce(list_prepend(0.0e0, list(
                       (y.y - (SELECT sy FROM st)
                              / CAST((SELECT n FROM st) AS DOUBLE))
                       * cos({w} * (CAST(y.t AS DOUBLE) - t4.tau))
                       ORDER BY y.t)), (a, b) -> a + b) AS sc,
                   list_reduce(list_prepend(0.0e0, list(
                       (y.y - (SELECT sy FROM st)
                              / CAST((SELECT n FROM st) AS DOUBLE))
                       * sin({w} * (CAST(y.t AS DOUBLE) - t4.tau))
                       ORDER BY y.t)), (a, b) -> a + b) AS ss,
                   list_reduce(list_prepend(0.0e0, list(
                       cos({w} * (CAST(y.t AS DOUBLE) - t4.tau))
                       * cos({w} * (CAST(y.t AS DOUBLE) - t4.tau))
                       ORDER BY y.t)), (a, b) -> a + b) AS cc,
                   list_reduce(list_prepend(0.0e0, list(
                       sin({w} * (CAST(y.t AS DOUBLE) - t4.tau))
                       * sin({w} * (CAST(y.t AS DOUBLE) - t4.tau))
                       ORDER BY y.t)), (a, b) -> a + b) AS ssq
            FROM y CROSS JOIN (
                SELECT atan2(
                           list_reduce(list_prepend(0.0e0, list(
                               sin(2.0e0 * {w} * CAST(t AS DOUBLE))
                               ORDER BY t)), (a, b) -> a + b),
                           list_reduce(list_prepend(0.0e0, list(
                               cos(2.0e0 * {w} * CAST(t AS DOUBLE))
                               ORDER BY t)), (a, b) -> a + b))
                       / (2.0e0 * {w}) AS tau
                FROM y) t4
            GROUP BY t4.tau
        )
        """

    blocks = "\nUNION ALL\n".join(block(T) for T in LS_PERIODS)
    sql = f"""
    WITH e AS (
        SELECT epoch_us(ts) // 3600000000 AS hour,
               CAST(round(value * 100.0e0) AS BIGINT) AS cents
        FROM events
    ),
    b AS (SELECT min(hour) AS h0 FROM e),
    y AS (
        SELECT hour - (SELECT h0 FROM b) AS t,
               CAST(sum(cents) AS DOUBLE)
                   / CAST(count(*) AS DOUBLE) AS y
        FROM e GROUP BY hour
    ),
    st AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               list_reduce(list_prepend(0.0e0,
                   list(y ORDER BY t)), (a, b) -> a + b) AS sy
        FROM y
    )
    {blocks}
    ORDER BY period
    """
    return q, sql


# --------------------------------------------------- doc_hodges_lehmann_w8
def _hodges_lehmann_query(width: int = 8):
    def q(sf_dir: str):
        from ..stages.rollup import _flat_tokens

        def hl(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "doc_id": pa.array([], type=pa.string()),
                "m": pa.array([], type=pa.int64()),
                "hl": pa.array([], type=pa.float64()),
                "med": pa.array([], type=pa.float64()),
            })
            if "tokens" not in t.column_names or t.num_rows == 0:
                return empty
            values, lengths = _flat_tokens(t)
            ids = t.column("doc_id").to_pylist()
            out_i, out_m, out_hl, out_md = [], [], [], []
            off = 0
            for i, ln_ in enumerate(lengths):
                seg = values[off: off + int(ln_)].astype(np.int64)
                off += int(ln_)
                m = min(int(ln_) // width, HL_MAX_WINDOWS)
                if m < 1:
                    continue
                sums = seg[: m * width].reshape(m, width).sum(axis=1)
                walsh = (sums[:, None] + sums[None, :])
                iu = np.triu_indices(m)
                numer = walsh[iu]
                out_i.append(ids[i])
                out_m.append(m)
                out_hl.append(float(np.median(numer))
                              / (2.0 * float(width)))
                out_md.append(float(np.median(sums))
                              / float(width))
            return pa.table({
                "doc_id": pa.array(out_i, type=pa.string()),
                "m": pa.array(out_m, type=pa.int64()),
                "hl": pa.array(out_hl, type=pa.float64()),
                "med": pa.array(out_md, type=pa.float64()),
            })

        ds = corpus_ds(sf_dir).map_batches(hl, batch_format="pyarrow")
        return _cast(ds, {
            "doc_id": pa.string(),
            "m": pa.int64(),
            "hl": pa.float64(),
            "med": pa.float64(),
        })

    sql = f"""
    WITH tok AS ({SQL_TOK}),
    win AS (
        SELECT doc_id, pos // {8} AS wid,
               CAST(sum(token) AS BIGINT) AS s,
               CAST(count(*) AS BIGINT) AS cnt
        FROM tok WHERE pos // {8} < {HL_MAX_WINDOWS}
        GROUP BY doc_id, pos // {8}
        HAVING count(*) = {8}
    ),
    walsh AS (
        SELECT a.doc_id, a.s + b.s AS numer
        FROM win a JOIN win b
          ON b.doc_id = a.doc_id AND b.wid >= a.wid
    ),
    hl AS (
        SELECT doc_id,
               CAST(median(numer) AS DOUBLE) / (2.0e0 * 8.0e0) AS hl
        FROM walsh GROUP BY doc_id
    ),
    md AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS m,
               CAST(median(s) AS DOUBLE) / 8.0e0 AS med
        FROM win GROUP BY doc_id
    )
    SELECT md.doc_id, md.m, hl.hl, md.med
    FROM md JOIN hl ON hl.doc_id = md.doc_id
    """
    return q, sql


def build_wave113_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("events_lomb_scargle",) + _lomb_scargle_query()))
    add(*(("doc_hodges_lehmann_w8",) + _hodges_lehmann_query()))
    return queries, oracles
