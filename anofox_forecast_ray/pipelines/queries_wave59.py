"""Wave-59 queries: Kendall tau-b trend, multiplicative Holt-Winters,
and PCA top component via distributed covariance.

- doc_kendall_w8: Kendall tau-b between window index and the w8
  window SUM per doc (rank-robust trend screen; the Spearman twin is
  wave-58). Window index has no ties, so concordant/discordant counts
  reduce to sign comparisons across i<j pairs: C - D, n0 = m(m-1)/2,
  n1 = sum t(t-1)/2 over y-tie groups — ALL integers (window sums are
  int64), vectorized pair expansion (windows per doc are bounded:
  m ~ len/8), one scalar math.sqrt per doc for tau.
- forecast_hw_mul_w8: multiplicative-seasonal Holt-Winters
  (= ETS(A,A,M), kernels/smoothing.py) with fixed smoothing params,
  h=1..4 — completes the SQL-oracled HW family (additive is wave-5).
  The DuckDB oracle replays the exact sequential state fold with a
  LIST accumulator [level, trend, s_0..s_{p-1}] (struct accumulators
  are buggy in DuckDB 1.0 — see NOTES.md).
- embedding_pca_power: top principal component of the embeddings
  table — per-block (n, sum, X'X) partials (D x D with D = dim, tiny
  against block size), tree-reduced, then a fixed 2000-step power
  iteration (the synthetic embeddings have a thin eigengap ~0.987;
  2000 steps give |cos| > 1-1e-10 vs the true eigenvector) on the D x D covariance on the driver. The only floats
  that cross the wire are the D + D^2 partial sums; no embedding row
  ever leaves its block. Golden-checked against a sequential
  math.fsum covariance + the same deterministic iteration
  (tolerance: partial-sum order differs — tools/golden_oracles).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from .queries import SQL_TOK, _cast, _num_read_blocks, corpus_ds

HW_PERIOD = 4
HW_ALPHA = 0.3
HW_BETA = 0.1
HW_GAMMA = 0.1
HW_H = 4
PCA_ITERS = 2000


# -------------------------------------------------------------- doc_kendall_w8
def _kendall_query(width: int = 8):
    def q(sf_dir: str):
        def kendall(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "doc_id": pa.array([], type=pa.string()),
                "m": pa.array([], type=pa.int64()),
                "num": pa.array([], type=pa.int64()),
                "n0": pa.array([], type=pa.int64()),
                "n1": pa.array([], type=pa.int64()),
                "tau": pa.array([], type=pa.float64()),
            })
            if "tokens" not in t.column_names:
                return empty
            toks = t.column("tokens").combine_chunks()
            flat = toks.flatten().to_numpy(
                zero_copy_only=False).astype(np.int64)
            offs = toks.offsets.to_numpy(
                zero_copy_only=False).astype(np.int64)
            offs = offs - offs[0]
            lens = np.diff(offs)
            keep = lens > 0
            if not keep.any():
                return empty
            ids = [d for d, k in zip(
                t.column("doc_id").to_pylist(), keep) if k]
            starts = offs[:-1][keep]
            ends = offs[1:][keep]
            # w8 window sums per doc (int64)
            nw = (ends - starts + width - 1) // width
            tot = int(nw.sum())
            grp = np.repeat(np.arange(len(starts)), nw)
            wid = (np.arange(tot)
                   - np.repeat(np.cumsum(nw) - nw, nw))
            wstart = starts[grp] + wid * width
            ws = np.add.reduceat(flat, wstart)
            # pair expansion per doc over its windows (i < j)
            bounds = np.cumsum(nw) - nw
            sq = nw * nw
            tot2 = int(sq.sum())
            g2 = np.repeat(np.arange(len(nw)), sq)
            within = (np.arange(tot2)
                      - np.repeat(np.cumsum(sq) - sq, sq))
            c = nw[g2]
            ii = within // c
            jj = within % c
            mask = ii < jj
            g2 = g2[mask]
            yi = ws[bounds[g2] + ii[mask]]
            yj = ws[bounds[g2] + jj[mask]]
            sgn = np.sign(yj - yi)
            ndocs = len(nw)
            num = np.bincount(
                g2, weights=sgn, minlength=ndocs).astype(np.int64)
            n0 = nw * (nw - 1) // 2
            # y-tie correction: per (doc, value) group counts
            order = np.lexsort((ws, grp))
            sd, sv = grp[order], ws[order]
            new = np.r_[True, (sd[1:] != sd[:-1])
                        | (sv[1:] != sv[:-1])]
            gstart = np.flatnonzero(new)
            gcnt = np.diff(np.r_[gstart, len(sv)])
            tie = gcnt * (gcnt - 1) // 2
            n1 = np.bincount(
                sd[gstart], weights=tie, minlength=ndocs
            ).astype(np.int64)
            tau = np.zeros(ndocs, dtype=np.float64)
            for i in range(ndocs):
                d = float(n0[i] - n1[i]) * float(n0[i])
                if d > 0:
                    tau[i] = float(num[i]) / math.sqrt(d)
            return pa.table({
                "doc_id": pa.array(ids, type=pa.string()),
                "m": pa.array(nw),
                "num": pa.array(num),
                "n0": pa.array(n0),
                "n1": pa.array(n1),
                "tau": pa.array(tau, type=pa.float64()),
            })

        ds = corpus_ds(sf_dir).map_batches(
            kendall, batch_format="pyarrow")
        return _cast(ds, {
            "doc_id": pa.string(),
            "m": pa.int64(),
            "num": pa.int64(),
            "n0": pa.int64(),
            "n1": pa.int64(),
            "tau": pa.float64(),
        })

    sql = f"""
    WITH tok AS ({SQL_TOK}),
    w AS (
        SELECT doc_id, pos // {width} AS wid,
               CAST(sum(token) AS BIGINT) AS s
        FROM tok GROUP BY doc_id, wid
    ),
    pairs AS (
        SELECT a.doc_id,
               CAST(sum(CASE WHEN b.s > a.s THEN 1
                             WHEN b.s < a.s THEN -1
                             ELSE 0 END) AS BIGINT) AS num
        FROM w a JOIN w b
          ON a.doc_id = b.doc_id AND a.wid < b.wid
        GROUP BY a.doc_id
    ),
    mm AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS m
        FROM w GROUP BY doc_id
    ),
    ties AS (
        SELECT doc_id,
               CAST(sum(c * (c - 1) // 2) AS BIGINT) AS n1
        FROM (SELECT doc_id, s, count(*) AS c
              FROM w GROUP BY doc_id, s)
        GROUP BY doc_id
    )
    SELECT mm.doc_id, mm.m,
           CAST(COALESCE(pairs.num, 0) AS BIGINT) AS num,
           mm.m * (mm.m - 1) // 2 AS n0,
           ties.n1,
           CASE WHEN mm.m * (mm.m - 1) // 2 - ties.n1 = 0
                  OR mm.m < 2 THEN 0.0
                ELSE CAST(COALESCE(pairs.num, 0) AS DOUBLE)
                     / sqrt(CAST(mm.m * (mm.m - 1) // 2 - ties.n1
                                 AS DOUBLE)
                            * CAST(mm.m * (mm.m - 1) // 2
                                   AS DOUBLE))
           END AS tau
    FROM mm
    JOIN ties ON ties.doc_id = mm.doc_id
    LEFT JOIN pairs ON pairs.doc_id = mm.doc_id
    """
    return q, sql


# --------------------------------------------------------- forecast_hw_mul_w8
def _forecast_hw_mul_query(width: int = 8, period: int = HW_PERIOD,
                           alpha: float = HW_ALPHA,
                           beta: float = HW_BETA,
                           gamma: float = HW_GAMMA,
                           horizon: int = HW_H):
    """Multiplicative-seasonal Holt-Winters = ETS(A,A,M) with fixed
    smoothing parameters (kernels/smoothing.py _ets_update, se == "M"):
    target = y/s; level = a*target + (1-a)*(lp + trend);
    trend = b*(level - lp) + (1-b)*trend;
    s_new = g*(y/level) + (1-g)*s; h-step yhat = (level + h*trend) *
    s[(n+h-1) % p]. Init: level = mean(y[:p]), trend =
    mean((y[p:2p]-y[:p])/p), seasonals = y[:p]/level. Docs with
    n < 2p emit NaN rows on BOTH sides. Window means here are
    codepoint averages (>= 32), so the kernel's |s|,|level| > 1e-10
    guards never bind on this corpus and the SQL omits them."""
    from .queries import _forecast_query
    from .queries_wave5 import _series_list_sql

    q = _forecast_query(
        width, "holt_winters",
        {"period": period, "seasonal": "mul", "optimize": False,
         "alpha": alpha, "beta": beta, "gamma": gamma},
        horizon,
    )
    p = period
    a, b, g = f"{alpha}e0", f"{beta}e0", f"{gamma}e0"
    lv = " + ".join(f"ms[{j + 1}]" for j in range(p))
    lv = f"({lv}) / {float(p)}e0"
    tr = " + ".join(f"(ms[{p + j + 1}] - ms[{j + 1}]) / {float(p)}e0"
                    for j in range(p))
    tr = f"({tr}) / {float(p)}e0"
    seas = ", ".join(f"ms[{j + 1}] / lv" for j in range(p))
    sidx = "CAST(e[2] AS INTEGER)"
    lupd = (f"{a} * (e[1] / acc[{sidx} + 3]) "
            f"+ (1.0e0 - {a}) * (acc[1] + acc[2])")
    sql = f"""
    {_series_list_sql(width)},
    init AS (
        SELECT doc_id, ms, n, {lv} AS lv FROM l WHERE n >= {2 * p}
    ),
    state AS (
        SELECT doc_id, n,
            list_reduce(
                list_prepend(
                    [lv, {tr}, {seas}],
                    list_transform(
                        generate_series({p + 1}, CAST(n AS INTEGER)),
                        i -> [ms[i], CAST((i - 1) % {p} AS DOUBLE)])),
                (acc, e) -> list_concat(
                    list_concat(
                        list_concat(
                            [{lupd},
                             {b} * (({lupd}) - acc[1])
                             + (1.0e0 - {b}) * acc[2]],
                            acc[3 : {sidx} + 2]),
                        [{g} * (e[1] / ({lupd}))
                         + (1.0e0 - {g}) * acc[{sidx} + 3]]),
                    acc[{sidx} + 4 : {p + 2}])
            ) AS fin
        FROM init
    )
    SELECT l.doc_id, 'holt_winters' AS model,
           CAST(hh.h AS INTEGER) AS h,
           CASE WHEN state.doc_id IS NULL THEN 'nan'::DOUBLE
                ELSE (fin[1] + CAST(hh.h AS DOUBLE) * fin[2])
                     * fin[CAST((l.n + hh.h - 1) % {p} AS INTEGER) + 3]
           END AS yhat
    FROM l LEFT JOIN state ON state.doc_id = l.doc_id
    CROSS JOIN (SELECT unnest(generate_series(1, {horizon})) AS h) hh
    """
    return q, sql


# ------------------------------------------------------- embedding_pca_power
def _pca_query(iters: int = PCA_ITERS):
    def q(sf_dir: str):
        import ray
        import ray.data as rd

        from ..extras.ann import _to_matrix

        def partial(t: pa.Table) -> pa.Table:
            if "embedding" not in t.column_names or t.num_rows == 0:
                return pa.table({
                    "n": pa.array([], type=pa.int64()),
                    "s": pa.array([], type=pa.list_(pa.float64())),
                    "xtx": pa.array([], type=pa.list_(pa.float64())),
                })
            x = _to_matrix(t.column("embedding"))
            return pa.table({
                "n": pa.array([x.shape[0]], type=pa.int64()),
                "s": pa.array([x.sum(axis=0).tolist()],
                              type=pa.list_(pa.float64())),
                "xtx": pa.array([(x.T @ x).ravel().tolist()],
                                type=pa.list_(pa.float64())),
            })

        refs = list(
            rd.read_parquet(
                f"{sf_dir}/embeddings.parquet",
                columns=["embedding"],
                # FIXED block count (not _num_read_blocks): the per-block
                # x.T@x partials are float sums whose grouping must not
                # depend on the session's CPU count, or the eigenvector
                # bits drift between 8- and 32-CPU runs and break the
                # committed golden-snapshot oracle.
                override_num_blocks=16,
            )
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        # CANONICAL fold order: the streaming executor yields blocks in
        # completion order (preserve_order=False), so the partial list
        # arrives shuffled run-to-run — sort by the serialized partial
        # bytes, then fold sequentially. Bounded: one tiny row per block.
        parts = [t for t in ray.get(refs) if t.num_rows > 0]
        rows = []
        for t in parts:
            for i in range(t.num_rows):
                nn = int(t.column("n")[i].as_py())
                sv = np.asarray(t.column("s")[i].as_py(), dtype=np.float64)
                xv = np.asarray(t.column("xtx")[i].as_py(),
                                dtype=np.float64)
                rows.append((nn, sv.tobytes() + xv.tobytes(), sv, xv))
        rows.sort(key=lambda r: (r[0], r[1]))
        n = sum(r[0] for r in rows)
        s = np.zeros_like(rows[0][2])
        xtx = np.zeros_like(rows[0][3])
        for _, _, sv, xv in rows:
            s = s + sv
            xtx = xtx + xv
        d = s.size
        xtx = xtx.reshape(d, d)
        mean = s / n
        cov = (xtx - n * np.outer(mean, mean)) / (n - 1)
        # deterministic fixed-step power iteration
        v = np.ones(d, dtype=np.float64) / math.sqrt(d)
        for _ in range(iters):
            v = cov @ v
            v = v / np.linalg.norm(v)
        eigval = float(v @ (cov @ v))
        # sign convention: first nonzero component positive
        nz = np.flatnonzero(np.abs(v) > 1e-12)
        if nz.size and v[nz[0]] < 0:
            v = -v
        return pa.table({
            "component": pa.array(
                np.arange(d, dtype=np.int64)),
            "loading": pa.array(v, type=pa.float64()),
            "eigenvalue": pa.array(
                np.full(d, eigval), type=pa.float64()),
            "n": pa.array(np.full(d, n, dtype=np.int64)),
        })

    return q, None  # golden-checked (tools/golden_oracles.check_pca)


def build_wave59_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("doc_kendall_w8",) + _kendall_query()))
    add(*(("forecast_hw_mul_w8",) + _forecast_hw_mul_query()))
    add(*(("embedding_pca_power",) + _pca_query()))
    return queries, oracles
