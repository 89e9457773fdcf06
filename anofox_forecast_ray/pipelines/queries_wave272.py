"""Wave-272 queries: sBG churn projection and per-dim embedding AUC.

events_sbg_churn: the Fader-Hardie shifted-beta-geometric churn
model fit by the closed-form method of moments on consecutive-DAY
presence counts — cohort = users active on day 0, s_t = users active
on EVERY day 0..t (exact integer bitmask counts; the weekly grain is
degenerate here: every user is active every week).  Retention ratios
r1 = s1/s0, r2 = s2/s1 give α = (1−r1)(1−r2)/(r2−r1),
β = r1(1−r2)/(r2−r1); on this corpus r2 < r1 (survivor retention
FALLS), so the MoM parameters come out negative — the standard sBG
diagnostic for positive duration dependence (increasing hazard) —
and the ŝ3 projection extrapolates the ratio trend regardless.

embedding_dim_auc: the ROC AUC of each of the first four embedding
dimensions separating label 0 from label 1 — the Mann-Whitney
identity AUC = (R2₁ − n1(n1+1)) / (2·n0·n1) with doubled midranks
over the exact per-value histogram (doubled midranks stay integers
even on float values), one division per dimension.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

US_PER_DAY = 86_400_000_000


def sbg_fit(s0, s1, s2, s3):
    """(alpha, beta, pred_s3, err) closed-form MoM."""
    r1 = float(s1) / float(s0)
    r2 = float(s2) / float(s1)
    beta = r1 * (1.0 - r2) / (r2 - r1)
    alpha = (1.0 - r1) * (1.0 - r2) / (r2 - r1)
    pred = float(s2) * ((beta + 2.0) / (alpha + beta + 2.0))
    return alpha, beta, pred, pred - float(s3)


def auc_from_hist(pairs):
    """AUC from id-ordered (value, label) with labels 0/1."""
    from collections import Counter

    c0 = Counter()
    c1 = Counter()
    for v, l in pairs:
        if l == 0:
            c0[v] += 1
        else:
            c1[v] += 1
    n0 = sum(c0.values())
    n1 = sum(c1.values())
    cum = 0
    r2_1 = 0
    for v in sorted(set(c0) | set(c1)):
        cv = c0[v] + c1[v]
        m2 = 2 * cum + cv + 1
        r2_1 += c1[v] * m2
        cum += cv
    return (n0, n1,
            float(r2_1 - n1 * (n1 + 1)) / float(2 * n0 * n1))


# ---------------------------------------------------- events_sbg_churn
def _sbg_query():
    def q(sf_dir: str):
        # single projected read: the (ts, user_id) projection is tiny
        # and the weekly bitmask needs the GLOBAL day anchor (per-block
        # minima can sit mid-week, so block-local masks don't merge)
        import pyarrow.parquet as pq

        t = pq.read_table(f"{sf_dir}/events.parquet",
                          columns=["ts", "user_id"])
        tus = t.column("ts").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        uid = t.column("user_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        day = tus // US_PER_DAY
        lo = int(day.min())
        week = np.minimum(day - lo, 62)
        uk, inv = np.unique(uid, return_inverse=True)
        mask = np.zeros(uk.size, dtype=np.int64)
        np.bitwise_or.at(mask, inv,
                         np.left_shift(np.int64(1),
                                       week.astype(np.int64)))
        s = [int(np.sum((mask & ((1 << (t_ + 1)) - 1))
                        == ((1 << (t_ + 1)) - 1)))
             for t_ in range(4)]
        alpha, beta, pred, err = sbg_fit(*s)
        return pa.table({
            "s0": pa.array([s[0]], type=pa.int64()),
            "s1": pa.array([s[1]], type=pa.int64()),
            "s2": pa.array([s[2]], type=pa.int64()),
            "s3": pa.array([s[3]], type=pa.int64()),
            "alpha": pa.array([alpha], type=pa.float64()),
            "beta": pa.array([beta], type=pa.float64()),
            "pred_s3": pa.array([pred], type=pa.float64()),
        })

    sql = f"""
    WITH ev AS (
        SELECT user_id AS uid,
               least(epoch_us(ts) // {US_PER_DAY}
                     - (SELECT min(epoch_us(ts) // {US_PER_DAY})
                        FROM events), 62) AS week
        FROM events
    ),
    per AS (
        SELECT uid,
               max(CASE WHEN week = 0 THEN 1 ELSE 0 END) AS w0,
               max(CASE WHEN week = 1 THEN 1 ELSE 0 END) AS w1,
               max(CASE WHEN week = 2 THEN 1 ELSE 0 END) AS w2,
               max(CASE WHEN week = 3 THEN 1 ELSE 0 END) AS w3
        FROM ev GROUP BY uid
    ),
    s AS (
        SELECT CAST(sum(w0) AS BIGINT) AS s0,
               CAST(sum(w0 * w1) AS BIGINT) AS s1,
               CAST(sum(w0 * w1 * w2) AS BIGINT) AS s2,
               CAST(sum(w0 * w1 * w2 * w3) AS BIGINT) AS s3
        FROM per
    ),
    f AS (
        SELECT s0, s1, s2, s3,
               CAST(s1 AS DOUBLE) / CAST(s0 AS DOUBLE) AS r1,
               CAST(s2 AS DOUBLE) / CAST(s1 AS DOUBLE) AS r2
        FROM s
    )
    SELECT s0, s1, s2, s3,
           (1.0 - r1) * (1.0 - r2) / (r2 - r1) AS alpha,
           r1 * (1.0 - r2) / (r2 - r1) AS beta,
           CAST(s2 AS DOUBLE)
           * ((r1 * (1.0 - r2) / (r2 - r1) + 2.0)
              / ((1.0 - r1) * (1.0 - r2) / (r2 - r1)
                 + r1 * (1.0 - r2) / (r2 - r1) + 2.0))
               AS pred_s3
    FROM f
    """
    return q, sql


# --------------------------------------------------- embedding_dim_auc
def _auc_query():
    def q(sf_dir: str):
        import pyarrow.parquet as pq

        t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "embedding", "label"])
        lab = np.asarray(t.column("label").to_pylist(),
                         dtype=np.int64)
        emb = np.stack([np.asarray(v, dtype=np.float64) for v in
                        t.column("embedding").to_pylist()])
        keep = (lab == 0) | (lab == 1)
        out = {"dim": [], "auc": []}
        for d in range(4):
            pairs = list(zip(emb[keep, d], lab[keep]))
            n0, n1, auc = auc_from_hist(pairs)
            out["dim"].append(d + 1)
            out["auc"].append(auc)
        return pa.table({
            "dim": pa.array(out["dim"], type=pa.int64()),
            "auc": pa.array(out["auc"], type=pa.float64()),
        })

    sql = """
    WITH base AS (
        SELECT label,
               CAST(unnest(generate_series(1, 4)) AS BIGINT)
                   AS dim,
               embedding
        FROM embeddings WHERE label IN (0, 1)
    ),
    vals AS (
        SELECT dim, label,
               CAST(embedding[CAST(dim AS INT)] AS DOUBLE) AS v
        FROM base
    ),
    h AS (
        SELECT dim, v,
               CAST(sum(CASE WHEN label = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS c0,
               CAST(sum(CASE WHEN label = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS c1
        FROM vals GROUP BY dim, v
    ),
    ranked AS (
        SELECT dim, c0, c1,
               2 * CAST(coalesce(sum(c0 + c1) OVER (
                    PARTITION BY dim ORDER BY v
                    ROWS BETWEEN UNBOUNDED PRECEDING
                    AND 1 PRECEDING), 0) AS BIGINT)
                   + (c0 + c1) + 1 AS m2
        FROM h
    )
    SELECT dim,
           CAST(CAST(sum(c1 * m2) AS BIGINT)
                - sum(c1) * (sum(c1) + 1) AS DOUBLE)
           / CAST(2 * sum(c0) * sum(c1) AS DOUBLE) AS auc
    FROM ranked
    GROUP BY dim
    ORDER BY dim
    """
    return q, sql


def build_wave272_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("events_sbg_churn",) + _sbg_query()))
    add(*(("embedding_dim_auc",) + _auc_query()))
    return queries, oracles
