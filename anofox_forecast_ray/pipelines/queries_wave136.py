"""Wave-136 queries: decision stump with exact info gain, Naive Bayes.

- events_stump_splits: the decision-stump primitive — for every
  hour-of-day threshold t, the entropy information gain of
  splitting "is this event an error?" on hod < t. All split cells
  are bounded integers; entropies spell out -(p ln p + q ln q) with
  scalar ln in a fixed term order, and the gain row set (23 rows)
  is emitted whole so the hash checks every candidate, not just the
  argmax.
- events_naive_bayes: a train/test Naive Bayes evaluation — first
  half of the active days trains P(class), P(hod|class), P(dow|class)
  with Laplace alpha=1; the second half is scored by summing three
  scalar logs per (hod, dow, class) and taking the
  (score desc, class asc) argmax per cell. Accuracy reduces over
  bounded (hod, dow, true-class) test cells. The argmax is stable
  because both sides compute identical doubles.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from .queries import _num_read_blocks

US_PER_HOUR = 3_600_000_000
US_PER_DAY = 86_400_000_000


def _cells_query_reader(sf_dir: str, cols):
    import ray.data as rd

    return rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=cols,
        override_num_blocks=_num_read_blocks(),
    )


# -------------------------------------------------------- events_stump_splits
def _stump_query():
    def q(sf_dir: str):
        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "hod": pa.array([], type=pa.int64()),
                "err": pa.array([], type=pa.int64()),
                "c": pa.array([], type=pa.int64()),
            })
            if "ts" not in t.column_names or t.num_rows == 0:
                return empty
            tus = t.column("ts").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            et = np.asarray(t.column("event_type").to_pylist())
            hod = (tus // US_PER_HOUR) % 24
            err = (et == "error").astype(np.int64)
            key = hod * 2 + err
            uk, c = np.unique(key, return_counts=True)
            return pa.table({
                "hod": pa.array(uk // 2),
                "err": pa.array(uk % 2),
                "c": pa.array(c.astype(np.int64)),
            })

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by(["hod", "err"]).aggregate(
                [("c", "sum")])
            return pa.table({
                "hod": g.column("hod").cast(pa.int64()),
                "err": g.column("err").cast(pa.int64()),
                "c": g.column("c_sum").cast(pa.int64()),
            })

        refs = list(
            _cells_query_reader(sf_dir, ["ts", "event_type"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        cells = tree_reduce_tables(refs, merge).to_pandas()
        cnt = {}
        for _, r in cells.iterrows():
            cnt[(int(r["hod"]), int(r["err"]))] = int(r["c"])

        def h2(e: int, k: int) -> float:
            n = e + k
            acc = 0.0
            if e > 0:
                p = float(e) / float(n)
                acc = acc + p * math.log(p)
            if k > 0:
                p = float(k) / float(n)
                acc = acc + p * math.log(p)
            return -acc

        e_tot = sum(v for (h, e), v in cnt.items() if e == 1)
        k_tot = sum(v for (h, e), v in cnt.items() if e == 0)
        n_tot = e_tot + k_tot
        h_root = h2(e_tot, k_tot)

        out = {"threshold": [], "n_left": [], "err_left": [],
               "n_right": [], "err_right": [], "gain": []}
        for t_i in range(1, 24):
            el = sum(v for (h, e), v in cnt.items()
                     if e == 1 and h < t_i)
            kl = sum(v for (h, e), v in cnt.items()
                     if e == 0 and h < t_i)
            er = e_tot - el
            kr = k_tot - kl
            nl = el + kl
            nr = er + kr
            gain = h_root - ((float(nl) / float(n_tot))
                             * h2(el, kl)
                             + (float(nr) / float(n_tot))
                             * h2(er, kr))
            out["threshold"].append(t_i)
            out["n_left"].append(nl)
            out["err_left"].append(el)
            out["n_right"].append(nr)
            out["err_right"].append(er)
            out["gain"].append(gain)
        return pa.table({
            "threshold": pa.array(out["threshold"],
                                  type=pa.int64()),
            "n_left": pa.array(out["n_left"], type=pa.int64()),
            "err_left": pa.array(out["err_left"],
                                 type=pa.int64()),
            "n_right": pa.array(out["n_right"],
                                type=pa.int64()),
            "err_right": pa.array(out["err_right"],
                                  type=pa.int64()),
            "gain": pa.array(out["gain"], type=pa.float64()),
        })

    sql = f"""
    WITH e AS (
        SELECT (epoch_us(ts) // {US_PER_HOUR}) % 24 AS hod,
               CASE WHEN event_type = 'error' THEN 1 ELSE 0 END
                   AS err
        FROM events
    ),
    tot AS (
        SELECT CAST(sum(err) AS BIGINT) AS e_tot,
               CAST(sum(1 - err) AS BIGINT) AS k_tot,
               CAST(count(*) AS BIGINT) AS n_tot
        FROM e
    ),
    roots AS (
        SELECT e_tot, k_tot, n_tot,
               -(CASE WHEN e_tot > 0 THEN
                    (CAST(e_tot AS DOUBLE) / CAST(e_tot + k_tot
                        AS DOUBLE))
                    * ln(CAST(e_tot AS DOUBLE)
                         / CAST(e_tot + k_tot AS DOUBLE))
                  ELSE 0.0e0 END
                 + CASE WHEN k_tot > 0 THEN
                    (CAST(k_tot AS DOUBLE) / CAST(e_tot + k_tot
                        AS DOUBLE))
                    * ln(CAST(k_tot AS DOUBLE)
                         / CAST(e_tot + k_tot AS DOUBLE))
                   ELSE 0.0e0 END) AS h_root
        FROM tot
    ),
    th AS (SELECT unnest(generate_series(1, 23)) AS t),
    splits AS (
        SELECT th.t AS threshold,
               CAST((SELECT COALESCE(sum(err), 0) FROM e
                     WHERE hod < th.t) AS BIGINT) AS el,
               CAST((SELECT COALESCE(sum(1 - err), 0) FROM e
                     WHERE hod < th.t) AS BIGINT) AS kl
        FROM th
    ),
    gains AS (
        SELECT s.threshold,
               s.el + s.kl AS n_left,
               s.el AS err_left,
               (r.e_tot - s.el) + (r.k_tot - s.kl) AS n_right,
               r.e_tot - s.el AS err_right,
               r.h_root
               - ((CAST(s.el + s.kl AS DOUBLE)
                   / CAST(r.n_tot AS DOUBLE))
                  * (-(CASE WHEN s.el > 0 THEN
                        (CAST(s.el AS DOUBLE)
                         / CAST(s.el + s.kl AS DOUBLE))
                        * ln(CAST(s.el AS DOUBLE)
                             / CAST(s.el + s.kl AS DOUBLE))
                      ELSE 0.0e0 END
                     + CASE WHEN s.kl > 0 THEN
                        (CAST(s.kl AS DOUBLE)
                         / CAST(s.el + s.kl AS DOUBLE))
                        * ln(CAST(s.kl AS DOUBLE)
                             / CAST(s.el + s.kl AS DOUBLE))
                       ELSE 0.0e0 END))
                  + (CAST((r.e_tot - s.el) + (r.k_tot - s.kl)
                          AS DOUBLE)
                     / CAST(r.n_tot AS DOUBLE))
                  * (-(CASE WHEN r.e_tot - s.el > 0 THEN
                        (CAST(r.e_tot - s.el AS DOUBLE)
                         / CAST((r.e_tot - s.el)
                                + (r.k_tot - s.kl) AS DOUBLE))
                        * ln(CAST(r.e_tot - s.el AS DOUBLE)
                             / CAST((r.e_tot - s.el)
                                    + (r.k_tot - s.kl)
                                    AS DOUBLE))
                      ELSE 0.0e0 END
                     + CASE WHEN r.k_tot - s.kl > 0 THEN
                        (CAST(r.k_tot - s.kl AS DOUBLE)
                         / CAST((r.e_tot - s.el)
                                + (r.k_tot - s.kl) AS DOUBLE))
                        * ln(CAST(r.k_tot - s.kl AS DOUBLE)
                             / CAST((r.e_tot - s.el)
                                    + (r.k_tot - s.kl)
                                    AS DOUBLE))
                       ELSE 0.0e0 END)))
                   AS gain
        FROM splits s CROSS JOIN roots r
    )
    SELECT threshold, n_left, err_left, n_right, err_right,
           gain
    FROM gains ORDER BY threshold
    """
    return q, sql


# --------------------------------------------------------- events_naive_bayes
def _naive_bayes_query(alpha: int = 1):
    def q(sf_dir: str):
        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "day": pa.array([], type=pa.int64()),
                "hod": pa.array([], type=pa.int64()),
                "dow": pa.array([], type=pa.int64()),
                "etype": pa.array([], type=pa.string()),
                "c": pa.array([], type=pa.int64()),
            })
            if "ts" not in t.column_names or t.num_rows == 0:
                return empty
            tus = t.column("ts").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            et = np.asarray(t.column("event_type").to_pylist(),
                            dtype=object)
            day = tus // US_PER_DAY
            hod = (tus // US_PER_HOUR) % 24
            dow = day % 7
            import collections
            cnt = collections.Counter(
                zip(day.tolist(), hod.tolist(), dow.tolist(),
                    et.tolist()))
            keys = sorted(cnt)
            return pa.table({
                "day": pa.array([k[0] for k in keys],
                                type=pa.int64()),
                "hod": pa.array([k[1] for k in keys],
                                type=pa.int64()),
                "dow": pa.array([k[2] for k in keys],
                                type=pa.int64()),
                "etype": pa.array([k[3] for k in keys],
                                  type=pa.string()),
                "c": pa.array([cnt[k] for k in keys],
                              type=pa.int64()),
            })

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by(
                ["day", "hod", "dow", "etype"]).aggregate(
                [("c", "sum")])
            return pa.table({
                "day": g.column("day").cast(pa.int64()),
                "hod": g.column("hod").cast(pa.int64()),
                "dow": g.column("dow").cast(pa.int64()),
                "etype": g.column("etype").cast(pa.string()),
                "c": g.column("c_sum").cast(pa.int64()),
            })

        refs = list(
            _cells_query_reader(sf_dir, ["ts", "event_type"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        cells = tree_reduce_tables(refs, merge).to_pandas()
        dmin = int(cells["day"].min())
        dmax = int(cells["day"].max())
        dmid = dmin + (dmax - dmin + 1) // 2
        train = cells[cells["day"] < dmid]
        test = cells[cells["day"] >= dmid]
        classes = sorted(cells["etype"].unique())
        kc = len(classes)

        n_train = int(train["c"].sum())
        cls_n = {c: int(train.loc[train["etype"] == c,
                                  "c"].sum())
                 for c in classes}
        hod_n = {}
        dow_n = {}
        for c in classes:
            sub = train[train["etype"] == c]
            for h in range(24):
                hod_n[(c, h)] = int(
                    sub.loc[sub["hod"] == h, "c"].sum())
            for d in range(7):
                dow_n[(c, d)] = int(
                    sub.loc[sub["dow"] == d, "c"].sum())

        af = float(alpha)

        def score(c, h, d):
            s = math.log((float(cls_n[c]) + af)
                         / (float(n_train) + af * float(kc)))
            s = s + math.log((float(hod_n[(c, h)]) + af)
                             / (float(cls_n[c]) + af * 24.0))
            s = s + math.log((float(dow_n[(c, d)]) + af)
                             / (float(cls_n[c]) + af * 7.0))
            return s

        pred = {}
        for h in range(24):
            for d in range(7):
                best = None
                for c in classes:
                    s = score(c, h, d)
                    if best is None or s > best[0]:
                        best = (s, c)
                pred[(h, d)] = best[1]

        n_test = int(test["c"].sum())
        n_corr = 0
        for _, r in test.iterrows():
            if pred[(int(r["hod"]), int(r["dow"]))] \
                    == r["etype"]:
                n_corr += int(r["c"])
        # majority baseline on the test half
        maj = max(classes,
                  key=lambda c: (int(test.loc[
                      test["etype"] == c, "c"].sum()), ))
        n_maj = int(test.loc[test["etype"] == maj, "c"].sum())
        return pa.table({
            "n_train": pa.array([n_train], type=pa.int64()),
            "n_test": pa.array([n_test], type=pa.int64()),
            "n_correct": pa.array([n_corr], type=pa.int64()),
            "accuracy": pa.array(
                [float(n_corr) / float(n_test)],
                type=pa.float64()),
            "majority_correct": pa.array([n_maj],
                                         type=pa.int64()),
        })

    sql = f"""
    WITH e AS (
        SELECT epoch_us(ts) // {US_PER_DAY} AS day,
               (epoch_us(ts) // {US_PER_HOUR}) % 24 AS hod,
               (epoch_us(ts) // {US_PER_DAY}) % 7 AS dow,
               event_type AS etype
        FROM events
    ),
    split AS (
        SELECT min(day) + (max(day) - min(day) + 1) // 2
                   AS dmid
        FROM e
    ),
    train AS (SELECT * FROM e, split WHERE day < dmid),
    test AS (SELECT * FROM e, split WHERE day >= dmid),
    classes AS (SELECT DISTINCT etype FROM e),
    kc AS (SELECT CAST(count(*) AS BIGINT) AS k FROM classes),
    nt AS (SELECT CAST(count(*) AS BIGINT) AS n FROM train),
    cls AS (
        SELECT c.etype,
               CAST((SELECT count(*) FROM train t
                     WHERE t.etype = c.etype) AS BIGINT) AS cn
        FROM classes c
    ),
    grid AS (
        SELECT h.h AS hod, d.d AS dow, c.etype, cls.cn
        FROM (SELECT unnest(generate_series(0, 23)) AS h) h
        CROSS JOIN (SELECT unnest(generate_series(0, 6)) AS d) d
        CROSS JOIN classes c
        JOIN cls ON cls.etype = c.etype
    ),
    scores AS (
        SELECT g.hod, g.dow, g.etype,
               ln((CAST(g.cn AS DOUBLE) + {alpha}.0e0)
                  / (CAST(nt.n AS DOUBLE)
                     + {alpha}.0e0 * CAST(kc.k AS DOUBLE)))
               + ln((CAST((SELECT count(*) FROM train t
                           WHERE t.etype = g.etype
                             AND t.hod = g.hod) AS DOUBLE)
                     + {alpha}.0e0)
                    / (CAST(g.cn AS DOUBLE)
                       + {alpha}.0e0 * 24.0e0))
               + ln((CAST((SELECT count(*) FROM train t
                           WHERE t.etype = g.etype
                             AND t.dow = g.dow) AS DOUBLE)
                     + {alpha}.0e0)
                    / (CAST(g.cn AS DOUBLE)
                       + {alpha}.0e0 * 7.0e0)) AS s
        FROM grid g CROSS JOIN nt CROSS JOIN kc
    ),
    pred AS (
        SELECT hod, dow, etype AS p
        FROM (SELECT hod, dow, etype,
                     row_number() OVER (
                         PARTITION BY hod, dow
                         ORDER BY s DESC, etype ASC) AS rn
              FROM scores)
        WHERE rn = 1
    ),
    evald AS (
        SELECT CAST(count(*) AS BIGINT) AS n_test,
               CAST(sum(CASE WHEN p.p = t.etype
                        THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_correct
        FROM test t JOIN pred p
          ON p.hod = t.hod AND p.dow = t.dow
    ),
    majd AS (
        SELECT CAST(count(*) AS BIGINT) AS n_maj
        FROM test WHERE etype = (
            SELECT etype FROM test GROUP BY etype
            ORDER BY count(*) DESC, etype ASC LIMIT 1)
    )
    SELECT nt.n AS n_train,
           evald.n_test AS n_test,
           evald.n_correct AS n_correct,
           CAST(evald.n_correct AS DOUBLE)
               / CAST(evald.n_test AS DOUBLE) AS accuracy,
           majd.n_maj AS majority_correct
    FROM nt CROSS JOIN evald CROSS JOIN majd
    """
    return q, sql


def build_wave136_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("events_stump_splits",) + _stump_query()))
    add(*(("events_naive_bayes",) + _naive_bayes_query()))
    return queries, oracles
