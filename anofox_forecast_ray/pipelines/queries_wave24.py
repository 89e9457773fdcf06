"""Wave-24 queries: corpus-drift monitoring and data-quality rules.

- source_vocab_drift: smoothed KL between two deterministic doc
  cohorts' token distributions per source — the distribution-drift
  alarm a continuously-ingesting corpus pipeline runs between
  snapshots. The cohort bit is a Knuth multiplicative hash of doc_id
  (exact in int64 for doc_id < 2^32) — a raw parity split would be
  CONSTANT per source here because the corpus assigns source by
  doc_id residue class; any id-arithmetic cohort risks that trap. Bounded
  (source, cohort, token) partials; the KL is a vocab-sized sequential
  fold per source, bit-replayed by the SQL list_reduce.
- events_quality_rules: declarative data-quality rule counts (nulls,
  range, format, referential uniqueness) in ONE streaming pass of
  vectorized masks + bounded partials; the duplicate-id rule uses
  distinct-id partials (tree-reduced here; hash-partition the id space
  at 100 TB).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from .queries import SQL_TOK, _num_read_blocks, corpus_ds
from ._scaffold import read_cols

_FOLD = "(a, b) -> a + b"
_TOK_BITS = 21


def _drift_query():
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.rollup import _flat_tokens
        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            values, lengths = _flat_tokens(t)
            empty = pa.table(
                {
                    "source": pa.array([], type=pa.string()),
                    "cohort": pa.array([], type=pa.int64()),
                    "token": pa.array([], type=pa.int64()),
                    "cnt": pa.array([], type=pa.int64()),
                }
            )
            if values.size == 0:
                return empty
            src = np.asarray(t.column("source").to_pylist(), dtype=object)
            did = np.asarray(
                [int(d) for d in t.column("doc_id").to_pylist()],
                dtype=np.int64,
            )
            usrc, inv = np.unique(src, return_inverse=True)
            row_idx = np.repeat(
                np.arange(lengths.size, dtype=np.int64), lengths
            )
            cohort = ((did * 2654435761) % 4294967296) >> 31
            key = (
                (inv[row_idx].astype(np.int64) << (_TOK_BITS + 1))
                | (cohort[row_idx] << _TOK_BITS)
                | values.astype(np.int64)
            )
            uk, cnt = np.unique(key, return_counts=True)
            return pa.table(
                {
                    "source": pa.array(
                        [usrc[k >> (_TOK_BITS + 1)] for k in uk],
                        type=pa.string(),
                    ),
                    "cohort": pa.array(
                        (uk >> _TOK_BITS) & 1, type=pa.int64()
                    ),
                    "token": pa.array(
                        uk & ((1 << _TOK_BITS) - 1), type=pa.int64()
                    ),
                    "cnt": pa.array(cnt.astype(np.int64), type=pa.int64()),
                }
            )

        def merge(t: pa.Table) -> pa.Table:
            if "source" not in t.column_names:
                return partial(pa.table({"tokens": pa.array(
                    [], type=pa.list_(pa.int32()))}))  # pragma: no cover
            g = t.group_by(["source", "cohort", "token"]).aggregate(
                [("cnt", "sum")]
            )
            return pa.table(
                {
                    "source": g.column("source"),
                    "cohort": g.column("cohort"),
                    "token": g.column("token"),
                    "cnt": g.column("cnt_sum").cast(pa.int64()),
                }
            )

        refs = list(
            corpus_ds(sf_dir)
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        tab = tree_reduce_tables(refs, merge)
        src = np.asarray(tab.column("source").to_pylist(), dtype=object)
        coh = tab.column("cohort").to_numpy(zero_copy_only=False)
        tok = tab.column("token").to_numpy(zero_copy_only=False)
        cnt = tab.column("cnt").to_numpy(zero_copy_only=False)
        out = {"source": [], "n_even": [], "n_odd": [], "n_types": [],
               "kl": []}
        for s in sorted(set(src.tolist())):
            m = src == s
            ce: dict[int, int] = {}
            co: dict[int, int] = {}
            for c, t_, n_ in zip(coh[m], tok[m], cnt[m]):
                (ce if c == 0 else co)[int(t_)] = int(n_)
            vocab = sorted(set(ce) | set(co))
            v = len(vocab)
            ne = sum(ce.values())
            no = sum(co.values())
            if ne == 0 or no == 0:
                continue
            kl = 0.0
            for t_ in vocab:  # token asc — the oracle's fold order
                p = (ce.get(t_, 0) + 1) / (ne + v)
                qq = (co.get(t_, 0) + 1) / (no + v)
                kl += p * math.log(p / qq)
            out["source"].append(s)
            out["n_even"].append(ne)
            out["n_odd"].append(no)
            out["n_types"].append(v)
            out["kl"].append(kl)
        return rd.from_arrow(
            pa.table(
                {
                    "source": pa.array(out["source"], type=pa.string()),
                    "n_even": pa.array(out["n_even"], type=pa.int64()),
                    "n_odd": pa.array(out["n_odd"], type=pa.int64()),
                    "n_types": pa.array(out["n_types"], type=pa.int64()),
                    "kl": pa.array(out["kl"], type=pa.float64()),
                }
            )
        )

    sql = f"""
    WITH tok AS ({SQL_TOK}),
    wc AS (
        SELECT source,
               ((CAST(doc_id AS BIGINT) * 2654435761) % 4294967296)
                 // 2147483648 AS cohort,
               token,
               CAST(count(*) AS BIGINT) AS cnt
        FROM tok GROUP BY source, cohort, token
    ),
    piv AS (
        SELECT source, token,
               CAST(sum(CASE WHEN cohort = 0 THEN cnt ELSE 0 END)
                    AS BIGINT) AS ce,
               CAST(sum(CASE WHEN cohort = 1 THEN cnt ELSE 0 END)
                    AS BIGINT) AS co
        FROM wc GROUP BY source, token
    ),
    tot AS (
        SELECT source, CAST(sum(ce) AS BIGINT) AS ne,
               CAST(sum(co) AS BIGINT) AS no,
               CAST(count(*) AS BIGINT) AS v
        FROM piv GROUP BY source
        HAVING sum(ce) > 0 AND sum(co) > 0
    ),
    terms AS (
        SELECT piv.source,
               list(
                   ((CAST(piv.ce AS DOUBLE) + 1.0e0)
                    / (CAST(tot.ne AS DOUBLE) + CAST(tot.v AS DOUBLE)))
                   * ln(((CAST(piv.ce AS DOUBLE) + 1.0e0)
                         / (CAST(tot.ne AS DOUBLE) + CAST(tot.v AS DOUBLE)))
                        / ((CAST(piv.co AS DOUBLE) + 1.0e0)
                           / (CAST(tot.no AS DOUBLE)
                              + CAST(tot.v AS DOUBLE))))
                   ORDER BY piv.token) AS tl
        FROM piv JOIN tot USING (source)
        GROUP BY piv.source
    )
    SELECT tot.source, tot.ne AS n_even, tot.no AS n_odd,
           tot.v AS n_types, list_reduce(tl, {_FOLD}) AS kl
    FROM terms JOIN tot ON terms.source = tot.source
    """
    return q, sql


def _quality_rules_query():
    def q(sf_dir: str):
        import pyarrow.compute as pc
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        LO = 1704067200 * 1_000_000   # 2024-01-01 in epoch us
        HI = 1767225600 * 1_000_000   # 2026-01-01

        def partial(t: pa.Table) -> pa.Table:
            v = t.column("value")
            ts = t.column("ts").cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
            props = t.column("props")
            props = (props.combine_chunks()
                     if isinstance(props, pa.ChunkedArray) else props)
            ok_props = pc.match_substring_regex(
                props, r'^\{"k": \d+\}$'
            ).to_numpy(zero_copy_only=False)
            vn = v.to_numpy(zero_copy_only=False)
            rows = {
                "null_value": int(v.null_count),
                "negative_value": int(np.sum(vn < 0)),
                "zero_value": int(np.sum(vn == 0)),
                "bad_props": int(np.sum(~ok_props)),
                "ts_out_of_range": int(np.sum((ts < LO) | (ts >= HI))),
            }
            ids = t.column("event_id").to_numpy(zero_copy_only=False)
            uids = np.unique(ids)
            return pa.table(
                {
                    "rule": pa.array(
                        list(rows) + ["__rows", "__ids"], type=pa.string()
                    ),
                    "violations": pa.array(
                        list(rows.values()) + [t.num_rows, 0],
                        type=pa.int64(),
                    ),
                    "ids": pa.array(
                        [None] * (len(rows) + 1) + [uids.tobytes()],
                        type=pa.binary(),
                    ),
                }
            )

        def merge(t: pa.Table) -> pa.Table:
            rule = np.asarray(t.column("rule").to_pylist(), dtype=object)
            viol = t.column("violations").to_numpy(zero_copy_only=False)
            ids = t.column("ids").to_pylist()
            out_r, out_v, out_i = [], [], []
            for r in sorted(set(rule.tolist())):
                m = rule == r
                if r == "__ids":
                    merged = np.unique(np.concatenate(
                        [np.frombuffer(b, dtype=np.int64)
                         for b, mm in zip(ids, m) if mm]
                    ))
                    out_r.append(r)
                    out_v.append(0)
                    out_i.append(merged.tobytes())
                else:
                    out_r.append(r)
                    out_v.append(int(viol[m].sum()))
                    out_i.append(None)
            return pa.table(
                {
                    "rule": pa.array(out_r, type=pa.string()),
                    "violations": pa.array(out_v, type=pa.int64()),
                    "ids": pa.array(out_i, type=pa.binary()),
                }
            )

        ds = read_cols(sf_dir, "events", ["event_id", "ts", "value", "props"]).map_batches(partial, batch_format="pyarrow")
        tab = tree_reduce_tables(list(ds.to_arrow_refs()), merge)
        rule = tab.column("rule").to_pylist()
        viol = dict(zip(rule, tab.column("violations").to_pylist()))
        ids_row = tab.column("ids").to_pylist()[rule.index("__ids")]
        n_distinct = np.frombuffer(ids_row, dtype=np.int64).size
        final = {k: v for k, v in viol.items()
                 if not k.startswith("__")}
        final["dup_event_id"] = viol["__rows"] - n_distinct
        names = sorted(final)
        return rd.from_arrow(
            pa.table(
                {
                    "rule": pa.array(names, type=pa.string()),
                    "violations": pa.array(
                        [final[n] for n in names], type=pa.int64()
                    ),
                }
            )
        )

    sql = """
    WITH m AS (
        SELECT
          CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT)
            AS null_value,
          CAST(sum(CASE WHEN value < 0 THEN 1 ELSE 0 END) AS BIGINT)
            AS negative_value,
          CAST(sum(CASE WHEN value = 0 THEN 1 ELSE 0 END) AS BIGINT)
            AS zero_value,
          CAST(sum(CASE WHEN NOT regexp_matches(props, '^\\{"k": \\d+\\}$')
                   THEN 1 ELSE 0 END) AS BIGINT) AS bad_props,
          CAST(sum(CASE WHEN epoch_us(ts) < 1704067200000000
                          OR epoch_us(ts) >= 1767225600000000
                   THEN 1 ELSE 0 END) AS BIGINT) AS ts_out_of_range,
          CAST(count(*) - count(DISTINCT event_id) AS BIGINT)
            AS dup_event_id
        FROM events
    )
    SELECT u.rule, u.violations FROM (
        SELECT 'bad_props' AS rule, bad_props AS violations FROM m
        UNION ALL SELECT 'dup_event_id', dup_event_id FROM m
        UNION ALL SELECT 'negative_value', negative_value FROM m
        UNION ALL SELECT 'null_value', null_value FROM m
        UNION ALL SELECT 'ts_out_of_range', ts_out_of_range FROM m
        UNION ALL SELECT 'zero_value', zero_value FROM m
    ) u
    """
    return q, sql


def build_wave24_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("source_vocab_drift",) + _drift_query()))
    add(*(("events_quality_rules",) + _quality_rules_query()))
    return queries, oracles
