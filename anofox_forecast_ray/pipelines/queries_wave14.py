"""Fourteenth query wave: training-data hygiene and corpus-shape
operators — benchmark decontamination, conformal naive intervals,
top-K vocabulary coverage, hourly distinct users, per-source token
concentration (HHI). Every query carries a bitwise DuckDB oracle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .queries import SQL_TOK, _cast, _num_read_blocks


def _docs(sf_dir: str, columns):
    import ray.data as rd

    return rd.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=columns,
        override_num_blocks=_num_read_blocks(),
    )


def _events(sf_dir: str, columns):
    import ray.data as rd

    return rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=columns,
        override_num_blocks=_num_read_blocks(),
    )


# ---------------------------------------------------------------- conformal
def _conformal_naive_query(width: int):
    """Split-conformal interval around the h=1 naive forecast of the
    per-doc w{width} window-SUM series (integers): the score set is the
    in-sample one-step naive absolute residuals |y_t - y_{t-1}| and the
    radius is their q75 (quarter fractions on integers — the repo's
    np.quantile == quantile_cont bit-equivalence). Mirrors the
    reference's interval-calibration layer (tests/interval_calibration.rs)
    as a distributed query."""

    def q(sf_dir: str):
        from ..kernels.rollup import rollup_flat
        from ..stages.rollup import _flat_tokens
        from .queries import corpus_ds

        def per_doc(t: pa.Table) -> pa.Table:
            values, lengths = _flat_tokens(t)
            r = rollup_flat(values, lengths, width)
            sums = r["sum"].astype(np.int64)
            ridx = r["row_idx"]
            ids = t.column("doc_id").to_pylist()
            out = {"doc_id": [], "n": [], "point": [], "q75": []}
            if ridx.size:
                bounds = np.flatnonzero(
                    np.concatenate(([True], ridx[1:] != ridx[:-1]))
                )
                ends = np.concatenate((bounds[1:], [ridx.size]))
                for s0, s1 in zip(bounds, ends):
                    y = sums[s0:s1]
                    if y.size < 4:
                        continue
                    resid = np.abs(np.diff(y))
                    out["doc_id"].append(ids[ridx[s0]])
                    out["n"].append(int(y.size))
                    out["point"].append(float(y[-1]))
                    out["q75"].append(float(np.quantile(resid, 0.75)))
            point = np.asarray(out["point"], dtype=np.float64)
            q75 = np.asarray(out["q75"], dtype=np.float64)
            return pa.table(
                {
                    "doc_id": pa.array(out["doc_id"], type=pa.string()),
                    "n": pa.array(out["n"], type=pa.int64()),
                    "point": pa.array(point, type=pa.float64()),
                    "q75": pa.array(q75, type=pa.float64()),
                    "lo": pa.array(point - q75, type=pa.float64()),
                    "hi": pa.array(point + q75, type=pa.float64()),
                }
            )

        return _cast(
            corpus_ds(sf_dir).map_batches(per_doc, batch_format="pyarrow"),
            {"doc_id": pa.string(), "n": pa.int64(), "point": pa.float64(),
             "q75": pa.float64(), "lo": pa.float64(), "hi": pa.float64()},
        )

    sql = f"""
    WITH tok AS ({SQL_TOK}),
    w AS (
        SELECT doc_id, pos // {width} AS wid,
               CAST(sum(token) AS BIGINT) AS s
        FROM tok GROUP BY doc_id, wid
    ),
    l AS (
        SELECT doc_id, list(s ORDER BY wid) AS ys,
               CAST(count(*) AS BIGINT) AS n
        FROM w GROUP BY doc_id HAVING count(*) >= 4
    ),
    r AS (
        SELECT doc_id, n,
               CAST(ys[CAST(n AS INTEGER)] AS DOUBLE) AS point,
               unnest(list_transform(
                   generate_series(2, CAST(n AS INTEGER)),
                   i -> abs(ys[i] - ys[i - 1]))) AS resid
        FROM l
    )
    SELECT doc_id, n, point,
           quantile_cont(resid, 0.75) AS q75,
           point - quantile_cont(resid, 0.75) AS lo,
           point + quantile_cont(resid, 0.75) AS hi
    FROM r GROUP BY doc_id, n, point
    """
    return q, sql


# ------------------------------------------------------------- vocab topk
VOCAB_K = 16


def _word_count_partial(t: pa.Table) -> pa.Table:
    words: list[str] = []
    for txt in t.column("text").to_pylist():
        words.extend((txt or "").split())
    if not words:
        return pa.table({"word": pa.array([], type=pa.string()),
                         "cnt": pa.array([], type=pa.int64())})
    uw, cnt = np.unique(np.asarray(words, dtype=object), return_counts=True)
    return pa.table({"word": pa.array(list(uw), type=pa.string()),
                     "cnt": pa.array(cnt.astype(np.int64), type=pa.int64())})


def _merge_word_counts(t: pa.Table) -> pa.Table:
    w = np.asarray(t.column("word").to_pylist(), dtype=object)
    c = t.column("cnt").to_numpy(zero_copy_only=False)
    order = np.argsort(w, kind="stable")
    uw, start = np.unique(w[order], return_index=True)
    return pa.table(
        {"word": pa.array(list(uw), type=pa.string()),
         "cnt": pa.array(np.add.reduceat(c[order], start).astype(np.int64),
                         type=pa.int64())}
    )


def _vocab_coverage_query():
    """Two-pass broadcast-vocabulary coverage: pass 1 builds the global
    top-K word list (per-block distinct partials + tree reduce — the
    type space is the vocabulary, bounded, NOT the corpus); pass 2 scans
    with the broadcast top-K set and emits per-source covered/total
    token counts. coverage is one f64 division of identical int64s."""

    def q(sf_dir: str):
        import ray

        from ..stages.source_rollup import tree_reduce_tables

        refs = list(
            _docs(sf_dir, ["text"])
            .map_batches(_word_count_partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        counts = tree_reduce_tables(refs, _merge_word_counts)
        w = np.asarray(counts.column("word").to_pylist(), dtype=object)
        c = counts.column("cnt").to_numpy(zero_copy_only=False)
        # top-K by (count desc, word asc) — total order, tie-stable
        order = np.lexsort((w, -c))[:VOCAB_K]
        top_ref = ray.put(frozenset(w[order].tolist()))

        class CoverStage:
            def __init__(self, top_ref):
                self.top = ray.get(top_ref)

            def __call__(self, t: pa.Table) -> pa.Table:
                agg: dict[str, list[int]] = {}
                for src, txt in zip(
                    t.column("source").to_pylist(),
                    t.column("text").to_pylist(),
                ):
                    toks = (txt or "").split()
                    a = agg.setdefault(src, [0, 0])
                    a[0] += sum(1 for x in toks if x in self.top)
                    a[1] += len(toks)
                ks = sorted(agg)
                return pa.table(
                    {
                        "source": pa.array(ks, type=pa.string()),
                        "covered": pa.array(
                            [agg[k][0] for k in ks], type=pa.int64()),
                        "total": pa.array(
                            [agg[k][1] for k in ks], type=pa.int64()),
                    }
                )

        def merge(t: pa.Table) -> pa.Table:
            s = np.asarray(t.column("source").to_pylist(), dtype=object)
            cov = t.column("covered").to_numpy(zero_copy_only=False)
            tot = t.column("total").to_numpy(zero_copy_only=False)
            order = np.argsort(s, kind="stable")
            us, start = np.unique(s[order], return_index=True)
            return pa.table(
                {"source": pa.array(list(us), type=pa.string()),
                 "covered": pa.array(
                     np.add.reduceat(cov[order], start).astype(np.int64),
                     type=pa.int64()),
                 "total": pa.array(
                     np.add.reduceat(tot[order], start).astype(np.int64),
                     type=pa.int64())}
            )

        refs2 = list(
            _docs(sf_dir, ["source", "text"])
            .map_batches(
                CoverStage,
                fn_constructor_args=(top_ref,),
                batch_format="pyarrow",
                concurrency=(1, 4),
                num_cpus=1,
            )
            .to_arrow_refs()
        )
        final = tree_reduce_tables(refs2, merge)
        cov = final.column("covered").to_numpy(zero_copy_only=False)
        tot = final.column("total").to_numpy(zero_copy_only=False)
        out = pa.table(
            {
                "source": final.column("source").cast(pa.string()),
                "covered": pa.array(cov, type=pa.int64()),
                "total": pa.array(tot, type=pa.int64()),
                "coverage": pa.array(
                    cov.astype(np.float64) / tot.astype(np.float64),
                    type=pa.float64()),
            }
        )
        import ray.data as rd

        return rd.from_arrow(out)

    sql = f"""
    WITH wds AS (
        SELECT source,
               unnest(string_split_regex(trim(text), '\\s+')) AS word
        FROM documents WHERE trim(text) <> ''
    ),
    top AS (
        SELECT word FROM (
            SELECT word, count(*) AS c FROM wds GROUP BY word
            ORDER BY c DESC, word ASC LIMIT {VOCAB_K}
        )
    ),
    agg AS (
        SELECT source,
               CAST(sum(CASE WHEN word IN (SELECT word FROM top)
                             THEN 1 ELSE 0 END) AS BIGINT) AS covered,
               CAST(count(*) AS BIGINT) AS total
        FROM wds GROUP BY source
    )
    SELECT source, covered, total,
           CAST(covered AS DOUBLE) / CAST(total AS DOUBLE) AS coverage
    FROM agg
    """
    return q, sql


# ------------------------------------------------- hourly distinct users
def _hourly_users_query():
    """Distinct users per hour window. The scale move is dedup-before-
    shuffle: each block first reduces to its distinct (hour, user) pairs
    (bounded by users x hours, far below row count), and the groupby
    shuffles only those."""

    def q(sf_dir: str):
        def pairs(t: pa.Table) -> pa.Table:
            ts = t.column("ts").cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
            hour = ts // 3_600_000_000
            user = t.column("user_id").to_numpy(zero_copy_only=False)
            key = np.stack([hour, user], axis=1)
            uniq = np.unique(key, axis=0)
            return pa.table(
                {"hour_id": pa.array(uniq[:, 0], type=pa.int64()),
                 "user_id": pa.array(uniq[:, 1], type=pa.int64())}
            )

        def count_users(g: pa.Table) -> pa.Table:
            u = g.column("user_id").to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "hour_id": pa.array(
                        [int(g.column("hour_id")[0].as_py())],
                        type=pa.int64(),
                    ),
                    "n_users": pa.array(
                        [int(np.unique(u).size)], type=pa.int64()
                    ),
                }
            )

        ds = (
            _events(sf_dir, ["ts", "user_id"])
            .map_batches(pairs, batch_format="pyarrow")
            .groupby("hour_id")
            .map_groups(count_users, batch_format="pyarrow")
        )
        return _cast(ds, {"hour_id": pa.int64(), "n_users": pa.int64()})

    sql = """
    SELECT CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS hour_id,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events GROUP BY hour_id
    """
    return q, sql


# --------------------------------------------------------- source HHI
def _source_hhi_query():
    """Herfindahl index of the per-source token-type distribution:
    hhi = sum(cnt_i^2) / total^2, both int64 (overflow-safe while
    per-source token count < 3e9; partition finer before that), one f64
    division — bit-identical to the SQL."""

    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            rows: dict[tuple, int] = {}
            for src, txt in zip(
                t.column("source").to_pylist(),
                t.column("text").to_pylist(),
            ):
                for wd in (txt or "").split():
                    k = (src, wd)
                    rows[k] = rows.get(k, 0) + 1
            ks = sorted(rows)
            return pa.table(
                {"source": pa.array([k[0] for k in ks], type=pa.string()),
                 "word": pa.array([k[1] for k in ks], type=pa.string()),
                 "cnt": pa.array([rows[k] for k in ks], type=pa.int64())}
            )

        def merge(t: pa.Table) -> pa.Table:
            s = np.asarray(t.column("source").to_pylist(), dtype=object)
            w = np.asarray(t.column("word").to_pylist(), dtype=object)
            c = t.column("cnt").to_numpy(zero_copy_only=False)
            key = np.asarray(
                [a + "\x00" + b for a, b in zip(s, w)], dtype=object
            )
            order = np.argsort(key, kind="stable")
            uk, start = np.unique(key[order], return_index=True)
            cm = np.add.reduceat(c[order], start).astype(np.int64)
            sm = [k.split("\x00", 1) for k in uk]
            return pa.table(
                {"source": pa.array([x[0] for x in sm], type=pa.string()),
                 "word": pa.array([x[1] for x in sm], type=pa.string()),
                 "cnt": pa.array(cm, type=pa.int64())}
            )

        refs = list(
            _docs(sf_dir, ["source", "text"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        counts = tree_reduce_tables(refs, merge)
        s = np.asarray(counts.column("source").to_pylist(), dtype=object)
        c = counts.column("cnt").to_numpy(zero_copy_only=False)
        order = np.argsort(s, kind="stable")
        us, start = np.unique(s[order], return_index=True)
        sq = np.add.reduceat((c * c)[order], start).astype(np.int64)
        tot = np.add.reduceat(c[order], start).astype(np.int64)
        types = np.add.reduceat(np.ones_like(c), start).astype(np.int64)
        out = pa.table(
            {
                "source": pa.array(list(us), type=pa.string()),
                "n_tokens": pa.array(tot, type=pa.int64()),
                "n_types": pa.array(types, type=pa.int64()),
                "hhi": pa.array(
                    sq.astype(np.float64)
                    / (tot * tot).astype(np.float64),
                    type=pa.float64()),
            }
        )
        return rd.from_arrow(out)

    sql = """
    WITH wds AS (
        SELECT source,
               unnest(string_split_regex(trim(text), '\\s+')) AS word
        FROM documents WHERE trim(text) <> ''
    ),
    wc AS (
        SELECT source, word, CAST(count(*) AS BIGINT) AS cnt
        FROM wds GROUP BY source, word
    )
    SELECT source,
           CAST(sum(cnt) AS BIGINT) AS n_tokens,
           CAST(count(*) AS BIGINT) AS n_types,
           CAST(sum(cnt * cnt) AS DOUBLE)
               / CAST(sum(cnt) * sum(cnt) AS DOUBLE) AS hhi
    FROM wc GROUP BY source
    """
    return q, sql


def build_wave14_queries():
    queries, oracles = {}, {}

    from ..extras.decontam import decontaminate, decontaminate_sql

    def decontam_q(sf_dir: str):
        ds = decontaminate(lambda: _docs(sf_dir, ["doc_id", "text"]))
        return _cast(
            ds,
            {"doc_id": pa.int64(), "n_shingles": pa.int64(),
             "n_hits": pa.int64(), "contaminated": pa.int32()},
        )

    queries["decontaminate_shingles"] = decontam_q
    oracles["decontaminate_shingles"] = decontaminate_sql()

    q, sql = _conformal_naive_query(8)
    queries["forecast_naive_conformal_w8"] = q
    oracles["forecast_naive_conformal_w8"] = sql

    q, sql = _vocab_coverage_query()
    queries["vocab_coverage_top16"] = q
    oracles["vocab_coverage_top16"] = sql

    q, sql = _hourly_users_query()
    queries["events_hourly_distinct_users"] = q
    oracles["events_hourly_distinct_users"] = sql

    q, sql = _source_hhi_query()
    queries["source_token_hhi"] = q
    oracles["source_token_hhi"] = sql

    return queries, oracles
