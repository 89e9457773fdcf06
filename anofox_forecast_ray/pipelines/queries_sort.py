"""Fourth query wave: global sort / limit (top-k), distinct, expanding
windows — the remaining dataflow operators without query coverage."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .queries import SQL_TOK, _cast, _num_read_blocks


def _top_docs_query(k: int = 25):
    """Global sort + limit: top-k docs by n_chars (ties broken by doc_id
    so the result set is deterministic)."""

    def q(sf_dir: str):
        import ray.data as rd

        ds = (
            rd.read_parquet(
                f"{sf_dir}/documents.parquet",
                columns=["doc_id", "n_chars", "source"],
                override_num_blocks=_num_read_blocks(),
            )
            .sort(["n_chars", "doc_id"], descending=[True, False])
            .limit(k)
        )
        return _cast(
            ds,
            {
                "doc_id": pa.int64(),
                "n_chars": pa.int64(),
                "source": pa.string(),
            },
        )

    sql = f"""
    SELECT doc_id, n_chars, source
    FROM documents
    ORDER BY n_chars DESC, doc_id ASC
    LIMIT {k}
    """
    return q, sql


def _distinct_sources_query():
    """Set op: distinct values of a column (ds.unique)."""

    def q(sf_dir: str):
        import ray.data as rd

        ds = rd.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["source"],
            override_num_blocks=_num_read_blocks(),
        )
        vals = sorted(ds.unique("source"))
        return pa.table({"source": pa.array(vals, type=pa.string())})

    sql = "SELECT DISTINCT source FROM documents"
    return q, sql


def _expanding_query(width: int = 8):
    """Expanding (cumulative) token-weighted mean per doc over the w8
    window series — exact integer cumulative sums on both sides."""

    def q(sf_dir: str):
        from ..kernels.rollup import rollup_flat
        from ..stages.rollup import _flat_tokens
        from .queries import corpus_ds

        def expand(t: pa.Table) -> pa.Table:
            values, lengths = _flat_tokens(t)
            r = rollup_flat(values, lengths, width)
            ridx = r["row_idx"]
            ids = t.column("doc_id").to_pylist()
            out_doc, out_wid, out_em = [], [], []
            if ridx.size:
                bounds = np.flatnonzero(
                    np.concatenate(([True], ridx[1:] != ridx[:-1]))
                )
                ends = np.concatenate((bounds[1:], [ridx.size]))
                for s0, s1 in zip(bounds, ends):
                    cs = np.cumsum(r["sum"][s0:s1]).astype(np.float64)
                    cc = np.cumsum(r["cnt"][s0:s1]).astype(np.float64)
                    em = cs / cc
                    wid = r["window_id"][s0:s1]
                    out_doc.extend([ids[ridx[s0]]] * wid.size)
                    out_wid.extend(wid.tolist())
                    out_em.extend(em.tolist())
            return pa.table(
                {
                    "doc_id": pa.array(out_doc, type=pa.string()),
                    "window_id": pa.array(out_wid, type=pa.int64()),
                    "expanding_mean": pa.array(out_em, type=pa.float64()),
                }
            )

        return _cast(
            corpus_ds(sf_dir).map_batches(expand, batch_format="pyarrow"),
            {
                "doc_id": pa.string(),
                "window_id": pa.int64(),
                "expanding_mean": pa.float64(),
            },
        )

    sql = f"""
    WITH tok AS ({SQL_TOK}),
    w AS (
        SELECT doc_id, pos // {width} AS window_id,
               CAST(sum(token) AS BIGINT) AS s,
               CAST(count(*) AS BIGINT) AS cnt
        FROM tok GROUP BY doc_id, window_id
    )
    SELECT doc_id, window_id,
           CAST(sum(s) OVER win AS DOUBLE)
             / CAST(sum(cnt) OVER win AS DOUBLE) AS expanding_mean
    FROM w
    WINDOW win AS (PARTITION BY doc_id ORDER BY window_id
                   ROWS UNBOUNDED PRECEDING)
    """
    return q, sql


def _streaming_rollup_query(width: int = 32):
    """Actor-based incremental source rollup fed the full log — same
    result (and same SQL oracle) as the batch tree-reduce path."""

    def q(sf_dir: str):
        from ..config import TierSpec
        from ..stages.rollup import make_tier_rollup_fn
        from ..stages.streaming import StreamingSourceRollup
        from .queries import corpus_ds

        tier = (TierSpec(f"w{width}", width),)
        rollup_tbl = pa.concat_tables(
            [
                b
                for b in corpus_ds(sf_dir)
                .map_batches(make_tier_rollup_fn(tier), batch_format="pyarrow")
                .iter_batches(batch_size=4096, batch_format="pyarrow")
                if b.num_rows
            ]
        )
        stream = StreamingSourceRollup(n_buckets=3)
        try:
            step = max(1, rollup_tbl.num_rows // 7)
            for off in range(0, rollup_tbl.num_rows, step):
                stream.ingest(rollup_tbl.slice(off, step))
            snap = stream.snapshot()
        finally:
            stream.shutdown()
        cols = {
            "source": snap.column("source").cast(pa.string()),
            "window_id": snap.column("window_id").cast(pa.int64()),
            "cnt": snap.column("cnt").cast(pa.int64()),
            "sum": snap.column("sum").cast(pa.int64()),
            "min": snap.column("min").cast(pa.int64()),
            "max": snap.column("max").cast(pa.int64()),
            "mean": snap.column("mean").cast(pa.float64()),
        }
        return pa.table(cols)

    sql = f"""
    WITH tok AS ({SQL_TOK})
    SELECT source,
           pos // {width} AS window_id,
           CAST(count(*) AS BIGINT) AS cnt,
           CAST(sum(token) AS BIGINT) AS "sum",
           CAST(min(token) AS BIGINT) AS "min",
           CAST(max(token) AS BIGINT) AS "max",
           CAST(sum(token) AS DOUBLE) / count(*) AS mean
    FROM tok GROUP BY source, window_id
    """
    return q, sql


def _pushdown_query():
    """Row-group predicate pushdown at the read: only lineitems shipped
    before 1997-01-01 leave storage (pyarrow dataset filter expression),
    then a grouped aggregate."""

    def q(sf_dir: str):
        import pyarrow.compute as pc
        import ray.data as rd
        from ray.data.aggregate import Count, Sum

        ds = rd.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_returnflag", "l_quantity", "l_shipdate"],
            filter=(pc.field("l_shipdate") < pa.scalar(
                np.datetime64("1997-01-01", "us"))),
            override_num_blocks=_num_read_blocks(),
        ).drop_columns(["l_shipdate"])
        agg = ds.groupby("l_returnflag").aggregate(
            Sum("l_quantity", alias_name="sum_qty"),
            Count(alias_name="cnt"),
        )
        return _cast(
            agg,
            {
                "l_returnflag": pa.string(),
                "sum_qty": pa.float64(),
                "cnt": pa.int64(),
            },
        )

    sql = """
    SELECT l_returnflag,
           CAST(sum(l_quantity) AS DOUBLE) AS sum_qty,
           CAST(count(*) AS BIGINT) AS cnt
    FROM lineitem
    WHERE l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY l_returnflag
    """
    return q, sql


def build_sort_queries():
    queries, oracles = {}, {}
    for name, builder in (
        ("top_docs_by_length", _top_docs_query),
        ("distinct_sources", _distinct_sources_query),
        ("doc_expanding_mean_w8", _expanding_query),
        ("streaming_source_rollup_w32", _streaming_rollup_query),
        ("lineitem_pushdown_agg", _pushdown_query),
    ):
        q, sql = builder()
        queries[name] = q
        oracles[name] = sql
    return queries, oracles
