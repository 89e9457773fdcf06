"""Wave-122 queries: optimizer cardinality estimation and Bloom FPR.

- join_cardinality_estimate: the System-R estimator exercise — how
  well do 64 equi-width o_orderkey histograms predict the
  orders x lineitem join size? est = sum_b c_orders(b) *
  c_lineitem(b) / width(b) (uniformity assumption inside a bucket),
  compared to the EXACT join cardinality (orderkey is unique in
  orders, so it's a semi-join count — no row join needed on either
  side). Bucket-ordered fold of per-bucket single divisions; the
  q-error ratio is what an optimizer would be judged on.
- bloom_fpr_measured: build a Bloom filter (m = 4096 bits, k = 3
  multiplicative hashes, all integer bit ops) over the customer key
  set, probe it with DETERMINISTIC non-members (custkey + 10^7), and
  report the realized false-positive rate next to the theoretical
  (1 - e^{-kn/m})^k. The bit-set is a bounded DISTINCT-position set
  (<= 4096 rows) built from per-block partials and broadcast to the
  probe pass — the exact shape a distributed semi-join prefilter has
  at 100 TB.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from .queries import _num_read_blocks
from ._scaffold import read_cols

N_BUCKETS = 64
BLOOM_M = 4096
BLOOM_SHIFT = 20  # 32 - log2(m)
HASH_A = (2654435761, 2246822519, 3266489917)
PROBE_OFFSET = 10_000_000


# ------------------------------------------------ join_cardinality_estimate
def _cardest_query():
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def hist_of(path: str, col: str, lo: int, width: int):
            def partial(t: pa.Table) -> pa.Table:
                empty = pa.table({
                    "b": pa.array([], type=pa.int64()),
                    "c": pa.array([], type=pa.int64()),
                })
                if col not in t.column_names or t.num_rows == 0:
                    return empty
                v = t.column(col).to_numpy(
                    zero_copy_only=False).astype(np.int64)
                b = (v - lo) // width
                uk, cnt = np.unique(b, return_counts=True)
                return pa.table({
                    "b": pa.array(uk, type=pa.int64()),
                    "c": pa.array(cnt.astype(np.int64)),
                })

            def merge(t: pa.Table) -> pa.Table:
                g = t.group_by("b").aggregate([("c", "sum")])
                return pa.table({
                    "b": g.column("b").cast(pa.int64()),
                    "c": g.column("c_sum").cast(pa.int64()),
                })

            refs = list(
                rd.read_parquet(
                    path, columns=[col],
                    override_num_blocks=_num_read_blocks(),
                )
                .map_batches(partial, batch_format="pyarrow")
                .to_arrow_refs()
            )
            return tree_reduce_tables(refs, merge).to_pandas()

        # key range from orders (orderkey unique there)
        import ray

        ds = read_cols(sf_dir, "orders", ["o_orderkey"])
        lo = int(ds.min("o_orderkey"))
        hi = int(ds.max("o_orderkey"))
        width = (hi - lo) // N_BUCKETS + 1
        ho = hist_of(f"{sf_dir}/orders.parquet", "o_orderkey",
                     lo, width)
        hl = hist_of(f"{sf_dir}/lineitem.parquet", "l_orderkey",
                     lo, width)
        co = dict(zip(ho["b"].astype(int), ho["c"].astype(int)))
        cl = dict(zip(hl["b"].astype(int), hl["c"].astype(int)))
        est = 0.0
        for b in sorted(set(co) | set(cl)):  # bucket-ordered fold
            est = est + (float(co.get(b, 0)) * float(cl.get(b, 0))
                         / float(width))
        # exact semi-join count: broadcast the sorted orders key
        # array once (ray.put), vectorized isin per block
        okeys = np.sort(
            rd.read_parquet(
                f"{sf_dir}/orders.parquet", columns=["o_orderkey"],
            ).to_pandas()["o_orderkey"].to_numpy(np.int64))
        okeys_ref = ray.put(okeys)

        def count_sj(t: pa.Table) -> pa.Table:
            ks = ray.get(okeys_ref)
            if "l_orderkey" not in t.column_names:
                return pa.table(
                    {"c": pa.array([0], type=pa.int64())})
            v = t.column("l_orderkey").to_numpy(
                zero_copy_only=False).astype(np.int64)
            c = int(np.isin(v, ks, assume_unique=False).sum())
            return pa.table({"c": pa.array([c], type=pa.int64())})

        refs = list(
            read_cols(sf_dir, "lineitem", ["l_orderkey"])
            .map_batches(count_sj, batch_format="pyarrow")
            .to_arrow_refs()
        )
        import pyarrow as _pa
        actual = int(
            _pa.concat_tables(ray.get(refs))
            .column("c").to_pandas().sum())
        qerr = (est / float(actual) if est >= float(actual)
                else float(actual) / est)
        return pa.table({
            "n_buckets": pa.array([N_BUCKETS], type=pa.int64()),
            "est": pa.array([est], type=pa.float64()),
            "actual": pa.array([actual], type=pa.int64()),
            "q_error": pa.array([qerr], type=pa.float64()),
        })

    sql = f"""
    WITH r AS (
        SELECT min(o_orderkey) AS lo,
               (max(o_orderkey) - min(o_orderkey)) // {N_BUCKETS} + 1
                   AS w
        FROM orders
    ),
    ho AS (
        SELECT (o_orderkey - r.lo) // r.w AS b,
               CAST(count(*) AS BIGINT) AS c
        FROM orders CROSS JOIN r GROUP BY 1
    ),
    hl AS (
        SELECT (l_orderkey - r.lo) // r.w AS b,
               CAST(count(*) AS BIGINT) AS c
        FROM lineitem CROSS JOIN r GROUP BY 1
    ),
    terms AS (
        SELECT COALESCE(ho.b, hl.b) AS b,
               CAST(COALESCE(ho.c, 0) AS DOUBLE)
               * CAST(COALESCE(hl.c, 0) AS DOUBLE)
               / CAST((SELECT w FROM r) AS DOUBLE) AS term
        FROM ho FULL OUTER JOIN hl ON hl.b = ho.b
    ),
    e AS (
        SELECT list_reduce(list_prepend(0.0e0,
                   list(term ORDER BY b)), (a, b) -> a + b) AS est
        FROM terms
    ),
    act AS (
        SELECT CAST(count(*) AS BIGINT) AS actual
        FROM lineitem l
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_orderkey = l.l_orderkey)
    )
    SELECT CAST({N_BUCKETS} AS BIGINT) AS n_buckets,
           e.est AS est,
           act.actual AS actual,
           CASE WHEN e.est >= CAST(act.actual AS DOUBLE)
                THEN e.est / CAST(act.actual AS DOUBLE)
                ELSE CAST(act.actual AS DOUBLE) / e.est
           END AS q_error
    FROM e, act
    """
    return q, sql


# --------------------------------------------------------- bloom_fpr_measured
def _bloom_query():
    def q(sf_dir: str):
        import ray
        import ray.data as rd

        def positions(keys: np.ndarray) -> np.ndarray:
            out = []
            for aj in HASH_A:
                h = (keys * np.int64(aj)) % np.int64(1 << 32)
                out.append(h >> np.int64(BLOOM_SHIFT))
            return np.unique(np.concatenate(out))

        def build_partial(t: pa.Table) -> pa.Table:
            if "c_custkey" not in t.column_names or t.num_rows == 0:
                return pa.table(
                    {"pos": pa.array([], type=pa.int64())})
            k = t.column("c_custkey").to_numpy(
                zero_copy_only=False).astype(np.int64)
            return pa.table({"pos": pa.array(positions(k))})

        refs = list(
            read_cols(sf_dir, "customer", ["c_custkey"])
            .map_batches(build_partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        import pyarrow as _pa
        allpos = np.unique(
            _pa.concat_tables(ray.get(refs))
            .column("pos").to_numpy(zero_copy_only=False))
        bitset = np.zeros(BLOOM_M, dtype=bool)
        bitset[allpos] = True
        bits_ref = ray.put(bitset)

        # n_keys for the theoretical rate
        n_keys = int(rd.read_parquet(
            f"{sf_dir}/customer.parquet", columns=["c_custkey"],
        ).count())

        def probe(t: pa.Table) -> pa.Table:
            bs = ray.get(bits_ref)
            empty = pa.table({
                "probes": pa.array([0], type=pa.int64()),
                "fp": pa.array([0], type=pa.int64()),
            })
            if "c_custkey" not in t.column_names or t.num_rows == 0:
                return empty
            k = (t.column("c_custkey").to_numpy(
                zero_copy_only=False).astype(np.int64)
                + np.int64(PROBE_OFFSET))
            passed = np.ones(k.size, dtype=bool)
            for aj in HASH_A:
                h = (k * np.int64(aj)) % np.int64(1 << 32)
                passed &= bs[h >> np.int64(BLOOM_SHIFT)]
            return pa.table({
                "probes": pa.array([int(k.size)], type=pa.int64()),
                "fp": pa.array([int(passed.sum())],
                               type=pa.int64()),
            })

        prefs = list(
            read_cols(sf_dir, "customer", ["c_custkey"])
            .map_batches(probe, batch_format="pyarrow")
            .to_arrow_refs()
        )
        pt = _pa.concat_tables(ray.get(prefs)).to_pandas()
        probes = int(pt["probes"].sum())
        fp = int(pt["fp"].sum())
        fpr = float(fp) / float(probes)
        theo = (1.0 - math.exp(
            -(float(len(HASH_A)) * float(n_keys))
            / float(BLOOM_M))) ** len(HASH_A)
        return pa.table({
            "m_bits": pa.array([BLOOM_M], type=pa.int64()),
            "k_hashes": pa.array([len(HASH_A)], type=pa.int64()),
            "n_keys": pa.array([n_keys], type=pa.int64()),
            "bits_set": pa.array([int(allpos.size)],
                                 type=pa.int64()),
            "probes": pa.array([probes], type=pa.int64()),
            "false_pos": pa.array([fp], type=pa.int64()),
            "fpr": pa.array([fpr], type=pa.float64()),
            "fpr_theory": pa.array([theo], type=pa.float64()),
        })

    h_exprs_build = " UNION ".join(
        f"SELECT ((c_custkey * {aj}) % 4294967296)"
        f" // {1 << BLOOM_SHIFT} AS pos FROM customer"
        for aj in HASH_A
    )
    probe_pass = " AND ".join(
        f"EXISTS (SELECT 1 FROM bits WHERE bits.pos ="
        f" (((c_custkey + {PROBE_OFFSET}) * {aj}) % 4294967296)"
        f" // {1 << BLOOM_SHIFT})"
        for aj in HASH_A
    )
    sql = f"""
    WITH bits AS (
        SELECT DISTINCT pos FROM ({h_exprs_build})
    ),
    nk AS (SELECT CAST(count(*) AS BIGINT) AS n FROM customer),
    pr AS (
        SELECT CAST(count(*) AS BIGINT) AS probes,
               CAST(sum(CASE WHEN {probe_pass}
                        THEN 1 ELSE 0 END) AS BIGINT) AS fp
        FROM customer
    )
    SELECT CAST({BLOOM_M} AS BIGINT) AS m_bits,
           CAST({len(HASH_A)} AS BIGINT) AS k_hashes,
           nk.n AS n_keys,
           (SELECT CAST(count(*) AS BIGINT) FROM bits) AS bits_set,
           pr.probes AS probes,
           pr.fp AS false_pos,
           CAST(pr.fp AS DOUBLE) / CAST(pr.probes AS DOUBLE) AS fpr,
           pow(1.0e0 - exp(-(CAST({len(HASH_A)} AS DOUBLE)
                             * CAST(nk.n AS DOUBLE))
                           / CAST({BLOOM_M} AS DOUBLE)),
               {float(len(HASH_A))!r}) AS fpr_theory
    FROM nk, pr
    """
    return q, sql


def build_wave122_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("join_cardinality_estimate",) + _cardest_query()))
    add(*(("bloom_fpr_measured",) + _bloom_query()))
    return queries, oracles
