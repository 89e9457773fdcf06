"""Wave-258 queries: distinct-substring complexity and Huffman cost.

events_distinct_substrings: the number of distinct substrings of the
daily error up-move chain — the suffix-array identity
n(n+1)/2 − Σ LCP(adjacent sorted suffixes), all exact integers; the
SQL oracle sorts the suffixes lexicographically and computes each
LCP as max{k : prefixes match}.  With the LZ76 row (wave-249) this
gives two independent complexity measures of the same binary chain.

corpus_huffman_cost: the EXACT optimal (Huffman) total code length
in bits for the corpus token distribution, via the classic greedy
fold — repeatedly merge the two smallest weights; the total cost
Σ(merge sums) is the unique optimal value regardless of tie-breaks,
so a sorted-list recursive CTE replays it bitwise.  Compared against
the Shannon bound Σ c·log2(N/c) (ordered float fold) — the
entropy-coding companion of the Elias/varint/RLE cost models.
"""

from __future__ import annotations

import math

import pyarrow as pa

from .queries import SQL_TOK

US_PER_DAY = 86_400_000_000


def distinct_substrings(s: str):
    """(n, count) via sorted suffixes + adjacent LCP."""
    n = len(s)
    suf = sorted(s[i:] for i in range(n))
    total = n * (n + 1) // 2
    lcp_sum = 0
    for a, b in zip(suf[:-1], suf[1:]):
        k = 0
        m = min(len(a), len(b))
        while k < m and a[k] == b[k]:
            k += 1
        lcp_sum += k
    return n, total - lcp_sum


def huffman_cost(weights):
    """(total_bits, shannon_bits) — greedy merge fold + entropy
    bound with an ordered sequential float fold."""
    ws = sorted(weights)
    acc = 0
    while len(ws) >= 2:
        a = ws.pop(0)
        b = ws.pop(0)
        m = a + b
        acc += m
        # insert keeping sorted order (linear is fine: bounded alphabet)
        i = 0
        while i < len(ws) and ws[i] < m:
            i += 1
        ws.insert(i, m)
    n = sum(weights)
    fn = float(n)
    h = 0.0
    for c in weights:           # ascending token order by caller
        h = h + float(c) * (math.log(fn / float(c))
                            / math.log(2.0))
    return acc, h


# --------------------------------------- events_distinct_substrings
def _substr_query():
    def q(sf_dir: str):
        from .queries_wave207 import _daily_ep

        e, _ = _daily_ep(sf_dir)
        y = [int(v) for v in e]
        s = "".join("1" if b > a else "0"
                    for a, b in zip(y[:-1], y[1:]))
        n, cnt = distinct_substrings(s)
        return pa.table({
            "n_chars": pa.array([n], type=pa.int64()),
            "distinct_substrings": pa.array([cnt],
                                            type=pa.int64()),
            "fill_ratio": pa.array(
                [float(cnt) / float(n * (n + 1) // 2)],
                type=pa.float64()),
        })

    sql = f"""
    WITH ev AS (
        SELECT epoch_us(ts) // {US_PER_DAY} AS day,
               CASE WHEN event_type = 'error' THEN 1 ELSE 0 END
                   AS is_e
        FROM events
    ),
    span AS (SELECT min(day) AS lo, max(day) AS hi FROM ev),
    grid AS (
        SELECT CAST(unnest(generate_series(lo, hi)) AS BIGINT)
                   AS day
        FROM span
    ),
    d AS (
        SELECT g.day, CAST(coalesce(c.e, 0) AS BIGINT) AS y
        FROM grid g LEFT JOIN (
            SELECT day, sum(is_e) AS e FROM ev GROUP BY day
        ) c ON g.day = c.day
    ),
    moves AS (
        SELECT day,
               CASE WHEN y > lag(y) OVER (ORDER BY day)
                    THEN '1' ELSE '0' END AS b,
               lag(y) OVER (ORDER BY day) AS prev
        FROM d
    ),
    str AS (
        SELECT string_agg(b, '' ORDER BY day) AS s,
               CAST(count(*) AS BIGINT) AS n
        FROM moves WHERE prev IS NOT NULL
    ),
    sufs AS (
        SELECT substr((SELECT s FROM str), CAST(i AS INT)) AS suf
        FROM (SELECT unnest(generate_series(1,
                  (SELECT CAST(n AS INT) FROM str))) AS i)
    ),
    ordered AS (
        SELECT suf,
               lag(suf) OVER (ORDER BY suf) AS prev
        FROM sufs
    ),
    kg AS (
        SELECT unnest(generate_series(0,
            (SELECT CAST(n AS INT) FROM str))) AS k
    ),
    lcps AS (
        SELECT CAST(max(CASE WHEN kg.k <= length(o.suf)
                              AND kg.k <= length(o.prev)
                              AND substr(o.suf, 1,
                                         CAST(kg.k AS INT))
                                  = substr(o.prev, 1,
                                           CAST(kg.k AS INT))
                         THEN kg.k ELSE 0 END) AS BIGINT) AS lcp
        FROM ordered o CROSS JOIN kg
        WHERE o.prev IS NOT NULL
        GROUP BY o.suf, o.prev
    )
    SELECT str.n AS n_chars,
           str.n * (str.n + 1) // 2
               - (SELECT CAST(coalesce(sum(lcp), 0) AS BIGINT)
                  FROM lcps) AS distinct_substrings,
           CAST(str.n * (str.n + 1) // 2
                - (SELECT coalesce(sum(lcp), 0) FROM lcps)
                AS DOUBLE)
           / CAST(str.n * (str.n + 1) // 2 AS DOUBLE)
               AS fill_ratio
    FROM str
    """
    return q, sql


# -------------------------------------------- corpus_huffman_cost
def _huffman_query():
    def q(sf_dir: str):
        from .queries_wave187 import _token_hist

        h = _token_hist(sf_dir)
        weights = [int(v) for v in
                   h.sort_values("token")["f"]]
        bits, shannon = huffman_cost(weights)
        return pa.table({
            "alphabet": pa.array([len(weights)], type=pa.int64()),
            "huffman_bits": pa.array([bits], type=pa.int64()),
            "shannon_bits": pa.array([shannon],
                                     type=pa.float64()),
            "overhead": pa.array(
                [float(bits) / shannon], type=pa.float64()),
        })

    sql = f"""
    WITH tok AS ({SQL_TOK}),
    hist AS (
        SELECT token, CAST(count(*) AS BIGINT) AS f
        FROM tok GROUP BY token
    ),
    nn AS (SELECT CAST(sum(f) AS BIGINT) AS n FROM hist),
    huff AS (
        WITH RECURSIVE r AS (
            SELECT (SELECT list_sort(list(f)) FROM hist) AS ws,
                   CAST(0 AS BIGINT) AS acc
            UNION ALL
            SELECT list_sort(list_append(ws[3:], ws[1] + ws[2])),
                   acc + ws[1] + ws[2]
            FROM r WHERE len(ws) >= 2
        )
        SELECT acc FROM r WHERE len(ws) = 1
    ),
    sh AS (
        SELECT list_reduce(list_prepend(0.0e0,
                   list(CAST(f AS DOUBLE)
                        * (ln(CAST((SELECT n FROM nn) AS DOUBLE)
                              / CAST(f AS DOUBLE)) / ln(2.0e0))
                        ORDER BY token)),
                   (a, b) -> a + b) AS h
        FROM hist
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM hist)
               AS alphabet,
           huff.acc AS huffman_bits,
           sh.h AS shannon_bits,
           CAST(huff.acc AS DOUBLE) / sh.h AS overhead
    FROM huff CROSS JOIN sh
    """
    return q, sql


def build_wave258_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("events_distinct_substrings",) + _substr_query()))
    add(*(("corpus_huffman_cost",) + _huffman_query()))
    return queries, oracles
