"""Round-5 extension specs (q91–q96): record linkage, substring-level
dedup, HLL set algebra, SCD2, Markov transitions, k-means.

Each pairs a distributed operator with a DuckDB oracle that computes
the *identical* result — including the q91 case where the oracle is
the ground-truth all-pairs join, so the hash-match proves the blocked
plan loses no recall on this data, and the q96 case where two Lloyd
iterations are spelled out as CTEs with exact-integer centroid sums.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..operators.clustering import kmeans_fit
from ..operators.dedup import duplicated_span_stats
from ..operators.funnel import event_transitions
from ..operators.linkage import fuzzy_self_join_pairs, segment_blocking_keys
from ..operators.merge import scd2_apply
from ..operators.sketches import hll_algebra_oracle_sql, hll_set_algebra
from .base import query


# q91: blocked fuzzy self-join on customer names. The informative span
# of 'Customer#000000123' is its low digits; pigeonhole-segmenting the
# last 5 (positions 14–18) guarantees recall for one substitution
# there, which on this fixed-format data is ALL lev<=1 pairs — so the
# oracle can be the ground-truth all-pairs join and the hash-match
# proves the blocking lost nothing. (An all-pairs ORACLE is fine: it
# runs at gate scale only. The Spark side never cross-joins — plan
# lock in tests/test_round5_ops.py.)
@query(
    "q91_fuzzy_match",
    oracle="""
    SELECT a.c_custkey AS a_id, b.c_custkey AS b_id,
           CAST(levenshtein(a.c_name, b.c_name) AS INT) AS dist
    FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
    WHERE levenshtein(a.c_name, b.c_name) <= 1
    """,
    doc="blocked edit-distance record linkage (pigeonhole segments + lev verify)",
    tags=("linkage", "llm"),
)
def q91(spark: SparkSession, sf: str) -> DataFrame:
    cust = load(spark, sf, "customer")
    keys = segment_blocking_keys(
        "c_name", start=14, length=5, max_dist=1, n_segments=5
    )
    return fuzzy_self_join_pairs(cust, "c_custkey", "c_name", keys, max_dist=1)


# q92: substring-level duplication profile (Lee et al. 2022): a token
# position is duplicated iff its 8-token gram occurs >1 time
# corpus-wide. The oracle rebuilds positional grams with
# unnest(range()) and groups by the gram STRING; the engine groups by
# xxhash64(gram) — 8-byte shuffle keys — which agrees absent a 64-bit
# collision (~1e-8 at 1e5 grams).
@query(
    "q92_substring_dedup",
    oracle="""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    grams AS (
      SELECT doc_id, u.i AS pos, array_to_string(t[u.i:u.i+7], ' ') AS gram
      FROM toks,
           unnest(CAST(range(1, greatest(len(t) - 8 + 2, 1)) AS BIGINT[])) AS u(i)
    ),
    tot AS (SELECT gram, count(*) AS occ FROM grams GROUP BY gram)
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_grams,
           CAST(sum(CASE WHEN occ > 1 THEN 1 ELSE 0 END) AS BIGINT) AS dup_grams,
           CAST(sum(CASE WHEN occ > 1 THEN 1 ELSE 0 END) AS DOUBLE) / count(*)
             AS dup_ratio
    FROM grams JOIN tot USING (gram)
    GROUP BY doc_id
    """,
    doc="per-doc duplicated k-token-span ratio (substring dedup signal)",
    tags=("dedup", "llm"),
)
def q92(spark: SparkSession, sf: str) -> DataFrame:
    return duplicated_span_stats(load(spark, sf, "documents"), k=8)


# q93: sketch set algebra — distinct 1995-buyers vs 1996-buyers, their
# union by register max-merge and intersection by inclusion-exclusion,
# all from the deterministic portable HLL (sketches.py), so even the
# *estimates* hash-match the oracle bit-for-bit.
@query(
    "q93_hll_set_algebra",
    oracle=hll_algebra_oracle_sql(
        "(SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995)",
        "(SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996)",
        "o_custkey",
    ),
    doc="HLL union / inclusion-exclusion intersection of two user sets",
    tags=("sketch", "llm"),
)
def q93(spark: SparkSession, sf: str) -> DataFrame:
    orders = load(spark, sf, "orders")
    a = orders.where(F.year("o_orderdate") == 1995)
    b = orders.where(F.year("o_orderdate") == 1996)
    return hll_set_algebra(a, b, "o_custkey")


# q94: SCD2 history build — customer dim as the open current rows,
# each customer's latest order closing it with a new version
# (operators/merge.scd2_apply, the MERGE-free formulation). Collapse
# of multi-updates = lexicographic max of (ts, attr) on both sides.
@query(
    "q94_scd2_history",
    oracle="""
    WITH upd AS (
      SELECT k, attr, valid_from FROM (
        SELECT o_custkey AS k, o_orderpriority AS attr,
               o_orderdate AS valid_from,
               row_number() OVER (
                 PARTITION BY o_custkey
                 ORDER BY o_orderdate DESC, o_orderpriority DESC
               ) AS rn
        FROM orders) z
      WHERE rn = 1
    )
    SELECT c.c_custkey AS k, c.c_mktsegment AS attr,
           TIMESTAMP '1994-01-01' AS valid_from,
           u.valid_from AS valid_to,
           (u.k IS NULL) AS is_current
    FROM customer c LEFT JOIN upd u ON c.c_custkey = u.k
    UNION ALL
    SELECT k, attr, valid_from, CAST(NULL AS TIMESTAMP) AS valid_to,
           TRUE AS is_current
    FROM upd
    """,
    doc="SCD2 close-and-append via anti-join+union MERGE emulation",
    tags=("merge",),
)
def q94(spark: SparkSession, sf: str) -> DataFrame:
    target = load(spark, sf, "customer").select(
        F.col("c_custkey").alias("k"),
        F.col("c_mktsegment").alias("attr"),
        F.lit("1994-01-01").cast("timestamp").alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    updates = load(spark, sf, "orders").select(
        F.col("o_custkey").alias("k"),
        F.col("o_orderpriority").alias("attr"),
        F.col("o_orderdate").cast("timestamp").alias("valid_from"),
    )
    return scd2_apply(target, updates, keys=["k"])


# q95: first-order Markov transition matrix over each user's event
# stream ((ts, event_id)-ordered lag, so burst ties are deterministic).
@query(
    "q95_event_transitions",
    oracle="""
    SELECT prev_type, cur_type, count(*) AS transitions FROM (
      SELECT coalesce(
               lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id),
               '_start') AS prev_type,
             event_type AS cur_type
      FROM events) z
    GROUP BY prev_type, cur_type
    """,
    doc="per-user event-type transition counts (path analysis)",
    tags=("analytics",),
)
def q95(spark: SparkSession, sf: str) -> DataFrame:
    return event_transitions(load(spark, sf, "events"))


# q96: two deterministic Lloyd iterations over (n_chars, token count),
# k=4, init = the 4 smallest doc_ids. The oracle spells both
# iterations as CTEs; centroid sums are exact BIGINTs, so the only
# floats are one division and the distance quadratic — bit-identical
# across engines (operators/clustering.py docstring).
@query(
    "q96_kmeans",
    oracle="""
    WITH pts AS (
      SELECT doc_id, CAST(n_chars AS BIGINT) AS x,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS y
      FROM documents
    ),
    c0 AS (
      SELECT CAST(row_number() OVER (ORDER BY doc_id) - 1 AS BIGINT) AS cid,
             CAST(x AS DOUBLE) AS cx, CAST(y AS DOUBLE) AS cy
      FROM pts ORDER BY doc_id LIMIT 4
    ),
    a1 AS (
      SELECT doc_id, x, y, cid FROM (
        SELECT p.doc_id, p.x, p.y, c.cid,
               row_number() OVER (
                 PARTITION BY p.doc_id
                 ORDER BY (p.x - c.cx) * (p.x - c.cx)
                        + (p.y - c.cy) * (p.y - c.cy), c.cid
               ) AS rn
        FROM pts p CROSS JOIN c0 c) z
      WHERE rn = 1
    ),
    c1 AS (
      SELECT cid, CAST(sum(x) AS DOUBLE) / count(*) AS cx,
             CAST(sum(y) AS DOUBLE) / count(*) AS cy
      FROM a1 GROUP BY cid
    ),
    a2 AS (
      SELECT doc_id, x, y, cid FROM (
        SELECT p.doc_id, p.x, p.y, c.cid,
               row_number() OVER (
                 PARTITION BY p.doc_id
                 ORDER BY (p.x - c.cx) * (p.x - c.cx)
                        + (p.y - c.cy) * (p.y - c.cy), c.cid
               ) AS rn
        FROM pts p CROSS JOIN c1 c) z
      WHERE rn = 1
    )
    SELECT CAST(cid AS BIGINT) AS cid, count(*) AS n,
           CAST(sum(x) AS DOUBLE) / count(*) AS c_x,
           CAST(sum(y) AS DOUBLE) / count(*) AS c_y
    FROM a2 GROUP BY cid
    """,
    doc="distributed Lloyd k-means, 2 deterministic iterations, k=4",
    tags=("clustering", "llm"),
)
def q96(spark: SparkSession, sf: str) -> DataFrame:
    pts = load(spark, sf, "documents").select(
        F.col("doc_id").alias("id"),
        F.col("n_chars").cast("double").alias("x"),
        F.size(F.split("text", " ")).cast("double").alias("y"),
    )
    return kmeans_fit(pts, ["x", "y"], k=4, iters=2, id_col="id")


# q97: salted join — the skew-mitigation shape (operators/layout.py:
# big side salted, small side replicated salt_buckets ways, shuffle key
# (key, salt)) with the oracle being the PLAIN join + aggregate, so the
# hash-match proves salting is result-invariant. Money summed as exact
# long cents per the relational.py convention.
@query(
    "q97_salted_join",
    oracle="""
    SELECT s_nationkey,
           count(*) AS n_items,
           CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) / 100
             AS revenue
    FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
    GROUP BY s_nationkey
    """,
    doc="skew-salted equi-join, result-identical to the plain join",
    tags=("layout",),
)
def q97(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.layout import salted_join

    li = load(spark, sf, "lineitem")
    supp = load(spark, sf, "supplier").withColumnRenamed("s_suppkey", "l_suppkey")
    joined = salted_join(li, supp, "l_suppkey", salt_buckets=8)
    return joined.groupBy("s_nationkey").agg(
        F.count("*").alias("n_items"),
        (F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")) / 100).alias(
            "revenue"
        ),
    )


# q98: last-touch attribution — every purchase credited to the user's
# most recent click strictly before it and within 1 hour; organic
# purchases keep null touch. Deterministic under same-ts bursts via the
# (ts, event_id) ordering key on both engines.
@query(
    "q98_attribution",
    oracle="""
    SELECT event_id AS conversion_id, user_id, ts,
           CASE WHEN last_click_ts IS NOT NULL
                 AND date_diff('second', last_click_ts, ts) <= 3600
                THEN last_click END AS touch_id,
           CASE WHEN last_click_ts IS NOT NULL
                 AND date_diff('second', last_click_ts, ts) <= 3600
                THEN date_diff('second', last_click_ts, ts) END AS gap_seconds
    FROM (
      SELECT event_id, user_id, ts, event_type,
             last_value(CASE WHEN event_type = 'click' THEN event_id END
                        IGNORE NULLS) OVER w AS last_click,
             last_value(CASE WHEN event_type = 'click' THEN ts END
                        IGNORE NULLS) OVER w AS last_click_ts
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    ) z
    WHERE event_type = 'purchase'
    """,
    doc="last-touch attribution (1h window, strictly-preceding click)",
    tags=("analytics",),
)
def q98(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.funnel import last_touch_attribution

    return last_touch_attribution(load(spark, sf, "events"))
