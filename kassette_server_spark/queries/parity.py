"""Pipeline-parity and subquery queries (SURVEY.md §2.2, Q22–Q27).

These encode reference pipeline behaviors as oracle-checkable batch
queries: transform rules (T7–T9), timestamp skew (T4), sessionization
(W1/W2), exact dedup, plus the correlated/EXISTS subquery surface the
relational core must support.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..catalog import load
from .base import query
from .relational import cents


# Q22 field_map + field_hide + field_delete (reference T7-T9,
# processor/transformer.go:123-148): rename event_id→id, hide
# props/user_id/event_type, drop rows where event_type = 'click'.
@query(
    "q22_rules_map_hide_delete",
    oracle="""
    SELECT event_id AS id, ts, value FROM events WHERE NOT (event_type = 'click')
    """,
    doc="transform-rule parity: field_map/field_hide/field_delete (T7-T9)",
)
def q22(spark: SparkSession, sf: str) -> DataFrame:
    return (
        load(spark, sf, "events")
        .filter(~(F.col("event_type") == "click"))
        .select(F.col("event_id").alias("id"), "ts", "value")
    )


# Q23 skew-corrected timestamp (reference T4,
# processor/processor.go:329-344: timestamp = receivedAt − (sentAt −
# originalTimestamp)); fixed literal skew keeps it deterministic.
@query(
    "q23_timestamp_skew",
    oracle="SELECT event_id, ts + INTERVAL 42 SECOND AS adj FROM events",
    doc="timestamp arithmetic parity (T4 skew correction shape)",
)
def q23(spark: SparkSession, sf: str) -> DataFrame:
    return load(spark, sf, "events").select(
        "event_id", (F.col("ts") + F.expr("INTERVAL 42 SECONDS")).alias("adj")
    )


# Q24 batch sessionization (reference W1/W2,
# processor/processor.go:346-420, 525-576): 30-minute inactivity gap →
# session islands via lag + running sum. In streaming this is
# session_window(ts, '30 minutes'); this is the exact batch analogue.
# Scale: one shuffle on user_id; windows evaluate within partitions.
# Skewed users are handled by AQE; count/min/max aggregate per session.
@query(
    "q24_sessionize",
    oracle="""
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id, count(*) AS n,
           min(ts) AS s, max(ts) AS e
    FROM (
      SELECT user_id, ts,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS session_id
      FROM (
        SELECT *, CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                            > INTERVAL 30 MINUTE
                       OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS is_new
        FROM events) a) b
    GROUP BY user_id, session_id
    """,
    doc="gap-based sessionization in batch (W1/W2 parity)",
)
def q24(spark: SparkSession, sf: str) -> DataFrame:
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    is_new = F.when(
        prev.isNull() | (F.unix_micros(F.col("ts")) - F.unix_micros(prev) > 30 * 60 * 1_000_000),
        1,
    ).otherwise(0)
    return (
        load(spark, sf, "events")
        .withColumn("is_new", is_new)
        .withColumn("session_id", F.sum("is_new").over(w).cast("long"))
        .groupBy("user_id", "session_id")
        .agg(F.count("*").alias("n"), F.min("ts").alias("s"), F.max("ts").alias("e"))
    )


# Q25 exact dedup, keep-first (north-star; also reference ledger-dedup
# on messageId). dropDuplicates can't pick *which* row survives, so the
# deterministic contract is min(key) per group.
@query(
    "q25_dedup_exact",
    oracle="""
    SELECT user_id, event_type, min(event_id) AS keeper
    FROM events GROUP BY user_id, event_type
    """,
    doc="exact dedup: deterministic keeper per duplicate group",
)
def q25(spark: SparkSession, sf: str) -> DataFrame:
    return (
        load(spark, sf, "events")
        .groupBy("user_id", "event_type")
        .agg(F.min("event_id").alias("keeper"))
    )


# Q26 correlated scalar subquery → decorrelated: per-nation average
# (exact via integer cents) joined back, broadcast because |nations| is
# tiny.
@query(
    "q26_correlated_subquery",
    oracle="""
    SELECT c_custkey FROM customer c
    WHERE c_acctbal > (
      SELECT CAST(sum(CAST(round(c2.c_acctbal*100) AS BIGINT)) AS BIGINT) / 100 / count(*)
      FROM customer c2 WHERE c2.c_nationkey = c.c_nationkey)
    """,
    doc="correlated scalar subquery (decorrelated to broadcast join)",
)
def q26(spark: SparkSession, sf: str) -> DataFrame:
    c = load(spark, sf, "customer")
    avgs = (
        c.groupBy("c_nationkey")
        .agg((F.sum(cents("c_acctbal")) / 100 / F.count("*")).alias("nav"))
    )
    return (
        c.join(F.broadcast(avgs), "c_nationkey")
        .filter(F.col("c_acctbal") > F.col("nav"))
        .select("c_custkey")
    )


# Q27 EXISTS — semi join with a pushed-down filter on the inner side.
@query(
    "q27_exists",
    oracle="""
    SELECT p_partkey FROM part p
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_partkey = p.p_partkey AND l.l_quantity > 45)
    """,
    doc="EXISTS as filtered left-semi join",
)
def q27(spark: SparkSession, sf: str) -> DataFrame:
    p = load(spark, sf, "part")
    li = load(spark, sf, "lineitem").filter(F.col("l_quantity") > 45).select("l_partkey")
    return p.join(li, p.p_partkey == li.l_partkey, "left_semi").select("p_partkey")
