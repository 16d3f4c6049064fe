"""Declared relational operator surface (SURVEY.md §2.2, Q01–Q21).

Spark-first: every query is phrased with the DataFrame API so Catalyst
gets a fully declarative plan (filter/projection pushdown into the
parquet scan, broadcast joins for the small dimensions, AQE for the
rest). The DuckDB oracle string is the same computation in ANSI SQL.

Scale notes are attached per query — the plans here are the ones we
want at 100 TB, not just ones that pass at sf0.01.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..catalog import load
from .base import query


def dec(col: str | Column, scale: int = 2) -> Column:
    """Exact decimal view of a 2-dp money double."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal(18,{scale})")


def cents(col: str | Column) -> Column:
    """2-dp money double → exact integer cents (long).

    Long-sum is ~2.5× faster than decimal-sum in Tungsten (and exact,
    and summation-order-independent) — the scale path for money aggs.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * 100).cast("long")


def csum(col: str | Column) -> Column:
    """Exact sum of a 2-dp money double via long cents, emitted as double."""
    return F.sum(cents(col)) / 100


# DuckDB-side equivalents for oracle strings. DuckDB sums BIGINT into
# HUGEINT, so cast back to BIGINT before the /100 double division.
def _cents_sql(col: str) -> str:
    return f"CAST(round({col}*100) AS BIGINT)"


def _csum_sql(col: str) -> str:
    return f"CAST(sum({_cents_sql(col)}) AS BIGINT) / 100"


# ---------------------------------------------------------------------------
# Q01 scan + project + filter
# Scale: filter & projection push into the parquet scan (PushedFilters on
# l_quantity/l_shipdate, ReadSchema only 2 cols) — no shuffle at all.
@query(
    "q01_scan_filter",
    oracle="""
    SELECT l_orderkey, l_extendedprice
    FROM lineitem
    WHERE l_quantity > 30 AND l_shipdate >= TIMESTAMP '1995-01-01'
    """,
    doc="scan+project+filter with full parquet pushdown",
)
def q01(spark: SparkSession, sf: str) -> DataFrame:
    return (
        load(spark, sf, "lineitem")
        .filter((F.col("l_quantity") > 30) & (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp")))
        .select("l_orderkey", "l_extendedprice")
    )


# Q02 IN / BETWEEN / LIKE predicates — all pushdown-able scan predicates.
@query(
    "q02_predicates",
    oracle="""
    SELECT o_orderkey FROM orders
    WHERE o_orderstatus IN ('F','O')
      AND o_totalprice BETWEEN 1000 AND 5000
      AND o_orderpriority LIKE '1%'
    """,
    doc="IN/BETWEEN/LIKE predicate pushdown",
)
def q02(spark: SparkSession, sf: str) -> DataFrame:
    return (
        load(spark, sf, "orders")
        .filter(
            F.col("o_orderstatus").isin("F", "O")
            & F.col("o_totalprice").between(1000, 5000)
            & F.col("o_orderpriority").like("1%")
        )
        .select("o_orderkey")
    )


# Q03 inner equi-join.
# Scale: customer⋈orders is a shuffle join on the key; AQE picks
# sort-merge vs shuffle-hash from runtime sizes. Both sides pre-project
# to the join key + output cols so the shuffle payload is minimal.
@query(
    "q03_inner_join",
    oracle="""
    SELECT c.c_custkey, o.o_orderkey
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
    """,
    doc="inner equi-join, minimal shuffle payload",
)
def q03(spark: SparkSession, sf: str) -> DataFrame:
    c = load(spark, sf, "customer").select("c_custkey")
    o = load(spark, sf, "orders").select("o_custkey", "o_orderkey")
    return c.join(o, c.c_custkey == o.o_custkey, "inner").select("c_custkey", "o_orderkey")


# Q04 multi-way join over broadcast-sized dims + aggregate.
# Scale: nation (25 rows) and region (5 rows) are explicit broadcasts —
# the only shuffle is the final groupBy, and partial aggregation
# (map-side combine) reduces it to ~|nations| rows per task.
@query(
    "q04_multiway_broadcast_join",
    oracle="""
    SELECT n.n_name, r.r_name, count(*) AS cnt
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY n.n_name, r.r_name
    """,
    doc="star join with broadcast dims + hash agg",
)
def q04(spark: SparkSession, sf: str) -> DataFrame:
    c = load(spark, sf, "customer").select("c_nationkey")
    n = load(spark, sf, "nation")
    r = load(spark, sf, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name", "r_name")
        .agg(F.count("*").alias("cnt"))
    )


# Q05 left outer join + null handling.
@query(
    "q05_left_join",
    oracle="""
    SELECT c.c_custkey, coalesce(o.o_orderkey, -1) AS ok
    FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    """,
    doc="left outer join, null coalesce",
)
def q05(spark: SparkSession, sf: str) -> DataFrame:
    c = load(spark, sf, "customer").select("c_custkey")
    o = load(spark, sf, "orders").select("o_custkey", "o_orderkey")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .select("c_custkey", F.coalesce("o_orderkey", F.lit(-1).cast("long")).alias("ok"))
    )


# Q06 left semi join (reference S4's "has a status row" shape).
@query(
    "q06_semi_join",
    oracle="SELECT c_custkey FROM customer WHERE c_custkey IN (SELECT o_custkey FROM orders)",
    doc="left semi join (IN subquery)",
)
def q06(spark: SparkSession, sf: str) -> DataFrame:
    c = load(spark, sf, "customer")
    o = load(spark, sf, "orders").select("o_custkey")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey")


# Q07 left anti join — the reference's unprocessed-jobs scan
# (jobs/jobsdb.go:784-791: NOT IN (SELECT DISTINCT job_id FROM status)).
@query(
    "q07_anti_join",
    oracle="SELECT c_custkey FROM customer WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)",
    doc="left anti join (reference unprocessed-scan shape)",
)
def q07(spark: SparkSession, sf: str) -> DataFrame:
    c = load(spark, sf, "customer")
    o = load(spark, sf, "orders").select("o_custkey")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey")


# Q08 hash aggregate + HAVING, exact long-cents sums (see cents()).
# Scale: partial agg map-side; the shuffle carries one row per
# (flag,status) pair per task — tiny regardless of input size.
@query(
    "q08_agg_having",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {_csum_sql('l_quantity')} AS sq,
           {_csum_sql('l_extendedprice')} / count(*) AS ap,
           count(*) AS c
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    HAVING count(*) > 10
    """,
    doc="hash agg + having; exact integer-cents double sums",
)
def q08(spark: SparkSession, sf: str) -> DataFrame:
    li = load(spark, sf, "lineitem")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            csum("l_quantity").alias("sq"),
            (csum("l_extendedprice") / F.count("*")).alias("ap"),
            F.count("*").alias("c"),
        )
        .filter(F.col("c") > 10)
    )


# Q09 count distinct.
# Scale: exact distinct = 2-phase shuffle on o_custkey. At 100 TB prefer
# approx_count_distinct (see llmops.q_approx_distinct) — this exact form
# is the oracle-checkable contract.
@query(
    "q09_count_distinct",
    oracle="SELECT count(DISTINCT o_custkey) AS u FROM orders",
    doc="exact count distinct",
)
def q09(spark: SparkSession, sf: str) -> DataFrame:
    return load(spark, sf, "orders").agg(F.countDistinct("o_custkey").alias("u"))


# Q10 ROLLUP.
@query(
    "q10_rollup",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, count(*) AS c
    FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
    doc="grouping sets / rollup",
)
def q10(spark: SparkSession, sf: str) -> DataFrame:
    return (
        load(spark, sf, "orders")
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("c"))
    )


# Q11 ranking window — the reference's latest-status-per-job pattern
# (jobs/jobsdb.go:557-559 MAX(id) GROUP BY job_id ≡ row_number()=1).
@query(
    "q11_window_rank",
    oracle="""
    SELECT event_id, user_id FROM (
      SELECT event_id, user_id,
             row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events) t
    WHERE rn = 1
    """,
    doc="latest-row-per-key via ranking window (reference S5/M3 shape)",
)
def q11(spark: SparkSession, sf: str) -> DataFrame:
    w = W.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        load(spark, sf, "events")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_id", "user_id")
    )


# Q12 analytic window with frame — running sum over exact integer
# cents, so the incremental vs segment-tree evaluation order of the two
# engines can't produce different doubles.
@query(
    "q12_window_running_sum",
    oracle=f"""
    SELECT o_custkey, o_orderkey,
           CAST(sum({_cents_sql('o_totalprice')}) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) / 100 AS run
    FROM orders
    """,
    doc="running-sum window frame",
)
def q12(spark: SparkSession, sf: str) -> DataFrame:
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        load(spark, sf, "orders")
        .select(
            "o_custkey",
            "o_orderkey",
            (F.sum(cents("o_totalprice")).over(w) / 100).alias("run"),
        )
    )


# Q13 lag/lead — inter-event gap in microseconds (BIGINT on both sides;
# raw timestamp-interval types don't hash-compare portably).
@query(
    "q13_window_lag",
    oracle="""
    SELECT event_id,
           epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
    FROM events
    """,
    doc="lag window: inter-event gap",
)
def q13(spark: SparkSession, sf: str) -> DataFrame:
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    return (
        load(spark, sf, "events")
        .select("event_id", "user_id", "ts")
        .withColumn("gap_us", us - F.lag(us).over(w))
        .select("event_id", "gap_us")
    )


# Q14 top-k. Scale: Spark compiles orderBy+limit to
# TakeOrderedAndProject — per-partition partial top-k then a k-row merge
# on the driver; no global sort shuffle.
@query(
    "q14_topk",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
    """,
    doc="top-k via TakeOrderedAndProject (no global sort)",
)
def q14(spark: SparkSession, sf: str) -> DataFrame:
    return (
        load(spark, sf, "orders")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
        .select("o_orderkey", "o_totalprice")
    )


# Q15 set operations — UNION ALL / INTERSECT / EXCEPT in ONE spec (the
# three results share a schema, so a tag column keeps each individually
# hash-verified while spending a single slot in the driver's
# 50-entry correctness window).
@query(
    "q15_setops",
    oracle="""
    SELECT 'union_all' AS op, k FROM (
      SELECT c_nationkey AS k FROM customer UNION ALL SELECT s_nationkey FROM supplier)
    UNION ALL
    SELECT 'intersect' AS op, k FROM (
      SELECT c_nationkey AS k FROM customer INTERSECT SELECT s_nationkey FROM supplier)
    UNION ALL
    SELECT 'except' AS op, k FROM (
      SELECT c_nationkey AS k FROM customer EXCEPT SELECT s_nationkey FROM supplier)
    """,
    doc="set operations: union all + intersect + except (tagged union)",
)
def q15(spark: SparkSession, sf: str) -> DataFrame:
    c = load(spark, sf, "customer").select(F.col("c_nationkey").alias("k"))
    s = load(spark, sf, "supplier").select(F.col("s_nationkey").alias("k"))
    tagged = [
        c.unionAll(s).select(F.lit("union_all").alias("op"), "k"),
        c.intersect(s).select(F.lit("intersect").alias("op"), "k"),
        # subtract == EXCEPT (set/distinct) semantics, same as DuckDB
        c.subtract(s).select(F.lit("except").alias("op"), "k"),
    ]
    out = tagged[0]
    for t in tagged[1:]:
        out = out.unionByName(t)
    return out


# Q16 scalar string functions (all JVM-side, codegen'd — no UDFs).
@query(
    "q16_string_fns",
    oracle="""
    SELECT p_partkey, upper(p_name) AS u, substr(p_brand, 1, 5) AS b5,
           CAST(length(p_type) AS BIGINT) AS lt,
           concat(p_brand, '#', p_type) AS ct, trim(p_name) AS tr,
           replace(p_type, ' ', '_') AS rp
    FROM part
    """,
    doc="scalar string functions",
)
def q16(spark: SparkSession, sf: str) -> DataFrame:
    return load(spark, sf, "part").select(
        "p_partkey",
        F.upper("p_name").alias("u"),
        F.substring("p_brand", 1, 5).alias("b5"),
        F.length("p_type").cast("long").alias("lt"),
        F.concat(F.col("p_brand"), F.lit("#"), F.col("p_type")).alias("ct"),
        F.trim("p_name").alias("tr"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("rp"),
    )


# Q17 scalar date functions (BIGINT on both sides — DuckDB's year()
# returns BIGINT, Spark's returns INT).
@query(
    "q17_date_fns",
    oracle="""
    SELECT o_orderkey, year(o_orderdate) AS y, month(o_orderdate) AS m,
           day(o_orderdate) AS d, date_trunc('month', o_orderdate) AS mo
    FROM orders
    """,
    doc="scalar date functions",
)
def q17(spark: SparkSession, sf: str) -> DataFrame:
    return load(spark, sf, "orders").select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("y"),
        F.month("o_orderdate").cast("long").alias("m"),
        F.dayofmonth("o_orderdate").cast("long").alias("d"),
        F.date_trunc("month", F.col("o_orderdate")).alias("mo"),
    )


# Q18 scalar math — exact integer-cents arithmetic so round() has
# identical inputs in both engines (round on raw binary doubles is not
# portable: Spark rounds the shortest decimal repr, DuckDB the binary).
# net = ep*(1-disc) rounded to cents: with P = ep_cents*(100-disc_cents)
# (exact integer), net = round(P/100)/100; P/100 half-cases are exact
# .5 doubles, rounded away-from-zero identically by both engines.
@query(
    "q18_math_fns",
    oracle=f"""
    SELECT l_orderkey, l_linenumber,
           CAST(round({_cents_sql('l_extendedprice')} * (100 - {_cents_sql('l_discount')}) / 100) AS BIGINT) / 100 AS net,
           abs({_cents_sql('l_discount')} - {_cents_sql('l_tax')}) / 100 AS adt,
           CAST(floor(l_quantity) AS BIGINT) AS fq,
           CAST(ceil(l_quantity) AS BIGINT) AS cq
    FROM lineitem
    """,
    doc="scalar math functions, exact integer-cents rounding",
)
def q18(spark: SparkSession, sf: str) -> DataFrame:
    li = load(spark, sf, "lineitem")
    net = F.round(cents("l_extendedprice") * (F.lit(100) - cents("l_discount")) / 100).cast("long") / 100
    return li.select(
        "l_orderkey",
        "l_linenumber",
        net.alias("net"),
        (F.abs(cents("l_discount") - cents("l_tax")) / 100).alias("adt"),
        F.floor("l_quantity").cast("long").alias("fq"),
        F.ceil("l_quantity").cast("long").alias("cq"),
    )


# Q19 conditional / null functions.
@query(
    "q19_case_nullif",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 10000 THEN 'big'
                WHEN o_totalprice > 1000 THEN 'mid' ELSE 'small' END AS bucket,
           nullif(o_orderstatus, 'O') AS ns
    FROM orders
    """,
    doc="case/nullif conditional logic",
)
def q19(spark: SparkSession, sf: str) -> DataFrame:
    return load(spark, sf, "orders").select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 10000, "big")
        .when(F.col("o_totalprice") > 1000, "mid")
        .otherwise("small")
        .alias("bucket"),
        F.nullif(F.col("o_orderstatus"), F.lit("O")).alias("ns"),
    )


# Q20 JSON extraction — the reference's envelope parsing (T1,
# misc/misc.go:114-129 ParseKassetteEventBatch) reduced to its Spark
# primitive. get_json_object ≡ DuckDB json_extract_string.
@query(
    "q20_json_extract",
    oracle="SELECT event_id, json_extract_string(props, '$.k') AS pk FROM events",
    doc="JSON field extraction (reference envelope-parse shape)",
)
def q20(spark: SparkSession, sf: str) -> DataFrame:
    return load(spark, sf, "events").select(
        "event_id", F.get_json_object("props", "$.k").alias("pk")
    )


# Q21 cast semantics (reference §1.2 toInt/toBool). Spark CAST(double AS
# BIGINT) truncates toward zero while DuckDB rounds — the oracle uses
# trunc() so both sides express the reference's truncating toInt
# (sources/camunda/transformer.go:11-35: float→int truncates).
@query(
    "q21_cast_semantics",
    oracle="""
    SELECT event_id, CAST(trunc(value) AS BIGINT) AS vi,
           CASE WHEN event_type = 'true' THEN true ELSE false END AS vb
    FROM events
    """,
    doc="reference toInt (truncating) / toBool ('true' only) semantics",
)
def q21(spark: SparkSession, sf: str) -> DataFrame:
    return load(spark, sf, "events").select(
        "event_id",
        F.col("value").cast("long").alias("vi"),
        (F.col("event_type") == "true").alias("vb"),
    )
