"""Round-8 third wave (q202-q211): the ten remaining TPC-H query
shapes, completing all 22 against the test schema.

round8b brought the six structurally-NOVEL remaining shapes (Q9, Q13,
Q15, Q19, Q21, Q22); these ten close the suite so the registry carries
every TPC-H plan shape end-to-end: correlated min-cost supplier (Q2),
EXISTS-with-date-arithmetic (Q4), single-scan filter-agg (Q6),
two-nation volume matrix (Q7), market-share numerator/denominator
pivot (Q8), returned-item revenue rollup (Q10), group-share HAVING
against a global total (Q11), two-way CASE pivot (Q12), promo share
by month (Q14), and distinct-supplier counting with an anti-join
exclusion (Q16).

Schema adaptations (TESTDATA.md — same policy as round8b's block):
no partsupp, so "supply" derives from lineitem's (l_partkey,
l_suppkey) pairs and Q2's supply cost is the min line price; no
l_commitdate/l_receiptdate, so Q4/Q12's lateness predicates become
ship-vs-order date arithmetic; no l_shipmode, so Q12 pivots over
l_returnflag; no p_container/p_mfgr, so Q2/Q16 filter on
p_size/p_type/p_brand only. The PLAN SHAPE each query exists to
exercise survives every swap.

Determinism: money as round(x*100) cents BIGINT on both sides; shares
emitted as (numerator, denominator) integer pairs instead of a
division (Q8, Q14); year()/month() cast to INTEGER on both sides;
every DuckDB aggregate output cast BIGINT (no HUGEINT reaches pandas).

Registered after the 50-spec driver window; first driver rows land
per the standing rotation (queries/__init__.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load
from ..operators.diagnostics import (
    shingle_saturation_oracle_sql,
    shingle_saturation_report,
)
from .base import query

# shared cents expression (reference: utils/misc.go money handling is
# int64 cents; recipe proven across the tpch.py / round8b.py specs).
# A function, not a module-level Column: classic-mode Column creation
# needs an active SparkContext, which doesn't exist at import time.
def _rev_cents() -> F.Column:
    return F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("bigint")


@query(
    "q202_tpch_q2_min_cost_supplier",
    oracle="""
    WITH supply AS (
      SELECT l_partkey, l_suppkey,
             MIN(CAST(round(l_extendedprice * 100) AS BIGINT)) AS cost_cents
      FROM lineitem GROUP BY 1, 2
    ),
    eu AS (
      SELECT sp.l_partkey, sp.cost_cents, s.s_name, s.s_acctbal, n.n_name
      FROM supply sp
      JOIN supplier s ON s.s_suppkey = sp.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey AND r.r_name = 'EUROPE'
      JOIN part p ON p.p_partkey = sp.l_partkey
                 AND p.p_size <= 10 AND p.p_type = 'LARGE'
    )
    SELECT l_partkey AS p_partkey, s_name, n_name AS nation, s_acctbal,
           cost_cents
    FROM (SELECT *, MIN(cost_cents) OVER (PARTITION BY l_partkey) AS _mn
          FROM eu)
    WHERE cost_cents = _mn
    """,
    doc="TPC-H Q2 shape (min-cost supplier per part in a region): the "
    "correlated MIN subquery is a window min over the already-joined "
    "region-filtered supply frame — no second supply scan; supply "
    "derives from lineitem (no partsupp) via one part+supp aggregate, "
    "and every dimension (supplier->nation->region, filtered part) "
    "rides a broadcast; ALL tied min-cost suppliers survive (no "
    "nondeterministic LIMIT)",
    tags=("tpch",),
)
def q202(spark: SparkSession, sf: str) -> DataFrame:
    supply = (
        load(spark, sf, "lineitem")
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.min(F.round(F.col("l_extendedprice") * 100).cast("bigint")).alias(
                "cost_cents"
            )
        )
    )
    s = load(spark, sf, "supplier").select(
        "s_suppkey", "s_name", "s_acctbal", "s_nationkey"
    )
    n = load(spark, sf, "nation")
    r = load(spark, sf, "region").where(F.col("r_name") == "EUROPE")
    dims = (
        s.join(n, s.s_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", F.col("n_name").alias("nation"))
    )
    p = (
        load(spark, sf, "part")
        .where((F.col("p_size") <= 10) & (F.col("p_type") == "LARGE"))
        .select("p_partkey")
    )
    eu = supply.join(F.broadcast(dims), supply.l_suppkey == dims.s_suppkey).join(
        F.broadcast(p), supply.l_partkey == p.p_partkey
    )
    w = Window.partitionBy("l_partkey")
    return (
        eu.withColumn("_mn", F.min("cost_cents").over(w))
        .where(F.col("cost_cents") == F.col("_mn"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            "s_name",
            "nation",
            "s_acctbal",
            "cost_cents",
        )
    )


@query(
    "q203_tpch_q4_priority_check",
    oracle="""
    SELECT o.o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-04-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY 1
    """,
    doc="TPC-H Q4 shape (order priority checking): EXISTS decorrelates "
    "to a LEFT SEMI join on the order key with the date-arithmetic "
    "residual predicate (ship >60 days after order — the test schema "
    "has no commit/receipt dates), so each qualifying order counts "
    "once no matter how many late lines it has; the quarter filter "
    "prunes orders before the join",
    tags=("tpch",),
)
def q203(spark: SparkSession, sf: str) -> DataFrame:
    o = load(spark, sf, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    li = load(spark, sf, "lineitem").select("l_orderkey", "l_shipdate")
    late = o.join(
        li,
        (li.l_orderkey == o.o_orderkey)
        & (li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count("*").alias("order_count"))


@query(
    "q204_tpch_q6_forecast_revenue",
    oracle="""
    SELECT CAST(sum(CAST(round(l_extendedprice * l_discount * 100)
                         AS BIGINT)) AS BIGINT) AS revenue_cents,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
      AND l_discount >= 0.05 AND l_discount <= 0.07
      AND l_quantity < 24
    """,
    doc="TPC-H Q6 shape (forecast revenue change): the pure "
    "scan-filter-aggregate — every predicate pushes to the parquet "
    "scan, no join, no shuffle beyond the 1-row final combine; "
    "discount literals compare against the stored doubles identically "
    "in both engines (same parquet bits, same IEEE compare)",
    tags=("tpch",),
)
def q204(spark: SparkSession, sf: str) -> DataFrame:
    li = load(spark, sf, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        F.sum(F.round(F.col("l_extendedprice") * F.col("l_discount") * 100).cast("bigint"))
        .cast("bigint")
        .alias("revenue_cents"),
        F.count("*").alias("n_lines"),
    )


@query(
    "q205_tpch_q7_volume_shipping",
    oracle="""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS INTEGER) AS l_year,
           CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100)
                         AS BIGINT)) AS BIGINT) AS volume_cents
    FROM lineitem l
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY 1, 2, 3
    """,
    doc="TPC-H Q7 shape (volume shipping between two nations): the "
    "supplier->nation side broadcasts and prunes lineitem BEFORE the "
    "one big orders join; the disjunctive two-nation pair predicate "
    "applies after both nation names are in scope, exactly as the "
    "reference plan requires (it cannot push to either side alone)",
    tags=("tpch",),
)
def q205(spark: SparkSession, sf: str) -> DataFrame:
    li = load(spark, sf, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    n = load(spark, sf, "nation")
    s = (
        load(spark, sf, "supplier")
        .join(n, F.col("s_nationkey") == n.n_nationkey)
        .where(F.col("n_name").isin("NATION_1", "NATION_2"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    c = (
        load(spark, sf, "customer")
        .join(n, F.col("c_nationkey") == n.n_nationkey)
        .where(F.col("n_name").isin("NATION_1", "NATION_2"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    o = load(spark, sf, "orders").select("o_orderkey", "o_custkey")
    joined = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .where(F.col("supp_nation") != F.col("cust_nation"))
    )
    return joined.groupBy(
        "supp_nation",
        "cust_nation",
        F.year("l_shipdate").cast("int").alias("l_year"),
    ).agg(F.sum(_rev_cents()).cast("bigint").alias("volume_cents"))


@query(
    "q206_tpch_q8_market_share",
    oracle="""
    SELECT CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
           CAST(sum(CASE WHEN n1.n_name = 'NATION_5'
                    THEN CAST(round(l.l_extendedprice * (1 - l.l_discount)
                                    * 100) AS BIGINT)
                    ELSE 0 END) AS BIGINT) AS nation_cents,
           CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100)
                         AS BIGINT)) AS BIGINT) AS total_cents
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey AND p.p_type = 'PROMO'
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
    JOIN region r ON r.r_regionkey = n2.n_regionkey AND r.r_name = 'AMERICA'
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY 1
    """,
    doc="TPC-H Q8 shape (national market share): the share is emitted "
    "as the (nation_cents, total_cents) integer pair instead of the "
    "reference's double division — hash-exact and recomputable by any "
    "consumer; part-type filter and both nation arms broadcast, so "
    "lineitem shuffles once (the orders join) and the CASE pivot "
    "computes numerator and denominator in the same aggregate pass",
    tags=("tpch",),
)
def q206(spark: SparkSession, sf: str) -> DataFrame:
    li = load(spark, sf, "lineitem").select(
        "l_partkey", "l_suppkey", "l_orderkey", _rev_cents().alias("_cents")
    )
    p = (
        load(spark, sf, "part")
        .where(F.col("p_type") == "PROMO")
        .select("p_partkey")
    )
    n = load(spark, sf, "nation")
    s = (
        load(spark, sf, "supplier")
        .join(n, F.col("s_nationkey") == n.n_nationkey)
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    r = load(spark, sf, "region").where(F.col("r_name") == "AMERICA")
    c = (
        load(spark, sf, "customer")
        .join(n, F.col("c_nationkey") == n.n_nationkey)
        .join(r, F.col("n_regionkey") == r.r_regionkey)
        .select("c_custkey")
    )
    o = load(spark, sf, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    joined = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
    )
    return joined.groupBy(
        F.year("o_orderdate").cast("int").alias("o_year")
    ).agg(
        F.sum(
            F.when(F.col("supp_nation") == "NATION_5", F.col("_cents")).otherwise(
                F.lit(0)
            )
        )
        .cast("bigint")
        .alias("nation_cents"),
        F.sum("_cents").cast("bigint").alias("total_cents"),
    )


@query(
    "q207_tpch_q10_returned_items",
    oracle="""
    SELECT c.c_custkey, c.c_name, n.n_name AS nation, c.c_acctbal,
           CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100)
                         AS BIGINT)) AS BIGINT) AS revenue_cents
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
      AND o.o_orderdate >= TIMESTAMP '1997-07-01'
      AND o.o_orderdate < TIMESTAMP '1997-10-01'
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R'
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    GROUP BY 1, 2, 3, 4
    """,
    doc="TPC-H Q10 shape (returned-item revenue by customer): the "
    "returnflag filter pushes to the lineitem scan and the quarter "
    "filter to the orders scan before their join; nation broadcasts; "
    "output is customer-cardinality (the reference LIMITs to 20 "
    "nondeterministically under revenue ties — the full aggregate is "
    "emitted instead, ordering left to the consumer)",
    tags=("tpch",),
)
def q207(spark: SparkSession, sf: str) -> DataFrame:
    o = load(spark, sf, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    li = (
        load(spark, sf, "lineitem")
        .where(F.col("l_returnflag") == "R")
        .select("l_orderkey", _rev_cents().alias("_cents"))
    )
    c = load(spark, sf, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_nationkey"
    )
    n = load(spark, sf, "nation").select(
        "n_nationkey", F.col("n_name").alias("nation")
    )
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
    )
    return joined.groupBy("c_custkey", "c_name", "nation", "c_acctbal").agg(
        F.sum("_cents").cast("bigint").alias("revenue_cents")
    )


@query(
    "q208_tpch_q11_important_stock",
    oracle="""
    WITH val AS (
      SELECT l.l_partkey,
             CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT))
                  AS BIGINT) AS value_cents
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
                   AND n.n_name = 'NATION_3'
      GROUP BY 1
    )
    SELECT l_partkey AS p_partkey, value_cents
    FROM val
    WHERE value_cents * 10000 > (SELECT sum(value_cents) FROM val)
    """,
    doc="TPC-H Q11 shape (important stock identification): the global "
    "total the HAVING compares against is a window sum over the "
    "already-aggregated part-cardinality value frame (the q185 "
    "move — no second lineitem scan for the scalar subquery); the "
    "share threshold is the integer inequality value*10000 > total, "
    "no division anywhere; supplier-nation filter broadcasts",
    tags=("tpch",),
)
def q208(spark: SparkSession, sf: str) -> DataFrame:
    n = load(spark, sf, "nation").where(F.col("n_name") == "NATION_3")
    s = (
        load(spark, sf, "supplier")
        .join(n, F.col("s_nationkey") == n.n_nationkey)
        .select("s_suppkey")
    )
    li = load(spark, sf, "lineitem").select(
        "l_partkey",
        "l_suppkey",
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("_cents"),
    )
    val = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .groupBy("l_partkey")
        .agg(F.sum("_cents").cast("bigint").alias("value_cents"))
    )
    # part-cardinality frame: the unpartitioned window is bounded by
    # |part|, same justification as q185's supplier-cardinality max
    total = F.sum("value_cents").over(Window.partitionBy())
    return (
        val.withColumn("_tot", total)
        .where(F.col("value_cents") * 10000 > F.col("_tot"))
        .select(F.col("l_partkey").alias("p_partkey"), "value_cents")
    )


@query(
    "q209_tpch_q12_shipmode_priority",
    oracle="""
    SELECT l.l_returnflag AS ship_class,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM orders o
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate < TIMESTAMP '1998-01-01'
      AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
    GROUP BY 1
    """,
    doc="TPC-H Q12 shape (shipping modes and order priority): the "
    "two-way CASE pivot counts urgent vs non-urgent lines per class "
    "in one aggregate; the test schema has no l_shipmode or "
    "commit/receipt dates, so l_returnflag stands in as the pivot "
    "class and 'late' is shipped >30 days after order date — the "
    "cross-table date-arithmetic predicate lands after the join, as "
    "in the reference plan",
    tags=("tpch",),
)
def q209(spark: SparkSession, sf: str) -> DataFrame:
    li = load(spark, sf, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = load(spark, sf, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    joined = li.join(o, li.l_orderkey == o.o_orderkey).where(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")
    )
    urgent = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return joined.groupBy(F.col("l_returnflag").alias("ship_class")).agg(
        F.sum(F.when(urgent, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
        F.sum(F.when(urgent, 0).otherwise(1)).cast("bigint").alias("low_line_count"),
    )


@query(
    "q210_tpch_q14_promo_share",
    oracle="""
    SELECT CAST(month(l.l_shipdate) AS INTEGER) AS ship_month,
           CAST(sum(CASE WHEN p.p_type = 'PROMO'
                    THEN CAST(round(l.l_extendedprice * (1 - l.l_discount)
                                    * 100) AS BIGINT)
                    ELSE 0 END) AS BIGINT) AS promo_cents,
           CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100)
                         AS BIGINT)) AS BIGINT) AS total_cents
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY 1
    """,
    doc="TPC-H Q14 shape (promotion effect, by ship month): promo "
    "share as the (promo_cents, total_cents) integer pair — same "
    "no-division policy as q206; part broadcasts (type column only), "
    "numerator and denominator fold in one aggregate over one "
    "lineitem scan",
    tags=("tpch",),
)
def q210(spark: SparkSession, sf: str) -> DataFrame:
    li = (
        load(spark, sf, "lineitem")
        .where(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .select("l_partkey", "l_shipdate", _rev_cents().alias("_cents"))
    )
    p = load(spark, sf, "part").select("p_partkey", "p_type")
    joined = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    return joined.groupBy(
        F.month("l_shipdate").cast("int").alias("ship_month")
    ).agg(
        F.sum(
            F.when(F.col("p_type") == "PROMO", F.col("_cents")).otherwise(F.lit(0))
        )
        .cast("bigint")
        .alias("promo_cents"),
        F.sum("_cents").cast("bigint").alias("total_cents"),
    )


@query(
    "q211_tpch_q16_supplier_counts",
    oracle="""
    WITH supply AS (
      SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
    )
    SELECT p.p_brand, p.p_type, p.p_size,
           CAST(count(DISTINCT sp.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM supply sp
    JOIN part p ON p.p_partkey = sp.l_partkey
    WHERE p.p_brand <> 'Brand#1' AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
      AND sp.l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY 1, 2, 3
    """,
    doc="TPC-H Q16 shape (parts/supplier relationship): supply pairs "
    "come from one lineitem DISTINCT (no partsupp); the complaint "
    "exclusion (negative balance stands in for the comment pattern) "
    "is a LEFT ANTI join against a broadcast supplier subset — NOT IN "
    "decorrelated without the NULL trap (s_suppkey is non-null); the "
    "distinct-supplier count groups by the filtered part attributes",
    tags=("tpch",),
)
def q211(spark: SparkSession, sf: str) -> DataFrame:
    supply = (
        load(spark, sf, "lineitem").select("l_partkey", "l_suppkey").distinct()
    )
    bad = (
        load(spark, sf, "supplier")
        .where(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    p = load(spark, sf, "part").where(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29)
    )
    kept = supply.join(
        F.broadcast(bad), supply.l_suppkey == bad.s_suppkey, "left_anti"
    ).join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
    return kept.groupBy("p_brand", "p_type", "p_size").agg(
        F.count_distinct("l_suppkey").alias("supplier_cnt")
    )


@query(
    "q212_shingle_saturation",
    oracle=shingle_saturation_oracle_sql("documents"),
    doc="shingle-space saturation pre-flight (the fourth pre-flight "
    "beside q163 skew / q189 join size / q193 zone-map): distinct-vs-"
    "possible shingles, df tail (max, exact-cumulative p99), and the "
    "exact all-shared-shingle candidate volume SUM C(df,2) in "
    "decimal(38,0) — the measurement that decides shingle order k "
    "before an exact dedup run (this corpus's 31-word vocabulary "
    "saturates k=3 and goes quadratic; SCALE.md 32x sweep)",
    tags=("diagnostics", "dedup", "scale"),
)
def q212(spark: SparkSession, sf: str) -> DataFrame:
    return shingle_saturation_report(load(spark, sf, "documents"))
