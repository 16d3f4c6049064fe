"""TPC-H-style showcase queries (q53–q55) adapted to the driver's
star schema — the canonical OLAP shapes a reference user would run for
reporting, with the engine's cents-exact money math and explicit
broadcast strategy.

q53 ≈ TPC-H Q1 (pricing summary, all aggregates)
q54 ≈ TPC-H Q3 (shipping-priority revenue top-k)
q55 ≈ TPC-H Q5 (local-supplier volume by nation within a region)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from .base import query
from .relational import _cents_sql, _csum_sql, cents, csum


@query(
    "q53_tpch_q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {_csum_sql('l_quantity')} AS sum_qty,
           {_csum_sql('l_extendedprice')} AS sum_base_price,
           CAST(sum({_cents_sql('l_extendedprice')} * (100 - {_cents_sql('l_discount')})) AS BIGINT) / 10000 AS sum_disc_price,
           {_csum_sql('l_quantity')} / count(*) AS avg_qty,
           {_csum_sql('l_extendedprice')} / count(*) AS avg_price,
           {_csum_sql('l_discount')} / count(*) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1 pricing summary (cents-exact, incl. discounted price)",
    tags=("tpch",),
)
def q53(spark: SparkSession, sf: str) -> DataFrame:
    li = load(spark, sf, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    )
    disc_price = F.sum(cents("l_extendedprice") * (F.lit(100) - cents("l_discount"))) / 10000
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        csum("l_quantity").alias("sum_qty"),
        csum("l_extendedprice").alias("sum_base_price"),
        disc_price.alias("sum_disc_price"),
        (csum("l_quantity") / F.count("*")).alias("avg_qty"),
        (csum("l_extendedprice") / F.count("*")).alias("avg_price"),
        (csum("l_discount") / F.count("*")).alias("avg_disc"),
        F.count("*").alias("count_order"),
    )


@query(
    "q54_tpch_q3_shipping_priority",
    oracle=f"""
    SELECT l.l_orderkey,
           CAST(sum({_cents_sql('l.l_extendedprice')} * (100 - {_cents_sql('l.l_discount')})) AS BIGINT) / 10000 AS revenue,
           o.o_orderdate
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
      AND l.l_shipdate > TIMESTAMP '1996-01-01'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, l.l_orderkey
    LIMIT 10
    """,
    doc="TPC-H Q3 shape: selective dims, join, agg, top-10 by revenue",
    tags=("tpch",),
)
def q54(spark: SparkSession, sf: str) -> DataFrame:
    c = (
        load(spark, sf, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    o = (
        load(spark, sf, "orders")
        .filter(F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
        .select("o_custkey", "o_orderkey", "o_orderdate")
    )
    li = (
        load(spark, sf, "lineitem")
        .filter(F.col("l_shipdate") > F.lit("1996-01-01").cast("timestamp"))
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    revenue = F.sum(cents("l_extendedprice") * (F.lit(100) - cents("l_discount"))) / 10000
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(revenue.alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate")
    )


@query(
    "q55_tpch_q5_local_volume",
    oracle=f"""
    SELECT n.n_name,
           CAST(sum({_cents_sql('l.l_extendedprice')} * (100 - {_cents_sql('l.l_discount')})) AS BIGINT) / 10000 AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND s.s_nationkey = c.c_nationkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name IN ('ASIA', 'EUROPE')
    GROUP BY n.n_name
    """,
    doc="TPC-H Q5 shape: 6-way join, broadcast dims, local-supplier filter",
    tags=("tpch",),
)
def q55(spark: SparkSession, sf: str) -> DataFrame:
    c = load(spark, sf, "customer").select("c_custkey", "c_nationkey")
    o = load(spark, sf, "orders").select("o_custkey", "o_orderkey")
    li = load(spark, sf, "lineitem").select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    s = load(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
    n = load(spark, sf, "nation")
    r = load(spark, sf, "region").filter(F.col("r_name").isin("ASIA", "EUROPE"))
    revenue = F.sum(cents("l_extendedprice") * (F.lit(100) - cents("l_discount"))) / 10000
    # supplier is NOT hinted: at TPC-H SF100k it is ~1B rows, so the
    # broadcast decision belongs to Catalyst statistics / AQE (which
    # still broadcasts it at small scale from file-size stats).
    # nation/region are constant-size (25/5 rows) — always hint those.
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, (li.l_suppkey == s.s_suppkey) & (s.s_nationkey == c.c_nationkey))
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(revenue.alias("revenue"))
    )


# q126 ≈ TPC-H Q7: bilateral shipping volume between two nations by
# year. Supplier/customer nations resolve through two BROADCAST nation
# joins (dimension side), the fact chain joins on its keys; revenue is
# the cents-exact discounted price.
@query(
    "q126_tpch_q7_volume_shipping",
    oracle=f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
           CAST(sum({_cents_sql('l.l_extendedprice')} * (100 - {_cents_sql('l.l_discount')})) AS BIGINT) / 10000
             AS revenue
    FROM lineitem l
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
    JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
    WHERE n1.n_name IN ('NATION_0', 'NATION_1', 'NATION_2', 'NATION_3')
      AND n2.n_name IN ('NATION_0', 'NATION_1', 'NATION_2', 'NATION_3')
      AND n1.n_name <> n2.n_name
      AND l.l_shipdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1996-12-31'
    GROUP BY n1.n_name, n2.n_name, year(l.l_shipdate)
    """,
    doc="TPC-H Q7 bilateral volume shipping (broadcast nation dims, "
    "cents-exact revenue)",
    tags=("tpch",),
)
def q126(spark: SparkSession, sf: str) -> DataFrame:
    li = load(spark, sf, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("l_shipdate") <= F.lit("1996-12-31").cast("timestamp"))
    )
    s = load(spark, sf, "supplier")
    o = load(spark, sf, "orders")
    c = load(spark, sf, "customer")
    n1 = load(spark, sf, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load(spark, sf, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    j = (
        li.join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("n1_key") == F.col("s_nationkey"))
        .join(F.broadcast(n2), F.col("n2_key") == F.col("c_nationkey"))
        .where(
            F.col("supp_nation").isin("NATION_0", "NATION_1", "NATION_2", "NATION_3")
            & F.col("cust_nation").isin("NATION_0", "NATION_1", "NATION_2", "NATION_3")
            & (F.col("supp_nation") != F.col("cust_nation"))
        )
    )
    rev = F.sum(cents("l_extendedprice") * (F.lit(100) - cents("l_discount"))) / 10000
    return j.groupBy(
        "supp_nation", "cust_nation", F.year("l_shipdate").cast("long").alias("l_year")
    ).agg(rev.alias("revenue"))


# q127 ≈ TPC-H Q10: returned-item revenue per customer in a quarter,
# top 20. Sort-limit is TakeOrderedAndProject; ties broken by custkey.
@query(
    "q127_tpch_q10_returned_items",
    oracle=f"""
    SELECT c.c_custkey, c.c_name, n.n_name,
           CAST(sum({_cents_sql('l.l_extendedprice')} * (100 - {_cents_sql('l.l_discount')})) AS BIGINT) / 10000
             AS revenue
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1995-10-01'
      AND o.o_orderdate < TIMESTAMP '1996-01-01'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c.c_custkey LIMIT 20
    """,
    doc="TPC-H Q10 returned-item reporting (top-20 by revenue, "
    "deterministic tiebreak)",
    tags=("tpch",),
)
def q127(spark: SparkSession, sf: str) -> DataFrame:
    c = load(spark, sf, "customer")
    o = load(spark, sf, "orders").where(
        (F.col("o_orderdate") >= F.lit("1995-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp"))
    )
    li = load(spark, sf, "lineitem").where(F.col("l_returnflag") == "R")
    n = load(spark, sf, "nation")
    rev = F.sum(cents("l_extendedprice") * (F.lit(100) - cents("l_discount"))) / 10000
    return (
        c.join(o, F.col("o_custkey") == F.col("c_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("c_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(rev.alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )
