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
