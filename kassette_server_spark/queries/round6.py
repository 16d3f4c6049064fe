"""Round-6 specs (q140+): temporal point-in-time join and the
deterministic dataset splitter.

Registered AFTER the 50-spec driver window (queries/__init__.py), so
they ship on repo-oracle evidence this round and take their guaranteed
first-round slots in the r7 window per the standing rotation policy.

Determinism: q140 is pure integer/string/date equality — bit-exact.
q141's split assignment is one IEEE comparison of an exactly-
representable 52-bit md5 uniform against literal thresholds, identical
in both engines; the aggregates are exact integers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..operators.merge import point_in_time_join, point_in_time_oracle_sql
from ..operators.sampling import dataset_split, dataset_split_oracle_sql
from .base import query

# q140: what order-priority "tier" was in effect for the customer when
# each order was placed? The version table is the customer's priority
# history (first priority per order day — min() for determinism when a
# customer places twice on one day); every order then joins to the
# version whose [valid_from, next valid_from) interval contains its
# date. This is the SCD2-consumption query (merge.py builds such
# dimensions; this reads them), distinct from the as-of join (nearest
# EVENT) and the bucketized range join (intervals with no equi-key).
_Q140_FACTS = "SELECT o_orderkey, o_custkey, o_orderdate FROM orders"
_Q140_VERSIONS = (
    "SELECT o_custkey, o_orderdate AS prio_from, "
    "min(o_orderpriority) AS prio FROM orders GROUP BY 1, 2"
)


@query(
    "q140_point_in_time_join",
    oracle=point_in_time_oracle_sql(
        _Q140_FACTS,
        _Q140_VERSIONS,
        keys=["o_custkey"],
        fact_ts="o_orderdate",
        version_ts="prio_from",
        select="f.o_orderkey AS okey, v.prio_from AS since, v.prio AS prio_at_order",
    ),
    doc="temporal point-in-time join: each order paired with the "
    "customer-priority version in effect at its date (lead() close-out "
    "+ one co-partitioned equi-join with residual interval filter)",
    tags=("temporal", "join"),
)
def q140(spark: SparkSession, sf: str) -> DataFrame:
    orders = load(spark, sf, "orders")
    versions = (
        orders.groupBy("o_custkey", F.col("o_orderdate").alias("prio_from"))
        .agg(F.min("o_orderpriority").alias("prio"))
    )
    facts = orders.select("o_orderkey", "o_custkey", "o_orderdate")
    out = point_in_time_join(
        facts, versions, keys=["o_custkey"], fact_ts="o_orderdate", version_ts="prio_from"
    )
    return out.select(
        F.col("o_orderkey").alias("okey"),
        F.col("prio_from").alias("since"),
        F.col("prio").alias("prio_at_order"),
    )


@query(
    "q141_dataset_split",
    oracle=f"""
    SELECT source, split, count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS chars
    FROM ({dataset_split_oracle_sql("documents", "doc_id")})
    GROUP BY source, split
    """,
    doc="deterministic 98/1/1 train/val/test assignment (52-bit md5 "
    "uniform, map-only, stable under resharding) + per-source split "
    "audit counts",
    tags=("sampling", "llm"),
)
def q141(spark: SparkSession, sf: str) -> DataFrame:
    docs = dataset_split(load(spark, sf, "documents"), "doc_id")
    return docs.groupBy("source", "split").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("chars"),
    )


# q142: cheapest-smallest part frontier — Pareto skyline minimizing
# (retail price, size). Money becomes exact integer CENTS on both sides
# (DECIMAL(18,2)*100 → BIGINT) so dominance comparisons AND the hash
# compare are engine-exact (a DECIMAL output would hash '905.10' vs
# 905.1 across engines).
from ..operators.stats import (  # noqa: E402
    pareto_frontier_2d,
    pareto_frontier_oracle_sql,
    weighted_median_by,
    weighted_median_oracle_sql,
)

_Q142_PTS = (
    "SELECT CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
    " AS price_cents, p_size FROM part"
)


@query(
    "q142_pareto_frontier",
    oracle=pareto_frontier_oracle_sql(_Q142_PTS, "price_cents", "p_size"),
    doc="Pareto frontier (skyline) of parts minimizing (price, size): "
    "two-phase local-bucket prune + output-scale global pass",
    tags=("analytics", "skyline"),
)
def q142(spark: SparkSession, sf: str) -> DataFrame:
    pts = load(spark, sf, "part").select(
        (F.col("p_retailprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("price_cents"),
        "p_size",
    )
    return pareto_frontier_2d(pts, "price_cents", "p_size")


# cents via the house round(x*100) recipe on BOTH sides
# (queries/relational.cents): a bare double→BIGINT cast TRUNCATES in
# Spark but ROUNDS in DuckDB, so x*100 landing at n-epsilon diverges
# by one cent between engines (round-6 self-review #2 finding).
@query(
    "q143_weighted_median",
    oracle=weighted_median_oracle_sql(
        "SELECT l_returnflag, CAST(round(l_extendedprice * 100) AS BIGINT) AS cents, "
        "CAST(l_quantity AS BIGINT) AS qty FROM lineitem",
        "l_returnflag",
        "cents",
        "qty",
    ),
    doc="exact quantity-weighted median line price (cents) per return "
    "flag: duplicate-collapsed cumulative window, integer 2*cum>=tot "
    "test, broadcast totals",
    tags=("stats", "analytics"),
)
def q143(spark: SparkSession, sf: str) -> DataFrame:
    li = load(spark, sf, "lineitem").select(
        "l_returnflag",
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("cents"),
        F.col("l_quantity").cast("bigint").alias("qty"),
    )
    return weighted_median_by(li, "l_returnflag", "cents", "qty")
