"""Round-8 second wave (q173+): correlation / hypothesis-test /
calibration / retrieval-eval statistics, governance and maintenance
operators, an item-item recommender core, and the six remaining
structurally-distinct TPC-H shapes adapted to the test schema (no
partsupp / comment / commitdate columns — the SHAPES are what matter:
multi-way profit join, left-join count distribution, view+max,
disjunctive pushdown, exists+not-exists, substring+avg-subquery).

Registered AFTER the 50-spec driver window (queries/__init__.py), so
they ship on repo-oracle evidence this round and take guaranteed
first-round slots in the r9 window per the standing rotation policy.

Determinism: the shared contract (operators/evaluation.py module
docstring) — BIGINT cores, one fixed-shape double expression at the
end, NULLIF/CASE guards mirrored on both engines, no libm
transcendentals, no float sums across rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load
from ..operators.evaluation import (
    mrr_at_k,
    mrr_oracle_sql,
    rank_calibration_bins,
    rank_calibration_oracle_sql,
    spearman_by,
    spearman_oracle_sql,
    welch_t_by,
    welch_t_oracle_sql,
)
from .base import query
from .round8 import _ORDERS_SCORED_SQL, _orders_scored

# orders with the lineitem count — the shared "score vs graded outcome"
# frame (same join as q162's NDCG input)
_ORDERS_ITEMS_SQL = """
    SELECT o.o_orderpriority, o.o_orderkey,
           CAST(round(o.o_totalprice * 100) AS BIGINT) AS cents,
           li.n_items
    FROM orders o
    JOIN (SELECT l_orderkey, CAST(count(*) AS BIGINT) AS n_items
          FROM lineitem GROUP BY 1) li
      ON li.l_orderkey = o.o_orderkey
"""


def _orders_items(spark: SparkSession, sf: str) -> DataFrame:
    o = load(spark, sf, "orders").select(
        "o_orderpriority",
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    li = (
        load(spark, sf, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.count("*").alias("n_items"))
    )
    return o.join(li, o.o_orderkey == li.l_orderkey).drop("l_orderkey")


@query(
    "q173_spearman_corr",
    oracle=spearman_oracle_sql(
        _ORDERS_ITEMS_SQL, "o_orderpriority", "cents", "n_items"
    ),
    doc="Spearman rank correlation of order value vs item count per "
    "priority segment — Pearson over BIGINT twice-midranks (tie "
    "handling never floats), value-cardinality-bounded rank windows",
    tags=("evaluation", "stats"),
)
def q173(spark: SparkSession, sf: str) -> DataFrame:
    return spearman_by(
        _orders_items(spark, sf), "o_orderpriority", "cents", "n_items"
    )


@query(
    "q174_welch_t_test",
    oracle=welch_t_oracle_sql(
        """
        SELECT o_orderpriority,
               CAST(o_orderstatus = 'F' AS INTEGER) AS is_final,
               CAST(round(o_totalprice) AS BIGINT) AS dollars
        FROM orders
        """,
        "o_orderpriority",
        "is_final",
        "dollars",
    ),
    doc="Welch's unequal-variance t statistic + Satterthwaite dof for "
    "final vs open order value per priority segment — six BIGINT "
    "moments from ONE conditional aggregate over ONE scan; dollar "
    "scale keeps the sum-of-squares under 2^63 (documented cap)",
    tags=("evaluation", "stats"),
)
def q174(spark: SparkSession, sf: str) -> DataFrame:
    o = load(spark, sf, "orders").select(
        "o_orderpriority",
        (F.col("o_orderstatus") == "F").cast("int").alias("is_final"),
        F.round("o_totalprice").cast("bigint").alias("dollars"),
    )
    return welch_t_by(o, "o_orderpriority", "is_final", "dollars")


@query(
    "q175_rank_calibration",
    oracle=rank_calibration_oracle_sql(_ORDERS_SCORED_SQL, "cents", "is_final"),
    doc="reliability table of the order-value score's empirical "
    "percentile as a predicted probability: per exact score decile, "
    "conf (mean percentile, BIGINT rank mass) vs acc (positive rate) "
    "and the |acc-conf| calibration gap — the ECE integrand without "
    "any cross-row float sum",
    tags=("evaluation", "stats"),
)
def q175(spark: SparkSession, sf: str) -> DataFrame:
    return rank_calibration_bins(_orders_scored(spark, sf), "cents", "is_final")


@query(
    "q176_mrr_at_10",
    oracle=mrr_oracle_sql(
        """
        SELECT user_id, event_id, value,
               CAST(event_type = 'purchase' AS INTEGER) AS rel
        FROM events
        """,
        "user_id",
        "event_id",
        "value",
        "rel",
        k=10,
    ),
    doc="MRR@10 treating each user's value-ranked events as one query "
    "and purchases as relevant — exact rational core (lcm(1..10) "
    "reciprocal weights, the only double is the final division); "
    "rank-filter prunes to 10 rows per user before aggregation",
    tags=("evaluation", "retrieval"),
)
def q176(spark: SparkSession, sf: str) -> DataFrame:
    ev = load(spark, sf, "events").select(
        "user_id",
        "event_id",
        "value",
        (F.col("event_type") == "purchase").cast("int").alias("rel"),
    )
    return mrr_at_k(ev, "user_id", "event_id", "value", "rel", k=10)


# -- drift additions ----------------------------------------------------------
from ..operators.drift import (
    hellinger_drift_by,
    hellinger_oracle_sql,
    seasonal_naive_backtest,
    seasonal_naive_oracle_sql,
)


@query(
    "q177_hellinger_drift",
    oracle=hellinger_oracle_sql("SELECT source, lang FROM documents", "source", "lang"),
    doc="Hellinger distance of each source's language mix vs the global "
    "corpus — the Bhattacharyya sum runs in 2^20 fixed-point BIGINTs "
    "(sqrt terms quantized per cell, never a float sum across rows); "
    "cells aggregate once, the global frame re-aggregates the cells",
    tags=("drift", "stats", "llm"),
)
def q177(spark: SparkSession, sf: str) -> DataFrame:
    docs = load(spark, sf, "documents").select("source", "lang")
    return hellinger_drift_by(docs, "source", "lang")


@query(
    "q178_seasonal_backtest",
    oracle=seasonal_naive_oracle_sql(
        """
        SELECT event_type,
               CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS d,
               CAST(count(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2
        """,
        "event_type",
        "d",
        "c",
        season=7,
    ),
    doc="seasonal-naive (lag-7) vs plain-naive (lag-1) forecast "
    "backtest on daily event counts per type: MASE-style ratio from "
    "BIGINT absolute-error sums; rows score only where the calendar "
    "gap to both lags is exact, so date gaps drop rather than lie",
    tags=("drift", "timeseries"),
)
def q178(spark: SparkSession, sf: str) -> DataFrame:
    daily = (
        load(spark, sf, "events")
        .groupBy(
            "event_type",
            F.date_trunc("day", F.col("ts")).cast("date").alias("d"),
        )
        .agg(F.count("*").alias("c"))
    )
    return seasonal_naive_backtest(daily, "event_type", "d", "c", season=7)


# -- governance / maintenance -------------------------------------------------
from ..operators.governance import (
    compaction_plan,
    compaction_plan_oracle_sql,
    k_anonymity_oracle_sql,
    k_anonymity_report,
    quantile_normalize_oracle_sql,
    quantile_normalize_summary,
)


@query(
    "q179_compaction_plan",
    oracle=compaction_plan_oracle_sql(
        "SELECT source, doc_id, n_chars FROM documents",
        "source",
        "doc_id",
        "n_chars",
        target_bytes=16384,
    ),
    doc="small-file compaction planner: bin documents per source into "
    "contiguous >=16 KiB output groups by running-size integer "
    "division — the metadata-only half of compaction (at 100 TB this "
    "runs on the file listing, never the data); one window + one "
    "same-key aggregate",
    tags=("governance", "scale"),
)
def q179(spark: SparkSession, sf: str) -> DataFrame:
    docs = load(spark, sf, "documents").select("source", "doc_id", "n_chars")
    return compaction_plan(docs, "source", "doc_id", "n_chars", target_bytes=16384)


@query(
    "q180_k_anonymity",
    oracle=k_anonymity_oracle_sql(
        """
        SELECT lang, source, n_chars // 64 AS size_bucket,
               n_chars % 10 AS sens
        FROM documents
        """,
        ["lang", "source", "size_bucket"],
        "sens",
        k=5,
        l=3,
    ),
    doc="k-anonymity / l-diversity release gate over (lang, source, "
    "size-bucket) quasi-identifiers: class sizes, the suppression "
    "cost of enforcing k=5, and distinct-l diversity of the "
    "sensitive column among surviving classes — one aggregate to "
    "classes, then a 1-row summary",
    tags=("governance", "privacy"),
)
def q180(spark: SparkSession, sf: str) -> DataFrame:
    docs = load(spark, sf, "documents").select(
        "lang",
        "source",
        F.expr("n_chars div 64").alias("size_bucket"),
        (F.col("n_chars") % 10).alias("sens"),
    )
    return k_anonymity_report(
        docs, ["lang", "source", "size_bucket"], "sens", k=5, l=3
    )


@query(
    "q181_quantile_normalize",
    oracle=quantile_normalize_oracle_sql(
        "SELECT source, n_chars, doc_id FROM documents",
        "source",
        "n_chars",
        "doc_id",
        n_grid=64,
    ),
    doc="quantile normalization of per-source document lengths against "
    "a 64-point pooled exact-order-statistic grid (batch-effect "
    "correction): grid from the value-count cumsum, rows map by "
    "integer midpoint rank rule and join the grid via broadcast; "
    "per-source BIGINT summaries of the normalized values",
    tags=("governance", "stats"),
)
def q181(spark: SparkSession, sf: str) -> DataFrame:
    docs = load(spark, sf, "documents").select("source", "n_chars", "doc_id")
    return quantile_normalize_summary(
        docs, "source", "n_chars", "doc_id", n_grid=64
    )


# -- item-item recommender core -----------------------------------------------
from ..operators.affinity import item_item_cosine, item_item_cosine_oracle_sql


@query(
    "q182_item_item_cosine",
    oracle=item_item_cosine_oracle_sql(
        """
        SELECT o.o_custkey AS u, l.l_partkey AS it
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        """,
        "u",
        "it",
        cap=50,
        top_n=20,
    ),
    doc="item-item cosine (ItemCF) over the customer x part interaction "
    "log with the hot-user cap at 50 items (rank by frequency desc, "
    "item asc — deterministic, no sampling): fan-out bounded at "
    "|users|*cap^2, norms counted over the SAME capped frame so the "
    "metric is exact cosine of the capped matrix; row-local pair "
    "generation, zero self-joins",
    tags=("affinity", "scale", "retrieval"),
)
def q182(spark: SparkSession, sf: str) -> DataFrame:
    o = load(spark, sf, "orders").select("o_orderkey", "o_custkey")
    li = load(spark, sf, "lineitem").select("l_orderkey", "l_partkey")
    inter = li.join(o, li.l_orderkey == o.o_orderkey).select(
        F.col("o_custkey").alias("u"), F.col("l_partkey").alias("it")
    )
    return item_item_cosine(inter, "u", "it", cap=50, top_n=20)
