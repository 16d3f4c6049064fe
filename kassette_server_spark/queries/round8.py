"""Round-8 specs (q158+): model-evaluation analytics, scale
diagnostics, graph/retrieval additions and two further TPC-H shapes —
the "score the scorer" layer (AUC / lift / threshold sweep / kappa /
NDCG) a training-data pipeline needs once classifiers and rankers
start gating the corpus, plus the join-key skew profiler you run
BEFORE committing a 100 TB join.

Registered AFTER the 50-spec driver window (queries/__init__.py), so
they ship on repo-oracle evidence this round and take their guaranteed
first-round slots in the r9 window per the standing rotation policy.

Determinism: the shared contract (operators/evaluation.py module
docstring) — BIGINT cores, one final IEEE division per double, literal
log2 discounts for NDCG, NULLIF guards mirrored on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..operators import textstats
from ..operators.evaluation import (
    cohens_kappa,
    cohens_kappa_oracle_sql,
    decile_lift,
    decile_lift_oracle_sql,
    ndcg_at_k,
    ndcg_oracle_sql,
    roc_auc_by,
    roc_auc_oracle_sql,
    threshold_metrics,
    threshold_metrics_oracle_sql,
)
from .base import query
from .llmops import _lang_id_sql

# orders with an exact-cents score and the binary "order reached final
# status" outcome — the running classifier-evaluation example
_ORDERS_SCORED_SQL = """
    SELECT o_orderpriority,
           CAST(o_orderstatus = 'F' AS INTEGER) AS is_final,
           CAST(round(o_totalprice * 100) AS BIGINT) AS cents
    FROM orders
"""


def _orders_scored(spark: SparkSession, sf: str) -> DataFrame:
    o = load(spark, sf, "orders")
    return o.select(
        "o_orderpriority",
        (F.col("o_orderstatus") == "F").cast("int").alias("is_final"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )


@query(
    "q158_roc_auc",
    oracle=roc_auc_oracle_sql(
        _ORDERS_SCORED_SQL, "o_orderpriority", "is_final", "cents"
    ),
    doc="exact per-segment ROC-AUC of order value predicting final "
    "status (midrank identity over DISTINCT (segment, score) values "
    "— never raw-row ranks)",
    tags=("evaluation", "stats"),
)
def q158(spark: SparkSession, sf: str) -> DataFrame:
    return roc_auc_by(
        _orders_scored(spark, sf), "o_orderpriority", "is_final", "cents"
    )


@query(
    "q159_decile_lift",
    oracle=decile_lift_oracle_sql(_ORDERS_SCORED_SQL, "cents", "is_final"),
    doc="decile gains/lift table for the order-value score (exact "
    "order-statistic cuts, not ntile — tie handling is deterministic)",
    tags=("evaluation", "stats"),
)
def q159(spark: SparkSession, sf: str) -> DataFrame:
    return decile_lift(_orders_scored(spark, sf), "cents", "is_final")


_THRESHOLDS = (1_000_000, 5_000_000, 10_000_000, 20_000_000, 40_000_000)


@query(
    "q160_threshold_metrics",
    oracle=threshold_metrics_oracle_sql(
        _ORDERS_SCORED_SQL, "cents", "is_final", _THRESHOLDS
    ),
    doc="precision/recall/F1 sweep over 5 literal score thresholds — "
    "ONE wide aggregate over ONE scan, then a 1-row unpivot",
    tags=("evaluation", "stats"),
)
def q160(spark: SparkSession, sf: str) -> DataFrame:
    return threshold_metrics(
        _orders_scored(spark, sf), "cents", "is_final", _THRESHOLDS
    )


@query(
    "q161_cohens_kappa",
    oracle=cohens_kappa_oracle_sql(
        f"SELECT p.pred_lang AS pred_lang, d.lang AS lang "
        f"FROM ({_lang_id_sql()}) p JOIN documents d ON p.doc_id = d.doc_id",
        "pred_lang",
        "lang",
    ),
    doc="Cohen's kappa of the engine's own language-ID (q37 operator) "
    "against the labeled lang column — chance-corrected agreement, "
    "BIGINT core off one C x C contingency frame",
    tags=("evaluation", "stats", "text"),
)
def q161(spark: SparkSession, sf: str) -> DataFrame:
    docs = load(spark, sf, "documents")
    pred = textstats.language_id(docs)
    paired = pred.join(docs.select("doc_id", "lang"), "doc_id")
    return cohens_kappa(paired, "pred_lang", "lang")


@query(
    "q162_ndcg",
    oracle=ndcg_oracle_sql(
        """
        SELECT o.o_orderpriority, o.o_orderkey,
               CAST(round(o.o_totalprice * 100) AS BIGINT) AS cents,
               li.n_items
        FROM orders o
        JOIN (SELECT l_orderkey, CAST(count(*) AS BIGINT) AS n_items
              FROM lineitem GROUP BY 1) li
          ON li.l_orderkey = o.o_orderkey
        """,
        "o_orderpriority",
        "o_orderkey",
        "cents",
        "n_items",
        k=10,
    ),
    doc="NDCG@10 per priority segment: does order value rank "
    "multi-item orders on top (literal 1/log2 discounts, integer "
    "pivot — no float sum across rows)",
    tags=("evaluation", "stats"),
)
def q162(spark: SparkSession, sf: str) -> DataFrame:
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
    df = o.join(li, o.o_orderkey == li.l_orderkey).drop("l_orderkey")
    return ndcg_at_k(df, "o_orderpriority", "o_orderkey", "cents", "n_items", k=10)
