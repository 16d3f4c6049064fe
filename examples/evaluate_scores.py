#!/usr/bin/env python
"""Model-evaluation sweep — the round-8 operators composed the way a
pipeline owner scores a scoring model before letting it gate a corpus:

  1. pre-flight: key-skew + join-size forecast for the label join
  2. discrimination: exact per-segment ROC-AUC, Spearman rank corr
  3. calibration: rank-calibration reliability table
  4. operating point: threshold sweep + the exact Gini stump split
  5. significance: Welch t / ANOVA F / two-proportion z across segments
  6. rates with honest error bars: Wilson score intervals
  7. agreement with an existing labeler: per-class PRF1 + Cohen kappa
  8. survival of the scored cohort: Kaplan-Meier + log-rank

Run: python examples/evaluate_scores.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from kassette_server_spark.catalog import load
from kassette_server_spark.operators import textstats
from kassette_server_spark.operators.diagnostics import (
    join_cardinality_preflight,
    key_skew_profile,
)
from kassette_server_spark.operators.evaluation import (
    cohens_kappa,
    gini_stump,
    per_class_prf,
    rank_calibration_bins,
    roc_auc_by,
    spearman_by,
    threshold_metrics,
    two_proportion_z,
    welch_t_by,
    wilson_interval_by,
)
from kassette_server_spark.operators.stats import anova_f, kaplan_meier, log_rank_test
from kassette_server_spark.session import get_spark

PRIORITIES = ("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="evaluate-scores")

    orders = load(spark, sf_dir, "orders")
    scored = orders.select(
        "o_orderkey",
        "o_orderpriority",
        (F.col("o_orderstatus") == "F").cast("int").alias("y"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
        F.round("o_totalprice").cast("bigint").alias("dollars"),
    )

    print("== 1. pre-flight: is the label join safe to run? ==")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey")
    key_skew_profile(li, "l_orderkey", top_n=3).show(3, truncate=False)
    join_cardinality_preflight(
        scored.select("o_orderkey"), "o_orderkey", li, "l_orderkey", top_n=3
    ).show(3, truncate=False)

    print("== 2. discrimination ==")
    roc_auc_by(scored, "o_orderpriority", "y", "cents").show(truncate=False)
    items = (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.count("*").alias("n_items"))
    )
    oi = scored.join(items, scored.o_orderkey == items.l_orderkey)
    spearman_by(oi, "o_orderpriority", "cents", "n_items").show(truncate=False)

    print("== 3. calibration of the score's percentile ==")
    rank_calibration_bins(scored, "cents", "y").orderBy("bin").show(truncate=False)

    print("== 4. operating point ==")
    threshold_metrics(
        scored, "cents", "y", (1_000_000, 10_000_000, 40_000_000)
    ).show(truncate=False)
    gini_stump(scored, "cents", "y").show(truncate=False)

    print("== 5. does the segment matter? ==")
    welch_t_by(scored, "o_orderpriority", "y", "dollars").show(truncate=False)
    anova_f(scored, "o_orderpriority", PRIORITIES, "dollars").show(truncate=False)
    ev = load(spark, sf_dir, "events").select(
        "event_type",
        F.dayofweek("ts").isin(7, 1).cast("int").alias("is_weekend"),
        (F.col("value") >= 100.0).cast("int").alias("high_value"),
    )
    two_proportion_z(ev, "event_type", "is_weekend", "high_value").show(
        truncate=False
    )

    print("== 6. rates with error bars ==")
    docs = load(spark, sf_dir, "documents")
    wilson_interval_by(
        docs.select("source", (F.col("lang") == "en").cast("int").alias("s")),
        "source",
        "s",
    ).orderBy("source").show(5, truncate=False)

    print("== 7. labeler agreement ==")
    paired = textstats.language_id(docs).join(
        docs.select("doc_id", "lang"), "doc_id"
    )
    per_class_prf(paired, "pred_lang", "lang").orderBy("cls").show(truncate=False)
    cohens_kappa(paired, "pred_lang", "lang").show(truncate=False)

    print("== 8. time-to-conversion survival ==")
    from kassette_server_spark.queries.round8b import _time_to_purchase

    subj = _time_to_purchase(spark, sf_dir)
    kaplan_meier(subj, "dur", "converted").orderBy("t").show(8, truncate=False)
    log_rank_test(
        subj.withColumn("cohort", (F.col("user_id") % 2 == 0).cast("int")),
        "cohort",
        "dur",
        "converted",
    ).show(truncate=False)

    spark.stop()


if __name__ == "__main__":
    main()
