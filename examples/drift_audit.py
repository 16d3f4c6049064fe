#!/usr/bin/env python
"""Data-drift and audit sweep — the round-7 operators composed the way
a pipeline owner would run them after (or while) ingesting a new data
generation:

  1. distribution drift per segment: exact KS + Mann-Whitney AUC
  2. fabricated-amount screen: Benford first-digit audit
  3. robust trend + changepoint of daily volume (Theil-Sen, CUSUM)
  4. series regularization: calendar gap-fill with interpolation
  5. audience affinity between event types (exact Jaccard)
  6. period-over-period histogram drift (total variation)
  7. the STREAMING face: hist_drift_monitor folding batches into the
     fenced histogram store and reporting drift vs a frozen baseline

Run: python examples/drift_audit.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from kassette_server_spark.catalog import load
from kassette_server_spark.operators.drift import (
    benford_audit,
    cusum_changepoint_by,
    gap_fill_interpolate,
    hist_drift_monitor,
    hist_tv_distance,
    ks_drift_by,
    mann_whitney_by,
    theil_sen_by,
)
from kassette_server_spark.operators.sketches import hist_bins
from kassette_server_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="drift-audit")
    ev = load(spark, sf_dir, "events")

    # 1. which segment's value distribution is unlike the rest?
    print("== KS drift (per event type vs rest) ==")
    ks_drift_by(ev.select("event_type", "value"), "event_type", "value").orderBy(
        F.desc("ks")
    ).show(truncate=False)
    print("== Mann-Whitney AUC (stochastic dominance) ==")
    mann_whitney_by(ev.select("event_type", "value"), "event_type", "value").orderBy(
        F.desc("auc")
    ).show(truncate=False)

    # 2. do the billing amounts look organic?
    li = load(spark, sf_dir, "lineitem").select(
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("cents")
    )
    print("== Benford audit (lineitem amounts) ==")
    benford_audit(li, "cents").orderBy("digit").show(truncate=False)

    # 3. daily-volume trend + most likely level shift
    daily = ev.groupBy(
        "event_type",
        F.datediff(F.to_date("ts"), F.lit("1970-01-01")).cast("bigint").alias("x"),
    ).agg(F.count("*").cast("bigint").alias("y"))
    print("== Theil-Sen robust slope (events/day/day) ==")
    theil_sen_by(daily, "event_type", "x", "y").show(truncate=False)
    print("== CUSUM changepoint ==")
    cusum_changepoint_by(daily, "event_type", "x", "y").show(truncate=False)

    # 4. regularize a sparse series for feature windows
    cents_daily = (
        ev.groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("cents"))
        .where(F.datediff(F.col("day"), F.lit("1970-01-01")) % 3 != 1)
    )
    filled = gap_fill_interpolate(cents_daily, "event_type", "day", "cents")
    n_interp = filled.where("is_interpolated").count()
    print(f"gap-fill: {n_interp} interpolated rows / {filled.count()} total")

    # 5. which event types share an audience?
    ut = ev.select("user_id", "event_type").distinct()
    both = (
        ut.alias("a")
        .join(ut.alias("b"), "user_id")
        .where(F.col("a.event_type") < F.col("b.event_type"))
        .groupBy(
            F.col("a.event_type").alias("t1"), F.col("b.event_type").alias("t2")
        )
        .agg(F.count("*").alias("n_both"))
    )
    print("== audience co-occurrence (pair counts) ==")
    both.orderBy(F.desc("n_both")).show(truncate=False)

    # 6. did the value distribution move between month halves?
    evd = ev.select(F.to_date("ts").alias("day"), "value")
    ref = hist_bins(evd.where(F.col("day") < "2024-01-16"), "value", 10.0, 64)
    cur = hist_bins(evd.where(F.col("day") >= "2024-01-16"), "value", 10.0, 64)
    print("== first-half vs second-half TV drift ==")
    hist_tv_distance(ref, cur).show(truncate=False)

    # 7. streaming monitor: fold "arriving batches" into the fenced
    # store, report drift vs the frozen first-half baseline
    store = os.path.join(tempfile.mkdtemp(prefix="drift-store-"), "hist")
    baseline = ref.localCheckpoint()
    second_half = evd.where(F.col("day") >= "2024-01-16")
    for batch_id, day0 in enumerate(["2024-01-16", "2024-01-21", "2024-01-26"]):
        batch = second_half.where(
            (F.col("day") >= day0)
            & (F.col("day") < F.date_add(F.lit(day0).cast("date"), 5))
        )
        report = hist_drift_monitor(batch, batch_id, "value", store, baseline, 10.0, 64)
        if report is not None:
            print(
                f"stream batch {batch_id}: running n={report.cur_n} "
                f"tv_vs_baseline={report.tv:.4f}"
            )

    spark.stop()


if __name__ == "__main__":
    main()
