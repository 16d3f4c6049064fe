#!/usr/bin/env python
"""End-to-end event-analytics (CDP) pipeline — the analytics operators
composed the way the reference's downstream consumers would use them:

  1. sessionize the raw event stream (30-min gap)
  2. strictly-ordered funnel (view → click → purchase)
  3. weekly cohort retention
  4. click → purchase attribution (7-day window, as-of forward join)
  5. per-type robust health: MAD outliers + winsorized aggregates
  6. peak concurrency (capacity planning)
  7. Markov transition matrix between event types

Run: python examples/event_analytics.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from kassette_server_spark.catalog import load
from kassette_server_spark.operators.asof import asof_join_forward
from kassette_server_spark.operators.funnel import (
    event_transitions,
    peak_concurrency,
)
from kassette_server_spark.operators.sessionize import sessionize_batch
from kassette_server_spark.operators.stats import mad_outliers, winsorized_stats
from kassette_server_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="event-analytics")
    ev = load(spark, sf_dir, "events")

    # 1. sessions
    sess = sessionize_batch(ev, user_col="user_id", ts_col="ts", gap_minutes=30)
    n_sessions = sess.select("user_id", "session_id").distinct().count()

    # 2. funnel: users reaching each stage in strict order
    stages = ["view", "click", "purchase"]
    firsts = (
        ev.where(F.col("event_type").isin(stages))
        .groupBy("user_id")
        .pivot("event_type", stages)
        .agg(F.min("ts"))
    )
    funnel = firsts.agg(
        F.count("view").alias("view"),
        F.sum((F.col("click") > F.col("view")).cast("long")).alias("click"),
        F.sum(
            ((F.col("click") > F.col("view")) & (F.col("purchase") > F.col("click"))).cast("long")
        ).alias("purchase"),
    ).first()

    # 3. weekly retention: cohort = first-seen week
    first_week = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort")
    )
    ret = (
        ev.join(first_week, "user_id")
        .select(
            "user_id",
            "cohort",
            ((F.unix_micros(F.col("ts")) - F.unix_micros(F.col("cohort")))
             / (7 * 24 * 3600 * 1_000_000)).cast("long").alias("week_n"),
        )
        .distinct()
        .groupBy("week_n")
        .agg(F.countDistinct("user_id").alias("users"))
        .orderBy("week_n")
        .limit(4)
        .collect()
    )

    # 4. attribution: each click's next purchase within 7 days
    clicks = ev.where("event_type = 'click'").select(
        F.col("event_id").alias("click_id"), F.col("user_id").alias("k"), "ts"
    )
    purchases = (
        ev.where("event_type = 'purchase'")
        .groupBy(F.col("user_id").alias("k"), F.col("ts").alias("pts"))
        .agg(F.max("event_id").alias("purchase_id"))
    )
    attributed = asof_join_forward(
        clicks, purchases, key="k", left_time="ts", right_time="pts",
        right_cols=["purchase_id", "pts"],
        tolerance_us=7 * 24 * 3600 * 1_000_000,
    )
    attr_rate = (
        attributed.agg(
            (F.count("purchase_id") / F.count("*")).alias("rate")
        ).first().rate
    )

    # 5. robust health per type
    outliers = {r.grp: r.n_outliers for r in mad_outliers(ev, "event_type", "value").collect()}
    wins = {r.grp: (r.n_clipped_low + r.n_clipped_high)
            for r in winsorized_stats(ev, "event_type", "value").collect()}

    # 6. capacity: peak concurrent 1h-activity windows per type
    ivals = ev.select("event_type", F.unix_micros("ts").alias("tus"))
    peaks = {r.grp: r.peak for r in peak_concurrency(
        ivals, "event_type", F.col("tus"), F.col("tus") + 3_600_000_000
    ).collect()}

    # 7. transition matrix (top transitions)
    trans = event_transitions(ev).orderBy(F.desc("transitions")).limit(5).collect()

    print(f"\nsessions:        {n_sessions}")
    print(f"funnel:          view={funnel.view} click={funnel.click} purchase={funnel.purchase}")
    print("retention:       " + ", ".join(f"w{r.week_n}={r.users}" for r in ret))
    print(f"attribution:     {attr_rate:.1%} of clicks convert within 7d")
    print(f"outliers (MAD):  {outliers}")
    print(f"winsor clipped:  {wins}")
    print(f"peak 1h concurrency: {peaks}")
    print("top transitions: " + ", ".join(
        f"{t.prev_type}->{t.cur_type}:{t.transitions}" for t in trans))
    spark.stop()


if __name__ == "__main__":
    main()
