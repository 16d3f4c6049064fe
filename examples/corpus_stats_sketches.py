#!/usr/bin/env python
"""Corpus statistics at 100 TB scale with bounded-size sketches — the
shapes a data-quality dashboard runs continuously over a training
corpus, composed from operators/sketches.py:

  1. HyperLogLog distinct counts per dimension (register tables,
     <= 512 rows shuffled however large the corpus)
  2. Count-Min heavy hitters over event types (frequency estimates
     with the est >= exact guarantee)
  3. Bloom pre-join filter: restrict an expensive join to keys that
     can possibly match, without shuffling the probe side
  4. binned p50/p90/p99 of a value column (equi-width histogram,
     error <= bin_width/2)

All four sketches are deterministic (md5 + integer arithmetic): two
runs — or two engines — produce identical estimates, so they are safe
to diff across pipeline versions in CI.

Run: python examples/corpus_stats_sketches.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from kassette_server_spark.catalog import load
from kassette_server_spark.operators import sketches
from kassette_server_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="corpus-stats")
    events = load(spark, sf_dir, "events")
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")

    # 1. distinct cardinalities via mergeable HLL register tables.
    # Raw HLL is accurate when n >> m (event_id); at n << m most
    # registers stay empty and the raw estimate biases high (user_id —
    # zero_registers says which regime you're in; below ~2.5m use the
    # exact count, which is cheap by definition at that cardinality).
    for col in ("event_id", "user_id"):
        est = sketches.hll_count_distinct(events, col, p=9).collect()[0]
        print(f"~distinct {col}: {est.approx_distinct} "
              f"(zero_registers={est.zero_registers})")

    # 2. heavy hitters: CMS estimates vs exact, over-count only
    regs = sketches.countmin_registers(events, "event_type")
    vals = events.select("event_type").where(F.col("event_type").isNotNull()).distinct()
    est = sketches.countmin_estimate(vals, regs, "event_type")
    exact = events.groupBy("event_type").agg(F.count("*").alias("exact"))
    print("\nevent_type frequencies (CMS est >= exact):")
    for r in est.join(exact, "event_type").orderBy(F.desc("est_count")).collect():
        print(f"  {r.event_type:10s} est={r.est_count:6d} exact={r.exact:6d}")

    # 3. Bloom pre-join: which customers can possibly have orders
    bits = sketches.bloom_bits(orders, "o_custkey")
    probe = sketches.bloom_probe(customer.select("c_custkey"), bits, "c_custkey")
    survivors = probe.where("in_bloom").count()
    total = customer.count()
    print(f"\nbloom pre-join: {survivors}/{total} customers pass "
          f"({total - survivors} rows never reach the real join)")

    # 4. value-distribution quantiles from a 1024-bin histogram
    print("\nvalue quantiles (binned sketch, error <= 0.5):")
    for r in sketches.binned_quantiles(events, "value").collect():
        print(f"  {r.label}: {r.est:.1f}  (n={r.n})")

    spark.stop()


if __name__ == "__main__":
    main()
