#!/usr/bin/env python
"""Benchmark harness: run the declared query surface and print ONE JSON line.

Usage: python bench.py            # sf dir from $SPARK_GRAFT_SF_DIR (default sf0.1)

Each query is executed to completion with a `noop`-format write — the
whole plan runs on the executors (scan → shuffle → agg) but nothing is
collected to the driver, so timings reflect engine throughput, not
driver materialization. One warmup query absorbs JVM/codegen startup.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from kassette_server_spark.queries import all_specs  # noqa: E402
from kassette_server_spark.session import get_spark  # noqa: E402


def run_to_completion(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else -1.0

    # The result JSON must be the ONLY stdout line (the driver parses
    # stdout; VERDICT r5 #6 — BENCH_r4/r5 archived `parsed: null`
    # because JVM launcher banners share fd 1). Park the real stdout on
    # a spare fd and point fd 1 at stderr BEFORE the JVM forks, so
    # every banner/warning — Python or JVM child — lands on stderr.
    result_fd = os.dup(1)
    os.dup2(2, 1)

    spark = get_spark(app_name="kassette-bench")
    specs = all_specs()

    # warmup: JIT/codegen + parquet footer caches
    run_to_completion(specs["q01_scan_filter"].fn(spark, sf_dir))

    def time_spec(name: str) -> float:
        t0 = time.perf_counter()
        run_to_completion(specs[name].fn(spark, sf_dir))
        return time.perf_counter() - t0

    # Noise sentinel (VERDICT r7 #4): the same fixed cheap spec timed
    # immediately after warmup and again after the whole sweep. If both
    # sentinel timings moved together vs the prior round, the shift is
    # ambient box load, not a plan regression — this makes the
    # round-over-round comparison mechanical instead of forensic (the
    # r7 driver bench ran ~1.25x r6 uniformly from box load alone).
    SENTINEL = "q14_topk"
    sentinel_first = round(min(time_spec(SENTINEL) for _ in range(2)), 4)

    # best-of-2: first run pays whole-stage-codegen compilation for the
    # plan shape, second measures steady-state engine throughput. The
    # iterative/fixpoint specs swing ±50 % from per-job scheduler
    # overhead on this box, so they report MEDIAN-of-3 instead — a
    # round-over-round regression on them then means plan work changed,
    # not that the scheduler had a bad day (VERDICT r4 #7).
    high_variance = {"q57_simhash_near_dup", "q68_near_dup_clusters"}
    timings: dict[str, float] = {}
    spreads: dict[str, float] = {}
    for name in sorted(specs):
        samples = [time_spec(name) for _ in range(3 if name in high_variance else 2)]
        if name in high_variance:
            timings[name] = round(sorted(samples)[1], 4)  # median of 3
            spreads[name] = round(max(samples) - min(samples), 4)
        else:
            timings[name] = round(min(samples), 4)

    sentinel_last = round(min(time_spec(SENTINEL) for _ in range(2)), 4)
    total = round(sum(timings.values()), 4)
    # The driver archives only a finite TAIL of stdout; the 142-entry
    # per-query map overflowed it and r6 still recorded parsed:null
    # (VERDICT r6 "What's wrong" #2). The sole stdout line is therefore
    # a COMPACT summary (slowest-10 only) that fits the capture window;
    # the full per-query map goes to the BENCH_FULL.json repo artifact.
    slowest = dict(sorted(timings.items(), key=lambda kv: -kv[1])[:10])
    doc = json.dumps(
        {
            "metric": "declared_query_set_total_wall_clock",
            "value": total,
            "unit": "sec",
            "queries": slowest,
            "n_queries": len(timings),
            "sec_per_query": round(total / len(timings), 4),
            "sentinel": SENTINEL,
            "sentinel_first": sentinel_first,
            "sentinel_last": sentinel_last,
            "sf": sf,
            "full_map": "BENCH_FULL.json",
        }
    )
    full = json.dumps(
        {
            "metric": "declared_query_set_total_wall_clock",
            "value": total,
            "unit": "sec",
            "queries": timings,
            "sf": sf,
            "sentinel": SENTINEL,
            "sentinel_first": sentinel_first,
            "sentinel_last": sentinel_last,
            "median_of_3": sorted(high_variance),
            "spread_sec": spreads,
            "variance_note": "median-of-3 specs are iterative "
            "(fixpoint CC / banded verify) and swing with per-job "
            "scheduler overhead; all others are best-of-2",
        },
        indent=1,
    )
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_FULL.json"), "w") as f:
        f.write(full + "\n")
    spark.stop()
    os.write(result_fd, (doc + "\n").encode())
    os.close(result_fd)


if __name__ == "__main__":
    main()
