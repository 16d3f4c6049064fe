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

    spark = get_spark(app_name="kassette-bench")
    specs = all_specs()

    # warmup: JIT/codegen + parquet footer caches
    run_to_completion(specs["q01_scan_filter"].fn(spark, sf_dir))

    # best-of-2: first run pays whole-stage-codegen compilation for the
    # plan shape, second measures steady-state engine throughput.
    timings: dict[str, float] = {}
    for name in sorted(specs):
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            run_to_completion(specs[name].fn(spark, sf_dir))
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 4)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "declared_query_set_total_wall_clock",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
