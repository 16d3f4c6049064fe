#!/usr/bin/env python
"""Per-spec build-vs-execute split: time spec.fn() (driver-side eager
analysis + py4j) separately from the noop-sink execution, plus the
job count per execution from the status store.

Usage: python plans/r17/build_exec_profile.py <spec> [<spec> ...]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

from kassette_server_spark.queries import all_specs  # noqa: E402
from kassette_server_spark.session import get_spark  # noqa: E402


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="build-exec-profile")
    sc = spark.sparkContext
    specs = all_specs()
    tracker = sc.statusTracker()

    def n_jobs() -> int:
        return len(tracker.getJobIdsForGroup(None))

    # session warmup: one cheap JVM spec + one tiny python exchange
    specs["q01_scan_filter"].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

    def _ident(b):
        yield from b

    spark.range(0, 8192, 1, 8).mapInPandas(_ident, "id long").write.format("noop").mode("overwrite").save()

    for name in names:
        spec = specs[name]
        sc.setJobDescription(f"{name} profile")
        # warmup run (codegen) with build/exec split
        t0 = time.perf_counter()
        df = spec.fn(spark, sf_dir)
        t1 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t2 = time.perf_counter()
        wb, we = t1 - t0, t2 - t1
        builds, execs, jobs = [], [], []
        for _ in range(3):
            j0 = n_jobs()
            t0 = time.perf_counter()
            df = spec.fn(spark, sf_dir)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            builds.append(t1 - t0)
            execs.append(t2 - t1)
            jobs.append(n_jobs() - j0)
        print(
            f"RESULT {name} warm_build={wb:.3f} warm_exec={we:.3f} "
            f"build={min(builds):.3f} exec={min(execs):.3f} "
            f"total_best={min(b + e for b, e in zip(builds, execs)):.3f} "
            f"jobs={jobs[-1]}",
            file=sys.stderr,
            flush=True,
        )


if __name__ == "__main__":
    main()
