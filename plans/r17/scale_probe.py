#!/usr/bin/env python
"""Core-scaling probe on a multi-file input (VERDICT r16 #6).

Every sf0.1 bench table is ONE parquet file with ONE row group, so
scans are single-task by layout and the bench's 8c/32c ratios sit at
~1.0 no matter what the engine does. This probe writes a widened,
multi-file copy of lineitem (x128 rows, 128 files) to /tmp — NEVER used
by bench.py or the oracle — and times one scan-bound aggregation at
several core counts in fresh subprocesses.

Usage: python plans/r17/scale_probe.py [--prepare-only]
Prints one line per core count: CORES=<n> best=<s>.
"""
from __future__ import annotations

import os
import subprocess
import sys

PROBE_DIR = "/tmp/scale_probe/lineitem_x128"
SRC = "/root/testdata/sf0.1"

CHILD = r"""
import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from kassette_server_spark.session import get_spark

spark = get_spark(app_name="scale-probe")
# the probe's 128 files are ~2 MB each, so the default 128 MB
# maxPartitionBytes + 4 MB openCost packs them into ~6 splits and
# caps scan parallelism at 6 regardless of cores; a production-scale
# table has 128 MB-1 GB files and plentiful splits. Emulate that
# split count on the small probe.
spark.conf.set("spark.sql.files.maxPartitionBytes", "16m")
spark.conf.set("spark.sql.files.openCostInBytes", "0")
df = spark.read.parquet({probe!r})

def agg():
    # deliberately CPU-heavy per row (hash mixing + disc products) so
    # the probe measures scan+compute parallelism, not the per-query
    # fixed floor the bench already characterizes
    return (
        df.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity"), F.sum("l_extendedprice"),
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))),
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))
                  * (1 + F.col("l_tax"))),
            F.avg("l_discount"), F.count("*"),
            F.sum(F.xxhash64("l_orderkey", "l_partkey", "l_suppkey")),
            F.sum(F.xxhash64("l_shipdate", "l_quantity", "l_tax")),
            F.sum(F.xxhash64("l_extendedprice", "l_discount")),
        )
    )

agg().write.format("noop").mode("overwrite").save()  # warm
ts = []
for _ in range(3):
    t0 = time.perf_counter()
    agg().write.format("noop").mode("overwrite").save()
    ts.append(time.perf_counter() - t0)
print("PROBE_BEST %.4f" % min(ts), file=sys.stderr)
"""


def prepare() -> None:
    sys.path.insert(0, "/root/repo")
    from kassette_server_spark.session import get_spark

    from pyspark.sql import functions as F

    spark = get_spark(app_name="scale-probe-prepare")
    li = spark.read.parquet(os.path.join(SRC, "lineitem.parquet"))
    # x128 rows via explode of a literal array (deterministic), 64 files
    wide = li.withColumn(
        "_dup", F.explode(F.array(*[F.lit(i) for i in range(128)]))
    ).drop("_dup")
    wide.repartition(128).write.mode("overwrite").parquet(PROBE_DIR)
    spark.stop()


def main() -> None:
    if not os.path.isdir(PROBE_DIR):
        prepare()
    if "--prepare-only" in sys.argv:
        return
    for cores in (4, 8, 32):
        env = dict(os.environ, SPARK_GRAFT_CPUS=str(cores))
        proc = subprocess.run(
            [sys.executable, "-c", CHILD.format(probe=PROBE_DIR)],
            capture_output=True, text=True, env=env, timeout=600,
        )
        import re

        m = re.search(r"PROBE_BEST ([0-9.]+)", proc.stderr)
        print(f"CORES={cores} best={m.group(1) if m else 'FAIL'}", flush=True)
        if not m:
            print(proc.stderr[-2000:], file=sys.stderr)


if __name__ == "__main__":
    main()
