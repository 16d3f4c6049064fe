"""Input-width guard for heavy Arrow-batched map stages.

A scan-stage ``mapInPandas`` inherits the SCAN's partitioning. That is
exactly right on a real corpus — at 100 TB the file listing yields
thousands of splits and the map runs wide for free. But a SMALL input
(one modest parquet file, as at bench scale) arrives as ONE partition,
which serializes the entire per-row codec/encode stage on a single
core while the rest of the machine idles: measured on the r14 quiet
box, the q258 seven-scan JPEG pipeline cost 2.5 ms/row yet ran 13.5 s
wall for 5000 rows — single-core arithmetic exactly (SCALE.md r14).

``spread(df)`` widens only when needed: if the frame already has at
least the session's parallelism it is returned UNTOUCHED (zero plan
change on real corpora); otherwise one explicit round-robin
repartition is inserted. The explicit partition count matters — AQE
would coalesce a size-based shuffle of a few-KB id frame right back
to one partition, but a user-specified ``repartition(n)`` is exempt
from coalescing by contract.

Cost model: the operators that use this map over NARROW rows (an id,
or an id plus a quantized vector) and synthesize/decode payloads
inside the map, so the spread shuffle moves bytes-per-row — worst
case one input split (≤ spark.sql.files.maxPartitionBytes) exactly
once, and only when the input was too narrow to parallelize anyway.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin widen ``df`` to ``min_partitions`` (default: the
    session's parallelism) iff it currently has fewer partitions —
    a no-op on any input already wide enough."""
    if df.isStreaming:
        # a streaming frame has no static partition count to inspect
        # (.rdd is illegal) and its micro-batch parallelism belongs to
        # the source/trigger configuration — pass through untouched
        return df
    sc = df.sparkSession.sparkContext
    target = int(min_partitions or sc.defaultParallelism)
    if target <= 1 or df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
