"""As-of join and range join — operators Spark lacks natively
(pyspark guide: compose from built-ins rather than UDFs).

As-of join (backward): for each left row, the single right row with
the greatest right_time ≤ left_time within the same key.

Implementation is the union-merge pattern — no per-key subquery, no
crossjoin, no Python:

  1. tag both sides and union on (key, time);
  2. one window sorted by (key, time, side) carries the last seen
     right row forward with last_value(ignoreNulls);
  3. keep left rows.

Cost: a single shuffle on the key + one sort — the same price as a
regular sort-merge join, independent of time-skew. At 100 TB both
sides shuffle once; no state blowup because the window carries one
struct, not a buffer.

Range join: equi-join on a bucketized range key + residual filter —
turns an inequality join (O(n·m) nested loop) into a hash join on
⌈range/bucket⌉ buckets. Bucket width trades shuffle fan-out (each left
row lands in 2 buckets) against residual selectivity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def _salt_tags(left: DataFrame, right: DataFrame, salt: int):
    """Salt expressions for the union-merge as-of pattern (round-8
    skew-stress: the PIT join's salt=R recipe applied to the window
    shape). Left probes hash to ONE salt group (xxhash64 over all left
    columns — deterministic across retries/partitionings, unlike
    rand()); right rows replicate into EVERY group, so each group holds
    the key's complete right history plus ~1/R of the probes and the
    carry stays exact. AQE cannot help here at all — there is no join
    to split, just a window whose hot key lands on one task — so
    salting is the ONLY lever; it costs an R-times-larger right-side
    shuffle (bounded: the right side is the smaller/event side)."""
    if salt <= 1:
        return F.lit(0), F.lit(0)
    if "_salt" in left.columns or "_salt" in right.columns:
        raise ValueError("'_salt' is reserved by asof_join_*(salt=...)")
    l_salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(salt)
    ).cast("int")
    r_salt = F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    return l_salt, r_salt


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
    right_cols: list[str],
    salt: int = 1,
) -> DataFrame:
    """left columns + the latest right_cols at-or-before left_time.

    Ties on time: the right row sorts before the left probe at equal
    times (side 0 < 1), so an exactly-equal right timestamp matches —
    standard backward as-of semantics (DuckDB ASOF JOIN compatible).

    ``salt=R`` spreads a celebrity key's probes over R window
    partitions with the right side replicated R ways (see _salt_tags;
    oracle-identical result, locked by tests/test_asof_skew.py).
    """
    lt = F.col(left_time)
    l_salt, r_salt = _salt_tags(left, right, salt)
    l_tag = left.select(
        F.col(key).alias("_k"),
        l_salt.alias("_salt"),
        lt.alias("_t"),
        F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_l"),
        F.lit(None).cast(
            "struct<" + ",".join(f"{c}:{dict(right.dtypes)[c]}" for c in right_cols) + ">"
        ).alias("_r"),
    )
    r_tag = right.select(
        F.col(key).alias("_k"),
        r_salt.alias("_salt"),
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(
            "struct<" + ",".join(f"{c}:{dict(left.dtypes)[c]}" for c in left.columns) + ">"
        ).alias("_l"),
        F.struct(*[F.col(c) for c in right_cols]).alias("_r"),
    )
    merged = l_tag.unionByName(r_tag)
    w = (
        W.partitionBy("_k", "_salt")
        .orderBy("_t", "_side")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = merged.withColumn("_last_r", F.last("_r", ignorenulls=True).over(w))
    out = carried.filter(F.col("_side") == 1).select(
        F.col("_l.*"), *[F.col("_last_r")[c].alias(c) for c in right_cols]
    )
    return out


def range_join_buckets(
    left: DataFrame,
    right: DataFrame,
    left_point: str,
    right_lo: str,
    right_hi: str,
    bucket_width: float,
    max_span_buckets: int = 64,
) -> DataFrame:
    """left rows joined to right intervals containing left_point.

    Right intervals explode into the buckets they overlap; left rows
    land in exactly one bucket; the equi-join on bucket + residual
    inequality filter does the rest. An interval spanning more than
    ``max_span_buckets`` buckets FAILS LOUDLY (assert_true) rather than
    silently dropping matches — degenerate giant intervals should take
    a broadcast nested-loop path or a wider bucket_width instead.
    """
    lb = F.floor(F.col(left_point) / bucket_width).cast("long")
    l_tag = left.withColumn("_bucket", lb)
    lo_b = F.floor(F.col(right_lo) / bucket_width).cast("long")
    hi_b = F.floor(F.col(right_hi) / bucket_width).cast("long")
    span = hi_b - lo_b
    guard = F.assert_true(
        span <= max_span_buckets,
        F.concat(
            F.lit(f"range_join_buckets: interval spans > {max_span_buckets} buckets "
                  f"(bucket_width={bucket_width}); widen bucket_width or broadcast"),
        ),
    )
    r_tag = right.withColumn("_guard", guard).withColumn(
        "_bucket", F.explode(F.sequence(lo_b, lo_b + span))
    ).drop("_guard")
    joined = l_tag.join(r_tag, "_bucket").filter(
        (F.col(left_point) >= F.col(right_lo)) & (F.col(left_point) <= F.col(right_hi))
    )
    return joined.drop("_bucket")


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
    right_cols: list[str],
    tolerance_us: int | None = None,
    salt: int = 1,
) -> DataFrame:
    """left columns + the EARLIEST right_cols at-or-after left_time —
    the forward as-of direction (e.g. "next order after this event"),
    optionally bounded: matches farther than ``tolerance_us``
    microseconds ahead are nulled (DuckDB `ASOF ... ON l.t <= r.t`
    plus a tolerance CASE is the oracle shape).

    Same union-merge cost envelope as the backward join — one key
    shuffle + one sort, no per-key buffers: the window walks time
    DESCENDING so "last right row seen" is the smallest right_time ≥
    left_time; ties at equal times match (right sorts first). The
    matched right TIME is carried alongside the payload struct so the
    tolerance check is a row-local expression, not a second join.
    """
    lt = F.col(left_time)
    r_dtypes = dict(right.dtypes)
    l_dtypes = dict(left.dtypes)
    l_salt, r_salt = _salt_tags(left, right, salt)
    l_tag = left.select(
        F.col(key).alias("_k"),
        l_salt.alias("_salt"),
        lt.alias("_t"),
        F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_l"),
        F.lit(None).cast(
            "struct<" + ",".join(f"{c}:{r_dtypes[c]}" for c in right_cols) + ">"
        ).alias("_r"),
    )
    r_tag = right.select(
        F.col(key).alias("_k"),
        r_salt.alias("_salt"),
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(
            "struct<" + ",".join(f"{c}:{l_dtypes[c]}" for c in left.columns) + ">"
        ).alias("_l"),
        F.struct(*[F.col(c) for c in right_cols]).alias("_r"),
    )
    merged = l_tag.unionByName(r_tag)
    w = (
        W.partitionBy("_k", "_salt")
        .orderBy(F.desc("_t"), "_side")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    # both carries in ONE projection so Catalyst plans a single Window
    # exec (same partition/order spec), not two passes
    carried = merged.select(
        "*",
        F.last("_r", ignorenulls=True).over(w).alias("_last_r"),
        F.last(F.when(F.col("_side") == 0, F.col("_t")), ignorenulls=True)
        .over(w)
        .alias("_last_rt"),
    )
    if tolerance_us is not None:
        merged_t_type = dict(carried.dtypes)["_t"]
        if merged_t_type.startswith("timestamp"):
            ahead = F.unix_micros(F.col("_last_rt").cast("timestamp")) - F.unix_micros(
                F.col("_t").cast("timestamp")
            )
        else:
            ahead = F.col("_last_rt") - F.col("_t")
        carried = carried.withColumn(
            "_last_r",
            F.when(ahead <= F.lit(tolerance_us), F.col("_last_r")),
        )
    return carried.filter(F.col("_side") == 1).select(
        F.col("_l.*"), *[F.col("_last_r")[c].alias(c) for c in right_cols]
    )
