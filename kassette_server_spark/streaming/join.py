"""Stream-stream interval join: event attribution on unbounded inputs.

The reference has no join over user data at all (SURVEY §2.1
"deliberately absent") — but the event-analytics north star needs the
classic attribution shape: match each left event (impression, send,
job-dispatch) to right events (click, ack, status) with the same key
arriving within a bounded interval. Spark's stream-stream join is the
native operator; the non-negotiable part is the STATE BOUND: both
sides carry watermarks and the join condition carries an explicit time
bound, so each side's buffered state is evicted once the other side's
watermark passes it — state ∝ (rate × horizon), never stream length.
Without the time bound Spark would buffer both streams forever.

Outer variants emit the unmatched row only after the watermark proves
no match can still arrive — exactly the reference's retry-ledger
"waiting then failed" semantics, but computed by the engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_stream_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    within: str = "15 minutes",
    watermark: str = "30 minutes",
    how: str = "inner",
    right_prefix: str = "r_",
) -> DataFrame:
    """Join two streams on ``key`` where the right event lands in
    ``[left_ts, left_ts + within]``.

    Right columns are prefixed (default ``r_``) so callers can join a
    stream to itself (impression→click over one event stream). ``how``
    may be ``inner`` / ``left_outer`` / ``right_outer``; outer rows
    materialize only after the opposite watermark passes the bound.
    """
    if how not in ("inner", "left_outer", "right_outer"):
        raise ValueError(f"unsupported join type {how!r}")
    r = right.select(
        *[F.col(c).alias(f"{right_prefix}{c}") for c in right.columns]
    ).withWatermark(f"{right_prefix}{right_ts}", watermark)
    l = left.withWatermark(left_ts, watermark)
    rk, rt = f"{right_prefix}{key}", f"{right_prefix}{right_ts}"
    cond = (
        (F.col(key) == F.col(rk))
        & (F.col(rt) >= F.col(left_ts))
        & (F.col(rt) <= F.col(left_ts) + F.expr(f"INTERVAL {within}"))
    )
    return l.join(r, cond, how)
