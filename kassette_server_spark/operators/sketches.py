"""Deterministic, engine-portable sketches (SURVEY §2.3 approx aggregates).

Spark's built-in ``approx_count_distinct`` (HyperLogLog++) and
``percentile_approx`` (KLL) are the right tools on a real cluster, but
their sketch internals are engine-specific: the same input produces
different estimates on Spark vs DuckDB, so they can never be
value-checked against an external oracle. This module implements the
classic HyperLogLog estimator (Flajolet et al. 2007) *explicitly* from
portable primitives — md5, integer shifts, ``bin()`` bit-length — so
the estimate itself is bit-identical across engines and the q40 spec
can hash-match the DuckDB oracle.

Scale design (100 TB): the register table is the whole shuffle — at
``p=9`` that is at most 512 rows of two longs after map-side partial
aggregation (``groupBy(reg).agg(max(rank))`` combines locally before
the exchange), regardless of input size. The sketch is mergeable the
HLL way: union register tables, ``groupBy(reg).agg(max(m_rank))``.

The raw estimator is used without the small-range linear-counting
correction: ``ln()`` is libm-dependent and could break bit-parity, and
the target regime (distinct count >> m, zero empty registers) never
triggers it. Callers counting tiny cardinalities should use exact
``count_distinct`` — at n < 2.5m the exact count is cheap by
definition (the groupBy keyspace is small).

Reference anchor: the reference has no sketches at all (its only
aggregate is bookkeeping ``count(*)``, jobs/jobsdb.go:489); this is a
north-star extension per SURVEY §2.3.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 15 hex chars = 60 bits keeps the parsed hash strictly below 2^63 so
# the BIGINT cast is exact and positive in both engines.
_HASH_HEX_CHARS = 15
_HASH_BITS = 4 * _HASH_HEX_CHARS


def _hash60(col: Column) -> Column:
    """First 60 bits of md5 as a non-negative long (portable everywhere)."""
    return F.conv(
        F.substring(F.md5(col.cast("string")), 1, _HASH_HEX_CHARS), 16, 10
    ).cast("long")


def hll_registers(df: DataFrame, col: str, p: int = 9) -> DataFrame:
    """HLL register table for ``df[col]``: (reg, m_rank), <= 2^p rows.

    reg    = low ``p`` bits of the 60-bit md5 hash;
    m_rank = max over values of (leading zeros of the remaining
             ``60-p`` bits + 1), i.e. the classic rho(w).

    The bit-length of ``w`` comes from ``length(bin(w))`` — integer in,
    integer out, no floating point — which both Spark and DuckDB render
    without leading zeros (``bin(5) = '101'``).
    """
    if not 4 <= p <= 16:
        raise ValueError(f"p must be in [4, 16], got {p}")
    m = 1 << p
    wbits = _HASH_BITS - p
    scale = wbits + 1  # rho(0) := wbits + 1, the max possible rank
    hv = _hash60(F.col(col))
    w = F.shiftright(hv, p)
    rank = F.when(w == 0, F.lit(scale)).otherwise(F.lit(scale) - F.length(F.bin(w)))
    return (
        df.where(F.col(col).isNotNull())
        .select((hv % m).alias("reg"), rank.alias("rank"))
        .groupBy("reg")
        .agg(F.max("rank").alias("m_rank"))
    )


def hll_estimate(registers: DataFrame, p: int = 9) -> DataFrame:
    """One-row estimate from a register table (mergeable input).

    All engine-visible intermediate state is integer: the harmonic-mean
    denominator ``sum(2^-m_rank)`` is computed exactly as
    ``sum(1 << (scale - m_rank))`` in units of ``2^-scale`` (max
    ``2^p * 2^scale <= 2^68-ish`` only when p>12 — guarded), so the
    single floating division at the end is the only IEEE op and is
    bit-deterministic across engines.

    Output columns: approx_distinct (floor of the raw HLL estimate),
    zero_registers, scaled_sum.
    """
    m = 1 << p
    scale = _HASH_BITS - p + 1
    # Exactness bound: scaled_sum <= m * 2^scale = 2^(p + 61 - p) = 2^61,
    # always inside int64 for the fixed 60-bit hash.
    alpha = F.lit(0.7213) / (F.lit(1.0) + F.lit(1.079) / m)
    agg = registers.agg(
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {scale} - m_rank)")).alias(
            "present_sum"
        ),
        F.count("*").alias("nreg"),
    )
    scaled_sum = (
        F.coalesce(F.col("present_sum"), F.lit(0))
        + (F.lit(m) - F.col("nreg")) * F.lit(1 << scale)
    )
    return agg.select(
        F.floor(alpha * m * m * F.lit(float(1 << scale)) / scaled_sum)
        .cast("long")
        .alias("approx_distinct"),
        (F.lit(m) - F.col("nreg")).cast("long").alias("zero_registers"),
        scaled_sum.cast("long").alias("scaled_sum"),
    )


def hll_count_distinct(df: DataFrame, col: str, p: int = 9) -> DataFrame:
    """End-to-end deterministic approx-count-distinct (q40)."""
    return hll_estimate(hll_registers(df, col, p), p)


def hll_oracle_sql(table: str, col: str, p: int = 9) -> str:
    """DuckDB SQL computing the *identical* estimate (same constants,
    same integer path) for the oracle side of the correctness gate."""
    m = 1 << p
    scale = _HASH_BITS - p + 1
    return f"""
    WITH h AS (
      SELECT CAST('0x' || substr(md5(CAST({col} AS VARCHAR)), 1, {_HASH_HEX_CHARS})
                  AS BIGINT) AS hv
      FROM {table} WHERE {col} IS NOT NULL
    ), regs AS (
      SELECT hv % {m} AS reg,
             max(CASE WHEN hv // {m} = 0 THEN {scale}
                 ELSE {scale} - length(bin(hv // {m})) END) AS m_rank
      FROM h GROUP BY reg
    ), s AS (
      SELECT CAST(sum(CAST(1 AS BIGINT) << ({scale} - m_rank)) AS BIGINT)
               AS present_sum,
             count(*) AS nreg
      FROM regs
    )
    SELECT CAST(floor(0.7213 / (1.0 + 1.079 / {m}) * {m} * {m} * {float(1 << scale)!r}
            / (coalesce(present_sum, 0) + ({m} - nreg) * (CAST(1 AS BIGINT) << {scale})))
            AS BIGINT) AS approx_distinct,
           CAST({m} - nreg AS BIGINT) AS zero_registers,
           CAST(coalesce(present_sum, 0) + ({m} - nreg) * (CAST(1 AS BIGINT) << {scale})
                AS BIGINT) AS scaled_sum
    FROM s
    """
