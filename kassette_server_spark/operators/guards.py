"""Input-dtype guards shared by integer-contract operators.

Several operators (``welch_t_by``, ``anova_f_by``,
``quantile_normalize_summary``, ``seasonal_naive_backtest``) keep
their accumulator core exactly integral so the Spark engine and the
DuckDB oracle agree bit-for-bit. They coerce the user's value column
with ``cast('long')`` — but Spark truncates fractional doubles toward
zero while DuckDB ``CAST`` rounds half-to-even, so a non-integer input
would SILENTLY diverge engine-vs-oracle instead of failing loudly
(ADVICE r8 item 2). The contract is therefore enforced here at plan
build time: the column must already be integral (or boolean).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BooleanType,
    ByteType,
    DecimalType,
    IntegerType,
    LongType,
    ShortType,
)

_INTEGRAL = (ByteType, ShortType, IntegerType, LongType, BooleanType)


def require_integral(df: DataFrame, col: str, op_name: str) -> None:
    """Raise ``TypeError`` unless ``col`` is an integral (or boolean,
    or scale-0 decimal) column. Called before any ``cast('long')``
    coercion whose operator contract requires integer inputs; a
    fractional column must fail at plan build, not silently truncate
    differently from the oracle's round-half-to-even CAST."""
    dt = df.schema[col].dataType
    if isinstance(dt, _INTEGRAL):
        return
    if isinstance(dt, DecimalType) and dt.scale == 0:
        return
    raise TypeError(
        f"{op_name} requires an integral value column (its exact "
        f"integer accumulator core is part of the oracle-parity "
        f"contract); got {col!r}: {dt.simpleString()}. Pre-scale and "
        f"round the column to an integer grid explicitly (e.g. "
        f"round(x * 100) cast to long) so engine and oracle agree."
    )
