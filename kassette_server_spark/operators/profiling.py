"""Table profiling: per-column null / distinct statistics in one pass.

The "ANALYZE TABLE" building block a pipeline needs before choosing
join strategies, bucketing keys, or skew mitigations: row count,
non-null count, and EXACT distinct count per column, emitted as one
row per column.

Scale shape: a single aggregate computes every per-column stat in ONE
scan; multiple count(distinct) columns make Catalyst plan an Expand
(input rows × number of distinct-aggregated columns) — the standard
Spark multi-distinct strategy: more shuffled bytes, still one pass and
fully partial-aggregated. For very wide tables at 100 TB, profile
columns in batches or swap exact ndv for HLL registers
(operators/sketches.hll_count_distinct) — exactness here is what makes
the result oracle-checkable. The unpivot to (column, stats) rows is a
row-local stack() on the single aggregate row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(df: DataFrame, cols: tuple[str, ...]) -> DataFrame:
    """One row per column: (col_name, n_rows, n_nulls, ndv)."""
    aggs = [F.count("*").alias("n")]
    for i, c in enumerate(cols):
        aggs.append(F.count(F.col(c)).alias(f"nn{i}"))
        aggs.append(F.countDistinct(F.col(c)).alias(f"nd{i}"))
    one = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', n - nn{i}, nd{i}" for i, c in enumerate(cols)
    )
    return one.selectExpr(
        "n AS n_rows",
        f"stack({len(cols)}, {stack_args}) AS (col_name, n_nulls, ndv)",
    ).select("col_name", "n_rows", "n_nulls", "ndv")


def profile_oracle_sql(table: str, cols: tuple[str, ...]) -> str:
    """DuckDB SQL emitting the identical profile rows."""
    aggs = ["COUNT(*) AS n"]
    for i, c in enumerate(cols):
        aggs.append(f"COUNT({c}) AS nn{i}")
        aggs.append(f"COUNT(DISTINCT {c}) AS nd{i}")
    branches = "\nUNION ALL\n".join(
        f"SELECT '{c}' AS col_name, n AS n_rows, n - nn{i} AS n_nulls, nd{i} AS ndv FROM s"
        for i, c in enumerate(cols)
    )
    return f"WITH s AS (SELECT {', '.join(aggs)} FROM {table})\n{branches}"
