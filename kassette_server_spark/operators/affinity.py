"""Co-occurrence mining (market-basket affinity) on order lines.

The classic "frequently bought together" shape: for every unordered
pair of items appearing in the same basket, count supporting baskets.

Scale shape: the pair generation is a self-join keyed on the basket id
— fan-out is bounded by (basket size)², never by table size, and the
join is co-partitioned on one shuffle key. The support count is one
map-side-combined groupBy on the pair key. No floats anywhere, so the
result is engine- and partitioning-independent. At 100 TB the pair
keyspace dwarfs the support threshold, so the final aggregate output
is tiny relative to input; the intermediate pair stream is the cost,
and it scales linearly in Σ(basket size²) — cap basket size upstream
if carts are unbounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def copurchase_pairs(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 2,
) -> DataFrame:
    """Support counts for unordered item pairs co-occurring in a basket.

    Output: (item_a, item_b, support) with item_a < item_b and
    support ≥ min_support. Duplicate (basket, item) rows count once.
    """
    items = df.select(
        F.col(basket_col).alias("basket"), F.col(item_col).alias("item")
    ).distinct()
    a = items.alias("a")
    b = items.alias("b")
    return (
        a.join(
            b,
            (F.col("a.basket") == F.col("b.basket"))
            & (F.col("a.item") < F.col("b.item")),
        )
        .groupBy(
            F.col("a.item").alias("item_a"), F.col("b.item").alias("item_b")
        )
        .agg(F.count("*").alias("support"))
        .where(F.col("support") >= min_support)
    )


def copurchase_oracle_sql(
    table: str, basket_col: str, item_col: str, min_support: int = 2
) -> str:
    """DuckDB SQL for the identical pair counts."""
    return f"""
    WITH items AS (
      SELECT DISTINCT {basket_col} AS basket, {item_col} AS item FROM {table}
    )
    SELECT a.item AS item_a, b.item AS item_b,
           CAST(COUNT(*) AS BIGINT) AS support
    FROM items a JOIN items b ON a.basket = b.basket AND a.item < b.item
    GROUP BY a.item, b.item
    HAVING COUNT(*) >= {min_support}
    """
