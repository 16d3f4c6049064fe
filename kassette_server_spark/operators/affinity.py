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
    # ordered pairs (a < b) by chained generators: posexplode the
    # sorted array, then explode each element's tail slice — both are
    # codegen GenerateExec nodes (r16: the previous nested
    # transform/flatten lambdas ran interpreted per pair; identical
    # rows, 0-row exceptAll diff)
    pairs = (
        baskets.select("it", F.posexplode("it").alias("i", "item_a"))
        .select(
            "item_a",
            F.explode(F.slice("it", F.col("i") + 2, F.size("it"))).alias("item_b"),
        )
    )
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


def item_item_cosine(
    df: DataFrame,
    user_col: str,
    item_col: str,
    cap: int = 50,
    top_n: int = 20,
    broadcast_norms: bool = False,
) -> DataFrame:
    """Item-item cosine similarity from a (user, item) interaction log
    — the classic ItemCF / "customers who bought X also bought Y"
    core: ``cos(i,j) = c_ij / sqrt(c_i * c_j)`` over CO-USER counts.

    Scale contract — the hot-user cap: pair fan-out is Σ_u deg(u)²,
    and one celebrity user with a million interactions would emit 10^12
    pairs. Every user's item list is therefore capped at ``cap`` items
    FIRST (rank by interaction frequency desc, item asc — fully
    deterministic, no sampling), bounding fan-out at |users|·cap².
    Item norms c_i are counted over the SAME capped frame, so the
    metric is exactly cosine on the capped interaction matrix (a
    defined estimator), not a mongrel of capped pairs and uncapped
    norms. Pair generation is row-local from each user's sorted item
    array (the copurchase_pairs move — one shuffle to users, one to
    pair keys, zero self-joins).

    Ordering/limit determinism: cosine ties break by (co_cnt desc,
    item_i, item_j).

    Output: top ``top_n`` rows of
    (item_i, item_j, co_cnt, cnt_i, cnt_j, cosine).
    """
    freq = (
        df.select(F.col(user_col).alias("u"), F.col(item_col).alias("it"))
        .groupBy("u", "it")
        .agg(F.count("*").alias("f"))
    )
    # cap via sort-slice of ONE per-user aggregate instead of a
    # row_number window: array_sort over (-f, it) structs IS the
    # (freq desc, item asc) rank, and fusing it into the basket
    # groupBy removes the window's sort, a checkpoint, and a second
    # per-user aggregate (measured ~2x on the sf0.1 spec). The kept
    # items re-sort by item for canonical i<j pair generation.
    baskets = (
        freq.groupBy("u")
        .agg(
            F.slice(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            (-F.col("f")).alias("nf"), F.col("it").alias("it")
                        )
                    )
                ),
                1,
                cap,
            ).alias("_kept")
        )
        .select(
            F.array_sort(
                F.transform(F.col("_kept"), lambda s: s["it"])
            ).alias("its")
        )
        # two consumers (norms, pairs) — materialize the capped
        # baskets once
        .localCheckpoint(eager=True)
    )
    norms = (
        baskets.select(F.explode("its").alias("it"))
        .groupBy("it")
        .agg(F.count("*").alias("cnt"))
    )
    # same chained-generator pair build as copurchase_pairs (r16):
    # codegen explodes instead of interpreted nested transform lambdas
    pairs = (
        baskets.select("its", F.posexplode("its").alias("i", "item_i"))
        .select(
            "item_i",
            F.explode(F.slice("its", F.col("i") + 2, F.size("its"))).alias("item_j"),
        )
    )
    co = pairs.groupBy("item_i", "item_j").agg(F.count("*").alias("co_cnt"))
    ni = norms.select(F.col("it").alias("item_i"), F.col("cnt").alias("cnt_i"))
    nj = norms.select(F.col("it").alias("item_j"), F.col("cnt").alias("cnt_j"))
    # the norms frame descends from the checkpointed baskets, so it
    # carries no size statistics and Catalyst will NOT auto-broadcast
    # it — the big pair frame pays two sort-merge shuffles against a
    # table bounded by the item vocabulary. Same opt-in pattern as
    # pagerank's broadcast_ranks (q102): pass True when items are a
    # bounded dimension (product catalog, parts); leave False for
    # open-ended item spaces.
    if broadcast_norms:
        ni, nj = F.broadcast(ni), F.broadcast(nj)
    scored = (
        co.join(ni, "item_i")
        .join(nj, "item_j")
        .withColumn(
            "cosine",
            F.col("co_cnt").cast("double")
            / F.sqrt((F.col("cnt_i") * F.col("cnt_j")).cast("double")),
        )
    )
    return (
        scored.select("item_i", "item_j", "co_cnt", "cnt_i", "cnt_j", "cosine")
        .orderBy(
            F.col("cosine").desc(),
            F.col("co_cnt").desc(),
            F.col("item_i").asc(),
            F.col("item_j").asc(),
        )
        .limit(top_n)
    )


def item_item_cosine_oracle_sql(
    source_sql: str,
    user_col: str,
    item_col: str,
    cap: int = 50,
    top_n: int = 20,
) -> str:
    """DuckDB mirror of :func:`item_item_cosine` (same cap, same
    tiebreaks)."""
    return f"""
    WITH src0 AS ({source_sql}),
    freq AS (SELECT {user_col} AS u, {item_col} AS it, count(*) AS f
             FROM src0 GROUP BY 1, 2),
    capped AS (
      SELECT u, it FROM (
        SELECT u, it,
               row_number() OVER (PARTITION BY u
                                  ORDER BY f DESC, it ASC) AS _rn
        FROM freq
      ) WHERE _rn <= {cap}
    ),
    norms AS (SELECT it, count(*) AS cnt FROM capped GROUP BY 1),
    co AS (
      SELECT a.it AS item_i, b.it AS item_j, count(*) AS co_cnt
      FROM capped a JOIN capped b ON a.u = b.u AND a.it < b.it
      GROUP BY 1, 2
    )
    SELECT item_i, item_j,
           CAST(co_cnt AS BIGINT) AS co_cnt,
           CAST(ni.cnt AS BIGINT) AS cnt_i,
           CAST(nj.cnt AS BIGINT) AS cnt_j,
           CAST(co_cnt AS DOUBLE)
             / sqrt(CAST(ni.cnt * nj.cnt AS DOUBLE)) AS cosine
    FROM co
    JOIN norms ni ON ni.it = co.item_i
    JOIN norms nj ON nj.it = co.item_j
    ORDER BY cosine DESC, co_cnt DESC, item_i ASC, item_j ASC
    LIMIT {top_n}
    """
