"""Graph centrality on edge lists: deterministic fixed-point PageRank.

Complements connected_components (operators/dedup.py): CC answers
"which docs are the same", PageRank answers "which nodes matter" —
e.g. ranking domains in a crawl link graph to prioritize curation, or
spotting hub suppliers/parts in a procurement graph.

Determinism: ranks are kept in integer micro-units (1.0 ≡ 1_000_000)
and each neighbor contribution is the integer division
``(rank · damping_ppm) div (1_000_000 · outdeg)``. Sums of integers
are order-free, so the result is bit-identical across engines, runs,
and partitionings — float PageRank is not (Σ over in-neighbors is
order-dependent). The truncation loses < 1 µ-unit per edge, which is
noise for ranking purposes and a price worth paying for
reproducibility at 100 TB.

Scale shape (same discipline as connected_components): each iteration
is one join edges⋈ranks on src (ranks is the small side per node —
broadcast when it fits, shuffle-hash otherwise) plus one groupBy dst
with map-side combine. ``localCheckpoint`` truncates the lineage so
the plan stays O(1) per iteration instead of growing a join tree.
Dangling nodes (no out-edges) simply leak their mass — the standard
simplification; rankings are unaffected for comparison purposes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 1_000_000  # 1.0 in micro-units
DEFAULT_DAMPING_PPM = 850_000  # d = 0.85
DEFAULT_ITERS = 3


def pagerank_fixedpoint(
    edges: DataFrame,
    iters: int = DEFAULT_ITERS,
    damping_ppm: int = DEFAULT_DAMPING_PPM,
    src_col: str = "src",
    dst_col: str = "dst",
    broadcast_ranks: bool = False,
) -> DataFrame:
    """``iters`` synchronous PageRank iterations over (src, dst) edges.

    Nodes are every id appearing as src or dst. Returns (node, rank)
    with rank in micro-units; initial rank 1.0, teleport (1−d).

    ``broadcast_ranks``: localCheckpoint'ed rank frames carry no size
    statistics, so Catalyst will NOT auto-broadcast them — each
    iteration plans a sort-merge join even when the node set is tiny.
    Pass True when the node count is known-bounded (dimension-like
    graphs: parts, suppliers, domains) to hint the rank side into a
    broadcast-hash join; leave False for open-ended node sets (URLs,
    users) where the rank table itself is big data.
    """
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    deg = e.groupBy("src").agg(F.count("*").alias("outdeg"))
    # (src, dst, outdeg) is loop-invariant: checkpoint once, reuse every
    # iteration so the scan+groupBy doesn't recompute per pass
    ed = e.join(deg, "src").localCheckpoint(eager=False)
    nodes = nodes.localCheckpoint(eager=False)

    teleport = SCALE - damping_ppm
    ranks = nodes.select("node", F.lit(SCALE).cast("long").alias("rank"))
    for _ in range(iters):
        rank_side = F.broadcast(ranks) if broadcast_ranks else ranks
        contrib = (
            ed.join(rank_side, ed.src == rank_side.node)
            .select(
                "dst",
                F.expr(f"(rank * {damping_ppm}) div (outdeg * {SCALE})").alias("c"),
            )
            .groupBy("dst")
            .agg(F.sum("c").alias("inflow"))
        )
        ranks = (
            nodes.join(contrib, nodes.node == contrib.dst, "left")
            .select(
                "node",
                (F.lit(teleport) + F.coalesce(F.col("inflow"), F.lit(0)))
                .cast("long")
                .alias("rank"),
            )
            .localCheckpoint(eager=False)
        )
    return ranks


def pagerank_oracle_sql(
    edges_sql: str,
    iters: int = DEFAULT_ITERS,
    damping_ppm: int = DEFAULT_DAMPING_PPM,
) -> str:
    """DuckDB SQL unrolling the identical integer iterations.

    ``edges_sql``: a SELECT producing (src, dst).
    """
    teleport = SCALE - damping_ppm
    ctes = [
        f"e AS ({edges_sql})",
        "nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e)",
        "deg AS (SELECT src, COUNT(*) AS outdeg FROM e GROUP BY src)",
        "ed AS (SELECT e.src, e.dst, deg.outdeg FROM e JOIN deg USING (src))",
        f"r0 AS (SELECT node, CAST({SCALE} AS BIGINT) AS rank FROM nodes)",
    ]
    for i in range(iters):
        ctes.append(
            f"c{i + 1} AS (SELECT ed.dst, SUM((r.rank * {damping_ppm}) // (ed.outdeg * {SCALE})) AS inflow "
            f"FROM ed JOIN r{i} r ON r.node = ed.src GROUP BY ed.dst)"
        )
        ctes.append(
            f"r{i + 1} AS (SELECT n.node, CAST({teleport} + COALESCE(c.inflow, 0) AS BIGINT) AS rank "
            f"FROM nodes n LEFT JOIN c{i + 1} c ON c.dst = n.node)"
        )
    return "WITH " + ",\n".join(ctes) + f"\nSELECT node, rank FROM r{iters}"
