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

from pyspark.sql import DataFrame, Window
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
    # (src, dst, outdeg) is loop-invariant: checkpoint once, reuse every
    # iteration so the scan doesn't recompute per pass. outdeg rides a
    # count-over-window on src (r17) — ONE exchange of the edge frame
    # instead of the old groupBy (exchange) + sort-merge join back
    # (two more exchanges); identical rows since the join was a
    # self-derived inner join on src (never dropped an edge), and the
    # skew exposure is unchanged — the join already clustered by src.
    # Measured at sf0.1 (q102, same-session alternation):
    # 2.7-3.2 → 2.1-2.8 s, 0-row diff.
    ed = e.withColumn(
        "outdeg", F.count("*").over(Window.partitionBy("src"))
    ).localCheckpoint(eager=False)
    # r16 (driver-plan cost — guide §7.3 "planning" class): derive the
    # node set FROM the checkpointed edge frame instead of the raw
    # edges (identical set: deg keys on src from e itself, so the
    # inner join drops no edge row). Its checkpoint then plans a
    # shallow LogicalRDD→union→distinct tree and its materialization
    # reuses ed's computed RDD instead of re-running the edge scan —
    # each per-build toRdd was costing more driver time than the
    # whole 3-iteration execution at sf0.1 (measured 5.2 s build+exec
    # → 3.5 s, bit-identical ranks).
    nodes = (
        ed.select(F.col("src").alias("node"))
        .union(ed.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )

    teleport = SCALE - damping_ppm
    ranks = nodes.select("node", F.lit(SCALE).cast("long").alias("rank"))
    for it in range(iters):
        rank_side = F.broadcast(ranks) if broadcast_ranks else ranks
        contrib = (
            ed.join(rank_side, ed.src == rank_side.node)
            .select(
                "dst",
                # DECIMAL(38,0) widening (ADVICE r5): a hub's rank can
                # approach n*SCALE, so a BIGINT product rank*damping_ppm
                # would wrap silently past ~10^7 nodes (Spark, ANSI off)
                # while DuckDB errors. 38-digit headroom covers
                # n*SCALE*damping_ppm for any n < 10^26; `div` truncates
                # back to BIGINT (ranks are nonnegative, so truncation
                # == floor == the oracle's HUGEINT `//`).
                F.expr(
                    f"(cast(rank as decimal(38,0)) * {damping_ppm})"
                    f" div (outdeg * {SCALE})"
                ).alias("c"),
            )
            .groupBy("dst")
            .agg(F.sum("c").alias("inflow"))
        )
        # contrib is one row per in-edge dst, i.e. bounded by the node
        # set — the same boundedness broadcast_ranks asserts, so under
        # the hint the rank update becomes a left-outer
        # BroadcastHashJoin (BuildRight) instead of a SortMergeJoin
        # shuffling BOTH the node and contrib frames every iteration
        # (2 Exchanges per iteration removed, r16).
        contrib_side = F.broadcast(contrib) if broadcast_ranks else contrib
        ranks = nodes.join(contrib_side, nodes.node == contrib.dst, "left").select(
            "node",
            (F.lit(teleport) + F.coalesce(F.col("inflow"), F.lit(0)))
            .cast("long")
            .alias("rank"),
        )
        # the checkpoint exists so the NEXT iteration (re)uses a
        # materialized frame instead of re-executing the chain; the
        # final iteration has no next consumer — its toRdd would be
        # pure per-build driver cost (r16)
        if it < iters - 1:
            ranks = ranks.localCheckpoint(eager=False)
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
            f"c{i + 1} AS (SELECT ed.dst, SUM(CAST((CAST(r.rank AS HUGEINT) * {damping_ppm}) // (ed.outdeg * {SCALE}) AS BIGINT)) AS inflow "
            f"FROM ed JOIN r{i} r ON r.node = ed.src GROUP BY ed.dst)"
        )
        ctes.append(
            f"r{i + 1} AS (SELECT n.node, CAST({teleport} + COALESCE(c.inflow, 0) AS BIGINT) AS rank "
            f"FROM nodes n LEFT JOIN c{i + 1} c ON c.dst = n.node)"
        )
    return "WITH " + ",\n".join(ctes) + f"\nSELECT node, rank FROM r{iters}"


def hierarchy_closure(
    nodes: DataFrame,
    id_col: str = "id",
    parent_col: str = "parent",
    max_depth: int = 12,
    validate: bool = False,
) -> DataFrame:
    """Root / depth / path-sum for every node of a parent-pointer
    hierarchy — the BOM-explosion / org-chart traversal Spark lacks a
    recursive CTE for.

    Iterative pointer-chasing (the CC/PageRank loop discipline): each
    pass joins the frontier's current ancestor against the
    (id → parent) table, accumulating depth and path_sum; rows whose
    ancestor has no parent (root) leave the frontier, so the work
    SHRINKS as chains resolve. ``max_depth`` passes bound the loop —
    raise for deeper DAGs, or double-hop (pointer-jumping) if depth is
    log-scale. localCheckpoint per pass keeps the plan O(1).

    All arithmetic is integer (depth counter, path accumulation), so
    results are bit-identical to the oracle's WITH RECURSIVE.

    Output: (id, root, depth, path_sum) — path_sum includes both
    endpoints.

    MALFORMED-INPUT CONTRACT (VERDICT r5 #8): a DANGLING parent — a
    non-null ``parent`` value that exists as nobody's ``id`` — makes
    the chase and the recursive-CTE oracle DIVERGE by construction:
    the chase's left join finds no row for the dangling ancestor and
    terminates the chain there (the dangling id is reported as the
    root, its hop still counted in depth/path_sum), while the CTE's
    inner joins simply stop producing rows, so the final
    ``WHERE n.parent IS NULL`` filter DROPS the whole chain. Neither
    answer is "right" — the input violates the hierarchy invariant.
    ``validate=True`` makes the violation loud instead of divergent:
    one bounded anti-join up front, ValueError naming the count.
    tests/test_advanced_ops.py::test_hierarchy_closure_dangling_parent_contract
    pins all three behaviors (chase keeps, oracle drops, validate
    raises) so the divergence can never surface silently at scale.
    """
    edges = nodes.select(
        F.col(id_col).alias("nid"), F.col(parent_col).alias("npar")
    ).localCheckpoint(eager=False)
    if validate:
        n_dangling = (
            edges.where(F.col("npar").isNotNull())
            .join(edges.select(F.col("nid").alias("npar")), "npar", "left_anti")
            .count()
        )
        if n_dangling:
            raise ValueError(
                f"hierarchy has {n_dangling} dangling parent pointer(s): "
                "every non-null parent must exist as an id (chase would "
                "report the dangling id as a root; the recursive-CTE "
                "oracle would drop the chain)"
            )
    # state: (id, anc, depth, path_sum); done when anc's parent is null
    state = edges.select(
        F.col("nid").alias("id"),
        F.col("nid").alias("anc"),
        F.lit(0).cast("long").alias("depth"),
        F.col("nid").cast("long").alias("path_sum"),
    )
    done = None
    for _ in range(max_depth):
        step = state.join(edges, state.anc == edges.nid, "left").select(
            "id",
            F.col("npar").alias("next_anc"),
            F.col("anc"),
            "depth",
            "path_sum",
        )
        finished = step.where(F.col("next_anc").isNull()).select(
            "id", F.col("anc").alias("root"), "depth", "path_sum"
        )
        done = finished if done is None else done.unionByName(finished)
        state = (
            step.where(F.col("next_anc").isNotNull())
            .select(
                "id",
                F.col("next_anc").alias("anc"),
                (F.col("depth") + 1).alias("depth"),
                (F.col("path_sum") + F.col("next_anc")).alias("path_sum"),
            )
            .localCheckpoint(eager=False)
        )
        done = done.localCheckpoint(eager=False)
        # early exit once every chain has resolved — the isEmpty probe
        # materializes the checkpoint the next pass would need anyway,
        # and saves the remaining (max_depth − actual_depth) empty
        # passes, each of which still schedules real jobs
        if state.isEmpty():
            break
    return done


def hierarchy_oracle_sql(nodes_sql: str, max_depth: int = 12) -> str:
    """DuckDB WITH RECURSIVE computing the identical closure.
    ``nodes_sql``: SELECT producing (id, parent) where parent is NULL
    or refers to another id."""
    return f"""
    WITH RECURSIVE nodes AS ({nodes_sql}),
    walk AS (
      SELECT id, id AS anc, CAST(0 AS BIGINT) AS depth,
             CAST(id AS BIGINT) AS path_sum, 0 AS steps
      FROM nodes
      UNION ALL
      SELECT w.id, n.parent AS anc, w.depth + 1,
             w.path_sum + n.parent, w.steps + 1
      FROM walk w JOIN nodes n ON n.id = w.anc
      WHERE n.parent IS NOT NULL AND w.steps < {max_depth}
    )
    SELECT w.id, w.anc AS root, w.depth, w.path_sum
    FROM walk w JOIN nodes n ON n.id = w.anc
    WHERE n.parent IS NULL
    """


def hierarchy_closure_jump(
    nodes: DataFrame,
    id_col: str = "id",
    parent_col: str = "parent",
    max_depth: int = 4096,
) -> DataFrame:
    """Pointer-jumping variant of :func:`hierarchy_closure` — the
    log-depth scale path: each pass composes the jump table with
    itself (2^k-step ancestors), so a depth-d hierarchy resolves in
    ⌈log₂ d⌉ self-joins instead of d frontier passes. Use when chains
    are DEEP (long org chains, linked-list-like histories); the
    frontier chase wins when depth is small because its per-pass work
    shrinks while every jump pass joins the full node table.

    Same exact integer outputs (id, root, depth, path_sum) — locked
    against the chase version and the Python model in tests.
    """
    import math

    # jump state per node: ancestor after ≤2^k steps, steps actually
    # taken, id-sum over the traversed path EXCLUDING the node itself.
    # Roots are absorbing: (a=v, d=0, s=0) composes as identity.
    t = nodes.select(
        F.col(id_col).alias("v"),
        F.coalesce(F.col(parent_col), F.col(id_col)).alias("a"),
        F.when(F.col(parent_col).isNull(), F.lit(0))
        .otherwise(F.lit(1))
        .cast("long")
        .alias("d"),
        F.coalesce(F.col(parent_col), F.lit(0)).cast("long").alias("s"),
    ).localCheckpoint(eager=False)
    passes = max(1, math.ceil(math.log2(max_depth)))
    for _ in range(passes):
        u = t.select(
            F.col("v").alias("u_v"),
            F.col("a").alias("u_a"),
            F.col("d").alias("u_d"),
            F.col("s").alias("u_s"),
        )
        t = (
            t.join(u, t.a == u.u_v)
            .select(
                "v",
                F.col("u_a").alias("a"),
                (F.col("d") + F.col("u_d")).alias("d"),
                (F.col("s") + F.col("u_s")).alias("s"),
            )
            .localCheckpoint(eager=False)
        )
    return t.select(
        F.col("v").alias("id"),
        F.col("a").alias("root"),
        F.col("d").alias("depth"),
        (F.col("s") + F.col("v")).alias("path_sum"),
    )


# -- triangle counting --------------------------------------------------------
def triangle_count(
    edges: DataFrame, src: str = "src", dst: str = "dst", top_n: int = 20
) -> DataFrame:
    """Degree-oriented triangle counting — the standard distributed
    formulation (each triangle is found exactly once by orienting every
    edge from its lower-(degree, id) endpoint to its higher one, so no
    wedge is ever built AT a high-degree hub; the hub only ever appears
    as a destination). This is the property that makes the wedge join
    survive celebrity vertices at 100 TB: wedge fan-out per vertex is
    bounded by its OUT-degree, which orientation caps near sqrt(|E|).

    Input: undirected edges, any orientation, duplicates tolerated
    (canonicalized + distinct internally). Output: the ``top_n``
    vertices by triangle participation, ties by vertex ascending, each
    row also carrying the global ``total_triangles``.

    Columns: (vertex, triangles, total_triangles).
    """
    per_vertex = _triangle_participation(edges, src, dst).localCheckpoint(
        eager=True
    )
    total = per_vertex.agg(
        F.expr("sum(triangles) div 3").cast("long").alias("total_triangles")
    )
    return (
        per_vertex.orderBy(F.col("triangles").desc(), F.col("vertex").asc())
        .limit(top_n)
        .crossJoin(F.broadcast(total))
    )


def _triangle_participation(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Un-materialized per-vertex triangle participation — split out so
    the wedge-join pipeline's physical plan stays inspectable (the
    public wrapper localCheckpoints it, which truncates lineage)."""
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        e.select(F.col("a").alias("v"))
        .unionAll(e.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count("*").alias("deg"))
    )
    da = deg.select(F.col("v").alias("a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("v").alias("b"), F.col("deg").alias("deg_b"))
    with_deg = e.join(da, "a").join(db, "b")
    lower_first = (F.col("deg_a") < F.col("deg_b")) | (
        (F.col("deg_a") == F.col("deg_b")) & (F.col("a") < F.col("b"))
    )
    oriented = with_deg.select(
        F.when(lower_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(lower_first, F.col("b")).otherwise(F.col("a")).alias("w"),
    )
    e1 = oriented.select(F.col("u").alias("x"), F.col("w").alias("y"))
    e2 = oriented.select(F.col("u").alias("y"), F.col("w").alias("z"))
    wedges = e1.join(e2, "y").select("x", "y", "z")
    closing = oriented.select(F.col("u").alias("x"), F.col("w").alias("z"))
    tris = wedges.join(closing, ["x", "z"])
    # total = Σ participation / 3 — each triangle touches exactly three
    # vertices, so the wrapper derives the global count from this frame
    # with an integer div instead of a second pass over tris.
    return (
        tris.select(F.explode(F.array("x", "y", "z")).alias("vertex"))
        .groupBy("vertex")
        .agg(F.count("*").alias("triangles"))
    )


def triangle_count_oracle_sql(
    edges_sql: str, src: str = "src", dst: str = "dst", top_n: int = 20
) -> str:
    """DuckDB mirror of :func:`triangle_count` via the canonical
    a<b<c three-way enumeration (equivalent count — orientation is an
    execution strategy, not a semantics change)."""
    return f"""
    WITH raw AS ({edges_sql}),
    e AS (SELECT DISTINCT least({src}, {dst}) AS a, greatest({src}, {dst}) AS b
          FROM raw WHERE {src} <> {dst}),
    tri AS (
      SELECT e1.a AS x, e1.b AS y, e2.b AS z
      FROM e e1
      JOIN e e2 ON e2.a = e1.b
      JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
    ),
    per_vertex AS (
      SELECT vertex, count(*) AS triangles
      FROM (SELECT x AS vertex FROM tri
            UNION ALL SELECT y FROM tri
            UNION ALL SELECT z FROM tri)
      GROUP BY 1
    ),
    total AS (SELECT count(*) AS total_triangles FROM tri)
    SELECT vertex, CAST(triangles AS BIGINT) AS triangles,
           CAST(total_triangles AS BIGINT) AS total_triangles
    FROM per_vertex CROSS JOIN total
    ORDER BY triangles DESC, vertex ASC LIMIT {int(top_n)}
    """


# -- degree assortativity -----------------------------------------------------
def degree_assortativity(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Degree assortativity coefficient (Newman's r): the Pearson
    correlation of endpoint degrees over the symmetrized edge list —
    "do hubs link to hubs (r>0) or to leaves (r<0)?". The one-number
    summary of whether a co-purchase / link graph is hub-and-spoke
    (disassortative, typical for catalogs) or community-clustered.

    Integer core (the q137 ACF discipline): degrees are BIGINT, the
    five moments (M, Σx, Σxy, Σx², and Σy²=Σx² by symmetry) accumulate
    as exact integers over the 2|E| directed samples, and r is ONE
    double expression — products, a subtraction, one sqrt (IEEE
    exact-rounded) and one division. Zero-variance (regular graphs:
    every degree equal) yields NULL via a NULLIF guard, not an engine-
    dependent NaN/inf.

    Plan: dedup to canonical edges, one degree aggregate, two key
    joins to attach endpoint degrees, one global 1-row aggregate.

    Output: one row (m_samples, sum_x, sum_xy, sum_x2, r).
    """
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        e.select(F.col("a").alias("v"))
        .unionAll(e.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count("*").alias("deg"))
    )
    da = deg.select(F.col("v").alias("a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("v").alias("b"), F.col("deg").alias("deg_b"))
    wd = e.join(da, "a").join(db, "b")
    # symmetrize: every undirected edge contributes (dx,dy) and (dy,dx)
    sym = wd.select(
        F.col("deg_a").alias("x"), F.col("deg_b").alias("y")
    ).unionAll(wd.select(F.col("deg_b").alias("x"), F.col("deg_a").alias("y")))
    mom = sym.agg(
        F.count("*").alias("m_samples"),
        F.sum("x").alias("sum_x"),
        F.sum(F.col("x") * F.col("y")).alias("sum_xy"),
        F.sum(F.col("x") * F.col("x")).alias("sum_x2"),
    )
    num = (F.col("m_samples") * F.col("sum_xy") - F.col("sum_x") * F.col("sum_x")).cast(
        "double"
    )
    var = (F.col("m_samples") * F.col("sum_x2") - F.col("sum_x") * F.col("sum_x")).cast(
        "double"
    )
    return mom.select(
        "m_samples",
        "sum_x",
        "sum_xy",
        "sum_x2",
        (num / F.nullif(var, F.lit(0.0))).alias("r"),
    )


def degree_assortativity_oracle_sql(
    edges_sql: str, src: str = "src", dst: str = "dst"
) -> str:
    """DuckDB mirror of :func:`degree_assortativity`."""
    return f"""
    WITH raw AS ({edges_sql}),
    e AS (SELECT DISTINCT least({src}, {dst}) AS a, greatest({src}, {dst}) AS b
          FROM raw WHERE {src} <> {dst}),
    deg AS (SELECT v, count(*) AS deg FROM (
              SELECT a AS v FROM e UNION ALL SELECT b FROM e) GROUP BY 1),
    wd AS (SELECT da.deg AS deg_a, db.deg AS deg_b
           FROM e JOIN deg da ON da.v = e.a JOIN deg db ON db.v = e.b),
    sym AS (SELECT deg_a AS x, deg_b AS y FROM wd
            UNION ALL SELECT deg_b, deg_a FROM wd),
    mom AS (SELECT count(*) AS m_samples, sum(x) AS sum_x,
                   sum(x * y) AS sum_xy, sum(x * x) AS sum_x2
            FROM sym)
    SELECT CAST(m_samples AS BIGINT) AS m_samples,
           CAST(sum_x AS BIGINT) AS sum_x,
           CAST(sum_xy AS BIGINT) AS sum_xy,
           CAST(sum_x2 AS BIGINT) AS sum_x2,
           CAST(m_samples * sum_xy - sum_x * sum_x AS DOUBLE)
             / NULLIF(CAST(m_samples * sum_x2 - sum_x * sum_x AS DOUBLE), 0.0)
             AS r
    FROM mom
    """


# -- label propagation communities --------------------------------------------
def label_propagation(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 3,
    broadcast_labels: bool = False,
) -> DataFrame:
    """Deterministic synchronous label propagation: ``iters`` rounds of
    "adopt the most common label among my neighbors" (ties: LOWEST
    label — the classic LPA random tie-break made reproducible), labels
    initialized to node ids. Communities without modularity math: the
    cheap first-pass clustering for co-purchase / link graphs.

    Determinism: synchronous updates (all nodes step on the previous
    round's labels), argmax as ``max(struct(cnt, -label))`` — exactly
    "highest count, then lowest label" — mirrored in the oracle as
    min(label) over the max-count set. Pure integers throughout.

    Scale shape (the pagerank_fixedpoint loop discipline): the
    symmetrized edge list is loop-invariant and checkpointed once;
    each round is one edges⋈labels join on the neighbor key plus two
    map-combined aggregates; labels are checkpointed per round so the
    plan stays O(1). Every node appears in the edge list by
    construction, so no left-join backfill is needed.

    Output: (node, label) — one row per vertex.
    """
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    sym = (
        e.select(F.col("a").alias("u"), F.col("b").alias("v"))
        .unionAll(e.select(F.col("b").alias("u"), F.col("a").alias("v")))
        .localCheckpoint(eager=False)
    )
    labels = sym.select(F.col("u").alias("node")).distinct().select(
        "node", F.col("node").alias("label")
    )
    for it in range(iters):
        # the per-round label frame is checkpoint-derived (no size
        # statistics) so Catalyst plans a sort-merge join that shuffles
        # the EDGE frame every round; for dimension-bounded node sets
        # the hint turns it into a BroadcastHashJoin and the edges
        # never shuffle (the pagerank broadcast_ranks pattern, r16)
        label_side = F.broadcast(labels) if broadcast_labels else labels
        nb = sym.join(label_side, sym.v == labels.node).select("u", "label")
        counts = nb.groupBy("u", "label").agg(F.count("*").alias("cnt"))
        labels = (
            counts.groupBy("u")
            .agg(
                F.max(
                    F.struct(F.col("cnt"), (-F.col("label")).alias("nl"))
                ).alias("m")
            )
            .select(F.col("u").alias("node"), (-F.col("m.nl")).alias("label"))
        )
        # r16: the checkpoint feeds the NEXT round's join; the final
        # round's frame is consumed exactly once by the caller, so
        # checkpointing it would only add a separate materialization
        # job (under AQE a lazy localCheckpoint executes its stages
        # at toRdd time) — fold it into the consumer's job instead
        if it < iters - 1:
            labels = labels.localCheckpoint(eager=False)
    return labels


def label_propagation_oracle_sql(
    edges_sql: str,
    src: str = "src",
    dst: str = "dst",
    iters: int = 3,
) -> str:
    """DuckDB SQL unrolling the identical synchronous rounds."""
    ctes = [
        f"raw AS ({edges_sql})",
        f"e AS (SELECT DISTINCT least({src}, {dst}) AS a, "
        f"greatest({src}, {dst}) AS b FROM raw WHERE {src} <> {dst})",
        "sym AS (SELECT a AS u, b AS v FROM e UNION ALL SELECT b, a FROM e)",
        "l0 AS (SELECT DISTINCT u AS node, u AS label FROM sym)",
    ]
    for i in range(1, iters + 1):
        ctes.append(
            f"c{i} AS (SELECT s.u, l.label, count(*) AS cnt "
            f"FROM sym s JOIN l{i - 1} l ON l.node = s.v GROUP BY 1, 2)"
        )
        ctes.append(
            f"m{i} AS (SELECT u, max(cnt) AS mc FROM c{i} GROUP BY 1)"
        )
        ctes.append(
            f"l{i} AS (SELECT c.u AS node, min(c.label) AS label "
            f"FROM c{i} c JOIN m{i} m ON m.u = c.u AND c.cnt = m.mc GROUP BY 1)"
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT node, label FROM l{iters}"
    )


def kcore_peel(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    k: int = 3,
    rounds: int = 4,
) -> DataFrame:
    """``rounds`` synchronous peeling steps toward the k-core: each
    round recomputes degrees over the surviving subgraph and removes
    every vertex with degree < k (and its edges). The fixed round count
    (rather than loop-to-convergence) keeps the operator a finite
    deterministic plan the oracle can unroll exactly — callers needing
    the true fixpoint iterate until the survivor count stops moving
    (each extra round is one join + one aggregate; peeling converges in
    at most |V| rounds, in practice a handful).

    Scale shape (the label_propagation loop discipline): the
    symmetrized edge list is checkpointed once; each round is one
    degree aggregate plus two left-semi joins against the (small,
    shrinking) survivor set; the edge frame is checkpointed per round
    so the plan stays O(1) deep. Pure integers.

    Output: (node, degree) — survivors with their residual degree
    after the final round.
    """
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    sym = (
        e.select(F.col("a").alias("u"), F.col("b").alias("v"))
        .unionAll(e.select(F.col("b").alias("u"), F.col("a").alias("v")))
        .localCheckpoint(eager=False)
    )
    cur = sym
    for _ in range(rounds):
        deg = cur.groupBy("u").agg(F.count("*").alias("d"))
        keep = deg.where(F.col("d") >= k).select("u")
        # NOTE (r16): unlike pagerank/label_propagation, the per-round
        # checkpoint is NOT trimmed on the last round — `keep` appears
        # twice in the round's plan (both semi joins), so an
        # un-checkpointed final round would duplicate the degree
        # aggregate subtree in the returned plan
        cur = (
            cur.join(keep, "u", "left_semi")
            .join(keep.select(F.col("u").alias("v")), "v", "left_semi")
            .localCheckpoint(eager=False)
        )
    return cur.groupBy(F.col("u").alias("node")).agg(F.count("*").alias("degree"))


def kcore_oracle_sql(
    edges_sql: str,
    src: str = "src",
    dst: str = "dst",
    k: int = 3,
    rounds: int = 4,
) -> str:
    """DuckDB SQL unrolling the identical peeling rounds."""
    ctes = [
        f"raw AS ({edges_sql})",
        f"e AS (SELECT DISTINCT least({src}, {dst}) AS a, "
        f"greatest({src}, {dst}) AS b FROM raw WHERE {src} <> {dst})",
        "s0 AS (SELECT a AS u, b AS v FROM e UNION ALL SELECT b, a FROM e)",
    ]
    for i in range(1, rounds + 1):
        prev = f"s{i - 1}"
        ctes.append(
            f"k{i} AS (SELECT u FROM {prev} GROUP BY 1 HAVING count(*) >= {k})"
        )
        ctes.append(
            f"s{i} AS (SELECT s.u, s.v FROM {prev} s "
            f"JOIN k{i} ku ON ku.u = s.u "
            f"JOIN k{i} kv ON kv.u = s.v)"
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT u AS node, CAST(count(*) AS BIGINT) AS degree "
        f"FROM s{rounds} GROUP BY 1"
    )
