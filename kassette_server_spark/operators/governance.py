"""Data-governance and table-maintenance operators: small-file
compaction planning, k-anonymity / l-diversity auditing, and quantile
normalization across groups.

These are the operational layer around a 100 TB corpus: the compaction
planner is what you run over file-listing metadata before rewriting a
fragmented table (Spark's small-file problem); the k-anonymity report
is the release gate before sharing a slice; quantile normalization is
the batch-effect correction applied when per-source value
distributions must be made comparable (the bioinformatics technique,
Bolstad et al. 2003, re-expressed over exact distributed order
statistics).

Determinism contract: identical to operators/evaluation.py — BIGINT
cores (sizes, counts, ranks, order statistics over integer values),
single IEEE divisions at the tail, integer division via `div`/`//`
(never floor of a float quotient — a correctly-rounded double division
can land exactly on an integer boundary and floor the wrong way).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .guards import require_integral


# -- compaction planning ------------------------------------------------------
def compaction_plan(
    df: DataFrame,
    part_col: str,
    order_col: str,
    size_col: str,
    target_bytes: int,
) -> DataFrame:
    """Assign items (files, documents, chunks) to target-size output
    bins per partition: walk each partition in ``order_col`` order and
    open a new bin every time the RUNNING size crosses a multiple of
    ``target_bytes`` — ``bin = cum_prev_size div target`` — so bins are
    contiguous ranges of the ordering (rewrites stay sequential reads)
    and every bin except the last per partition holds >= target bytes
    the moment it closes.

    This is the planner HALF of compaction: it reads only (partition,
    id, size) metadata — at 100 TB that is the file listing (millions
    of rows), never the data. One window per partition (one Exchange on
    the partition key), one aggregate on (partition, bin) that reuses
    the same partitioning prefix.

    Output: (part, bin, n_items, bytes, first_id, last_id, fill) with
    ``fill = bytes / target`` (>1 means the closing item overshot).
    """
    p, o, s = part_col, order_col, size_col
    # alias FIRST, window over the alias: a window over the original
    # column followed by a rename severs Spark's alias-aware output
    # partitioning, and the (part, bin) aggregate pays a second
    # Exchange it doesn't need (caught by the q179 plan lock — the
    # window's hash(part) clustering must satisfy the agg's
    # {part, bin} ClusteredDistribution via the subset rule)
    base = df.select(
        F.col(p).alias("part"),
        F.col(o).alias("_id"),
        F.col(s).cast("long").alias("_sz"),
    )
    w = (
        Window.partitionBy("part")
        .orderBy("_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    binned = base.withColumn(
        "_cum", F.coalesce(F.sum("_sz").over(w), F.lit(0))
    ).withColumn("bin", F.expr(f"_cum div {int(target_bytes)}").cast("long"))
    return binned.groupBy("part", "bin").agg(
        F.count("*").alias("n_items"),
        F.sum("_sz").alias("bytes"),
        F.min("_id").alias("first_id"),
        F.max("_id").alias("last_id"),
    ).withColumn(
        "fill",
        F.col("bytes").cast("double") / F.lit(float(int(target_bytes))),
    )


def compaction_plan_oracle_sql(
    source_sql: str,
    part_col: str,
    order_col: str,
    size_col: str,
    target_bytes: int,
) -> str:
    """DuckDB mirror of :func:`compaction_plan`."""
    p, o, s, t = part_col, order_col, size_col, int(target_bytes)
    return f"""
    WITH src0 AS ({source_sql}),
    binned AS (
      SELECT {p} AS part, {o} AS _id, CAST({s} AS BIGINT) AS _sz,
             COALESCE(sum(CAST({s} AS BIGINT)) OVER (
                 PARTITION BY {p} ORDER BY {o}
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               // {t} AS bin
      FROM src0
    )
    SELECT part, CAST(bin AS BIGINT) AS bin,
           CAST(count(*) AS BIGINT) AS n_items,
           CAST(sum(_sz) AS BIGINT) AS bytes,
           min(_id) AS first_id, max(_id) AS last_id,
           CAST(sum(_sz) AS DOUBLE) / CAST({t} AS DOUBLE) AS fill
    FROM binned GROUP BY 1, 2
    """


# -- k-anonymity / l-diversity audit ------------------------------------------
def k_anonymity_report(
    df: DataFrame,
    qi_cols: list[str],
    sens_col: str,
    k: int = 5,
    l: int = 3,
) -> DataFrame:
    """Release-gate audit of a table against k-anonymity (every
    quasi-identifier equivalence class has >= k rows) and distinct
    l-diversity (every surviving class carries >= l distinct sensitive
    values). Reports the suppression cost of enforcing k: rows in
    classes smaller than k are what generalization or suppression must
    absorb.

    Plan: ONE aggregate of the data to QI equivalence classes (exact
    countDistinct of the sensitive attribute per class — sensitive
    cardinality is bounded in any sane schema), then a 1-row summary
    over the class frame. Nothing after the first shuffle scales with
    row count.

    Output: one row (n_rows, n_classes, min_class_size,
    n_small_classes, suppressed_rows, suppression_rate, min_l,
    n_low_l_classes) — min_l is over classes that SURVIVE the k cut
    (suppressed classes are already gone), NULL if none survive.
    """
    classes = df.groupBy(*qi_cols).agg(
        F.count("*").alias("_n"),
        F.countDistinct(sens_col).alias("_ndv"),
    )
    small = F.col("_n") < k
    return classes.agg(
        F.sum("_n").alias("n_rows"),
        F.count("*").alias("n_classes"),
        F.min("_n").alias("min_class_size"),
        F.sum(small.cast("long")).alias("n_small_classes"),
        F.coalesce(F.sum(F.when(small, F.col("_n"))), F.lit(0)).alias(
            "suppressed_rows"
        ),
        (
            F.coalesce(F.sum(F.when(small, F.col("_n"))), F.lit(0)).cast("double")
            / F.sum("_n").cast("double")
        ).alias("suppression_rate"),
        F.min(F.when(~small, F.col("_ndv"))).alias("min_l"),
        F.coalesce(
            F.sum((~small & (F.col("_ndv") < l)).cast("long")), F.lit(0)
        ).alias("n_low_l_classes"),
    )


def k_anonymity_oracle_sql(
    source_sql: str, qi_cols: list[str], sens_col: str, k: int = 5, l: int = 3
) -> str:
    """DuckDB mirror of :func:`k_anonymity_report`."""
    qi = ", ".join(qi_cols)
    return f"""
    WITH src0 AS ({source_sql}),
    classes AS (
      SELECT {qi}, count(*) AS _n, count(DISTINCT {sens_col}) AS _ndv
      FROM src0 GROUP BY {qi}
    )
    SELECT CAST(sum(_n) AS BIGINT) AS n_rows,
           CAST(count(*) AS BIGINT) AS n_classes,
           CAST(min(_n) AS BIGINT) AS min_class_size,
           CAST(sum(CASE WHEN _n < {k} THEN 1 ELSE 0 END) AS BIGINT)
             AS n_small_classes,
           CAST(COALESCE(sum(CASE WHEN _n < {k} THEN _n END), 0) AS BIGINT)
             AS suppressed_rows,
           CAST(COALESCE(sum(CASE WHEN _n < {k} THEN _n END), 0) AS DOUBLE)
             / CAST(sum(_n) AS DOUBLE) AS suppression_rate,
           CAST(min(CASE WHEN _n >= {k} THEN _ndv END) AS BIGINT) AS min_l,
           CAST(COALESCE(sum(CASE WHEN _n >= {k} AND _ndv < {l}
                              THEN 1 ELSE 0 END), 0) AS BIGINT)
             AS n_low_l_classes
    FROM classes
    """


# -- quantile normalization ---------------------------------------------------
def quantile_normalize_summary(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_col: str,
    n_grid: int = 64,
) -> DataFrame:
    """Quantile-normalize integer ``value_col`` across ``group_col``
    batches against an ``n_grid``-point grid of POOLED exact order
    statistics, and report per-group summaries of the normalized
    values — the distributed batch-effect correction: after it, every
    group's value distribution is (up to grid resolution) the pooled
    distribution.

    Mapping: row with rank r of m in its group (ties broken by
    ``id_col``) lands in grid cell ``b = (2r-1)·B div (2m)`` (midpoint
    rule, integer division — floor of a float quotient is banned);
    cell b's normalized value is the smallest pooled value whose
    cumulative count covers the (2b+1)/(2B) pooled quantile. The grid
    is computed from the VALUE-COUNT frame (cardinality-bounded
    cumsum + B conditional mins — the decile_lift cuts technique
    widened to B), so the exact order statistics never sort raw rows;
    rows join the B-row grid via broadcast.

    Summaries are BIGINT (normalized values are pooled input values)
    plus one mean division.

    Output: (group, n, sum_norm, min_norm, max_norm, mean_norm).
    """
    g, v, i, B = group_col, value_col, id_col, n_grid
    require_integral(df, v, "quantile_normalize_summary")
    base = df.where(
        F.col(g).isNotNull() & F.col(v).isNotNull() & F.col(i).isNotNull()
    ).select(
        F.col(g).alias("_g"),
        F.col(v).cast("long").alias("_v"),
        F.col(i).alias("_id"),
    )
    counts = base.groupBy("_v").agg(F.count("*").alias("_cnt"))
    wcum = Window.orderBy("_v").rowsBetween(Window.unboundedPreceding, 0)
    cum = counts.select("_v", F.sum("_cnt").over(wcum).alias("_cum"))
    tot = counts.agg(F.sum("_cnt").alias("_N"))
    # r16: both B-wide expression lists are built via one F.expr parse
    # per column (the composed-Column spelling cost ~8 py4j round
    # trips each — ~1 s of driver time per build at B=64). Identical
    # trees: min(CASE WHEN _cum·2B >= _N·(2b+1) THEN _v END) and the
    # bigint-tagged struct array.
    grid_wide = cum.crossJoin(F.broadcast(tot)).agg(
        *[
            F.expr(
                f"min(case when _cum * {2 * B} >= _N * {2 * b + 1} "
                "then _v end)"
            ).alias(f"_gv{b}")
            for b in range(B)
        ]
    )
    grid = grid_wide.select(
        F.expr(
            "explode(array("
            + ", ".join(
                f"named_struct('_b', cast({b} as bigint), '_norm', _gv{b})"
                for b in range(B)
            )
            + "))"
        ).alias("_c")
    ).select("_c.*")
    wrank = Window.partitionBy("_g").orderBy("_v", "_id")
    wsize = Window.partitionBy("_g")
    ranked = base.select(
        "_g",
        F.row_number().over(wrank).alias("_r"),
        F.count("*").over(wsize).alias("_m"),
    ).withColumn("_b", F.expr(f"((2 * _r - 1) * {B}) div (2 * _m)").cast("long"))
    normed = ranked.join(F.broadcast(grid), "_b")
    return normed.groupBy(F.col("_g").alias(group_col)).agg(
        F.count("*").alias("n"),
        F.sum("_norm").alias("sum_norm"),
        F.min("_norm").alias("min_norm"),
        F.max("_norm").alias("max_norm"),
    ).withColumn(
        "mean_norm",
        F.col("sum_norm").cast("double") / F.col("n").cast("double"),
    )


def quantile_normalize_oracle_sql(
    source_sql: str,
    group_col: str,
    value_col: str,
    id_col: str,
    n_grid: int = 64,
) -> str:
    """DuckDB mirror of :func:`quantile_normalize_summary`."""
    g, v, i, B = group_col, value_col, id_col, n_grid
    gv_exprs = ", ".join(
        f"min(CASE WHEN _cum * {2 * B} >= _N * {2 * b + 1} THEN _v END) AS _gv{b}"
        for b in range(B)
    )
    grid_rows = " UNION ALL ".join(
        f"SELECT CAST({b} AS BIGINT) AS _b, _gv{b} AS _norm FROM grid_wide"
        for b in range(B)
    )
    return f"""
    WITH src0 AS ({source_sql}),
    base AS (SELECT {g} AS _g, CAST({v} AS BIGINT) AS _v, {i} AS _id
             FROM src0
             WHERE {g} IS NOT NULL AND {v} IS NOT NULL AND {i} IS NOT NULL),
    counts AS (SELECT _v, count(*) AS _cnt FROM base GROUP BY 1),
    cum AS (SELECT _v, sum(_cnt) OVER (ORDER BY _v
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS _cum
            FROM counts),
    tot AS (SELECT sum(_cnt) AS _N FROM counts),
    grid_wide AS (SELECT {gv_exprs} FROM cum CROSS JOIN tot),
    grid AS ({grid_rows}),
    ranked AS (
      SELECT _g,
             ((2 * row_number() OVER (PARTITION BY _g ORDER BY _v, _id) - 1)
              * {B}) // (2 * count(*) OVER (PARTITION BY _g)) AS _b
      FROM base
    )
    SELECT _g AS {g},
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(_norm) AS BIGINT) AS sum_norm,
           CAST(min(_norm) AS BIGINT) AS min_norm,
           CAST(max(_norm) AS BIGINT) AS max_norm,
           CAST(sum(_norm) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mean_norm
    FROM ranked JOIN grid USING (_b)
    GROUP BY 1
    """
