"""Model-evaluation analytics: exact ROC-AUC, decile lift, threshold
confusion metrics, Cohen's kappa, NDCG@k.

The layer a training-data pipeline runs AFTER a model (quality
classifier, language-ID, ranking model) starts emitting scores over
the corpus: "is the score actually predictive, where do I cut, does
the ranker put the right documents on top, does the automatic labeler
agree with the human labels". The reference has no evaluation layer at
all; this extends the §2.3 north-star families (SURVEY.md) the same
way the drift family (operators/drift.py) extended monitoring.

Determinism contract (shared with drift.py / stats.py, proven over the
oracle suite): every metric stays in BIGINT arithmetic until the LAST
expression, which is a single IEEE exact-rounded division (or, for
NDCG, one fixed-shape polynomial over literal doubles both engines
parse identically — the Benford-probabilities precedent). No libm
transcendentals, no float summation across rows, NULL guards via
NULLIF on both engines.

Scale notes (SCALE.md "Round 8"): ranks are computed over DISTINCT
(group, score) values, never raw rows — the Mann-Whitney move
(drift.py:438) that bounds the window input by value cardinality.
Decile cuts are exact order statistics from a value-count frame (the
rfm_scores technique, stats.py:384), not ntile over a global sort.
Threshold metrics are ONE wide aggregate over one scan. Kappa runs
everything off a single C×C contingency frame, materialized once.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# 1/log2(i+1) for rank i = 1..10, embedded as repr() literals so Spark
# and DuckDB parse the identical IEEE doubles (no runtime log2 call —
# the engines' libm implementations are allowed to differ in the last
# ulp; literals are not).
NDCG_DISCOUNTS: tuple[float, ...] = (
    1.0,
    0.6309297535714575,
    0.5,
    0.43067655807339306,
    0.38685280723454163,
    0.3562071871080222,
    0.3333333333333333,
    0.31546487678572877,
    0.3010299956639812,
    0.2890648263178879,
)


# -- exact ROC-AUC ------------------------------------------------------------
def roc_auc_by(
    df: DataFrame, group_col: str, label_col: str, score_col: str
) -> DataFrame:
    """Exact ROC-AUC of ``score_col`` predicting binary ``label_col``,
    per ``group_col`` segment — via the rank identity
    ``AUC = U / (n_pos * n_neg)`` with midranks for ties.

    Integer core: a row at score v has twice-its-average-rank
    ``2 * (#smaller in segment) + ties + 1`` (the Mann-Whitney trick,
    drift.py:438, but ranked WITHIN each segment between the two label
    classes rather than one segment vs the rest). ``two_u`` is exactly
    2U as BIGINT; ``auc = two_u / (2 * n_pos * n_neg)`` is one IEEE
    division, NULL when a segment is single-class.

    Plan: one aggregate to DISTINCT (group, score) with per-value
    positive counts (the only full-data shuffle), a cumulative window
    per group over distinct scores (bounded by value cardinality), and
    a final per-group aggregate that reuses the group partitioning.

    Output: (group, n_pos, n_neg, two_u, auc).
    """
    g, y, s = group_col, label_col, score_col
    base = df.where(
        F.col(g).isNotNull() & F.col(y).isNotNull() & F.col(s).isNotNull()
    ).select(
        F.col(g).alias("_g"),
        F.col(y).cast("long").alias("_y"),
        F.col(s).alias("_s"),
    )
    vals = base.groupBy("_g", "_s").agg(
        F.count("*").alias("_cnt"), F.sum("_y").alias("_pos")
    )
    w = (
        Window.partitionBy("_g")
        .orderBy("_s")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ranked = vals.select(
        "_g",
        "_cnt",
        "_pos",
        (2 * F.coalesce(F.sum("_cnt").over(w), F.lit(0)) + F.col("_cnt") + 1).alias(
            "_two_rank"
        ),
    )
    per_g = ranked.groupBy(F.col("_g").alias(group_col)).agg(
        F.sum("_pos").alias("n_pos"),
        F.sum(F.col("_cnt") - F.col("_pos")).alias("n_neg"),
        F.sum(F.col("_pos") * F.col("_two_rank")).alias("_two_r_pos"),
    )
    two_u = F.col("_two_r_pos") - F.col("n_pos") * (F.col("n_pos") + 1)
    return per_g.select(
        group_col,
        "n_pos",
        "n_neg",
        two_u.alias("two_u"),
        (
            two_u.cast("double")
            / F.nullif(
                (2 * F.col("n_pos") * F.col("n_neg")).cast("double"), F.lit(0.0)
            )
        ).alias("auc"),
    )


def roc_auc_oracle_sql(
    source_sql: str, group_col: str, label_col: str, score_col: str
) -> str:
    """DuckDB mirror of :func:`roc_auc_by` (identical integer core)."""
    g, y, s = group_col, label_col, score_col
    return f"""
    WITH src0 AS ({source_sql}),
    src AS (SELECT {g} AS _g, CAST({y} AS BIGINT) AS _y, {s} AS _s
            FROM src0
            WHERE {g} IS NOT NULL AND {y} IS NOT NULL AND {s} IS NOT NULL),
    vals AS (SELECT _g, _s, count(*) AS _cnt, sum(_y) AS _pos
             FROM src GROUP BY 1, 2),
    ranked AS (
      SELECT _g, _cnt, _pos,
             2 * COALESCE(sum(_cnt) OVER (PARTITION BY _g ORDER BY _s
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               + _cnt + 1 AS _two_rank
      FROM vals
    ),
    per_g AS (
      SELECT _g, sum(_pos) AS n_pos, sum(_cnt - _pos) AS n_neg,
             sum(_pos * _two_rank) AS _two_r_pos
      FROM ranked GROUP BY 1
    )
    SELECT _g AS {g},
           CAST(n_pos AS BIGINT) AS n_pos,
           CAST(n_neg AS BIGINT) AS n_neg,
           CAST(_two_r_pos - n_pos * (n_pos + 1) AS BIGINT) AS two_u,
           CAST(_two_r_pos - n_pos * (n_pos + 1) AS DOUBLE)
             / NULLIF(CAST(2 * n_pos * n_neg AS DOUBLE), 0.0) AS auc
    FROM per_g
    """


# -- decile lift --------------------------------------------------------------
def decile_lift(
    df: DataFrame, score_col: str, label_col: str, n_buckets: int = 10
) -> DataFrame:
    """Decile lift / gains table: bucket the population into ``n_buckets``
    score deciles (decile 1 = highest scores) and report per-decile and
    cumulative response, with lift vs the base rate.

    Bucketing is by EXACT order-statistic cuts from a value-count frame
    (the rfm_scores technique, stats.py:384): cut k is the smallest
    score whose cumulative count reaches ceil(k*n/B). Tied scores land
    in one bucket — deterministic in both engines, unlike ntile, which
    splits ties by physical row order. Bucket sizes are therefore
    approximately-equal, exactly reproducible.

    Integer core: per-decile (n, pos) counts; ``resp_rate = pos/n`` and
    ``cum_lift = (cum_pos*tot_n)/(cum_n*tot_pos)`` are single IEEE
    divisions of BIGINT products. The cumulative window runs over
    <= n_buckets rows.

    Output: (decile, n, pos, resp_rate, cum_lift), decile ascending.
    """
    s, y, B = score_col, label_col, n_buckets
    base = df.where(F.col(s).isNotNull() & F.col(y).isNotNull()).select(
        F.col(s).alias("_s"), F.col(y).cast("long").alias("_y")
    )
    # materialize the value-count frame ONCE (eager localCheckpoint —
    # the cohens_kappa / graph.py precedent): three branches consume it
    # (cumulative cuts, totals, bucketed re-aggregation) and without
    # the checkpoint each branch re-scans the base table — one scan vs
    # three is the difference that matters at 100 TB. The frame itself
    # is bounded by score cardinality, not row count.
    counts = (
        base.groupBy("_s")
        .agg(F.count("*").alias("_cnt"), F.sum("_y").alias("_pos"))
        .localCheckpoint(eager=True)
    )
    wcum = Window.orderBy("_s").rowsBetween(Window.unboundedPreceding, 0)
    cum = counts.select(
        "_s", "_cnt", "_pos", F.sum("_cnt").over(wcum).alias("_cum")
    )
    tot = counts.agg(F.sum("_cnt").alias("_n"))
    cuts = cum.crossJoin(F.broadcast(tot)).agg(
        *[
            F.min(F.when(F.col("_cum") * B >= F.col("_n") * k, F.col("_s"))).alias(
                f"_t{k}"
            )
            for k in range(1, B)
        ]
    )
    bucket_asc = F.lit(1)
    for k in range(1, B):
        bucket_asc = bucket_asc + (F.col("_s") > F.col(f"_t{k}")).cast("int")
    per_decile = (
        cum.crossJoin(F.broadcast(cuts))
        .withColumn("decile", (F.lit(B + 1) - bucket_asc).cast("long"))
        .groupBy("decile")
        .agg(F.sum("_cnt").alias("n"), F.sum("_pos").alias("pos"))
    )
    wd = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.partitionBy()
    cum_n = F.sum("n").over(wd)
    cum_pos = F.sum("pos").over(wd)
    tot_n = F.sum("n").over(wall)
    tot_pos = F.sum("pos").over(wall)
    return per_decile.select(
        "decile",
        "n",
        "pos",
        (
            F.col("pos").cast("double") / F.col("n").cast("double")
        ).alias("resp_rate"),
        (
            (cum_pos * tot_n).cast("double")
            / F.nullif((cum_n * tot_pos).cast("double"), F.lit(0.0))
        ).alias("cum_lift"),
    )


def decile_lift_oracle_sql(
    source_sql: str, score_col: str, label_col: str, n_buckets: int = 10
) -> str:
    """DuckDB mirror of :func:`decile_lift` (same cuts, same buckets)."""
    s, y, B = score_col, label_col, n_buckets
    cut_exprs = ", ".join(
        f"min(CASE WHEN _cum * {B} >= _n * {k} THEN _s END) AS _t{k}"
        for k in range(1, B)
    )
    bucket = " + ".join(
        f"CAST(_s > _t{k} AS INTEGER)" for k in range(1, B)
    )
    return f"""
    WITH src0 AS ({source_sql}),
    src AS (SELECT {s} AS _s, CAST({y} AS BIGINT) AS _y FROM src0
            WHERE {s} IS NOT NULL AND {y} IS NOT NULL),
    counts AS (SELECT _s, count(*) AS _cnt, sum(_y) AS _pos
               FROM src GROUP BY 1),
    cum AS (SELECT _s, _cnt, _pos,
                   sum(_cnt) OVER (ORDER BY _s
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS _cum
            FROM counts),
    tot AS (SELECT sum(_cnt) AS _n FROM counts),
    cuts AS (SELECT {cut_exprs} FROM cum CROSS JOIN tot),
    per_decile AS (
      SELECT CAST({B} + 1 - (1 + {bucket}) AS BIGINT) AS decile,
             sum(_cnt) AS n, sum(_pos) AS pos
      FROM cum CROSS JOIN cuts
      GROUP BY 1
    )
    SELECT decile, CAST(n AS BIGINT) AS n, CAST(pos AS BIGINT) AS pos,
           CAST(pos AS DOUBLE) / CAST(n AS DOUBLE) AS resp_rate,
           CAST(sum(pos) OVER (ORDER BY decile
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              * sum(n) OVER () AS DOUBLE)
           / NULLIF(CAST(sum(n) OVER (ORDER BY decile
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              * sum(pos) OVER () AS DOUBLE), 0.0) AS cum_lift
    FROM per_decile
    """


# -- threshold confusion metrics ----------------------------------------------
def threshold_metrics(
    df: DataFrame, score_col: str, label_col: str, thresholds: tuple[int, ...]
) -> DataFrame:
    """Precision / recall / F1 at each literal score threshold — the
    "where do I cut the quality score" sweep.

    ONE wide aggregate over ONE scan computes (tp, fp, fn, tn) for
    every threshold simultaneously (no per-threshold re-scan, no join
    against an exploded threshold table — the data is read once however
    many thresholds are swept), then the 1-row frame is unpivoted to
    one row per threshold. ``f1 = 2*tp / (2*tp + fp + fn)`` — integer
    rationals, single divisions, NULLIF guards.

    Output: (threshold, tp, fp, fn, tn, precision, recall, f1).
    """
    s, y = score_col, label_col
    base = df.where(F.col(s).isNotNull() & F.col(y).isNotNull()).select(
        F.col(s).alias("_s"), (F.col(y).cast("long") == 1).alias("_pos")
    )
    aggs = []
    for i, t in enumerate(thresholds):
        pred = F.col("_s") >= F.lit(t)
        aggs += [
            F.sum((pred & F.col("_pos")).cast("long")).alias(f"_tp{i}"),
            F.sum((pred & ~F.col("_pos")).cast("long")).alias(f"_fp{i}"),
            F.sum((~pred & F.col("_pos")).cast("long")).alias(f"_fn{i}"),
            F.sum((~pred & ~F.col("_pos")).cast("long")).alias(f"_tn{i}"),
        ]
    wide = base.agg(*aggs)
    rows = wide.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(int(t)).cast("long").alias("threshold"),
                        F.col(f"_tp{i}").alias("tp"),
                        F.col(f"_fp{i}").alias("fp"),
                        F.col(f"_fn{i}").alias("fn"),
                        F.col(f"_tn{i}").alias("tn"),
                    )
                    for i, t in enumerate(thresholds)
                ]
            )
        ).alias("_m")
    ).select("_m.*")
    return rows.select(
        "threshold",
        "tp",
        "fp",
        "fn",
        "tn",
        (
            F.col("tp").cast("double")
            / F.nullif((F.col("tp") + F.col("fp")).cast("double"), F.lit(0.0))
        ).alias("precision"),
        (
            F.col("tp").cast("double")
            / F.nullif((F.col("tp") + F.col("fn")).cast("double"), F.lit(0.0))
        ).alias("recall"),
        (
            (2 * F.col("tp")).cast("double")
            / F.nullif(
                (2 * F.col("tp") + F.col("fp") + F.col("fn")).cast("double"),
                F.lit(0.0),
            )
        ).alias("f1"),
    )


def threshold_metrics_oracle_sql(
    source_sql: str, score_col: str, label_col: str, thresholds: tuple[int, ...]
) -> str:
    """DuckDB mirror of :func:`threshold_metrics` (unnest + one agg per
    threshold group — the oracle may re-group; values are identical)."""
    s, y = score_col, label_col
    tlist = ", ".join(str(int(t)) for t in thresholds)
    return f"""
    WITH src0 AS ({source_sql}),
    src AS (SELECT {s} AS _s, CAST({y} AS BIGINT) = 1 AS _pos FROM src0
            WHERE {s} IS NOT NULL AND {y} IS NOT NULL),
    m AS (
      SELECT CAST(t AS BIGINT) AS threshold,
             sum(CASE WHEN _s >= t AND _pos THEN 1 ELSE 0 END) AS tp,
             sum(CASE WHEN _s >= t AND NOT _pos THEN 1 ELSE 0 END) AS fp,
             sum(CASE WHEN _s < t AND _pos THEN 1 ELSE 0 END) AS fn,
             sum(CASE WHEN _s < t AND NOT _pos THEN 1 ELSE 0 END) AS tn
      FROM src CROSS JOIN unnest([{tlist}]) AS u(t)
      GROUP BY 1
    )
    SELECT threshold,
           CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
           CAST(fn AS BIGINT) AS fn, CAST(tn AS BIGINT) AS tn,
           CAST(tp AS DOUBLE) / NULLIF(CAST(tp + fp AS DOUBLE), 0.0) AS precision,
           CAST(tp AS DOUBLE) / NULLIF(CAST(tp + fn AS DOUBLE), 0.0) AS recall,
           CAST(2 * tp AS DOUBLE)
             / NULLIF(CAST(2 * tp + fp + fn AS DOUBLE), 0.0) AS f1
    FROM m
    """


# -- Cohen's kappa ------------------------------------------------------------
def cohens_kappa(df: DataFrame, a_col: str, b_col: str) -> DataFrame:
    """Cohen's kappa agreement between two categorical labelings over
    the same rows (e.g. an automatic labeler vs the human column) —
    chance-corrected: ``kappa = (po - pe) / (1 - pe)``.

    Integer core: with n total, ``agree`` the diagonal count and
    ``sum_rc = Σ_c row_marginal(c) * col_marginal(c)``,
    ``kappa = (n*agree - sum_rc) / (n² - sum_rc)`` — BIGINT numerator
    and denominator, one IEEE division, NULL when pe = 1 (degenerate
    single-category data).

    Plan: ONE aggregate of the big table to the C×C contingency frame
    (the only full-data shuffle), materialized once via eager
    localCheckpoint (the graph.py connected-components precedent) so
    the three tiny downstream aggregates (totals, row marginals, col
    marginals) do not re-scan the source. Marginal products use a FULL
    OUTER join on category: a category used by only one rater
    contributes 0 but must not be dropped.

    Output: one row (n, agree, sum_rc, po, pe, kappa).
    """
    a, b = a_col, b_col
    cells = (
        df.where(F.col(a).isNotNull() & F.col(b).isNotNull())
        .groupBy(F.col(a).alias("_a"), F.col(b).alias("_b"))
        .agg(F.count("*").alias("_cnt"))
        .localCheckpoint(eager=True)
    )
    stats = cells.agg(
        F.sum("_cnt").alias("n"),
        F.sum(F.when(F.col("_a") == F.col("_b"), F.col("_cnt")).otherwise(0)).alias(
            "agree"
        ),
    )
    rowm = cells.groupBy(F.col("_a").alias("_c")).agg(F.sum("_cnt").alias("_rm"))
    colm = cells.groupBy(F.col("_b").alias("_c")).agg(F.sum("_cnt").alias("_cm"))
    rc = (
        rowm.join(colm, "_c", "full_outer")
        .select(
            (
                F.coalesce(F.col("_rm"), F.lit(0))
                * F.coalesce(F.col("_cm"), F.lit(0))
            ).alias("_p")
        )
        .agg(F.sum("_p").alias("sum_rc"))
    )
    out = stats.crossJoin(F.broadcast(rc))
    po = F.col("agree").cast("double") / F.col("n").cast("double")
    pe = F.col("sum_rc").cast("double") / (F.col("n") * F.col("n")).cast("double")
    kappa = (F.col("n") * F.col("agree") - F.col("sum_rc")).cast("double") / F.nullif(
        (F.col("n") * F.col("n") - F.col("sum_rc")).cast("double"), F.lit(0.0)
    )
    return out.select("n", "agree", "sum_rc", po.alias("po"), pe.alias("pe"), kappa.alias("kappa"))


def cohens_kappa_oracle_sql(source_sql: str, a_col: str, b_col: str) -> str:
    """DuckDB mirror of :func:`cohens_kappa`."""
    a, b = a_col, b_col
    return f"""
    WITH src0 AS ({source_sql}),
    cells AS (SELECT {a} AS _a, {b} AS _b, count(*) AS _cnt FROM src0
              WHERE {a} IS NOT NULL AND {b} IS NOT NULL GROUP BY 1, 2),
    stats AS (SELECT sum(_cnt) AS n,
                     sum(CASE WHEN _a = _b THEN _cnt ELSE 0 END) AS agree
              FROM cells),
    rowm AS (SELECT _a AS _c, sum(_cnt) AS _rm FROM cells GROUP BY 1),
    colm AS (SELECT _b AS _c, sum(_cnt) AS _cm FROM cells GROUP BY 1),
    rc AS (SELECT sum(COALESCE(_rm, 0) * COALESCE(_cm, 0)) AS sum_rc
           FROM rowm FULL OUTER JOIN colm USING (_c))
    SELECT CAST(n AS BIGINT) AS n, CAST(agree AS BIGINT) AS agree,
           CAST(sum_rc AS BIGINT) AS sum_rc,
           CAST(agree AS DOUBLE) / CAST(n AS DOUBLE) AS po,
           CAST(sum_rc AS DOUBLE) / CAST(n * n AS DOUBLE) AS pe,
           CAST(n * agree - sum_rc AS DOUBLE)
             / NULLIF(CAST(n * n - sum_rc AS DOUBLE), 0.0) AS kappa
    FROM stats CROSS JOIN rc
    """


# -- NDCG@k -------------------------------------------------------------------
def ndcg_at_k(
    df: DataFrame,
    group_col: str,
    id_col: str,
    score_col: str,
    rel_col: str,
    k: int = 10,
) -> DataFrame:
    """NDCG@k of ``score_col``'s ranking against graded relevance
    ``rel_col``, per ``group_col`` (one "query" per group).

    Position discounts 1/log2(i+1) are literal doubles
    (:data:`NDCG_DISCOUNTS` — the Benford precedent: no runtime log2).
    DCG is NOT a float sum across rows: the top-k relevances are
    pivoted into k integer columns (``max(CASE WHEN rn=i THEN rel)``)
    and DCG/IDCG are each ONE fixed-shape polynomial
    ``Σ d_i * rel_i`` evaluated left-to-right over BIGINTs and literal
    coefficients — bit-identical in both engines. IDCG ranks the same
    group by true relevance (ties by id) — the ideal permutation.

    Plan: two windows over the same group partitioning (one Exchange;
    the second window reuses it with a re-sort), rank-filtered to k
    rows per group before the pivot aggregate (WindowGroupLimit).

    Output: (group, dcg, idcg, ndcg).
    """
    if k > len(NDCG_DISCOUNTS):
        raise ValueError(f"k={k} exceeds precomputed discounts ({len(NDCG_DISCOUNTS)})")
    g, i, s, r = group_col, id_col, score_col, rel_col
    base = df.where(
        F.col(g).isNotNull()
        & F.col(i).isNotNull()
        & F.col(s).isNotNull()
        & F.col(r).isNotNull()
    ).select(
        F.col(g).alias("_g"),
        F.col(i).alias("_id"),
        F.col(s).alias("_s"),
        F.col(r).cast("long").alias("_r"),
    )
    w_model = Window.partitionBy("_g").orderBy(
        F.col("_s").desc(), F.col("_id").asc()
    )
    w_ideal = Window.partitionBy("_g").orderBy(
        F.col("_r").desc(), F.col("_id").asc()
    )
    ranked = base.select(
        "_g",
        "_r",
        F.row_number().over(w_model).alias("_rn"),
        F.row_number().over(w_ideal).alias("_rni"),
    ).where((F.col("_rn") <= k) | (F.col("_rni") <= k))

    def poly(rel_cols: list[Column]) -> Column:
        expr = F.lit(0.0)
        for pos, c in enumerate(rel_cols):
            expr = expr + F.lit(NDCG_DISCOUNTS[pos]) * F.coalesce(
                c, F.lit(0)
            ).cast("double")
        return expr

    pivoted = ranked.groupBy(F.col("_g").alias(group_col)).agg(
        *[
            F.max(F.when(F.col("_rn") == pos, F.col("_r"))).alias(f"_m{pos}")
            for pos in range(1, k + 1)
        ],
        *[
            F.max(F.when(F.col("_rni") == pos, F.col("_r"))).alias(f"_i{pos}")
            for pos in range(1, k + 1)
        ],
    )
    dcg = poly([F.col(f"_m{pos}") for pos in range(1, k + 1)])
    idcg = poly([F.col(f"_i{pos}") for pos in range(1, k + 1)])
    return pivoted.select(
        group_col,
        dcg.alias("dcg"),
        idcg.alias("idcg"),
        (dcg / F.nullif(idcg, F.lit(0.0))).alias("ndcg"),
    )


def ndcg_oracle_sql(
    source_sql: str,
    group_col: str,
    id_col: str,
    score_col: str,
    rel_col: str,
    k: int = 10,
) -> str:
    """DuckDB mirror of :func:`ndcg_at_k` — same pivot, same literal
    polynomial, same left-to-right association order."""
    if k > len(NDCG_DISCOUNTS):
        raise ValueError(f"k={k} exceeds precomputed discounts ({len(NDCG_DISCOUNTS)})")
    g, i, s, r = group_col, id_col, score_col, rel_col
    m_cols = ", ".join(
        f"max(CASE WHEN _rn = {pos} THEN _r END) AS _m{pos}"
        for pos in range(1, k + 1)
    )
    i_cols = ", ".join(
        f"max(CASE WHEN _rni = {pos} THEN _r END) AS _i{pos}"
        for pos in range(1, k + 1)
    )

    def poly(prefix: str) -> str:
        # the e0 suffix forces a DOUBLE literal: DuckDB parses a bare
        # decimal as DECIMAL(p,s), and its DECIMAL->DOUBLE conversion
        # is off by one ulp for e.g. 0.38685280723454163 — the direct
        # double parse (fast_float) is correctly rounded and matches
        # Spark's F.lit bit-for-bit
        terms = [
            f"{NDCG_DISCOUNTS[pos - 1]!r}e0 * CAST(COALESCE(_{prefix}{pos}, 0) AS DOUBLE)"
            for pos in range(1, k + 1)
        ]
        # left-to-right fold, same association order as the Spark side
        expr = "0.0e0"
        for t in terms:
            expr = f"({expr} + {t})"
        return expr

    return f"""
    WITH src0 AS ({source_sql}),
    base AS (SELECT {g} AS _g, {i} AS _id, {s} AS _s, CAST({r} AS BIGINT) AS _r
             FROM src0
             WHERE {g} IS NOT NULL AND {i} IS NOT NULL
               AND {s} IS NOT NULL AND {r} IS NOT NULL),
    ranked AS (
      SELECT _g, _r,
             row_number() OVER (PARTITION BY _g ORDER BY _s DESC, _id ASC) AS _rn,
             row_number() OVER (PARTITION BY _g ORDER BY _r DESC, _id ASC) AS _rni
      FROM base
    ),
    pivoted AS (
      SELECT _g AS {g}, {m_cols}, {i_cols}
      FROM ranked WHERE _rn <= {k} OR _rni <= {k}
      GROUP BY 1
    )
    SELECT {g}, dcg, idcg, dcg / NULLIF(idcg, 0.0) AS ndcg
    FROM (SELECT {g}, {poly('m')} AS dcg, {poly('i')} AS idcg FROM pivoted) z
    """


# -- streaming AUC monitor ----------------------------------------------------
def score_label_merge_into_store(
    batch_df: DataFrame,
    batch_id: int,
    score_col: str,
    label_col: str,
    store_path: str,
) -> bool:
    """foreachBatch body: fold a micro-batch's per-score (cnt, pos)
    counts into a persistent additive store under the countmin/hist
    ``merged_through`` batch-id fence (replays skipped, never
    double-counted; distributed parquet write, nothing collected).

    State is one row per DISTINCT score value — the same
    value-cardinality bound :func:`roc_auc_by` ranks over. Quantize
    continuous scores upstream if their cardinality is unbounded.
    """
    from .store import generation_committed, read_store, write_store

    spark = batch_df.sparkSession
    if generation_committed(store_path, batch_id):
        return False
    new = (
        batch_df.where(
            F.col(score_col).isNotNull() & F.col(label_col).isNotNull()
        )
        .groupBy(F.col(score_col).alias("score"))
        .agg(
            F.count("*").alias("cnt"),
            F.sum(F.col(label_col).cast("long")).alias("pos"),
        )
    )
    old = read_store(spark, store_path)
    if old is not None:
        hwm = old.agg(F.max("merged_through")).collect()[0][0]
        if hwm is not None and batch_id <= hwm:
            return False
        merged = (
            old.select("score", "cnt", "pos")
            .unionByName(new)
            .groupBy("score")
            .agg(F.sum("cnt").alias("cnt"), F.sum("pos").alias("pos"))
        )
    else:
        merged = new
    out = merged.withColumn("merged_through", F.lit(int(batch_id)))
    write_store(out, store_path, int(batch_id))
    return True


def auc_monitor(
    batch_df: DataFrame,
    batch_id: int,
    score_col: str,
    label_col: str,
    store_path: str,
):
    """foreachBatch body: fold the batch into the score/label store and
    report the RUNNING exact AUC — "is the quality score still
    separating good from bad as the stream drifts" (the streaming
    sibling of q158, same midrank identity, same integer core).

    Returns a dict (n_pos, n_neg, two_u, auc) for this batch — auc is
    None while the accumulated stream is single-class — or None on a
    replay skip / empty store (no duplicate reports under
    at-least-once).
    """
    from .store import read_store

    merged = score_label_merge_into_store(
        batch_df, batch_id, score_col, label_col, store_path
    )
    if not merged:
        return None
    cur = read_store(batch_df.sparkSession, store_path).select(
        "score", "cnt", "pos"
    )
    w = Window.orderBy("score").rowsBetween(Window.unboundedPreceding, -1)
    ranked = cur.select(
        "cnt",
        "pos",
        (2 * F.coalesce(F.sum("cnt").over(w), F.lit(0)) + F.col("cnt") + 1).alias(
            "two_rank"
        ),
    )
    rows = ranked.agg(
        F.sum("pos").alias("n_pos"),
        F.sum(F.col("cnt") - F.col("pos")).alias("n_neg"),
        F.sum(F.col("pos") * F.col("two_rank")).alias("two_r_pos"),
    ).collect()
    if not rows or rows[0].n_pos is None:
        return None
    r = rows[0]
    two_u = r.two_r_pos - r.n_pos * (r.n_pos + 1)
    denom = 2 * r.n_pos * r.n_neg
    return {
        "n_pos": r.n_pos,
        "n_neg": r.n_neg,
        "two_u": two_u,
        "auc": (two_u / denom) if denom else None,
    }
