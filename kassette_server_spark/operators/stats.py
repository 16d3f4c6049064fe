"""Distributed statistics operators: grouped OLS regression and robust
(median/MAD) anomaly detection.

Both are one-or-two-shuffle shapes whose floats are cross-engine
deterministic by construction:

* ``grouped_ols`` — the sufficient statistics (n, Σx, Σy, Σx², Σxy,
  Σy²) are EXACT BIGINT sums of integer-valued inputs, so they are
  order-free (no float-summation nondeterminism across partitions or
  engines). Slope/intercept/R² are then a fixed expression tree over
  the double-cast sums — every op IEEE exact-rounded, identical in the
  DuckDB oracle. One map-side-combined groupBy; scales to any SF
  (the sums stay < 2^53 up to ~10⁸ rows/group at these magnitudes;
  beyond that switch the sum casts to DECIMAL(38,0)).

* ``mad_outliers`` — per-group exact median and median-absolute-
  deviation. Medians of even counts are a midpoint of two doubles
  (exact-rounded); the outlier test |x − med| > c·MAD is exact
  arithmetic. Exact medians need a per-group sort — that is intrinsic
  (same cost class as q45); at 100 TB use the binned-quantile sketch
  (operators/sketches.py) when approximate is acceptable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .guards import require_integral


def grouped_ols(
    df: DataFrame,
    group_col: str,
    x_col: Column,
    y_col: Column,
) -> DataFrame:
    """Per-group OLS fit of y on x. ``x_col``/``y_col`` must be
    integer-valued expressions (caller scales/rounds) so the moment
    sums are exact.

    Output: (group, n, slope, intercept, r2), groups with a degenerate
    x variance filtered out (exact integer test, no float epsilon).
    """
    x = x_col.cast("long")
    y = y_col.cast("long")
    sums = df.groupBy(F.col(group_col).alias("grp")).agg(
        F.count("*").alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(x * y).alias("sxy"),
        F.sum(y * y).alias("syy"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxx = F.col("sxx").cast("double")
    sxy = F.col("sxy").cast("double")
    syy = F.col("syy").cast("double")
    cov_n = n * sxy - sx * sy  # n·cov, up to the 1/n² factor
    var_x_n = n * sxx - sx * sx
    var_y_n = n * syy - sy * sy
    slope = cov_n / var_x_n
    return (
        sums.where(
            (F.col("n") >= 2)
            # exact integer degeneracy test (constant x or constant y)
            & (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx") != 0)
            & (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy") != 0)
        )
        .select(
            "grp",
            "n",
            slope.alias("slope"),
            ((sy - slope * sx) / n).alias("intercept"),
            ((cov_n * cov_n) / (var_x_n * var_y_n)).alias("r2"),
        )
    )


def grouped_ols_oracle_sql(
    table: str, group_col: str, x_expr: str, y_expr: str
) -> str:
    """DuckDB SQL computing the identical fit (same sums, same tree)."""
    return f"""
    WITH sums AS (
      SELECT {group_col} AS grp, COUNT(*) AS n,
             SUM(x) AS sx, SUM(y) AS sy,
             SUM(x * x) AS sxx, SUM(x * y) AS sxy, SUM(y * y) AS syy
      FROM (SELECT {group_col},
                   CAST({x_expr} AS BIGINT) AS x,
                   CAST({y_expr} AS BIGINT) AS y FROM {table})
      GROUP BY {group_col}
    )
    SELECT grp, n,
           (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS slope,
           (CAST(sy AS DOUBLE) - ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))) * CAST(sx AS DOUBLE))
             / CAST(n AS DOUBLE) AS intercept,
           ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)))
             / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) AS r2
    FROM sums
    WHERE n >= 2 AND n * sxx - sx * sx != 0 AND n * syy - sy * sy != 0
    """


def mad_outliers(
    df: DataFrame,
    group_col: str,
    value_col: str,
    c: float = 3.0,
    broadcast_group_stats: bool = True,
) -> DataFrame:
    """Per-group robust outlier profile via median absolute deviation.

    Two grouped exact-median passes (values, then absolute deviations)
    joined back by group. The stats frames are one row per GROUP, so
    the default broadcast join-back is right whenever the grouping key
    is a category (event types, sources, nations). Grouping by a
    high-cardinality key (users, documents) makes the stats frame
    data-sized — set ``broadcast_group_stats=False`` to take the
    co-partitioned shuffle join instead (both sides are already keyed
    by grp; AQE still converts to broadcast when it measures small) —
    the same gating discipline as timed_funnel's broadcast_step_times.
    Output per group: n, med, mad, n_outliers (|x − med| > c·MAD),
    max_abs_dev.
    """
    rows = df.select(
        F.col(group_col).alias("grp"), F.col(value_col).cast("double").alias("v")
    )
    med = rows.groupBy("grp").agg(
        F.count("*").alias("n"), F.median("v").alias("med")
    )
    if broadcast_group_stats:
        med = F.broadcast(med)
    dev = rows.join(med, "grp").select(
        "grp", "n", "med", F.abs(F.col("v") - F.col("med")).alias("adev")
    )
    mad = dev.groupBy("grp").agg(
        F.first("n").alias("n"),
        F.first("med").alias("med"),
        F.median("adev").alias("mad"),
    )
    if broadcast_group_stats:
        mad = F.broadcast(mad)
    return (
        dev.select("grp", "adev")
        .join(mad, "grp")
        .groupBy("grp")
        .agg(
            F.first("n").alias("n"),
            F.first("med").alias("med"),
            F.first("mad").alias("mad"),
            F.sum((F.col("adev") > F.lit(c) * F.col("mad")).cast("long")).alias(
                "n_outliers"
            ),
            F.max("adev").alias("max_abs_dev"),
        )
    )


def mad_outliers_oracle_sql(
    table: str, group_col: str, value_col: str, c: float = 3.0
) -> str:
    """DuckDB SQL for the identical robust profile (exact medians)."""
    return f"""
    WITH rows_ AS (
      SELECT {group_col} AS grp, CAST({value_col} AS DOUBLE) AS v FROM {table}
    ),
    med AS (SELECT grp, COUNT(*) AS n, median(v) AS med FROM rows_ GROUP BY grp),
    dev AS (
      SELECT r.grp, m.n, m.med, abs(r.v - m.med) AS adev
      FROM rows_ r JOIN med m USING (grp)
    ),
    mad AS (
      SELECT grp, any_value(n) AS n, any_value(med) AS med, median(adev) AS mad
      FROM dev GROUP BY grp
    )
    SELECT d.grp AS grp, any_value(m.n) AS n, any_value(m.med) AS med,
           any_value(m.mad) AS mad,
           CAST(SUM(CASE WHEN d.adev > {c!r} * m.mad THEN 1 ELSE 0 END) AS BIGINT)
             AS n_outliers,
           MAX(d.adev) AS max_abs_dev
    FROM dev d JOIN mad m ON d.grp = m.grp
    GROUP BY d.grp
    """


def winsorized_stats(
    df: DataFrame,
    group_col: str,
    value_col: str,
    lo_pct: tuple[int, int] = (5, 100),
    hi_pct: tuple[int, int] = (95, 100),
    scale: int = 100,
    broadcast_group_stats: bool = True,
) -> DataFrame:
    """Per-group winsorization profile with EXACT order-statistic
    percentile boundaries (type-1 lower quantile: the smallest value
    whose cumulative count reaches ⌈q·n⌉) over integer-scaled values.

    Everything is integer arithmetic — the quantile test is
    ``cum·den ≥ n·num``, the clip is min/max, the winsorized sum is a
    BIGINT — so the result is bit-exact across engines and
    partitionings. Scale shape: one (group, value) groupBy (map-side
    combined, keyspace = distinct values per group), a cumulative
    window over those distinct values, and a join of the
    2-row-per-group boundary table back over the facts — broadcast by
    default (right for category-cardinality groups); for
    high-cardinality grouping keys set ``broadcast_group_stats=False``
    and the join-back co-partitions on grp with AQE deciding (same
    gating discipline as timed_funnel's broadcast_step_times).

    Output: (grp, n, lo, hi, n_clipped_low, n_clipped_high, wsum).
    """
    from pyspark.sql import Window

    vals = df.select(
        F.col(group_col).alias("grp"),
        F.round(F.col(value_col) * scale).cast("long").alias("v"),
    ).where(F.col(value_col).isNotNull())
    counts = vals.groupBy("grp", "v").agg(F.count("*").alias("cnt"))
    w = Window.partitionBy("grp").orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = counts.select("grp", "v", F.sum("cnt").over(w).alias("cum"))
    tot = counts.groupBy("grp").agg(F.sum("cnt").alias("n"))
    lo_num, lo_den = lo_pct
    hi_num, hi_den = hi_pct
    if broadcast_group_stats:
        tot = F.broadcast(tot)
    bounds = (
        cum.join(tot, "grp")
        .groupBy("grp", "n")
        .agg(
            F.min(F.when(F.col("cum") * lo_den >= F.col("n") * lo_num, F.col("v"))).alias("lo"),
            F.min(F.when(F.col("cum") * hi_den >= F.col("n") * hi_num, F.col("v"))).alias("hi"),
        )
    )
    if broadcast_group_stats:
        bounds = F.broadcast(bounds)
    clipped = vals.join(bounds, "grp").select(
        "grp",
        "n",
        "lo",
        "hi",
        F.greatest(F.least(F.col("v"), F.col("hi")), F.col("lo")).alias("cv"),
        (F.col("v") < F.col("lo")).cast("long").alias("below"),
        (F.col("v") > F.col("hi")).cast("long").alias("above"),
    )
    return clipped.groupBy("grp").agg(
        F.first("n").cast("long").alias("n"),
        F.first("lo").alias("lo"),
        F.first("hi").alias("hi"),
        F.sum("below").alias("n_clipped_low"),
        F.sum("above").alias("n_clipped_high"),
        F.sum("cv").alias("wsum"),
    )


def winsorized_oracle_sql(
    table: str,
    group_col: str,
    value_col: str,
    lo_pct: tuple[int, int] = (5, 100),
    hi_pct: tuple[int, int] = (95, 100),
    scale: int = 100,
) -> str:
    lo_num, lo_den = lo_pct
    hi_num, hi_den = hi_pct
    return f"""
    WITH vals AS (
      SELECT {group_col} AS grp,
             CAST(round({value_col} * {scale}) AS BIGINT) AS v
      FROM {table} WHERE {value_col} IS NOT NULL
    ),
    counts AS (SELECT grp, v, COUNT(*) AS cnt FROM vals GROUP BY grp, v),
    cum AS (
      SELECT grp, v, SUM(cnt) OVER (PARTITION BY grp ORDER BY v
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM counts
    ),
    tot AS (SELECT grp, SUM(cnt) AS n FROM counts GROUP BY grp),
    bounds AS (
      SELECT c.grp, any_value(t.n) AS n,
             MIN(CASE WHEN c.cum * {lo_den} >= t.n * {lo_num} THEN c.v END) AS lo,
             MIN(CASE WHEN c.cum * {hi_den} >= t.n * {hi_num} THEN c.v END) AS hi
      FROM cum c JOIN tot t ON c.grp = t.grp
      GROUP BY c.grp
    )
    SELECT v.grp AS grp, CAST(any_value(b.n) AS BIGINT) AS n,
           any_value(b.lo) AS lo, any_value(b.hi) AS hi,
           CAST(SUM(CASE WHEN v.v < b.lo THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped_low,
           CAST(SUM(CASE WHEN v.v > b.hi THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped_high,
           CAST(SUM(GREATEST(LEAST(v.v, b.hi), b.lo)) AS BIGINT) AS wsum
    FROM vals v JOIN bounds b ON v.grp = b.grp
    GROUP BY v.grp
    """


def chi_square_by(df: DataFrame, row_col: str, col_col: str) -> DataFrame:
    """Per-row-category chi-square contribution of the (row × col)
    contingency table — the independence diagnostic "does language
    composition differ by source?".

    Observed counts are exact integers; expected counts and the
    (o−e)²/e terms are a fixed double tree; the per-row sum over
    column categories folds in SORTED category order (the same
    determinism pattern as token entropy). Output:
    (rcat, n_row, chi2_part) — Σ chi2_part is the full statistic.
    """
    cells = df.groupBy(
        F.col(row_col).alias("rcat"), F.col(col_col).alias("ccat")
    ).agg(F.count("*").alias("o"))
    rows = cells.groupBy("rcat").agg(F.sum("o").alias("nr"))
    cols = cells.groupBy("ccat").agg(F.sum("o").alias("nc"))
    grand = cells.agg(F.sum("o").alias("n"))
    # EMPTY cells still contribute (0−e)²/e — materialize the full
    # category cross product (marginals are tiny: broadcast×broadcast)
    # and left-join the observed counts onto it
    full = rows.crossJoin(F.broadcast(cols))
    j = (
        full.join(cells, ["rcat", "ccat"], "left")
        .withColumn("o", F.coalesce(F.col("o"), F.lit(0)))
        .join(F.broadcast(grand))
    )
    e = (F.col("nr").cast("double") * F.col("nc").cast("double")) / F.col("n").cast(
        "double"
    )
    o = F.col("o").cast("double")
    contrib = j.select(
        "rcat", "nr", "ccat", (((o - e) * (o - e)) / e).alias("c")
    )
    arr = contrib.groupBy("rcat").agg(
        F.first("nr").cast("long").alias("n_row"),
        F.array_sort(F.collect_list(F.struct("ccat", "c"))).alias("l"),
    )
    folded = F.aggregate(
        F.transform(F.col("l"), lambda s: s.getField("c")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return arr.select("rcat", "n_row", F.round(folded, 6).alias("chi2_part"))


def chi_square_oracle_sql(table: str, row_col: str, col_col: str) -> str:
    return f"""
    WITH cells AS (
      SELECT {row_col} AS rcat, {col_col} AS ccat, COUNT(*) AS o
      FROM {table} GROUP BY {row_col}, {col_col}
    ),
    rows_ AS (SELECT rcat, SUM(o) AS nr FROM cells GROUP BY rcat),
    cols_ AS (SELECT ccat, SUM(o) AS nc FROM cells GROUP BY ccat),
    grand AS (SELECT SUM(o) AS n FROM cells),
    full_ AS (
      SELECT r.rcat, r.nr, k.ccat, k.nc, COALESCE(c.o, 0) AS o
      FROM rows_ r CROSS JOIN cols_ k
      LEFT JOIN cells c ON c.rcat = r.rcat AND c.ccat = k.ccat
    ),
    contrib AS (
      SELECT f.rcat, f.nr, f.ccat,
             ((CAST(f.o AS DOUBLE)
               - (CAST(f.nr AS DOUBLE) * CAST(f.nc AS DOUBLE)) / CAST(g.n AS DOUBLE))
              * (CAST(f.o AS DOUBLE)
               - (CAST(f.nr AS DOUBLE) * CAST(f.nc AS DOUBLE)) / CAST(g.n AS DOUBLE)))
             / ((CAST(f.nr AS DOUBLE) * CAST(f.nc AS DOUBLE)) / CAST(g.n AS DOUBLE))
               AS c
      FROM full_ f, grand g
    ),
    arr AS (
      SELECT rcat, CAST(any_value(nr) AS BIGINT) AS n_row,
             list(c ORDER BY ccat) AS l
      FROM contrib GROUP BY rcat
    )
    SELECT rcat, n_row,
           round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), l),
                             (acc, x) -> acc + x), 6) AS chi2_part
    FROM arr
    """


def rfm_scores(
    orders: DataFrame,
    cust_col: str = "o_custkey",
    date_col: str = "o_orderdate",
    amount_col: str = "o_totalprice",
) -> DataFrame:
    """RFM segmentation — the CDP workhorse: per customer, quintile
    scores for Recency (days since last order, lower = better),
    Frequency (order count) and Monetary (total cents), each scored
    1–5 against EXACT order-statistic quintile cuts of the customer
    population (no ntile over a global sort — that serializes on one
    task; the threshold frames are one broadcast row per metric).

    The reference date is the corpus max order date (broadcast), so
    the result is a pure function of the data. All integers until the
    output; segment = r*100 + f*10 + m.

    Output: (cust, recency_days, frequency, monetary_cents,
    r_score, f_score, m_score, segment).
    """
    base = orders.select(
        F.col(cust_col).alias("cust"),
        F.col(date_col).alias("d"),
        F.round(F.col(amount_col) * 100).cast("long").alias("cents"),
    )
    ref = base.agg(F.max("d").alias("ref_d"))
    per_cust = (
        base.join(F.broadcast(ref))
        .groupBy("cust")
        .agg(
            F.min(F.datediff(F.col("ref_d"), F.col("d"))).cast("long").alias(
                "recency_days"
            ),
            F.count("*").alias("frequency"),
            F.sum("cents").alias("monetary_cents"),
        )
    )

    def score(col: str, invert: bool) -> F.Column:
        t = [F.col(f"{col}_t{k}") for k in (1, 2, 3, 4)]
        raw = (
            F.lit(1)
            + (F.col(col) > t[0]).cast("int")
            + (F.col(col) > t[1]).cast("int")
            + (F.col(col) > t[2]).cast("int")
            + (F.col(col) > t[3]).cast("int")
        )
        return (F.lit(6) - raw) if invert else raw

    # All 12 quintile cuts in ONE pipeline: unpivot the three metrics
    # to (metric, v) rows and run a single counts→cumulative-window→
    # min-when aggregation, partitioned BY METRIC. Identical cuts to
    # three _quintile_thresholds calls (same integer rule per metric),
    # but the plan carries ONE copy of the threshold pipeline instead
    # of three — and the cumulative window is metric-partitioned
    # instead of three global single-partition windows (r16; the
    # per_cust subtree also appears twice instead of four times).
    from pyspark.sql import Window

    metrics = ("recency_days", "frequency", "monetary_cents")
    vals = per_cust.selectExpr(
        "stack(3, "
        + ", ".join(f"'{m}', {m}" for m in metrics)
        + ") as (metric, v)"
    )
    counts = vals.groupBy("metric", "v").agg(F.count("*").alias("cnt"))
    w = (
        Window.partitionBy("metric")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = counts.select(
        "metric",
        "v",
        F.sum("cnt").over(w).alias("cum"),
        F.sum("cnt").over(Window.partitionBy("metric")).alias("n"),
    )
    th = cum.agg(
        *[
            F.min(
                F.when(
                    (F.col("metric") == m) & (F.col("cum") * 5 >= F.col("n") * k),
                    F.col("v"),
                )
            ).alias(f"{m}_t{k}")
            for m in metrics
            for k in (1, 2, 3, 4)
        ]
    )
    out = per_cust.join(F.broadcast(th))
    r = score("recency_days", invert=True)  # recent (small) = high score
    f = score("frequency", invert=False)
    m = score("monetary_cents", invert=False)
    return out.select(
        "cust",
        "recency_days",
        "frequency",
        "monetary_cents",
        r.cast("long").alias("r_score"),
        f.cast("long").alias("f_score"),
        m.cast("long").alias("m_score"),
        (r * 100 + f * 10 + m).cast("long").alias("segment"),
    )


def rfm_oracle_sql(
    table: str = "orders",
    cust_col: str = "o_custkey",
    date_col: str = "o_orderdate",
    amount_col: str = "o_totalprice",
) -> str:
    """DuckDB SQL: identical exact-quintile RFM."""

    def th_cte(metric: str) -> str:
        return f"""{metric}_th AS (
          SELECT {", ".join(f"MIN(CASE WHEN cum * 5 >= n * {k} THEN v END) AS {metric}_t{k}" for k in (1, 2, 3, 4))}
          FROM (
            SELECT v, SUM(cnt) OVER (ORDER BY v
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
            FROM (SELECT {metric} AS v, COUNT(*) AS cnt FROM per_cust GROUP BY {metric})
          ), (SELECT COUNT(*) AS n FROM per_cust)
        )"""

    scores = {
        "recency_days": "(6 - (1 + " + " + ".join(
            f"CASE WHEN recency_days > recency_days_t{k} THEN 1 ELSE 0 END" for k in (1, 2, 3, 4)
        ) + "))",
        "frequency": "(1 + " + " + ".join(
            f"CASE WHEN frequency > frequency_t{k} THEN 1 ELSE 0 END" for k in (1, 2, 3, 4)
        ) + ")",
        "monetary_cents": "(1 + " + " + ".join(
            f"CASE WHEN monetary_cents > monetary_cents_t{k} THEN 1 ELSE 0 END" for k in (1, 2, 3, 4)
        ) + ")",
    }
    r, f_, m = scores["recency_days"], scores["frequency"], scores["monetary_cents"]
    return f"""
    WITH base AS (
      SELECT {cust_col} AS cust, {date_col} AS d,
             CAST(round({amount_col} * 100) AS BIGINT) AS cents
      FROM {table}
    ),
    ref AS (SELECT MAX(d) AS ref_d FROM base),
    per_cust AS (
      SELECT cust,
             CAST(MIN(date_diff('day', CAST(d AS DATE), CAST(ref_d AS DATE))) AS BIGINT)
               AS recency_days,
             COUNT(*) AS frequency,
             SUM(cents) AS monetary_cents
      FROM base, ref GROUP BY cust
    ),
    {th_cte("recency_days")},
    {th_cte("frequency")},
    {th_cte("monetary_cents")}
    SELECT cust, recency_days, CAST(frequency AS BIGINT) AS frequency,
           CAST(monetary_cents AS BIGINT) AS monetary_cents,
           CAST({r} AS BIGINT) AS r_score,
           CAST({f_} AS BIGINT) AS f_score,
           CAST({m} AS BIGINT) AS m_score,
           CAST({r} * 100 + {f_} * 10 + {m} AS BIGINT) AS segment
    FROM per_cust, recency_days_th, frequency_th, monetary_cents_th
    """


def gini_by_group(
    df: DataFrame,
    group_col: str,
    id_col: str,
    value_col: str,
    scale: int = 100,
) -> DataFrame:
    """Per-group Gini concentration index of ``value_col`` over the
    entities in ``id_col`` — "how concentrated is revenue across
    customers, per nation".

    Exact integer formulation: G = (2·Σᵢ i·xᵢ − (n+1)·Σx) / (n·Σx)
    with xᵢ ascending, ranks from a PER-GROUP window (ties broken by
    id, identical in both engines) — no global sort. Numerator and
    denominator are exact BIGINTs; the single division is
    exact-rounded. Output: (grp, n, total, gini).
    """
    from pyspark.sql import Window

    per_ent = (
        df.select(
            F.col(group_col).alias("grp"),
            F.col(id_col).alias("ent"),
            F.round(F.col(value_col) * scale).cast("long").alias("x"),
        )
        .groupBy("grp", "ent")
        .agg(F.sum("x").alias("x"))
    )
    w = Window.partitionBy("grp").orderBy("x", "ent")
    ranked = per_ent.select("grp", "x", F.row_number().over(w).alias("i"))
    agg = ranked.groupBy("grp").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("i") * F.col("x")).alias("six"),
    )
    gini = (
        (F.lit(2) * F.col("six") - (F.col("n") + 1) * F.col("sx")).cast("double")
        / (F.col("n") * F.col("sx")).cast("double")
    )
    return agg.select(
        "grp",
        F.col("n").cast("long").alias("n"),
        F.col("sx").cast("long").alias("total"),
        gini.alias("gini"),
    )


def gini_oracle_sql(
    joined_sql: str,
    scale: int = 100,
) -> str:
    """DuckDB SQL for the identical per-group Gini.
    ``joined_sql``: SELECT producing (grp, ent, val)."""
    return f"""
    WITH per_ent AS (
      SELECT grp, ent, SUM(CAST(round(val * {scale}) AS BIGINT)) AS x
      FROM ({joined_sql}) GROUP BY grp, ent
    ),
    ranked AS (
      SELECT grp, x, row_number() OVER (PARTITION BY grp ORDER BY x, ent) AS i
      FROM per_ent
    ),
    agg AS (
      SELECT grp, COUNT(*) AS n, SUM(x) AS sx, SUM(i * x) AS six
      FROM ranked GROUP BY grp
    )
    SELECT grp, CAST(n AS BIGINT) AS n, CAST(sx AS BIGINT) AS total,
           CAST(2 * six - (n + 1) * sx AS DOUBLE) / CAST(n * sx AS DOUBLE) AS gini
    FROM agg
    """


def pareto_frontier_2d(
    df: DataFrame, x_col: str, y_col: str, n_buckets: int = 64
) -> DataFrame:
    """Skyline / Pareto-frontier over two minimize-criteria: the
    distinct (x, y) points not DOMINATED by any other point (some
    point <= on both axes and < on at least one) — "cheapest-smallest"
    style multi-objective shortlists, an operator Spark has no builtin
    for.

    Two-phase scale shape: points are hashed into ``n_buckets``
    arbitrary groups and each bucket computes its LOCAL frontier first
    — sound pruning, because a point dominated within its bucket is
    dominated globally by that same witness. Only the union of local
    frontiers (output-scale, not input-scale) reaches the single
    global pass. Within a pass, the frontier falls out of one sorted
    window: after exact-duplicate removal, order by (x ASC, y ASC);
    a point is dominated iff the running MIN of y over its strict
    predecessors is <= its y (a predecessor has x' < x, or x' = x
    with y' < y — either way <= on both axes and < on one).

    Exact comparisons only — cast float money to DECIMAL first.
    Points with a NULL coordinate are EXCLUDED (a NULL cannot be
    compared for dominance; leaving them in would let a NULL-x row's
    y act as a running-min witness and silently drop real frontier
    points — round-6 self-review finding). The oracle applies the
    identical filter. Output: (x_col, y_col) frontier points.
    """
    from pyspark.sql import Window

    pts = (
        df.select(F.col(x_col).alias("x"), F.col(y_col).alias("y"))
        .where(F.col("x").isNotNull() & F.col("y").isNotNull())
        .dropDuplicates(["x", "y"])
    )

    def frontier(p: DataFrame, part_cols: list[str]) -> DataFrame:
        w = (
            Window.partitionBy(*part_cols).orderBy("x", "y")
            if part_cols
            else Window.orderBy("x", "y")
        ).rowsBetween(Window.unboundedPreceding, -1)
        return (
            p.withColumn("_pm", F.min("y").over(w))
            .where(F.col("_pm").isNull() | (F.col("_pm") > F.col("y")))
            .drop("_pm")
        )

    local = frontier(
        pts.withColumn("_b", F.pmod(F.xxhash64("x", "y"), F.lit(n_buckets))),
        ["_b"],
    ).drop("_b")
    return frontier(local, []).select(
        F.col("x").alias(x_col), F.col("y").alias(y_col)
    )


def pareto_frontier_oracle_sql(points_sql: str, x_col: str, y_col: str) -> str:
    """DuckDB SQL for the identical frontier (NOT EXISTS dominance —
    the quadratic definitional form, fine at oracle scale)."""
    return f"""
    WITH pts AS (SELECT DISTINCT {x_col} AS x, {y_col} AS y FROM ({points_sql})
                 WHERE {x_col} IS NOT NULL AND {y_col} IS NOT NULL)
    SELECT p.x AS {x_col}, p.y AS {y_col} FROM pts p
    WHERE NOT EXISTS (
      SELECT 1 FROM pts q
      WHERE q.x <= p.x AND q.y <= p.y AND (q.x < p.x OR q.y < p.y)
    )
    """


def weighted_median_by(
    df: DataFrame, group_col: str, value_col: str, weight_col: str
) -> DataFrame:
    """Exact lower weighted median per group: the smallest value whose
    cumulative weight reaches half the group's total weight (integer
    test ``2*cum >= tot`` — no division, engine-exact). The
    frequency-weighted generalization of q45's exact median; weights
    must be nonneg integers (quantities, counts).

    Scale shape: one (group, value) map-combined groupBy collapses
    duplicate values BEFORE the window, so the per-group cumulative
    window runs over distinct values, not raw rows; the totals frame is
    one row per group (broadcast join-back).

    Output: (grp, wmedian, tot_weight).
    """
    from pyspark.sql import Window

    vw = (
        df.select(
            F.col(group_col).alias("grp"),
            F.col(value_col).alias("v"),
            F.col(weight_col).cast("long").alias("w"),
        )
        .where(F.col("v").isNotNull())
        .groupBy("grp", "v")
        .agg(F.sum("w").alias("w"))
    )
    win = Window.partitionBy("grp").orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    # r17: the group total rides the SAME grp-partitioned window
    # (unbounded frame) instead of a second aggregate + broadcast
    # join-back — one fewer pass over vw and one fewer join, the
    # oracle's own spelling; the final aggregate reuses the window's
    # partitioning. Identical rows (0-row exceptAll diff).
    cum = vw.select(
        "grp",
        "v",
        F.sum("w").over(win).alias("cum"),
        F.sum("w").over(Window.partitionBy("grp")).alias("tot"),
    )
    return (
        cum.where(F.col("cum") * 2 >= F.col("tot"))
        .groupBy("grp")
        .agg(F.min("v").alias("wmedian"), F.first("tot").alias("tot_weight"))
    )


def weighted_median_oracle_sql(
    table_sql: str, group_col: str, value_col: str, weight_col: str
) -> str:
    """DuckDB SQL computing the identical lower weighted median."""
    return f"""
    WITH vw AS (
      SELECT {group_col} AS grp, {value_col} AS v,
             SUM(CAST({weight_col} AS BIGINT)) AS w
      FROM ({table_sql}) WHERE {value_col} IS NOT NULL GROUP BY 1, 2
    ),
    cum AS (
      SELECT grp, v, SUM(w) OVER (PARTITION BY grp ORDER BY v
                                  ROWS UNBOUNDED PRECEDING) AS cum,
             SUM(w) OVER (PARTITION BY grp) AS tot
      FROM vw
    )
    SELECT grp, MIN(v) AS wmedian,
           CAST(MIN(tot) AS BIGINT) AS tot_weight
    FROM cum WHERE cum * 2 >= tot GROUP BY grp
    """


# -- one-way ANOVA F (literal group set) --------------------------------------
def anova_f(
    df: DataFrame,
    group_col: str,
    group_values: tuple[str, ...],
    value_col: str,
) -> DataFrame:
    """One-way ANOVA F statistic of integer ``value_col`` across a
    LITERAL set of ``group_col`` levels — the k-group generalization of
    Welch's t (evaluation.welch_t_by), answering "does the segment
    matter at all" before pairwise tests.

    The group set must be literal for the same reason the threshold
    sweep's thresholds are (evaluation.threshold_metrics): the
    between/within sums of squares need Σ_g s_g²/n_g — a float sum
    over groups, which the determinism contract bans as a row-wise
    aggregation. With literal groups the moments land in ONE wide
    conditional aggregate (3k BIGINT columns off one scan) and every
    float combination is a FIXED-SHAPE left-to-right expression both
    engines evaluate identically. Empty literal groups contribute 0 to
    every term (guarded per group), matching their absence.

    Output: one row (n, k, ssb, ssw, f_stat); f_stat NULL when ssw = 0
    or n <= k. Overflow contract: Σv² < 2^63 (dollar-scale money).
    """
    g, v = group_col, value_col
    require_integral(df, v, "anova_f")
    vals = list(group_values)
    base = df.where(
        F.col(g).isin(*vals) & F.col(v).isNotNull()
    ).select(F.col(g).alias("_g"), F.col(v).cast("long").alias("_v"))
    aggs = []
    for i, gv in enumerate(vals):
        m = F.col("_g") == gv
        aggs += [
            F.sum(m.cast("long")).alias(f"_n{i}"),
            F.sum(F.when(m, F.col("_v")).otherwise(0)).alias(f"_s{i}"),
            F.sum(F.when(m, F.col("_v") * F.col("_v")).otherwise(0)).alias(
                f"_q{i}"
            ),
        ]
    wide = base.agg(*aggs)
    n_tot = F.col(f"_n0")
    s_tot = F.col(f"_s0")
    q_tot = F.col(f"_q0")
    for i in range(1, len(vals)):
        n_tot = n_tot + F.col(f"_n{i}")
        s_tot = s_tot + F.col(f"_s{i}")
        q_tot = q_tot + F.col(f"_q{i}")
    t_sum = F.lit(0.0)
    n_groups = F.lit(0).cast("long")
    for i in range(len(vals)):
        t_i = (
            F.col(f"_s{i}").cast("double")
            * F.col(f"_s{i}").cast("double")
            / F.col(f"_n{i}").cast("double")
        )
        t_sum = t_sum + F.when(F.col(f"_n{i}") > 0, t_i).otherwise(F.lit(0.0))
        n_groups = n_groups + (F.col(f"_n{i}") > 0).cast("long")
    staged = wide.select(
        n_tot.alias("n"),
        n_groups.alias("k"),
        s_tot.alias("_S"),
        q_tot.alias("_Q"),
        t_sum.alias("_T"),
    )
    ssb = F.col("_T") - F.col("_S").cast("double") * F.col("_S").cast(
        "double"
    ) / F.col("n").cast("double")
    ssw = F.col("_Q").cast("double") - F.col("_T")
    f_stat = F.when(
        (F.col("n") > F.col("k")) & (F.col("k") > 1),
        (ssb / (F.col("k") - F.lit(1)).cast("double"))
        / F.nullif(
            ssw / (F.col("n") - F.col("k")).cast("double"), F.lit(0.0)
        ),
    )
    return staged.select(
        "n", "k", ssb.alias("ssb"), ssw.alias("ssw"), f_stat.alias("f_stat")
    )


def anova_f_oracle_sql(
    source_sql: str,
    group_col: str,
    group_values: tuple[str, ...],
    value_col: str,
) -> str:
    """DuckDB mirror of :func:`anova_f` — identical wide aggregate and
    left-to-right float association."""
    g, v = group_col, value_col
    vals = list(group_values)
    in_list = ", ".join(f"'{x}'" for x in vals)
    moment_cols = ", ".join(
        f"sum(CASE WHEN _g = '{x}' THEN 1 ELSE 0 END) AS _n{i}, "
        f"sum(CASE WHEN _g = '{x}' THEN _v ELSE 0 END) AS _s{i}, "
        f"sum(CASE WHEN _g = '{x}' THEN _v * _v ELSE 0 END) AS _q{i}"
        for i, x in enumerate(vals)
    )
    n_tot = " + ".join(f"_n{i}" for i in range(len(vals)))
    s_tot = " + ".join(f"_s{i}" for i in range(len(vals)))
    q_tot = " + ".join(f"_q{i}" for i in range(len(vals)))
    t_sum = "0.0e0"
    k_sum = "0"
    for i in range(len(vals)):
        t_i = (
            f"CASE WHEN _n{i} > 0 THEN CAST(_s{i} AS DOUBLE)"
            f" * CAST(_s{i} AS DOUBLE) / CAST(_n{i} AS DOUBLE)"
            f" ELSE 0.0e0 END"
        )
        t_sum = f"({t_sum} + {t_i})"
        k_sum = f"({k_sum} + CASE WHEN _n{i} > 0 THEN 1 ELSE 0 END)"
    return f"""
    WITH src0 AS ({source_sql}),
    base AS (SELECT {g} AS _g, CAST({v} AS BIGINT) AS _v FROM src0
             WHERE {g} IN ({in_list}) AND {v} IS NOT NULL),
    wide AS (SELECT {moment_cols} FROM base),
    staged AS (
      SELECT CAST({n_tot} AS BIGINT) AS n,
             CAST({k_sum} AS BIGINT) AS k,
             CAST({s_tot} AS BIGINT) AS _S,
             CAST({q_tot} AS BIGINT) AS _Q,
             {t_sum} AS _T
      FROM wide
    )
    SELECT n, k,
           _T - CAST(_S AS DOUBLE) * CAST(_S AS DOUBLE)
                  / CAST(n AS DOUBLE) AS ssb,
           CAST(_Q AS DOUBLE) - _T AS ssw,
           CASE WHEN n > k AND k > 1 THEN
             ((_T - CAST(_S AS DOUBLE) * CAST(_S AS DOUBLE)
                      / CAST(n AS DOUBLE)) / CAST(k - 1 AS DOUBLE))
             / NULLIF((CAST(_Q AS DOUBLE) - _T) / CAST(n - k AS DOUBLE), 0.0)
           END AS f_stat
    FROM staged
    """


# -- Kaplan-Meier survival curve ----------------------------------------------
def kaplan_meier(
    df: DataFrame, duration_col: str, observed_col: str
) -> DataFrame:
    """Kaplan-Meier survival estimator over integer durations with
    right censoring: at each distinct event time t,
    ``S(t) = Π_{t' <= t} (1 - d_{t'} / n_{t'})`` where d is observed
    events at t' and n the at-risk count (everyone with duration >=
    t'). The retention-curve / time-to-churn primitive.

    Determinism — the ORDERED-FOLD recipe (third float shape after
    fixed-point and common-denominator, see evaluation.py): a running
    PRODUCT of doubles is order-dependent exactly like a running sum,
    so the per-time factors (each one exact-rounded division) are
    collected into an ascending-by-time ARRAY via a framed window
    (frame order is deterministic in both engines) and folded
    left-to-right — Spark ``F.aggregate`` and DuckDB ``list_reduce``
    execute the identical multiplication sequence. Never a product
    aggregate (an engine may tree-reduce it) and never exp(Σlog)
    (libm).

    Scale shape: everything happens on the distinct-duration curve
    frame (one aggregate from the data); the at-risk counts are a
    reverse cumulative sum over that frame; the fold array at row t
    holds <= |distinct durations| elements — curve-sized, not
    data-sized. For ungrouped curves the window is single-partition by
    nature (the curve IS one sequence); group the input upstream for
    per-segment curves.

    Output: (t, n_risk, d, censored, survival), one row per distinct
    duration, ascending.
    """
    t, e = duration_col, observed_col
    base = df.where(F.col(t).isNotNull() & F.col(e).isNotNull()).select(
        F.col(t).cast("long").alias("_t"),
        (F.col(e).cast("long") == 1).cast("long").alias("_e"),
    )
    curve = base.groupBy("_t").agg(
        F.count("*").alias("_all"), F.sum("_e").alias("d")
    )
    w_rev = Window.orderBy(F.col("_t").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    at_risk = curve.select(
        "_t", "_all", "d", F.sum("_all").over(w_rev).alias("n_risk")
    )
    factor = F.lit(1.0) - F.col("d").cast("double") / F.col("n_risk").cast(
        "double"
    )
    w_fwd = Window.orderBy(F.col("_t").asc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    folded = at_risk.withColumn("_factors", F.collect_list(factor).over(w_fwd))
    return folded.select(
        F.col("_t").alias("t"),
        "n_risk",
        "d",
        (F.col("_all") - F.col("d")).alias("censored"),
        F.aggregate(
            F.col("_factors"), F.lit(1.0), lambda acc, x: acc * x
        ).alias("survival"),
    )


def kaplan_meier_oracle_sql(
    source_sql: str, duration_col: str, observed_col: str
) -> str:
    """DuckDB mirror of :func:`kaplan_meier` — same framed-window
    factor list, same left-to-right fold (list_reduce folds from the
    first element; the Spark side's leading 1.0 multiplication is
    exact, so the sequences agree bit-for-bit)."""
    t, e = duration_col, observed_col
    return f"""
    WITH src0 AS ({source_sql}),
    base AS (SELECT CAST({t} AS BIGINT) AS _t,
                    CAST(CAST({e} AS BIGINT) = 1 AS BIGINT) AS _e
             FROM src0 WHERE {t} IS NOT NULL AND {e} IS NOT NULL),
    curve AS (SELECT _t, count(*) AS _all, sum(_e) AS d
              FROM base GROUP BY 1),
    at_risk AS (
      SELECT _t, _all, d,
             sum(_all) OVER (ORDER BY _t DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_risk
      FROM curve
    ),
    folded AS (
      SELECT _t, _all, d, n_risk,
             list(1.0e0 - CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE))
               OVER (ORDER BY _t ASC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS _factors
      FROM at_risk
    )
    SELECT _t AS t, CAST(n_risk AS BIGINT) AS n_risk,
           CAST(d AS BIGINT) AS d,
           CAST(_all - d AS BIGINT) AS censored,
           list_reduce(list_prepend(1.0e0, _factors),
                       (acc, x) -> acc * x) AS survival
    FROM folded
    """


LOGRANK_FP_SCALE = 1 << 20  # fixed-point quantum for E/V terms


def log_rank_test(
    df: DataFrame, group_col: str, duration_col: str, observed_col: str
) -> DataFrame:
    """Two-cohort log-rank test over right-censored durations — "do
    these retention curves differ" with a statistic instead of a
    squint at two :func:`kaplan_meier` plots. At every pooled event
    time t: observed events in cohort 1 vs the hypergeometric
    expectation ``E_t = d_t·n1_t/n_t`` and variance
    ``V_t = d_t·(n1/n)·(n0/n)·(n-d)/(n-1)``;
    ``z = (O1 - ΣE) / sqrt(ΣV)``.

    Determinism: O1 is a BIGINT; ΣE and ΣV are cross-row float sums —
    banned — so each term is quantized to 2^20 FIXED-POINT (the
    Hellinger recipe, drift.py): both engines compute the identical
    per-row integer, the sums are integer arithmetic, and the final z
    is one double tail over (O1, e_fp, v_fp). Quantization bounds the
    error of ΣE by n_times·2^-20 — documented, not a float flake.

    Scale shape: everything runs on the pooled distinct-duration curve
    (one aggregate from the data, a full-outer merge of two per-cohort
    curves, two reverse cumsums over the curve frame, one 1-row
    aggregate). ``group_col`` must be a 0/1 flag.

    Output: one row (n1, n0, o1, e1_fp, v_fp, e1, z_stat); z NULL when
    ΣV is 0 (no events, or one cohort empty at every event time).
    """
    g, t, e = group_col, duration_col, observed_col
    S = LOGRANK_FP_SCALE
    base = df.where(
        F.col(g).isNotNull() & F.col(t).isNotNull() & F.col(e).isNotNull()
    ).select(
        (F.col(g).cast("long") == 1).alias("_g1"),
        F.col(t).cast("long").alias("_t"),
        (F.col(e).cast("long") == 1).cast("long").alias("_e"),
    )
    curve = base.groupBy("_t").agg(
        F.sum(F.when(F.col("_g1"), 1).otherwise(0)).alias("_all1"),
        F.sum(F.when(~F.col("_g1"), 1).otherwise(0)).alias("_all0"),
        F.sum(F.when(F.col("_g1"), F.col("_e")).otherwise(0)).alias("_d1"),
        F.sum(F.when(~F.col("_g1"), F.col("_e")).otherwise(0)).alias("_d0"),
    )
    w_rev = Window.orderBy(F.col("_t").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    risk = curve.select(
        "_t",
        "_d1",
        "_d0",
        F.sum("_all1").over(w_rev).alias("_n1"),
        F.sum("_all0").over(w_rev).alias("_n0"),
    ).where((F.col("_d1") + F.col("_d0")) > 0)
    d = F.col("_d1") + F.col("_d0")
    n = F.col("_n1") + F.col("_n0")
    e_term = d.cast("double") * F.col("_n1").cast("double") / n.cast("double")
    v_term = F.when(
        n > 1,
        d.cast("double")
        * (F.col("_n1").cast("double") / n.cast("double"))
        * (F.col("_n0").cast("double") / n.cast("double"))
        * ((n - d).cast("double") / (n - F.lit(1)).cast("double")),
    ).otherwise(F.lit(0.0))
    fp = risk.select(
        "_d1",
        F.round(e_term * F.lit(float(S))).cast("bigint").alias("_efp"),
        F.round(v_term * F.lit(float(S))).cast("bigint").alias("_vfp"),
    )
    totals_subjects = base.agg(
        F.sum(F.col("_g1").cast("long")).alias("n1"),
        F.sum((~F.col("_g1")).cast("long")).alias("n0"),
    )
    agg = fp.agg(
        F.coalesce(F.sum("_d1"), F.lit(0)).alias("o1"),
        F.coalesce(F.sum("_efp"), F.lit(0)).alias("e1_fp"),
        F.coalesce(F.sum("_vfp"), F.lit(0)).alias("v_fp"),
    )
    out = totals_subjects.crossJoin(F.broadcast(agg))
    e1 = F.col("e1_fp").cast("double") / F.lit(float(S))
    v = F.col("v_fp").cast("double") / F.lit(float(S))
    return out.select(
        "n1",
        "n0",
        "o1",
        "e1_fp",
        "v_fp",
        e1.alias("e1"),
        F.when(
            F.col("v_fp") > 0,
            (F.col("o1").cast("double") - e1) / F.sqrt(v),
        ).alias("z_stat"),
    )


def log_rank_oracle_sql(
    source_sql: str, group_col: str, duration_col: str, observed_col: str
) -> str:
    """DuckDB mirror of :func:`log_rank_test` (identical fixed-point
    quantization and expression association)."""
    g, t, e = group_col, duration_col, observed_col
    S = LOGRANK_FP_SCALE
    e_term = (
        "CAST(_d1 + _d0 AS DOUBLE) * CAST(_n1 AS DOUBLE)"
        " / CAST(_n1 + _n0 AS DOUBLE)"
    )
    v_term = (
        "CASE WHEN _n1 + _n0 > 1 THEN "
        "CAST(_d1 + _d0 AS DOUBLE)"
        " * (CAST(_n1 AS DOUBLE) / CAST(_n1 + _n0 AS DOUBLE))"
        " * (CAST(_n0 AS DOUBLE) / CAST(_n1 + _n0 AS DOUBLE))"
        " * (CAST((_n1 + _n0) - (_d1 + _d0) AS DOUBLE)"
        "    / CAST((_n1 + _n0) - 1 AS DOUBLE))"
        " ELSE 0.0e0 END"
    )
    return f"""
    WITH src0 AS ({source_sql}),
    base AS (SELECT CAST({g} AS BIGINT) = 1 AS _g1,
                    CAST({t} AS BIGINT) AS _t,
                    CAST(CAST({e} AS BIGINT) = 1 AS BIGINT) AS _e
             FROM src0
             WHERE {g} IS NOT NULL AND {t} IS NOT NULL AND {e} IS NOT NULL),
    curve AS (
      SELECT _t,
             sum(CASE WHEN _g1 THEN 1 ELSE 0 END) AS _all1,
             sum(CASE WHEN NOT _g1 THEN 1 ELSE 0 END) AS _all0,
             sum(CASE WHEN _g1 THEN _e ELSE 0 END) AS _d1,
             sum(CASE WHEN NOT _g1 THEN _e ELSE 0 END) AS _d0
      FROM base GROUP BY 1
    ),
    risk AS (
      SELECT _t, _d1, _d0,
             sum(_all1) OVER (ORDER BY _t DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS _n1,
             sum(_all0) OVER (ORDER BY _t DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS _n0
      FROM curve
    ),
    fp AS (
      SELECT _d1,
             CAST(round(({e_term}) * CAST({S} AS DOUBLE)) AS BIGINT) AS _efp,
             CAST(round(({v_term}) * CAST({S} AS DOUBLE)) AS BIGINT) AS _vfp
      FROM risk WHERE _d1 + _d0 > 0
    ),
    subj AS (SELECT sum(CASE WHEN _g1 THEN 1 ELSE 0 END) AS n1,
                    sum(CASE WHEN NOT _g1 THEN 1 ELSE 0 END) AS n0
             FROM base),
    agg AS (SELECT COALESCE(sum(_d1), 0) AS o1,
                   COALESCE(sum(_efp), 0) AS e1_fp,
                   COALESCE(sum(_vfp), 0) AS v_fp
            FROM fp)
    SELECT CAST(n1 AS BIGINT) AS n1, CAST(n0 AS BIGINT) AS n0,
           CAST(o1 AS BIGINT) AS o1,
           CAST(e1_fp AS BIGINT) AS e1_fp, CAST(v_fp AS BIGINT) AS v_fp,
           CAST(e1_fp AS DOUBLE) / CAST({S} AS DOUBLE) AS e1,
           CASE WHEN v_fp > 0 THEN
             (CAST(o1 AS DOUBLE)
              - CAST(e1_fp AS DOUBLE) / CAST({S} AS DOUBLE))
             / sqrt(CAST(v_fp AS DOUBLE) / CAST({S} AS DOUBLE))
           END AS z_stat
    FROM subj CROSS JOIN agg
    """
