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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


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
) -> DataFrame:
    """Per-group robust outlier profile via median absolute deviation.

    Two grouped exact-median passes (values, then absolute deviations)
    joined back by group — the group cardinality is small (one row per
    group after pass 1), so the join back over the fact rows
    broadcasts. Output per group: n, med, mad, n_outliers
    (|x − med| > c·MAD), max_abs_dev.
    """
    rows = df.select(
        F.col(group_col).alias("grp"), F.col(value_col).cast("double").alias("v")
    )
    med = rows.groupBy("grp").agg(
        F.count("*").alias("n"), F.median("v").alias("med")
    )
    dev = rows.join(F.broadcast(med), "grp").select(
        "grp", "n", "med", F.abs(F.col("v") - F.col("med")).alias("adev")
    )
    mad = dev.groupBy("grp").agg(
        F.first("n").alias("n"),
        F.first("med").alias("med"),
        F.median("adev").alias("mad"),
    )
    return (
        dev.select("grp", "adev")
        .join(F.broadcast(mad), "grp")
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
