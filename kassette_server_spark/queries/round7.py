"""Round-7 specs (q144-q148): distribution-drift and data-audit
operators over the event stream and the billing tables — the
"assess what you moved" layer a 100 TB training-data pipeline runs
after ingest (drift detection, fabricated-data screening, robust
trending, series regularization, path mining).

Registered AFTER the 50-spec driver window (queries/__init__.py), so
they ship on repo-oracle evidence this round and take their guaranteed
first-round slots in the r8 window per the standing rotation policy.

Determinism: every float in every spec is either one exact-rounded
IEEE expression over exact integers (KS ratio, slopes, interpolation)
or arithmetic against literal doubles both engines parse identically
(Benford probabilities) — no transcendental libm calls, no float
summation order (see operators/drift.py module docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load
from ..operators.drift import (
    benford_audit,
    benford_oracle_sql,
    gap_fill_interpolate,
    gap_fill_oracle_sql,
    ks_drift_by,
    ks_drift_oracle_sql,
    theil_sen_by,
    theil_sen_oracle_sql,
)
from .base import query


@query(
    "q144_ks_drift",
    oracle=ks_drift_oracle_sql(
        "SELECT event_type, value FROM events", "event_type", "value"
    ),
    doc="exact two-sample Kolmogorov-Smirnov drift of each event "
    "type's value distribution vs the rest of the stream (integer "
    "numerator, one RANGE-frame window pass per segment)",
    tags=("drift", "stats"),
)
def q144(spark: SparkSession, sf: str) -> DataFrame:
    ev = load(spark, sf, "events").select("event_type", "value")
    return ks_drift_by(ev, "event_type", "value")


@query(
    "q145_benford_audit",
    oracle=benford_oracle_sql(
        "SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS cents FROM lineitem",
        "cents",
    ),
    doc="Benford first-significant-digit audit of line-item amounts "
    "(string-surgery digit on exact cents, literal-double expected "
    "probabilities, per-digit chi-square contributions)",
    tags=("audit", "stats"),
)
def q145(spark: SparkSession, sf: str) -> DataFrame:
    li = load(spark, sf, "lineitem").select(
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("cents")
    )
    return benford_audit(li, "cents")


# daily event counts: exact-integer series (epoch day, count) so every
# pairwise slope is one IEEE division of integer differences
_Q146_SERIES = """
    SELECT event_type,
           CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS day_x,
           CAST(count(*) AS BIGINT) AS cnt
    FROM events
    GROUP BY 1, 2
"""


@query(
    "q146_theil_sen_trend",
    oracle=theil_sen_oracle_sql(_Q146_SERIES, "event_type", "day_x", "cnt"),
    doc="Theil-Sen robust daily-volume trend per event type: exact "
    "median of all pairwise slopes (O(days^2) per group by design, "
    "value-based middle selection)",
    tags=("trend", "stats"),
)
def q146(spark: SparkSession, sf: str) -> DataFrame:
    daily = (
        load(spark, sf, "events")
        .groupBy(
            "event_type",
            F.datediff(F.to_date("ts"), F.lit("1970-01-01"))
            .cast("bigint")
            .alias("day_x"),
        )
        .agg(F.count("*").cast("bigint").alias("cnt"))
    )
    return theil_sen_by(daily, "event_type", "day_x", "cnt")


@query(
    "q147_session_paths",
    oracle="""
    WITH ordered AS (
      SELECT user_id, CAST(ts AS DATE) AS day, event_type,
             row_number() OVER (PARTITION BY user_id, CAST(ts AS DATE)
                                ORDER BY ts, event_id) AS rn
      FROM events
    ),
    paths AS (
      SELECT user_id, day, string_agg(event_type, '>' ORDER BY rn) AS path
      FROM ordered WHERE rn <= 8 GROUP BY user_id, day
    ),
    counts AS (SELECT path, count(*) AS n FROM paths GROUP BY 1),
    ranked AS (
      SELECT path, CAST(n AS BIGINT) AS n,
             CAST(row_number() OVER (ORDER BY n DESC, path) AS BIGINT) AS rk
      FROM counts
    )
    SELECT path, n, rk FROM ranked WHERE rk <= 50
    """,
    doc="top-50 daily user journeys: first 8 events per (user, day) "
    "concatenated into a path string, counted, total-order ranked "
    "(count desc, path asc tiebreak)",
    tags=("pathing", "analytics"),
)
def q147(spark: SparkSession, sf: str) -> DataFrame:
    ev = load(spark, sf, "events").select(
        "user_id", F.to_date("ts").alias("day"), "event_type", "ts", "event_id"
    )
    w = Window.partitionBy("user_id", "day").orderBy("ts", "event_id")
    first8 = ev.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= 8)
    paths = first8.groupBy("user_id", "day").agg(
        F.concat_ws(
            ">",
            F.transform(
                F.array_sort(F.collect_list(F.struct("rn", "event_type"))),
                lambda s: s["event_type"],
            ),
        ).alias("path")
    )
    counts = paths.groupBy("path").agg(F.count("*").alias("n"))
    # global row_number over the distinct-path aggregate (output-scale:
    # paths, not events); deterministic total order via (n desc, path)
    w2 = Window.orderBy(F.desc("n"), "path")
    return (
        counts.withColumn("rk", F.row_number().over(w2).cast("bigint"))
        .where(F.col("rk") <= 50)
        .select("path", "n", "rk")
    )


# sparse daily revenue series: drop every third day deterministically
# (day % 3 = 1) so the gap-filler has real holes to interpolate; cents
# keep every sum exact on both sides
_Q148_SERIES = """
    SELECT event_type,
           CAST(ts AS DATE) AS day,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
    FROM events
    GROUP BY 1, 2
    HAVING (CAST(ts AS DATE) - DATE '1970-01-01') % 3 <> 1
"""


@query(
    "q148_gap_fill",
    # day emitted as its ISO string (house convention: date-typed output
    # columns hash differently across the engines' pandas mappings —
    # object dates vs datetime64 — so specs emit epoch ints or strings)
    oracle=f"""
    SELECT event_type, CAST(day AS VARCHAR) AS day, value, is_interpolated
    FROM ({gap_fill_oracle_sql(_Q148_SERIES, "event_type", "day", "cents")})
    """,
    doc="calendar gap-fill with linear interpolation of a sparse daily "
    "revenue series (per-group date spine via sequence(), two "
    "ignore-nulls window passes, exact-integer interpolation inputs)",
    tags=("timeseries", "analytics"),
)
def q148(spark: SparkSession, sf: str) -> DataFrame:
    ev = load(spark, sf, "events")
    daily = (
        ev.groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.sum(F.round(F.col("value") * 100).cast("bigint")).cast("bigint").alias("cents"))
        .where(F.datediff(F.col("day"), F.lit("1970-01-01")) % 3 != 1)
    )
    out = gap_fill_interpolate(daily, "event_type", "day", "cents")
    return out.withColumn("day", F.col("day").cast("string"))
