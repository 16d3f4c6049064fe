"""Round-7 specs (q144-q157): distribution-drift and data-audit
operators over the event stream and the billing tables — the
"assess what you moved" layer a 100 TB training-data pipeline runs
after ingest (KS and rank-based drift, fabricated-data screening,
robust trending, changepoints, series regularization, path mining,
audience affinity, autocorrelation).

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
from ..operators.contracts import contract_oracle_sql, validate_contract
from ..operators.drift import (
    benford_audit,
    benford_oracle_sql,
    cusum_changepoint_by,
    cusum_oracle_sql,
    gap_fill_interpolate,
    gap_fill_oracle_sql,
    hist_tv_distance,
    hist_tv_oracle_sql,
    ks_drift_binned,
    ks_drift_binned_oracle_sql as _ks_binned_oracle,
    ks_drift_by,
    ks_drift_oracle_sql,
    mann_whitney_by,
    mann_whitney_oracle_sql,
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


@query(
    "q149_mann_whitney",
    oracle=mann_whitney_oracle_sql(
        "SELECT event_type, value FROM events", "event_type", "value"
    ),
    doc="exact Mann-Whitney U / AUC of each event type's value vs the "
    "rest (rank-based stochastic-dominance drift; integer 2U via "
    "tie-averaged ranks over a distinct-value cumulative window)",
    tags=("drift", "stats"),
)
def q149(spark: SparkSession, sf: str) -> DataFrame:
    ev = load(spark, sf, "events").select("event_type", "value")
    return mann_whitney_by(ev, "event_type", "value")


@query(
    "q150_cusum_changepoint",
    oracle=cusum_oracle_sql(
        _Q146_SERIES.replace("cnt", "y").replace("day_x", "x"),
        "event_type",
        "x",
        "y",
    ),
    doc="CUSUM level-shift changepoint per event type's daily volume: "
    "argmax_k |n*S_k - k*S_n| over the prefix sums, earliest-k "
    "tiebreak, pure-BIGINT statistic",
    tags=("drift", "timeseries"),
)
def q150(spark: SparkSession, sf: str) -> DataFrame:
    daily = (
        load(spark, sf, "events")
        .groupBy(
            "event_type",
            F.datediff(F.to_date("ts"), F.lit("1970-01-01"))
            .cast("bigint")
            .alias("x"),
        )
        .agg(F.count("*").cast("bigint").alias("y"))
    )
    return cusum_changepoint_by(daily, "event_type", "x", "y")


@query(
    "q151_type_affinity",
    oracle="""
    WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
    per_t AS (SELECT event_type, count(*) AS nu FROM ut GROUP BY 1),
    co AS (
      SELECT a.event_type AS t1, b.event_type AS t2, count(*) AS n_both
      FROM ut a JOIN ut b ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY 1, 2
    )
    SELECT t1, t2,
           CAST(n_both AS BIGINT) AS n_both,
           CAST(p1.nu AS BIGINT) AS n1,
           CAST(p2.nu AS BIGINT) AS n2,
           CAST(n_both AS DOUBLE) / CAST(p1.nu + p2.nu - n_both AS DOUBLE) AS jaccard
    FROM co JOIN per_t p1 ON p1.event_type = t1
            JOIN per_t p2 ON p2.event_type = t2
    """,
    doc="event-type audience affinity: exact Jaccard of user sets per "
    "type pair (distinct (user,type) dedup, user-keyed self-join "
    "bounded by types-per-user, broadcast per-type totals)",
    tags=("analytics", "similarity"),
)
def q151(spark: SparkSession, sf: str) -> DataFrame:
    ut = load(spark, sf, "events").select("user_id", "event_type").distinct()
    per_t = ut.groupBy("event_type").agg(F.count("*").alias("nu"))
    a = ut.select(F.col("user_id").alias("u"), F.col("event_type").alias("t1"))
    b = ut.select(F.col("user_id").alias("u"), F.col("event_type").alias("t2"))
    co = (
        a.join(b, "u")
        .where(F.col("t1") < F.col("t2"))
        .groupBy("t1", "t2")
        .agg(F.count("*").alias("n_both"))
    )
    p1 = per_t.select(F.col("event_type").alias("t1"), F.col("nu").alias("n1"))
    p2 = per_t.select(F.col("event_type").alias("t2"), F.col("nu").alias("n2"))
    return (
        co.join(F.broadcast(p1), "t1")
        .join(F.broadcast(p2), "t2")
        .select(
            "t1",
            "t2",
            "n_both",
            "n1",
            "n2",
            (
                F.col("n_both").cast("double")
                / (F.col("n1") + F.col("n2") - F.col("n_both")).cast("double")
            ).alias("jaccard"),
        )
    )


# lag-L autocorrelation of daily counts: align by day-join (gap-safe,
# unlike lag()) and compute Pearson r from exact integer moments — the
# q137 recipe applied to a series against its own shifted self
@query(
    "q152_autocorrelation",
    oracle="""
    WITH daily AS (
      SELECT event_type AS t,
             CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS d,
             CAST(count(*) AS BIGINT) AS x
      FROM events GROUP BY 1, 2
    ),
    lags(lag) AS (VALUES (1), (2), (3), (4), (5), (6), (7)),
    pairs AS (
      SELECT a.t, l.lag, count(*) AS n,
             sum(a.x) AS sx, sum(b.x) AS sy,
             sum(a.x * a.x) AS sxx, sum(b.x * b.x) AS syy,
             sum(a.x * b.x) AS sxy
      FROM daily a
      CROSS JOIN lags l
      JOIN daily b ON b.t = a.t AND b.d = a.d + l.lag
      GROUP BY a.t, l.lag
    )
    SELECT t AS event_type, CAST(lag AS INT) AS lag, CAST(n AS BIGINT) AS n_pairs,
           (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / NULLIF(
                 sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                 * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)),
                 0)
             AS acf
    FROM pairs
    """,
    doc="lag-1..7 autocorrelation of daily volume per event type "
    "(day-aligned self-join is gap-safe where lag() is not; exact "
    "integer moments, q137's shared double tree)",
    tags=("stats", "timeseries"),
)
def q152(spark: SparkSession, sf: str) -> DataFrame:
    daily = (
        load(spark, sf, "events")
        .groupBy(
            F.col("event_type").alias("t"),
            F.datediff(F.to_date("ts"), F.lit("1970-01-01"))
            .cast("bigint")
            .alias("d"),
        )
        .agg(F.count("*").cast("bigint").alias("x"))
    )
    # single-slice range: 7 rows over a cores-wide Range would schedule
    # defaultParallelism near-empty tasks to build the broadcast (r16)
    lags = spark.range(1, 8, 1, 1).select(F.col("id").cast("int").alias("lag"))
    a = daily.select(F.col("t"), F.col("d"), F.col("x").alias("xa")).crossJoin(
        F.broadcast(lags)
    )
    b = daily.select(
        F.col("t").alias("tb"), F.col("d").alias("db"), F.col("x").alias("xb")
    )
    pairs = (
        a.join(
            b,
            (F.col("tb") == F.col("t"))
            & (F.col("db") == F.col("d") + F.col("lag")),
        )
        .groupBy("t", "lag")
        .agg(
            F.count("*").alias("n"),
            F.sum("xa").alias("sx"),
            F.sum("xb").alias("sy"),
            F.sum(F.col("xa") * F.col("xa")).alias("sxx"),
            F.sum(F.col("xb") * F.col("xb")).alias("syy"),
            F.sum(F.col("xa") * F.col("xb")).alias("sxy"),
        )
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxx = F.col("sxx").cast("double")
    syy = F.col("syy").cast("double")
    sxy = F.col("sxy").cast("double")
    # NULLIF-guard the denominator (round-8 advice): on a zero-variance
    # (event_type, lag) series Spark's x/0.0 yields NULL while DuckDB
    # follows IEEE (inf/NaN) — pinning 0 → NULL on BOTH sides keeps the
    # oracle hash stable on constant daily counts
    den = F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)
    return pairs.select(
        F.col("t").alias("event_type"),
        "lag",
        F.col("n").alias("n_pairs"),
        ((n * sxy - sx * sy) / F.nullif(den, F.lit(0.0))).alias("acf"),
    )


# first-half vs second-half value histograms (bin width 10): the batch
# face of the streaming hist_drift_monitor — same hist_bins registers,
# same TV arithmetic
def _tv_half_sql(pred: str) -> str:
    return (
        "SELECT LEAST(GREATEST(CAST(floor(value / 10.0) AS BIGINT), 0), 63) AS bin, "
        f"count(*) AS cnt FROM events WHERE value IS NOT NULL AND {pred} GROUP BY 1"
    )


@query(
    "q153_hist_drift",
    oracle=hist_tv_oracle_sql(
        _tv_half_sql("CAST(ts AS DATE) < DATE '2024-01-16'"),
        _tv_half_sql("CAST(ts AS DATE) >= DATE '2024-01-16'"),
    ),
    doc="total-variation drift between first-half and second-half "
    "value histograms (integer TV numerator over <=64 bin registers; "
    "the batch face of the streaming hist_drift_monitor)",
    tags=("drift", "streaming-adjacent"),
)
def q153(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.sketches import hist_bins

    ev = load(spark, sf, "events").select(F.to_date("ts").alias("day"), "value")
    ref = hist_bins(ev.where(F.col("day") < "2024-01-16"), "value", 10.0, 64)
    cur = hist_bins(ev.where(F.col("day") >= "2024-01-16"), "value", 10.0, 64)
    return hist_tv_distance(ref, cur)


@query(
    "q154_ks_drift_binned",
    oracle=_ks_binned_oracle(
        "SELECT event_type, value FROM events", "event_type", "value", 5.0, 128
    ),
    doc="binned KS drift per event type vs rest — the register-scale "
    "path for q144: G x num_bins histogram rows instead of per-segment "
    "sorts of the raw data; same integer numerator arithmetic",
    tags=("drift", "stats"),
)
def q154(spark: SparkSession, sf: str) -> DataFrame:
    ev = load(spark, sf, "events").select("event_type", "value")
    return ks_drift_binned(ev, "event_type", "value", 5.0, 128)


@query(
    "q155_data_contract",
    oracle=contract_oracle_sql(
        "SELECT * FROM lineitem",
        {
            "qty_in_range": "l_quantity BETWEEN 1 AND 50",
            "price_positive": "l_extendedprice > 0",
            "discount_bounds": "l_discount BETWEEN 0.0 AND 0.1",
            "returnflag_domain": "l_returnflag IN ('A', 'N', 'R')",
            "shipdate_window": "l_shipdate BETWEEN DATE '1992-01-01' AND DATE '1999-12-31'",
            "orderkey_not_null": "l_orderkey IS NOT NULL",
        },
        {"line_pk_unique": ["l_orderkey", "l_linenumber"]},
    ),
    doc="declarative data-contract gate over lineitem: six row-level "
    "invariants compiled into ONE conditional-sum aggregate pass plus "
    "a key-uniqueness check; NULL verdicts count as violations",
    tags=("contract", "audit"),
)
def q155(spark: SparkSession, sf: str) -> DataFrame:
    li = load(spark, sf, "lineitem")
    return validate_contract(
        li,
        {
            "qty_in_range": F.col("l_quantity").between(1, 50),
            "price_positive": F.col("l_extendedprice") > 0,
            "discount_bounds": F.col("l_discount").between(0.0, 0.1),
            "returnflag_domain": F.col("l_returnflag").isin("A", "N", "R"),
            "shipdate_window": F.col("l_shipdate").between("1992-01-01", "1999-12-31"),
            "orderkey_not_null": F.col("l_orderkey").isNotNull(),
        },
        {"line_pk_unique": ["l_orderkey", "l_linenumber"]},
    )


# emerging/declining items: which parts' share of line volume moved
# most between the two halves of the shipping history. Shares are one
# IEEE division each; the ranking is a total order (shift desc, key)
@query(
    "q156_share_shift",
    oracle="""
    WITH half AS (
      SELECT l_partkey,
             CASE WHEN l_shipdate < DATE '1996-01-01' THEN 1 ELSE 2 END AS h
      FROM lineitem
    ),
    c AS (SELECT l_partkey, h, count(*) AS c FROM half GROUP BY 1, 2),
    n AS (
      SELECT sum(CASE WHEN h = 1 THEN 1 ELSE 0 END) AS n1,
             sum(CASE WHEN h = 2 THEN 1 ELSE 0 END) AS n2
      FROM half
    ),
    p AS (
      SELECT l_partkey,
             COALESCE(max(CASE WHEN h = 1 THEN c END), 0) AS c1,
             COALESCE(max(CASE WHEN h = 2 THEN c END), 0) AS c2
      FROM c GROUP BY 1
    ),
    scored AS (
      SELECT l_partkey, CAST(c1 AS BIGINT) AS c1, CAST(c2 AS BIGINT) AS c2,
             abs(CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                 - CAST(c2 AS DOUBLE) / CAST(n2 AS DOUBLE)) AS shift
      FROM p CROSS JOIN n
    )
    SELECT l_partkey, c1, c2, shift,
           CAST(rk AS BIGINT) AS rk
    FROM (SELECT *, row_number() OVER (ORDER BY shift DESC, l_partkey) AS rk
          FROM scored)
    WHERE rk <= 20
    """,
    doc="top-20 emerging/declining parts by half-over-half share "
    "shift of line volume (integer half counts, one division per "
    "share, broadcast 1-row totals, WindowGroupLimit top-k)",
    tags=("drift", "analytics"),
)
def q156(spark: SparkSession, sf: str) -> DataFrame:
    li = load(spark, sf, "lineitem").select(
        "l_partkey",
        F.when(F.col("l_shipdate") < "1996-01-01", 1).otherwise(2).alias("h"),
    )
    per = li.groupBy("l_partkey").agg(
        F.sum(F.when(F.col("h") == 1, 1).otherwise(0)).cast("bigint").alias("c1"),
        F.sum(F.when(F.col("h") == 2, 1).otherwise(0)).cast("bigint").alias("c2"),
    )
    totals = li.agg(
        F.sum(F.when(F.col("h") == 1, 1).otherwise(0)).alias("n1"),
        F.sum(F.when(F.col("h") == 2, 1).otherwise(0)).alias("n2"),
    )
    scored = per.crossJoin(F.broadcast(totals)).select(
        "l_partkey",
        "c1",
        "c2",
        F.abs(
            F.col("c1").cast("double") / F.col("n1").cast("double")
            - F.col("c2").cast("double") / F.col("n2").cast("double")
        ).alias("shift"),
    )
    w = Window.orderBy(F.desc("shift"), "l_partkey")
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .where(F.col("rk") <= 20)
        .select("l_partkey", "c1", "c2", "shift", "rk")
    )


# budget-constrained corpus selection: per source, greedily keep the
# highest-quality documents until the char budget is exhausted (the
# "what fits in this data mix" primitive; quality here is the exact
# integer chars-per-doc density proxy so both engines agree bit-exact)
@query(
    "q157_budget_select",
    oracle="""
    WITH scored AS (
      SELECT source, doc_id, n_chars,
             sum(n_chars) OVER (PARTITION BY source
                                ORDER BY n_chars DESC, doc_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum_chars
      FROM documents
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS kept_docs,
           CAST(max(cum_chars) AS BIGINT) AS kept_chars,
           CAST(min(n_chars) AS BIGINT) AS smallest_kept
    FROM scored
    WHERE cum_chars <= 4000
    GROUP BY source
    """,
    doc="budget-constrained greedy selection per source: keep the "
    "largest documents until a 4000-char budget fills (one per-group "
    "cumulative window over a deterministic (n_chars desc, doc_id) "
    "order, exact integers)",
    tags=("curation", "sampling"),
)
def q157(spark: SparkSession, sf: str) -> DataFrame:
    docs = load(spark, sf, "documents")
    w = (
        Window.partitionBy("source")
        .orderBy(F.desc("n_chars"), "doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    scored = docs.select(
        "source", "doc_id", "n_chars", F.sum("n_chars").over(w).alias("cum_chars")
    )
    return (
        scored.where(F.col("cum_chars") <= 4000)
        .groupBy("source")
        .agg(
            F.count("*").alias("kept_docs"),
            F.max("cum_chars").cast("bigint").alias("kept_chars"),
            F.min("n_chars").cast("bigint").alias("smallest_kept"),
        )
    )
