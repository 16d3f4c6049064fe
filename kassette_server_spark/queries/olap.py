"""OLAP extension operators (q42–q48): top-k per group, pivot, cube,
exact median, histogram, as-of join, range join.

The reference has none of these (SURVEY §2.1 "deliberately absent"),
but a query engine replacing it needs the standard analytical surface;
each is built from Spark primitives per the common-OLAP-patterns
catalogue and oracle-checked. As-of/range joins come from
operators/asof.py (union-merge and bucketized implementations — the
scale paths), with DuckDB's native ASOF JOIN / inequality join as the
oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..catalog import load
from ..operators.asof import asof_join_backward, range_join_buckets
from .base import query

_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]


# q47: as-of join — each event matched to the user's latest order
# at-or-before the event time (union-merge implementation, one shuffle;
# oracle = DuckDB native ASOF LEFT JOIN). Right side pre-aggregated to
# one row per (key, time) so ties are deterministic in both engines.
# Registered FIRST in this module: it's the custom operator that most
# deserves a hard-signal correctness row, and module registration order
# decides which olap spec lands inside the driver's 50-entry window.
@query(
    "q47_asof_join",
    oracle="""
    WITH o AS (
      SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
      FROM orders GROUP BY o_custkey, o_orderdate)
    SELECT e.event_id, o.o_orderkey AS last_orderkey, o.o_orderdate AS last_orderdate
    FROM events e ASOF LEFT JOIN o
      ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
    """,
    doc="as-of (backward) join via union-merge window",
    tags=("olap", "asof"),
)
def q47(spark: SparkSession, sf: str) -> DataFrame:
    ev = load(spark, sf, "events").select("event_id", F.col("user_id").alias("k"), "ts")
    orders = (
        load(spark, sf, "orders")
        .groupBy(F.col("o_custkey").alias("k"), "o_orderdate")
        .agg(F.max("o_orderkey").alias("o_orderkey"))
    )
    out = asof_join_backward(
        ev, orders, key="k", left_time="ts", right_time="o_orderdate",
        right_cols=["o_orderkey", "o_orderdate"],
    )
    return out.select(
        "event_id",
        F.col("o_orderkey").alias("last_orderkey"),
        F.col("o_orderdate").alias("last_orderdate"),
    )


# q42: top-k per group — per-partition partial top-k via ranking window
# (the canonical replacement for a global sort at scale).
@query(
    "q42_topk_per_group",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, CAST(rk AS BIGINT) AS rk FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rk
      FROM orders) t
    WHERE rk <= 3
    """,
    doc="top-3 orders per customer via ranking window",
    tags=("olap",),
)
def q42(spark: SparkSession, sf: str) -> DataFrame:
    w = W.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        load(spark, sf, "orders")
        .withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rk")
    )


# q43: pivot — orderpriority counts per status. Spark .pivot() with an
# explicit value list (never let pivot scan for distinct values at
# scale); oracle = FILTER'd conditional aggregation (same semantics).
@query(
    "q43_pivot",
    oracle=f"""
    SELECT o_orderstatus,
           {', '.join(f'''count(*) FILTER (o_orderpriority = '{p}') AS p{i + 1}''' for i, p in enumerate(_PRIORITIES))}
    FROM orders GROUP BY o_orderstatus
    """,
    doc="pivot with explicit value list (no distinct-scan)",
    tags=("olap",),
)
def q43(spark: SparkSession, sf: str) -> DataFrame:
    out = (
        load(spark, sf, "orders")
        .groupBy("o_orderstatus")
        .pivot("o_orderpriority", _PRIORITIES)
        .count()
    )
    renamed = out.toDF("o_orderstatus", *[f"p{i+1}" for i in range(len(_PRIORITIES))])
    # pivot leaves null where a (status, priority) pair has no rows;
    # FILTER'd count returns 0 — align on 0
    return renamed.select(
        "o_orderstatus",
        *[F.coalesce(F.col(f"p{i+1}"), F.lit(0)).alias(f"p{i+1}") for i in range(len(_PRIORITIES))],
    )


# q44: cube — all grouping-set combinations of (status, year).
@query(
    "q44_cube",
    oracle="""
    SELECT o_orderstatus, year(o_orderdate) AS y, count(*) AS c
    FROM orders GROUP BY CUBE (o_orderstatus, year(o_orderdate))
    """,
    doc="cube grouping sets",
    tags=("olap",),
)
def q44(spark: SparkSession, sf: str) -> DataFrame:
    return (
        load(spark, sf, "orders")
        .withColumn("y", F.year("o_orderdate").cast("long"))
        .cube("o_orderstatus", "y")
        .agg(F.count("*").alias("c"))
    )


# q45: exact median per group — rank to the middle rows instead of a
# full percentile sort collect; portable across engines (interpolation
# of two exact integer cents).
@query(
    "q45_exact_median",
    oracle="""
    WITH r AS (
      SELECT l_returnflag, CAST(round(l_quantity*100) AS BIGINT) AS qc,
             row_number() OVER (PARTITION BY l_returnflag
                                ORDER BY l_quantity, l_orderkey, l_linenumber) AS rn,
             count(*) OVER (PARTITION BY l_returnflag) AS n
      FROM lineitem)
    SELECT l_returnflag, CAST(sum(qc) AS BIGINT) / count(*) / 100 AS median_qty
    FROM r WHERE rn IN ((n + 1) // 2, (n + 2) // 2)
    GROUP BY l_returnflag
    """,
    doc="exact median via ranking (no full-sort collect)",
    tags=("olap",),
)
def q45(spark: SparkSession, sf: str) -> DataFrame:
    w = W.partitionBy("l_returnflag").orderBy("l_quantity", "l_orderkey", "l_linenumber")
    wc = W.partitionBy("l_returnflag")
    r = (
        load(spark, sf, "lineitem")
        .select(
            "l_returnflag",
            F.round(F.col("l_quantity") * 100).cast("long").alias("qc"),
            F.row_number().over(w).alias("rn"),
            F.count("*").over(wc).alias("n"),
        )
        .filter(
            (F.col("rn") == F.floor((F.col("n") + 1) / 2))
            | (F.col("rn") == F.floor((F.col("n") + 2) / 2))
        )
    )
    return r.groupBy("l_returnflag").agg(
        (F.sum("qc") / F.count("*") / 100).alias("median_qty")
    )


# q46: histogram — fixed-width binning, one partial-agg shuffle.
@query(
    "q46_histogram",
    oracle="""
    SELECT CAST(floor(o_totalprice / 2000) AS BIGINT) AS bucket, count(*) AS cnt
    FROM orders GROUP BY 1
    """,
    doc="fixed-width histogram binning",
    tags=("olap",),
)
def q46(spark: SparkSession, sf: str) -> DataFrame:
    return (
        load(spark, sf, "orders")
        .groupBy(F.floor(F.col("o_totalprice") / 2000).cast("long").alias("bucket"))
        .agg(F.count("*").alias("cnt"))
    )


# q56: time-bucketed rollup (hypertable/continuous-aggregate shape):
# hourly buckets per event type with count + exact sum. At 100 TB this
# is THE ingest-side aggregate — partial agg per file/partition, tiny
# shuffle, and the result is itself partition-prunable by bucket.
@query(
    "q56_time_rollup",
    oracle="""
    SELECT date_trunc('hour', ts) AS bucket, event_type,
           count(*) AS n,
           CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) / 100 AS sum_value
    FROM events GROUP BY 1, 2
    """,
    doc="hourly hypertable rollup: time_bucket + per-type aggregates",
    tags=("olap", "timeseries"),
)
def q56(spark: SparkSession, sf: str) -> DataFrame:
    from .relational import cents

    return (
        load(spark, sf, "events")
        .groupBy(
            F.date_trunc("hour", F.col("ts")).alias("bucket"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n"),
            (F.sum(cents("value")) / 100).alias("sum_value"),
        )
    )


# q60: per-group mode (most frequent value) — two-level aggregation
# with a deterministic tie-break (higher count, then smaller value);
# the max_by(struct) pattern keeps it one extra shuffle over the
# counting agg, never a sort.
@query(
    "q60_mode_per_group",
    oracle="""
    WITH c AS (
      SELECT l_returnflag, l_quantity, count(*) AS cnt
      FROM lineitem GROUP BY l_returnflag, l_quantity)
    SELECT l_returnflag, l_quantity AS mode_qty, cnt FROM (
      SELECT *, row_number() OVER (PARTITION BY l_returnflag
                                   ORDER BY cnt DESC, l_quantity) AS rn
      FROM c) t
    WHERE rn = 1
    """,
    doc="per-group mode via two-level agg + deterministic argmax",
    tags=("olap",),
)
def q60(spark: SparkSession, sf: str) -> DataFrame:
    counts = (
        load(spark, sf, "lineitem")
        .groupBy("l_returnflag", "l_quantity")
        .agg(F.count("*").alias("cnt"))
    )
    best = counts.groupBy("l_returnflag").agg(
        F.max_by(
            F.struct("l_quantity", "cnt"),
            F.struct(F.col("cnt"), (-F.col("l_quantity")).alias("neg")),
        ).alias("b")
    )
    return best.select(
        "l_returnflag",
        F.col("b.l_quantity").alias("mode_qty"),
        F.col("b.cnt").alias("cnt"),
    )


# q59: unpivot — wide metrics to long (measure, value) rows; Spark
# unpivot()/stack ≡ SQL UNION ALL of one projection per measure.
@query(
    "q59_unpivot",
    oracle="""
    SELECT o_orderkey, 'totalprice' AS measure, o_totalprice AS value FROM orders
    UNION ALL
    SELECT o_orderkey, 'year' AS measure, CAST(year(o_orderdate) AS DOUBLE) FROM orders
    UNION ALL
    SELECT o_orderkey, 'priority_rank' AS measure,
           CAST(CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS DOUBLE) FROM orders
    """,
    doc="unpivot wide→long via stack (melt for metric tables)",
    tags=("olap",),
)
def q59(spark: SparkSession, sf: str) -> DataFrame:
    o = load(spark, sf, "orders").select(
        "o_orderkey",
        F.col("o_totalprice").alias("totalprice"),
        F.year("o_orderdate").cast("double").alias("year"),
        F.substring("o_orderpriority", 1, 1).cast("long").cast("double").alias("priority_rank"),
    )
    return o.unpivot(
        ids=["o_orderkey"],
        values=["totalprice", "year", "priority_rank"],
        variableColumnName="measure",
        valueColumnName="value",
    )


# q61: statistical aggregates (stddev / correlation) computed from
# exact integer-cent moments so both engines emit bit-identical doubles:
# sums of d, t, d², t², d·t are BIGINT-exact (discount/tax are exact
# 2-decimal values ≤ 0.10, so all moments stay far inside int64), and
# only the final combine is floating-point — the identical scalar
# expression on both sides. One map-side-combined shuffle, same shape
# as any hash agg; never uses the engines' (summation-order-dependent)
# native stddev/corr.
@query(
    "q61_stats_moments",
    oracle="""
    WITH m AS (
      SELECT l_returnflag,
             count(*) AS n,
             CAST(sum(d) AS BIGINT) AS sd, CAST(sum(t) AS BIGINT) AS st,
             CAST(sum(d*d) AS BIGINT) AS sdd, CAST(sum(t*t) AS BIGINT) AS stt,
             CAST(sum(d*t) AS BIGINT) AS sdt
      FROM (SELECT l_returnflag,
                   CAST(round(l_discount*100) AS BIGINT) AS d,
                   CAST(round(l_tax*100) AS BIGINT) AS t
            FROM lineitem)
      GROUP BY l_returnflag)
    SELECT l_returnflag, n,
           sqrt(CAST(n*sdd - sd*sd AS DOUBLE) / CAST(n*(n-1) AS DOUBLE)) / 100 AS stddev_disc,
           CAST(n*sdt - sd*st AS DOUBLE)
             / (sqrt(CAST(n*sdd - sd*sd AS DOUBLE)) * sqrt(CAST(n*stt - st*st AS DOUBLE))) AS corr_disc_tax
    FROM m
    """,
    doc="exact stddev/corr via integer-cent moments (order-insensitive)",
    tags=("olap",),
)
def q61(spark: SparkSession, sf: str) -> DataFrame:
    li = load(spark, sf, "lineitem").select(
        "l_returnflag",
        F.round(F.col("l_discount") * 100).cast("long").alias("d"),
        F.round(F.col("l_tax") * 100).cast("long").alias("t"),
    )
    m = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum("d").alias("sd"),
        F.sum("t").alias("st"),
        F.sum(F.col("d") * F.col("d")).alias("sdd"),
        F.sum(F.col("t") * F.col("t")).alias("stt"),
        F.sum(F.col("d") * F.col("t")).alias("sdt"),
    )
    n, sd, st = F.col("n"), F.col("sd"), F.col("st")
    sdd, stt, sdt = F.col("sdd"), F.col("stt"), F.col("sdt")
    var_num_d = (n * sdd - sd * sd).cast("double")
    var_num_t = (n * stt - st * st).cast("double")
    return m.select(
        "l_returnflag",
        "n",
        (F.sqrt(var_num_d / (n * (n - 1)).cast("double")) / 100).alias("stddev_disc"),
        ((n * sdt - sd * st).cast("double") / (F.sqrt(var_num_d) * F.sqrt(var_num_t))).alias(
            "corr_disc_tax"
        ),
    )


# q62: GROUPING SETS with grouping flags — the general form of
# rollup/cube (q10/q44). Spark compiles this to a single Expand+agg
# over one scan (not a UNION ALL of re-scans); per-column GROUPING()
# flags are used instead of grouping_id() because the two engines
# disagree on bit order.
@query(
    "q62_grouping_sets",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, count(*) AS c,
           CAST(grouping(o_orderstatus) AS BIGINT) AS g_status,
           CAST(grouping(o_orderpriority) AS BIGINT) AS g_prio
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
    """,
    doc="grouping sets (general rollup/cube) with per-column grouping flags",
    tags=("olap",),
)
def q62(spark: SparkSession, sf: str) -> DataFrame:
    load(spark, sf, "orders").createOrReplaceTempView("orders_q62")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, count(*) AS c,
               CAST(grouping(o_orderstatus) AS BIGINT) AS g_status,
               CAST(grouping(o_orderpriority) AS BIGINT) AS g_prio
        FROM orders_q62
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
        """
    )


# q63: deterministic hash sampling — the scale path for sampling 100 TB
# reproducibly across engines and runs (TABLESAMPLE is seed- and
# engine-dependent; a key-hash predicate is not). First hex nibble of
# md5(key) = '0' selects a stable ~1/16 sample; the predicate is a
# cheap per-row expression that pipelines inside the scan stage with
# no shuffle at all.
@query(
    "q63_hash_sample",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) = '0'
    """,
    doc="deterministic md5-bucket sampling (reproducible TABLESAMPLE)",
    tags=("olap",),
)
def q63(spark: SparkSession, sf: str) -> DataFrame:
    return (
        load(spark, sf, "orders")
        .filter(F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 1) == "0")
        .select("o_orderkey", "o_totalprice")
    )


# q64: ordered string aggregation (listagg/string_agg) — Spark's
# collect_list is order-nondeterministic, so the deterministic form is
# array_sort before array_join; oracle uses string_agg(... ORDER BY).
@query(
    "q64_string_agg",
    oracle="""
    SELECT r_name, string_agg(n_name, ',' ORDER BY n_name) AS nations,
           count(*) AS n
    FROM nation JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
    doc="ordered listagg via array_sort+array_join (deterministic)",
    tags=("olap",),
)
def q64(spark: SparkSession, sf: str) -> DataFrame:
    n = load(spark, sf, "nation")
    r = load(spark, sf, "region")
    return (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias("nations"),
            F.count("*").alias("n"),
        )
    )


# q65: analytic-window extras — ntile, dense_rank, percent_rank,
# cume_dist, first_value over one shared (partition, order) spec, so
# Spark evaluates all five in a single Window exec over one shuffle.
# percent_rank/cume_dist are exact small-integer ratios, identical
# doubles in both engines.
@query(
    "q65_window_extras",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(ntile(4) OVER w AS BIGINT) AS tile,
           CAST(dense_rank() OVER w AS BIGINT) AS dr,
           percent_rank() OVER w AS pr,
           cume_dist() OVER w AS cd,
           first_value(o_orderkey) OVER w AS first_ok
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    """,
    doc="ntile/dense_rank/percent_rank/cume_dist/first_value, one window",
    tags=("olap",),
)
def q65(spark: SparkSession, sf: str) -> DataFrame:
    w = W.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return load(spark, sf, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.ntile(4).over(w).cast("long").alias("tile"),
        F.dense_rank().over(w).cast("long").alias("dr"),
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
        F.first("o_orderkey").over(w).alias("first_ok"),
    )


# q48: range join — events matched to overlapping value bands via
# bucketized equi-join (operators/asof.range_join_buckets); the oracle
# is the plain inequality join DuckDB can afford at this scale.
@query(
    "q48_range_join",
    oracle="""
    WITH bands AS (SELECT g AS band_id, g * 50.0 AS lo, g * 50.0 + 74.99 AS hi
                   FROM range(0, 10) t(g))
    SELECT e.event_id, b.band_id
    FROM events e JOIN bands b ON e.value >= b.lo AND e.value <= b.hi
    """,
    doc="range join via bucketized equi-join + residual filter",
    tags=("olap", "range"),
)
def q48(spark: SparkSession, sf: str) -> DataFrame:
    ev = load(spark, sf, "events").select("event_id", "value")
    # single-slice range: 10 rows over a cores-wide Range would schedule
    # defaultParallelism near-empty tasks to build the broadcast (r16)
    bands = spark.range(0, 10, 1, 1).select(
        F.col("id").alias("band_id"),
        (F.col("id") * 50.0).alias("lo"),
        (F.col("id") * 50.0 + 74.99).alias("hi"),
    )
    out = range_join_buckets(ev, bands, "value", "lo", "hi", bucket_width=50.0)
    return out.select("event_id", "band_id")


# q69: hopping (sliding) time windows — 1-hour windows every 30
# minutes, each event contributing to exactly duration/slide = 2
# windows. Spark's window() generates the assignments as an Expand-like
# projection before one map-side-combined agg; the oracle replays the
# same assignment arithmetic with an explicit range(2) cross join on
# integer microsecond slots.
@query(
    "q69_hopping_window",
    oracle="""
    SELECT make_timestamp(s * 1800000000) AS ws,
           make_timestamp(s * 1800000000 + 3600000000) AS we,
           event_type, count(*) AS n,
           CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) / 100 AS sum_value
    FROM (SELECT *, (epoch_us(ts) // 1800000000) - k.i AS s
          FROM events, range(2) k(i))
    GROUP BY 1, 2, 3
    """,
    doc="hopping 1h/30min windows: per-type counts + exact sums",
    tags=("olap", "timeseries"),
)
def q69(spark: SparkSession, sf: str) -> DataFrame:
    from .relational import cents

    return (
        load(spark, sf, "events")
        .groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            (F.sum(cents("value")) / 100).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("ws"),
            F.col("w.end").alias("we"),
            "event_type",
            "n",
            "sum_value",
        )
    )


# q87: full outer join — the one join type the declared surface lacked
# (inner q03, left q05, semi q06, anti q07, asof q47, range q48). Both
# sides are filtered so each contributes exclusive keys: parts with
# size > 40 that never shipped a qty-50 line (left-only), qty-50 lines
# whose part is size <= 40 (right-only), and the overlap. The lineitem
# side pre-aggregates to one row per part before the join — at scale
# the full-outer shuffle then carries one row per key per side, not
# the fact table.
@query(
    "q87_full_outer_join",
    oracle="""
    WITH p AS (SELECT p_partkey, p_size FROM part WHERE p_size > 40),
         l AS (SELECT l_partkey, count(*) AS n_li
               FROM lineitem WHERE l_quantity > 49 GROUP BY l_partkey)
    SELECT coalesce(p.p_partkey, l.l_partkey) AS partkey,
           p.p_size AS p_size, l.n_li AS n_li
    FROM p FULL OUTER JOIN l ON p.p_partkey = l.l_partkey
    ORDER BY partkey
    """,
    doc="full outer join with exclusive keys on both sides, "
    "right side pre-aggregated per key",
    tags=("olap", "join"),
)
def q87(spark: SparkSession, sf: str) -> DataFrame:
    p = load(spark, sf, "part").where(F.col("p_size") > 40).select("p_partkey", "p_size")
    li = (
        load(spark, sf, "lineitem")
        .where(F.col("l_quantity") > 49)
        .groupBy("l_partkey")
        .agg(F.count("*").alias("n_li"))
    )
    return (
        p.join(li, p.p_partkey == li.l_partkey, "full_outer")
        .select(
            F.coalesce("p_partkey", "l_partkey").alias("partkey"),
            "p_size",
            "n_li",
        )
        .orderBy("partkey")
    )
