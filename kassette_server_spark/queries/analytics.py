"""Event-analytics queries (q75–q76): ordered funnel and weekly
cohort retention over the events table (operators/funnel.py) — the
canonical CDP questions over the reference's landed event stream.

Registered after the core surface (overflow positions; hard signal
from the local both-scale oracle-parity suites)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..catalog import load
from ..operators.funnel import funnel, retention_cohorts
from .base import query


@query(
    "q75_funnel",
    oracle="""
    WITH ev AS (SELECT user_id, event_type AS et, ts FROM events),
    s1 AS (SELECT user_id, min(CASE WHEN et = 'view' THEN ts END) AS t_view
           FROM ev GROUP BY user_id),
    s2 AS (SELECT ev.user_id, min(ts) AS t_click
           FROM ev JOIN s1 USING (user_id)
           WHERE et = 'click' AND ts > t_view GROUP BY ev.user_id),
    s3 AS (SELECT ev.user_id, min(ts) AS t_purchase
           FROM ev JOIN s2 USING (user_id)
           WHERE et = 'purchase' AND ts > t_click GROUP BY ev.user_id)
    SELECT s1.user_id, t_view, t_click, t_purchase,
           CAST((t_view IS NOT NULL)::BIGINT + (t_click IS NOT NULL)::BIGINT
                + (t_purchase IS NOT NULL)::BIGINT AS BIGINT) AS depth
    FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)
    """,
    doc="strictly-ordered view->click->purchase funnel: first-completion "
    "times per step, all shuffles co-partitioned on user_id",
    tags=("analytics", "events"),
)
def q_funnel(spark: SparkSession, sf: str) -> DataFrame:
    return funnel(load(spark, sf, "events"))


@query(
    "q77_quantized_ann",
    oracle="""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    m AS (SELECT vec_id, v,
                 list_reduce(list_transform(v, x -> abs(x)), (a, x) -> greatest(a, x)) AS mx
          FROM e),
    qz AS (SELECT vec_id,
                  list_transform(v, x -> CAST(round(x * 127 / mx) AS BIGINT)) AS qv
           FROM m),
    n AS (SELECT vec_id, qv,
                 sqrt(CAST(list_reduce(list_transform(qv, x -> x * x), (a, x) -> a + x) AS DOUBLE)) AS qn
          FROM qz),
    q AS (SELECT vec_id AS query_id, qv AS qqv, qn AS qqn FROM n WHERE vec_id % 100 = 0),
    scored AS (
      SELECT query_id, n.vec_id AS neighbor_id,
             CAST(list_reduce(list_transform(list_zip(qqv, n.qv), x -> x[1] * x[2]),
                              (a, x) -> a + x) AS DOUBLE) / (qqn * n.qn) AS qcos
      FROM n CROSS JOIN q WHERE n.vec_id <> query_id)
    SELECT query_id, neighbor_id, qcos, CAST(rk AS BIGINT) AS rank FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY qcos DESC, neighbor_id) AS rk
      FROM scored) t
    WHERE rk <= 10
    """,
    doc="int8 scalar-quantized cosine top-10 (4x less scan IO at "
    "100 TB; integer dot/norms are exact, score bit-portable)",
    tags=("llmops", "similarity"),
)
def q_quantized_ann(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import functions as F

    from ..operators.similarity import quantized_topk

    e = load(spark, sf, "embeddings")
    return quantized_topk(e, e.filter(F.col("vec_id") % 100 == 0), k=10)


@query(
    "q76_retention_cohorts",
    oracle="""
    WITH ev AS (SELECT user_id, ts FROM events),
    first AS (SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
              FROM ev GROUP BY user_id),
    active AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS week FROM ev)
    SELECT cohort_week,
           CAST(date_diff('day', cohort_week, week) // 7 AS BIGINT) AS week_offset,
           count(DISTINCT user_id) AS n_users
    FROM active JOIN first USING (user_id)
    GROUP BY 1, 2
    """,
    doc="weekly cohort retention: first-seen week x activity-week "
    "distinct-user counts",
    tags=("analytics", "events"),
)
def q_retention(spark: SparkSession, sf: str) -> DataFrame:
    return retention_cohorts(load(spark, sf, "events"))


_DOT = "list_reduce(list_transform(list_zip({a}, {b}), x -> x[1]*x[2]), (acc, x) -> acc + x)"
_NORM = "sqrt(list_reduce(list_transform({a}, x -> x*x), (acc, x) -> acc + x))"


@query(
    "q83_semantic_dedup",
    oracle=f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    n AS (SELECT vec_id, v, {_NORM.format(a='v')} AS vn FROM e),
    c AS (SELECT vec_id AS centroid_id, v AS cv, vn AS cn FROM n WHERE vec_id % 50 = 0),
    assign AS (
      SELECT vec_id, centroid_id, vv, vn FROM (
        SELECT n.vec_id, c.centroid_id, n.v AS vv, n.vn,
               row_number() OVER (PARTITION BY n.vec_id
                 ORDER BY {_DOT.format(a='n.v', b='c.cv')} / (n.vn * c.cn) DESC, c.centroid_id) AS rn
        FROM n, c) t WHERE rn = 1),
    dup AS (
      SELECT b.vec_id AS vec_id, min(a.vec_id) AS dup_of
      FROM assign a JOIN assign b USING (centroid_id)
      WHERE a.vec_id < b.vec_id
        AND {_DOT.format(a='a.vv', b='b.vv')} / (a.vn * b.vn) >= 0.45
      GROUP BY b.vec_id)
    SELECT s.vec_id, s.centroid_id, d.dup_of, d.dup_of IS NULL AS keep
    FROM assign s LEFT JOIN dup d USING (vec_id)
    """,
    doc="SemDeDup: IVF-cell-scoped cosine dedup (self-join on "
    "centroid_id => work is sum(cell^2), never corpus^2; keeper = "
    "min-id neighborhood representative)",
    tags=("llmops", "similarity"),
)
def q_semantic_dedup(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import functions as F

    from ..operators.similarity import semantic_dedup

    e = load(spark, sf, "embeddings")
    return semantic_dedup(e, centroids=e.filter(F.col("vec_id") % 50 == 0), threshold=0.45)
