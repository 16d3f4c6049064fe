"""Celebrity-key skew stress for the union-merge as-of joins (VERDICT
r7 "Next round" #5 — the PIT-join skew finding applied to the other
window-shaped plans). There is NO join in this plan for AQE's
OptimizeSkewedJoin to split — the union-merge as-of is a single window
whose hot key lands on one task — so ``salt=R`` is the only lever:
probes hash-spread over R window partitions, the right side replicates
into every partition, and the carry stays exact. These tests prove the
salted result is oracle-identical (DuckDB native ASOF JOIN) and that
the salt genuinely spreads the hot key."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from kassette_server_spark.operators.asof import (
    asof_join_backward,
    asof_join_forward,
)


def _skewed_inputs(spark):
    """100 normal keys vs one celebrity key carrying 50x the probes and
    20x the right-side events."""
    normal_l = spark.range(100 * 8).select(
        F.concat(F.lit("k"), (F.col("id") % 100)).alias("k"),
        ((F.col("id") % 11) * 13 + 7).alias("t"),
        F.col("id").alias("probe_id"),
    )
    hot_l = spark.range(40_000).select(
        F.lit("hot").alias("k"),
        (F.col("id") % 997).alias("t"),
        (F.col("id") + 1_000_000).alias("probe_id"),
    )
    left = normal_l.unionByName(hot_l)

    normal_r = spark.range(100 * 5).select(
        F.concat(F.lit("k"), (F.col("id") % 100)).alias("k"),
        ((F.col("id") / 100).cast("long") * 25).alias("rt"),
        F.concat(F.lit("p"), F.col("id")).alias("payload"),
    )
    hot_r = spark.range(100).select(
        F.lit("hot").alias("k"),
        (F.col("id") * 10).alias("rt"),
        F.concat(F.lit("hp"), F.col("id")).alias("payload"),
    )
    right = normal_r.unionByName(hot_r)
    return left, right


def _oracle(left_pd: pd.DataFrame, right_pd: pd.DataFrame, direction: str) -> pd.DataFrame:
    op = ">=" if direction == "backward" else "<="
    con = duckdb.connect()
    try:
        con.register("lt", left_pd)
        con.register("rt_t", right_pd)
        return con.execute(
            f"""
            SELECT l.k, l.t, l.probe_id, r.rt, r.payload
            FROM lt l ASOF LEFT JOIN rt_t r
              ON l.k = r.k AND l.t {op} r.rt
            """
        ).fetch_df()
    finally:
        con.close()


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype) == "object":
            df[c] = df[c].map(lambda v: "" if v is None else str(v))
        else:
            df[c] = df[c].astype("float64")  # rt is NULLable long
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_asof_celebrity_key_salted_matches_oracle(spark, direction):
    left, right = _skewed_inputs(spark)
    want = _norm(_oracle(left.toPandas(), right.toPandas(), direction))

    fn = asof_join_backward if direction == "backward" else asof_join_forward
    unsalted = fn(left, right, "k", "t", "rt", ["rt", "payload"])
    got = _norm(unsalted.toPandas())
    pd.testing.assert_frame_equal(got, want, check_dtype=False)

    salted = fn(left, right, "k", "t", "rt", ["rt", "payload"], salt=8)
    got_s = _norm(salted.toPandas())
    plan = salted._jdf.queryExecution().executedPlan().toString()
    assert "_salt" in plan, "salted plan must window on (key, _salt)"
    pd.testing.assert_frame_equal(got_s, want, check_dtype=False)


def test_asof_salt_spreads_hot_probes(spark):
    left, _ = _skewed_inputs(spark)
    salted = left.withColumn(
        "_salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(8)).cast("int"),
    )
    n = salted.filter(F.col("k") == "hot").select("_salt").distinct().count()
    assert n == 8


def test_asof_salt_reserved_column(spark):
    left, right = _skewed_inputs(spark)
    with pytest.raises(ValueError, match="_salt"):
        asof_join_backward(
            left.withColumn("_salt", F.lit(1)), right, "k", "t", "rt", ["payload"], salt=4
        )


def test_asof_forward_tolerance_salted(spark):
    """The tolerance null-out must survive salting (the matched right
    TIME rides in the same salted window)."""
    left, right = _skewed_inputs(spark)
    plain = asof_join_forward(
        left, right, "k", "t", "rt", ["rt", "payload"], tolerance_us=40
    )
    salted = asof_join_forward(
        left, right, "k", "t", "rt", ["rt", "payload"], tolerance_us=40, salt=8
    )
    pd.testing.assert_frame_equal(
        _norm(plain.toPandas()), _norm(salted.toPandas()), check_dtype=False
    )
