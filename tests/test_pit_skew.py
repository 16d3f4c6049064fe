"""Celebrity-key skew stress for the point-in-time join (VERDICT r6
"Next round" #7). The stress surfaced a real limitation: the r6
docstring deferred hot keys to AQE's skew join, but AQE CANNOT split
this plan — the lead() close-out window shares the join's hash
partitioning, Catalyst reuses one Exchange for both, and
OptimizeSkewedJoin only rewrites joins whose children are bare
ENSURE_REQUIREMENTS shuffle stages. This test pins that limitation
(so a Spark version that starts splitting it will tell us) and proves
the operator's own answer: ``salt=R`` spreads the hot key over R
shuffle partitions with an oracle-identical result."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from kassette_server_spark.operators.merge import (
    point_in_time_join,
    point_in_time_oracle_sql,
)

SKEW_CONF = {
    # force the sort-merge path (a broadcast would bypass the skew
    # machinery this test is about)
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    # scale AQE's skew thresholds down to local-mode partition sizes;
    # factor/threshold semantics are unchanged, only the byte scale
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.0",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "4KB",
    "spark.sql.adaptive.coalescePartitions.minPartitionSize": "1KB",
}


@pytest.fixture()
def skew_conf(spark):
    saved = {}
    for k, v in SKEW_CONF.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, v)
    yield spark
    for k, v in saved.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def _skewed_inputs(spark):
    """200 normal keys x 4 versions vs one celebrity key x 400 versions
    (100x the median); facts concentrate on the celebrity the same way."""
    normal_v = spark.range(200 * 4).select(
        F.concat(F.lit("k"), (F.col("id") % 200)).alias("k"),
        ((F.col("id") / 200).cast("long") * 100).alias("vf"),
        F.concat(F.lit("tier"), F.col("id")).alias("tier"),
    )
    hot_v = spark.range(400).select(
        F.lit("hot").alias("k"),
        F.col("id").alias("vf"),
        F.concat(F.lit("hot-tier"), F.col("id")).alias("tier"),
    )
    versions = normal_v.unionByName(hot_v)

    normal_f = spark.range(200 * 10).select(
        F.concat(F.lit("k"), (F.col("id") % 200)).alias("k"),
        ((F.col("id") % 7) * 60 + 5).alias("ts"),
        F.col("id").alias("fact_id"),
    )
    hot_f = spark.range(4000).select(
        F.lit("hot").alias("k"),
        (F.col("id") % 500).alias("ts"),
        (F.col("id") + 1_000_000).alias("fact_id"),
    )
    facts = normal_f.unionByName(hot_f)
    return facts, versions


def _oracle(facts_pd: pd.DataFrame, versions_pd: pd.DataFrame) -> pd.DataFrame:
    con = duckdb.connect()
    try:
        con.register("facts_t", facts_pd)
        con.register("versions_t", versions_pd)
        sql = point_in_time_oracle_sql(
            "SELECT * FROM facts_t",
            "SELECT * FROM versions_t",
            ["k"],
            "ts",
            "vf",
            "f.k AS k, f.ts AS ts, f.fact_id AS fact_id, v.vf AS vf, v.tier AS tier",
        )
        return con.execute(sql).fetch_df()
    finally:
        con.close()


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype) == "object":
            df[c] = df[c].astype(str)
        else:
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_point_in_time_join_celebrity_key_salted(skew_conf):
    spark = skew_conf
    facts, versions = _skewed_inputs(spark)
    want = _norm(_oracle(facts.toPandas(), versions.toPandas()))

    # (1) pin the limitation: AQE does NOT split the unsalted plan
    # (window-pinned shuffle) — if a Spark upgrade changes this, the
    # salt path should be re-evaluated
    unsalted = point_in_time_join(facts, versions, ["k"], "ts", "vf")
    got_unsalted = _norm(unsalted.toPandas())
    plan = unsalted._jdf.queryExecution().executedPlan().toString()
    assert "AdaptiveSparkPlan" in plan
    assert "skew=true" not in plan and "skewed" not in plan.lower()
    pd.testing.assert_frame_equal(got_unsalted, want, check_dtype=False)

    # (2) the salt path: hot key spread over 8 salted shuffle keys,
    # oracle-identical result
    salted = point_in_time_join(facts, versions, ["k"], "ts", "vf", salt=8)
    got_salted = _norm(salted.toPandas())
    plan = salted._jdf.queryExecution().executedPlan().toString()
    assert "_salt" in plan, "salted plan must join on (keys, _salt)"
    pd.testing.assert_frame_equal(got_salted, want, check_dtype=False)
    assert got_salted.fact_id.is_unique

    # (3) the salt genuinely spreads the celebrity key's FACT rows
    # across shuffle keys: count distinct salts assigned to hot facts
    f_salted = facts.withColumn(
        "_salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in facts.columns]), F.lit(8)).cast("int"),
    )
    n_salts = (
        f_salted.filter(F.col("k") == "hot").select("_salt").distinct().count()
    )
    assert n_salts == 8


def test_point_in_time_join_salt_reserved_and_deterministic(spark):
    facts, versions = _skewed_inputs(spark)
    with pytest.raises(ValueError, match="_salt"):
        point_in_time_join(
            facts.withColumn("_salt", F.lit(1)), versions, ["k"], "ts", "vf", salt=4
        )
    # salting is deterministic: two runs produce identical results
    a = _norm(point_in_time_join(facts, versions, ["k"], "ts", "vf", salt=4).toPandas())
    b = _norm(point_in_time_join(facts, versions, ["k"], "ts", "vf", salt=4).toPandas())
    pd.testing.assert_frame_equal(a, b)
