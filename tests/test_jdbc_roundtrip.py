"""K3 JDBC delivery executed against a REAL database: Spark ships an
embedded Derby, so the write path (driver load, DDL, batched inserts,
isolation) and a read-back verification run end to end — the
production difference is only the url/driver pair in the destination
config (org.postgresql.Driver)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kassette_server_spark.config import DestinationConfig, Schema, SchemaField
from kassette_server_spark.sinks.jdbc import jdbc_write_options, write_jdbc


def _dest(tmp_path) -> DestinationConfig:
    return DestinationConfig(
        id=2,
        name="derby_dest",
        dest_type="postgres",  # same K3 code path; engine is config
        schema=Schema(
            "eventlog",
            (
                SchemaField("event_id", "VARCHAR"),
                SchemaField("seq", "INT"),
                SchemaField("value", "FLOAT"),
            ),
        ),
        config={
            "jdbc_url": f"jdbc:derby:{tmp_path}/k3db;create=true",
            "driver": "org.apache.derby.iapi.jdbc.AutoloadedDriver",
            "schema": "",  # Derby default schema
        },
    )


def test_jdbc_write_and_readback(spark, tmp_path):
    dest = _dest(tmp_path)
    df = spark.range(25).select(
        F.concat(F.lit("e"), F.col("id")).alias("event_id"),
        F.col("id").cast("int").alias("seq"),
        (F.col("id") * 1.5).alias("value"),
    )
    write_jdbc(df, dest)  # creates the table and batch-inserts
    write_jdbc(df.limit(5), dest)  # append semantics

    opts = jdbc_write_options(dest)
    back = (
        spark.read.format("jdbc")
        .option("url", opts["url"])
        .option("dbtable", opts["dbtable"])
        .option("driver", opts["driver"])
        .load()
    )
    assert back.count() == 30
    assert {f.name.lower() for f in back.schema.fields} == {"event_id", "seq", "value"}
    got = {r.event_id: (r.seq, r.value) for r in back.filter(F.col("seq") < 5).distinct().collect()}
    assert got == {f"e{i}": (i, i * 1.5) for i in range(5)}


def test_jdbc_roundtrip_real_postgres(spark, tmp_path):
    """Same K3 path against a real Postgres when $KASSETTE_PG_URL is
    set (e.g. jdbc:postgresql://host:5432/db?user=u&password=p); the
    sandbox has none, so this skips cleanly here and runs wherever an
    instance exists. Only the url/driver pair differs from the Derby
    roundtrip above — which is the whole point of K3's config model."""
    import os

    import pytest

    url = os.environ.get("KASSETTE_PG_URL")
    if not url:
        pytest.skip("KASSETTE_PG_URL not set; no Postgres in this environment")
    dest = _dest(tmp_path)
    dest.config["jdbc_url"] = url
    dest.config["driver"] = "org.postgresql.Driver"
    df = spark.range(10).select(
        F.concat(F.lit("e"), F.col("id")).alias("event_id"),
        F.col("id").cast("int").alias("seq"),
        (F.col("id") * 1.5).alias("value"),
    )
    write_jdbc(df, dest)
    opts = jdbc_write_options(dest)
    back = (
        spark.read.format("jdbc")
        .option("url", opts["url"])
        .option("dbtable", opts["dbtable"])
        .option("driver", opts["driver"])
        .load()
    )
    assert back.count() >= 10
