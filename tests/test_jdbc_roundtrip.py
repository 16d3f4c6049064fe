"""K3 JDBC delivery executed against a REAL database: Spark ships an
embedded Derby, so the write path (driver load, DDL, batched inserts,
isolation) and a read-back verification run end to end — the
production difference is only the url/driver pair in the destination
config (org.postgresql.Driver)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kassette_server_spark.config import DestinationConfig, Schema, SchemaField
from kassette_server_spark.sinks.jdbc import (
    jdbc_write_options,
    render_postgres_ddl,
    render_postgres_ddl_reference,
    write_jdbc,
)


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


# The destination schema seeded by the reference's own docker-compose
# example (examples/camunda2postgres/sql/my_camunda2postgres.sql:175),
# unescaped — the most-used real K3 config in the wild.
_CAMUNDA_EVENTLOG_SCHEMA_JSON = (
    '{"table_name":"eventlog", "schema_fields":['
    '{"name":"event_id","type":"VARCHAR","mode":"view","primary_key":false},'
    '{"name":"process_instance","type":"VARCHAR","mode":"view","primary_key":false},'
    '{"name":"task_name","type":"VARCHAR","mode":"view","primary_key":false},'
    '{"name":"task_type","type":"VARCHAR","mode":"view","primary_key":false},'
    '{"name":"task_seq","type":"BIGSERIAL","mode":"view","primary_key":false},'
    '{"name":"process_id","type":"VARCHAR","mode":"view","primary_key":false},'
    '{"name":"process_name","type":"VARCHAR","mode":"view","primary_key":false},'
    '{"name":"assignee","type":"VARCHAR","mode":"view","primary_key":false},'
    '{"name":"task_start_time","type":"TIMESTAMP","mode":"view","primary_key":false},'
    '{"name":"task_end_time","type":"TIMESTAMP","mode":"view","primary_key":false},'
    '{"name":"task_duration","type":"INT","mode":"view","primary_key":false},'
    '{"name":"business_key","type":"VARCHAR","mode":"view","primary_key":false}]}'
)


def test_postgres_ddl_reference_golden():
    """Dialect parity with the reference's connect-time DDL
    (integrations/postgres/main.go:49-62): kassette types used raw,
    VARCHAR(255), unquoted identifiers, comma-joined, semicolon —
    byte-for-byte on the reference's own example schema."""
    schema = Schema.from_json(_CAMUNDA_EVENTLOG_SCHEMA_JSON)
    assert render_postgres_ddl_reference(schema) == (
        "CREATE TABLE IF NOT EXISTS eventlog ("
        "event_id VARCHAR(255),"
        "process_instance VARCHAR(255),"
        "task_name VARCHAR(255),"
        "task_type VARCHAR(255),"
        "task_seq BIGSERIAL,"
        "process_id VARCHAR(255),"
        "process_name VARCHAR(255),"
        "assignee VARCHAR(255),"
        "task_start_time TIMESTAMP,"
        "task_end_time TIMESTAMP,"
        "task_duration INT,"
        "business_key VARCHAR(255));"
    )


def test_postgres_ddl_reference_inline_primary_key():
    """Inline per-field PRIMARY KEY and the raw FLOAT/JSONB type names
    (all §1.2 rows), exactly as the reference emits them."""
    schema = Schema(
        "jobs",
        (
            SchemaField("id", "SERIAL", primary_key=True),
            SchemaField("score", "FLOAT"),
            SchemaField("payload", "JSONB"),
            SchemaField("note", "TEXT"),
            SchemaField("ok", "BOOLEAN"),
        ),
    )
    assert render_postgres_ddl_reference(schema) == (
        "CREATE TABLE IF NOT EXISTS jobs ("
        "id SERIAL PRIMARY KEY,"
        "score FLOAT,"
        "payload JSONB,"
        "note TEXT,"
        "ok BOOLEAN);"
    )


def test_postgres_ddl_engine_variant_quotes_and_composite_pk():
    """The engine-preferred renderer fixes the reference's composite-PK
    quirk with a table-level constraint and quotes identifiers."""
    schema = Schema(
        "ledger",
        (
            SchemaField("job_id", "INT", primary_key=True),
            SchemaField("attempt", "INT", primary_key=True),
            SchemaField("state", "VARCHAR"),
        ),
    )
    ddl = render_postgres_ddl(schema)
    assert 'PRIMARY KEY ("job_id", "attempt")' in ddl
    assert ddl.count("PRIMARY KEY") == 1
    assert '"state" VARCHAR(255)' in ddl
