"""JDBC destination (K3 Postgres) + warehouse DDL (K8 Azure Synapse).

The reference creates (and on schema change drops & recreates) the
destination table from the config schema at connect time
(integrations/postgres/main.go:32-67), then appends rows
transactionally (main.go:69-106). Spark equivalent: DDL rendered from
the same Schema, writes via ``df.write.format("jdbc")`` with
``batchsize`` (the COPY analogue). Execution evidence in CI:

- the full writer path (driver load, DDL, batched inserts, read-back)
  runs against embedded Derby (tests/test_jdbc_roundtrip.py), and
  against real Postgres wherever $KASSETTE_PG_URL plus the
  org.postgresql driver jar exist;
- the POSTGRES DIALECT — both DDL renderers, the reference's insert
  shape and transaction semantics, its schema-change drop/recreate —
  executes against a throwaway REAL PostgreSQL 15 server booted
  locally per test run (tests/test_real_postgres.py; this container
  ships the server binaries but no JDBC jar and no network);
- a real DISTRIBUTED write also executes in CI: the COPY-per-partition
  bulk path (sinks/postgres_copy.py) round-trips against that server —
  the scale-preferred ingest whenever the psql client is on executors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..config import DestinationConfig, Schema

# kassette → postgres DDL types (integrations/postgres/main.go:50-59
# renders VARCHAR as VARCHAR(255); SERIAL/BIGSERIAL are identity cols)
_PG_DDL_TYPES = {
    "INT": "INT",
    "FLOAT": "DOUBLE PRECISION",
    "BOOLEAN": "BOOLEAN",
    "SERIAL": "SERIAL",
    "BIGSERIAL": "BIGSERIAL",
    "VARCHAR": "VARCHAR(255)",
    "TEXT": "TEXT",
    "JSONB": "JSONB",
    "TIMESTAMP": "TIMESTAMP",
}

# kassette/warehouse → MSSQL (destinations/azure-synapse.go:31-63:
# float → decimal(28,10), datetime → datetimeoffset, etc.)
_SYNAPSE_DDL_TYPES = {
    "string": "nvarchar(512)",
    "boolean": "bit",
    "int": "int",
    "bigint": "bigint",
    "float": "decimal(28,10)",
    "json": "nvarchar(max)",
    "text": "nvarchar(max)",
    "datetime": "datetimeoffset",
}


def render_postgres_ddl(schema: Schema, table_schema: str = "public") -> str:
    """Engine-preferred Postgres DDL: quoted identifiers, schema
    qualification, and a table-level PRIMARY KEY constraint (valid for
    composite keys, which the reference's inline form is not)."""
    cols = []
    pks = []
    for f in schema.fields:
        cols.append(f'"{f.name}" {_PG_DDL_TYPES.get(f.type, "TEXT")}')
        if f.primary_key:
            pks.append(f'"{f.name}"')
    if pks:
        cols.append(f"PRIMARY KEY ({', '.join(pks)})")
    return (
        f'CREATE TABLE IF NOT EXISTS {table_schema}."{schema.table_name}" (\n  '
        + ",\n  ".join(cols)
        + "\n)"
    )


def render_postgres_ddl_reference(schema: Schema) -> str:
    """Byte-for-byte the DDL the reference's Postgres destination
    executes at connect time (integrations/postgres/main.go:49-62):
    the kassette type name is used RAW as the Postgres column type
    (FLOAT/TEXT/JSONB/TIMESTAMP/SERIAL are all valid Postgres type
    names; VARCHAR gets "(255)" appended), identifiers are unquoted,
    PRIMARY KEY is rendered inline per field, columns join on a bare
    comma, and the statement ends with a semicolon. Locked by a golden
    test so dialect drift against the reference is caught in CI.

    Quirk preserved deliberately: two primary-key fields render two
    inline PRIMARY KEY clauses — invalid Postgres, exactly as the
    reference would emit (it has no composite-key guard). Use
    :func:`render_postgres_ddl` for new deployments.
    """
    defs = []
    for f in schema.fields:
        d = f"{f.name} {f.type}"
        if f.type == "VARCHAR":
            d += "(255)"
        if f.primary_key:
            d += " PRIMARY KEY"
        defs.append(d)
    return f"CREATE TABLE IF NOT EXISTS {schema.table_name} ({','.join(defs)});"


def render_synapse_ddl(schema: Schema, warehouse_types: dict[str, str], db_schema: str) -> str:
    cols = ", ".join(
        f"[{f.name}] {_SYNAPSE_DDL_TYPES.get(warehouse_types.get(f.type, f.type), 'nvarchar(512)')}"
        for f in schema.fields
    )
    return f"CREATE TABLE [{db_schema}].[{schema.table_name}] ({cols})"


def jdbc_write_options(dest: DestinationConfig, batch_size: int = 10000) -> dict[str, str]:
    """Options for df.write.format('jdbc') — batchsize is the bulk-COPY
    analogue; isolation level mirrors the reference's per-batch
    transaction (InsertPayloadInTransaction)."""
    c = dest.config
    db_schema = c.get("schema", "public")
    dbtable = f"{db_schema}.{dest.schema.table_name}" if db_schema else dest.schema.table_name
    opts = {
        "url": c.get("jdbc_url", f"jdbc:postgresql://{c.get('host','localhost')}:{c.get('port',5432)}/{c.get('database','')}"),
        "dbtable": dbtable,
        "user": c.get("user", ""),
        "password": c.get("password", ""),
        "driver": c.get("driver", "org.postgresql.Driver"),
        "batchsize": str(batch_size),
        "isolationLevel": "READ_COMMITTED",
    }
    return opts


def write_jdbc(df: DataFrame, dest: DestinationConfig, mode: str = "append") -> None:
    """K3 delivery over any JDBC driver on the classpath (Postgres in
    production; the embedded Derby that ships with Spark proves the
    executed path in tests — see tests/test_jdbc_roundtrip.py)."""
    (df.write.format("jdbc").options(**jdbc_write_options(dest)).mode(mode).save())
