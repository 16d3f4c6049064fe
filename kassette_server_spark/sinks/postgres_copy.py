"""K3 Postgres delivery via COPY FROM STDIN — the bulk path.

The reference inserts row-at-a-time inside a batch transaction
(integrations/postgres/main.go:108-151); its own docs call Postgres the
most-used destination. At 100 TB the scalable ingest is COPY, driven
from every executor in parallel: each partition opens one ``psql``
process and STREAMS CSV into ``COPY <table> FROM STDIN`` — no JDBC jar
needed, no driver-side materialization, memory bounded per partition
(rows are piped, never buffered whole), and Postgres applies each
partition's stream as one transaction.

Semantics vs the JDBC writer (sinks/jdbc.py): identical commit
boundary. Spark's JDBC sink also commits per partition, so a retried
task can duplicate rows under either path — the standard mitigations
(idempotent PK + ON CONFLICT, or staging tables swapped by the driver)
apply equally and are out of scope here, exactly as they are for
``df.write.format("jdbc")``.

This is one of the repo's rare deliberate RDD uses: per-partition
imperative streaming into an external process is exactly the case the
DataFrame API cannot express (foreachPartition/mapPartitions is the
sanctioned escape hatch). The rows themselves never transit Python
row-at-a-time anywhere else in the sink path.

Executed for real in CI: tests/test_real_postgres.py boots a local
PostgreSQL 15 server and round-trips data through this path, including
quoting/NULL edge cases. ``psql`` must be on executor PATH — true on
any node with the Postgres client installed.

CSV encoding: Postgres CSV mode. NULL is the UNQUOTED empty string, so
non-null values are always quoted (QUOTE_ALL) to keep '' distinct
from NULL. Values go through Python ``str()`` — right for
text/int/float/bool/date/timestamp (Postgres parses all of their
canonical Python renderings, including 'True'/'False' booleans);
cast binary/array/struct columns to text/json in the frame first.
"""

from __future__ import annotations

import csv
import io
import subprocess
from collections.abc import Iterator

from pyspark.sql import DataFrame


def _csv_field(v) -> str:
    """One non-null value, CSV-quoted (embedded quotes/commas/newlines
    per the RFC dialect Postgres speaks)."""
    s = io.StringIO()
    csv.writer(s, quoting=csv.QUOTE_ALL, lineterminator="").writerow([v])
    return s.getvalue()


def _copy_partition(
    rows: Iterator, columns: list[str], table: str, psql_args: list[str]
) -> Iterator[int]:
    proc: subprocess.Popen | None = None
    n = 0
    collist = ", ".join(columns)
    for r in rows:
        if proc is None:  # lazily spawn: empty partitions cost nothing
            proc = subprocess.Popen(
                [*psql_args, "-v", "ON_ERROR_STOP=1", "-X", "-c",
                 f"COPY {table} ({collist}) FROM STDIN WITH (FORMAT csv)"],
                stdin=subprocess.PIPE, stdout=subprocess.DEVNULL,
                stderr=subprocess.PIPE, text=True,
            )
        line = ",".join(
            "" if v is None else _csv_field(v) for v in (r[c] for c in columns)
        )
        proc.stdin.write(line + "\n")
        n += 1
    if proc is None:
        return iter([0])
    proc.stdin.close()
    err = proc.stderr.read()
    if proc.wait() != 0:
        raise RuntimeError(f"COPY failed: {err.strip()[:500]}")
    return iter([n])


def write_postgres_copy(
    df: DataFrame,
    table: str,
    psql_args: list[str],
) -> int:
    """Stream ``df`` into ``table`` via one COPY per partition, in
    parallel across executors. ``psql_args`` is the connection prefix
    (e.g. ``["psql", "-h", host, "-p", "5432", "-U", user, dbname]``).
    Returns the number of rows written (sum of per-partition counts —
    no driver materialization of the data)."""
    columns = df.columns
    counts = df.rdd.mapPartitions(
        lambda it: _copy_partition(it, columns, table, psql_args)
    ).collect()
    return sum(counts)


def psql_args_from_dest(dest) -> list[str]:
    """Build the psql connection prefix from a K3 DestinationConfig,
    honoring the same config keys the reference's Connect reads
    (integrations/postgres/main.go:76: host, port, user, database;
    password travels via PGPASSWORD in the executor environment — set
    it there, never on a command line)."""
    c = dest.config
    args = ["psql"]
    if c.get("host"):
        args += ["-h", str(c["host"])]
    if c.get("port"):
        args += ["-p", str(c["port"])]
    if c.get("user"):
        args += ["-U", str(c["user"])]
    args.append(str(c.get("database", "postgres")))
    return args


def write_postgres_copy_dest(df: DataFrame, dest) -> int:
    """K3 delivery through the COPY bulk path, config-driven like
    write_jdbc: table from the destination schema, connection from the
    destination config."""
    return write_postgres_copy(df, dest.schema.table_name, psql_args_from_dest(dest))
