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

Process hygiene (round-6 review findings, fixed here): psql's stderr
goes to a temp FILE, not a pipe — an undrained stderr pipe can fill
and deadlock the stream mid-partition — and a psql that dies early
(bad table, type mismatch) surfaces its ACTUAL Postgres error: the
write loop catches the resulting BrokenPipeError and falls through to
the stderr report instead of failing with an opaque pipe error.
Identifiers are double-quoted (escaped) in the COPY statement, so
mixed-case / reserved-word table and column names work exactly as
they do through the quoted-identifier DDL renderer, and
config-supplied names cannot inject SQL.

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
import os
import subprocess
import tempfile
from collections.abc import Iterator

from pyspark.sql import DataFrame


def quote_ident(name: str) -> str:
    """Postgres identifier quoting (doubles embedded quotes)."""
    return '"' + name.replace('"', '""') + '"'


def _copy_partition(
    rows: Iterator, columns: list[str], table: str, psql_args: list[str]
) -> Iterator[int]:
    proc: subprocess.Popen | None = None
    errfile = None
    n = 0
    collist = ", ".join(quote_ident(c) for c in columns)
    # one reusable buffer+writer per partition — a fresh StringIO per
    # field would dominate per-row cost on the bulk path
    fbuf = io.StringIO()
    fwriter = csv.writer(fbuf, quoting=csv.QUOTE_ALL, lineterminator="")

    def field(v) -> str:
        if v is None:
            return ""  # unquoted empty = NULL in Postgres CSV mode
        fbuf.seek(0)
        fbuf.truncate()
        fwriter.writerow([v])
        return fbuf.getvalue()

    broken = False
    for r in rows:
        if proc is None:  # lazily spawn: empty partitions cost nothing
            errfile = tempfile.TemporaryFile(mode="w+", encoding="utf-8")
            # encoding pinned: text=True alone would use the executor's
            # locale encoding, so a C/POSIX-locale executor raises
            # UnicodeEncodeError on any non-ASCII value mid-COPY even
            # though the data is valid UTF-8 for Postgres (ADVICE r6
            # #2). PGCLIENTENCODING makes the server side agree.
            env = dict(os.environ, PGCLIENTENCODING="UTF8")
            proc = subprocess.Popen(
                [*psql_args, "-v", "ON_ERROR_STOP=1", "-X", "-c",
                 f"COPY {quote_ident(table)} ({collist}) FROM STDIN WITH (FORMAT csv)"],
                stdin=subprocess.PIPE, stdout=subprocess.DEVNULL,
                stderr=errfile, text=True, encoding="utf-8", env=env,
            )
        try:
            proc.stdin.write(",".join(field(r[c]) for c in columns) + "\n")
        except BrokenPipeError:
            # psql died mid-stream: stop writing, report ITS error below
            broken = True
            break
        n += 1
    if proc is None:
        return iter([0])
    try:
        proc.stdin.close()
    except BrokenPipeError:
        broken = True
    rc = proc.wait()
    errfile.seek(0)
    err = errfile.read()
    errfile.close()
    if rc != 0 or broken:
        raise RuntimeError(f"COPY failed (rc={rc}): {err.strip()[:500]}")
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
