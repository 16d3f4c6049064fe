"""Table catalog over the driver's parquet test tables.

``load(spark, sf_dir, name)`` returns the DataFrame for one table;
``register(spark, sf_dir)`` registers all of them as temp views so
queries can be phrased in SQL. Reads are plain columnar parquet scans —
Catalyst pushes filters/projections into the scan (verify with
``df.explain('formatted')`` → PushedFilters / ReadSchema).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


# Timestamp columns whose physical parquet type has varied across
# driver data generations: TIMESTAMP(NANOS) (readable only as LongType
# via spark.sql.legacy.parquet.nanosAsLong) and TIMESTAMP(MICROS)
# without UTC adjustment (read as TIMESTAMP_NTZ). Normalize every
# generation to session-zoned TimestampType so downstream queries and
# the DuckDB oracle (naive timestamps, UTC session) agree:
# - long epoch-nanos → integer-divide to micros (double math loses
#   precision above 2^53), matching DuckDB's nanos→micros truncation;
# - TIMESTAMP_NTZ → reinterpret in the UTC session zone (same wall
#   clock, so values collected by the driver compare equal).
_TS_COLUMNS: dict[str, tuple[str, ...]] = {"events": ("ts",)}


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    ts_cols = _TS_COLUMNS.get(name, ())
    if ts_cols:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(table_path(sf_dir, name))
    for c in ts_cols:
        dtype = dict(df.dtypes).get(c)
        if dtype == "bigint":
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` DIV 1000")))
        elif dtype is not None and dtype != "timestamp":
            # timestamp_ntz (or date): cast interprets the naive value in
            # the session time zone (UTC) — no instant shift.
            df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def register(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view named after itself."""
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
