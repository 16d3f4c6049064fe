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


# Columns stored as parquet TIMESTAMP(NANOS), which Spark's reader only
# accepts as LongType (spark.sql.legacy.parquet.nanosAsLong). We convert
# nanos → microsecond TimestampType with *integer* division (double math
# on epoch-nanos loses precision above 2^53), matching DuckDB's own
# nanos→micros truncation so oracle comparisons line up.
_NANOS_TS_COLUMNS: dict[str, tuple[str, ...]] = {"events": ("ts",)}


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    nanos_cols = _NANOS_TS_COLUMNS.get(name, ())
    if nanos_cols:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(table_path(sf_dir, name))
    for c in nanos_cols:
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` DIV 1000")))
    return df


def register(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view named after itself."""
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
