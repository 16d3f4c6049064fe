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


# Resolved-relation cache — the metastore role. Every
# ``spark.read.parquet`` call re-runs DataSource resolution (Hadoop
# conf construction + XML parse, path glob, footer schema inference):
# ~0.10 s per call measured on this box, identical path or not. A real
# catalog resolves a table once and hands back the relation; queries
# here re-loaded the same static tables on every build (2-4 loads per
# spec), which was pure driver latency. The cache stores the resolved
# PLAN only — every action still scans parquet from disk; no data or
# results are memoized. It lives ON the SparkSession python object (a
# different session — even one whose py4j target id collides after a
# JVM restart — never reuses another session's plans) and is keyed by
# the table path's (mtime_ns, size) stamp, so a rewritten fixture
# re-resolves exactly like Spark's own FileStatusCache expects.
_RELATION_CACHE_MAX = 256


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    path = table_path(sf_dir, name)
    try:
        st = os.stat(path)
        stamp = (st.st_mtime_ns, st.st_size)
    except OSError:
        stamp = None
    cache = getattr(spark, "_kss_relation_cache", None)
    if cache is None:
        cache = {}
        try:
            spark._kss_relation_cache = cache
        except Exception:  # exotic session proxies: skip caching
            stamp = None
    key = (os.path.abspath(path), stamp)
    if stamp is not None:
        cached = cache.get(key)
        if cached is not None:
            return cached
    ts_cols = _TS_COLUMNS.get(name, ())
    if ts_cols:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    for c in ts_cols:
        dtype = dict(df.dtypes).get(c)
        if dtype == "bigint":
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` DIV 1000")))
        elif dtype is not None and dtype != "timestamp":
            # timestamp_ntz (or date): cast interprets the naive value in
            # the session time zone (UTC) — no instant shift.
            df = df.withColumn(c, F.col(c).cast("timestamp"))
    if stamp is not None:
        if len(cache) >= _RELATION_CACHE_MAX:
            cache.clear()  # bounded; repopulates on demand
        cache[key] = df
    return df


def register(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view named after itself."""
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
