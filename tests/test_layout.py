"""Layout operators: bucketed shuffle-free joins and salted skew joins."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from conftest import SF_SMOKE

from kassette_server_spark.catalog import load
from kassette_server_spark.operators.layout import (
    bucketed_join,
    ensure_scan_parallelism,
    salted_join,
    write_bucketed,
)


def _explain(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_join_skips_shuffle(spark, tmp_path):
    # session warehouse dir is set in conftest (static conf)
    spark.sql("CREATE DATABASE IF NOT EXISTS buckets")
    c = load(spark, SF_SMOKE, "customer").select("c_custkey", "c_name")
    o = load(spark, SF_SMOKE, "orders").select("o_custkey", "o_orderkey")
    write_bucketed(c, "buckets.cust_b", "c_custkey", 4)
    write_bucketed(o, "buckets.ord_b", "o_custkey", 4)
    joined = bucketed_join(spark, "buckets.cust_b", "buckets.ord_b", "c_custkey", "o_custkey")
    plan = _explain(joined)
    # both sides read bucket-aligned: the join has NO shuffle exchange
    assert "Exchange hashpartitioning" not in plan
    # result identical to the plain join
    plain = c.join(o, c.c_custkey == o.o_custkey)
    assert joined.count() == plain.count()


def test_salted_join_matches_plain_join(spark):
    ev = load(spark, SF_SMOKE, "events").select("event_id", "user_id")
    dims = (
        load(spark, SF_SMOKE, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("user_total"))
    )
    plain = ev.join(dims, "user_id").select("event_id", "user_total")
    salted = salted_join(ev, dims, "user_id", salt_buckets=4).select("event_id", "user_total")
    a = sorted((r.event_id, r.user_total) for r in plain.collect())
    b = sorted((r.event_id, r.user_total) for r in salted.collect())
    assert a == b


def test_ensure_scan_parallelism_fans_out_single_split(spark):
    """A one-file scan must fan out to >= defaultParallelism partitions
    ahead of CPU-heavy map work; an already-wide input is untouched."""
    docs = load(spark, SF_SMOKE, "documents").select("doc_id", "text")
    fanned = ensure_scan_parallelism(docs)
    assert fanned.rdd.getNumPartitions() >= min(
        spark.sparkContext.defaultParallelism, 2
    )
    # enough splits for the target: identity, no repartition inserted
    assert ensure_scan_parallelism(docs, min_partitions=1) is docs


def test_ensure_scan_parallelism_passes_streams_through(spark):
    """Streaming DataFrames have no RDD view — the helper must be an
    identity on them, not raise AnalysisException (ADVICE r4)."""
    stream = spark.readStream.format("rate").load()
    assert ensure_scan_parallelism(stream) is stream


def test_ensure_scan_parallelism_handles_in_memory_relations(spark):
    """Non-file-backed plans (inputFiles() empty) fall back safely."""
    local = spark.createDataFrame([(i,) for i in range(10)], "x long")
    out = ensure_scan_parallelism(local, min_partitions=4)
    assert out.rdd.getNumPartitions() >= 4
