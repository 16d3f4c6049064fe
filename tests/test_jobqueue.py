"""Tests for job-queue fetch shapes (S4/S5/M1), write-key auth (M5),
config store diffing (S6), and observable counters (M4)."""

from __future__ import annotations

import hashlib
from datetime import datetime

from pyspark.sql import functions as F

from kassette_server_spark import misc
from kassette_server_spark.operators import jobqueue
from kassette_server_spark.sources.configstore import diff, parse_config

T0 = datetime(2024, 1, 1, 0, 0, 0)


def _queue(spark):
    jobs = spark.createDataFrame([(i, f"payload{i}") for i in range(1, 6)], "job_id long, payload string")
    status = spark.createDataFrame(
        [
            # job 1: failed then succeeded (terminal)
            (1, "failed", 1, datetime(2024, 1, 1, 0, 0, 1), T0),
            (1, "succeeded", 2, datetime(2024, 1, 1, 0, 0, 2), T0),
            # job 2: failed, retryable
            (2, "failed", 3, datetime(2024, 1, 1, 0, 0, 1), T0),
            # job 3: failed, retries exhausted
            (3, "failed", 10, datetime(2024, 1, 1, 0, 0, 1), T0),
            # jobs 4,5: no status at all
        ],
        "job_id long, state string, attempt int, exec_time timestamp, retry_time timestamp",
    )
    return jobs, status


def test_unprocessed_anti_join(spark):
    jobs, status = _queue(spark)
    assert [r.job_id for r in jobqueue.unprocessed(jobs, status).collect()] == [4, 5]
    assert [r.job_id for r in jobqueue.unprocessed(jobs, status, count=1).collect()] == [4]


def test_latest_state_and_by_state(spark):
    jobs, status = _queue(spark)
    latest = {r.job_id: (r.state, r.attempt) for r in jobqueue.latest_status(status).collect()}
    assert latest == {1: ("succeeded", 2), 2: ("failed", 3), 3: ("failed", 10)}
    assert [r.job_id for r in jobqueue.by_state(jobs, status, ("succeeded",)).collect()] == [1]


def test_to_retry_respects_cap_and_time(spark):
    jobs, status = _queue(spark)
    now = F.lit("2024-06-01").cast("timestamp")
    # job 2 retryable (attempt 3 < 10); job 3 exhausted
    assert [r.job_id for r in jobqueue.to_retry(jobs, status, now=now).collect()] == [2]
    early = F.lit("2023-01-01").cast("timestamp")
    assert jobqueue.to_retry(jobs, status, now=early).count() == 0


def test_compact_keeps_live_jobs(spark):
    jobs, status = _queue(spark)
    live = sorted(r.job_id for r in jobqueue.compact(jobs, status).collect())
    # job 1 succeeded (terminal, dropped); 2,3 failed (live for
    # retry/abort bookkeeping); 4,5 unprocessed
    assert live == [2, 3, 4, 5]


def test_write_key_auth(spark):
    expected = hashlib.md5(b"acme_s3cret").hexdigest()
    df = spark.createDataFrame([("acme", "s3cret")], "c string, s string")
    got = df.select(misc.write_key(F.col("c"), F.col("s")).alias("wk")).collect()[0].wk
    assert got == expected
    batch = spark.createDataFrame([(expected, 1), ("bad", 2)], "write_key string, n int")
    assert [r.n for r in misc.authenticate(batch, [expected]).collect()] == [1]


def test_observable_counters(spark):
    df = spark.range(10)
    observed = misc.with_counters(df, "ingest")
    observed.collect()
    # observation is retrievable via the DataFrame's observedMetrics
    # in listeners; here we assert the plan carries the observe node
    assert "CollectMetrics" in observed._jdf.queryExecution().analyzed().toString()


CONF_DOC = {
    "sources": [{"id": 1, "name": "gw", "write_key": "wk", "schema": {
        "table_name": "ev", "schema_fields": [{"name": "a", "type": "INT"}]}}],
    "destinations": [{"id": 2, "name": "pg", "type": "postgres", "schema": {
        "table_name": "ev", "schema_fields": [{"name": "a", "type": "INT"}]}}],
    "connections": [{"id": 10, "source_id": 1, "destination_id": 2,
                     "transforms": [{"type": "field_hide", "field": "x"}]}],
}


def test_config_parse_and_diff():
    old = parse_config(CONF_DOC)
    assert old[10].source.schema.fields[0].type == "INT"
    assert old[10].destination.dest_type == "postgres"

    import copy

    doc2 = copy.deepcopy(CONF_DOC)
    doc2["connections"][0]["transforms"] = []
    doc2["connections"].append({"id": 11, "source_id": 1, "destination_id": 2})
    new = parse_config(doc2)
    d = diff(old, new)
    assert d.added == (11,) and d.changed == (10,) and d.removed == ()
    assert diff(new, new).empty
