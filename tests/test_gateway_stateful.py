"""Gateway shim (S1/R6/T3) and count-triggered stateful sessionization
(W1 exact parity via applyInPandasWithState)."""

from __future__ import annotations

import json
from datetime import datetime, timezone

from pyspark.sql import functions as F

from kassette_server_spark.sources.gateway import GatewayShim


def fixed_clock():
    return datetime(2024, 3, 4, 5, 6, 7, 123000, tzinfo=timezone.utc)


def test_gateway_shim_envelope_and_auth(spark, tmp_path):
    gw = GatewayShim(
        landing_dir=str(tmp_path / "landing"),
        valid_write_keys=frozenset({"wk1"}),
        max_batch=2,
        clock=fixed_clock,
    )
    assert not gw.accept({"batch": [{"a": 1}]}, write_key="bad")  # 401 path
    assert gw.accept({"batch": [{"a": 1}]}, write_key="wk1", request_ip="9.9.9.9")
    # single (non-batch) request wraps into batch[0] with type stamped
    assert gw.accept({"userId": "u"}, write_key="wk1", req_type="track")
    # max_batch=2 reached → flushed to one landing file
    files = list((tmp_path / "landing").glob("batch-*.json"))
    assert len(files) == 1
    lines = files[0].read_text().strip().splitlines()
    assert len(lines) == 2
    env0 = json.loads(json.loads(lines[0])["payload"])
    assert env0["writeKey"] == "wk1" and env0["requestIP"] == "9.9.9.9"
    assert env0["receivedAt"] == "2024-03-04T05:06:07.123Z"
    env1 = json.loads(json.loads(lines[1])["payload"])
    assert env1["batch"][0]["type"] == "track"  # wrap + type stamp

    # landing file is consumable by the engine's envelope parser
    from kassette_server_spark import pipeline

    raw = spark.read.schema("payload string").json(str(tmp_path / "landing"))
    rows = pipeline.parse_envelope(raw).collect()
    assert len(rows) == 2


def test_no_ghost_sessions_after_count_flush(spark, tmp_path):
    """Regression: a gap arriving right after a count-flush (empty
    buffer) must not emit a zero-event 'ghost' session."""
    from kassette_server_spark.operators.sessionize import sessionize_stream_count_trigger

    rows = [
        (1, datetime(2024, 1, 1, 0, 0, 0), 0),
        (1, datetime(2024, 1, 1, 0, 1, 0), 1),
        (1, datetime(2024, 1, 1, 0, 2, 0), 2),  # count-flush at 3 → buffer empty
        (1, datetime(2024, 1, 1, 2, 0, 0), 3),  # >30min gap with n==0
    ]
    src = tmp_path / "ev2"
    spark.createDataFrame(rows, "user_id long, ts timestamp, event_id long").write.parquet(str(src))
    stream = spark.readStream.schema("user_id long, ts timestamp, event_id long").parquet(str(src))
    sessions = sessionize_stream_count_trigger(
        stream, gap_minutes=30, count_threshold=3, watermark_minutes=1
    )
    q = (
        sessions.writeStream.format("memory")
        .queryName("ghost_sess")
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM ghost_sess").collect()
    assert all(r.n_events > 0 for r in got), got
    assert [(r.n_events, r.flush_reason) for r in got] == [(3, "count")]


def test_rest_poller_wall_clock_clamp():
    """The poller must never advance its offset past now − history
    (future windows would be committed empty and their data skipped)."""
    from kassette_server_spark.sources.rest_poller import (
        RestPollerStreamReader,
        fake_camunda_fetcher,
    )

    r = RestPollerStreamReader(
        None,
        {
            "start": "2024-03-04T05:00:00",
            "interval_min": "1",
            "max_windows": "10",
            "history_min": "5",
            "now": "2024-03-04T05:08:30",
        },
        fake_camunda_fetcher,
    )
    init = r.initialOffset()
    lo = r.latestOffset()
    assert lo == {"window_start": "2024-03-04T05:03:00"}  # clamped to now−5min
    parts = r.partitions(init, lo)
    assert len(parts) == 3 * 2  # 3 windows × 2 apis
    # no progress possible while the clock stands still
    assert r.latestOffset() == lo
    assert r.partitions(lo, r.latestOffset()) == []
    # latestOffset() before initialOffset() must not contaminate initial
    r2 = RestPollerStreamReader(
        None,
        {"start": "2024-03-04T05:00:00", "interval_min": "1", "max_windows": "2"},
        fake_camunda_fetcher,
    )
    _ = r2.latestOffset()
    assert r2.initialOffset() == {"window_start": "2024-03-04T05:00:00"}


def test_count_triggered_stateful_sessions(spark, tmp_path):
    from kassette_server_spark.operators.sessionize import sessionize_stream_count_trigger

    # one user, 7 events 1min apart → with threshold 3: two count-flushed
    # sessions of 3, 1 event left buffered in state (no watermark push)
    rows = [(1, datetime(2024, 1, 1, 0, i, 0), i) for i in range(7)]
    src = tmp_path / "events"
    spark.createDataFrame(rows, "user_id long, ts timestamp, event_id long").write.parquet(str(src))
    stream = spark.readStream.schema("user_id long, ts timestamp, event_id long").parquet(str(src))
    sessions = sessionize_stream_count_trigger(
        stream, gap_minutes=30, count_threshold=3, watermark_minutes=1
    )
    q = (
        sessions.writeStream.format("memory")
        .queryName("count_sess")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM count_sess ORDER BY session_start").collect()
    assert [(r.n_events, r.flush_reason) for r in got] == [(3, "count"), (3, "count")]
    assert got[0].session_start == datetime(2024, 1, 1, 0, 0, 0)
    assert got[0].session_end == datetime(2024, 1, 1, 0, 2, 0)
    assert got[1].session_start == datetime(2024, 1, 1, 0, 3, 0)
