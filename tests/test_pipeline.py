"""Golden tests for the kassette pipeline semantics (SURVEY §2.1 T1-T11,
§1.2 coercions) against hand-computed expectations from the reference
behavior (FIXTURES.md F5 rule set)."""

from __future__ import annotations

import hashlib
import json
import uuid as uuidlib

from pyspark.sql import functions as F

from kassette_server_spark import pipeline
from kassette_server_spark.config import Connection, DestinationConfig, Schema, SchemaField, SourceConfig


def go_md5_uuid(s: str) -> str:
    """Python mirror of misc/misc.go:91-111 GetMD5UUID."""
    b = bytearray(hashlib.md5(s.encode()).digest())
    b[8] = b[8] & 0x3F | 0x80
    b[6] = b[6] & 0x0F | 0x40
    return str(uuidlib.UUID(bytes=bytes(b)))


SRC_SCHEMA = Schema(
    table_name="eventlog",
    fields=(
        SchemaField("event_id", "STRING"),
        SchemaField("task_seq", "INT"),
        SchemaField("score", "FLOAT"),
        SchemaField("done", "BOOLEAN"),
        SchemaField("task_start_time", "TIMESTAMP"),
        SchemaField("task_type", "STRING"),
        SchemaField("assignee", "STRING"),
        SchemaField("anonymousId", "STRING"),
    ),
)

DEST_SCHEMA = Schema(
    table_name="eventlog",
    fields=(
        SchemaField("id", "VARCHAR", primary_key=True),
        SchemaField("task_seq", "INT"),
        SchemaField("score", "FLOAT"),
        SchemaField("done", "BOOLEAN"),
        SchemaField("task_start_time", "TIMESTAMP"),
        SchemaField("task_type", "VARCHAR"),
    ),
)

RULES = (
    {"type": "field_map", "from": "event_id", "to": "id"},
    {"type": "field_hide", "field": "assignee"},
    {"type": "field_delete", "field": "task_type", "value": "noop"},
)

CONN = Connection(
    id=1,
    source=SourceConfig(id=1, name="camunda", schema=SRC_SCHEMA),
    destination=DestinationConfig(id=2, name="pg", dest_type="postgres", schema=DEST_SCHEMA),
    transforms=RULES,
)


def make_envelope(events: list[dict]) -> str:
    return json.dumps(
        {
            "batch": events,
            "writeKey": "wk",
            "requestIP": "1.2.3.4",
            "receivedAt": "2024-03-04T05:06:07.123Z",
        }
    )


def events_df(spark, events: list[dict]):
    raw = spark.createDataFrame([(make_envelope(events),)], ["payload"])
    return pipeline.parse_envelope(raw)


def transformed_rows(spark, events: list[dict]):
    df = events_df(spark, events)
    out = pipeline.transform_for_connection(df, CONN)
    return out.collect()


def test_parse_envelope_explodes_and_drops_bad(spark):
    raw = spark.createDataFrame(
        [(make_envelope([{"a": 1}, {"a": 2}]),), ("not json",), ('{"nobatch": 1}',)],
        ["payload"],
    )
    rows = pipeline.parse_envelope(raw).collect()
    assert len(rows) == 2
    assert rows[0].write_key == "wk" and rows[0].request_ip == "1.2.3.4"
    assert [r.batch_index for r in rows] == [0, 1]


def test_identity_synthesis_matches_go_md5_uuid(spark):
    df = events_df(spark, [{"userId": "u1", "anonymousId": "a1", "type": "track"}])
    out = pipeline.synthesize_identity(df).collect()[0]
    assert out.kassette_id == go_md5_uuid("u1:a1")
    assert out.message_id  # backfilled
    # blank messageId is backfilled; explicit one is kept
    df2 = events_df(spark, [{"userId": "u", "messageId": "m-1"}])
    assert pipeline.synthesize_identity(df2).collect()[0].message_id == "m-1"


def test_non_identifiable_rejected_unless_extract(spark):
    df = events_df(spark, [{"type": "track"}, {"type": "extract"}, {"userId": "u"}])
    rows = pipeline.synthesize_identity(df).collect()
    assert [r.event_type for r in rows] == ["extract", ""]


def test_source_cast_semantics(spark):
    rows = transformed_rows(
        spark,
        [
            {
                "event_id": "e1",
                "task_seq": 7.9,  # float → toInt truncates
                "score": True,  # bool → toFloat 1.0
                "done": "true",  # string 'true' → toBool true
                "task_start_time": "2024-03-04T05:06:07.123Z",
                "task_type": "real",
            }
        ],
    )
    r = rows[0]
    assert r.id == "e1"
    assert r.task_seq == 7
    assert r.score == 1.0
    assert r.done is True
    # dest-side datetime emits the canonical layout STRING
    # (integrations/postgres/transformer.go:78-80)
    assert r.task_start_time == "2024-03-04T05:06:07.123Z"
    assert r.task_type == "real"


def test_source_cast_failure_drops_field(spark):
    rows = transformed_rows(
        spark,
        [
            {
                "event_id": "e1",
                "task_seq": "not-a-number",  # Atoi fails → field dropped
                "task_start_time": "2024/03/04",  # wrong layout → dropped
                "task_type": "real",
            }
        ],
    )
    r = rows[0]
    assert r.task_seq is None and r._present_task_seq is False
    assert r.task_start_time is None and r._present_task_start_time is False
    assert r.id == "e1" and r._present_id is True


def test_field_map_hide_delete(spark):
    rows = transformed_rows(
        spark,
        [
            {"event_id": "keep", "task_type": "real", "assignee": "bob", "anonymousId": "x"},
            {"event_id": "gone", "task_type": "noop"},  # delete rule fires
        ],
    )
    assert len(rows) == 1
    r = rows[0]
    assert r.id == "keep"
    out_cols = set(rows[0].asDict().keys())
    assert "assignee" not in out_cols  # hidden
    assert "anonymousId" not in out_cols  # system rule
    assert "event_id" not in out_cols  # renamed to id


def test_field_delete_matches_any_field(spark):
    # reference quirk: the delete switch ignores rule.Field and compares
    # EVERY converted value (processor/transformer.go:132-148)
    rows = transformed_rows(
        spark,
        [{"event_id": "noop", "task_type": "real"}],  # value in a different field
    )
    assert rows == []


def test_field_delete_int_and_bool_classes(spark):
    conn = Connection(
        id=1,
        source=CONN.source,
        destination=CONN.destination,
        transforms=(
            {"type": "field_delete", "value": "7"},
            {"type": "field_delete", "value": "true"},
        ),
    )
    df = events_df(
        spark,
        [
            {"event_id": "a", "task_seq": 7},  # int match → delete
            {"event_id": "b", "done": True},  # bool match → delete
            {"event_id": "c", "task_seq": 8, "done": False},
            {"event_id": "7", "task_seq": 1},  # string '7' == '7' → delete
            {"event_id": "d", "score": 7.0},  # float64 class: never deletes
        ],
    )
    rows = pipeline.transform_for_connection(df, conn).collect()
    # no field_map rule here → the column keeps its original name; the
    # dest schema has no 'event_id' field so read it from the raw event
    ids = sorted(
        r.event["event_id"].toPython() if hasattr(r.event["event_id"], "toPython") else r.event["event_id"]
        for r in rows
    )
    assert ids == ["c", "d"]


def test_dest_cast_failure_writes_null(spark):
    # dest schema maps task_type to INT: string 'real' fails Atoi → null
    dest = Schema(
        "t",
        (SchemaField("id", "VARCHAR"), SchemaField("task_type", "INT")),
    )
    conn = Connection(
        id=1,
        source=CONN.source,
        destination=DestinationConfig(id=2, name="pg", dest_type="postgres", schema=dest),
        transforms=CONN.transforms,
    )
    df = events_df(spark, [{"event_id": "e", "task_type": "real"}])
    r = pipeline.transform_for_connection(df, conn).collect()[0]
    assert r.task_type is None
    assert r._present_task_type is True  # present-but-null ≠ absent


def test_wrap_batch_payload_absent_vs_null(spark):
    dest = Schema(
        "t",
        (SchemaField("id", "VARCHAR"), SchemaField("task_seq", "INT"), SchemaField("task_type", "INT")),
    )
    conn = Connection(
        id=1,
        source=CONN.source,
        destination=DestinationConfig(id=2, name="pg", dest_type="postgres", schema=dest),
        transforms=CONN.transforms,
    )
    df = events_df(
        spark,
        [{"event_id": "e", "task_seq": "bad", "task_type": "realtext"}],
    )
    out = pipeline.transform_for_connection(df, conn)
    wrapped = pipeline.wrap_batch_payload(out, ["id", "task_seq", "task_type"]).collect()[0]
    obj = json.loads(wrapped.event_json)
    assert obj == {"id": "e", "task_type": None}  # task_seq absent (src fail), task_type null (dest fail)


def test_timestamp_skew_correction(spark):
    df = events_df(
        spark,
        [
            {
                "event_id": "e",
                "originalTimestamp": "2024-03-04T05:00:00.000Z",
                "sentAt": "2024-03-04T05:00:10.000Z",  # client clock 10s ahead
            }
        ],
    )
    clock = F.lit("2024-03-04T05:06:07.123Z").cast("timestamp")
    r = pipeline.correct_timestamp_skew(df, clock=clock).collect()[0]
    # received (05:06:07.123) - (sent-original = 10s) → 05:05:57.123
    assert r.event_ts.isoformat().startswith("2024-03-04T05:05:57.123")


def test_fanout_connections(spark):
    df = events_df(spark, [{"event_id": "e"}])
    conns = [CONN, Connection(id=2, source=CONN.source, destination=CONN.destination, enabled=False),
             Connection(id=3, source=CONN.source, destination=CONN.destination)]
    rows = pipeline.fanout_connections(df, conns).collect()
    assert sorted(r.connection_id for r in rows) == [1, 3]


def test_passthrough_no_source_schema(spark):
    src = SourceConfig(id=1, name="s", schema=Schema(), skip_with_no_schema=False)
    dest = DestinationConfig(
        id=2, name="pg", dest_type="postgres",
        schema=Schema("t", (SchemaField("a", "INT"), SchemaField("b", "VARCHAR"))),
    )
    conn = Connection(id=1, source=src, destination=dest)
    df = events_df(spark, [{"a": 5.7, "b": True, "c": "ignored"}])
    r = pipeline.transform_for_connection(df, conn).collect()[0]
    assert r.a == 5 and r.b == "true"


def test_skip_with_no_schema_emits_nothing(spark):
    src = SourceConfig(id=1, name="s", schema=Schema(), skip_with_no_schema=True)
    conn = Connection(id=1, source=src, destination=CONN.destination)
    df = events_df(spark, [{"event_id": "e"}])
    out = pipeline.transform_for_connection(df, conn)
    # no dest columns emitted at all
    assert not [c for c in out.columns if c in ("id", "task_seq")]
