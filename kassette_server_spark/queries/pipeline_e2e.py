"""End-to-end pipeline parity query (q28).

Builds kassette envelopes from the `events` table, runs the whole
batch pipeline (T1 parse/explode → T2 identity → T4 skew correction →
T6-T10 rules+casts), and is oracle-checked by a DuckDB query that
reimplements the same deterministic semantics in SQL — including the
md5-uuid identity synthesis bit surgery and the skew arithmetic. This
is the strongest evidence the reference pipeline semantics survive the
columnar re-expression.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import pipeline
from ..catalog import load
from ..config import Connection, DestinationConfig, Schema, SchemaField, SourceConfig
from ..convert import TS_LAYOUT
from .base import query

_SRC = Schema(
    "ev",
    (
        SchemaField("seq", "INT"),
        SchemaField("value", "FLOAT"),
        SchemaField("label", "STRING"),
        SchemaField("type", "STRING"),
    ),
)
_DEST = Schema(
    "ev",
    (
        SchemaField("sequence_id", "INT"),
        SchemaField("value", "FLOAT"),
        SchemaField("type", "VARCHAR"),
    ),
)
_CONN = Connection(
    id=1,
    source=SourceConfig(id=1, name="gw", schema=_SRC),
    destination=DestinationConfig(id=2, name="pg", dest_type="postgres", schema=_DEST),
    transforms=(
        {"type": "field_map", "from": "seq", "to": "sequence_id"},
        {"type": "field_hide", "field": "label"},
        {"type": "field_delete", "field": "type", "value": "click"},
    ),
)

_MD5_UUID_SQL = (
    "substr(h,1,8) || '-' || substr(h,9,4) || '-4' || substr(h,14,3) || '-' || "
    "substr('89ab', ((strpos('0123456789abcdef', substr(h,17,1)) - 1) % 4) + 1, 1) || "
    "substr(h,18,3) || '-' || substr(h,21,12)"
)


@query(
    "q28_pipeline_e2e",
    oracle=f"""
    WITH src AS (
      SELECT *, md5('u' || CAST(user_id AS VARCHAR) || ':' || 'a' || CAST(user_id % 7 AS VARCHAR)) AS h
      FROM events WHERE NOT (event_type = 'click')
    )
    SELECT {_MD5_UUID_SQL} AS kassette_id,
           md5(CAST(event_id AS VARCHAR)) AS message_id,
           date_trunc('milliseconds', ts) + INTERVAL 2 SECOND AS event_ts,
           event_id AS sequence_id,
           value,
           event_type AS type
    FROM src
    """,
    doc="full pipeline e2e: envelope→identity(md5-uuid)→skew→rules→dest cast",
    tags=("pipeline",),
)
def q28(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.layout import ensure_scan_parallelism

    # the envelope build + parse is pure per-row CPU (JSON round trip);
    # single-row-group test files would otherwise serialize it on one
    # task (no-op at scale where the input has >= cores splits)
    ev = ensure_scan_parallelism(load(spark, sf, "events"))
    fmt = lambda c: F.date_format(c, TS_LAYOUT)  # noqa: E731
    envelope = F.to_json(
        F.struct(
            F.array(
                F.struct(
                    F.concat(F.lit("u"), F.col("user_id")).alias("userId"),
                    F.concat(F.lit("a"), F.col("user_id") % 7).alias("anonymousId"),
                    F.col("event_type").alias("type"),
                    fmt(F.col("ts")).alias("originalTimestamp"),
                    fmt(F.col("ts") + F.expr("INTERVAL 5 SECONDS")).alias("sentAt"),
                    F.col("event_id").alias("seq"),
                    F.col("value").alias("value"),
                    F.col("props").alias("label"),
                )
            ).alias("batch"),
            F.lit("wk").alias("writeKey"),
            F.lit("10.0.0.1").alias("requestIP"),
            fmt(F.col("ts") + F.expr("INTERVAL 7 SECONDS")).alias("receivedAt"),
        )
    )
    raw = ev.select(envelope.alias("payload"))
    parsed = pipeline.parse_envelope(raw)
    with_id = pipeline.synthesize_identity(
        parsed,
        message_id_expr=F.md5(F.try_variant_get(F.col("event")["seq"], "$", "string")),
    )
    skewed = pipeline.correct_timestamp_skew(
        with_id, clock=F.lit("2030-01-01 00:00:00").cast("timestamp")
    )
    out = pipeline.transform_for_connection(skewed, _CONN)
    return out.select(
        "kassette_id",
        "message_id",
        F.col("event_ts"),
        "sequence_id",
        "value",
        "type",
    )
