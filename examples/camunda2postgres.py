#!/usr/bin/env python
"""Parity demo: the reference's examples/camunda2postgres flow on this
engine.

The reference example wires a Camunda history poller → eventlog schema
transform → Postgres `eventlog` table (seeded config:
examples/camunda2postgres/sql/my_camunda2postgres.sql:72-74, 174-176).
This script runs the SAME config shape end-to-end: fake Camunda poller
(no network here) → gateway landing → streaming pipeline → parquet
"destination table" + delivery ledger, printing delivered rows and
ledger state.

Run: python examples/camunda2postgres.py
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from kassette_server_spark.session import get_spark
from kassette_server_spark.sources.configstore import parse_config
from kassette_server_spark.sources.gateway import GatewayShim
from kassette_server_spark.sources.rest_poller import fake_camunda_fetcher
from kassette_server_spark.streaming.ledger import DeliveryLedger
from kassette_server_spark.streaming.pipeline import run_connection_stream

# The reference's demo schemas (my_camunda2postgres.sql:73 source,
# :175 destination), verbatim field list.
EVENTLOG_FIELDS = [
    {"name": "event_id", "type": "STRING"},
    {"name": "process_instance", "type": "STRING"},
    {"name": "task_name", "type": "STRING"},
    {"name": "task_type", "type": "STRING"},
    {"name": "task_seq", "type": "INT"},
    {"name": "process_id", "type": "STRING"},
    {"name": "process_name", "type": "STRING"},
    {"name": "assignee", "type": "STRING"},
    {"name": "task_start_time", "type": "TIMESTAMP"},
    {"name": "task_end_time", "type": "TIMESTAMP"},
    {"name": "task_duration", "type": "INT"},
    {"name": "business_key", "type": "STRING"},
]

CONFIG = {
    "sources": [
        {"id": 1, "name": "my_camunda", "write_key": "demo-key",
         "schema": {"table_name": "eventlog", "schema_fields": EVENTLOG_FIELDS},
         "access": "Rest",
         "config": {"interval_min": 1, "history_min": 5}}
    ],
    "destinations": [
        {"id": 2, "name": "my_postgres", "type": "postgres",
         "schema": {"table_name": "eventlog", "schema_fields": [
             {**f, "type": {"STRING": "VARCHAR"}.get(f["type"], f["type"])} for f in EVENTLOG_FIELDS
         ]}}
    ],
    "connections": [
        {"id": 10, "source_id": 1, "destination_id": 2, "transforms": []}
    ],
}


def main() -> None:
    spark = get_spark(app_name="camunda2postgres-demo")
    tmp = tempfile.mkdtemp(prefix="kassette-demo-")
    landing = os.path.join(tmp, "landing")
    conns = parse_config(CONFIG)
    conn = conns[10]

    # 1. "Camunda" poll → gateway (the reference's ticker + ProcessWorkerRequest)
    gw = GatewayShim(landing, frozenset({"demo-key"}), max_batch=100)
    from datetime import datetime

    # events arrive over REAL HTTP (the reference demo's curl-driven
    # restaurant_journey.sh flow: POST /v1/batch with the write key as
    # basic-auth user — gateway/gateway.go:606-693)
    import urllib.request
    from base64 import b64encode

    from kassette_server_spark.sources.http_listener import IngestListener

    listener = IngestListener(gw).start()
    auth = "Basic " + b64encode(b"demo-key:").decode()
    for payload in fake_camunda_fetcher("activity-instance", datetime(2024, 3, 4, 5, 0), datetime(2024, 3, 4, 5, 1)):
        body = json.loads(payload)
        # enrich the fake events with eventlog fields
        for i, ev in enumerate(body["batch"]):
            ev.update(
                task_name=f"Review#{i}", task_type="userTask", task_seq=i,
                process_instance="pi-1", process_id="restaurant", process_name="Restaurant",
                assignee="bob", business_key="order-42",
                task_start_time="2024-03-04T05:00:00.000Z",
                task_end_time="2024-03-04T05:01:00.000Z", task_duration=60000,
            )
        req = urllib.request.Request(
            f"{listener.address}/v1/batch", data=json.dumps(body).encode(), method="POST"
        )
        req.add_header("Authorization", auth)
        with urllib.request.urlopen(req, timeout=10) as resp:
            assert resp.status == 200
    listener.stop()  # drains the shim buffer to the landing zone

    # 2. streaming pipeline → parquet "eventlog" destination + ledger
    out_dir = os.path.join(tmp, "eventlog")
    ledger = DeliveryLedger(spark, os.path.join(tmp, "ledger"))

    def deliver(df):
        cols = [f["name"] for f in EVENTLOG_FIELDS if f["name"] in df.columns]
        df.select("message_id", *cols).write.mode("append").parquet(out_dir)
        return df.select(
            "message_id",
            F.lit(True).alias("delivered"),
            F.lit(200).alias("status"),
            F.lit("").alias("error"),
        )

    q = run_connection_stream(spark, conn, landing, os.path.join(tmp, "ckpt"), ledger, deliver)
    q.awaitTermination(120)

    print("\n== destination eventlog ==")
    spark.read.parquet(out_dir).orderBy("task_seq").show(truncate=False)
    print("== ledger ==")
    ledger.latest_state().show(truncate=False)
    spark.stop()


if __name__ == "__main__":
    main()
