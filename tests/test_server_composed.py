"""E2E of the composed server (server.py): config over HTTP drives
query lifecycle, events over HTTP flow through transform + ledger to
the destination — the "switch from the reference" smoke: one object,
both HTTP surfaces, live streaming delivery."""

from __future__ import annotations

import base64
import json
import time
import urllib.request

from kassette_server_spark.server import KassetteServer

SRC_SCHEMA = {
    "table_name": "ev",
    "schema_fields": [
        {"name": "event_id", "type": "STRING", "mode": "view", "primary_key": False},
        {"name": "n", "type": "INT", "mode": "view", "primary_key": False},
    ],
}
DEST_SCHEMA = {
    "table_name": "ev",
    "schema_fields": [
        {"name": "event_id", "type": "VARCHAR", "mode": "view", "primary_key": False},
        {"name": "n", "type": "INT", "mode": "view", "primary_key": False},
    ],
}


def _req(method: str, url: str, body: dict | None = None, headers: dict | None = None):
    data = json.dumps(body).encode() if body is not None else None
    req = urllib.request.Request(url, data=data, method=method, headers=headers or {})
    with urllib.request.urlopen(req, timeout=10) as resp:
        raw = resp.read() or b"{}"
        try:
            return resp.status, json.loads(raw)
        except json.JSONDecodeError:  # the gateway replies plain "OK"
            return resp.status, raw.decode()


def _event(i: int) -> dict:
    return {
        "event_id": f"e{i}",
        "n": i,
        "userId": f"u{i % 3}",
        "messageId": f"m{i}",
        "originalTimestamp": "2024-03-04T05:00:00.000Z",
        "sentAt": "2024-03-04T05:00:00.000Z",
    }


def test_composed_server_end_to_end(spark, tmp_path):
    srv = KassetteServer(
        spark, str(tmp_path), write_keys=frozenset({"wk"})
    ).start()
    try:
        cfg = srv.config_address
        # control plane over HTTP: source + destination + connection;
        # creating the connection starts its streaming query
        assert _req("POST", f"{cfg}/source",
                    {"id": 1, "name": "s", "write_key": "wk", "schema": SRC_SCHEMA})[1] == {"success": True}
        assert _req("POST", f"{cfg}/destination",
                    {"id": 2, "name": "d", "type": "postgres", "schema": DEST_SCHEMA})[1] == {"success": True}
        assert _req("POST", f"{cfg}/connection",
                    {"id": 10, "source_id": 1, "destination_id": 2})[1] == {"success": True}
        assert set(srv.supervisor.running) == {10}

        # ingest over HTTP with basic-auth write key, then flush the
        # gateway batch buffer (timeout-path flush = srv.tick)
        auth = {"Authorization": "Basic " + base64.b64encode(b"wk:").decode(),
                "Content-Type": "application/json"}
        gw = srv.gateway_address
        st, _ = _req("POST", f"{gw}/v1/batch",
                     {"batch": [_event(1), _event(2)]}, headers=auth)
        assert st == 200
        # bad write key is rejected at the socket
        bad = {"Authorization": "Basic " + base64.b64encode(b"nope:").decode()}
        try:
            _req("POST", f"{gw}/v1/batch", {"batch": [_event(9)]}, headers=bad)
            raise AssertionError("bad write key accepted")
        except urllib.error.HTTPError as e:
            assert e.code == 401
        srv.tick()

        # the continuous query (processingTime trigger) must deliver
        out_dir = str(tmp_path / "delivered" / "10")
        deadline = time.time() + 120
        got: set[str] = set()
        while time.time() < deadline and got != {"m1", "m2"}:
            time.sleep(1.0)
            try:
                got = {
                    r.message_id
                    for r in spark.read.json(out_dir).select("message_id").collect()
                }
            except Exception:
                got = set()
        assert got == {"m1", "m2"}, f"delivered={got}"

        # health endpoint reports the connection
        st, health = _req("GET", f"{cfg}/health")
        assert st == 200

        # a source created at RUNTIME through the control plane can
        # ingest immediately (live write-key auth against the store)
        assert _req("POST", f"{cfg}/source",
                    {"id": 3, "name": "s2", "write_key": "wk2", "schema": SRC_SCHEMA})[1] == {"success": True}
        auth2 = {"Authorization": "Basic " + base64.b64encode(b"wk2:").decode()}
        st, _ = _req("POST", f"{gw}/v1/batch", {"batch": [_event(7)]}, headers=auth2)
        assert st == 200

        # config change over HTTP: disabling the connection stops its query
        assert _req("PATCH", f"{cfg}/connection",
                    {"id": 10, "enabled": False})[1] == {"success": True}
        assert srv.supervisor.running == {}
    finally:
        srv.stop()


def test_single_port_reference_topology(spark, tmp_path):
    """The reference serves ingest AND config on ONE gin server
    (gateway/gateway.go:324-610): a client scripted against a single
    base URL — catalogue read, source/destination/connection create,
    authenticate, POST /extract, /health — must work unchanged against
    the GATEWAY port alone."""
    import time as _time

    srv = KassetteServer(spark, str(tmp_path), write_keys=frozenset({"wk"})).start()
    try:
        gw = srv.gateway_address  # the ONLY address this test touches
        st, cat = _req("GET", f"{gw}/service-catalogue?type=destination")
        assert st == 200 and isinstance(cat, list) and cat
        assert _req("POST", f"{gw}/source",
                    {"id": 1, "name": "s", "write_key": "wk2", "schema": SRC_SCHEMA})[1] == {"success": True}
        assert _req("POST", f"{gw}/destination",
                    {"id": 2, "name": "d", "type": "postgres", "schema": DEST_SCHEMA})[1] == {"success": True}
        assert _req("POST", f"{gw}/connection",
                    {"id": 10, "source_id": 1, "destination_id": 2})[1] == {"success": True}
        assert set(srv.supervisor.running) == {10}
        st, doc = _req("POST", f"{gw}/authenticate", {"write_key": "wk2"})
        assert doc == {"Status": "Authentication Passed"}
        # reads back over the same port
        st, sources = _req("GET", f"{gw}/source")
        assert st == 200 and [s["id"] for s in sources] == [1]
        # ingest on the same port with the runtime-created write key
        import base64 as _b64
        auth = {"Authorization": "Basic " + _b64.b64encode(b"wk2:").decode()}
        st, _ = _req("POST", f"{gw}/extract", {"batch": [_event(5)]}, headers=auth)
        assert st == 200
        srv.tick()
        # liveness keeps the gateway's shape
        st, health = _req("GET", f"{gw}/health")
        assert health == {"status": "ok"}
        # delivery proves the whole loop ran off one port
        out_dir = str(tmp_path / "delivered" / "10")
        deadline = _time.time() + 120
        got = set()
        while _time.time() < deadline and "m5" not in got:
            _time.sleep(1.0)
            try:
                got = {r.message_id for r in spark.read.json(out_dir).select("message_id").collect()}
            except Exception:
                got = set()
        assert "m5" in got
    finally:
        srv.stop()
