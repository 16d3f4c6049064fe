"""M6 config CRUD control plane over a real socket: endpoint surface,
write-key derivation, persistence, and change notification parity with
the reference gateway (gateway/gateway.go:324-604)."""

from __future__ import annotations

import hashlib
import json
import urllib.request

import pytest

from kassette_server_spark.sources.config_api import ConfigAPI, ConfigStore, generate_write_key

SRC_SCHEMA = {"table_name": "eventlog", "schema_fields": [{"name": "event_id", "type": "STRING"}]}


def _req(method: str, url: str, body: dict | None = None):
    data = json.dumps(body).encode() if body is not None else None
    req = urllib.request.Request(url, data=data, method=method)
    try:
        with urllib.request.urlopen(req, timeout=10) as r:
            return r.status, json.loads(r.read() or b"null")
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read() or b"null")


@pytest.fixture()
def api(tmp_path):
    diffs = []
    store = ConfigStore(
        str(tmp_path / "config.json"), on_change=lambda d, conns: diffs.append(d)
    )
    srv = ConfigAPI(store, job_health=lambda: [{"state": "succeeded", "n": 3}]).start()
    try:
        yield srv.address, store, diffs
    finally:
        srv.stop()


def test_config_crud_lifecycle(api, tmp_path):
    base, store, diffs = api
    # health + catalogue + field options
    assert _req("GET", f"{base}/health") == (200, {"status": "ok"})
    st, cat = _req("GET", f"{base}/service-catalogue?type=destination")
    assert st == 200 and all(c["type"] == "destination" for c in cat) and len(cat) >= 4
    st, one = _req("GET", f"{base}/service-catalogue/2")
    assert st == 200 and one["name"] == "Postgres"
    st, fo = _req("GET", f"{base}/field-options?type=destination&name=Postgres")
    from kassette_server_spark.convert import TYPE_MAP_POSTGRES

    assert st == 200 and fo == TYPE_MAP_POSTGRES  # TypeMapKassetteToDest parity
    st, fo_src = _req("GET", f"{base}/field-options?type=source")
    assert st == 200 and fo_src

    # create source: write key derived from customer+secret (md5 combine)
    st, resp = _req("POST", f"{base}/source", {
        "id": 1, "name": "my_camunda", "customer_name": "acme", "secret_key": "s3cr3t",
        "schema": SRC_SCHEMA, "access": "Rest",
    })
    assert (st, resp) == (200, {"success": True})
    st, src = _req("GET", f"{base}/source/1")
    expect_key = hashlib.md5(b"acme_s3cr3t").hexdigest()
    assert src["write_key"] == expect_key == generate_write_key("acme", "s3cr3t")

    # authenticate: by key and by credentials; reject unknown
    assert _req("POST", f"{base}/authenticate", {"write_key": expect_key})[0] == 200
    assert _req("POST", f"{base}/authenticate",
                {"customer_name": "acme", "secret_key": "s3cr3t"})[0] == 200
    assert _req("POST", f"{base}/authenticate", {"write_key": "bogus"})[0] == 400

    # destination + connection; duplicate id rejected
    st, resp = _req("POST", f"{base}/destination", {
        "id": 2, "name": "my_pg", "type": "postgres", "schema": SRC_SCHEMA})
    assert resp == {"success": True}
    assert _req("POST", f"{base}/destination", {"id": 2})[1] == {"success": False}
    st, resp = _req("POST", f"{base}/connection", {"id": 10, "source_id": 1, "destination_id": 2})
    assert resp == {"success": True}
    assert len(diffs) == 1 and diffs[-1].added == (10,)

    # typed engine view
    conns = store.connections()
    assert conns[10].source.write_key == expect_key
    assert conns[10].destination.dest_type == "postgres"
    assert store.write_keys() == frozenset({expect_key})

    # PATCH: partial update merges; new credentials re-derive the key
    _req("PATCH", f"{base}/source", {"id": 1, "customer_name": "acme", "secret_key": "new"})
    st, src = _req("GET", f"{base}/source/1")
    assert src["write_key"] == generate_write_key("acme", "new")
    assert src["name"] == "my_camunda"  # untouched fields survive
    assert diffs[-1].changed == (10,)  # connection 10 saw its source change

    # job health pass-through + 404 on unknown endpoints
    assert _req("GET", f"{base}/router-job-status")[1] == [{"state": "succeeded", "n": 3}]
    assert _req("GET", f"{base}/nonsense")[0] == 404

    # persistence: a fresh store over the same file sees everything
    store2 = ConfigStore(str(tmp_path / "config.json"))
    assert store2.get("connection", 10)["source_id"] == 1
    assert store2.connections()[10].source.write_key == generate_write_key("acme", "new")

    # referential integrity: mutations that would dangle a connection
    # are rejected WITHOUT wedging the store (the r1 review bug: a
    # persisted dangling ref made every later parse raise)
    assert _req("DELETE", f"{base}/source/1")[1] == {"success": False}  # conn 10 refs it
    assert _req("POST", f"{base}/connection",
                {"id": 11, "source_id": 99, "destination_id": 2})[1] == {"success": False}
    assert _req("PATCH", f"{base}/connection",
                {"id": 10, "destination_id": 77})[1] == {"success": False}
    st, conn10 = _req("GET", f"{base}/connection/10")
    assert st == 200 and conn10["destination_id"] == 2  # rollback held
    assert store.connections()[10].source.write_key  # store still parses

    # DELETE cascades a removed-connection diff
    assert _req("DELETE", f"{base}/connection/10")[1] == {"success": True}
    assert diffs[-1].removed == (10,)
    assert _req("DELETE", f"{base}/connection/10")[1] == {"success": False}
    assert _req("GET", f"{base}/connection/10")[0] == 400
    # with the connection gone, the source delete now succeeds
    assert _req("DELETE", f"{base}/source/1")[1] == {"success": True}
