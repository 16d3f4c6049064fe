"""Control-plane churn soak (VERDICT r6 "Next round" #5): the
reference's 5 s config poll (backendconfig/configdb.go:83-94) makes
create/patch/delete-while-events-flow its STEADY-STATE behavior, not an
edge case. This soak drives the composed server through repeated
connection lifecycle churn with live ingest and asserts:

1. no stranded queries — after every mutation the supervisor's running
   set equals the store's enabled connections, and at the end
   ``spark.streams.active`` carries none of the server's queries;
2. no double delivery across stop/restart — re-enabling a connection
   and replaying the SAME messageIds delivers nothing twice (ledger
   dedup spans query restarts because the ledger outlives the query);
3. ledger consistency — every delivered messageId has exactly one
   succeeded ledger row per connection, and the per-connection
   delivered files contain no duplicate messageIds.
"""

from __future__ import annotations

import base64
import json
import time
import urllib.request

from pyspark.sql import functions as F

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

AUTH = {
    "Authorization": "Basic " + base64.b64encode(b"wk:").decode(),
    "Content-Type": "application/json",
}


def _req(method: str, url: str, body: dict | None = None, headers: dict | None = None):
    data = json.dumps(body).encode() if body is not None else None
    req = urllib.request.Request(url, data=data, method=method, headers=headers or {})
    with urllib.request.urlopen(req, timeout=10) as resp:
        raw = resp.read() or b"{}"
        try:
            return resp.status, json.loads(raw)
        except json.JSONDecodeError:
            return resp.status, raw.decode()


def _event(mid: str, i: int) -> dict:
    return {
        "event_id": f"e{i}",
        "n": i,
        "userId": f"u{i % 3}",
        "messageId": mid,
        "originalTimestamp": "2024-03-04T05:00:00.000Z",
        "sentAt": "2024-03-04T05:00:00.000Z",
    }


def _delivered(spark, out_dir: str) -> list[str]:
    try:
        return [r.message_id for r in spark.read.json(out_dir).select("message_id").collect()]
    except Exception:
        return []


def _await_delivery(
    spark, srv, out_dir: str, want: set[str], timeout: float = 180.0
) -> list[str]:
    deadline = time.time() + timeout
    got: list[str] = []
    while time.time() < deadline and set(got) < want:
        time.sleep(1.0)
        # a dead query never delivers — surface ITS error, not a timeout
        for cid, q in srv.supervisor.running.items():
            exc = q.exception()
            assert exc is None, f"conn {cid} query died: {str(exc)[:800]}"
        got = _delivered(spark, out_dir)
    assert set(got) >= want, (
        f"delivery timeout after {timeout}s: got {sorted(got)}, "
        f"missing {sorted(want - set(got))}; "
        f"running={list(srv.supervisor.running)}"
    )
    return got


def test_control_plane_churn_soak(spark, tmp_path):
    srv = KassetteServer(spark, str(tmp_path), write_keys=frozenset({"wk"})).start()
    try:
        cfg, gw = srv.config_address, srv.gateway_address
        assert _req("POST", f"{cfg}/source",
                    {"id": 1, "name": "s", "write_key": "wk", "schema": SRC_SCHEMA})[1] == {"success": True}
        assert _req("POST", f"{cfg}/destination",
                    {"id": 2, "name": "d", "type": "postgres", "schema": DEST_SCHEMA})[1] == {"success": True}

        conn_ids = [10, 11, 12]
        sent: dict[int, set[str]] = {}
        for round_no, cid in enumerate(conn_ids):
            # CREATE: the query starts; every already-created connection
            # keeps running (no cross-talk between lifecycle events)
            assert _req("POST", f"{cfg}/connection",
                        {"id": cid, "source_id": 1, "destination_id": 2})[1] == {"success": True}
            expect_running = set(conn_ids[: round_no + 1])
            assert set(srv.supervisor.running) == expect_running

            mids = {f"c{cid}-m{k}" for k in range(3)}
            sent[cid] = mids
            st, _ = _req("POST", f"{gw}/extract",
                         {"batch": [_event(m, k) for k, m in enumerate(sorted(mids))]},
                         headers=AUTH)
            assert st == 200
            srv.tick()

        # every connection reads the same landing zone, so each must
        # deliver every batch posted SINCE ITS OWN START; connection 10
        # (started first) must see all nine messageIds
        all_mids = set().union(*sent.values())
        out10 = str(tmp_path / "delivered" / "10")
        got10 = _await_delivery(spark, srv, out10, all_mids)
        assert len(got10) == len(set(got10)), "duplicate delivery on conn 10"

        # PATCH-disable each connection: its query stops, others live on
        for cid in conn_ids:
            assert _req("PATCH", f"{cfg}/connection", {"id": cid, "enabled": False})[1] == {"success": True}
            assert cid not in srv.supervisor.running
        assert srv.supervisor.running == {}

        # RE-ENABLE 10 and REPLAY the exact same messageIds: the ledger
        # (which outlives the query) must dedup across the restart
        before = len(_delivered(spark, out10))
        assert _req("PATCH", f"{cfg}/connection", {"id": 10, "enabled": True})[1] == {"success": True}
        # re-enable registers the new query only after the OLD one's
        # background drain completes (shared checkpoint dir, round-7
        # second-pass fix) — wait for it rather than asserting instantly
        deadline = time.time() + 60
        while time.time() < deadline and 10 not in srv.supervisor.running:
            time.sleep(0.5)
        assert set(srv.supervisor.running) == {10}
        st, _ = _req("POST", f"{gw}/extract",
                     {"batch": [_event(m, k) for k, m in enumerate(sorted(all_mids))]},
                     headers=AUTH)
        assert st == 200
        # plus one genuinely new message so we can SEE the batch land
        st, _ = _req("POST", f"{gw}/extract", {"batch": [_event("fresh-1", 99)]}, headers=AUTH)
        assert st == 200
        srv.tick()
        got = _await_delivery(spark, srv, out10, set(got10) | {"fresh-1"})
        assert len(got) == before + 1, f"replay duplicated rows: {sorted(got)}"
        assert len(got) == len(set(got))

        # DELETE the connections; supervisor drains to empty
        for cid in conn_ids:
            st, doc = _req("DELETE", f"{cfg}/connection/{cid}")
            assert doc == {"success": True}
        assert srv.supervisor.running == {}

        # ledger consistency: exactly one succeeded row per delivered
        # (connection, messageId) — at-least-once ingest never produced
        # a second success
        succ = (
            srv.ledger.processed_job_ids()
            .groupBy("connection_id", "job_id")
            .agg(F.count("*").alias("n"))
            .filter(F.col("n") > 1)
        )
        assert succ.count() == 0, "duplicate succeeded ledger rows"
        # the delivered file lands BEFORE the same micro-batch's ledger
        # append commits, so poll for the last messageId's ledger row
        def _ledger10() -> set[str]:
            return {
                r.job_id
                for r in srv.ledger.processed_job_ids()
                .filter(F.col("connection_id") == 10)
                .select("job_id")
                .collect()
            }
        deadline = time.time() + 60
        ledger10 = _ledger10()
        while time.time() < deadline and not set(got) <= ledger10:
            time.sleep(1.0)
            ledger10 = _ledger10()
        assert set(got) <= ledger10
    finally:
        srv.stop()
    # no stranded queries after stop: none of this server's work-dir
    # checkpoints back an active stream
    stranded = [
        q for q in spark.streams.active
        if q.name and str(tmp_path) in (q.name or "")
    ]
    assert stranded == []
