"""Config CRUD control plane (M6) — the reference gateway's REST
surface for sources/destinations/connections over the engine's config
store.

Reproduces gateway/gateway.go:324-604 with stdlib http.server:

- ``GET /health``
- ``GET|POST|PATCH /source``, ``GET|DELETE /source/<id>`` — POST/PATCH
  derive the write key from (customer_name, secret_key) exactly like
  misc.GenerateWriteKey (misc/misc.go:299-302): md5-hex of
  "customer_name_secret_key".
- same verbs for ``/destination`` and ``/connection``
- ``POST /authenticate`` — write-key equality check
  (backendconfig/configdb.go:565-591)
- ``GET /service-catalogue[?type=]``, ``GET /service-catalogue/<id>``
  — static catalogue (the reference moved it to yaml)
- ``GET /field-options?type=&name=`` — the per-integration type maps
  (postgres/powerbi/anaplan/keen from convert.DEST_TYPE_MAPS)
- ``GET /router-job-status`` — injectable job-health supplier (M3)

The store persists every mutation to a JSON document (the durable
Postgres-config analogue) in the SAME shape parse_config consumes, and
notifies subscribers with ``(ConfigDiff, new_connections)`` in commit
order — the reference's 5 s poll + reflect.DeepEqual pub-sub
(backendconfig/configdb.go:83-94, 494-524) becomes an immediate
callback the query supervisor uses to restart the affected streaming
queries (``ConfigStore(on_change=supervisor.apply)``). Mutations that
would leave a connection pointing at a missing source/destination are
rejected (success=false), never persisted. Config stays a
control-plane concern: it reaches executors only as literals compiled
into plans.
"""

from __future__ import annotations

import hashlib
import json
import os
import threading
from collections.abc import Callable
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from .configstore import ConfigDiff, diff, parse_config

SERVICE_CATALOGUE = [
    {"id": 1, "name": "Camunda", "type": "source", "access": "Rest", "category": "workflow"},
    {"id": 2, "name": "Postgres", "type": "destination", "access": "DB", "category": "database"},
    {"id": 3, "name": "PowerBI", "type": "destination", "access": "Rest", "category": "analytics"},
    {"id": 4, "name": "Anaplan", "type": "destination", "access": "Rest", "category": "planning"},
    {"id": 5, "name": "Keen", "type": "destination", "access": "Rest", "category": "analytics"},
    {"id": 6, "name": "S3", "type": "destination", "access": "Object", "category": "storage"},
]


def generate_write_key(customer_name: str, secret_key: str) -> str:
    """misc.GenerateWriteKey parity: md5 of 'customer_secret' combine."""
    return hashlib.md5(f"{customer_name}_{secret_key}".encode()).hexdigest()


class ConfigStore:
    """Thread-safe CRUD over the {sources, destinations, connections}
    document, with JSON-file persistence and change notification."""

    _SECTIONS = {"source": "sources", "destination": "destinations", "connection": "connections"}

    def __init__(
        self,
        path: str | None = None,
        on_change: Callable[[ConfigDiff, dict], None] | None = None,
    ):
        """``on_change(diff, connections)`` is invoked in commit order
        (under the store lock) with the typed post-change connection
        map — exactly StreamingSupervisor.apply's signature, so
        ``ConfigStore(on_change=supervisor.apply)`` wires directly."""
        self._path = path
        self._on_change = on_change
        self._lock = threading.RLock()
        self._doc: dict = {"sources": [], "destinations": [], "connections": []}
        if path and os.path.exists(path):
            with open(path) as f:
                self._doc.update(json.load(f))

    # -- document access ----------------------------------------------------
    def document(self) -> dict:
        with self._lock:
            return json.loads(json.dumps(self._doc))

    def connections(self):
        """Typed view for the engine (configstore.parse_config)."""
        return parse_config(self.document())

    def list(self, kind: str) -> list[dict]:
        with self._lock:
            return [dict(x) for x in self._doc[self._SECTIONS[kind]]]

    def get(self, kind: str, obj_id: int) -> dict | None:
        with self._lock:
            for x in self._doc[self._SECTIONS[kind]]:
                if x.get("id") == obj_id:
                    return dict(x)
        return None

    # -- mutation -----------------------------------------------------------
    def _refs_ok(self, doc: dict) -> bool:
        """Referential integrity: every connection must point at an
        existing source and destination. A mutation that would leave a
        dangling reference is REJECTED before persisting — otherwise
        parse_config would raise on every later read and wedge the
        store until the file is hand-edited."""
        src_ids = {s.get("id") for s in doc["sources"]}
        dst_ids = {d.get("id") for d in doc["destinations"]}
        return all(
            c.get("source_id") in src_ids and c.get("destination_id") in dst_ids
            for c in doc["connections"]
        )

    def _mutate(self, fn) -> bool:
        # the change callback fires INSIDE the lock: concurrent HTTP
        # mutations therefore deliver their ConfigDiffs strictly in
        # commit order (an added-then-removed connection can never
        # reach the supervisor as removed-then-added). RLock keeps
        # store reads from inside the callback safe.
        with self._lock:
            snapshot = json.loads(json.dumps(self._doc))
            old = self.connections()
            ok = fn(self._doc)
            if not ok or not self._refs_ok(self._doc):
                self._doc = snapshot  # roll back the in-memory edit
                return False
            if self._path:
                tmp = self._path + ".tmp"
                with open(tmp, "w") as f:
                    json.dump(self._doc, f, indent=1)
                os.replace(tmp, self._path)
            new = self.connections()
            if self._on_change:
                d = diff(old, new)
                if not d.empty:
                    self._on_change(d, new)
        return True

    def create(self, kind: str, obj: dict) -> bool:
        section = self._SECTIONS[kind]

        def fn(doc):
            items = doc[section]
            if "id" not in obj:
                obj["id"] = max((x.get("id", 0) for x in items), default=0) + 1
            if any(x.get("id") == obj["id"] for x in items):
                return False
            if kind == "source" and obj.get("customer_name") and obj.get("secret_key"):
                obj["write_key"] = generate_write_key(obj["customer_name"], obj["secret_key"])
            items.append(obj)
            return True

        return self._mutate(fn)

    def update(self, kind: str, obj: dict) -> bool:
        section = self._SECTIONS[kind]

        def fn(doc):
            for i, x in enumerate(doc[section]):
                if x.get("id") == obj.get("id"):
                    merged = {**x, **obj}
                    # PATCH /source re-derives the key only when both
                    # credentials are supplied (gateway.go:438-443)
                    if kind == "source" and obj.get("customer_name") and obj.get("secret_key"):
                        merged["write_key"] = generate_write_key(
                            obj["customer_name"], obj["secret_key"]
                        )
                    doc[section][i] = merged
                    return True
            return False

        return self._mutate(fn)

    def delete(self, kind: str, obj_id: int) -> bool:
        section = self._SECTIONS[kind]

        def fn(doc):
            before = len(doc[section])
            doc[section] = [x for x in doc[section] if x.get("id") != obj_id]
            return len(doc[section]) < before

        return self._mutate(fn)

    def authenticate(self, write_key: str) -> bool:
        with self._lock:
            return any(s.get("write_key") == write_key for s in self._doc["sources"])

    def write_keys(self) -> frozenset[str]:
        with self._lock:
            return frozenset(s.get("write_key", "") for s in self._doc["sources"]) - {""}


class _ConfigHandler(BaseHTTPRequestHandler):
    store: ConfigStore
    job_health: Callable[[], list[dict]] | None

    def log_message(self, *a):
        pass

    # -- helpers ------------------------------------------------------------
    def _json(self, status: int, doc) -> None:
        payload = json.dumps(doc).encode()
        self.send_response(status)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(payload)))
        self.end_headers()
        self.wfile.write(payload)

    def _body(self) -> dict | None:
        try:
            n = int(self.headers.get("Content-Length", 0))
            return json.loads(self.rfile.read(n) or b"{}")
        except (ValueError, json.JSONDecodeError):
            return None

    def _route(self) -> tuple[str, str | None, dict]:
        path, _, query = self.path.partition("?")
        parts = [p for p in path.split("/") if p]
        params = {}
        for kv in query.split("&"):
            if "=" in kv:
                k, v = kv.split("=", 1)
                params[k] = v
        return (parts[0] if parts else "", parts[1] if len(parts) > 1 else None, params)

    # -- verbs --------------------------------------------------------------
    def do_GET(self):
        head, arg, params = self._route()
        if head == "health":
            return self._json(200, {"status": "ok"})
        if head == "service-catalogue":
            if arg is not None:
                hit = [c for c in SERVICE_CATALOGUE if str(c["id"]) == arg]
                return self._json(200, hit[0]) if hit else self._json(500, {"Error": "no such service"})
            t = params.get("type")
            return self._json(200, [c for c in SERVICE_CATALOGUE if not t or c["type"] == t])
        if head == "field-options":
            from ..convert import DEST_TYPE_MAPS, TYPE_MAP_SOURCE

            if params.get("type") == "destination":
                m = DEST_TYPE_MAPS.get(params.get("name", "").lower())
                return self._json(200, m or {})
            return self._json(200, TYPE_MAP_SOURCE)
        if head == "router-job-status":
            return self._json(200, self.job_health() if self.job_health else [])
        if head in ConfigStore._SECTIONS:
            if arg is None:
                return self._json(200, self.store.list(head))
            try:
                obj_id = int(arg)
            except ValueError:
                return self._json(400, {"error": f"bad id {arg!r}"})
            obj = self.store.get(head, obj_id)
            return self._json(200, obj) if obj else self._json(400, {"error": "not found"})
        return self._json(404, {"error": "unknown endpoint"})

    def do_POST(self):
        head, _, _ = self._route()
        body = self._body()
        if body is None:
            return self._json(400, {"error": "invalid json"})
        if head == "authenticate":
            key = body.get("write_key") or generate_write_key(
                body.get("customer_name", ""), body.get("secret_key", "")
            )
            if self.store.authenticate(key):
                return self._json(200, {"Status": "Authentication Passed"})
            return self._json(400, {"Status": "No matched source instance!"})
        if head in ConfigStore._SECTIONS:
            return self._json(200, {"success": self.store.create(head, body)})
        return self._json(404, {"error": "unknown endpoint"})

    def do_PATCH(self):
        head, _, _ = self._route()
        body = self._body()
        if body is None:
            return self._json(400, {"error": "invalid json"})
        if head in ConfigStore._SECTIONS:
            return self._json(200, {"success": self.store.update(head, body)})
        return self._json(404, {"error": "unknown endpoint"})

    def do_DELETE(self):
        head, arg, _ = self._route()
        if head in ConfigStore._SECTIONS and arg is not None:
            try:
                obj_id = int(arg)
            except ValueError:
                return self._json(400, {"Error": f"bad id {arg!r}"})
            return self._json(200, {"success": self.store.delete(head, obj_id)})
        return self._json(404, {"error": "unknown endpoint"})


class ConfigAPI:
    """Own-thread control-plane HTTP server over a ConfigStore."""

    def __init__(
        self,
        store: ConfigStore,
        host: str = "127.0.0.1",
        port: int = 0,
        job_health: Callable[[], list[dict]] | None = None,
    ):
        handler = type(
            "BoundConfigHandler", (_ConfigHandler,), {"store": store, "job_health": staticmethod(job_health) if job_health else None}
        )
        self._httpd = ThreadingHTTPServer((host, port), handler)
        self._thread = threading.Thread(target=self._httpd.serve_forever, daemon=True)

    @property
    def address(self) -> str:
        host, port = self._httpd.server_address[:2]
        return f"http://{host}:{port}"

    def start(self) -> "ConfigAPI":
        self._thread.start()
        return self

    def stop(self):
        self._httpd.shutdown()
        self._httpd.server_close()
        self._thread.join(timeout=5)
