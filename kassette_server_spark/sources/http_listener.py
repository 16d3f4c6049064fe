"""Minimal HTTP ingest listener (S1) in front of GatewayShim.

The reference's ingest surface is ``POST /extract``
(gateway/gateway.go:332 → ProcessRequest(c, "batch")) with the write
key as the basic-auth username and an empty password
(gateway.go:656-693); the body is the batch envelope (or a single
event, wrapped server-side). ``GET /health`` replies
``{"status":"ok"}`` (gateway.go:334-338). This listener reproduces
that surface over stdlib ThreadingHTTPServer — auth → wrap/enrich →
batched JSONL landing files — so the reference's curl-driven demo flow
(examples/camunda2postgres/scripts/restaurant_journey.sh) replays
verbatim against the engine's landing zone. As an engine EXTENSION
(not reference behavior) it also accepts ``/v1/{batch,identify,track,
page,screen,alias,group}`` and bare ``/<type>`` routes for
per-event-type clients. The Spark engine itself never serves HTTP;
the listener is control-plane glue in front of the durable hand-off,
matching the reference topology (gateway process → queue →
processor). The ``X-User-ID`` header is forwarded into the job row's
UserID (gateway.go:640, buildUserID).
"""

from __future__ import annotations

import base64
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from .gateway import GatewayShim

_TYPES = {"batch", "identify", "track", "page", "screen", "alias", "group"}


def _parse_write_key(auth_header: str | None) -> str | None:
    """Basic-auth username = write key, password ignored
    (gateway.go:656-668)."""
    if not auth_header or not auth_header.startswith("Basic "):
        return None
    try:
        decoded = base64.b64decode(auth_header[6:]).decode()
    except Exception:
        return None
    return decoded.split(":", 1)[0] or None


class _IngestHandler(BaseHTTPRequestHandler):
    shim: GatewayShim  # set by make_server
    lock: threading.Lock

    def log_message(self, *a):  # quiet
        pass

    def do_GET(self):
        # liveness probe, no auth (gateway/gateway.go:334 GET /health
        # replies {"status":"ok"})
        if self.path.split("?")[0].rstrip("/") in ("", "/health"):
            self._reply(200, b'{"status":"ok"}')
        else:
            self._reply(404, b'{"error":"unknown endpoint"}')

    def do_POST(self):
        parts = [p for p in self.path.split("?")[0].split("/") if p]
        # POST /extract is the reference's actual ingest route
        # (gateway/gateway.go:332 → ProcessRequest(c, "batch"));
        # /v1/<type> and bare /<type> are engine extensions.
        req_type = parts[-1] if parts else ""
        if req_type == "extract":
            req_type = "batch"
        if req_type not in _TYPES:
            self._reply(404, b'{"error":"unknown endpoint"}')
            return
        write_key = _parse_write_key(self.headers.get("Authorization"))
        if write_key is None:
            self._reply(401, b'{"error":"missing write key"}')
            return
        try:
            n = int(self.headers.get("Content-Length", 0))
            body = json.loads(self.rfile.read(n) or b"{}")
        except (ValueError, json.JSONDecodeError):
            self._reply(400, b'{"error":"invalid json"}')
            return
        ip = self.client_address[0]
        user_id_header = self.headers.get("X-User-ID", "")
        with self.lock:  # shim buffer is not thread-safe
            ok = self.shim.accept(
                body, write_key, request_ip=ip, req_type=req_type,
                user_id_header=user_id_header,
            )
        if not ok:
            self._reply(401, b'{"error":"invalid write key"}')
            return
        self._reply(200, b"OK")

    def _reply(self, status: int, body: bytes):
        self.send_response(status)
        self.send_header("Content-Type", "application/json" if body.startswith(b"{") else "text/plain")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)


#: POST path heads that belong to the ingest surface; anything else on
#: a unified listener falls through to the config control plane.
_INGEST_HEADS = {"extract", "v1"} | _TYPES


def _unified_post(self):
    parts = [p for p in self.path.split("?")[0].split("/") if p]
    head = parts[0] if parts else ""
    if head in _INGEST_HEADS or (parts and parts[-1] in _TYPES):
        return _IngestHandler.do_POST(self)
    from .config_api import _ConfigHandler

    return _ConfigHandler.do_POST(self)


def _unified_get(self):
    # bare "/" and /health keep the gateway's liveness shape; every
    # other GET (catalogue, CRUD reads, job status) is control plane
    if self.path.split("?")[0].rstrip("/") in ("", "/health"):
        return _IngestHandler.do_GET(self)
    from .config_api import _ConfigHandler

    return _ConfigHandler.do_GET(self)


class IngestListener:
    """Own-thread HTTP server bound to (host, port); port=0 picks a
    free port (tests). ``flush()``/``stop()`` drain the shim buffer so
    a trailing partial batch still lands.

    With ``config_store`` set, the SAME port also serves the config
    control plane (source/destination/connection CRUD, authenticate,
    service-catalogue, field-options, router-job-status) — the
    reference runs ONE gin server for ingest and config
    (gateway/gateway.go:324-610), so a client scripted against a
    single base URL works unchanged. Route sets are disjoint: POST
    {extract, v1/*, bare event types} is ingest, everything else is
    config."""

    def __init__(
        self,
        shim: GatewayShim,
        host: str = "127.0.0.1",
        port: int = 0,
        config_store=None,
        job_health=None,
    ):
        self._lock = threading.Lock()
        if config_store is None:
            handler = type(
                "BoundIngestHandler", (_IngestHandler,), {"shim": shim, "lock": self._lock}
            )
        else:
            from .config_api import _ConfigHandler

            handler = type(
                "BoundUnifiedHandler",
                (_IngestHandler, _ConfigHandler),
                {
                    "shim": shim,
                    "lock": self._lock,
                    "store": config_store,
                    "job_health": staticmethod(job_health) if job_health else None,
                    "do_POST": _unified_post,
                    "do_GET": _unified_get,
                },
            )
        self._shim = shim
        self._httpd = ThreadingHTTPServer((host, port), handler)
        self._thread = threading.Thread(target=self._httpd.serve_forever, daemon=True)

    @property
    def address(self) -> str:
        host, port = self._httpd.server_address[:2]
        return f"http://{host}:{port}"

    def start(self) -> "IngestListener":
        self._thread.start()
        return self

    def flush(self):
        # same lock as accept(): a handler thread appending between
        # flush's join and clear would otherwise lose its event
        # (round-6 self-review finding)
        with self._lock:
            self._shim.flush()

    def stop(self):
        self._httpd.shutdown()
        self._httpd.server_close()
        self._thread.join(timeout=5)
        with self._lock:
            self._shim.flush()
