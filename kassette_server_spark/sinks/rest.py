"""REST destination sinks — the K4 (PowerBI), K5 (Anaplan), K6 (Keen)
shapes from SURVEY §2.1, as foreachBatch writers.

Shapes (payload contracts from the reference):
- PowerBI/Keen: flatten BatchPayloadT[] → one JSON array of events,
  HTTP send with configured method/url/query/headers; non-200/202 ⇒
  whole batch failed (integrations/powerbi/main.go:97-128,
  integrations/keen/main.go:97-127).
- Anaplan: each event wrapped {"code": <uuid>, "properties": event}
  under {"items": [...]}; response {added, failures:[indices]} — the
  failed *indices* become retry rows (integrations/anaplan/
  main.go:132-225). Token auth with periodic refresh (main.go:227-280)
  becomes a lazily-refreshed token supplier on the task.

Transport is injectable (``send(url, method, headers, body) →
(status, response_body)``) because this environment has no network —
tests use a recording fake; production plugs urllib/requests.

Delivery/ordering at scale: the reference serializes per destination
with a mutex (router/router.go:187-200). Here each micro-batch is
repartitioned to one task per destination — same serialization, but
across destinations it parallelizes on the cluster. At-least-once
with ledger dedup on message_id = effective exactly-once (the honest
REST contract; SURVEY §7 risk register).
"""

from __future__ import annotations

import json
import uuid
from collections.abc import Callable, Iterator
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Row

Transport = Callable[[str, str, dict, bytes], tuple[int, bytes]]


def urllib_transport(url: str, method: str, headers: dict, body: bytes) -> tuple[int, bytes]:
    """Real-socket Transport over stdlib urllib (no extra deps).

    Used in production and by the in-process http.server integration
    tests; unit tests keep injecting recording fakes. Network errors
    surface as status 0 so the sender marks the batch failed/retryable
    rather than crashing the task."""
    import urllib.error
    import urllib.request

    req = urllib.request.Request(url, data=body, method=method)
    for k, v in (headers or {}).items():
        req.add_header(k, v)
    if body and not req.has_header("Content-type"):
        req.add_header("Content-Type", "application/json")
    try:
        with urllib.request.urlopen(req, timeout=30) as resp:
            return resp.status, resp.read()
    except urllib.error.HTTPError as e:  # non-2xx still has a body
        return e.code, e.read()
    except (urllib.error.URLError, OSError) as e:
        return 0, str(e).encode()


class TokenAuthTransport:
    """Wrap a Transport with bearer-token auth on the Anaplan contract.

    The reference keeps tokens fresh two ways: a background ticker
    re-authenticates every ``tokenRefreshInterval`` (20 s) seconds via
    the refresh endpoint, falling back to full basic auth when the
    refresh fails (integrations/anaplan/main.go:115-130, 77-113), and
    delivery still survives an expired token because failures re-queue.
    Executors must not run background threads, so the engine folds the
    ticker into the send path: before each request, a token older than
    ``refresh_interval_s`` is refreshed PROACTIVELY (refresh endpoint
    first, full auth as fallback — the authenticate(true)/(false)
    ladder); a 401 still triggers one reactive refresh + retry as a
    belt-and-braces.

    Lives ON THE TASK (one instance per partition-sender closure), so
    each executor refreshes independently — no driver round-trip, no
    shared mutable state across tasks."""

    def __init__(
        self,
        inner: Transport,
        auth_url: str,
        auth_headers: dict | None = None,
        refresh_url: str | None = None,
        refresh_interval_s: float = 20.0,
        clock: Callable[[], float] | None = None,
    ):
        import time

        self._inner = inner
        self._auth_url = auth_url
        self._auth_headers = dict(auth_headers or {})
        self._refresh_url = refresh_url
        self._interval = refresh_interval_s
        self._clock = clock or time.monotonic
        self._token: str | None = None
        self._fetched_at: float = 0.0

    @staticmethod
    def _parse_token(body: bytes) -> str:
        # reference shape: {"tokenInfo": {"tokenValue": ...}}
        doc = json.loads(body)
        return doc.get("tokenInfo", {}).get("tokenValue") or doc["token"]

    def _fetch_token(self) -> str:
        """authenticate(false): full basic auth against the auth URL."""
        status, body = self._inner(self._auth_url, "POST", self._auth_headers, b"")
        if status != 200:
            raise RuntimeError(f"token auth failed: {status}")
        self._fetched_at = self._clock()
        return self._parse_token(body)

    def _refresh_token(self) -> str:
        """authenticate(true): POST the refresh URL bearing the current
        token; any failure falls back to full auth (main.go:121-127)."""
        if self._refresh_url is None or self._token is None:
            return self._fetch_token()
        h = dict(self._auth_headers)
        h["Authorization"] = f"AnaplanAuthToken {self._token}"
        status, body = self._inner(self._refresh_url, "POST", h, b"")
        if status != 200:
            return self._fetch_token()
        try:
            token = self._parse_token(body)
        except (ValueError, KeyError):
            return self._fetch_token()
        self._fetched_at = self._clock()
        return token

    def __call__(self, url: str, method: str, headers: dict, body: bytes) -> tuple[int, bytes]:
        if self._token is None:
            self._token = self._fetch_token()
        elif self._clock() - self._fetched_at >= self._interval:
            # proactive pre-refresh: the reference's 20 s ticker cadence,
            # evaluated at send time instead of on a background thread
            self._token = self._refresh_token()
        h = dict(headers or {})
        h["Authorization"] = f"AnaplanAuthToken {self._token}"
        status, resp = self._inner(url, method, h, body)
        if status == 401:  # expired despite pre-refresh → once more, reactively
            self._token = self._fetch_token()
            h["Authorization"] = f"AnaplanAuthToken {self._token}"
            status, resp = self._inner(url, method, h, body)
        return status, resp


@dataclass
class RestSinkConfig:
    url: str
    method: str = "POST"
    headers: dict = field(default_factory=dict)
    query: str = ""
    batch_size: int = 500  # events per HTTP request


def _http_ok(status: int) -> bool:
    return status in (200, 202)


def powerbi_send_partition(
    rows: Iterator[Row], cfg: RestSinkConfig, transport: Transport, json_col: str = "event_json"
) -> Iterator[tuple[str, bool, int, str]]:
    """One partition → batched HTTP posts of JSON arrays.

    Yields (message_id, delivered, status, error) per event — consumed
    into ledger statuses. Runs on the executor; nothing is collected
    to the driver.
    """
    buf: list[Row] = []

    def flush() -> Iterator[tuple[str, bool, int, str]]:
        if not buf:
            return
        body = ("[" + ",".join(r[json_col] for r in buf) + "]").encode()
        url = cfg.url + (("?" + cfg.query) if cfg.query else "")
        status, resp = transport(url, cfg.method, cfg.headers, body)
        ok = _http_ok(status)
        err = "" if ok else resp.decode("utf-8", "replace")[:512]
        for r in buf:
            yield (r["message_id"], ok, status, err)
        buf.clear()

    for row in rows:
        buf.append(row)
        if len(buf) >= cfg.batch_size:
            yield from flush()
    yield from flush()


def anaplan_send_partition(
    rows: Iterator[Row], cfg: RestSinkConfig, transport: Transport, json_col: str = "event_json"
) -> Iterator[tuple[str, bool, int, str]]:
    """Anaplan item shape with per-index failure mapping
    (integrations/anaplan/main.go:132-225). The item ``code`` uuid is
    the idempotency key the reference generates per send."""
    buf: list[Row] = []

    def flush() -> Iterator[tuple[str, bool, int, str]]:
        if not buf:
            return
        items = [
            {"code": str(uuid.uuid4()), "properties": json.loads(r[json_col])} for r in buf
        ]
        status, resp = transport(cfg.url, cfg.method, cfg.headers, json.dumps({"items": items}).encode())
        failed_idx: set[int] = set()
        if _http_ok(status):
            try:
                failed_idx = {int(i) for i in json.loads(resp).get("failures", [])}
            except (ValueError, AttributeError):
                failed_idx = set()
            for i, r in enumerate(buf):
                ok = i not in failed_idx
                yield (r["message_id"], ok, status, "" if ok else "anaplan item failure")
        else:
            err = resp.decode("utf-8", "replace")[:512]
            for r in buf:
                yield (r["message_id"], False, status, err)
        buf.clear()

    for row in rows:
        buf.append(row)
        if len(buf) >= cfg.batch_size:
            yield from flush()
    yield from flush()


keen_send_partition = powerbi_send_partition  # same contract (K6)

PARTITION_SENDERS = {
    "powerbi": powerbi_send_partition,
    "keen": keen_send_partition,
    "anaplan": anaplan_send_partition,
}


def deliver_rest(
    events: DataFrame,
    dest_type: str,
    cfg: RestSinkConfig,
    transport: Transport,
    single_task: bool = True,
) -> DataFrame:
    """Send a (micro-)batch to a REST destination; returns the delivery
    outcome DataFrame (message_id, delivered, status, error).

    single_task=True reproduces the reference's per-destination mutex
    ordering (router/router.go:187-200) with repartition(1); set False
    for destinations that tolerate parallel senders.
    """
    sender = PARTITION_SENDERS[dest_type]
    src = events.select("message_id", "event_json")
    if single_task:
        src = src.repartition(1)

    def run(rows: Iterator[Row]):
        yield from sender(rows, cfg, transport)

    rdd = src.rdd.mapPartitions(run)
    return events.sparkSession.createDataFrame(
        rdd, "message_id string, delivered boolean, status int, error string"
    )
