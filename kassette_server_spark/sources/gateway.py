"""Gateway ingest shim (S1/S2 + R6 + T3): accepts event payloads the
way the reference's HTTP gateway does and lands them as JSONL files —
the durable hand-off the streaming engine consumes.

Reproduced semantics (gateway/gateway.go):
- write-key authentication before enqueue (656-693);
- non-batch requests wrapped into batch[0] with the request type
  stamped (1102-1115);
- envelope enrichment: writeKey, requestIP, receivedAt (970-973);
- request batching: flush at max_batch or timeout (144-165, 32/2000ms
  defaults from config.yaml:13-15) — here flush writes one JSONL file,
  whose arrival triggers the streaming micro-batch.

The shim itself is transport-agnostic (the engine contract is the
landing zone; a Kafka producer writing the same shape plugs in).
``http_listener.IngestListener`` puts the reference's actual HTTP
surface (POST /v1/{batch,track,...}, basic-auth write keys —
gateway/gateway.go:606-693) in front of it over a real socket.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from dataclasses import dataclass, field
from datetime import datetime, timezone


def _rfc3339_milli(dt: datetime) -> str:
    return dt.astimezone(timezone.utc).strftime("%Y-%m-%dT%H:%M:%S.") + f"{dt.microsecond // 1000:03d}Z"


@dataclass
class GatewayShim:
    landing_dir: str
    valid_write_keys: frozenset[str]
    max_batch: int = 32  # gateway.maxBatchSize
    batch_timeout_ms: int = 2000  # gateway.batchTimeoutInMS
    clock: object = None  # injectable for tests: () -> datetime
    _buffer: list[str] = field(default_factory=list)
    _last_flush: float = field(default_factory=time.monotonic)

    def _now(self) -> datetime:
        return self.clock() if self.clock else datetime.now(timezone.utc)

    def accept(
        self,
        body: dict,
        write_key: str,
        request_ip: str = "",
        req_type: str = "batch",
    ) -> bool:
        """One request → enqueued envelope line. Returns False (reject)
        on bad write key, like the 401 path."""
        if write_key not in self.valid_write_keys:
            return False
        if req_type != "batch" or "batch" not in body:
            # wrap single event, stamping the request type
            event = dict(body)
            if req_type != "batch":
                event["type"] = req_type
            body = {"batch": [event]}
        envelope = dict(body)
        envelope["writeKey"] = write_key
        envelope["requestIP"] = request_ip
        envelope["receivedAt"] = _rfc3339_milli(self._now())
        self._buffer.append(json.dumps({"payload": json.dumps(envelope)}))
        if len(self._buffer) >= self.max_batch or self._elapsed_ms() >= self.batch_timeout_ms:
            self.flush()
        return True

    def _elapsed_ms(self) -> float:
        return (time.monotonic() - self._last_flush) * 1000

    def flush(self) -> str | None:
        """Write buffered envelopes as one JSONL landing file (atomic
        rename so the streaming source never sees partial files)."""
        if not self._buffer:
            return None
        os.makedirs(self.landing_dir, exist_ok=True)
        name = f"batch-{int(time.time() * 1000)}-{uuid.uuid4().hex[:8]}.json"
        tmp = os.path.join(self.landing_dir, "." + name + ".tmp")
        final = os.path.join(self.landing_dir, name)
        with open(tmp, "w") as f:
            f.write("\n".join(self._buffer) + "\n")
        os.rename(tmp, final)
        self._buffer.clear()
        self._last_flush = time.monotonic()
        return final
