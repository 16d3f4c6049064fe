"""Lagged-window REST poller as a PySpark custom DataSource (S3 in
SURVEY §2.1; sources/camunda/extract.go:40-178 + the ticker in
gateway/gateway.go:226-294).

The reference pulls `[t−history, t−history+interval)` windows from the
Camunda history API on a wall-clock ticker — restarts can double-pull
or gap because `t` comes from time.Now() (gateway.go:277). Re-expressed
as a Structured Streaming micro-batch `DataSource`, the poll window IS
the offset: `initialOffset → latestOffset` advance by `interval`
minutes lagged by `history` minutes, checkpointed by the engine —
exactly-once window accounting the reference lacks.

The HTTP fetch is injectable (`fetcher(api, window_from, window_to) →
list[json-str]`): no network in this environment; tests use a
deterministic fake; production supplies a urllib-based one. Rows are
tagged `kassetteType=<api>` like the reference (extract.go:117-121).
"""

from __future__ import annotations

import json
from collections.abc import Callable, Iterator, Sequence
from dataclasses import dataclass
from datetime import datetime, timedelta, timezone

try:  # PySpark 4 python data source API
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceStreamReader,
        InputPartition,
    )

    HAVE_DATASOURCE_API = True
except ImportError:  # pragma: no cover
    DataSource = object  # type: ignore[assignment,misc]
    DataSourceStreamReader = object  # type: ignore[assignment,misc]
    InputPartition = object  # type: ignore[assignment,misc]
    HAVE_DATASOURCE_API = False

Fetcher = Callable[[str, datetime, datetime], Sequence[str]]

POLLER_SCHEMA = "payload string, kassette_type string, window_from timestamp, window_to timestamp"

DEFAULT_APIS = ("activity-instance", "process-instance")


def _as_naive_utc(dt: datetime) -> datetime:
    """Normalize to naive UTC. A tz-aware input is CONVERTED
    (astimezone), never stripped — replace(tzinfo=None) alone would
    shift the window by the offset; and mixing aware/naive datetimes
    in offset arithmetic raises TypeError."""
    if dt.tzinfo is not None:
        dt = dt.astimezone(timezone.utc).replace(tzinfo=None)
    return dt


@dataclass
class PollWindow:
    start: datetime
    interval_min: int

    def advance(self) -> "PollWindow":
        return PollWindow(self.start + timedelta(minutes=self.interval_min), self.interval_min)


def compute_window(now: datetime, history_min: int, interval_min: int) -> tuple[datetime, datetime]:
    """The reference's lagged window, truncated to the minute
    (extract.go:149-156): [now−history, now−history+interval)."""
    base = now.replace(second=0, microsecond=0) - timedelta(minutes=history_min)
    return base, base + timedelta(minutes=interval_min)


class _WindowPartition(InputPartition):
    def __init__(self, api: str, start_iso: str, end_iso: str):
        self.api = api
        self.start_iso = start_iso
        self.end_iso = end_iso


class RestPollerStreamReader(DataSourceStreamReader):
    """Micro-batch reader whose offset is the poll-window start time."""

    def __init__(self, schema, options, fetcher: Fetcher):
        self._options = options
        self._fetcher = fetcher
        self._interval = int(options.get("interval_min", 1))
        start = options.get("start")
        if start is None:
            raise ValueError("rest_poller requires a 'start' option (ISO timestamp)")
        # _initial is the configured stream start (immutable — Spark may
        # call latestOffset() BEFORE initialOffset(), so the advancing
        # cursor must never leak into the initial offset); _cursor is
        # the high-water mark latestOffset advances.
        self._initial = _as_naive_utc(datetime.fromisoformat(start))
        self._cursor = self._initial
        self._apis = tuple(
            a for a in options.get("apis", ",".join(DEFAULT_APIS)).split(",") if a
        )
        self._max_windows = int(options.get("max_windows", 1))
        # the reference's lagged window: never poll windows newer than
        # now − history (gives the upstream API time to settle); also
        # prevents committing FUTURE windows whose data would be skipped
        self._history = int(options.get("history_min", 0))
        # injectable clock for tests: ISO timestamp pinning "now"
        self._now_override = options.get("now")

    def _now(self) -> datetime:
        if self._now_override:
            return _as_naive_utc(datetime.fromisoformat(self._now_override))
        return datetime.utcnow()

    def initialOffset(self) -> dict:
        return {"window_start": self._initial.isoformat()}

    def latestOffset(self) -> dict:
        # advance up to max_windows per micro-batch (backpressure),
        # clamped so no window extends past now − history: polling must
        # trail the wall clock or committed-but-empty future windows
        # would be permanently skipped
        horizon = (self._now() - timedelta(minutes=self._history)).replace(
            second=0, microsecond=0
        )
        target = self._cursor + timedelta(minutes=self._interval * self._max_windows)
        if target > horizon:
            whole = int((horizon - self._cursor).total_seconds() // (self._interval * 60))
            target = self._cursor + timedelta(minutes=self._interval * max(whole, 0))
        self._cursor = max(self._cursor, target)
        return {"window_start": self._cursor.isoformat()}

    def partitions(self, start: dict, end: dict):
        s = datetime.fromisoformat(start["window_start"])
        e = datetime.fromisoformat(end["window_start"])
        parts = []
        w = s
        while w < e:  # e ≤ s (e.g. restart rewound latest) → no work
            nxt = w + timedelta(minutes=self._interval)
            for api in self._apis:
                parts.append(_WindowPartition(api, w.isoformat(), nxt.isoformat()))
            w = nxt
        self._cursor = max(self._cursor, e)
        return parts

    def commit(self, end: dict) -> None:
        pass  # engine-side checkpoint is the durable state

    def read(self, partition: _WindowPartition) -> Iterator[tuple]:
        w_from = datetime.fromisoformat(partition.start_iso)
        w_to = datetime.fromisoformat(partition.end_iso)
        for payload in self._fetcher(partition.api, w_from, w_to):
            yield (payload, partition.api, w_from, w_to)


def make_poller_datasource(fetcher: Fetcher):
    """Build a DataSource class bound to a fetcher (classes are
    registered by name with spark.dataSource.register)."""

    class RestPollerDataSource(DataSource):
        @classmethod
        def name(cls) -> str:
            return "kassette_rest_poller"

        def schema(self) -> str:
            return POLLER_SCHEMA

        def streamReader(self, schema):
            return RestPollerStreamReader(schema, self.options, fetcher)

    return RestPollerDataSource


def fake_camunda_fetcher(api: str, w_from: datetime, w_to: datetime) -> list[str]:
    """Deterministic stand-in for the Camunda history API: N events per
    window derived from the window timestamp (tests + demos)."""
    out = []
    for i in range(3):
        ts = w_from + timedelta(seconds=20 * i)
        out.append(
            json.dumps(
                {
                    "batch": [
                        {
                            "event_id": f"{api}-{int(w_from.timestamp())}-{i}",
                            "kassetteType": api,
                            "userId": f"u{i}",
                            "originalTimestamp": ts.strftime("%Y-%m-%dT%H:%M:%S.000Z"),
                            "sentAt": ts.strftime("%Y-%m-%dT%H:%M:%S.000Z"),
                        }
                    ],
                    "writeKey": "wk",
                    "requestIP": "127.0.0.1",
                    "receivedAt": w_to.strftime("%Y-%m-%dT%H:%M:%S.000Z"),
                }
            )
        )
    return out
