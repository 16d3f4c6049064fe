"""Config store (S6): load source/destination/connection config from
JSON, diff against the previous snapshot, publish changes.

The reference polls Postgres every 5 s, deep-equal diffs, and fires a
pub-sub event (backendconfig/configdb.go:83-94, 494-524; utils/
pubsub.go). The engine loads config from a JSON document (file or
string), converts to the typed model, and `diff` reports added/
removed/changed connection ids so a supervisor can restart the
affected streaming queries — config never flows through executors
except as broadcast literals compiled into plans.
"""

from __future__ import annotations

import json
from dataclasses import dataclass

from ..config import Connection, DestinationConfig, Schema, SourceConfig


def _schema(obj: dict | None) -> Schema:
    if not obj:
        return Schema()
    return Schema.from_json(json.dumps(obj)) if isinstance(obj, dict) else Schema.from_json(obj)


def parse_config(doc: str | dict) -> dict[int, Connection]:
    """Parse {"sources":[...], "destinations":[...], "connections":[...]}
    into Connection objects keyed by id."""
    if isinstance(doc, str):
        doc = json.loads(doc)
    sources = {
        s["id"]: SourceConfig(
            id=s["id"],
            name=s.get("name", ""),
            write_key=s.get("write_key", ""),
            schema=_schema(s.get("schema")),
            skip_with_no_schema=bool(s.get("skip_with_no_schema", False)),
            access=s.get("access", "Rest"),
            config=s.get("config", {}),
        )
        for s in doc.get("sources", [])
    }
    dests = {
        d["id"]: DestinationConfig(
            id=d["id"],
            name=d.get("name", ""),
            dest_type=d.get("type", "postgres"),
            schema=_schema(d.get("schema")),
            skip_with_no_schema=bool(d.get("skip_with_no_schema", True)),
            config=d.get("config", {}),
        )
        for d in doc.get("destinations", [])
    }
    conns: dict[int, Connection] = {}
    for c in doc.get("connections", []):
        conns[c["id"]] = Connection(
            id=c["id"],
            source=sources[c["source_id"]],
            destination=dests[c["destination_id"]],
            transforms=tuple(c.get("transforms", ())),
            enabled=bool(c.get("enabled", True)),
        )
    return conns


@dataclass(frozen=True)
class ConfigDiff:
    added: tuple[int, ...]
    removed: tuple[int, ...]
    changed: tuple[int, ...]

    @property
    def empty(self) -> bool:
        return not (self.added or self.removed or self.changed)


def diff(old: dict[int, Connection], new: dict[int, Connection]) -> ConfigDiff:
    """Deep-equal diff (the reference's reflect.DeepEqual poll). The
    supervisor restarts streaming queries for changed/added ids and
    stops removed ones."""
    added = tuple(sorted(set(new) - set(old)))
    removed = tuple(sorted(set(old) - set(new)))
    changed = tuple(sorted(i for i in set(old) & set(new) if old[i] != new[i]))
    return ConfigDiff(added, removed, changed)
