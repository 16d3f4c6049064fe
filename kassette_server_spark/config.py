"""Control-plane config model.

Mirrors the reference's source/destination/connection tables
(backendconfig/types.go:115-171; schemas stored as JSON strings in the
instance config, parsed at processor/transformer.go:225-258). In this
engine a Connection compiles to one DataFrame transform (batch) or one
streaming query.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field


@dataclass(frozen=True)
class SchemaField:
    name: str
    type: str  # kassette type vocabulary (SURVEY §1.2)
    primary_key: bool = False


@dataclass(frozen=True)
class Schema:
    table_name: str = ""
    fields: tuple[SchemaField, ...] = ()

    @classmethod
    def from_json(cls, text: str | None) -> "Schema":
        """Parse the reference's schema JSON shape
        (integrations/types.go:3-12): {"table_name":..., "schema_fields":
        [{"name","type","primary_key"}]}."""
        if not text:
            return cls()
        obj = json.loads(text)
        return cls(
            table_name=obj.get("table_name", ""),
            fields=tuple(
                SchemaField(f["name"], f["type"], bool(f.get("primary_key", False)))
                for f in obj.get("schema_fields", [])
            ),
        )

    @property
    def empty(self) -> bool:
        return not self.fields

    def type_of(self, name: str) -> str | None:
        for f in self.fields:
            if f.name == name:
                return f.type
        return None


@dataclass(frozen=True)
class SourceConfig:
    """A source instance (backendconfig/types.go SourceT / SourceInstanceT)."""

    id: int
    name: str
    write_key: str = ""
    schema: Schema = field(default_factory=Schema)
    skip_with_no_schema: bool = False
    access: str = "Rest"  # Rest | DBPolling | Agent | AMQP (catalogue.yaml)
    config: dict = field(default_factory=dict)  # poller url/interval/history etc.


@dataclass(frozen=True)
class DestinationConfig:
    """A destination instance. dest_type selects the converter type map
    and the sink shape (postgres/powerbi/anaplan/keen/s3)."""

    id: int
    name: str
    dest_type: str
    schema: Schema = field(default_factory=Schema)
    skip_with_no_schema: bool = True  # postgres path sets this (processor/processor.go:254-257)
    config: dict = field(default_factory=dict)  # url/method/headers/credentials


@dataclass(frozen=True)
class Connection:
    """source → destination edge with its transform rules
    (connection.transforms JSONB array — backendconfig/configdb.go:119-176)."""

    id: int
    source: SourceConfig
    destination: DestinationConfig
    transforms: tuple[dict, ...] = ()
    enabled: bool = True
