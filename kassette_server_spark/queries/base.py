"""Query registry plumbing.

Each declared operator (SURVEY.md §2.2 / §2.3) is a ``QuerySpec``:
a Spark callable ``(spark, sf_dir) -> DataFrame`` plus (where SQL can
express it) an equivalent DuckDB oracle SQL string. The driver runs
both at sf0.01 and compares row-count + schema + order-insensitive
value hash, so:

- every computed column is aliased identically on both sides;
- aggregates over doubles go through DECIMAL(18,2) (the test data is
  exact 2-decimal money) so the sum is exact and both engines emit the
  identical IEEE double — no float-summation-order flakiness;
- integer-ish functions (length/year/floor/...) are cast explicitly on
  both sides because Spark and DuckDB default to different widths.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL, or None → driver does rows-only check
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


class Registry:
    def __init__(self) -> None:
        self._specs: dict[str, QuerySpec] = {}

    def add(self, spec: QuerySpec) -> None:
        if spec.name in self._specs:
            raise ValueError(f"duplicate query name {spec.name!r}")
        self._specs[spec.name] = spec

    def query(
        self,
        name: str,
        oracle: str | None,
        doc: str = "",
        tags: tuple[str, ...] = (),
    ) -> Callable[[QueryFn], QueryFn]:
        """Decorator: register ``fn`` under ``name`` with its oracle SQL."""

        def wrap(fn: QueryFn) -> QueryFn:
            self.add(QuerySpec(name=name, fn=fn, oracle=oracle, doc=doc, tags=tags))
            return fn

        return wrap

    @property
    def specs(self) -> dict[str, QuerySpec]:
        return dict(self._specs)


REGISTRY = Registry()
query = REGISTRY.query
