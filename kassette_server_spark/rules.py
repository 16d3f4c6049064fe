"""Transform-rule compiler: field_map / field_hide / field_delete.

Reference semantics (processor/transformer.go:76-190), reproduced
exactly:

- rules run per event AFTER the source-side cast; a field whose source
  cast failed is invisible to the rules (transformer.go:118-120);
- ``field_map {from,to}`` renames; multiple matching rules → the LAST
  one wins (fieldName is overwritten per matching rule in order);
- ``field_hide {field}`` suppresses by ORIGINAL key; the system rule
  always hides ``anonymousId`` (transformer.go:21-27);
- ``field_delete {value}`` drops the WHOLE EVENT if ANY field's
  converted value equals the rule value — note the reference does NOT
  restrict the comparison to rule.Field (transformer.go:132-148): the
  switch compares every field's convertV. Comparison classes: int
  (rule value must parse as int), string (equality), bool ('true'/
  'false' literal match); float/timestamp values never match.

The compiler turns a rule list into (renames, hidden, delete-predicate
builder) consumed by pipeline.transform_for_connection — everything
stays a columnar expression.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F

FIELD_MAP = "field_map"
FIELD_HIDE = "field_hide"
FIELD_DELETE = "field_delete"

# system rule: always hide anonymousId (processor/transformer.go:21-27)
SYSTEM_RULES: tuple[dict, ...] = ({"type": FIELD_HIDE, "field": "anonymousId"},)


@dataclass(frozen=True)
class CompiledRules:
    renames: dict[str, str]  # original key -> output key
    hidden: frozenset[str]  # original keys suppressed
    delete_values: tuple[str, ...]  # raw rule.Value strings


def compile_rules(transforms: tuple[dict, ...] | list[dict], include_system: bool = True) -> CompiledRules:
    rules = list(transforms) + (list(SYSTEM_RULES) if include_system else [])
    renames: dict[str, str] = {}
    hidden: set[str] = set()
    deletes: list[str] = []
    for r in rules:
        rtype = r.get("type")
        if rtype == FIELD_MAP:
            # last matching rule wins — dict assignment in order does that
            renames[r["from"]] = r["to"]
        elif rtype == FIELD_HIDE:
            hidden.add(r["field"])
        elif rtype == FIELD_DELETE:
            deletes.append(str(r.get("value", "")))
    return CompiledRules(renames=renames, hidden=frozenset(hidden), delete_values=tuple(deletes))


def _int_or_none(s: str) -> int | None:
    try:
        return int(s)
    except ValueError:
        return None


def delete_predicate(value: Column, dtype: str, ok: Column, rule_value: str) -> Column:
    """True when this field's converted value matches one delete rule.

    ``dtype`` is the field's Spark type after source cast — the static
    analogue of the reference's runtime switch on convertV.
    """
    if dtype in ("bigint", "long", "int"):
        iv = _int_or_none(rule_value)
        if iv is None:
            return F.lit(False)
        return ok & (value == F.lit(iv))
    if dtype == "string":
        return ok & (value == F.lit(rule_value))
    if dtype == "boolean":
        if rule_value == "true":
            return ok & value
        if rule_value == "false":
            return ok & ~value
        return F.lit(False)
    if dtype == "variant":
        # passthrough (empty source schema): raw JSON values. Go sees
        # string/bool/float64 — float64 (all JSON numbers) has no case
        # in the delete switch, so only string/bool can match.
        t = F.schema_of_variant(value)
        s = F.try_variant_get(value, "$", "string")
        b = F.try_variant_get(value, "$", "boolean")
        pred = ((t == "STRING") & (s == F.lit(rule_value)))
        if rule_value == "true":
            pred = pred | ((t == "BOOLEAN") & b)
        if rule_value == "false":
            pred = pred | ((t == "BOOLEAN") & ~b)
        return ok & pred
    # float64 / timestamp: Go switch has no case for them → never delete
    return F.lit(False)
