"""Kassette type-coercion expression library (SURVEY.md §1.2).

Reproduces the reference's `Convert(value, type) → (value, ok)` \
semantics as Spark Column expressions over VARIANT values. The
reference dispatches on the *runtime* JSON type of each value
(sources/camunda/transformer.go:11-104, identical in
sources/postgres/transformer.go and integrations/postgres/
transformer.go; integrations/powerbi/transformer.go:11-42 toNumber;
integrations/anaplan/transformer.go:59-61 toDate), which Spark's
VariantType preserves exactly — so each coercion is a `CASE` over
`schema_of_variant`:

- toInt:   bool→1/0; number→truncate toward zero; string via strict
           integer parse (fail ⇒ not ok); other ⇒ not ok
- toFloat: bool→1.0/0.0; number widens; string via float parse
- toBool:  string ⇒ (s == 'true'), always ok; bool passthrough;
           other ⇒ not ok
- toString: always ok (Go fmt %v; we match for scalar types —
           integral numbers render without '.0')
- toDateTime/toDate (source side): strings ONLY, strict layout
           yyyy-MM-dd'T'HH:mm:ss.SSS'Z' (Go layout
           2006-01-02T15:04:05.000Z), anything else ⇒ not ok
- dest-side datetime/date format back to string layouts

Failure contract ("ok=false"): the caller decides — source-side drops
the field, dest-side writes null (processor/transformer.go:118-120,
168-173). Here every coercion returns `(value, ok)` as two Columns.

All expressions are JVM-side (no UDFs) and therefore codegen-able at
100 TB scale.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TS_LAYOUT = "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'"
DATE_LAYOUT = "yyyy-MM-dd"

# kassette type → converter key, per system (reference type maps):
# sources/types.go:4-12, integrations/postgres/main.go:14-25,
# integrations/powerbi/main.go:15-20, integrations/anaplan/main.go:17-23,
# integrations/keen/main.go:15-19.
TYPE_MAP_SOURCE = {
    "INT": "int",
    "FLOAT": "float64",
    "BOOLEAN": "bool",
    "STRING": "string",
    "TIMESTAMP": "datetime",
    "DATE": "date",
}
TYPE_MAP_POSTGRES = {
    "INT": "int",
    "FLOAT": "float64",
    "BOOLEAN": "bool",
    "SERIAL": "int",
    "BIGSERIAL": "int64",
    "VARCHAR": "string",
    "TEXT": "string",
    "JSONB": "string",
    "TIMESTAMP": "datetime",
}
TYPE_MAP_POWERBI = {"NUMBER": "number", "TEXT": "string", "DATETIME": "datetime"}
TYPE_MAP_ANAPLAN = {"NUMBER": "number", "BOOLEAN": "bool", "TEXT": "string", "DATE": "date"}
TYPE_MAP_KEEN = {"NUMBER": "number", "TEXT": "string", "DATETIME": "datetime"}

DEST_TYPE_MAPS = {
    "postgres": TYPE_MAP_POSTGRES,
    "powerbi": TYPE_MAP_POWERBI,
    "anaplan": TYPE_MAP_ANAPLAN,
    "keen": TYPE_MAP_KEEN,
}

_INT_RE = r"^[+-]?[0-9]+$"


def _typeof(v: Column) -> Column:
    return F.schema_of_variant(v)


def _is_number(t: Column) -> Column:
    return t.isin("BIGINT", "INT", "SMALLINT", "TINYINT", "DOUBLE", "FLOAT") | t.startswith(
        "DECIMAL"
    )


def _as_double(v: Column) -> Column:
    return F.try_variant_get(v, "$", "double")


def _as_string(v: Column) -> Column:
    return F.try_variant_get(v, "$", "string")


def _as_bool(v: Column) -> Column:
    return F.try_variant_get(v, "$", "boolean")


def to_int(v: Column) -> tuple[Column, Column]:
    t = _typeof(v)
    s = _as_string(v)
    # the regex excludes floats (the reference's strconv.ParseInt
    # rejects "1.5"); try_cast additionally rejects BIGINT overflow —
    # plain cast('long') returns NULL for '99999999999999999999' while
    # still reporting ok=true, silently dropping the reference's
    # parse-failure (field dropped) semantics
    str_ok = (t == "STRING") & s.rlike(_INT_RE) & s.try_cast("long").isNotNull()
    val = (
        F.when(t == "BOOLEAN", _as_bool(v).cast("long"))
        .when(_is_number(t), _as_double(v).cast("long"))  # truncates toward 0
        .when(str_ok, s.cast("long"))
    )
    ok = (t == "BOOLEAN") | _is_number(t) | str_ok
    return val, ok


def to_float(v: Column) -> tuple[Column, Column]:
    t = _typeof(v)
    parsed = _as_string(v).try_cast("double")
    val = (
        F.when(t == "BOOLEAN", _as_bool(v).cast("double"))
        .when(_is_number(t), _as_double(v))
        .when((t == "STRING") & parsed.isNotNull(), parsed)
    )
    ok = (t == "BOOLEAN") | _is_number(t) | ((t == "STRING") & parsed.isNotNull())
    return val, ok


def to_bool(v: Column) -> tuple[Column, Column]:
    t = _typeof(v)
    val = F.when(t == "BOOLEAN", _as_bool(v)).when(t == "STRING", _as_string(v) == "true")
    ok = t.isin("BOOLEAN", "STRING")
    return val, ok


def to_number(v: Column) -> tuple[Column, Column]:
    """PowerBI/Anaplan/Keen toNumber: like toFloat (numerics widen,
    bool→1/0, string float-parse)."""
    return to_float(v)


def to_string(v: Column) -> tuple[Column, Column]:
    t = _typeof(v)
    d = _as_double(v)
    num_str = F.when(d == d.cast("long").cast("double"), d.cast("long").cast("string")).otherwise(
        d.cast("string")
    )
    val = (
        F.when(t == "STRING", _as_string(v))
        .when(t == "BOOLEAN", _as_bool(v).cast("string"))
        .when(_is_number(t), num_str)
        .otherwise(F.to_json(v))  # OBJECT/ARRAY: JSON text (Go prints %v map syntax)
    )
    return val, F.lit(True)


def to_datetime_src(v: Column) -> tuple[Column, Column]:
    t = _typeof(v)
    parsed = F.try_to_timestamp(_as_string(v), F.lit(TS_LAYOUT))
    val = F.when((t == "STRING") & parsed.isNotNull(), parsed)
    ok = (t == "STRING") & parsed.isNotNull()
    return val, ok


# reference toDate parses the same full layout (sources/camunda/
# transformer.go:92-104) — it is toDateTime under another name
to_date_src = to_datetime_src


def format_datetime_dest(ts: Column) -> Column:
    """Dest-side datetime → canonical string layout
    (integrations/postgres/transformer.go:78-80)."""
    return F.date_format(ts, TS_LAYOUT)


def format_date_dest(ts: Column) -> Column:
    """Anaplan toDate → 'yyyy-MM-dd' (integrations/anaplan/transformer.go:59-61)."""
    return F.date_format(ts, DATE_LAYOUT)


_SRC_CONVERTERS = {
    "int": to_int,
    "int64": to_int,
    "float64": to_float,
    "float32": to_float,
    "bool": to_bool,
    "string": to_string,
    "number": to_number,
    "datetime": to_datetime_src,
    "date": to_date_src,
}


def convert_source(v: Column, go_type: str) -> tuple[Column, Column]:
    """Source-side Convert dispatch (sources/*/transformer.go Convert)."""
    fn = _SRC_CONVERTERS.get(go_type)
    if fn is None:
        # unknown go type: reference switch falls through with
        # (nil, false) → field dropped
        return F.lit(None), F.lit(False)
    return fn(v)


def convert_dest(value: Column, dtype: str, go_type: str) -> tuple[Column, Column]:
    """Dest-side Convert over the *typed* source-cast value.

    After the source cast the value is a typed Spark column; ``dtype``
    is its Spark simple type name (``bigint``/``double``/``boolean``/
    ``string``/``timestamp``), so the Go runtime-type switch in
    integrations/*/transformer.go becomes a *static* dispatch here —
    zero per-row type inspection. Semantics per branch mirror the
    reference exactly (toInt/toFloat/toBool/toString/toDateTime).

    Divergence (documented): Go's toString on a time.Time prints the Go
    default format; we emit the canonical kassette layout instead.
    """
    num = dtype in ("bigint", "long", "int", "double", "float", "smallint", "tinyint")
    if go_type in ("int", "int64"):
        if dtype == "boolean":
            return value.cast("long"), F.lit(True)
        if num:
            return value.cast("long"), F.lit(True)  # truncates toward 0
        if dtype == "string":
            v = F.when(value.rlike(_INT_RE), value.try_cast("long"))
            return v, value.rlike(_INT_RE) & value.isNotNull()
        return F.lit(None).cast("long"), F.lit(False)
    if go_type in ("float64", "float32", "number"):
        if dtype == "boolean":
            return value.cast("double"), F.lit(True)
        if num:
            return value.cast("double"), F.lit(True)
        if dtype == "string":
            v = value.try_cast("double")
            return v, v.isNotNull()
        return F.lit(None).cast("double"), F.lit(False)
    if go_type == "bool":
        if dtype == "boolean":
            return value, F.lit(True)
        if dtype == "string":
            return value == "true", value.isNotNull()
        return F.lit(None).cast("boolean"), F.lit(False)
    if go_type == "string":
        if dtype == "timestamp":
            return format_datetime_dest(value), F.lit(True)
        return value.cast("string"), F.lit(True)
    if go_type == "datetime":
        if dtype == "timestamp":
            return format_datetime_dest(value), F.lit(True)
        return F.lit(None).cast("string"), F.lit(False)
    if go_type == "date":
        if dtype == "timestamp":
            return format_date_dest(value), F.lit(True)
        return F.lit(None).cast("string"), F.lit(False)
    return F.lit(None), F.lit(False)
