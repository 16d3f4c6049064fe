"""Physical-plan inspection helpers.

The engine treats plan properties as part of its contract: a filter
that stops pushing down or a dimension that stops broadcasting is a
performance regression even while results stay correct. These helpers
give tests (tests/test_plans.py) and ad-hoc tuning sessions a stable
API over ``explain("formatted")`` output.
"""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across the plan's scans."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[(.*?)\]", formatted_plan(df)):
        out.extend(s.strip() for s in m.group(1).split(",") if s.strip())
    return out


def read_schema(df: DataFrame) -> list[str]:
    """Column names read from the scans (projection-pruning check)."""
    cols: list[str] = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", formatted_plan(df)):
        cols.extend(part.split(":")[0].strip() for part in m.group(1).split(",") if part)
    return cols


def count_shuffles(df: DataFrame) -> int:
    """Number of exchange operators in the tree section (each is a full
    shuffle of its input — the scale currency)."""
    tree = formatted_plan(df).split("\n\n")[0]
    return len(re.findall(r"\bExchange\b", tree))


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df) or "BroadcastNestedLoopJoin" in formatted_plan(df)


def uses_python_eval(df: DataFrame) -> bool:
    """True if any Python UDF evaluation appears — the engine's hot
    paths must keep this False (Arrow/pandas paths are deliberate and
    isolated to multimodal/stateful operators)."""
    p = formatted_plan(df)
    return "BatchEvalPython" in p or "ArrowEvalPython" in p
