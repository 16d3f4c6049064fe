"""Plan inspection & audit utilities (see audit.py)."""

from .audit import (  # noqa: F401
    count_shuffles,
    formatted_plan,
    has_broadcast_join,
    pushed_filters,
    read_schema,
    uses_python_eval,
)
