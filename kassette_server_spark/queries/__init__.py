"""Declared query surface.

Importing this package populates ``REGISTRY`` with every declared
operator query (SURVEY.md §2.2 relational/parity set + §2.3 north-star
LLM-pipeline operators). ``all_specs()`` is what ``__spark_entry__``
exposes to the driver.
"""

from __future__ import annotations

from .base import REGISTRY, QuerySpec

# Import for registration side effects.
from . import relational as _relational  # noqa: F401,E402
from . import parity as _parity  # noqa: F401,E402
from . import pipeline_e2e as _pipeline_e2e  # noqa: F401,E402
from . import olap as _olap  # noqa: F401,E402
from . import text_extra as _text_extra  # noqa: F401,E402
from . import tpch as _tpch  # noqa: F401,E402

try:  # north-star ops land incrementally; keep the core importable
    from . import llmops as _llmops  # noqa: F401,E402
except ImportError:
    _llmops = None


def all_specs() -> dict[str, QuerySpec]:
    return REGISTRY.specs
