"""Declared query surface.

Importing this package populates ``REGISTRY`` with every declared
operator query (SURVEY.md §2.2 relational/parity set + §2.3 north-star
LLM-pipeline operators). ``all_specs()`` is what ``__spark_entry__``
exposes to the driver.
"""

from __future__ import annotations

from .base import REGISTRY, QuerySpec

# Import for registration side effects. Any import error here must fail
# loudly — a swallowed ImportError would silently shrink the declared
# surface.
from . import relational as _relational  # noqa: F401,E402  (q01-q21)
from . import parity as _parity  # noqa: F401,E402  (q22-q27)
from . import pipeline_e2e as _pipeline_e2e  # noqa: F401,E402  (q28)
from . import llmops as _llmops  # noqa: F401,E402  (q30-q41, q52, q57-58, q66-68)
from . import tpch as _tpch  # noqa: F401,E402  (q53-q55)
from . import olap as _olap  # noqa: F401,E402  (q42-q51, q56, q59-q65, q69)
from . import text_extra as _text_extra  # noqa: F401,E402
from . import curation as _curation  # noqa: F401,E402  (q70-q74, q78-q82)
from . import analytics as _analytics  # noqa: F401,E402  (q75-q77, q83)

# The driver's correctness gate hash-checks only the FIRST 50 registered
# specs each round, so exposure order is a rotation schedule, not import
# order (VERDICT r2 "Next round #1/#2"). Slots 1-28 stay pinned to the
# core relational/parity/e2e contract; the remaining 22 rotate so every
# spec family earns a hard-signal row across rounds. Round-4 window:
# promote the round-2 curation/analytics family (q70-q83, previously
# repo-oracle only) and 8 never-checked OLAP extras; rotate out the
# twice-driver-green llmops/tpch specs (q30-q39, q41, q52-q58, q66-q68 —
# still locked by tests/test_oracle_parity*.py at sf0.001 AND sf0.01)
# and q40 (no-oracle by design: sketches can't hash-match — keeping it
# inside the window burns a slot that can never turn green).
_WINDOW: tuple[str, ...] = (
    # slots 1-28: pinned core surface (driver-green r1+r2)
    "q01_scan_filter",
    "q02_predicates",
    "q03_inner_join",
    "q04_multiway_broadcast_join",
    "q05_left_join",
    "q06_semi_join",
    "q07_anti_join",
    "q08_agg_having",
    "q09_count_distinct",
    "q10_rollup",
    "q11_window_rank",
    "q12_window_running_sum",
    "q13_window_lag",
    "q14_topk",
    "q15_setops",
    "q16_string_fns",
    "q17_date_fns",
    "q18_math_fns",
    "q19_case_nullif",
    "q20_json_extract",
    "q21_cast_semantics",
    "q22_rules_map_hide_delete",
    "q23_timestamp_skew",
    "q24_sessionize",
    "q25_dedup_exact",
    "q26_correlated_subquery",
    "q27_exists",
    "q28_pipeline_e2e",
    # slots 29-42: round-2 curation/analytics family (first driver check)
    "q70_benchmark_contamination",
    "q71_quality_filter",
    "q72_sequence_packing",
    "q73_tfidf_top_terms",
    "q74_ngram_novelty",
    "q75_funnel",
    "q76_retention_cohorts",
    "q77_quantized_ann",
    "q78_domain_mix",
    "q79_shuffle_shards",
    "q80_repetition_filter",
    "q81_pii_scrub",
    "q82_chunk_documents",
    "q83_semantic_dedup",
    # slots 43-50: OLAP extras never driver-checked before
    "q42_topk_per_group",
    "q43_pivot",
    "q44_cube",
    "q45_exact_median",
    "q46_histogram",
    "q48_range_join",
    "q49_regexp_extract",
    "q50_posexplode",
)


def all_specs() -> dict[str, QuerySpec]:
    """Registry in driver-exposure order: window first, rest after."""
    specs = REGISTRY.specs
    missing = [n for n in _WINDOW if n not in specs]
    if missing:  # a renamed spec must break loudly, not silently rotate
        raise KeyError(f"window names not registered: {missing}")
    ordered = {n: specs[n] for n in _WINDOW}
    ordered.update((n, s) for n, s in specs.items() if n not in ordered)
    return ordered
