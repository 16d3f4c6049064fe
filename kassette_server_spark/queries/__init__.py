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
from . import llmops as _llmops  # noqa: F401,E402  (q30-q41, q52, q57-58, q66-68, q85-86, q88-90)
from . import tpch as _tpch  # noqa: F401,E402  (q53-q55)
from . import olap as _olap  # noqa: F401,E402  (q42-q51, q56, q59-q65, q69, q87)
from . import text_extra as _text_extra  # noqa: F401,E402
from . import curation as _curation  # noqa: F401,E402  (q70-q74, q78-q82)
from . import analytics as _analytics  # noqa: F401,E402  (q75-q77, q83)
from . import extras as _extras  # noqa: F401,E402  (q91-q96)
from . import advanced as _advanced  # noqa: F401,E402  (q99-q139)
from . import round6 as _round6  # noqa: F401,E402  (q140-q143)
from . import round7 as _round7  # noqa: F401,E402  (q144-q157)

# The driver's correctness gate hash-checks only the FIRST 50 registered
# specs each round, so exposure order is a rotation schedule, not import
# order (VERDICT r2 "Next round #1/#2"). Round-7 window (the r6 plan
# written below the r6 window, confirmed by VERDICT r6 "Next round #1"):
# pin the 6-slot relational core, give the r6-born specs q140-q143
# their first driver rows (standing first-round policy), then spend the
# 40 remaining slots on the oldest greens — the r4-stale set (q02-q27
# non-core, q42-q50 sans q47, q70-q83; 44 specs, of which 40 fit).
# The four deferred to r8 (q75/q76/q77/q83) are the ones whose operator
# families shipped fresh r6 rows (funnel→q123/q139, cohorts→q129,
# ANN/SemDeDup plan-audited in the r6 bench) AND stay locked by
# tests/test_oracle_parity*.py at sf0.001+sf0.01 every CI run.
_WINDOW: tuple[str, ...] = (
    # slots 1-6: pinned core (driver-green every round it has run)
    "q01_scan_filter",
    "q03_inner_join",
    "q08_agg_having",
    "q11_window_rank",
    "q24_sessionize",
    "q28_pipeline_e2e",
    # slots 7-10: r6-born operators, first driver rows
    "q140_point_in_time_join",
    "q141_dataset_split",
    "q142_pareto_frontier",
    "q143_weighted_median",
    # slots 11-32: r4-stale relational/parity set (last row r4)
    "q02_predicates",
    "q04_multiway_broadcast_join",
    "q05_left_join",
    "q06_semi_join",
    "q07_anti_join",
    "q09_count_distinct",
    "q10_rollup",
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
    "q25_dedup_exact",
    "q26_correlated_subquery",
    "q27_exists",
    # slots 33-40: r4-stale OLAP extras (q47 was re-greened r5)
    "q42_topk_per_group",
    "q43_pivot",
    "q44_cube",
    "q45_exact_median",
    "q46_histogram",
    "q48_range_join",
    "q49_regexp_extract",
    "q50_posexplode",
    # slots 41-50: r4-stale curation/llm set
    "q70_benchmark_contamination",
    "q71_quality_filter",
    "q72_sequence_packing",
    "q73_tfidf_top_terms",
    "q74_ngram_novelty",
    "q78_domain_mix",
    "q79_shuffle_shards",
    "q80_repetition_filter",
    "q81_pii_scrub",
    "q82_chunk_documents",
)

# R8 ROTATION PLAN (write it down while the state is fresh): after r7,
# the oldest rows are the four r4 greens that missed this window
# (q75_funnel, q76_retention_cohorts, q77_quantized_ann,
# q83_semantic_dedup — 3 rounds stale by r8, they go FIRST), then the
# r5 greens (q30-q41, q47, q51-q69, q84-q88, q91-q97 — 44 specs).
# Window: pinned core (6) + the r7-born specs q144-q157 (ks_drift,
# benford_audit, theil_sen_trend, session_paths, gap_fill,
# mann_whitney, cusum_changepoint, type_affinity, autocorrelation,
# hist_drift, ks_drift_binned, data_contract, share_shift,
# budget_select — first-round policy, 14 slots) + q75/q76/q77/q83 +
# the first 26 r5 greens in q-number order (the remaining 18 r5
# greens roll to r9 ahead of everything newer). Nothing should stay
# >3 rounds without a row while the surface is ~156 specs.

# The driver checks exactly the first 50; a wrong-sized window silently
# wastes slots (too small) or pushes debt out of the gate (too large).
assert len(_WINDOW) == 50, f"window must be exactly 50 specs, got {len(_WINDOW)}"
assert len(set(_WINDOW)) == 50, "window contains duplicates"


def all_specs() -> dict[str, QuerySpec]:
    """Registry in driver-exposure order: window first, rest after."""
    specs = REGISTRY.specs
    missing = [n for n in _WINDOW if n not in specs]
    if missing:  # a renamed spec must break loudly, not silently rotate
        raise KeyError(f"window names not registered: {missing}")
    ordered = {n: specs[n] for n in _WINDOW}
    ordered.update((n, s) for n, s in specs.items() if n not in ordered)
    return ordered
