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

# The driver's correctness gate hash-checks only the FIRST 50 registered
# specs each round, so exposure order is a rotation schedule, not import
# order (VERDICT r2 "Next round #1/#2"). Round-6 window (VERDICT r5
# "Next round #1", executed verbatim): pin the 6-slot relational core,
# then spend ALL 44 remaining slots on the 44 specs that have never had
# a driver CORRECTNESS row — q89, q90, q98, q99-q139. It is exactly 44,
# so the whole hard-signal debt retires in one window and cumulative
# driver coverage reaches 138/138. Everything rotated out (q02-q27,
# q30-q97 — all driver-green r4 or r5) stays locked by
# tests/test_oracle_parity*.py at sf0.001 AND sf0.01 every CI run.
_WINDOW: tuple[str, ...] = (
    # slots 1-6: pinned core (driver-green every round it has run)
    "q01_scan_filter",
    "q03_inner_join",
    "q08_agg_having",
    "q11_window_rank",
    "q24_sessionize",
    "q28_pipeline_e2e",
    # slots 7-9: r5 additions that missed the r5 window
    "q89_quantiles_per_group",
    "q90_hll_per_group",
    "q98_attribution",
    # slots 10-50: the entire session-3 surface (q99-q139), shipping its
    # first hard driver row (the r4 verdict's q84 lesson: never leave an
    # operator on repo-oracle evidence longer than one round).
    "q99_bm25_retrieval",
    "q100_priority_sample",
    "q101_grouped_regression",
    "q102_pagerank",
    "q103_zorder_stats",
    "q104_value_outliers",
    "q105_rolling_time_window",
    "q106_copurchase_pairs",
    "q107_table_profile",
    "q108_entropy_by_source",
    "q109_multimodal_decode_ext",
    "q110_asof_forward_tolerance",
    "q111_stratified_weighted_sample",
    "q112_kl_divergence_by_source",
    "q113_winsorized_stats",
    "q114_chi_square_contingency",
    "q115_hierarchy_closure",
    "q116_peak_concurrency",
    "q117_bigram_logprob",
    "q118_power_iteration_pca",
    "q119_sorted_neighborhood",
    "q120_collocations_pmi",
    "q121_association_rules",
    "q122_snapshot_diff",
    "q123_timed_funnel",
    "q124_rfm_segmentation",
    "q125_revenue_gini",
    "q126_tpch_q7_volume_shipping",
    "q127_tpch_q10_returned_items",
    "q128_ewma_daily_counts",
    "q129_cohort_ltv",
    "q130_revenue_contribution",
    "q131_event_trigrams",
    "q132_transition_latency",
    "q133_holt_trend",
    "q134_rolling_volatility",
    "q135_mom_growth",
    "q136_dow_seasonality",
    "q137_cross_correlation",
    "q138_integrity_audit",
    "q139_conversion_time_stats",
)

# R7 ROTATION PLAN (write it down while the state is fresh): after r6,
# every spec registered through r5 has ≥1 driver-green row and the
# oldest rows are the r4 greens (q02-q27 non-core, q42-q50, q70-q83),
# two rounds stale by r7. Next window: pin the q01/q03/q08/q11/q24/q28
# core, give the NEW r6 specs (q140_point_in_time_join,
# q141_dataset_split, q142_pareto_frontier, q143_weighted_median —
# registered after the window this round) their
# first-round slots (standing policy), then fill the remaining 40 with
# the then-oldest rows — r4 greens first, r5 greens after. Nothing
# should ever be >2 rounds without a row while the surface stays ≤150.

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
