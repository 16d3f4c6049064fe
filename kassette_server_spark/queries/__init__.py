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
from . import round8 as _round8  # noqa: F401,E402  (q158-q172)
from . import round8b as _round8b  # noqa: F401,E402  (q173+)
from . import round8c as _round8c  # noqa: F401,E402  (q202+ — TPC-H completion)
from . import round9 as _round9  # noqa: F401,E402  (q213-q219 — BPE apply/vocab, substring removal, curation e2e, multimodal transforms)
from . import round9b as _round9b  # noqa: F401,E402  (q220-q229 — JL sketch, audio features, LSH band plan, ANN recall, temp mix, LM filter, embedding drift, fertility, cluster representatives)
from . import round10 as _round10  # noqa: F401,E402  (q230+ — PNG resize tier)
from . import round11 as _round11  # noqa: F401,E402  (q232+ — RGB PNG resize)

# The driver's correctness gate hash-checks only the FIRST 50 registered
# specs each round, so exposure order is a rotation schedule, not import
# order (VERDICT r2 "Next round #1/#2"). Round-11 window (executing the
# plan written at the end of round 10 verbatim, confirmed by VERDICT r10
# "Next round #1"): pinned core (6) + first driver rows for the two
# r10-born specs (q230, q231 — both judge-verified against DuckDB at
# sf0.01 in the r10 verdict run) + the stale tier in q-number order:
# q93-q97 (5, last green r5) and q98-q134 (37, last green r6).
# Arithmetic: 6 + 2 + 5 + 37 = 50 exactly. The q135-q139 remainder of
# the r6 tier rolls to the r12 window (plan at the end of this file's
# window comment block).
_WINDOW: tuple[str, ...] = (
    # slots 1-6: pinned core (driver-green every round it has run)
    "q01_scan_filter",
    "q03_inner_join",
    "q08_agg_having",
    "q11_window_rank",
    "q24_sessionize",
    "q28_pipeline_e2e",
    # slots 7-8: r10-born wave, first driver rows
    "q230_png_resize",
    "q231_temperature_mix_tau75",
    # slots 9-13: stale tier, last driver-green r5 (q-number order)
    "q93_hll_set_algebra",
    "q94_scd2_history",
    "q95_event_transitions",
    "q96_kmeans",
    "q97_salted_join",
    # slots 14-50: stale tier, last driver-green r6 (q-number order)
    "q98_attribution",
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
)

# R12 ROTATION PLAN (VERDICT r10 "Next round #9", written at the end
# of round 11 alongside the r11 window above; r11-born specs take
# first-row priority per the standing first-round policy):
# r12 = pinned core (6: q01, q03, q08, q11, q24, q28)
# + the r11-born wave's first driver rows (7: q232_png_resize_rgb,
#   q233_jpeg_roundtrip, q234_png_jpeg_transcode,
#   q235_png_jpeg_transcode_rgb, q236_wav_resample,
#   q237_gif_roundtrip, q238_gif_png_transcode — queries/round11.py,
#   all CI-locked at two SFs meanwhile)
# + the q135-q139 remainder of the r6 tier in q-number order:
#   q135_mom_growth, q136_dow_seasonality, q137_cross_correlation,
#   q138_integrity_audit, q139_conversion_time_stats (5, last green r6)
# + the r6/r7 tier in q-number order: q140_point_in_time_join,
#   q141_dataset_split, q142_pareto_frontier, q143_weighted_median (4),
#   then q144_ks_drift through q157_budget_select (14, last green
#   r7/r8) = 18 more; tail-fill from q158_roc_auc onward in q-number
#   order until the window holds exactly 50.
# Arithmetic: 6 + 7 + 5 + 4 + 14 = 36, so 14 tail slots:
# q158_roc_auc through q171_bpe_merges (14) = 50 exactly (all names
# q140-q178 verified against the registry at write time;
# q172-q178 roll to r13). Every spec
# stays locked by tests/test_oracle_parity*.py at sf0.001+sf0.01 in
# every CI run regardless of rotation position; prioritize specs whose
# OPERATORS changed since their last row.

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
