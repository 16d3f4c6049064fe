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
from . import round12 as _round12  # noqa: F401,E402  (q239+ — product quantization)
from . import round13 as _round13  # noqa: F401,E402  (q254+ — compressed-audio features)
from . import round15 as _round15  # noqa: F401,E402  (q259-q260 — MJPEG-in-AVI video tier)
from . import round16 as _round16  # noqa: F401,E402  (q261 — AVI audio extraction)

# The driver's correctness gate hash-checks only the FIRST 50 registered
# specs each round, so exposure order is a rotation schedule, not import
# order (VERDICT r2 "Next round #1/#2"). Round-16 window: the plan
# written at the end of round 15 with VERDICT r15 "Next round #2"
# applied — the last two r11-head slots (q104/q105, both green r11 and
# locked by tests/test_oracle_parity*.py) are swapped for the r15-born
# video tier q259/q260, so new operators get driver rows the round
# after birth (the q254-q258 precedent); q104/q105 roll to r17.
# r16 = pinned core (6) + the COMPLETE r10-green tier in q-number
# order (31) + the r11-green head q93-q103 (11) + the video tier (2).
# Arithmetic: 6 + 31 + 11 + 2 = 50 exactly.
_WINDOW: tuple[str, ...] = (
    # slots 1-6: pinned core (driver-green every round it has run)
    "q01_scan_filter",
    "q03_inner_join",
    "q08_agg_having",
    "q11_window_rank",
    "q24_sessionize",
    "q28_pipeline_e2e",
    # slots 7-37: the complete r10-green tier in q-number order
    "q63_hash_sample",
    "q64_string_agg",
    "q65_window_extras",
    "q66_embedding_centroid",
    "q67_stratified_sample",
    "q68_near_dup_clusters",
    "q69_hopping_window",
    "q84_multimodal_decode",
    "q85_countmin_heavy_hitters",
    "q86_bloom_membership",
    "q87_full_outer_join",
    "q88_approx_quantiles",
    "q89_quantiles_per_group",
    "q90_hll_per_group",
    "q91_fuzzy_match",
    "q92_substring_dedup",
    "q215_substring_dedup_removal",
    "q216_bpe_vocab",
    "q217_curation_pipeline_e2e",
    "q218_multimodal_transform",
    "q219_image_channel_stats",
    "q220_jl_projection",
    "q221_audio_frame_features",
    "q222_lsh_band_plan",
    "q223_ann_recall",
    "q224_temperature_mix",
    "q225_lm_quality_filter",
    "q226_embedding_drift",
    "q227_tokenizer_fertility",
    "q228_cluster_representatives",
    "q229_sketch_recall",
    # slots 38-48: head of the r11-green tier in q-number order
    "q93_hll_set_algebra",
    "q94_scd2_history",
    "q95_event_transitions",
    "q96_kmeans",
    "q97_salted_join",
    "q98_attribution",
    "q99_bm25_retrieval",
    "q100_priority_sample",
    "q101_grouped_regression",
    "q102_pagerank",
    "q103_zorder_stats",
    # slots 49-50: the r15-born MJPEG-in-AVI video tier (first driver
    # rows — judge-verified at sf0.01 in r15, no driver row yet)
    "q259_mjpeg_avi_frames",
    "q260_mjpeg_avi_resample",
)

# R17 ROTATION PLAN (VERDICT r15 "Next round #8", written during
# round 16 alongside the r16 window above; ledger recomputed from
# CORRECTNESS_r01-r15 with the r16 window simulated green. After r16
# the stalest driver evidence is the r11-green remainder — 33 specs,
# last green r11: the rolled q104/q105, q106-q134, and q230/q231 —
# then the r12-green tier):
# r17 = pinned core (6: q01, q03, q08, q11, q24, q28)
# + the COMPLETE r11-green remainder in q-number order (33:
#   q104_value_outliers, q105_rolling_time_window,
#   q106_copurchase_pairs, q107_table_profile,
#   q108_entropy_by_source, q109_multimodal_decode_ext,
#   q110_asof_forward_tolerance, q111_stratified_weighted_sample,
#   q112_kl_divergence_by_source, q113_winsorized_stats,
#   q114_chi_square_contingency, q115_hierarchy_closure,
#   q116_peak_concurrency, q117_bigram_logprob,
#   q118_power_iteration_pca, q119_sorted_neighborhood,
#   q120_collocations_pmi, q121_association_rules,
#   q122_snapshot_diff, q123_timed_funnel, q124_rfm_segmentation,
#   q125_revenue_gini, q126_tpch_q7_volume_shipping,
#   q127_tpch_q10_returned_items, q128_ewma_daily_counts,
#   q129_cohort_ltv, q130_revenue_contribution, q131_event_trigrams,
#   q132_transition_latency, q133_holt_trend, q134_rolling_volatility,
#   q230_png_resize, q231_temperature_mix_tau75)
# + the head of the r12-green tier in q-number order (10:
#   q135_mom_growth, q136_dow_seasonality, q137_cross_correlation,
#   q138_integrity_audit, q139_conversion_time_stats,
#   q140_point_in_time_join, q141_dataset_split,
#   q142_pareto_frontier, q143_weighted_median, q144_ks_drift
#   — the r12 remainder q145+ rolls to r18)
# + the r16-born AVI audio tier (1: q261_avi_audio_extract — first
#   driver row the round after birth, the q254-q260 precedent)
# Arithmetic: 6 + 33 + 10 + 1 = 50 exactly.
# Every spec stays locked by tests/test_oracle_parity*.py at
# sf0.001+sf0.01 in every CI run regardless of rotation position;
# prioritize specs whose OPERATORS changed since their last row.

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
