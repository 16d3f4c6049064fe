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

# The driver's correctness gate hash-checks only the FIRST 50 registered
# specs each round, so exposure order is a rotation schedule, not import
# order (VERDICT r2 "Next round #1/#2"). Round-15 window (executing the
# plan written at the end of round 14 verbatim, confirmed by VERDICT r14
# "Next round #1"): pinned core (6) + the r14 truncation roll (2: the
# two stalest specs, last green r7) + the COMPLETE r8-green tier in
# q-number order (29) + the head of the r10-green tier in q-number
# order (13: TPC-H completion q202-q211 + q212-q214).
# Arithmetic: 6 + 2 + 29 + 13 = 50 exactly.
_WINDOW: tuple[str, ...] = (
    # slots 1-6: pinned core (driver-green every round it has run)
    "q01_scan_filter",
    "q03_inner_join",
    "q08_agg_having",
    "q11_window_rank",
    "q24_sessionize",
    "q28_pipeline_e2e",
    # slots 7-8: r14 truncation roll (last green r7, stalest in registry)
    "q81_pii_scrub",
    "q82_chunk_documents",
    # slots 9-37: the complete r8-green tier in q-number order
    "q30_dedup_exact_text",
    "q31_dedup_ngram_jaccard",
    "q32_dedup_minhash_lsh",
    "q33_simhash",
    "q34_ann_cosine_topk",
    "q35_embedding_near_dup",
    "q36_text_quality_stats",
    "q37_language_id",
    "q38_token_counts",
    "q39_doc_fingerprint",
    "q40_approx_aggregates",
    "q41_multimodal_meta",
    "q47_asof_join",
    "q51_token_frequencies",
    "q52_ivf_topk",
    "q53_tpch_q1_pricing_summary",
    "q54_tpch_q3_shipping_priority",
    "q55_tpch_q5_local_volume",
    "q56_time_rollup",
    "q57_simhash_near_dup",
    "q58_normalize_text",
    "q59_unpivot",
    "q60_mode_per_group",
    "q61_stats_moments",
    "q62_grouping_sets",
    "q75_funnel",
    "q76_retention_cohorts",
    "q77_quantized_ann",
    "q83_semantic_dedup",
    # slots 38-50: head of the r10-green tier in q-number order
    "q202_tpch_q2_min_cost_supplier",
    "q203_tpch_q4_priority_check",
    "q204_tpch_q6_forecast_revenue",
    "q205_tpch_q7_volume_shipping",
    "q206_tpch_q8_market_share",
    "q207_tpch_q10_returned_items",
    "q208_tpch_q11_important_stock",
    "q209_tpch_q12_shipmode_priority",
    "q210_tpch_q14_promo_share",
    "q211_tpch_q16_supplier_counts",
    "q212_shingle_saturation",
    "q213_bpe_token_counts",
    "q214_bpe_sequence_packing",
)

# R16 ROTATION PLAN (VERDICT r14 "Next round #8", written during
# round 15 alongside the r15 window above; ledger recomputed from
# CORRECTNESS_r01-r14 with the r15 window simulated green. After r15
# the stalest driver evidence is the complete r10-green tier — 31
# specs, last green r10 — then the r11-green tier):
# r16 = pinned core (6: q01, q03, q08, q11, q24, q28)
# + the COMPLETE r10-green tier in q-number order (31:
#   q63_hash_sample, q64_string_agg, q65_window_extras,
#   q66_embedding_centroid, q67_stratified_sample,
#   q68_near_dup_clusters, q69_hopping_window, q84_multimodal_decode,
#   q85_countmin_heavy_hitters, q86_bloom_membership,
#   q87_full_outer_join, q88_approx_quantiles,
#   q89_quantiles_per_group, q90_hll_per_group, q91_fuzzy_match,
#   q92_substring_dedup, q215_substring_dedup_removal, q216_bpe_vocab,
#   q217_curation_pipeline_e2e, q218_multimodal_transform,
#   q219_image_channel_stats, q220_jl_projection,
#   q221_audio_frame_features, q222_lsh_band_plan, q223_ann_recall,
#   q224_temperature_mix, q225_lm_quality_filter, q226_embedding_drift,
#   q227_tokenizer_fertility, q228_cluster_representatives,
#   q229_sketch_recall)
# + the head of the r11-green tier in q-number order (13:
#   q93_hll_set_algebra, q94_scd2_history, q95_event_transitions,
#   q96_kmeans, q97_salted_join, q98_attribution, q99_bm25_retrieval,
#   q100_priority_sample, q101_grouped_regression, q102_pagerank,
#   q103_zorder_stats, q104_value_outliers, q105_rolling_time_window
#   — the r11 remainder q106+ rolls to r17, together with
#   q259_mjpeg_avi_frames / q260_mjpeg_avi_resample if new this round)
# Arithmetic: 6 + 31 + 13 = 50 exactly.
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
