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

# The driver's correctness gate hash-checks only the FIRST 50 registered
# specs each round, so exposure order is a rotation schedule, not import
# order (VERDICT r2 "Next round #1/#2"). Round-14 window (executing the
# plan written at the end of round 13 verbatim, confirmed by VERDICT r13
# "Next round #1"): pinned core (6) + first driver rows for the five
# r13-born specs (q254-q258 — all judge-verified against DuckDB at
# sf0.01 in the r13 verdict run) + q201_log_rank (1, last green r9,
# the oldest singleton) + the MEASURED stalest tier: the 38 oldest
# specs whose last driver-green round is r7 per the CORRECTNESS_r*
# ledger, in q-number order, tail-truncated by two so the window holds
# exactly 50 (q81/q82 roll to r15).
# Arithmetic: 6 + 5 + 1 + 38 = 50 exactly.
_WINDOW: tuple[str, ...] = (
    # slots 1-6: pinned core (driver-green every round it has run)
    "q01_scan_filter",
    "q03_inner_join",
    "q08_agg_having",
    "q11_window_rank",
    "q24_sessionize",
    "q28_pipeline_e2e",
    # slots 7-11: r13-born wave, first driver rows
    "q254_compressed_audio_features",
    "q255_ivfpq_qerr_by_cell",
    "q256_jpeg_411_roundtrip",
    "q257_jpeg_progressive_420",
    "q258_jpeg_ac_refine",
    # slot 12: the oldest singleton (last green r9)
    "q201_log_rank",
    # slots 13-50: r7-stale tier in q-number order (last green r7)
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
    "q42_topk_per_group",
    "q43_pivot",
    "q44_cube",
    "q45_exact_median",
    "q46_histogram",
    "q48_range_join",
    "q49_regexp_extract",
    "q50_posexplode",
    "q70_benchmark_contamination",
    "q71_quality_filter",
    "q72_sequence_packing",
    "q73_tfidf_top_terms",
    "q74_ngram_novelty",
    "q78_domain_mix",
    "q79_shuffle_shards",
    "q80_repetition_filter",
)

# R15 ROTATION PLAN (VERDICT r13 "Next round #8", written during
# round 14 alongside the r14 window above; ledger recomputed from
# CORRECTNESS_r01-r13 with the r14 window simulated green):
# r15 = pinned core (6: q01, q03, q08, q11, q24, q28)
# + the r14 truncation roll, last green r7 (2: q81_pii_scrub,
#   q82_chunk_documents — the two stalest specs in the registry)
# + the COMPLETE r8-green tier in q-number order (29:
#   q30_dedup_exact_text, q31_dedup_ngram_jaccard,
#   q32_dedup_minhash_lsh, q33_simhash, q34_ann_cosine_topk,
#   q35_embedding_near_dup, q36_text_quality_stats, q37_language_id,
#   q38_token_counts, q39_doc_fingerprint, q40_approx_aggregates,
#   q41_multimodal_meta, q47_asof_join, q51_token_frequencies,
#   q52_ivf_topk, q53_tpch_q1_pricing_summary,
#   q54_tpch_q3_shipping_priority, q55_tpch_q5_local_volume,
#   q56_time_rollup, q57_simhash_near_dup, q58_normalize_text,
#   q59_unpivot, q60_mode_per_group, q61_stats_moments,
#   q62_grouping_sets, q75_funnel, q76_retention_cohorts,
#   q77_quantized_ann, q83_semantic_dedup)
# + the head of the r10-green tier in q-number order (13:
#   q202_tpch_q2_min_cost_supplier, q203_tpch_q4_priority_check,
#   q204_tpch_q6_forecast_revenue, q205_tpch_q7_volume_shipping,
#   q206_tpch_q8_market_share, q207_tpch_q10_returned_items,
#   q208_tpch_q11_important_stock, q209_tpch_q12_shipmode_priority,
#   q210_tpch_q14_promo_share, q211_tpch_q16_supplier_counts,
#   q212_shingle_saturation, q213_bpe_token_counts,
#   q214_bpe_sequence_packing — the r10 remainder q215+ and q63+
#   roll to r16)
# Arithmetic: 6 + 2 + 29 + 13 = 50 exactly.
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
