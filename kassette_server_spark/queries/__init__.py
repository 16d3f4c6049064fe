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
# order (VERDICT r2 "Next round #1/#2"). Round-13 window (executing the
# plan written at the end of round 12 verbatim, confirmed by VERDICT r12
# "Next round #2"): pinned core (6) + first driver rows for all fifteen
# r12-born specs (q239-q253 — all judge-verified against DuckDB at
# sf0.01 in the r12 verdict run) + the q172-q178 roll (7, last green
# r8/r9) + the r8 tier q179-q200 in q-number order (22).
# Arithmetic: 6 + 15 + 7 + 22 = 50 exactly. q201+ roll to the r14
# window (plan at the end of this file's window comment block).
_WINDOW: tuple[str, ...] = (
    # slots 1-6: pinned core (driver-green every round it has run)
    "q01_scan_filter",
    "q03_inner_join",
    "q08_agg_having",
    "q11_window_rank",
    "q24_sessionize",
    "q28_pipeline_e2e",
    # slots 7-21: r12-born PQ/IVF-PQ/codec wave, first driver rows
    "q239_pq_codebooks",
    "q240_pq_adc_topk",
    "q241_pq_recall",
    "q242_jpeg_restart_roundtrip",
    "q243_jpeg_channel_stats",
    "q244_jpeg_420_roundtrip",
    "q245_png_depth_roundtrip",
    "q246_g711_companding",
    "q247_ima_adpcm",
    "q248_ivfpq_cells",
    "q249_ivfpq_adc_topk",
    "q250_ivfpq_recall",
    "q251_jpeg_progressive_roundtrip",
    "q252_jpeg_422_roundtrip",
    "q253_wav_codec_container",
    # slots 22-28: q172-q178 roll (last green r8/r9)
    "q172_tpch_q20_dominant_suppliers",
    "q173_spearman_corr",
    "q174_welch_t_test",
    "q175_rank_calibration",
    "q176_mrr_at_10",
    "q177_hellinger_drift",
    "q178_seasonal_backtest",
    # slots 29-50: r8 tier in q-number order (last green r8)
    "q179_compaction_plan",
    "q180_k_anonymity",
    "q181_quantile_normalize",
    "q182_item_item_cosine",
    "q183_tpch_q9_profit",
    "q184_tpch_q13_custdist",
    "q185_tpch_q15_top_supplier",
    "q186_tpch_q19_disjunctive",
    "q187_tpch_q21_waiting",
    "q188_tpch_q22_idle_customers",
    "q189_join_cardinality",
    "q190_anova_f",
    "q191_kcore",
    "q192_edit_distance_pairs",
    "q193_zonemap_pruning",
    "q194_oov_rate",
    "q195_hard_negatives",
    "q196_two_proportion_z",
    "q197_gini_stump",
    "q198_per_class_prf",
    "q199_wilson_ci",
    "q200_kaplan_meier",
)

# R14 ROTATION PLAN (VERDICT r12 "Next round #10", written during
# round 13 alongside the r13 window above; r13-born specs take
# first-row priority per the standing first-round policy):
# r14 = pinned core (6: q01, q03, q08, q11, q24, q28)
# + first driver rows for the five r13-born specs (5:
#   q254_compressed_audio_features, q255_ivfpq_qerr_by_cell,
#   q256_jpeg_411_roundtrip, q257_jpeg_progressive_420,
#   q258_jpeg_ac_refine)
# + q201_log_rank (1, last green r9 — the oldest singleton)
# + the MEASURED stalest tier: the 38 oldest specs whose last
#   driver-green round is r7 per the CORRECTNESS_r* ledger (q-number
#   order, tail-truncated by two so the window holds exactly 50 —
#   q81_pii_scrub and q82_chunk_documents roll to r15):
#   q02_predicates, q04_multiway_broadcast_join, q05_left_join,
#   q06_semi_join, q07_anti_join, q09_count_distinct, q10_rollup,
#   q12_window_running_sum, q13_window_lag, q14_topk, q15_setops,
#   q16_string_fns, q17_date_fns, q18_math_fns, q19_case_nullif,
#   q20_json_extract, q21_cast_semantics, q22_rules_map_hide_delete,
#   q23_timestamp_skew, q25_dedup_exact, q26_correlated_subquery,
#   q27_exists, q42_topk_per_group, q43_pivot, q44_cube,
#   q45_exact_median, q46_histogram, q48_range_join,
#   q49_regexp_extract, q50_posexplode, q70_benchmark_contamination,
#   q71_quality_filter, q72_sequence_packing, q73_tfidf_top_terms,
#   q74_ngram_novelty, q78_domain_mix, q79_shuffle_shards,
#   q80_repetition_filter
# Arithmetic: 6 + 5 + 1 + 38 = 50 exactly.
# NOTE: VERDICT r12 #10 sketched q202-q211 (TPC-H completion, last
# green r10) + the r9 remainder for this window, but the ledger the
# same item tells us to keep shows the r7-green tier above is 3 rounds
# staler — the ledger wins; q202-q211 and the rest of the r8 tier
# (q30-q83, and q81/q82) roll to r15.
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
