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

# The driver's correctness gate hash-checks only the FIRST 50 registered
# specs each round, so exposure order is a rotation schedule, not import
# order (VERDICT r2 "Next round #1/#2"). Round-10 window (executing the
# r9 plan verbatim, confirmed by VERDICT r9 "Next round #1"): pinned
# core (6) + first driver rows for the r8c TPC-H-completion/saturation
# wave q202-q212 (11) and the full r9-born wave q213-q229 (17) — all 28
# judge-verified green against DuckDB at sf0.01 in the r9 verdict run —
# + the 16 most-stale backfills q63-q69, q84-q90, q91-q92 (last green
# r5). After this window runs, every registered spec has >=1 driver row.
_WINDOW: tuple[str, ...] = (
    # slots 1-6: pinned core (driver-green every round it has run)
    "q01_scan_filter",
    "q03_inner_join",
    "q08_agg_having",
    "q11_window_rank",
    "q24_sessionize",
    "q28_pipeline_e2e",
    # slots 7-17: r8c TPC-H completion + shingle saturation, first driver rows
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
    # slots 18-34: r9-born wave, first driver rows (q-number order)
    "q213_bpe_token_counts",
    "q214_bpe_sequence_packing",
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
    # slots 35-50: most-stale backfills (last driver-green r5)
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
)

# R11 ROTATION PLAN (VERDICT r9 "Next round #8", finalized end of
# round 10 — first-round policy gives round-born specs priority):
# r11 = pinned core (6: q01, q03, q08, q11, q24, q28)
# + the r10-born wave's first driver rows (2: q230_png_resize,
# q231_temperature_mix_tau75 — queries/round10.py)
# + the stale tier in q-number order: q93_hll_set_algebra,
# q94_scd2_history, q95_event_transitions, q96_kmeans,
# q97_salted_join (5, last green r5), then q98_attribution through
# q134_rolling_volatility (37, last green r6 — exact names per the
# registry; the q135-q139 remainder of the r6 tier rolls to r12).
# Arithmetic: 6 + 2 + 5 + 37 = 50 exactly. Every spec stays locked by
# tests/test_oracle_parity*.py at sf0.001+sf0.01 in every CI run
# regardless of rotation position; prioritize specs whose OPERATORS
# changed since their last row (q231 shares temperature_mix with q224
# — the tau generalization — so both sides of that change get rows).

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
