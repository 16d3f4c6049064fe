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

# The driver's correctness gate hash-checks only the FIRST 50 registered
# specs each round, so exposure order is a rotation schedule, not import
# order (VERDICT r2 "Next round #1/#2"). Round-12 window (executing the
# plan written at the end of round 11 verbatim, confirmed by VERDICT r11
# "Next round #1"): pinned core (6) + first driver rows for the seven
# r11-born codec specs (q232-q238 — all judge-verified against DuckDB at
# sf0.01 in the r11 verdict run) + the stale tier in q-number order:
# q135-q139 (5, last green r6), q140-q143 (4, r6), q144-q157 (14,
# r7/r8), q158-q171 (14, r8/r9).
# Arithmetic: 6 + 7 + 5 + 4 + 14 + 14 = 50 exactly. q172-q178 roll to
# the r13 window (plan at the end of this file's window comment block).
_WINDOW: tuple[str, ...] = (
    # slots 1-6: pinned core (driver-green every round it has run)
    "q01_scan_filter",
    "q03_inner_join",
    "q08_agg_having",
    "q11_window_rank",
    "q24_sessionize",
    "q28_pipeline_e2e",
    # slots 7-13: r11-born codec wave, first driver rows
    "q232_png_resize_rgb",
    "q233_jpeg_roundtrip",
    "q234_png_jpeg_transcode",
    "q235_png_jpeg_transcode_rgb",
    "q236_wav_resample",
    "q237_gif_roundtrip",
    "q238_gif_png_transcode",
    # slots 14-18: r6-tier remainder (q-number order, last green r6)
    "q135_mom_growth",
    "q136_dow_seasonality",
    "q137_cross_correlation",
    "q138_integrity_audit",
    "q139_conversion_time_stats",
    # slots 19-22: r6 tier (last green r6)
    "q140_point_in_time_join",
    "q141_dataset_split",
    "q142_pareto_frontier",
    "q143_weighted_median",
    # slots 23-36: r7/r8 tier (last green r7/r8)
    "q144_ks_drift",
    "q145_benford_audit",
    "q146_theil_sen_trend",
    "q147_session_paths",
    "q148_gap_fill",
    "q149_mann_whitney",
    "q150_cusum_changepoint",
    "q151_type_affinity",
    "q152_autocorrelation",
    "q153_hist_drift",
    "q154_ks_drift_binned",
    "q155_data_contract",
    "q156_share_shift",
    "q157_budget_select",
    # slots 37-50: r8/r9 tier (last green r8/r9)
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
)

# R13 ROTATION PLAN (VERDICT r11 "Next round #5", written during
# round 12 alongside the r12 window above; r12-born specs take
# first-row priority per the standing first-round policy):
# r13 = pinned core (6: q01, q03, q08, q11, q24, q28)
# + first driver rows for every r12-born spec (15: q239_pq_codebooks,
#   q240_pq_adc_topk, q241_pq_recall, q242_jpeg_restart_roundtrip,
#   q243_jpeg_channel_stats, q244_jpeg_420_roundtrip,
#   q245_png_depth_roundtrip, q246_g711_companding, q247_ima_adpcm,
#   q248_ivfpq_cells, q249_ivfpq_adc_topk, q250_ivfpq_recall,
#   q251_jpeg_progressive_roundtrip, q252_jpeg_422_roundtrip,
#   q253_wav_codec_container — final; names verified against the
#   registry at round close)
# + the q172-q178 roll (7: q172_tpch_q20_dominant_suppliers,
#   q173_spearman_corr, q174_welch_t_test, q175_rank_calibration,
#   q176_mrr_at_10, q177_hellinger_drift, q178_seasonal_backtest,
#   last green r8/r9)
# + the r8 tier in q-number order from q179_compaction_plan,
#   tail-truncated so the window holds exactly 50: 22 names,
#   q179-q200 (verified against the registry at write time).
# Arithmetic: 6 + 15 + 7 + 22 = 50 exactly; q201_log_rank and q202+
# (the TPC-H completion tier) roll to r14.
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
