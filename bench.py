#!/usr/bin/env python
"""Benchmark harness: run the declared query surface and print ONE JSON line.

Usage: python bench.py            # sf dir from $SPARK_GRAFT_SF_DIR (default sf0.1)

Each query is executed to completion with a `noop`-format write — the
whole plan runs on the executors (scan → shuffle → agg) but nothing is
collected to the driver, so timings reflect engine throughput, not
driver materialization. One warmup query absorbs JVM/codegen startup.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from kassette_server_spark.queries import all_specs  # noqa: E402
from kassette_server_spark.session import get_spark  # noqa: E402


def run_to_completion(df) -> None:
    df.write.format("noop").mode("overwrite").save()


# Tier split (VERDICT r9 #3): a single scalar s/spec band over a
# surface with intentional multi-stage tiers keeps "failing" for
# honest reasons — composed-tier growth could also MASK a real
# regression in the cheap class. Membership is the verdict's list:
# composed/iterative specs whose cost is intrinsic composition,
# fixpoint iteration, or fixed plan-compile, each individually
# plan-audited. Module-level so tests can assert every name still
# exists in the registry (a silent rename would shift the tier split).
COMPOSED = frozenset(
    {
        "q28_pipeline_e2e",
        "q57_simhash_near_dup",
        "q68_near_dup_clusters",
        "q102_pagerank",
        "q215_substring_dedup_removal",
        "q217_curation_pipeline_e2e",
        "q225_lm_quality_filter",
        "q226_embedding_drift",
        "q228_cluster_representatives",
        "q229_sketch_recall",
        # PQ / IVF-PQ (r12): intrinsically iterative — each spec runs
        # Lloyd training cycles as sequential bounded-collect jobs
        # before the (fast, Arrow-batched) encode/search plan; their
        # cost is job composition, not per-row work.
        "q239_pq_codebooks",
        "q240_pq_adc_topk",
        "q241_pq_recall",
        "q248_ivfpq_cells",
        "q249_ivfpq_adc_topk",
        "q250_ivfpq_recall",
        "q255_ivfpq_qerr_by_cell",
    }
)

# CODEC tier (VERDICT r11 #2): the per-row entropy-coder/pixel-codec
# specs run at ~5x the core mean for intrinsic reasons (real
# Huffman/LZW/DCT/filter work per payload, zero-Exchange scan-stage
# plans — each individually plan-locked). Left inside the core band
# they erode its regression-detection value as the codec surface grows,
# so they get their own band. Membership = every spec whose dominant
# cost is a multimodal.py pixel/sample codec or transcode. q220 (JL
# projection) is deliberately NOT here: it is vector math over the
# embeddings table, not a codec, and belongs to the core profile.
CODEC = frozenset(
    {
        "q84_multimodal_decode",
        "q109_multimodal_decode_ext",
        "q218_multimodal_transform",
        "q219_image_channel_stats",
        "q221_audio_frame_features",
        "q230_png_resize",
        "q232_png_resize_rgb",
        "q233_jpeg_roundtrip",
        "q234_png_jpeg_transcode",
        "q235_png_jpeg_transcode_rgb",
        "q236_wav_resample",
        "q237_gif_roundtrip",
        "q238_gif_png_transcode",
        "q242_jpeg_restart_roundtrip",
        "q243_jpeg_channel_stats",
        "q244_jpeg_420_roundtrip",
        "q245_png_depth_roundtrip",
        "q246_g711_companding",
        "q247_ima_adpcm",
        "q251_jpeg_progressive_roundtrip",
        "q252_jpeg_422_roundtrip",
        "q253_wav_codec_container",
        "q254_compressed_audio_features",
        "q256_jpeg_411_roundtrip",
        "q257_jpeg_progressive_420",
        "q258_jpeg_ac_refine",
        "q259_mjpeg_avi_frames",
        "q260_mjpeg_avi_resample",
        "q261_avi_audio_extract",
    }
)
assert not (COMPOSED & CODEC), "a spec may belong to exactly one band"

# Measured band thresholds. r16 basis note (CODEC membership changed
# 28 → 29 with q261, re-derived on this round's quiet sweep — see the
# "Measured (round 16)" BASELINE.md section when it lands; q261 is an
# in-class G.711+container spec, isolated ≈0.6-0.8 s at sf0.1).
# Prior r15 basis re-derivation (CODEC membership
# changed 26 → 28 with q259/q260, so the band comment restates the
# basis per the standing rule): quiet r15 full run 288.6 s / 259
# (sentinel samples 0.321/0.209/0.130/0.124 — hot first third, the
# recheck block adjudicated q84/q78/q80 as that transient: sweep
# 15.5/4.1/3.0 s, recheck 0.68/0.78/0.69 at sentinel 0.120). CODEC
# outlier-adjusted mean 0.662 s/spec for 28 members (q259 0.76,
# q260 0.95 — both in class); band STAYS 1.4 (~2x basis). Core
# adjusted 0.833 raw with the hot first third included — band stays
# 0.80 with the sentinel-first interpretation rule below. COMPOSED
# 4.20 raw (band 3.8; isolated PQ medians match the r13/r14 class).
# Prior r14 basis (quiet full run AFTER the two
# r14 engine fixes — the input-width guard on the codec maps and the
# AppStatusListener retention cap in session.py — 257 specs, 289.1 s,
# sentinel samples 0.361/0.222/0.127/0.137): core 0.906 raw at a
# ~1.3x sentinel = 0.69 normalized — the r13 basis (0.659) within
# noise; band stays 0.80 (stated at the 0.10-0.13 sentinel; apply the
# sentinel ratio before comparing). COMPOSED (17 members incl. q255)
# 4.52 raw = 3.4 normalized — inside the 3.8 band (the 8.28 reading
# before the retention cap was listener-state GC debt: with the
# default 100k-task retention the mid-run sentinel hit 0.672; capped,
# the spike is gone and q249 read 7.9 instead of 32.4). CODEC
# re-derived for the 26-member tier (VERDICT r13 #2): 0.704 raw after
# the input-width guard (the tier had been running single-core on
# one-file inputs); band = 1.4 (~2x the quiet basis) — the old 2.8
# band could NOT catch a regression back to the single-core plan
# (which measured 2.2 quiet); 1.4 can. The PQ family reports
# median-of-3 (see high_variance below): its cost is sequential
# Lloyd/search JOBS, and scheduler swing at sf0.1 dwarfs plan work.
# Interpretation rule: compare sentinel_last (and the mid-run samples)
# FIRST — a tier above band with a proportionally hot sentinel is box
# load, a tier above band with flat sentinels is a plan regression.
# Re-derive (quiet box, full run, state the new basis here) whenever
# tier MEMBERSHIP changes — a band carried across a membership change
# is exactly the false alarm VERDICT r12 flagged.
BANDS_S_PER_SPEC = {"core": 0.80, "composed": 3.8, "codec": 1.4}

# Outlier self-adjudication (VERDICT r14 #2): a spec reading more than
# RECHECK_RATIO x its committed BENCH_FULL.json reference inside a
# sweep is automatically RE-RUN (best-of-2) at the END of the sweep in
# the same session, and BOTH readings land in the JSON under
# `rechecks`. Motivation: the r14 driver map read q226 at 39.9 s
# (11.8x its r13 reading) while every quiet measurement — including
# the judge's own isolated best-of-3 — read ~3 s; the sentinel
# protocol brackets box load but cannot localize a one-spec transient,
# so the harness itself must produce the second reading instead of a
# human re-measuring each round. The recheck block samples the
# sentinel first: a recheck that is STILL hot under a hot sentinel is
# box load; still hot under a quiet sentinel is a real regression.
RECHECK_RATIO = 3.0
RECHECK_FLOOR_S = 0.5  # ignore ratio trips inside scheduler noise
RECHECK_MAX = 20  # bound added sweep time; worst offenders first

# Recheck escalation (VERDICT r15 #3): the same-session recheck cannot
# clear SESSION-LOCAL Python-worker heat — r15's q84 (3.89 s) and q118
# (4.14 s) "failed" their rechecks at a clean q14_topk sentinel yet
# read 0.68/1.64 s in the committed quiet sweep, because the JVM
# sentinel is blind to Arrow/Python-worker-pool state. Two fixes:
# (a) a second, tiny mapInPandas sentinel (time_py_sentinel) sampled
#     alongside q14_topk brackets exactly that state;
# (b) a recheck still > ESCALATE_RATIO x its reference while BOTH
#     sentinels are clean escalates to ONE fresh-subprocess re-run
#     (new JVM + new Python-worker pool), recorded in the same
#     `rechecks` entry — the harness produces the isolated reading a
#     judge previously had to take by hand.
COMPACT_DOC_MAX = 1500  # bytes; r15's capture window kept only 2,273
ESCALATE_RATIO = 2.5
ESCALATE_MAX = 5  # each escalation pays a ~20-30 s JVM cold start
ESCALATE_SENTINEL_CLEAN = 1.5  # "clean" = within 1.5x the session min
ESCALATE_TIMEOUT_S = 300


def time_py_sentinel(spark) -> float:
    """Arrow/Python-worker sentinel: a fixed tiny mapInPandas identity
    over 8 partitions. Pure JVM load leaves it flat; a hot Python
    worker pool / Arrow channel (the q84/q118 failure mode) shows up
    here and nowhere in q14_topk."""

    def _ident(batches):
        yield from batches

    t0 = time.perf_counter()
    spark.range(0, 8192, 1, 8).mapInPandas(_ident, "id long").write.format(
        "noop"
    ).mode("overwrite").save()
    return time.perf_counter() - t0


def fresh_subprocess_time(name: str, sf_dir: str, repo_dir: str):
    """Best-of-2 (after one codegen warmup) for one spec in a FRESH
    subprocess — new JVM, new Python-worker pool, no session-local
    heat. Returns seconds, or None if the subprocess fails/times out
    (recorded as-is; never fails the sweep)."""
    import subprocess

    code = (
        "import sys, time\n"
        f"sys.path.insert(0, {repo_dir!r})\n"
        "from kassette_server_spark.queries import all_specs\n"
        "from kassette_server_spark.session import get_spark\n"
        "spark = get_spark(app_name='kassette-bench-escalate')\n"
        f"spec = all_specs()[{name!r}]\n"
        "def run():\n"
        f"    spec.fn(spark, {sf_dir!r}).write.format('noop')"
        ".mode('overwrite').save()\n"
        "run()\n"
        "times = []\n"
        "for _ in range(2):\n"
        "    t0 = time.perf_counter(); run()\n"
        "    times.append(time.perf_counter() - t0)\n"
        "print('ESCALATED_BEST %.4f' % min(times), file=sys.stderr)\n"
    )
    try:
        proc = subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True,
            text=True,
            timeout=ESCALATE_TIMEOUT_S,
        )
        m = re.search(r"ESCALATED_BEST ([0-9.]+)", proc.stderr + proc.stdout)
        return float(m.group(1)) if m else None
    except Exception:
        return None


def select_outliers(
    timings: dict[str, float],
    reference: dict[str, float],
    ratio: float = RECHECK_RATIO,
    floor: float = RECHECK_FLOOR_S,
    cap: int = RECHECK_MAX,
) -> list[tuple[str, float, float]]:
    """(name, sweep_s, ref_s) for every spec tripping the recheck rule,
    worst ratio first, capped. Specs absent from the reference (new
    this round) are never outliers — there is nothing to contradict."""
    return sorted(
        (
            (name, t, reference[name])
            for name, t in timings.items()
            if name in reference and t > floor and t > ratio * reference[name]
        ),
        key=lambda x: -(x[1] / x[2]),
    )[:cap]


def load_reference_timings(path: str) -> dict[str, float]:
    """Per-spec reference = the committed previous-generation
    BENCH_FULL.json (read BEFORE the sweep overwrites it). Empty when
    absent/unparseable — first generation has nothing to adjudicate
    against.

    A spec the previous sweep ITSELF adjudicated (a `rechecks` entry)
    uses its recheck reading as the reference, not the hot sweep
    value — otherwise one transient poisons the next round's detector
    (a q84 sweep reading of 15.5 s with a 0.68 s recheck must not set
    the bar at 3x15.5)."""
    try:
        with open(path) as f:
            doc = json.load(f)
        ref = {
            str(k): float(v)
            for k, v in doc.get("queries", {}).items()
            if isinstance(v, (int, float)) and v > 0
        }
        for k, rc in doc.get("rechecks", {}).items():
            # the most-isolated prior reading wins: fresh-subprocess
            # escalation > same-session recheck > (never) the hot sweep
            v = None
            for key in ("fresh_subprocess", "recheck"):
                try:
                    v = float(rc[key])
                    break
                except (TypeError, KeyError, ValueError):
                    continue
            if v is not None and k in ref and v > 0:
                ref[k] = v
        return ref
    except (OSError, ValueError):
        return {}


def build_compact_doc(
    *,
    timings: dict[str, float],
    total: float,
    core_total: float,
    n_core: int,
    composed_total: float,
    n_composed: int,
    codec_total: float,
    n_codec: int,
    sentinel: str,
    sentinel_samples: list[float],
    py_sentinel_samples: list[float],
    rechecks: dict[str, dict],
    sf: float,
) -> str:
    """The single stdout JSON line, size-gated.

    The driver archives only a finite TAIL of stdout; the 142-entry
    per-query map overflowed it in r6 (parsed:null, VERDICT r6 #2) and
    the r15 recheck feature re-introduced the same failure by embedding
    the full 16-entry rechecks map (VERDICT r15 "What's wrong" #1 —
    the capture kept only the final 2,273 bytes and beheaded the JSON).
    So: slowest-10 queries only, rechecks as count + the 3 worst by
    sweep/ref ratio, and a hard assert against COMPACT_DOC_MAX. The
    full maps live in BENCH_FULL.json."""
    slowest = dict(sorted(timings.items(), key=lambda kv: -kv[1])[:10])
    rechecks_compact = {
        "count": len(rechecks),
        "top3": {
            n: {
                "sweep": rc["sweep"],
                "recheck": rc["recheck"],
                **(
                    {"fresh": rc["fresh_subprocess"]}
                    if "fresh_subprocess" in rc
                    else {}
                ),
            }
            for n, rc in sorted(
                rechecks.items(),
                key=lambda kv: -(kv[1]["sweep"] / kv[1]["ref"]),
            )[:3]
        },
    }
    doc = json.dumps(
        {
            "metric": "declared_query_set_total_wall_clock",
            "value": total,
            "unit": "sec",
            "queries": slowest,
            "n_queries": len(timings),
            "sec_per_query": round(total / max(1, len(timings)), 4),
            "core_sec_per_query": round(core_total / max(1, n_core), 4),
            "composed_sec_per_query": round(
                composed_total / max(1, n_composed), 4
            ),
            "codec_sec_per_query": round(codec_total / max(1, n_codec), 4),
            "n_core": n_core,
            "n_composed": n_composed,
            "n_codec": n_codec,
            "sentinel": sentinel,
            "sentinel_first": sentinel_samples[0],
            "sentinel_last": sentinel_samples[-1],
            "sentinel_samples": sentinel_samples,
            "py_sentinel_samples": py_sentinel_samples,
            "bands_s_per_spec": BANDS_S_PER_SPEC,
            "rechecks": rechecks_compact,
            "sf": sf,
            "full_map": "BENCH_FULL.json",
        }
    )
    assert len(doc) < COMPACT_DOC_MAX, (
        f"compact stdout doc is {len(doc)} bytes (cap {COMPACT_DOC_MAX}) — "
        "it would overflow the driver's stdout tail capture and the round "
        "would record parsed:null; trim it, never widen it"
    )
    return doc


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else -1.0

    # The result JSON must be the ONLY stdout line (the driver parses
    # stdout; VERDICT r5 #6 — BENCH_r4/r5 archived `parsed: null`
    # because JVM launcher banners share fd 1). Park the real stdout on
    # a spare fd and point fd 1 at stderr BEFORE the JVM forks, so
    # every banner/warning — Python or JVM child — lands on stderr.
    result_fd = os.dup(1)
    os.dup2(2, 1)

    repo_dir = os.path.dirname(os.path.abspath(__file__))
    full_path = os.path.join(repo_dir, "BENCH_FULL.json")
    reference = load_reference_timings(full_path)  # before the overwrite

    spark = get_spark(app_name="kassette-bench")
    specs = all_specs()

    # warmup: JIT/codegen + parquet footer caches
    run_to_completion(specs["q01_scan_filter"].fn(spark, sf_dir))

    def time_spec(name: str) -> float:
        t0 = time.perf_counter()
        run_to_completion(specs[name].fn(spark, sf_dir))
        return time.perf_counter() - t0

    # Noise sentinel (VERDICT r7 #4, r9 #2): the same fixed cheap spec
    # timed immediately after warmup, at each third of the sweep, and
    # again after it. If the total moved together with the sentinels vs
    # the prior round, the shift is ambient box load, not a plan
    # regression. The MID-RUN samples exist because a load transient
    # confined to the middle of the run is invisible to a first/last
    # pair — the r9 driver run showed the alphabetically-contiguous
    # q202-q211 stretch at ~2x with quiet endpoints (VERDICT r9 "What's
    # wrong" #1); three-plus samples bracket every third of the sweep.
    SENTINEL = "q14_topk"
    # warm the Python-worker pool once so the first py-sentinel sample
    # measures steady state, not worker-process fork cost
    time_py_sentinel(spark)
    sentinel_samples: list[float] = [
        round(min(time_spec(SENTINEL) for _ in range(2)), 4)
    ]
    py_sentinel_samples: list[float] = [
        round(min(time_py_sentinel(spark) for _ in range(2)), 4)
    ]

    # best-of-2: first run pays whole-stage-codegen compilation for the
    # plan shape, second measures steady-state engine throughput. The
    # iterative/fixpoint specs swing ±50 % from per-job scheduler
    # overhead on this box, so they report MEDIAN-of-3 instead — a
    # round-over-round regression on them then means plan work changed,
    # not that the scheduler had a bad day (VERDICT r4 #7).
    high_variance = {
        "q57_simhash_near_dup",
        "q68_near_dup_clusters",
        # iterative/multi-job: 3 power iterations x broadcast+checkpoint
        # — swung 1.6-8 s across six r15 measurements (VERDICT r15 #2)
        "q118_power_iteration_pca",
        # the PQ/IVF-PQ family runs sequential Lloyd/search JOBS whose
        # per-job scheduler overhead dominates at sf0.1 — quiet-box
        # best-of-3 reads q249 at 1.1 s vs 5-10 s inside a long bench
        # session (r13 recheck); median-of-3 keeps the COMPOSED tier's
        # readings about plan work, not the scheduler's day.
        "q239_pq_codebooks",
        "q240_pq_adc_topk",
        "q241_pq_recall",
        "q248_ivfpq_cells",
        "q249_ivfpq_adc_topk",
        "q250_ivfpq_recall",
        "q255_ivfpq_qerr_by_cell",
    }
    timings: dict[str, float] = {}
    spreads: dict[str, float] = {}
    names = sorted(specs)
    third = max(1, (len(names) + 2) // 3)
    for i, name in enumerate(names):
        samples = [time_spec(name) for _ in range(3 if name in high_variance else 2)]
        if name in high_variance:
            timings[name] = round(sorted(samples)[1], 4)  # median of 3
            spreads[name] = round(max(samples) - min(samples), 4)
        else:
            timings[name] = round(min(samples), 4)
        if (i + 1) % third == 0 and (i + 1) < len(names):
            sentinel_samples.append(
                round(min(time_spec(SENTINEL) for _ in range(2)), 4)
            )
            py_sentinel_samples.append(
                round(min(time_py_sentinel(spark) for _ in range(2)), 4)
            )

    sentinel_samples.append(round(min(time_spec(SENTINEL) for _ in range(2)), 4))
    py_sentinel_samples.append(
        round(min(time_py_sentinel(spark) for _ in range(2)), 4)
    )

    # end-of-sweep outlier rechecks (VERDICT r14 #2): same session, so
    # a transient that hit only one stretch of the sweep has passed by
    # now, while a plan regression reproduces.
    outliers = select_outliers(timings, reference)
    rechecks: dict[str, dict[str, float]] = {}
    if outliers:
        sentinel_recheck = round(min(time_spec(SENTINEL) for _ in range(2)), 4)
        py_sentinel_recheck = round(
            min(time_py_sentinel(spark) for _ in range(2)), 4
        )
        # "clean" = within ESCALATE_SENTINEL_CLEAN x this session's own
        # minimum, i.e. the box is at its observed-best on BOTH the JVM
        # and the Python-worker axes right now
        jvm_clean = sentinel_recheck <= ESCALATE_SENTINEL_CLEAN * min(
            sentinel_samples
        )
        py_clean = py_sentinel_recheck <= ESCALATE_SENTINEL_CLEAN * min(
            py_sentinel_samples
        )
        escalated = 0
        for name, t, ref in outliers:
            rc: dict[str, float] = {
                "sweep": t,
                "ref": ref,
                "recheck": round(min(time_spec(name) for _ in range(2)), 4),
                "sentinel_at_recheck": sentinel_recheck,
                "py_sentinel_at_recheck": py_sentinel_recheck,
            }
            # VERDICT r15 #3: still >2.5x reference with both sentinels
            # clean — same-session state the sentinels can't see, or a
            # real regression; one fresh subprocess decides which.
            if (
                rc["recheck"] > ESCALATE_RATIO * ref
                and jvm_clean
                and py_clean
                and escalated < ESCALATE_MAX
            ):
                fresh = fresh_subprocess_time(name, sf_dir, repo_dir)
                rc["fresh_subprocess"] = (
                    round(fresh, 4) if fresh is not None else None
                )
                escalated += 1
            rechecks[name] = rc

    sentinel_first, sentinel_last = sentinel_samples[0], sentinel_samples[-1]
    total = round(sum(timings.values()), 4)

    composed_total = round(sum(t for n, t in timings.items() if n in COMPOSED), 4)
    n_composed = sum(1 for n in timings if n in COMPOSED)
    codec_total = round(sum(t for n, t in timings.items() if n in CODEC), 4)
    n_codec = sum(1 for n in timings if n in CODEC)
    core_total = round(total - composed_total - codec_total, 4)
    n_core = len(timings) - n_composed - n_codec
    doc = build_compact_doc(
        timings=timings,
        total=total,
        core_total=core_total,
        n_core=n_core,
        composed_total=composed_total,
        n_composed=n_composed,
        codec_total=codec_total,
        n_codec=n_codec,
        sentinel=SENTINEL,
        sentinel_samples=sentinel_samples,
        py_sentinel_samples=py_sentinel_samples,
        rechecks=rechecks,
        sf=sf,
    )
    full = json.dumps(
        {
            "metric": "declared_query_set_total_wall_clock",
            "value": total,
            "unit": "sec",
            "queries": timings,
            "sf": sf,
            "sentinel": SENTINEL,
            "sentinel_first": sentinel_first,
            "sentinel_last": sentinel_last,
            "sentinel_samples": sentinel_samples,
            "py_sentinel_samples": py_sentinel_samples,
            "core_sec_per_query": round(core_total / max(1, n_core), 4),
            "composed_sec_per_query": round(
                composed_total / max(1, n_composed), 4
            ),
            "codec_sec_per_query": round(codec_total / max(1, n_codec), 4),
            "composed_tier": sorted(COMPOSED),
            "codec_tier": sorted(CODEC),
            "median_of_3": sorted(high_variance),
            "rechecks": rechecks,
            "recheck_rule": f"sweep > {RECHECK_RATIO}x committed "
            f"BENCH_FULL reference and > {RECHECK_FLOOR_S}s -> "
            "best-of-2 re-run at end of sweep, same session",
            "escalate_rule": f"recheck still > {ESCALATE_RATIO}x reference "
            f"with BOTH sentinels <= {ESCALATE_SENTINEL_CLEAN}x their "
            "session min -> one fresh-subprocess best-of-2 "
            f"(cap {ESCALATE_MAX}), recorded as fresh_subprocess",
            "spread_sec": spreads,
            "variance_note": "median-of-3 specs are iterative "
            "(fixpoint CC / banded verify) and swing with per-job "
            "scheduler overhead; all others are best-of-2",
        },
        indent=1,
    )
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_FULL.json"), "w") as f:
        f.write(full + "\n")
    spark.stop()
    os.write(result_fd, (doc + "\n").encode())
    os.close(result_fd)


if __name__ == "__main__":
    main()
