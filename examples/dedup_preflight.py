#!/usr/bin/env python
"""Dedup pre-flight — how a pipeline owner picks the exact-dedup
strategy BEFORE paying for a failed 100 TB run, composing the
round-8 diagnostics the way they're meant to chain:

  1. shingle_saturation_report: is the k-gram space saturated?
     (distinct-vs-possible shingles, df tail, exact all-pairs volume)
  2. decide k: walk k upward until the report shows a rare tail
     (heuristic here: avg_df under a small constant, i.e. distinct
     shingles growing with the space instead of pinned at its size)
  3. run prefix_filtered_jaccard_pairs under max_candidate_volume —
     the guard that raises instead of melting the cluster if the
     report's verdict was wrong (data changed under you)
  4. the fallback the guard's message points to: minhash_lsh_pairs,
     sub-linear on closed vocabularies (measured — SCALE.md 32x
     sweep) because banding collides only true high-Jaccard pairs

On this synthetic corpus (31-word vocabulary) the report shows k=3
saturated (~27k distinct ≈ 31³ possible, avg df ~10) and k=5 open —
matching the measured 206x-vs-27.7x wall-clock split at 32x docs.

Run: python examples/dedup_preflight.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kassette_server_spark.catalog import load
from kassette_server_spark.operators.dedup import (
    minhash_lsh_pairs,
    prefix_filtered_jaccard_pairs,
)
from kassette_server_spark.operators.diagnostics import (
    shingle_saturation_report,
)
from kassette_server_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="dedup-preflight")
    docs = load(spark, sf_dir, "documents")

    # 1-2. probe k until the shingle space shows a rare tail
    chosen_k = None
    for k in (3, 5, 7):
        r = shingle_saturation_report(docs, k=k).collect()[0]
        print(
            f"k={k}: vocab={r.vocab_size} distinct={r.distinct_shingles} "
            f"instances={r.instances} avg_df={r.avg_df:.2f} "
            f"max_df={r.max_df} p99_df={r.p99_df} "
            f"allpairs_volume={r.allpairs_volume}"
        )
        if r.avg_df <= 2.0:  # rare tail exists: most shingles near-unique
            chosen_k = k
            break
    print(f"chosen k: {chosen_k or 'none — LSH path'}")

    # 3. exact path under the guard (budget: 100 candidate pairs/doc)
    n_docs = docs.count()
    budget = 100 * n_docs
    if chosen_k is not None:
        try:
            pairs = prefix_filtered_jaccard_pairs(
                docs, k=chosen_k, max_candidate_volume=budget
            )
            print(f"exact prefix-filter pairs (k={chosen_k}): {pairs.count()}")
        except ValueError as e:
            print(f"guard tripped despite report — fallback to LSH: {e}")
            chosen_k = None

    # 4. the closed-vocabulary fallback
    if chosen_k is None:
        lsh = minhash_lsh_pairs(docs, threshold=0.8)
        print(f"minhash-lsh pairs: {lsh.count()}")

    # 5. carry the decision to the STREAMING ingest path (r10 wiring):
    # plan the banding frontier once, then hand the chosen row straight
    # to the stream constructor — the S-curve printed here is exactly
    # the curve the stream will run, no manual (r, b) translation.
    from kassette_server_spark.operators.dedup import (
        minhash_dedup_stream_from_plan,
    )
    from kassette_server_spark.operators.diagnostics import lsh_band_plan

    plan = lsh_band_plan(spark, n_hashes=16, threshold=0.8, sims=(0.5, 0.8))
    chosen = next(r for r in plan.collect() if r.chosen)
    print(
        f"stream layout: r={chosen.r} b={chosen.b} "
        f"p(0.8)={chosen.p_at_80:.3f} p(0.5)={chosen.p_at_50:.3f} "
        f"sep={chosen.sep:.3f}"
    )
    stream_src = (
        spark.readStream.format("rate").load()
        .selectExpr(
            "value AS doc_id", "'sample text here' AS text",
            "timestamp AS ts",
        )
    )
    verdicts = minhash_dedup_stream_from_plan(
        stream_src, chosen, threshold=0.8, watermark="30 minutes"
    )
    print(f"stream verdict schema: {verdicts.schema.simpleString()}")

    # 6. the OTHER pre-flight→consumer wiring (r11): profile the join
    # key you are about to shuffle on, then hand the hottest-key row
    # straight to the salted join — the profiler's salt_r IS the
    # replication factor, no manual re-derivation.
    from kassette_server_spark.catalog import load as _load
    from kassette_server_spark.operators.diagnostics import key_skew_profile
    from kassette_server_spark.operators.layout import salted_join_from_profile

    ev = _load(spark, sf_dir, "events").select("event_id", "user_id")
    dims = ev.groupBy("user_id").count()
    prof = key_skew_profile(ev, "user_id", target_partitions=32, top_n=1)
    row = prof.collect()[0]
    print(
        f"join-key profile: skew_ratio={row.skew_ratio:.2f} "
        f"max_cnt={row.max_cnt} salt_r={row.salt_r}"
    )
    joined = salted_join_from_profile(ev, dims, "user_id", row)
    print(f"salted join rows (== plain join): {joined.count()}")

    spark.stop()


if __name__ == "__main__":
    main()
