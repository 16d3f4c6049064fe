#!/usr/bin/env python
"""ANN tuning loop — how a pipeline owner commissions an IVF index
BEFORE it serves a 100 TB corpus, composing the round-9 similarity
operators the way they're meant to chain:

  1. jl_project: sketch the embedding column 64→16 (the full-width
     vectors never leave their scan; everything downstream runs on
     4× fewer flops)
  2. ivf layout: coarse centroids (a corpus sample here; k-means
     centroids in production — the layout choice is orthogonal to
     this loop)
  3. ann_recall_at_k: measure recall@10 of the probe budget against
     exact brute force on a QUERY SAMPLE — the gate that turns
     n_probe from a guess into a measured knob
  4. raise n_probe until mean recall clears the target, THEN serve;
     every probe step costs work ∝ probed-cluster sizes, so the loop
     finds the cheapest budget that meets the bar

On the synthetic corpus the 1-probe budget already sits high (the
clusters are well separated); the loop's value is the exit criterion,
not the specific numbers.

Run: python examples/ann_tuning.py [sf_dir] [target_recall]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from kassette_server_spark.catalog import load
from kassette_server_spark.operators.similarity import (
    ann_recall_at_k,
    jl_project,
    sketch_recall_at_k,
)
from kassette_server_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    target = float(sys.argv[2]) if len(sys.argv) > 2 else 0.95
    spark = get_spark(app_name="ann-tuning")
    emb = load(spark, sf_dir, "embeddings")

    # 1. the sketch the index would store — GATED first: does search
    # in sketch space still find the full-space neighbors on THIS
    # corpus? (On the synthetic near-random embeddings it does not —
    # measured mean recall ~0.16 — which is exactly the verdict that
    # keeps the sketch out of the serving path here.)
    sketch = jl_project(emb, in_dim=64, out_dim=16)
    print(f"sketch rows: {sketch.count()} (16 components per vector)")
    sk_gate = sketch_recall_at_k(
        emb, queries=emb.filter(F.col("vec_id") % 100 == 0), k=10
    )
    sk_mean = sk_gate.agg(F.avg("recall").alias("r")).collect()[0].r
    print(
        f"sketch-space recall@10 = {sk_mean:.3f} -> "
        + ("sketch serves" if sk_mean >= target else "serve FULL-width vectors")
    )

    # 2-4. the tuning loop: query sample + centroid layout fixed,
    # n_probe rises until mean recall clears the target
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    centroids = emb.filter(F.col("vec_id") % 50 == 0)
    for n_probe in (1, 2, 4, 8):
        rec = ann_recall_at_k(
            emb, queries=queries, centroids=centroids, k=10, n_probe=n_probe
        )
        mean_recall = rec.agg(F.avg("recall").alias("r")).collect()[0].r
        worst = rec.agg(F.min("recall").alias("r")).collect()[0].r
        print(
            f"n_probe={n_probe}: mean recall@10 = {mean_recall:.3f}, "
            f"worst query = {worst:.2f}"
        )
        if mean_recall >= target:
            print(f"-> serve with n_probe={n_probe} (target {target} met)")
            break
    else:
        print(
            f"-> no probe budget up to 8 met {target}; grow the "
            "centroid count or serve brute-force on this corpus size"
        )


if __name__ == "__main__":
    main()
