#!/usr/bin/env python
"""End-to-end training-corpus curation pipeline — the LLM-ops
operators composed the way a 100 TB data pipeline would run them:

  1. normalize text (pre-dedup canonical form)
  2. exact dedup on the normalized digest
  3. near-dup dedup: MinHash-LSH pairs → connected components →
     keep cluster representatives
  4. quality filter (C4-style reasons)
  5. benchmark decontamination (8-gram overlap vs an eval slice)
  5d. deterministic train/val/test split (salted md5, map-only)
  6. sequence packing into fixed-token shards
  7. write the curated corpus partitioned by (split, shard bucket)

Run: python examples/curate_corpus.py [sf_dir]
Prints per-stage survivor counts and the final plan summary.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from kassette_server_spark.catalog import load
from kassette_server_spark.operators import curation, dedup
from kassette_server_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="curate-corpus")
    docs = load(spark, sf_dir, "documents")
    n0 = docs.count()

    # 1-2. normalize + exact dedup (keep the min doc_id per digest)
    normed = docs.select(
        "doc_id", "lang", dedup.normalize_text("text").alias("text")
    )
    keepers = (
        dedup.exact_dedup(normed)
        .select(F.col("keeper").alias("doc_id"))
    )
    uniq = normed.join(keepers, "doc_id")
    n1 = uniq.count()

    # 3. near-dup clusters over MinHash-LSH pairs; keep representatives
    pairs = dedup.minhash_lsh_pairs(uniq, threshold=0.8).select("doc_a", "doc_b")
    clusters = dedup.connected_components(pairs, uniq.select("doc_id"))
    reps = clusters.filter(F.col("cluster_id") == F.col("doc_id")).select("doc_id")
    deduped = uniq.join(reps, "doc_id")
    n2 = deduped.count()

    # 4. quality gate
    verdicts = curation.quality_filter(deduped)
    kept = deduped.join(verdicts.filter("keep").select("doc_id"), "doc_id")
    n3 = kept.count()
    reasons = {r["reason"]: r["n"] for r in
               verdicts.groupBy("reason").agg(F.count("*").alias("n")).collect()}

    # 5. decontamination vs a held-out "benchmark" slice — shingled
    # from the SAME normalized frame as the corpus: raw-vs-normalized
    # text would produce disjoint 8-grams and silently miss leaks
    bench = normed.filter(F.col("doc_id") % 50 == 0)
    contam = curation.contamination(kept, bench, k=8)
    clean = kept.join(contam.filter(~F.col("contaminated")).select("doc_id"), "doc_id")
    n4 = clean.count()

    # 5b. audit the surviving distribution: per-source token entropy
    # (a source whose entropy collapsed is boilerplate that slipped the
    # repetition gate) and a one-pass column profile of the output
    from kassette_server_spark.operators.profiling import profile_columns
    from kassette_server_spark.operators.sampling import priority_sample
    from kassette_server_spark.operators.textstats import token_entropy_by

    src_docs = docs.select("doc_id", "source").join(clean.select("doc_id"), "doc_id")
    entropy = token_entropy_by(
        clean.join(src_docs.select("doc_id", "source"), "doc_id"), "source"
    )
    profile = profile_columns(clean, ("doc_id", "lang", "text"))

    # 5c. weighted mixing sample: deterministic priority sample by
    # length — the reproducible "pick k docs ∝ weight" primitive a
    # mixing recipe is built from
    weighted = clean.select("doc_id", F.length("text").alias("w"))
    sample = priority_sample(weighted, "doc_id", "w", k=min(100, n4))

    # 5d. reproducible train/val/test assignment BEFORE packing (val
    # and test must never share a packed shard with train): map-only,
    # stable across reruns and corpus growth
    from kassette_server_spark.operators.sampling import dataset_split

    split_docs = dataset_split(clean, "doc_id")
    split_counts = {
        r.split: r["count"]
        for r in split_docs.groupBy("split").count().collect()
    }

    # 6-7. pack EACH SPLIT separately into fixed-token shards (packing
    # the unsplit corpus would let one shard's token window span a
    # train doc and a val/test doc — exactly the leak the early split
    # exists to prevent), write partitioned by (split, bucket)
    packed = None
    for s in split_counts:
        p = curation.sequence_packing(
            split_docs.where(F.col("split") == s)
        ).withColumn("split", F.lit(s))
        packed = p if packed is None else packed.unionByName(p)
    out_dir = os.path.join(tempfile.mkdtemp(prefix="curated-"), "corpus")
    (
        split_docs.join(packed.select("doc_id", "bucket", "shard_id"), "doc_id")
        .write.partitionBy("split", "bucket")
        .mode("overwrite")
        .parquet(out_dir)
    )
    n5 = spark.read.parquet(out_dir).count()
    shards = packed.select("split", "bucket", "shard_id").distinct().count()

    print(f"\ninput docs:            {n0}")
    print(f"after exact dedup:     {n1}  (-{n0 - n1})")
    print(f"after near-dup dedup:  {n2}  (-{n1 - n2})")
    print(f"after quality filter:  {n3}  (-{n2 - n3}, reasons: {reasons})")
    print(f"after decontamination: {n4}  (-{n3 - n4})")
    print("entropy by source:     "
          + ", ".join(f"{r.grp}={r.entropy:.3f}" for r in
                      sorted(entropy.collect(), key=lambda r: r.grp)[:5]) + ", ...")
    print("profile:               "
          + ", ".join(f"{r.col_name}(nulls={r.n_nulls}, ndv={r.ndv})"
                      for r in profile.collect()))
    print(f"mixing sample:         {sample.count()} docs by length-weighted priority")
    print(f"split:                 {split_counts}")
    print(f"written:               {n5} docs into {shards} shards at {out_dir}")
    spark.stop()


if __name__ == "__main__":
    main()
