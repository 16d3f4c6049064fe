"""Round-9 specs (q213-q219): the two follow-throughs the r8 verdict
named as the only functional gaps at the edge of the LLM-pipeline
brief — BPE *apply* (q171 learns merge rules; nothing tokenized the
corpus WITH them) and substring-dedup *removal* (q92 profiles
duplicated spans; nothing emitted the deduplicated corpus) — plus the
packing variant that consumes real tokenizer counts, the learned
vocabulary table (q216), the composed LLM-curation pipeline e2e
(q217), and the multimodal TRANSFORM tier (q218 resize/decimate/
frame-sample, q219 pixel feature extraction — real stdlib byte
surgery, q84's closed-form-oracle recipe).

- q213: per-document token counts under the corpus's own learned BPE
  merges (textstats.bpe_token_counts) — whitespace words vs post-merge
  symbols, the "how many REAL tokens is this corpus" number.
- q214: training-shard packing driven by q213's BPE counts
  (curation.sequence_packing_from_counts) instead of q72's
  ceil(len/4) heuristic — same bucketed no-global-cumsum plan.
- q215: Lee et al. 2022 substring dedup removal
  (dedup.remove_duplicated_spans): every corpus-duplicated 8-token
  gram keeps its first occurrence, other occurrences' spans are cut,
  and the cleaned text is re-emitted.

Determinism: all-integer counts and offsets; q215's only strings are
exact token re-concats (order fixed by token position). Oracles are
the operators' paired *_oracle_sql mirrors.

Registered after the 50-spec driver window; first driver rows land
per the standing rotation (queries/__init__.py — the amended r10 plan
gives the full r9-born wave q213-q223 first-round slots beside
q202-q212, locked meanwhile by tests/test_oracle_parity*.py at two
SFs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..operators.curation import sequence_packing_from_counts
from ..operators.dedup import (
    remove_duplicated_spans,
    remove_duplicated_spans_oracle_sql,
)
from ..operators.textstats import (
    bpe_token_counts,
    bpe_token_counts_oracle_sql,
    bpe_vocab,
    bpe_vocab_oracle_sql,
)
from .base import query

_BPE_COUNTS_SQL = bpe_token_counts_oracle_sql(
    "SELECT doc_id, text FROM documents"
)


@query(
    "q213_bpe_token_counts",
    oracle=_BPE_COUNTS_SQL,
    doc="per-doc token counts under the corpus's learned BPE merges "
    "(k=3) — the apply half of q171's tokenizer training",
    tags=("llmops", "text"),
)
def q213(spark: SparkSession, sf: str) -> DataFrame:
    return bpe_token_counts(load(spark, sf, "documents"), k_merges=3)


@query(
    "q214_bpe_sequence_packing",
    oracle=f"""
    WITH counts AS ({_BPE_COUNTS_SQL}),
    t AS (
      SELECT doc_id, doc_id % 16 AS bucket,
             CAST(n_bpe_tokens AS BIGINT) AS n_tokens
      FROM counts),
    c AS (
      SELECT doc_id, bucket, n_tokens,
             CAST(sum(n_tokens) OVER (PARTITION BY bucket ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens
               AS BIGINT) AS start_offset
      FROM t)
    SELECT doc_id, CAST(bucket AS BIGINT) AS bucket, n_tokens, start_offset,
           CAST(floor(start_offset / 2048) AS BIGINT) AS shard_id
    FROM c
    """,
    doc="training-shard packing driven by REAL (BPE) token counts — "
    "q72's shape with q213's counts swapped in",
    tags=("llmops", "curation"),
)
def q214(spark: SparkSession, sf: str) -> DataFrame:
    counts = bpe_token_counts(load(spark, sf, "documents"), k_merges=3)
    return sequence_packing_from_counts(
        counts, tokens_col="n_bpe_tokens", tokens_per_shard=2048, n_buckets=16
    )


@query(
    "q216_bpe_vocab",
    oracle=bpe_vocab_oracle_sql(
        "SELECT doc_id, text FROM documents", vocab_size=64
    ),
    doc="the learned BPE vocabulary as a (token_id, token, freq) "
    "table — ids by (freq desc, token) total order, top-64 cut",
    tags=("llmops", "text"),
)
def q216(spark: SparkSession, sf: str) -> DataFrame:
    return bpe_vocab(load(spark, sf, "documents"), k_merges=3, vocab_size=64)


@query(
    "q215_substring_dedup_removal",
    oracle=remove_duplicated_spans_oracle_sql(
        "SELECT doc_id, text FROM documents"
    ),
    doc="Lee et al. substring dedup: duplicated 8-gram spans removed "
    "(first occurrence kept), cleaned corpus re-emitted",
    tags=("dedup", "llm"),
)
def q215(spark: SparkSession, sf: str) -> DataFrame:
    return remove_duplicated_spans(load(spark, sf, "documents"), k=8)


# q217: the LLM-data sibling of q28's reference-pipeline e2e — the
# whole curation chain as ONE declarative plan: exact dedup (keep
# min doc_id per md5 digest) → substring span removal (k=8) → BPE
# tokenization with the cleaned corpus's own learned merges (k=3) →
# shard packing (2048 tokens, 16 buckets) → per-shard summary. Every
# stage is an already-oracled operator; the value of the spec is that
# the COMPOSITION holds end-to-end (each stage consumes the previous
# stage's exact output, engine and oracle both).
_CLEANED_SRC = (
    "SELECT doc_id, text FROM (SELECT doc_id, text, row_number() OVER "
    "(PARTITION BY md5(text) ORDER BY doc_id) AS rn FROM documents) d "
    "WHERE rn = 1"
)
_PIPE_COUNTS_SQL = bpe_token_counts_oracle_sql(
    f"SELECT doc_id, cleaned_text AS text FROM ("
    f"{remove_duplicated_spans_oracle_sql(_CLEANED_SRC)}) c"
)


@query(
    "q217_curation_pipeline_e2e",
    oracle=f"""
    WITH counts AS ({_PIPE_COUNTS_SQL}),
    t AS (
      SELECT doc_id, doc_id % 16 AS bucket,
             CAST(n_bpe_tokens AS BIGINT) AS n_tokens
      FROM counts),
    c AS (
      SELECT doc_id, bucket, n_tokens,
             CAST(sum(n_tokens) OVER (PARTITION BY bucket ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens
               AS BIGINT) AS start_offset
      FROM t),
    packed AS (
      SELECT doc_id, bucket, n_tokens, start_offset,
             CAST(floor(start_offset / 2048) AS BIGINT) AS shard_id
      FROM c)
    SELECT CAST(bucket AS BIGINT) AS bucket, shard_id,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS shard_tokens,
           CAST(min(doc_id) AS BIGINT) AS first_doc,
           CAST(max(doc_id) AS BIGINT) AS last_doc
    FROM packed GROUP BY 1, 2
    """,
    doc="LLM-curation e2e: exact dedup -> substring span removal -> "
    "learned-BPE tokenization -> shard packing -> per-shard summary, "
    "one composed plan",
    tags=("llmops", "dedup", "curation", "e2e"),
)
def q217(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load(spark, sf, "documents").select("doc_id", "text")
    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    # checkpointed for the same reason as `cleaned` below: span
    # removal consumes its input three times (grams, tokens, counts)
    deduped = (
        docs.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
        .localCheckpoint(eager=False)
    )
    # ONE materialization of the span-removal stage: bpe_token_counts
    # consumes its input three times (vocabulary scan, the exploded
    # apply join, the id frame), and without the checkpoint each
    # consumer would re-execute the whole gram-shuffle removal —
    # measured 6.98 s -> the checkpoint collapses the recomputation
    # (the pagerank lineage discipline, applied at the composition
    # seam; see bpe_token_counts' docstring note on derived inputs)
    cleaned = (
        remove_duplicated_spans(deduped, k=8)
        .select("doc_id", F.col("cleaned_text").alias("text"))
        .localCheckpoint(eager=False)
    )
    counts = bpe_token_counts(cleaned, k_merges=3)
    packed = sequence_packing_from_counts(
        counts, tokens_col="n_bpe_tokens", tokens_per_shard=2048, n_buckets=16
    )
    return packed.groupBy("bucket", "shard_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("shard_tokens"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


# q218/q219: the multimodal TRANSFORM tier (the brief's decode /
# feature-extract / resize / frame-sample list, three of the four made
# REAL with stdlib byte surgery — q84's oracle recipe: payloads built
# from id formulas, re-parsed by the real decoder AFTER the transform,
# expected values closed-form in the id, so a hash match proves the
# encode → transform → decode round trip).
@query(
    "q218_multimodal_transform",
    # Each CASE arm below mirrors ONE constant of
    # multimodal.transform_media_payloads — keep them in lockstep:
    #   bmp (doc_id%3=0): source dims w=8+id%16, h=8+3id%12 (encode
    #     args), resized to w//2 x h//2 (resize_bmp_payload call);
    #   wav (doc_id%3=1): source n=256+id%1024 samples at rate
    #     8000+100(id%80) (encode_wav args), decimated by factor 2 —
    #     kept samples ceil(n/2) = (n+1)//2, rate halved, duration_ms
    #     = kept*1000 // (rate//2) (parse_wav_meta's derivation);
    #   gif (doc_id%3=2): dims 16+id%32 x 16+5id%32 with 1+id%8 frames
    #     (encode_gif args), every-2nd sampling keeps frames 0,2,...
    #     = ceil(frames/2) = (frames+1)//2; dims unchanged.
    oracle="""
    SELECT doc_id,
      CASE doc_id % 3 WHEN 0 THEN 'bmp' WHEN 1 THEN 'wav' ELSE 'gif' END AS kind,
      CASE doc_id % 3
        WHEN 0 THEN CAST((8 + doc_id % 16) // 2 AS BIGINT)
        WHEN 2 THEN CAST(16 + doc_id % 32 AS BIGINT)
      END AS width,
      CASE doc_id % 3
        WHEN 0 THEN CAST((8 + (doc_id * 3) % 12) // 2 AS BIGINT)
        WHEN 2 THEN CAST(16 + (doc_id * 5) % 32 AS BIGINT)
      END AS height,
      CASE WHEN doc_id % 3 = 2
           THEN CAST((1 + doc_id % 8 + 1) // 2 AS BIGINT) END AS n_frames,
      CASE WHEN doc_id % 3 = 1
           THEN CAST((8000 + 100 * (doc_id % 80)) // 2 AS BIGINT)
      END AS sample_rate,
      CASE WHEN doc_id % 3 = 1
           THEN CAST((256 + doc_id % 1024 + 1) // 2 AS BIGINT)
      END AS n_samples,
      CASE WHEN doc_id % 3 = 1
           THEN CAST(((256 + doc_id % 1024 + 1) // 2) * 1000
                     // ((8000 + 100 * (doc_id % 80)) // 2) AS BIGINT)
      END AS duration_ms
    FROM documents
    """,
    doc="real media transforms via stdlib byte surgery: BMP "
    "nearest-neighbor resize, WAV PCM decimation, GIF frame sampling "
    "— re-parsed post-transform, oracle closed-form in the id",
    tags=("llmops", "multimodal"),
)
def q218(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.multimodal import transform_media_payloads

    return transform_media_payloads(load(spark, sf, "documents").select("doc_id"))


@query(
    "q219_image_channel_stats",
    oracle="""
    WITH dims AS (
      SELECT doc_id, 8 + doc_id % 16 AS w, 8 + (doc_id * 3) % 12 AS h
      FROM documents),
    px AS (
      SELECT doc_id, gx.x AS x, gy.y AS y
      FROM dims,
           unnest(CAST(range(0, w) AS BIGINT[])) AS gx(x),
           unnest(CAST(range(0, h) AS BIGINT[])) AS gy(y)
    ),
    sums AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_px,
             CAST(sum((doc_id + x + y) % 256) AS BIGINT) AS sum_b,
             CAST(sum((doc_id + 2 * x + y) % 256) AS BIGINT) AS sum_g,
             CAST(sum((doc_id + x + 2 * y) % 256) AS BIGINT) AS sum_r
      FROM px GROUP BY doc_id)
    SELECT doc_id, n_px, sum_b, sum_g, sum_r,
           CAST(sum_b AS DOUBLE) / CAST(n_px AS DOUBLE) AS mean_b,
           CAST(sum_g AS DOUBLE) / CAST(n_px AS DOUBLE) AS mean_g,
           CAST(sum_r AS DOUBLE) / CAST(n_px AS DOUBLE) AS mean_r
    FROM sums
    """,
    doc="real per-image feature extraction: channel sums/means read "
    "off actual BMP pixel arrays (formula pixels, closed-form oracle)",
    tags=("llmops", "multimodal"),
)
def q219(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.multimodal import image_channel_stats

    return image_channel_stats(load(spark, sf, "documents").select("doc_id"))
