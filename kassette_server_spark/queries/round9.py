"""Round-9 specs (q213-q215): the two follow-throughs the r8 verdict
named as the only functional gaps at the edge of the LLM-pipeline
brief — BPE *apply* (q171 learns merge rules; nothing tokenized the
corpus WITH them) and substring-dedup *removal* (q92 profiles
duplicated spans; nothing emitted the deduplicated corpus) — plus the
packing variant that consumes real tokenizer counts.

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
per the standing rotation (queries/__init__.py — the written r10 plan
leads with q202-q212, so these queue behind it for r11 and stay
locked meanwhile by tests/test_oracle_parity*.py at two SFs).
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
    deduped = (
        docs.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
    cleaned = remove_duplicated_spans(deduped, k=8).select(
        "doc_id", F.col("cleaned_text").alias("text")
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
