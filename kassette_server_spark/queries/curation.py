"""Corpus-curation queries (q70–q74): benchmark contamination,
quality filtering, sequence packing, TF-IDF top terms, n-gram novelty
(operators/curation.py) over the documents table.

Registered AFTER the core surface — these land outside the driver's
50-entry correctness window, so their hard signal comes from the local
oracle-parity suites (sf0.001 + sf0.01, the same compare the driver
runs)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..operators import curation
from .base import query


def _shingle_sql(k: int) -> str:
    """DuckDB k-token shingle list (mirrors dedup.shingles: 1-based
    slice, distinct, short docs collapse to one truncated shingle)."""
    return (
        "list_distinct(list_transform("
        f"range(1, greatest(len(toks) - {k - 1}, 1) + 1), "
        f"i -> array_to_string(toks[i:i+{k - 1}], ' ')))"
    )


@query(
    "q70_benchmark_contamination",
    oracle=f"""
    WITH docs AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    sh AS (SELECT doc_id, md5(unnest({_shingle_sql(8)})) AS h FROM docs),
    bench AS (SELECT DISTINCT h FROM sh WHERE doc_id % 50 = 0),
    hits AS (
      SELECT s.doc_id, count(*) AS n
      FROM sh s JOIN bench b ON s.h = b.h
      WHERE s.doc_id % 50 <> 0
      GROUP BY s.doc_id)
    SELECT d.doc_id,
           coalesce(h.n, 0) AS n_shared_ngrams,
           coalesce(h.n, 0) > 0 AS contaminated
    FROM (SELECT doc_id FROM documents WHERE doc_id % 50 <> 0) d
    LEFT JOIN hits h ON h.doc_id = d.doc_id
    """,
    doc="eval-set leakage: shared 8-gram count vs a benchmark slice "
    "(digest join — the pre-training contamination sweep)",
    tags=("llmops", "curation"),
)
def q_contamination(spark: SparkSession, sf: str) -> DataFrame:
    docs = load(spark, sf, "documents")
    bench = docs.filter(F.col("doc_id") % 50 == 0)
    corpus = docs.filter(F.col("doc_id") % 50 != 0)
    return curation.contamination(corpus, bench, k=8)


@query(
    "q71_quality_filter",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    s AS (
      SELECT doc_id,
             CAST(len(toks) AS BIGINT) AS n_tokens,
             CAST(len(list_distinct(toks)) AS BIGINT) / CAST(len(toks) AS BIGINT) AS unique_ratio,
             CAST(len(list_filter(toks, x -> list_contains(
               ['the','a','an','of','and','to','in','is','it','that'], x))) AS BIGINT)
               / CAST(len(toks) AS BIGINT) AS stopword_ratio
      FROM t)
    SELECT doc_id, n_tokens, unique_ratio, stopword_ratio,
           CASE WHEN n_tokens < 20 THEN 'too_short'
                WHEN unique_ratio < 0.5 THEN 'low_diversity'
                WHEN stopword_ratio < 0.02 THEN 'low_stopwords'
                ELSE 'ok' END AS reason,
           (CASE WHEN n_tokens < 20 THEN 'too_short'
                 WHEN unique_ratio < 0.5 THEN 'low_diversity'
                 WHEN stopword_ratio < 0.02 THEN 'low_stopwords'
                 ELSE 'ok' END) = 'ok' AS keep
    FROM s
    """,
    doc="C4-style quality gate: length/diversity/stopword rules with "
    "first-failure reason codes",
    tags=("llmops", "curation"),
)
def q_quality_filter(spark: SparkSession, sf: str) -> DataFrame:
    return curation.quality_filter(load(spark, sf, "documents"))


@query(
    "q72_sequence_packing",
    oracle="""
    WITH t AS (
      SELECT doc_id, doc_id % 16 AS bucket,
             CAST(list_reduce(list_transform(string_split(text, ' '),
                    s -> CAST(ceil(length(s) / 4) AS BIGINT)),
                  (acc, x) -> acc + x) AS BIGINT) AS n_tokens
      FROM documents),
    c AS (
      SELECT doc_id, bucket, n_tokens,
             CAST(sum(n_tokens) OVER (PARTITION BY bucket ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS BIGINT)
               AS start_offset
      FROM t)
    SELECT doc_id, bucket, n_tokens, start_offset,
           CAST(floor(start_offset / 2048) AS BIGINT) AS shard_id
    FROM c
    """,
    doc="training-shard packing: per-bucket running token sums -> "
    "fixed-2048-token shard ids (data-parallel, no global cumsum)",
    tags=("llmops", "curation"),
)
def q_sequence_packing(spark: SparkSession, sf: str) -> DataFrame:
    return curation.sequence_packing(load(spark, sf, "documents"))


@query(
    "q73_tfidf_top_terms",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
    df AS (SELECT term, count(*) AS df FROM (SELECT DISTINCT doc_id, term FROM toks) GROUP BY 1),
    n AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
      SELECT doc_id, tf.term, (tf.tf * n.n_docs) / df.df AS score
      FROM tf JOIN df ON tf.term = df.term CROSS JOIN n)
    SELECT doc_id, term, score, CAST(rk AS BIGINT) AS rk FROM (
      SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rk
      FROM scored) t
    WHERE rk <= 3
    """,
    doc="top-3 characteristic terms per doc by tf*(N/df) — log-free "
    "IDF keeps the score IEEE-portable across engines",
    tags=("llmops", "curation"),
)
def q_tfidf(spark: SparkSession, sf: str) -> DataFrame:
    return curation.tfidf_top_terms(load(spark, sf, "documents"))


# shared hex-digit → int arithmetic for the DuckDB oracle (no hex→int
# cast there; Spark uses conv(hex,16,10) — same value, see
# operators/curation.md5_bucket)
_BUCKET_SQL = (
    "(strpos('0123456789abcdef', h[1]) - 1) * 256"
    " + (strpos('0123456789abcdef', h[2]) - 1) * 16"
    " + (strpos('0123456789abcdef', h[3]) - 1)"
)

_MIX_WEIGHTS = {"en": 0.5, "de": 0.2, "es": 0.2, "fr": 0.05, "zh": 0.05}


@query(
    "q78_domain_mix",
    oracle=f"""
    WITH w AS (SELECT * FROM (VALUES
        ('de', 0.2), ('en', 0.5), ('es', 0.2), ('fr', 0.05), ('zh', 0.05)
      ) AS v(lang, w)),
    c AS (SELECT lang, CAST(count(*) AS BIGINT) AS c FROM documents GROUP BY lang),
    t AS (SELECT min(c.c / w.w) AS t FROM c JOIN w ON c.lang = w.lang),
    r AS (
      SELECT c.lang,
             CASE WHEN w.w IS NULL THEN 0
                  ELSE CAST(floor(least(1.0, (w.w * t.t) / c.c) * 4096) AS BIGINT)
             END AS threshold
      FROM c LEFT JOIN w ON c.lang = w.lang CROSS JOIN t),
    b AS (
      SELECT doc_id, lang, CAST({_BUCKET_SQL} AS BIGINT) AS bucket
      FROM (SELECT doc_id, lang, md5(CAST(doc_id AS VARCHAR)) AS h FROM documents))
    SELECT b.doc_id, b.lang, b.bucket, r.threshold,
           b.bucket < r.threshold AS keep
    FROM b JOIN r ON b.lang = r.lang
    """,
    doc="weighted domain mixing: md5-threshold downsampling per lang "
    "toward a target mixture at the largest feasible size (map-side "
    "keep decision, no corpus shuffle)",
    tags=("llmops", "curation"),
)
def q_domain_mix(spark: SparkSession, sf: str) -> DataFrame:
    return curation.domain_mix(load(spark, sf, "documents"), _MIX_WEIGHTS)


@query(
    "q79_shuffle_shards",
    oracle=f"""
    WITH b AS (
      SELECT doc_id, h, CAST(({_BUCKET_SQL}) % 16 AS BIGINT) AS shard_id
      FROM (SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS h FROM documents))
    SELECT doc_id, shard_id,
           CAST(row_number() OVER (PARTITION BY shard_id ORDER BY h, doc_id)
                AS BIGINT) AS pos
    FROM b
    """,
    doc="deterministic global shuffle into 16 training shards: "
    "md5-bucket shard id + in-shard rank by digest (reproducible "
    "corpus shuffle; one exchange, per-shard sort)",
    tags=("llmops", "curation"),
)
def q_shuffle_shards(spark: SparkSession, sf: str) -> DataFrame:
    # explicit shard count: the oracle's layout must not depend on the
    # verifying session's parallelism
    return curation.shuffle_shards(load(spark, sf, "documents"), n_shards=16)


@query(
    "q80_repetition_filter",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    s AS (SELECT doc_id,
                 CAST(len(toks) AS BIGINT) AS n_tokens,
                 CAST(len(list_distinct(toks)) AS BIGINT) AS n_unique,
                 list_transform(range(1, greatest(len(toks) - 1, 1) + 1),
                                i -> array_to_string(toks[i:i+1], ' ')) AS bgs
          FROM t),
    e AS (SELECT doc_id, n_tokens, n_unique, unnest(bgs) AS bg FROM s),
    c AS (SELECT doc_id, bg, count(*) AS c,
                 max(n_tokens) AS n_tokens, max(n_unique) AS n_unique
          FROM e GROUP BY doc_id, bg),
    d AS (SELECT doc_id, max(n_tokens) AS n_tokens, max(n_unique) AS n_unique,
                 CAST(sum(c) AS BIGINT) AS n_bigrams, max(c) AS topc
          FROM c GROUP BY doc_id)
    SELECT doc_id, n_tokens,
           (n_tokens - n_unique) / CAST(n_tokens AS DOUBLE) AS dup_word_frac,
           n_bigrams,
           topc / CAST(n_bigrams AS DOUBLE) AS top_bigram_frac,
           ((n_tokens - n_unique) / CAST(n_tokens AS DOUBLE) > 0.65
            OR topc / CAST(n_bigrams AS DOUBLE) > 0.07) AS flagged
    FROM d
    """,
    doc="Gopher-style repetition filter: duplicate-word fraction + "
    "top-bigram share (explode -> two map-combined aggs on 8-byte "
    "bigram hashes)",
    tags=("llmops", "curation"),
)
def q_repetition(spark: SparkSession, sf: str) -> DataFrame:
    return curation.repetition_stats(load(spark, sf, "documents"))


# Deterministic PII injection so the scrub actually redacts on the
# synthetic corpus (which contains no natural emails/phones/IPs); the
# Spark query applies the identical expression before the operator.
_PII_INJECT_SQL = """
    SELECT doc_id, text
      || CASE WHEN doc_id % 2 = 0 THEN ' contact user' || CAST(doc_id AS VARCHAR)
                || '@mail.example.com' ELSE '' END
      || CASE WHEN doc_id % 3 = 0 THEN ' call 555-'
                || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END
      || CASE WHEN doc_id % 5 = 0 THEN ' host 10.0.' || CAST(doc_id % 256 AS VARCHAR)
                || '.' || CAST(doc_id % 100 AS VARCHAR) ELSE '' END
      AS text
    FROM documents
"""

# %-format (NOT f-string/str.format): the regex bodies contain {m,n}
# repetition braces.
_PII_ORACLE = """
    WITH injected AS (%s)
    SELECT doc_id,
           regexp_replace(regexp_replace(regexp_replace(
             text, '%s', '<EMAIL>', 'g'), '%s', '<PHONE>', 'g'),
             '%s', '<IP>', 'g') AS clean_text,
           CAST(len(regexp_extract_all(text, '%s')) AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(text, '%s')) AS BIGINT) AS n_phones,
           CAST(len(regexp_extract_all(text, '%s')) AS BIGINT) AS n_ips,
           (len(regexp_extract_all(text, '%s'))
            + len(regexp_extract_all(text, '%s'))
            + len(regexp_extract_all(text, '%s'))) > 0 AS had_pii
    FROM injected
""" % (
    _PII_INJECT_SQL,
    curation.PII_EMAIL, curation.PII_PHONE, curation.PII_IPV4,
    curation.PII_EMAIL, curation.PII_PHONE, curation.PII_IPV4,
    curation.PII_EMAIL, curation.PII_PHONE, curation.PII_IPV4,
)


def _inject_pii(docs: DataFrame) -> DataFrame:
    did = F.col("doc_id")
    return docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                did % 2 == 0,
                F.concat(F.lit(" contact user"), did.cast("string"), F.lit("@mail.example.com")),
            ).otherwise(F.lit("")),
            F.when(
                did % 3 == 0,
                F.concat(F.lit(" call 555-"), F.lpad((did % 10000).cast("string"), 4, "0")),
            ).otherwise(F.lit("")),
            F.when(
                did % 5 == 0,
                F.concat(
                    F.lit(" host 10.0."), (did % 256).cast("string"),
                    F.lit("."), (did % 100).cast("string"),
                ),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )


@query(
    "q81_pii_scrub",
    oracle=_PII_ORACLE,
    doc="PII redaction with audit counts: email/phone/IPv4 -> typed "
    "placeholders, map-only scan-stage pass (RE2/Java-portable "
    "patterns; deterministic injection exercises every branch)",
    tags=("llmops", "curation"),
)
def q_pii_scrub(spark: SparkSession, sf: str) -> DataFrame:
    return curation.pii_scrub(_inject_pii(load(spark, sf, "documents")))


@query(
    "q82_chunk_documents",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    s AS (SELECT doc_id, toks,
                 1 + (greatest(len(toks) - 32, 0) + 23) // 24 AS n_chunks
          FROM t),
    e AS (SELECT doc_id, toks, unnest(range(0, n_chunks)) AS chunk_id FROM s)
    SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
           array_to_string(toks[chunk_id*24+1 : chunk_id*24+32], ' ') AS chunk_text,
           CAST(len(toks[chunk_id*24+1 : chunk_id*24+32]) AS BIGINT) AS chunk_tokens
    FROM e
    """,
    doc="RAG chunking: overlapping 32-token windows every 24 tokens "
    "(scan-stage explode, all-integer starts, no shuffle)",
    tags=("llmops", "curation"),
)
def q_chunk(spark: SparkSession, sf: str) -> DataFrame:
    return curation.chunk_documents(load(spark, sf, "documents"))


@query(
    "q74_ngram_novelty",
    oracle="""
    WITH docs AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    sh AS (SELECT doc_id,
                  md5(unnest(list_distinct(list_transform(
                    range(1, greatest(len(toks) - 2, 1) + 1),
                    i -> array_to_string(toks[i:i+2], ' '))))) AS h
           FROM docs),
    first AS (SELECT h, min(doc_id) AS first_doc FROM sh GROUP BY h)
    SELECT s.doc_id,
           count(*) AS n_shingles,
           CAST(sum(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
           CAST(sum(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END) AS BIGINT)
             / count(*) AS novelty
    FROM sh s JOIN first f ON s.h = f.h
    GROUP BY s.doc_id
    """,
    doc="incremental-dedup novelty: fraction of a doc's 3-shingles "
    "first seen in it (min-owner join on digests)",
    tags=("llmops", "curation"),
)
def q_novelty(spark: SparkSession, sf: str) -> DataFrame:
    return curation.ngram_novelty(load(spark, sf, "documents"))
