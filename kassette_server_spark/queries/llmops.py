"""North-star LLM-data-pipeline queries (SURVEY.md §2.3).

Dedup (exact / n-gram Jaccard / MinHash-LSH / SimHash), vector
similarity search, text analysis, approximate aggregates, and
multimodal-column plumbing over the `documents` and `embeddings`
tables. Each query pairs the Spark operator (operators/*.py) with a
DuckDB oracle implementing the *same deterministic algorithm* (md5 as
the portable hash; sequential-fold double math), so even the
approximate/sketch-style operators are value-checked, not just
row-counted.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..operators import dedup, similarity, sketches, textstats
from .base import query

# Shared DuckDB CTE fragments ------------------------------------------------

_SHINGLES_CTE = """
docs AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
sh AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(
           range(1, greatest(len(toks) - 2, 1) + 1),
           i -> array_to_string(toks[i:i+2], ' ')))) AS shingle
  FROM docs),
n AS (SELECT doc_id, count(*) AS ns FROM sh GROUP BY doc_id)
"""

_DOT = "list_reduce(list_transform(list_zip({a}, {b}), x -> x[1]*x[2]), (acc, x) -> acc + x)"
_NORM = "sqrt(list_reduce(list_transform({a}, x -> x*x), (acc, x) -> acc + x))"


def _cosine_sql(a: str, b: str) -> str:
    return f"{_DOT.format(a=a, b=b)} / ({_NORM.format(a=a)} * {_NORM.format(a=b)})"


# Dedup ----------------------------------------------------------------------


@query(
    "q30_dedup_exact_text",
    oracle="""
    SELECT md5(text) AS digest, min(doc_id) AS keeper, count(*) AS n_dups
    FROM documents GROUP BY md5(text)
    """,
    doc="exact content dedup by digest (shuffle 16-byte keys, not text)",
    tags=("llmops", "dedup"),
)
def q_dedup_exact(spark: SparkSession, sf: str) -> DataFrame:
    return dedup.exact_dedup(load(spark, sf, "documents"))


@query(
    "q31_dedup_ngram_jaccard",
    oracle=f"""
    WITH {_SHINGLES_CTE},
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2)
    SELECT doc_a, doc_b, c / (na.ns + nb.ns - c) AS jaccard
    FROM pairs
    JOIN n na ON na.doc_id = doc_a
    JOIN n nb ON nb.doc_id = doc_b
    WHERE c / (na.ns + nb.ns - c) >= 0.8
    """,
    doc="3-gram Jaccard near-dup pairs (exact all-pairs on shared shingles)",
    tags=("llmops", "dedup"),
)
def q_dedup_ngram(spark: SparkSession, sf: str) -> DataFrame:
    return dedup.ngram_jaccard_pairs(load(spark, sf, "documents"), threshold=0.8)


def _minhash_bands_sql(num_hashes: int = 8, bands: int = 4) -> str:
    mins = ",\n       ".join(
        f"min(md5('{s}|' || shingle)) AS mh{s}" for s in range(num_hashes)
    )
    rows = num_hashes // bands
    band_selects = []
    for b in range(bands):
        parts = " || '|' || ".join(f"mh{b * rows + r}" for r in range(rows))
        band_selects.append(
            f"SELECT doc_id, {b} AS band_id, md5({parts}) AS bh FROM sig"
        )
    return f"""
    sig AS (SELECT doc_id, {mins} FROM sh GROUP BY doc_id),
    bands AS ({' UNION ALL '.join(band_selects)}),
    cand AS (
      SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
      FROM bands x JOIN bands y
        ON x.band_id = y.band_id AND x.bh = y.bh AND x.doc_id < y.doc_id)
    """


@query(
    "q32_dedup_minhash_lsh",
    oracle=f"""
    WITH {_SHINGLES_CTE},
    {_minhash_bands_sql()},
    inter AS (
      SELECT doc_a, doc_b, count(*) AS c
      FROM cand
      JOIN sh a ON a.doc_id = doc_a
      JOIN sh b ON b.doc_id = doc_b AND b.shingle = a.shingle
      GROUP BY 1, 2)
    SELECT doc_a, doc_b, c / (na.ns + nb.ns - c) AS jaccard
    FROM inter
    JOIN n na ON na.doc_id = doc_a
    JOIN n nb ON nb.doc_id = doc_b
    WHERE c / (na.ns + nb.ns - c) >= 0.8
    """,
    doc="MinHash-LSH near-dup (md5 minhash, 4 bands × 2 rows, exact verify)",
    tags=("llmops", "dedup"),
)
def q_dedup_minhash(spark: SparkSession, sf: str) -> DataFrame:
    return dedup.minhash_lsh_pairs(load(spark, sf, "documents"), threshold=0.8)


@query(
    "q33_simhash",
    oracle="""
    WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
    th AS (SELECT doc_id, md5(tok) AS h FROM tok),
    pos AS (SELECT doc_id, h, unnest(range(0, 64)) AS p FROM th),
    bits AS (
      SELECT doc_id, p,
             ((strpos('0123456789abcdef', substr(h, CAST(p // 4 AS INT) + 1, 1)) - 1)
              >> CAST(p % 4 AS INT)) & 1 AS bit
      FROM pos),
    weights AS (
      SELECT doc_id, p, CASE WHEN sum(2 * bit - 1) > 0 THEN 1 ELSE 0 END AS b
      FROM bits GROUP BY doc_id, p)
    SELECT doc_id,
           CAST(sum(CASE WHEN p >= 32 THEN b * (CAST(1 AS BIGINT) << CAST(p - 32 AS INT)) ELSE 0 END) AS BIGINT) AS fp_hi,
           CAST(sum(CASE WHEN p < 32 THEN b * (CAST(1 AS BIGINT) << CAST(p AS INT)) ELSE 0 END) AS BIGINT) AS fp_lo
    FROM weights GROUP BY doc_id
    """,
    doc="64-bit SimHash fingerprint per doc (md5-bit majority)",
    tags=("llmops", "dedup"),
)
def q_simhash(spark: SparkSession, sf: str) -> DataFrame:
    return dedup.simhash(load(spark, sf, "documents"))


_SIMHASH_CTE = """
tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
tm AS (SELECT doc_id, md5(tok) AS h, count(*) AS m FROM tok GROUP BY doc_id, md5(tok)),
pos AS (SELECT doc_id, h, m, unnest(range(0, 64)) AS p FROM tm),
bits AS (
  SELECT doc_id, p,
         m * (2 * (((strpos('0123456789abcdef', substr(h, CAST(p // 4 AS INT) + 1, 1)) - 1)
              >> CAST(p % 4 AS INT)) & 1) - 1) AS w
  FROM pos),
weights AS (
  SELECT doc_id, p, CASE WHEN sum(w) > 0 THEN 1 ELSE 0 END AS b
  FROM bits GROUP BY doc_id, p),
sig AS (
  SELECT doc_id,
         CAST(sum(CASE WHEN p >= 32 THEN b * (CAST(1 AS BIGINT) << CAST(p - 32 AS INT)) ELSE 0 END) AS BIGINT) AS fp_hi,
         CAST(sum(CASE WHEN p < 32 THEN b * (CAST(1 AS BIGINT) << CAST(p AS INT)) ELSE 0 END) AS BIGINT) AS fp_lo
  FROM weights GROUP BY doc_id)
"""


@query(
    "q57_simhash_near_dup",
    oracle=f"""
    WITH {_SIMHASH_CTE}
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.fp_hi, b.fp_hi)) + bit_count(xor(a.fp_lo, b.fp_lo)) AS BIGINT) AS hamming
    FROM sig a JOIN sig b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.fp_hi, b.fp_hi)) + bit_count(xor(a.fp_lo, b.fp_lo)) <= 6
    """,
    doc="SimHash hamming≤6 near-dup via Manku two-block banding (28 "
    "bands × 16-bit keys, perfect pigeonhole recall; oracle is the "
    "all-pairs form — same answer)",
    tags=("llmops", "dedup"),
)
def q_simhash_near_dup(spark: SparkSession, sf: str) -> DataFrame:
    sig = dedup.simhash(load(spark, sf, "documents"))
    return dedup.simhash_near_dup(sig, max_hamming=6)


@query(
    "q58_normalize_text",
    oracle="""
    SELECT doc_id,
           trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\\s]', ' ', 'g'), '\\s+', ' ', 'g')) AS norm,
           md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\\s]', ' ', 'g'), '\\s+', ' ', 'g'))) AS norm_digest
    FROM documents
    """,
    doc="canonical text normalization (pre-dedup pass): lower, strip punct, squish ws",
    tags=("llmops", "text"),
)
def q_normalize_text(spark: SparkSession, sf: str) -> DataFrame:
    norm = dedup.normalize_text("text")
    return load(spark, sf, "documents").select(
        "doc_id", norm.alias("norm"), F.md5(norm).alias("norm_digest")
    )


# Similarity search ----------------------------------------------------------


@query(
    "q34_ann_cosine_topk",
    oracle=f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id % 100 = 0),
    scored AS (
      SELECT query_id, e.vec_id AS neighbor_id, {_cosine_sql('qv', 'e.v')} AS cos
      FROM e CROSS JOIN q WHERE e.vec_id <> query_id),
    r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rk
          FROM scored)
    SELECT query_id, neighbor_id, cos, CAST(rk AS BIGINT) AS rank
    FROM r WHERE rk <= 10
    """,
    doc="brute-force cosine top-10 for query subset (broadcast queries)",
    tags=("llmops", "similarity"),
)
def q_ann_topk(spark: SparkSession, sf: str) -> DataFrame:
    e = load(spark, sf, "embeddings")
    return similarity.brute_force_topk(e, e.filter(F.col("vec_id") % 100 == 0), k=10)


@query(
    "q35_embedding_near_dup",
    oracle=f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
    SELECT a.vec_id AS id_a, b.vec_id AS id_b, {_cosine_sql('a.v', 'b.v')} AS cos
    FROM e a JOIN e b ON a.vec_id < b.vec_id
    WHERE {_cosine_sql('a.v', 'b.v')} >= 0.45
    """,
    doc="embedding-cosine near-dup pairs above threshold",
    tags=("llmops", "similarity"),
)
def q_embedding_near_dup(spark: SparkSession, sf: str) -> DataFrame:
    # GEMM prefilter + exact fold verify — output identical to the
    # all-pairs operator (and the oracle), ~10× faster
    return similarity.embedding_near_dup_pairs_gemm(
        load(spark, sf, "embeddings"), threshold=0.45
    )


_IVF_NORM = "sqrt(list_reduce(list_transform({a}, x -> x*x), (acc, x) -> acc + x))"


@query(
    "q52_ivf_topk",
    oracle=f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    n AS (SELECT vec_id, v, {_IVF_NORM.format(a='v')} AS vn FROM e),
    c AS (SELECT vec_id AS centroid_id, v AS cv, vn AS cn FROM n WHERE vec_id % 50 = 0),
    q AS (SELECT vec_id AS query_id, v AS qv, vn AS qn FROM n WHERE vec_id % 100 = 0),
    assign AS (
      SELECT vec_id, centroid_id, vv, vn FROM (
        SELECT n.vec_id, c.centroid_id, n.v AS vv, n.vn,
               row_number() OVER (PARTITION BY n.vec_id
                 ORDER BY {_DOT.format(a='n.v', b='c.cv')} / (n.vn * c.cn) DESC, c.centroid_id) AS rn
        FROM n, c) t WHERE rn = 1),
    probe AS (
      SELECT query_id, qv, qn, centroid_id FROM (
        SELECT q.query_id, q.qv, q.qn, c.centroid_id,
               row_number() OVER (PARTITION BY q.query_id
                 ORDER BY {_DOT.format(a='q.qv', b='c.cv')} / (q.qn * c.cn) DESC, c.centroid_id) AS pr
        FROM q, c) t WHERE pr <= 1),
    scored AS (
      SELECT query_id, a.vec_id AS neighbor_id,
             {_DOT.format(a='p.qv', b='a.vv')} / (p.qn * a.vn) AS cos
      FROM probe p JOIN assign a USING (centroid_id)
      WHERE a.vec_id <> p.query_id)
    SELECT query_id, neighbor_id, cos, CAST(rk AS BIGINT) AS rank FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rk
      FROM scored) t
    WHERE rk <= 10
    """,
    doc="IVF search: coarse-quantize to centroids, probe nearest cluster "
    "(work ∝ probed clusters, not corpus — the partitioned-ANN scale path)",
    tags=("llmops", "similarity"),
)
def q_ivf_topk(spark: SparkSession, sf: str) -> DataFrame:
    e = load(spark, sf, "embeddings")
    return similarity.ivf_topk(
        e,
        queries=e.filter(F.col("vec_id") % 100 == 0),
        centroids=e.filter(F.col("vec_id") % 50 == 0),
        k=10,
        n_probe=1,
    )


# Text analysis --------------------------------------------------------------


@query(
    "q36_text_quality_stats",
    oracle="""
    WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents)
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_chars,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           CAST(length(text) - len(toks) + 1 AS BIGINT) / CAST(len(toks) AS BIGINT) AS avg_token_len,
           CAST(len(list_distinct(toks)) AS BIGINT) AS n_unique_tokens,
           CAST(len(list_distinct(toks)) AS BIGINT) / CAST(len(toks) AS BIGINT) AS unique_ratio,
           CAST(len(list_filter(toks, t -> list_contains(['the','a','an','of','and','to','in','is','it','that'], t))) AS BIGINT)
             / CAST(len(toks) AS BIGINT) AS stopword_ratio
    FROM t
    """,
    doc="per-doc quality metrics: lengths, uniqueness, stopword ratio",
    tags=("llmops", "text"),
)
def q_text_stats(spark: SparkSession, sf: str) -> DataFrame:
    return textstats.quality_stats(load(spark, sf, "documents"))


def _lang_id_sql() -> str:
    hits = []
    for lang, markers in sorted(textstats.LANG_MARKERS.items()):
        lst = ", ".join(f"'{m}'" for m in markers)
        hits.append(
            f"CAST(len(list_filter(toks, t -> list_contains([{lst}], t))) AS BIGINT) AS h_{lang}"
        )
    langs = sorted(textstats.LANG_MARKERS)
    g = "greatest(" + ", ".join(f"h_{lang}" for lang in langs) + ")"
    case = " ".join(f"WHEN h_{lang} = g THEN '{lang}'" for lang in langs)
    return f"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    h AS (SELECT doc_id, {', '.join(hits)} FROM t),
    m AS (SELECT *, {g} AS g FROM h)
    SELECT doc_id, CASE {case} END AS pred_lang, g AS hits FROM m
    """


@query(
    "q37_language_id",
    oracle=_lang_id_sql(),
    doc="heuristic language ID: argmax marker-token hits (tie → lang asc)",
    tags=("llmops", "text"),
)
def q_lang_id(spark: SparkSession, sf: str) -> DataFrame:
    return textstats.language_id(load(spark, sf, "documents"))


@query(
    "q38_token_counts",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
    SELECT doc_id, CAST(len(toks) AS BIGINT) AS ws_tokens,
           list_reduce(list_transform(toks, s -> CAST(ceil(length(s) / 4) AS BIGINT)),
                       (acc, x) -> acc + x) AS bpe_tokens
    FROM t
    """,
    doc="whitespace + BPE-ish (ceil(len/4)) token counting",
    tags=("llmops", "text"),
)
def q_token_counts(spark: SparkSession, sf: str) -> DataFrame:
    return textstats.token_counts(load(spark, sf, "documents"))


@query(
    "q39_doc_fingerprint",
    oracle="""
    WITH docs AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
    SELECT doc_id,
           list_min(list_transform(
             list_distinct(list_transform(range(1, greatest(len(toks) - 7, 1) + 1),
                                          i -> array_to_string(toks[i:i+7], ' '))),
             s -> md5(s))) AS fp
    FROM docs
    """,
    doc="winnowing-style fingerprint: min md5 over 8-token windows",
    tags=("llmops", "text"),
)
def q_fingerprint(spark: SparkSession, sf: str) -> DataFrame:
    return textstats.fingerprint(load(spark, sf, "documents"), window=8)


# Approximate aggregates -----------------------------------------------------
# Deterministic portable HLL (operators/sketches.py): explicit md5
# registers + integer-exact harmonic sum, so the *estimate itself*
# hash-matches the DuckDB oracle — unlike the built-in
# approx_count_distinct whose HLL++ sketch is engine-specific (that
# built-in remains the production path on a real cluster; this spec
# proves the algorithm with a checkable formulation). VERDICT r4 #2.


@query(
    "q40_approx_aggregates",
    oracle=sketches.hll_oracle_sql("events", "event_id", p=9),
    doc="deterministic HyperLogLog approx-count-distinct (p=9, md5 "
    "registers, integer-exact scaled harmonic sum; bit-identical "
    "estimate across engines)",
    tags=("llmops", "approx"),
)
def q_approx(spark: SparkSession, sf: str) -> DataFrame:
    return sketches.hll_count_distinct(load(spark, sf, "events"), "event_id", p=9)


# Portable 60-bit md5 hash, DuckDB side (same value as sketches._hash60)
def _h60_sql(expr: str) -> str:
    return f"CAST('0x' || substr(md5({expr}), 1, 15) AS BIGINT)"


# q85: Count-Min sketch heavy hitters. Counters are exact integers over
# md5-derived registers, so the frequency ESTIMATES (not just the
# sketch) are bit-identical across engines — same trick as q40's HLL.
# Shuffle is bounded by depth*width (4*256 cells) regardless of input
# size; the register table is broadcast for the probe. est >= exact is
# the CMS guarantee (over-count only), visible in the output columns.
@query(
    "q85_countmin_heavy_hitters",
    oracle=f"""
    WITH regs AS (
      SELECT d, reg, count(*) AS cnt FROM (
        SELECT t.d AS d,
               {_h60_sql("CAST(t.d AS VARCHAR) || ':' || event_type")} % 256 AS reg
        FROM events CROSS JOIN range(4) t(d)
        WHERE event_type IS NOT NULL) GROUP BY d, reg
    ), est AS (
      SELECT v.event_type, min(r.cnt) AS est_count
      FROM (SELECT DISTINCT event_type FROM events WHERE event_type IS NOT NULL) v
      CROSS JOIN range(4) t(d)
      JOIN regs r
        ON r.d = t.d
       AND r.reg = {_h60_sql("CAST(t.d AS VARCHAR) || ':' || v.event_type")} % 256
      GROUP BY v.event_type
    )
    SELECT e.event_type, e.est_count, x.exact_count
    FROM est e
    JOIN (SELECT event_type, count(*) AS exact_count FROM events GROUP BY event_type) x
      USING (event_type)
    ORDER BY event_type
    """,
    doc="deterministic Count-Min sketch frequency estimates (4x256 md5 "
    "registers, exact-integer counters) vs exact counts",
    tags=("llmops", "approx"),
)
def q_countmin(spark: SparkSession, sf: str) -> DataFrame:
    ev = load(spark, sf, "events")
    regs = sketches.countmin_registers(ev, "event_type", depth=4, width=256)
    vals = ev.where(F.col("event_type").isNotNull()).select("event_type").distinct()
    est = sketches.countmin_estimate(vals, regs, "event_type", depth=4, width=256)
    exact = ev.groupBy("event_type").agg(F.count("*").alias("exact_count"))
    return est.join(exact, "event_type").select(
        "event_type", "est_count", "exact_count"
    ).orderBy("event_type")


# q86: Bloom-filter membership as a pre-join filter — build the bit set
# over the orders side (distinct md5 bit positions, <= 2^14 rows,
# broadcast), probe every customer key map-side, compare against the
# exact semi-join truth. False positives are deterministic (same md5
# everywhere) so even they hash-match; false negatives are impossible,
# which the oracle's has_orders column proves per row. At 100 TB this
# is the classic shape: the big probe side never shuffles, only
# bloom-surviving keys proceed to the real join.
@query(
    "q86_bloom_membership",
    oracle=f"""
    WITH bits AS (
      SELECT DISTINCT
        {_h60_sql("CAST(t.s AS VARCHAR) || ':' || CAST(o_custkey AS VARCHAR)")} % 16384 AS bit
      FROM orders CROSS JOIN range(3) t(s)
    ), probes AS (
      SELECT c_custkey,
        {_h60_sql("CAST(t.s AS VARCHAR) || ':' || CAST(c_custkey AS VARCHAR)")} % 16384 AS bit
      FROM customer CROSS JOIN range(3) t(s)
    ), hits AS (
      SELECT c_custkey, count(*) AS nbits
      FROM probes JOIN bits USING (bit) GROUP BY c_custkey
    )
    SELECT c.c_custkey,
           coalesce(h.nbits, 0) = 3 AS in_bloom,
           c.c_custkey IN (SELECT o_custkey FROM orders) AS has_orders
    FROM customer c LEFT JOIN hits h USING (c_custkey)
    ORDER BY c_custkey
    """,
    doc="deterministic Bloom pre-join filter (k=3, m=2^14 md5 bits) "
    "probed against the exact semi-join truth",
    tags=("llmops", "approx"),
)
def q_bloom(spark: SparkSession, sf: str) -> DataFrame:
    cust = load(spark, sf, "customer").select("c_custkey")
    bits = sketches.bloom_bits(load(spark, sf, "orders"), "o_custkey", k=3, m_bits=1 << 14)
    probe = sketches.bloom_probe(cust, bits, "c_custkey", k=3, m_bits=1 << 14)
    oc = (
        load(spark, sf, "orders")
        .select(F.col("o_custkey").alias("c_custkey"))
        .distinct()
        .withColumn("has_orders", F.lit(True))
    )
    return (
        probe.join(oc, "c_custkey", "left")
        .select(
            "c_custkey",
            "in_bloom",
            F.coalesce("has_orders", F.lit(False)).alias("has_orders"),
        )
        .orderBy("c_custkey")
    )


# q88: binned-quantile sketch — the portable percentile estimator (the
# original q40 used percentile_approx, whose KLL sketch is
# engine-private; this one's histogram is exact integers and the
# threshold test is pure integer arithmetic, so the p50/p90/p99
# estimates hash-match). Mergeable by bin-count sum; cumulative window
# runs over <= 1024 rows however large the input.
@query(
    "q88_approx_quantiles",
    oracle="""
    WITH bins AS (
      SELECT least(greatest(CAST(floor(value / 1.0) AS BIGINT), 0), 1023) AS bin,
             count(*) AS cnt
      FROM events WHERE value IS NOT NULL GROUP BY 1
    ), cum AS (
      SELECT bin, sum(cnt) OVER (ORDER BY bin
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM bins
    ), tot AS (SELECT sum(cnt) AS n FROM bins),
       qs AS (SELECT * FROM (VALUES ('p50', 1, 2), ('p90', 9, 10), ('p99', 99, 100))
              v(label, num, den))
    SELECT q.label,
           CAST(min(c.bin) * 1.0 + 0.5 AS DOUBLE) AS est,
           CAST(t.n AS BIGINT) AS n
    FROM cum c CROSS JOIN tot t CROSS JOIN qs q
    WHERE c.cum * q.den >= t.n * q.num
    GROUP BY q.label, t.n
    ORDER BY q.label
    """,
    doc="deterministic binned-quantile sketch (1024 exact-integer bins, "
    "integer threshold test): p50/p90/p99 estimates hash-match",
    tags=("llmops", "approx"),
)
def q_binned_quantiles(spark: SparkSession, sf: str) -> DataFrame:
    return sketches.binned_quantiles(load(spark, sf, "events"), "value")


# q89: the per-group variant — one histogram per event_type, cumulative
# window partitioned by group over <= num_bins rows each, per-group
# totals joined back broadcast. The (group, bin) shuffle is map-side
# combined and bounded by groups*num_bins, independent of input rows.
@query(
    "q89_quantiles_per_group",
    oracle="""
    WITH bins AS (
      SELECT event_type,
             least(greatest(CAST(floor(value / 1.0) AS BIGINT), 0), 1023) AS bin,
             count(*) AS cnt
      FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL
      GROUP BY 1, 2
    ), cum AS (
      SELECT event_type, bin,
             sum(cnt) OVER (PARTITION BY event_type ORDER BY bin
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM bins
    ), tot AS (SELECT event_type, sum(cnt) AS n FROM bins GROUP BY event_type),
       qs AS (SELECT * FROM (VALUES ('p50', 1, 2), ('p90', 9, 10), ('p99', 99, 100))
              v(label, num, den))
    SELECT c.event_type, q.label,
           CAST(min(c.bin) * 1.0 + 0.5 AS DOUBLE) AS est,
           CAST(t.n AS BIGINT) AS n
    FROM cum c JOIN tot t USING (event_type) CROSS JOIN qs q
    WHERE c.cum * q.den >= t.n * q.num
    GROUP BY c.event_type, q.label, t.n
    ORDER BY c.event_type, q.label
    """,
    doc="per-group binned-quantile sketch: p50/p90/p99 of value per "
    "event_type, (group, bin)-bounded shuffle",
    tags=("llmops", "approx"),
)
def q_quantiles_per_group(spark: SparkSession, sf: str) -> DataFrame:
    return sketches.binned_quantiles_by(load(spark, sf, "events"), "value", "event_type")


# q90: per-group HLL — distinct users per event type, one register set
# per group; shuffle <= groups * 2^p register rows however large the
# input. Same bit-exact construction as q40, partitioned.
@query(
    "q90_hll_per_group",
    oracle=f"""
    WITH h AS (
      SELECT event_type,
             CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15) AS BIGINT) AS hv
      FROM events WHERE user_id IS NOT NULL AND event_type IS NOT NULL
    ), regs AS (
      SELECT event_type, hv % 512 AS reg,
             max(CASE WHEN hv // 512 = 0 THEN 52
                 ELSE 52 - length(bin(hv // 512)) END) AS m_rank
      FROM h GROUP BY event_type, reg
    ), s AS (
      SELECT event_type,
             CAST(sum(CAST(1 AS BIGINT) << (52 - m_rank)) AS BIGINT) AS present_sum,
             count(*) AS nreg
      FROM regs GROUP BY event_type
    )
    SELECT event_type,
           CAST(floor(0.7213 / (1.0 + 1.079 / 512) * 512 * 512 * 4503599627370496.0
                / (coalesce(present_sum, 0) + (512 - nreg) * (CAST(1 AS BIGINT) << 52)))
                AS BIGINT) AS approx_distinct,
           CAST(512 - nreg AS BIGINT) AS zero_registers,
           CAST(coalesce(present_sum, 0) + (512 - nreg) * (CAST(1 AS BIGINT) << 52)
                AS BIGINT) AS scaled_sum
    FROM s
    ORDER BY event_type
    """,
    doc="per-group deterministic HLL: distinct users per event_type, "
    "register shuffle bounded by groups*2^p",
    tags=("llmops", "approx"),
)
def q_hll_per_group(spark: SparkSession, sf: str) -> DataFrame:
    return sketches.hll_count_distinct_by(
        load(spark, sf, "events"), "user_id", "event_type", p=9
    )


# Multimodal plumbing --------------------------------------------------------


@query(
    "q41_multimodal_meta",
    oracle="""
    SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           CAST(octet_length(encode(text)) % 640 AS BIGINT) AS width,
           CAST((octet_length(encode(text)) * 7) % 480 AS BIGINT) AS height,
           'fake/rgb8' AS fmt
    FROM documents
    """,
    doc="binary-column decode plumbing via mapInPandas (stub codec, real "
    "schema/batch path — SURVEY §2.3 multimodal)",
    tags=("llmops", "multimodal"),
)
def q_multimodal(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.multimodal import decode_image_meta

    binary = load(spark, sf, "documents").select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )
    return decode_image_meta(binary)


# q84: REAL stdlib codecs (no PIL/ffmpeg needed): doc_id % 3 routes each
# id to an actual PNG (signature, CRC-validated chunks, zlib pixel
# stream), PCM-16 WAV (RIFF/fmt/data) or JPEG (marker segments incl.
# SOF0/SOF2 frame header), generated from id-derived formulas;
# decode_media_meta then sniffs magic bytes and runs the real parser —
# CRC check, chunk walk, IDAT decompression + scanline-length verify,
# JPEG marker walk. The oracle recomputes the expected metadata from
# the same id formulas, so a hash match proves the encode→decode round
# trip through genuine container bytes. Both stages are Arrow-batched
# mapInPandas over (doc_id) — at 100 TB the payloads live in parquet
# binary columns and this is one scan-stage map, no shuffle.
@query(
    "q84_multimodal_decode",
    oracle="""
    SELECT doc_id,
      CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'wav' ELSE 'jpeg' END AS kind,
      CASE doc_id % 3
        WHEN 0 THEN CAST(8 + doc_id % 32 AS BIGINT)
        WHEN 2 THEN CAST(16 + doc_id % 100 AS BIGINT)
      END AS width,
      CASE doc_id % 3
        WHEN 0 THEN CAST(8 + (doc_id * 3) % 24 AS BIGINT)
        WHEN 2 THEN CAST(16 + (doc_id * 7) % 100 AS BIGINT)
      END AS height,
      CASE WHEN doc_id % 3 = 1 THEN CAST(8000 + 100 * (doc_id % 80) AS BIGINT) END AS sample_rate,
      CASE WHEN doc_id % 3 = 1 THEN CAST(256 + doc_id % 1024 AS BIGINT) END AS n_samples,
      CASE WHEN doc_id % 3 = 1
           THEN CAST((256 + doc_id % 1024) * 1000 // (8000 + 100 * (doc_id % 80)) AS BIGINT)
      END AS duration_ms
    FROM documents
    """,
    doc="real PNG/WAV/JPEG encode->decode round trip via stdlib codecs "
    "(SURVEY §2.3 multimodal; CRC/chunk/marker-structure validation)",
    tags=("llmops", "multimodal"),
)
def q_multimodal_decode(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.multimodal import decode_media_meta, encode_media_payloads

    docs = load(spark, sf, "documents").select("doc_id")
    return decode_media_meta(encode_media_payloads(docs))


# Embedding centroids --------------------------------------------------------


# q66: per-label centroid of the embedding column — the reduce step of
# k-means / class-prototype computation over vectors. Cross-row float
# sums are summation-order-dependent (not oracle-able bit-exactly), so
# each component is quantized to an exact integer (round(x*1e6), far
# inside int64 for unit-scale embeddings) and summed as BIGINT —
# order-insensitive and identical in both engines; only the final
# mean division is floating-point. posexplode → groupBy(label, dim) is
# one map-side-combined shuffle of (label, dim) keys: at 100 TB this
# is the textbook dimension-wise partial agg, no vector ever collected
# to the driver.
@query(
    "q66_embedding_centroid",
    oracle="""
    SELECT label, i AS dim,
           CAST(CAST(sum(CAST(round(CAST(embedding[i + 1] AS DOUBLE) * 1000000)
                              AS BIGINT)) AS BIGINT) AS DOUBLE)
             / CAST(count(*) AS DOUBLE) / 1000000 AS centroid,
           count(*) AS n
    FROM embeddings, range(64) t(i)
    GROUP BY label, i
    """,
    doc="per-label embedding centroid via integer-quantized dim-wise agg",
    tags=("llmops", "similarity"),
)
def q_centroid(spark: SparkSession, sf: str) -> DataFrame:
    e = load(spark, sf, "embeddings").select(
        "label", F.posexplode("embedding").alias("dim", "x")
    )
    q = e.select(
        "label",
        F.col("dim").cast("long").alias("dim"),
        F.round(F.col("x").cast("double") * 1000000).cast("long").alias("xq"),
    )
    return q.groupBy("label", "dim").agg(
        (
            F.sum("xq").cast("double") / F.count("*").cast("double") / 1000000
        ).alias("centroid"),
        F.count("*").alias("n"),
    )


# Corpus curation ------------------------------------------------------------


# q67: stratified deterministic sampling — corpus rebalancing by
# language: downsample the dominant stratum ('en' → 1/16) while keeping
# more of the rest (1/4), selected by the first md5 nibble of the doc
# id so the sample is reproducible across engines, runs, and cluster
# sizes (unlike seeded TABLESAMPLE). Pure per-row predicate: pipelines
# in the scan, no shuffle.
@query(
    "q67_stratified_sample",
    oracle="""
    SELECT doc_id, lang
    FROM documents
    WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)
          < (CASE WHEN lang = 'en' THEN '1' ELSE '4' END)
    """,
    doc="stratified md5-nibble sampling per language (corpus rebalance)",
    tags=("llmops", "sampling"),
)
def q_stratified(spark: SparkSession, sf: str) -> DataFrame:
    d = load(spark, sf, "documents")
    nib = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    thr = F.when(F.col("lang") == "en", F.lit("1")).otherwise(F.lit("4"))
    return d.filter(nib < thr).select("doc_id", "lang")


# q68: near-dup cluster assignment — the step after pair generation
# that decides which documents to keep: connected components over the
# MinHash-LSH pair graph via min-label propagation (operators/dedup.
# connected_components). Deterministic fixpoint (cluster = min
# reachable id) so it is oracle-able even though the Spark side is
# iterative: the DuckDB oracle computes the same fixpoint with a
# recursive CTE.
@query(
    "q68_near_dup_clusters",
    oracle=f"""
    WITH RECURSIVE {_SHINGLES_CTE},
    {_minhash_bands_sql()},
    inter AS (
      SELECT doc_a, doc_b, count(*) AS c
      FROM cand
      JOIN sh a ON a.doc_id = doc_a
      JOIN sh b ON b.doc_id = doc_b AND b.shingle = a.shingle
      GROUP BY 1, 2),
    ver AS (
      SELECT doc_a, doc_b
      FROM inter
      JOIN n na ON na.doc_id = doc_a
      JOIN n nb ON nb.doc_id = doc_b
      WHERE c / (na.ns + nb.ns - c) >= 0.8),
    edges AS (
      SELECT doc_a AS a, doc_b AS b FROM ver
      UNION
      SELECT doc_b, doc_a FROM ver),
    reach(node, x) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT r.node, e.b FROM reach r JOIN edges e ON e.a = r.x)
    SELECT node AS doc_id, min(x) AS cluster_id,
           (min(x) = node) AS is_keeper
    FROM reach GROUP BY node
    """,
    doc="near-dup clustering: connected components over MinHash pairs "
    "(min-label propagation; oracle = recursive-CTE fixpoint)",
    tags=("llmops", "dedup"),
)
def q_clusters(spark: SparkSession, sf: str) -> DataFrame:
    docs = load(spark, sf, "documents")
    pairs = dedup.minhash_lsh_pairs(docs, threshold=0.8).select("doc_a", "doc_b")
    # minhash_lsh_pairs emits one verified row per (doc_a, doc_b) —
    # unique by construction, so CC may skip its edge dedup exchange
    labels = dedup.connected_components(
        pairs, docs.select("doc_id"), edges_unique=True
    )
    return labels.select(
        "doc_id", "cluster_id", (F.col("cluster_id") == F.col("doc_id")).alias("is_keeper")
    )
