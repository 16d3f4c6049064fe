"""Corpus-curation operators for training-data pipelines: benchmark
contamination, quality filtering, sequence packing, TF-IDF scoring,
and n-gram novelty.

These extend the SURVEY §2.3 north-star family (the reference has no
text curation at all — its closest surface is the rules engine T7–T9).
Everything is pure DataFrame composition (JVM expressions, no Python
in the hot path) and phrased so DuckDB can replay the identical
algorithm for the correctness oracle:

- integer counts everywhere possible; the only floating-point is
  single IEEE divisions/multiplications (correctly rounded in both
  engines ⇒ bit-exact), never transcendental functions — TF-IDF here
  uses the raw inverse-frequency ratio tf·N/df instead of the
  log-damped form because libm log is NOT correctly rounded and would
  flake the cross-engine hash;
- the portable hash is md5 over the shingle text.

Scale notes (100 TB):
- contamination joins the corpus's shingle hashes against a DISTINCT
  benchmark-shingle set — shuffle carries 16-byte digests; benchmark
  sets (evals) are small ⇒ Catalyst broadcasts them.
- packing assigns docs to fixed-token shards WITHIN deterministic
  hash buckets: a global ordered cumsum would serialize on one
  partition, so each bucket packs independently (the standard
  data-parallel packing layout — shard ids are (bucket, seq)).
- tf-idf is two hash aggregations (term-per-doc, doc-frequency) and a
  broadcast of the 1-row corpus count; top-k per doc is a ranking
  window partitioned by doc.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from .dedup import _shingle_concat, _shingle_zip, shingle_table, shingles, tokens
from .layout import ensure_scan_parallelism

# C4-style heuristics, tuned so the synthetic corpus exercises every
# branch; thresholds are ordinary parameters in production.
STOPWORDS = ["the", "a", "an", "of", "and", "to", "in", "is", "it", "that"]


def contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
) -> DataFrame:
    """Benchmark-contamination check: for every corpus doc, how many of
    its k-token shingles appear in ANY benchmark doc (eval-set leakage
    detection before training). Output: (doc_id, n_shared_ngrams,
    contaminated)."""
    # xxhash64 (8-byte long), NOT md5 (32-char string): the output only
    # depends on shingle-set identity — any collision-free hash yields
    # identical counts, so the join keys can be 4× narrower than the
    # oracle's md5 (which DuckDB shares) without affecting parity.
    # both shingle streams use dedup's lambda-free zip-explode build
    # (r16): distinct the window structs, concat after the explode —
    # whole-stage codegen, identical rows to the old explode(shingles)
    bench_hashes = (
        benchmark.select(F.explode(F.array_distinct(_shingle_zip(tokens(text_col), k))).alias("_w"))
        .select(F.xxhash64(_shingle_concat(F.col("_w"), k)).alias("h"))
        .distinct()
    )
    corpus_sh = shingle_table(corpus, text_col, id_col, k).select(
        "doc_id", F.xxhash64("shingle").alias("h")
    )
    hits = (
        corpus_sh.join(bench_hashes, "h")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_shared_ngrams"))
    )
    base = corpus.select(F.col(id_col).alias("doc_id"))
    return base.join(hits, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_shared_ngrams", F.lit(0)).alias("n_shared_ngrams"),
        (F.coalesce("n_shared_ngrams", F.lit(0)) > 0).alias("contaminated"),
    )


def quality_filter(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 20,
    min_unique_ratio: float = 0.5,
    min_stopword_ratio: float = 0.02,
) -> DataFrame:
    """C4-style keep/drop decision with a reason code: docs must be
    long enough, lexically diverse, and natural-language-like
    (stopword presence). First failing rule names the reason —
    deterministic and portable (all ratios are single long/long IEEE
    divisions). Output: (doc_id, n_tokens, unique_ratio,
    stopword_ratio, keep, reason)."""
    toks = tokens(text_col)
    n_tokens = F.size(toks).cast("long")
    n_unique = F.size(F.array_distinct(toks)).cast("long")
    n_stop = F.size(F.filter(toks, lambda t: t.isin(STOPWORDS))).cast("long")
    stats = df.select(
        F.col(id_col).alias("doc_id"),
        n_tokens.alias("n_tokens"),
        (n_unique / n_tokens).alias("unique_ratio"),
        (n_stop / n_tokens).alias("stopword_ratio"),
    )
    reason = (
        F.when(F.col("n_tokens") < min_tokens, "too_short")
        .when(F.col("unique_ratio") < min_unique_ratio, "low_diversity")
        .when(F.col("stopword_ratio") < min_stopword_ratio, "low_stopwords")
        .otherwise("ok")
    )
    return stats.select(
        "doc_id", "n_tokens", "unique_ratio", "stopword_ratio",
        reason.alias("reason"),
    ).withColumn("keep", F.col("reason") == "ok")


def sequence_packing(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    tokens_per_shard: int = 2048,
    n_buckets: int = 16,
) -> DataFrame:
    """Greedy packing of documents into fixed-token training shards.

    Docs are assigned to ``n_buckets`` deterministic hash buckets
    (pmod(doc_id)) and packed sequentially WITHIN each bucket by a
    running token sum — shard id = (bucket, floor(start/size)). The
    per-bucket window keeps every partition independent (a single
    global cumsum would serialize 100 TB onto one task); buckets map
    1:1 to writer tasks at scale. BPE-ish token count = Σ ceil(len/4)
    (same rule as token_counts/q38). All-integer ⇒ oracle-exact.

    Output: (doc_id, bucket, n_tokens, start_offset, shard_id).
    """
    n_toks = F.aggregate(
        F.transform(tokens(text_col), lambda s: F.ceil(F.length(s) / 4).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    base = df.select(
        F.col(id_col).alias("doc_id"),
        F.pmod(F.col(id_col), F.lit(n_buckets)).cast("long").alias("bucket"),
        n_toks.alias("n_tokens"),
    )
    w = W.partitionBy("bucket").orderBy("doc_id").rowsBetween(W.unboundedPreceding, W.currentRow)
    return base.select(
        "doc_id",
        "bucket",
        "n_tokens",
        (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("start_offset"),
    ).withColumn(
        "shard_id", F.floor(F.col("start_offset") / tokens_per_shard).cast("long")
    )


def sequence_packing_from_counts(
    counts: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    tokens_per_shard: int = 2048,
    n_buckets: int = 16,
) -> DataFrame:
    """:func:`sequence_packing` generalized to a PRE-COMPUTED token
    count column — the packing half decoupled from the counting half,
    so real tokenizer counts (``textstats.bpe_token_counts``) drive
    shard boundaries instead of the ceil(len/4) whitespace heuristic.
    Same plan shape: deterministic hash buckets, per-bucket running
    sums (no global cumsum), shard id = bucket-local floor division.

    Output: (doc_id, bucket, n_tokens, start_offset, shard_id).
    """
    base = counts.select(
        F.col(id_col).alias("doc_id"),
        F.pmod(F.col(id_col), F.lit(n_buckets)).cast("long").alias("bucket"),
        F.col(tokens_col).cast("long").alias("n_tokens"),
    )
    w = (
        W.partitionBy("bucket")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return base.select(
        "doc_id",
        "bucket",
        "n_tokens",
        (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("start_offset"),
    ).withColumn(
        "shard_id", F.floor(F.col("start_offset") / tokens_per_shard).cast("long")
    )


def tfidf_top_terms(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_k: int = 3,
) -> DataFrame:
    """Top-k characteristic terms per doc by tf·(N/df) — inverse
    document frequency WITHOUT the log damp (libm log is not portable
    bit-for-bit; a single long·long product and one double division
    are). Ties break on the term string. Output: (doc_id, term,
    score, rk)."""
    toks = ensure_scan_parallelism(df.select(F.col(id_col).alias("doc_id"), F.col(text_col))).select(
        "doc_id", F.explode(tokens(text_col)).alias("term")
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    docfreq = toks.distinct().groupBy("term").agg(F.count("*").alias("df"))
    n_docs = df.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(docfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .select("doc_id", "term", ((F.col("tf") * F.col("n_docs")) / F.col("df")).alias("score"))
    )
    w = W.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("term"))
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= top_k)
        .select("doc_id", "term", "score", "rk")
    )


def md5_bucket(col: Column, granularity: int = 4096) -> Column:
    """Deterministic uniform bucket in [0, 4096) from the first three
    hex chars of md5 — the cross-engine sampling primitive. Spark side
    uses the native base conversion ``conv(hex, 16, 10)``; the DuckDB
    oracle, which has no hex→int cast, computes the same value with
    ``strpos('0123456789abcdef', digit)`` arithmetic. md5 itself is
    the portable hash (q63's coarser variant uses one digit)."""
    assert granularity == 4096, "3 hex chars fix the granularity"
    h = F.md5(col.cast("string"))
    return F.conv(F.substring(h, 1, 3), 16, 10).cast("long")


def domain_mix(
    df: DataFrame,
    weights: dict[str, float],
    domain_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Weighted domain mixing: downsample each domain so the kept
    corpus approaches the target mixture ``weights`` (the Pile/C4-style
    "X% web, Y% code, Z% books" knob) at the LARGEST feasible size —
    T = min over weighted domains of count/weight; domain s keeps
    rate_s = w_s·T/c_s of its docs (the binding domain keeps all).
    Selection is a deterministic md5-bucket threshold, so reruns and
    engines agree doc-for-doc. Domains without a weight are dropped
    (keep=false, threshold 0).

    Scale: two tiny aggregations (per-domain counts → one min), both
    map-side combined; thresholds broadcast back onto the corpus and
    the keep decision is a per-row expression inside the scan stage —
    NO shuffle of the documents themselves, no per-domain ranking
    window (an exact-count variant would sort every domain's docs by
    hash; the 1/4096-granular threshold trades ≤0.03% mixture error
    for a pure map-side plan at 100 TB).

    All arithmetic is portable: long counts, double literals, one
    multiply + one divide (correctly-rounded IEEE), ``least`` clamp,
    ``floor`` exact. Output: (id, domain, bucket, threshold, keep).
    """
    spark = df.sparkSession
    from .store import local_frame

    wdf = local_frame(
        spark,
        [(k, float(v)) for k, v in sorted(weights.items())],
        f"{domain_col} string, w double",
    )
    counts = df.groupBy(domain_col).agg(F.count("*").cast("long").alias("c"))
    rated = counts.join(F.broadcast(wdf), domain_col, "left")
    t = rated.filter(F.col("w").isNotNull()).agg(
        F.min(F.col("c") / F.col("w")).alias("t")
    )
    thresholds = rated.crossJoin(F.broadcast(t)).select(
        domain_col,
        F.when(F.col("w").isNull(), F.lit(0).cast("long"))
        .otherwise(
            F.floor(
                F.least(F.lit(1.0), (F.col("w") * F.col("t")) / F.col("c")) * 4096
            ).cast("long")
        )
        .alias("threshold"),
    )
    return (
        df.select(F.col(id_col).alias("doc_id"), F.col(domain_col))
        .join(F.broadcast(thresholds), domain_col)
        .select(
            "doc_id",
            domain_col,
            md5_bucket(F.col("doc_id")).alias("bucket"),
            "threshold",
        )
        .withColumn("keep", F.col("bucket") < F.col("threshold"))
    )


def shuffle_shards(
    df: DataFrame,
    id_col: str = "doc_id",
    n_shards: int | None = None,
) -> DataFrame:
    """Deterministic global shuffle into training shards: every doc
    gets a pseudo-random shard (md5 bucket mod ``n_shards``) and a
    pseudo-random position within it (rank by the md5 hex string) —
    the "shuffle the corpus before writing shards" step every training
    pipeline runs, made reproducible (same corpus ⇒ same byte layout,
    no RNG state).

    Scale: this IS Spark's writer path — ``repartition(n_shards,
    shard)`` + ``sortWithinPartitions(h)``; expressed here as one
    ranking window per shard so the position is a queryable column.
    Each shard sorts |corpus|/n_shards rows, so per-task work stays
    constant only if n_shards grows with the cluster — the default is
    therefore derived from the session's defaultParallelism (one shard
    per task slot) rather than a fixed constant; pass an explicit
    n_shards for a reproducible layout across cluster sizes. There is
    exactly one shuffle (by shard id) and the sort key is the 32-char
    digest the row already carries. Output: (doc_id, shard_id, pos).
    """
    if n_shards is None:
        n_shards = df.sparkSession.sparkContext.defaultParallelism
    h = F.md5(F.col(id_col).cast("string"))
    base = df.select(
        F.col(id_col).alias("doc_id"),
        h.alias("h"),
        F.pmod(md5_bucket(F.col(id_col)), F.lit(n_shards)).cast("long").alias("shard_id"),
    )
    w = W.partitionBy("shard_id").orderBy("h", "doc_id")
    return base.select(
        "doc_id",
        "shard_id",
        F.row_number().over(w).cast("long").alias("pos"),
    )


def repetition_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_dup_word_frac: float = 0.65,
    max_top_bigram_frac: float = 0.07,
) -> DataFrame:
    """Gopher-style repetition filter: flag docs whose token stream is
    dominated by repeats — ``dup_word_frac`` (1 − unique/total tokens)
    and ``top_bigram_frac`` (share of the most frequent bigram among
    all bigrams). Boilerplate, keyword-stuffed, and template pages
    score high on both; either threshold flags the doc.

    Shape: unique/total come from array expressions in the scan stage;
    the bigram mode needs a count-per-(doc, bigram), done as explode →
    two hash aggregations. The shuffle key is ``xxhash64(bigram)`` —
    8 bytes instead of the bigram text (counts only depend on bigram
    identity, so any collision-free hash gives identical results; the
    DuckDB oracle groups on the raw text). Both aggs are map-side
    combined; no join — per-doc constants (n_tokens, n_unique) ride
    through the aggregations as ``max``. Docs shorter than 2 tokens
    follow the shingle convention (one truncated "bigram" = the lone
    token), so every doc yields exactly one output row.

    All fractions are single long/long IEEE divisions ⇒ cross-engine
    exact. Output: (doc_id, n_tokens, dup_word_frac, n_bigrams,
    top_bigram_frac, flagged).
    """
    toks = tokens(text_col)
    n = F.size(toks).cast("long")
    bigrams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(toks) - 1, F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(toks, i, 2)),
    )
    exploded = ensure_scan_parallelism(
        df.select(F.col(id_col).alias("doc_id"), F.col(text_col))
    ).select(
        "doc_id",
        n.alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_unique"),
        F.explode(bigrams).alias("bg"),
    ).select("doc_id", "n_tokens", "n_unique", F.xxhash64("bg").alias("h"))
    per_bigram = exploded.groupBy("doc_id", "h").agg(
        F.count("*").alias("c"),
        F.max("n_tokens").alias("n_tokens"),
        F.max("n_unique").alias("n_unique"),
    )
    per_doc = per_bigram.groupBy("doc_id").agg(
        F.max("n_tokens").alias("n_tokens"),
        F.max("n_unique").alias("n_unique"),
        F.sum("c").alias("n_bigrams"),
        F.max("c").alias("top_bigram_count"),
    )
    dup = (F.col("n_tokens") - F.col("n_unique")) / F.col("n_tokens")
    topf = F.col("top_bigram_count") / F.col("n_bigrams")
    return per_doc.select(
        "doc_id",
        "n_tokens",
        dup.alias("dup_word_frac"),
        "n_bigrams",
        topf.alias("top_bigram_frac"),
        ((dup > max_dup_word_frac) | (topf > max_top_bigram_frac)).alias("flagged"),
    )


# Redaction patterns restricted to syntax with identical semantics in
# Java regex (Spark) and RE2 (DuckDB): character classes, bounded
# repetition, alternation — no backrefs, no lookaround.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE = r"555-[0-9]{4}"
PII_IPV4 = r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}"


def pii_scrub(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """PII redaction pass: replace emails, NANP-555 phone numbers, and
    IPv4 addresses with typed placeholders and count what was removed
    (the audit trail a compliance pipeline keeps). Counts are taken on
    the ORIGINAL text (all three patterns), then redaction applies
    email → phone → ip so a later pattern never matches inside an
    earlier placeholder.

    Pure per-row JVM expressions in the scan stage — no shuffle, no
    Python; at 100 TB this is a map-only pass that pipelines with
    whatever scan feeds it. Output: (doc_id, clean_text, n_emails,
    n_phones, n_ips, had_pii).
    """
    t = F.col(text_col)
    n_emails = F.size(F.regexp_extract_all(t, F.lit(PII_EMAIL), F.lit(0))).cast("long")
    n_phones = F.size(F.regexp_extract_all(t, F.lit(PII_PHONE), F.lit(0))).cast("long")
    n_ips = F.size(F.regexp_extract_all(t, F.lit(PII_IPV4), F.lit(0))).cast("long")
    clean = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(t, PII_EMAIL, "<EMAIL>"), PII_PHONE, "<PHONE>"
        ),
        PII_IPV4,
        "<IP>",
    )
    return df.select(
        F.col(id_col).alias("doc_id"),
        clean.alias("clean_text"),
        n_emails.alias("n_emails"),
        n_phones.alias("n_phones"),
        n_ips.alias("n_ips"),
        ((n_emails + n_phones + n_ips) > 0).alias("had_pii"),
    )


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 32,
    stride: int = 24,
) -> DataFrame:
    """RAG-style chunking: split each document's token stream into
    overlapping windows of ``window`` tokens every ``stride`` tokens
    (overlap = window − stride). Chunk count is
    ``1 + ceil(max(n − window, 0) / stride)`` so every token is
    covered and a doc shorter than one window still yields one chunk.

    Scale: explode over a per-row integer sequence — the chunk table
    is produced inside the scan stage with no shuffle and no Python;
    output size is a bounded multiple (window/stride) of the input.
    All-integer start arithmetic ⇒ oracle-exact against DuckDB's
    ``range``/list-slice replay. Output: (doc_id, chunk_id,
    chunk_text, chunk_tokens).
    """
    toks = tokens(text_col)
    n = F.size(toks).cast("long")
    n_chunks = (
        F.lit(1)
        + F.floor(
            (F.greatest(n - window, F.lit(0)) + (stride - 1)) / stride
        ).cast("long")
    )
    base = df.select(
        F.col(id_col).alias("doc_id"),
        toks.alias("toks"),
        F.explode(F.sequence(F.lit(0).cast("long"), n_chunks - 1)).alias("chunk_id"),
    )
    chunk = F.slice(
        F.col("toks"), (F.col("chunk_id") * stride + 1).cast("int"), window
    )
    return base.select(
        "doc_id",
        "chunk_id",
        F.concat_ws(" ", chunk).alias("chunk_text"),
        F.size(chunk).cast("long").alias("chunk_tokens"),
    )


def ngram_novelty(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
) -> DataFrame:
    """Incremental-dedup novelty score: the fraction of a doc's
    k-shingles FIRST seen in this doc (min doc_id over the corpus
    owns a shingle). A streaming-ingest dedup pass keeps docs with
    high novelty. Exact long/long division. Output: (doc_id,
    n_shingles, n_novel, novelty)."""
    # 8-byte xxhash64 keys (see contamination): novelty counts are
    # hash-independent, so the oracle's md5 and this agree exactly.
    # NO rejoin of the exploded table and NO window over h: a doc's
    # novel count is how many shingles it min-OWNS, which falls out of
    # the (h → min owner) table directly. Both aggregations are
    # map-side combined (hot shingles — common 3-grams at corpus
    # scale — reduce to partials, never buffer a group), and the final
    # join is per-doc row counts only.
    sh = shingle_table(df, text_col, id_col, k).select(
        "doc_id", F.xxhash64("shingle").alias("h")
    )
    n_shingles = sh.groupBy("doc_id").agg(F.count("*").alias("n_shingles"))
    n_novel = (
        sh.groupBy("h")
        .agg(F.min("doc_id").alias("first_doc"))
        .groupBy(F.col("first_doc").alias("doc_id"))
        .agg(F.count("*").alias("n_novel"))
    )
    per_doc = n_shingles.join(n_novel, "doc_id", "left").select(
        "doc_id",
        "n_shingles",
        F.coalesce("n_novel", F.lit(0)).alias("n_novel"),
    )
    return per_doc.select(
        "doc_id", "n_shingles", "n_novel",
        (F.col("n_novel") / F.col("n_shingles")).alias("novelty"),
    )


def temperature_mix(
    df: DataFrame,
    domain_col: str = "lang",
    total_budget: int = 10_000,
    tau: float = 0.5,
) -> DataFrame:
    """Temperature-based domain rebalancing (the multilingual-LM
    sampling rule: share_d ∝ p_d^τ, τ<1 upsamples rare domains): turn
    observed per-domain counts into an integer sampling plan for a
    ``total_budget``-doc training mix, apportioned by the largest-
    remainder method so the targets sum to the budget EXACTLY.

    τ ∈ {0.25, 0.5, 0.75, 1.0} (quarter grid, VERDICT r9 #6) —
    p_d^τ ∝ c_d^τ (the N^τ normalization cancels), and each grid point
    is reachable through correctly-rounded IEEE ops alone: c (τ=1),
    sqrt(c) (τ=0.5), sqrt(sqrt(c)) (τ=0.25), and sqrt(c)·sqrt(sqrt(c))
    (τ=0.75 — two correctly-rounded sqrts and one correctly-rounded
    multiply). The composed weights are not the infinitely-precise
    c^τ, but BOTH engines compute the identical op sequence from the
    identical double, so every weight — and the whole plan — stays
    cross-engine bit-exact WITHOUT libm pow (the q222 fold-discipline
    applied to temperature sampling; an arbitrary τ would need pow and
    break the hash contract).

    Determinism: the Σsqrt denominator folds in sorted domain order
    (the entropy/KL sorted-key-fold rule — a SUM over doubles is
    order-dependent, a sorted fold is not); raw targets are one
    multiply + one divide of identical operands; floors and remainders
    are then bit-identical, and the +1 seats go to the largest
    remainders with domain-name tie-break.

    Scale: everything after the per-domain count (one map-side-combined
    aggregate over the corpus) runs on a DOMAIN-cardinality frame —
    tens of rows, not documents. repetition_factor > 1 flags domains
    the budget upsamples past their size (epoch repetition).

    Output: (domain, n_docs, weight, target_share, target_count,
    repetition_factor).
    """
    if tau not in (0.25, 0.5, 0.75, 1.0):
        raise ValueError(
            "temperature_mix is exact only on the quarter grid "
            "tau in {0.25, 0.5, 0.75, 1.0} (composed IEEE sqrt)"
        )
    counts = df.groupBy(F.col(domain_col).alias("domain")).agg(
        F.count("*").cast("long").alias("n_docs")
    )
    c = F.col("n_docs").cast("double")
    if tau == 1.0:
        wexpr = c
    elif tau == 0.5:
        wexpr = F.sqrt(c)
    elif tau == 0.25:
        wexpr = F.sqrt(F.sqrt(c))
    else:  # 0.75: c^(1/2) · c^(1/4), each factor correctly rounded
        wexpr = F.sqrt(c) * F.sqrt(F.sqrt(c))
    weighted = counts.withColumn("weight", wexpr)
    tot = weighted.agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("domain", "weight"))),
            F.lit(0.0),
            lambda acc, s: acc + s.getField("weight"),
        ).alias("wsum")
    )
    raw = weighted.crossJoin(F.broadcast(tot)).select(
        "domain",
        "n_docs",
        "weight",
        (F.col("weight") / F.col("wsum")).alias("target_share"),
        (F.lit(float(total_budget)) * F.col("weight") / F.col("wsum")).alias("_raw"),
    )
    floored = raw.select(
        "*",
        F.floor(F.col("_raw")).cast("long").alias("_base"),
        (F.col("_raw") - F.floor(F.col("_raw"))).alias("_rem"),
    )
    leftover = floored.agg(
        (F.lit(total_budget) - F.sum("_base")).cast("long").alias("_extra")
    )
    w = W.orderBy(F.col("_rem").desc(), F.col("domain").asc())
    return (
        floored.crossJoin(F.broadcast(leftover))
        .withColumn("_rk", F.row_number().over(w))
        .select(
            "domain",
            "n_docs",
            "weight",
            "target_share",
            (
                F.col("_base")
                + F.when(F.col("_rk") <= F.col("_extra"), F.lit(1)).otherwise(
                    F.lit(0)
                )
            )
            .cast("long")
            .alias("target_count"),
        )
        .withColumn(
            "repetition_factor",
            F.col("target_count").cast("double") / F.col("n_docs").cast("double"),
        )
    )


def temperature_mix_oracle_sql(
    table: str, domain_col: str = "lang", total_budget: int = 10_000,
    tau: float = 0.5,
) -> str:
    """DuckDB mirror of :func:`temperature_mix`: the same composed-
    sqrt weight for the same quarter-grid τ, same sorted-fold
    denominator, same largest-remainder seats with domain tie-break."""
    c = "CAST(n_docs AS DOUBLE)"
    weights = {
        1.0: c,
        0.5: f"sqrt({c})",
        0.25: f"sqrt(sqrt({c}))",
        0.75: f"sqrt({c}) * sqrt(sqrt({c}))",
    }
    if tau not in weights:
        raise ValueError(
            "temperature_mix oracle supports tau in {0.25, 0.5, 0.75, 1.0}"
        )
    return f"""
    WITH counts AS (
      SELECT {domain_col} AS domain, CAST(count(*) AS BIGINT) AS n_docs
      FROM {table} GROUP BY {domain_col}),
    weighted AS (
      SELECT domain, n_docs, {weights[tau]} AS weight
      FROM counts),
    tot AS (
      SELECT list_reduce(
               list_prepend(CAST(0.0 AS DOUBLE),
                            list(weight ORDER BY domain)),
               (acc, x) -> acc + x) AS wsum
      FROM weighted),
    raw AS (
      SELECT domain, n_docs, weight,
             weight / wsum AS target_share,
             CAST({float(total_budget)!r} AS DOUBLE) * weight / wsum AS _raw
      FROM weighted, tot),
    floored AS (
      SELECT *, CAST(floor(_raw) AS BIGINT) AS _base,
             _raw - floor(_raw) AS _rem
      FROM raw),
    leftover AS (
      SELECT CAST({total_budget} - sum(_base) AS BIGINT) AS _extra
      FROM floored)
    SELECT domain, n_docs, weight, target_share,
           CAST(_base + CASE WHEN row_number()
                  OVER (ORDER BY _rem DESC, domain ASC) <= _extra
                THEN 1 ELSE 0 END AS BIGINT) AS target_count,
           CAST(_base + CASE WHEN row_number()
                  OVER (ORDER BY _rem DESC, domain ASC) <= _extra
                THEN 1 ELSE 0 END AS DOUBLE) / CAST(n_docs AS DOUBLE)
             AS repetition_factor
    FROM floored, leftover
    """


def lm_quality_filter(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    drop_decile: int = 1,
) -> DataFrame:
    """CCNet-style model-based quality filtering: score every document
    with the corpus's own bigram LM (textstats.bigram_logprob_by_doc —
    gibberish and boilerplate land far below the LM bulk) and cut the
    bottom ``drop_decile`` tenths at an EXACT order statistic — the
    filtering operator the q117 quality signal implies, completing the
    score → threshold → keep chain as one declarative plan.

    The cutoff is the smallest score whose cumulative count reaches
    ⌈n·drop_decile/10⌉ (the stats.py cumulative-count rule over the
    DISTINCT-score frame — never a global row_number over raw docs, so
    no single-partition sort at scale); keep = score > cutoff, i.e.
    the rank-⌈n/10⌉ doc itself drops. Scores are already 6-dp rounded
    by the LM (ln-ulp absorption), so the comparison is cross-engine
    stable.

    TIE CONTRACT (explicit, ADVICE r9 item 5): the strict-greater cut
    drops EVERY doc tied at the cutoff score, so under heavy score
    ties the dropped fraction exceeds drop_decile/10 — degenerately,
    an all-equal-score corpus drops entirely. This is deliberate:
    score ties at the decile boundary are same-quality documents, and
    a per-doc tie-break would need an order statistic over the tied
    set — an unbounded single-partition window in exactly the
    heavy-tie case it would serve. Callers needing a bounded drop
    count under ties should treat ``keep`` as advisory and re-rank the
    ``avg_logprob == cutoff`` stratum themselves (it ships in the
    output); the decision column makes that stratum trivially
    addressable.

    Scale: the LM fit dominates (its own documented vocabulary²/cut
    bound); the scored frame is consumed twice (cut + keep decision),
    so it sits behind a lineage checkpoint (the q217 composition-seam
    discipline). The cut itself runs on the distinct-score frame and
    broadcasts one row back.

    Output: (doc_id, n_bigrams, avg_logprob, cutoff, keep) — every
    scored doc ships with the decision, so downstream chooses drop or
    quarantine.
    """
    from .textstats import bigram_logprob_by_doc

    scored = bigram_logprob_by_doc(
        df, id_col=id_col, text_col=text_col
    ).localCheckpoint(eager=False)
    counts = scored.groupBy(F.col("avg_logprob").alias("v")).agg(
        F.count("*").alias("cnt")
    )
    w = W.orderBy("v").rowsBetween(W.unboundedPreceding, W.currentRow)
    cum = counts.select("v", F.sum("cnt").over(w).alias("cum"))
    tot = scored.agg(F.count("*").alias("n"))
    cutoff = (
        cum.crossJoin(F.broadcast(tot))
        .agg(
            F.min(
                F.when(
                    F.col("cum") * 10 >= F.col("n") * drop_decile, F.col("v")
                )
            ).alias("cutoff")
        )
    )
    return scored.crossJoin(F.broadcast(cutoff)).select(
        "doc_id",
        "n_bigrams",
        "avg_logprob",
        "cutoff",
        (F.col("avg_logprob") > F.col("cutoff")).alias("keep"),
    )


def lm_quality_filter_oracle_sql(
    table: str, id_col: str = "doc_id", text_col: str = "text",
    drop_decile: int = 1,
) -> str:
    """DuckDB mirror of :func:`lm_quality_filter`: the q117 oracle's
    scores, the same cumulative-count cutoff, the same strict-greater
    keep rule."""
    from .textstats import bigram_logprob_oracle_sql

    scores = bigram_logprob_oracle_sql(table, id_col=id_col, text_col=text_col)
    return f"""
    WITH scored AS ({scores}),
    cts AS (SELECT avg_logprob AS v, count(*) AS cnt FROM scored GROUP BY 1),
    cum AS (
      SELECT v, sum(cnt) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM cts),
    tot AS (SELECT count(*) AS n FROM scored),
    cut AS (
      SELECT min(CASE WHEN cum * 10 >= n * {drop_decile} THEN v END) AS cutoff
      FROM cum, tot)
    SELECT doc_id, n_bigrams, avg_logprob, cutoff,
           avg_logprob > cutoff AS keep
    FROM scored, cut
    """
