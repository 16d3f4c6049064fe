"""Full-text retrieval scoring: BM25 over a tokenized corpus.

The LLM-pipeline use case (SURVEY §2.3 north-star: corpus curation /
contamination): score every document against a small query-term set —
"find training docs that look like eval-set queries" — without an
inverted-index service. At 100 TB the right Spark shape is:

  * corpus statistics (N, avgdl, per-term df) are ONE tiny aggregate
    row, broadcast back over the scan — no shuffle of documents;
  * per-document term frequencies are row-local array expressions
    (``size(filter(tokens, t = term))``) — the scoring stage is
    map-only and stays in whole-stage codegen;
  * top-k is a sort-limit (TakeOrderedAndProject): per-partition
    partial top-k, only |partitions|·k rows reach the driver-side
    final ordering.

Cross-engine determinism: every float in the score is either an IEEE
exact-rounded op on exact integers (tf, dl, df, N are ints; avgdl is
one division) or ``ln`` applied last, and the term contributions are
added in a FIXED left-to-right order written identically in the DuckDB
oracle; the final score is rounded to 6 dp so a 1-ulp ``ln``
difference between libm implementations cannot flip the hash.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Literal constants are injected into BOTH the Spark plan and the
# generated oracle SQL via repr() of the SAME Python float, so the two
# engines parse bit-identical doubles (e.g. 1.2 + 1 = 2.2000000000000002
# must not be written "2.2" on one side).
DEFAULT_K1 = 1.2
DEFAULT_B = 0.75


def bm25_topk(
    docs: DataFrame,
    terms: tuple[str, ...],
    k: int = 50,
    k1: float = DEFAULT_K1,
    b: float = DEFAULT_B,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k documents by BM25 score against ``terms``.

    Uses the Lucene-style always-positive idf
    ``ln(1 + (N - df + 0.5)/(df + 0.5))``. Ties after 6-dp rounding
    break by ascending doc id, so the result set is total-ordered.
    """
    toks = F.split(F.col(text_col), " ")
    dl = F.size(toks).alias("dl")
    def _eq(term: str):
        # closure (not a default-arg lambda): pyspark infers lambda
        # arity from the signature, so extra bound params would be
        # misread as the optional index argument
        return lambda x: x == F.lit(term)

    tf_cols = [
        F.size(F.filter(toks, _eq(t))).alias(f"tf_{i}") for i, t in enumerate(terms)
    ]
    per_doc = docs.select(F.col(id_col).alias("doc_id"), dl, *tf_cols)

    # ONE scalar row of corpus stats; broadcast-joined back so the
    # scoring pass re-reads the (cached-footer) scan, never shuffles it.
    stats = per_doc.agg(
        F.count("*").alias("n_docs"),
        F.sum("dl").alias("sum_dl"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("long")).alias(f"df_{i}")
            for i in range(len(terms))
        ],
    )
    scored = per_doc.join(F.broadcast(stats))

    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs")
    # denominator of the tf normalization, shared by every term
    norm = F.lit(k1) * (F.lit(1.0) - F.lit(b) + (F.lit(b) * F.col("dl")) / avgdl)

    def contrib(i: int) -> Column:
        idf = F.log(
            F.lit(1.0)
            + (F.col("n_docs") - F.col(f"df_{i}") + F.lit(0.5))
            / (F.col(f"df_{i}") + F.lit(0.5))
        )
        tf = F.col(f"tf_{i}").cast("double")
        return idf * ((tf * F.lit(k1 + 1)) / (tf + norm))

    score = contrib(0)
    for i in range(1, len(terms)):
        score = score + contrib(i)  # fixed left-to-right association

    return (
        scored.select("doc_id", F.round(score, 6).alias("bm25"))
        .where(F.col("bm25") > 0)
        .orderBy(F.col("bm25").desc(), F.col("doc_id"))
        .limit(k)
    )


def bm25_oracle_sql(
    terms: tuple[str, ...],
    k: int = 50,
    k1: float = DEFAULT_K1,
    b: float = DEFAULT_B,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB SQL computing the identical BM25 top-k (same constants,
    same association order, same 6-dp rounding)."""
    tf_exprs = ", ".join(
        f"len(list_filter(toks, x -> x = '{t}')) AS tf_{i}"
        for i, t in enumerate(terms)
    )
    df_exprs = ", ".join(
        f"SUM(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END) AS df_{i}"
        for i in range(len(terms))
    )
    norm = f"{k1!r} * (1.0 - {b!r} + ({b!r} * dl) / (CAST(sum_dl AS DOUBLE) / n_docs))"
    contribs = [
        f"(ln(1.0 + (n_docs - df_{i} + 0.5) / (df_{i} + 0.5)))"
        f" * ((CAST(tf_{i} AS DOUBLE) * {k1 + 1!r}) / (CAST(tf_{i} AS DOUBLE) + {norm}))"
        for i in range(len(terms))
    ]
    score = contribs[0]
    for c in contribs[1:]:
        score = f"({score} + {c})"
    return f"""
    WITH per_doc AS (
      SELECT {id_col} AS doc_id, len(toks) AS dl, {tf_exprs}
      FROM (SELECT {id_col}, string_split({text_col}, ' ') AS toks FROM {table})
    ),
    stats AS (
      SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl, {df_exprs} FROM per_doc
    )
    SELECT doc_id, bm25 FROM (
      SELECT doc_id, round({score}, 6) AS bm25 FROM per_doc, stats
    ) WHERE bm25 > 0
    ORDER BY bm25 DESC, doc_id LIMIT {k}
    """


# -- reciprocal-rank fusion ---------------------------------------------------
def rrf_fuse(
    rank_a: DataFrame,
    rank_b: DataFrame,
    id_col: str = "doc_id",
    rank_col: str = "rank",
    k: int = 60,
    top_n: int = 20,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack & Clarke's RRF) of two ranked
    lists: ``rrf = Σ_sources 1/(k + rank)``, the standard way to merge
    a lexical ranking (BM25) with a second signal (semantic ANN, a
    static quality prior) without score calibration — only RANKS cross
    the boundary, so the sources' score scales never meet.

    Determinism: each term is one exact-rounded IEEE division of
    integers (1.0/(k + rank)); the fusion is a single two-term
    expression (addition of two doubles is order-free); missing-in-one-
    source contributes exactly 0.0 via COALESCE — mirrored in the
    oracle. Final order (rrf DESC, id ASC) is total because ids are
    unique.

    Scale: the inputs are already top-K frames (bounded — K rows per
    source, not corpora), so the full-outer join and TakeOrdered run
    on at most 2K rows regardless of corpus size; fusing S sources
    chains S-1 such joins.

    Output: (id, rank_a, rank_b, rrf).
    """
    a = rank_a.select(F.col(id_col).alias("id"), F.col(rank_col).alias("rank_a"))
    b = rank_b.select(F.col(id_col).alias("id"), F.col(rank_col).alias("rank_b"))
    fused = a.join(b, "id", "full_outer")
    rrf = F.coalesce(
        F.lit(1.0) / (F.lit(k) + F.col("rank_a")).cast("double"), F.lit(0.0)
    ) + F.coalesce(
        F.lit(1.0) / (F.lit(k) + F.col("rank_b")).cast("double"), F.lit(0.0)
    )
    return (
        fused.select(
            "id",
            F.col("rank_a").cast("long").alias("rank_a"),
            F.col("rank_b").cast("long").alias("rank_b"),
            rrf.alias("rrf"),
        )
        .orderBy(F.col("rrf").desc(), F.col("id").asc())
        .limit(top_n)
    )


def rrf_oracle_sql(
    rank_a_sql: str,
    rank_b_sql: str,
    k: int = 60,
    top_n: int = 20,
) -> str:
    """DuckDB mirror of :func:`rrf_fuse`. Each input SQL must yield
    (id, rank)."""
    return f"""
    WITH ra AS ({rank_a_sql}),
    rb AS ({rank_b_sql}),
    fused AS (
      SELECT COALESCE(ra.id, rb.id) AS id,
             ra.rank AS rank_a, rb.rank AS rank_b
      FROM ra FULL OUTER JOIN rb ON ra.id = rb.id
    )
    SELECT id, CAST(rank_a AS BIGINT) AS rank_a,
           CAST(rank_b AS BIGINT) AS rank_b,
           COALESCE(1.0e0 / CAST({int(k)} + rank_a AS DOUBLE), 0.0e0)
             + COALESCE(1.0e0 / CAST({int(k)} + rank_b AS DOUBLE), 0.0e0) AS rrf
    FROM fused
    ORDER BY rrf DESC, id ASC LIMIT {int(top_n)}
    """
