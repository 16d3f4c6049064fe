"""Blocked fuzzy joins (record linkage / entity resolution).

The reference has no fuzzy-match operator; this is part of the
LLM-pipeline extension surface (SURVEY.md §2.3): canonicalizing noisy
entity strings (author names, URLs, product titles) before dedup or
joining is a standard corpus-curation step. The scale problem is that
edit distance admits no hash join: a naive implementation is an
all-pairs cross join (10^8 names → 10^16 comparisons).

The classic fix is *blocking*: generate one or more cheap equality
keys per row such that any pair within the distance threshold shares
at least one key, join on each key (a plain shuffled equi-join Spark
executes as hash joins), union + distinct the candidate pairs, then
verify with the exact distance only on candidates.

``segment_blocking_keys`` implements pigeonhole segmenting over a
character span: split the span into ``d+1`` contiguous segments; a
pair within substitution distance ``d`` must agree exactly on at
least one segment (one of the d edits cannot touch all d+1 segments).
This guarantee is exact for equal-length strings under substitutions
(Hamming); insertions/deletions shift segment boundaries, for which
the full PassJoin scheme (Li, Deng, Feng: "PassJoin: A Partition-based
Method for Similarity Joins", PVLDB 2012) matches segments against a
±d positional neighborhood — the verify step below is already the
general one (levenshtein), so extending recall to indels is only a
keys-generation change.

Scale shape: candidates = Σ_k Σ_block |block|² over each key k —
bounded by the entropy of the blocking keys, never |df|². Degenerate
(low-entropy) segments are the operator's cost knob, exactly like a
skewed join key; callers pick the segmented span to point at the
informative part of the string (the digit suffix of an ID, the local
part of an email), the same judgment call every production linkage
system exposes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def segment_blocking_keys(
    col: Column | str,
    start: int,
    length: int,
    max_dist: int = 1,
    n_segments: int | None = None,
) -> list[Column]:
    """Pigeonhole blocking keys over ``col[start : start+length]``
    (1-based, like substring): split the span into ``n_segments``
    contiguous segments and emit one composite key per
    ``n_segments - max_dist``-subset of them. A pair within
    substitution distance d damages at most d segments, so at least
    one subset is fully intact and its composite key equi-matches.

    ``n_segments`` defaults to ``max_dist + 1`` — subsets of size 1,
    the classic pigeonhole. RAISING it is the selectivity knob
    (PassJoin's insight): with s segments each composite key spans
    ``s - d`` of them, so its entropy is the PRODUCT of the segment
    entropies — candidates collapse from Σ|block|² on single
    low-entropy segments toward the true-match count, at the price of
    C(s, s-d) equi-joins instead of d+1. With s = span length (one
    char per segment), a pair at full distance d matches exactly one
    subset — near-zero candidate redundancy. Keys are tagged with the
    subset ordinal so different subsets never cross-match.
    """
    import itertools

    c = F.col(col) if isinstance(col, str) else col
    n_seg = max_dist + 1 if n_segments is None else n_segments
    if n_seg <= max_dist:
        raise ValueError(f"need n_segments > max_dist, got {n_seg} <= {max_dist}")
    if n_seg > length:
        raise ValueError(f"n_segments {n_seg} exceeds span length {length}")
    base, rem = divmod(length, n_seg)
    segs: list[Column] = []
    pos = start
    for i in range(n_seg):
        seg_len = base + (1 if i < rem else 0)
        segs.append(F.substring(c, pos, seg_len))
        pos += seg_len
    keys: list[Column] = []
    for si, subset in enumerate(itertools.combinations(range(n_seg), n_seg - max_dist)):
        keys.append(F.concat_ws("|", F.lit(si), *[segs[j] for j in subset]))
    return keys


def fuzzy_self_join_pairs(
    df: DataFrame,
    id_col: str,
    str_col: str,
    blocking_keys: list[Column],
    max_dist: int = 1,
) -> DataFrame:
    """Self-join rows whose ``str_col`` values are within levenshtein
    ``max_dist``, using blocked candidate generation.

    Returns (a_id, b_id, dist) with a_id < b_id, exact distances,
    distinct pairs. Each blocking key drives one equi-join; candidates
    are verified with levenshtein FIRST (codegen'd, cheap per pair)
    and only survivors reach the distinct — a pair colliding in
    several blocks is scored more than once, but the dedup shuffle
    then carries only true matches (ids + dist, no strings) instead of
    the full candidate set, which is the right trade at scale: the
    match set is orders of magnitude smaller than the candidate set.

    Plan: K shuffled equi-joins on (key) + a codegen'd levenshtein
    filter + one narrow distinct. No cross join anywhere — the plan
    lock in tests/test_round5_ops.py asserts it.
    """
    sides = df.select(
        F.col(id_col).alias("_id"),
        F.col(str_col).alias("_s"),
        *[bk.alias(f"_bk{i}") for i, bk in enumerate(blocking_keys)],
    )
    cand = None
    for i in range(len(blocking_keys)):
        a = sides.select(
            F.col(f"_bk{i}").alias("_k"),
            F.col("_id").alias("a_id"),
            F.col("_s").alias("_sa"),
        )
        b = sides.select(
            F.col(f"_bk{i}").alias("_k"),
            F.col("_id").alias("b_id"),
            F.col("_s").alias("_sb"),
        )
        c = a.join(b, "_k").where(F.col("a_id") < F.col("b_id")).drop("_k")
        cand = c if cand is None else cand.unionByName(c)
    assert cand is not None, "need at least one blocking key"
    verified = cand.withColumn("dist", F.levenshtein("_sa", "_sb")).where(
        F.col("dist") <= max_dist
    )
    return verified.select(
        F.col("a_id").cast("long"),
        F.col("b_id").cast("long"),
        F.col("dist").cast("int"),
    ).distinct()


def sorted_neighborhood_pairs(
    df: DataFrame,
    id_col: str,
    key_col: str,
    window: int = 3,
    block_len: int = 15,
    max_dist: int = 1,
) -> DataFrame:
    """Sorted-neighborhood blocking (Hernández–Stolfo): sort records by
    the key within coarse prefix blocks and compare each record only to
    its ``window`` successors, then verify with edit distance — the
    OTHER classic linkage blocking scheme next to pigeonhole segmenting
    (fuzzy_self_join_pairs): segment blocking guarantees recall for a
    known distance bound; sorted-neighborhood is what you reach for
    when typos cluster lexicographically (trailing-digit noise,
    zip/phone transpositions).

    Scale shape: one shuffle partitioned by the prefix block, a sort
    within each block, and ``window`` lead() projections — candidate
    count is exactly rows·window, never rows². Deliberate recall gap:
    matches straddling a block boundary are missed (inherent to blocked
    SN; shrink ``block_len`` or multi-pass with different keys for
    higher recall — the oracle runs the SAME algorithm so parity is
    exact regardless).

    Output: (a_id, b_id, dist) with dist = levenshtein ≤ max_dist,
    a_id < b_id.
    """
    from pyspark.sql import Window

    rows = df.select(
        F.substring(F.col(key_col), 1, block_len).alias("blk"),
        F.col(key_col).alias("k"),
        F.col(id_col).alias("rid"),
    )
    w = Window.partitionBy("blk").orderBy("k", "rid")
    candidates = None
    for j in range(1, window + 1):
        cand = rows.select(
            "rid",
            "k",
            F.lead("rid", j).over(w).alias("rid2"),
            F.lead("k", j).over(w).alias("k2"),
        ).where(F.col("rid2").isNotNull())
        candidates = cand if candidates is None else candidates.unionByName(cand)
    verified = candidates.select(
        F.least("rid", "rid2").alias("a_id"),
        F.greatest("rid", "rid2").alias("b_id"),
        F.levenshtein("k", "k2").alias("dist"),
    ).where(F.col("dist") <= max_dist)
    return verified.distinct()


def sorted_neighborhood_oracle_sql(
    table: str,
    id_col: str,
    key_col: str,
    window: int = 3,
    block_len: int = 15,
    max_dist: int = 1,
) -> str:
    """DuckDB SQL running the identical blocked sorted-neighborhood."""
    leads = "\nUNION ALL\n".join(
        f"""SELECT rid, k, lead(rid, {j}) OVER w{j} AS rid2, lead(k, {j}) OVER w{j} AS k2
        FROM ranked WINDOW w{j} AS (PARTITION BY blk ORDER BY k, rid)"""
        for j in range(1, window + 1)
    )
    return f"""
    WITH ranked AS (
      SELECT substr({key_col}, 1, {block_len}) AS blk, {key_col} AS k,
             {id_col} AS rid
      FROM {table}
    ),
    cand AS ({leads})
    SELECT DISTINCT least(rid, rid2) AS a_id, greatest(rid, rid2) AS b_id,
           CAST(levenshtein(k, k2) AS INT) AS dist
    FROM cand
    WHERE rid2 IS NOT NULL AND levenshtein(k, k2) <= {max_dist}
    """


def edit_distance1_pairs(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """EXACT pairs with Levenshtein distance <= 1 via DELETION-
    NEIGHBORHOOD blocking (the SymSpell idea, Garbe 2012, re-expressed
    as a DataFrame plan): every string generates len+1 variants (itself
    plus each single-character deletion), and any two strings within
    edit distance 1 provably share a variant — a substitution pair
    shares the both-sides deletion at the differing position, an
    insert/delete pair shares the shorter string itself. Candidates
    come from an equi-join on the variant key; an exact levenshtein
    verify removes false positives (sharing a variant only bounds the
    distance by 2).

    Scale shape vs the O(n²) all-pairs: fan-out is len+1 rows per
    string (linear), candidate volume is Σ(variant-bucket size²) —
    bucket sizes are alphabet-bounded in practice; the verify is a
    per-candidate O(len²) DP on a linear candidate stream. No
    similarity-threshold tuning, no LSH miss probability: recall 1.0
    by the deletion-neighborhood theorem.

    Output: (id_a, id_b, text_a, text_b, dist) with id_a < id_b and
    dist <= 1, distinct.
    """
    i, t = id_col, text_col
    base = df.where(F.col(i).isNotNull() & F.col(t).isNotNull()).select(
        F.col(i).alias("_id"), F.col(t).alias("_t")
    )
    variants = base.select(
        "_id",
        "_t",
        F.explode(
            F.array_union(
                F.expr(
                    "transform(sequence(1, length(_t)), "
                    "p -> concat(substring(_t, 1, p - 1), "
                    "substring(_t, p + 1, length(_t))))"
                ),
                F.array(F.col("_t")),
            )
        ).alias("_v"),
    ).distinct()
    a = variants.select(
        F.col("_id").alias("id_a"), F.col("_t").alias("text_a"), "_v"
    )
    b = variants.select(
        F.col("_id").alias("id_b"), F.col("_t").alias("text_b"), "_v"
    )
    cand = (
        a.join(b, "_v")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "text_a", "text_b")
        .distinct()
    )
    return cand.withColumn(
        "dist", F.levenshtein("text_a", "text_b").cast("bigint")
    ).where(F.col("dist") <= 1)


def edit_distance1_oracle_sql(source_sql: str, id_col: str, text_col: str) -> str:
    """DuckDB mirror of :func:`edit_distance1_pairs` (same blocking,
    same verify — recall is exact in both, so the mirror doubles as an
    algorithm cross-check)."""
    i, t = id_col, text_col
    return f"""
    WITH src0 AS ({source_sql}),
    base AS (SELECT {i} AS _id, {t} AS _t FROM src0
             WHERE {i} IS NOT NULL AND {t} IS NOT NULL),
    variants AS (
      SELECT DISTINCT _id, _t, v AS _v
      FROM base,
           UNNEST(list_append(
             list_transform(range(1, length(_t) + 1),
                            p -> substr(_t, 1, p - 1)
                                 || substr(_t, p + 1, length(_t))),
             _t)) AS u(v)
    ),
    cand AS (
      SELECT DISTINCT a._id AS id_a, b._id AS id_b,
                      a._t AS text_a, b._t AS text_b
      FROM variants a JOIN variants b ON b._v = a._v AND a._id < b._id
    )
    SELECT id_a, id_b, text_a, text_b,
           CAST(levenshtein(text_a, text_b) AS BIGINT) AS dist
    FROM cand
    WHERE levenshtein(text_a, text_b) <= 1
    """
