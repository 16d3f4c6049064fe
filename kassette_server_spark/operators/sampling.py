"""Deterministic weighted sampling for corpus curation.

Priority sampling (Duffield–Lund–Thorup, JACM 2007): each item gets
priority ``q = w / u`` with ``u`` uniform in (0, 1]; the top-k items by
priority are a weight-proportional sample supporting unbiased
subset-sum estimation with threshold ``tau`` = the (k+1)-th priority.

Why this scheme here (vs Efraimidis–Spirakis ``u^(1/w)``): the
priority is ONE IEEE division of two exactly-representable doubles —
``w`` integer-valued, ``u`` a dyadic rational built from 52 md5 bits —
so it is bit-identical across engines (division is correctly rounded
everywhere), whereas ``pow``/``ln`` are libm-dependent. Determinism
makes the sample reproducible run-to-run and auditable, which is what
a 100 TB data-mixing pipeline needs.

Scale shape: priority is computed map-side (md5 + one division per
row, codegen'd); the top-k is a sort-limit, which Spark plans as
TakeOrderedAndProject — per-partition partial top-k, only
|partitions|·k rows leave the scan stage. No shuffle of the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .store import local_frame, next_generation, read_store, write_store

_U_HEX_CHARS = 13  # 52 bits: the largest md5 prefix exactly representable in a double
_U_DENOM = float(1 << 52)


def priority_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    k: int = 100,
) -> DataFrame:
    """Top-k rows by deterministic priority ``w / u``.

    ``weight_col`` must be positive. Output: (id, weight, priority),
    priority strictly descending (ties impossible short of an md5
    collision on the id).
    """
    h = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, _U_HEX_CHARS), 16, 10
    ).cast("long")
    u = (h + F.lit(1)).cast("double") / F.lit(_U_DENOM)
    return (
        df.select(
            F.col(id_col),
            F.col(weight_col),
            (F.col(weight_col).cast("double") / u).alias("priority"),
        )
        .orderBy(F.col("priority").desc(), F.col(id_col))
        .limit(k)
    )


def priority_sample_oracle_sql(
    table: str, id_col: str, weight_col: str, k: int = 100
) -> str:
    """DuckDB SQL for the identical sample (same 52-bit md5 ``u``)."""
    h = f"CAST('0x' || substr(md5(CAST({id_col} AS VARCHAR)), 1, {_U_HEX_CHARS}) AS BIGINT)"
    u = f"(CAST({h} + 1 AS DOUBLE) / {_U_DENOM!r})"
    return f"""
    SELECT {id_col}, {weight_col},
           CAST({weight_col} AS DOUBLE) / {u} AS priority
    FROM {table}
    ORDER BY priority DESC, {id_col} LIMIT {k}
    """


def priority_sample_merge_into_store(
    batch_df: DataFrame,
    id_col: str,
    weight_col: str,
    store_path: str,
    k: int = 100,
) -> None:
    """foreachBatch body: maintain the top-k priority sample over an
    unbounded stream — streaming weighted sampling without replacement.

    Works because top-k-by-priority is a MERGEABLE summary (like the
    HLL register store): top_k(A ∪ B) = top_k(top_k(A) ∪ top_k(B)),
    and the priority is a pure function of (id, weight), so re-merging
    re-delivered rows is idempotent — the store after any sequence of
    at-least-once micro-batches equals the single-pass batch sample of
    everything ever seen. State is exactly k rows; the
    collect-then-rewrite is bounded driver work.

    Rows re-appearing with a CHANGED weight get a new priority; the
    dedup below keeps the highest-priority occurrence per id so a
    reweighted item cannot occupy two slots.
    """
    spark = batch_df.sparkSession
    new = priority_sample(batch_df, id_col, weight_col, k)
    old = read_store(spark, store_path)
    merged = old.unionByName(new) if old is not None else new
    top = (
        merged.groupBy(id_col)
        .agg(
            F.max("priority").alias("priority"),
            F.max_by(weight_col, "priority").alias(weight_col),
        )
        .select(id_col, weight_col, "priority")
        .orderBy(F.col("priority").desc(), F.col(id_col))
        .limit(k)
    )
    rows = top.collect()
    out = local_frame(spark, rows, top.schema)
    write_store(out, store_path, next_generation(store_path))


def stratified_priority_sample(
    df: DataFrame,
    stratum_col: str,
    id_col: str,
    weight_col: str,
    k_per_stratum: int = 20,
) -> DataFrame:
    """Deterministic weighted top-k WITHIN each stratum — the mixing
    primitive "k docs per language/domain, ∝ weight".

    Same bit-exact priority as priority_sample; the per-stratum top-k
    is a rank window over the stratum partition — ONE shuffle keyed by
    stratum, state bounded by the window frame. (For heavily skewed
    strata pre-prune with a per-partition top-k as in
    similarity._partition_topk_then_rank.)
    """
    from pyspark.sql import Window

    h = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, _U_HEX_CHARS), 16, 10
    ).cast("long")
    u = (h + F.lit(1)).cast("double") / F.lit(_U_DENOM)
    scored = df.select(
        F.col(stratum_col).alias("stratum"),
        F.col(id_col),
        F.col(weight_col),
        (F.col(weight_col).cast("double") / u).alias("priority"),
    )
    w = Window.partitionBy("stratum").orderBy(F.col("priority").desc(), F.col(id_col))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k_per_stratum)
        .select("stratum", id_col, weight_col, "priority")
    )


def stratified_priority_oracle_sql(
    table: str,
    stratum_col: str,
    id_col: str,
    weight_col: str,
    k_per_stratum: int = 20,
) -> str:
    h = f"CAST('0x' || substr(md5(CAST({id_col} AS VARCHAR)), 1, {_U_HEX_CHARS}) AS BIGINT)"
    u = f"(CAST({h} + 1 AS DOUBLE) / {_U_DENOM!r})"
    return f"""
    SELECT stratum, {id_col}, {weight_col}, priority FROM (
      SELECT {stratum_col} AS stratum, {id_col}, {weight_col},
             CAST({weight_col} AS DOUBLE) / {u} AS priority,
             row_number() OVER (PARTITION BY {stratum_col}
                                ORDER BY CAST({weight_col} AS DOUBLE) / {u} DESC,
                                         {id_col}) AS rk
      FROM {table}
    ) WHERE rk <= {k_per_stratum}
    """


def dataset_split(
    df: DataFrame,
    id_col: str,
    fractions: dict[str, float] | None = None,
    salt: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment — the split every
    training pipeline needs to be REPRODUCIBLE and STABLE: a document
    keeps its split across reruns, re-partitioning, cluster resizing,
    and incremental corpus growth (none of which is true of
    ``df.randomSplit``, whose assignment depends on partitioning).

    ``u = md5(salt ':' id)`` truncated to the same 52-bit
    exactly-double-representable prefix as priority_sample; the id
    falls into the half-open cumulative-fraction interval of its
    split, in ``fractions``' declared order. Changing ``salt`` draws
    an independent split; holdout contamination across salts is
    md5-collision improbable.

    Map-only (no shuffle, no state): each row's split is a pure
    function of its id. Output: input columns + ``split``.

    NULL ids: md5 of NULL is NULL, every threshold comparison is NULL,
    and the assignment falls through to the LAST declared split — BY
    CONSTRUCTION identically in both engines (``concat`` propagates
    NULL here; ``concat_ws`` would NOT — it skips null arguments, which
    made Spark hash the bare salt while the oracle fell to the ELSE
    branch, a cross-engine divergence found in the round-6 self-review).
    """
    fractions = fractions or {"train": 0.98, "val": 0.01, "test": 0.01}
    if abs(sum(fractions.values()) - 1.0) > 1e-9:
        raise ValueError("fractions must sum to 1")
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt), F.lit(":"), F.col(id_col).cast("string"))),
            1,
            _U_HEX_CHARS,
        ),
        16,
        10,
    ).cast("long")
    u = h.cast("double") / F.lit(_U_DENOM)
    expr = None
    cum = 0.0
    names = list(fractions)
    for name in names[:-1]:
        cum += fractions[name]
        expr = (
            F.when(u < F.lit(cum), F.lit(name))
            if expr is None
            else expr.when(u < F.lit(cum), F.lit(name))
        )
    split = F.lit(names[0]) if expr is None else expr.otherwise(F.lit(names[-1]))
    return df.withColumn("split", split)


def dataset_split_oracle_sql(
    table: str,
    id_col: str,
    fractions: dict[str, float] | None = None,
    salt: str = "split",
) -> str:
    """DuckDB SQL assigning the identical split (same 52-bit md5 u,
    same NULL-id fall-through to the last split, same input
    validation)."""
    fractions = fractions or {"train": 0.98, "val": 0.01, "test": 0.01}
    if abs(sum(fractions.values()) - 1.0) > 1e-9:
        raise ValueError("fractions must sum to 1")
    h = (
        f"CAST('0x' || substr(md5('{salt}' || ':' || CAST({id_col} AS VARCHAR)), "
        f"1, {_U_HEX_CHARS}) AS BIGINT)"
    )
    u = f"(CAST({h} AS DOUBLE) / {_U_DENOM!r})"
    names = list(fractions)
    if len(names) == 1:  # CASE with zero WHENs is invalid SQL
        return f"SELECT *, '{names[0]}' AS split FROM {table}"
    cases = []
    cum = 0.0
    for name in names[:-1]:
        cum += fractions[name]
        cases.append(f"WHEN {u} < {cum!r} THEN '{name}'")
    case = "CASE " + " ".join(cases) + f" ELSE '{names[-1]}' END"
    return f"SELECT *, {case} AS split FROM {table}"
