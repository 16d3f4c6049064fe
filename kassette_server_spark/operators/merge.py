"""Upsert / MERGE emulation and schema-change handling.

The reference's Postgres destination upserts on the schema's
primary_key fields and, on schema change, DROPS AND RECREATES the
destination table (integrations/postgres/main.go:32-67). In Spark
terms those are:

- upsert → MERGE INTO (Delta/Iceberg). Without a transactional table
  format on the classpath we emulate: new-version = updates ∪
  (target ⟂ updates) — an anti-join + union, atomically swapped by an
  overwrite of the table directory. Same result, coarser atomicity
  (documented).
- drop-and-recreate → overwrite with the new schema; the scalable
  alternative is additive schema evolution (mergeSchema) which keeps
  history instead of destroying it.

Scale: the anti-join shuffles on the key; with the target bucketed by
the key (operators/layout.py) the rewrite is bucket-local. True
row-level MERGE at 100 TB wants Delta/Iceberg — this operator keeps
the engine honest without those jars.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def upsert(target: DataFrame, updates: DataFrame, keys: list[str]) -> DataFrame:
    """Rows of ``updates`` win on key collision; unmatched target rows
    survive. Column sets must match. Duplicate keys *within* updates
    are resolved deterministically by keeping the max over the
    remaining columns (stable regardless of partitioning)."""
    others = [c for c in updates.columns if c not in keys]
    deduped = (
        updates.groupBy(*keys).agg(
            F.max_by(F.struct(*others), F.struct(*others)).alias("_s")
        )
        .select(*keys, "_s.*")
    )
    survivors = target.join(deduped.select(*keys), keys, "left_anti")
    return survivors.unionByName(deduped)


def scd2_apply(
    target: DataFrame,
    updates: DataFrame,
    keys: list[str],
    ts_col: str = "valid_from",
    end_col: str = "valid_to",
    current_col: str = "is_current",
) -> DataFrame:
    """Slowly-changing-dimension type 2: close the current row for each
    changed key and append the new version. Emulated with the same
    anti-join + union machinery (MERGE-free).

    Multiple updates for one key in a batch are first collapsed to the
    latest (max ts, then max remaining columns) — otherwise the join
    would duplicate history rows and leave two current versions.
    """
    others = [c for c in updates.columns if c not in keys and c != ts_col]
    updates = (
        updates.groupBy(*keys)
        .agg(
            F.max_by(
                F.struct(ts_col, *others), F.struct(ts_col, *others)
            ).alias("_s")
        )
        .select(*keys, "_s.*")
    )
    upd_keys = updates.select(*keys, F.col(ts_col).alias("_new_from"))
    closed = (
        target.join(upd_keys, keys, "left")
        .withColumn(
            end_col,
            F.when(
                F.col(current_col) & F.col("_new_from").isNotNull(), F.col("_new_from")
            ).otherwise(F.col(end_col)),
        )
        .withColumn(
            current_col,
            F.when(F.col("_new_from").isNotNull(), F.lit(False)).otherwise(F.col(current_col)),
        )
        .drop("_new_from")
    )
    opened = (
        updates.withColumn(end_col, F.lit(None).cast("timestamp"))
        .withColumn(current_col, F.lit(True))
    )
    return closed.unionByName(opened.select(*closed.columns))
