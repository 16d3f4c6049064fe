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

from .store import generation_committed, local_frame, read_store, write_store


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


def scd2_merge_into_store(
    batch_df: DataFrame,
    batch_id: int,
    keys: list[str],
    store_path: str,
    ts_col: str = "valid_from",
) -> bool:
    """foreachBatch body: maintain an SCD2 dimension table from a CDC
    change feed — streaming history tracking.

    Applying a change batch is NOT idempotent (replaying it would close
    the rows it just opened against themselves), so the store carries
    the same ``merged_through`` batch-id fence as the additive sketch
    stores (Spark's documented foreachBatch exactly-once recipe): a
    replayed batch at or below the high-water mark is skipped. Returns
    whether the batch was applied.

    State is the dimension's full history — dimension-sized by
    definition, not stream-sized. The collect-and-rewrite is
    appropriate for control-plane-scale dimensions (the reference's
    config/destination tables); for fact-scale SCD2 swap the rewrite
    for a partitioned storage merge, keeping the same fence.

    Persistence goes through the crash-safe generation store
    (store.py, ADVICE r5): a crash mid-rewrite can no longer present a
    corrupt directory that the next read would misclassify as "first
    batch" — which would silently reset BOTH the history and the fence
    and re-apply replayed batches. Only a never-committed store starts
    empty; genuine read errors propagate.
    """
    spark = batch_df.sparkSession
    if generation_committed(store_path, batch_id):
        # zero-row committed generation has no row fence (ADVICE r6 #1)
        return False
    others = [c for c in batch_df.columns if c not in keys and c != ts_col]
    opened_schema = batch_df.select(
        *keys,
        ts_col,
        *others,
    )
    old = read_store(spark, store_path)
    if old is not None:
        hwm = old.agg(F.max("merged_through")).collect()[0][0]
        if hwm is not None and batch_id <= hwm:
            return False
        target = old.drop("merged_through")
    else:  # first batch: empty dimension
        target = (
            opened_schema.withColumn("valid_to", F.lit(None).cast("timestamp"))
            .withColumn("is_current", F.lit(True))
            .limit(0)
        )
    merged = scd2_apply(target, batch_df, keys, ts_col)
    rows = merged.collect()
    out = local_frame(spark, rows, merged.schema).withColumn(
        "merged_through", F.lit(int(batch_id))
    )
    write_store(out, store_path, int(batch_id))
    return True


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
) -> DataFrame:
    """Row-level diff of two table snapshots — the data-versioning
    primitive behind CDC backfills, reconciliation checks, and
    "what changed between yesterday's and today's load".

    Full outer join on the key, change detection via an md5 row digest
    of every non-key column. The per-value encoding is INJECTIVE
    (ADVICE r5): each value becomes ``s<charlen>:<value>`` and NULL
    becomes ``n``, so fields are self-delimiting — no separator a value
    could contain, no sentinel string a value could equal. (The earlier
    \\x1f-separated recipe let ('a\\x1fb','c') alias ('a','b\\x1fc')
    and a literal '\\x00null' collide with NULL.) Output only differing
    rows: (keys..., change) with change ∈ {added, removed, changed}.
    Exact strings/integers — engine portable.

    Scale shape: one co-partitioned full outer join on the key; digests
    are computed map-side so the shuffle carries (key, 16-byte digest),
    never the full row twice.
    """
    others = sorted(c for c in old.columns if c not in keys)
    if sorted(c for c in new.columns if c not in keys) != others:
        raise ValueError("snapshots must share a schema")

    def digest(df: DataFrame) -> DataFrame:
        parts = []
        for c in others:
            s = F.col(c).cast("string")
            parts.append(
                F.coalesce(
                    F.concat(F.lit("s"), F.length(s), F.lit(":"), s), F.lit("n")
                )
            )
        return df.select(*keys, F.md5(F.concat(*parts)).alias("_h"))

    o = digest(old).withColumnRenamed("_h", "_ho")
    n = digest(new).withColumnRenamed("_h", "_hn")
    j = o.join(n, keys, "full_outer")
    return j.select(
        *keys,
        F.when(F.col("_ho").isNull(), F.lit("added"))
        .when(F.col("_hn").isNull(), F.lit("removed"))
        .when(F.col("_ho") != F.col("_hn"), F.lit("changed"))
        .alias("change"),
    ).where(F.col("change").isNotNull())


def snapshot_diff_oracle_sql(
    old_sql: str, new_sql: str, keys: list[str], other_cols: list[str]
) -> str:
    """DuckDB SQL computing the identical diff (same injective
    length-prefixed digest recipe)."""
    others = sorted(other_cols)
    dig = "md5(concat(" + ", ".join(
        f"coalesce('s' || length(CAST({c} AS VARCHAR)) || ':' "
        f"|| CAST({c} AS VARCHAR), 'n')" for c in others
    ) + "))"
    keylist = ", ".join(keys)
    on = " AND ".join(f"o.{k} = n.{k}" for k in keys)
    keysel = ", ".join(f"COALESCE(o.{k}, n.{k}) AS {k}" for k in keys)
    return f"""
    WITH o AS (SELECT {keylist}, {dig} AS h FROM ({old_sql})),
    n AS (SELECT {keylist}, {dig} AS h FROM ({new_sql}))
    SELECT * FROM (
      SELECT {keysel},
             CASE WHEN o.h IS NULL THEN 'added'
                  WHEN n.h IS NULL THEN 'removed'
                  WHEN o.h <> n.h THEN 'changed' END AS change
      FROM o FULL OUTER JOIN n ON {on}
    ) WHERE change IS NOT NULL
    """


def point_in_time_join(
    facts: DataFrame,
    versions: DataFrame,
    keys: list[str],
    fact_ts: str,
    version_ts: str,
    salt: int = 1,
) -> DataFrame:
    """Temporal (point-in-time) join: each fact row paired with the
    dimension VERSION in effect at ``fact_ts`` — the batch query every
    SCD2 dimension exists to answer ("what was this customer's tier
    when the order shipped?"), and the validity-interval sibling of
    the as-of join (asof.py joins to the nearest-preceding EVENT; this
    joins to the version whose [valid_from, next valid_from) interval
    CONTAINS the fact).

    Mechanics: ``versions`` gets a ``lead(version_ts)`` close-out per
    key (exactly how scd2_apply's valid_to is defined — an open last
    version matches everything after its valid_from), then ONE
    co-partitioned equi-join on ``keys`` with the residual
    ``valid_from <= fact_ts < valid_to`` filter. Inner semantics:
    facts before their key's first version (or with no key) drop.

    Scale shape: the shuffle is the plain equi-join on ``keys`` —
    versions-per-key is bounded by change history, so the residual
    filter fans each fact out to at most that many candidates before
    pruning, and NO interval bucketing is needed (contrast
    asof.range_join_buckets, which exists for intervals NOT anchored
    to an equi-key). A dimension-sized ``versions`` side is broadcast
    by AQE automatically.

    Celebrity-key skew needs ``salt`` (round-7 skew-stress finding):
    AQE's skew join CANNOT split this plan, because the lead()
    close-out window shares the join's hash partitioning — Catalyst
    reuses one Exchange for both, and OptimizeSkewedJoin only rewrites
    joins whose children are bare ENSURE_REQUIREMENTS shuffle stages
    (splitting mid-pipeline would also tear a window partition
    apart). With ``salt=R`` the versions side is replicated R ways
    (after the window, so close-out intervals stay correct) and each
    fact row picks one deterministic replica via xxhash64 of all its
    columns, spreading a hot key over R shuffle partitions at the cost
    of an R-times-larger (but still dimension-sized) versions
    shuffle — the layout.salted_join recipe applied temporally.

    Column contract: ``facts`` and ``versions`` share ONLY the key
    columns; ``fact_ts`` and ``version_ts`` must be differently named.
    ``versions`` must be UNIQUE per (keys, version_ts): two versions at
    the same instant would race for the same interval under lead()'s
    tie order (nondeterministic across partitionings) — collapse
    duplicates first, the way scd2_apply and q140's min() aggregation
    do. Output: all fact columns + the matched version's non-key
    columns (including ``version_ts``).
    """
    from pyspark.sql import Window

    overlap = (set(facts.columns) & set(versions.columns)) - set(keys)
    if overlap or fact_ts == version_ts:
        raise ValueError(
            f"facts/versions must share only key columns (clash: {sorted(overlap) or fact_ts})"
        )
    if "_valid_to" in facts.columns or "_valid_to" in versions.columns:
        # the internal close-out column would silently overwrite (or
        # ambiguously shadow) a user column of the same name
        raise ValueError(
            "'_valid_to' is reserved by point_in_time_join; rename the "
            "input column (an SCD2 dimension's own valid_to close-out "
            "is recomputed here from version_ts)"
        )
    w = Window.partitionBy(*keys).orderBy(version_ts)
    v = versions.withColumn("_valid_to", F.lead(version_ts).over(w))
    f = facts
    join_keys = list(keys)
    if salt > 1:
        if "_salt" in facts.columns or "_salt" in versions.columns:
            raise ValueError("'_salt' is reserved by point_in_time_join(salt=...)")
        # replicate AFTER the close-out window so intervals are built
        # from the full per-key history, then spread the facts
        # deterministically (xxhash64 over all fact columns — stable
        # across retries/partitionings, unlike rand())
        v = v.withColumn("_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1))))
        f = facts.withColumn(
            "_salt",
            F.pmod(F.xxhash64(*[F.col(c) for c in facts.columns]), F.lit(salt)).cast("int"),
        )
        join_keys.append("_salt")
    return (
        f.join(v, on=join_keys)
        .where(
            (F.col(fact_ts) >= F.col(version_ts))
            & (F.col("_valid_to").isNull() | (F.col(fact_ts) < F.col("_valid_to")))
        )
        .drop("_valid_to", "_salt")
    )


def point_in_time_oracle_sql(
    facts_sql: str,
    versions_sql: str,
    keys: list[str],
    fact_ts: str,
    version_ts: str,
    select: str,
) -> str:
    """DuckDB SQL computing the identical point-in-time join (same
    lead() close-out, same half-open interval)."""
    part = ", ".join(keys)
    on = " AND ".join(f"f.{k} = v.{k}" for k in keys)
    return f"""
    WITH v AS (
      SELECT *, lead({version_ts}) OVER (PARTITION BY {part} ORDER BY {version_ts}) AS _valid_to
      FROM ({versions_sql})
    ),
    f AS ({facts_sql})
    SELECT {select}
    FROM f JOIN v ON {on}
      AND f.{fact_ts} >= v.{version_ts}
      AND (v._valid_to IS NULL OR f.{fact_ts} < v._valid_to)
    """
