"""Distributed Lloyd's k-means over numeric feature columns.

Spark MLlib has KMeans, but (a) its init (k-means||) is randomized and
engine-private, so results can never be oracle-checked, and (b) it
drags in the RDD-based mllib runtime for what is, per iteration, just
"argmin over k quadratics, then a grouped sum". This implementation is
the pure-DataFrame formulation:

- centroids live on the DRIVER as k plain Python tuples (k is tiny by
  definition); each assignment pass embeds them as literal expressions,
  so assignment is map-side-only — ZERO join, ZERO extra shuffle;
- the per-iteration shuffle is the centroid update's
  ``groupBy(cid).agg(sum...)`` — after map-side combine, the exchange
  carries at most k rows per map partition. Per-iteration cost at
  100 TB: one scan + one k-row-wide shuffle. The ≤k-row ``collect()``
  between iterations is bounded by construction.
- every plan is rebuilt from literals each round, so lineage stays
  O(1)-deep across iterations (no localCheckpoint needed, unlike the
  self-referential join formulation).

Determinism (what makes the q96 oracle possible): init = the k rows
with the smallest ids; sums of integer-valued features are exact
BIGINTs; the only floating-point ops are centroid = sum/n (one
correctly-rounded IEEE division) and the distance quadratic (fixed
association) — both bit-identical in Spark, DuckDB, and driver-side
Python. Ties in the argmin break toward the smaller centroid id via
struct ordering. Callers with non-integer features lose the
exact-parity guarantee but not correctness.

Empty clusters are dropped (a centroid that attracts no points leaves
the centroid set), matching the SQL formulation where the update CTE
simply has no row for it.

Reference parity: the reference has no clustering; §2.3 north-star
(IVF coarse quantizers in operators/similarity.py want exactly this
fit step).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _assign(pts: DataFrame, feature_cols: list[str], centroids: list[tuple]) -> DataFrame:
    """Add ``cid``: index of the nearest centroid (ties → smaller cid).

    ``centroids[j]`` is (cid, f0, f1, ...) with Python-float coords.
    Builds array<struct<dist,cid>> from literals and takes array_min —
    struct comparison orders by dist first, then cid.
    """
    entries = []
    for row in centroids:
        cid, coords = row[0], row[1:]
        dist = None
        for col_name, c in zip(feature_cols, coords):
            term = (F.col(col_name) - F.lit(float(c))) * (
                F.col(col_name) - F.lit(float(c))
            )
            dist = term if dist is None else dist + term
        entries.append(F.struct(dist.alias("d"), F.lit(int(cid)).alias("cid")))
    return pts.withColumn("cid", F.array_min(F.array(*entries))["cid"])


def kmeans_fit(
    df: DataFrame,
    feature_cols: list[str],
    k: int = 4,
    iters: int = 2,
    id_col: str = "id",
) -> DataFrame:
    """Run ``iters`` assignment passes (Lloyd), updating centroids
    between passes, and return the final per-cluster summary:

    (cid, n, sum_<f>... BIGINT-exact, c_<f>... double centroids).

    Feature columns must be numeric; they are summed as BIGINT for the
    exactness contract, so integer-valued features give bit-portable
    output. Init: the k rows with the smallest ``id_col``.
    """
    if iters < 1:
        raise ValueError("iters must be >= 1")
    pts = df.select(
        F.col(id_col).alias("_pid"),
        *[F.col(c).cast("double").alias(c) for c in feature_cols],
    )
    init_rows = pts.orderBy("_pid").limit(k).collect()  # bounded: k rows
    centroids = [
        (j, *[float(r[c]) for c in feature_cols]) for j, r in enumerate(init_rows)
    ]
    sums = [F.sum(F.col(c).cast("long")).alias(f"sum_{c}") for c in feature_cols]
    for _ in range(iters - 1):
        updated = (
            _assign(pts, feature_cols, centroids)
            .groupBy("cid")
            .agg(F.count("*").alias("n"), *sums)
            .collect()  # bounded: <= k rows
        )
        centroids = [
            (r["cid"], *[r[f"sum_{c}"] / r["n"] for c in feature_cols])
            for r in sorted(updated, key=lambda r: r["cid"])
        ]
    final = (
        _assign(pts, feature_cols, centroids)
        .groupBy("cid")
        .agg(F.count("*").cast("long").alias("n"), *sums)
    )
    ctr = [
        (F.col(f"sum_{c}").cast("double") / F.col("n")).alias(f"c_{c}")
        for c in feature_cols
    ]
    return final.select(F.col("cid").cast("long"), "n", *ctr)
