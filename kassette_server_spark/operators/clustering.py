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


def power_iteration_top_component(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    iters: int = 3,
    x_scale: int = 10_000,
    v_scale: int = 100_000,
) -> DataFrame:
    """Top principal direction of X'X by ``iters`` fixed-point power
    iterations — the distributed-PCA reduce step (whitening, SemDeDup
    axes, embedding drift) made engine-reproducible.

    Float power iteration is summation-order-dependent twice per pass
    (the dot products and the Σ_rows accumulation); here every
    accumulation is EXACT integer arithmetic: embeddings quantize to
    ``round(x·x_scale)``, the direction to ``round(v·v_scale)``,
    per-row dots are Σ Xᵢ·Vᵢ over int64 (row-local, exact), the new
    direction w_j = Σ_rows Xⱼ·dot is an exact int64 sum, and ‖w‖² is an
    exact DECIMAL(38,0) sum; the ONLY floats are the final
    sqrt + scale + round per component — IEEE exact-rounded, identical
    everywhere. Magnitudes: |w| ≲ rows·maxX·maxDot stays inside int64
    to ~10⁴ rows at these scales per component — drop x_scale (or
    widen the sums to DECIMAL) for larger corpora.

    Per iteration: one broadcast join of the 1-row-per-vector dot table
    (broadcastable when the corpus is bounded; co-partitioned row join
    at 100 TB) and two map-combined groupBys (64-key and row-key). The
    exploded X is localCheckpoint'ed once and reused by all passes.

    Output: (dim, vj) — the unit direction × v_scale, 1-based dims.
    """
    x = (
        df.select(
            F.col(id_col).alias("rid"),
            F.posexplode(F.col(vec_col)).alias("pos", "xval"),
        )
        .select(
            "rid",
            (F.col("pos") + 1).alias("dim"),
            F.round(F.col("xval") * x_scale).cast("long").alias("xi"),
        )
        .localCheckpoint(eager=False)
    )
    dims = x.select("dim").distinct()
    n_dims = dims.count()  # bounded: embedding dimensionality
    seed = int(round(v_scale / n_dims**0.5))
    v = dims.select("dim", F.lit(seed).cast("long").alias("vj"))
    for _ in range(iters):
        dot = (
            x.join(F.broadcast(v), "dim")
            .groupBy("rid")
            .agg(F.sum(F.col("xi") * F.col("vj")).alias("dot"))
        )
        w = (
            x.join(F.broadcast(dot), "rid")
            .groupBy("dim")
            .agg(F.sum(F.col("xi") * F.col("dot")).alias("w"))
        )
        norm = w.agg(
            F.sqrt(
                F.sum(F.col("w").cast("decimal(38,0)") * F.col("w")).cast("double")
            ).alias("nrm")
        )
        v = (
            w.crossJoin(F.broadcast(norm))
            .select(
                "dim",
                F.round(F.col("w").cast("double") * v_scale / F.col("nrm"))
                .cast("long")
                .alias("vj"),
            )
            .localCheckpoint(eager=False)
        )
    return v


def power_iteration_oracle_sql(
    table: str = "embeddings",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_dims: int = 64,
    iters: int = 3,
    x_scale: int = 10_000,
    v_scale: int = 100_000,
) -> str:
    """DuckDB SQL unrolling the identical integer iterations."""
    seed = int(round(v_scale / n_dims**0.5))
    ctes = [
        f"""x AS (
          SELECT {id_col} AS rid, u.i AS dim,
                 CAST(round({vec_col}[u.i] * {x_scale}) AS BIGINT) AS xi
          FROM {table}, unnest(CAST(range(1, {n_dims} + 1) AS BIGINT[])) AS u(i)
        )""",
        f"v0 AS (SELECT DISTINCT dim, CAST({seed} AS BIGINT) AS vj FROM x)",
    ]
    for i in range(iters):
        ctes.append(
            f"d{i + 1} AS (SELECT x.rid, SUM(x.xi * v.vj) AS dot "
            f"FROM x JOIN v{i} v USING (dim) GROUP BY x.rid)"
        )
        ctes.append(
            f"w{i + 1} AS (SELECT x.dim, SUM(x.xi * d.dot) AS w "
            f"FROM x JOIN d{i + 1} d USING (rid) GROUP BY x.dim)"
        )
        ctes.append(
            f"n{i + 1} AS (SELECT sqrt(CAST(SUM(CAST(w AS HUGEINT) * w) AS DOUBLE)) AS nrm FROM w{i + 1})"
        )
        ctes.append(
            f"v{i + 1} AS (SELECT dim, CAST(round(CAST(w AS DOUBLE) * {v_scale} / nrm) AS BIGINT) AS vj "
            f"FROM w{i + 1}, n{i + 1})"
        )
    return "WITH " + ",\n".join(ctes) + f"\nSELECT dim, vj FROM v{iters}"
