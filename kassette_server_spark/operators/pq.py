"""Product quantization (PQ) + asymmetric distance computation (ADC)
for the ANN stack — deterministic end to end, so every stage is
DuckDB-oracle-checkable (VERDICT r11 "What's missing" (d)).

PQ is the standard compression that makes a 100 TB embedding corpus
SERVEABLE: int8 scalar quantization (operators/similarity.quantize_int8,
q77) buys 4× over float32; PQ with M=8 sub-codebooks of K=16 centroids
stores each 64-dim vector as 8 half-byte codes — 8 bytes against 256
for float32, a 32× corpus compression — and ADC answers a query with
M table lookups + a fixed-shape sum per candidate instead of a 64-term
dot product. The corpus is NEVER shuffled: codebooks are tiny
(M·K·d = 1024 ints) and live driver-side as literal expressions
(the clustering.py k-means pattern), so encode and ADC scoring are
map-side-only passes over the scan.

Why it can be exact (the q96/q77/q118 recipe composed):

- vectors first quantize to int8 (q_i = round(x_i·127 / max|x|) —
  one correctly-rounded IEEE division + round per component, the
  established q77 contract), after which EVERYTHING is int64;
- sub-codebook training is Lloyd's with the q96 determinism contract:
  init = subvectors of the K smallest vec_ids, squared-L2 argmin over
  exact integers with ties toward the smaller centroid id;
- the centroid update keeps centroids INTEGER via the engine-portable
  floored mean (sum + 128·n) div n − 128: component sums are ≥ −127·n
  so the biased dividend is non-negative and truncating division
  (DuckDB ``//``, Spark ``div``) ≡ floor (the multimodal.py WAV-resample
  discipline). An integer codebook costs a rounding step of < 1 per
  component per iteration and buys bit-portable assignment, encode, and
  ADC distances — all pure int64 arithmetic;
- empty clusters drop out of the codebook (q96 semantics: the update
  CTE simply has no row for them).

Per training iteration at scale: one map-only assignment pass (the
codebook is literals — zero join) + one groupBy((m, cid)) whose
exchange carries ≤ M·K rows per map partition after partial
aggregation, + one bounded ≤ M·K-row collect. Encode is one map-only
pass. ADC scoring builds the M·K-entry distance table per QUERY row
(queries are a sample by contract), broadcasts it, and scores
candidates with M ``element_at`` lookups — then the shared
partition-local top-k prune (similarity._partition_topk_then_rank)
keeps the ranking exchange at |queries|·k·partitions rows.

Reference parity: the reference has no vector search at all; this is
§2.3 north-star surface (SURVEY.md "similarity search: ... scale
path"), completing int8 (q77) + JL sketch (q220) + IVF (q83) with the
compression tier they were missing.
"""

from __future__ import annotations

from functools import reduce
from operator import add

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .similarity import _partition_topk_then_rank, quantize_int8

Codebook = dict[int, list[tuple[int, tuple[int, ...]]]]
"""Per sub-space m: [(cid, centroid components)] — integers, cid-sorted."""


def _quantized(df: DataFrame, id_col: str, vec_col: str, id_alias: str) -> DataFrame:
    qvec, _scale = quantize_int8(vec_col)
    return df.select(F.col(id_col).alias(id_alias), qvec.alias("qv"))


def _sub_dist(qv: Column, mi: int, d: int, coords: tuple[int, ...]) -> Column:
    """Exact int64 squared L2 between subvector mi of ``qv`` and an
    integer centroid: Σ_j (qv[mi·d+j] − c_j)². Components are in
    [−127, 127] on both sides, so each term ≤ 254² and the d-term sum
    is nowhere near overflow."""
    terms = [
        (F.element_at(qv, mi * d + j + 1) - F.lit(int(c)))
        * (F.element_at(qv, mi * d + j + 1) - F.lit(int(c)))
        for j, c in enumerate(coords)
    ]
    return reduce(add, terms)


def _code_expr(qv: Column, mi: int, d: int, centroids: list[tuple[int, tuple[int, ...]]]) -> Column:
    """Nearest-centroid id for subvector mi (ties → smaller cid) via
    array_min over (dist, cid) structs — the clustering.py assignment
    shape, literal centroids, zero join."""
    entries = [
        F.struct(_sub_dist(qv, mi, d, coords).alias("d"), F.lit(int(cid)).alias("cid"))
        for cid, coords in centroids
    ]
    return F.array_min(F.array(*entries))["cid"]


def _seed_codebook(qdf: DataFrame, m: int, k: int, dim: int) -> Codebook:
    """Init: the K rows with the smallest ids, sliced into subvectors
    (q96's deterministic seeding on every sub-space at once). Bounded
    collect: k rows."""
    d = dim // m
    rows = qdf.orderBy("_pid").limit(k).collect()
    book: Codebook = {}
    for mi in range(m):
        book[mi] = [
            (j, tuple(int(v) for v in r["qv"][mi * d : (mi + 1) * d]))
            for j, r in enumerate(rows)
        ]
    return book


def _update_frame(qdf: DataFrame, book: Codebook, m: int, d: int) -> DataFrame:
    """One Lloyd update as a DataFrame: assign every (vector, m) to its
    nearest centroid (map-only, literal codebook), then groupBy((m,
    cid)) with per-component BIGINT sums. Output: (m, cid, n, s_0..s_{d-1})
    — ≤ M·K rows, map-side combined."""
    stacked = qdf.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(mi).alias("m"),
                        _code_expr(F.col("qv"), mi, d, book[mi]).alias("cid"),
                        F.slice("qv", mi * d + 1, d).alias("s"),
                    )
                    for mi in range(m)
                ]
            )
        ).alias("z")
    ).select("z.m", "z.cid", "z.s")
    return stacked.groupBy("m", "cid").agg(
        F.count("*").alias("n"),
        *[F.sum(F.element_at("s", j + 1)).alias(f"s_{j}") for j in range(d)],
    )


def _floored_mean(s: int, n: int) -> int:
    # Python // floors directly (n > 0); the +128·n bias below is the
    # SQL-side spelling of the same floor for truncating engines.
    return s // n


def pq_train(
    df: DataFrame,
    m: int = 8,
    k: int = 16,
    iters: int = 2,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> Codebook:
    """Train the M sub-codebooks: ``iters`` assignment+update cycles,
    returning the codebook AFTER the final update (integer centroids;
    empty clusters dropped). Each cycle costs one map-only pass + one
    ≤ M·K-row shuffle + one bounded collect."""
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    if iters < 1:
        raise ValueError("iters must be >= 1")
    d = dim // m
    qdf = _quantized(df, id_col, vec_col, "_pid")
    book = _seed_codebook(qdf, m, k, dim)
    for _ in range(iters):
        rows = _update_frame(qdf, book, m, d).collect()  # bounded: <= m*k
        book = {mi: [] for mi in range(m)}
        for r in sorted(rows, key=lambda r: (r["m"], r["cid"])):
            coords = tuple(_floored_mean(int(r[f"s_{j}"]), int(r["n"])) for j in range(d))
            book[int(r["m"])].append((int(r["cid"]), coords))
    return book


def pq_fit_summary(
    df: DataFrame,
    m: int = 8,
    k: int = 16,
    iters: int = 2,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The q239 spec surface: the trained codebook as a hashable frame.
    Runs ``iters − 1`` update cycles driver-side (bounded collects),
    then the FINAL cycle stays in-frame so the returned centroids are
    computed distributively with the engine-portable floored mean:
    c_j = (sum_j + 128·n) div n − 128 (dividend ≥ 0 because sums are
    ≥ −127·n, so truncation ≡ floor — both engines agree).

    Output: (m, cid, n, c_sum, c_sqsum) — n = final-assignment cluster
    size, c_sum/c_sqsum = Σ c_j and Σ c_j² of the updated integer
    centroid (exact BIGINTs; the full centroid is m·k·d values — the
    two moments pin it for the hash without a ragged array column)."""
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    d = dim // m
    qdf = _quantized(df, id_col, vec_col, "_pid")
    book = _seed_codebook(qdf, m, k, dim)
    for _ in range(iters - 1):
        rows = _update_frame(qdf, book, m, d).collect()
        book = {mi: [] for mi in range(m)}
        for r in sorted(rows, key=lambda r: (r["m"], r["cid"])):
            coords = tuple(_floored_mean(int(r[f"s_{j}"]), int(r["n"])) for j in range(d))
            book[int(r["m"])].append((int(r["cid"]), coords))
    upd = _update_frame(qdf, book, m, d)
    cx = [F.expr(f"(s_{j} + 128*n) div n - 128") for j in range(d)]
    return upd.select(
        F.col("m").cast("long").alias("m"),
        F.col("cid").cast("long").alias("cid"),
        F.col("n").cast("long").alias("n"),
        reduce(add, cx).cast("long").alias("c_sum"),
        reduce(add, [c * c for c in cx]).cast("long").alias("c_sqsum"),
    )


def pq_encode(
    df: DataFrame,
    book: Codebook,
    m: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    id_alias: str = "neighbor_id",
) -> DataFrame:
    """(id, codes array<long> of length M) — one map-only pass, the
    literal-codebook assignment per sub-space. At 100 TB this is the
    write path of the compressed index: 8 bytes per vector out."""
    d = dim // m
    qdf = _quantized(df, id_col, vec_col, id_alias)
    codes = F.array(*[_code_expr(F.col("qv"), mi, d, book[mi]).cast("long") for mi in range(m)])
    return qdf.select(id_alias, codes.alias("codes"))


def _adc_table(qv: Column, book: Codebook, m: int, k: int, d: int) -> Column:
    """Per-query flat ADC table: entry mi·K + cid = ‖q_sub − c‖²
    (exact int64). Dropped (empty) cids hold 0 — unreferencable, since
    codes only ever name surviving centroids."""
    entries: list[Column] = []
    for mi in range(m):
        alive = dict(book[mi])
        for cid in range(k):
            entries.append(
                _sub_dist(qv, mi, d, alive[cid]) if cid in alive else F.lit(0)
            )
    return F.array(*entries)


def pq_adc_topk(
    vectors: DataFrame,
    queries: DataFrame,
    m: int = 8,
    k: int = 16,
    iters: int = 2,
    dim: int = 64,
    topk: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    book: Codebook | None = None,
) -> DataFrame:
    """Asymmetric-distance top-k: train (or take) the codebook, encode
    the corpus (map-only), build the M·K-entry distance table per
    query row, broadcast the (small) query frame, and score each
    (query, candidate) with M element_at lookups + a fixed-shape sum —
    exact int64 throughout, so ranks are bit-portable. The corpus is
    never shuffled; the ranking exchange is the shared top-k prune's
    |queries|·k·partitions rows.

    Output: (query_id, neighbor_id, adc_dist, rank), rank 1..topk by
    (adc_dist asc, neighbor_id asc), self-pairs excluded."""
    d = dim // m
    if book is None:
        book = pq_train(vectors, m=m, k=k, iters=iters, dim=dim, id_col=id_col, vec_col=vec_col)
    enc = pq_encode(vectors, book, m=m, dim=dim, id_col=id_col, vec_col=vec_col)
    q = _quantized(queries, id_col, vec_col, "query_id").select(
        "query_id", _adc_table(F.col("qv"), book, m, k, d).alias("tab")
    )
    adc = reduce(
        add,
        [
            F.element_at(
                F.col("tab"),
                (F.lit(mi * k + 1) + F.element_at(F.col("codes"), mi + 1)).cast("int"),
            )
            for mi in range(m)
        ],
    )
    scored = (
        enc.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", (-adc).cast("double").alias("neg_adc"))
    )
    ranked = _partition_topk_then_rank(scored, topk, "neg_adc")
    return ranked.select(
        "query_id",
        "neighbor_id",
        (-F.col("neg_adc")).cast("long").alias("adc_dist"),
        "rank",
    )


def exact_int8_l2_topk(
    vectors: DataFrame,
    queries: DataFrame,
    topk: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The exact baseline ADC is judged against: full-dimension squared
    L2 over the SAME int8 quantization (so recall isolates what PQ's
    codebook loses, not what int8 loses — that gate is q77/q229's).
    Broadcast queries + shared partition-local prune, like q77.

    Output: (query_id, neighbor_id, l2_dist, rank)."""
    q = _quantized(queries, id_col, vec_col, "query_id").withColumnRenamed("qv", "qqv")
    c = _quantized(vectors, id_col, vec_col, "neighbor_id")
    dist = F.aggregate(
        F.zip_with(F.col("qqv"), F.col("qv"), lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", (-dist).cast("double").alias("neg_l2"))
    )
    ranked = _partition_topk_then_rank(scored, topk, "neg_l2")
    return ranked.select(
        "query_id",
        "neighbor_id",
        (-F.col("neg_l2")).cast("long").alias("l2_dist"),
        "rank",
    )


def pq_recall_at_k(
    vectors: DataFrame,
    queries: DataFrame,
    m: int = 8,
    k: int = 16,
    iters: int = 2,
    dim: int = 64,
    topk: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Recall@k of PQ-ADC against the exact int8-L2 baseline — the
    acceptance gate (the q223/ann_recall_at_k pattern) that must pass
    on a query sample BEFORE a 32×-compressed index serves traffic.
    Cost: the two searches + one |queries|·k-row join.

    Output: (query_id, n_hits, recall) — recall = n_hits/topk, one
    IEEE division of small exact integers."""
    book = pq_train(vectors, m=m, k=k, iters=iters, dim=dim, id_col=id_col, vec_col=vec_col)
    approx = pq_adc_topk(
        vectors, queries, m=m, k=k, iters=iters, dim=dim, topk=topk,
        id_col=id_col, vec_col=vec_col, book=book,
    )
    exact = exact_int8_l2_topk(vectors, queries, topk=topk, id_col=id_col, vec_col=vec_col)
    hits = (
        exact.select("query_id", "neighbor_id")
        .join(approx.select("query_id", "neighbor_id"), ["query_id", "neighbor_id"])
        .groupBy("query_id")
        .agg(F.count("*").alias("n_hits"))
    )
    qids = queries.select(F.col(id_col).alias("query_id"))
    return qids.join(hits, "query_id", "left").select(
        "query_id",
        F.coalesce(F.col("n_hits"), F.lit(0)).cast("long").alias("n_hits"),
        (F.coalesce(F.col("n_hits"), F.lit(0)).cast("double") / F.lit(float(topk))).alias(
            "recall"
        ),
    )


def _pq_oracle_ctes(m: int, k: int, d: int, iters: int) -> str:
    """Shared DuckDB CTE chain replicating the train pipeline: int8
    quantize (the q77 recipe) → subvector slices → smallest-id seeding
    → ``iters`` Lloyd cycles with the biased floored-mean update
    ((sum + 128·n) // n − 128 — dividend ≥ 0, so DuckDB's truncating
    ``//`` equals the flooring Python/Spark div). ``c{iters}`` is the
    final codebook CTE; ``a{iters}`` the final training assignment."""
    parts = [
        "e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)",
        "mxx AS (SELECT vec_id, v, list_reduce(list_transform(v, x -> abs(x)),"
        " (a, x) -> greatest(a, x)) AS mx FROM e)",
        "qz AS (SELECT vec_id, list_transform(v, x -> CAST(round(x * 127 / mx)"
        " AS BIGINT)) AS qv FROM mxx)",
        f"sub AS (SELECT vec_id, gm.m AS m, list_slice(qv, CAST(gm.m*{d}+1 AS BIGINT),"
        f" CAST(gm.m*{d}+{d} AS BIGINT)) AS s"
        f" FROM qz, unnest(CAST(range(0, {m}) AS BIGINT[])) AS gm(m))",
        "seeds AS (SELECT vec_id, CAST(row_number() OVER (ORDER BY vec_id) - 1"
        f" AS BIGINT) AS cid FROM qz ORDER BY vec_id LIMIT {k})",
        "c0 AS (SELECT b.m, seeds.cid, b.s AS c FROM sub b JOIN seeds USING (vec_id))",
    ]
    for it in range(1, iters + 1):
        prev = f"c{it - 1}"
        parts += [
            f"a{it} AS (SELECT vec_id, m, s, cid FROM ("
            f" SELECT p.vec_id, p.m, p.s, c.cid,"
            f" row_number() OVER (PARTITION BY p.vec_id, p.m ORDER BY"
            f" list_reduce(list_transform(list_zip(p.s, c.c),"
            f" z -> (z[1]-z[2])*(z[1]-z[2])), (a, x) -> a+x), c.cid) AS rn"
            f" FROM sub p JOIN {prev} c ON p.m = c.m) z WHERE rn = 1)",
            f"u{it} AS (SELECT m, cid, gj.j AS j, s[gj.j] AS x FROM a{it},"
            f" unnest(CAST(range(1, {d + 1}) AS BIGINT[])) AS gj(j))",
            f"s{it} AS (SELECT m, cid, j,"
            f" (sum(x) + 128*count(*)) // count(*) - 128 AS cx, count(*) AS n"
            f" FROM u{it} GROUP BY m, cid, j)",
            f"c{it} AS (SELECT m, cid, list(cx ORDER BY j) AS c, min(n) AS n"
            f" FROM s{it} GROUP BY m, cid)",
        ]
    return "WITH " + ",\n".join(parts)


def pq_codebook_oracle_sql(m: int = 8, k: int = 16, d: int = 8, iters: int = 2) -> str:
    """q239 oracle: the trained codebook's exact moments."""
    return (
        _pq_oracle_ctes(m, k, d, iters)
        + f"""
    SELECT CAST(m AS BIGINT) AS m, CAST(cid AS BIGINT) AS cid,
           CAST(n AS BIGINT) AS n,
           CAST(list_reduce(c, (a, x) -> a + x) AS BIGINT) AS c_sum,
           CAST(list_reduce(list_transform(c, x -> x * x), (a, x) -> a + x)
                AS BIGINT) AS c_sqsum
    FROM c{iters}
    """
    )


def _pq_scored_ctes(m: int, k: int, d: int, iters: int, query_pred: str) -> str:
    """CTE chain through ``scored``: encode the corpus with the final
    codebook, build the per-query ADC table, sum M lookups per pair."""
    final = f"c{iters}"
    return (
        _pq_oracle_ctes(m, k, d, iters)
        + f""",
    enc AS (SELECT vec_id, m, cid FROM (
      SELECT p.vec_id, p.m, c.cid,
             row_number() OVER (PARTITION BY p.vec_id, p.m ORDER BY
               list_reduce(list_transform(list_zip(p.s, c.c),
                 z -> (z[1]-z[2])*(z[1]-z[2])), (a, x) -> a+x), c.cid) AS rn
      FROM sub p JOIN {final} c ON p.m = c.m) z WHERE rn = 1),
    qtab AS (SELECT q.vec_id AS query_id, c.m, c.cid,
                    list_reduce(list_transform(list_zip(q.s, c.c),
                      z -> (z[1]-z[2])*(z[1]-z[2])), (a, x) -> a+x) AS dist
             FROM sub q JOIN {final} c ON q.m = c.m WHERE {query_pred}),
    scored AS (SELECT t.query_id, e.vec_id AS neighbor_id,
                      sum(t.dist) AS adc
               FROM enc e JOIN qtab t ON e.m = t.m AND e.cid = t.cid
               WHERE e.vec_id <> t.query_id
               GROUP BY t.query_id, e.vec_id)"""
    )


def pq_adc_oracle_sql(
    m: int = 8,
    k: int = 16,
    d: int = 8,
    iters: int = 2,
    topk: int = 10,
    query_pred: str = "q.vec_id % 100 = 0",
) -> str:
    """q240 oracle: ADC top-k, rank by (adc_dist asc, neighbor_id asc)."""
    return (
        _pq_scored_ctes(m, k, d, iters, query_pred)
        + f"""
    SELECT query_id, neighbor_id, CAST(adc AS BIGINT) AS adc_dist,
           CAST(rk AS BIGINT) AS rank
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id
            ORDER BY adc, neighbor_id) AS rk FROM scored) t
    WHERE rk <= {topk}
    """
    )


def pq_recall_oracle_sql(
    m: int = 8,
    k: int = 16,
    d: int = 8,
    iters: int = 2,
    topk: int = 10,
    query_pred: str = "q.vec_id % 100 = 0",
) -> str:
    """q241 oracle: ADC top-k ∩ exact int8-L2 top-k per query."""
    return (
        _pq_scored_ctes(m, k, d, iters, query_pred)
        + f""",
    abest AS (SELECT query_id, neighbor_id
              FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                      ORDER BY adc, neighbor_id) AS rk FROM scored) t
              WHERE rk <= {topk}),
    ex AS (SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
                  list_reduce(list_transform(list_zip(q.qv, n.qv),
                    z -> (z[1]-z[2])*(z[1]-z[2])), (a, x) -> a+x) AS dist
           FROM qz n CROSS JOIN (SELECT * FROM qz q WHERE {query_pred}) q
           WHERE n.vec_id <> q.vec_id),
    ebest AS (SELECT query_id, neighbor_id
              FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                      ORDER BY dist, neighbor_id) AS rk FROM ex) t
              WHERE rk <= {topk}),
    hits AS (SELECT query_id, count(*) AS n_hits
             FROM ebest JOIN abest USING (query_id, neighbor_id)
             GROUP BY query_id)
    SELECT q.vec_id AS query_id,
           CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
           CAST(COALESCE(h.n_hits, 0) AS DOUBLE) / {float(topk)} AS recall
    FROM (SELECT vec_id FROM qz q WHERE {query_pred}) q
    LEFT JOIN hits h ON h.query_id = q.vec_id
    """
    )
