"""Round-9 second wave (q220-q226): the similarity-search scale path
completed end-to-end — sketch (q220), plan (q222), measure (q223) —
plus the audio half of the multimodal feature-extract tier (q221) and
two curation completions: the temperature sampling plan (q224) and
the LM-scored quality filter (q225) — and the embedding-centroid
drift monitor (q226, exact fixed-point integer sums).

- q220: Johnson-Lindenstrauss ±1 sign projection of the embedding
  column (similarity.jl_project) — the 4× dimensionality cut that
  ships to the ANN index instead of the full-width vectors; map-only,
  deterministic md5-derived matrix, bit-exact oracle.
- q221: per-frame audio features (multimodal.audio_frame_features) —
  RMS-proxy Σ|s| / power Σs² / zero crossings read back off REAL
  decoded RIFF bytes, closed-form oracle in the id (q219's recipe on
  the second modality).
- q222: MinHash-LSH banding planner (diagnostics.lsh_band_plan) — the
  full (r, b) S-curve frontier with a recommended layout, fold-exact
  powers, the recall/false-positive companion to the q212 candidate-
  volume pre-flight.
- q223: ANN recall@10 of the IVF index vs exact brute force
  (similarity.ann_recall_at_k) — the acceptance gate a probe budget
  must pass before an IVF layout serves the corpus; composes the two
  already-oracled search paths and measures their per-query overlap.
- q224: temperature-based domain rebalancing (curation.temperature_mix)
  — share_d ∝ p_d^0.5 integer sampling plan via IEEE-exact sqrt and
  largest-remainder apportionment (targets sum to the budget exactly).
- q225: CCNet-style LM quality filter (curation.lm_quality_filter) —
  the corpus's own bigram LM scores every doc (q117's signal) and an
  exact cumulative-count decile cut drops the bottom tenth.

Determinism: q220/q222 are pure IEEE folds from identical literals;
q221 is all-integer; q223 joins two deterministic rank sets and ends
in one small-integer division; q224 is sqrt + sorted-fold + integer
apportionment; q225 cuts on the LM's 6-dp-rounded scores.

Registered after the 50-spec driver window; first driver rows land
per the standing rotation (queries/__init__.py r10 plan — round-born
specs take first-round priority; locked meanwhile by
tests/test_oracle_parity*.py at two SFs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..operators.curation import (
    lm_quality_filter,
    lm_quality_filter_oracle_sql,
    temperature_mix,
    temperature_mix_oracle_sql,
)
from ..operators.diagnostics import lsh_band_plan, lsh_band_plan_oracle_sql
from ..operators.drift import embedding_drift, embedding_drift_oracle_sql
from ..operators.multimodal import audio_frame_features
from ..operators.similarity import (
    ann_recall_at_k,
    jl_project,
    jl_project_oracle_sql,
)
from .base import query

_DOT = "list_reduce(list_transform(list_zip({a}, {b}), x -> x[1]*x[2]), (acc, x) -> acc + x)"
_NORM = "sqrt(list_reduce(list_transform({a}, x -> x*x), (acc, x) -> acc + x))"


@query(
    "q220_jl_projection",
    oracle=jl_project_oracle_sql("SELECT vec_id, embedding FROM embeddings"),
    doc="Johnson-Lindenstrauss ±1 sign projection 64→16 — the "
    "dimensionality sketch that feeds the ANN index; map-only, "
    "deterministic md5 matrix, bit-exact fold",
    tags=("llmops", "similarity"),
)
def q220(spark: SparkSession, sf: str) -> DataFrame:
    return jl_project(load(spark, sf, "embeddings"), in_dim=64, out_dim=16)


@query(
    "q221_audio_frame_features",
    oracle="""
    WITH ids AS (SELECT doc_id, 512 + doc_id % 512 AS n FROM documents),
    s AS (
      SELECT doc_id, t.t AS t,
             ((doc_id + t.t) * 257) % 32768 - 16384 AS v
      FROM ids, unnest(CAST(range(0, n) AS BIGINT[])) AS t(t)),
    z AS (
      SELECT doc_id, t // 256 AS frame_id, v,
             CASE WHEN t % 256 > 0
                  AND ((((doc_id + t - 1) * 257) % 32768 - 16384 < 0) <> (v < 0))
                  THEN 1 ELSE 0 END AS zc
      FROM s)
    SELECT doc_id, CAST(frame_id AS BIGINT) AS frame_id,
           CAST(count(*) AS BIGINT) AS n_samples,
           CAST(sum(abs(v)) AS BIGINT) AS sum_abs,
           CAST(sum(v * v) AS BIGINT) AS sum_sq,
           CAST(sum(zc) AS BIGINT) AS zero_crossings
    FROM z GROUP BY doc_id, frame_id
    """,
    doc="real per-frame audio feature extraction: Σ|s|, Σs², zero "
    "crossings off decoded PCM bytes — closed-form oracle, partial "
    "last frames exercised",
    tags=("llmops", "multimodal"),
)
def q221(spark: SparkSession, sf: str) -> DataFrame:
    return audio_frame_features(
        load(spark, sf, "documents").select("doc_id"), frame=256
    )


@query(
    "q222_lsh_band_plan",
    oracle=lsh_band_plan_oracle_sql(n_hashes=128, threshold=0.8),
    doc="MinHash-LSH banding planner: full (r, b) S-curve frontier for "
    "a 128-hash signature with fold-exact powers and a recommended "
    "steepest-shoulder layout",
    tags=("llmops", "dedup", "diagnostics"),
)
def q222(spark: SparkSession, sf: str) -> DataFrame:
    return lsh_band_plan(spark, n_hashes=128, threshold=0.8)


@query(
    "q223_ann_recall",
    oracle=f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    n AS (SELECT vec_id, v, {_NORM.format(a='v')} AS vn FROM e),
    c AS (SELECT vec_id AS centroid_id, v AS cv, vn AS cn FROM n WHERE vec_id % 50 = 0),
    q AS (SELECT vec_id AS query_id, v AS qv, vn AS qn FROM n WHERE vec_id % 100 = 0),
    brute AS (
      SELECT query_id, neighbor_id FROM (
        SELECT q.query_id, n.vec_id AS neighbor_id,
               row_number() OVER (PARTITION BY q.query_id
                 ORDER BY {_DOT.format(a='q.qv', b='n.v')} / (q.qn * n.vn) DESC, n.vec_id) AS rk
        FROM n, q WHERE n.vec_id <> q.query_id) t WHERE rk <= 10),
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
    ivf AS (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, a.vec_id AS neighbor_id,
               row_number() OVER (PARTITION BY query_id
                 ORDER BY {_DOT.format(a='p.qv', b='a.vv')} / (p.qn * a.vn) DESC, a.vec_id) AS rk
        FROM probe p JOIN assign a USING (centroid_id)
        WHERE a.vec_id <> p.query_id) t WHERE rk <= 10),
    hits AS (
      SELECT b.query_id, CAST(count(*) AS BIGINT) AS n_hits
      FROM brute b JOIN ivf USING (query_id, neighbor_id)
      GROUP BY b.query_id)
    SELECT q.query_id,
           CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
           CAST(coalesce(h.n_hits, 0) AS DOUBLE) / 10.0 AS recall
    FROM q LEFT JOIN hits h USING (query_id)
    """,
    doc="recall@10 of the IVF index vs exact brute force per query — "
    "the acceptance gate a probe budget passes before serving the "
    "corpus",
    tags=("llmops", "similarity", "evaluation"),
)
def q223(spark: SparkSession, sf: str) -> DataFrame:
    e = load(spark, sf, "embeddings")
    return ann_recall_at_k(
        e,
        queries=e.filter(F.col("vec_id") % 100 == 0),
        centroids=e.filter(F.col("vec_id") % 50 == 0),
        k=10,
        n_probe=1,
    )


@query(
    "q224_temperature_mix",
    oracle=temperature_mix_oracle_sql("documents", total_budget=10_000),
    doc="temperature-0.5 domain rebalancing: sqrt-weighted shares and "
    "largest-remainder integer targets summing exactly to the budget — "
    "the multilingual-LM sampling plan",
    tags=("llmops", "curation"),
)
def q224(spark: SparkSession, sf: str) -> DataFrame:
    return temperature_mix(
        load(spark, sf, "documents"), domain_col="lang", total_budget=10_000
    )


@query(
    "q225_lm_quality_filter",
    oracle=lm_quality_filter_oracle_sql("documents"),
    doc="model-based quality filter: corpus bigram-LM scores with an "
    "exact bottom-decile cut — the filtering operator q117's signal "
    "implies",
    tags=("llmops", "curation", "text"),
)
def q225(spark: SparkSession, sf: str) -> DataFrame:
    return lm_quality_filter(load(spark, sf, "documents"))


@query(
    "q226_embedding_drift",
    oracle=embedding_drift_oracle_sql(
        "SELECT * FROM embeddings WHERE vec_id % 2 = 0",
        "SELECT * FROM embeddings WHERE vec_id % 2 = 1",
    ),
    doc="per-label embedding-centroid drift between two corpus halves: "
    "cosine + norm ratio off exact fixed-point integer sums — the "
    "encoder/corpus shift monitor",
    tags=("llmops", "similarity", "drift"),
)
def q226(spark: SparkSession, sf: str) -> DataFrame:
    e = load(spark, sf, "embeddings")
    return embedding_drift(
        e.filter(F.col("vec_id") % 2 == 0),
        e.filter(F.col("vec_id") % 2 == 1),
    )


# q227: tokenizer fertility by language — tokens-per-word per lang
# under the corpus's own learned BPE (q213's counts joined back to
# the language column): THE readout a multilingual vocabulary
# decision is made from (a language with fertility >> corpus mean is
# under-served by the merge table and needs more vocab mass — the
# q194 OOV view from the compression side). Exact integer sums, one
# division; the doc_id join is co-derived from the same scan.
from ..operators.textstats import (  # noqa: E402
    bpe_token_counts,
    bpe_token_counts_oracle_sql,
)

_FERTILITY_COUNTS = bpe_token_counts_oracle_sql(
    "SELECT doc_id, text FROM documents"
)


@query(
    "q227_tokenizer_fertility",
    oracle=f"""
    WITH counts AS ({_FERTILITY_COUNTS})
    SELECT d.lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(c.n_words) AS BIGINT) AS total_words,
           CAST(sum(c.n_bpe_tokens) AS BIGINT) AS total_bpe_tokens,
           CAST(sum(c.n_bpe_tokens) AS DOUBLE) / CAST(sum(c.n_words) AS DOUBLE)
             AS fertility
    FROM counts c JOIN documents d USING (doc_id)
    GROUP BY d.lang
    """,
    doc="BPE tokens-per-word by language under the corpus's learned "
    "merges — the fertility readout multilingual vocab budgets are "
    "set from",
    tags=("llmops", "text"),
)
def q227(spark: SparkSession, sf: str) -> DataFrame:
    docs = load(spark, sf, "documents")
    counts = bpe_token_counts(docs, k_merges=3)
    return (
        counts.join(docs.select("doc_id", "lang"), "doc_id")
        .groupBy("lang")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_words").cast("long").alias("total_words"),
            F.sum("n_bpe_tokens").cast("long").alias("total_bpe_tokens"),
        )
        .select(
            "lang",
            "n_docs",
            "total_words",
            "total_bpe_tokens",
            (
                F.col("total_bpe_tokens").cast("double")
                / F.col("total_words").cast("double")
            ).alias("fertility"),
        )
    )


# q228: cluster representative selection — the step AFTER q68's
# clustering: keep the RICHEST member of every near-dup cluster
# (distinct-token count, then char length, then id), not the min-id
# keeper. The oracle reuses q68's recursive-CTE cluster mirror
# (imported from llmops — same fragments, same fixpoint) and adds the
# q36-exact integer metrics + the same ranking window.
from .llmops import _SHINGLES_CTE, _minhash_bands_sql  # noqa: E402


@query(
    "q228_cluster_representatives",
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
      SELECT r.node, e.b FROM reach r JOIN edges e ON e.a = r.x),
    lab AS (SELECT node AS doc_id, min(x) AS cluster_id FROM reach GROUP BY node),
    m AS (
      SELECT doc_id,
             CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
               AS n_unique_tokens,
             CAST(length(text) AS BIGINT) AS n_chars
      FROM documents),
    jm AS (SELECT lab.doc_id, cluster_id, n_unique_tokens, n_chars
           FROM lab JOIN m USING (doc_id))
    SELECT doc_id, cluster_id, n_unique_tokens, n_chars,
           CAST(count(*) OVER (PARTITION BY cluster_id) AS BIGINT)
             AS cluster_size,
           row_number() OVER (PARTITION BY cluster_id
             ORDER BY n_unique_tokens DESC, n_chars DESC, doc_id ASC) = 1
             AS is_representative
    FROM jm
    """,
    doc="keep the richest member of every near-dup cluster (distinct "
    "tokens, chars, id tie-break) — the selection step after q68's "
    "clustering, all-integer keys",
    tags=("llmops", "dedup", "curation"),
)
def q228(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators import dedup

    docs = load(spark, sf, "documents")
    pairs = dedup.minhash_lsh_pairs(docs, threshold=0.8).select("doc_a", "doc_b")
    # minhash_lsh_pairs emits one verified row per (doc_a, doc_b) —
    # unique by construction, so CC may skip its edge dedup exchange
    labels = dedup.connected_components(
        pairs, docs.select("doc_id"), edges_unique=True
    )
    return dedup.select_cluster_representatives(docs, labels)


# q229: recall@10 of brute-force search IN SKETCH SPACE vs full space
# — the direct price of the JL 64→16 cut on search quality, isolated
# from index approximation (q223 prices the IVF probe budget; q229
# prices the sketch; together they gate the sketch+index serving
# stack). The oracle rebuilds the sketch arrays from DuckDB's own md5
# signs (the q220 independence contract) and replays both searches.
def _jl_comp_sql(k: int, vec: str, in_dim: int = 64, out_dim: int = 16) -> str:
    import math

    scale = repr(1.0 / math.sqrt(out_dim))
    return (
        f"{scale} * list_reduce(list_transform(range(0, {in_dim}), "
        f"j -> {vec}[j+1] * (CASE WHEN substr(md5('jl|' || CAST(j AS VARCHAR) "
        f"|| '|{k}'), 1, 1) IN ('0','1','2','3','4','5','6','7') "
        f"THEN 1.0 ELSE -1.0 END)), (a, b) -> a + b)"
    )


_SKETCH_ARRAY = "[" + ", ".join(_jl_comp_sql(k, "v") for k in range(16)) + "]"


@query(
    "q229_sketch_recall",
    oracle=f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    nf AS (SELECT vec_id, v, {_NORM.format(a='v')} AS vn FROM e),
    qf AS (SELECT vec_id AS query_id, v AS qv, vn AS qn FROM nf WHERE vec_id % 100 = 0),
    full_topk AS (
      SELECT query_id, neighbor_id FROM (
        SELECT qf.query_id, nf.vec_id AS neighbor_id,
               row_number() OVER (PARTITION BY qf.query_id
                 ORDER BY {_DOT.format(a='qf.qv', b='nf.v')} / (qf.qn * nf.vn) DESC, nf.vec_id) AS rk
        FROM nf, qf WHERE nf.vec_id <> qf.query_id) t WHERE rk <= 10),
    sk AS (SELECT vec_id, {_SKETCH_ARRAY} AS s FROM e),
    ns AS (SELECT vec_id, s, {_NORM.format(a='s')} AS sn FROM sk),
    qs AS (SELECT vec_id AS query_id, s AS qsv, sn AS qsn FROM ns WHERE vec_id % 100 = 0),
    sk_topk AS (
      SELECT query_id, neighbor_id FROM (
        SELECT qs.query_id, ns.vec_id AS neighbor_id,
               row_number() OVER (PARTITION BY qs.query_id
                 ORDER BY {_DOT.format(a='qs.qsv', b='ns.s')} / (qs.qsn * ns.sn) DESC, ns.vec_id) AS rk
        FROM ns, qs WHERE ns.vec_id <> qs.query_id) t WHERE rk <= 10),
    hits AS (
      SELECT f.query_id, CAST(count(*) AS BIGINT) AS n_hits
      FROM full_topk f JOIN sk_topk USING (query_id, neighbor_id)
      GROUP BY f.query_id)
    SELECT q.query_id,
           CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
           CAST(coalesce(h.n_hits, 0) AS DOUBLE) / 10.0 AS recall
    FROM qf q LEFT JOIN hits h USING (query_id)
    """,
    doc="recall@10 of brute-force search in JL-sketch space vs full "
    "space — the measured price of the 64→16 cut, isolated from index "
    "approximation",
    tags=("llmops", "similarity", "evaluation"),
)
def q229(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.similarity import sketch_recall_at_k

    e = load(spark, sf, "embeddings")
    return sketch_recall_at_k(
        e, queries=e.filter(F.col("vec_id") % 100 == 0), k=10
    )
