"""Round-8 specs (q158+): model-evaluation analytics, scale
diagnostics, graph/retrieval additions and two further TPC-H shapes —
the "score the scorer" layer (AUC / lift / threshold sweep / kappa /
NDCG) a training-data pipeline needs once classifiers and rankers
start gating the corpus, plus the join-key skew profiler you run
BEFORE committing a 100 TB join.

Registered AFTER the 50-spec driver window (queries/__init__.py), so
they ship on repo-oracle evidence this round and take their guaranteed
first-round slots in the r9 window per the standing rotation policy.

Determinism: the shared contract (operators/evaluation.py module
docstring) — BIGINT cores, one final IEEE division per double, literal
log2 discounts for NDCG, NULLIF guards mirrored on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load
from ..operators import textstats
from ..operators.evaluation import (
    cohens_kappa,
    cohens_kappa_oracle_sql,
    decile_lift,
    decile_lift_oracle_sql,
    ndcg_at_k,
    ndcg_oracle_sql,
    roc_auc_by,
    roc_auc_oracle_sql,
    threshold_metrics,
    threshold_metrics_oracle_sql,
)
from .base import query
from .llmops import _lang_id_sql

# orders with an exact-cents score and the binary "order reached final
# status" outcome — the running classifier-evaluation example
_ORDERS_SCORED_SQL = """
    SELECT o_orderpriority,
           CAST(o_orderstatus = 'F' AS INTEGER) AS is_final,
           CAST(round(o_totalprice * 100) AS BIGINT) AS cents
    FROM orders
"""


def _orders_scored(spark: SparkSession, sf: str) -> DataFrame:
    o = load(spark, sf, "orders")
    return o.select(
        "o_orderpriority",
        (F.col("o_orderstatus") == "F").cast("int").alias("is_final"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )


@query(
    "q158_roc_auc",
    oracle=roc_auc_oracle_sql(
        _ORDERS_SCORED_SQL, "o_orderpriority", "is_final", "cents"
    ),
    doc="exact per-segment ROC-AUC of order value predicting final "
    "status (midrank identity over DISTINCT (segment, score) values "
    "— never raw-row ranks)",
    tags=("evaluation", "stats"),
)
def q158(spark: SparkSession, sf: str) -> DataFrame:
    return roc_auc_by(
        _orders_scored(spark, sf), "o_orderpriority", "is_final", "cents"
    )


@query(
    "q159_decile_lift",
    oracle=decile_lift_oracle_sql(_ORDERS_SCORED_SQL, "cents", "is_final"),
    doc="decile gains/lift table for the order-value score (exact "
    "order-statistic cuts, not ntile — tie handling is deterministic)",
    tags=("evaluation", "stats"),
)
def q159(spark: SparkSession, sf: str) -> DataFrame:
    return decile_lift(_orders_scored(spark, sf), "cents", "is_final")


_THRESHOLDS = (1_000_000, 5_000_000, 10_000_000, 20_000_000, 40_000_000)


@query(
    "q160_threshold_metrics",
    oracle=threshold_metrics_oracle_sql(
        _ORDERS_SCORED_SQL, "cents", "is_final", _THRESHOLDS
    ),
    doc="precision/recall/F1 sweep over 5 literal score thresholds — "
    "ONE wide aggregate over ONE scan, then a 1-row unpivot",
    tags=("evaluation", "stats"),
)
def q160(spark: SparkSession, sf: str) -> DataFrame:
    return threshold_metrics(
        _orders_scored(spark, sf), "cents", "is_final", _THRESHOLDS
    )


@query(
    "q161_cohens_kappa",
    oracle=cohens_kappa_oracle_sql(
        f"SELECT p.pred_lang AS pred_lang, d.lang AS lang "
        f"FROM ({_lang_id_sql()}) p JOIN documents d ON p.doc_id = d.doc_id",
        "pred_lang",
        "lang",
    ),
    doc="Cohen's kappa of the engine's own language-ID (q37 operator) "
    "against the labeled lang column — chance-corrected agreement, "
    "BIGINT core off one C x C contingency frame",
    tags=("evaluation", "stats", "text"),
)
def q161(spark: SparkSession, sf: str) -> DataFrame:
    docs = load(spark, sf, "documents")
    pred = textstats.language_id(docs)
    paired = pred.join(docs.select("doc_id", "lang"), "doc_id")
    return cohens_kappa(paired, "pred_lang", "lang")


@query(
    "q162_ndcg",
    oracle=ndcg_oracle_sql(
        """
        SELECT o.o_orderpriority, o.o_orderkey,
               CAST(round(o.o_totalprice * 100) AS BIGINT) AS cents,
               li.n_items
        FROM orders o
        JOIN (SELECT l_orderkey, CAST(count(*) AS BIGINT) AS n_items
              FROM lineitem GROUP BY 1) li
          ON li.l_orderkey = o.o_orderkey
        """,
        "o_orderpriority",
        "o_orderkey",
        "cents",
        "n_items",
        k=10,
    ),
    doc="NDCG@10 per priority segment: does order value rank "
    "multi-item orders on top (literal 1/log2 discounts, integer "
    "pivot — no float sum across rows)",
    tags=("evaluation", "stats"),
)
def q162(spark: SparkSession, sf: str) -> DataFrame:
    o = load(spark, sf, "orders").select(
        "o_orderpriority",
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    li = (
        load(spark, sf, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.count("*").alias("n_items"))
    )
    df = o.join(li, o.o_orderkey == li.l_orderkey).drop("l_orderkey")
    return ndcg_at_k(df, "o_orderpriority", "o_orderkey", "cents", "n_items", k=10)


# -- scale diagnostics / graph / retrieval / tpch -----------------------------
from ..operators.diagnostics import key_skew_oracle_sql, key_skew_profile
from ..operators.graph import triangle_count, triangle_count_oracle_sql
from ..operators.retrieval import bm25_oracle_sql, bm25_topk, rrf_fuse, rrf_oracle_sql


@query(
    "q163_key_skew_profile",
    oracle=key_skew_oracle_sql("SELECT user_id FROM events", "user_id"),
    doc="join-key skew profile of events.user_id: top heavy keys, "
    "skew ratio vs uniform, exact p50/p99 of the per-key count "
    "distribution, and the recommended deterministic salt factor "
    "(one scan; everything downstream is key-cardinality bounded)",
    tags=("diagnostics", "scale"),
)
def q163(spark: SparkSession, sf: str) -> DataFrame:
    ev = load(spark, sf, "events").select("user_id")
    return key_skew_profile(ev, "user_id", target_partitions=32, top_n=10)


@query(
    "q164_triangle_count",
    oracle=triangle_count_oracle_sql(
        """
        SELECT a.l_partkey AS src, b.l_partkey AS dst
        FROM lineitem a
        JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        JOIN part pa ON pa.p_partkey = a.l_partkey AND pa.p_size >= 40
        JOIN part pb ON pb.p_partkey = b.l_partkey AND pb.p_size >= 40
        """,
        top_n=20,
    ),
    doc="degree-oriented triangle counting over the large-part "
    "co-purchase graph (induced subgraph, scales with SF): top-20 vertices by participation + "
    "global count — wedges only ever fan out from low-degree "
    "endpoints, so celebrity hubs never explode the join",
    tags=("graph", "scale"),
)
def q164(spark: SparkSession, sf: str) -> DataFrame:
    return triangle_count(_copurchase_edges(spark, sf), "src", "dst", top_n=20)


def _copurchase_edges(spark: SparkSession, sf: str) -> DataFrame:
    """Large-size parts bought together in one order — the shared
    graph input for q164/q168/q169 (canonical src < dst; per-order
    fan-out bounded by basket size). The p_size >= 40 vertex filter is
    an INDUCED SUBGRAPH — a fixed catalog fraction, so edge counts and
    graph density scale proportionally at every SF (a support-count
    threshold does not: pair-repetition frequency collapses as the
    catalog grows). It keeps the graph-analytics specs meaningful
    without making every bench run pay for the full random-basket
    graph's ~|V|·deg² wedge volume."""
    p = (
        load(spark, sf, "part")
        .where(F.col("p_size") >= 40)
        .select("p_partkey")
    )
    li = load(spark, sf, "lineitem").select("l_orderkey", "l_partkey")
    lp = li.join(F.broadcast(p), li.l_partkey == p.p_partkey).select(
        "l_orderkey", "l_partkey"
    )
    a = lp.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("src"))
    b = lp.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("dst"))
    return a.join(b, "ok").where(F.col("src") < F.col("dst")).select("src", "dst")


_COPURCHASE_EDGES_SQL = """
        SELECT a.l_partkey AS src, b.l_partkey AS dst
        FROM lineitem a
        JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        JOIN part pa ON pa.p_partkey = a.l_partkey AND pa.p_size >= 40
        JOIN part pb ON pb.p_partkey = b.l_partkey AND pb.p_size >= 40
        """


_RRF_TERMS = ("spark", "join", "window", "hash")


@query(
    "q165_rrf_fusion",
    oracle=rrf_oracle_sql(
        f"""
        SELECT doc_id AS id,
               row_number() OVER (ORDER BY bm25 DESC, doc_id ASC) AS rank
        FROM ({bm25_oracle_sql(_RRF_TERMS, k=50)})
        """,
        """
        SELECT id, rank FROM (
          SELECT doc_id AS id,
                 row_number() OVER (ORDER BY n_chars DESC, doc_id ASC) AS rank
          FROM documents
        ) WHERE rank <= 50
        """,
        k=60,
        top_n=20,
    ),
    doc="reciprocal-rank fusion of the BM25 lexical ranking with a "
    "length prior: only RANKS cross the source boundary (no score "
    "calibration); the fusion join runs on two top-50 frames, never "
    "the corpus",
    tags=("retrieval", "llm"),
)
def q165(spark: SparkSession, sf: str) -> DataFrame:
    docs = load(spark, sf, "documents")
    wa = Window.orderBy(F.col("bm25").desc(), F.col("doc_id").asc())
    rank_a = bm25_topk(docs, _RRF_TERMS, k=50).select(
        "doc_id", F.row_number().over(wa).alias("rank")
    )
    wb = Window.orderBy(F.col("n_chars").desc(), F.col("doc_id").asc())
    rank_b = (
        docs.select("doc_id", "n_chars")
        .select("doc_id", F.row_number().over(wb).alias("rank"))
        .where(F.col("rank") <= 50)
    )
    return rrf_fuse(rank_a, rank_b, id_col="doc_id", k=60, top_n=20)


@query(
    "q166_tpch_q17_small_qty",
    oracle="""
    WITH li AS (
      SELECT l.l_partkey,
             CAST(round(l.l_quantity) AS BIGINT) AS qty,
             CAST(round(l.l_extendedprice * 100) AS BIGINT) AS cents
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey AND p.p_brand = 'Brand#13'
    ),
    win AS (
      SELECT qty, cents,
             sum(qty) OVER (PARTITION BY l_partkey) AS sum_qty,
             count(*) OVER (PARTITION BY l_partkey) AS cnt
      FROM li
    )
    SELECT CAST(COALESCE(sum(CASE WHEN 5 * qty * cnt < sum_qty
                                  THEN cents END), 0) AS BIGINT)
             AS small_qty_rev_cents,
           CAST(COALESCE(sum(CASE WHEN 5 * qty * cnt < sum_qty
                                  THEN 1 END), 0) AS BIGINT) AS n_lines
    FROM win
    """,
    doc="TPC-H Q17 shape (small-quantity revenue for one brand): the "
    "per-part average is an integer-exact predicate 5*qty*cnt < "
    "sum_qty over ONE windowed pass — no correlated-subquery rescan "
    "of lineitem; the brand part list rides a broadcast",
    tags=("tpch",),
)
def q166(spark: SparkSession, sf: str) -> DataFrame:
    p = (
        load(spark, sf, "part")
        .where(F.col("p_brand") == "Brand#13")
        .select("p_partkey")
    )
    li = load(spark, sf, "lineitem").select(
        "l_partkey",
        F.round("l_quantity").cast("bigint").alias("qty"),
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("cents"),
    )
    li_b = li.join(F.broadcast(p), li.l_partkey == p.p_partkey).drop("p_partkey")
    w = Window.partitionBy("l_partkey")
    win = li_b.select(
        "qty",
        "cents",
        F.sum("qty").over(w).alias("sum_qty"),
        F.count("*").over(w).alias("cnt"),
    )
    cond = 5 * F.col("qty") * F.col("cnt") < F.col("sum_qty")
    return win.agg(
        F.coalesce(F.sum(F.when(cond, F.col("cents"))), F.lit(0))
        .cast("bigint")
        .alias("small_qty_rev_cents"),
        F.coalesce(F.sum(F.when(cond, F.lit(1))), F.lit(0))
        .cast("bigint")
        .alias("n_lines"),
    )


@query(
    "q167_tpch_q18_large_volume",
    oracle="""
    WITH big AS (
      SELECT l_orderkey, CAST(round(sum(l_quantity)) AS BIGINT) AS sum_qty
      FROM lineitem GROUP BY 1
      HAVING CAST(round(sum(l_quantity)) AS BIGINT) > 300
    )
    SELECT c.c_name, o.o_custkey, o.o_orderkey,
           CAST(round(o.o_totalprice * 100) AS BIGINT) AS total_cents,
           b.sum_qty
    FROM big b
    JOIN orders o ON o.o_orderkey = b.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    ORDER BY total_cents DESC, o.o_orderkey ASC
    LIMIT 100
    """,
    doc="TPC-H Q18 shape (large-volume customers): the >300-quantity "
    "order set aggregates first and is SMALL, so it broadcasts into "
    "orders and customer — the big tables are never shuffled on the "
    "join keys",
    tags=("tpch",),
)
def q167(spark: SparkSession, sf: str) -> DataFrame:
    li = load(spark, sf, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.round(F.sum("l_quantity")).cast("bigint").alias("sum_qty"))
        .where(F.col("sum_qty") > 300)
    )
    o = load(spark, sf, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("total_cents"),
    )
    ob = o.join(F.broadcast(big), o.o_orderkey == big.l_orderkey).drop("l_orderkey")
    c = load(spark, sf, "customer").select("c_custkey", "c_name")
    res = c.join(F.broadcast(ob), c.c_custkey == ob.o_custkey).drop("c_custkey")
    return (
        res.select("c_name", "o_custkey", "o_orderkey", "total_cents", "sum_qty")
        .orderBy(F.col("total_cents").desc(), F.col("o_orderkey").asc())
        .limit(100)
    )


from ..operators.graph import (
    degree_assortativity,
    degree_assortativity_oracle_sql,
    label_propagation,
    label_propagation_oracle_sql,
)


@query(
    "q168_degree_assortativity",
    oracle=degree_assortativity_oracle_sql(_COPURCHASE_EDGES_SQL),
    doc="Newman degree assortativity of the co-purchase graph: do "
    "popular parts co-sell with popular parts? BIGINT moments over "
    "the symmetrized edge list, one double expression, zero-variance "
    "guarded to NULL",
    tags=("graph", "stats"),
)
def q168(spark: SparkSession, sf: str) -> DataFrame:
    return degree_assortativity(_copurchase_edges(spark, sf))


@query(
    "q169_label_propagation",
    oracle=f"""
    SELECT s.label, s.size, t.n_nodes, t.n_communities FROM (
      SELECT label, CAST(count(*) AS BIGINT) AS size
      FROM ({label_propagation_oracle_sql(_COPURCHASE_EDGES_SQL, iters=3)})
      GROUP BY 1
    ) s CROSS JOIN (
      SELECT CAST(count(*) AS BIGINT) AS n_nodes,
             CAST(count(DISTINCT label) AS BIGINT) AS n_communities
      FROM ({label_propagation_oracle_sql(_COPURCHASE_EDGES_SQL, iters=3)})
    ) t
    ORDER BY s.size DESC, s.label ASC LIMIT 20
    """,
    doc="deterministic synchronous label-propagation communities over "
    "the co-purchase graph (3 rounds, ties to lowest label): top-20 "
    "community sizes + global counts — the cheap first-pass "
    "clustering before modularity math",
    tags=("graph", "scale"),
)
def q169(spark: SparkSession, sf: str) -> DataFrame:
    # parts are a bounded dimension: broadcast the per-round labels so
    # the edge frame never shuffles (r16; see label_propagation)
    lab = label_propagation(
        _copurchase_edges(spark, sf), iters=3, broadcast_labels=True
    )
    sizes = lab.groupBy("label").agg(F.count("*").alias("size"))
    tot = lab.agg(
        F.count("*").alias("n_nodes"),
        F.countDistinct("label").alias("n_communities"),
    )
    return (
        sizes.orderBy(F.col("size").desc(), F.col("label").asc())
        .limit(20)
        .crossJoin(F.broadcast(tot))
    )


from ..operators.dedup import prefix_filtered_jaccard_pairs
from ..operators.dedup import prefix_filtered_jaccard_oracle_sql
from .llmops import _SHINGLES_CTE


@query(
    "q170_prefix_filter_join",
    oracle=prefix_filtered_jaccard_oracle_sql(_SHINGLES_CTE, t_num=4, t_den=5),
    doc="exact near-dup pairs (Jaccard >= 0.8) via PREFIX FILTERING: "
    "candidates only from each doc's rarest-shingle prefix + size-"
    "compatibility bound — the exact-but-pruned third point between "
    "q31's all-shared-shingle join and q32's probabilistic LSH; "
    "bit-identical output to q31 (unit-locked)",
    tags=("dedup", "scale", "llm"),
)
def q170(spark: SparkSession, sf: str) -> DataFrame:
    return prefix_filtered_jaccard_pairs(
        load(spark, sf, "documents"), t_num=4, t_den=5
    )


from ..operators.textstats import bpe_merge_oracle_sql, bpe_merge_steps


@query(
    "q171_bpe_merges",
    oracle=bpe_merge_oracle_sql("SELECT text FROM documents", k_merges=5),
    doc="first 5 BPE merge rules learned from the corpus (Sennrich-"
    "style tokenizer training on the vocabulary-frequency table — "
    "after one corpus scan every round is vocab-bounded; padded-"
    "replace application, ties to smallest pair)",
    tags=("llm", "text", "tokenizer"),
)
def q171(spark: SparkSession, sf: str) -> DataFrame:
    return bpe_merge_steps(load(spark, sf, "documents"), k_merges=5)


@query(
    "q172_tpch_q20_dominant_suppliers",
    oracle="""
    WITH sp AS (
      SELECT l.l_suppkey, l.l_partkey,
             CAST(round(sum(l.l_quantity)) AS BIGINT) AS qty_sp
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey AND p.p_name LIKE 'small%'
      GROUP BY 1, 2
    ),
    win AS (
      SELECT l_suppkey, qty_sp,
             sum(qty_sp) OVER (PARTITION BY l_partkey) AS qty_p,
             count(*) OVER (PARTITION BY l_partkey) AS n_sup
      FROM sp
    ),
    qual AS (SELECT DISTINCT l_suppkey FROM win
             WHERE qty_sp * n_sup > 2 * qty_p)
    SELECT s.s_suppkey, s.s_name
    FROM supplier s JOIN qual q ON q.l_suppkey = s.s_suppkey
    WHERE s.s_nationkey < 5
    ORDER BY s.s_suppkey
    """,
    doc="TPC-H Q20 shape (suppliers shipping >2x their fair share of "
    "a part): the nested per-part share comparison is one windowed "
    "pass over the "
    "(supplier, part) aggregate — the part totals come from the SAME "
    "frame, no second lineitem scan, no correlated subquery; the "
    "part-name filter broadcasts and pushes to the part scan",
    tags=("tpch",),
)
def q172(spark: SparkSession, sf: str) -> DataFrame:
    p = (
        load(spark, sf, "part")
        .where(F.col("p_name").startswith("small"))
        .select("p_partkey")
    )
    li = load(spark, sf, "lineitem").select("l_suppkey", "l_partkey", "l_quantity")
    sp = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.round(F.sum("l_quantity")).cast("bigint").alias("qty_sp"))
    )
    w = Window.partitionBy("l_partkey")
    qual = (
        sp.select(
            "l_suppkey",
            "qty_sp",
            F.sum("qty_sp").over(w).alias("qty_p"),
            F.count("*").over(w).alias("n_sup"),
        )
        # share > 2x the fair 1/n_sup share, as one integer inequality
        .where(F.col("qty_sp") * F.col("n_sup") > 2 * F.col("qty_p"))
        .select("l_suppkey")
        .distinct()
    )
    s = load(spark, sf, "supplier").where(F.col("s_nationkey") < 5).select(
        "s_suppkey", "s_name"
    )
    return (
        s.join(F.broadcast(qual), s.s_suppkey == qual.l_suppkey)
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )
