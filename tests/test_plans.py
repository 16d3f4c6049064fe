"""Physical-plan audits: lock in the scale properties the engine
claims (pushdown, broadcast, top-k, partial aggregation). A regression
that silently turns a broadcast join into a shuffle join or loses
parquet pushdown fails here, not at 100 TB.
"""

from __future__ import annotations

import contextlib
import io

from conftest import SF_SMOKE

from kassette_server_spark.queries import all_specs

SPECS = all_specs()


def plan(spark, name: str) -> str:
    df = SPECS[name].fn(spark, SF_SMOKE)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()



def assert_spread_map(p: str) -> None:
    """The codec-tier map plan after r14's input-width guard
    (operators/layout.py ensure_scan_parallelism): the ONLY exchange allowed is the single
    explicit width-guaranteeing spread that widens a too-narrow input
    before the Arrow-batched map. Since r16 the spread is a CONTENT-
    HASH repartition — ``hashpartitioning(xxhash64(...), N),
    REPARTITION_BY_NUM`` (deterministic under retry, no
    sort-before-repartition pass, exempt from AQE coalescing because
    the partition count is user-pinned) — with the round-robin
    spelling kept as the all-columns-unhashable fallback. Any OTHER
    hash/range exchange (a join/aggregation layout leaking in), or a
    second exchange of any kind, still fails the lock; on a real
    many-split corpus the spread is a no-op and the plan collapses
    back to the pure scan-stage map."""
    import re as _re

    assert "MapInPandas" in p
    node_ids = set(_re.findall(r"\((\d+)\) Exchange", p))
    assert len(node_ids) <= 1, node_ids
    if node_ids:
        # the detail section names the partitioning; it must be the
        # explicit spread (content-hash xxhash64 REPARTITION_BY_NUM or
        # the round-robin fallback), never a generic hash/range shuffle
        args = _re.findall(
            r"\(\d+\) Exchange\nInput[^\n]*\nArguments: ([^\n]*)", p
        )
        assert args and all(
            "RoundRobinPartitioning" in a
            or ("hashpartitioning(xxhash64(" in a and "REPARTITION_BY_NUM" in a)
            for a in args
        ), args


def test_q01_filter_and_projection_pushdown(spark):
    p = plan(spark, "q01_scan_filter")
    assert "PushedFilters:" in p
    assert "l_quantity" in p.split("PushedFilters:")[1].splitlines()[0]
    # projection pruned to the needed columns only
    read_schema = p.split("ReadSchema:")[1].splitlines()[0]
    assert "l_extendedprice" in read_schema and "l_comment" not in read_schema
    assert "l_tax" not in read_schema


def test_q02_in_between_like_pushdown(spark):
    p = plan(spark, "q02_predicates")
    pushed = p.split("PushedFilters:")[1].splitlines()[0]
    assert "In(o_orderstatus" in pushed
    assert "GreaterThanOrEqual(o_totalprice" in pushed
    assert "StringStartsWith(o_orderpriority" in pushed


def test_q04_dims_broadcast(spark):
    p = plan(spark, "q04_multiway_broadcast_join")
    assert p.count("BroadcastHashJoin") >= 2  # tree + detail sections
    assert "SortMergeJoin" not in p


def test_q08_partial_aggregation(spark):
    p = plan(spark, "q08_agg_having")
    # partial (map-side) + final HashAggregate pair
    assert p.count("HashAggregate") >= 2


def test_q14_topk_no_global_sort(spark):
    p = plan(spark, "q14_topk")
    assert "TakeOrderedAndProject" in p
    # no full Exchange+Sort of the table for a k-row answer
    assert "GlobalLimit" not in p


def test_q26_decorrelated_to_broadcast(spark):
    p = plan(spark, "q26_correlated_subquery")
    assert "BroadcastHashJoin" in p


def test_q34_queries_broadcast_corpus_not_shuffled(spark):
    """r16: the bounded query sample is a closure capture of ONE fused
    scoring kernel over the corpus scan (guide §4.2 — the crossJoin's
    per-pair HOF dot ran interpreted); the corpus still never
    shuffles — the only exchange is the |queries|·k·partitions-row
    ranking window's."""
    import re

    p = plan(spark, "q34_ann_cosine_topk")
    assert "MapInPandas" in p
    assert "CartesianProduct" not in p
    # one exchange: the ranking window's (the corpus scan feeds the
    # kernel directly)
    assert len(re.findall(r"\(\d+\) Exchange\n", p)) == 1


def test_q62_grouping_sets_single_scan_expand(spark):
    # grouping sets must compile to one Expand over one scan, never a
    # UNION ALL of per-grouping re-scans of the fact table.
    p = plan(spark, "q62_grouping_sets")
    assert "Expand" in p
    # formatted explain lists each operator twice (tree + detail section)
    assert p.count("Scan parquet") == 2
    assert "Union" not in p


def test_q63_hash_sample_no_shuffle(spark):
    # deterministic sampling is a per-row predicate: it must pipeline
    # inside the scan stage with zero exchanges.
    p = plan(spark, "q63_hash_sample")
    assert "Exchange" not in p


def test_q65_single_window_exec(spark):
    # five analytic functions over one shared spec = one Window
    # operator and one shuffle, not five.
    p = plan(spark, "q65_window_extras")
    assert p.count("Window (") == 1 and p.count("Exchange (") == 1


def test_q54_selective_dims_topk(spark):
    # TPC-H Q3 shape: pushdown of all three date/segment filters into
    # the scans, top-10 via TakeOrdered (no global sort), partial agg.
    p = plan(spark, "q54_tpch_q3_shipping_priority")
    assert "TakeOrderedAndProject" in p
    assert p.count("HashAggregate") >= 2  # partial + final
    pushed = p.split("PushedFilters:")
    assert any("c_mktsegment" in seg.splitlines()[0] for seg in pushed[1:])


def test_q55_single_agg_shuffle_constant_dims_broadcast(spark):
    # 6-way join: nation/region always broadcast; supplier broadcast is
    # UNHINTED (left to stats/AQE — at SF100k it is ~1B rows); exactly
    # one aggregation pair for the final groupBy.
    p = plan(spark, "q55_tpch_q5_local_volume")
    assert p.count("BroadcastHashJoin") >= 2
    assert p.count("HashAggregate") == 4  # partial+final, tree+detail sections


def test_q70_benchmark_set_broadcast(spark):
    # the benchmark shingle-hash set is eval-sized — must broadcast;
    # the corpus side is never collected or cross-joined.
    p = plan(spark, "q70_benchmark_contamination")
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p


def test_q72_packing_windows_per_bucket_not_global(spark):
    # the running token sum must partition by bucket (data-parallel
    # packing) — a global-order window would hashpartition on nothing
    # and serialize the corpus onto one task.
    p = plan(spark, "q72_sequence_packing")
    assert "Window" in p
    assert "hashpartitioning(bucket" in p
    assert "SinglePartition" not in p


def test_q78_mix_thresholds_broadcast_no_corpus_shuffle(spark):
    # per-domain thresholds are a handful of rows — they must reach the
    # corpus via broadcast; the documents themselves are never sort-
    # merge-joined or cartesian-joined, so the keep decision stays
    # inside the scan stage.
    p = plan(spark, "q78_domain_mix")
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p
    assert "CartesianProduct" not in p


def test_q79_shuffle_one_exchange_per_shard_sort(spark):
    # exactly one shuffle of the corpus (hashpartitioning on shard_id
    # feeding the ranking window); no global single-partition sort.
    p = plan(spark, "q79_shuffle_shards")
    assert "Window" in p
    assert "hashpartitioning(shard_id" in p
    assert "SinglePartition" not in p


def test_q80_repetition_two_aggs_no_join(spark):
    # bigram mode = explode -> two hash aggregations (both with a
    # map-side partial); per-doc constants ride through as max — no
    # join anywhere, and the shuffle key is the 8-byte xxhash64.
    p = plan(spark, "q80_repetition_filter")
    assert "Join" not in p
    assert p.count("HashAggregate") >= 4  # partial+final x two levels
    assert "xxhash64" in p


def test_q81_pii_scrub_map_only(spark):
    # redaction is a pure scan-stage expression pass: no exchange, no
    # aggregation, no Python eval.
    p = plan(spark, "q81_pii_scrub")
    assert "Exchange" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_q82_chunking_scan_stage_explode(spark):
    # the chunk table is generated inside the scan stage: one
    # Generate (explode), no exchange of the corpus.
    p = plan(spark, "q82_chunk_documents")
    assert "Generate" in p
    assert "Exchange" not in p


def test_q83_semantic_dedup_cell_join_not_allpairs(spark):
    # the pairwise stage must join ON centroid_id (work = sum cell^2),
    # never a cartesian product over the corpus. (The assignment stage
    # legitimately uses a BroadcastNestedLoopJoin: every vector scores
    # every BROADCAST centroid — that's the IVF coarse quantization,
    # linear in the corpus.)
    p = plan(spark, "q83_semantic_dedup")
    assert "CartesianProduct" not in p
    # equi-join for the pairwise stage, keyed on centroid_id
    assert "SortMergeJoin" in p or "ShuffledHashJoin" in p
    assert "Left keys" in p
    assert "centroid_id" in p.split("Left keys")[1].splitlines()[0]


def test_whole_stage_codegen_on_hot_paths(spark):
    # coercion/rule pipelines must stay inside codegen (no Python UDFs).
    # In formatted explain, '* ' prefixes mark codegen'd operators.
    # (higher-order array lambdas like q36's fall back to interpreted
    # JVM expressions — still no Python round-trip, which is the claim)
    for name in ("q18_math_fns", "q22_rules_map_hide_delete", "q36_text_quality_stats"):
        p = plan(spark, name)
        assert "* " in p, name  # at least one codegen'd operator
        assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, name


def test_q85_countmin_probe_broadcast(spark):
    """The CMS register table is broadcast for the probe — the values
    side must never shuffle toward a SortMergeJoin."""
    p = plan(spark, "q85_countmin_heavy_hitters")
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p
    # register build is map-side combined: paired HashAggregate
    assert p.count("HashAggregate") >= 2


def test_q86_bloom_probe_broadcast_no_probe_shuffle(spark):
    """Bloom bits broadcast; the (big) probe side joins map-side —
    the whole point of a pre-join filter at 100 TB."""
    p = plan(spark, "q86_bloom_membership")
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_q88_quantile_window_after_bounded_agg(spark):
    """The cumulative window runs over the <= num_bins register rows
    (post-aggregation), never over the raw input."""
    p = plan(spark, "q88_approx_quantiles")
    # bin build is map-side combined
    assert p.count("HashAggregate") >= 2
    # single Window node, fed by the bin aggregate, not the scan
    assert p.count("Window") >= 1
    assert "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p


def test_q140_point_in_time_scan_pruned_and_single_residual_join(spark):
    p = plan(spark, "q140_point_in_time_join")
    # exactly one join, carrying the residual interval condition
    assert p.count("Join") >= 1
    assert "_valid_to" in p
    # scans pruned to the three needed columns
    read_schema = p.split("ReadSchema:")[1].splitlines()[0]
    assert "o_custkey" in read_schema and "o_comment" not in read_schema


def test_q141_dataset_split_single_exchange(spark):
    """Split assignment is map-only; the only exchange is the final
    (source, split) aggregation."""
    p = plan(spark, "q141_dataset_split")
    # formatted output names each node twice (tree + detail); the tree
    # form "Exchange (" counts NODES
    assert p.count("Exchange (") == 1


def test_q143_weighted_median_no_join(spark):
    """r17: the group total rides the same grp-partitioned window as
    the cumulative sum — no join-back at all, and the only exchanges
    are the (grp, v) aggregate and the window partitioning."""
    p = plan(spark, "q143_weighted_median")
    assert "Join" not in p
    assert p.count("Exchange (") <= 2


def test_q142_pareto_local_prune_before_global_window(spark):
    """Two-phase shape: a bucket-partitioned window (local frontiers,
    input-scale work parallel by bucket) must appear BEFORE the single
    global window (output-scale)."""
    p = plan(spark, "q142_pareto_frontier")
    assert p.count("Window") >= 2
    # the local phase hashes into buckets -> an exchange on _b exists
    assert "_b" in p


def test_q144_ks_groups_broadcast_window_per_segment(spark):
    """The distinct-groups frame is broadcast (never a data-sized
    shuffle for the replicate-by-G step); the ECDF needs exactly the
    two window passes over the one (g)-partitioned exchange."""
    p = plan(spark, "q144_ks_drift")
    assert "BroadcastNestedLoopJoin Cross" in p or "BroadcastHashJoin" in p
    assert "BroadcastExchange" in p
    assert p.count("Window (") == 2  # "Window (" counts tree NODES
    # events scan pruned to the two needed columns
    read_schema = p.split("ReadSchema:")[1].splitlines()[0]
    assert "event_type" in read_schema and "props" not in read_schema


def test_q145_benford_partial_agg_and_pruned_scan(spark):
    """Digit counts partial-aggregate map-side; the lineitem scan reads
    only the price column; the 9-row probability table rides a
    broadcast."""
    p = plan(spark, "q145_benford_audit")
    assert p.count("HashAggregate") >= 2
    assert "BroadcastHashJoin" in p or "BroadcastExchange" in p
    read_schema = p.split("ReadSchema:")[1].splitlines()[0]
    assert "l_extendedprice" in read_schema and "l_comment" not in read_schema


def test_q146_theil_sen_npts_broadcast(spark):
    """The per-group point-count frame joins back broadcast; the slope
    median's window runs over the pairwise-slope frame (series-length
    bounded), partitioned per group."""
    p = plan(spark, "q146_theil_sen_trend")
    assert "BroadcastExchange" in p
    assert p.count("Window (") >= 2  # row_number + count over slopes


def test_q147_paths_window_group_limits_and_topk(spark):
    """Both rank filters compile to pre-shuffle WindowGroupLimit
    (first-8-per-session and top-50-paths), and the global top-50
    avoids a full sort via TakeOrderedAndProject."""
    p = plan(spark, "q147_session_paths")
    assert p.count("WindowGroupLimit") >= 2
    assert "TakeOrderedAndProject" in p


def test_q148_gap_fill_no_extra_window_exchange(spark):
    """The spine inherits the group-hash partitioning from its min/max
    aggregate, the observations side broadcasts, and the interpolation
    window reuses the same partitioning — exactly two exchanges (one
    per aggregate), zero for the window."""
    import re

    p = plan(spark, "q148_gap_fill")
    # count shuffle-Exchange NODES via the detail-section headers
    # ("(5) Exchange"), which unlike "Exchange (" don't also match
    # BroadcastExchange
    assert len(re.findall(r"\(\d+\) Exchange\n", p)) == 2
    assert p.count("Window (") == 1
    assert "BroadcastHashJoin LeftOuter" in p


def test_q149_mann_whitney_rank_table_broadcast(spark):
    """Ranks come from the distinct-value aggregate (value-cardinality
    bounded), broadcast back to the data — the raw rows are never
    globally sorted."""
    p = plan(spark, "q149_mann_whitney")
    assert "BroadcastHashJoin" in p
    assert p.count("Window (") == 2  # distinct-value cum + G-row scalar


def test_q150_cusum_no_join_top1_group_limit(spark):
    """Pure window pipeline: cumulative sums and the argmax top-1 need
    zero joins, and the per-group top-1 compiles to a pre-shuffle
    WindowGroupLimit."""
    p = plan(spark, "q150_cusum_changepoint")
    assert "Join" not in p
    assert "WindowGroupLimit" in p


def test_q151_affinity_totals_broadcast_no_cartesian(spark):
    p = plan(spark, "q151_type_affinity")
    assert "BroadcastExchange" in p
    assert "BroadcastNestedLoopJoin" not in p and "CartesianProduct" not in p


def test_q152_acf_lags_broadcast(spark):
    """The 7-row lag table rides a broadcast cross join; the day-shift
    alignment is an equi-join; one aggregate exchange total."""
    p = plan(spark, "q152_autocorrelation")
    assert "BroadcastNestedLoopJoin Cross" in p
    assert "BroadcastHashJoin" in p or "SortMergeJoin" in p


def test_q154_ks_binned_register_scale(spark):
    """The cumulative window runs over the G x num_bins register spine
    (post-aggregation), never over raw rows; the occupied-bin spine is
    broadcast; events scan pruned."""
    p = plan(spark, "q154_ks_drift_binned")
    assert "BroadcastNestedLoopJoin Cross" in p or "BroadcastHashJoin" in p
    assert p.count("HashAggregate") >= 4  # per + tot partial/final pairs
    read_schema = p.split("ReadSchema:")[1].splitlines()[0]
    assert "value" in read_schema and "props" not in read_schema


def test_q155_contract_single_pass_row_rules(spark):
    """All six row rules share ONE aggregate over one scan (conditional
    sums, map-side combined); only the uniqueness rule adds its own
    keyed aggregate — so exactly two parquet scans total and no joins
    of the fact table."""
    p = plan(spark, "q155_data_contract")
    # formatted explain lists each operator twice (tree + detail)
    assert p.count("Scan parquet") == 4  # 2 scans x 2 listings
    assert "Join" not in p  # no join anywhere — union of two aggregates
    assert p.count("HashAggregate") >= 4


def test_q156_share_shift_broadcast_totals_topk(spark):
    """One conditional-sum aggregate per part, 1-row totals broadcast,
    top-20 via pre-shuffle WindowGroupLimit — no second scan-sized
    shuffle, no cartesian beyond the 1-row totals join."""
    p = plan(spark, "q156_share_shift")
    assert "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p
    assert "WindowGroupLimit" in p or "TakeOrderedAndProject" in p
    read_schema = p.split("ReadSchema:")[1].splitlines()[0]
    assert "l_partkey" in read_schema and "l_comment" not in read_schema


# -- round 8: evaluation family ----------------------------------------------
def test_q158_auc_ranks_over_distinct_values(spark):
    """Ranks come from the DISTINCT (segment, score) aggregate, the
    midrank window shares its Exchange with the final per-segment
    aggregate (2 shuffles total), and the orders scan is pruned to the
    three needed columns."""
    import re

    p = plan(spark, "q158_roc_auc")
    assert len(re.findall(r"\(\d+\) Exchange\n", p)) == 2
    assert p.count("Window (") == 1
    read_schema = p.split("ReadSchema:")[1].splitlines()[0]
    assert "o_totalprice" in read_schema and "o_orderdate" not in read_schema


def test_q159_decile_lift_single_base_scan(spark):
    """r17: buckets are per-row arithmetic off the cumulative window
    and the total rides the same global window — ONE linear pipeline:
    one base scan, no joins, no checkpoint."""
    p = plan(spark, "q159_decile_lift")
    assert p.count("Scan parquet") == 2  # one node: tree + detail
    assert "Join" not in p


def test_q160_threshold_metrics_one_scan_one_shuffle(spark):
    """The whole threshold sweep is ONE wide aggregate (single
    Exchange of one partial-agg row) followed by a 1-row unpivot
    (Generate) — no join, no per-threshold re-scan."""
    import re

    p = plan(spark, "q160_threshold_metrics")
    assert p.count("Scan parquet") == 2  # 1 scan x 2 listings
    assert len(re.findall(r"\(\d+\) Exchange\n", p)) == 1
    assert "Generate" in p
    assert "Join" not in p


def test_q161_kappa_off_checkpointed_cells(spark):
    """Everything downstream of the C x C contingency aggregate runs
    off the checkpointed cells frame (Scan ExistingRDD), and the 1-row
    marginal-product frame rides a broadcast."""
    p = plan(spark, "q161_cohens_kappa")
    assert "Scan ExistingRDD" in p
    assert p.count("Scan parquet") == 0
    assert "BroadcastNestedLoopJoin" in p


def test_q162_ndcg_shared_window_exchange(spark):
    """The lineitem count aggregates then broadcast-joins to orders;
    both rank windows share ONE group-hash Exchange (second window
    re-sorts in place); the lineitem scan reads only l_orderkey."""
    import re

    p = plan(spark, "q162_ndcg")
    assert "BroadcastHashJoin" in p
    assert len(re.findall(r"\(\d+\) Exchange\n", p)) == 2  # li agg + window
    assert p.count("Window (") == 2
    schemas = [s.splitlines()[0] for s in p.split("ReadSchema:")[1:]]
    li = [s for s in schemas if "l_orderkey" in s]
    assert li and all("l_quantity" not in s for s in li)


def test_q163_skew_profile_off_checkpointed_counts(spark):
    """Everything downstream of the per-key count aggregate reads the
    checkpointed frame; the top-N compiles to TakeOrderedAndProject
    (per-partition heap, no global sort); stats/percentile frames ride
    broadcasts."""
    p = plan(spark, "q163_key_skew_profile")
    assert p.count("Scan parquet") == 0
    assert "TakeOrderedAndProject" in p
    assert "BroadcastNestedLoopJoin" in p


def test_q164_triangle_wedge_pipeline_shape(spark):
    """The un-checkpointed wedge pipeline (inspectable via
    _triangle_participation): the edge list is deduplicated once, the
    degree frame joins in, and the wedge + closing joins are plain
    equi-joins — no cartesian anywhere, no window."""
    import contextlib, io

    from kassette_server_spark.operators.graph import _triangle_participation
    from kassette_server_spark.catalog import load
    from pyspark.sql import functions as F

    li = load(spark, SF_SMOKE, "lineitem").select("l_orderkey", "l_partkey")
    a = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("src"))
    b = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("dst"))
    edges = a.join(b, "ok").where(F.col("src") < F.col("dst")).select("src", "dst")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        _triangle_participation(edges).explain("formatted")
    p = buf.getvalue()
    assert "CartesianProduct" not in p and "NestedLoop" not in p
    assert "HashAggregate" in p  # distinct + degree + participation aggs
    schemas = [s.splitlines()[0] for s in p.split("ReadSchema:")[1:]]
    assert all("l_quantity" not in s for s in schemas)
    # final plan (post-checkpoint): TakeOrdered top-N + broadcast total
    pf = plan(spark, "q164_triangle_count")
    assert "TakeOrderedAndProject" in pf and "Scan parquet" not in pf


def test_q165_rrf_joins_topk_frames_only(spark):
    """Both rank sources are top-50 frames before the fusion join; the
    final top-20 is a TakeOrdered, and the corpus text column is read
    only by the BM25 branches (the length-prior branch reads just
    doc_id + n_chars)."""
    p = plan(spark, "q165_rrf_fusion")
    assert "TakeOrderedAndProject" in p
    schemas = [s.splitlines()[0] for s in p.split("ReadSchema:")[1:]]
    assert any("n_chars" in s and "text" not in s for s in schemas)


def test_q166_q17_broadcast_brand_one_window_pass(spark):
    """The brand part list broadcasts into lineitem; the per-part
    average is ONE window pass (no correlated re-scan of lineitem:
    exactly one lineitem scan), then a single global aggregate."""
    import re

    p = plan(spark, "q166_tpch_q17_small_qty")
    assert "BroadcastHashJoin" in p
    assert p.count("Window (") == 1
    schemas = [s.splitlines()[0] for s in p.split("ReadSchema:")[1:]]
    assert sum("l_partkey" in s for s in schemas) == 1  # lineitem once
    pushed = p.split("PushedFilters:")
    assert any("p_brand" in s.splitlines()[0] for s in pushed[1:])


def test_q167_q18_big_tables_never_shuffled(spark):
    """Only the lineitem pre-aggregate shuffles; the qualifying-order
    set broadcasts into orders, the result broadcasts into customer,
    and the top-100 is a TakeOrdered."""
    import re

    p = plan(spark, "q167_tpch_q18_large_volume")
    assert len(re.findall(r"\(\d+\) Exchange\n", p)) == 1
    assert p.count("BroadcastHashJoin") == 4  # 2 join nodes x 2 listings
    assert "TakeOrderedAndProject" in p


def test_q168_assortativity_single_moment_aggregate(spark):
    """Degrees attach via two equi-joins; the moments collapse in ONE
    1-row aggregate — no window, no cartesian."""
    p = plan(spark, "q168_degree_assortativity")
    assert "CartesianProduct" not in p
    assert p.count("Window (") == 0
    schemas = [s.splitlines()[0] for s in p.split("ReadSchema:")[1:]]
    assert all("l_quantity" not in s for s in schemas)


def test_q169_lpa_off_checkpointed_labels(spark):
    """The community-size report runs off the final checkpointed label
    frame (per-round lineage truncated — the pagerank discipline);
    top-20 via TakeOrdered; totals ride a broadcast."""
    p = plan(spark, "q169_label_propagation")
    assert "Scan ExistingRDD" in p
    assert "TakeOrderedAndProject" in p
    assert "BroadcastNestedLoopJoin" in p


def test_q170_prefix_join_not_allpairs(spark):
    """Candidates come from the prefix frames (rank-filtered), never a
    cartesian; the verify joins are equi-joins on (doc, shingle)."""
    p = plan(spark, "q170_prefix_filter_join")
    assert "CartesianProduct" not in p and "NestedLoop" not in p
    # the prefix frame appears on BOTH sides of the candidate self-join
    # (same subtree listed twice); r17 attaches _df and ns as
    # count-over-windows (three Window nodes per side) instead of two
    # aggregate+join-back passes, so six Window nodes and NO
    # SortMergeJoin below the candidate self-join
    assert p.count("Window (") == 6
    # the shingle frame is checkpointed: no parquet re-scan anywhere
    assert "Scan parquet" not in p
    assert "Scan ExistingRDD" in p


def test_q171_bpe_vocab_rounds(spark):
    """Tokenizer training: one corpus scan feeds the word-count
    aggregate; every merge round runs off checkpointed vocab frames
    (Scan ExistingRDD) with the winning pair broadcast into the
    replace — no corpus re-scan per round."""
    p = plan(spark, "q171_bpe_merges")
    # each round's winner is pinned by an eager checkpoint, so the
    # returned rule table is a union of 1-row materialized frames —
    # no parquet in its lineage (the corpus was scanned exactly once,
    # during construction)
    assert "Scan ExistingRDD" in p
    assert "Union" in p
    assert p.count("Scan parquet") == 0


def test_q172_q20_single_window_no_second_scan(spark):
    """The per-part total comes from the SAME (supplier, part) frame
    via a window — exactly one lineitem scan, part filter pushed,
    qualifying supplier set broadcast into supplier."""
    p = plan(spark, "q172_tpch_q20_dominant_suppliers")
    assert p.count("Window (") == 1
    schemas = [s.splitlines()[0] for s in p.split("ReadSchema:")[1:]]
    assert sum("l_suppkey" in s for s in schemas) == 1  # lineitem once
    pushed = p.split("PushedFilters:")
    assert any("p_name" in seg.splitlines()[0] for seg in pushed[1:])
    assert p.count("BroadcastHashJoin") >= 2


# -- round-8 second wave ------------------------------------------------------
def test_q173_spearman_rank_windows_value_bounded(spark):
    """Both rank windows run over DISTINCT (group, value) aggregates
    (HashAggregate below each Window), the joins back are equi-joins,
    and nothing goes cartesian."""
    p = plan(spark, "q173_spearman_corr")
    assert "CartesianProduct" not in p and "NestedLoop" not in p
    assert p.count("Window") >= 2
    assert "HashAggregate" in p


def test_q174_welch_single_scan_single_aggregate(spark):
    """Six moments from one conditional aggregate: exactly one orders
    scan, one Exchange (to the group key), no join, no window."""
    import re

    p = plan(spark, "q174_welch_t_test")
    assert len(re.findall(r"\(\d+\) Scan parquet", p)) == 1
    assert len(re.findall(r"\(\d+\) Exchange\n", p)) == 1
    assert "Join" not in p and "Window" not in p


def test_q176_mrr_rank_filter_prunes_per_user(spark):
    """The rn <= k filter compiles to WindowGroupLimit (per-partition
    top-k heap before the full window sort), so only k rows per user
    survive to the aggregates."""
    p = plan(spark, "q176_mrr_at_10")
    assert "WindowGroupLimit" in p


def test_q179_compaction_single_exchange(spark):
    """The per-partition window's hash(part) partitioning satisfies the
    (part, bin) aggregate's clustering — ONE Exchange total; the scan
    reads only the three metadata columns."""
    import re

    p = plan(spark, "q179_compaction_plan")
    assert len(re.findall(r"\(\d+\) Exchange\n", p)) == 1
    read_schema = p.split("ReadSchema:")[1].splitlines()[0]
    assert "text" not in read_schema and "lang" not in read_schema


def test_q181_quantile_grid_broadcast(spark):
    """Rows join the 64-point grid via BroadcastHashJoin — the pooled
    order statistics never shuffle row data."""
    p = plan(spark, "q181_quantile_normalize")
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p


def test_q183_q9_star_join_broadcasts(spark):
    """All three dimension sides (filtered part, supplier, nation)
    broadcast; lineitem shuffles exactly once, for the final
    (nation, year) aggregate."""
    import re

    p = plan(spark, "q183_tpch_q9_profit")
    assert "SortMergeJoin" not in p
    assert p.count("BroadcastHashJoin") >= 3
    assert len(re.findall(r"\(\d+\) Exchange\n", p)) == 1
    pushed = p.split("PushedFilters:")
    assert any("p_name" in s.splitlines()[0] for s in pushed[1:])


def test_q186_q19_disjunctive_broadcast_single_agg(spark):
    """The OR-of-ANDs stays a single broadcast join + one global
    aggregate — no union-of-three-scans rewrite, no shuffle join —
    and Catalyst pushes the per-table OR residuals into BOTH parquet
    scans (quantity bounds to lineitem, brand/size to part)."""
    import re

    p = plan(spark, "q186_tpch_q19_disjunctive")
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p
    assert len(re.findall(r"\(\d+\) Scan parquet", p)) == 2  # lineitem, part
    # the quantity and brand/size disjunctions each reach their scan
    pushed = [s.splitlines()[0] for s in p.split("PushedFilters:")[1:]]
    assert any("Or(" in s and "l_quantity" in s for s in pushed)
    assert any("Or(" in s and "p_brand" in s for s in pushed)


def test_q187_q21_semi_anti_joins(spark):
    """EXISTS → LeftSemi, NOT EXISTS → LeftAnti, and the shared late
    frame is materialized once (Scan ExistingRDD) instead of being
    recomputed for each side."""
    p = plan(spark, "q187_tpch_q21_waiting")
    assert "LeftSemi" in p
    assert "LeftAnti" in p
    assert "Scan ExistingRDD" in p


def test_q182_itemcf_rowlocal_pairs(spark):
    """Pair generation is a row-local explode of each user's item
    array (Generate node) — never a self-join of the interaction
    table; the capped frame is checkpointed once for its three
    consumers."""
    p = plan(spark, "q182_item_item_cosine")
    assert "Generate" in p
    assert "CartesianProduct" not in p
    assert "Scan ExistingRDD" in p
    assert "TakeOrderedAndProject" in p


def test_q189_join_forecast_no_row_shuffle(spark):
    """Both inputs aggregate to count frames before the key join —
    the only Exchanges carry (key, cnt) pairs; the per-key frame is
    checkpointed once for totals + top-N; TakeOrdered top-N."""
    p = plan(spark, "q189_join_cardinality")
    assert "Scan ExistingRDD" in p
    assert "TakeOrderedAndProject" in p
    assert "CartesianProduct" not in p
    # only the l_partkey column is ever read
    schemas = [s.splitlines()[0] for s in p.split("ReadSchema:")[1:]]
    assert all(s.count(":") == 1 and "l_partkey" in s for s in schemas)


def test_q190_anova_single_scan_wide_aggregate(spark):
    """15 moments in one conditional aggregate over one scan: one
    Exchange (single partition), no join, no window."""
    import re

    p = plan(spark, "q190_anova_f")
    assert len(re.findall(r"\(\d+\) Scan parquet", p)) == 1
    assert len(re.findall(r"\(\d+\) Exchange\n", p)) == 1
    assert "Join" not in p and "Window" not in p


def test_q191_kcore_off_checkpointed_rounds(spark):
    """Peeling rounds are checkpointed (O(1) plan depth — the LPA
    discipline): the final report reads ExistingRDD, top-20 via
    TakeOrdered, totals via broadcast."""
    p = plan(spark, "q191_kcore")
    assert "Scan ExistingRDD" in p
    assert "TakeOrderedAndProject" in p
    assert "BroadcastNestedLoopJoin" in p


def test_q192_edit_pairs_variant_equijoin(spark):
    """Candidates come from a variant-key equi-join over exploded
    deletion neighborhoods (Generate) — never a name×name cartesian.
    The spec's final frame is checkpointed, so the operator plan is
    audited directly (the q164 pattern) and the spec plan separately."""
    import contextlib, io

    from kassette_server_spark.catalog import load
    from kassette_server_spark.operators.linkage import edit_distance1_pairs
    from pyspark.sql import functions as F

    c = (
        load(spark, SF_SMOKE, "customer")
        .where(F.col("c_custkey") % 20 == 0)
        .select("c_custkey", "c_name")
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        edit_distance1_pairs(c, "c_custkey", "c_name").explain("formatted")
    p = buf.getvalue()
    assert "Generate" in p
    assert "CartesianProduct" not in p and "NestedLoop" not in p
    # the 1-in-20 custkey filter reaches the parquet scan
    read_schema = p.split("ReadSchema:")[1].splitlines()[0]
    assert "c_acctbal" not in read_schema
    # final spec plan: checkpointed pairs + TakeOrdered + broadcast total
    pf = plan(spark, "q192_edit_distance_pairs")
    assert "Scan ExistingRDD" in pf
    assert "TakeOrderedAndProject" in pf
    assert "BroadcastNestedLoopJoin" in pf


def test_q193_zonemap_two_aggregates_one_scan(spark):
    """Per-bucket stats then a 1-row summary: one scan, two
    aggregate pairs, no join."""
    import re

    p = plan(spark, "q193_zonemap_pruning")
    assert len(re.findall(r"\(\d+\) Scan parquet", p)) == 1
    assert "Join" not in p
    read_schema = p.split("ReadSchema:")[1].splitlines()[0]
    assert "l_quantity" not in read_schema and "l_extendedprice" not in read_schema


def test_q194_oov_vocab_broadcast_semi(spark):
    """The top-V vocabulary is a TakeOrdered frame joined back via a
    broadcast LEFT-SEMI; everything else aggregates the (lang, token)
    count frame."""
    p = plan(spark, "q194_oov_rate")
    assert "TakeOrderedAndProject" in p
    assert "LeftSemi" in p
    assert "SortMergeJoin" not in p


def test_q196_two_proportion_single_scan(spark):
    """Four counts in one conditional aggregate: one scan, one
    Exchange, no join, no window."""
    import re

    p = plan(spark, "q196_two_proportion_z")
    assert len(re.findall(r"\(\d+\) Scan parquet", p)) == 1
    assert len(re.findall(r"\(\d+\) Exchange\n", p)) == 1
    assert "Join" not in p and "Window" not in p


def test_q197_gini_stump_value_bounded(spark):
    """r17: split totals ride the same global window as the cumulative
    candidate counts — one base scan, no joins; the argmin is an
    aggregate, not a sort+limit."""
    p = plan(spark, "q197_gini_stump")
    assert p.count("Scan parquet") == 2  # one node: tree + detail
    assert "Join" not in p
    assert "TakeOrderedAndProject" not in p  # struct-min aggregate


def test_q184_q13_left_join_keeps_priority_filter_in_join(spark):
    """The priority filter must live in the LEFT join's ON clause (a
    WHERE would delete the zero-order customers the query counts):
    the join stays LeftOuter and no filter sits above it on the
    orders side."""
    p = plan(spark, "q184_tpch_q13_custdist")
    assert "LeftOuter" in p
    # orders scan carries the pushed <> filter; customer scan doesn't
    pushed = [s.splitlines()[0] for s in p.split("PushedFilters:")[1:]]
    assert any("o_orderpriority" in s for s in pushed)


def test_q185_q15_one_lineitem_scan_window_max(spark):
    """The scalar-subquery max runs as a window over the
    supplier-cardinality revenue view — exactly one lineitem scan,
    shipdate range pushed down, supplier joins via broadcast."""
    import re

    p = plan(spark, "q185_tpch_q15_top_supplier")
    schemas = [s.splitlines()[0] for s in p.split("ReadSchema:")[1:]]
    assert sum("l_suppkey" in s for s in schemas) == 1
    pushed = [s.splitlines()[0] for s in p.split("PushedFilters:")[1:]]
    assert any("l_shipdate" in s for s in pushed)
    assert "BroadcastHashJoin" in p


def test_q188_q22_anti_join_integer_avg_compare(spark):
    """NOT EXISTS orders compiles to LeftAnti; the avg-balance gate is
    the broadcast 1-row cross join (no correlated re-scan)."""
    p = plan(spark, "q188_tpch_q22_idle_customers")
    assert "LeftAnti" in p
    assert "BroadcastNestedLoopJoin" in p  # 1-row avg frame
    # the cntrycode IN-list is a substring expression — not parquet-
    # pushable, but it must still filter in the scan stage (a Filter
    # node over substring(c_name...)), not after the joins
    assert "substring(c_name" in p and "Filter" in p


def test_q180_k_anonymity_two_aggregates_no_join(spark):
    """One aggregate to QI classes (with exact distinct), one 1-row
    summary: no join anywhere, scan pruned to the QI+sensitive
    columns."""
    p = plan(spark, "q180_k_anonymity")
    assert "Join" not in p
    read_schema = p.split("ReadSchema:")[1].splitlines()[0]
    assert "text" not in read_schema and "doc_id" not in read_schema


def test_q178_seasonal_single_window_partitioned(spark):
    """Daily aggregate then ONE per-type window (never a global
    sort): the lag window partitions by event_type."""
    p = plan(spark, "q178_seasonal_backtest")
    assert "Window" in p
    assert "SinglePartition" not in p or "hashpartitioning" in p
    assert "CartesianProduct" not in p


def test_q175_calibration_off_checkpointed_counts(spark):
    """r17: bins are per-row arithmetic off the cumulative window (the
    decile_lift linearization) — one base scan, no joins at all."""
    p = plan(spark, "q175_rank_calibration")
    assert p.count("Scan parquet") == 2  # one node: tree + detail
    assert "Join" not in p


def test_q177_hellinger_cells_aggregated_once(spark):
    """The global frame re-aggregates the checkpointed CELLS — the
    documents table is never scanned twice; the per-category join is
    a broadcast."""
    p = plan(spark, "q177_hellinger_drift")
    assert "Scan ExistingRDD" in p
    assert "Scan parquet" not in p
    assert "BroadcastHashJoin" in p


def test_q199_wilson_single_scan_no_join(spark):
    """Two counts per group from one aggregate; the CI tail is pure
    projection — one scan, one Exchange, nothing else."""
    import re

    p = plan(spark, "q199_wilson_ci")
    assert len(re.findall(r"\(\d+\) Scan parquet", p)) == 1
    assert len(re.findall(r"\(\d+\) Exchange\n", p)) == 1
    assert "Join" not in p and "Window" not in p


def test_q200_km_curve_sized_windows(spark):
    """Both KM windows (reverse at-risk cumsum, forward factor list)
    run over the distinct-duration CURVE frame — below them sits the
    per-user conversion aggregate, so window input is curve-sized,
    not event-sized; no join or cartesian anywhere."""
    p = plan(spark, "q200_kaplan_meier")
    assert p.count("Window") >= 2
    assert "CartesianProduct" not in p and "Join" not in p
    read_schema = p.split("ReadSchema:")[1].splitlines()[0]
    assert "props" not in read_schema and "value" not in read_schema


def test_q201_logrank_single_final_row(spark):
    """The E/V quantization happens on the pooled curve frame; the
    final statistic is one aggregate row joined to the subject counts
    via broadcast — no event-sized shuffle after the curve."""
    p = plan(spark, "q201_log_rank")
    assert "BroadcastNestedLoopJoin" in p
    assert "CartesianProduct" not in p


# -- round-8 third wave: TPC-H completion (q202-q211) -------------------------


def test_q202_q2_window_min_after_dim_filters(spark):
    """The correlated min-cost subquery is a window over the
    region+part-FILTERED supply frame: exactly one lineitem scan, the
    window's Exchange sits above the broadcast dimension joins (so it
    reshuffles only surviving small-size/LARGE/EUROPE rows, not raw
    supply), and no sort-merge join anywhere."""
    p = plan(spark, "q202_tpch_q2_min_cost_supplier")
    schemas = [s.splitlines()[0] for s in p.split("ReadSchema:")[1:]]
    assert sum("l_extendedprice" in s for s in schemas) == 1
    assert "SortMergeJoin" not in p
    tree = p.split("\n\n")[0]
    # window above the joins: the Window node appears before (above)
    # every BroadcastHashJoin in the tree rendering
    assert tree.index("Window") < tree.index("BroadcastHashJoin")
    # part filter pushed to the part scan
    pushed = [s.splitlines()[0] for s in p.split("PushedFilters:")[1:]]
    assert any("p_size" in s for s in pushed)


def test_q203_q4_exists_left_semi_with_pushdown(spark):
    """EXISTS compiles to one LEFT SEMI join keyed on the order key
    (each order counted once no matter how many late lines); the
    quarter filter pushes to the orders parquet scan."""
    p = plan(spark, "q203_tpch_q4_priority_check")
    assert "LeftSemi" in p
    pushed = [s.splitlines()[0] for s in p.split("PushedFilters:")[1:]]
    assert any("o_orderdate" in s for s in pushed)
    schemas = [s.splitlines()[0] for s in p.split("ReadSchema:")[1:]]
    # lineitem side prunes to the two columns the predicate needs
    li = next(s for s in schemas if "l_shipdate" in s)
    assert "l_extendedprice" not in li and "l_quantity" not in li


def test_q204_q6_pure_scan_aggregate(spark):
    """The canonical scan-filter-agg: no join node of any kind, a
    single lineitem scan, and all three predicate families (date
    range, discount band, quantity cap) pushed to parquet."""
    p = plan(spark, "q204_tpch_q6_forecast_revenue")
    assert "Join" not in p and "CartesianProduct" not in p
    import re

    assert len(re.findall(r"\(\d+\) Scan parquet", p)) == 1
    pushed = p.split("PushedFilters:")[1].splitlines()[0]
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in pushed, col


def test_q205_q7_nation_filters_prune_before_big_join(spark):
    """Both nation arms filter to the two-nation set INSIDE their
    broadcast builds, so lineitem rows drop at the first (supplier)
    join — before the expensive orders join; ship-date range pushes
    to the lineitem scan."""
    p = plan(spark, "q205_tpch_q7_volume_shipping")
    pushed = [s.splitlines()[0] for s in p.split("PushedFilters:")[1:]]
    assert any("l_shipdate" in s for s in pushed)
    # the IN-pair filter rides the nation scans
    assert any("n_name" in s for s in pushed)
    assert "SortMergeJoin" not in p


def test_q206_q8_share_pair_single_aggregate(spark):
    """Numerator (NATION_5 cents) and denominator (all cents) fold in
    ONE aggregate pass over one lineitem scan — no second scan, no
    self-join for the share."""
    p = plan(spark, "q206_tpch_q8_market_share")
    schemas = [s.splitlines()[0] for s in p.split("ReadSchema:")[1:]]
    assert sum("l_extendedprice" in s for s in schemas) == 1
    tree = p.split("\n\n")[0]
    # one partial+final HashAggregate pair at the top, nothing more
    assert tree.count("HashAggregate") == 2


def test_q210_q14_share_pair_single_aggregate(spark):
    """Same single-pass share-pair contract as q206, with the month
    bucket as the group: one lineitem scan, one aggregate pair, part
    joined via broadcast (type column only in its ReadSchema)."""
    p = plan(spark, "q210_tpch_q14_promo_share")
    schemas = [s.splitlines()[0] for s in p.split("ReadSchema:")[1:]]
    assert sum("l_extendedprice" in s for s in schemas) == 1
    part_schema = next(s for s in schemas if "p_type" in s)
    assert "p_retailprice" not in part_schema and "p_name" not in part_schema
    tree = p.split("\n\n")[0]
    assert tree.count("HashAggregate") == 2


def test_q208_q11_global_total_window_over_aggregate(spark):
    """The HAVING total is a window sum over the part-cardinality
    value frame (q185's move): one lineitem scan feeds one aggregate,
    the Window sits directly above it, and the share gate is an
    integer multiply — no division node in the plan."""
    p = plan(spark, "q208_tpch_q11_important_stock")
    import re

    schemas = [s.splitlines()[0] for s in p.split("ReadSchema:")[1:]]
    assert sum("l_extendedprice" in s for s in schemas) == 1
    tree = p.split("\n\n")[0]
    assert tree.index("Window") < tree.index("HashAggregate")
    assert len(re.findall(r"\(\d+\) Scan parquet", p)) == 3  # li, supp, nation


def test_q211_q16_anti_join_below_distinct(spark):
    """Catalyst keeps the complaint-supplier LEFT ANTI under the
    supply DISTINCT (filtering before deduplicating), and the
    distinct-supplier count runs as the standard two-level
    aggregate — no sort-merge join, part attributes via broadcast."""
    p = plan(spark, "q211_tpch_q16_supplier_counts")
    assert "LeftAnti" in p
    assert "SortMergeJoin" not in p
    tree = p.split("\n\n")[0]
    # anti join renders BELOW (after) the first HashAggregate pair
    assert tree.index("LeftAnti") > tree.index("HashAggregate")
    pushed = [s.splitlines()[0] for s in p.split("PushedFilters:")[1:]]
    assert any("s_acctbal" in s for s in pushed)


def test_q212_saturation_register_scale_tail(spark):
    """Everything after the two corpus explodes is register-scale:
    the 1-row stat frames compose via broadcast nested-loop crosses
    (never an unbroadcast CartesianProduct), no sort-merge join
    anywhere, and the percentile window runs over the count-of-counts
    frame (a Window node exists above an aggregate, not above a scan)."""
    p = plan(spark, "q212_shingle_saturation")
    assert "BroadcastNestedLoopJoin" in p
    assert "CartesianProduct" not in p
    assert "SortMergeJoin" not in p
    tree = p.split("\n\n")[0]
    assert "Window" in tree and "HashAggregate" in tree


def test_q213_bpe_apply_vocab_join_broadcast(spark):
    """The apply join (corpus words x word-token-count map) must ride
    a broadcast of the vocabulary side — the corpus-sized exploded
    frame keeps its partitioning; and the whole learn/apply pipeline
    must never produce a cartesian product (the per-round 1-row rule
    join is a broadcast nested loop, not a CartesianProduct)."""
    p = plan(spark, "q213_bpe_token_counts")
    assert "CartesianProduct" not in p
    assert "BroadcastHashJoin" in p  # word -> token-count map join


def test_q214_packing_no_global_cumsum(spark):
    """Packing must window per bucket (hash-partitioned), never a
    single global cumsum partition."""
    p = plan(spark, "q214_bpe_sequence_packing")
    assert "CartesianProduct" not in p
    assert "hashpartitioning(bucket" in p


def test_q215_span_removal_no_cartesian_no_text_shuffle(spark):
    """Span removal clusters grams by their 8-byte digest and anti-
    joins positions — no cartesian product anywhere, and the document
    TEXT column stays out of the gram/coverage exchanges (digests,
    ids, and positions only)."""
    p = plan(spark, "q215_substring_dedup_removal")
    assert "CartesianProduct" not in p
    # gram exchange carries the xxhash64 digest, not the gram string
    assert "xxhash64" in p


def test_q217_pipeline_composition_no_cartesian(spark):
    """The composed curation chain (dedup -> span removal -> BPE ->
    packing -> summary) must stay cartesian-free and keep the packing
    window per-bucket. The span-removal segment sits behind a lineage
    checkpoint (the measured recomputation fix, SCALE.md r9), so its
    own digest-exchange property is locked by test_q215 on the same
    operator rather than re-asserted through the truncated plan here."""
    p = plan(spark, "q217_curation_pipeline_e2e")
    assert "CartesianProduct" not in p
    assert "hashpartitioning(bucket" in p


def test_q220_jl_projection_map_only(spark):
    """The JL sketch must be a pure map: scan → fold → posexplode,
    zero exchanges and zero Python — at 100 TB the projection runs
    inside the scan stage of whatever consumes it."""
    p = plan(spark, "q220_jl_projection")
    assert "Exchange" not in p
    assert "CartesianProduct" not in p
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p


def test_q221_audio_features_scan_stage_map(spark):
    """Frame features are per-row local (frames never cross rows):
    one Arrow-batched mapInPandas, no shuffle."""
    p = plan(spark, "q221_audio_frame_features")
    assert_spread_map(p)


def test_q223_ann_recall_no_cartesian(spark):
    """The recall gate composes two searches whose own locks hold
    (q34 broadcast corpus-side cross, q52 centroid broadcast); the
    composition must add only hash joins — no raw cartesian, and the
    only nested-loop joins are broadcast ones."""
    p = plan(spark, "q223_ann_recall")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p


def test_q225_lm_filter_no_cartesian(spark):
    """The LM filter composes the q117 LM (its own vocabulary²/cut
    contract) with a distinct-score cutoff; the only row-multiplying
    joins allowed are the broadcast 1-row cutoff/total attachments."""
    p = plan(spark, "q225_lm_quality_filter")
    assert "CartesianProduct" not in p


def test_q226_embedding_drift_no_row_explosion(spark):
    """The drift monitor is two map-side-combined aggregate passes
    (dim sum columns, zero posexplode) joined on the label key — no
    Generate (a per-dimension explode would shuffle dim× the rows),
    no cartesian."""
    p = plan(spark, "q226_embedding_drift")
    assert "Generate" not in p
    assert "CartesianProduct" not in p


def test_q224_temperature_mix_tiny_frame_tail(spark):
    """Everything after the corpus count runs on a domain-cardinality
    frame: the only joins are broadcast attachments of 1-row totals
    (no cartesian, no sort-merge join anywhere in the plan)."""
    p = plan(spark, "q224_temperature_mix")
    assert "CartesianProduct" not in p
    assert "SortMergeJoin" not in p


def test_q228_representatives_window_per_cluster(spark):
    """The selection adds exactly one exchange over the clustering —
    the cluster_id hash partition for the ranking window; no
    cartesian anywhere in the composed plan."""
    p = plan(spark, "q228_cluster_representatives")
    assert "hashpartitioning(cluster_id" in p
    assert "CartesianProduct" not in p


def test_q229_sketch_recall_no_cartesian(spark):
    """Two brute passes, each the r16 fused scoring kernel over its
    corpus scan (full-width and sketch-space), plus one top-k-frame
    join — no cartesian of any kind, and the sketch map chains into
    the scoring kernel's scan stage with no exchange between them."""
    p = plan(spark, "q229_sketch_recall")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "MapInPandas" in p


def test_q230_png_resize_scan_stage_map(spark):
    """The PNG resize tier is one Arrow-batched mapInPandas directly
    over the id scan — no exchange beyond the round-robin input spread
    (payloads are built, transformed, and re-parsed within their map
    partition), no Generate, no join of any kind."""
    p = plan(spark, "q230_png_resize")
    assert_spread_map(p)
    assert "Join" not in p and "CartesianProduct" not in p


def test_q232_png_resize_rgb_scan_stage_map(spark):
    """The RGB sibling of the q230 lock: one Arrow-batched mapInPandas
    directly over the id scan — no Exchange (payloads are built,
    filtered, de-filtered, resized, and re-parsed within their input
    partition), no Generate, no join of any kind. Multi-channel decode
    must not change the plan shape, only per-row work."""
    p = plan(spark, "q232_png_resize_rgb")
    assert_spread_map(p)
    assert "Join" not in p and "CartesianProduct" not in p


def test_q233_jpeg_roundtrip_scan_stage_map(spark):
    """The JPEG round-trip tier is the same shape as q230/q232: one
    Arrow-batched mapInPandas over the id scan — no Exchange, no
    Generate, no join. The entropy coder is per-row work; nothing
    about a lossy container changes the plan."""
    p = plan(spark, "q233_jpeg_roundtrip")
    assert_spread_map(p)
    assert "Join" not in p and "CartesianProduct" not in p


def test_q234_png_jpeg_transcode_scan_stage_map(spark):
    """The cross-codec transcode tier keeps the q230/q232/q233 shape:
    one Arrow-batched mapInPandas over the id scan — no exchange beyond
    the round-robin input spread, no join. Chaining two codecs changes per-row work only."""
    p = plan(spark, "q234_png_jpeg_transcode")
    assert_spread_map(p)
    assert "Join" not in p and "CartesianProduct" not in p


def test_q235_png_jpeg_transcode_rgb_scan_stage_map(spark):
    """RGB transcode keeps the codec-tier shape: one Arrow-batched
    mapInPandas over the id scan — no Exchange, no join."""
    p = plan(spark, "q235_png_jpeg_transcode_rgb")
    assert_spread_map(p)
    assert "Join" not in p and "CartesianProduct" not in p


def test_q236_wav_resample_scan_stage_map(spark):
    """The audio resample tier keeps the codec-tier shape: one
    Arrow-batched mapInPandas over the id scan — no exchange beyond
    the round-robin input spread, no join."""
    p = plan(spark, "q236_wav_resample")
    assert_spread_map(p)
    assert "Join" not in p and "CartesianProduct" not in p


def test_q237_gif_roundtrip_scan_stage_map(spark):
    """The GIF LZW tier keeps the codec-tier shape: one Arrow-batched
    mapInPandas over the id scan — no Exchange, no join."""
    p = plan(spark, "q237_gif_roundtrip")
    assert_spread_map(p)
    assert "Join" not in p and "CartesianProduct" not in p


def test_q238_gif_png_transcode_scan_stage_map(spark):
    """The lossless transcode tier keeps the codec-tier shape: one
    Arrow-batched mapInPandas over the id scan — no exchange beyond
    the round-robin input spread, no join."""
    p = plan(spark, "q238_gif_png_transcode")
    assert_spread_map(p)
    assert "Join" not in p and "CartesianProduct" not in p


def test_q231_temperature_mix_tau75_tiny_frame_tail(spark):
    """The τ=0.75 composed-sqrt weight changes only the weight
    expression: the plan shape must stay q224's — everything after
    the corpus count on a domain-cardinality frame, broadcast-only
    attachments, no cartesian, no sort-merge join."""
    p = plan(spark, "q231_temperature_mix_tau75")
    assert "CartesianProduct" not in p
    assert "SortMergeJoin" not in p


def test_q239_pq_codebook_one_shuffle_no_python(spark):
    """PQ training's in-frame update cycle: assignment + per-batch
    partial aggregation is ONE Arrow-batched map-only pass (the
    closure-captured codebook's vectorized numpy kernel — r12 moved
    this off Catalyst expressions after the unrolled form blew
    Janino's method limit and the HOF form ran interpreted at ~7 s per
    pass), so the whole plan is scan → MapInPandas → ONE group-hash
    Exchange carrying ≤ M·K partial rows per batch. No join anywhere."""
    import re

    p = plan(spark, "q239_pq_codebooks")
    assert len(re.findall(r"\(\d+\) Exchange\n", p)) == 1
    assert "CartesianProduct" not in p and "Join" not in p
    assert "MapInPandas" in p


def test_q240_pq_adc_corpus_never_shuffles(spark):
    """ADC scoring: the encoded corpus stays in its scan stage — the
    query frame (sample, with its 128-entry table) broadcasts, the
    top-k prune is the shared MapInPandas partition-local pass, and
    the only raw-shape join is the broadcast nested-loop score. The
    training collects are bounded side jobs, not part of this plan."""
    p = plan(spark, "q240_pq_adc_topk")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" in p
    assert "MapInPandas" in p


def test_q241_pq_recall_no_cartesian(spark):
    """The gate composes ADC and exact int8-L2 (each under its own
    broadcast contract) with a |queries|·k-row hash join — no raw
    cartesian anywhere."""
    p = plan(spark, "q241_pq_recall")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" in p


def test_q242_jpeg_restart_scan_stage_map(spark):
    """Restart-bearing JPEG round trip: per-row codec work, one
    Arrow-batched mapInPandas behind at most the round-robin input spread."""
    p = plan(spark, "q242_jpeg_restart_roundtrip")
    assert_spread_map(p)


def test_q243_jpeg_channel_stats_scan_stage_map(spark):
    p = plan(spark, "q243_jpeg_channel_stats")
    assert_spread_map(p)


def test_q244_jpeg_420_scan_stage_map(spark):
    """4:2:0 round trip: per-row subsampled codec work, one
    Arrow-batched mapInPandas behind at most the round-robin input spread."""
    p = plan(spark, "q244_jpeg_420_roundtrip")
    assert_spread_map(p)


def test_q245_png_depth_scan_stage_map(spark):
    """Non-8-bit PNG depth tier: five per-row codec legs, one
    Arrow-batched mapInPandas behind at most the round-robin input spread."""
    p = plan(spark, "q245_png_depth_roundtrip")
    assert_spread_map(p)


def test_q246_g711_scan_stage_map(spark):
    """G.711 both laws: per-row integer companding, one Arrow-batched
    mapInPandas behind at most the round-robin input spread."""
    p = plan(spark, "q246_g711_companding")
    assert_spread_map(p)


def test_q247_ima_adpcm_scan_stage_map(spark):
    """IMA ADPCM: per-row sequential state machine, one Arrow-batched
    mapInPandas behind at most the round-robin input spread."""
    p = plan(spark, "q247_ima_adpcm")
    assert_spread_map(p)


def test_q248_ivfpq_cells_one_shuffle_no_join(spark):
    """IVF coarse layout: assignment + residual is one Arrow-batched
    map-only pass; the only Exchange is the ≤ kc-row group hash."""
    import re

    p = plan(spark, "q248_ivfpq_cells")
    assert len(re.findall(r"\(\d+\) Exchange\n", p)) == 1
    assert "CartesianProduct" not in p and "Join" not in p
    assert "MapInPandas" in p


def test_q249_ivfpq_cell_join_is_broadcast_hash(spark):
    """IVF-PQ search: the cell-membership join is a broadcast
    EQUI-join (hash, not nested loop — the pruning flat ADC lacks);
    the corpus encode is a scan-stage MapInPandas and never shuffles."""
    p = plan(spark, "q249_ivfpq_adc_topk")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "BroadcastHashJoin" in p
    assert "MapInPandas" in p


def test_q250_ivfpq_recall_no_cartesian(spark):
    """The IVF-PQ gate composes the cell-pruned search (broadcast hash
    join) with the exact baseline (its own broadcast contract) and a
    |queries|·k-row hash join — no raw cartesian anywhere."""
    p = plan(spark, "q250_ivfpq_recall")
    assert "CartesianProduct" not in p
    assert "BroadcastHashJoin" in p


def test_q251_jpeg_progressive_scan_stage_map(spark):
    """Progressive JPEG round trip + baseline differential: per-row
    codec work, one Arrow-batched mapInPandas inside the scan stage,
    zero exchanges."""
    p = plan(spark, "q251_jpeg_progressive_roundtrip")
    assert_spread_map(p)


def test_q252_jpeg_422_scan_stage_map(spark):
    """4:2:2 round trip: per-row subsampled codec work, one
    Arrow-batched mapInPandas behind at most the round-robin input spread."""
    p = plan(spark, "q252_jpeg_422_roundtrip")
    assert_spread_map(p)


def test_q253_wav_container_scan_stage_map(spark):
    """Compressed-WAV container tier: per-row RIFF+codec work, one
    Arrow-batched mapInPandas behind at most the round-robin input spread."""
    p = plan(spark, "q253_wav_codec_container")
    assert_spread_map(p)


def test_q256_jpeg_411_scan_stage_map(spark):
    """4:1:1 round trip: per-row codec work, one Arrow-batched
    mapInPandas behind at most the round-robin input spread."""
    p = plan(spark, "q256_jpeg_411_roundtrip")
    assert_spread_map(p)


def test_q257_jpeg_progressive_420_scan_stage_map(spark):
    """Progressive 4:2:0: per-row multi-scan codec work, one
    Arrow-batched mapInPandas behind at most the round-robin input spread."""
    p = plan(spark, "q257_jpeg_progressive_420")
    assert_spread_map(p)


def test_q258_jpeg_ac_refine_scan_stage_map(spark):
    """AC successive approximation: per-row 7-scan codec work, one
    Arrow-batched mapInPandas behind at most the round-robin input spread."""
    p = plan(spark, "q258_jpeg_ac_refine")
    assert_spread_map(p)


def test_q254_compressed_audio_scan_stage_map(spark):
    """Compressed-audio frame features: per-row μ-law/ADPCM decode +
    integer frame reductions, one Arrow-batched mapInPandas inside the
    scan stage, zero exchanges — frames never cross rows, so the map
    is the whole plan (VERDICT r13 #5)."""
    p = plan(spark, "q254_compressed_audio_features")
    assert_spread_map(p)


def test_q255_ivfpq_qerr_exchange_bounded_by_cells(spark):
    """Per-cell quantization error: the corpus is encoded in a
    scan-stage mapInPandas and the ONLY exchange is the per-cell
    aggregate — partial HashAggregate first, so the shuffle carries
    ≤ kc rows per map partition, never the corpus; and no join of any
    kind (the chosen-centroid distances ride the encode, they are not
    re-joined) (VERDICT r13 #5)."""
    import re

    p = plan(spark, "q255_ivfpq_qerr_by_cell")
    assert len(re.findall(r"\(\d+\) Exchange", p)) == 1
    assert "Join" not in p and "CartesianProduct" not in p
    assert "MapInPandas" in p
    # partial-aggregate-before-shuffle: two HashAggregates around the one Exchange
    assert len(re.findall(r"HashAggregate", p)) >= 2


def test_chained_spread_maps_single_exchange(spark, tmp_path):
    """ADVICE r14: decode(encode(df)) compositions must not
    double-shuffle — ensure_scan_parallelism detects the inner
    width-guaranteeing spread already in the analyzed plan and no-ops on the
    outer map, so the composed plan still satisfies the spread lock
    (<=1 Exchange, spread-shaped only) instead of inserting a second
    exchange that moves the full encoded payload bytes."""
    from kassette_server_spark.operators.multimodal import (
        decode_media_meta,
        encode_media_payloads,
    )

    path = str(tmp_path / "onefile")
    spark.range(64).withColumnRenamed("id", "doc_id").coalesce(1).write.mode(
        "overwrite"
    ).parquet(path)
    df = decode_media_meta(encode_media_payloads(spark.read.parquet(path)))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    assert_spread_map(buf.getvalue())


def test_q259_mjpeg_avi_spread_scan_stage_map(spark):
    """The video tier keeps the codec-tier plan shape: one Arrow-batched
    mapInPandas behind the input-width guard — <=1 Exchange, round-robin
    only (VERDICT r14 #3)."""
    p = plan(spark, "q259_mjpeg_avi_frames")
    assert_spread_map(p)


def test_q260_mjpeg_avi_resample_spread_scan_stage_map(spark):
    """The video resize + re-mux chain keeps the codec-tier plan shape:
    one Arrow-batched mapInPandas behind the input-width guard."""
    p = plan(spark, "q260_mjpeg_avi_resample")
    assert_spread_map(p)


def test_q261_avi_audio_spread_scan_stage_map(spark):
    """The AVI audio-extraction tier keeps the codec-tier plan shape:
    one Arrow-batched mapInPandas behind the input-width guard."""
    p = plan(spark, "q261_avi_audio_extract")
    assert_spread_map(p)
