"""kassette_server_spark.functions — the engine's scalar-function
surface in one importable namespace.

Groups the reference-parity coercions (SURVEY §1.2), identity/auth
hashing, and the text/similarity scalar helpers so users have a single
`from kassette_server_spark import functions as KF` entry point, the
way `pyspark.sql.functions` works.
"""

from ..convert import (  # noqa: F401
    convert_dest,
    convert_source,
    format_date_dest,
    format_datetime_dest,
    to_bool,
    to_datetime_src,
    to_float,
    to_int,
    to_number,
    to_string,
    TS_LAYOUT,
)
from ..misc import write_key  # noqa: F401
from ..operators.dedup import shingles, tokens  # noqa: F401
from ..operators.similarity import cosine, dot, norm  # noqa: F401
from ..operators.sketches import (  # noqa: F401
    binned_quantiles,
    binned_quantiles_by,
    bloom_bits,
    bloom_probe,
    countmin_estimate,
    countmin_registers,
    hll_count_distinct,
    hll_count_distinct_by,
    hll_estimate,
    hll_merge_into_store,
    hll_registers,
)
from ..operators.affinity import copurchase_pairs  # noqa: F401
from ..operators.clustering import power_iteration_top_component  # noqa: F401
from ..operators.funnel import peak_concurrency, timed_funnel  # noqa: F401
from ..operators.graph import (  # noqa: F401
    hierarchy_closure,
    hierarchy_closure_jump,
    pagerank_fixedpoint,
)
from ..operators.profiling import profile_columns  # noqa: F401
from ..operators.layout import zorder_key  # noqa: F401
from ..operators.linkage import sorted_neighborhood_pairs  # noqa: F401
from ..operators.merge import point_in_time_join, scd2_merge_into_store, snapshot_diff  # noqa: F401
from ..operators.store import next_generation, read_store, write_store  # noqa: F401
from ..operators.retrieval import bm25_topk  # noqa: F401
from ..operators.sampling import dataset_split, priority_sample  # noqa: F401
from ..operators.stats import (  # noqa: F401
    chi_square_by,
    gini_by_group,
    grouped_ols,
    mad_outliers,
    pareto_frontier_2d,
    rfm_scores,
    weighted_median_by,
    winsorized_stats,
)
from ..operators.asof import asof_join_forward  # noqa: F401
from ..operators.sampling import (  # noqa: F401
    priority_sample_merge_into_store,
    stratified_priority_sample,
)
from ..operators.textstats import (  # noqa: F401
    bigram_logprob_by_doc,
    token_entropy_by,
    token_kl_divergence_by,
)
from ..pipeline import md5_uuid, tolerant_timestamp  # noqa: F401
