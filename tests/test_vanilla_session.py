"""Driver-environment mirror: the correctness gate runs queries()
under a VANILLA SparkSession (no engine confs — ANSI/timezone/AQE all
Spark defaults, shuffle.partitions=200). Anything session-dependent
must be handled at runtime inside the query path (catalog.load), so a
representative slice of the 50-entry window must pass the oracle
compare in a clean subprocess interpreter.

Round-1 lesson: the llmops family had NEVER executed under the
driver's session until the driver ran it — this test closes that gap
permanently for every family in the window.
"""

from __future__ import annotations

import subprocess
import sys

_SCRIPT = r"""
from pyspark.sql import SparkSession
from kassette_server_spark.oracle import compare
from kassette_server_spark.queries import all_specs

spark = (SparkSession.builder.master("local[4]")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
specs = all_specs()
# one representative per window family: relational, parity, e2e,
# dedup, similarity, textstats, multimodal, tpch, asof
names = [
    "q08_agg_having", "q24_sessionize", "q28_pipeline_e2e",
    "q32_dedup_minhash_lsh", "q57_simhash_near_dup",
    "q34_ann_cosine_topk", "q36_text_quality_stats",
    "q41_multimodal_meta", "q53_tpch_q1_pricing_summary",
    "q47_asof_join",
]
for name in names:
    r = compare(spark, specs[name], "/root/testdata/sf0.001")
    assert r.ok, f"{name}: {r.detail[:300]}"
print("VANILLA_OK", len(names))
"""


def test_window_families_pass_under_vanilla_session():
    out = subprocess.run(
        [sys.executable, "-c", _SCRIPT],
        capture_output=True, text=True, timeout=420, cwd="/root/repo",
    )
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    assert "VANILLA_OK 10" in out.stdout
