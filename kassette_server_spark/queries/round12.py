"""Round-12 wave (q239+): product quantization for the ANN stack
(VERDICT r11 "Next round #3" / "What's missing" (d)).

- q239: PQ codebook training (pq.pq_fit_summary) — M=8 sub-codebooks
  of K=16 centroids over int8-quantized 64-dim embeddings, 2 Lloyd
  cycles with the q96 determinism contract (smallest-id seeding,
  integer argmin, ties → smaller cid) and INTEGER centroids via the
  engine-portable floored mean (sum + 128·n) div n − 128 (dividend
  ≥ 0 ⇒ truncation ≡ floor on both engines — the WAV-resample
  discipline). Output pins the codebook by its exact moments
  (n, Σc_j, Σc_j² per (m, cid)).
- q240: ADC top-10 (pq.pq_adc_topk) — encode the corpus to M codes
  (map-only, literal codebook), per-query M·K distance table,
  asymmetric distance = M lookups + fixed-shape sum, all int64.
  Rank by (adc_dist asc, neighbor_id asc).
- q241: PQ recall gate (pq.pq_recall_at_k) — ADC top-10 ∩ exact
  int8-L2 top-10 per query (the q223 acceptance-gate pattern): what
  the 32× compression loses, measured on a query sample before the
  index serves. On THIS synthetic corpus (isotropic random
  embeddings — no cluster structure) absolute recall is intrinsically
  low; the gate's value is that it REPORTS that, deterministically,
  instead of the index shipping unmeasured.

Determinism: everything after the int8 quantize (q77's established
round(x·127/max|x|)) is exact int64 arithmetic; the only floats are
q241's final n_hits/k division. Registered after the 50-spec driver
window; first driver rows land per the standing rotation
(queries/__init__.py r13 plan); locked meanwhile by
tests/test_oracle_parity*.py at two SFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..catalog import load
from ..operators.pq import (
    pq_adc_oracle_sql,
    pq_codebook_oracle_sql,
    pq_recall_oracle_sql,
)
from .base import query


def _queries(spark: SparkSession, sf: str) -> DataFrame:
    return load(spark, sf, "embeddings").filter("vec_id % 100 = 0")


@query(
    "q239_pq_codebooks",
    oracle=pq_codebook_oracle_sql(m=8, k=16, d=8, iters=2),
    doc="product-quantization codebook training: 8 sub-codebooks x 16 "
    "integer centroids, 2 deterministic Lloyd cycles over int8-quantized "
    "embeddings; exact (n, sum, sqsum) moments per centroid",
    tags=("llmops", "similarity", "pq"),
)
def q239(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.pq import pq_fit_summary

    return pq_fit_summary(load(spark, sf, "embeddings"), m=8, k=16, iters=2)


@query(
    "q240_pq_adc_topk",
    oracle=pq_adc_oracle_sql(m=8, k=16, d=8, iters=2, topk=10),
    doc="asymmetric-distance top-10 over the PQ-encoded corpus: 8-byte "
    "codes (32x compression), per-query 128-entry distance table, "
    "8 lookups + a sum per candidate — exact int64, bit-portable ranks",
    tags=("llmops", "similarity", "pq"),
)
def q240(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.pq import pq_adc_topk

    return pq_adc_topk(
        load(spark, sf, "embeddings"), _queries(spark, sf), m=8, k=16, iters=2, topk=10
    )


@query(
    "q241_pq_recall",
    oracle=pq_recall_oracle_sql(m=8, k=16, d=8, iters=2, topk=10),
    doc="PQ acceptance gate: recall@10 of ADC against exact int8-L2 "
    "brute force on the query sample — the measurement that must run "
    "before a 32x-compressed index serves a 100 TB corpus",
    tags=("llmops", "similarity", "pq"),
)
def q241(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.pq import pq_recall_at_k

    return pq_recall_at_k(
        load(spark, sf, "embeddings"), _queries(spark, sf), m=8, k=16, iters=2, topk=10
    )
