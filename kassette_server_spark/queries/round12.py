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

Plus the JPEG restart-interval tier (VERDICT r11 #4 / #7):

- q242: restart-bearing round trip (jpeg_restart_roundtrip_stats) —
  DRI + RSTn every 2 MCUs on images up to 20 MCUs, so the modulo-8
  marker sequence wraps; per-segment byte realignment, DC-predictor
  resets, and the sequence check all sit in the oracle-gated path.
- q243: JPEG leg of the image feature tier (jpeg_channel_stats) —
  per-channel sums off a decoded 3-component restart-bearing JPEG
  (block-constant channels keep the lossy container lossless).

Determinism: everything after the int8 quantize (q77's established
round(x·127/max|x|)) is exact int64 arithmetic; the only floats are
q241's final n_hits/k division and q243's per-channel mean divisions
(one IEEE division of exact integers each). Registered after the
50-spec driver window; first driver rows land per the standing
rotation (queries/__init__.py r13 plan); locked meanwhile by
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


# q242/q243: the JPEG restart-interval tier (VERDICT r11 #4 / #7).
# DRI/RSTn is the cheapest refused-subset extension with a real scale
# payoff: restart segments reset DC predictors and byte alignment, so
# one scan splits into independently-decodable chunks (parallel decode
# at 100 TB; corruption contained to a segment). q242 wraps the
# modulo-8 marker sequence (up to 20 MCUs, 9 restarts at interval 2);
# q243 is the feature tier's JPEG leg — per-channel sums off the lossy
# container's lossless (block-constant) subset, restart-bearing too.
@query(
    "q242_jpeg_restart_roundtrip",
    oracle="""
    WITH dims AS (
      SELECT doc_id, 8 + doc_id % 32 AS w, 8 + (doc_id * 3) % 24 AS h
      FROM documents),
    px AS (
      SELECT doc_id, w, h,
             (doc_id + 3 * (gx.x // 8) + 5 * (gy.y // 8)) % 256 AS p
      FROM dims,
           unnest(CAST(range(0, w) AS BIGINT[])) AS gx(x),
           unnest(CAST(range(0, h) AS BIGINT[])) AS gy(y)
    )
    SELECT doc_id, CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
           CAST((((w + 7) // 8) * ((h + 7) // 8) - 1) // 2 AS BIGINT)
             AS n_restarts,
           CAST(sum(p) AS BIGINT) AS px_sum
    FROM px GROUP BY doc_id, w, h
    """,
    doc="JPEG restart intervals (DRI/RSTn): block-constant grayscale "
    "through the entropy scan with a restart every 2 MCUs — up to 9 "
    "markers, modulo-8 sequence wrap, per-segment predictor resets and "
    "byte realignment all in the oracle-gated path",
    tags=("llmops", "multimodal"),
)
def q242(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.multimodal import jpeg_restart_roundtrip_stats

    return jpeg_restart_roundtrip_stats(
        load(spark, sf, "documents").select("doc_id"), restart_interval=2
    )


@query(
    "q243_jpeg_channel_stats",
    oracle="""
    WITH dims AS (
      SELECT doc_id, 8 + doc_id % 16 AS w, 8 + (doc_id * 3) % 12 AS h
      FROM documents),
    px AS (
      SELECT doc_id, w, h,
             (doc_id + 0 + 3 * (gx.x // 8) + 5 * (gy.y // 8)) % 256 AS c0,
             (doc_id + 1 + 3 * (gx.x // 8) + 5 * (gy.y // 8)) % 256 AS c1,
             (doc_id + 2 + 3 * (gx.x // 8) + 5 * (gy.y // 8)) % 256 AS c2
      FROM dims,
           unnest(CAST(range(0, w) AS BIGINT[])) AS gx(x),
           unnest(CAST(range(0, h) AS BIGINT[])) AS gy(y)
    )
    SELECT doc_id, CAST(w * h AS BIGINT) AS n_px,
           CAST(sum(c0) AS BIGINT) AS sum_c0,
           CAST(sum(c1) AS BIGINT) AS sum_c1,
           CAST(sum(c2) AS BIGINT) AS sum_c2,
           CAST(sum(c0) AS DOUBLE) / (w * h) AS mean_c0,
           CAST(sum(c1) AS DOUBLE) / (w * h) AS mean_c1,
           CAST(sum(c2) AS DOUBLE) / (w * h) AS mean_c2
    FROM px GROUP BY doc_id, w, h
    """,
    doc="image feature tier, JPEG leg: per-channel sums/means read off "
    "a decoded 3-component restart-bearing JPEG (block-constant "
    "channels keep the lossy container lossless and the sums "
    "closed-form in the id)",
    tags=("llmops", "multimodal"),
)
def q243(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.multimodal import jpeg_channel_stats

    return jpeg_channel_stats(load(spark, sf, "documents").select("doc_id"))


# q244: 4:2:0 chroma subsampling — the last refused sampling mode from
# VERDICT r11's soft-edge list (a), and the layout nearly every
# real-world photo JPEG uses. MCU = 16x16 tile carrying FOUR luma
# blocks (Y at 2x2 sampling) + one block per chroma plane, each plane
# 2x2 box-downsampled with exact round-half-up integer arithmetic.
# Per-16x16-tile-constant channels survive the lossy path bit-exactly
# (the box average of a constant is that constant), keeping the sums
# closed-form in the id while the subsampled MCU parse, the
# downsample/upsample pair, and restarts all sit in the gated path.
@query(
    "q244_jpeg_420_roundtrip",
    oracle="""
    WITH dims AS (
      SELECT doc_id, 16 + doc_id % 33 AS w, 16 + (doc_id * 3) % 25 AS h
      FROM documents),
    px AS (
      SELECT doc_id, w, h,
             (doc_id + 0 + 3 * (gx.x // 16) + 5 * (gy.y // 16)) % 256 AS c0,
             (doc_id + 1 + 3 * (gx.x // 16) + 5 * (gy.y // 16)) % 256 AS c1,
             (doc_id + 2 + 3 * (gx.x // 16) + 5 * (gy.y // 16)) % 256 AS c2
      FROM dims,
           unnest(CAST(range(0, w) AS BIGINT[])) AS gx(x),
           unnest(CAST(range(0, h) AS BIGINT[])) AS gy(y)
    )
    SELECT doc_id, CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
           CAST(((w + 15) // 16) * ((h + 15) // 16) AS BIGINT) AS n_mcus,
           CAST(sum(c0) AS BIGINT) AS sum_c0,
           CAST(sum(c1) AS BIGINT) AS sum_c1,
           CAST(sum(c2) AS BIGINT) AS sum_c2
    FROM px GROUP BY doc_id, w, h
    """,
    doc="JPEG 4:2:0 chroma subsampling round trip: 3-component "
    "tile-constant images through the four-luma-blocks-per-MCU "
    "interleave, exact 2x2 box chroma downsample, restart markers, "
    "and nearest-neighbor chroma upsample — bit-exact on the "
    "tile-constant subset, sums closed-form in the id",
    tags=("llmops", "multimodal"),
)
def q244(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.multimodal import jpeg_420_roundtrip_stats

    return jpeg_420_roundtrip_stats(
        load(spark, sf, "documents").select("doc_id"), restart_interval=2
    )


# q245: the non-8-bit PNG depth tier — VERDICT r11 soft-edge (b)
# ("PNG decode is 8-bit only"). Five lossless legs per id: 16-bit gray
# sequential (all five filters over a 2-byte unit), 16-bit RGB Adam7
# (6-byte unit through the seven-pass lattice), 4/2/1-bit gray
# (MSB-first bit-packed scanlines, filters over PACKED bytes), and a
# 4-bit palette leg (indices through PLTE). Every sum is closed-form.
@query(
    "q245_png_depth_roundtrip",
    oracle="""
    WITH dims AS (
      SELECT doc_id, 8 + doc_id % 16 AS w, 8 + (doc_id * 3) % 12 AS h
      FROM documents),
    px AS (
      SELECT doc_id, w, h,
             (1000 * doc_id + 257 * gx.x + 991 * gy.y) % 65536 AS g16,
             (1000 * doc_id + 257 * gx.x + 991 * gy.y + 0) % 65536
               + (1000 * doc_id + 257 * gx.x + 991 * gy.y + 7777) % 65536
               + (1000 * doc_id + 257 * gx.x + 991 * gy.y + 15554) % 65536
               AS g16i,
             (doc_id + gx.x + 2 * gy.y) % 16 AS g4,
             (doc_id + gx.x + gy.y) % 4 AS g2,
             (doc_id + gx.x + gy.y) % 2 AS g1,
             ((doc_id + gx.x + 2 * gy.y) % 16 * 17) % 256
               + ((doc_id + gx.x + 2 * gy.y) % 16 * 29) % 256
               + ((doc_id + gx.x + 2 * gy.y) % 16 * 53) % 256 AS gp
      FROM dims,
           unnest(CAST(range(0, w) AS BIGINT[])) AS gx(x),
           unnest(CAST(range(0, h) AS BIGINT[])) AS gy(y)
    )
    SELECT doc_id, CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
           CAST(sum(g16) AS BIGINT) AS sum16,
           CAST(sum(g16i) AS BIGINT) AS sum16i,
           CAST(sum(g4) AS BIGINT) AS sum4,
           CAST(sum(g2) AS BIGINT) AS sum2,
           CAST(sum(g1) AS BIGINT) AS sum1,
           CAST(sum(gp) AS BIGINT) AS sum_pal
    FROM px GROUP BY doc_id, w, h
    """,
    doc="non-8-bit PNG depth tier: 16-bit sequential + Adam7 (byte-wise "
    "filters at 2/6-byte units), 4/2/1-bit bit-packed scanlines, and a "
    "4-bit palette leg — five lossless round trips per id, sums "
    "closed-form",
    tags=("llmops", "multimodal"),
)
def q245(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.multimodal import png_depth_roundtrip_stats

    return png_depth_roundtrip_stats(load(spark, sf, "documents").select("doc_id"))
