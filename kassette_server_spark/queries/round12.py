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

The late-r12 wave (q244+) closes every remaining soft edge from
VERDICT r11 and completes two codec matrices:

- q244/q252/q251: the JPEG sampling/mode matrix — 4:2:0 (four-luma-
  block 16x16 MCUs, exact 2x2 box chroma), 4:2:2 (two-luma-block
  16x8 MCUs, horizontal 2:1 box), and PROGRESSIVE (SOF2 spectral
  selection, EOBRUN, coefficient accumulation, DC-prefix preview).
- q245: the non-8-bit PNG depths — 16-bit sequential + Adam7
  (byte-wise filters at 2/6-byte units) and 1/2/4-bit bit-packed
  rows, gray + palette.
- q246/q247/q253: the telephony audio tier — G.711 μ-law/A-law
  (exact segment/mantissa CASE-ladder oracle), IMA ADPCM (sequential
  predictor/step-index recurrence oracled as a DuckDB RECURSIVE CTE),
  and both inside real RIFF WAV containers with fact chunks and
  block-framed ADPCM (per-block predictor re-seed → independently
  decodable blocks, the audio twin of JPEG restarts).
- q248-q250: IVF-PQ — coarse cells + PQ on residuals + nprobe
  pruning with a broadcast hash join on cell id, the composed index
  a 100 TB corpus actually serves from.

Determinism: everything after the int8 quantize (q77's established
round(x·127/max|x|)) is exact int64 arithmetic; the only floats are
the recall divisions (q241/q250) and q243's per-channel means (one
IEEE division of exact integers each). Registered after the 50-spec
driver window; first driver rows land per the standing rotation
(queries/__init__.py r13 plan); locked meanwhile by
tests/test_oracle_parity*.py at two SFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..catalog import load
from ..operators.pq import (
    ivfpq_adc_oracle_sql,
    ivfpq_cell_oracle_sql,
    ivfpq_recall_oracle_sql,
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


# q246: G.711 companding (μ-law / A-law) — the telephony codecs every
# speech-corpus pipeline meets, 2:1 storage cut per sample. Both laws
# are exact integer segment/mantissa maps, so the DuckDB oracle
# replays encode AND decode as a CASE ladder: a hash match pins byte
# production (ones'-complement / XOR-0x55 included) and midpoint
# reconstruction on full-range int16 input.
@query(
    "q246_g711_companding",
    oracle="""
    WITH samples AS (
      SELECT doc_id, j.j,
             (7919 * doc_id + 104729 * j.j) % 65536 - 32768 AS s
      FROM documents, unnest(CAST(range(0, 64) AS BIGINT[])) AS j(j)
    ),
    mu AS (
      SELECT doc_id, s,
             CASE WHEN s < 0 THEN 128 ELSE 0 END AS sign,
             LEAST(abs(s), 32635) + 132 AS mag
      FROM samples
    ),
    mu2 AS (
      SELECT doc_id, s, sign, mag,
             CASE WHEN mag >= 16384 THEN 7 WHEN mag >= 8192 THEN 6
                  WHEN mag >= 4096 THEN 5 WHEN mag >= 2048 THEN 4
                  WHEN mag >= 1024 THEN 3 WHEN mag >= 512 THEN 2
                  WHEN mag >= 256 THEN 1 ELSE 0 END AS exp
      FROM mu
    ),
    mu3 AS (
      SELECT doc_id, s, sign, exp,
             (mag // (1 << (exp + 3))) % 16 AS mant
      FROM mu2
    ),
    mu4 AS (
      SELECT doc_id,
             255 - (sign + exp * 16 + mant) AS code,
             CASE WHEN sign = 128
                  THEN -(((mant * 8 + 132) * (1 << exp)) - 132)
                  ELSE ((mant * 8 + 132) * (1 << exp)) - 132 END AS dec
      FROM mu3
    ),
    al AS (
      SELECT doc_id, s,
             CASE WHEN s >= 0 THEN 128 ELSE 0 END AS sign,
             LEAST(abs(s), 32767) AS mag
      FROM samples
    ),
    al2 AS (
      SELECT doc_id, sign, mag,
             CASE WHEN mag >= 16384 THEN 7 WHEN mag >= 8192 THEN 6
                  WHEN mag >= 4096 THEN 5 WHEN mag >= 2048 THEN 4
                  WHEN mag >= 1024 THEN 3 WHEN mag >= 512 THEN 2
                  WHEN mag >= 256 THEN 1 ELSE 0 END AS exp
      FROM al
    ),
    al3 AS (
      SELECT doc_id, sign, exp,
             CASE WHEN exp = 0 THEN mag // 16
                  ELSE (mag // (1 << (exp + 3))) % 16 END AS mant
      FROM al2
    ),
    al4 AS (
      SELECT doc_id,
             xor(sign + exp * 16 + mant, 85) AS code,
             CASE WHEN sign = 128
                  THEN CASE WHEN exp = 0 THEN mant * 16 + 8
                            ELSE (mant * 16 + 264) * (1 << (exp - 1)) END
                  ELSE -(CASE WHEN exp = 0 THEN mant * 16 + 8
                              ELSE (mant * 16 + 264) * (1 << (exp - 1)) END)
             END AS dec
      FROM al3
    ),
    mu_agg AS (
      SELECT doc_id, CAST(sum(code) AS BIGINT) AS mu_code_sum,
             CAST(sum(dec) AS BIGINT) AS mu_decoded_sum
      FROM mu4 GROUP BY doc_id
    ),
    a_agg AS (
      SELECT doc_id, CAST(sum(code) AS BIGINT) AS a_code_sum,
             CAST(sum(dec) AS BIGINT) AS a_decoded_sum
      FROM al4 GROUP BY doc_id
    )
    SELECT m.doc_id, CAST(64 AS BIGINT) AS n,
           m.mu_code_sum, m.mu_decoded_sum, a.a_code_sum, a.a_decoded_sum
    FROM mu_agg m JOIN a_agg a USING (doc_id)
    """,
    doc="G.711 companding both laws: 64 full-range int16 samples per id "
    "mu-law and A-law encoded and midpoint-decoded; oracle replays the "
    "segment/mantissa CASE ladder in both directions",
    tags=("llmops", "multimodal", "audio"),
)
def q246(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.multimodal import g711_roundtrip_stats

    return g711_roundtrip_stats(load(spark, sf, "documents").select("doc_id"))


# q247: IMA ADPCM — the 4:1 predictive speech codec (WAV format 17).
# Genuinely SEQUENTIAL state (predictor + step index threaded through
# the stream), so the oracle replays the recurrence as a DuckDB
# RECURSIVE CTE: 64 iterations of a |documents|-row working table,
# layered subqueries quantizing the prediction error exactly as the
# engine's encoder does. The decoder reconstructs the encoder's
# predictor walk, so one recurrence pins both directions; the engine
# side additionally asserts decode(encode(x)) equals that walk.
_IMA_STEPS_SQL = "[" + ",".join(
    str(v)
    for v in (
        7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31,
        34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130,
        143, 157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449,
        494, 544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411,
        1552, 1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026,
        4428, 4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442,
        11487, 12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623,
        27086, 29794, 32767,
    )
) + "]"


@query(
    "q247_ima_adpcm",
    oracle=f"""
    WITH RECURSIVE
    steps(doc_id, j, pred, idx, acc_code, acc_pred) AS (
      SELECT doc_id, CAST(-1 AS BIGINT), CAST(0 AS BIGINT),
             CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT)
      FROM documents
      UNION ALL
      SELECT doc_id, j,
             GREATEST(-32768, LEAST(32767,
               pred + CASE WHEN sgn = 1 THEN -diff ELSE diff END)) AS pred,
             GREATEST(0, LEAST(88, idx +
               CASE mag WHEN 0 THEN -1 WHEN 1 THEN -1 WHEN 2 THEN -1
                        WHEN 3 THEN -1 WHEN 4 THEN 2 WHEN 5 THEN 4
                        WHEN 6 THEN 6 ELSE 8 END)) AS idx,
             acc_code + 8 * sgn + mag,
             acc_pred + GREATEST(-32768, LEAST(32767,
               pred + CASE WHEN sgn = 1 THEN -diff ELSE diff END))
      FROM (
        SELECT *,
               (step // 8) + b2 * step + b1 * (step // 2) + b0 * (step // 4)
                 AS diff,
               4 * b2 + 2 * b1 + b0 AS mag
        FROM (
          SELECT *, CASE WHEN r2 >= step // 4 THEN 1 ELSE 0 END AS b0
          FROM (
            SELECT *,
                   CASE WHEN r1 >= step // 2 THEN 1 ELSE 0 END AS b1,
                   r1 - CASE WHEN r1 >= step // 2 THEN step // 2 ELSE 0 END
                     AS r2
            FROM (
              SELECT *,
                     CASE WHEN ad >= step THEN 1 ELSE 0 END AS b2,
                     ad - CASE WHEN ad >= step THEN step ELSE 0 END AS r1
              FROM (
                SELECT doc_id, j + 1 AS j, pred, idx, acc_code, acc_pred,
                       list_extract({_IMA_STEPS_SQL}, idx + 1) AS step,
                       CASE WHEN x - pred < 0 THEN 1 ELSE 0 END AS sgn,
                       abs(x - pred) AS ad
                FROM (
                  SELECT *,
                         (7919 * doc_id + 104729 * (j + 1)) % 65536 - 32768
                           AS x
                  FROM steps WHERE j < 63
                )
              )
            )
          )
        )
      )
    )
    SELECT doc_id, CAST(64 AS BIGINT) AS n, acc_code AS code_sum,
           acc_pred AS decoded_sum, pred AS final_pred,
           idx AS final_index
    FROM steps WHERE j = 63
    """,
    doc="IMA ADPCM (WAV format 17): 64 full-range samples per id "
    "through the sequential predictor/step-index state machine, 4:1 "
    "packed nibbles, decode asserted equal to the encoder's predictor "
    "walk; oracle = recursive CTE replay of the recurrence",
    tags=("llmops", "multimodal", "audio"),
)
def q247(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.multimodal import ima_adpcm_roundtrip_stats

    return ima_adpcm_roundtrip_stats(load(spark, sf, "documents").select("doc_id"))


# q248-q250: IVF-PQ — the composed index a 100 TB corpus actually
# serves from (coarse cells + PQ on RESIDUALS + nprobe cell pruning),
# completing the ANN stack's scale path: int8 (q77) → JL sketch
# (q220) → IVF (q83) → PQ/ADC (q239-q241) → IVF-PQ. The cell-
# membership join is an EQUI-join (broadcast hash), unlike flat ADC's
# nested-loop scan, and only nprobe/kc of the corpus is scored.
@query(
    "q248_ivfpq_cells",
    oracle=ivfpq_cell_oracle_sql(kc=8, citers=2, dim=64),
    doc="IVF coarse layout: 8 full-dimension integer centroids (q96 "
    "Lloyd contract), per-cell population and exact residual moments "
    "— the physical partitioning of a served 100 TB index",
    tags=("llmops", "similarity", "pq", "ivf"),
)
def q248(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.pq import ivfpq_cell_stats

    return ivfpq_cell_stats(load(spark, sf, "embeddings"), kc=8, iters=2)


@query(
    "q249_ivfpq_adc_topk",
    oracle=ivfpq_adc_oracle_sql(kc=8, citers=2, m=8, k=16, d=8, riters=2, topk=10, nprobe=2),
    doc="IVF-PQ search: probe the 2 nearest of 8 cells, per-cell "
    "residual ADC tables, broadcast equi-join on cell id — exact "
    "int64 distances, bit-portable ranks",
    tags=("llmops", "similarity", "pq", "ivf"),
)
def q249(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.pq import ivfpq_adc_topk

    return ivfpq_adc_topk(
        load(spark, sf, "embeddings"), _queries(spark, sf),
        kc=8, m=8, k=16, iters=2, topk=10, nprobe=2,
    )


@query(
    "q250_ivfpq_recall",
    oracle=ivfpq_recall_oracle_sql(kc=8, citers=2, m=8, k=16, d=8, riters=2, topk=10, nprobe=2),
    doc="IVF-PQ acceptance gate: recall@10 against exact int8-L2 — "
    "measures cell-pruning loss AND residual quantization loss "
    "together on the query sample before the index serves",
    tags=("llmops", "similarity", "pq", "ivf"),
)
def q250(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.pq import ivfpq_recall_at_k

    return ivfpq_recall_at_k(
        load(spark, sf, "embeddings"), _queries(spark, sf),
        kc=8, m=8, k=16, iters=2, topk=10, nprobe=2,
    )


# q251: progressive JPEG (SOF2) — the LAST refused JPEG mode, closing
# VERDICT r11 soft-edge (a) entirely (restarts landed early-r12 as
# q242, 4:2:0 as q244). Spectral selection: interleaved DC scan + one
# AC scan per component with EOBRUN; the decoder accumulates
# coefficients across scans and runs one IDCT at EOI. Block-constant
# channels round-trip bit-exactly; the operator ALSO asserts in-path
# that a lossy full-range image decodes byte-identically via baseline
# and progressive (same quantized coefficients, different scan order).
@query(
    "q251_jpeg_progressive_roundtrip",
    oracle="""
    WITH dims AS (
      SELECT doc_id, 8 + doc_id % 24 AS w, 8 + (doc_id * 3) % 16 AS h
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
    SELECT doc_id, CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
           CAST(4 AS BIGINT) AS n_scans,
           CAST(sum(c0) AS BIGINT) AS sum_c0,
           CAST(sum(c1) AS BIGINT) AS sum_c1,
           CAST(sum(c2) AS BIGINT) AS sum_c2
    FROM px GROUP BY doc_id, w, h
    """,
    doc="progressive JPEG (SOF2): interleaved DC scan + per-component "
    "AC scans with EOBRUN through the coefficient-accumulation decoder "
    "— bit-exact on block-constant channels, plus an in-path "
    "baseline-vs-progressive byte-identity assert on lossy content",
    tags=("llmops", "multimodal"),
)
def q251(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.multimodal import jpeg_progressive_roundtrip_stats

    return jpeg_progressive_roundtrip_stats(
        load(spark, sf, "documents").select("doc_id")
    )


# q252: 4:2:2 — the broadcast-video sampling layout, completing the
# JPEG sampling matrix (4:4:4 q233/q243, 4:2:0 q244, progressive
# q251). MCU = 16x8 tile with two 2x1 luma blocks; chroma 2:1
# box-averaged in x only with exact round-half-up, so per-16x8-tile-
# constant channels survive the lossy path bit-exactly.
@query(
    "q252_jpeg_422_roundtrip",
    oracle="""
    WITH dims AS (
      SELECT doc_id, 16 + doc_id % 37 AS w, 8 + (doc_id * 3) % 21 AS h
      FROM documents),
    px AS (
      SELECT doc_id, w, h,
             (doc_id + 0 + 3 * (gx.x // 16) + 5 * (gy.y // 8)) % 256 AS c0,
             (doc_id + 1 + 3 * (gx.x // 16) + 5 * (gy.y // 8)) % 256 AS c1,
             (doc_id + 2 + 3 * (gx.x // 16) + 5 * (gy.y // 8)) % 256 AS c2
      FROM dims,
           unnest(CAST(range(0, w) AS BIGINT[])) AS gx(x),
           unnest(CAST(range(0, h) AS BIGINT[])) AS gy(y)
    )
    SELECT doc_id, CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
           CAST(((w + 15) // 16) * ((h + 7) // 8) AS BIGINT) AS n_mcus,
           CAST(sum(c0) AS BIGINT) AS sum_c0,
           CAST(sum(c1) AS BIGINT) AS sum_c1,
           CAST(sum(c2) AS BIGINT) AS sum_c2
    FROM px GROUP BY doc_id, w, h
    """,
    doc="JPEG 4:2:2 round trip: two-luma-block 16x8 MCUs, exact "
    "horizontal 2:1 chroma box average, restart markers — bit-exact "
    "on tile-constant content, sums closed-form in the id",
    tags=("llmops", "multimodal"),
)
def q252(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.multimodal import jpeg_422_roundtrip_stats

    return jpeg_422_roundtrip_stats(
        load(spark, sf, "documents").select("doc_id"), restart_interval=2
    )


# q253: the compressed-WAV container tier — A-law/μ-law (formats 6/7)
# and IMA ADPCM (format 0x11) through REAL RIFF containers with fact
# chunks and block framing. The IMA blocks re-seed the predictor from
# each 4-byte header (index carries), so every block decodes
# independently — the audio twin of JPEG restart segments. The oracle
# composes the q246 CASE ladders with the q247 recursive CTE extended
# by the per-block re-seed (j mod 17 = 0 → predictor := raw sample).
@query(
    "q253_wav_codec_container",
    oracle=f"""
    WITH RECURSIVE samples AS (
      SELECT doc_id, j.j,
             (7919 * doc_id + 104729 * j.j) % 65536 - 32768 AS s
      FROM documents,
           unnest(CAST(range(0, 128) AS BIGINT[])) AS j(j)
      WHERE j.j < 64 + doc_id % 64
    ),
    mu AS (
      SELECT doc_id, s, CASE WHEN s < 0 THEN 128 ELSE 0 END AS sign,
             LEAST(abs(s), 32635) + 132 AS mag FROM samples),
    mu2 AS (
      SELECT doc_id, s, sign, mag,
             CASE WHEN mag >= 16384 THEN 7 WHEN mag >= 8192 THEN 6
                  WHEN mag >= 4096 THEN 5 WHEN mag >= 2048 THEN 4
                  WHEN mag >= 1024 THEN 3 WHEN mag >= 512 THEN 2
                  WHEN mag >= 256 THEN 1 ELSE 0 END AS exp FROM mu),
    mu3 AS (
      SELECT doc_id, sign, exp, (mag // (1 << (exp + 3))) % 16 AS mant
      FROM mu2),
    mu4 AS (
      SELECT doc_id,
             CASE WHEN sign = 128
                  THEN -(((mant * 8 + 132) * (1 << exp)) - 132)
                  ELSE ((mant * 8 + 132) * (1 << exp)) - 132 END AS dec
      FROM mu3),
    al AS (
      SELECT doc_id, CASE WHEN s >= 0 THEN 128 ELSE 0 END AS sign,
             LEAST(abs(s), 32767) AS mag FROM samples),
    al2 AS (
      SELECT doc_id, sign, mag,
             CASE WHEN mag >= 16384 THEN 7 WHEN mag >= 8192 THEN 6
                  WHEN mag >= 4096 THEN 5 WHEN mag >= 2048 THEN 4
                  WHEN mag >= 1024 THEN 3 WHEN mag >= 512 THEN 2
                  WHEN mag >= 256 THEN 1 ELSE 0 END AS exp FROM al),
    al3 AS (
      SELECT doc_id, sign, exp,
             CASE WHEN exp = 0 THEN mag // 16
                  ELSE (mag // (1 << (exp + 3))) % 16 END AS mant FROM al2),
    al4 AS (
      SELECT doc_id,
             CASE WHEN sign = 128
                  THEN CASE WHEN exp = 0 THEN mant * 16 + 8
                            ELSE (mant * 16 + 264) * (1 << (exp - 1)) END
                  ELSE -(CASE WHEN exp = 0 THEN mant * 16 + 8
                              ELSE (mant * 16 + 264) * (1 << (exp - 1)) END)
             END AS dec FROM al3),
    steps(doc_id, j, pred, idx, acc_pred) AS (
      SELECT doc_id, CAST(-1 AS BIGINT), CAST(0 AS BIGINT),
             CAST(0 AS BIGINT), CAST(0 AS BIGINT)
      FROM documents
      UNION ALL
      SELECT doc_id, j,
             CASE WHEN j % 17 = 0 THEN x
                  ELSE GREATEST(-32768, LEAST(32767,
                    pred + CASE WHEN sgn = 1 THEN -diff ELSE diff END))
             END AS pred,
             CASE WHEN j % 17 = 0 THEN idx
                  ELSE GREATEST(0, LEAST(88, idx +
                    CASE mag WHEN 0 THEN -1 WHEN 1 THEN -1 WHEN 2 THEN -1
                             WHEN 3 THEN -1 WHEN 4 THEN 2 WHEN 5 THEN 4
                             WHEN 6 THEN 6 ELSE 8 END))
             END AS idx,
             acc_pred + CASE WHEN j % 17 = 0 THEN x
                  ELSE GREATEST(-32768, LEAST(32767,
                    pred + CASE WHEN sgn = 1 THEN -diff ELSE diff END))
             END
      FROM (
        SELECT *,
               (step // 8) + b2 * step + b1 * (step // 2) + b0 * (step // 4)
                 AS diff,
               4 * b2 + 2 * b1 + b0 AS mag
        FROM (
          SELECT *, CASE WHEN r2 >= step // 4 THEN 1 ELSE 0 END AS b0
          FROM (
            SELECT *,
                   CASE WHEN r1 >= step // 2 THEN 1 ELSE 0 END AS b1,
                   r1 - CASE WHEN r1 >= step // 2 THEN step // 2 ELSE 0 END
                     AS r2
            FROM (
              SELECT *,
                     CASE WHEN ad >= step THEN 1 ELSE 0 END AS b2,
                     ad - CASE WHEN ad >= step THEN step ELSE 0 END AS r1
              FROM (
                SELECT doc_id, j + 1 AS j, pred, idx, acc_pred,
                       list_extract({_IMA_STEPS_SQL}, idx + 1) AS step,
                       CASE WHEN x - pred < 0 THEN 1 ELSE 0 END AS sgn,
                       abs(x - pred) AS ad, x
                FROM (
                  SELECT *,
                         (7919 * doc_id + 104729 * (j + 1)) % 65536 - 32768
                           AS x
                  FROM steps WHERE j + 1 < 64 + doc_id % 64
                )
              )
            )
          )
        )
      )
    ),
    mu_agg AS (SELECT doc_id, CAST(sum(dec) AS BIGINT) AS mulaw_sum
               FROM mu4 GROUP BY doc_id),
    a_agg AS (SELECT doc_id, CAST(sum(dec) AS BIGINT) AS alaw_sum
              FROM al4 GROUP BY doc_id),
    ima_agg AS (SELECT doc_id, acc_pred AS ima_sum FROM steps
                WHERE j = 63 + doc_id % 64)
    SELECT m.doc_id, CAST(64 + m.doc_id % 64 AS BIGINT) AS n,
           CAST((64 + m.doc_id % 64 + 16) // 17 AS BIGINT) AS n_blocks,
           a.alaw_sum, m.mulaw_sum, i.ima_sum
    FROM mu_agg m JOIN a_agg a USING (doc_id) JOIN ima_agg i USING (doc_id)
    """,
    doc="compressed WAV containers: A-law/mu-law (formats 6/7) and "
    "block-framed IMA ADPCM (format 0x11) through real RIFF+fact "
    "parse and block decode; IMA blocks re-seed the predictor per "
    "header — independently decodable, the audio twin of JPEG "
    "restarts",
    tags=("llmops", "multimodal", "audio"),
)
def q253(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.multimodal import wav_codec_container_stats

    return wav_codec_container_stats(load(spark, sf, "documents").select("doc_id"))
