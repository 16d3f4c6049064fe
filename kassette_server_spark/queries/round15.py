"""Round-15 specs: the video modality becomes a real codec.

- q260: video resize + re-mux (multimodal.mjpeg_avi_resample_stats):
  sample every 2nd frame, exact 2x nearest-neighbor decimation, JPEG
  re-encode, NEW AVI re-mux, full second parse+decode — the transform
  leg of the multimodal brief at clip granularity; 16x16-tile-constant
  sources halve into the JPEG lossless subset so the final sums stay
  closed-form in (id, frame).

- q259: MJPEG-in-AVI frame sampling
  (multimodal.mjpeg_avi_frame_stats — closes the package's LAST
  NotImplementedError plug point, VERDICT r14 "Next round #3"): per
  id, a real RIFF/AVI clip (LIST hdrl with avih/strh/strf, '00dc'
  baseline-JPEG frames under LIST movi, verified idx1 index) with
  2 + id mod 3 frames, every 2nd frame decoded through the full JPEG
  entropy path. Frame f's grayscale pixels are per-8x8-block-constant
  v(x, y, f) = (id + 7·f + 3·(x div 8) + 5·(y div 8)) mod 256 —
  q233's lossless-subset identity per frame — so each sampled frame's
  post-decode pixel sum is closed-form in (id, f) and DuckDB can
  recompute it from the formulas alone. The container walk
  cross-checks avih/strh/movi/idx1 against each other, so a lying
  header or corrupted index raises rather than mis-samples.

  Scale shape: one Arrow-batched mapInPandas behind the input-width
  guard; at 100 TB a long clip splits on idx1 entries and frames
  decode concurrently (every frame is an independent JPEG — the
  restart-marker property at frame granularity). Unselected frames
  are never entropy-decoded: sampling cost is O(selected), the chunk
  walk O(bytes).

Reference parity: kassette-server has no video path (SURVEY.md §2.3
north-star surface — engine-native, like the rest of the codec
matrix).

Registered after the 50-spec driver window; first driver rows land
per the standing rotation (queries/__init__.py r16 plan note);
locked meanwhile by tests/test_oracle_parity*.py at two SFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..catalog import load
from .base import query


@query(
    "q259_mjpeg_avi_frames",
    oracle="""
    WITH dims AS (
      SELECT doc_id, 8 + doc_id % 16 AS w, 8 + (doc_id * 3) % 12 AS h,
             2 + doc_id % 3 AS nf
      FROM documents),
    fr AS (
      SELECT doc_id, w, h, f.f AS frame_idx
      FROM dims, unnest(CAST(range(0, nf) AS BIGINT[])) AS f(f)
      WHERE f.f % 2 = 0),
    px AS (
      SELECT doc_id, frame_idx, w, h,
             (doc_id + 7 * frame_idx + 3 * (gx.x // 8) + 5 * (gy.y // 8))
               % 256 AS p
      FROM fr,
           unnest(CAST(range(0, w) AS BIGINT[])) AS gx(x),
           unnest(CAST(range(0, h) AS BIGINT[])) AS gy(y))
    SELECT doc_id, frame_idx,
           CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
           CAST(sum(p) AS BIGINT) AS px_sum
    FROM px GROUP BY doc_id, frame_idx, w, h
    """,
    doc="real MJPEG-in-AVI frame sampling: RIFF container walk with "
    "header/index cross-checks, every-2nd-frame baseline-JPEG entropy "
    "decode, per-frame pixel sums closed-form in (id, frame)",
    tags=("llmops", "multimodal", "video"),
)
def q259(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.multimodal import mjpeg_avi_frame_stats

    return mjpeg_avi_frame_stats(
        load(spark, sf, "documents").select("doc_id"), every_n=2
    )


@query(
    "q260_mjpeg_avi_resample",
    oracle="""
    WITH dims AS (
      SELECT doc_id,
             (16 + 2 * (doc_id % 8)) // 2 AS nw,
             (16 + 2 * ((doc_id * 3) % 6)) // 2 AS nh,
             2 + doc_id % 3 AS nf
      FROM documents),
    fr AS (
      SELECT doc_id, nw, nh, f.f AS frame_idx
      FROM dims, unnest(CAST(range(0, nf) AS BIGINT[])) AS f(f)
      WHERE f.f % 2 = 0),
    px AS (
      SELECT doc_id, frame_idx, nw, nh,
             (doc_id + 7 * frame_idx + 3 * (gx.x // 8) + 5 * (gy.y // 8))
               % 256 AS p
      FROM fr,
           unnest(CAST(range(0, nw) AS BIGINT[])) AS gx(x),
           unnest(CAST(range(0, nh) AS BIGINT[])) AS gy(y))
    SELECT doc_id, frame_idx,
           CAST(nw AS BIGINT) AS width, CAST(nh AS BIGINT) AS height,
           CAST(sum(p) AS BIGINT) AS px_sum
    FROM px GROUP BY doc_id, frame_idx, nw, nh
    """,
    doc="video resize + re-mux: MJPEG-in-AVI clip -> sample every 2nd "
    "frame -> exact 2x nearest-neighbor decimation -> JPEG re-encode -> "
    "new AVI -> full re-parse + re-decode; 16x16-tile-constant sources "
    "halve into the JPEG lossless subset, sums closed-form in (id, frame)",
    tags=("llmops", "multimodal", "video"),
)
def q260(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.multimodal import mjpeg_avi_resample_stats

    return mjpeg_avi_resample_stats(
        load(spark, sf, "documents").select("doc_id"), every_n=2
    )
