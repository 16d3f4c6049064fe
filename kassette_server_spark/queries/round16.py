"""Round-16 specs: the AVI audio track joins the codec surface.

- q261: AVI audio extraction (multimodal.avi_audio_stats — VERDICT
  r15 "What's missing" #4 / "Next round #6": ``_avi_parse`` used to
  identify and *skip* the interleaved 'NNwb' chunks; audio+video
  clips are what a real 100 TB crawl holds): per id, a REAL
  MJPEG-in-AVI clip with 2 + id mod 3 video frames AND an interleaved
  μ-law audio stream (second strl: strh 'auds' + strf WAVEFORMATEX,
  one '01wb' chunk per frame, idx1 records for both streams). The
  audio samples are the q246 closed-form telephony sequence
  s_j = ((7919·id + 104729·j) mod 65536) − 32768, j < 64, so the
  DuckDB oracle replays the μ-law segment/mantissa CASE ladder in
  both directions with zero engine involvement; frame 0's
  entropy-decoded pixel sum (whole-frame constants are in the JPEG
  lossless subset) pins the video stream of the same container.

  Scale shape: one Arrow-batched mapInPandas behind the input-width
  guard; the audio chunks are independently-decodable G.711 bytes
  (sample-aligned splits), so at 100 TB a long track decodes
  per-chunk-range in parallel exactly like the video frames do.

Reference parity: kassette-server has no media path (SURVEY.md §2.3
north-star surface — engine-native, like the rest of the codec
matrix).

Registered after the 50-spec driver window; first driver row lands
r17 per the standing rotation (queries/__init__.py r17 plan note);
locked meanwhile by tests/test_oracle_parity*.py at two SFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..catalog import load
from .base import query


@query(
    "q261_avi_audio_extract",
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
    )
    SELECT doc_id, CAST(64 AS BIGINT) AS n,
           CAST(2 + doc_id % 3 AS BIGINT) AS n_frames,
           CAST(2 + doc_id % 3 AS BIGINT) AS n_chunks,
           CAST(sum(code) AS BIGINT) AS code_sum,
           CAST(sum(dec) AS BIGINT) AS decoded_sum,
           CAST(64 * (doc_id % 256) AS BIGINT) AS vid0_sum
    FROM mu4 GROUP BY doc_id
    """,
    doc="AVI audio track extraction: interleaved mu-law stream through "
    "the full two-strl container path (header walk, '01wb' chunk "
    "interleave, dual-stream idx1 verification), G.711-decoded; "
    "code and decoded sums closed-form via the q246 CASE ladder, "
    "frame 0's pixel sum pins the video stream of the same container",
    tags=("llmops", "multimodal", "audio", "video"),
)
def q261(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.multimodal import avi_audio_stats

    return avi_audio_stats(load(spark, sf, "documents").select("doc_id"))
