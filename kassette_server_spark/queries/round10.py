"""Round-10 wave (q230+): the verdict's soft-edge closures made
first-class specs.

- q230: PNG nearest-neighbor resize (multimodal.png_resize_stats) —
  the COMPRESSED-format member of the resize tier (VERDICT r9 #4; BMP
  proved the uncompressed path in q218). Formula-pixel grayscale PNGs
  go through the full zlib inflate → scanline de-filter → index-map →
  deflate round trip and are re-parsed POST-transform; the pixel sum
  of the resized image is closed-form in the id because the
  nearest-neighbor source index is (x·w div (w div 2)) — the q84
  oracle recipe on a compressed container.

Determinism: q230 is all-integer (pixel bytes, closed-form sums).

Registered after the 50-spec driver window; first driver rows land
per the standing rotation (queries/__init__.py r11 plan — round-born
specs take first-round priority; locked meanwhile by
tests/test_oracle_parity*.py at two SFs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..catalog import load
from .base import query


@query(
    "q230_png_resize",
    oracle="""
    WITH dims AS (
      SELECT doc_id, 8 + doc_id % 16 AS w, 8 + (doc_id * 3) % 12 AS h
      FROM documents),
    d2 AS (SELECT doc_id, w, h, w // 2 AS nw, h // 2 AS nh FROM dims),
    px AS (
      SELECT doc_id, nw, nh,
             (doc_id + 3 * ((gx.x * w) // nw) + 5 * ((gy.y * h) // nh)) % 256
               AS p
      FROM d2,
           unnest(CAST(range(0, nw) AS BIGINT[])) AS gx(x),
           unnest(CAST(range(0, nh) AS BIGINT[])) AS gy(y)
    )
    SELECT doc_id, CAST(nw AS BIGINT) AS width, CAST(nh AS BIGINT) AS height,
           CAST(sum(p) AS BIGINT) AS px_sum
    FROM px GROUP BY doc_id, nw, nh
    """,
    doc="real compressed-format resize: grayscale PNG nearest-neighbor "
    "half-scale through inflate -> de-filter -> deflate, re-parsed "
    "post-transform, pixel sums closed-form in the id",
    tags=("llmops", "multimodal"),
)
def q230(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.multimodal import png_resize_stats

    return png_resize_stats(load(spark, sf, "documents").select("doc_id"))
