"""Round-10 wave (q230+): the verdict's soft-edge closures made
first-class specs.

- q231: temperature mixing at τ=0.75 (curation.temperature_mix,
  VERDICT r9 #6) — the quarter-grid generalization's hardest point:
  weight c^0.75 as sqrt(c)·sqrt(sqrt(c)), two correctly-rounded IEEE
  sqrts and one multiply, bit-exact cross-engine without libm pow;
  same sorted-fold denominator and largest-remainder apportionment
  as q224's τ=0.5.
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
from ..operators.curation import temperature_mix_oracle_sql
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


@query(
    "q231_temperature_mix_tau75",
    oracle=temperature_mix_oracle_sql("documents", total_budget=10_000, tau=0.75),
    doc="temperature-0.75 domain rebalancing: composed-sqrt weight "
    "sqrt(c)*sqrt(sqrt(c)), largest-remainder integer targets summing "
    "exactly to the budget - the quarter-grid tau generalization",
    tags=("llmops", "curation"),
)
def q231(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.curation import temperature_mix

    return temperature_mix(
        load(spark, sf, "documents"),
        domain_col="lang",
        total_budget=10_000,
        tau=0.75,
    )
