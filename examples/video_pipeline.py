#!/usr/bin/env python
"""Video at 100 TB scale: MJPEG-in-AVI clips as opaque binary columns
through the r15 video tier (operators/multimodal.py):

  1. sniff + verified container metadata (decode_media_meta /
     parse_avi_meta — avih/strh/movi/idx1 cross-checked, corrupt
     clips degrade to kind='unknown' instead of killing the scan)
  2. frame sampling (frame_sample — every-Nth frame through the real
     baseline-JPEG decoder; unselected frames are never
     entropy-decoded, so sampling cost is O(selected))
  3. resize + re-mux (mjpeg_avi_resample_stats's chain: decimate
     sampled frames 2x and re-encode into a new, smaller AVI — the
     normalize step before a training shard write)

Scale shape: every stage is ONE Arrow-batched mapInPandas behind the
input-width guard (ensure_scan_parallelism — a no-op on real
many-split corpora). Within a clip, every '00dc' chunk is an
independent JPEG, so a long clip parallel-decodes on its idx1 index —
the JPEG restart-segment property at frame granularity; across clips,
rows parallelize freely. Feature rows (small, typed) should be
written columnar and joined back by doc_id, never carried alongside
the blob.

Run: python examples/video_pipeline.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from pyspark.sql import functions as F

from kassette_server_spark.catalog import load
from kassette_server_spark.operators.multimodal import (
    decode_media_meta,
    frame_sample,
    mjpeg_avi_frame_stats,
    mjpeg_avi_resample_stats,
)
from kassette_server_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="video-pipeline")
    ids = load(spark, sf_dir, "documents").select("doc_id")

    # 1. synthesize a clip corpus (the test-data stand-in for a real
    #    binary column) and sniff verified metadata
    from collections.abc import Iterator

    import pandas as pd

    from kassette_server_spark.operators.multimodal import encode_avi_mjpeg

    def clips(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for v in pdf["doc_id"]:
                i = int(v)
                w, h = 8 + i % 16, 8 + (i * 3) % 12
                frames = [
                    (
                        (
                            i
                            + 7 * f
                            + 3 * (np.arange(w)[None, :] // 8)
                            + 5 * (np.arange(h)[:, None] // 8)
                        )
                        % 256
                    )
                    .astype(np.uint8)
                    .tobytes()
                    for f in range(2 + i % 3)
                ]
                rows.append((i, encode_avi_mjpeg(w, h, frames, channels=1)))
            yield pd.DataFrame(rows, columns=["doc_id", "payload"])

    corpus = ids.mapInPandas(clips, schema="doc_id long, payload binary")
    meta = decode_media_meta(corpus)
    print("clip kinds:")
    meta.groupBy("kind").count().show()

    # 2. sample every 2nd frame and extract per-frame statistics
    feats = frame_sample(corpus, every_n=2)
    print("sampled frames:", feats.count())
    feats.agg(
        F.count("*").alias("frames"),
        F.avg("px_sum").alias("mean_px_sum"),
    ).show()

    # 3. the resize + re-mux chain (generator-backed spec form: the
    #    same per-clip chain the q260 oracle checks value-for-value)
    resized = mjpeg_avi_resample_stats(ids, every_n=2)
    print("resized sampled frames:", resized.count())

    # the q259 spec form, for plan inspection
    mjpeg_avi_frame_stats(ids, every_n=2).explain("formatted")
    spark.stop()


if __name__ == "__main__":
    main()
