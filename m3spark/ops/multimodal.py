"""Multimodal-column plumbing: opaque binary payloads + typed metadata.

Image/audio decode libraries are not available in this container, so the
decode step is a deterministic fake behind a clearly-marked seam
(``_decode_payload``) — the Spark-side contract (schema, Arrow batching
over ``mapInPandas``, partition behavior) is real and tested.  Swapping
in a real decoder (PIL/librosa/ffmpeg) changes only ``_decode_payload``.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    DoubleType, IntegerType, StringType, StructField, StructType,
)

FEATURE_SCHEMA = StructType([
    StructField("media_type", StringType()),
    StructField("n_bytes", IntegerType()),
    StructField("checksum", StringType()),
    StructField("feature_mean", DoubleType()),
])


def _decode_payload(raw: bytes) -> dict:
    """STUB decoder: real deployments replace this with image decode /
    audio frame extraction.  Deterministic fake: byte-level stats stand
    in for pixel/sample features."""
    import hashlib
    if raw[:4] == b"\x89PNG":
        mt = "image/png"
    elif raw[:3] == b"\xff\xd8\xff":
        mt = "image/jpeg"
    elif raw[:4] == b"RIFF":
        mt = "audio/wav"
    else:
        mt = "application/octet-stream"
    # unrounded: callers choose presentation rounding (Spark F.round's
    # HALF_UP matches DuckDB ROUND; Python's banker's round does not)
    mean = (sum(raw) / len(raw)) if raw else 0.0
    return {"media_type": mt, "n_bytes": len(raw),
            "checksum": hashlib.md5(raw).hexdigest()[:16],
            "feature_mean": mean}


def decode_binary_features(df: DataFrame, binary_col: str,
                           id_col: str) -> DataFrame:
    """(id, media_type, n_bytes, checksum, feature_mean) via Arrow-batched
    mapInPandas — the hot-path shape for real decoders: one Python process
    per task, one Arrow batch per ~10k rows, columnar in/out."""
    out_schema = StructType(
        [f for f in df.schema.fields if f.name == id_col]
        + list(FEATURE_SCHEMA.fields))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf[binary_col].map(
                lambda b: _decode_payload(bytes(b)) if b is not None else
                {"media_type": None, "n_bytes": None, "checksum": None,
                 "feature_mean": None})
            out = pd.DataFrame({id_col: pdf[id_col]})
            for k in ("media_type", "n_bytes", "checksum", "feature_mean"):
                out[k] = feats.map(lambda d, _k=k: d[_k])
            yield out

    return df.select(id_col, binary_col).mapInPandas(run, out_schema)
