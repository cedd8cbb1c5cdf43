"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as `binary` columns with a
typed metadata struct; decode/feature-extract stages are Arrow-batched
``mapInPandas`` transforms. The decode kernels themselves are STUBBED
behind a deterministic fake (the container ships no image/audio codecs),
but the Spark-side contract — schema, batching, partition behavior, UDF
signature — is real and tested.

Reference analog: page-image ndarrays flowing through preprocess/OCR
(reference backend/services/document_processor.py:232-285); there the
payload is in-memory per process, here it is a column that shuffles,
spills and prunes like any other.
"""
from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_META_TYPE = T.StructType([
    T.StructField("media_ref", T.StringType()),
    T.StructField("mime", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("n_bytes", T.LongType()),
])

FEATURE_TYPE = T.StructType([
    T.StructField("media_ref", T.StringType()),
    T.StructField("mime", T.StringType()),
    T.StructField("feat_mean", T.DoubleType()),
    T.StructField("feat_std", T.DoubleType()),
    T.StructField("feat_hash", T.StringType()),
])


def decode_image(payload: bytes) -> "object":
    """Real decode would go through PIL/OpenCV — not present in this
    container. The plumbing is exercised with deterministic fake features
    instead (see fake_features)."""
    raise NotImplementedError(
        "image codecs are not available in this environment; "
        "use fake_features for plumbing tests")


def fake_features(payload: bytes) -> tuple:
    """Deterministic stand-in for a decode+pool feature extractor:
    byte-level mean/std. Same numbers on any executor, any batch split."""
    import numpy as np
    arr = np.frombuffer(payload, dtype=np.uint8)
    if arr.size == 0:
        return 0.0, 0.0
    return float(np.round(arr.mean(), 6)), float(np.round(arr.std(), 6))


def pil_features(payload: bytes) -> tuple:
    """Real decode+pool kernel: grayscale pixel mean/std via PIL. Only
    callable where the codec libraries exist (not this sandbox)."""
    from io import BytesIO

    import numpy as np
    from PIL import Image  # noqa: F401  (import gate lives in the resolver)
    img = np.asarray(Image.open(BytesIO(payload)).convert("L"),
                     dtype=np.uint8)
    if img.size == 0:
        return 0.0, 0.0
    return float(np.round(img.mean(), 6)), float(np.round(img.std(), 6))


def resolve_feature_kernel():
    """Executor-side capability probe: the real PIL kernel when codecs are
    importable, the deterministic fake otherwise. Called once per task
    inside the iterator UDF, so a codec-equipped cluster lights up real
    decode with zero code changes (and zero driver-side imports)."""
    try:
        import PIL.Image  # noqa: F401
        return pil_features
    except ImportError:
        return fake_features


def with_media_meta(df: DataFrame, payload_col: str = "payload",
                    mime_col: str = "mime") -> DataFrame:
    """Typed metadata over an opaque binary column — pure expressions."""
    return df.withColumn("n_bytes", F.length(F.col(payload_col)).cast("long"))


def extract_features(df: DataFrame, kernel=None) -> DataFrame:
    """Arrow-batched feature extraction over (media_ref, mime, payload).

    mapInPandas so a 100-GB media partition streams through in bounded
    Arrow batches rather than materializing per-row Python objects.

    ``kernel`` is the pluggable decode+pool function (bytes -> (mean,
    std)); when None it is resolved ON THE EXECUTOR at task start
    (resolve_feature_kernel), so the same job runs the real PIL kernel on
    a codec-equipped cluster and the deterministic fake here.
    """
    import hashlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        k = kernel or resolve_feature_kernel()   # once per task, not per row
        for pdf in batches:
            rows = []
            for ref, mime, payload in zip(
                    pdf["media_ref"], pdf["mime"], pdf["payload"]):
                data = bytes(payload) if payload is not None else b""
                mean, std = k(data)
                rows.append((ref, mime, mean, std,
                             hashlib.md5(data).hexdigest()))
            yield pd.DataFrame(
                rows, columns=[f.name for f in FEATURE_TYPE.fields])

    return df.mapInPandas(run, schema=FEATURE_TYPE)


def frame_sample_plan(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling *plan*: expands (media_ref, n_frames) into
    frame-index rows JVM-side (sequence+explode), leaving decode to the
    stubbed kernel. Demonstrates the explode-before-decode pattern that
    keeps per-task work bounded at scale."""
    return df.select(
        "media_ref",
        F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1,
                             F.lit(every_n))).alias("frame_idx"),
    )
