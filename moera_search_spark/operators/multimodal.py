"""Multimodal columns: opaque binary payloads + typed metadata.

The reference's media pipeline (media/MediaManager.java — download,
thumbnail, serve) is a non-goal for retrieval, but a 100-TB training
pipeline needs the Spark-side plumbing for binary modalities: schema,
partition-friendly batch shape, and Arrow-batched decode UDFs.  The
actual image/audio decode is STUBBED (the codec libraries are not in
this container): ``decode_stub='fake'`` produces a deterministic fake
feature vector from the bytes; ``decode_stub='raise'`` raises
NotImplementedError where a real decoder (PIL/ffmpeg) would plug in.
Everything around the stub — binary column handling, mapInPandas
signature, metadata extraction — is real and tested.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

FEATURE_DIM = 8


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def binary_payloads(spark, sf_dir):
    """Synthesize the binary modality column from text bytes (stand-in
    for image/audio blobs) with typed metadata."""
    from pyspark.sql import functions as F

    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.lit("text/plain").alias("mime"))


def multimodal_binary_stats(spark, sf_dir):
    """Metadata extraction over binary payloads: byte length + content
    fingerprint — pure JVM expressions over BinaryType."""
    from pyspark.sql import functions as F

    p = binary_payloads(spark, sf_dir)
    return p.select(
        "doc_id",
        F.octet_length("payload").cast("long").alias("n_bytes"),
        F.md5(F.col("payload").cast("string")).alias("fp"),
        "mime")


MULTIMODAL_BINARY_STATS_SQL = """
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           md5(text) AS fp,
           'text/plain' AS mime
    FROM documents
"""


def decode_features_iter(decode_stub: str = "fake"):
    """mapInPandas body: (doc_id, payload binary) → (doc_id, feature
    array<double>).  The Arrow batch shape is exactly what a real
    image/audio decoder would receive; only the innermost transform is
    stubbed."""

    def fake_decode(buf: bytes) -> np.ndarray:
        # deterministic fake: FEATURE_DIM means over byte stripes
        arr = np.frombuffer(buf, dtype=np.uint8)
        if arr.size == 0:
            return np.zeros(FEATURE_DIM)
        pad = (-arr.size) % FEATURE_DIM
        arr = np.pad(arr, (0, pad)).reshape(-1, FEATURE_DIM)
        return arr.mean(axis=0) / 255.0

    def fn(pdf_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdf_iter:
            if decode_stub == "raise":
                raise NotImplementedError(
                    "real image/audio decode requires PIL/ffmpeg — "
                    "plug the decoder in here")
            feats = [fake_decode(b if b is not None else b"")
                     for b in pdf["payload"].values]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"].values,
                "features": [f.tolist() for f in feats]})

    return fn


def multimodal_decode_features(spark, sf_dir, decode_stub: str = "fake"):
    """The decode/feature-extract stage: binary → feature vector via
    Arrow-batched mapInPandas (the real-decoder slot)."""
    p = binary_payloads(spark, sf_dir).select("doc_id", "payload")
    return p.mapInPandas(decode_features_iter(decode_stub),
                         "doc_id long, features array<double>")


QUERIES = {
    "multimodal_binary_stats":
        (multimodal_binary_stats, MULTIMODAL_BINARY_STATS_SQL),
    # decode path has no SQL equivalent (binary feature extraction):
    # rows-only check by the driver, full check in tests.
    "multimodal_decode_features":
        (lambda spark, sf_dir: multimodal_decode_features(spark, sf_dir),
         None),
}
