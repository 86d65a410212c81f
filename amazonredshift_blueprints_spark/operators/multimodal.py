"""Multimodal-column plumbing: opaque binary payloads + typed metadata.

The pattern for image/audio/video at 100 TB (SURVEY.md §2 Part C):
- payloads ride as ``BinaryType`` columns (or object-store URIs for the
  very large ones) next to a ``StructType`` metadata column;
- decode / feature-extract runs in ``mapInPandas`` — Arrow-batched, one
  Python worker per input partition, constant memory per batch;
- partitioning carries over from the scan, so the decode stage scales
  with partition count and never shuffles.

The actual media decoding is STUBBED (``decode_image`` raises
NotImplementedError: pillow/ffmpeg are not in this container). The
deterministic fallback featureizer exercises every piece of real
plumbing — binary Arrow transfer, batch iteration, schema contract —
so swapping in a real decoder is a one-function change.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("payload_md5", StringType()),
        StructField("head_hex", StringType()),
        StructField("feature", StringType()),
    ]
)


def decode_image(payload: bytes) -> object:
    """Real media decode — intentionally stubbed in this environment."""
    raise NotImplementedError(
        "media codecs (pillow/ffmpeg) are not available in this container; "
        "swap this stub for a real decoder in production"
    )


def _fake_feature(payload: bytes) -> str:
    """Deterministic stand-in for a decoded feature vector."""
    import hashlib

    return hashlib.sha256(payload).hexdigest()[:16]


def attach_binary_payload(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Simulate a multimodal table: utf-8 payload bytes + typed metadata.

    (The fixtures carry no real media; production tables land here from
    the ingest layer with genuine image/audio bytes.)
    """
    return df.select(
        F.col(id_col),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.octet_length(F.col(text_col)).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def extract_features(df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload") -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``mapInPandas``: each batch arrives as a pandas DataFrame with the
    payload as raw bytes; output rows follow FEATURE_SCHEMA. Python is
    unavoidable for codec work — this is the sanctioned slow path, kept
    off the hot path for everything SQL can do.
    """
    import hashlib

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[payload_col]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes": payloads.map(len).astype("int64"),
                    "payload_md5": payloads.map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest()
                    ),
                    "head_hex": payloads.map(lambda b: bytes(b)[:8].hex()),
                    "feature": payloads.map(lambda b: _fake_feature(bytes(b))),
                }
            )

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        featurize, FEATURE_SCHEMA
    )
