"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched mapInPandas.

The decode step is STUBBED (no image/audio libraries in this container):
`decode_mode="fake"` produces a deterministic fake decode derived from the
payload's md5 so tests are stable; `decode_mode="real"` raises
NotImplementedError at the exact point a real decoder (PIL/ffmpeg) would
plug in. Everything Spark-side — schemas, partitioning, UDF signatures,
Arrow batch shapes — is real and tested.

Scale notes: binary payloads ride in the same parquet row-groups as their
metadata; mapInPandas streams Arrow batches (no per-row Python overhead);
decode parallelism = input partitions, so `repartition(n)` before decode
sets the fan-out. Frame sampling is a 1→N mapInPandas (generator per
batch), the same shape a video pipeline needs.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

IMAGE_META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("format", StringType()),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame", BinaryType()),
    ]
)


def attach_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Simulate a multimodal table: utf-8 payload bytes + typed metadata."""
    payload = F.encode(F.col(text_col), "utf-8")
    return df.withColumn("payload", payload).withColumn(
        "payload_len", F.octet_length(payload)
    )


def _fake_decode(payload: bytes) -> tuple[int, int, int, str]:
    d = hashlib.md5(payload).digest()
    return (d[0] % 64 + 1, d[1] % 64 + 1, 3, "fake")


def decode_images(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id",
    decode_mode: str = "fake",
) -> DataFrame:
    """binary payload → typed image metadata via Arrow-batched mapInPandas."""
    if decode_mode not in ("fake", "real"):
        raise ValueError("decode_mode must be 'fake' or 'real'")

    def decode(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            if decode_mode == "real":
                raise NotImplementedError(
                    "real image decode needs PIL/libvips — not in this container; "
                    "plug the decoder in here"
                )
            metas = [_fake_decode(bytes(p)) for p in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].values,
                    "width": [m[0] for m in metas],
                    "height": [m[1] for m in metas],
                    "channels": [m[2] for m in metas],
                    "format": [m[3] for m in metas],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(decode, IMAGE_META_SCHEMA)


FEATURE_DIM = 16

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("features", ArrayType(FloatType())),
    ]
)


def extract_features(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id",
    decode_mode: str = "fake",
) -> DataFrame:
    """payload → fixed-dim float feature vector via mapInPandas (the
    embedding-model stage of a multimodal pipeline). Fake mode derives a
    deterministic FEATURE_DIM-vector from the md5 digest bytes; real mode
    is the plug-in point for a vision encoder."""

    def extract(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if decode_mode == "real":
                raise NotImplementedError(
                    "real feature extraction needs a vision encoder — plug in here"
                )
            feats = []
            for p in pdf[payload_col]:
                d = hashlib.md5(bytes(p)).digest()
                feats.append(
                    np.array([b / 255.0 for b in d[:FEATURE_DIM]], dtype=np.float32)
                )
            yield pd.DataFrame({"doc_id": pdf[id_col].values, "features": feats})

    return df.select(id_col, payload_col).mapInPandas(extract, FEATURE_SCHEMA)


RESIZE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)


def resize_images(
    df: DataFrame, width: int, height: int,
    payload_col: str = "payload", id_col: str = "doc_id",
    decode_mode: str = "fake",
) -> DataFrame:
    """Resize stage: payload → payload' at (width, height). Fake mode
    truncates/cycles the byte stream to width*height*3 deterministically;
    real mode is the PIL/libvips plug-in point. Identical Spark plumbing
    either way: binary in, binary out, metadata columns updated."""
    target = width * height * 3

    def resize(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            if decode_mode == "real":
                raise NotImplementedError(
                    "real resize needs PIL/libvips — plug in here"
                )
            outs = []
            for p in pdf[payload_col]:
                data = bytes(p)
                reps = (target // max(len(data), 1)) + 1
                outs.append((data * reps)[:target])
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].values,
                    "payload": outs,
                    "width": [width] * len(pdf),
                    "height": [height] * len(pdf),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(resize, RESIZE_SCHEMA)


def sample_frames(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id",
    n_frames: int = 3,
) -> DataFrame:
    """1→N frame sampling shape: each payload yields n_frames fake frames
    (deterministic slices). A real video pipeline swaps the slicer for an
    ffmpeg keyframe extractor with the identical Spark plumbing."""

    def sample(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = {"doc_id": [], "frame_idx": [], "frame": []}
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                data = bytes(payload)
                step = max(len(data) // n_frames, 1)
                for i in range(n_frames):
                    rows["doc_id"].append(doc_id)
                    rows["frame_idx"].append(i)
                    rows["frame"].append(data[i * step : (i + 1) * step])
            yield pd.DataFrame(rows)

    return df.select(id_col, payload_col).mapInPandas(sample, FRAME_SCHEMA)
