"""Multimodal column plumbing — binary payloads + typed metadata.

Treats image/audio/video as opaque ``binary`` columns with a metadata struct;
decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` stages. The actual codec calls are STUBBED (this container
ships no image/audio libraries): ``decode_stub`` raises NotImplementedError
unless ``fake=True``, in which case a deterministic fake decoder (hash-derived
dimensions/features) exercises the real Spark plumbing — schema, partitioning,
UDF signature, Arrow batch shape — end to end.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("bytes", T.LongType()),
                    T.StructField("source", T.StringType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("kind", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def synth_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table (payload = repeated hash bytes)."""
    rows = []
    for i in range(n):
        payload = hashlib.sha256(f"media_{i}".encode()).digest() * 4
        kind = ("image", "audio", "video")[i % 3]
        rows.append((f"m_{i:04d}", kind, bytearray(payload), (f"{kind}/fake", len(payload), "synth")))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def decode_and_featurize(media: DataFrame, fake: bool = True, dim: int = 8) -> DataFrame:
    """Decode + feature-extract as one ``mapInPandas`` stage.

    Real deployment: replace the ``_fake_decode`` body with PIL/libav calls —
    the Spark side (Arrow batches of binary columns, per-executor codec
    init, output schema) is identical and is what this function tests.
    """

    def _fake_decode(payload: bytes, kind: str) -> tuple[int, int, int, list[float]]:
        if not fake:
            raise NotImplementedError(
                "real media decoding requires PIL/torchaudio/av — not in this container"
            )
        h = hashlib.sha256(payload).digest()
        w, ht = 16 + h[0] % 64, 16 + h[1] % 64
        frames = 1 if kind == "image" else 1 + h[2] % 30
        feat = [round(b / 255.0, 6) for b in h[:dim]]
        return w, ht, frames, feat

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, kind, payload in pdf[["media_id", "kind", "payload"]].itertuples(
                index=False, name=None
            ):
                w, ht, fr, feat = _fake_decode(bytes(payload), kind)
                rows.append((media_id, kind, w, ht, fr, feat))
            yield pd.DataFrame(rows, columns=[f.name for f in FEATURE_SCHEMA.fields])

    return media.select("media_id", "kind", "payload").mapInPandas(run, FEATURE_SCHEMA)


def frame_sample(features: DataFrame, every_n: int = 5) -> DataFrame:
    """Frame-sampling plan for videos: one row per sampled frame index —
    pure ``sequence``+``explode``, no Python."""
    vids = features.filter(F.col("kind") == "video")
    return vids.select(
        "media_id",
        F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))).alias("frame_idx"),
    )
