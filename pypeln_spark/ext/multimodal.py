"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched pandas UDFs over mapInPandas.

The decode step itself is STUBBED (no PIL/ffmpeg in this container — each
raises NotImplementedError unless a deterministic fake is requested); the
Spark-side contract — schema, batch iteration, partition sizing, UDF
signatures — is real and tested, so dropping a real decoder in is a
one-function change.

Schema convention for a multimodal table:
    asset_id   bigint
    modality   string         ('image' | 'audio' | 'video')
    media      binary         (the encoded bytes, opaque)
    meta       struct<width:int, height:int, sample_rate:int,
                      n_frames:int, format:string>

At 100 TB: binary payloads make parquet row groups huge — size
``spark.sql.files.maxPartitionBytes`` down (64m) so a partition holds a
bounded number of assets, and keep metadata in separate (prunable) columns
so metadata-only queries never touch the bytes.
"""

from __future__ import annotations

import typing as tp

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

META_SCHEMA = T.StructType(
    [
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("format", T.StringType()),
    ]
)

ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),
        T.StructField("media", T.BinaryType(), True),
        T.StructField("meta", META_SCHEMA, True),
    ]
)


def synthesize_assets(spark, n: int = 64) -> DataFrame:
    """Deterministic fake asset table for exercising the plumbing without
    real media files. Payload bytes are md5-derived from the asset id
    (block b's 16 bytes = md5(f"{id}:{b}").digest()) — deterministic AND
    SQL-reproducible, so downstream feature stats can be value-checked by
    a DuckDB oracle that recomputes the first block's byte-mean from md5."""
    import hashlib

    rows = []
    for i in range(n):
        modality = ["image", "audio", "video"][i % 3]
        nbytes = 256 + (i % 7) * 64
        payload = b"".join(
            hashlib.md5(f"{i}:{b}".encode()).digest()
            for b in range((nbytes + 15) // 16)
        )[:nbytes]
        rows.append(
            (
                i,
                modality,
                bytearray(payload),
                (64 + i % 32, 48 + i % 16, 16000, 1 + i % 10, "fake"),
            )
        )
    return spark.createDataFrame(rows, schema=ASSET_SCHEMA)


def _decode_image(media: bytes, fake: bool) -> np.ndarray:
    """Grayscale pixel array from encoded bytes. fake=True is the
    deterministic stub the md5 oracle replays; fake=False uses PIL when
    installed (any PIL-readable format, converted to 8-bit gray) and raises
    NotImplementedError otherwise — the container this ships in has no
    codecs, so the REAL path is feature-gated, not assumed."""
    if fake:
        # deterministic fake: derive a tiny 4x4 gray image from the bytes
        arr = np.frombuffer(media[:16], dtype=np.uint8)
        return np.tile(arr.reshape(4, 4), (1, 1))
    try:
        from PIL import Image
    except ImportError as e:
        raise NotImplementedError(
            "image decode needs PIL (pillow) — not in this container; "
            "pass fake=True for the deterministic stub"
        ) from e
    import io

    with Image.open(io.BytesIO(media)) as img:
        return np.asarray(img.convert("L"))


def extract_features(
    df: DataFrame, fake_decode: bool = True, batch_note_col: str = "batch_rows"
) -> DataFrame:
    """Decode → feature-extract over mapInPandas. Output: per-asset feature
    vector (array<float>) + mean intensity + the Arrow batch size it rode in
    (observability for partition-sizing work)."""

    out_schema = T.StructType(
        [
            T.StructField("asset_id", T.LongType()),
            T.StructField("modality", T.StringType()),
            T.StructField("features", T.ArrayType(T.FloatType())),
            T.StructField("mean_intensity", T.DoubleType()),
            T.StructField(batch_note_col, T.IntegerType()),
        ]
    )

    def op(batches: tp.Iterator[pd.DataFrame]) -> tp.Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, means = [], []
            for media in pdf["media"]:
                img = _decode_image(bytes(media), fake=fake_decode)
                v = img.astype(np.float32).ravel()[:16]
                feats.append(v.tolist())
                means.append(float(v.mean()))
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "modality": pdf["modality"],
                    "features": feats,
                    "mean_intensity": means,
                    batch_note_col: len(pdf),
                }
            )

    return df.mapInPandas(op, schema=out_schema)


def frame_sample(df: DataFrame, every_n: int = 2) -> DataFrame:
    """Video frame sampling: explode n_frames into frame indices, keep every
    n-th — pure Catalyst (sequence+explode), the decode of each sampled frame
    would plug into extract_features."""
    return (
        df.filter(F.col("modality") == "video")
        .select(
            "asset_id",
            F.explode(
                F.sequence(F.lit(0), F.col("meta.n_frames") - 1)
            ).alias("frame_idx"),
        )
        .filter(F.col("frame_idx") % every_n == 0)
    )


def resize_stub(df: DataFrame, width: int, height: int) -> DataFrame:
    """Resize contract: passes bytes through, rewrites meta — the real op
    swaps _decode_image/encode into the same mapInPandas shape."""
    return df.withColumn(
        "meta",
        F.struct(
            F.lit(width).alias("width"),
            F.lit(height).alias("height"),
            F.col("meta.sample_rate").alias("sample_rate"),
            F.col("meta.n_frames").alias("n_frames"),
            F.col("meta.format").alias("format"),
        ),
    )
