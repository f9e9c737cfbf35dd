"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched pandas UDFs over mapInPandas.

Decoding: the binary PNM family (P5 grayscale / P6 RGB — uncompressed,
header + raw bytes) is decoded by a REAL pure-Python decoder in-repo
(_decode_pnm), so the genuine decode path — header parse, dimension
validation, RGB→luma — runs and is oracle-verified without any codec
library. Compressed formats (PNG/JPEG/...) still need PIL and stay
feature-gated behind NotImplementedError (no codecs in this container);
ffmpeg-class audio/video decode likewise. The Spark-side contract —
schema, batch iteration, partition sizing, UDF signatures — is identical
for both, so dropping PIL in widens format coverage without touching the
plumbing.

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


def _parse_pnm_header(media: bytes) -> tp.Tuple[bytes, int, int, int, int]:
    """Parse a binary-PNM header → (magic, width, height, maxval,
    data_offset). Grammar per the netpbm spec: magic, then three decimal
    tokens separated by whitespace, with ``#``-to-end-of-line comments
    allowed between tokens, then EXACTLY ONE whitespace byte before the
    raster."""
    magic = media[:2]
    i, vals = 2, []
    while len(vals) < 3:
        while i < len(media) and media[i : i + 1].isspace():
            i += 1
        if media[i : i + 1] == b"#":
            while i < len(media) and media[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(media) and not media[j : j + 1].isspace():
            j += 1
        if j == i:
            raise ValueError("PNM: truncated header")
        vals.append(int(media[i:j]))
        i = j
    return magic, vals[0], vals[1], vals[2], i + 1  # +1: the single ws byte


def _decode_pnm(media: bytes) -> np.ndarray:
    """REAL pure-Python image decode for binary PNM (P5 8-bit grayscale,
    P6 8-bit RGB): header parse + raw raster, no codec library. P6 reduces
    to 8-bit luma via the integer ITU-R 601 weights
    (299·R + 587·G + 114·B) // 1000 — exact integer arithmetic, so a SQL
    oracle can replay the decode bit-for-bit."""
    magic, w, h, maxval, off = _parse_pnm_header(media)
    if maxval != 255:
        raise ValueError(f"PNM: only 8-bit rasters supported, maxval={maxval}")
    if w <= 0 or h <= 0:
        raise ValueError(f"PNM: bad dimensions {w}x{h}")
    channels = 1 if magic == b"P5" else 3
    need = w * h * channels
    arr = np.frombuffer(media, dtype=np.uint8, count=-1, offset=off)
    if arr.size < need:
        raise ValueError(f"PNM: raster truncated ({arr.size} < {need} bytes)")
    arr = arr[:need]
    if channels == 1:
        return arr.reshape(h, w)
    rgb = arr.reshape(h, w, 3).astype(np.int32)
    luma = (299 * rgb[..., 0] + 587 * rgb[..., 1] + 114 * rgb[..., 2]) // 1000
    return luma.astype(np.uint8)


def _decode_image(media: bytes, fake: bool) -> np.ndarray:
    """Grayscale pixel array from encoded bytes. fake=True is the
    deterministic stub the md5 oracle replays. fake=False is the REAL
    path: binary PNM (P5/P6 magic) decodes via the in-repo pure-Python
    decoder; any other format needs PIL (converted to 8-bit gray) and
    raises NotImplementedError without it — the container this ships in
    has no codecs, so the compressed-format path is feature-gated, not
    assumed."""
    if fake:
        # deterministic fake: derive a tiny 4x4 gray image from the bytes
        arr = np.frombuffer(media[:16], dtype=np.uint8)
        return np.tile(arr.reshape(4, 4), (1, 1))
    if media[:2] in (b"P5", b"P6"):
        return _decode_pnm(media)
    try:
        from PIL import Image
    except ImportError as e:
        raise NotImplementedError(
            "non-PNM image decode needs PIL (pillow) — not in this "
            "container; use P5/P6 PNM for the built-in decoder or "
            "fake=True for the deterministic stub"
        ) from e
    import io

    with Image.open(io.BytesIO(media)) as img:
        return np.asarray(img.convert("L"))


def synthesize_pnm_assets(spark, n: int = 48) -> DataFrame:
    """Deterministic REAL image files: valid binary-PNM assets (even ids =
    P5 grayscale, odd = P6 RGB) whose raster bytes are md5-derived
    (block b = md5(f"pnm:{id}:{b}").digest()), so a SQL oracle can replay
    the full decode — header dimensions AND pixel values — while Spark
    runs the genuine decoder (_decode_pnm), not the fake. Dimensions vary
    per asset (width 4-6, height 5-8) to exercise header parsing."""
    import hashlib

    rows = []
    for i in range(n):
        w, h = 4 + i % 3, 5 + i % 4
        gray = i % 2 == 0
        nbytes = w * h * (1 if gray else 3)
        payload = b"".join(
            hashlib.md5(f"pnm:{i}:{b}".encode()).digest()
            for b in range((nbytes + 15) // 16)
        )[:nbytes]
        header = f"{'P5' if gray else 'P6'}\n{w} {h}\n255\n".encode()
        rows.append(
            (
                i,
                "image",
                bytearray(header + payload),
                (w, h, None, 1, "pgm" if gray else "ppm"),
            )
        )
    return spark.createDataFrame(rows, schema=ASSET_SCHEMA)


def decode_stats(df: DataFrame) -> DataFrame:
    """REAL-decode verification surface: decode every asset with the
    non-fake decoder and emit the DECODED dimensions (from the pixel
    array, not the metadata column — proving the header parse) plus the
    float32 mean of the first 16 gray pixels. The 16-value float32 mean
    is exact in double (sums ≤ 4080 < 2^24, /16 is a power of two), so
    the oracle's SUM/16.0 replays it bit-identically."""
    out_schema = T.StructType(
        [
            T.StructField("asset_id", T.LongType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("mean16", T.DoubleType()),
        ]
    )

    def op(batches: tp.Iterator[pd.DataFrame]) -> tp.Iterator[pd.DataFrame]:
        for pdf in batches:
            ws, hs, ms = [], [], []
            for media in pdf["media"]:
                img = _decode_image(bytes(media), fake=False)
                h, w = img.shape
                v = img.astype(np.float32).ravel()[:16]
                ws.append(w)
                hs.append(h)
                ms.append(float(v.mean()))
            yield pd.DataFrame(
                {"asset_id": pdf["asset_id"], "width": ws, "height": hs, "mean16": ms}
            )

    return df.mapInPandas(op, schema=out_schema)


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
