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


def synthesize_wav_assets(spark, n: int = 48) -> DataFrame:
    """Deterministic REAL audio files: valid RIFF/WAVE PCM-16 assets
    written through the stdlib ``wave`` writer (even ids mono, odd
    stereo; sample rates 8/12/16 kHz; 12-16 frames). Sample bytes are
    md5-derived (block b = md5(f"wav:{id}:{b}").digest()) so a SQL oracle
    can replay the decoded little-endian int16 samples value-for-value
    while Spark runs the genuine container parse (wave.open)."""
    import hashlib
    import io
    import wave as wave_mod

    rows = []
    for i in range(n):
        channels = 1 + i % 2
        rate = 8000 + (i % 3) * 4000
        n_frames = 12 + i % 5
        nbytes = n_frames * channels * 2
        payload = b"".join(
            hashlib.md5(f"wav:{i}:{b}".encode()).digest()
            for b in range((nbytes + 15) // 16)
        )[:nbytes]
        buf = io.BytesIO()
        with wave_mod.open(buf, "wb") as w:
            w.setnchannels(channels)
            w.setsampwidth(2)
            w.setframerate(rate)
            w.writeframes(payload)
        rows.append(
            (
                i,
                "audio",
                bytearray(buf.getvalue()),
                (None, None, rate, n_frames, "wav"),
            )
        )
    return spark.createDataFrame(rows, schema=ASSET_SCHEMA)


def decode_audio_stats(df: DataFrame) -> DataFrame:
    """REAL audio decode: parse the RIFF/WAVE container with the stdlib
    ``wave`` reader inside Arrow mapInPandas and emit DECODED properties —
    channels/sample_rate from the fmt chunk, n_frames derived from the
    decoded sample array length (proving the data-chunk parse), and the
    mean of the first 8 interleaved int16 samples. 8 int16 values sum
    exactly in double and /8.0 is a power of two, so the oracle's SUM/8.0
    replays the mean bit-identically."""
    import io
    import wave as wave_mod

    out_schema = T.StructType(
        [
            T.StructField("asset_id", T.LongType()),
            T.StructField("channels", T.IntegerType()),
            T.StructField("sample_rate", T.IntegerType()),
            T.StructField("n_frames", T.IntegerType()),
            T.StructField("mean8", T.DoubleType()),
        ]
    )

    def op(batches: tp.Iterator[pd.DataFrame]) -> tp.Iterator[pd.DataFrame]:
        for pdf in batches:
            ch, sr, nf, ms = [], [], [], []
            for media in pdf["media"]:
                with wave_mod.open(io.BytesIO(bytes(media))) as w:
                    if w.getsampwidth() != 2:
                        raise ValueError("WAV: only PCM-16 supported")
                    raw = w.readframes(w.getnframes())
                    samples = np.frombuffer(raw, dtype="<i2")
                    ch.append(w.getnchannels())
                    sr.append(w.getframerate())
                    nf.append(samples.size // w.getnchannels())
                ms.append(float(samples[:8].astype(np.float64).mean()))
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "channels": ch,
                    "sample_rate": sr,
                    "n_frames": nf,
                    "mean8": ms,
                }
            )

    return df.mapInPandas(op, schema=out_schema)


def synthesize_pnm_video_assets(
    spark, n: int = 24, frames: int = 6
) -> DataFrame:
    """Deterministic REAL 'video' files: a PNM STREAM — ``frames``
    complete P5 grayscale images back to back in one binary payload (the
    actual pnm/y4m-style raw-video convention). Frame f's raster bytes
    are md5-derived (block b = md5(f"vid:{id}:{f}:{b}").digest()), so a
    SQL oracle can replay any sampled frame's pixels; Spark must WALK the
    stream frame by frame (header parse + raster skip) to get them."""
    import hashlib

    rows = []
    for i in range(n):
        w, h = 4 + i % 3, 3 + i % 2
        nbytes = w * h
        header = f"P5\n{w} {h}\n255\n".encode()
        payload = b"".join(
            header
            + b"".join(
                hashlib.md5(f"vid:{i}:{f}:{b}".encode()).digest()
                for b in range((nbytes + 15) // 16)
            )[:nbytes]
            for f in range(frames)
        )
        rows.append(
            (i, "video", bytearray(payload), (w, h, None, frames, "pnm-stream"))
        )
    return spark.createDataFrame(rows, schema=ASSET_SCHEMA)


def video_frame_stats(df: DataFrame, every_n: int = 2) -> DataFrame:
    """REAL frame-sampling over a PNM stream: walk the payload decoding
    every frame header (offset arithmetic through the raster — a frame
    can't be found without parsing its predecessors), keep every
    ``every_n``-th frame, and emit the decoded frame count plus the mean
    over the first 12 pixels of EACH sampled frame (one exact integer sum
    and one IEEE division — bit-reproducible in SQL)."""
    out_schema = T.StructType(
        [
            T.StructField("asset_id", T.LongType()),
            T.StructField("n_frames", T.IntegerType()),
            T.StructField("n_sampled", T.IntegerType()),
            T.StructField("mean12_sampled", T.DoubleType()),
        ]
    )

    def op(batches: tp.Iterator[pd.DataFrame]) -> tp.Iterator[pd.DataFrame]:
        for pdf in batches:
            nfs, nss, ms = [], [], []
            for media in pdf["media"]:
                data = bytes(media)
                off, idx, total = 0, 0, 0
                sampled = []
                while off < len(data):
                    magic, w, h, maxval, doff = _parse_pnm_header(data[off:])
                    if magic != b"P5" or maxval != 255:
                        raise ValueError("pnm-stream: expected P5/255 frames")
                    frame = data[off + doff : off + doff + w * h]
                    if len(frame) < w * h:
                        raise ValueError("pnm-stream: truncated frame")
                    if idx % every_n == 0:
                        sampled.append(np.frombuffer(frame[:12], dtype=np.uint8))
                    off += doff + w * h
                    idx += 1
                    total += 1
                pix = np.concatenate(sampled).astype(np.int64)
                nfs.append(total)
                nss.append(len(sampled))
                ms.append(float(pix.sum()) / float(pix.size))
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "n_frames": nfs,
                    "n_sampled": nss,
                    "mean12_sampled": ms,
                }
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
