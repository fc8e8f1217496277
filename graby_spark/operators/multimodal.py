"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images / audio / video ride through the pipeline as ``binary`` columns with
a metadata struct; decode / feature-extract / resize / frame-sample are
Arrow-batched ``mapInPandas`` stages.  The actual codec work is STUBBED in
this environment (no image/audio libraries in the container): the Spark
side — schema, batch shape, partitioning, UDF signatures — is real and
tested; the decode stub is a deterministic fake (byte-level statistics)
clearly marked, and ``decode_image`` raises ``NotImplementedError`` when
``strict=True`` so a real codec can be dropped in.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
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

__all__ = [
    "MEDIA_SCHEMA",
    "attach_media_metadata",
    "jpeg_dims",
    "extract_features",
    "sample_frames",
    "decode_image",
]

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("mime", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", IntegerType()),
    ]
)

_MAGIC = [
    (b"\x89PNG", "image/png"),
    (b"\xff\xd8\xff", "image/jpeg"),
    (b"GIF8", "image/gif"),
    (b"RIFF", "audio/wav"),
    (b"ID3", "audio/mpeg"),
    (b"\xff\xfb", "audio/mpeg"),  # bare MPEG1 Layer III frame sync
    (b"\x00\x00\x00", "video/mp4"),
]

#: MPEG1 Layer III bitrate table (kbps) by the 4-bit header index
MP3_BITRATES = [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 0]


def jpeg_dims(data: bytes) -> tuple[int, int] | None:
    """(width, height) from a JPEG SOFn segment — pure header walk, no
    codec.  Returns None on truncated/invalid streams."""
    if len(data) < 4 or data[0:2] != b"\xff\xd8":
        return None
    i = 2
    while i + 9 <= len(data):
        if data[i] != 0xFF:
            return None
        marker = data[i + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:  # no-length markers
            i += 2
            continue
        seg_len = int.from_bytes(data[i + 2 : i + 4], "big")
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):  # SOFn
            if i + 9 > len(data):
                return None
            h = int.from_bytes(data[i + 5 : i + 7], "big")
            w = int.from_bytes(data[i + 7 : i + 9], "big")
            return (w, h)
        i += 2 + seg_len
    return None


def attach_media_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Sniff mime from magic bytes and parse real image dimensions from
    the headers — PNG (IHDR) and GIF (logical screen descriptor) are pure
    JVM substring/conv expressions; JPEG needs a sequential marker walk,
    done in an Arrow-batched pandas UDF applied ONLY to jpeg rows.
    No codec is involved: these are header fields."""
    payload = F.col(payload_col)
    mime = F.lit("application/octet-stream")
    for magic, m in reversed(_MAGIC):
        hexv = magic.hex()
        mime = F.when(
            F.hex(F.substring(payload, 1, len(magic))) == F.lit(hexv.upper()), F.lit(m)
        ).otherwise(mime)

    def be(pos: int, n: int) -> F.Column:  # big-endian uint from bytes
        return F.conv(F.hex(F.substring(payload, pos, n)), 16, 10).cast("int")

    png_ok = (F.length(payload) >= 24) & (
        F.hex(F.substring(payload, 1, 8)) == "89504E470D0A1A0A"
    ) & (F.hex(F.substring(payload, 13, 4)) == "49484452")
    gif_ok = F.length(payload) >= 10
    w_gif = be(8, 1) * 256 + be(7, 1)  # little-endian u16
    h_gif = be(10, 1) * 256 + be(9, 1)

    from pyspark.sql.types import ArrayType as _Arr

    @F.pandas_udf(_Arr(IntegerType()))
    def _jpeg_wh(payloads: pd.Series) -> pd.Series:
        return payloads.map(
            lambda p: list(jpeg_dims(bytes(p or b"")) or []) or None
        )

    out = df.withColumn("mime", mime).withColumn("payload_bytes", F.length(payload))
    out = out.withColumn(
        "_jwh",
        F.when(F.col("mime") == "image/jpeg", _jpeg_wh(payload)),
    )
    width = (
        F.when(png_ok & (F.col("mime") == "image/png"), be(17, 4))
        .when(gif_ok & (F.col("mime") == "image/gif"), w_gif)
        .when(F.col("mime") == "image/jpeg", F.element_at("_jwh", 1))
    )
    height = (
        F.when(png_ok & (F.col("mime") == "image/png"), be(21, 4))
        .when(gif_ok & (F.col("mime") == "image/gif"), h_gif)
        .when(F.col("mime") == "image/jpeg", F.element_at("_jwh", 2))
    )
    # WAV duration from the canonical RIFF layout (PCM fmt chunk directly
    # after WAVE, data chunk at offset 37): declared data size / byte rate.
    # A header-field read, no codec; non-canonical layouts stay NULL.
    def le32(pos: int) -> F.Column:  # little-endian u32
        return (
            be(pos, 1)
            + be(pos + 1, 1) * 256
            + be(pos + 2, 1) * 65536
            + be(pos + 3, 1) * 16777216
        )

    wav_ok = (
        (F.length(payload) >= 44)
        & (F.hex(F.substring(payload, 1, 4)) == "52494646")
        & (F.hex(F.substring(payload, 9, 4)) == "57415645")
        & (F.hex(F.substring(payload, 13, 4)) == "666D7420")
        & (F.hex(F.substring(payload, 37, 4)) == "64617461")
    )
    byte_rate = le32(29)
    data_size = le32(41)
    wav_duration = F.when(
        wav_ok & (F.col("mime") == "audio/wav") & (byte_rate > 0),
        F.floor(data_size.cast("long") * 1000 / byte_rate).cast("int"),
    )

    # MP3 CBR duration estimate — real header math, no codec: skip an
    # ID3v2 tag (synchsafe 28-bit size at bytes 7-10), read the first
    # MPEG frame header, require MPEG1 Layer III frame sync, look the
    # 4-bit bitrate index up in the standard table, then
    # duration = audio_bytes * 8 / bitrate.  VBR streams (no Xing parse)
    # and other MPEG versions stay NULL rather than guessing.
    is_id3 = F.hex(F.substring(payload, 1, 3)) == "494433"
    tag_end = F.when(
        is_id3,
        (be(7, 1) % 128) * 2097152
        + (be(8, 1) % 128) * 16384
        + (be(9, 1) % 128) * 128
        + (be(10, 1) % 128)
        + 10,
    ).otherwise(F.lit(0))
    out = out.withColumn("_mp3_tag", tag_end)
    hdr = F.conv(
        F.hex(F.expr(f"substring({payload_col}, _mp3_tag + 1, 4)")), 16, 10
    ).cast("long")
    sync_ok = (F.floor(hdr / 2097152) % 2048) == 2047  # 11 sync bits
    mpeg1_l3 = ((F.floor(hdr / 524288) % 4) == 3) & ((F.floor(hdr / 131072) % 4) == 1)
    br_idx = (F.floor(hdr / 4096) % 16).cast("int")
    bitrate_kbps = F.element_at(
        F.array(*[F.lit(b) for b in MP3_BITRATES]), br_idx + 1
    )
    mp3_duration = F.when(
        (F.col("mime") == "audio/mpeg")
        & (F.length(payload) >= F.col("_mp3_tag") + 4)
        & sync_ok
        & mpeg1_l3
        & (bitrate_kbps > 0),
        F.floor(
            (F.length(payload) - F.col("_mp3_tag")).cast("long") * 8 * 1000
            / (bitrate_kbps * 1000)
        ).cast("int"),
    )
    return (
        out.withColumn("width", width)
        .withColumn("height", height)
        .withColumn("duration_ms", F.coalesce(wav_duration, mp3_duration))
        .drop("_jwh", "_mp3_tag")
    )


def decode_image(payload: bytes, strict: bool = False) -> np.ndarray:
    """STUB — no image codec available in this container.

    strict=True raises (drop-in point for a real decoder); otherwise a
    deterministic fake 8x8 grayscale "image" derived from the payload
    digest, so downstream feature plumbing is testable end-to-end."""
    if strict:
        raise NotImplementedError("image codecs are unavailable in this environment")
    digest = hashlib.sha256(payload or b"").digest()
    return np.frombuffer(digest * 2, dtype=np.uint8).reshape(8, 8).astype(np.float32)


def extract_features(df: DataFrame, payload_col: str = "payload", id_col: str = "media_id") -> DataFrame:
    """payload → 16-dim feature vector via mapInPandas.

    Feature extraction is the deterministic stub (byte histogram moments of
    the fake decode); the Arrow batch shape and schema match what a real
    vision encoder stage would use."""
    src = df.select(F.col(id_col).alias("media_id"), F.col(payload_col).alias("payload"))
    schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("features", ArrayType(FloatType())),
        ]
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out = []
            for mid, payload in zip(batch["media_id"], batch["payload"]):
                img = decode_image(bytes(payload or b""))
                flat = img.flatten()
                feats = np.concatenate(
                    [
                        flat.reshape(16, 4).mean(axis=1) / 255.0,
                    ]
                ).astype(np.float32)
                out.append({"media_id": mid, "features": feats.tolist()})
            yield pd.DataFrame(out, columns=["media_id", "features"])

    return src.mapInPandas(fn, schema)


def sample_frames(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    every_ms: int = 1000,
    max_frames: int = 4,
) -> DataFrame:
    """Video frame-sampling plumbing: one output row per sampled frame.

    Frame decode is stubbed (slices of the payload digest); row explosion,
    frame indices and timestamps are the real contract."""
    src = df.select(F.col(id_col).alias("media_id"), F.col(payload_col).alias("payload"))
    schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("frame_no", IntegerType()),
            StructField("ts_ms", IntegerType()),
            StructField("frame", BinaryType()),
        ]
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out = []
            for mid, payload in zip(batch["media_id"], batch["payload"]):
                data = bytes(payload or b"")
                digest = hashlib.sha256(data).digest()
                n = min(max_frames, max(len(data) // 64, 1))
                for i in range(n):
                    out.append(
                        {
                            "media_id": mid,
                            "frame_no": i,
                            "ts_ms": i * every_ms,
                            "frame": digest[i % 2 :][:16],
                        }
                    )
            yield pd.DataFrame(out, columns=["media_id", "frame_no", "ts_ms", "frame"])

    return src.mapInPandas(fn, schema)
