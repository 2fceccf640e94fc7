"""Multimodal columns: image/audio/video as opaque ``binary`` + typed
metadata struct, processed with Arrow-batched ``mapInPandas``.

Design (the 100 TB shape):
- content stays an opaque ``BinaryType`` column; Parquet stores it
  row-grouped so predicate pushdown on the *metadata* columns prunes
  whole row groups without touching bytes;
- per-item decode / resize / frame-sample are ``mapInPandas`` stages —
  the unit of parallelism is the input split, Python cost is amortized
  over Arrow batches, and no shuffle is introduced;
- actual codecs (PIL/ffmpeg/librosa) are NOT in this environment: the
  decode kernel is stubbed behind ``decoder=``. The default raises
  ``NotImplementedError``; ``fake_decoder`` is a deterministic stand-in
  so the plumbing (schema, batching, partition behavior) is fully
  testable. Swapping in a real codec changes ONE function.
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("format", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("content", T.BinaryType(), True),
        T.StructField("meta", MEDIA_META_SCHEMA, True),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes int, content_sha1 string, "
    "byte_mean double, byte_entropy double"
)


def synthetic_media(df: DataFrame, id_col: str, seed_col: str) -> DataFrame:
    """Deterministic fake media table from any (id, string) pair — the
    binary content is an md5-keystream expansion of the seed column, so
    tests have real (varying, incompressible) bytes without any codec."""
    payload = F.concat(
        F.unhex(F.md5(F.col(seed_col))),
        F.unhex(F.md5(F.concat(F.col(seed_col), F.lit("2")))),
        F.unhex(F.md5(F.concat(F.col(seed_col), F.lit("3")))),
    )
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col(id_col) % 3 + 1).cast("int"),
    )
    meta = F.struct(
        F.when(kind == "image", F.lit("png"))
        .when(kind == "audio", F.lit("wav"))
        .otherwise(F.lit("mp4"))
        .alias("format"),
        F.when(kind != "audio", (F.col(id_col) % 640 + 16).cast("int")).alias(
            "width"
        ),
        F.when(kind != "audio", (F.col(id_col) % 480 + 16).cast("int")).alias(
            "height"
        ),
        F.when(kind != "image", (F.col(id_col) % 90000 + 1000).cast("int")).alias(
            "duration_ms"
        ),
        F.when(kind == "audio", F.lit(16000).cast("int")).alias("sample_rate"),
    )
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        kind.alias("kind"),
        payload.alias("content"),
        meta.alias("meta"),
    )


def unimplemented_decoder(kind: str, content: bytes, meta: dict) -> dict:
    """Placeholder for a real codec (PIL / ffmpeg / librosa)."""
    raise NotImplementedError(
        "media codecs are not available in this environment; "
        "pass decoder=fake_decoder or a real codec kernel"
    )


def fake_decoder(kind: str, content: bytes, meta: dict) -> dict:
    """Deterministic decode stand-in: byte statistics as 'features'."""
    import math

    n = len(content)
    counts: dict[int, int] = {}
    for b in content:
        counts[b] = counts.get(b, 0) + 1
    mean = sum(content) / n if n else 0.0
    ent = -sum((c / n) * math.log2(c / n) for c in counts.values()) if n else 0.0
    return {
        "n_bytes": n,
        "content_sha1": hashlib.sha1(content).hexdigest(),
        "byte_mean": mean,
        "byte_entropy": ent,
    }


# --- Real (pure-Python) image codec: PNG + JPEG headers ---------------------
#
# The container has no PIL/ffmpeg, but PNG and JPEG container formats are
# public specs parseable with struct/zlib alone — so the decode step can
# be REAL for images: real bytes in, dimensions/bit-depth out, failing
# loudly on corrupt input. Pixel-level ops would need a codec library and
# remain stubbed.

PNG_SIG = b"\x89PNG\r\n\x1a\n"


def png_bytes(width: int, height: int, seed: int) -> bytes:
    """A real, spec-valid RGB8 PNG (signature, IHDR, zlib IDAT, IEND,
    correct CRCs) with deterministic LCG pixel content — a genuine
    encode path, so tests exercise true byte→header→feature flow."""
    import struct
    import zlib

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    raw = bytearray()
    state = (seed * 2654435761 + 12345) & 0x7FFFFFFF
    for _y in range(height):
        raw.append(0)  # filter: None
        for _x in range(width * 3):
            state = (state * 1103515245 + 12345) & 0x7FFFFFFF
            raw.append(state & 0xFF)
    return (
        PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + chunk(b"IEND", b"")
    )


def jpeg_bytes(width: int, height: int, seed: int) -> bytes:
    """A minimal JPEG byte stream: SOI, JFIF APP0, a baseline SOF0 frame
    header carrying the real dimensions, EOI. Header-complete (what a
    metadata scan reads); entropy-coded scan data is omitted."""
    import struct

    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x02\x00" + struct.pack(
        ">HH", 72, 72
    ) + b"\x00\x00"
    sof0 = b"\xff\xc0" + struct.pack(">HBHHB", 17, 8, height, width, 3)
    sof0 += bytes([1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1])
    pad = bytes([(seed * 31 + i) % 251 for i in range(16)])
    com = b"\xff\xfe" + struct.pack(">H", len(pad) + 2) + pad
    return b"\xff\xd8" + app0 + com + sof0 + b"\xff\xd9"


def parse_png_header(content: bytes) -> dict:
    import struct

    if content[:8] != PNG_SIG:
        raise ValueError("not a PNG: bad signature")
    if content[12:16] != b"IHDR":
        raise ValueError("not a PNG: first chunk is not IHDR")
    w, h, depth, color_type = struct.unpack(">IIBB", content[16:26])
    return {"format": "png", "width": w, "height": h, "bit_depth": depth,
            "channels": {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color_type]}


def parse_jpeg_header(content: bytes) -> dict:
    """Walk the marker stream to the first SOF0-SOF3 frame header."""
    import struct

    if content[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG: missing SOI")
    i = 2
    while i + 4 <= len(content):
        if content[i] != 0xFF:
            raise ValueError("not a JPEG: bad marker alignment")
        marker = content[i + 1]
        if marker in (0xC0, 0xC1, 0xC2, 0xC3):
            depth, h, w, ncomp = struct.unpack(">BHHB", content[i + 4 : i + 10])
            return {"format": "jpeg", "width": w, "height": h,
                    "bit_depth": depth, "channels": ncomp}
        if marker == 0xD9:
            break
        seg_len = struct.unpack(">H", content[i + 2 : i + 4])[0]
        i += 2 + seg_len
    raise ValueError("no SOF marker found")


def image_header_decoder(kind: str, content: bytes, meta: dict) -> dict:
    """REAL image decode (headers): dims/bit-depth parsed from the actual
    bytes, plus the content stats — features change whenever bytes do."""
    stats = fake_decoder(kind, content, meta)
    if kind == "image" and content[:8] == PNG_SIG:
        hdr = parse_png_header(content)
    elif kind == "image" and content[:2] == b"\xff\xd8":
        hdr = parse_jpeg_header(content)
    else:
        hdr = {"format": None, "width": None, "height": None,
               "bit_depth": None, "channels": None}
    return {**stats, **hdr}


IMAGE_FEATURE_SCHEMA = (
    FEATURE_SCHEMA
    + ", format string, width int, height int, bit_depth int, channels int"
)


def synthetic_image_media(df: DataFrame, id_col: str) -> DataFrame:
    """Media table whose image rows carry REAL encoded bytes (PNG for
    even ids, header-complete JPEG for odd), dims derived from the id —
    Arrow-batched generation, no shuffle."""
    import pandas as pd  # noqa: PLC0415 — worker-side import

    src = df.select(F.col(id_col).cast("long").alias("media_id"))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pb in batches:
            rows = []
            for mid in pb["media_id"]:
                mid = int(mid)
                w, h = mid % 31 + 2, mid % 23 + 2
                body = (
                    png_bytes(w, h, mid) if mid % 2 == 0 else jpeg_bytes(w, h, mid)
                )
                rows.append(
                    {"media_id": mid, "kind": "image", "content": body,
                     "meta_w": w, "meta_h": h}
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "kind", "content", "meta_w", "meta_h"]
            )

    return src.mapInPandas(
        gen, schema="media_id long, kind string, content binary, meta_w int, meta_h int"
    )


def extract_image_features(media: DataFrame) -> DataFrame:
    """Byte stats + REAL header decode in one Arrow pass."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["media_id", "kind", "n_bytes", "content_sha1", "byte_mean",
                "byte_entropy", "format", "width", "height", "bit_depth",
                "channels"]
        for pb in batches:
            rows = []
            for _, r in pb.iterrows():
                feats = image_header_decoder(
                    r["kind"], bytes(r["content"] or b""), {}
                )
                rows.append({"media_id": r["media_id"], "kind": r["kind"], **feats})
            yield pd.DataFrame(rows, columns=cols)

    return media.select("media_id", "kind", "content").mapInPandas(
        kernel, schema=IMAGE_FEATURE_SCHEMA
    )


def extract_features(
    media: DataFrame,
    decoder: Callable[[str, bytes, dict], dict] = unimplemented_decoder,
) -> DataFrame:
    """Decode/feature-extract each media item (Arrow-batched, no shuffle).

    The mapInPandas kernel is the template for any real per-item media
    op (resize, frame-sample, spectrogram): same batching, same schema
    discipline, swap the kernel.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pb in batches:
            rows = []
            for _, r in pb.iterrows():
                feats = decoder(r["kind"], bytes(r["content"] or b""), {})
                rows.append(
                    {"media_id": r["media_id"], "kind": r["kind"], **feats}
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "kind",
                    "n_bytes",
                    "content_sha1",
                    "byte_mean",
                    "byte_entropy",
                ],
            )

    return media.select("media_id", "kind", "content").mapInPandas(
        kernel, schema=FEATURE_SCHEMA
    )


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: expands each video into its frame
    timestamps JVM-side (sequence+explode — the expensive decode stays
    in a later mapInPandas kernel). Shows the partitioning shape: frames
    inherit the video's partition, no shuffle until a later groupBy."""
    vids = media.filter(F.col("kind") == "video")
    return vids.select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.col("meta.duration_ms") - 1,
                F.lit(every_ms),
            )
        ).alias("frame_ts_ms"),
    )


import sys as _sys

from ..util import pickle_by_value as _pbv

_pbv(_sys.modules[__name__])
