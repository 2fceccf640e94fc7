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
