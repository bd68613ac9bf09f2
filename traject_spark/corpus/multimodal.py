"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

The Spark-side machinery (schema, Arrow-batched UDF signatures, partition
sizing) is real and tested; the actual media decoding is STUBBED — the
image/audio libraries are not available in this environment. Each decode
hook either raises NotImplementedError (strict mode) or produces a
deterministic fake (test mode) so the pipeline shape can be validated
end-to-end.

Usage shape:
    df = attach_media_metadata(df, "payload", kind="image")
    feats = extract_features(df, "payload", kind="image", fake=True)
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, FloatType, LongType, StringType, StructField,
    StructType,
)

#: typed metadata carried alongside every opaque media payload
MEDIA_META_TYPE = StructType([
    StructField("kind", StringType()),        # image | audio | video
    StructField("format", StringType()),      # sniffed container/codec
    StructField("n_bytes", LongType()),
    StructField("sha1", StringType()),
])

FEATURE_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("kind", StringType()),
    StructField("feature", ArrayType(FloatType())),
])

_MAGIC = [
    (b"\x89PNG", "png"), (b"\xff\xd8\xff", "jpeg"), (b"GIF8", "gif"),
    (b"RIFF", "riff"), (b"fLaC", "flac"), (b"\x1aE\xdf\xa3", "matroska"),
    (b"\x00\x00\x00", "mp4?"),
]


def sniff_format_expr(payload):
    """Container sniffing from magic bytes — pure Column expression."""
    hexhead = F.hex(F.substring(payload, 1, 4))
    out = F.lit("unknown")
    for magic, name in reversed(_MAGIC):
        out = F.when(
            hexhead.startswith(magic.hex().upper()), F.lit(name)
        ).otherwise(out)
    return out


def attach_media_metadata(df: DataFrame, payload_col: str, kind: str) -> DataFrame:
    """Add a typed ``meta`` struct next to an opaque binary column."""
    p = F.col(payload_col)
    return df.withColumn(
        "meta",
        F.struct(
            F.lit(kind).alias("kind"),
            sniff_format_expr(p).alias("format"),
            F.length(p).cast("long").alias("n_bytes"),
            F.sha1(p).alias("sha1"),
        ),
    )


def _fake_feature(payload: bytes, dim: int) -> list[float]:
    """Deterministic stand-in for a real decode+embed (content-seeded)."""
    if payload is None:
        return [0.0] * dim
    seed = int.from_bytes(payload[:8].ljust(8, b"\0"), "little")
    out = []
    state = seed & 0xFFFFFFFFFFFFFFFF
    for _ in range(dim):
        state = (state * 6364136223846793005 + 1442695040888963407) & 0xFFFFFFFFFFFFFFFF
        out.append(((state >> 11) / float(1 << 53)) * 2.0 - 1.0)
    return out


def extract_features(
    df: DataFrame,
    payload_col: str,
    id_col: str = "media_id",
    kind: str = "image",
    dim: int = 16,
    fake: bool = False,
    batch_size_hint: int = 64,
) -> DataFrame:
    """Decode + feature-extract media payloads via mapInPandas.

    Real decoding is unavailable here — with ``fake=False`` this raises
    NotImplementedError at execution time (per batch). With ``fake=True``
    a deterministic content-seeded vector is produced so the plumbing
    (schema, Arrow batching, partition shape) is exercised for real.

    mapInPandas (not a scalar UDF) so one media row can fan out to N
    feature rows (e.g. video frame sampling) without a second explode.
    """
    spark_conf_cols = [id_col, payload_col]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    f"{kind} decoding requires media libraries not present "
                    "in this environment; pass fake=True for the "
                    "deterministic test path"
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col],
                    "kind": kind,
                    "feature": [
                        _fake_feature(p, dim) for p in pdf[payload_col]
                    ],
                }
            )

    return df.select(*spark_conf_cols).mapInPandas(run, FEATURE_SCHEMA)


def sample_frames(
    df: DataFrame,
    payload_col: str,
    id_col: str = "media_id",
    every_n: int = 10,
    fake: bool = False,
) -> DataFrame:
    """Video frame sampling: one row in, N frame rows out (mapInPandas).

    Stubbed like extract_features; the fake path emits ceil(n_bytes/1000)
    pseudo-frames so downstream fan-out logic is testable.
    """
    schema = StructType([
        StructField("media_id", LongType()),
        StructField("frame_index", LongType()),
        StructField("frame", BinaryType()),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "video decoding requires media libraries not present "
                    "in this environment; pass fake=True for the "
                    "deterministic test path"
                )
            ids, idxs, frames = [], [], []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                n = 0 if payload is None else max(1, len(payload) // 1000)
                for i in range(0, n, every_n):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(payload[i : i + 16] if payload else b"")
            yield pd.DataFrame({"media_id": ids, "frame_index": idxs, "frame": frames})

    return df.select(id_col, payload_col).mapInPandas(run, schema)
