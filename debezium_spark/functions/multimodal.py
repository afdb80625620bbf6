"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are ``binary`` columns with a metadata
struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched pandas functions over ``mapInPandas``. The actual codec
step is STUBBED (image/audio libraries are not in this container):
``decode_stub_features`` produces deterministic fake features from the
payload bytes so the Spark-side plumbing — schema, batch shape,
partition-preserving mapInPandas, pushdown-friendly metadata filters —
is real and tested end-to-end; swap the inner function for PIL/ffmpeg
in production.
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
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("n_bytes", T.LongType()),
                    T.StructField("sha256", T.StringType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("mime", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def to_media_table(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Adapt a text table into the opaque-binary media shape (payload =
    utf-8 bytes). Metadata (mime / size / digest) is computed JVM-side
    so metadata-only queries never touch payload bytes (column
    pruning)."""
    payload = F.encode(F.col(text_col), "utf-8")
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        payload.alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.length(payload).cast("long").alias("n_bytes"),
            F.sha2(payload, 256).alias("sha256"),
        ).alias("meta"),
    )


def media_metadata(df: DataFrame) -> DataFrame:
    """Metadata-only projection — at scale this reads only the meta
    column group from parquet, never the payload blobs."""
    return df.select(
        "media_id", "meta.mime", "meta.n_bytes", "meta.sha256"
    )


def _fake_feature(payload: bytes, dim: int) -> list[float]:
    """Deterministic stand-in for a real decoder+encoder: md5-seeded
    floats in [0,1). Replace with e.g. PIL decode + CNN embedding.

    Seed = ``payload || '|i'`` (text suffix, not raw bytes) so a SQL
    oracle can reproduce the digest with ``md5(text || '|0')`` and
    value-check the Arrow decode pipeline end-to-end."""
    out: list[float] = []
    i = 0
    while len(out) < dim:
        h = hashlib.md5(payload + f"|{i}".encode()).digest()
        out.extend(b / 255.0 for b in h)
        i += 1
    return out[:dim]


def decode_stub_features(df: DataFrame, dim: int = 16) -> DataFrame:
    """Arrow-batched decode/feature-extract over mapInPandas.

    Metadata columns (mime, n_bytes) are projected JVM-side BEFORE the
    Python boundary, so the Arrow batch carries them as plain vectors —
    inside the batch only the payload→feature call touches Python
    per element, which is exactly where a C codec call would sit (the
    unavoidable Python slot). Raises NotImplementedError for mimes we
    don't stub, mirroring a real decoder's unsupported-codec path.
    """
    flat = df.select(
        "media_id",
        F.col("meta.mime").alias("mime"),
        F.col("meta.n_bytes").alias("n_bytes"),
        "payload",
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            unsupported = set(pdf["mime"].unique()) - {"text/plain"}
            if unsupported:
                raise NotImplementedError(
                    f"no decoder stub for {sorted(unsupported)}; "
                    "real image/audio decode requires PIL/ffmpeg"
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": pdf["mime"],
                    "n_bytes": pdf["n_bytes"],
                    # the codec slot: the ONLY per-element Python
                    "feature": pdf["payload"].map(
                        lambda p: _fake_feature(bytes(p), dim)
                    ),
                }
            )

    return flat.mapInPandas(run, schema=FEATURE_SCHEMA)


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("src_w", T.IntegerType()),
        T.StructField("src_h", T.IntegerType()),
        T.StructField("out_w", T.IntegerType()),
        T.StructField("out_h", T.IntegerType()),
        T.StructField("resized", T.BinaryType()),
        T.StructField("out_md5", T.StringType()),
    ]
)


def resize_stub(df: DataFrame, max_w: int = 256, max_h: int = 256) -> DataFrame:
    """Resize plumbing over the opaque payload: thumbnail-fit target
    dimensions (never upscale, aspect preserved, exact integer
    division) are computed JVM-side BEFORE the Python boundary; the
    Arrow batch then runs the codec slot — here a deterministic md5
    stand-in for PIL's ``Image.resize`` — as the ONLY per-element
    Python, mirroring :func:`decode_stub_features`.

    Source dims come from a deterministic fixture adapter over
    ``n_bytes`` (a real deployment reads them from the metadata
    struct); the fake resized payload is the 16-byte md5 of
    ``payload || '|resize|WxH'`` so a SQL oracle can value-check the
    whole pipeline (``md5(text || ...)``) without a real decoder."""
    w = (F.lit(16) + F.col("meta.n_bytes") % 497).cast("int")
    h = (F.lit(16) + (F.col("meta.n_bytes") * 31) % 359).cast("int")
    fits = (w <= max_w) & (h <= max_h)
    wide = w * max_h >= h * max_w  # w/h >= max_w/max_h
    out_w = (
        F.when(fits, w)
        .when(wide, F.lit(max_w))
        .otherwise(F.floor(w * max_h / h).cast("int"))
        .cast("int")
    )
    out_h = (
        F.when(fits, h)
        .when(wide, F.floor(h * max_w / w).cast("int"))
        .otherwise(F.lit(max_h))
        .cast("int")
    )
    flat = df.select(
        "media_id",
        w.alias("src_w"),
        h.alias("src_h"),
        F.greatest(out_w, F.lit(1)).alias("out_w"),
        F.greatest(out_h, F.lit(1)).alias("out_h"),
        "payload",
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized = [
                hashlib.md5(
                    bytes(p) + f"|resize|{ow}x{oh}".encode()
                ).digest()
                for p, ow, oh in zip(
                    pdf["payload"], pdf["out_w"], pdf["out_h"]
                )
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "src_w": pdf["src_w"],
                    "src_h": pdf["src_h"],
                    "out_w": pdf["out_w"],
                    "out_h": pdf["out_h"],
                    "resized": resized,
                    "out_md5": [r.hex() for r in resized],
                }
            )

    return flat.mapInPandas(run, schema=RESIZE_SCHEMA)


def frame_sample(
    df: DataFrame, every_n_bytes: int = 64, max_frames: int = 8
) -> DataFrame:
    """'Frame sampling' over the opaque payload: deterministic byte-
    offset slices (the video-frame analogue), pure JVM ops — shows the
    explode-per-frame schema shape a real sampler produces."""
    offsets = F.slice(
        F.sequence(F.lit(0), F.greatest(F.col("meta.n_bytes") - 1, F.lit(0)), F.lit(every_n_bytes)),
        1,
        max_frames,
    )
    return df.select(
        "media_id",
        F.posexplode(offsets).alias("frame_idx", "byte_offset"),
        F.col("meta.n_bytes").alias("n_bytes"),
    ).select(
        "media_id",
        "frame_idx",
        "byte_offset",
        "n_bytes",
    )
