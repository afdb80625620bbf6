"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are ``binary`` columns with a metadata
struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched pandas functions over ``mapInPandas``.

Codec status: ``image/bmp``, ``image/png`` AND ``image/jpeg`` decode
FOR REAL through dependency-free codecs — 24-bit BMP as pure-numpy
reshapes (:func:`decode_bmp` / :func:`encode_bmp`), 8-bit PNG via
stdlib zlib + spec-exact scanline unfiltering (:func:`decode_png` /
:func:`encode_png`), and baseline-sequential 4:4:4 JPEG with generic
DHT Huffman decode + numpy DCT (:mod:`debezium_spark.functions.jpeg`)
— with real grid-mean features (:func:`bmp_features`) and a real
nearest-neighbor resize that re-encodes in the source format
(:func:`resize_images`). ``text/plain`` keeps the deterministic
digest stand-in so the catalog's SQL oracles can value-check the
Arrow pipeline. ``audio/wav`` also decodes for real (RIFF integer PCM
via :mod:`debezium_spark.functions.wav` — lossless, bit-exact round
trip). The remaining mimes (compressed audio/video, and profiles
outside each codec's documented subset) raise ``NotImplementedError``
— ffmpeg is not in this container, and a loud unsupported-codec error
is a real decoder's behavior too.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
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


# ---------------------------------------------------------------------------
# Pure-numpy BMP codec (24-bit uncompressed BI_RGB — the dependency-free
# raster format; BITMAPFILEHEADER + BITMAPINFOHEADER per the public
# Windows BMP spec). Vectorized: decode/encode are numpy reshapes, no
# per-pixel Python.
# ---------------------------------------------------------------------------


def decode_bmp(data: bytes) -> np.ndarray:
    """Decode a 24-bit uncompressed BMP to an ``(h, w, 3)`` uint8 RGB
    array. Handles bottom-up (positive height) and top-down (negative
    height) layouts and 4-byte row padding. Raises ``ValueError`` on a
    non-BMP payload and ``NotImplementedError`` on BMP variants outside
    the 24-bit BI_RGB profile (palette, RLE, bitfields)."""
    if len(data) < 54 or data[:2] != b"BM":
        raise ValueError("not a BMP payload")
    off = int.from_bytes(data[10:14], "little")
    hdr = int.from_bytes(data[14:18], "little")
    if hdr < 40:
        raise NotImplementedError(f"BMP header size {hdr} unsupported")
    w = int.from_bytes(data[18:22], "little", signed=True)
    h = int.from_bytes(data[22:26], "little", signed=True)
    bpp = int.from_bytes(data[28:30], "little")
    comp = int.from_bytes(data[30:34], "little")
    if bpp != 24 or comp != 0:
        raise NotImplementedError(
            f"only 24-bit BI_RGB BMPs are decoded (got bpp={bpp}, "
            f"compression={comp})"
        )
    top_down, h = h < 0, abs(h)
    if w <= 0 or h == 0:
        raise ValueError(f"bad BMP dimensions {w}x{h}")
    stride = (w * 3 + 3) & ~3
    if off + stride * h > len(data):
        raise ValueError("truncated BMP payload")
    raw = np.frombuffer(data, np.uint8, count=stride * h, offset=off)
    px = raw.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if not top_down:
        px = px[::-1]
    return px[..., ::-1].copy()  # stored BGR -> RGB


def encode_bmp(arr: np.ndarray) -> bytes:
    """Encode an ``(h, w, 3)`` uint8 RGB array as a canonical 24-bit
    bottom-up BI_RGB BMP — byte-deterministic, so digests over the
    output are stable oracle material."""
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError(f"expected (h, w, 3) array, got {arr.shape}")
    h, w, _ = arr.shape
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = arr[::-1, :, ::-1].reshape(h, w * 3)  # RGB->BGR
    size = 54 + stride * h
    header = (
        b"BM"
        + size.to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + (54).to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")
        + (stride * h).to_bytes(4, "little")
        + (2835).to_bytes(4, "little")  # 72 DPI
        + (2835).to_bytes(4, "little")
        + (0).to_bytes(4, "little")
        + (0).to_bytes(4, "little")
    )
    return header + rows.tobytes()


# ---------------------------------------------------------------------------
# Pure-Python/numpy PNG codec (8-bit RGB / RGBA / grayscale,
# non-interlaced — the common web profile). Nothing beyond stdlib zlib:
# chunk walk, IDAT inflate, scanline unfiltering per the PNG spec
# (filters 0-4). Sub/None/Up rows unfilter vectorized; Average/Paeth
# rows carry an up+left dependency and run per-pixel — inside the
# Arrow codec slot, where a C codec's inner loop would sit anyway.
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def decode_png(data: bytes) -> np.ndarray:
    """Decode an 8-bit non-interlaced PNG (color types 0 gray, 2 RGB,
    6 RGBA) to an ``(h, w, 3)`` uint8 RGB array (alpha dropped, gray
    replicated). Raises ValueError on a non-PNG payload and
    NotImplementedError on profiles outside this subset (palette,
    16-bit, interlaced)."""
    import zlib

    if len(data) < 8 or data[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, ihdr, idat = 8, None, b""
    while pos + 8 <= len(data):
        ln = int.from_bytes(data[pos : pos + 4], "big")
        typ = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + ln]
        pos += 12 + ln
        if typ == b"IHDR":
            ihdr = body
        elif typ == b"IDAT":
            idat += body
        elif typ == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("truncated PNG payload")
    w = int.from_bytes(ihdr[0:4], "big")
    h = int.from_bytes(ihdr[4:8], "big")
    depth, ct, comp, filt, interlace = ihdr[8:13]
    if depth != 8 or ct not in (0, 2, 6) or interlace != 0:
        raise NotImplementedError(
            f"only 8-bit non-interlaced gray/RGB/RGBA PNGs are decoded "
            f"(got depth={depth}, colortype={ct}, interlace={interlace})"
        )
    bpp = {0: 1, 2: 3, 6: 4}[ct]
    raw = zlib.decompress(idat)
    stride = w * bpp
    if len(raw) < h * (stride + 1):
        raise ValueError("truncated PNG pixel data")
    out = np.zeros((h, stride), dtype=np.uint8)
    prior = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        ftype = raw[y * (stride + 1)]
        row = np.frombuffer(
            raw, np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).astype(np.int64)
        if ftype == 0:
            rec = row
        elif ftype == 1:  # Sub: cumsum per byte lane, vectorized
            rec = row.copy()
            for c in range(bpp):
                rec[c::bpp] = np.cumsum(rec[c::bpp]) % 256
        elif ftype == 2:  # Up
            rec = (row + prior) % 256
        elif ftype in (3, 4):  # Average / Paeth: left+up dependency
            rec = np.zeros(stride, dtype=np.int64)
            pr = prior.astype(np.int64)
            for x in range(stride):
                left = rec[x - bpp] if x >= bpp else 0
                up = pr[x]
                if ftype == 3:
                    pred = (left + up) // 2
                else:
                    ul = pr[x - bpp] if x >= bpp else 0
                    p = left + up - ul
                    pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                    pred = (
                        left
                        if pa <= pb and pa <= pc
                        else up if pb <= pc else ul
                    )
                rec[x] = (row[x] + pred) % 256
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
        out[y] = rec.astype(np.uint8)
        prior = out[y]
    px = out.reshape(h, w, bpp)
    if ct == 0:
        return np.repeat(px, 3, axis=2)
    return px[:, :, :3].copy()


def encode_png(arr: np.ndarray, row_filters: list[int] | None = None) -> bytes:
    """Encode an ``(h, w, 3)`` uint8 RGB array as an 8-bit PNG.
    ``row_filters`` optionally picks the per-row filter (0-4; default
    all 0) — tests use it to exercise every unfilter path against the
    decoder. Deterministic bytes (fixed zlib level)."""
    import zlib

    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError(f"expected (h, w, 3) array, got {arr.shape}")
    h, w, _ = arr.shape
    bpp = 3
    filters = row_filters or [0] * h
    if len(filters) != h:
        raise ValueError("row_filters must have one entry per row")
    rows = arr.astype(np.int64).reshape(h, w * bpp)
    body = bytearray()
    prior = np.zeros(w * bpp, dtype=np.int64)
    for y, f in enumerate(filters):
        cur = rows[y]
        left = np.concatenate([np.zeros(bpp, dtype=np.int64), cur[:-bpp]])
        ul = np.concatenate([np.zeros(bpp, dtype=np.int64), prior[:-bpp]])
        if f == 0:
            filt = cur
        elif f == 1:
            filt = (cur - left) % 256
        elif f == 2:
            filt = (cur - prior) % 256
        elif f == 3:
            filt = (cur - (left + prior) // 2) % 256
        elif f == 4:
            p = left + prior - ul
            pa, pb, pc = np.abs(p - left), np.abs(p - prior), np.abs(p - ul)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prior, ul)
            )
            filt = (cur - pred) % 256
        else:
            raise ValueError(f"bad PNG filter type {f}")
        body.append(f)
        body.extend(filt.astype(np.uint8).tobytes())
        prior = cur

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            len(data).to_bytes(4, "big")
            + typ
            + data
            + (zlib.crc32(typ + data) & 0xFFFFFFFF).to_bytes(4, "big")
        )

    ihdr = (
        w.to_bytes(4, "big")
        + h.to_bytes(4, "big")
        + bytes([8, 2, 0, 0, 0])
    )
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(body), 6))
        + chunk(b"IEND", b"")
    )


def decode_image(mime: str, payload: bytes) -> np.ndarray:
    """Codec dispatch for the REAL in-sandbox formats."""
    if mime == "image/bmp":
        return decode_bmp(payload)
    if mime == "image/png":
        return decode_png(payload)
    if mime == "image/jpeg":
        from debezium_spark.functions.jpeg import decode_jpeg

        return decode_jpeg(payload)
    raise NotImplementedError(f"no decoder for {mime!r}")


def encode_image(mime: str, arr: np.ndarray) -> bytes:
    if mime == "image/bmp":
        return encode_bmp(arr)
    if mime == "image/png":
        return encode_png(arr)
    if mime == "image/jpeg":
        from debezium_spark.functions.jpeg import encode_jpeg

        return encode_jpeg(arr)
    raise NotImplementedError(f"no encoder for {mime!r}")


def resize_nearest(arr: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize via numpy index maps (PIL NEAREST's
    sampling grid: source index = floor((i + 0.5) * src / dst)) —
    deterministic integer arithmetic, no per-pixel Python."""
    h, w, _ = arr.shape
    ys = ((np.arange(out_h) * 2 + 1) * h) // (2 * out_h)
    xs = ((np.arange(out_w) * 2 + 1) * w) // (2 * out_w)
    return arr[ys][:, xs]


def bmp_features(arr: np.ndarray, dim: int = 16) -> list[float]:
    """Deterministic real image features: [w, h, global per-channel
    means, 4 overlapping-quadrant per-channel means] padded/truncated
    to ``dim``. Means are exact integer sums divided by counts — bit-
    stable across platforms (no accumulated float error)."""
    h, w, _ = arr.shape
    a = arr.astype(np.int64)
    feats = [float(w), float(h)]
    feats += [float(a[..., c].sum()) / (h * w) for c in range(3)]
    hh, hw = (h + 1) // 2, (w + 1) // 2  # overlap when odd: never empty
    quads = [
        a[:hh, :hw],
        a[:hh, w - hw :],
        a[h - hh :, :hw],
        a[h - hh :, w - hw :],
    ]
    for q in quads:
        n = q.shape[0] * q.shape[1]
        feats += [float(q[..., c].sum()) / n for c in range(3)]
    feats = feats[:dim]
    feats += [0.0] * (dim - len(feats))
    return feats


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
    unavoidable Python slot). ``image/bmp`` runs the REAL pure-numpy
    codec (:func:`decode_bmp` + :func:`bmp_features`); ``text/plain``
    keeps the SQL-oracle-reproducible digest stand-in; anything else
    raises NotImplementedError, a real decoder's unsupported-codec
    path."""
    flat = df.select(
        "media_id",
        F.col("meta.mime").alias("mime"),
        F.col("meta.n_bytes").alias("n_bytes"),
        "payload",
    )

    def one(mime: str, payload) -> list[float]:
        if mime in ("image/bmp", "image/png", "image/jpeg"):
            return bmp_features(decode_image(mime, bytes(payload)), dim)
        if mime == "audio/wav":
            from debezium_spark.functions.wav import (
                decode_wav,
                wav_features,
            )

            return wav_features(*decode_wav(bytes(payload)), dim=dim)
        if mime == "text/plain":
            return _fake_feature(bytes(payload), dim)
        raise NotImplementedError(
            f"no decoder for {mime!r}; compressed audio/video decode "
            "requires ffmpeg"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": pdf["mime"],
                    "n_bytes": pdf["n_bytes"],
                    # the codec slot: the ONLY per-element Python
                    "feature": [
                        one(m, p)
                        for m, p in zip(pdf["mime"], pdf["payload"])
                    ],
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


def resize_images(
    df: DataFrame, max_w: int = 256, max_h: int = 256
) -> DataFrame:
    """REAL image resize for ``image/bmp`` payloads: decode with the
    pure-numpy codec, thumbnail-fit (never upscale, aspect preserved,
    integer floor division — the same fit rule as :func:`resize_stub`),
    nearest-neighbor resample, re-encode canonically. ``out_md5`` is
    the digest of the actual resized BMP bytes — bit-checkable against
    an independent decoder. Source dims come from the BMP header
    inside the codec slot (a blob's true dims live in the blob)."""
    flat = df.select(
        "media_id", F.col("meta.mime").alias("mime"), "payload"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "media_id": list(pdf["media_id"]),
                "src_w": [], "src_h": [], "out_w": [], "out_h": [],
                "resized": [], "out_md5": [],
            }
            for m, p in zip(pdf["mime"], pdf["payload"]):
                if m not in ("image/bmp", "image/png", "image/jpeg"):
                    raise NotImplementedError(
                        "resize_images decodes image/bmp, image/png "
                        f"and image/jpeg only, got {m!r}"
                    )
                px = decode_image(m, bytes(p))
                h, w = px.shape[:2]
                if w <= max_w and h <= max_h:
                    ow, oh = w, h
                elif w * max_h >= h * max_w:  # wide: clamp width
                    ow, oh = max_w, max(1, (h * max_w) // w)
                else:
                    ow, oh = max(1, (w * max_h) // h), max_h
                # re-encode canonically in the SOURCE format
                data = encode_image(m, resize_nearest(px, ow, oh))
                out["src_w"].append(w)
                out["src_h"].append(h)
                out["out_w"].append(ow)
                out["out_h"].append(oh)
                out["resized"].append(data)
                out["out_md5"].append(hashlib.md5(data).hexdigest())
            yield pd.DataFrame(out)

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
