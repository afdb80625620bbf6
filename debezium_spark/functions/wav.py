"""Dependency-free WAV (RIFF PCM) audio codec — numpy + struct only.

Shrinks the multimodal slot's audio gap to compressed formats only:
``audio/wav`` payloads decode FOR REAL next to the BMP/PNG/JPEG image
codecs (:mod:`debezium_spark.functions.multimodal`). PCM is lossless,
so encode→decode round-trips BIT-EXACTLY — the provable-correctness
property the tests pin (same discipline as the BMP codec).

Scope: canonical RIFF/WAVE with integer PCM (format tag 1), 8-bit
unsigned or 16-bit signed little-endian samples, any channel count and
rate; unknown chunks (LIST, fact, ...) are skipped per the RIFF
contract. Float PCM, 24-bit, ADPCM/MP3-in-WAV raise
``NotImplementedError`` — the documented profile boundary; compressed
audio (mp3/ogg/aac) and video stay behind the loud no-decoder error
(ffmpeg is not in this container).

Feature extraction (:func:`wav_features`) mirrors the image side's
grid means: global stats plus per-quarter segment RMS, every term an
exact integer-arithmetic ratio — bit-stable across platforms.
"""

from __future__ import annotations

import struct

import numpy as np


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode RIFF PCM to (samples int16 array of shape (n, channels),
    sample_rate). 8-bit input is widened to int16 (x*257 - 32768, the
    exact unsigned-to-signed full-scale map)."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + size]
        if len(body) < size:
            raise ValueError("WAV chunk truncated")
        if cid == b"fmt ":
            if size < 16:
                raise ValueError("WAV fmt chunk too small")
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt or data chunk")
    tag, channels, rate, _byte_rate, _block, bits = fmt
    if tag != 1:
        raise NotImplementedError(
            f"WAV format tag {tag} unsupported (integer PCM only)"
        )
    if channels < 1:
        raise ValueError("WAV with zero channels")
    if bits == 16:
        n = len(data) // (2 * channels)
        arr = np.frombuffer(
            data[: n * 2 * channels], dtype="<i2"
        ).reshape(n, channels)
        return arr.astype(np.int16), rate
    if bits == 8:
        n = len(data) // channels
        u = np.frombuffer(data[: n * channels], dtype=np.uint8).reshape(
            n, channels
        )
        return (u.astype(np.int32) * 257 - 32768).astype(np.int16), rate
    raise NotImplementedError(
        f"{bits}-bit WAV unsupported (8/16-bit PCM only)"
    )


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """Encode (n, channels) int16 samples as canonical 16-bit PCM."""
    if samples.ndim != 2 or samples.dtype != np.int16:
        raise ValueError("encode_wav expects (n, channels) int16")
    n, channels = samples.shape
    data = samples.astype("<i2").tobytes()
    fmt = struct.pack(
        "<HHIIHH", 1, channels, rate, rate * channels * 2, channels * 2, 16
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def wav_features(
    samples: np.ndarray, rate: int, dim: int = 16
) -> list[float]:
    """Deterministic audio features: [rate, channels, n_samples,
    duration_s, global mean, global RMS, peak, zero-crossing count,
    4 quarter-segment RMS values] padded/truncated to ``dim``. Sums
    run in exact int64 arithmetic before the final divisions."""
    n, channels = samples.shape
    a = samples.astype(np.int64)
    flat = a.mean(axis=1, dtype=np.int64) if channels > 1 else a[:, 0]
    feats = [
        float(rate),
        float(channels),
        float(n),
        float(n) / rate if rate else 0.0,
        float(a.sum()) / max(a.size, 1),
        float(np.sqrt((a * a).sum() / max(a.size, 1))),
        float(np.abs(a).max()) if n else 0.0,
        float(np.count_nonzero(np.signbit(flat[1:]) != np.signbit(flat[:-1])))
        if n > 1
        else 0.0,
    ]
    q = max(1, n // 4)
    for i in range(4):
        seg = a[i * q : (i + 1) * q if i < 3 else n]
        m = seg.size
        feats.append(
            float(np.sqrt((seg * seg).sum() / m)) if m else 0.0
        )
    feats = feats[:dim]
    feats += [0.0] * (dim - len(feats))
    return feats
