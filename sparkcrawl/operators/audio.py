"""Real WAV/PCM audio decoding + envelope-fingerprint near-dup.

Same thesis as operators/images.py: the decode seam only needs an
external library for entropy-coded formats — RIFF/WAVE PCM is plain
``struct`` over stdlib bytes, so a crawl corpus's audio payloads get
REAL features (duration, loudness, silence, zero-crossings) and a
REAL perceptual fingerprint with zero dependencies.

Fingerprint: the audio twin of dHash — split the mono signal into 65
equal frames, take per-frame energy, bit = energy[i] > energy[i+1].
Invariant to uniform volume scaling (it compares neighboring frames,
never absolute levels), so a re-normalized copy of the same clip
collides exactly; pair search reuses the pigeonhole-banded hamming
join from :func:`sparkcrawl.operators.images.hamming_near_dup_pairs`.

Compressed formats (mp3/ogg/aac) still raise — the honest seam until
libav exists in the runtime.
"""

from __future__ import annotations

import struct
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sparkcrawl.operators.images import hamming_near_dup_pairs


def decode_wav(payload: bytes) -> tuple[int, list[float]]:
    """(sample_rate, mono samples in [-1, 1]) from a RIFF/WAVE payload.

    Supports PCM (format 1) at 8-bit unsigned / 16-bit / 32-bit signed,
    any channel count (channels are mean-mixed to mono). Raises
    ValueError on anything else (compressed formats route to the
    guarded seam)."""
    if not payload or len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, rate, channels, bits, data = 12, None, None, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4:pos + 8])
        body = payload[pos + 8:pos + 8 + size]
        pos += 8 + size + (size & 1)  # chunks are word-aligned
        if cid == b"fmt ":
            fmt, channels, rate = struct.unpack("<HHI", body[:8])
            bits = struct.unpack("<H", body[14:16])[0]
            if fmt != 1:
                raise ValueError(f"only PCM supported, got format {fmt}")
            if bits not in (8, 16, 32):
                raise ValueError(f"unsupported bit depth {bits}")
        elif cid == b"data":
            data = body
    if rate is None or data is None:
        raise ValueError("missing fmt or data chunk")
    if bits == 8:
        frames = [(b - 128) / 128.0 for b in data]
    elif bits == 16:
        n = len(data) // 2
        frames = [v / 32768.0 for v in struct.unpack(f"<{n}h", data[:n * 2])]
    else:
        n = len(data) // 4
        frames = [v / 2147483648.0 for v in struct.unpack(f"<{n}i", data[:n * 4])]
    if channels > 1:
        usable = len(frames) - len(frames) % channels
        frames = [
            sum(frames[i:i + channels]) / channels
            for i in range(0, usable, channels)
        ]
    return rate, frames


def encode_wav(samples: list[float], sample_rate: int = 8000) -> bytes:
    """Minimal deterministic 16-bit mono PCM writer — the fixture/test
    generator; decode_wav(encode_wav(x)) round-trips to within one
    quantization step."""
    pcm = struct.pack(
        f"<{len(samples)}h",
        *[max(-32768, min(32767, round(s * 32767.0))) for s in samples],
    )
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt \
        + b"data" + struct.pack("<I", len(pcm)) + pcm
    return b"RIFF" + struct.pack("<I", len(body)) + body


def audio_stats(payload: bytes) -> dict:
    """Duration / RMS loudness / peak / zero-crossing rate / silence
    ratio from decoded samples — the quality-filter features an audio
    corpus pipeline gates on (too short, near-silent, clipped)."""
    rate, s = decode_wav(payload)
    n = len(s)
    if n == 0:
        return {"sample_rate": rate, "duration_s": 0.0, "rms": 0.0,
                "peak": 0.0, "zero_crossing_rate": 0.0, "silence_ratio": 1.0}
    rms = (sum(v * v for v in s) / n) ** 0.5
    zc = sum(1 for i in range(1, n) if (s[i - 1] < 0) != (s[i] < 0))
    silent = sum(1 for v in s if abs(v) < 0.01)
    return {
        "sample_rate": rate,
        "duration_s": n / rate,
        "rms": rms,
        "peak": max(abs(v) for v in s),
        "zero_crossing_rate": zc / (n - 1) if n > 1 else 0.0,
        "silence_ratio": silent / n,
    }


def audio_fingerprint64(payload: bytes) -> int:
    """64-bit energy-envelope difference hash (see module docstring).
    Signed 64-bit for lossless Spark ``bigint`` storage."""
    _, s = decode_wav(payload)
    if len(s) < 65:
        raise ValueError("clip too short to fingerprint (<65 samples)")
    energies = []
    for k in range(65):
        lo = k * len(s) // 65
        hi = max((k + 1) * len(s) // 65, lo + 1)
        energies.append(sum(v * v for v in s[lo:hi]) / (hi - lo))
    h = 0
    for i in range(64):
        h = (h << 1) | (1 if energies[i] > energies[i + 1] else 0)
    return h - (1 << 64) if h >= (1 << 63) else h


def audio_features(
    media: DataFrame,
    id_col: str = "media_ref",
    payload_col: str = "payload",
) -> DataFrame:
    """(id, sample_rate, duration_s, rms, peak, zero_crossing_rate,
    silence_ratio, fingerprint) per decodable WAV payload — one
    Arrow-batched ``mapInPandas`` pass, undecodable payloads dropped."""
    out_schema = T.StructType([
        T.StructField("id", T.StringType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("duration_s", T.DoubleType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("peak", T.DoubleType()),
        T.StructField("zero_crossing_rate", T.DoubleType()),
        T.StructField("silence_ratio", T.DoubleType()),
        T.StructField("fingerprint", T.LongType()),
    ])
    cols = media.select(
        F.col(id_col).cast("string").alias("id"), F.col(payload_col).alias("p")
    )

    def _feat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            recs = []
            for i, p in zip(b["id"], b["p"]):
                try:
                    st = audio_stats(bytes(p))
                    fp = audio_fingerprint64(bytes(p))
                except ValueError:
                    continue
                recs.append((
                    i, st["sample_rate"], st["duration_s"], st["rms"],
                    st["peak"], st["zero_crossing_rate"],
                    st["silence_ratio"], fp,
                ))
            yield pd.DataFrame(recs, columns=[f.name for f in out_schema])

    return cols.mapInPandas(_feat, out_schema)


def audio_near_dup_pairs(
    media: DataFrame,
    max_distance: int = 4,
    id_col: str = "media_ref",
    payload_col: str = "payload",
) -> DataFrame:
    """End-to-end perceptual audio near-dup: decode -> envelope
    fingerprint -> banded hamming pair search (shared with the image
    path — the hash space is identical)."""
    return hamming_near_dup_pairs(
        audio_features(media, id_col, payload_col),
        max_distance,
        hash_col="fingerprint",
    )
