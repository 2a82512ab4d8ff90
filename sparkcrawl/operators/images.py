"""Real image decoding + perceptual-hash near-duplicate detection.

The multimodal pipeline's decode seam (operators/multimodal.py) is
honest about JPEG/webp needing PIL — but PNG does NOT: its container
is zlib (Python stdlib) + five fixed per-scanline filters, so a full
pixel decoder is ~60 lines of pure Python. That unlocks the operator a
crawl corpus actually needs over its image payloads: PERCEPTUAL
near-dup detection (the same thumbnail re-encoded, brightness-shifted,
or re-saved at another compression level has a different md5 but the
same dHash), which byte-exact dedup can never catch.

Pipeline shape at 100 TB:
  - dHash per payload: Arrow-batched ``mapInPandas`` (Python is
    unavoidable for entropy-coded bytes; one pass, no shuffle).
  - pair search: pigeonhole banding on the 64-bit hash — hamming
    distance <= d means at least one of d+1 bands is IDENTICAL, so
    candidates come from d+1 equi-joins on (band_idx, band_bits),
    never an all-pairs scan. Same contract as SimHash
    (operators/textops.py) and MinHash-LSH banding.
  - exact verify: ``bit_count(a ^ b)`` JVM-side on candidates only.

dHash (difference hash, public domain technique popularized by
Krawetz): grayscale -> box-resize to (hash_size+1) x hash_size ->
bit = left pixel > right pixel. Invariant to uniform brightness and
contrast scaling (it compares neighbors, never absolute values).
"""

from __future__ import annotations

import struct
import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


# --------------------------------------------------------------------------
# pure-stdlib PNG codec (8-bit gray / RGB / RGBA, non-interlaced)
# --------------------------------------------------------------------------

def decode_png(payload: bytes) -> tuple[int, int, list[list[float]]]:
    """Full PNG pixel decode -> (width, height, luma rows in [0,255]).

    Supports bit depth 8, color types 0 (gray), 2 (RGB), 4 (gray+A),
    6 (RGBA), non-interlaced — the shapes a crawler's thumbnail corpus
    is overwhelmingly made of. All five scanline filters (none / sub /
    up / average / paeth) are implemented per the PNG spec (RFC 2083
    §6). Raises ValueError on anything else; callers route those
    payloads to the guarded seam like any other undecodable format.
    """
    if not payload or not payload.startswith(_PNG_MAGIC):
        raise ValueError("not a PNG")
    pos, width, height, color_type, idat = 8, None, None, None, b""
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos:pos + 4])
        ctype = payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _, _, interlace = (
                struct.unpack(">IIBBBBB", data)
            )
            if bit_depth != 8 or interlace != 0:
                raise ValueError("only 8-bit non-interlaced PNGs supported")
            if color_type not in (0, 2, 4, 6):
                raise ValueError(f"unsupported color type {color_type}")
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
    if width is None or not idat:
        raise ValueError("missing IHDR or IDAT")
    bpp = {0: 1, 2: 3, 4: 2, 6: 4}[color_type]
    raw = zlib.decompress(idat)
    stride = width * bpp
    if len(raw) != (stride + 1) * height:
        raise ValueError("IDAT length mismatch")
    prev = bytearray(stride)
    rows: list[list[float]] = []
    for y in range(height):
        base = y * (stride + 1)
        filt = raw[base]
        line = bytearray(raw[base + 1:base + 1 + stride])
        if filt == 1:  # sub
            for i in range(bpp, stride):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif filt == 2:  # up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif filt == 3:  # average
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + (a + prev[i]) // 2) & 0xFF
        elif filt == 4:  # paeth
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                line[i] = (line[i] + pred) & 0xFF
        elif filt != 0:
            raise ValueError(f"bad filter byte {filt}")
        prev = line
        if color_type == 0:
            rows.append([float(v) for v in line])
        elif color_type == 4:
            rows.append([float(line[i]) for i in range(0, stride, 2)])
        else:  # RGB / RGBA: ITU-R BT.601 luma
            rows.append([
                0.299 * line[i] + 0.587 * line[i + 1] + 0.114 * line[i + 2]
                for i in range(0, stride, bpp)
            ])
    return width, height, rows


def encode_png(rgb_rows: list[list[tuple[int, int, int]]]) -> bytes:
    """Minimal deterministic PNG writer (8-bit RGB, filter 0) — the
    fixture/test generator; decode_png(encode_png(x)) round-trips
    exactly. zlib level pinned for byte-stable fixtures."""
    height = len(rgb_rows)
    width = len(rgb_rows[0])

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    raw = b"".join(
        b"\x00" + bytes(v for px in row for v in px) for row in rgb_rows
    )
    return (
        _PNG_MAGIC
        + chunk(b"IHDR", struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


# --------------------------------------------------------------------------
# dHash
# --------------------------------------------------------------------------

def _box_resize(rows: list[list[float]], out_w: int, out_h: int) -> list[list[float]]:
    """Box-average resize — each output cell is the mean of its source
    rectangle (deterministic, no library resamplers)."""
    in_h, in_w = len(rows), len(rows[0])
    out = []
    for oy in range(out_h):
        y0 = oy * in_h // out_h
        y1 = max((oy + 1) * in_h // out_h, y0 + 1)
        orow = []
        for ox in range(out_w):
            x0 = ox * in_w // out_w
            x1 = max((ox + 1) * in_w // out_w, x0 + 1)
            s = sum(rows[y][x] for y in range(y0, y1) for x in range(x0, x1))
            orow.append(s / ((y1 - y0) * (x1 - x0)))
        out.append(orow)
    return out


def dhash64(payload: bytes) -> int:
    """64-bit difference hash of a PNG payload (8x8 grid over a 9x8
    box-resized luma image; bit = left > right). Returned as SIGNED
    64-bit (two's complement) so it stores in a Spark ``bigint``
    losslessly."""
    _, _, rows = decode_png(payload)
    grid = _box_resize(rows, 9, 8)
    h = 0
    for y in range(8):
        for x in range(8):
            h = (h << 1) | (1 if grid[y][x] > grid[y][x + 1] else 0)
    return h - (1 << 64) if h >= (1 << 63) else h


def image_dhash(
    media: DataFrame,
    id_col: str = "media_ref",
    payload_col: str = "payload",
) -> DataFrame:
    """(id, dhash, width, height) per decodable PNG payload — Arrow-
    batched ``mapInPandas`` (entropy-coded bytes force Python; one
    pass, no shuffle, undecodable payloads dropped with a reason row
    philosophy left to the caller's quarantine query)."""
    out_schema = T.StructType([
        T.StructField("id", T.StringType()),
        T.StructField("dhash", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ])
    cols = media.select(
        F.col(id_col).cast("string").alias("id"), F.col(payload_col).alias("p")
    )

    def _hash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            recs = []
            for i, p in zip(b["id"], b["p"]):
                try:
                    w, h, _ = decode_png(bytes(p))
                    recs.append((i, dhash64(bytes(p)), w, h))
                except ValueError:
                    continue
            yield pd.DataFrame(recs, columns=["id", "dhash", "width", "height"])

    return cols.mapInPandas(_hash, out_schema)


def hamming_near_dup_pairs(
    hashes: DataFrame,
    max_distance: int = 4,
    id_col: str = "id",
    hash_col: str = "dhash",
) -> DataFrame:
    """(id_a < id_b, distance) for pairs with hamming(hash) <=
    ``max_distance`` — pigeonhole banding: split 64 bits into
    ``max_distance + 1`` bands; any qualifying pair has at least one
    band bit-identical, so candidates come from equi-joins on
    (band_idx, band_bits) and the exact ``bit_count(xor)`` verify only
    ever touches candidates. All JVM-side (shiftrightunsigned handles
    the signed-bigint storage), no Python, no all-pairs."""
    n_bands = max_distance + 1
    band_bits = 64 // n_bands
    h = hashes.select(F.col(id_col).alias("id"), F.col(hash_col).alias("h"))
    bands = h.select(
        "id", "h",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(k).alias("band"),
                    (
                        F.shiftrightunsigned(F.col("h"), k * band_bits)
                        .bitwiseAND(F.lit((1 << band_bits) - 1))
                    ).alias("bits"),
                )
                for k in range(n_bands)
            ])
        ).alias("bk"),
    ).select("id", "h", "bk.band", "bk.bits")
    cand = (
        bands.alias("a")
        .join(bands.alias("b"), ["band", "bits"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"), F.col("a.h").alias("h_a"),
            F.col("b.id").alias("id_b"), F.col("b.h").alias("h_b"),
        )
        .distinct()
    )
    return (
        cand.withColumn(
            "distance", F.bit_count(F.expr("h_a ^ h_b"))
        )
        .filter(F.col("distance") <= max_distance)
        .select("id_a", "id_b", "distance")
    )


def image_near_dup_pairs(
    media: DataFrame,
    max_distance: int = 4,
    id_col: str = "media_ref",
    payload_col: str = "payload",
) -> DataFrame:
    """End-to-end perceptual image near-dup: decode -> dHash ->
    banded hamming pair search. The media-side twin of MinHash-LSH
    text dedup; catches re-encoded/brightness-shifted copies that
    byte-exact dedup misses."""
    return hamming_near_dup_pairs(
        image_dhash(media, id_col, payload_col), max_distance
    )
