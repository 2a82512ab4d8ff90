"""Pure-stdlib PNG codec + dHash perceptual near-dup (operators/images.py)."""

import hashlib
import struct
import zlib

import pytest

from sparkcrawl.operators import images


def _pattern(w, h, f=lambda x, y: ((x * 11 + y * 7) % 150) + 50):
    return [[(f(x, y), (f(x, y) * 2) % 200, 255 - f(x, y)) for x in range(w)]
            for y in range(h)]


def _luma(rgb_rows):
    return [[0.299 * r + 0.587 * g + 0.114 * b for (r, g, b) in row]
            for row in rgb_rows]


def test_png_roundtrip_exact():
    rgb = _pattern(13, 7)  # deliberately non-square, odd sizes
    w, h, rows = images.decode_png(images.encode_png(rgb))
    assert (w, h) == (13, 7)
    expect = _luma(rgb)
    for y in range(7):
        for x in range(13):
            assert rows[y][x] == pytest.approx(expect[y][x], abs=1e-9)


def _encode_with_filters(rgb_rows, filters):
    """Hand-build a PNG using a chosen filter type per scanline
    (forward-filtering per RFC 2083 §6) — exercises the decoder's
    sub/up/average/paeth reconstruction, which encode_png (filter 0
    only) never produces."""
    height, width = len(rgb_rows), len(rgb_rows[0])
    bpp, stride = 3, width * 3
    flat = [bytes(v for px in row for v in px) for row in rgb_rows]
    prev = bytes(stride)
    raw = b""
    for y, filt in zip(range(height), filters):
        line = flat[y]
        out = bytearray()
        for i in range(stride):
            a = line[i - bpp] if i >= bpp else 0
            b = prev[i]
            c = prev[i - bpp] if i >= bpp else 0
            if filt == 0:
                out.append(line[i])
            elif filt == 1:
                out.append((line[i] - a) & 0xFF)
            elif filt == 2:
                out.append((line[i] - b) & 0xFF)
            elif filt == 3:
                out.append((line[i] - (a + b) // 2) & 0xFF)
            else:  # paeth
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                out.append((line[i] - pred) & 0xFF)
        raw += bytes([filt]) + bytes(out)
        prev = line

    def chunk(ctype, data):
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))

    return (b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b""))


def test_png_all_filter_types_reconstruct():
    rgb = _pattern(8, 5)
    payload = _encode_with_filters(rgb, [0, 1, 2, 3, 4])
    w, h, rows = images.decode_png(payload)
    expect = _luma(rgb)
    for y in range(5):
        for x in range(8):
            assert rows[y][x] == pytest.approx(expect[y][x], abs=1e-9), (y, x)


def test_png_rejects_garbage_and_unsupported():
    with pytest.raises(ValueError):
        images.decode_png(b"GIF89a\x01\x00\x01\x00")
    with pytest.raises(ValueError):
        images.decode_png(b"")
    # 16-bit depth unsupported
    bad = bytearray(images.encode_png(_pattern(4, 4)))
    bad[24] = 16  # bit-depth byte inside IHDR
    with pytest.raises(ValueError):
        images.decode_png(bytes(bad))


def _cell_image(base: int, shift: int = 0, cell_px: int = 2):
    """18x16 image whose 9x8 cell grid carries md5-derived levels —
    dHash bits become pure functions of `base`."""
    cells = [[60 + hashlib.md5(f"{base}-{y}-{x}".encode()).digest()[0] % 120
              for x in range(9)] for y in range(8)]
    rgb = [[(min(cells[y // cell_px][x // cell_px] + shift, 255),) * 3
            for x in range(9 * cell_px)] for y in range(8 * cell_px)]
    return images.encode_png(rgb)


def test_dhash_brightness_invariant_and_discriminative():
    a = images.dhash64(_cell_image(1))
    a_bright = images.dhash64(_cell_image(1, shift=30))
    b = images.dhash64(_cell_image(2))
    assert a == a_bright  # neighbor comparisons survive uniform shift
    # distinct content differs in many bits
    assert bin((a ^ b) & ((1 << 64) - 1)).count("1") > 10


def test_hamming_pairs_signed_hash_handling(spark):
    """Hashes with bit 63 set are negative bigints — banding must use
    unsigned shifts and the verify must still count xor bits right."""
    rows = [("a", -1), ("b", -2), ("c", 0)]  # a^b = 1 bit; a^c = 64 bits
    df = spark.createDataFrame(rows, ["id", "dhash"])
    pairs = {(r["id_a"], r["id_b"]): r["distance"]
             for r in images.hamming_near_dup_pairs(df, max_distance=4).collect()}
    assert pairs == {("a", "b"): 1}


def test_image_near_dup_end_to_end(spark):
    """Three PNGs (A, brightness-shifted A', distinct B) + one garbage
    payload: exactly the (A, A') pair at distance 0 survives; the
    undecodable payload is dropped, not fatal."""
    rows = [
        ("imgA", bytearray(_cell_image(7))),
        ("imgA2", bytearray(_cell_image(7, shift=25))),
        ("imgB", bytearray(_cell_image(8))),
        ("junk", bytearray(b"\xff\xd8\xff not actually decodable")),
    ]
    media = spark.createDataFrame(rows, ["media_ref", "payload"])
    hashes = images.image_dhash(media)
    got = {r["id"]: r for r in hashes.collect()}
    assert set(got) == {"imgA", "imgA2", "imgB"}
    assert got["imgA"]["width"] == 18 and got["imgA"]["height"] == 16
    pairs = images.image_near_dup_pairs(media, max_distance=4).collect()
    assert [(p["id_a"], p["id_b"], p["distance"]) for p in pairs] == [
        ("imgA", "imgA2", 0)
    ]
