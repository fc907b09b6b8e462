"""Codec-level tests for the multimodal binary layer: the numpy-vectorized
PNG defilter must reproduce the spec (all five scanline filters), pinned
against an independent per-pixel reference implementation.
"""

from __future__ import annotations

import struct
import zlib

from tidb_spark.data import multimodal as mm


def _naive_defilter(raw: bytes, width: int, height: int) -> bytes:
    """Straight transcription of the PNG spec's per-pixel recurrences."""
    out = bytearray()
    prev = bytearray(width)
    for y in range(height):
        ftype = raw[y * (width + 1)]
        line = bytearray(raw[y * (width + 1) + 1 : (y + 1) * (width + 1)])
        for x in range(width):
            a = line[x - 1] if x else 0
            b = prev[x]
            c = prev[x - 1] if x else 0
            if ftype == 1:
                line[x] = (line[x] + a) & 0xFF
            elif ftype == 2:
                line[x] = (line[x] + b) & 0xFF
            elif ftype == 3:
                line[x] = (line[x] + (a + b) // 2) & 0xFF
            elif ftype == 4:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                line[x] = (line[x] + pr) & 0xFF
        out += line
        prev = line
    return bytes(out)


def _png_from_raw(raw: bytes, width: int, height: int) -> bytes:
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    return (
        mm.PNG_SIG
        + mm._png_chunk(b"IHDR", ihdr)
        + mm._png_chunk(b"IDAT", zlib.compress(raw))
        + mm._png_chunk(b"IEND", b"")
    )


def test_png_roundtrip_filter0():
    pixels = bytes((x * 7 + y * 13) & 0xFF for y in range(16) for x in range(9))
    data = mm.encode_png_gray(9, 16, pixels)
    w, h, got = mm.decode_png_gray(data)
    assert (w, h, got) == (9, 16, pixels)


def test_png_defilter_all_filters():
    """Every scanline filter type (incl. the sequential Average/Paeth
    paths) against the naive spec transcription, on wraparound-heavy
    data."""
    width, height = 7, 10
    rng_bytes = bytes((x * 251 + y * 197 + 11) & 0xFF
                      for y in range(height) for x in range(width))
    raw = bytearray()
    for y in range(height):
        raw.append(y % 5)  # cycle filter types 0..4
        raw += rng_bytes[y * width : (y + 1) * width]
    raw = bytes(raw)
    expected = _naive_defilter(raw, width, height)
    w, h, got = mm.decode_png_gray(_png_from_raw(raw, width, height))
    assert (w, h) == (width, height)
    assert got == expected
