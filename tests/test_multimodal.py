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


# --- Baseline JPEG codec (data/jpeg.py, ITU-T T.81; r8) -------------------


def test_jpeg_roundtrip_grayscale():
    """Smooth grayscale content survives encode→decode within DCT
    quantization error (±2 for a linear ramp with Annex K tables)."""
    import numpy as np

    from tidb_spark.data.jpeg import decode_jpeg, encode_jpeg

    h, w = 24, 40
    img = (np.linspace(0, 255, w)[None, :] * np.ones((h, 1))).astype(np.uint8)
    W, H, px = decode_jpeg(encode_jpeg(img))
    assert (W, H) == (w, h) and px.shape == (h, w)
    assert np.abs(px.astype(int) - img.astype(int)).max() <= 2
    # Non-multiple-of-8 dims pad with edge replication and crop back.
    odd = img[:17, :31]
    W, H, px = decode_jpeg(encode_jpeg(odd))
    assert (W, H) == (31, 17) and px.shape == (17, 31)


def test_jpeg_roundtrip_color_420():
    """YCbCr 4:2:0: neutral-gray RGB decodes near-neutral; a color
    gradient stays within chroma-subsampling error bounds."""
    import numpy as np

    from tidb_spark.data.jpeg import decode_jpeg, encode_jpeg

    img = np.zeros((20, 34, 3), np.uint8)
    img[..., 0] = np.linspace(0, 255, 34)[None, :]
    img[..., 1] = np.linspace(255, 0, 20)[:, None]
    img[..., 2] = 128
    W, H, px = decode_jpeg(encode_jpeg(img))
    assert px.shape == (20, 34, 3)
    err = np.abs(px.astype(int) - img.astype(int))
    assert err.mean() < 8 and err.max() <= 40  # 2x2 chroma pooling edges


def test_jpeg_restart_markers():
    """DRI/RSTn resync: identical pixels to the unsegmented stream, DC
    predictors reset per interval (T.81 F.2.1.3.1)."""
    import numpy as np

    from tidb_spark.data.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (24, 40), dtype=np.uint8)
    plain = decode_jpeg(encode_jpeg(img))[2]
    with_dri = decode_jpeg(encode_jpeg(img, restart_interval=3))[2]
    assert np.array_equal(plain, with_dri)


def test_jpeg_progressive_bit_identical():
    """Progressive (SOF2: spectral selection + DC/AC successive
    approximation, T.81 §G) and baseline encodes share the same
    quantized coefficients by construction, so the decoder must produce
    BIT-IDENTICAL pixels for both — the strongest cross-check the two
    process classes admit."""
    import numpy as np

    from tidb_spark.data.jpeg import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    rng = np.random.default_rng(11)
    cases = [
        (np.linspace(0, 255, 40)[None, :] * np.ones((24, 1))).astype(
            np.uint8
        ),
        rng.integers(0, 256, (17, 31), dtype=np.uint8),
        rng.integers(0, 256, (20, 30, 3), dtype=np.uint8),  # pad rows+cols
    ]
    smooth = np.zeros((18, 26, 3), np.uint8)
    smooth[..., 0] = np.linspace(0, 255, 26)[None, :]
    smooth[..., 1] = np.linspace(255, 0, 18)[:, None]
    smooth[..., 2] = 77
    cases.append(smooth)
    for img in cases:
        base = decode_jpeg(encode_jpeg(img))[2]
        prog_bytes = encode_jpeg_progressive(img)
        assert b"\xff\xc2" in prog_bytes  # really SOF2
        prog = decode_jpeg(prog_bytes)[2]
        assert np.array_equal(base, prog), img.shape


def test_jpeg_honest_rejects():
    """Lossless (SOF3) / arithmetic (SOF9) raise NotImplementedError;
    corrupt streams and invalid progressive scan headers raise
    ValueError — never silent wrong pixels."""
    import numpy as np
    import pytest

    from tidb_spark.data.jpeg import decode_jpeg, encode_jpeg

    for bad_sof in (0xC3, 0xC9):  # lossless, arithmetic
        data = bytearray(encode_jpeg(np.zeros((8, 8), np.uint8)))
        sof = data.index(b"\xff\xc0")
        data[sof + 1] = bad_sof
        with pytest.raises(NotImplementedError):
            decode_jpeg(bytes(data))
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x00\x01rubbish")
    # Progressive relabel of a baseline stream: the full-band scan header
    # is illegal for SOF2 (DC scans must have Se=0) -> loud reject.
    data = bytearray(encode_jpeg(np.zeros((8, 8), np.uint8)))
    sof = data.index(b"\xff\xc0")
    data[sof + 1] = 0xC2
    with pytest.raises(ValueError, match="Se=0"):
        decode_jpeg(bytes(data))


def test_decode_media_sniffs_jpeg(spark):
    """decode_media routes \\xff\\xd8 payloads through the numpy codec:
    width/height exact, checksum equals the decoded pixel sum."""
    import numpy as np

    from tidb_spark.data import multimodal as mm
    from tidb_spark.data.jpeg import decode_jpeg, encode_jpeg

    img = (np.arange(16 * 24).reshape(16, 24) % 251).astype(np.uint8)
    payload = encode_jpeg(img)
    media = spark.createDataFrame(
        [(1, "image", bytearray(payload))],
        "media_id long, media_type string, payload binary",
    )
    row = mm.decode_media(media).collect()[0]
    _, _, px = decode_jpeg(payload)
    assert (row.width, row.height, row.n_units) == (24, 16, 1)
    assert row.checksum == int(px.astype(np.int64).sum())
