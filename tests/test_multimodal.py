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


def test_mp4_roundtrip_sample_tables():
    """Mux→demux round-trip: box tree, per-track sample tables, and exact
    sample extraction through stsc→stco→stsz (multi-track, one chunk per
    track)."""
    import numpy as np

    from tidb_spark.data.jpeg import encode_jpeg
    from tidb_spark.data.mp4 import (
        TrackSpec,
        decode_track,
        encode_mp4,
        extract_samples,
        parse_mp4,
    )

    frames = [
        encode_jpeg(
            ((np.arange(24)[None, :] * 255 // 23).repeat(16, 0) + f).astype(
                np.uint8
            )
        )
        for f in range(3)
    ]
    pcm = (((np.arange(400) * 7) % 65536) - 32768).astype(">i2").tobytes()
    data = encode_mp4(
        [
            TrackSpec(
                kind="video", samples=frames, timescale=30, sample_delta=1,
                width=24, height=16,
            ),
            TrackSpec(
                kind="audio", samples=[pcm], timescale=8000,
                sample_delta=400, channels=1, sample_rate=8000,
            ),
        ]
    )
    mf = parse_mp4(data)
    assert mf.major_brand == "isom"
    vid, aud = mf.tracks
    assert (vid.handler, vid.codec, vid.width, vid.height) == (
        "vide", "jpeg", 24, 16,
    )
    assert (aud.handler, aud.codec, aud.channels, aud.sample_rate) == (
        "soun", "twos", 1, 8000,
    )
    # exact byte round-trip of the demuxed samples
    assert extract_samples(data, vid) == frames
    assert extract_samples(data, aud) == [pcm]
    # durations: 3 frames @30fps = 100ms video; 400 samples @8kHz = 50ms
    assert vid.duration_ms == 100 and aud.duration_ms == 50
    assert mf.duration_ms == 100  # movie clock = max track
    # PCM decode is exact
    n, s = decode_track(data, aud)
    assert n == 1
    assert s == int(np.frombuffer(pcm, dtype=">i2").astype(np.int64).sum())


def test_mp4_multi_chunk_stsc_walk():
    """A hand-built stsc with two runs (2 chunks of 2 samples, then chunks
    of 1) demuxes correctly — the walker expands chunk runs like a player,
    not assuming one chunk."""
    import struct

    from tidb_spark.data.mp4 import Mp4Track, extract_samples

    samples = [bytes([i]) * (i + 1) for i in range(6)]  # sizes 1..6
    # chunks: [s0,s1], [s2,s3], [s4], [s5]
    chunk_bytes = [samples[0] + samples[1], samples[2] + samples[3],
                   samples[4], samples[5]]
    blob = b"HDR!"
    offsets = []
    for cb in chunk_bytes:
        offsets.append(len(blob))
        blob += cb
    trk = Mp4Track(
        track_id=1, handler="soun", codec="twos", timescale=8000,
        duration=6, sample_sizes=[len(s) for s in samples],
        stsc=[(1, 2), (3, 1)], chunk_offsets=offsets,
    )
    assert extract_samples(blob, trk) == samples


def test_mp4_honest_rejects():
    """Malformed containers and un-decodable codecs raise — never guess."""
    import pytest

    from tidb_spark.data.mp4 import Mp4Track, decode_track, parse_mp4

    with pytest.raises(ValueError):
        parse_mp4(b"\x00\x00\x00\x08free" + b"x" * 64)  # no ftyp
    trk = Mp4Track(
        track_id=1, handler="vide", codec="avc1", timescale=30, duration=1,
        sample_sizes=[4], stsc=[(1, 1)], chunk_offsets=[0],
    )
    with pytest.raises(NotImplementedError):
        decode_track(b"\x00\x00\x00\x00", trk)  # compressed codec
    pcm_trk = Mp4Track(
        track_id=2, handler="soun", codec="twos", timescale=8000, duration=1,
        sample_sizes=[3], stsc=[(1, 1)], chunk_offsets=[0],
    )
    with pytest.raises(ValueError, match="odd byte length"):
        decode_track(b"\x01\x02\x03\x00", pcm_trk)  # odd PCM16 sample


def test_decode_media_sniffs_mp4(spark):
    """decode_media routes ftyp payloads through the ISO-BMFF demux:
    width/height from the video track, n_units = video frame count,
    checksum = decoded JPEG pixel sum + exact PCM sum."""
    import numpy as np

    from tidb_spark.data import multimodal as mm
    from tidb_spark.data.jpeg import decode_jpeg, encode_jpeg
    from tidb_spark.data.mp4 import TrackSpec, encode_mp4

    img = (np.arange(24)[None, :] * 255 // 23).repeat(16, 0).astype(np.uint8)
    frame = encode_jpeg(img)
    pcm = (((np.arange(100) * 3) % 65536) - 32768).astype(">i2").tobytes()
    payload = encode_mp4(
        [
            TrackSpec(kind="video", samples=[frame, frame], timescale=30,
                      sample_delta=1, width=24, height=16),
            TrackSpec(kind="audio", samples=[pcm], timescale=8000,
                      sample_delta=100, channels=1, sample_rate=8000),
        ]
    )
    media = spark.createDataFrame(
        [(7, "video", bytearray(payload))],
        "media_id long, media_type string, payload binary",
    )
    row = mm.decode_media(media).collect()[0]
    _, _, px = decode_jpeg(frame)
    expect = 2 * int(px.astype(np.int64).sum()) + int(
        np.frombuffer(pcm, dtype=">i2").astype(np.int64).sum()
    )
    assert (row.width, row.height, row.n_units) == (24, 16, 2)
    assert row.checksum == expect


def test_mpeg_frame_walk_cbr_vbr():
    """Header fields, frame-length chain, duration arithmetic, and CBR/VBR
    classification are bit-exact spec (ISO 11172-3 §2.4.1.3)."""
    from tidb_spark.data.mpeg_audio import (
        build_frame,
        parse_frame_header,
        walk_stream,
    )

    # Layer II 64 kbps @ 32 kHz mono: 1152/8 * 64000/32000 = 288 bytes
    s = b"".join(build_frame(pad_byte=i) for i in range(5))
    info = walk_stream(s)
    assert (info.n_frames, info.layer, info.sample_rate) == (5, 2, 32000)
    assert info.is_cbr and info.bitrate_kbps == 64
    assert info.total_bytes == 5 * 288
    assert info.duration_ms == 5 * 1152 * 1000 // 32000
    # VBR: alternating 64/128 classifies as VBR
    v = build_frame() + build_frame(bitrate_kbps=128) + build_frame()
    assert not walk_stream(v).is_cbr
    # Layer I frame size is slot-quantized ×4
    f1 = parse_frame_header(build_frame(layer=1, bitrate_kbps=96,
                                        sample_rate=48000))
    assert f1.size == (12 * 96000 // 48000) * 4 and f1.samples == 384
    # 44.1 kHz Layer III truncating division
    f3 = parse_frame_header(build_frame(layer=3, bitrate_kbps=128,
                                        sample_rate=44100))
    assert f3.size == 144 * 128000 // 44100


def test_mpeg_walk_id3_skip_and_honest_rejects():
    import pytest

    from tidb_spark.data.mpeg_audio import build_frame, decode_pcm, walk_stream

    s = b"".join(build_frame() for _ in range(3))
    id3 = b"ID3" + bytes([4, 0, 0]) + bytes([0, 0, 0, 10]) + b"x" * 10
    assert walk_stream(id3 + s).n_frames == 3
    with pytest.raises(ValueError):
        walk_stream(s + b"\x00\x00\x00")  # trailing garbage
    with pytest.raises(ValueError):
        walk_stream(b"\x00" * 64)  # no sync
    with pytest.raises(NotImplementedError):
        decode_pcm(s)  # PCM synthesis is out of scope, loudly
    # ID3v2 footer flag (byte 5 bit 4) adds a 10-byte trailer copy
    id3f = b"ID3" + bytes([4, 0, 0x10]) + bytes([0, 0, 0, 10]) + b"x" * 20
    assert walk_stream(id3f + s).n_frames == 3
    # non-syncsafe length bytes (bit 7 set) are a loud reject, not a
    # bogus skip offset that resyncs on spurious 0xFF payload bytes
    bad = b"ID3" + bytes([4, 0, 0]) + bytes([0, 0, 0x80, 10]) + b"x" * 10
    with pytest.raises(ValueError, match="syncsafe"):
        walk_stream(bad + s)


def test_mp4_parser_never_lies_on_fuzz():
    """Property: arbitrary byte mutations of a valid MP4 either still parse
    to a STRUCTURALLY CONSISTENT file or raise ValueError /
    NotImplementedError — the parser never returns out-of-file sample
    ranges (the "never wrong samples" contract, fuzz-pinned)."""
    import numpy as np

    from tidb_spark.data.jpeg import encode_jpeg
    from tidb_spark.data.mp4 import TrackSpec, encode_mp4, extract_samples, parse_mp4

    img = (np.arange(16)[None, :] * 17 % 256).repeat(8, 0).astype(np.uint8)
    base = encode_mp4(
        [
            TrackSpec(kind="video", samples=[encode_jpeg(img)], timescale=30,
                      sample_delta=1, width=16, height=8),
        ]
    )
    rng = np.random.RandomState(0xBEEF)
    for trial in range(200):
        data = bytearray(base)
        for _ in range(rng.randint(1, 4)):
            data[rng.randint(len(data))] = rng.randint(256)
        data = bytes(data)
        try:
            mf = parse_mp4(data)
            for trk in mf.tracks:
                samples = extract_samples(data, trk)
                # every returned sample must be in-file bytes
                assert all(isinstance(s, bytes) for s in samples)
                assert sum(len(s) for s in samples) <= len(data)
        except (ValueError, NotImplementedError, StopIteration):
            pass  # honest reject


def test_mpeg_walker_never_hangs_on_fuzz():
    """Property: the frame walker terminates with a result or ValueError on
    arbitrary mutations (no infinite resync loops, no wrong totals)."""
    import numpy as np

    from tidb_spark.data.mpeg_audio import build_frame, walk_stream

    base = b"".join(build_frame(pad_byte=i) for i in range(4))
    rng = np.random.RandomState(0xF00D)
    for trial in range(200):
        data = bytearray(base)
        for _ in range(rng.randint(1, 4)):
            data[rng.randint(len(data))] = rng.randint(256)
        try:
            info = walk_stream(bytes(data))
            assert info.total_bytes <= len(data)
            assert info.n_frames >= 1
        except ValueError:
            pass  # honest reject


def test_mp4_roundtrip_property_random_tracks():
    """Hypothesis round-trip: arbitrary track mixes (1-3 tracks, 1-12
    samples each, 0-700-byte random payloads, varied timescales) mux to a
    file whose parse returns the exact per-track sample bytes and whose
    duration arithmetic matches the spec formulas."""
    from hypothesis import given, settings, strategies as st

    from tidb_spark.data.mp4 import (
        TrackSpec,
        encode_mp4,
        extract_samples,
        parse_mp4,
    )

    track = st.tuples(
        st.sampled_from(["video", "audio"]),
        st.lists(st.binary(min_size=0, max_size=700), min_size=1, max_size=12),
        st.sampled_from([10, 30, 90, 600, 8000]),
        st.integers(min_value=1, max_value=2000),
    )

    @settings(max_examples=60, deadline=None)
    @given(st.lists(track, min_size=1, max_size=3))
    def run(tracks):
        specs = [
            TrackSpec(kind=k, samples=s, timescale=ts, sample_delta=d,
                      width=16 if k == "video" else 0,
                      height=8 if k == "video" else 0)
            for (k, s, ts, d) in tracks
        ]
        data = encode_mp4(specs)
        mf = parse_mp4(data)
        assert len(mf.tracks) == len(specs)
        for spec, trk in zip(specs, mf.tracks):
            assert extract_samples(data, trk) == spec.samples
            assert trk.timescale == spec.timescale
            assert trk.duration == len(spec.samples) * spec.sample_delta
        expect_ms = max(
            len(s.samples) * s.sample_delta * 1000 // s.timescale
            for s in specs
        )
        assert mf.duration_ms == expect_ms

    run()


def test_mpeg_walker_padded_and_mixed_streams():
    """Padded frames change the frame-length chain (+1 slot, x4 for
    Layer I); the walker must follow the padded arithmetic exactly,
    including mixed padded/unpadded and VBR+padding streams."""
    from tidb_spark.data.mpeg_audio import build_frame, parse_frame_header, walk_stream

    # Layer II 64kbps@32kHz: 288 unpadded, 289 padded
    s = (build_frame(padded=True) + build_frame() + build_frame(padded=True)
         + build_frame(bitrate_kbps=128, padded=True))
    info = walk_stream(s)
    assert info.n_frames == 4
    assert info.total_bytes == 289 + 288 + 289 + (576 + 1)
    assert not info.is_cbr
    # Layer I padding quantum is 4 bytes (one 32-bit slot)
    f = parse_frame_header(
        build_frame(layer=1, bitrate_kbps=96, sample_rate=48000, padded=True)
    )
    assert f.size == (12 * 96000 // 48000 + 1) * 4


def test_mp4_mpeg_code_review_regressions():
    """Pins for the round-9 code-review findings: malformed stsc raises
    (wrong-chunk mapping and crafted-first_chunk OOM both rejected),
    empty FullBox at EOF raises ValueError not IndexError, oversized
    ID3v2 tags are skipped without eating the junk budget, and demux of
    a single-track MP4 raises cleanly."""
    import struct

    import pytest

    from tidb_spark.data.mp4 import (
        Mp4Track,
        TrackSpec,
        encode_mp4,
        extract_samples,
        parse_mp4,
    )
    from tidb_spark.data.mpeg_audio import build_frame, walk_stream

    # stsc whose first run does not start at chunk 1 → raise, never
    # silently read samples from the wrong chunk offsets
    trk = Mp4Track(track_id=1, handler="soun", codec="twos", timescale=1,
                   duration=2, sample_sizes=[1, 1], stsc=[(2, 2)],
                   chunk_offsets=[0, 2])
    with pytest.raises(ValueError):
        extract_samples(b"XXAB", trk)
    # crafted giant first_chunk in a later run → clamped, no 800MB alloc
    trk2 = Mp4Track(track_id=1, handler="soun", codec="twos", timescale=1,
                    duration=2, sample_sizes=[1, 1],
                    stsc=[(1, 1), (50_000_000, 1)], chunk_offsets=[0, 1])
    assert extract_samples(b"AB", trk2) == [b"A", b"B"]
    # non-increasing runs → raise
    trk3 = Mp4Track(track_id=1, handler="soun", codec="twos", timescale=1,
                    duration=1, sample_sizes=[1], stsc=[(1, 1), (1, 1)],
                    chunk_offsets=[0])
    with pytest.raises(ValueError):
        extract_samples(b"A", trk3)
    # empty mvhd FullBox ending exactly at EOF → ValueError, not IndexError
    ftyp = struct.pack(">I", 16) + b"ftypisom" + b"\x00\x00\x02\x00"
    moov = struct.pack(">I", 16) + b"moov" + struct.pack(">I", 8) + b"mvhd"
    with pytest.raises(ValueError):
        parse_mp4(ftyp + moov)
    # 8000-byte ID3v2 tag (album art scale) before a valid stream
    s = b"".join(build_frame() for _ in range(3))
    ln = 8000
    id3 = (b"ID3" + bytes([4, 0, 0])
           + bytes([(ln >> 21) & 0x7F, (ln >> 14) & 0x7F,
                    (ln >> 7) & 0x7F, ln & 0x7F]) + b"\xAA" * ln)
    assert walk_stream(id3 + s).n_frames == 3
    # stsc declaring MORE samples than stsz (excess side) → raise too
    trk4 = Mp4Track(track_id=1, handler="soun", codec="twos", timescale=1,
                    duration=5, sample_sizes=[1], stsc=[(1, 5)],
                    chunk_offsets=[0])
    with pytest.raises(ValueError):
        extract_samples(b"ABCDE", trk4)


def test_demux_mp4_single_track_raises_cleanly(spark):
    """An audio-only MP4 through the ACTUAL demux_mp4 stage fails the
    batch with our ValueError message (not a PEP-479 RuntimeError from a
    bare next() on an empty generator)."""
    import pytest

    from tidb_spark.data import multimodal as mm
    from tidb_spark.data.mp4 import TrackSpec, encode_mp4

    pcm = b"\x00\x01" * 50
    data = encode_mp4([TrackSpec(kind="audio", samples=[pcm], timescale=8000,
                                 sample_delta=50)])
    media = spark.createDataFrame(
        [(3, "audio", bytearray(data))],
        "media_id long, media_type string, payload binary",
    )
    with pytest.raises(Exception, match="expects one video and one audio"):
        mm.demux_mp4(media).collect()


def test_resize_box_exact_and_rejects():
    """Box resize is exact integer block-floor-average; non-divisible
    dimensions raise rather than silently cropping."""
    import numpy as np
    import pytest

    from tidb_spark.data.multimodal import resize_box_gray

    px = np.arange(4 * 6, dtype=np.uint8).reshape(4, 6)
    out = resize_box_gray(px, 2, 2)
    assert out.tolist() == [[3, 5, 7], [15, 17, 19]]
    # factor 3x2 on a 6x6
    px2 = (np.arange(36, dtype=np.int64) * 7 % 256).astype(np.uint8).reshape(6, 6)
    out2 = resize_box_gray(px2, 3, 2)
    blocks = px2.astype(np.int64).reshape(3, 2, 2, 3)
    assert (out2 == (blocks.sum(axis=(1, 3)) // 6).astype(np.uint8)).all()
    with pytest.raises(ValueError):
        resize_box_gray(px, 4, 2)  # 6 % 4 != 0


def test_synthesize_consume_no_payload_reshuffle(spark):
    """r13 partitioning contract: a synthesize_*→consumer composition
    must not re-shuffle the binary payloads (the producer tag suppresses
    the consumer's defensive spread), the ids spread must be sized from
    the caller-declared corpus (ceil(n_ids / _IDS_PER_TASK)), and an
    UNTAGGED media frame must still spread before the decode.  Results
    are partitioning-independent (oracle replay covers values)."""
    from pyspark.sql import functions as F

    ids = spark.range(80).select(F.col("id").alias("doc_id"))
    media = mm.synthesize_mpeg_media(ids, "doc_id", n_ids=80)
    out = mm.scan_mpeg(media)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning(media_id" not in plan
    assert "hashpartitioning(doc_id#" in plan  # the ids spread remains
    # declared-cardinality sizing: ceil(80 / 32) = 3 partitions
    expected = -(-80 // mm._IDS_PER_TASK)
    assert f", {expected}), REPARTITION_BY_NUM" in plan, plan
    # untagged single-partition media (no producer tag) still spreads
    bare = media.sparkSession.createDataFrame(
        [(1, "audio", bytearray(b"\xff\xfb\x00\x00"))],
        "media_id long, media_type string, payload binary",
    ).coalesce(1)
    plan2 = mm.scan_mpeg(bare)._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning(media_id" in plan2
    # and the tagged fast path returns bit-identical rows to the bare path
    rows = sorted(tuple(r) for r in out.collect())
    assert len(rows) == 80
