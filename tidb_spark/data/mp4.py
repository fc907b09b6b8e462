"""ISO-BMFF (MP4 / ISO 14496-12) container codec in pure Python.

Closes the "MP4 raises NotImplementedError" gap the same way r8 closed
JPEG: a real encoder (so fixtures are genuine, spec-conformant files)
cross-checked by a real parser — no external media libs.

What is REAL here (and verified by round-trip tests):
- the full box grammar: ftyp / mdat / moov[mvhd, trak[tkhd,
  mdia[mdhd, hdlr, minf[vmhd|smhd, dinf[dref], stbl[stsd, stts,
  stsc, stsz, stco]]]]], with correct FullBox version/flags handling
  (v0 and v1 accepted on parse) and 64-bit `co64` offsets accepted;
- Motion-JPEG video tracks: the `jpeg` VisualSampleEntry (ISO
  14496-12 §12.1.3 shape; fourcc per the QuickTime/ISO MJPEG
  registration) whose samples are actual baseline JPEGs from
  data/jpeg.py — the files are playable Motion-JPEG MP4s;
- PCM audio tracks: the big-endian 16-bit `twos` AudioSampleEntry;
- sample extraction that walks stsc→stco→stsz exactly as a demuxer
  does (chunk runs, per-chunk sample offsets), not a shortcut that
  assumes one chunk.

What still raises loudly: compressed A/V codecs this repo does not
implement (avc1/hev1/mp4a-AAC…) — `extract_samples` hands back raw
sample bytes for ANY fourcc, but `decode_track` refuses fourccs it
cannot decode rather than guessing.

Reference parity note: the reference engine (TiDB) ships no media
codecs at all — this module is part of the beyond-reference
LLM-data-pipeline surface (multimodal columns), where container
parsing is exactly the metadata/frame-sampling step a 100 TB video
corpus needs before any GPU decode.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl", b"dinf", b"edts"}
_FULLBOX_HEADER = {b"mvhd", b"tkhd", b"mdhd", b"stsd", b"stts", b"stsc",
                   b"stsz", b"stco", b"co64", b"hdlr", b"vmhd", b"smhd",
                   b"dref"}


def _u32(v: int) -> bytes:
    return struct.pack(">I", v)


def _u16(v: int) -> bytes:
    return struct.pack(">H", v)


def _box(typ: bytes, payload: bytes) -> bytes:
    return _u32(8 + len(payload)) + typ + payload


def _fullbox(typ: bytes, version: int, flags: int, payload: bytes) -> bytes:
    return _box(typ, struct.pack(">B", version) + struct.pack(">I", flags)[1:]
                + payload)


_MATRIX = struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)


# --------------------------------------------------------------------------
# Encoder


@dataclass
class TrackSpec:
    """One track to mux: kind 'video' (Motion-JPEG) or 'audio' (twos PCM)."""

    kind: str                      # 'video' | 'audio'
    samples: list[bytes]           # JPEG bytes per frame / PCM chunk bytes
    timescale: int                 # units/sec of the media clock
    sample_delta: int              # media-clock ticks per sample
    width: int = 0                 # video only (pixels)
    height: int = 0
    channels: int = 1              # audio only
    sample_rate: int = 8000


def _sample_entry(t: TrackSpec) -> bytes:
    if t.kind == "video":
        body = (
            b"\x00" * 6 + _u16(1)            # reserved, data_reference_index
            + _u16(0) + _u16(0) + b"\x00" * 12   # pre_defined/reserved
            + _u16(t.width) + _u16(t.height)
            + _u32(0x00480000) + _u32(0x00480000)  # 72 dpi
            + _u32(0) + _u16(1)              # reserved, frame_count
            + bytes([10]) + b"tidb_spark" + b"\x00" * 21  # compressorname
            + _u16(24) + struct.pack(">h", -1)   # depth, pre_defined
        )
        return _box(b"jpeg", body)
    body = (
        b"\x00" * 6 + _u16(1)                # reserved, data_reference_index
        + _u16(0) + _u16(0) + _u32(0)        # version/revision/vendor
        + _u16(t.channels) + _u16(16)        # channelcount, samplesize
        + _u16(0) + _u16(0)                  # pre_defined, reserved
        + _u32(t.sample_rate << 16)          # 16.16 fixed
    )
    return _box(b"twos", body)


def _stbl(t: TrackSpec, chunk_offset: int) -> bytes:
    n = len(t.samples)
    stsd = _fullbox(b"stsd", 0, 0, _u32(1) + _sample_entry(t))
    stts = _fullbox(b"stts", 0, 0, _u32(1) + _u32(n) + _u32(t.sample_delta))
    # all samples of the track in ONE chunk (offset = chunk_offset)
    stsc = _fullbox(b"stsc", 0, 0, _u32(1) + _u32(1) + _u32(n) + _u32(1))
    stsz = _fullbox(
        b"stsz", 0, 0,
        _u32(0) + _u32(n) + b"".join(_u32(len(s)) for s in t.samples),
    )
    stco = _fullbox(b"stco", 0, 0, _u32(1) + _u32(chunk_offset))
    return _box(b"stbl", stsd + stts + stsc + stsz + stco)


def _trak(t: TrackSpec, track_id: int, movie_timescale: int,
          chunk_offset: int) -> bytes:
    n = len(t.samples)
    media_duration = n * t.sample_delta
    movie_duration = media_duration * movie_timescale // t.timescale
    tkhd = _fullbox(
        b"tkhd", 0, 7,
        _u32(0) + _u32(0) + _u32(track_id) + _u32(0) + _u32(movie_duration)
        + _u32(0) * 2 + _u16(0) + _u16(0)
        + (_u16(0) if t.kind == "video" else _u16(0x0100)) + _u16(0)
        + _MATRIX
        + _u32(t.width << 16) + _u32(t.height << 16),
    )
    mdhd = _fullbox(
        b"mdhd", 0, 0,
        _u32(0) + _u32(0) + _u32(t.timescale) + _u32(media_duration)
        + _u16(0x55C4) + _u16(0),  # language 'und'
    )
    handler = b"vide" if t.kind == "video" else b"soun"
    hdlr = _fullbox(b"hdlr", 0, 0,
                    _u32(0) + handler + _u32(0) * 3 + b"tidb_spark\x00")
    mhd = (_fullbox(b"vmhd", 0, 1, _u16(0) + _u16(0) * 3)
           if t.kind == "video"
           else _fullbox(b"smhd", 0, 0, _u16(0) + _u16(0)))
    dref = _fullbox(b"dref", 0, 0,
                    _u32(1) + _fullbox(b"url ", 0, 1, b""))
    minf = _box(b"minf", mhd + _box(b"dinf", dref)
                + _stbl(t, chunk_offset))
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    return _box(b"trak", tkhd + mdia)


def encode_mp4(tracks: list[TrackSpec], movie_timescale: int = 1000) -> bytes:
    """Mux tracks into a spec-conformant MP4: ftyp + mdat + moov.

    mdat precedes moov so chunk offsets are known before the sample
    tables are built (the classic non-faststart layout).  Each track's
    samples are stored contiguously as one chunk.
    """
    ftyp = _box(b"ftyp", b"isom" + _u32(0x200) + b"isom" + b"mp41")
    mdat_payload = b""
    chunk_offsets = []
    base = len(ftyp) + 8  # absolute offset of mdat payload start
    for t in tracks:
        chunk_offsets.append(base + len(mdat_payload))
        mdat_payload += b"".join(t.samples)
    mdat = _box(b"mdat", mdat_payload)

    dur = max(
        (len(t.samples) * t.sample_delta * movie_timescale // t.timescale
         for t in tracks),
        default=0,
    )
    mvhd = _fullbox(
        b"mvhd", 0, 0,
        _u32(0) + _u32(0) + _u32(movie_timescale) + _u32(dur)
        + _u32(0x00010000) + _u16(0x0100) + _u16(0) + _u32(0) * 2
        + _MATRIX + _u32(0) * 6 + _u32(len(tracks) + 1),
    )
    traks = b"".join(
        _trak(t, i + 1, movie_timescale, chunk_offsets[i])
        for i, t in enumerate(tracks)
    )
    return ftyp + mdat + _box(b"moov", mvhd + traks)


# --------------------------------------------------------------------------
# Parser


@dataclass
class Mp4Track:
    track_id: int
    handler: str                   # 'vide' | 'soun' | other fourcc
    codec: str                     # sample-entry fourcc, e.g. 'jpeg'
    timescale: int
    duration: int                  # media-clock ticks (from mdhd)
    width: int = 0
    height: int = 0
    channels: int = 0
    sample_rate: int = 0
    sample_sizes: list[int] = field(default_factory=list)
    # (first_chunk, samples_per_chunk) runs from stsc + chunk offsets
    stsc: list[tuple[int, int]] = field(default_factory=list)
    chunk_offsets: list[int] = field(default_factory=list)

    @property
    def n_samples(self) -> int:
        return len(self.sample_sizes)

    @property
    def duration_ms(self) -> int:
        return self.duration * 1000 // self.timescale if self.timescale else 0


@dataclass
class Mp4File:
    major_brand: str
    movie_timescale: int
    movie_duration: int
    tracks: list[Mp4Track]

    @property
    def duration_ms(self) -> int:
        if not self.movie_timescale:
            return 0
        return self.movie_duration * 1000 // self.movie_timescale


def _iter_boxes(data: bytes, start: int, end: int):
    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack(">I", data[pos:pos + 4])
        typ = data[pos + 4:pos + 8]
        header = 8
        if size == 1:  # 64-bit largesize
            (size,) = struct.unpack(">Q", data[pos + 8:pos + 16])
            header = 16
        elif size == 0:  # box extends to end of enclosing scope
            size = end - pos
        if size < header or pos + size > end:
            raise ValueError(f"malformed box {typ!r} at {pos}: size {size}")
        yield typ, pos + header, pos + size
        pos += size


def _fullbox_body(data: bytes, start: int) -> tuple[int, int, int]:
    version = data[start]
    (flags,) = struct.unpack(">I", b"\x00" + data[start + 1:start + 4])
    return version, flags, start + 4


def _parse_stbl(data: bytes, start: int, end: int, trk: Mp4Track) -> None:
    for typ, b, e in _iter_boxes(data, start, end):
        if typ == b"stsd":
            _, _, p = _fullbox_body(data, b)
            (count,) = struct.unpack(">I", data[p:p + 4])
            if count >= 1:
                # first sample entry: u32 size + fourcc + body
                entry_start = p + 4
                trk.codec = data[entry_start + 4:entry_start + 8].decode(
                    "latin1")
                body = entry_start + 8
                if trk.handler == "vide":
                    trk.width, trk.height = struct.unpack(
                        ">HH", data[body + 24:body + 28])
                elif trk.handler == "soun":
                    trk.channels, = struct.unpack(
                        ">H", data[body + 16:body + 18])
                    rate_fixed, = struct.unpack(
                        ">I", data[body + 24:body + 28])
                    trk.sample_rate = rate_fixed >> 16
        elif typ == b"stsz":
            _, _, p = _fullbox_body(data, b)
            uniform, count = struct.unpack(">II", data[p:p + 8])
            if uniform:
                trk.sample_sizes = [uniform] * count
            else:
                if p + 8 + 4 * count > e:
                    raise ValueError(f"stsz declares {count} entries "
                                     "but the box is too small")
                trk.sample_sizes = list(
                    struct.unpack(f">{count}I", data[p + 8:p + 8 + 4 * count])
                )
        elif typ == b"stsc":
            _, _, p = _fullbox_body(data, b)
            (count,) = struct.unpack(">I", data[p:p + 4])
            if p + 4 + 12 * count > e:
                raise ValueError(f"stsc declares {count} entries "
                                 "but the box is too small")
            runs = []
            for i in range(count):
                fc, spc, _sdi = struct.unpack(
                    ">III", data[p + 4 + 12 * i:p + 16 + 12 * i])
                runs.append((fc, spc))
            trk.stsc = runs
        elif typ in (b"stco", b"co64"):
            _, _, p = _fullbox_body(data, b)
            (count,) = struct.unpack(">I", data[p:p + 4])
            fmt, w = (">I", 4) if typ == b"stco" else (">Q", 8)
            if p + 4 + w * count > e:
                raise ValueError(f"{typ.decode('latin1')} declares {count} "
                                 "entries but the box is too small")
            trk.chunk_offsets = [
                struct.unpack(fmt, data[p + 4 + w * i:p + 4 + w * (i + 1)])[0]
                for i in range(count)
            ]


def _parse_trak(data: bytes, start: int, end: int) -> Mp4Track:
    trk = Mp4Track(track_id=0, handler="", codec="", timescale=0, duration=0)
    for typ, b, e in _iter_boxes(data, start, end):
        if typ == b"tkhd":
            ver, _, p = _fullbox_body(data, b)
            if ver == 1:
                trk.track_id, = struct.unpack(">I", data[p + 16:p + 20])
            else:
                trk.track_id, = struct.unpack(">I", data[p + 8:p + 12])
        elif typ == b"mdia":
            for t2, b2, e2 in _iter_boxes(data, b, e):
                if t2 == b"mdhd":
                    ver, _, p = _fullbox_body(data, b2)
                    if ver == 1:
                        trk.timescale, trk.duration = struct.unpack(
                            ">IQ", data[p + 16:p + 28])
                    else:
                        trk.timescale, trk.duration = struct.unpack(
                            ">II", data[p + 8:p + 16])
                elif t2 == b"hdlr":
                    _, _, p = _fullbox_body(data, b2)
                    trk.handler = data[p + 4:p + 8].decode("latin1")
                elif t2 == b"minf":
                    for t3, b3, e3 in _iter_boxes(data, b2, e2):
                        if t3 == b"stbl":
                            _parse_stbl(data, b3, e3, trk)
    return trk


def parse_mp4(data: bytes) -> Mp4File:
    """Parse the box tree: brands, movie clock, and full per-track sample
    tables.  Raises ValueError on anything malformed — never guesses."""
    if len(data) < 12 or data[4:8] != b"ftyp":
        raise ValueError("not an ISO-BMFF file (no leading ftyp)")
    major = data[8:12].decode("latin1")
    mf = Mp4File(major_brand=major, movie_timescale=0, movie_duration=0,
                 tracks=[])
    try:
        for typ, b, e in _iter_boxes(data, 0, len(data)):
            if typ != b"moov":
                continue
            for t2, b2, e2 in _iter_boxes(data, b, e):
                if t2 == b"mvhd":
                    ver, _, p = _fullbox_body(data, b2)
                    if ver == 1:
                        mf.movie_timescale, = struct.unpack(
                            ">I", data[p + 16:p + 20])
                        mf.movie_duration, = struct.unpack(
                            ">Q", data[p + 20:p + 28])
                    else:
                        mf.movie_timescale, mf.movie_duration = struct.unpack(
                            ">II", data[p + 8:p + 16])
                elif t2 == b"trak":
                    mf.tracks.append(_parse_trak(data, b2, e2))
    except (struct.error, IndexError) as exc:
        # truncated field inside a corrupt box (struct short-read, or a
        # byte index like _fullbox_body's version read landing past EOF)
        raise ValueError(f"truncated box field: {exc}") from exc
    if not mf.tracks:
        raise ValueError("no trak boxes in moov")
    return mf


def extract_samples(data: bytes, trk: Mp4Track) -> list[bytes]:
    """Demux one track's samples by walking stsc chunk runs → stco chunk
    offsets → stsz sizes, exactly as a player does."""
    n_chunks = len(trk.chunk_offsets)
    # expand stsc runs into samples-per-chunk for every chunk; validate the
    # run structure first — a malformed table must raise, never map samples
    # onto the wrong chunk offsets ("never wrong samples") or allocate
    # unbounded memory from a crafted first_chunk.
    if trk.stsc:
        if trk.stsc[0][0] != 1:
            raise ValueError(
                f"stsc first run starts at chunk {trk.stsc[0][0]}, not 1")
        for i in range(1, len(trk.stsc)):
            if trk.stsc[i][0] <= trk.stsc[i - 1][0]:
                raise ValueError("stsc first_chunk values not increasing")
    spc = []
    for i, (first, per) in enumerate(trk.stsc):
        if first > n_chunks:
            break  # run starts past the last real chunk — nothing to expand
        nxt = trk.stsc[i + 1][0] - 1 if i + 1 < len(trk.stsc) else n_chunks
        last = min(nxt, n_chunks)
        spc.extend([per] * (last - first + 1))
    # stsc and stsz must agree EXACTLY on the sample count — both a
    # shortfall and an excess are malformed (raise, never guess)
    if sum(spc) != len(trk.sample_sizes):
        raise ValueError(
            f"track {trk.track_id}: stsc/stco cover {sum(spc)} samples, "
            f"stsz declares {len(trk.sample_sizes)}")
    out: list[bytes] = []
    si = 0
    for ci in range(n_chunks):
        pos = trk.chunk_offsets[ci]
        for _ in range(spc[ci] if ci < len(spc) else 0):
            size = trk.sample_sizes[si]
            if pos + size > len(data):
                raise ValueError(
                    f"sample {si} of track {trk.track_id} overruns file")
            out.append(data[pos:pos + size])
            pos += size
            si += 1
    return out


def decode_track(data: bytes, trk: Mp4Track) -> tuple[int, int]:
    """(n_samples, checksum) for a track whose codec this repo can decode:
    'jpeg' (Motion-JPEG — sum of decoded pixel values over all frames) and
    'twos' (big-endian PCM16 — exact sample sum).  Any other fourcc raises
    NotImplementedError: honest reject, never wrong samples."""
    samples = extract_samples(data, trk)
    if trk.codec == "jpeg":
        import numpy as np

        from tidb_spark.data.jpeg import decode_jpeg

        total = 0
        for s in samples:
            _w, _h, px = decode_jpeg(s)
            total += int(px.astype(np.int64).sum())
        return len(samples), total
    if trk.codec == "twos":
        import numpy as np

        total = 0
        for i, s in enumerate(samples):
            if len(s) % 2:
                raise ValueError(
                    f"track {trk.track_id} sample {i}: odd byte length "
                    f"{len(s)} is not valid big-endian PCM16")
            total += int(np.frombuffer(s, dtype=">i2").astype(np.int64).sum())
        return len(samples), total
    raise NotImplementedError(
        f"no decoder for sample-entry fourcc {trk.codec!r} "
        "(compressed codecs like avc1/mp4a are out of scope)")
