"""MPEG audio (ISO 11172-3 / 13818-3) frame-header walk in pure Python.

The metadata half of "MP3 support": sync-scan the elementary stream,
parse every frame header (version, layer, bitrate, sample rate, mode,
padding), validate the frame-length arithmetic, and report stream-level
facts — frame count, duration, byte-exact CBR/VBR classification.  This
is the part a 100 TB audio corpus actually runs at scale (catalog
building, duration/bitrate stats, corrupt-file triage) before any PCM
decode; full Layer I–III PCM synthesis needs the tabulated polyphase
window (ISO 11172-3 Table 3-C.1), which has no closed form to derive and
verify in-container, so ``decode_pcm`` raises NotImplementedError —
honest reject, never wrong samples (same posture as avc1/mp4a in
data/mp4.py).

Everything here is bit-exact public spec arithmetic:
- frame sync = 11 set bits; header fields per ISO 11172-3 §2.4.1.3;
- frame sizes: Layer I ``(12·bitrate/rate + pad)·4`` bytes,
  Layers II/III ``N·bitrate/8/rate + pad`` with N = 1152 (except
  MPEG-2/2.5 Layer III, N = 576);
- samples per frame: 384 (L1) / 1152 (L2, L3-MPEG1) / 576 (L3-MPEG2).
"""

from __future__ import annotations

from dataclasses import dataclass

# bitrate kbps tables, indexed [version-group][layer][bitrate_index]
# version-group 0 = MPEG-1, 1 = MPEG-2 / 2.5
_BITRATES = {
    (0, 1): (0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448),
    (0, 2): (0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384),
    (0, 3): (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320),
    (1, 1): (0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256),
    (1, 2): (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
    (1, 3): (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
}

# sample rates Hz by version code (0=MPEG2.5, 2=MPEG2, 3=MPEG1)
_RATES = {
    3: (44100, 48000, 32000),
    2: (22050, 24000, 16000),
    0: (11025, 12000, 8000),
}

_MODES = ("stereo", "joint_stereo", "dual_channel", "mono")


@dataclass(frozen=True)
class MpegFrame:
    offset: int
    size: int                 # whole frame bytes incl. header
    version: str              # '1' | '2' | '2.5'
    layer: int                # 1 | 2 | 3
    bitrate_kbps: int
    sample_rate: int
    samples: int              # PCM samples this frame decodes to
    mode: str
    padded: bool
    crc_protected: bool


def parse_frame_header(data: bytes, pos: int = 0) -> MpegFrame:
    """Parse one frame header at ``pos``.  Raises ValueError unless the
    4 bytes are a valid, fully-specified header (no free-format, no
    reserved codes)."""
    if pos + 4 > len(data):
        raise ValueError("truncated header")
    b0, b1, b2, b3 = data[pos:pos + 4]
    if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
        raise ValueError(f"no frame sync at {pos}")
    ver_code = (b1 >> 3) & 0x3          # 0=2.5, 1=reserved, 2=MPEG2, 3=MPEG1
    layer_code = (b1 >> 1) & 0x3        # 3=L1, 2=L2, 1=L3
    if ver_code == 1 or layer_code == 0:
        raise ValueError(f"reserved version/layer code at {pos}")
    version = {3: "1", 2: "2", 0: "2.5"}[ver_code]
    layer = 4 - layer_code
    vgroup = 0 if ver_code == 3 else 1
    br_idx = (b2 >> 4) & 0xF
    if br_idx in (0, 15):
        raise ValueError(f"free-format/bad bitrate index at {pos}")
    bitrate = _BITRATES[(vgroup, layer)][br_idx] * 1000
    sr_idx = (b2 >> 2) & 0x3
    if sr_idx == 3:
        raise ValueError(f"reserved sample-rate index at {pos}")
    rate = _RATES[ver_code][sr_idx]
    padded = bool((b2 >> 1) & 1)
    if layer == 1:
        size = (12 * bitrate // rate + (1 if padded else 0)) * 4
        samples = 384
    else:
        samples = 576 if (layer == 3 and vgroup == 1) else 1152
        size = samples // 8 * bitrate // rate + (1 if padded else 0)
    mode = _MODES[(b3 >> 6) & 0x3]
    return MpegFrame(
        offset=pos, size=size, version=version, layer=layer,
        bitrate_kbps=bitrate // 1000, sample_rate=rate, samples=samples,
        mode=mode, padded=padded, crc_protected=not (b1 & 1),
    )


@dataclass
class MpegStreamInfo:
    n_frames: int
    layer: int
    version: str
    sample_rate: int
    mode: str
    total_samples: int
    total_bytes: int
    is_cbr: bool
    bitrate_kbps: int          # nominal if CBR, byte-weighted mean if VBR

    @property
    def duration_ms(self) -> int:
        return self.total_samples * 1000 // self.sample_rate


def walk_stream(data: bytes, *, max_junk: int = 4096) -> MpegStreamInfo:
    """Walk frame-to-frame through an MPEG audio elementary stream.

    Leading junk (e.g. an ID3v2 tag) is skipped by sync-scanning up to
    ``max_junk`` bytes; after the first frame each next header must sit
    exactly where the frame-length arithmetic says (the demuxer contract
    — a mid-stream mismatch raises rather than resyncing silently)."""
    pos, first = 0, None
    # ID3v2: 'ID3' + ver(2) + flags + syncsafe length (+10-byte footer
    # copy when flag bit 4 is set).  Syncsafe bytes must have bit 7
    # clear — a set high bit means a corrupt/non-syncsafe length whose
    # computed skip could land mid-payload and sync on a spurious 0xFF.
    if data[:3] == b"ID3" and len(data) >= 10:
        if any(b & 0x80 for b in data[6:10]):
            raise ValueError(
                "ID3v2 tag length bytes are not syncsafe (bit 7 set)")
        ln = (data[6] << 21) | (data[7] << 14) | (data[8] << 7) | data[9]
        pos = 10 + ln + (10 if data[5] & 0x10 else 0)
    # junk budget counts from AFTER the ID3 tag — album-art tags routinely
    # exceed 4 KB and are not "junk"
    limit = min(len(data) - 4, pos + max_junk)
    while pos <= limit:
        try:
            first = parse_frame_header(data, pos)
            break
        except ValueError:
            pos += 1
    if first is None:
        raise ValueError("no MPEG audio frame sync found")
    frames = [first]
    pos = first.offset + first.size
    while pos + 4 <= len(data):
        frames.append(parse_frame_header(data, pos))
        pos += frames[-1].size
    if pos != len(data):
        raise ValueError(
            f"trailing garbage: stream ends at {pos}, file has {len(data)}")
    f0 = frames[0]
    for f in frames:
        if (f.layer, f.version, f.sample_rate) != (
                f0.layer, f0.version, f0.sample_rate):
            raise ValueError("layer/version/rate change mid-stream")
    total_bytes = sum(f.size for f in frames)
    bitrates = {f.bitrate_kbps for f in frames}
    total_samples = sum(f.samples for f in frames)
    if len(bitrates) == 1:
        nominal = f0.bitrate_kbps
    else:  # byte-weighted mean, rounded to the nearest kbps
        nominal = round(
            total_bytes * 8 * f0.sample_rate / (total_samples * 1000))
    return MpegStreamInfo(
        n_frames=len(frames), layer=f0.layer, version=f0.version,
        sample_rate=f0.sample_rate, mode=f0.mode,
        total_samples=total_samples, total_bytes=total_bytes,
        is_cbr=len(bitrates) == 1, bitrate_kbps=nominal,
    )


def build_frame(
    *, layer: int = 2, bitrate_kbps: int = 64, sample_rate: int = 32000,
    mode: str = "mono", pad_byte: int = 0, padded: bool = False,
) -> bytes:
    """Emit one syntactically valid MPEG-1 frame (header + deterministic
    filler payload).  The header/length arithmetic is bit-exact spec; the
    payload is filler — these fixtures exercise the WALKER, they are not
    claimed to carry decodable audio."""
    vgroup_layer = _BITRATES[(0, layer)]
    br_idx = vgroup_layer.index(bitrate_kbps)
    sr_idx = _RATES[3].index(sample_rate)
    b1 = 0xE0 | (3 << 3) | ((4 - layer) << 1) | 1  # MPEG-1, no CRC
    b2 = (br_idx << 4) | (sr_idx << 2) | ((1 if padded else 0) << 1)
    b3 = _MODES.index(mode) << 6
    hdr = bytes([0xFF, b1, b2, b3])
    f = parse_frame_header(hdr + b"\x00" * 4)
    return hdr + bytes([pad_byte]) * (f.size - 4)


def decode_pcm(data: bytes) -> bytes:
    """Full PCM synthesis is out of scope: the polyphase window of ISO
    11172-3 Table 3-C.1 is a 512-entry tabulated prototype with no closed
    form to re-derive and verify in this container.  Honest reject."""
    raise NotImplementedError(
        "MPEG audio PCM decode not implemented (tabulated synthesis "
        "window unavailable); frame-level metadata via walk_stream")
