"""Baseline JPEG codec in pure numpy — closes the multimodal decode gap
(the one path decode_media previously stubbed behind a PIL import).

Scope is ITU-T T.81 8-bit Huffman DCT, BOTH process classes real users
hit: baseline sequential (SOF0/1) and progressive (SOF2 — spectral
selection, DC/AC successive approximation, EOBRUN correction bits, §G),
with SOI / APPn / COM / DQT (8- and 16-bit precision) / DHT / DRI /
RSTn / EOI, grayscale and YCbCr in 4:4:4, 4:2:2, and 4:2:0 chroma
subsampling.  Arithmetic coding, lossless/hierarchical processes, and
12-bit depth raise loudly — same honesty posture as the rest of the
engine (no silent wrong pixels).

The encoders (baseline `encode_jpeg`, progressive
`encode_jpeg_progressive` — identical quantized coefficients by
construction, so the two decodes must be bit-identical) exist for
fixture synthesis and roundtrip tests; production pipelines decode
foreign media, they don't re-encode it.

Everything here derives from the public JPEG standard (ITU-T T.81 /
ISO 10918-1) — Annex K table values, the canonical-Huffman MINCODE/
MAXCODE decode of §F.2.2, and the category/magnitude coding of §F.1.2.
The reference system ships no media codecs; this supports the
training-data multimodal pillar (decode → feature-extract over
mapInPandas, see data/multimodal.py).
"""

from __future__ import annotations

import numpy as np

# --------------------------------------------------------------------------
# Tables (ITU-T T.81 Annex K).

# Zig-zag order: index in scan order -> linear index into the 8x8 block.
ZIGZAG = np.array([
    0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int32)

STD_LUMA_Q = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32)

STD_CHROMA_Q = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32)

# (BITS[1..16], HUFFVAL) pairs, Annex K.3.
DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)


def _dct_matrix() -> np.ndarray:
    k = np.arange(8).reshape(-1, 1).astype(np.float64)
    n = np.arange(8).reshape(1, -1).astype(np.float64)
    c = np.cos((2 * n + 1) * k * np.pi / 16) * np.sqrt(2.0 / 8.0)
    c[0, :] = np.sqrt(1.0 / 8.0)
    return c


_C = _dct_matrix()


def _fdct(block: np.ndarray) -> np.ndarray:
    return _C @ block @ _C.T


def _idct(coef: np.ndarray) -> np.ndarray:
    return _C.T @ coef @ _C


# --------------------------------------------------------------------------
# Canonical Huffman (T.81 Annex C build, F.2.2 decode).


def _build_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) in canonical order."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    vi = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[vi]] = (code, length)
            code += 1
            vi += 1
        code <<= 1
    return out


class _HuffDecoder:
    """MINCODE/MAXCODE/VALPTR decode tables (T.81 F.2.2.3)."""

    def __init__(self, bits: list[int], vals: list[int]):
        self.vals = vals
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        code = 0
        vi = 0
        for length in range(1, 17):
            if bits[length - 1]:
                self.valptr[length] = vi
                self.mincode[length] = code
                code += bits[length - 1]
                vi += bits[length - 1]
                self.maxcode[length] = code - 1
            code <<= 1

    def decode(self, br: "_BitReader") -> int:
        code = br.read_bit()
        length = 1
        while code > self.maxcode[length]:
            length += 1
            if length > 16:
                raise ValueError("JPEG: corrupt Huffman stream")
            code = (code << 1) | br.read_bit()
        return self.vals[self.valptr[length] + code - self.mincode[length]]


class _BitReader:
    """Entropy-coded segment reader: un-stuffs 0xFF00, stops at markers."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def read_bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise ValueError("JPEG: truncated entropy stream")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.data[self.pos] if self.pos < len(self.data) else 0xD9
                if nxt == 0x00:
                    self.pos += 1  # stuffed byte
                else:
                    # A real marker inside the scan: treat as padding 1s
                    # (T.81 allows the last byte to be padded with 1 bits).
                    self.pos -= 1
                    return 1
            self.acc = b
            self.nbits = 8
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def reset(self) -> None:
        self.acc = 0
        self.nbits = 0

    def skip_to_marker(self) -> int:
        """Advance past any RST marker; returns the marker byte."""
        self.reset()
        while self.pos < len(self.data) - 1:
            if self.data[self.pos] == 0xFF and self.data[self.pos + 1] != 0x00:
                marker = self.data[self.pos + 1]
                self.pos += 2
                return marker
            self.pos += 1
        raise ValueError("JPEG: expected restart marker")


def _extend(v: int, s: int) -> int:
    """T.81 F.2.2.1 EXTEND: map the s received bits to a signed value."""
    return v - (1 << s) + 1 if s and v < (1 << (s - 1)) else v


# --------------------------------------------------------------------------
# Decoder.


def decode_jpeg(data: bytes) -> tuple[int, int, np.ndarray]:
    """Decode baseline OR progressive JPEG bytes -> (width, height, px).

    pixels is uint8 (H, W) for grayscale or (H, W, 3) RGB.  Multi-scan
    architecture: every SOS decodes into a per-component COEFFICIENT
    store (baseline is the degenerate one-scan case: interleaved, full
    band, no successive approximation); reconstruction (dequantize →
    IDCT → upsample → color) happens once at EOI.  Progressive covers
    the full T.81 G.1.2 semantics — DC/AC successive approximation,
    spectral selection, EOBRUN with correction bits, restart resync.
    Raises ValueError on corrupt input and NotImplementedError on
    arithmetic-coded / hierarchical / 12-bit streams (honest reject,
    never wrong pixels)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("JPEG: missing SOI")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _HuffDecoder] = {}
    huff_ac: dict[int, _HuffDecoder] = {}
    frame = None
    stores: list[np.ndarray] = []  # per component: (nby, nbx, 64) int32
    restart_interval = 0
    saw_scan = False
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"JPEG: expected marker at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # standalone
        seglen = int.from_bytes(data[pos : pos + 2], "big")
        body = data[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0xF
                i += 1
                if pq:
                    tbl = np.frombuffer(
                        body[i : i + 128], dtype=">u2"
                    ).astype(np.int32)
                    i += 128
                else:
                    tbl = np.frombuffer(
                        body[i : i + 64], dtype=np.uint8
                    ).astype(np.int32)
                    i += 64
                z = np.zeros(64, dtype=np.int32)
                z[ZIGZAG] = tbl
                qt[tq] = z.reshape(8, 8)
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0xF
                bits = list(body[i + 1 : i + 17])
                n = sum(bits)
                vals = list(body[i + 17 : i + 17 + n])
                (huff_ac if tc else huff_dc)[th] = _HuffDecoder(bits, vals)
                i += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            prec = body[0]
            if prec != 8:
                raise NotImplementedError("JPEG: only 8-bit samples")
            h = int.from_bytes(body[1:3], "big")
            w = int.from_bytes(body[3:5], "big")
            nc = body[5]
            comps = []
            for c in range(nc):
                cid, hv, tq = body[6 + 3 * c], body[7 + 3 * c], body[8 + 3 * c]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq,
                     "idx": c}
                )
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            mcux = (w + 8 * hmax - 1) // (8 * hmax)
            mcuy = (h + 8 * vmax - 1) // (8 * vmax)
            for c in comps:
                # Padded (interleaved) block grid; non-interleaved scans
                # cover the unpadded prefix (T.81 A.2.2/A.2.3).
                c["nbx_pad"] = mcux * c["h"]
                c["nby_pad"] = mcuy * c["v"]
                c["nbx"] = (-(-(w * c["h"]) // hmax) + 7) // 8
                c["nby"] = (-(-(h * c["v"]) // vmax) + 7) // 8
            frame = {
                "w": w, "h": h, "comps": comps, "hmax": hmax, "vmax": vmax,
                "mcux": mcux, "mcuy": mcuy,
                "progressive": marker == 0xC2,
            }
            stores = [
                np.zeros((c["nby_pad"], c["nbx_pad"], 64), dtype=np.int32)
                for c in comps
            ]
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "JPEG: lossless/differential/arithmetic coding not "
                "supported (baseline + progressive Huffman only)"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = int.from_bytes(body[0:2], "big")
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("JPEG: SOS before SOF")
            ns = body[0]
            scan = []
            for c in range(ns):
                cs, tt = body[1 + 2 * c], body[2 + 2 * c]
                comp = next(x for x in frame["comps"] if x["id"] == cs)
                scan.append((comp, tt >> 4, tt & 0xF))
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            ahal = body[3 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0xF
            pos = _scan_entropy(
                data, pos + seglen, frame, scan, (ss, se, ah, al),
                huff_dc, huff_ac, restart_interval, stores,
            )
            saw_scan = True
            continue
        pos += seglen
    if frame is None or not saw_scan:
        raise ValueError("JPEG: no scan data")
    return frame["w"], frame["h"], _reconstruct(frame, qt, stores)


def _scan_entropy(data, pos, frame, scan, spec, huff_dc, huff_ac, dri,
                  stores):
    """Decode ONE scan's entropy segment into the coefficient stores and
    return the byte position of the next marker.

    ``spec`` = (Ss, Se, Ah, Al).  Baseline is the Ss=0/Se=63/Ah=Al=0
    interleaved case; progressive scans are either DC (Ss=Se=0, first or
    refinement) or single-component AC bands (T.81 G.1.2, incl. EOBRUN
    and refinement correction bits)."""
    ss, se, ah, al = spec
    progressive = frame["progressive"]
    if progressive:
        # T.81 B.2.3 scan-header constraints: DC scans are Ss=Se=0, AC
        # scans are a 1..63 band over a SINGLE component.
        if ss == 0 and se != 0:
            raise ValueError("JPEG: progressive DC scan must have Se=0")
        if ss > 0 and (se < ss or se > 63 or len(scan) != 1):
            raise ValueError(
                "JPEG: progressive AC scan must be single-component with "
                "0 < Ss <= Se <= 63"
            )
    elif (ss, se, ah, al) != (0, 63, 0, 0):
        raise ValueError("JPEG: baseline scan must cover the full band")
    br = _BitReader(data, pos)
    preds = [0] * len(scan)
    state = {"eobrun": 0}
    interleaved = len(scan) > 1

    def decode_baseline_block(coef, ci, td, ta):
        s = huff_dc[td].decode(br)
        diff = _extend(br.receive(s), s) if s else 0
        preds[ci] += diff
        coef[0] = preds[ci]
        k = 1
        while k < 64:
            rs = huff_ac[ta].decode(br)
            r, s = rs >> 4, rs & 0xF
            if s == 0:
                if r == 15:
                    k += 16
                    continue
                break  # EOB
            k += r
            if k > 63:
                raise ValueError("JPEG: AC index overflow")
            coef[ZIGZAG[k]] = _extend(br.receive(s), s)
            k += 1

    def decode_dc_first(coef, ci, td):
        s = huff_dc[td].decode(br)
        diff = _extend(br.receive(s), s) if s else 0
        preds[ci] += diff
        coef[0] = preds[ci] << al

    def decode_dc_refine(coef):
        coef[0] = int(coef[0]) | (br.read_bit() << al)

    def decode_ac_first(coef, ta):
        if state["eobrun"] > 0:
            state["eobrun"] -= 1
            return
        k = ss
        while k <= se:
            rs = huff_ac[ta].decode(br)
            r, s = rs >> 4, rs & 0xF
            if s == 0:
                if r == 15:
                    k += 16
                    continue
                state["eobrun"] = (1 << r) - 1 + (br.receive(r) if r else 0)
                return
            k += r
            if k > se:
                raise ValueError("JPEG: AC band overflow")
            coef[ZIGZAG[k]] = _extend(br.receive(s), s) << al
            k += 1

    def refine_one(coef, z):
        # T.81 G.1.2.3 correction bit for an already-nonzero coefficient.
        if br.read_bit():
            one = 1 << al
            c = int(coef[z])
            if abs(c) & one == 0:
                coef[z] = c + one if c > 0 else c - one

    def decode_ac_refine(coef, ta):
        one = 1 << al
        k = ss
        if state["eobrun"] == 0:
            while k <= se:
                rs = huff_ac[ta].decode(br)
                r, s = rs >> 4, rs & 0xF
                if s == 0:
                    if r < 15:
                        state["eobrun"] = (1 << r) + (
                            br.receive(r) if r else 0
                        )
                        break  # EOB phase below consumes one
                    val = 0  # ZRL: 16 zero-history positions
                else:
                    if s != 1:
                        raise ValueError(
                            "JPEG: refinement scan with magnitude > 1"
                        )
                    val = one if br.read_bit() else -one
                # Advance past r zero-history coefficients, refining any
                # nonzero-history ones passed on the way.
                while k <= se:
                    z = int(ZIGZAG[k])
                    if coef[z] != 0:
                        refine_one(coef, z)
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if s and k <= se:
                    coef[int(ZIGZAG[k])] = val
                k += 1
        if state["eobrun"] > 0:
            while k <= se:
                z = int(ZIGZAG[k])
                if coef[z] != 0:
                    refine_one(coef, z)
                k += 1
            state["eobrun"] -= 1

    def decode_block(coef, ci, comp):
        if not progressive:
            decode_baseline_block(coef, ci, comp[1], comp[2])
        elif ss == 0:
            if ah == 0:
                decode_dc_first(coef, ci, comp[1])
            else:
                decode_dc_refine(coef)
        else:
            if ah == 0:
                decode_ac_first(coef, comp[2])
            else:
                decode_ac_refine(coef, comp[2])

    def restart(n_done):
        if dri and n_done and n_done % dri == 0:
            marker = br.skip_to_marker()
            if not (0xD0 <= marker <= 0xD7):
                raise ValueError("JPEG: bad restart marker")
            for i in range(len(preds)):
                preds[i] = 0
            state["eobrun"] = 0

    if interleaved:
        n = 0
        for my in range(frame["mcuy"]):
            for mx in range(frame["mcux"]):
                restart(n)
                for ci, entry in enumerate(scan):
                    comp = entry[0]
                    st = stores[comp["idx"]]
                    for by in range(comp["v"]):
                        for bx in range(comp["h"]):
                            decode_block(
                                st[my * comp["v"] + by, mx * comp["h"] + bx],
                                ci, entry,
                            )
                n += 1
    else:
        comp = scan[0][0]
        st = stores[comp["idx"]]
        n = 0
        for by in range(comp["nby"]):
            for bx in range(comp["nbx"]):
                restart(n)
                decode_block(st[by, bx], 0, scan[0])
                n += 1
    # Advance to the next marker (the last entropy byte may be mid-bit).
    p = br.pos
    while p < len(data) - 1:
        if data[p] == 0xFF and data[p + 1] != 0x00:
            return p
        p += 1
    return len(data)


def _reconstruct(frame, qt, stores):
    """Dequantize + IDCT every stored block, assemble component planes,
    upsample chroma (nearest neighbour), YCbCr -> RGB."""
    w, h = frame["w"], frame["h"]
    hmax, vmax = frame["hmax"], frame["vmax"]
    out = []
    for comp in frame["comps"]:
        st = stores[comp["idx"]]
        q = qt[comp["tq"]]
        nby, nbx = st.shape[:2]
        # The store holds NATURAL-order coefficients (decode writes
        # through ZIGZAG), so dequantize + one batched einsum IDCT over
        # all blocks of the component — no per-block Python loop.
        blocks = st.reshape(nby, nbx, 8, 8).astype(np.float64) * q
        px = np.einsum("ki,yxij,jl->yxkl", _C.T, blocks, _C) + 128.0
        plane = px.transpose(0, 2, 1, 3).reshape(nby * 8, nbx * 8)
        ry, rx = vmax // comp["v"], hmax // comp["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        out.append(plane[:h, :w])
    if len(out) == 1:
        return np.clip(np.round(out[0]), 0, 255).astype(np.uint8)
    y, cb, cr = out[0], out[1] - 128.0, out[2] - 128.0
    rgb = np.stack(
        [
            y + 1.402 * cr,
            y - 0.344136 * cb - 0.714136 * cr,
            y + 1.772 * cb,
        ],
        axis=-1,
    )
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# --------------------------------------------------------------------------
# Encoder (fixtures + roundtrip tests).


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.buf.append(self.acc)
                if self.acc == 0xFF:
                    self.buf.append(0x00)
                self.acc = 0
                self.nbits = 0

    def flush(self) -> None:
        while self.nbits:
            self.write(1, 1)  # pad with 1s (T.81 B.1.1.5)


def _category(v: int) -> int:
    return int(abs(v)).bit_length()


def _encode_block(bw, block, q, dc_codes, ac_codes, pred):
    coef = np.round(_fdct(block.astype(np.float64) - 128.0) / q).astype(int)
    zz = coef.reshape(-1)[ZIGZAG]
    diff = int(zz[0]) - pred
    s = _category(diff)
    bw.write(*dc_codes[s])
    if s:
        bw.write(diff if diff > 0 else diff + (1 << s) - 1, s)
    run = 0
    last = max((i for i in range(1, 64) if zz[i]), default=0)
    for k in range(1, last + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            bw.write(*ac_codes[0xF0])
            run -= 16
        s = _category(v)
        bw.write(*ac_codes[(run << 4) | s])
        bw.write(v if v > 0 else v + (1 << s) - 1, s)
        run = 0
    if last < 63:
        bw.write(*ac_codes[0x00])
    return int(zz[0])


def _seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body


def encode_jpeg(pixels: np.ndarray, restart_interval: int = 0) -> bytes:
    """Encode uint8 (H, W) grayscale or (H, W, 3) RGB as baseline JPEG
    (grayscale: one component; color: YCbCr 4:2:0), Annex K tables.
    ``restart_interval`` > 0 emits DRI + RSTn markers every that many
    MCUs (grayscale path; exercises the decoder's resync logic)."""
    pixels = np.asarray(pixels, dtype=np.uint8)
    gray = pixels.ndim == 2
    h, w = pixels.shape[:2]
    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    if restart_interval:
        out += _seg(0xDD, restart_interval.to_bytes(2, "big"))
    for tq, tbl in ((0, STD_LUMA_Q),) + (() if gray else ((1, STD_CHROMA_Q),)):
        zz = tbl.reshape(-1)[ZIGZAG].astype(np.uint8).tobytes()
        out += _seg(0xDB, bytes([tq]) + zz)
    ncomp = 1 if gray else 3
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([ncomp])
    if gray:
        sof += bytes([1, 0x11, 0])
    else:
        sof += bytes([1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1])
    out += _seg(0xC0, sof)
    tables = [(0, 0, *DC_LUMA), (1, 0, *AC_LUMA)]
    if not gray:
        tables += [(0, 1, *DC_CHROMA), (1, 1, *AC_CHROMA)]
    for tc, th, bits, vals in tables:
        out += _seg(0xC4, bytes([(tc << 4) | th] + bits + vals))
    sos = bytes([ncomp])
    sos += bytes([1, 0x00]) if gray else bytes([1, 0x00, 2, 0x11, 3, 0x11])
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)
    dc_l, ac_l = _build_codes(*DC_LUMA), _build_codes(*AC_LUMA)
    bw = _BitWriter()
    if gray:
        ph = (h + 7) // 8 * 8
        pw = (w + 7) // 8 * 8
        img = np.pad(pixels, ((0, ph - h), (0, pw - w)), mode="edge")
        pred = 0
        mcu = 0
        for y0 in range(0, ph, 8):
            for x0 in range(0, pw, 8):
                if restart_interval and mcu and mcu % restart_interval == 0:
                    bw.flush()
                    out += bw.buf
                    bw = _BitWriter()
                    out += bytes(
                        [0xFF, 0xD0 + (mcu // restart_interval - 1) % 8]
                    )
                    pred = 0
                pred = _encode_block(
                    bw, img[y0 : y0 + 8, x0 : x0 + 8],
                    STD_LUMA_Q.reshape(8, 8), dc_l, ac_l, pred,
                )
                mcu += 1
    else:
        dc_c, ac_c = _build_codes(*DC_CHROMA), _build_codes(*AC_CHROMA)
        r = pixels[..., 0].astype(np.float64)
        g = pixels[..., 1].astype(np.float64)
        b = pixels[..., 2].astype(np.float64)
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        ph = (h + 15) // 16 * 16
        pw = (w + 15) // 16 * 16
        pad = lambda p: np.pad(
            p, ((0, ph - h), (0, pw - w)), mode="edge"
        )
        y, cb, cr = pad(y), pad(cb), pad(cr)
        # 4:2:0: average each 2x2 for the chroma planes.
        cb2 = cb.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
        cr2 = cr.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
        preds = [0, 0, 0]
        ql = STD_LUMA_Q.reshape(8, 8)
        qc = STD_CHROMA_Q.reshape(8, 8)
        for my in range(ph // 16):
            for mx in range(pw // 16):
                for by in range(2):
                    for bx in range(2):
                        y0, x0 = my * 16 + by * 8, mx * 16 + bx * 8
                        preds[0] = _encode_block(
                            bw, y[y0 : y0 + 8, x0 : x0 + 8], ql,
                            dc_l, ac_l, preds[0],
                        )
                y0, x0 = my * 8, mx * 8
                preds[1] = _encode_block(
                    bw, cb2[y0 : y0 + 8, x0 : x0 + 8], qc, dc_c, ac_c,
                    preds[1],
                )
                preds[2] = _encode_block(
                    bw, cr2[y0 : y0 + 8, x0 : x0 + 8], qc, dc_c, ac_c,
                    preds[2],
                )
    bw.flush()
    out += bw.buf
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --------------------------------------------------------------------------
# Progressive encoder (tests + fixtures): same quantized coefficients as
# the baseline encoder, emitted as a 6-scan script — DC first (Al=1,
# interleaved), DC refinement, then per component AC first (1..63, Al=1)
# and AC refinement (Ah=1, Al=0).  Covers spectral selection AND both
# successive-approximation paths, so decoding it exercises every
# progressive branch; per-block EOB only (EOBRUN=1 — legal, simpler).
# Because baseline and progressive encode IDENTICAL coefficients, the
# decoder must produce bit-identical pixels for both — the roundtrip
# test pins exactly that.


def _quantized_blocks(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    """(nby, nbx, 64) NATURAL-order quantized coefficients of an
    8-multiple plane — computed per block with the EXACT float-op order
    of the baseline encoder's _encode_block, so baseline and progressive
    encodes of the same image quantize identically (a batched einsum
    differs at round-to-half boundaries)."""
    h, w = plane.shape
    nby, nbx = h // 8, w // 8
    out = np.zeros((nby, nbx, 64), dtype=np.int64)
    for by in range(nby):
        for bx in range(nbx):
            block = plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
            out[by, bx] = np.round(
                _fdct(block.astype(np.float64) - 128.0) / q
            ).astype(np.int64).reshape(-1)
    return out


def _enc_ac_first(bw, zz, ss, se, al, ac_codes):
    run = 0
    for k in range(ss, se + 1):
        v = int(zz[k])
        a = abs(v) >> al
        if a == 0:
            run += 1
            continue
        while run > 15:
            bw.write(*ac_codes[0xF0])
            run -= 16
        s = a.bit_length()
        bw.write(*ac_codes[(run << 4) | s])
        sv = a if v > 0 else -a
        bw.write(sv if sv > 0 else sv + (1 << s) - 1, s)
        run = 0
    if run:
        bw.write(*ac_codes[0x00])  # EOB (EOBRUN = 1)


def _enc_ac_refine(bw, zz, ss, se, al, ac_codes):
    # T.81 G.1.2.3 bit ordering (the jcphuff shape): pending ZRLs flush
    # the moment ANY nonzero coefficient arrives — correction bits are
    # always attached to the symbol whose decode-side advance passes
    # their position, never carried across a ZRL boundary.
    run = 0
    pending: list[int] = []

    def flush():
        for b in pending:
            bw.write(b, 1)
        pending.clear()

    for k in range(ss, se + 1):
        v = int(zz[k])
        a = abs(v)
        if a >> al == 0:  # zero-history zero
            run += 1
            continue
        while run > 15:
            bw.write(*ac_codes[0xF0])
            flush()
            run -= 16
        if a >> (al + 1):  # already significant: queue correction bit
            pending.append((a >> al) & 1)
            continue
        # newly significant (magnitude exactly 1 at this precision)
        bw.write(*ac_codes[(run << 4) | 1])
        bw.write(1 if v > 0 else 0, 1)
        flush()
        run = 0
    if run or pending:
        bw.write(*ac_codes[0x00])  # EOB; decoder refines the rest
        flush()


def encode_jpeg_progressive(pixels: np.ndarray) -> bytes:
    """Encode uint8 grayscale (H, W) or RGB (H, W, 3) as PROGRESSIVE
    JPEG (SOF2), same quantization/Huffman tables and chroma layout as
    ``encode_jpeg`` — so both decode to bit-identical pixels."""
    pixels = np.asarray(pixels, dtype=np.uint8)
    gray = pixels.ndim == 2
    h, w = pixels.shape[:2]
    ql, qc = STD_LUMA_Q.reshape(8, 8), STD_CHROMA_Q.reshape(8, 8)
    if gray:
        ph, pw = (h + 7) // 8 * 8, (w + 7) // 8 * 8
        img = np.pad(
            pixels.astype(np.float64), ((0, ph - h), (0, pw - w)),
            mode="edge",
        )
        comps = [_quantized_blocks(img, ql)]
        sof_comps = bytes([1, 0x11, 0])
    else:
        r = pixels[..., 0].astype(np.float64)
        g = pixels[..., 1].astype(np.float64)
        b = pixels[..., 2].astype(np.float64)
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        ph, pw = (h + 15) // 16 * 16, (w + 15) // 16 * 16
        pad = lambda p: np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge")
        y, cb, cr = pad(y), pad(cb), pad(cr)
        cb2 = cb.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
        cr2 = cr.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
        comps = [
            _quantized_blocks(y, ql),
            _quantized_blocks(cb2, qc),
            _quantized_blocks(cr2, qc),
        ]
        sof_comps = bytes([1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1])
    out = bytearray(b"\xff\xd8")
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for tq, tbl in ((0, STD_LUMA_Q),) + (() if gray else ((1, STD_CHROMA_Q),)):
        out += _seg(0xDB, bytes([tq]) + tbl.reshape(-1)[ZIGZAG].astype(np.uint8).tobytes())
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
    sof += bytes([1 if gray else 3]) + sof_comps
    out += _seg(0xC2, sof)  # SOF2: progressive
    tables = [(0, 0, *DC_LUMA), (1, 0, *AC_LUMA)]
    if not gray:
        tables += [(0, 1, *DC_CHROMA), (1, 1, *AC_CHROMA)]
    for tc, th, bits, vals in tables:
        out += _seg(0xC4, bytes([(tc << 4) | th] + bits + vals))
    dc_codes = [_build_codes(*DC_LUMA)] + (
        [] if gray else [_build_codes(*DC_CHROMA)] * 2
    )
    ac_codes = [_build_codes(*AC_LUMA)] + (
        [] if gray else [_build_codes(*AC_CHROMA)] * 2
    )
    ncomp = len(comps)
    # MCU geometry (interleaved DC scans).
    if gray:
        mcu_list = [(0, by, bx) for by in range(comps[0].shape[0])
                    for bx in range(comps[0].shape[1])]
    else:
        mcuy, mcux = comps[1].shape[0], comps[1].shape[1]
        mcu_list = []
        for my in range(mcuy):
            for mx in range(mcux):
                for by in range(2):
                    for bx in range(2):
                        mcu_list.append((0, my * 2 + by, mx * 2 + bx))
                mcu_list.append((1, my, mx))
                mcu_list.append((2, my, mx))

    def sos(comp_ids, ss, se, ah, al_, body_writer):
        hdr = bytes([len(comp_ids)])
        for cid in comp_ids:
            td = 0 if cid == 1 else 1
            hdr += bytes([cid, (td << 4) | td])
        hdr += bytes([ss, se, (ah << 4) | al_])
        nonlocal out
        out += _seg(0xDA, hdr)
        bw = _BitWriter()
        body_writer(bw)
        bw.flush()
        out += bw.buf

    # Scan 1: DC first, Al=1, interleaved over all components.
    def dc_first(bw):
        preds = [0] * ncomp
        for ci, by, bx in mcu_list:
            v = int(comps[ci][by, bx, 0]) >> 1
            diff = v - preds[ci]
            preds[ci] = v
            s = _category(diff)
            bw.write(*dc_codes[ci][s])
            if s:
                bw.write(diff if diff > 0 else diff + (1 << s) - 1, s)

    sos(list(range(1, ncomp + 1)), 0, 0, 0, 1, dc_first)

    # Scan 2: DC refinement (raw bits, no Huffman).
    def dc_refine(bw):
        for ci, by, bx in mcu_list:
            bw.write(int(comps[ci][by, bx, 0]) & 1, 1)

    sos(list(range(1, ncomp + 1)), 0, 0, 1, 0, dc_refine)

    # Per component: AC first (Al=1) then AC refinement (Ah=1, Al=0).
    # AC scans are NON-interleaved (T.81 A.2.2): they cover the
    # component's UNPADDED block grid ceil(compW/8) x ceil(compH/8) —
    # the interleaved-pad blocks carry DC only.
    for ci in range(ncomp):
        if gray:
            sub = 1
        else:
            sub = 1 if ci == 0 else 2
        nbx_u = (-(-w // sub) + 7) // 8
        nby_u = (-(-h // sub) + 7) // 8

        def ac_first(bw, ci=ci, nby=nby_u, nbx=nbx_u):
            for by in range(nby):
                for bx in range(nbx):
                    zz = comps[ci][by, bx].reshape(-1)[ZIGZAG]
                    _enc_ac_first(bw, zz, 1, 63, 1, ac_codes[ci])

        sos([ci + 1], 1, 63, 0, 1, ac_first)

        def ac_refine(bw, ci=ci, nby=nby_u, nbx=nbx_u):
            for by in range(nby):
                for bx in range(nbx):
                    zz = comps[ci][by, bx].reshape(-1)[ZIGZAG]
                    _enc_ac_refine(bw, zz, 1, 63, 0, ac_codes[ci])

        sos([ci + 1], 1, 63, 1, 0, ac_refine)

    out += b"\xff\xd9"
    return bytes(out)
