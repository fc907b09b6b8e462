"""utf8mb4_general_ci collation weights (util/collate/general_ci.go; the
data is MySQL's public ctype-utf8 general_ci table).

MySQL general_ci assigns every BMP codepoint a uint16 weight; strings
compare by weight sequence after trailing-space truncation (PAD SPACE).
The weight function is NOT plain upper/lower-casing: Latin/Greek/Cyrillic
precomposed letters fold to their UPPERCASE BASE letter (É→E, ñ→N, ą→A),
'ß'→'S', while non-decomposable letters keep their own weight (Æ, Ð, Ø, Þ
are distinct letters, not AE/D/O/TH).

Instead of shipping the 2816-entry table, the weight is DERIVED from
Unicode data (NFD base + simple uppercase), which reproduces MySQL's
table exactly once two published-behavior deltas are encoded:

- ``_IDENTITY``: codepoints whose case pair was added to Unicode after
  the MySQL table was frozen (~Unicode 4.0) — general_ci keeps identity
  where a modern ``str.upper()`` would map them (e.g. ɐ→Ʌ is Unicode 5+).
- ``_OVERRIDES``: 9 letters general_ci maps specially — й folds to Й
  (not the decomposed И), lunate sigma to Σ, and the Greek oxia vowels to
  their tonos uppercase forms.

Verified exhaustively equal to the reference's plane tables for every
covered codepoint (all 11 planes × 256).

The engine-facing form is a **pure JVM expression** (whole-stage codegen,
no Python on the scan path): ``translate()`` over the 1108 codepoints
whose weight differs from identity, after an ``rtrim`` (PAD SPACE) and a
supplementary-plane collapse to U+FFFD via ``regexp_replace``.  Comparing
the transformed strings byte-wise (Spark's default UTF8_BINARY) equals
comparing MySQL weight sequences, because codepoint order == weight
order after the mapping.
"""

from __future__ import annotations

import functools
import unicodedata

# Planes (high byte) covered by MySQL's general_ci table; codepoints in
# other planes weigh as themselves.
_PLANES = frozenset([0x00, 0x01, 0x02, 0x03, 0x04, 0x05,
                     0x1E, 0x1F, 0x21, 0x24, 0xFF])

# Codepoints where general_ci keeps identity although modern Unicode
# defines a case mapping (post-4.0 case pairs, plus combining forms like
# U+0149/U+0344 whose NFD leads with a non-base character).
_IDENTITY = frozenset([
    0x149, 0x180, 0x19A, 0x19E, 0x23C, 0x23F, 0x240, 0x242, 0x247, 0x249,
    0x24B, 0x24D, 0x24F, 0x250, 0x251, 0x252, 0x25C, 0x261, 0x265, 0x266,
    0x26A, 0x26B, 0x26C, 0x271, 0x27D, 0x282, 0x287, 0x289, 0x28C, 0x29D,
    0x29E, 0x344, 0x371, 0x373, 0x377, 0x37B, 0x37C, 0x37D, 0x385, 0x3D7,
    0x3D9, 0x3F3, 0x3F5, 0x3F8, 0x3FB, 0x419, 0x48B, 0x4C6, 0x4CA, 0x4CE,
    0x4CF, 0x4F7, 0x4FB, 0x4FD, 0x4FF, 0x501, 0x503, 0x505, 0x507, 0x509,
    0x50B, 0x50D, 0x50F, 0x511, 0x513, 0x515, 0x517, 0x519, 0x51B, 0x51D,
    0x51F, 0x521, 0x523, 0x525, 0x527, 0x529, 0x52B, 0x52D, 0x52F, 0x587,
    0x1E9A, 0x1EFB, 0x1EFD, 0x1EFF, 0x1FBB, 0x1FC1, 0x1FC9, 0x1FCB,
    0x1FCD, 0x1FCE, 0x1FCF, 0x1FD3, 0x1FDB, 0x1FDD, 0x1FDE, 0x1FDF,
    0x1FE3, 0x1FEB, 0x1FED, 0x1FEE, 0x1FF9, 0x1FFB, 0x212B, 0x214E,
    0x2184, 0x219A, 0x219B, 0x21AE, 0x21CD, 0x21CE, 0x21CF,
])

# Letters general_ci maps to a weight neither identity nor the derived
# base-uppercase: й→Й (kept composed), lunate sigma→Σ, Greek oxia vowels
# → tonos uppercase.
_OVERRIDES = {
    0x3F2: 0x3A3,
    0x439: 0x419,
    0x1F71: 0x1FBB, 0x1F73: 0x1FC9, 0x1F75: 0x1FCB, 0x1F77: 0x1FDB,
    0x1F79: 0x1FF9, 0x1F7B: 0x1FEB, 0x1F7D: 0x1FFB,
}


def general_ci_weight(r: int) -> int:
    """MySQL utf8mb4_general_ci weight of codepoint ``r``
    (convertRuneGeneralCI, util/collate/general_ci.go:78-87)."""
    if r > 0xFFFF:
        return 0xFFFD
    if (r >> 8) not in _PLANES:
        return r
    ovr = _OVERRIDES.get(r)
    if ovr is not None:
        return ovr
    if r in _IDENTITY:
        return r
    c = chr(r)
    d = unicodedata.normalize("NFD", c)
    base = (
        d[0]
        if len(d) > 1 and all(unicodedata.combining(x) for x in d[1:])
        else c
    )
    u = base.upper()
    if u and ord(u[0]) <= 0xFFFF:
        # Multi-char uppercase (ß→'SS'): MySQL weighs the first letter.
        return ord(u[0])
    return ord(base)


@functools.lru_cache(maxsize=1)
def translate_args() -> tuple[str, str]:
    """(from, to) strings for ``translate()`` covering every BMP codepoint
    whose weight differs from itself — 1108 pairs."""
    src, dst = [], []
    for plane in sorted(_PLANES):
        for lo in range(256):
            r = (plane << 8) | lo
            w = general_ci_weight(r)
            if w != r:
                src.append(chr(r))
                dst.append(chr(w))
    return "".join(src), "".join(dst)


def general_ci_key_sql(operand: str, pad: bool = True) -> str:
    """SQL expression computing the general_ci sort/compare key of
    ``operand``: rtrim (PAD SPACE, truncateTailingSpace), supplementary
    planes → U+FFFD, then the weight translate.  Pure built-ins —
    whole-stage codegen.  ``pad=False`` skips the rtrim — MySQL LIKE is
    NO PAD: ``col LIKE 'abc '`` must not match ``'abc'``."""
    frm, to = translate_args()
    # The mapped chars are all letters/symbols — no quote or backslash —
    # so they embed raw in a single-quoted literal.
    assert "'" not in frm and "\\" not in frm
    base = f"rtrim({operand})" if pad else operand
    return (
        f"translate(regexp_replace({base}, "
        f"'[\\\\x{{10000}}-\\\\x{{10FFFF}}]', '�'), '{frm}', '{to}')"
    )


def register_general_ci(spark) -> None:
    """Register ``mysql_general_ci_key`` as a SQL scalar UDF (inlined JVM
    expression) — the engine's *_ci collation shim rewrites comparisons
    through it."""
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION mysql_general_ci_key"
        "(s STRING) RETURNS STRING RETURN "
        + general_ci_key_sql("s")
    )
