"""Derive the utf8mb4_unicode_ci key mapping and regenerate the encoded
delta block in ``tidb_spark/functions/collation_unicode.py``.

The ground truth is MySQL's public UCA 4.0.0 collation weight data (the
reference ships it as ``util/collate/unicode_ci_data.go``; the same data
is in MySQL's ctype-uca.c).  Rather than shipping the 65536-entry table,
the repo derives each BMP rune's *canonical representative string* from
Unicode character data (NFKD base folding, case-class minimum, digit
value folding, kana folding, ignorable rules) and encodes only the runes
where the derivation disagrees with the table.

Representative semantics: every single UCA primary weight ``w`` is
represented by one canonical rune (the member of its equivalence class
the derivation predicts to itself, else the min-codepoint member);
multi-weight runes (expansions: ß→ss, Œ→OE, Ⅷ→VIII) map to the concat of
their weights' representatives.  Comparing representative strings
byte-wise then equals comparing reference weight sequences — exactly,
for every rune in the covered set (asserted below).

Coverage contract (asserted + printed):
- exact for all ignorable / single-weight / implicit-weight runes and
  for curated expansions (r < 0x3000 or Latin ligature block);
- non-curated compat expansions (squared CJK units, Arabic presentation
  forms, circled numbers ≥0x3000) fall back to identity — conservative:
  they stay distinct (never wrongly equal), ordering by codepoint;
- Hangul syllables keep MySQL's implicit weights (identity classes), so
  composed-vs-decomposed-jamo equality is not folded (same as reference
  behaviour? — no: reference expands syllables only if its table does;
  asserted below whichever way the table says).

Run:  python scripts/unicode_ci_derive.py   (needs /root/reference)
Writes the generated ``_U_DELTAS`` literal into
tidb_spark/functions/collation_unicode.py between GEN-BEGIN/GEN-END.
"""

from __future__ import annotations

import re
import sys
import unicodedata
from pathlib import Path

REF = Path("/root/reference/util/collate/unicode_ci_data.go")
OUT = Path(__file__).resolve().parent.parent / (
    "tidb_spark/functions/collation_unicode.py"
)


def parse_table() -> dict[int, tuple[int, ...]]:
    src = REF.read_text()
    body = src.split("mapTable = []uint64{", 1)[1]
    body, rest = body.split("}", 1)
    body = re.sub(r"/\*.*?\*/", "", body, flags=re.S)
    vals = [int(t.strip(), 0) for t in body.split(",") if t.strip()]
    assert len(vals) == 65536, len(vals)
    lbody = rest.split("longRuneMap = map[rune][]uint64{", 1)[1]
    longmap: dict[int, list[int]] = {}
    for m in re.finditer(r"(0x[0-9A-Fa-f]+|\d+):\s*\{([^}]*)\}", lbody):
        longmap[int(m.group(1), 0)] = [
            int(x, 0) for x in re.findall(r"0x[0-9A-Fa-f]+|\d+", m.group(2))
        ]

    def unpack(u: int) -> list[int]:
        out = []
        while u:
            out.append(u & 0xFFFF)
            u >>= 16
        return out

    W = {}
    for r in range(65536):
        if vals[r] == 0xFFFD and r in longmap:
            W[r] = tuple(unpack(longmap[r][0]) + unpack(longmap[r][1]))
        else:
            W[r] = tuple(unpack(vals[r]))
    return W


def main() -> int:
    # Import the derivation rules from the runtime module so script and
    # engine share one predict() implementation.
    sys.path.insert(0, str(OUT.parent.parent.parent))
    from tidb_spark.functions.collation_unicode import (
        _predict, _CURATED_MAX, _is_curated,
    )

    W = parse_table()

    # weight -> canonical representative rune: prefer the class member the
    # derivation predicts to itself (stable fixpoint), else min codepoint.
    classes: dict[int, list[int]] = {}
    for r in range(65536):
        if len(W[r]) == 1:
            classes.setdefault(W[r][0], []).append(r)
    rep_of_weight: dict[int, int] = {}
    for w, members in classes.items():
        fix = [r for r in members if _predict(r) == chr(r)]
        rep_of_weight[w] = min(fix) if fix else min(members)

    # Target runtime mapping R(r).
    R: dict[int, str] = {}
    identity_fallback = []
    for r in range(65536):
        seq = W[r]
        if seq == ():
            R[r] = ""
            continue
        try:
            m = "".join(chr(rep_of_weight[w]) for w in seq)
        except KeyError:
            # implicit-weight rune (CJK/unassigned): unique class, keep
            # identity — exact (no other rune shares the pair).
            R[r] = chr(r)
            identity_fallback.append(r)
            continue
        if len(m) <= 1 or _is_curated(r):
            R[r] = m
        else:
            R[r] = chr(r)  # non-curated expansion: conservative identity
            identity_fallback.append(r)

    # Safety: identity fallbacks must not collide with any other rune's
    # representative string (no false equalities).
    rep_strings: dict[str, int] = {}
    collisions = 0
    for r in range(65536):
        v = R[r]
        if v in rep_strings and W[rep_strings[v]] != W[r]:
            collisions += 1
            if collisions < 10:
                print(
                    f"COLLISION U+{r:04X} vs U+{rep_strings[v]:04X} -> {v!r}"
                )
        elif v not in rep_strings:
            rep_strings[v] = r
    assert collisions == 0, f"{collisions} representative collisions"

    # Deltas vs the derivation.
    deltas = {r: R[r] for r in range(65536) if _predict(r) != R[r]}
    n_exp = sum(1 for v in deltas.values() if len(v) > 1)
    print(
        f"deltas={len(deltas)} (expansions {n_exp}); "
        f"identity-fallback={len(identity_fallback)} "
        f"(non-curated expansions "
        f"{sum(1 for r in identity_fallback if len(W[r]) > 1 and all(w in rep_of_weight for w in W[r]))})"
    )
    from collections import Counter
    pages = Counter(r >> 8 for r in deltas)
    print("delta pages:", {
        f"0x{p:02X}": c
        for p, c in sorted(pages.items(), key=lambda kv: -kv[1])[:20]
    })

    # Encode: "RRRR" alone = identity delta (table keeps the rune while
    # the derivation would fold it — post-Unicode-4.0 case pairs, same
    # family as general_ci's _IDENTITY); "RRRR:VVVV.VVVV" = mapping;
    # "RRRR:" = ignorable.
    parts = []
    for r in sorted(deltas):
        if deltas[r] == chr(r):
            parts.append(f"{r:X}")
        else:
            v = ".".join(f"{ord(c):X}" for c in deltas[r])
            parts.append(f"{r:X}:{v}")
    blob = ";".join(parts)
    print(f"encoded delta blob: {len(blob)} bytes")

    src = OUT.read_text()
    begin = src.index("# GEN-BEGIN")
    end = src.index("# GEN-END")
    begin = src.index("\n", begin) + 1
    lines = ['_U_DELTAS = (\n']
    for i in range(0, len(blob), 70):
        lines.append(f'    {blob[i:i + 70]!r}\n')
    lines.append(')\n')
    OUT.write_text(src[:begin] + "".join(lines) + src[end:])
    print(f"wrote {OUT}")

    # Exhaustive verification: reconstructed mapping == R for every rune.
    import importlib
    import tidb_spark.functions.collation_unicode as cu
    importlib.reload(cu)
    bad = 0
    for r in range(65536):
        got = cu.unicode_ci_rep(r)
        if got != R[r]:
            bad += 1
            if bad < 10:
                print(f"MISMATCH U+{r:04X}: got {got!r} want {R[r]!r}")
    assert bad == 0, f"{bad} mismatches"
    print("exhaustive reconstruction check: OK (65536/65536)")

    # Spot semantics (reference table ground truth).
    def key(s: str) -> str:
        return "".join(cu.unicode_ci_rep(ord(c)) for c in s)

    checks = [
        ("ß", "ss", True), ("é", "E", True), ("Œ", "OE", True),
        ("Æ", "AE", False), ("Ø", "O", False), ("ﬁ", "fi", True),
        ("Ⅷ", "VIII", True), ("か", "カ", True), ("Ё", "Ѐ", True),
        ("Α", "ά", True), ("ǅ", "dž", True),
    ]
    for a, b, want_eq in checks:
        wa = tuple(w for c in a for w in W[ord(c)])
        wb = tuple(w for c in b for w in W[ord(c)])
        table_eq = wa == wb
        mine = key(a) == key(b)
        status = "OK" if (mine == table_eq) else "WRONG"
        note = "" if table_eq == want_eq else " (table differs from memo)"
        print(f"  {a!r}~{b!r}: table={table_eq} derived={mine} {status}{note}")
        assert mine == table_eq, (a, b)
    return 0


if __name__ == "__main__":
    sys.exit(main())
