"""Analyze the reference utf8mb4_unicode_ci weight table (MySQL's public
UCA 4.0.0 collation data, util/collate/unicode_ci_data.go) to plan a
derived PySpark key function: representative-rune translate pairs +
expansion replace chain, mirroring functions/collation.py's general_ci
derivation technique.

Run-once analysis — informs what gets encoded in the repo (deltas only).
"""

import re
import sys
import unicodedata

REF = "/root/reference/util/collate/unicode_ci_data.go"


def parse_table():
    src = open(REF).read()
    # mapTable: flat []uint64 literal
    body = src.split("mapTable = []uint64{", 1)[1]
    body, rest = body.split("}", 1)
    body = re.sub(r"/\*.*?\*/", "", body, flags=re.S)
    vals = [
        int(tok, 0)
        for tok in (t.strip() for t in body.split(","))
        if tok
    ]
    assert len(vals) == 65536, len(vals)
    # longRuneMap: map[rune][]uint64{ 0xXXXX: {a, b}, ... }
    lbody = rest.split("longRuneMap = map[rune][]uint64{", 1)[1]
    lbody = lbody.split("}\n)", 1)[0]
    longmap = {}
    for m in re.finditer(
        r"(0x[0-9A-Fa-f]+|\d+):\s*\{([^}]*)\}", lbody
    ):
        r = int(m.group(1), 0)
        parts = [int(x, 0) for x in re.findall(r"0x[0-9A-Fa-f]+|\d+", m.group(2))]
        longmap[r] = parts
    return vals, longmap


def unpack(u64):
    """Packed u64 -> weight list, low u16 first, stop at 0 (reference
    convertRuneUnicodeCI / Compare loop)."""
    out = []
    while u64:
        out.append(u64 & 0xFFFF)
        u64 >>= 16
    return out


def main():
    vals, longmap = parse_table()
    W = {}
    LONG = 0xFFFD
    for r in range(65536):
        if vals[r] == LONG and r in longmap:
            seq = unpack(longmap[r][0]) + unpack(longmap[r][1])
        else:
            seq = unpack(vals[r])
        W[r] = tuple(seq)

    # singleton-weight reps: weight -> min rune with seq == (w,)
    rep_of_weight = {}
    for r in range(65536):
        if len(W[r]) == 1:
            w = W[r][0]
            if w not in rep_of_weight or r < rep_of_weight[w]:
                rep_of_weight[w] = r

    n_ignorable = sum(1 for r in range(65536) if W[r] == ())
    n_single = sum(1 for r in range(65536) if len(W[r]) == 1)
    n_multi = sum(1 for r in range(65536) if len(W[r]) > 1)
    print(f"ignorable={n_ignorable} single={n_single} multi={n_multi}")

    # single-weight runes whose rep differs from self
    translate_pairs = []
    no_rep = 0
    for r in range(65536):
        if len(W[r]) == 1:
            rep = rep_of_weight[W[r][0]]
            if rep != r:
                translate_pairs.append((r, rep))
    print(f"translate pairs (rep differs): {len(translate_pairs)}")

    # multi-weight runes: can rep string be built from singleton reps?
    exp_ok, exp_fail = [], []
    for r in range(65536):
        if len(W[r]) > 1:
            try:
                reps = "".join(chr(rep_of_weight[w]) for w in W[r])
                exp_ok.append((r, reps))
            except KeyError:
                exp_fail.append(r)
    print(f"multi expandable={len(exp_ok)} not-expandable={len(exp_fail)}")
    # distribution of expandable multi by block
    from collections import Counter
    blocks = Counter()
    for r, _ in exp_ok:
        blocks[r >> 8] += 1
    print("expandable multi by page (hex page: count):")
    for p, c in sorted(blocks.items()):
        print(f"  0x{p:02X}xx: {c}")
    failpages = Counter()
    for r in exp_fail:
        failpages[r >> 8] += 1
    print("not-expandable pages:", {f"0x{p:02X}": c for p, c in sorted(failpages.items())})

    # how well does the unicodedata derivation predict?
    # prediction: NFKD? no - NFD base fold, uppercase; here just measure vs
    # general_ci-style derivation for single-weight runes.
    def predict(r):
        c = chr(r)
        d = unicodedata.normalize("NFD", c)
        base = d[0] if len(d) > 1 and all(unicodedata.combining(x) for x in d[1:]) else c
        u = base.upper()
        return u if u else base

    agree = disagree = 0
    deltas = []
    for r, rep in translate_pairs:
        p = predict(r)
        if len(p) == 1 and ord(p) == rep:
            agree += 1
        else:
            disagree += 1
            deltas.append((r, rep, p))
    print(f"translate: derivation agrees={agree} deltas={disagree}")
    pages = Counter()
    for r, rep, p in deltas:
        pages[r >> 8] += 1
    print("delta pages:", {f"0x{p:02X}": c for p, c in sorted(pages.items())})
    # sample deltas in low planes
    for r, rep, p in deltas[:40]:
        print(f"  U+{r:04X} {chr(r)!r} -> table U+{rep:04X} {chr(rep)!r}, derived {p!r}")

    # spot checks
    for a, b in [("ß", "ss"), ("Æ", "AE"), ("Œ", "OE"), ("é", "E"),
                 ("Ø", "O"), ("Þ", "TH"), ("Đ", "D"), ("Ł", "L"),
                 ("か", "カ"), ("ĳ", "ij")]:
        wa = [w for c in a for w in W[ord(c)]]
        wb = [w for c in b for w in W[ord(c)]]
        print(f"  {a!r} vs {b!r}: {'EQ' if wa == wb else 'NE'}  {list(map(hex, wa))} {list(map(hex, wb))}")




def main2():
    vals, longmap = parse_table()
    W = {}
    LONG = 0xFFFD
    for r in range(65536):
        if vals[r] == LONG and r in longmap:
            seq = unpack(longmap[r][0]) + unpack(longmap[r][1])
        else:
            seq = unpack(vals[r])
        W[r] = tuple(seq)
    rep_of_weight = {}
    for r in range(65536):
        if len(W[r]) == 1:
            w = W[r][0]
            if w not in rep_of_weight or r < rep_of_weight[w]:
                rep_of_weight[w] = r

    def predict(r):
        """v2: NFKD, drop ignorables (Mn/Me/Cf), kana fold, case-min."""
        c = chr(r)
        d = unicodedata.normalize("NFKD", c)
        out = []
        for x in d:
            cat = unicodedata.category(x)
            if cat in ("Mn", "Me", "Cf"):
                continue
            o = ord(x)
            # katakana -> hiragana (primary-equal in UCA)
            if 0x30A1 <= o <= 0x30F6:
                x = chr(o - 0x60)
            # case: class rep is min-codepoint member
            cand = {x}
            cand.add(x.upper() if len(x.upper()) == 1 else x)
            cand.add(x.lower() if len(x.lower()) == 1 else x)
            # multi-char uppercase (ss for ß)
            u = x.upper()
            if len(u) > 1:
                out.extend(min(y, key=ord) if 0 else min((y, y.lower()), key=ord) for y in u)
                continue
            out.append(min(cand, key=ord))
        return "".join(out)

    agree = disagree = 0
    from collections import Counter
    pages = Counter()
    samples = {}
    for r in range(65536):
        seq = W[r]
        if seq == ():
            expected = ""
        else:
            try:
                expected = "".join(chr(rep_of_weight[w]) for w in seq)
            except KeyError:
                continue  # implicit-weight runes: identity, checked separately
        p = predict(r)
        if p == expected or (expected == chr(r) and True and p == chr(r)):
            agree += 1
        elif expected == chr(r):
            # identity in table but prediction says otherwise -> delta
            pages[r >> 8] += 1
            samples.setdefault(r >> 8, []).append((r, expected, p))
            disagree += 1
        else:
            pages[r >> 8] += 1
            samples.setdefault(r >> 8, []).append((r, expected, p))
            disagree += 1
    print(f"v2: agree={agree} deltas={disagree}")
    print("delta pages:", {f"0x{p:02X}": c for p, c in sorted(pages.items(), key=lambda kv: -kv[1])[:25]})
    for pg in sorted(pages, key=lambda p: -pages[p])[:12]:
        print(f"page 0x{pg:02X} ({pages[pg]}):")
        for r, exp, p in samples[pg][:6]:
            print(f"  U+{r:04X} {chr(r)!r}: table {exp!r} predicted {p!r}")


main2()

if __name__ == "__main__":
    main2()
