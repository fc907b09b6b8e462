"""utf8mb4_unicode_ci collation key (util/collate/unicode_ci.go — UCA
4.0.0 primary weights; the data is MySQL's public collation table, also
in MySQL's ctype-uca.c).

unicode_ci compares strings by their sequence of UCA *primary* weights
after trailing-space truncation (PAD SPACE, truncateTailingSpace) — so
it is both case- and accent-insensitive, combining marks are ignorable,
and some letters expand to multi-weight sequences (ß='ss', Œ='OE',
Ⅷ='VIII'; note the reference table gives Æ and Ø their *own* primaries —
'Æ'≠'AE', 'Ø'≠'O' — unlike DUCET-derived folklore; pinned in tests).

Instead of shipping the 65536-entry weight table, each BMP rune's
**canonical representative string** is DERIVED from Unicode character
data (``_predict``): NFKD base folding with ignorable rules, digit-value
folding, kana folding, and case-class minimum.  The runes where the
derivation disagrees with MySQL's table are encoded as a compact delta
blob (``_U_DELTAS``, regenerated + exhaustively verified against the
reference table by ``scripts/unicode_ci_derive.py``).  Comparing
representative strings byte-wise equals comparing reference weight
sequences for every rune in the covered set.

Coverage contract (verified by the derive script):
- exact for all ignorable, single-weight, and implicit-weight runes and
  for curated expansions (BMP < 0x3000 plus the Latin ligature block);
- non-curated compat expansions (squared CJK units ㎏, Arabic
  presentation forms, circled numbers) fall back to identity —
  conservative: never wrongly equal, ordered by codepoint;
- ordering is by representative codepoint: exact within each cased
  alphabet and for digits; letters with distinct non-ASCII primaries
  (Ø, Þ, Ł) order after Z rather than interleaved at their UCA position.

The engine-facing form is a pure-JVM expression chain (whole-stage
codegen, no Python on the scan path): rtrim → supplementary-plane
collapse (reference: weight 0xFFFD for r > 0xFFFF) → ignorable deletion
(one regexp_replace over compressed ranges) → curated expansion replace
chain → 1:1 weight translate.
"""

from __future__ import annotations

import functools
import unicodedata

# Small/iteration kana fold to the full form sharing the UCA primary.
_KANA_SMALL = {
    0x3041: 0x3042, 0x3043: 0x3044, 0x3045: 0x3046, 0x3047: 0x3048,
    0x3049: 0x304A, 0x3063: 0x3064, 0x3083: 0x3084, 0x3085: 0x3086,
    0x3087: 0x3088, 0x308E: 0x308F, 0x3095: 0x304B, 0x3096: 0x3051,
}

# Expansions are materialized in the SQL replace chain only for this
# curated set; other multi-weight runes keep identity (see contract).
_CURATED_MAX = 0x3000


def _is_curated(r: int) -> bool:
    return r < _CURATED_MAX or 0xFB00 <= r <= 0xFB4F


def _predict(r: int) -> str:
    """Derived canonical representative of BMP rune ``r`` (before
    deltas): the string whose per-char weights concatenate to ``r``'s
    UCA 4.0.0 primary weight sequence, for the vast majority of runes."""
    c = chr(r)
    cat = unicodedata.category(c)
    if cat == "Cc" and c not in "\t\n\v\f\r":
        return ""  # controls are completely ignorable
    if 0xAC00 <= r <= 0xD7A3 or 0xF900 <= r <= 0xFAFF:
        # Hangul syllables / CJK compat ideographs carry implicit
        # weights of their own codepoint — no NFKD.
        return c
    out: list[str] = []
    for x in unicodedata.normalize("NFKD", c):
        xcat = unicodedata.category(x)
        if xcat in ("Mn", "Me", "Cf") and unicodedata.combining(x) != 0:
            continue  # diacritic marks: primary-ignorable
        o = ord(x)
        if xcat == "Nd":
            out.append(chr(0x30 + int(unicodedata.digit(x))))
            continue
        if xcat in ("Nl", "No"):
            n = unicodedata.numeric(x, None)
            if n is not None and n == int(n) and 0 <= n <= 9:
                out.append(chr(0x30 + int(n)))
                continue
        if 0x30A1 <= o <= 0x30F6:  # katakana -> hiragana
            o = ord(x) - 0x60
        o = _KANA_SMALL.get(o, o)
        x = chr(o)
        u, low = x.upper(), x.lower()
        if len(u) > 1:  # ß -> 'ss' etc: weight per expanded letter
            out.extend(
                min((y, y.upper()), key=ord) if len(y.upper()) == 1 else y
                for y in u
            )
            continue
        cand = [x, u]
        if len(low) == 1:
            cand.append(low)
        out.append(min(cand, key=ord))
    res = "".join(out)
    if len(res) > 1 and not _is_curated(r):
        # non-curated expansion: identity fallback (see contract)
        return c
    return res


# Encoded disagreements between _predict and MySQL's table —
# "RRRR:VVVV.VVVV;..." hex (empty value = ignorable).  Generated and
# exhaustively verified by scripts/unicode_ci_derive.py; do not edit.
# GEN-BEGIN
_U_DELTAS = (
    '85;A8;AF;B4;B8;131;152:4F.45;153:4F.45;18D:5A.57;1BE:54.53;23C;23D;242'
    ';243;247;249;24B;24D;24F;289;28C;2A3:44.5A;2A4:44.1B7;2A5:44.291;2A6:5'
    '4.53;2A7:54.1A9;2A8:54.255;2A9:46.14A;2AA:4C.53;2AB:4C.5A;2D8;2D9;2DA;'
    '2DB;2DC;2DD;34F:;358;359;35A;35B;35C;363:41;364:45;365:49;366:4F;367:5'
    '5;368:43;369:44;36A:48;36B:4D;36C:52;36D:54;36E:56;36F:58;371;373;377;'
    '37A:399;384:B4;385:A8;3D7:39A.391.399;3F3;3FD;3FE;3FF;403;407;40C;40E;'
    '419;439:419;453:403;457:407;45C:40C;45E:40E;476;477:476;487;488:;489:;'
    '490:413;491:413;4CF;4D0;4D1:4D0;4D2;4D3:4D2;4D6;4D7:4D6;4DA;4DB:4DA;4D'
    'C;4DD:4DC;4DE;4DF:4DE;4E4;4E5:4E4;4E6;4E7:4E6;4EA;4EB:4EA;4EC;4ED:4EC;'
    '4F0;4F1:4F0;4F2;4F3:4F2;4F4;4F5:4F4;4F7;4F8;4F9:4F8;4FB;4FD;4FF;511;51'
    '3;515;517;519;51B;51D;51F;521;523;525;527;529;52B;52D;52F;5A2;5BA;5C5;'
    '5C7;5DB:5DA;5DE:5DD;5E0:5DF;5E4:5E3;5E6:5E5;5F0:5D5.5D5;5F1:5D5.5D9;5F'
    '2:5D9.5D9;600:;601:;602:;603:;616;617;618;619;61A;622;623;624;625;626;'
    '659;65A;65B;65C;65D;65E;65F;674:621;675:627.621;676:648.621;677:6C7.62'
    '1;678:64A.621;6DD:;6DE:;6E5:648;6E6:64A;6FD:621;6FE:645;70F:;714:713;7'
    '1C:71B;724:723;727:726;72D:712;72E:713;72F:715;7C0;7C1;7C2;7C3;7C4;7C5'
    ';7C6;7C7;7C8;7C9;7EB;7EC;7ED;7EE;7EF;7F0;7F1;7F2;7F3;7FD;816;817;818;8'
    '19;81B;81C;81D;81E;81F;820;821;822;823;825;826;827;829;82A;82B;82C;82D'
    ';859;85A;85B;898;899;89A;89B;89C;89D;89E;89F;8CA;8CB;8CC;8CD;8CE;8CF;8'
    'D0;8D1;8D2;8D3;8D4;8D5;8D6;8D7;8D8;8D9;8DA;8DB;8DC;8DD;8DE;8DF;8E0;8E1'
    ';8E3;8E4;8E5;8E6;8E7;8E8;8E9;8EA;8EB;8EC;8ED;8EE;8EF;8F0;8F1;8F2;8F3;8'
    'F4;8F5;8F6;8F7;8F8;8F9;8FA;8FB;8FC;8FD;8FE;8FF;901:;902:;903:;94D;981:'
    ';982:;983:;9CB;9CC;9CD;9F4:31;9F5:32;9F6:33;9F7:34;9FE;A01:;A02:;A03:;'
    'A4D;A70:;A71:;A81:;A82:;A83:;ACD;B01:;B02:;B03:;B48;B4B;B4C;B4D;B82:;B'
    '94;BCA;BCB;BCC;BCD;BE6;C01:;C02:;C03:;C3C;C48;C4D;C55;C56;C78;C79;C7A;'
    'C7B;C7C;C7D;C7E;C82:;C83:;CC0;CC7;CC8;CCA;CCB;CCD;D02:;D03:;D3B;D3C;D4'
    'A;D4B;D4C;D4D;D82:;D83:;DCA;DDA;DDC;DDD;DDE;DE6;DE7;DE8;DE9;DEA;DEB;DE'
    'C;DED;DEE;DEF;E33;E38;E39;E3A;E47:;E4E:;EB3;EB8;EB9;EBA;F00:F68.F7C;F2'
    'A:31;F2B:32;F2C:33;F2D:34;F2E:35;F2F:36;F30:37;F31:38;F32:39;F33:30;F6'
    'A:F62;F71;F72;F73;F74;F75;F76;F77;F78;F79;F7A;F7B;F7C;F7D;F7E:;F7F:;F8'
    '0;F81;F84;FBA:FAD;FBB:FB1;FBC:FB2;1026;1036:;1038:;1039;103A;108D;1090'
    ';1091;1092;1093;1094;1095;1096;1097;1098;1099;10D0:10A0;10D1:10A1;10D2'
    ':10A2;10D3:10A3;10D4:10A4;10D5:10A5;10D6:10A6;10D7:10A7;10D8:10A8;10D9'
    ':10A9;10DA:10AA;10DB:10AB;10DC:10AC;10DD:10AD;10DE:10AE;10DF:10AF;10E0'
    ':10B0;10E1:10B1;10E2:10B2;10E3:10B3;10E4:10B4;10E5:10B5;10E6:10B6;10E7'
    ':10B7;10E8:10B8;10E9:10B9;10EA:10BA;10EB:10BB;10EC:10BC;10ED:10BD;10EE'
    ':10BE;10EF:10BF;10F0:10C0;10F1:10C1;10F2:10C2;10F3:10C3;10F4:10C4;10F5'
    ':10C5;10FC;135D;135E;135F;13F8;13F9;13FA;13FB;13FC;13FD;16A1:16A0;16A4'
    ':16A2;16A5:16A2;16A7:16A6;16A9:16A8;16AC:16A8;16AD:16A8;16AE:16A8;16B3'
    ':16B2;16B4:16B2;16B5:16B2;16B6:16B2;16BB:16BA;16BC:16BA;16BD:16BA;16BF'
    ':16BE;16C0:16BE;16C2:16C1;16C4:16C3;16C6:16C5;16CB:16CA;16CC:16CA;16CD'
    ':16CA;16CE:16CA;16D0:16CF;16D1:16CF;16D3:16D2;16D4:16D2;16D5:16C8;16D8'
    ':16D7;16D9:16D7;16DB:16DA;16DD:16DC;16E7:16E6;16E8:16E6;16E9:16B9;16EA'
    ':16CA;16EE:16C5.16DA;16EF:16D7.16D7;16F0:16A6.16A6;1714;17C6:;17C7:;17'
    'C8:;17C9:;17CA:;17CB:;17CC:;17CD:;17CE:;17CF:;17D0:;17D1:;17D2;17D3:;1'
    '80B:;180C:;180D:;180E:;18A9;19D0;19D1;19D2;19D3;19D4;19D5;19D6;19D7;19'
    'D8;19D9;19DA;1A17;1A18;1A60;1A75;1A76;1A77;1A78;1A79;1A7A;1A7B;1A7C;1A'
    '7F;1A80;1A81;1A82;1A83;1A84;1A85;1A86;1A87;1A88;1A89;1A90;1A91;1A92;1A'
    '93;1A94;1A95;1A96;1A97;1A98;1A99;1AB0;1AB1;1AB2;1AB3;1AB4;1AB5;1AB6;1A'
    'B7;1AB8;1AB9;1ABA;1ABB;1ABC;1ABD;1ABF;1AC0;1AC1;1AC2;1AC3;1AC4;1AC5;1A'
    'C6;1AC7;1AC8;1AC9;1ACA;1ACB;1ACC;1ACD;1ACE;1B06;1B08;1B0A;1B0C;1B0E;1B'
    '12;1B34;1B3B;1B3D;1B40;1B41;1B43;1B50;1B51;1B52;1B53;1B54;1B55;1B56;1B'
    '57;1B58;1B59;1B6B;1B6C;1B6D;1B6E;1B6F;1B70;1B71;1B72;1B73;1BAB;1BB0;1B'
    'B1;1BB2;1BB3;1BB4;1BB5;1BB6;1BB7;1BB8;1BB9;1BE6;1C37;1C40;1C41;1C42;1C'
    '43;1C44;1C45;1C46;1C47;1C48;1C49;1C50;1C51;1C52;1C53;1C54;1C55;1C56;1C'
    '57;1C58;1C59;1C80;1C81;1C82;1C83;1C84;1C85;1C86;1C87;1C90;1C91;1C92;1C'
    '93;1C94;1C95;1C96;1C97;1C98;1C99;1C9A;1C9B;1C9C;1C9D;1C9E;1C9F;1CA0;1C'
    'A1;1CA2;1CA3;1CA4;1CA5;1CA6;1CA7;1CA8;1CA9;1CAA;1CAB;1CAC;1CAD;1CAE;1C'
    'AF;1CB0;1CB1;1CB2;1CB3;1CB4;1CB5;1CB6;1CB7;1CB8;1CB9;1CBA;1CBD;1CBE;1C'
    'BF;1CD0;1CD1;1CD2;1CD4;1CD5;1CD6;1CD7;1CD8;1CD9;1CDA;1CDB;1CDC;1CDD;1C'
    'DE;1CDF;1CE0;1CE2;1CE3;1CE4;1CE5;1CE6;1CE7;1CE8;1CED;1CF4;1CF8;1CF9;1D'
    '4C:1D08;1D4E:1D09;1D78;1D9B;1D9C;1D9D;1D9E;1D9F;1DA0;1DA1;1DA2;1DA3;1D'
    'A4;1DA5;1DA6;1DA7;1DA8;1DA9;1DAA;1DAB;1DAC;1DAD;1DAE;1DAF;1DB0;1DB1;1D'
    'B2;1DB3;1DB4;1DB5;1DB6;1DB7;1DB8;1DB9;1DBA;1DBB;1DBC;1DBD;1DBE;1DBF;1D'
    'C0;1DC1;1DC2;1DC3;1DC4;1DC5;1DC6;1DC7;1DC8;1DC9;1DCA;1DCB;1DCC;1DCD;1D'
    'CE;1DCF;1DD0;1DD1;1DD2;1DD3;1DD4;1DD5;1DD6;1DD7;1DD8;1DD9;1DDA;1DDB;1D'
    'DC;1DDD;1DDE;1DDF;1DE0;1DE1;1DE2;1DE3;1DE4;1DE5;1DE6;1DE7;1DE8;1DE9;1D'
    'EA;1DEB;1DEC;1DED;1DEE;1DEF;1DF0;1DF1;1DF2;1DF3;1DF4;1DF5;1DF6;1DF7;1D'
    'F8;1DF9;1DFA;1DFB;1DFC;1DFD;1DFE;1DFF;1E9E;1EFB;1EFD;1EFF;1FBD;1FBF:1F'
    'BD;1FC0;1FC1:A8;1FCD:1FBD;1FCE:1FBD;1FCF:1FBD;1FDD;1FDE:1FDD;1FDF:1FDD'
    ';1FED:A8;1FEE:A8;1FFD:B4;1FFE:1FDD;200B:;200C:;200D:;200E:;200F:;2017;'
    '202A:;202B:;202C:;202D:;202E:;203E;2060:;2061:;2062:;2063:;206A:;206B:'
    ';206C:;206D:;206E:;206F:;2090;2091;2092;2093;2094;2095;2096;2097;2098;'
    '2099;209A;209B;209C;20DD:;20DE:;20DF:;20E0:;20E2:;20E3:;20E4:;20EB;20E'
    'C;20ED;20EE;20EF;20F0;213C;214E;2150;2151;2152;2184;2185;2189;24EB:31.'
    '31;24EC:31.32;24ED:31.33;24EE:31.34;24EF:31.35;24F0:31.36;24F1:31.37;2'
    '4F2:31.38;24F3:31.39;24F4:32.30;24FE:31.30;277F:31.30;2789:31.30;2793:'
    '31.30;2C30;2C31;2C32;2C33;2C34;2C35;2C36;2C37;2C38;2C39;2C3A;2C3B;2C3C'
    ';2C3D;2C3E;2C3F;2C40;2C41;2C42;2C43;2C44;2C45;2C46;2C47;2C48;2C49;2C4A'
    ';2C4B;2C4C;2C4D;2C4E;2C4F;2C50;2C51;2C52;2C53;2C54;2C55;2C56;2C57;2C58'
    ';2C59;2C5A;2C5B;2C5C;2C5D;2C5E;2C5F;2C61;2C62;2C63;2C64;2C65;2C66;2C68'
    ';2C6A;2C6C;2C6D;2C6E;2C6F;2C70;2C73;2C76;2C7C;2C7D;2C7E;2C7F;2C81;2C83'
    ';2C85;2C87;2C89;2C8B;2C8D;2C8F;2C91;2C93;2C95;2C97;2C99;2C9B;2C9D;2C9F'
    ';2CA1;2CA3;2CA5;2CA7;2CA9;2CAB;2CAD;2CAF;2CB1;2CB3;2CB5;2CB7;2CB9;2CBB'
    ';2CBD;2CBF;2CC1;2CC3;2CC5;2CC7;2CC9;2CCB;2CCD;2CCF;2CD1;2CD3;2CD5;2CD7'
    ';2CD9;2CDB;2CDD;2CDF;2CE1;2CE3;2CEC;2CEE;2CEF;2CF0;2CF1;2CF3;2D00;2D01'
    ';2D02;2D03;2D04;2D05;2D06;2D07;2D08;2D09;2D0A;2D0B;2D0C;2D0D;2D0E;2D0F'
    ';2D10;2D11;2D12;2D13;2D14;2D15;2D16;2D17;2D18;2D19;2D1A;2D1B;2D1C;2D1D'
    ';2D1E;2D1F;2D20;2D21;2D22;2D23;2D24;2D25;2D27;2D2D;2D6F;2D7F;2DE0;2DE1'
    ';2DE2;2DE3;2DE4;2DE5;2DE6;2DE7;2DE8;2DE9;2DEA;2DEB;2DEC;2DED;2DEE;2DEF'
    ';2DF0;2DF1;2DF2;2DF3;2DF4;2DF5;2DF6;2DF7;2DF8;2DF9;2DFA;2DFB;2DFC;2DFD'
    ';2DFE;2DFF;2E9F;2EF3;2F00;2F01;2F02;2F03;2F04;2F05;2F06;2F07;2F08;2F09'
    ';2F0A;2F0B;2F0C;2F0D;2F0E;2F0F;2F10;2F11;2F12;2F13;2F14;2F15;2F16;2F17'
    ';2F18;2F19;2F1A;2F1B;2F1C;2F1D;2F1E;2F1F;2F20;2F21;2F22;2F23;2F24;2F25'
    ';2F26;2F27;2F28;2F29;2F2A;2F2B;2F2C;2F2D;2F2E;2F2F;2F30;2F31;2F32;2F33'
    ';2F34;2F35;2F36;2F37;2F38;2F39;2F3A;2F3B;2F3C;2F3D;2F3E;2F3F;2F40;2F41'
    ';2F42;2F43;2F44;2F45;2F46;2F47;2F48;2F49;2F4A;2F4B;2F4C;2F4D;2F4E;2F4F'
    ';2F50;2F51;2F52;2F53;2F54;2F55;2F56;2F57;2F58;2F59;2F5A;2F5B;2F5C;2F5D'
    ';2F5E;2F5F;2F60;2F61;2F62;2F63;2F64;2F65;2F66;2F67;2F68;2F69;2F6A;2F6B'
    ';2F6C;2F6D;2F6E;2F6F;2F70;2F71;2F72;2F73;2F74;2F75;2F76;2F77;2F78;2F79'
    ';2F7A;2F7B;2F7C;2F7D;2F7E;2F7F;2F80;2F81;2F82;2F83;2F84;2F85;2F86;2F87'
    ';2F88;2F89;2F8A;2F8B;2F8C;2F8D;2F8E;2F8F;2F90;2F91;2F92;2F93;2F94;2F95'
    ';2F96;2F97;2F98;2F99;2F9A;2F9B;2F9C;2F9D;2F9E;2F9F;2FA0;2FA1;2FA2;2FA3'
    ';2FA4;2FA5;2FA6;2FA7;2FA8;2FA9;2FAA;2FAB;2FAC;2FAD;2FAE;2FAF;2FB0;2FB1'
    ';2FB2;2FB3;2FB4;2FB5;2FB6;2FB7;2FB8;2FB9;2FBA;2FBB;2FBC;2FBD;2FBE;2FBF'
    ';2FC0;2FC1;2FC2;2FC3;2FC4;2FC5;2FC6;2FC7;2FC8;2FC9;2FCA;2FCB;2FCC;2FCD'
    ';2FCE;2FCF;2FD0;2FD1;2FD2;2FD3;2FD4;2FD5;302E:;302F:;3032:3031;3034:30'
    '33;3038;3039;303A;309B;309C;3192;3193;3194;3195;3196;3197;3198;3199;31'
    '9A;319B;319C;319D;319E;319F;31A0:3105;31A1:3117;31A2:3110;31A3:310D;31'
    'A5:31A4;31A7:311B;31A8:3128;31A9:311A;31AA:3127;31AB:3128;31AE:311E;31'
    'AF:3120;31B3:3127;31B4:3106;31B5:310A;31B6:310E;31B7:310F;31F0:304F;31'
    'F1:3057;31F2:3059;31F3:3068;31F4:306C;31F5:306F;31F6:3072;31F7:3075;31'
    'F8:3078;31F9:307B;31FA:3080;31FB:3089;31FC:308A;31FD:308B;31FE:308C;31'
    'FF:308D;3244;3245;3246;3247;3280;3281;3282;3283;3284;3285;3286;3287;32'
    '88;3289;328A;328B;328C;328D;328E;328F;3290;3291;3292;3293;3294;3295;32'
    '96;3297;3298;3299;329A;329B;329C;329D;329E;329F;32A0;32A1;32A2;32A3;32'
    'A4;32A5;32A6;32A7;32A8;32A9;32AA;32AB;32AC;32AD;32AE;32AF;32B0;A620;A6'
    '21;A622;A623;A624;A625;A626;A627;A628;A629;A641;A643;A645;A647;A649;A6'
    '4B;A64D;A64F;A651;A653;A655;A657;A659;A65B;A65D;A65F;A661;A663;A665;A6'
    '67;A669;A66B;A66D;A66F;A674;A675;A676;A677;A678;A679;A67A;A67B;A67C;A6'
    '7D;A681;A683;A685;A687;A689;A68B;A68D;A68F;A691;A693;A695;A697;A699;A6'
    '9B;A69C;A69D;A69E;A69F;A6E6;A6E7;A6E8;A6E9;A6EA;A6EB;A6EC;A6ED;A6EE;A6'
    'EF;A6F0;A6F1;A723;A725;A727;A729;A72B;A72D;A72F;A733;A735;A737;A739;A7'
    '3B;A73D;A73F;A741;A743;A745;A747;A749;A74B;A74D;A74F;A751;A753;A755;A7'
    '57;A759;A75B;A75D;A75F;A761;A763;A765;A767;A769;A76B;A76D;A76F;A770;A7'
    '7A;A77C;A77D;A77F;A781;A783;A785;A787;A78C;A78D;A791;A793;A797;A799;A7'
    '9B;A79D;A79F;A7A1;A7A3;A7A5;A7A7;A7A9;A7AA;A7AB;A7AC;A7AD;A7AE;A7B0;A7'
    'B1;A7B2;A7B5;A7B7;A7B9;A7BB;A7BD;A7BF;A7C1;A7C3;A7C4;A7C5;A7C6;A7C8;A7'
    'CA;A7D1;A7D7;A7D9;A7F2;A7F3;A7F4;A7F6;A7F8;A7F9;A806;A82C;A8C4;A8D0;A8'
    'D1;A8D2;A8D3;A8D4;A8D5;A8D6;A8D7;A8D8;A8D9;A8E0;A8E1;A8E2;A8E3;A8E4;A8'
    'E5;A8E6;A8E7;A8E8;A8E9;A8EA;A8EB;A8EC;A8ED;A8EE;A8EF;A8F0;A8F1;A900;A9'
    '01;A902;A903;A904;A905;A906;A907;A908;A909;A92B;A92C;A92D;A9B3;A9D0;A9'
    'D1;A9D2;A9D3;A9D4;A9D5;A9D6;A9D7;A9D8;A9D9;A9F0;A9F1;A9F2;A9F3;A9F4;A9'
    'F5;A9F6;A9F7;A9F8;A9F9;AA50;AA51;AA52;AA53;AA54;AA55;AA56;AA57;AA58;AA'
    '59;AAB0;AAB2;AAB3;AAB4;AAB7;AAB8;AABE;AABF;AAC1;AAF6;AB53;AB5C;AB5D;AB'
    '5E;AB5F;AB69;AB70;AB71;AB72;AB73;AB74;AB75;AB76;AB77;AB78;AB79;AB7A;AB'
    '7B;AB7C;AB7D;AB7E;AB7F;AB80;AB81;AB82;AB83;AB84;AB85;AB86;AB87;AB88;AB'
    '89;AB8A;AB8B;AB8C;AB8D;AB8E;AB8F;AB90;AB91;AB92;AB93;AB94;AB95;AB96;AB'
    '97;AB98;AB99;AB9A;AB9B;AB9C;AB9D;AB9E;AB9F;ABA0;ABA1;ABA2;ABA3;ABA4;AB'
    'A5;ABA6;ABA7;ABA8;ABA9;ABAA;ABAB;ABAC;ABAD;ABAE;ABAF;ABB0;ABB1;ABB2;AB'
    'B3;ABB4;ABB5;ABB6;ABB7;ABB8;ABB9;ABBA;ABBB;ABBC;ABBD;ABBE;ABBF;ABED;AB'
    'F0;ABF1;ABF2;ABF3;ABF4;ABF5;ABF6;ABF7;ABF8;ABF9;FB1F:5D9.5D9;FB24:5DA;'
    'FB3B:5DA;FB3E:5DD;FB40:5DF;FB44:5E3;FB46:5E5;FB4D:5DA;FB4E:5E3;FC5E:;F'
    'C5F:;FC60:;FC61:;FC62:;FC63:;FCF2:;FCF3:;FCF4:;FE00:;FE01:;FE02:;FE03:'
    ';FE04:;FE05:;FE06:;FE07:;FE08:;FE09:;FE0A:;FE0B:;FE0C:;FE0D:;FE0E:;FE0'
    'F:;FE10;FE11;FE12;FE13;FE14;FE15;FE16;FE17;FE18;FE24;FE25;FE26;FE27;FE'
    '28;FE29;FE2A;FE2B;FE2C;FE2D;FE2E;FE2F;FE49:203E;FE4A:203E;FE4B:203E;FE'
    '4C:203E;FE70:;FE71:;FE72:;FE73:;FE74:;FE76:;FE77:;FE78:;FE79:;FE7A:;FE'
    '7B:;FE7C:;FE7D:;FE7E:;FE7F:;FE81:622;FE82:622;FE83:623;FE84:623;FE85:6'
    '24;FE86:624;FE87:625;FE88:625;FE89:626;FE8A:626;FE8B:626;FE8C:626;FEFF'
    ':;FFE3:AF;FFF9:;FFFA:;FFFB:'
)
# GEN-END


@functools.lru_cache(maxsize=1)
def _delta_map() -> dict[int, str]:
    out: dict[int, str] = {}
    if not _U_DELTAS:
        return out
    for part in _U_DELTAS.split(";"):
        k, sep, v = part.partition(":")
        r = int(k, 16)
        if not sep:  # bare rune: identity delta (post-4.0 case pairs)
            out[r] = chr(r)
        else:
            out[r] = (
                "".join(chr(int(h, 16)) for h in v.split(".")) if v else ""
            )
    return out


def unicode_ci_rep(r: int) -> str:
    """Canonical representative string of BMP rune ``r`` (deltas
    applied) — the unit the SQL key expression reproduces."""
    d = _delta_map()
    if r in d:
        return d[r]
    return _predict(r)


@functools.lru_cache(maxsize=1)
def _sql_pieces() -> tuple[str, str, str, tuple[tuple[str, str], ...]]:
    """(delete_class, translate_from, translate_to, expansions) for the
    key expression, derived over the full BMP."""
    deletes: list[int] = []
    frm: list[str] = []
    to: list[str] = []
    expansions: list[tuple[str, str]] = []
    for r in range(0x10000):
        if 0xD800 <= r <= 0xDFFF:
            continue
        v = unicode_ci_rep(r)
        if v == chr(r):
            continue
        if v == "":
            deletes.append(r)
        elif len(v) == 1:
            frm.append(chr(r))
            to.append(v)
        else:
            expansions.append((chr(r), v))
    # compress deletes into regex ranges
    ranges: list[tuple[int, int]] = []
    for r in sorted(deletes):
        if ranges and r == ranges[-1][1] + 1:
            ranges[-1] = (ranges[-1][0], r)
        else:
            ranges.append((r, r))
    cls = "".join(
        f"\\\\x{{{a:X}}}" if a == b else f"\\\\x{{{a:X}}}-\\\\x{{{b:X}}}"
        for a, b in ranges
    )
    return cls, "".join(frm), "".join(to), tuple(expansions)


def _lit(s: str) -> str:
    """Single-quoted Spark SQL string literal (backslash escapes are on
    by default; fullwidth ＇/＼ map to ASCII '/\\ so both need escaping)."""
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def unicode_ci_key_sql(operand: str, pad: bool = True) -> str:
    """SQL expression computing the unicode_ci sort/compare key of
    ``operand``.  Pure built-ins — JVM-side, no Python.  ``pad=False``
    skips the PAD SPACE rtrim (MySQL LIKE is NO PAD).

    The curated-expansion replace chain is gated behind one RLIKE over
    the expansion character class, so the common case (no ß/Œ/ligature/
    numeral in the value) costs a single regex scan instead of ~230
    string passes."""
    cls, frm, to, expansions = _sql_pieces()
    base = f"rtrim({operand})" if pad else operand
    # supplementary planes -> U+FFFD (reference: weight 0xFFFD)
    expr = (
        f"regexp_replace({base}, '[\\\\x{{10000}}-\\\\x{{10FFFF}}]', '�')"
    )
    expr = f"regexp_replace({expr}, '[{cls}]', '')"
    # A nested replace() chain blows the parser's complexity limit
    # (FAILED_TO_PARSE_TOO_COMPLEX at ~230 deep), so expansions go
    # through one constant-folded str_to_map + per-char transform.
    pairs = []
    for src_c, dst in expansions:
        assert not set(",>'\\") & set(src_c + dst), (src_c, dst)
        pairs.append(f"{src_c}>{dst}")
    m = f"str_to_map('{','.join(pairs)}', ',', '>')"
    exp_cls = "".join(f"\\\\x{{{ord(c):X}}}" for c, _ in expansions)
    chain = (
        f"array_join(transform(split({expr}, ''), "
        f"c -> coalesce(element_at({m}, c), c)), '')"
    )
    expr = (
        f"CASE WHEN {expr} RLIKE '[{exp_cls}]' THEN {chain} "
        f"ELSE {expr} END"
    )
    return f"translate({expr}, {_lit(frm)}, {_lit(to)})"


def register_unicode_ci(spark) -> None:
    """Register ``mysql_unicode_ci_key`` as a SQL scalar UDF (inlined
    JVM expression)."""
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION mysql_unicode_ci_key"
        "(s STRING) RETURNS STRING RETURN "
        + unicode_ci_key_sql("s")
    )
