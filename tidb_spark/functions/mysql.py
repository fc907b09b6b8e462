"""MySQL-dialect scalar function shims (SURVEY §2.10).

The reference registers ~270 builtins in one map
(``expression/builtin.go:573``); ~85% map 1:1 onto
``pyspark.sql.functions`` / Spark SQL.  This module supplies the gap list as
Column helpers composed from JVM-side built-ins — no Python row UDFs, so
everything stays inside whole-stage codegen:

- control flow: IF / IFNULL (builtin_control.go)
- string: ELT, FIELD, MAKE_SET, EXPORT_SET (builtin_string.go)
- date/time: STR_TO_DATE, MySQL DATE_FORMAT (% format translation,
  builtin_time.go)
- misc: INET_ATON / INET_NTOA (builtin_miscellaneous.go)
- arithmetic: DIV (integer division), MySQL-style TRUNCATE
  (builtin_arithmetic.go, builtin_math.go)

Already native in Spark (no shim needed): SUBSTRING_INDEX, CONV, CRC32,
BIT_COUNT, GREATEST/LEAST, COALESCE, NULLIF, <=> (eqNullSafe), LIKE/REGEXP,
MD5/SHA1/SHA2, and the JSON read family (get_json_object/json_tuple).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

ColumnOrName = Column | str


def _col(c: ColumnOrName) -> Column:
    return F.col(c) if isinstance(c, str) else c


# -- control flow -----------------------------------------------------------

def if_(cond: Column, then, otherwise) -> Column:
    """MySQL IF(cond, a, b)."""
    return F.when(cond, then).otherwise(otherwise)


def ifnull(a: ColumnOrName, b) -> Column:
    """MySQL IFNULL(a, b)."""
    return F.coalesce(_col(a), b if isinstance(b, Column) else F.lit(b))


# -- string -----------------------------------------------------------------

def elt(index: ColumnOrName, *args) -> Column:
    """MySQL ELT(n, s1, s2, ...): the n-th string, NULL out of range."""
    arr = F.array(*[a if isinstance(a, Column) else F.lit(a) for a in args])
    idx = _col(index) if isinstance(index, (Column, str)) else F.lit(index)
    return F.when(
        (idx >= 1) & (idx <= len(args)), F.element_at(arr, idx.cast("int"))
    )


def field(value: ColumnOrName, *args) -> Column:
    """MySQL FIELD(v, s1, s2, ...): 1-based position of v, 0 if absent."""
    arr = F.array(*[a if isinstance(a, Column) else F.lit(a) for a in args])
    return F.coalesce(F.array_position(arr, _col(value)), F.lit(0)).cast("long")


def make_set(bits: ColumnOrName, *args) -> Column:
    """MySQL MAKE_SET(bits, s1, s2, ...): comma-join strings whose bit is
    set.  Composed from array + filter — stays JVM-side."""
    bits_col = _col(bits).cast("long")
    parts = [
        F.when(
            bits_col.bitwiseAND(F.lit(1 << i)) != 0,
            a if isinstance(a, Column) else F.lit(a),
        )
        for i, a in enumerate(args)
    ]
    picked = F.filter(F.array(*parts), lambda s: s.isNotNull())
    return F.concat_ws(",", picked)


def export_set(
    bits: ColumnOrName, on, off, sep: str = ",", n_bits: int = 64
) -> Column:
    """MySQL EXPORT_SET(bits, on, off[, sep[, n]])."""
    bits_col = _col(bits).cast("long")
    on_col = on if isinstance(on, Column) else F.lit(on)
    off_col = off if isinstance(off, Column) else F.lit(off)
    parts = F.array(
        *[
            F.when(bits_col.bitwiseAND(F.lit(1 << i)) != 0, on_col).otherwise(off_col)
            for i in range(n_bits)
        ]
    )
    return F.concat_ws(sep, parts)


# -- date/time --------------------------------------------------------------

# MySQL '%'-format → JVM DateTimeFormatter pattern (builtin_time.go's
# format specifiers; only tokens without a JVM equivalent are excluded).
_MYSQL_TIME_FORMAT = {
    "%Y": "yyyy",
    "%y": "yy",
    "%m": "MM",
    "%c": "M",
    "%d": "dd",
    "%e": "d",
    "%H": "HH",
    "%k": "H",
    "%h": "hh",
    "%I": "hh",
    "%i": "mm",
    "%s": "ss",
    "%S": "ss",
    "%f": "SSSSSS",
    "%p": "a",
    "%b": "MMM",
    "%M": "MMMM",
    "%a": "EEE",
    "%W": "EEEE",
    "%j": "DDD",
    "%T": "HH:mm:ss",
    "%%": "%",
}


def mysql_format_to_jvm(fmt: str) -> str:
    out: list[str] = []
    i = 0
    while i < len(fmt):
        if fmt[i] == "%" and i + 1 < len(fmt):
            token = fmt[i : i + 2]
            if token not in _MYSQL_TIME_FORMAT:
                raise ValueError(f"unsupported MySQL format token {token!r}")
            out.append(_MYSQL_TIME_FORMAT[token])
            i += 2
        else:
            # Literal characters: quote letters so DateTimeFormatter doesn't
            # interpret them.
            ch = fmt[i]
            out.append(f"'{ch}'" if ch.isalpha() else ch)
            i += 1
    return "".join(out)


def str_to_date(value: ColumnOrName, mysql_fmt: str) -> Column:
    """MySQL STR_TO_DATE → to_timestamp with a translated pattern."""
    return F.to_timestamp(_col(value), mysql_format_to_jvm(mysql_fmt))


def date_format_mysql(value: ColumnOrName, mysql_fmt: str) -> Column:
    """MySQL DATE_FORMAT → date_format with a translated pattern."""
    return F.date_format(_col(value), mysql_format_to_jvm(mysql_fmt))


# -- misc -------------------------------------------------------------------

def inet_aton(ip: ColumnOrName) -> Column:
    """MySQL INET_ATON('a.b.c.d') → 32-bit integer."""
    parts = F.split(_col(ip), r"\.")
    return (
        F.element_at(parts, 1).cast("long") * 16777216
        + F.element_at(parts, 2).cast("long") * 65536
        + F.element_at(parts, 3).cast("long") * 256
        + F.element_at(parts, 4).cast("long")
    )


def inet_ntoa(n: ColumnOrName) -> Column:
    """MySQL INET_NTOA(int) → 'a.b.c.d'."""
    num = _col(n).cast("long")
    return F.concat_ws(
        ".",
        (num.bitwiseAND(F.lit(0xFF000000)) / 16777216).cast("long").cast("string"),
        (num.bitwiseAND(F.lit(0x00FF0000)) / 65536).cast("long").cast("string"),
        (num.bitwiseAND(F.lit(0x0000FF00)) / 256).cast("long").cast("string"),
        num.bitwiseAND(F.lit(0x000000FF)).cast("string"),
    )


# -- arithmetic -------------------------------------------------------------

def div(a: ColumnOrName, b: ColumnOrName) -> Column:
    """MySQL DIV: integer division (builtin_arithmetic.go)."""
    return F.try_divide(_col(a).cast("long"), _col(b).cast("long")).cast("long")


def truncate(x: ColumnOrName, d: int) -> Column:
    """MySQL TRUNCATE(x, d): truncate toward zero at d decimals, exact via
    DECIMAL scaling (MySQL semantics, builtin_math.go)."""
    scaled = _col(x).cast("decimal(30,15)") * F.lit(10**d)
    toward_zero = F.when(scaled >= 0, F.floor(scaled)).otherwise(F.ceil(scaled))
    return (toward_zero.cast("decimal(30,15)") / F.lit(10**d)).cast("double")


def _sql(c: ColumnOrName) -> str:
    if isinstance(c, str):
        return c
    raise TypeError("div() shim takes column names (SQL fragment)")
