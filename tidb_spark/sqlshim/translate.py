"""MySQL-dialect → Spark SQL translation.

The reference accepts MySQL 5.7 SQL (parser/parser.y); Spark SQL already
covers most of the surface (backtick quoting, ``<=>``, ``DIV``, ``RLIKE``,
same core function names), so translation is a small set of targeted
rewrites rather than a full parser:

- ``LIMIT offset, count``          → ``LIMIT count OFFSET offset``
- ``expr REGEXP pat``              → ``expr RLIKE pat``
- ``DATE_ADD/SUB(x, INTERVAL n u)``→ ``(x + INTERVAL n u)`` / ``-``
- ``STR_TO_DATE(x, '%fmt')``       → ``to_timestamp(x, 'jvm-fmt')``
- ``DATE_FORMAT(x, '%fmt')``       → ``date_format(x, 'jvm-fmt')``
- ``GROUP_CONCAT([DISTINCT] x [ORDER BY x [ASC|DESC]] [SEPARATOR s])``
                                   → ``concat_ws(s, sort_array(collect_…))``
- ``JSON_EXTRACT(x, p)``           → ``get_json_object(x, p)``

Everything else (FIELD, MAKE_SET, EXPORT_SET, CONV, INET_*, JSON mutators)
ships as session-registered UDFs under their MySQL names — see
``register_shim_udfs`` — so those calls pass through untouched.

All rewrites are string-literal-aware: the statement is split into
code/string segments first and only code segments are rewritten.

Cited reference behavior: expression/builtin_time.go (DATE_ADD/STR_TO_DATE),
builtin_string.go (FIELD/ELT/MAKE_SET/EXPORT_SET), builtin_json.go
(JSON_* family), executor/aggfuncs/func_group_concat.go (GROUP_CONCAT).
"""

from __future__ import annotations

import re

from tidb_spark.functions.mysql import mysql_format_to_jvm

_STRING_RE = re.compile(r"('(?:[^'\\]|\\.)*')|(\"(?:[^\"\\]|\\.)*\")|(`[^`]*`)")


def _split_segments(sql: str) -> list[tuple[bool, str]]:
    """[(is_code, text), ...] — string/backtick literals kept verbatim."""
    out: list[tuple[bool, str]] = []
    last = 0
    for m in _STRING_RE.finditer(sql):
        if m.start() > last:
            out.append((True, sql[last : m.start()]))
        out.append((False, m.group(0)))
        last = m.end()
    if last < len(sql):
        out.append((True, sql[last:]))
    return out


def _map_code(sql: str, fn) -> str:
    return "".join(fn(t) if is_code else t for is_code, t in _split_segments(sql))


def _find_closing(sql: str, open_idx: int) -> int:
    """Index of the ')' matching sql[open_idx] == '(' (string-aware)."""
    depth = 0
    i = open_idx
    while i < len(sql):
        c = sql[i]
        if c == "'" or c == '"':
            m = _STRING_RE.match(sql, i)
            if m:
                i = m.end()
                continue
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth == 0:
                return i
        i += 1
    raise ValueError("unbalanced parentheses in SQL")


def _split_args(argstr: str) -> list[str]:
    """Split a function argument list on top-level commas (string-aware)."""
    args, depth, last, i = [], 0, 0, 0
    while i < len(argstr):
        c = argstr[i]
        if c == "'" or c == '"':
            m = _STRING_RE.match(argstr, i)
            if m:
                i = m.end()
                continue
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif c == "," and depth == 0:
            args.append(argstr[last:i].strip())
            last = i + 1
        i += 1
    tail = argstr[last:].strip()
    if tail:
        args.append(tail)
    return args


def _rewrite_calls(sql: str, name: str, builder) -> str:
    """Replace every ``name( args )`` call; ``builder(args: list[str]) ->
    str`` receives already-translated top-level args."""
    pat = re.compile(rf"\b{name}\s*\(", re.IGNORECASE)
    # Code spans of the (immutable) input: a candidate match counts only if
    # it starts inside one — checking a prefix instead would misclassify
    # matches inside string literals (the prefix's quote looks unterminated,
    # i.e. like code).
    spans: list[tuple[int, int]] = []
    off = 0
    for is_code, text in _split_segments(sql):
        if is_code:
            spans.append((off, off + len(text)))
        off += len(text)

    def _in_code(idx: int) -> bool:
        return any(a <= idx < b for a, b in spans)

    out: list[str] = []
    pos = 0
    while True:
        m = None
        for cand in pat.finditer(sql, pos):
            if _in_code(cand.start()):
                m = cand
                break
        if m is None:
            out.append(sql[pos:])
            return "".join(out)
        open_idx = sql.index("(", m.end() - 1)
        close_idx = _find_closing(sql, open_idx)
        # Recurse into args so nested same-name calls are handled; the
        # replacement itself is never rescanned (it may legitimately contain
        # the case-insensitive name, e.g. DATE_FORMAT → date_format).
        args = [
            _rewrite_calls(a, name, builder)
            for a in _split_args(sql[open_idx + 1 : close_idx])
        ]
        out.append(sql[pos : m.start()])
        out.append(builder(args))
        pos = close_idx + 1


def _limit_offset(code: str) -> str:
    return re.sub(
        r"\bLIMIT\s+(\d+)\s*,\s*(\d+)",
        r"LIMIT \2 OFFSET \1",
        code,
        flags=re.IGNORECASE,
    )


def _regexp_kw(code: str) -> str:
    return re.sub(r"\bREGEXP\b", "RLIKE", code, flags=re.IGNORECASE)


def _unquote(lit: str) -> str:
    return lit.strip()[1:-1]


def _date_addsub(args: list[str], sign: str) -> str:
    if len(args) != 2:
        raise ValueError("DATE_ADD/DATE_SUB expect (expr, INTERVAL n unit)")
    interval = args[1].strip()
    if not re.match(r"(?i)^INTERVAL\b", interval):
        interval = f"INTERVAL {interval} DAY"  # ADDDATE(d, n) day form
    return f"({args[0]} {sign} {interval})"


def _str_to_date(args: list[str]) -> str:
    fmt = mysql_format_to_jvm(_unquote(args[1]))
    fn = "to_timestamp" if any(x in fmt for x in ("HH", "mm", "ss", "H")) else "to_date"
    return f"{fn}({args[0]}, '{fmt}')"


def _date_format(args: list[str]) -> str:
    fmt = mysql_format_to_jvm(_unquote(args[1]))
    return f"date_format({args[0]}, '{fmt}')"


_GC_RE = re.compile(
    r"(?is)^\s*(DISTINCT\s+)?(.*?)(?:\s+ORDER\s+BY\s+(.*?)(\s+ASC|\s+DESC)?)?"
    r"(?:\s+SEPARATOR\s+('(?:[^'\\]|\\.)*'|\"(?:[^\"\\]|\\.)*\"))?\s*$"
)


def _group_concat(args: list[str]) -> str:
    """GROUP_CONCAT([DISTINCT] x [ORDER BY y [ASC|DESC]] [SEPARATOR s])
    (executor/aggfuncs/func_group_concat.go semantics).

    When the ORDER BY expression differs from the aggregated one, sorting
    the collected values by THEMSELVES would be wrong — we collect
    (order-key, value) structs, array_sort (asc; reversed for DESC), then
    project the value back out.  ``transform`` on the grouped array is an
    interpreted HOF, but group_concat outputs are bounded
    (group_concat_max_len in MySQL) so this is not a hot loop."""
    inner = ", ".join(args)  # GROUP_CONCAT takes one expr in our surface
    m = _GC_RE.match(inner)
    if not m:
        raise ValueError(f"unsupported GROUP_CONCAT form: {inner!r}")
    distinct, expr, order_expr, direction, sep = m.groups()
    sep_sql = sep if sep else "','"
    desc = bool(direction and direction.strip().upper() == "DESC")
    same_key = order_expr is None or order_expr.strip() == expr.strip()
    if not same_key:
        if distinct:
            # MySQL itself rejects DISTINCT with an ORDER BY expression that
            # is not in the argument list — mirror that instead of guessing.
            raise ValueError(
                "GROUP_CONCAT(DISTINCT x ORDER BY y) with y != x is "
                "unsupported (MySQL parity)"
            )
        sorted_structs = (
            f"array_sort(collect_list(struct({order_expr} AS _o, {expr} AS _v)))"
        )
        if desc:
            sorted_structs = f"reverse({sorted_structs})"
        return f"concat_ws({sep_sql}, transform({sorted_structs}, s -> s._v))"
    collect = f"collect_set({expr})" if distinct else f"collect_list({expr})"
    if order_expr is not None or distinct:
        # MySQL emits ORDER BY order; we additionally pin DISTINCT output to
        # sorted order for determinism (MySQL's is unspecified without
        # ORDER BY).
        asc = "false" if desc else "true"
        collect = f"sort_array({collect}, {asc})"
    return f"concat_ws({sep_sql}, {collect})"


def _field(args: list[str]) -> str:
    # FIELD(x, a, b, …) → 1-based index of x among the list, 0 if absent or
    # NULL (builtin_string.go); CASE's NULL-never-matches gives that free.
    whens = " ".join(
        f"WHEN {a} THEN {i + 1}" for i, a in enumerate(args[1:])
    )
    return f"(CASE {args[0]} {whens} ELSE 0 END)"


def _make_set(args: list[str]) -> str:
    # MAKE_SET(bits, s1, s2, …): comma-join strings whose bit is set;
    # concat_ws skips the NULLs from unset bits.
    parts = ", ".join(
        f"CASE WHEN ({args[0]} & {1 << i}) != 0 THEN {s} END"
        for i, s in enumerate(args[1:])
    )
    return f"concat_ws(',', {parts})"


_QUOTED = re.compile(r"^'(?:[^'\\]|\\.)*'$")


def _json_object(args: list[str]) -> str:
    keys, vals = args[0::2], args[1::2]
    if all(_QUOTED.match(k.strip()) for k in keys):
        pairs = ", ".join(f"{k}, {v}" for k, v in zip(keys, vals))
        return f"to_json(named_struct({pairs}))"
    pairs = ", ".join(
        f"CAST({k} AS STRING), {v}" for k, v in zip(keys, vals)
    )
    return f"to_json(map({pairs}))"


def _json_array(args: list[str]) -> str:
    return f"to_json(array({', '.join(args)}))"


def _inet_aton(args: list[str]) -> str:
    x = args[0]
    parts = " + ".join(
        f"CAST(element_at(split({x}, '\\\\.'), {i + 1}) AS BIGINT) * {mult}"
        if mult > 1
        else f"CAST(element_at(split({x}, '\\\\.'), {i + 1}) AS BIGINT)"
        for i, mult in enumerate((16777216, 65536, 256, 1))
    )
    return f"({parts})"


def _inet_ntoa(args: list[str]) -> str:
    n = f"CAST({args[0]} AS BIGINT)"
    octets = ", ".join(
        f"CAST((shiftright({n}, {s}) & 255) AS STRING)" for s in (24, 16, 8, 0)
    )
    return f"concat_ws('.', {octets})"


def _export_set(args: list[str]) -> str:
    # EXPORT_SET(bits, on, off[, sep[, n_bits]]) unrolled to n_bits CASE
    # terms — a wide but whole-stage-codegen expression, vs the previous
    # per-row Python UDF (the JVM cliff for a 100 TB scan).  shiftright is
    # arithmetic, so (bits >> 63) & 1 still extracts the top bit correctly.
    bits, on, off = args[0], args[1], args[2]
    sep = args[3] if len(args) > 3 else "','"
    n_bits = int(args[4]) if len(args) > 4 else 64
    b = f"CAST({bits} AS BIGINT)"
    terms = ", ".join(
        f"CASE WHEN (shiftright({b}, {i}) & 1) = 1 THEN {on} ELSE {off} END"
        for i in range(n_bits)
    )
    return f"concat_ws({sep}, {terms})"


def _json_length(args: list[str]) -> str:
    # MySQL JSON_LENGTH: array → #elements, object → #keys, scalar → 1
    # (builtin_json.go).  Composed from natives so it stays JVM-side.
    x = args[0]
    return (
        f"coalesce(json_array_length({x}), size(json_object_keys({x})), "
        f"CASE WHEN {x} IS NULL THEN CAST(NULL AS INT) ELSE 1 END)"
    )


def _json_keys(args: list[str]) -> str:
    # Deterministically sorted (MySQL leaves object-key order unspecified);
    # non-objects yield NULL via json_object_keys.
    return f"to_json(sort_array(json_object_keys({args[0]})))"


def translate(sql: str) -> str:
    """Translate one MySQL-dialect statement to Spark SQL."""
    sql = _map_code(sql, _limit_offset)
    sql = _map_code(sql, _regexp_kw)
    sql = _rewrite_calls(sql, "DATE_ADD", lambda a: _date_addsub(a, "+"))
    sql = _rewrite_calls(sql, "ADDDATE", lambda a: _date_addsub(a, "+"))
    sql = _rewrite_calls(sql, "DATE_SUB", lambda a: _date_addsub(a, "-"))
    sql = _rewrite_calls(sql, "SUBDATE", lambda a: _date_addsub(a, "-"))
    sql = _rewrite_calls(sql, "STR_TO_DATE", _str_to_date)
    sql = _rewrite_calls(sql, "DATE_FORMAT", _date_format)
    sql = _rewrite_calls(sql, "GROUP_CONCAT", _group_concat)
    sql = _rewrite_calls(
        sql, "JSON_EXTRACT", lambda a: f"get_json_object({a[0]}, {a[1]})"
    )
    sql = _rewrite_calls(sql, "FIELD", _field)
    sql = _rewrite_calls(sql, "MAKE_SET", _make_set)
    sql = _rewrite_calls(sql, "JSON_OBJECT", _json_object)
    sql = _rewrite_calls(sql, "JSON_ARRAY", _json_array)
    # Bit-arithmetic / JSON-read shims with pure-native lowerings: keep the
    # SQL surface on the JVM instead of falling off to the Python UDFs
    # (which remain registered for direct un-translated use).
    sql = _rewrite_calls(sql, "INET_ATON", _inet_aton)
    sql = _rewrite_calls(sql, "INET_NTOA", _inet_ntoa)
    sql = _rewrite_calls(sql, "EXPORT_SET", _export_set)
    sql = _rewrite_calls(sql, "JSON_LENGTH", _json_length)
    sql = _rewrite_calls(sql, "JSON_KEYS", _json_keys)
    return sql
