"""JSON_TABLE(...) lowering — executed extension.

MySQL 8.0.4 added JSON_TABLE; the reference's grammar has no production
for it (parser/parser.y — no JSON_TABLE rule, checked against the full
table-factor alternatives at parser.y:8726), so this is the same
executed-extension posture as GROUPS frames / ALL SHORTEST / LATERAL:
the MySQL-dialect surface accepts it and the engine lowers it to native
Spark relational algebra.

Lowering:

    FROM t, JSON_TABLE(t.j, '$.items[*]' COLUMNS (
        a INT PATH '$.a',
        rn FOR ORDINALITY)) AS jt

becomes a correlated LATERAL derived table over ``posexplode_outer`` —
Catalyst plans it as a generator join, one pass, no UDFs:

    FROM t, LATERAL (
      SELECT CAST(get_json_object(__e, '$.a') AS INT) AS a,
             CAST(__pos + 1 AS BIGINT) AS rn
      FROM (SELECT posexplode_outer(from_json(
              get_json_object(t.j, '$.items'), 'array<string>'))
            AS (__pos, __e))
    ) AS jt

``from_json(col, 'array<string>')`` splits a JSON array into raw element
strings whatever the element type (object/array/scalar), so each PATH is
evaluated by ``get_json_object`` against the element — full JSON-path
support per column, one JSON parse per element.

Supported column forms: ``name TYPE PATH '<json path>'`` and ``name FOR
ORDINALITY``.  NESTED PATH / EXISTS PATH / DEFAULT ... ON EMPTY|ERROR
raise (loud parity error, never silent wrong answers).  The row path
must be ``'$[*]'`` or ``'$<object path>[*]'`` — element iteration, which
is what JSON_TABLE is for; a non-``[*]`` row path raises.
"""

from __future__ import annotations

import re

_JT_RE = re.compile(r"(?is)\bJSON_TABLE\s*\(")
_STRING_RE = re.compile(r"'(?:[^'\\]|\\.|'')*'")

# MySQL column type -> Spark cast target.
_TYPE_MAP: dict[str, str] = {
    "TINYINT": "INT",
    "SMALLINT": "INT",
    "MEDIUMINT": "INT",
    "INT": "INT",
    "INTEGER": "INT",
    "BIGINT": "BIGINT",
    "FLOAT": "FLOAT",
    "DOUBLE": "DOUBLE",
    "REAL": "DOUBLE",
    "DATE": "DATE",
    "DATETIME": "TIMESTAMP_NTZ",
    "TIMESTAMP": "TIMESTAMP_NTZ",
    "JSON": "STRING",
    "TEXT": "STRING",
    "BOOLEAN": "BOOLEAN",
}


def _spark_type(mysql_type: str) -> str:
    t = mysql_type.strip()
    m = re.match(r"(?is)^(VARCHAR|CHAR)\s*\(\s*\d+\s*\)$", t)
    if m:
        return "STRING"
    m = re.match(r"(?is)^DECIMAL\s*\((\s*\d+\s*,\s*\d+\s*)\)$", t)
    if m:
        return f"DECIMAL({m.group(1)})"
    m = re.match(r"(?is)^DECIMAL\s*\(\s*(\d+)\s*\)$", t)
    if m:
        return f"DECIMAL({m.group(1)},0)"
    up = re.sub(r"(?is)\s+UNSIGNED$", "", t.upper()).strip()
    mapped = _TYPE_MAP.get(up)
    if mapped is None:
        raise ValueError(f"JSON_TABLE: unsupported column type {mysql_type!r}")
    return mapped


def _split_top_level(s: str, sep: str = ",") -> list[str]:
    """Split on `sep` at paren depth 0, respecting single-quoted strings."""
    out, depth, start, i = [], 0, 0, 0
    while i < len(s):
        ch = s[i]
        if ch == "'":
            m = _STRING_RE.match(s, i)
            i = m.end() if m else i + 1
            continue
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == sep and depth == 0:
            out.append(s[start:i])
            start = i + 1
        i += 1
    out.append(s[start:])
    return out


def _balanced_span(query: str, open_at: int) -> int:
    """Index just past the ')' matching the '(' at ``open_at``."""
    depth, i = 0, open_at
    while i < len(query):
        ch = query[i]
        if ch == "'":
            m = _STRING_RE.match(query, i)
            i = m.end() if m else i + 1
            continue
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                return i + 1
        i += 1
    raise ValueError("JSON_TABLE: unbalanced parentheses")


def _lower_columns(cols_src: str) -> list[str]:
    exprs: list[str] = []
    for item in _split_top_level(cols_src):
        item = item.strip()
        if not item:
            continue
        if re.match(r"(?is)^NESTED\b", item):
            raise ValueError(
                "JSON_TABLE: NESTED PATH columns are not supported "
                "(flatten with multiple JSON_TABLE calls or explode the "
                "inner array in a second pass)"
            )
        m = re.match(r"(?is)^`?(\w+)`?\s+FOR\s+ORDINALITY$", item)
        if m:
            exprs.append(f"CAST(__pos + 1 AS BIGINT) AS {m.group(1)}")
            continue
        m = re.match(
            r"(?is)^`?(?P<name>\w+)`?\s+(?P<type>[A-Za-z]+(?:\s*\([^)]*\))?"
            r"(?:\s+UNSIGNED)?)\s+"
            r"(?P<exists>EXISTS\s+)?PATH\s+(?P<path>'(?:[^'\\]|\\.)*')"
            r"(?P<onx>.*)$",
            item,
        )
        if not m:
            raise ValueError(f"JSON_TABLE: cannot parse column {item!r}")
        if m.group("exists"):
            raise ValueError("JSON_TABLE: EXISTS PATH is not supported")
        if m.group("onx").strip():
            raise ValueError(
                "JSON_TABLE: DEFAULT/ERROR ON EMPTY|ERROR clauses are not "
                "supported (NULL-on-missing is the only behavior)"
            )
        cast_t = _spark_type(m.group("type"))
        exprs.append(
            f"CAST(get_json_object(__e, {m.group('path')}) AS {cast_t}) "
            f"AS {m.group('name')}"
        )
    if not exprs:
        raise ValueError("JSON_TABLE: empty COLUMNS clause")
    return exprs


def lower(query: str) -> str:
    """Rewrite every top-level JSON_TABLE(...) table factor in ``query``."""
    while True:
        m = _JT_RE.search(query)
        if m is None:
            return query
        open_at = query.index("(", m.end() - 1)
        end = _balanced_span(query, open_at)
        args = query[open_at + 1 : end - 1]
        parts = _split_top_level(args)
        if len(parts) != 2:
            raise ValueError(
                "JSON_TABLE expects (expr, 'row path' COLUMNS (...))"
            )
        src_expr = parts[0].strip()
        pm = re.match(
            r"(?is)^\s*(?P<path>'(?:[^'\\]|\\.)*')\s+COLUMNS\s*\(",
            parts[1],
        )
        if not pm:
            raise ValueError(
                "JSON_TABLE: second argument must be 'row path' COLUMNS (...)"
            )
        cols_open = parts[1].index("(", pm.end() - 1)
        cols_end = _balanced_span(parts[1], cols_open)
        if parts[1][cols_end:].strip():
            raise ValueError(
                "JSON_TABLE: trailing tokens after COLUMNS(...) are not "
                "supported"
            )
        row_path = pm.group("path")[1:-1]
        if not row_path.endswith("[*]"):
            raise ValueError(
                "JSON_TABLE: row path must iterate an array ('...[*]')"
            )
        root = row_path[:-3]
        if root in ("$", ""):
            arr_src = src_expr
        else:
            arr_src = f"get_json_object({src_expr}, '{root}')"
        col_exprs = _lower_columns(parts[1][cols_open + 1 : cols_end - 1])

        am = re.match(r"(?is)\s*(?:AS\s+)?`?(\w+)`?", query[end:])
        if not am:
            raise ValueError("JSON_TABLE: an alias is required (AS name)")
        alias = am.group(1)
        after = end + am.end()

        replacement = (
            "LATERAL (SELECT "
            + ", ".join(col_exprs)
            + " FROM (SELECT posexplode_outer(from_json("
            + arr_src
            + ", 'array<string>')) AS (__pos, __e))) AS "
            + alias
        )
        query = query[: m.start()] + replacement + query[after:]
