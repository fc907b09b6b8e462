"""``WITH RECURSIVE name AS (seed UNION step)`` — the UNION-DISTINCT form.

Spark 4 executes ``WITH RECURSIVE ... UNION ALL`` natively, but rejects
the distinct form (UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE).  MySQL and the
reference support both — ``executor/cte.go`` dedups produced rows in a
hashtable, exactly UNION-DISTINCT fixpoint semantics — so the engine
lowers the distinct form onto :func:`tidb_spark.operators.cte.
recursive_cte` (same semantics: rows whose full tuple appeared in any
earlier round are dropped; recursion ends when a round adds nothing).

Parsing is deliberately narrow and loud: one leading recursive CTE,
split at the LAST top-level distinct UNION inside its body (earlier
top-level set ops stay inside the seed and run natively).  The UNION ALL
form returns ``None`` here and flows to Spark untouched.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

_HEAD_RE = re.compile(
    r"(?is)^\s*WITH\s+RECURSIVE\s+`?(?P<name>\w+)`?\s*"
    r"(?:\((?P<cols>[^)]*)\))?\s*AS\s*\("
)
_STRING_RE = re.compile(r"('(?:[^'\\]|\\.)*')|(\"(?:[^\"\\]|\\.)*\")|(`[^`]*`)")
_UNION_RE = re.compile(r"(?is)\bUNION\b(\s+(?:ALL|DISTINCT)\b)?")


@dataclass
class RecursiveCte:
    name: str
    cols: list[str] | None
    seed_sql: str
    step_sql: str
    rest_sql: str  # starts with ',' (more CTEs) or the main statement


def _balanced_end(sql: str, open_idx: int) -> int:
    depth, i = 0, open_idx
    while i < len(sql):
        m = _STRING_RE.match(sql, i)
        if m:
            i = m.end()
            continue
        c = sql[i]
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth == 0:
                return i
        i += 1
    raise ValueError("WITH RECURSIVE: unbalanced parentheses")


def _last_distinct_union(body: str) -> tuple[int, int] | None:
    """(start, end) of the last top-level UNION [DISTINCT] (not ALL)."""
    depth, i, hit = 0, 0, None
    while i < len(body):
        m = _STRING_RE.match(body, i)
        if m:
            i = m.end()
            continue
        c = body[i]
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif depth == 0 and c in "Uu":
            um = _UNION_RE.match(body, i)
            if um:
                mod = (um.group(1) or "").strip().upper()
                if mod != "ALL":
                    hit = (um.start(), um.end())
                i = um.end()
                continue
        i += 1
    return hit


def replace_name(sql: str, name: str, view: str) -> str:
    """Replace table references to ``name`` with ``view`` (string-aware,
    backtick-aware, word-bounded)."""
    out = []
    last = 0
    pat = re.compile(rf"(?is)(?<![\w.])`?{re.escape(name)}`?(?![\w])")
    for m in _STRING_RE.finditer(sql):
        out.append(pat.sub(view, sql[last : m.start()]))
        out.append(m.group(0))
        last = m.end()
    out.append(pat.sub(view, sql[last:]))
    return "".join(out)


def parse(query: str) -> RecursiveCte | None:
    hm = _HEAD_RE.match(query)
    if hm is None:
        return None
    body_open = hm.end() - 1
    body_close = _balanced_end(query, body_open)
    body = query[body_open + 1 : body_close]
    split = _last_distinct_union(body)
    if split is None:
        return None  # UNION ALL form — Spark executes it natively
    seed_sql = body[: split[0]].strip()
    step_sql = body[split[1] :].strip()
    name = hm.group("name")
    if re.search(rf"(?is)(?<![\w.])`?{re.escape(name)}`?(?![\w])", seed_sql):
        raise ValueError(
            f"WITH RECURSIVE: seed member may not reference {name!r} "
            "(the reference rejects this too)"
        )
    cols = (
        [c.strip().strip("`") for c in hm.group("cols").split(",")]
        if hm.group("cols")
        else None
    )
    return RecursiveCte(
        name=name,
        cols=cols,
        seed_sql=seed_sql,
        step_sql=step_sql,
        rest_sql=query[body_close + 1 :].strip(),
    )
