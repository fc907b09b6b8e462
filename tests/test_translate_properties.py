"""Property-based tests (hypothesis) for the dialect translator — the layer
most exposed to adversarial input.  Invariants:

1. string literals pass through byte-identical, whatever they contain;
2. statements with no MySQL-isms are untouched;
3. rewrites preserve parenthesis balance.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from tidb_spark.sqlshim.translate import _split_segments, translate


def _code_parens(sql: str) -> tuple[int, int]:
    code = "".join(t for is_code, t in _split_segments(sql) if is_code)
    return code.count("("), code.count(")")

# Literal payloads that look like rewrite targets.
_payloads = st.sampled_from(
    [
        "DATE_FORMAT(x, %Y)",
        "LIMIT 1, 2",
        "a REGEXP b",
        "GROUP_CONCAT(x SEPARATOR ',')",
        "DATE_ADD(d, INTERVAL 1 DAY)",
        r"O\'Neil style -- escaped quote",
        "JSON_EXTRACT(j, $.a)",
        "plain text",
    ]
) | st.text(
    alphabet=st.characters(
        codec="ascii", exclude_characters="'\"\\`"
    ),
    max_size=30,
)

_idents = st.from_regex(r"[A-Za-z_][A-Za-z0-9_]{0,8}", fullmatch=True)


@given(payload=_payloads, col=_idents, tbl=_idents)
@settings(max_examples=200, deadline=None)
def test_string_literals_survive(payload, col, tbl):
    lit = "'" + payload + "'"
    sql = f"SELECT {col}, {lit} AS s FROM {tbl} WHERE {col} REGEXP {lit}"
    out = translate(sql)
    assert out.count(lit) == 2
    assert "RLIKE" in out  # the code-side REGEXP was rewritten


@given(col=_idents, tbl=_idents, n=st.integers(0, 10_000))
@settings(max_examples=100, deadline=None)
def test_plain_statements_untouched(col, tbl, n):
    sql = f"SELECT {col}, {n} FROM {tbl} WHERE {col} > {n} ORDER BY {col} LIMIT {n}"
    assert translate(sql) == sql


@given(payload=_payloads)
@settings(max_examples=200, deadline=None)
def test_paren_balance_preserved(payload):
    sql = (
        f"SELECT DATE_FORMAT(d, '%Y'), GROUP_CONCAT(x SEPARATOR '|'), "
        f"FIELD(a, 'x', '{payload}' ) FROM t LIMIT 3, 4"
    )
    out = translate(sql)
    opens, closes = _code_parens(out)
    assert opens == closes
