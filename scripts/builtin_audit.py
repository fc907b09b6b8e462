"""Scalar-builtin registry diff audit.

The reference registers ~279 scalar builtins in one map
(``expression/builtin.go:573`` ``var funcs``); each key is an ``ast.Name``
constant whose SQL spelling lives in ``parser/ast/functions.go``.  This
script diffs that registry against what this repo covers:

  * **spark-native** — the name resolves in Spark's own FunctionRegistry
    (``spark.catalog.functionExists``), so untranslated SQL already works;
  * **shim-udf** — registered by ``tidb_spark.functions.mysql``
    (``register_shim_udfs`` / ``register_compress_udfs``);
  * **translated** — rewritten to native Spark SQL by
    ``tidb_spark.sqlshim.translate`` (``_rewrite_calls`` targets plus the
    regex-special forms);
  * **operator** — not a callable function in MySQL either (``=``, ``AND``,
    ``CASE`` …): parser-internal names that Spark SQL expresses as syntax.

Everything else is **uncovered** — the honest gap list.  Output is the
``COVERAGE_BUILTINS.md`` table checked into the repo root.

Run:  python scripts/builtin_audit.py  (needs /root/reference present)
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

REF = Path("/root/reference")
REPO = Path(__file__).resolve().parent.parent
# Importable when run as `python scripts/builtin_audit.py` from anywhere
# (python puts the SCRIPT's dir on sys.path, not the repo root).
sys.path.insert(0, str(REPO))

# Parser-internal registry keys that are SQL *syntax*, not callable
# functions: Spark covers them as operators/expressions, and MySQL users
# cannot invoke them by these names either.
OPERATORS = {
    "and", "or", "xor", "not", "bitand", "bitor", "bitxor", "bitneg",
    "leftshift", "rightshift", "plus", "minus", "mul", "div", "mod",
    "intdiv", "eq", "ne", "ge", "gt", "le", "lt", "unaryminus",
    "case", "in", "like", "regexp", "between", "istruth", "isfalsity",
    "isnull", "rowfunc", "setvar", "getvar", "values", "cast",
    "nulleq",  # <=> : translated to Spark's <=> by the dialect shim
    "ilike", "getparam",
    "istrue", "isfalse", "istrue_with_null",  # IS TRUE / IS FALSE syntax
    "row",  # ROW(...) constructor → Spark struct/tuple syntax
}

# Registry keys whose SQL spelling differs from the name users type.
SQL_NAME_ALIASES = {"char_func": "char", "insert_func": "insert",
                    "password_func": "password"}

# Names Spark has under a different spelling (ours -> Spark native name),
# or that the translator lowers to a different-named native composition.
ALIASED_NATIVE = {
    "charlength": "char_length",
    "character_length": "char_length",
    "lcase": "lower",
    "ucase": "upper",
    "row_count": None,  # session-state, exposed via Engine.sql() result
    "strcmp": None,     # translated: CASE sign(comparison)
}

# Spark SQL parses these as keyword-syntax functions; they don't appear in
# the FunctionRegistry but `SELECT f(...)` works verbatim.
SQL_KEYWORD_NATIVE = {"timestampadd", "timestampdiff"}

# Deliberately unimplemented, with the reason a reference user would get.
# These are not data-plane functions: they exist for the MySQL wire
# protocol, single-server admin, or deprecated security surface — none has
# coherent semantics in a distributed Spark job.
OUT_OF_SCOPE = {
    "benchmark": "single-connection timing loop",
    "sleep": "per-connection stall; meaningless across executors",
    "get_lock": "server-side advisory locks (no shared lock server)",
    "is_free_lock": "advisory locks",
    "is_used_lock": "advisory locks",
    "release_lock": "advisory locks",
    "release_all_locks": "advisory locks",
    "master_pos_wait": "binlog replication position",
    "des_encrypt": "deprecated (removed in MySQL 8.0)",
    "des_decrypt": "deprecated (removed in MySQL 8.0)",
    "encrypt": "deprecated crypt() wrapper (removed in MySQL 8.0)",
    "old_password": "deprecated (removed in MySQL 8.0)",
    "password": "deprecated auth hash (removed in MySQL 8.0)",
    "validate_password_strength": "server plugin state",
    "load_file": "server-filesystem read; LOAD DATA covers ingest",
    "found_rows": "wire-protocol session state",
    "last_insert_id": "no session insert-id channel (keys are explicit)",
    "name_const": "parser-internal (column naming)",
    "default_func": "parser-internal (DEFAULT keyword)",
    "tidb_bounded_staleness": "TSO/KV timestamp oracle internals",
    "tidb_decode_key": "KV key codec internals (no KV layer)",
    "tidb_decode_plan": "internal plan codec",
    "tidb_decode_sql_digests": "internal digest codec",
    "tidb_is_ddl_owner": "DDL-owner election internals",
    "tidb_parse_tso": "TSO internals",
    "vitess_hash": "Vitess sharding compatibility",
}


# Evaluated engine-side by Engine.sql() against session state BEFORE the
# statement reaches Spark — the same control-plane posture the reference
# gives them (per-statement allocation from a cached range,
# table/tables.go GetSequenceNextVal; ddl/sequence.go lifecycle).
ENGINE_SIDE = {
    "nextval": "sequence allocation, engine.py _seq_nextval",
    "lastval": "session last-allocated value, engine.py",
    "setval": "counter rebase, engine.py _substitute_sequence_funcs",
}


def registry_names() -> dict[str, str]:
    """funcs-map keys -> SQL names, via parser/ast/functions.go consts."""
    consts: dict[str, str] = {}
    for m in re.finditer(
        r"^\s*(\w+)\s*=\s*\"([^\"]+)\"",
        (REF / "parser/ast/functions.go").read_text(),
        re.M,
    ):
        consts[m.group(1)] = m.group(2)
    body = (REF / "expression/builtin.go").read_text()
    block = body[body.index("var funcs = map") :]
    block = block[: block.index("\n}")]
    out: dict[str, str] = {}
    for m in re.finditer(r"ast\.(\w+):", block):
        key = m.group(1)
        out[key] = consts.get(key, key.lower())
    return out


def shim_tiers() -> tuple[set[str], set[str], set[str]]:
    """(sql_udf, pandas_udf, row_udf) name sets registered by
    ``tidb_spark.functions.mysql`` — three distinct performance tiers:
    SQL scalar UDFs inline JVM-side (codegen), pandas UDFs are Arrow-
    batched Python, row UDFs are the slow path (BatchEvalPython)."""
    src = (REPO / "tidb_spark/functions/mysql.py").read_text()
    sql_udfs: set[str] = set()
    m = re.search(r"_SQL_UDFS[^=]*=\s*\((.*?)\n\)\n", src, re.S)
    if m:
        sql_udfs = {
            g.lower() for g in re.findall(r'\(\s*\n?\s*"(\w+)",', m.group(1))
        }
    pandas = {
        mm.group(1).lower() for mm in re.finditer(r'\bpreg\(\s*"(\w+)"', src)
    }
    pandas |= {
        mm.group(1).lower()
        for mm in re.finditer(
            r'spark\.udf\.register\(\s*"(\w+)",\s*pandas_udf', src
        )
    }
    row = {
        mm.group(1).lower()
        for mm in re.finditer(r'spark\.udf\.register\(\s*"(\w+)"', src)
    } - pandas
    return sql_udfs, pandas, row


def translated_names() -> set[str]:
    src = (REPO / "tidb_spark/sqlshim/translate.py").read_text()
    names = {
        m.group(1).lower()
        for m in re.finditer(r"_rewrite_calls\(\s*sql,\s*\"(\w+)\"", src)
    }
    # Regex-special forms handled outside _rewrite_calls.
    names |= {"group_concat", "strcmp", "nulleq"}
    # Session-info constant lowerings applied in a loop over _CONST_FNS.
    from tidb_spark.sqlshim import translate as _t

    names |= {k.lower() for k in _t._CONST_FNS}
    return names


def main() -> int:
    from tidb_spark.session import get_spark

    spark = get_spark(app_name="builtin-audit")
    reg = registry_names()
    sql_udfs, pandas_udfs, row_udfs = shim_tiers()
    trans = translated_names()

    rows: list[tuple[str, str]] = []  # (sql_name, coverage)
    for key, sql_name in sorted(reg.items(), key=lambda kv: kv[1]):
        n = SQL_NAME_ALIASES.get(sql_name.lower(), sql_name.lower())
        if not re.fullmatch(r"\w+", n):
            # e.g. DateLiteral = "'tidb`.(dateliteral" — internal markers
            # for DATE/TIME/TIMESTAMP '...' literal syntax, which Spark SQL
            # parses natively.
            cov = "operator"
        elif n in OPERATORS:
            cov = "operator"
        elif n in ENGINE_SIDE:
            cov = f"engine ({ENGINE_SIDE[n]})"
        elif n in OUT_OF_SCOPE:
            cov = f"out-of-scope ({OUT_OF_SCOPE[n]})"
        elif n in SQL_KEYWORD_NATIVE:
            cov = "spark-native (keyword syntax)"
        elif n in trans:
            cov = "translated"
        elif n in sql_udfs:
            cov = "sql-udf"
        elif n in pandas_udfs:
            cov = "pandas-udf"
        elif n in row_udfs:
            cov = "shim-udf"
        elif spark.catalog.functionExists(n):
            cov = "spark-native"
        elif ALIASED_NATIVE.get(n, "") and spark.catalog.functionExists(
            ALIASED_NATIVE[n]
        ):
            cov = f"spark-native ({ALIASED_NATIVE[n]})"
        elif n in ALIASED_NATIVE:
            cov = "translated"
        else:
            cov = "UNCOVERED"
        rows.append((n, cov))

    counts: dict[str, int] = {}
    for _, cov in rows:
        counts[cov.split(" ")[0]] = counts.get(cov.split(" ")[0], 0) + 1
    uncovered = [n for n, cov in rows if cov == "UNCOVERED"]

    lines = [
        "# Scalar-builtin coverage audit",
        "",
        "Generated by `scripts/builtin_audit.py` — diff of the reference's",
        "scalar-function registry (`expression/builtin.go:573`, "
        f"{len(rows)} names)",
        "against this repo's coverage.  Classes: **operator** (SQL syntax,",
        "not a callable — Spark expresses it as an expression),",
        "**spark-native** (resolves in Spark's FunctionRegistry untouched),",
        "**translated** (rewritten to native Spark SQL by the dialect",
        "shim), **sql-udf** (Spark 4 SQL scalar UDF — inlined JVM",
        "expression, whole-stage codegen), **pandas-udf** (Arrow-batched",
        "Python; the sanctioned escape hatch for arbitrary nested-JSON",
        "walkers), **shim-udf** (row-at-a-time Python — the slow path;",
        "random_bytes only, whose per-row entropy IS the semantic),",
        "**engine** (evaluated by Engine.sql() against session state",
        "before Spark sees the statement — sequences, per the",
        "reference's cached-range allocator posture).",
        "",
        "| class | count |",
        "|---|---|",
    ]
    for cov, c in sorted(counts.items(), key=lambda kv: -kv[1]):
        lines.append(f"| {cov} | {c} |")
    lines += [
        "",
        f"## Uncovered ({len(uncovered)})",
        "",
        ", ".join(f"`{n}`" for n in uncovered) or "(none)",
        "",
        "## Full table",
        "",
        "| function | coverage |",
        "|---|---|",
    ]
    lines += [f"| `{n}` | {cov} |" for n, cov in rows]
    (REPO / "COVERAGE_BUILTINS.md").write_text("\n".join(lines) + "\n")
    print(f"{len(rows)} builtins: {counts} -> COVERAGE_BUILTINS.md")
    print("uncovered:", ", ".join(uncovered))
    return 0


if __name__ == "__main__":
    sys.exit(main())
