"""Engine: the user-facing entry point — MySQL-dialect SQL over the bound
catalog, including graph MATCH clauses.

Replaces the reference's query lifecycle (SURVEY.md §3: parse → compile →
optimize → volcano execution, session/session.go:1402 → executor/) with:
dialect translation (tidb_spark/sqlshim) → MATCH lowering (join chains /
distributed BFS) → ``spark.sql`` → Catalyst + AQE.  Control-plane statements
(§2.13) surface as thin methods: ``explain`` (executor/explain.go),
``analyze`` (executor/analyze.go — stats for the CBO), ``show_tables``
(executor/show.go).
"""

from __future__ import annotations

import itertools
import os
import re
import tempfile
from collections import OrderedDict

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tidb_spark.catalog import DEFAULT_SF_DIR, register_views
from tidb_spark.functions.mysql import register_shim_udfs
from tidb_spark.graph.model import GraphSchema, default_graph
from tidb_spark.graph.shortest import all_shortest, any_shortest, top_k_shortest
from tidb_spark.sources.dml import ManagedTable
from tidb_spark.sqlshim import match_clause as mc
from tidb_spark.sqlshim import merge_clause
from tidb_spark.sqlshim.translate import translate

_view_counter = itertools.count()

_DML_RE = re.compile(
    r"(?is)^\s*(?:(?P<iverb>INSERT|REPLACE)(?P<ignore>\s+IGNORE)?\s+INTO\s+"
    r"(?P<itab>\w+)\s+(?P<ibody>.*)"
    r"|(?P<uverb>UPDATE)\s+(?P<utab>\w+)\s+SET\s+(?P<ubody>.*)"
    r"|(?P<dverb>DELETE)\s+FROM\s+(?P<dtab>\w+)\s*(?:WHERE\s+(?P<dwhere>.*))?)$"
)

_ODKU_RE = re.compile(r"(?is)^(.*?)\s+ON\s+DUPLICATE\s+KEY\s+UPDATE\s+(.*)$")

_AS_OF_RE = re.compile(
    r"(?is)\b(\w+)\s+AS\s+OF\s+TIMESTAMP\s+'([^']+)'(?:\s+AS\s+(\w+))?"
)

_SET_RE = re.compile(
    r"(?is)^\s*SET\s+(?:(?P<user>@(?P<uname>\w+)\s*:?=\s*(?P<uexpr>.+))"
    r"|(?P<sys>@@?(?:SESSION\.|GLOBAL\.)?(?P<sname>\w+)\s*=\s*(?P<sexpr>.+)))"
    r"\s*;?\s*$"
)

_USER_VAR_RE = re.compile(r"(?<![@\w])@(\w+)\b")

# Client/BI-tool session statements (the reference accepts these at the
# session layer: session/session.go SET NAMES, USE, autocommit txn verbs).
_TOOL_STMT_RE = re.compile(
    r"(?is)^\s*(?:"
    r"(?P<setnames>SET\s+NAMES\s+\S+(?:\s+COLLATE\s+\S+)?)"
    r"|(?P<setcs>SET\s+CHARACTER\s+SET\s+\S+)"
    r"|(?P<use>USE\s+`?\w+`?)"
    r"|(?P<begin>BEGIN|START\s+TRANSACTION)"
    r"|(?P<commit>COMMIT)"
    r"|(?P<rollback>ROLLBACK)"
    r"|(?P<kill>KILL\s+(?:QUERY\s+)?\d+)"
    r")\s*;?\s*$"
)

# SELECT … FOR UPDATE / LOCK IN SHARE MODE: the reference plans a
# SelectLockExec; with no transaction scope the lock is a no-op here
# (SURVEY §2 row 18 n/a) — strip the suffix, run the SELECT.
_SELECT_LOCK_RE = re.compile(
    r"(?is)\s+(?:FOR\s+UPDATE(?:\s+NOWAIT|\s+SKIP\s+LOCKED)?"
    r"|LOCK\s+IN\s+SHARE\s+MODE)\s*(;?)\s*$"
)

_CHECKSUM_RE = re.compile(r"(?is)^\s*ADMIN\s+CHECKSUM\s+TABLE\s+(\w+)\s*;?\s*$")

# PREPARE / EXECUTE / DEALLOCATE statement forms (executor/prepared.go:1
# PrepareExec; planner/core/common_plans.go Execute rebind).  The reference
# caches a PHYSICAL plan per prepared statement (planner/core/plan_cache.go
# GetPlanFromPlanCache); the Spark-native split of that idea caches the
# LOWERED STATEMENT TEXT instead (r8, engine plan cache below): the
# Python-side dialect pipeline — dozens of regex/lowering passes — runs once
# per (statement, catalog epoch), while Catalyst + AQE still re-plan every
# execution, because at scale per-execution planning is the *better* half
# to keep (literal parameters enable partition pruning a cached generic
# physical plan would lose; the reference pays exactly that cost and grew
# tidb_opt_fix_control workarounds for it).  Parameters are pinned through
# the lowering as named ``:pN`` markers so reordering rewrites (MySQL
# ``LIMIT ?, ?`` → ``LIMIT ? OFFSET ?`` swaps the two) and
# subquery-duplicating rewrites (quantified ALL/ANY) stay bind-correct.
# Statements whose lowering must SEE literal values are skipped with a
# recorded reason, mirroring the reference's own skip-plan-cache reasons
# (planner/core/plan_cacheable_checker.go): user @variables, MATCH …
# AGAINST (literal-only argument), NEXTVAL/SETVAL (per-statement
# allocation), INTO OUTFILE.  Any mutation statement bumps the catalog
# epoch and invalidates (the reference invalidates on schema version).
_PREPARE_RE = re.compile(
    r"(?is)^\s*PREPARE\s+`?(?P<name>\w+)`?\s+FROM\s+(?P<src>.+?)\s*;?\s*$"
)
_EXECUTE_RE = re.compile(
    r"(?is)^\s*EXECUTE\s+`?(?P<name>\w+)`?"
    r"(?:\s+USING\s+(?P<args>.+?))?\s*;?\s*$"
)
_DEALLOC_RE = re.compile(
    r"(?is)^\s*(?:DEALLOCATE|DROP)\s+PREPARE\s+`?(?P<name>\w+)`?\s*;?\s*$"
)

# SQL plan bindings (bindinfo/bind.go; CREATE [GLOBAL|SESSION] BINDING FOR
# <stmt> USING <stmt-with-hints>).  A binding matches any incoming
# statement whose literal-stripped digest equals the bound statement's
# (bindinfo's normalized-SQL match), and replaces it with the USING text —
# the incoming statement's OWN literals re-injected positionally, which is
# sound because CREATE BINDING verifies both sides normalize identically
# (hints excluded), so literal positions correspond 1:1.  GLOBAL and
# SESSION share one session-scoped store here (no multi-session scope in
# a single engine).
_CREATE_BINDING_RE = re.compile(
    r"(?is)^\s*CREATE\s+(?:GLOBAL\s+|SESSION\s+)?BINDING\s+FOR\s+"
    r"(?P<orig>.+?)\s+USING\s+(?P<using>.+?)\s*;?\s*$"
)
_DROP_BINDING_RE = re.compile(
    r"(?is)^\s*DROP\s+(?:GLOBAL\s+|SESSION\s+)?BINDING\s+FOR\s+"
    r"(?P<orig>.+?)\s*;?\s*$"
)
# Standalone numeric literals (not part of an identifier / dotted name).
_NUM_LIT_RE = re.compile(r"(?<![\w.`])\d+(?:\.\d+)?(?![\w.])")

# Read-shaped statement heads: these cannot change catalog/data/sysvar
# state the LOWERING pipeline reads, so they leave the plan-cache epoch
# alone.  Everything else (DDL, DML, LOAD, SET, ANALYZE, OPTIMIZE,
# RENAME, IMPORT…) bumps it.  SELECT … INTO OUTFILE/@ writes var/file
# state but no statement's lowering reads either (user @vars make a
# statement uncacheable outright), so SELECT stays on the list.
_READONLY_STMT_RE = re.compile(
    r"(?is)^\s*(?:/\*.*?\*/\s*)*"
    r"(?:EXPLAIN|SELECT|WITH|TABLE|VALUES|SHOW|DESC|DESCRIBE|EXECUTE"
    r"|PREPARE|DEALLOCATE|CHECKSUM|ADMIN|USE|BEGIN|START|COMMIT|KILL"
    r"|HELP)\b"
)

# Plan-cacheability gate (the reference's skip-plan-cache reasons,
# planner/core/plan_cacheable_checker.go): read query heads only, and no
# construct whose lowering must SEE literal parameter values or allocates
# per statement.  Matched against the string-masked text.
_CACHEABLE_HEAD_RE = re.compile(
    r"(?is)^\s*(?:/\*.*?\*/\s*)*(?:SELECT|WITH(?!\s+RECURSIVE)|TABLE|VALUES)\b"
)
_CACHE_SKIP_RE = re.compile(
    r"(?i)@"  # user/system variables read at execution time
    r"|\bAGAINST\s*\("  # fulltext: the AGAINST argument must be a literal
    r"|\bNEXTVAL\b|\bLASTVAL\b|\bSETVAL\b"  # per-statement allocation
    r"|\bINTO\s+(?:OUTFILE|DUMPFILE)\b"
)

# Extra skip conditions for the DIRECT-statement DataFrame cache (r13,
# the reference's non-prepared plan cache,
# planner/core/plan_cache_non_prepared.go — latency-only here: the
# @@last_plan_from_cache flag stays prepared-statement-only because the
# reference ships the non-prepared cache OFF by default and the engine's
# observability tests pin that): constructs whose lowering or evaluation
# is time- or randomness-dependent, so replaying an analyzed DataFrame
# could change RESULTS, not just latency.
_STMT_CACHE_SKIP_RE = re.compile(
    r"(?i)\bRAND\s*\(|\bUUID\s*\(|\bNOW\s*\(|\bCURRENT_|\bCURDATE\b"
    r"|\bCURTIME\b|\bSYSDATE\b|\bUNIX_TIMESTAMP\s*\(\s*\)"
    r"|\bAS\s+OF\b|\bFLASHBACK\b|\bTABLESAMPLE\b"
)

#: Direct-statement DataFrame cache capacity (LRU) — same default as the
#: prepared-statement plan cache.
_STMT_CACHE_CAP = 100

# Sequence objects (ddl/sequence.go; NEXTVAL/LASTVAL/SETVAL in the builtin
# registry, expression/builtin.go).  Counter state is engine-side like the
# AUTO_INCREMENT counter: allocation is a 1-row control-plane action, never
# a distributed operation (the reference allocates cached ranges from KV
# the same way).
_CREATE_SEQ_RE = re.compile(
    r"(?is)^\s*CREATE\s+SEQUENCE\s+(?P<ifnex>IF\s+NOT\s+EXISTS\s+)?"
    r"`?(?P<name>\w+)`?\s*(?P<opts>.*?)\s*;?\s*$"
)
_DROP_SEQ_RE = re.compile(
    r"(?is)^\s*DROP\s+SEQUENCE\s+(?P<ifex>IF\s+EXISTS\s+)?"
    r"`?(?P<name>\w+)`?\s*;?\s*$"
)
_SEQ_FUNC_RE = re.compile(
    r"(?i)\b(?P<fn>NEXTVAL|LASTVAL|SETVAL)\s*\(\s*`?(?P<seq>\w+)`?"
    r"\s*(?:,\s*(?P<val>-?\d+)\s*)?\)"
)

_EXPLAIN_STMT_RE = re.compile(
    r"(?is)^\s*EXPLAIN\s+(?:(?P<an>ANALYZE)\s+)?"
    r"(?:FORMAT\s*=\s*(?P<fmt>\w+)\s+)?"
    # EXECUTE: the reference explains prepared statements too
    # (executor/explain.go + common_plans.go Execute) — that's where the
    # plan-cache/binding provenance lines are most useful.
    r"(?P<body>(?:SELECT|WITH|TABLE|VALUES|EXECUTE)\b.*)$"
)

# Cheap gate before importing/running the JSON_TABLE lowering (string
# literals are masked first so a literal mentioning JSON_TABLE can't
# trigger it).
_JSON_TABLE_GATE_RE = re.compile(r"(?i)\bJSON_TABLE\s*\(")

_DDL_RE = re.compile(
    r"(?is)^\s*(?:(?P<dverb>DROP|TRUNCATE)\s+TABLE\s+"
    r"(?P<ifex>IF\s+EXISTS\s+)?`?(?P<dtab>\w+)`?"
    r"|(?P<fverb>FLASHBACK)\s+TABLE\s+(?P<ftab>\w+)(?:\s+TO\s+(?P<fnew>\w+))?)"
    r"\s*;?\s*$"
)

_VALUES_REF_RE = re.compile(r"(?i)\bVALUES\s*\(\s*`?(\w+)`?\s*\)")


def _sql_literal(val) -> str:
    """Render a Python value from Row.v as a SQL literal."""
    import datetime as _dt

    if val is None:
        return "NULL"
    if isinstance(val, bool):
        return "TRUE" if val else "FALSE"
    if isinstance(val, (int, float)):
        return repr(val)
    if isinstance(val, _dt.datetime):
        return f"TIMESTAMP '{val.strftime('%Y-%m-%d %H:%M:%S')}'"
    if isinstance(val, _dt.date):
        return f"DATE '{val.isoformat()}'"
    s = str(val).replace("\\", "\\\\").replace("'", "\\'")
    return f"'{s}'"


def _strip_quotes(val: str) -> str:
    val = val.strip()
    if len(val) >= 2 and val[0] == val[-1] and val[0] in "'\"":
        return val[1:-1]
    return val


# Collations the reference registers (util/collate/collate.go:355
# newCollatorMap) mapped to this engine's key kinds.  Any other declared
# collation raises loudly at CREATE time — never a silent alias to a
# different collation's semantics.
_COLLATION_KINDS = {
    "utf8_general_ci": "general",
    "utf8mb4_general_ci": "general",
    "utf8_unicode_ci": "unicode",
    "utf8mb4_unicode_ci": "unicode",
    "gbk_chinese_ci": "gbk",
    # The reference REGISTERS this name and accepts it in DDL
    # (ddl/serial_test.go:1565 ALTER TABLE … COLLATE
    # utf8mb4_zh_pinyin_tidb_as_cs passes), but its collator is an
    # unimplemented stub hidden from SHOW COLLATION: Compare/Key/Pattern
    # all panic("implement me") (util/collate/pinyin_tidb_as_cs.go:22-33;
    # collate.go:237 "under developing, should not be shown to user"), and
    # it ships NO weight table to derive from (unlike gbk_chinese_ci_data
    # .go).  Exact parity: DDL accepts, any comparison raises loudly.
    "utf8mb4_zh_pinyin_tidb_as_cs": "pinyin",
    "ascii_bin": "bin",
    "latin1_bin": "bin",
    "utf8_bin": "bin",
    "utf8mb4_bin": "bin",
}


def _collation_kind(name: str) -> str | None:
    """Key kind for a declared COLLATE name; None for plain binary (no
    shim); NotImplementedError for names outside the reference's
    registry — matching its explicit list rather than guessing by
    suffix.  'pinyin' is registry parity: DDL-accepted, use-rejected
    (see the _COLLATION_KINDS entry comment)."""
    low = name.lower()
    if low == "binary":
        return None  # NO PAD binary == Spark's native comparison
    kind = _COLLATION_KINDS.get(low)
    if kind is None:
        raise NotImplementedError(
            f"collation {name!r} is not supported (supported: binary, "
            + ", ".join(sorted(_COLLATION_KINDS))
            + ") — refusing to alias it to different semantics"
        )
    return kind


class Engine:
    """One engine per (SparkSession, dataset dir): binds the catalog, the
    graph schema, and the MySQL shim functions, then answers SQL."""

    def __init__(
        self,
        spark: SparkSession,
        sf_dir: str | None = None,
        *,
        workspace: str | None = None,
    ):
        self.spark = spark
        self.sf_dir = sf_dir or DEFAULT_SF_DIR
        self.tables = register_views(spark, self.sf_dir)
        self.graph: GraphSchema = default_graph(spark, self.sf_dir)
        self.workspace = workspace or tempfile.mkdtemp(prefix="tidb_spark_ws_")
        self.managed: dict[str, ManagedTable] = {}
        self.dropped: dict[str, ManagedTable] = {}
        # SET statement state (executor/set.go:41): @user variables hold a
        # SQL literal; @@system variables are accepted and recorded (most
        # reference sysvars tune its own executor — Spark conf is the
        # analogue, surfaced but not interpreted).
        self.user_vars: dict[str, str] = {}
        self.sys_vars: dict[str, str] = {}
        # CREATE VIEW registry: name -> original defining SELECT (the
        # reference stores the SELECT text in the view's TableInfo,
        # planner/core/planbuilder.go:411-498 buildCreateView).
        self.views: dict[str, str] = {}
        # Optional explicit column list per view (CREATE VIEW v (a, b) AS …),
        # needed to rebuild the view after base-table DML.
        self._view_cols: dict[str, list[str] | None] = {}
        # PREPARE handler -> statement text (executor/prepared.go).
        self.prepared: dict[str, str] = {}
        # Plan cache (planner/core/plan_cache.go, re-expressed as a
        # lowered-text cache — see the _PREPARE_RE note): statement text ->
        # (lowered Spark SQL with :pN markers | None for known-uncacheable,
        # n_params, catalog epoch).  LRU, default capacity 100 like the
        # reference's tidb_session_plan_cache_size.
        self.plan_cache: "OrderedDict[str, tuple[str | None, int, int]]" = (
            OrderedDict()
        )
        # Bumped by every statement that can change what lowering depends
        # on (DDL, DML, LOAD, SET, ANALYZE…); cache entries from an older
        # epoch are dead.  The reference's analogue is the schema version
        # check in plan_cache.go.
        self._catalog_epoch = 0
        # @@last_plan_from_cache (sessionctx/variable/session.go — the
        # reference exposes exactly this observability var).  Reads
        # report the PREVIOUS statement via the _prev snapshot taken at
        # statement entry (same discipline as _prev_from_binding).
        self._last_plan_from_cache = False
        self._prev_from_cache = False
        self._plan_cache_hits = 0
        self._plan_cache_misses = 0
        # Non-None only during a _lower_for_cache pass: the final
        # spark.sql site appends the lowered text here instead of running.
        self._lower_capture: list[str] | None = None
        # Direct-statement DataFrame cache (r13; the reference's
        # NON-prepared plan cache, plan_cache_non_prepared.go): raw
        # statement text -> (analyzed DataFrame, catalog epoch).  A hit
        # skips the whole dialect-lowering pipeline AND Catalyst
        # analysis; epoch gating gives the same invalidation as the
        # prepared cache (every catalog/data/sysvar mutation bumps it).
        # DataFrames are immutable analyzed plans, so replaying one is
        # execution-only — results recompute from storage every time.
        self._stmt_df_cache: "OrderedDict[str, tuple[DataFrame, int]]" = (
            OrderedDict()
        )
        self._stmt_cache_hits = 0
        # SQL plan bindings (bindinfo/): digest -> (original display text,
        # USING template with literals as :bN markers, n_literals).
        self.bindings: dict[str, tuple[str, str, int]] = {}
        # @@last_plan_from_binding (sessionctx/variable — the reference's
        # paired observability var).  Reads report the PREVIOUS statement
        # (the reading SELECT itself goes through bind-match first, so it
        # reads a statement-entry snapshot).
        self._last_plan_from_binding = False
        self._prev_from_binding = False
        # Sequence objects: name -> options + counter (ddl/sequence.go).
        self.sequences: dict[str, dict] = {}
        # Columns declared with a non-binary collation (util/collate/),
        # per table so DROP TABLE retires them: column name -> collation
        # kind ('general' = utf8mb4_general_ci weights, 'unicode' =
        # utf8mb4_unicode_ci UCA weights, 'bin' = *_bin PAD SPACE only).
        # The opt-in comparison shim dispatches the key function on the
        # kind (reference newCollatorMap, util/collate/collate.go:355).
        self._ci_cols_by_table: dict[str, dict[str, str]] = {}
        # Storage incarnation per table name: CREATE after DROP must get a
        # fresh directory — ManagedTable resumes from the latest on-disk
        # version, so reusing the dropped table's root would silently
        # resurrect its rows (and FLASHBACK needs those files intact).
        self._incarnations: dict[str, int] = {}
        self._tmp_view_n = 0
        register_shim_udfs(spark)
        from tidb_spark.functions.collation import register_general_ci
        from tidb_spark.functions.collation_unicode import (
            register_unicode_ci,
        )

        register_general_ci(spark)
        register_unicode_ci(spark)

    # -- DDL surface (graph): SOURCE KEY / DESTINATION KEY registration ----

    def create_vertex_table(self, name: str, df: DataFrame, id_col: str) -> None:
        """Register a vertex table (any table with an int handle PK,
        SURVEY §1.4) and expose it to SQL."""
        self.graph.add_vertex_table(name, df, id_col)
        df.createOrReplaceTempView(name)
        self._catalog_epoch += 1  # direct-API catalog mutation

    def create_edge_table(
        self,
        name: str,
        df: DataFrame,
        src_col: str,
        dst_col: str,
        src_table: str,
        dst_table: str,
    ) -> None:
        """Register an edge table — the DDL equivalent of
        ``src BIGINT SOURCE KEY REFERENCES t, dst BIGINT DESTINATION KEY
        REFERENCES t`` (ddl/ddl_api.go:1946-2025)."""
        self.graph.add_edge_table(name, df, src_col, dst_col, src_table, dst_table)
        df.createOrReplaceTempView(name)
        self._catalog_epoch += 1  # direct-API catalog mutation

    def create_table(
        self,
        name: str,
        df: DataFrame,
        key_cols: list[str],
        partition_spec=None,
        domains: dict[str, tuple[str, tuple[str, ...]]] | None = None,
        generated: dict[str, str] | None = None,
        auto_col: str | None = None,
        df_known_empty: bool = False,
    ) -> ManagedTable:
        """Create a writable (managed, copy-on-write parquet) table in the
        engine workspace and expose it to SQL — the DML target surface
        (read-only dataset views cannot be mutated).  ``partition_spec``
        (RANGE/HASH/LIST, parser/model/model.go:820-822) directory-
        partitions every version so partition-selected scans prune."""
        gen = self._incarnations.get(name, -1) + 1
        self._incarnations[name] = gen
        mt = ManagedTable(
            self.spark,
            os.path.join(
                self.workspace, name if gen == 0 else f"{name}.g{gen}"
            ),
            key_cols,
            df=df,
            partition_spec=partition_spec,
            domains=domains,
            generated=generated,
            auto_col=auto_col,
            df_known_empty=df_known_empty,
        )
        self.managed[name] = mt
        self._refresh_view(name)
        return mt

    def _check_create_name(self, name: str, if_not_exists: bool) -> bool:
        """Shared exists-check for the CREATE TABLE forms; True = proceed."""
        if name in self.managed or name in self.tables or name in self.views:
            if if_not_exists:
                return False
            raise ValueError(f"table {name!r} already exists")
        return True

    def _run_ctas(self, m: re.Match) -> None:
        """CREATE TABLE … AS SELECT (executor/ddl.go CreateTableWithInfo via
        planner CreateTableAsSelect): schema inferred from the SELECT, data
        populated in the same statement, no keys (MySQL CTAS copies no
        indexes)."""
        name = m.group("name")
        if not self._check_create_name(name, bool(m.group("ine"))):
            return
        df = self.sql(m.group("sel"))
        self.create_table(name, df, key_cols=[])

    def _run_create_like(self, m: re.Match) -> None:
        """CREATE TABLE a LIKE b (executor/ddl.go CreateTableLike): clone
        schema, keys, domains, generated columns, AUTO_INCREMENT and
        DEFAULTs from a managed table; base dataset tables clone schema
        only (their keys are not declared)."""
        name, src = m.group("name"), m.group("src")
        if not self._check_create_name(name, bool(m.group("ine"))):
            return
        if src in self.managed:
            smt = self.managed[src]
            empty = self.spark.createDataFrame([], schema=smt.df().schema)
            self.create_table(
                name,
                empty,
                key_cols=list(smt.key_cols),
                partition_spec=smt.partition_spec,
                domains=dict(smt.domains) if smt.domains else None,
                generated=dict(smt.generated) if smt.generated else None,
                auto_col=smt.auto_col,
                df_known_empty=True,
            )
            defaults = getattr(self, "_defaults_by_table", {}).get(src)
            if defaults:
                self._defaults_by_table[name] = dict(defaults)
            if src in self._ci_cols_by_table:
                # MySQL LIKE clones column collations; keep the clone's
                # *_ci semantics independent of the source's lifetime.
                self._ci_cols_by_table[name] = dict(
                    self._ci_cols_by_table[src]
                )
        elif src in self.tables:
            empty = self.spark.createDataFrame(
                [], schema=self.tables[src].schema
            )
            self.create_table(name, empty, key_cols=[], df_known_empty=True)
        else:
            raise ValueError(f"CREATE TABLE LIKE: unknown table {src!r}")

    def _bind_insert(
        self, mt, name: str, rows: DataFrame, cols: list[str]
    ) -> DataFrame:
        """Bind an incoming row source to the target schema: the named
        columns take the source's output positionally, generated columns
        are rejected (ErrBadGeneratedColumn), unknown names error, and
        every unnamed column takes its declared DEFAULT else NULL
        (executor/insert.go fillRow)."""
        fields = mt.df().schema.fields
        known = {f.name for f in fields}
        bad = [c for c in cols if c in mt.generated]
        if bad:
            raise ValueError(
                f"The value specified for generated column {bad[0]!r} "
                f"in table {name!r} is not allowed"
            )
        unknown = [c for c in cols if c not in known]
        if unknown:
            # MySQL ERROR 1054
            raise ValueError(
                f"Unknown column {unknown[0]!r} in table {name!r}"
            )
        full = rows.toDF(*cols)
        defaults = getattr(self, "_defaults_by_table", {}).get(name, {})
        for f in fields:
            if f.name not in cols:
                dexpr = defaults.get(f.name)
                full = full.withColumn(
                    f.name,
                    (F.expr(dexpr) if dexpr else F.lit(None)).cast(f.dataType),
                )
        return full.select(*[f.name for f in fields])

    def _refresh_view(self, name: str) -> None:
        df = self.managed[name].df()
        df.createOrReplaceTempView(name)
        # SQL-path mutations already bumped the epoch at statement entry;
        # this covers DIRECT Python-API mutations (create_table & friends)
        # so plan/DataFrame caches never replay a stale view binding.
        self._catalog_epoch += 1
        self.tables[name] = df
        # Keep graph-schema registrations live: a MATCH over an edge table
        # created (then INSERTed into) via SQL must see the current version.
        if name in self.graph.edges:
            self.graph.edges[name].df = df
        if name in self.graph.vertices:
            self.graph.vertices[name].df = df
        # Views captured the PREVIOUS parquet version of this table in their
        # analyzed plans (and would eventually dangle once retain_versions
        # prunes it); rebuild view definitions against current state —
        # reference/MySQL views always reflect current data (view bodies are
        # expanded per consuming statement, planbuilder.go buildDataSource).
        self._reregister_views(touched=name)

    def _reregister_views(self, touched: str | None = None) -> None:
        """Re-register view definitions.  ``touched`` limits the rebuild to
        views whose body mentions that table name (word-boundary substring
        — conservative: false positives only re-run a cheap analysis) so a
        DML statement costs O(dependent views), not O(all views)."""
        for vname, body in self.views.items():
            if touched is not None and not re.search(
                rf"\b{re.escape(touched)}\b", body
            ):
                continue
            try:
                vdf = self.sql(body)
                cols = self._view_cols.get(vname)
                if cols:
                    vdf = vdf.toDF(*cols)
                vdf.createOrReplaceTempView(vname)
            except Exception:
                # A view whose base objects are gone stays registered with
                # its old plan; MySQL likewise only errors at use time.
                pass

    def _run_create(self, stmt) -> None:
        """CREATE TABLE → managed copy-on-write table, plus graph-schema
        registration: an edge table (SOURCE KEY/DESTINATION KEY columns,
        ddl/ddl_api.go:1946-2025) gets the synthesized (src, dst) key and
        must reference registered vertex tables; a table with a single
        integral-column PRIMARY KEY registers as a vertex table (the
        reference's implicit vertex criterion, SURVEY §1.4)."""
        if stmt.name in self.managed or (
            stmt.name in self.tables and stmt.name not in self.managed
        ):
            if stmt.if_not_exists:
                return
            raise ValueError(f"table {stmt.name!r} already exists")
        empty = self.spark.createDataFrame([], schema=stmt.schema_ddl())
        domains = {
            c.name: (c.domain_kind, c.domain)
            for c in stmt.columns
            if c.domain_kind
        } or None
        generated = {
            c.name: translate(c.generated_expr)
            for c in stmt.columns
            if c.generated_expr
        } or None
        auto_col = next(
            (c.name for c in stmt.columns if c.auto_increment), None
        )
        self._defaults_by_table = getattr(self, "_defaults_by_table", {})
        self._defaults_by_table[stmt.name] = {
            c.name: c.default_expr for c in stmt.columns if c.default_expr
        }
        ci = {}
        for c in stmt.columns:
            if c.collation:
                kind = _collation_kind(c.collation)
                if kind:
                    ci[c.name] = kind
        if ci:
            self._ci_cols_by_table[stmt.name] = ci
        if stmt.is_edge:
            src = next(c for c in stmt.columns if c.source_ref)
            dst = next(c for c in stmt.columns if c.dest_ref)
            # Validates the vertex references before any state mutates.
            self.graph.add_edge_table(
                stmt.name, empty, src.name, dst.name, src.source_ref,
                dst.dest_ref,
            )
            self.create_table(
                stmt.name, empty, key_cols=stmt.pk_cols,
                partition_spec=stmt.partition_spec, domains=domains,
                generated=generated, auto_col=auto_col,
                df_known_empty=True,
            )
            return
        self.create_table(
            stmt.name, empty, key_cols=stmt.pk_cols,
            partition_spec=stmt.partition_spec, domains=domains,
            generated=generated, auto_col=auto_col,
            df_known_empty=True,
        )
        if len(stmt.pk_cols) == 1:
            pk = next(c for c in stmt.columns if c.name == stmt.pk_cols[0])
            if pk.spark_type in ("TINYINT", "SMALLINT", "INT", "BIGINT"):
                self.graph.add_vertex_table(
                    stmt.name, self.managed[stmt.name].df(), pk.name
                )

    def _run_alter(self, query: str) -> None:
        """ALTER TABLE: ADD/DROP/RENAME COLUMN, RENAME TO, and the fork's
        graph-ify form — a pair of ``MODIFY col type SOURCE KEY REFERENCES v
        / DESTINATION KEY REFERENCES v`` clauses converting an existing
        table into an edge table (ddl/ddl_api.go:2740-2764: exactly two
        modify specs, one SOURCE + one DESTINATION, then the unique
        (dst,src) graph-edge key is synthesized).

        Copy-on-write: schema-changing forms write a new version of the
        managed table, so AS OF reads of earlier versions still see the old
        schema."""
        m = re.match(r"(?is)^\s*ALTER\s+TABLE\s+`?(\w+)`?\s+(.*?)\s*;?\s*$", query)
        name, body = m.group(1), m.group(2)
        from tidb_spark.sqlshim.translate import _split_args
        from tidb_spark.sqlshim import create_table as ctmod

        if re.match(
            r"(?is)^(ADD|DROP|TRUNCATE)\s+PARTITION\b", body
        ):
            self._run_alter_partition(name, body)
            return

        clauses = [c.strip() for c in _split_args(body)]

        # Graph-ify: exactly two MODIFY clauses carrying SOURCE/DESTINATION.
        mods = [
            c for c in clauses
            if re.match(r"(?is)^MODIFY(\s+COLUMN)?\b", c)
            and (ctmod._SRC_RE.search(c) or ctmod._DST_RE.search(c))
        ]
        if mods:
            if len(mods) != 2 or len(clauses) != 2:
                raise ValueError(
                    "graph-ify ALTER needs exactly two MODIFY clauses "
                    "(one SOURCE KEY, one DESTINATION KEY)"
                )
            src_m = next((ctmod._SRC_RE.search(c), c) for c in mods if ctmod._SRC_RE.search(c))
            dst_m = next((ctmod._DST_RE.search(c), c) for c in mods if ctmod._DST_RE.search(c))
            if src_m[1] == dst_m[1]:
                raise ValueError(
                    "a column cannot be both SOURCE KEY and DESTINATION KEY"
                )
            col_of = lambda c: re.match(
                r"(?is)^MODIFY(?:\s+COLUMN)?\s+`?(\w+)`?", c
            ).group(1)
            src_col, dst_col = col_of(src_m[1]), col_of(dst_m[1])
            if name in self.managed and self.managed[name].key_cols:
                raise ValueError("can not specified primary key on edge")
            df = self.tables[name]
            self.graph.add_edge_table(
                name, df, src_col, dst_col,
                src_m[0].group(1), dst_m[0].group(1),
            )
            return

        if name not in self.managed:
            # RENAME of a non-managed registered table is still view-level.
            rn = re.match(r"(?is)^RENAME\s+(?:TO\s+)?`?(\w+)`?$", body)
            if rn and name in self.tables:
                new = rn.group(1)
                self.tables[new] = self.tables.pop(name)
                self.spark.catalog.dropTempView(name)
                self.tables[new].createOrReplaceTempView(new)
                return
            raise ValueError(f"table {name!r} is not a managed table")
        mt = self.managed[name]
        df = mt.df()
        for clause in clauses:
            am = re.match(
                r"(?is)^ADD(?:\s+COLUMN)?\s+`?(\w+)`?\s+(\w+(?:\([^)]*\))?)"
                r"(?P<rest>.*)$",
                clause,
            )
            dm = re.match(r"(?is)^DROP(?:\s+COLUMN)?\s+`?(\w+)`?$", clause)
            rc = re.match(
                r"(?is)^RENAME\s+COLUMN\s+`?(\w+)`?\s+TO\s+`?(\w+)`?$", clause
            )
            rt = re.match(r"(?is)^RENAME\s+(?:TO\s+)?`?(\w+)`?$", clause)
            if am:
                col, typ = am.group(1), am.group(2)
                tm = re.match(r"(\w+)(?:\((.*)\))?", typ)
                spark_t = ctmod._map_type(
                    tm.group(1), tm.group(2),
                    bool(re.search(r"(?i)\bUNSIGNED\b", am.group("rest"))),
                )
                dv = re.search(
                    r"(?is)\bDEFAULT\s+('(?:[^'\\]|\\.)*'|\S+)", am.group("rest")
                )
                expr = (
                    f"CAST({dv.group(1)} AS {spark_t})"
                    if dv
                    else f"CAST(NULL AS {spark_t})"
                )
                df = df.withColumn(col, F.expr(expr))
            elif dm:
                col = dm.group(1)
                if col in mt.key_cols:
                    raise ValueError(f"cannot drop key column {col!r}")
                df = df.drop(col)
            elif rc:
                old, new = rc.group(1), rc.group(2)
                df = df.withColumnRenamed(old, new)
                mt.key_cols = [new if k == old else k for k in mt.key_cols]
            elif rt:
                new = rt.group(1)
                if new in self.tables:
                    raise ValueError(f"table {new!r} already exists")
                self.managed[new] = self.managed.pop(name)
                del self.tables[name]
                self.spark.catalog.dropTempView(name)
                self._refresh_view(new)
                return
            else:
                raise ValueError(f"unsupported ALTER TABLE clause: {clause!r}")
        mt._write(df)  # noqa: SLF001 — one new copy-on-write version
        self._refresh_view(name)

    def _run_alter_partition(self, name: str, body: str) -> None:
        """ALTER TABLE … ADD / DROP / TRUNCATE PARTITION
        (ddl/partition.go): ADD appends RANGE/LIST partitions (bounds must
        stay strictly increasing; adding past MAXVALUE errors), DROP
        removes the definition AND its rows (RANGE/LIST only — matching
        the reference's restriction on HASH), TRUNCATE empties the named
        partitions but keeps them.  Row removal is a partition-pruned
        copy-on-write: the surviving directories are read, the dropped
        ones never scanned."""
        from tidb_spark.sqlshim import partition as pt
        from tidb_spark.sqlshim.translate import _split_args

        if name not in self.managed or self.managed[name].partition_spec is None:
            raise ValueError(f"table {name!r} is not partitioned")
        mt = self.managed[name]
        spec = mt.partition_spec

        am = re.match(r"(?is)^ADD\s+PARTITION\s*\((.*)\)\s*$", body)
        dm = re.match(r"(?is)^DROP\s+PARTITION\s+(.+?)\s*$", body)
        tm = re.match(r"(?is)^TRUNCATE\s+PARTITION\s+(.+?)\s*$", body)
        if am:
            if spec.method == "HASH":
                raise ValueError(
                    "ADD PARTITION on HASH tables requires re-hashing all "
                    "rows; use the reference's COALESCE/ADD rebalance "
                    "(unsupported)"
                )
            for item in _split_args(am.group(1)):
                item = item.strip()
                if spec.method == "RANGE":
                    pm = pt._RANGE_PART_RE.match(item)
                    if pm is None:
                        raise ValueError(f"bad partition def: {item!r}")
                    bound = "MAXVALUE" if pm.group("maxval") else pm.group("bound")
                    prev = pt._parse_literal(str(spec.bounds[-1]))
                    if not pt._lt(prev, pt._parse_literal(bound)):
                        raise ValueError(
                            "VALUES LESS THAN value must be strictly "
                            "increasing for each partition"
                        )
                    spec.names.append(pm.group("name"))
                    spec.bounds.append(bound)
                else:
                    pm = pt._LIST_PART_RE.match(item)
                    if pm is None:
                        raise ValueError(f"bad partition def: {item!r}")
                    new_vals = [
                        v.strip() for v in _split_args(pm.group("vals"))
                    ]
                    existing = {
                        pt._parse_literal(str(v))
                        for vs in spec.bounds
                        for v in vs
                    }
                    dup = [
                        v for v in new_vals
                        if pt._parse_literal(str(v)) in existing
                    ]
                    if dup:
                        raise ValueError(
                            f"Multiple definition of same constant: {dup[0]}"
                        )
                    spec.names.append(pm.group("name"))
                    spec.bounds.append(new_vals)
                if pm.group("name") in spec.names[:-1]:
                    raise ValueError("Duplicate partition name")
            # Definitions only — existing rows keep their labels; nothing
            # to rewrite.
            return
        targets_text = (dm or tm).group(1)
        targets = [t.strip().strip("`") for t in targets_text.split(",")]
        known = set(spec.partition_names())
        for t in targets:
            if t not in known:
                raise ValueError(f"Unknown partition {t!r}")
        if dm and spec.method == "HASH":
            raise ValueError(
                "DROP PARTITION can only be used on RANGE/LIST partitions"
            )
        keep = [n for n in spec.partition_names() if n not in targets]
        # Partition-pruned survivor read: only the kept directories scan.
        survivors = mt.scan_partitions(keep)
        if dm:
            if spec.method == "RANGE":
                kept = [
                    (n, b) for n, b in zip(spec.names, spec.bounds)
                    if n not in targets
                ]
                spec.names = [n for n, _ in kept]
                spec.bounds = [b for _, b in kept]
            else:
                kept = [
                    (n, v) for n, v in zip(spec.names, spec.bounds)
                    if n not in targets
                ]
                spec.names = [n for n, _ in kept]
                spec.bounds = [v for _, v in kept]
        mt._write(survivors)  # noqa: SLF001 — one copy-on-write version
        self._refresh_view(name)

    def _run_ddl(self, m: re.Match) -> None:
        """DROP / TRUNCATE / FLASHBACK TABLE (ddl/ddl_api.go; FlashBackTable
        restores a dropped or truncated table, parser/ast/ddl.go:3859).
        DROP keeps the files and stashes the handle so FLASHBACK can
        re-register it; TRUNCATE writes an empty version, so FLASHBACK
        restores the pre-truncate version from retained history."""
        verb = (m.group("dverb") or m.group("fverb")).upper()
        if verb in ("DROP", "TRUNCATE"):
            name = m.group("dtab")
            if m.group("ifex") and verb == "TRUNCATE":
                raise ValueError("TRUNCATE TABLE does not accept IF EXISTS")
            if name not in self.managed:
                if m.group("ifex"):
                    if name in self.tables:
                        # IF EXISTS does not make a read-only dataset view
                        # droppable — the existence check passed, so the
                        # drop itself must still fail (ddl/ddl_api.go
                        # DropTable: ifExists only forgives ABSENCE).
                        raise ValueError(
                            f"table {name!r} is a read-only dataset view; "
                            "only managed tables can be dropped"
                        )
                    # Absent table: a warning in MySQL (ddl_api.go DropTable
                    # ifExists path), a no-op here — but clear any stale
                    # per-table state a partial earlier registration may
                    # have left behind.
                    self._ci_cols_by_table.pop(name, None)
                    getattr(self, "_defaults_by_table", {}).pop(name, None)
                    try:
                        self.spark.catalog.dropTempView(name)
                    except Exception:
                        pass
                    return
                raise ValueError(f"table {name!r} is not a managed table")
            mt = self.managed[name]
            if verb == "DROP":
                del self.managed[name]
                del self.tables[name]
                self.spark.catalog.dropTempView(name)
                self._ci_cols_by_table.pop(name, None)
                self.dropped[name] = mt
            else:
                mt._pre_truncate_version = mt._version  # noqa: SLF001
                mt._write(mt.df().where(F.lit(False)))  # noqa: SLF001
                self._refresh_view(name)
            return
        name, new_name = m.group("ftab"), m.group("fnew")
        if name in self.dropped:
            mt = self.dropped.pop(name)
            target = new_name or name
            self.managed[target] = mt
            self._refresh_view(target)
            return
        mt = self.managed.get(name)
        pre = getattr(mt, "_pre_truncate_version", None) if mt else None
        if pre is None:
            raise ValueError(
                f"FLASHBACK TABLE {name}: table was neither dropped nor "
                "truncated (ERROR 1105: Can't find dropped/truncated table)"
            )
        mt._write(mt.read_version(pre))  # noqa: SLF001
        mt._pre_truncate_version = None
        self._refresh_view(name)

    def _run_dml(self, m: re.Match) -> DataFrame:
        """INSERT / REPLACE / UPDATE / DELETE statements → ManagedTable ops
        (executor/insert.go, replace.go, update.go, delete.go)."""
        verb = (m.group("iverb") or m.group("uverb") or m.group("dverb")).upper()
        name = m.group("itab") or m.group("utab") or m.group("dtab")
        if name not in self.managed:
            raise ValueError(
                f"table {name!r} is not writable; engine.create_table() "
                "creates a managed copy-on-write table"
            )
        mt = self.managed[name]
        if verb in ("INSERT", "REPLACE"):
            body = m.group("ibody").strip()
            odku = None
            om = _ODKU_RE.match(body)
            if om and verb == "INSERT":
                body, odku = om.group(1).strip(), om.group(2).strip()
            vm = re.match(r"(?is)^(?:\(([^)]*)\)\s*)?VALUES\s+(.*)$", body)
            csm = re.match(
                r"(?is)^\(([^)]*)\)\s*((?:SELECT|WITH|TABLE)\b.*)$", body
            )
            setm = re.match(r"(?is)^SET\s+(.*)$", body)
            if vm:
                if vm.group(1):
                    cols = [c.strip().strip("`") for c in vm.group(1).split(",")]
                else:
                    # Bare VALUES bind positionally to the NON-generated
                    # columns (MySQL requires DEFAULT placeholders for
                    # generated ones; omission is our equivalent).
                    cols = [
                        f.name
                        for f in mt.df().schema.fields
                        if f.name not in mt.generated
                    ]
                rows = self.spark.sql(
                    f"SELECT * FROM (VALUES {vm.group(2)}) AS "
                    f"__v({', '.join(cols)})"
                )
                full = self._bind_insert(mt, name, rows, cols)
            elif csm:
                # INSERT INTO t (c1, c2) SELECT … — the listed columns bind
                # positionally to the SELECT output, the rest take DEFAULT.
                cols = [c.strip().strip("`") for c in csm.group(1).split(",")]
                rows = self.spark.sql(csm.group(2))
                if len(rows.columns) != len(cols):
                    # MySQL ERROR 1136
                    raise ValueError(
                        f"Column count doesn't match value count: column "
                        f"list names {len(cols)}, SELECT supplies "
                        f"{len(rows.columns)}"
                    )
                full = self._bind_insert(mt, name, rows, cols)
            elif setm:
                # INSERT INTO t SET a = 1, b = 'x' (MySQL alternative
                # single-row form, parser/ast/dml.go Setlist).
                from tidb_spark.sqlshim.translate import _split_args

                cols, exprs = [], []
                for frag in _split_args(setm.group(1)):
                    col, expr = frag.split("=", 1)
                    cols.append(col.strip().strip("`"))
                    exprs.append(expr.strip())
                rows = self.spark.sql(
                    "SELECT "
                    + ", ".join(
                        f"({e}) AS `{c}`" for c, e in zip(cols, exprs)
                    )
                )
                full = self._bind_insert(mt, name, rows, cols)
            else:
                # Plain INSERT … SELECT binds positionally: the full table
                # arity for ordinary tables, the non-generated arity when
                # generated columns exist (supplying those is
                # ErrBadGeneratedColumn, as in the VALUES path).
                rows = self.spark.sql(body)
                fields = mt.df().schema.fields
                non_gen = [
                    f.name for f in fields if f.name not in mt.generated
                ]
                if mt.generated and len(rows.columns) != len(non_gen):
                    gen_name = next(iter(mt.generated))
                    raise ValueError(
                        f"The value specified for generated column "
                        f"{gen_name!r} in table {name!r} is not allowed"
                        f" (SELECT must supply exactly the "
                        f"{len(non_gen)} non-generated columns)"
                    )
                if not mt.generated and len(rows.columns) != len(fields):
                    # MySQL ERROR 1136
                    raise ValueError(
                        f"Column count doesn't match value count: "
                        f"table {name!r} has {len(fields)} columns, "
                        f"SELECT supplies {len(rows.columns)}"
                    )
                full = self._bind_insert(mt, name, rows, non_gen)
            if odku is not None:
                # ON DUPLICATE KEY UPDATE (executor/insert.go:43): in each
                # assignment, VALUES(col) is the incoming row, a bare column
                # the existing one — new_value()'s prefixed name implements
                # the former.
                from tidb_spark.sources.dml import _NEW_PREFIX
                from tidb_spark.sqlshim.translate import _split_args

                assignments = {}
                for frag in _split_args(odku):
                    col, expr = frag.split("=", 1)
                    assignments[col.strip().strip("`")] = F.expr(
                        _VALUES_REF_RE.sub(
                            lambda vm_: _NEW_PREFIX + vm_.group(1), expr.strip()
                        )
                    )
                mt.upsert(full, assignments)
            elif m.group("ignore") and verb == "INSERT":
                mt.insert_ignore(full)
            else:
                (mt.insert if verb == "INSERT" else mt.replace)(full)
        elif verb == "UPDATE":
            body = m.group("ubody")
            # Top-level-aware split: a WHERE inside a string literal or a
            # parenthesized subquery must not terminate the SET list
            # (e.g. SET note = 'WHERE x').
            parts = merge_clause._split_top_level(body, "WHERE")
            if len(parts) > 2:
                raise ValueError("UPDATE: multiple top-level WHERE clauses")
            where = F.expr(parts[1]) if len(parts) == 2 else F.lit(True)
            set_part = parts[0]
            from tidb_spark.sqlshim.translate import _split_args

            assignments = {}
            for frag in _split_args(set_part):  # string/paren-aware commas
                col, expr = frag.split("=", 1)
                cname = col.strip().strip("`")
                if cname in mt.generated:
                    raise ValueError(
                        f"The value specified for generated column "
                        f"{cname!r} in table {name!r} is not allowed"
                    )
                assignments[cname] = F.expr(expr.strip())
            mt.update(where, assignments)
        else:  # DELETE
            where = (
                F.expr(m.group("dwhere")) if m.group("dwhere") else F.lit(True)
            )
            mt.delete(where)
        self._refresh_view(name)
        return self.tables[name]

    def _run_multi_update(self, head: str, tail: str) -> DataFrame:
        """Multi-table UPDATE (MySQL ``UPDATE t1 JOIN t2 ON … SET t1.c =
        expr [WHERE …]``; executor/update.go multi-table path).  The first
        table in the join list is the write target (assignments may only
        name it); the join + WHERE select which rows update and the
        assignment expressions see the joined row.  Executes as: one SQL
        join producing (key, new values), then one keyed MERGE — two
        shuffles total, no driver-side rows."""
        from tidb_spark.sqlshim.translate import _split_args

        hm = re.match(r"(?is)^\s*`?(?P<tab>\w+)`?(?:\s+(?:AS\s+)?"
                      r"(?P<alias>(?!JOIN\b|INNER\b|LEFT\b|RIGHT\b)\w+))?",
                      head)
        name = hm.group("tab")
        alias = hm.group("alias") or name
        if name not in self.managed:
            raise ValueError(
                f"table {name!r} is not writable; engine.create_table() "
                "creates a managed copy-on-write table"
            )
        mt = self.managed[name]
        if not mt.key_cols:
            raise ValueError(
                f"multi-table UPDATE requires a PRIMARY KEY on {name!r}"
            )
        parts = merge_clause._split_top_level(tail, "WHERE")
        if len(parts) > 2:
            raise ValueError("UPDATE: multiple top-level WHERE clauses")
        set_list, where = parts[0], parts[1] if len(parts) == 2 else "TRUE"
        assignments: dict[str, str] = {}
        for frag in _split_args(set_list):
            col, expr = frag.split("=", 1)
            cname = col.strip().strip("`")
            if "." in cname:
                qual, cname = cname.split(".", 1)
                qual, cname = qual.strip("`"), cname.strip("`")
                if qual not in (name, alias):
                    # update.go: only the named target is writable here
                    raise ValueError(
                        f"multi-table UPDATE may only assign columns of "
                        f"{name!r} (got {qual}.{cname})"
                    )
            if cname in mt.generated:
                raise ValueError(
                    f"The value specified for generated column {cname!r} "
                    f"in table {name!r} is not allowed"
                )
            if cname in mt.key_cols:
                # The merge is keyed on these columns; rewriting the key in
                # the same pass is not expressible as one keyed MERGE.
                # MySQL allows it — reject loudly rather than silently
                # dropping the assignment.
                raise ValueError(
                    f"multi-table UPDATE cannot assign key column "
                    f"{cname!r} of {name!r}; use DELETE + INSERT"
                )
            assignments[cname] = expr.strip()
        key_sel = ", ".join(f"`{alias}`.`{k}` AS `{k}`" for k in mt.key_cols)
        set_sel = ", ".join(
            f"({e}) AS `{c}`"
            for c, e in assignments.items()
            if c not in mt.key_cols
        )
        src = self.spark.sql(
            f"SELECT {key_sel}{', ' + set_sel if set_sel else ''} "
            f"FROM {head} WHERE {where}"
        )
        # Determinism guard: when the join matches several source rows per
        # target key, MERGE's dropDuplicates would pick a partition-order-
        # dependent row.  Identical assignment rows collapse via DISTINCT;
        # genuinely conflicting ones are rejected loudly (the reference's
        # multi-table update is last-writer-wins nondeterministic,
        # executor/update.go — we keep the engine's deterministic
        # contract instead, like the key-column-assignment rejection).
        src = src.distinct()
        conflict = (
            src.groupBy(*[F.col(k) for k in mt.key_cols])
            .count()
            .where(F.col("count") > 1)
            .limit(1)
            .collect()  # control-plane-sized: at most one row
        )
        if conflict:
            raise ValueError(
                f"multi-table UPDATE matched multiple distinct assignment "
                f"rows for the same {name!r} key (e.g. "
                f"{tuple(conflict[0])[:-1]!r}); the result would be "
                "nondeterministic — aggregate the source first"
            )
        from tidb_spark.sources.dml import _NEW_PREFIX

        mt.merge(
            src,
            when_matched_update={
                c: F.col(_NEW_PREFIX + c)
                for c in assignments
                if c not in mt.key_cols
            },
            when_not_matched_insert=False,
        )
        self._refresh_view(name)
        return self.tables[name]

    def _run_multi_delete(self, target: str, src_clause: str) -> DataFrame:
        """Multi-table DELETE (MySQL ``DELETE t1 FROM t1 JOIN t2 ON …
        [WHERE …]``; executor/delete.go multi-table path): delete the
        target rows that participate in the join.  One SQL join selecting
        the doomed keys, one keyed MERGE with a delete action."""
        if target not in self.managed:
            raise ValueError(
                f"table {target!r} is not writable; engine.create_table() "
                "creates a managed copy-on-write table"
            )
        mt = self.managed[target]
        if not mt.key_cols:
            raise ValueError(
                f"multi-table DELETE requires a PRIMARY KEY on {target!r}"
            )
        key_sel = ", ".join(f"`{target}`.`{k}` AS `{k}`" for k in mt.key_cols)
        doomed = self.spark.sql(
            f"SELECT DISTINCT {key_sel} FROM {src_clause}"
        )
        mt.merge(
            doomed,
            when_matched_delete=F.lit(True),
            when_not_matched_insert=False,
        )
        self._refresh_view(target)
        return self.tables[target]

    def _run_merge(self, stmt) -> DataFrame:
        """MERGE INTO (sqlshim/merge_clause.py) → ``ManagedTable.merge``:
        the statement's three WHEN actions map 1:1 onto the operator's
        kwargs, so the whole statement still executes as ONE full-outer join
        on the keys plus a CASE projection — a single shuffle regardless of
        how many WHEN clauses appear.

        The source frame is canonicalized to the target schema first: key
        columns from the ON equalities, non-key columns from the INSERT
        mapping (falling back to same-named source columns, else NULL) —
        after which ``s.col`` in UPDATE/DELETE expressions is exactly the
        operator's ``VALUES(col)`` reference."""
        from tidb_spark.sources.dml import _NEW_PREFIX

        name = stmt.table
        if name not in self.managed:
            raise ValueError(
                f"table {name!r} is not writable; engine.create_table() "
                "creates a managed copy-on-write table"
            )
        mt = self.managed[name]
        if {k for k, _ in stmt.on_pairs} != set(mt.key_cols):
            raise ValueError(
                f"MERGE ON must equate exactly the key columns "
                f"{mt.key_cols} of {name!r}"
            )
        src = self.spark.sql(translate(stmt.source_sql))

        insert = next((c for c in stmt.clauses if c.action == "insert"), None)
        ins_map = (
            dict(zip(insert.insert_cols, insert.insert_vals))
            if insert is not None and insert.insert_cols is not None
            else {}
        )
        key_src = dict(stmt.on_pairs)
        # Original-source-name → canonical-target-name, for rewriting s.col
        # references in UPDATE/DELETE expressions after the projection below.
        src_to_target = {s: t for t, s in stmt.on_pairs}
        for tcol, vexpr in ins_map.items():
            vm = re.match(rf"(?is)^\s*(?:{stmt.salias}\.)?(\w+)\s*$", vexpr)
            if vm:
                src_to_target.setdefault(vm.group(1), tcol)
        projected = []
        for f_ in mt.df().schema.fields:
            if f_.name in ins_map:
                expr = merge_clause.strip_source_refs(
                    translate(ins_map[f_.name]), stmt.salias
                )
            elif f_.name in key_src:
                expr = key_src[f_.name]
            elif f_.name in src.columns:
                expr = f_.name
            else:
                expr = f"CAST(NULL AS {f_.dataType.simpleString()})"
            projected.append(F.expr(expr).alias(f_.name))
        src = src.select(*projected)

        def _rw(expr: str):
            return F.expr(
                merge_clause.rewrite_refs(
                    translate(expr),
                    stmt.talias,
                    stmt.salias,
                    _NEW_PREFIX,
                    src_to_target,
                )
            )

        # Standard MERGE is first-matching-clause-wins: a matched row is
        # consumed by the FIRST WHEN MATCHED clause whose AND-condition
        # holds, so a later clause only applies where every earlier clause's
        # condition failed.  We gate each clause with NOT(prior conditions);
        # duplicate UPDATE (or DELETE) clauses are rejected rather than
        # silently letting the last one overwrite the first.
        n_upd = sum(1 for c in stmt.clauses if c.action == "update")
        n_del = sum(1 for c in stmt.clauses if c.action == "delete")
        if n_upd > 1 or n_del > 1:
            raise ValueError(
                "MERGE: at most one WHEN MATCHED UPDATE and one WHEN MATCHED "
                "DELETE clause is supported"
            )
        when_update: dict | None = None
        when_delete = None
        prior_cond = None  # OR of earlier matched-clause conditions
        for c in stmt.clauses:
            if c.action not in ("update", "delete"):
                continue
            own = _rw(c.cond) if c.cond is not None else F.lit(True)
            eff = own if prior_cond is None else own & ~prior_cond
            conditional = c.cond is not None or prior_cond is not None
            if c.action == "update":
                when_update = {}
                for col, expr in c.assignments:
                    val = _rw(expr)
                    if conditional:
                        # Rows matching the key but not the effective
                        # condition keep their old value.
                        val = F.when(eff, val).otherwise(F.col(col))
                    when_update[col] = val
            else:
                when_delete = eff
            prior_cond = own if prior_cond is None else prior_cond | own

        mt.merge(
            src,
            when_matched_update=when_update,
            when_matched_delete=when_delete,
            when_not_matched_insert=insert is not None,
        )
        self._refresh_view(name)
        return self.tables[name]

    # -- query surface ------------------------------------------------------

    def sql(self, query: str, args: dict | list | None = None) -> DataFrame:
        """Execute one MySQL-dialect statement (with optional FROM MATCH).

        ``args`` binds named (``:name``) or positional (``?``) parameters —
        the prepared-statement surface (executor/prepared.go; the lowered
        text is plan-cached per statement + catalog epoch, Catalyst still
        re-plans per execution — see the _PREPARE_RE note)."""
        # Any statement that can change what LOWERING depends on — catalog
        # shape, managed-table data/partitions, graph schema, sequences,
        # sysvars — invalidates the plan cache by bumping the epoch
        # (plan_cache.go's schema-version check).  Conservative allowlist:
        # only read-shaped statements leave the epoch alone.
        # Statement-entry snapshot + reset for BOTH provenance flags
        # (sessionctx semantics: @@last_plan_from_* report the PREVIOUS
        # statement, so reads return the snapshot while the live flags
        # start False and are set only by the machinery this statement
        # actually exercises — EXECUTE's cache path, _apply_bindings).
        # Without the reset, a statement that never touches the plan
        # cache/bindings (or a lowering pass run after DROP BINDING
        # emptied the registry) would inherit — and with the r9 4-tuple,
        # permanently CACHE — a stale True from an older statement.
        self._prev_from_binding = self._last_plan_from_binding
        self._prev_from_cache = self._last_plan_from_cache
        self._last_plan_from_binding = False
        self._last_plan_from_cache = False
        if not _READONLY_STMT_RE.match(query):
            # SET @user_var is also epoch-neutral: statements reading
            # @vars are uncacheable outright, so no cached lowering can
            # depend on one.  SET @@sysvar / SET NAMES etc. still bump
            # (sysvars steer lowering, e.g. @@graph_topk_beam).
            if not re.match(r"(?is)^\s*SET\s+@[A-Za-z_]", query):
                self._catalog_epoch += 1
        # Direct-statement DataFrame cache (non-prepared plan cache): a
        # read-shaped statement the gates admit, re-issued at the same
        # catalog epoch, replays its already-analyzed DataFrame — the
        # ~20 regex passes, dialect lowering and Catalyst analysis run
        # once per (text, epoch).  Latency-only: execution still plans
        # (AQE) and computes from storage per run, and the provenance
        # flags are untouched (see _STMT_CACHE_SKIP_RE note).
        stmt_cacheable = False
        df_key = query  # the PRE-lowering text (`query` is rewritten below)
        if args is None and self._lower_capture is None and _CACHEABLE_HEAD_RE.match(query):
            _masked = merge_clause._STRING_RE.sub("''", query)
            stmt_cacheable = not (
                _CACHE_SKIP_RE.search(_masked)
                or _STMT_CACHE_SKIP_RE.search(_masked)
            )
            if stmt_cacheable:
                ent = self._stmt_df_cache.get(df_key)
                if ent is not None:
                    if ent[1] == self._catalog_epoch:
                        self._stmt_df_cache.move_to_end(df_key)
                        self._stmt_cache_hits += 1
                        return ent[0]
                    del self._stmt_df_cache[df_key]
        # MySQL: EXPLAIN <table> is an alias for DESCRIBE <table>
        # (parser treats them identically; executor/explain.go).
        tbl_m = re.match(r"(?is)^\s*EXPLAIN\s+`?(\w+)`?\s*;?\s*$", query)
        if tbl_m and tbl_m.group(1).upper() not in (
            "SELECT", "WITH", "TABLE", "VALUES", "ANALYZE", "FORMAT",
        ):
            return self.sql(f"DESC {tbl_m.group(1)}")
        xm = _EXPLAIN_STMT_RE.match(query)
        if xm:
            # Statement-form EXPLAIN [ANALYZE] [FORMAT=…] <stmt>
            # (executor/explain.go; MySQL returns the plan as ROWS, so the
            # text renders one line per row).  The body goes back through
            # sql() — dialect rewrites, MATCH lowering, hints all apply.
            body = xm.group("body")
            if xm.group("an"):
                text = self.explain_analyze(body)
            else:
                fmt = (xm.group("fmt") or "TREE").upper()
                if fmt == "JSON":
                    # MySQL FORMAT=JSON returns ONE row holding a JSON
                    # document; callers parse it (ADVICE r5 — tree text
                    # here broke them).  Spark's analogue is the
                    # optimized plan's TreeNode JSON serialization.
                    df = self.sql(body)
                    doc = (
                        df._jdf.queryExecution()  # noqa: SLF001
                        .optimizedPlan()
                        .toJSON()
                    )
                    return self.spark.createDataFrame(
                        [(doc,)], "plan string"
                    )
                mode = {
                    "TREE": "formatted",
                    "TRADITIONAL": "simple",
                    "BRIEF": "simple",
                    "VERBOSE": "extended",
                }.get(fmt)
                if mode is None:
                    raise ValueError(f"unknown EXPLAIN FORMAT {fmt!r}")
                text = self.explain(body, mode)
            return self.spark.createDataFrame(
                [(line,) for line in text.splitlines()], "plan string"
            )
        tm = _TOOL_STMT_RE.match(query)
        if tm:
            if tm.group("rollback"):
                # The engine runs autocommit single-statement semantics
                # (txn scope is out of OLAP scope per BASELINE) — BEGIN /
                # COMMIT are harmless no-ops under that model, but a
                # ROLLBACK promise cannot be honored, so it errors rather
                # than silently keeping the writes.
                raise ValueError(
                    "ROLLBACK is not supported: statements auto-commit "
                    "(no transaction scope in this engine)"
                )
            # SET NAMES / SET CHARACTER SET (always utf8mb4 here), USE (one
            # database), BEGIN/START TRANSACTION/COMMIT (autocommit), KILL
            # (no wire connections): accepted no-ops for client/BI-tool
            # compatibility, as the reference session layer does for
            # settings it ignores.
            return self.spark.range(0).select(F.lit("OK").alias("status"))
        sm = _SET_RE.match(query)
        if sm:
            return self._run_set(sm)
        cm = _CHECKSUM_RE.match(query)
        if cm:
            return self.checksum(cm.group(1))
        bm_ = _CREATE_BINDING_RE.match(query)
        if bm_:
            return self._run_create_binding(bm_)
        bdm = _DROP_BINDING_RE.match(query)
        if bdm:
            return self._run_drop_binding(bdm)
        pm = _PREPARE_RE.match(query)
        if pm:
            return self._run_prepare(pm)
        dm_ = _DEALLOC_RE.match(query)
        if dm_:
            return self._run_deallocate(dm_)
        em = _EXECUTE_RE.match(query)
        if em:
            return self._run_execute(em)
        csm = _CREATE_SEQ_RE.match(query)
        if csm:
            return self._run_create_sequence(csm)
        dsm = _DROP_SEQ_RE.match(query)
        if dsm:
            return self._run_drop_sequence(dsm)
        # Gate sequence-function handling on the CODE portion only: a
        # string literal that merely contains text like 'NEXTVAL(s)' must
        # not trigger substitution or the INSERT…SELECT rejection.
        _seq_masked = (
            merge_clause._STRING_RE.sub("''", query) if self.sequences else ""
        )
        if self.sequences and _SEQ_FUNC_RE.search(_seq_masked):
            if re.match(
                r"(?is)^\s*(?:INSERT|REPLACE)\b.*?\b(?:SELECT|WITH|TABLE)\b",
                _seq_masked,
            ):
                # Literal splicing would stamp every SELECT row with one
                # value; the reference allocates per row
                # (ddl/sequence.go allocator driven from
                # executor/insert_common.go) — take the batch-reserved
                # per-row path instead.
                return self._run_seq_insert_select(query)
            query = self._substitute_sequence_funcs(query)
        query = _SELECT_LOCK_RE.sub(r"\1", query)
        # Plan bindings fire before hint extraction so a binding-injected
        # /*+ hint */ flows through the normal hint path (bindinfo match
        # happens once — the substituted text continues linearly, no
        # re-dispatch, so a binding cannot loop on itself).
        if self.bindings and _CACHEABLE_HEAD_RE.match(query):
            query = self._apply_bindings(query)
        query, hints = self._extract_hints(query)
        # SELECT ... INTO @vars writes variables — split it off BEFORE the
        # read-side substitution pass turns the target @names into values.
        iv = self._match_into_vars(query)
        if iv is not None:
            return self._run_select_into_vars(*iv)
        query = self._substitute_user_vars(query)
        if re.match(r"(?is)^\s*(SHOW|DESC(?:RIBE)?\s+\w+\s*;?\s*$)", query):
            return self._run_show(query)
        vm = self._VIEW_RE.match(query)
        if vm:
            self._run_create_view(vm)
            return self.spark.range(0).select(F.lit("OK").alias("status"))
        dvm = self._DROP_VIEW_RE.match(query)
        if dvm:
            self._run_drop_view(dvm)
            return self.spark.range(0).select(F.lit("OK").alias("status"))
        if re.match(r"(?is)^\s*CREATE\s+TABLE\b", query):
            ctas = re.match(
                r"(?is)^\s*CREATE\s+TABLE\s+(?P<ine>IF\s+NOT\s+EXISTS\s+)?"
                r"`?(?P<name>\w+)`?\s+AS\s+(?P<sel>(?:SELECT|WITH|TABLE)\b.*)$",
                query,
            )
            if ctas:
                self._run_ctas(ctas)
                return self.spark.range(0).select(F.lit("OK").alias("status"))
            likem = re.match(
                r"(?is)^\s*CREATE\s+TABLE\s+(?P<ine>IF\s+NOT\s+EXISTS\s+)?"
                r"`?(?P<name>\w+)`?\s+LIKE\s+`?(?P<src>\w+)`?\s*;?\s*$",
                query,
            )
            if likem:
                self._run_create_like(likem)
                return self.spark.range(0).select(F.lit("OK").alias("status"))
            from tidb_spark.sqlshim import create_table as _ct

            self._run_create(_ct.parse(query))
            return self.spark.range(0).select(F.lit("OK").alias("status"))
        lm = self._LOAD_DATA_RE.match(query)
        if lm:
            return self._run_load_data(lm)
        om = self._INTO_OUTFILE_RE.match(query)
        if om:
            return self._run_into_outfile(om)
        if re.match(r"(?is)^\s*ALTER\s+TABLE\b", query):
            self._run_alter(query)
            return self.spark.range(0).select(F.lit("OK").alias("status"))
        zm = re.match(
            r"(?is)^\s*OPTIMIZE\s+(?:TABLE\s+)?`?(?P<tab>\w+)`?\s+"
            r"ZORDER\s+BY\s*\((?P<cols>[^)]*)\)\s*;?\s*$",
            query,
        )
        if zm:
            # OPTIMIZE t ZORDER BY (a, b) — lakehouse layout extension
            # (Delta syntax); multi-dimensional clustering so parquet
            # row-group stats prune on every listed column.
            mt = self.managed.get(zm.group("tab"))
            if mt is None:
                raise ValueError(
                    f"OPTIMIZE ZORDER: {zm.group('tab')!r} is not a "
                    "managed table"
                )
            mt.optimize_zorder(
                [c.strip().strip("`") for c in zm.group("cols").split(",")]
            )
            self._refresh_view(zm.group("tab"))
            return self.spark.range(0).select(F.lit("OK").alias("status"))
        rnm = re.match(
            r"(?is)^\s*RENAME\s+TABLE\s+(?P<body>.+?)\s*;?\s*$", query
        )
        if rnm:
            # RENAME TABLE a TO b [, c TO d] (ddl/ddl_api.go RenameTable):
            # each pair reuses the ALTER ... RENAME TO path, so managed
            # tables move storage-level and registered views re-alias.
            for pair in rnm.group("body").split(","):
                pm = re.match(
                    r"(?is)^\s*`?(\w+)`?\s+TO\s+`?(\w+)`?\s*$", pair
                )
                if not pm:
                    raise ValueError(
                        f"RENAME TABLE: cannot parse pair {pair.strip()!r}"
                    )
                self._run_alter(
                    f"ALTER TABLE {pm.group(1)} RENAME TO {pm.group(2)}"
                )
            return self.spark.range(0).select(F.lit("OK").alias("status"))
        query = self._rewrite_infoschema(query)
        if re.search(
            r"(?is)\bWITH\s+QUERY\s+EXPANSION\b",
            merge_clause._STRING_RE.sub("''", query),
        ):
            query = self._expand_fulltext_query(query)
        query = translate(query)
        ddl = _DDL_RE.match(query)
        if ddl:
            self._run_ddl(ddl)
            return self.spark.range(0).select(F.lit("OK").alias("status"))
        um = re.match(r"(?is)^\s*UPDATE\s+(?P<rest>.+)$", query)
        if um:
            head_tail = merge_clause._split_top_level(um.group("rest"), "SET")
            if len(head_tail) == 2 and re.search(
                r"(?is)\bJOIN\b", head_tail[0]
            ):
                return self._run_multi_update(head_tail[0], head_tail[1])
        dmm = re.match(
            r"(?is)^\s*DELETE\s+`?(?P<tgt>\w+)`?\s+FROM\s+(?P<src>.+?)"
            r"\s*;?\s*$",
            query,
        )
        if dmm:
            return self._run_multi_delete(dmm.group("tgt"), dmm.group("src"))
        dm = _DML_RE.match(query)
        if dm and dm.group(0):
            return self._run_dml(dm)
        ms = merge_clause.parse(query)
        if ms is not None:
            return self._run_merge(ms)
        if re.match(r"(?is)^\s*WITH\s+RECURSIVE\b", query):
            from tidb_spark.sqlshim import recursive_cte as _rc

            rc_stmt = _rc.parse(query)
            if rc_stmt is not None:
                return self._run_recursive_cte(rc_stmt)
        query = self._rewrite_as_of(query)
        query = self._rewrite_tablesample(query)
        query = self._rewrite_partition_selection(query)
        query = self._apply_static_pruning(query)
        query = self._apply_ci_collation(query)
        if _JSON_TABLE_GATE_RE.search(merge_clause._STRING_RE.sub("''", query)):
            from tidb_spark.sqlshim import json_table as _jt

            query = _jt.lower(query)
        if re.search(
            r"(?i)\b(ALL|ANY|SOME)\s*\(\s*SELECT\b",
            merge_clause._STRING_RE.sub("''", query),
        ):
            from tidb_spark.sqlshim import quantified as _qt

            query = _qt.lower(query)
        query = self._inject_hints(query, hints)
        parsed = mc.find_and_parse(query)
        if parsed is not None:
            start, end, paths = parsed
            if len(paths) > 1:
                # Comma multi-path: UNION ALL of the per-path join chains
                # (buildGraph, logical_plan_builder.go:6484-6506).
                query = mc.lower_multi_statement(
                    self.graph, query, start, end, paths
                )
            else:
                path = paths[0]
                if path.shortest:
                    replacement, preds = self._lower_any_shortest(path)
                else:
                    replacement, preds = mc.lower_simple_path(self.graph, path)
                query = mc.splice(query, start, end, replacement, preds)
        if args is not None:
            return self.spark.sql(query, args)
        if self._lower_capture is not None:
            # Plan-cache lowering pass (_lower_for_cache): record the final
            # Spark SQL and skip execution — the :pN markers in it are not
            # yet bound.
            self._lower_capture.append(query)
            return self.spark.range(0).select(F.lit("LOWERED").alias("status"))
        df = self.spark.sql(query)
        # Binding-lowered statements stay UNCACHED: a cache hit would skip
        # _apply_bindings and leave @@last_plan_from_binding stale for the
        # re-issue (the flag is per-statement observability the tests pin).
        if stmt_cacheable and not self._last_plan_from_binding:
            self._stmt_df_cache[df_key] = (df, self._catalog_epoch)
            self._stmt_df_cache.move_to_end(df_key)
            while len(self._stmt_df_cache) > _STMT_CACHE_CAP:
                self._stmt_df_cache.popitem(last=False)
        return df

    _PARTSEL_RE = re.compile(
        r"(?is)\b(FROM|JOIN)\s+`?(\w+)`?\s+PARTITION\s*\(([^)]*)\)"
        r"(?:\s+(?:AS\s+)?(?!WHERE\b|GROUP\b|ORDER\b|LIMIT\b|JOIN\b|ON\b"
        r"|LEFT\b|RIGHT\b|INNER\b|FULL\b|CROSS\b|UNION\b|HAVING\b|AS\b)"
        r"(\w+))?"
    )

    def _rewrite_partition_selection(self, query: str) -> str:
        """MySQL's explicit partition selection — ``SELECT … FROM t
        PARTITION (p0, p1)`` (planner/core/rule_partition_processor.go
        honors the same syntax): replace with a temp view scanning only
        those directories, so the parquet scan carries PartitionFilters."""

        def repl(m: re.Match) -> str:
            kw, name, plist, alias = m.groups()
            mt = self.managed.get(name)
            if mt is None or mt.partition_spec is None:
                raise ValueError(
                    f"PARTITION selection on non-partitioned table {name!r}"
                )
            parts = [p.strip().strip("`") for p in plist.split(",") if p.strip()]
            self._tmp_view_n += 1
            view = f"__psel_{name}_{self._tmp_view_n}"
            mt.scan_partitions(parts).createOrReplaceTempView(view)
            return f"{kw} {view} AS {alias or name}"

        return self._PARTSEL_RE.sub(repl, query)

    def _apply_static_pruning(self, query: str) -> str:
        """Static partition pruning for the single-table SELECT case: when
        the (only) FROM references a partitioned managed table and the WHERE
        carries simple AND-connected predicates on the partition column,
        swap in a view over just the matching partitions
        (rule_partition_processor.go's static prune).  Anything the
        conservative matcher can't prove keeps the full scan — always
        correct, just unpruned."""
        if len(re.findall(r"(?i)\bFROM\b", query)) != 1:
            return query
        m = re.search(r"(?is)\bFROM\s+`?(\w+)`?\s+WHERE\s+(.*)$", query)
        if m is None:
            return query
        name = m.group(1)
        mt = self.managed.get(name)
        if mt is None or mt.partition_spec is None:
            return query
        where = re.split(
            r"(?is)\b(?:GROUP\s+BY|ORDER\s+BY|LIMIT)\b", m.group(2)
        )[0]
        parts = mt.partition_spec.prune_where(where)
        if parts is None or set(parts) == set(mt.partitions()):
            return query
        self._tmp_view_n += 1
        view = f"__prune_{name}_{self._tmp_view_n}"
        mt.scan_partitions(parts).createOrReplaceTempView(view)
        return (
            query[: m.start()]
            + f"FROM {view} AS {name} WHERE "
            + m.group(2)
        )

    # -- LOAD DATA / SELECT INTO OUTFILE statements (executor/load_data.go:46,
    # executor/select_into.go:33) ------------------------------------------

    _LOAD_DATA_RE = re.compile(
        r"(?is)^\s*LOAD\s+DATA\s+(?:LOCAL\s+)?INFILE\s+'(?P<path>[^']+)'\s+"
        r"INTO\s+TABLE\s+`?(?P<table>\w+)`?"
        r"(?:\s+FIELDS(?:\s+TERMINATED\s+BY\s+'(?P<sep>[^']*)')?"
        r"(?:\s+ENCLOSED\s+BY\s+'(?P<quote>[^']*)')?"
        r"(?:\s+ESCAPED\s+BY\s+'(?P<esc>[^']*)')?)?"
        r"(?:\s+IGNORE\s+(?P<skip>\d+)\s+LINES)?\s*;?\s*$"
    )
    _INTO_OUTFILE_RE = re.compile(
        r"(?is)^\s*(?P<select>SELECT\b.*?)\s+INTO\s+OUTFILE\s+'(?P<path>[^']+)'"
        r"(?:\s+FIELDS(?:\s+TERMINATED\s+BY\s+'(?P<sep>[^']*)')?"
        r"(?:\s+ENCLOSED\s+BY\s+'(?P<quote>[^']*)')?"
        r"(?:\s+ESCAPED\s+BY\s+'(?P<esc>[^']*)')?)?\s*;?\s*$"
    )

    # INTO var-list sits either before FROM (the classic MySQL position)
    # or at statement end.
    _INTO_VARS_RE = re.compile(
        r"(?is)^\s*(?P<select>SELECT\b.*?)\s+INTO\s+"
        r"(?P<vars>@\w+(?:\s*,\s*@\w+)*)(?P<tail>\s+FROM\b.*?)?\s*;?\s*$"
    )

    def _match_into_vars(self, query: str):
        """``SELECT ... INTO @a[, @b]`` (executor/set.go UserVars write
        side; MySQL SELECT ... INTO var_list).  Matched against a
        length-preserving literal mask so an INTO inside a string can't
        trigger, then sliced from the original text."""
        masked = merge_clause._STRING_RE.sub(
            lambda m: "'" + " " * (len(m.group(0)) - 2) + "'", query
        )
        m = self._INTO_VARS_RE.match(masked)
        if m is None:
            return None
        select_sql = query[m.start("select") : m.end("select")]
        if m.group("tail"):
            select_sql += query[m.start("tail") : m.end("tail")]
        names = [
            v.strip().lstrip("@")
            for v in query[m.start("vars") : m.end("vars")].split(",")
        ]
        return select_sql, names

    def _run_select_into_vars(
        self, select_sql: str, names: list[str]
    ) -> DataFrame:
        rows = self.sql(select_sql).limit(2).collect()
        if len(rows) > 1:
            raise ValueError(
                "SELECT INTO: result consisted of more than one row "
                "(MySQL error 1172)"
            )
        if rows:
            row = rows[0]
            if len(row) != len(names):
                raise ValueError(
                    f"SELECT INTO: {len(row)} columns into {len(names)} "
                    "variables (MySQL error 1222)"
                )
            for name, val in zip(names, row):
                self.user_vars[name] = _sql_literal(val)
        # MySQL: zero rows leaves the variables unchanged (with a warning).
        return self.spark.range(0).select(F.lit("OK").alias("status"))

    def _run_load_data(self, m: re.Match) -> DataFrame:
        """LOAD DATA INFILE … INTO TABLE t: distributed CSV scan with the
        MySQL field options, appended through ManagedTable.insert — so
        ENUM/SET domains, generated columns, AUTO_INCREMENT, and write
        versioning all apply to bulk ingest exactly as to INSERT."""
        from tidb_spark.sources import csvio

        name = m.group("table")
        mt = self.managed.get(name)
        if mt is None:
            raise ValueError(
                f"LOAD DATA target {name!r} is not a managed table"
            )
        schema = mt.df().schema
        rows = csvio.load_data(
            self.spark,
            m.group("path"),
            schema,
            terminated_by=m.group("sep") or ",",
            enclosed_by=m.group("quote") or '"',
            escaped_by=m.group("esc") or "\\",
            ignore_lines=int(m.group("skip") or 0),
        )
        mt.insert(rows)
        self._refresh_view(name)
        n = self.tables[name].count()
        return self.spark.createDataFrame([(f"Records: {n}",)], "status string")

    def _run_into_outfile(self, m: re.Match) -> DataFrame:
        """SELECT … INTO OUTFILE 'path': run the SELECT through the full
        pipeline, write CSV distributed (one file per partition)."""
        from tidb_spark.sources import csvio

        df = self.sql(m.group("select"))
        csvio.select_into_outfile(
            df,
            m.group("path"),
            terminated_by=m.group("sep") or ",",
            enclosed_by=m.group("quote") or '"',
            escaped_by=m.group("esc") or "\\",
        )
        return self.spark.range(0).select(F.lit("OK").alias("status"))

    def _expand_fulltext_query(self, query: str) -> str:
        """MATCH ... AGAINST('q' [IN NATURAL LANGUAGE MODE] WITH QUERY
        EXPANSION) — blind relevance feedback, statement level.

        The reference parses the modifier (parser/ast/dml.go
        FulltextSearchModifier) but executes no fulltext at all; MySQL's
        InnoDB implementation seeds a second natural-language pass with
        terms from the best first-pass rows.  Deterministic documented
        algorithm here: (1) first pass = natural-language score of the
        original query over the FROM table, top 20 rows by (score DESC,
        document text) — a bounded control-plane collect; (2) expansion
        terms = the 10 highest-document-frequency tokens of those rows
        ([a-z]{4,} on the lowercased text, original-query terms
        excluded, ties alphabetical); (3) the AGAINST argument is
        rewritten to the original query plus the expansion terms in
        plain natural-language mode and lowering proceeds normally.
        Restricted to statements whose FROM is a single named table —
        anything else raises loudly."""
        from tidb_spark.sqlshim import fulltext as _ft

        destrung = merge_clause._STRING_RE.sub(
            lambda m: "'" + " " * (len(m.group(0)) - 2) + "'", query
        )
        froms = re.findall(r"(?is)\bFROM\s+(`?\w+`?)(?:\s|$)", destrung)
        tables = {f.strip("`") for f in froms}
        if len(tables) != 1 or re.search(r"(?is)\bJOIN\b", destrung):
            raise ValueError(
                "MATCH AGAINST WITH QUERY EXPANSION requires a single-table "
                "FROM (the feedback pass samples that table)"
            )
        table = tables.pop()
        pos = 0
        while True:
            m = _ft._MATCH_RE.search(query, pos)
            if m is None:
                return query
            open_idx = query.index("(", m.end() - 1)
            close_idx = _ft._find_closing(query, open_idx)
            after = query[close_idx + 1 :]
            ag = re.match(r"(?is)^\s*AGAINST\s*\(", after)
            if not ag:
                pos = close_idx + 1
                continue
            ag_open = close_idx + 1 + ag.end() - 1
            ag_close = _ft._find_closing(query, ag_open)
            against = query[ag_open + 1 : ag_close]
            am = re.match(
                r"(?is)^\s*(?P<q>'(?:[^'\\]|\\.|'')*')\s*(?P<mod>.*)$", against
            )
            if not am or not re.search(
                r"(?is)\bWITH\s+QUERY\s+EXPANSION\s*$", am.group("mod")
            ):
                pos = ag_close + 1
                continue
            lit = am.group("q")  # quoted literal, reused verbatim
            cols = query[open_idx + 1 : close_idx]
            doc = "CONCAT_WS(' ', " + ", ".join(
                f"COALESCE({c.strip()}, '')" for c in cols.split(",")
            ) + ")"
            seed = self.sql(
                f"SELECT {doc} AS __doc, MATCH({cols}) AGAINST({lit}) AS __rel "
                f"FROM {table} WHERE MATCH({cols}) AGAINST({lit}) "
                f"ORDER BY __rel DESC, __doc LIMIT 20"
            ).collect()
            orig = lit[1:-1]
            orig_terms = set(re.findall(r"[a-z0-9]+", orig.lower()))
            df_count: dict[str, int] = {}
            # Document frequency counts DISTINCT documents, not seed rows:
            # the pinned oracle dedups via SELECT DISTINCT text, tk, so two
            # seed rows with identical text must contribute once.
            # (subscript, not attribute: r.__doc would name-mangle here)
            for doc in {r["__doc"] for r in seed}:
                for tk in set(re.findall(r"[a-z]{4,}", (doc or "").lower())):
                    if tk not in orig_terms:
                        df_count[tk] = df_count.get(tk, 0) + 1
            top = sorted(df_count.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
            expanded = (orig + " " + " ".join(tk for tk, _ in top)).strip()
            repl = f"AGAINST('{expanded}')"
            start = close_idx + 1 + ag.start()
            query = query[:start] + repl + query[ag_close + 1 :]
            pos = start + len(repl)

    # -- INFORMATION_SCHEMA (executor/infoschema_reader.go — the reference
    # serves these as memtable scans; here they are small DataFrames
    # rebuilt from catalog state at reference time) ------------------------

    _IS_RE = re.compile(r"(?i)\binformation_schema\s*\.\s*(tables|columns)\b")

    def _rewrite_infoschema(self, query: str) -> str:
        """SELECTs over information_schema.tables / .columns: refresh the
        backing temp views from live catalog state, then point the query at
        them.  MySQL-shaped uppercase column names; Spark's case-insensitive
        resolution accepts either case in user predicates."""
        if not self._IS_RE.search(query):
            return query
        trows = [("tidb_spark", t, "BASE TABLE") for t in sorted(self.tables)]
        trows += [("tidb_spark", v, "VIEW") for v in sorted(self.views)]
        self.spark.createDataFrame(
            trows, "TABLE_SCHEMA string, TABLE_NAME string, TABLE_TYPE string"
        ).createOrReplaceTempView("__is_tables")
        crows = []
        for t in sorted(self.tables):
            for i, f in enumerate(self.tables[t].schema.fields, 1):
                crows.append(
                    (
                        "tidb_spark",
                        t,
                        f.name,
                        i,
                        f.dataType.simpleString(),
                        "YES" if f.nullable else "NO",
                    )
                )
        self.spark.createDataFrame(
            crows,
            "TABLE_SCHEMA string, TABLE_NAME string, COLUMN_NAME string, "
            "ORDINAL_POSITION int, DATA_TYPE string, IS_NULLABLE string",
        ).createOrReplaceTempView("__is_columns")
        return self._IS_RE.sub(lambda m: f"__is_{m.group(1).lower()}", query)

    # -- Views (planner/core/planbuilder.go:411,498 buildCreateView /
    # isCreateView; executor/ddl.go view lifecycle) ------------------------

    _VIEW_RE = re.compile(
        r"(?is)^\s*CREATE\s+(?P<replace>OR\s+REPLACE\s+)?VIEW\s+"
        r"`?(?P<name>\w+)`?\s*(?:\((?P<cols>[^)]*)\))?\s*AS\s+(?P<body>.+?)\s*;?\s*$"
    )
    _DROP_VIEW_RE = re.compile(
        r"(?is)^\s*DROP\s+VIEW\s+(?P<ifex>IF\s+EXISTS\s+)?`?(?P<name>\w+)`?\s*;?\s*$"
    )

    def _run_create_view(self, m: re.Match) -> None:
        """CREATE [OR REPLACE] VIEW name [(cols)] AS select.

        The defining SELECT goes through the full engine pipeline (dialect
        translation, MATCH lowering, …), and the resulting *unevaluated*
        DataFrame plan is registered as a temp view — like the reference,
        the view expands into each consumer's plan at build time; nothing is
        materialized."""
        name, body = m.group("name"), m.group("body")
        if not m.group("replace") and (
            name in self.views
            or name in self.tables
            or name in self.managed
            or self.spark.catalog.tableExists(name)
        ):
            # ddl.go returns ErrTableExists for a live name without OR REPLACE.
            raise ValueError(f"CREATE VIEW: table or view {name!r} already exists")
        if (
            m.group("replace")
            and name not in self.views
            and (name in self.tables or name in self.managed)
        ):
            # MySQL: OR REPLACE may only replace a VIEW, never shadow a base
            # table (ErrWrongObject "is not VIEW").
            raise ValueError(f"CREATE OR REPLACE VIEW: {name!r} is not a VIEW")
        df = self.sql(body)
        cols = (
            [c.strip().strip("`") for c in m.group("cols").split(",") if c.strip()]
            if m.group("cols")
            else None
        )
        if cols:
            if len(cols) != len(df.columns):
                # planbuilder.go: ErrViewWrongList
                raise ValueError(
                    "CREATE VIEW: column list length "
                    f"{len(cols)} != SELECT arity {len(df.columns)}"
                )
            df = df.toDF(*cols)
        df.createOrReplaceTempView(name)
        self.views[name] = body.strip()
        self._view_cols[name] = cols

    def _run_drop_view(self, m: re.Match) -> None:
        name = m.group("name")
        if name not in self.views:
            if m.group("ifex"):
                return
            # executor/ddl.go: dropping a non-view / unknown name errors
            # (ErrWrongObject for base tables).
            kind = "table" if (name in self.tables or name in self.managed) else "view"
            raise ValueError(f"DROP VIEW: {name!r} is not a known view ({kind})")
        self.spark.catalog.dropTempView(name)
        del self.views[name]
        self._view_cols.pop(name, None)

    # -- Optimizer hints (util/hint/, planner/optimize.go hint binding) ----
    #
    # The reference parses /*+ ... */ into per-statement hint sets.  Here:
    # join-method hints with a Spark equivalent are rewritten into Spark's
    # own hint comment (honored by Catalyst); everything else (LEADING,
    # USE_INDEX, MEMORY_QUOTA, READ_FROM_STORAGE, …) is recognized and
    # stripped — matching the reference's behavior for hints that don't
    # apply to the chosen plan (a warning, never an error).

    _HINT_BLOCK_RE = re.compile(r"/\*\+(?P<body>.*?)\*/", re.S)
    _HINT_MAP = {
        "BROADCAST_JOIN": "BROADCAST",
        "BC_JOIN": "BROADCAST",
        "TIDB_BCJ": "BROADCAST",
        "INL_JOIN": "BROADCAST",  # index nested-loop ≈ broadcast small side
        "TIDB_INLJ": "BROADCAST",
        "INL_HASH_JOIN": "BROADCAST",
        "INL_MERGE_JOIN": "BROADCAST",
        "HASH_JOIN": "SHUFFLE_HASH",
        "TIDB_HJ": "SHUFFLE_HASH",
        "MERGE_JOIN": "MERGE",
        "TIDB_SMJ": "MERGE",
    }

    def _extract_hints(self, query: str) -> tuple[str, list[str]]:
        """Strip every /*+ ... */ block, returning Spark-translatable hints."""
        hints: list[str] = []

        def collect(m: re.Match) -> str:
            for h in re.finditer(r"(\w+)\s*(?:\(([^()]*)\))?", m.group("body")):
                hname, args = h.group(1).upper(), h.group(2)
                mapped = self._HINT_MAP.get(hname)
                if mapped and args:
                    # Drop @query_block qualifiers (hint/hint.go QB syntax:
                    # "@sel_1 t1" qualifies the table that follows it).
                    tables = []
                    for tok in args.split(","):
                        words = [
                            w.strip("`")
                            for w in tok.split()
                            if not w.startswith("@")
                        ]
                        tables.extend(words)
                    if tables:
                        hints.append(f"{mapped}({', '.join(tables)})")
            return " "

        return self._HINT_BLOCK_RE.sub(collect, query), hints

    _SQL_STR = r"'(?:[^'\\]|\\.|'')*'"

    def _apply_ci_collation(self, query: str) -> str:
        """Opt-in declared-collation shim (util/collate/; the reference
        carries full MySQL collations, used throughout expression/).
        Columns declared ``COLLATE <name>`` compare, sort, and group
        through the collation's key function, dispatched per kind
        (engine `_COLLATION_KINDS`, mirroring the reference's
        newCollatorMap, util/collate/collate.go:355):

        - ``general``: exact utf8mb4_general_ci weights
          (functions/collation.py — NFD-base-uppercase translate);
        - ``unicode``: exact utf8mb4_unicode_ci UCA 4.0.0 primary
          weights (functions/collation_unicode.py — expansions ß='ss',
          ignorable marks, kana fold);
        - ``gbk``: exact gbk_chinese_ci sort keys — MySQL's hand-curated
          pinyin-major table (functions/collation_gbk.py, verified
          against the reference's gbk_chinese_ci_data.go for all 65536
          entries; the 21k-pair translate is inlined, not a SQL macro,
          because Spark 4.1 rejects SQL UDFs inside Sort);
        - ``bin``: PAD SPACE only (binPaddingCollator — rtrim).

        Rewritten contexts: ``col <op> 'literal'`` (and reversed), ``col
        IN (...)``/``BETWEEN``, ``col = col`` when both share a
        collation kind (mixed kinds raise, MySQL's "illegal mix of
        collations"), ``col`` tokens inside the top-level ORDER BY, and
        GROUP BY folding: ``GROUP BY col`` becomes ``GROUP BY
        key(col)`` with ``min(col)`` projected as the deterministic
        group representative (MySQL returns an arbitrary member's case).
        LIKE uses the NO PAD key variant — ``col LIKE 'abc '`` must not
        match ``'abc'`` even though ``=`` does (MySQL LIKE is NO PAD).

        Resolution is BLOCK-SCOPED: each parenthesized SELECT/WITH
        subquery resolves against its own FROM/JOIN/UPDATE/INTO list
        (including comma-separated FROM items), falling back to the
        enclosing block's references (correlation); an outer table's
        ``name`` stays binary while a subquery's _ci ``name`` folds in
        the same statement.  Qualified references always resolve
        exactly; a derived table's projection does not propagate its
        source collation (resolver-level feature, documented gap)."""
        if not self._ci_cols_by_table:
            return query
        # Mask string literals first: a literal containing "name = name"
        # must never be rewritten, and the table-reference scan must not
        # see FROM/JOIN inside a literal.
        lits: list[str] = []

        def stash(m: re.Match) -> str:
            lits.append(m.group(0))
            return f"\x00{len(lits) - 1}\x00"

        masked = merge_clause._STRING_RE.sub(stash, query)
        masked = self._ci_rewrite_block(masked, {})
        return re.sub(
            r"\x00(\d+)\x00", lambda m: lits[int(m.group(1))], masked
        )

    _CI_KW = (
        "WHERE|GROUP|ORDER|LIMIT|HAVING|JOIN|ON|USING|LEFT|RIGHT|INNER"
        "|FULL|CROSS|UNION|INTERSECT|EXCEPT|SET|PARTITION|MATCH|SELECT"
        "|VALUES|WINDOW"
    )

    def _ci_rewrite_block(
        self, text: str, parent_refs: dict[str, str]
    ) -> str:
        """Rewrite one query block (string literals already masked).
        Nested parenthesized SELECT/WITH blocks are recursed into with
        this block's references as their enclosing scope, and hidden
        from this block's own reference scan and clause rewrites."""
        # --- extract nested subquery blocks -> \x02N\x02 markers ---
        subs: list[str] = []
        out: list[str] = []
        i = 0
        opener = re.compile(r"(?is)\(\s*(?:SELECT|WITH)\b")
        while i < len(text):
            m = opener.search(text, i)
            if not m:
                out.append(text[i:])
                break
            out.append(text[i : m.start()])
            depth, j = 0, m.start()
            while j < len(text):
                if text[j] == "(":
                    depth += 1
                elif text[j] == ")":
                    depth -= 1
                    if depth == 0:
                        break
                j += 1
            inner = text[m.start() + 1 : j]
            subs.append(inner)
            out.append(f"(\x02{len(subs) - 1}\x02)")
            i = j + 1
        residue = "".join(out)

        # --- this block's table references (qualifier -> table) ---
        refs: dict[str, str] = dict(parent_refs)
        item_re = re.compile(r"`?(\w+)`?")
        alias_re = re.compile(
            rf"\s+(?:AS\s+)?`?(?!(?:{self._CI_KW}|AS|FROM|INTO|UPDATE)\b)"
            rf"(\w+)`?",
            re.I,
        )
        marker_re = re.compile(r"\x02\d+\x02")
        for kw in re.finditer(
            r"(?is)\b(FROM|JOIN|UPDATE|INTO)\s+", residue
        ):
            pos = kw.end()
            allow_comma = kw.group(1).upper() in ("FROM", "UPDATE")
            while True:
                mm = re.compile(r"\(?\s*").match(residue, pos)
                pos = mm.end()
                mk = marker_re.match(residue, pos)
                tab = None
                if mk:
                    pos = mk.end()
                    mm = re.compile(r"\s*\)").match(residue, pos)
                    if mm:
                        pos = mm.end()
                else:
                    it = item_re.match(residue, pos)
                    if not it:
                        break
                    tab = it.group(1)
                    pos = it.end()
                am = alias_re.match(residue, pos)
                alias = None
                if am:
                    alias = am.group(1)
                    pos = am.end()
                if tab is not None and tab in self._ci_cols_by_table:
                    refs[tab] = tab
                    if alias:
                        refs[alias] = tab
                cm = re.compile(r"\s*,").match(residue, pos)
                if allow_comma and cm:
                    pos = cm.end()
                    continue
                break

        # recurse into subqueries with this block's refs as outer scope
        subs = [self._ci_rewrite_block(s, refs) for s in subs]

        own = {
            t for t in set(refs.values()) if t in self._ci_cols_by_table
        }
        if not own:
            return re.sub(
                r"\x02(\d+)\x02",
                lambda m: subs[int(m.group(1))],
                residue,
            )
        active: dict[str, set[str]] = {}
        for t in own:
            for c, kind in self._ci_cols_by_table[t].items():
                active.setdefault(c, set()).add(kind)

        def _kind(qualifier: str | None, col: str) -> str | None:
            """Collation kind this (qualifier, col) reference binds to,
            or None for a binary reference."""
            if qualifier:
                t = refs.get(qualifier)
                if t is None or t not in self._ci_cols_by_table:
                    return None
                return self._ci_cols_by_table[t].get(col)
            kinds = active.get(col)
            if not kinds:
                return None
            if len(kinds) > 1:
                raise ValueError(
                    f"ambiguous collation for column {col!r}: referenced "
                    f"tables declare it with different collations — "
                    f"qualify the reference"
                )
            return next(iter(kinds))

        def _key(kind: str, operand: str, pad: bool = True) -> str:
            from tidb_spark.functions.collation import general_ci_key_sql
            from tidb_spark.functions.collation_gbk import gbk_ci_key_sql
            from tidb_spark.functions.collation_unicode import (
                unicode_ci_key_sql,
            )

            if kind == "general":
                return general_ci_key_sql(operand, pad=pad)
            if kind == "unicode":
                return unicode_ci_key_sql(operand, pad=pad)
            if kind == "gbk":
                return gbk_ci_key_sql(operand, pad=pad)
            if kind == "pinyin":
                # Reference parity: the collator is a panic stub
                # (util/collate/pinyin_tidb_as_cs.go:22-33 — Compare/Key
                # panic("implement me")); DDL accepts the name, use fails.
                raise NotImplementedError(
                    "collation 'utf8mb4_zh_pinyin_tidb_as_cs' has no "
                    "comparison semantics to implement: the reference's "
                    "collator is an unimplemented panic stub with no "
                    "weight data (pinyin_tidb_as_cs.go) — refusing to "
                    "invent an ordering"
                )
            return f"rtrim({operand})" if pad else operand  # bin

        ph = r"\x00\d+\x00"
        cols = "|".join(re.escape(c) for c in sorted(active))
        qual = rf"(?:(?P<q{{0}}>\w+)\.)?(?P<c{{0}}>{cols})"
        ops = r"(?:=|<>|!=|<=|>=|<|>|(?i:LIKE))"

        def _tok(m: re.Match, n: int) -> str:
            q = m.group(f"q{n}")
            return (f"{q}." if q else "") + m.group(f"c{n}")

        # col <op> 'lit'  /  'lit' <op> col  (literals are placeholders)
        def _cl(m: re.Match) -> str:
            kind = _kind(m.group("q0"), m.group("c0"))
            if kind is None:
                return m.group(0)
            pad = m.group("op").upper() != "LIKE"
            return (
                f"{_key(kind, _tok(m, 0), pad)} {m.group('op')} "
                f"{_key(kind, m.group('lit'), pad)}"
            )

        residue = re.sub(
            rf"(?<![\w.]){qual.format(0)}\b\s*(?P<op>{ops})\s*"
            rf"(?P<lit>{ph})",
            _cl,
            residue,
        )

        def _lc(m: re.Match) -> str:
            kind = _kind(m.group("q0"), m.group("c0"))
            if kind is None:
                return m.group(0)
            pad = m.group("op").upper() != "LIKE"
            return (
                f"{_key(kind, m.group('lit'), pad)} {m.group('op')} "
                f"{_key(kind, _tok(m, 0), pad)}"
            )

        residue = re.sub(
            rf"(?P<lit>{ph})\s*(?P<op>{ops})\s*{qual.format(0)}\b",
            _lc,
            residue,
        )

        # col IN ('a', 'b')  /  col BETWEEN 'a' AND 'b'
        def _in(m: re.Match) -> str:
            kind = _kind(m.group("q0"), m.group("c0"))
            if kind is None:
                return m.group(0)
            items = ", ".join(
                _key(kind, p)
                for p in re.findall(ph, m.group("items"))
            )
            neg = m.group("not") or ""
            return f"{_key(kind, _tok(m, 0))} {neg}IN ({items})"

        residue = re.sub(
            rf"(?is)(?<![\w.]){qual.format(0)}\b\s+(?P<not>NOT\s+)?IN\s*"
            rf"\(\s*(?P<items>{ph}(?:\s*,\s*{ph})*)\s*\)",
            _in,
            residue,
        )

        def _btw(m: re.Match) -> str:
            kind = _kind(m.group("q0"), m.group("c0"))
            if kind is None:
                return m.group(0)
            neg = m.group("not") or ""
            return (
                f"{_key(kind, _tok(m, 0))} {neg}BETWEEN "
                f"{_key(kind, m.group('lo'))} AND "
                f"{_key(kind, m.group('hi'))}"
            )

        residue = re.sub(
            rf"(?is)(?<![\w.]){qual.format(0)}\b\s+(?P<not>NOT\s+)?"
            rf"BETWEEN\s+(?P<lo>{ph})\s+AND\s+(?P<hi>{ph})",
            _btw,
            residue,
        )

        # _ci col = _ci col (both sides normalize, MySQL join semantics;
        # mixed collations raise like MySQL's illegal-mix error)
        def _cc(m: re.Match) -> str:
            k0 = _kind(m.group("q0"), m.group("c0"))
            k1 = _kind(m.group("q1"), m.group("c1"))
            if k0 is None or k1 is None:
                # one side binary: binary compare preserved (pinned by
                # the r4 table-scoping ADVICE test)
                return m.group(0)
            if k0 != k1:
                raise ValueError(
                    f"illegal mix of collations: {_tok(m, 0)} ({k0}) vs "
                    f"{_tok(m, 1)} ({k1})"
                )
            return f"{_key(k0, _tok(m, 0))} = {_key(k0, _tok(m, 1))}"

        residue = re.sub(
            rf"(?<![\w.]){qual.format(0)}\b\s*=\s*{qual.format(1)}\b",
            _cc,
            residue,
        )

        # GROUP BY folding: GROUP BY col -> GROUP BY key(col), with
        # min(col) projected as the deterministic group representative
        # (engine contract; MySQL returns an arbitrary member's case).
        # A depth-0 set operator (UNION/INTERSECT/EXCEPT) separates
        # independent SELECT blocks, so each branch folds its OWN
        # GROUP BY and SELECT list — pairing the statement's last
        # GROUP BY with its first SELECT list would mis-rewrite both.
        pieces: list[str] = []
        for seg in self._split_depth0_setops(residue):
            gspan = self._last_top_level_clause(
                seg, r"GROUP\s+BY\s+", r"HAVING|ORDER|LIMIT|WINDOW"
            )
            folded: list[tuple[str | None, str]] = []
            if gspan:
                s_, e_ = gspan

                def _gb(cm: re.Match) -> str:
                    kind = _kind(cm.group("q0"), cm.group("c0"))
                    if kind is None:
                        return cm.group(0)
                    folded.append((cm.group("q0"), cm.group("c0")))
                    return _key(kind, _tok(cm, 0))

                clause = re.sub(
                    rf"(?<![\w.(]){qual.format(0)}\b(?!\s*\()",
                    _gb,
                    seg[s_:e_],
                )
                seg = seg[:s_] + clause + seg[e_:]
            if folded:
                seg = self._ci_fold_select_list(seg, folded)
            pieces.append(seg)
        residue = "".join(pieces)

        # Statement-final TOP-LEVEL ORDER BY only: a window's OVER(ORDER
        # BY ...) lives inside parens and must not attract the rewrite.
        span = self._last_top_level_clause(
            residue, r"ORDER\s+BY\s+", r"LIMIT"
        )
        if span:
            s_, e_ = span

            def _ob(cm: re.Match) -> str:
                kind = _kind(cm.group("q0"), cm.group("c0"))
                if kind is None:
                    return cm.group(0)
                return f"{_key(kind, _tok(cm, 0))}"

            clause = re.sub(
                rf"(?<![\w.(]){qual.format(0)}\b(?!\s*\()",
                _ob,
                residue[s_:e_],
            )
            residue = residue[:s_] + clause + residue[e_:]
        return re.sub(
            r"\x02(\d+)\x02", lambda m: subs[int(m.group(1))], residue
        )

    def _ci_fold_select_list(
        self, residue: str, folded: list[tuple[str | None, str]]
    ) -> str:
        """After GROUP BY folding, rewrite each folded column's bare
        top-level projection ``[q.]col`` to ``min([q.]col) AS col`` —
        the deterministic group representative."""
        sm = re.search(r"(?is)\bSELECT\s+(DISTINCT\s+)?", residue)
        if not sm:
            return residue
        # span: SELECT list ends at the first top-level FROM
        depth, j = 0, sm.end()
        while j < len(residue):
            c = residue[j]
            if c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
            elif (
                depth == 0
                and residue[j : j + 4].upper() == "FROM"
                and not (residue[j - 1].isalnum() or residue[j - 1] == "_")
            ):
                break
            j += 1
        sel = residue[sm.end() : j]
        for q, col in set(folded):
            tok = (f"{q}." if q else "") + col
            # only depth-0 bare occurrences (not inside an aggregate)
            parts: list[str] = []
            depth = 0
            k = 0
            pat = re.compile(
                rf"(?<![\w.]){re.escape(tok)}\b(?!\s*\()(?!\.)"
            )
            while k < len(sel):
                c = sel[k]
                if c == "(":
                    depth += 1
                elif c == ")":
                    depth -= 1
                if depth == 0:
                    m = pat.match(sel, k)
                    if m and (k == 0 or not (
                        sel[k - 1].isalnum() or sel[k - 1] in "_."
                    )):
                        # Pin the output name with AS only when the
                        # occurrence IS the whole projection item
                        # (comma/start before, comma/end after).  An
                        # aliased occurrence (`col AS label`) keeps its
                        # own alias, and an expression occurrence
                        # (`col || x`) keeps its context — appending
                        # AS there produced a double alias / broken
                        # expression (r6 ADVICE).
                        b = k - 1
                        while b >= 0 and sel[b].isspace():
                            b -= 1
                        a = m.end()
                        while a < len(sel) and sel[a].isspace():
                            a += 1
                        bare = (b < 0 or sel[b] == ",") and (
                            a >= len(sel) or sel[a] == ","
                        )
                        parts.append(
                            f"min({tok}) AS {col}"
                            if bare
                            else f"min({tok})"
                        )
                        k = m.end()
                        continue
                parts.append(c)
                k += 1
            sel = "".join(parts)
        return residue[: sm.end()] + sel + residue[j:]

    @staticmethod
    def _split_depth0_setops(text: str) -> list[str]:
        """Split ``text`` at depth-0 set-operator keywords (UNION /
        INTERSECT / EXCEPT / MINUS); each keyword starts the following
        segment, so ``"".join(result) == text``.  String literals must
        already be masked (a keyword inside a literal would otherwise
        split)."""
        kw = re.compile(r"(?is)(?:UNION|INTERSECT|EXCEPT|MINUS)\b")
        cuts: list[int] = []
        depth = 0
        for i, c in enumerate(text):
            if c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
            elif depth == 0 and c in "UIEMuiem":
                boundary = i == 0 or not (
                    text[i - 1].isalnum() or text[i - 1] in "_."
                )
                if boundary and kw.match(text, i):
                    cuts.append(i)
        segs: list[str] = []
        prev = 0
        for i in cuts:
            segs.append(text[prev:i])
            prev = i
        segs.append(text[prev:])
        return segs

    @staticmethod
    def _last_top_level_clause(
        text: str, clause: str, stop: str
    ) -> tuple[int, int] | None:
        """(start, end) of the body of the LAST depth-0 ``clause``
        (regex, e.g. ``ORDER\\s+BY\\s+``), ending at a depth-0 ``stop``
        keyword or end-of-text; None if absent.  ``text`` must already
        have string literals masked."""
        ob = re.compile(f"(?is){clause}")
        stop_re = re.compile(rf"(?is)\b(?:{stop})\b")
        depth, i, best = 0, 0, None
        first = {clause[0].upper(), clause[0].lower()}
        while i < len(text):
            c = text[i]
            if c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
            elif depth == 0 and c in first:
                boundary = i == 0 or not (
                    text[i - 1].isalnum() or text[i - 1] in "_."
                )
                m = ob.match(text, i)
                if boundary and m:
                    best = m.end()
                    i = m.end()
                    continue
            i += 1
        if best is None:
            return None
        depth, j = 0, best
        while j < len(text):
            c = text[j]
            if c == "(":
                depth += 1
            elif c == ")":
                if depth == 0:
                    break
                depth -= 1
            elif depth == 0:
                m = stop_re.match(text, j)
                if m and not (
                    text[j - 1].isalnum() or text[j - 1] == "_"
                ):
                    break
            j += 1
        return (best, j)

    def _inject_hints(self, query: str, hints: list[str]) -> str:
        """Re-emit surviving hints as a Spark hint comment after the first
        TOP-LEVEL SELECT (Spark only honors hints directly inside a
        SELECT's own block).  A bare regex would land inside a WITH cte's
        parenthesized body — Catalyst then silently drops the hint as
        referencing unknown relations — or inside a string literal."""
        if not hints:
            return query
        parts = merge_clause._split_top_level(query, "SELECT")
        if len(parts) < 2:
            return query
        pos = len(parts[0])  # first top-level SELECT keyword starts here
        return (
            query[:pos]
            + "SELECT /*+ "
            + ", ".join(hints)
            + " */"
            + query[pos + len("SELECT") :]
        )

    def _run_show(self, query: str) -> DataFrame:
        """SHOW TABLES / DATABASES / COLUMNS (DESC/DESCRIBE) / VARIABLES /
        CREATE TABLE — the routine interactive surface (executor/show.go,
        infoschema_reader.go), with MySQL-shaped result columns so existing
        client expectations hold."""
        q = query.strip().rstrip(";").strip()
        mk = lambda rows, schema: self.spark.createDataFrame(rows, schema)

        if re.match(r"(?is)^SHOW\s+(?:GLOBAL\s+|SESSION\s+)?BINDINGS$", q):
            # bindinfo's SHOW BINDINGS columns, trimmed to the ones with
            # engine-side meaning (no create/update times — bindings are
            # session state here, like the reference's session scope).
            rows = [
                (orig, re.sub(r":b\d+\b", "?", tmpl), "enabled", d)
                for d, (orig, tmpl, _n) in sorted(self.bindings.items())
            ]
            return mk(
                rows,
                "Original_sql string, Bind_sql string, Status string, "
                "Sql_digest string",
            ) if rows else self.spark.createDataFrame(
                [],
                "Original_sql string, Bind_sql string, Status string, "
                "Sql_digest string",
            )
        if re.match(r"(?is)^SHOW\s+TABLES$", q):
            # Views list alongside tables, as in MySQL/the reference
            # (show.go fetchShowTables includes VIEW objects).
            return mk(
                [(t,) for t in sorted(set(self.tables) | set(self.views))],
                "Tables_in_tidb_spark string",
            )
        m = re.match(r"(?is)^SHOW\s+CREATE\s+VIEW\s+`?(\w+)`?$", q)
        if m:
            name = m.group(1)
            if name not in self.views:
                raise ValueError(f"SHOW CREATE VIEW: unknown view {name!r}")
            return mk(
                [(name, f"CREATE VIEW `{name}` AS {self.views[name]}")],
                "View string, `Create View` string",
            )
        if re.match(r"(?is)^SHOW\s+DATABASES$", q):
            return mk(
                [("INFORMATION_SCHEMA",), ("tidb_spark",)], "Database string"
            )
        m = re.match(r"(?is)^SHOW\s+CREATE\s+SEQUENCE\s+`?(\w+)`?$", q)
        if m:
            name = m.group(1)
            if name not in self.sequences:
                raise ValueError(f"SHOW CREATE SEQUENCE: unknown sequence {name!r}")
            s = self.sequences[name]
            ddl = (
                f"CREATE SEQUENCE `{name}` START WITH {s['start']} "
                f"INCREMENT BY {s['increment']} MINVALUE {s['min']} "
                f"MAXVALUE {s['max']} {'CYCLE' if s['cycle'] else 'NOCYCLE'}"
            )
            return mk(
                [(name, ddl)], "Sequence string, `Create Sequence` string"
            )
        m = re.match(
            r"(?is)^SHOW\s+(?:INDEX|INDEXES|KEYS)\s+(?:FROM|IN)\s+`?(\w+)`?$", q
        )
        if m:
            # show.go fetchShowIndex: one row per key column.  The engine's
            # only index-like object is a managed table's PRIMARY KEY (scans
            # are columnar; secondary indexes are n/a by design — SURVEY §2
            # rows 2-3).
            name = m.group(1)
            rows = []
            if name in self.managed:
                for i, col in enumerate(self.managed[name].key_cols, 1):
                    rows.append((name, 0, "PRIMARY", i, col, "A"))
            elif name not in self.tables:
                raise ValueError(f"SHOW INDEX: unknown table {name!r}")
            return mk(
                rows,
                "Table string, Non_unique int, Key_name string, "
                "Seq_in_index int, Column_name string, Collation string",
            )
        m = re.match(r"(?is)^SHOW\s+(?:GLOBAL\s+|SESSION\s+)?STATUS$", q)
        if m:
            # show.go fetchShowStatus: BI tools probe a handful of rows;
            # serve deterministic engine-true values.
            return mk(
                [
                    ("Ssl_cipher", ""),
                    ("Threads_connected", "1"),
                    ("Queries", "0"),
                    ("tidb_spark_managed_tables", str(len(self.managed))),
                    ("tidb_spark_views", str(len(self.views))),
                ],
                "Variable_name string, Value string",
            )
        if re.match(r"(?is)^SHOW\s+(?:FULL\s+)?PROCESSLIST$", q):
            # show.go fetchShowProcessList: one in-process session here.
            return mk(
                [(1, "root", "localhost", "tidb_spark", "Query", 0, "", None)],
                "Id bigint, User string, Host string, db string, "
                "Command string, Time int, State string, Info string",
            )
        m = re.match(r"(?is)^SHOW\s+GRANTS(?:\s+FOR\s+(.+?))?$", q)
        if m:
            # privilege/privileges is out of scope (BASELINE.json); every
            # session is the all-privilege user, as show.go would render
            # for root.
            who = (m.group(1) or "'root'@'%'").strip()
            return mk(
                [(f"GRANT ALL PRIVILEGES ON *.* TO {who}",)],
                "`Grants` string",
            )
        m = re.match(r"(?is)^SHOW\s+CREATE\s+TABLE\s+`?(\w+)`?$", q)
        if m:
            name = m.group(1)
            return mk(
                [(name, self.show_create_table(name))],
                "Table string, `Create Table` string",
            )
        m = re.match(
            r"(?is)^(?:SHOW\s+(?:FULL\s+)?COLUMNS\s+FROM|DESC(?:RIBE)?)"
            r"\s+`?(\w+)`?$",
            q,
        )
        if m:
            name = m.group(1)
            if name in self.tables:
                df = self.tables[name]
            elif name in self.views:
                df = self.spark.table(name)
            else:
                df = self.graph.vertex(name).df
            keys: set[str] = set()
            if name in self.managed and self.managed[name].key_cols:
                keys = set(self.managed[name].key_cols)
            elif name in self.graph.vertices:
                keys = {self.graph.vertex(name).id_col}
            elif name in self.graph.edges:
                e = self.graph.edge(name)
                keys = {e.src_col, e.dst_col}
            rows = [
                (
                    f.name,
                    f.dataType.simpleString(),
                    "YES" if f.nullable else "NO",
                    "PRI" if f.name in keys else "",
                    None,
                    "",
                )
                for f in df.schema.fields
            ]
            return mk(
                rows,
                "Field string, Type string, `Null` string, Key string, "
                "`Default` string, Extra string",
            )
        m = re.match(r"(?is)^SHOW\s+VARIABLES(?:\s+LIKE\s+'([^']*)')?$", q)
        if m:
            # Session sysvars (SET @@…) over a handful of MySQL-compat
            # defaults; LIKE uses MySQL %/_ wildcards.
            base = {
                "version": "8.0-tidb_spark",
                "default_week_format": "0",
                "time_zone": self.spark.conf.get(
                    "spark.sql.session.timeZone", "UTC"
                ),
                "sql_mode": "ANSI",
                "max_execution_time": "0",
            }
            base.update({k: _strip_quotes(v) for k, v in self.sys_vars.items()})
            pat = m.group(1)
            if pat:
                rx = re.compile(
                    "^"
                    + re.escape(pat).replace("%", ".*").replace("_", ".")
                    + "$",
                    re.IGNORECASE,
                )
                base = {k: v for k, v in base.items() if rx.match(k)}
            return mk(
                sorted(base.items()), "Variable_name string, Value string"
            )
        raise ValueError(f"unsupported SHOW statement: {query!r}")

    @staticmethod
    def _unquote_sql_string(s: str) -> str:
        """Decode a SQL string literal ('…' or "…"; doubled-quote and
        backslash escapes) — the PREPARE … FROM source form."""
        s = s.strip()
        if len(s) < 2 or s[0] not in "'\"" or s[-1] != s[0]:
            raise ValueError(
                f"PREPARE: expected a string literal or @variable, got {s!r}"
            )
        q = s[0]
        return (
            s[1:-1]
            .replace(q + q, q)
            .replace("\\" + q, q)
            .replace("\\\\", "\\")
        )

    def _run_prepare(self, m: re.Match) -> DataFrame:
        """PREPARE stmt FROM '…' / FROM @var (executor/prepared.go:1)."""
        src = m.group("src").strip()
        uv = re.match(r"^@(\w+)$", src)
        if uv:
            src = self.user_vars.get(uv.group(1))
            if src is None:
                # set.go: preparing from an unset variable is an error
                # (the statement text would be NULL).
                raise ValueError(f"PREPARE: user variable @{uv.group(1)} is not set")
        text = self._unquote_sql_string(src)
        self.prepared[m.group("name")] = text
        return self.spark.range(0).select(F.lit("OK").alias("status"))

    def _run_execute(self, m: re.Match) -> DataFrame:
        """EXECUTE stmt [USING @a, @b, …] (common_plans.go Execute rebind +
        planner/core/plan_cache.go GetPlanFromPlanCache).

        Fast path: the statement's LOWERED Spark SQL is in the plan cache
        for the current catalog epoch — bind each ``:pN`` marker to the
        USING variable's literal and hand Catalyst the result (it still
        plans per execution; only the Python dialect pipeline is skipped).
        Slow path (miss or uncacheable): bind ``?`` placeholders
        positionally and run the full pipeline, attempting to populate the
        cache for next time."""
        from tidb_spark.sqlshim.translate import _map_code

        name = m.group("name")
        if name not in self.prepared:
            # executor/prepared.go ErrStmtNotFound
            raise ValueError(f"Unknown prepared statement handler {name!r}")
        text = self.prepared[name]
        vals: list[str] = []
        if m.group("args"):
            for tok in m.group("args").split(","):
                tok = tok.strip()
                av = re.match(r"^@(\w+)$", tok)
                if not av:
                    # parser: USING accepts user variables only
                    raise ValueError(
                        f"EXECUTE … USING expects @variables, got {tok!r}"
                    )
                vals.append(self.user_vars.get(av.group(1), "NULL"))
        n_params = 0

        def count(code: str) -> str:
            nonlocal n_params
            n_params += code.count("?")
            return code

        _map_code(text, count)
        if n_params != len(vals):
            # executor/prepared.go ErrWrongParamCount
            raise ValueError(
                f"Incorrect arguments to EXECUTE: statement takes "
                f"{n_params} parameters, {len(vals)} given"
            )
        self._last_plan_from_cache = False
        ent = self.plan_cache.get(text)
        if ent is not None and ent[2] != self._catalog_epoch:
            del self.plan_cache[text]
            ent = None
        if ent is None:
            self._plan_cache_misses += 1
            lowered = self._lower_for_cache(text, n_params)
            if lowered is not None and vals:
                # Entry-creation cross-check (ADVICE r8): the cache is
                # sound iff lowering COMMUTES with parameter
                # substitution.  Lower the literal form (exactly what the
                # slow path would run — capture sink, no execution) and
                # require it to equal the marker form with this
                # execution's values substituted.  A rewrite that
                # pattern-matches literal operands but skips the :pN
                # shape fails this and the statement stays on the
                # always-correct slow path; false positives only cost
                # caching, never correctness.
                # The nested self.sql() below re-enters statement entry,
                # which re-snapshots _prev_from_binding/_prev_from_cache;
                # save/restore ALL provenance fields (not just
                # _last_plan_from_binding) so a mid-statement read of
                # @@last_plan_from_* never sees the capture pass's state.
                saved_binding = self._last_plan_from_binding
                saved_prev = (self._prev_from_binding, self._prev_from_cache)
                literal_text = _map_code(
                    text,
                    lambda code, _it=iter(vals): re.sub(
                        r"\?", lambda _m: next(_it), code
                    ),
                )
                self._lower_capture = []
                try:
                    self.sql(literal_text)
                    lit_lowered = (
                        self._lower_capture[0]
                        if len(self._lower_capture) == 1
                        else None
                    )
                except Exception:
                    lit_lowered = None
                finally:
                    self._lower_capture = None
                    self._last_plan_from_binding = saved_binding
                    self._prev_from_binding, self._prev_from_cache = saved_prev
                bound_fast = _map_code(
                    lowered,
                    lambda code: re.sub(
                        r":p(\d+)\b",
                        lambda pm: vals[int(pm.group(1))],
                        code,
                    ),
                )
                if lit_lowered != bound_fast:
                    lowered = None
            # 4th field: did a plan binding rewrite the statement during
            # the lowering pass?  Replayed into @@last_plan_from_binding on
            # every cache-hit execution (bindinfo applies to prepared
            # statements; the lowering pass digests :pN markers as
            # literals, _binding_digest).
            from_binding = (
                lowered is not None and self._last_plan_from_binding
            )
            ent = (lowered, n_params, self._catalog_epoch, from_binding)
            self.plan_cache[text] = ent
            cap = int(
                self.spark.conf.get("spark.tidb_spark.plan_cache.size", "100")
            )
            while len(self.plan_cache) > cap:
                self.plan_cache.popitem(last=False)
        else:
            self.plan_cache.move_to_end(text)
            if ent[0] is not None:
                self._plan_cache_hits += 1
                self._last_plan_from_cache = True
        if ent[0] is not None:
            bound = _map_code(
                ent[0],
                lambda code: re.sub(
                    r":p(\d+)\b", lambda pm: vals[int(pm.group(1))], code
                ),
            )
            self._last_plan_from_binding = ent[3]
            try:
                return self.spark.sql(bound)
            except Exception:
                # A lowering rewrite that pattern-matches literal forms
                # may have skipped a :pN shape it would have handled bound
                # — evict and take the always-correct slow path (the
                # reference likewise falls back when a cached plan fails
                # rebind validation, plan_cache.go RebuildPlan4CachedPlan).
                self.plan_cache[text] = (None, n_params, ent[2], False)
                if self._last_plan_from_cache:
                    self._plan_cache_hits -= 1
                self._last_plan_from_cache = False
                self._last_plan_from_binding = False
        # Uncacheable: today's full-pipeline rebind.
        it = iter(vals)

        def bind(code: str) -> str:
            return re.sub(r"\?", lambda _m: next(it), code)

        return self.sql(_map_code(text, bind) if vals else text)

    def _lower_for_cache(self, text: str, n_params: int) -> str | None:
        """One full-pipeline lowering of ``text`` with its ``?``
        placeholders pinned as named ``:pN`` markers; returns the final
        Spark SQL, or None when the statement is uncacheable (gate
        mismatch, a rewrite consumed/errored on a marker, or the statement
        never reached the plain spark.sql sink — each a reference
        skip-plan-cache reason, plan_cacheable_checker.go)."""
        from tidb_spark.sqlshim.translate import _map_code

        masked = merge_clause._STRING_RE.sub("''", text)
        if not _CACHEABLE_HEAD_RE.match(masked) or _CACHE_SKIP_RE.search(
            masked
        ):
            return None
        counter = itertools.count()
        marked = _map_code(
            text,
            lambda code: re.sub(r"\?", lambda _m: f":p{next(counter)}", code),
        )
        self._lower_capture = []
        try:
            self.sql(marked)
            captured = self._lower_capture
        except Exception:
            return None
        finally:
            self._lower_capture = None
        if len(captured) != 1:
            return None
        lowered = captured[0]
        found: set[int] = set()
        _map_code(
            lowered,
            lambda code: (
                found.update(int(g) for g in re.findall(r":p(\d+)\b", code))
                or code
            ),
        )
        if found != set(range(n_params)):
            # A rewrite dropped or invented a marker — binding would be
            # unsound; leave this statement on the slow path.
            return None
        return lowered

    # -- SQL plan bindings (bindinfo/bind.go; see _CREATE_BINDING_RE) ------

    def _binding_mask(self, stmt: str) -> tuple[str, int]:
        """Replace every literal (strings, standalone numbers) with a
        positional ``:bN`` marker, left-to-right, hint blocks preserved
        verbatim (their numbers are NOT literals — the incoming statement
        has no counterpart for them).  Returns (masked text, n_literals)."""
        stash: list[str] = []
        # Digit-free stash markers (unary length): a digit in the
        # placeholder would itself match _NUM_LIT_RE below.
        s = self._HINT_BLOCK_RE.sub(
            lambda m: (
                stash.append(m.group(0))
                or "\x01" + "h" * len(stash) + "\x01"
            ),
            stmt,
        )
        counter = itertools.count()
        s = re.sub(
            merge_clause._STRING_RE.pattern + "|" + _NUM_LIT_RE.pattern,
            lambda m: f":b{next(counter)}",
            s,
        )
        n = next(counter)
        s = re.sub(
            r"\x01(h+)\x01", lambda m: stash[len(m.group(1)) - 1], s
        )
        return s, n

    def _binding_digest(self, stmt: str) -> tuple[str, list[str]]:
        """Literal-stripped, hint-stripped, whitespace-collapsed digest
        (bindinfo's normalized SQL) plus the statement's literals in text
        order — the values a matched binding re-injects.

        Plan-cache ``:pN`` markers (the prepared-statement lowering pass,
        _lower_for_cache) normalize like literals: they occupy exactly the
        positions where the literal statement has real literals, so
        digesting them to ``?`` makes EXECUTE pick up the same bindings the
        plain statement would (bindinfo applies to prepared statements in
        the reference too); re-injection then splices the markers into the
        template and they bind at execute time as usual."""
        s = self._HINT_BLOCK_RE.sub(" ", stmt.strip().rstrip(";"))
        lits: list[str] = []
        # String pattern FIRST: a ':p0' inside a quoted literal is string
        # content, not a marker (markers substitute '?' placeholders,
        # which only exist outside strings) — the alternation must let
        # the string match swallow it.
        s = re.sub(
            merge_clause._STRING_RE.pattern
            + r"|:p\d+\b|"
            + _NUM_LIT_RE.pattern,
            lambda m: (lits.append(m.group(0)) or "?"),
            s,
        )
        return re.sub(r"\s+", " ", s).strip().lower(), lits

    def _run_create_binding(self, m: re.Match) -> DataFrame:
        """CREATE [GLOBAL|SESSION] BINDING FOR <stmt> USING <stmt>
        (bindinfo/handle.go CreateBindRecord).  Validates the reference's
        own invariant: both statements must normalize identically once
        hints are stripped (otherwise literal re-injection would be
        unsound), then stores digest -> USING template."""
        orig, using = m.group("orig"), m.group("using").strip().rstrip(";")
        d_orig, lits_o = self._binding_digest(orig)
        d_using, lits_u = self._binding_digest(using)
        if d_orig != d_using:
            raise ValueError(
                "CREATE BINDING: the original SQL and the bind SQL must be "
                "identical after normalization (hints excluded) — got\n  "
                f"{d_orig}\nvs\n  {d_using}"
            )
        template, n = self._binding_mask(using)
        if n != len(lits_o):
            # Invariant (must survive python -O, so no assert): the mask
            # pass and the digest pass share literal regexes, so the
            # template's :bN count must equal the digest's literal count —
            # otherwise _apply_bindings' re-injection would be unsound.
            raise ValueError(
                "CREATE BINDING: internal literal-count mismatch between "
                f"mask ({n}) and digest ({len(lits_o)}) — refusing to store"
            )
        self.bindings[d_orig] = (re.sub(r"\s+", " ", orig.strip()), template, n)
        return self.spark.range(0).select(F.lit("OK").alias("status"))

    def _run_drop_binding(self, m: re.Match) -> DataFrame:
        d, _ = self._binding_digest(m.group("orig"))
        if d not in self.bindings:
            raise ValueError("DROP BINDING: no binding matches this statement")
        del self.bindings[d]
        return self.spark.range(0).select(F.lit("OK").alias("status"))

    def _apply_bindings(self, query: str) -> str:
        """If the statement's digest has a binding, splice the statement's
        OWN literals into the binding's USING template (bindinfo match +
        rewrite; the reference applies the stored hint set to the plan —
        text substitution is the lowered-pipeline equivalent here)."""
        d, lits = self._binding_digest(query)
        ent = self.bindings.get(d)
        if ent is None:
            self._last_plan_from_binding = False
            return query
        _, template, n = ent
        if n != len(lits):  # cannot happen post-validation; stay safe
            self._last_plan_from_binding = False
            return query
        self._last_plan_from_binding = True
        return re.sub(
            r":b(\d+)\b", lambda bm: lits[int(bm.group(1))], template
        )

    def _run_deallocate(self, m: re.Match) -> DataFrame:
        name = m.group("name")
        if name not in self.prepared:
            raise ValueError(f"Unknown prepared statement handler {name!r}")
        del self.prepared[name]
        return self.spark.range(0).select(F.lit("OK").alias("status"))

    _SEQ_OPT_RE = re.compile(
        r"(?i)(START\s+WITH|INCREMENT\s+BY|MINVALUE|MAXVALUE|CACHE)\s+"
        r"(-?\d+)|(?P<flag>CYCLE|NOCYCLE|NO\s+CYCLE)"
    )

    def _run_create_sequence(self, m: re.Match) -> DataFrame:
        """CREATE SEQUENCE (ddl/sequence.go CreateSequence): START WITH /
        INCREMENT BY / MINVALUE / MAXVALUE / CYCLE.  CACHE is accepted and
        ignored — it tunes the reference's KV round-trip batching, which
        the engine-side counter replaces."""
        name = m.group("name")
        if name in self.sequences:
            if m.group("ifnex"):
                return self.spark.range(0).select(F.lit("OK").alias("status"))
            raise ValueError(f"CREATE SEQUENCE: {name!r} already exists")
        if name in self.tables or name in self.managed or name in self.views:
            raise ValueError(f"CREATE SEQUENCE: table or view {name!r} exists")
        opts = {"start": 1, "increment": 1, "min": 1, "max": 2**63 - 1,
                "cycle": False}
        for om in self._SEQ_OPT_RE.finditer(m.group("opts") or ""):
            if om.group("flag"):
                opts["cycle"] = om.group("flag").upper() == "CYCLE"
            else:
                key = re.sub(r"\s+", " ", om.group(1).upper())
                val = int(om.group(2))
                opts[{"START WITH": "start", "INCREMENT BY": "increment",
                      "MINVALUE": "min", "MAXVALUE": "max", "CACHE": "cache"}
                     [key]] = val
        if opts["increment"] == 0:
            raise ValueError("CREATE SEQUENCE: INCREMENT BY must be non-zero")
        opts.pop("cache", None)
        # next value to hand out; lastval = last handed out (None until used)
        opts["next"] = opts["start"]
        opts["lastval"] = None
        self.sequences[name] = opts
        return self.spark.range(0).select(F.lit("OK").alias("status"))

    def _run_drop_sequence(self, m: re.Match) -> DataFrame:
        name = m.group("name")
        if name not in self.sequences:
            if m.group("ifex"):
                return self.spark.range(0).select(F.lit("OK").alias("status"))
            # ddl.go ErrWrongObject shape: dropping a non-sequence errors.
            raise ValueError(f"DROP SEQUENCE: {name!r} is not a sequence")
        del self.sequences[name]
        return self.spark.range(0).select(F.lit("OK").alias("status"))

    def _seq_nextval(self, name: str) -> int:
        s = self.sequences[name]
        val = s["next"]
        if val > s["max"] or val < s["min"]:
            if not s["cycle"]:
                # ddl/sequence.go ErrSequenceRunOut
                raise ValueError(f"Sequence {name!r} has run out")
            val = s["min"] if s["increment"] > 0 else s["max"]
        s["next"] = val + s["increment"]
        s["lastval"] = val
        return val

    def _substitute_sequence_funcs(self, query: str) -> str:
        """Evaluate NEXTVAL/LASTVAL/SETVAL calls against engine-side
        counters, splicing literal values into the statement (string-
        literal-aware).  Each textual occurrence allocates once per
        statement — so a multi-row ``INSERT … VALUES (NEXTVAL(s), …),
        (NEXTVAL(s), …)`` numbers each row, matching the reference's
        per-row evaluation for the statement shapes the engine accepts."""
        from tidb_spark.sqlshim.translate import _map_code

        def sub(code: str) -> str:
            def repl(fm: re.Match) -> str:
                seq = fm.group("seq")
                if seq not in self.sequences:
                    raise ValueError(f"Unknown SEQUENCE {seq!r}")
                fn = fm.group("fn").upper()
                if fn == "NEXTVAL":
                    return str(self._seq_nextval(seq))
                if fn == "LASTVAL":
                    last = self.sequences[seq]["lastval"]
                    return "NULL" if last is None else str(last)
                if fm.group("val") is None:
                    raise ValueError("SETVAL(seq, value) requires a value")
                # SETVAL(seq, n): the next NEXTVAL returns a value past n
                # (TiDB docs); LASTVAL (session-scoped) is unaffected.
                val = int(fm.group("val"))
                self.sequences[seq]["next"] = (
                    val + self.sequences[seq]["increment"]
                )
                return str(val)

            return _SEQ_FUNC_RE.sub(repl, code)

        return _map_code(query, sub)

    def _run_seq_insert_select(self, query: str) -> DataFrame:
        """NEXTVAL per-row allocation inside INSERT/REPLACE … SELECT
        (ddl/sequence.go allocator + executor/insert_common.go evaluate
        sequence builtins once per inserted row).

        Batch reservation: the source SELECT is counted once (sequence
        calls replaced by 0 — cardinality only), n × sites values are
        reserved from the engine counter ANALYTICALLY, and each NEXTVAL
        site is spliced with a closed-form value expression over
        ``row_number()`` so the allocation itself runs JVM-side — no
        driver loop, no Python UDF.  The window is unpartitioned: a
        sequence is one global counter, so the serialization is
        semantic (the reference funnels every insert through one KV
        allocator the same way); bulk loads that only need unique ids
        should use AUTO_INCREMENT, which block-allocates without a
        global order.  With k sites for one sequence, row i's site j
        takes reservation index i·k + j (left-to-right per row, the
        reference's evaluation order).  CYCLE wraps fold into the
        expression; non-CYCLE exhaustion raises BEFORE any row is
        written (statement-atomic, ErrSequenceRunOut).  LASTVAL splices
        the pre-statement session value; SETVAL per source row is
        rejected (last-writer-wins noise, no reference use case)."""
        from tidb_spark.sqlshim.translate import _map_code

        masked = merge_clause._STRING_RE.sub("''", query)
        for fm in _SEQ_FUNC_RE.finditer(masked):
            if fm.group("fn").upper() == "SETVAL":
                raise ValueError(
                    "SETVAL inside INSERT ... SELECT is not supported "
                    "(it would re-set the counter once per source row)"
                )
        om = re.search(r"(?i)\bON\s+DUPLICATE\s+KEY\s+UPDATE\b", masked)
        if om and _SEQ_FUNC_RE.search(masked[om.start():]):
            raise ValueError(
                "sequence functions in the ON DUPLICATE KEY UPDATE "
                "clause of INSERT ... SELECT are not supported"
            )
        sm = re.match(
            r"(?is)^\s*(?:INSERT|REPLACE)(?:\s+IGNORE)?\s+INTO\s+`?\w+`?\s*"
            r"(?:\([^)]*\)\s*)?((?:SELECT|WITH)\b.*)$",
            query,
        )
        if sm is None:
            # Not a plain SELECT source (e.g. a scalar subquery inside
            # VALUES tripped the dispatch regex): per-STATEMENT splicing
            # is correct there — each textual site allocates once.
            return self.sql(self._substitute_sequence_funcs(query))
        sel = sm.group(1)
        obm = _ODKU_RE.match(sel)
        if obm:
            sel = obm.group(1)

        # Pass 1: index the NEXTVAL sites per sequence (string-literal
        # aware) and splice LASTVAL as its pre-statement value.
        sites: dict[str, int] = {}

        def index_sites(code: str) -> str:
            def repl(fm: re.Match) -> str:
                seq = fm.group("seq")
                if seq not in self.sequences:
                    raise ValueError(f"Unknown SEQUENCE {seq!r}")
                if fm.group("fn").upper() == "LASTVAL":
                    last = self.sequences[seq]["lastval"]
                    return "NULL" if last is None else str(last)
                j = sites.get(seq, 0)
                sites[seq] = j + 1
                return f"__SEQ_SITE__{seq}__{j}__"
            return _SEQ_FUNC_RE.sub(repl, code)

        rewritten = _map_code(query, index_sites)
        if not sites:  # LASTVAL-only statement: nothing row-dependent
            return self.sql(rewritten)

        # Cardinality probe: the SELECT with every site zeroed.  One
        # extra evaluation of the source (a count, so column-pruned to
        # nothing); the reference instead pre-reserves allocator cache
        # batches per chunk — same idea, reservation before write.
        n = self.sql(
            _map_code(sel, lambda code: _SEQ_FUNC_RE.sub("0", code))
        ).count()

        rn = "(ROW_NUMBER() OVER (ORDER BY 1) - 1)"
        advances: list[tuple[str, int, int]] = []  # (seq, last_val, total)
        for seq, k in sites.items():
            s = self.sequences[seq]
            inc, minv, maxv = s["increment"], s["min"], s["max"]
            total = n * k
            cur = s["next"]
            if cur > maxv or cur < minv:  # counter parked past the bound
                if not s["cycle"] and total:
                    raise ValueError(f"Sequence {seq!r} has run out")
                if s["cycle"]:
                    cur = minv if inc > 0 else maxv
            if inc > 0:
                c0 = (maxv - cur) // inc + 1
                cycle_len = (maxv - minv) // inc + 1
                wrap = minv
            else:
                c0 = (cur - minv) // (-inc) + 1
                cycle_len = (maxv - minv) // (-inc) + 1
                wrap = maxv
            if total and total > c0 and not s["cycle"]:
                raise ValueError(f"Sequence {seq!r} has run out")

            def val_of(mm: int) -> int:
                if mm < c0:
                    return cur + mm * inc
                return wrap + ((mm - c0) % cycle_len) * inc

            for j in range(k):
                m_expr = f"({rn} * {k} + {j})" if k > 1 else rn
                if total <= c0:
                    formula = f"CAST({cur} + {m_expr} * {inc} AS BIGINT)"
                else:
                    formula = (
                        f"CAST(CASE WHEN {m_expr} < {c0} "
                        f"THEN {cur} + {m_expr} * {inc} "
                        f"ELSE {wrap} + pmod({m_expr} - {c0}, {cycle_len})"
                        f" * {inc} END AS BIGINT)"
                    )
                rewritten = rewritten.replace(
                    f"__SEQ_SITE__{seq}__{j}__", formula
                )
            if total:
                advances.append((seq, val_of(total - 1), total))

        result = self.sql(rewritten)
        # Counters advance only after the insert succeeded — a failed
        # statement must not burn reservations (statement-atomic, like
        # the reference's txn-scoped allocator rollback).
        for seq, last, _total in advances:
            self.sequences[seq]["next"] = last + self.sequences[seq]["increment"]
            self.sequences[seq]["lastval"] = last
        return result

    def _run_set(self, m: re.Match) -> DataFrame:
        """SET @var = expr / SET @@sysvar = value (executor/set.go:41-96).
        User variables evaluate eagerly to a literal (UserVars semantics);
        system variables are recorded — `spark.<conf>` names additionally
        pass through to the live Spark conf, the engine's actual tuning
        surface."""
        if m.group("user"):
            expr = self._substitute_user_vars(m.group("uexpr").strip())
            expr = translate(expr)
            val = self.spark.sql(f"SELECT ({expr}) AS v").collect()[0].v
            self.user_vars[m.group("uname")] = _sql_literal(val)
        else:
            name, val = m.group("sname"), m.group("sexpr").strip()
            self.sys_vars[name] = val
            if name.startswith("spark"):
                self.spark.conf.set(name.replace("_", "."), _strip_quotes(val))
        return self.spark.range(0).select(F.lit("OK").alias("status"))

    def _substitute_user_vars(self, query: str) -> str:
        """Replace @name references (outside string literals) with the
        variable's literal value — the read side of executor/set.go's
        UserVars map — and @@[session.|global.]sysvar reads with the
        session value (sessionctx/variable; includes the plan-cache
        observability vars @@last_plan_from_cache and the SHOW VARIABLES
        defaults).  Unknown sysvars raise like MySQL ER_UNKNOWN_SYSTEM_VAR
        rather than silently reading NULL."""
        from tidb_spark.sqlshim.translate import _map_code

        if "@" not in query:
            return query

        def sys_sub(code: str) -> str:
            def one(vm: re.Match) -> str:
                name = vm.group(1).lower()
                if name == "last_plan_from_cache":
                    return "1" if self._prev_from_cache else "0"
                if name == "last_plan_from_binding":
                    return "1" if self._prev_from_binding else "0"
                if vm.group(1) in self.sys_vars:
                    return self.sys_vars[vm.group(1)]
                if name in self.sys_vars:
                    return self.sys_vars[name]
                defaults = {
                    "version": "'8.0-tidb_spark'",
                    "default_week_format": "'0'",
                    "time_zone": "'"
                    + self.spark.conf.get(
                        "spark.sql.session.timeZone", "UTC"
                    )
                    + "'",
                    "sql_mode": "'ANSI'",
                    "max_execution_time": "0",
                    "autocommit": "1",
                }
                if name in defaults:
                    return defaults[name]
                raise ValueError(f"Unknown system variable {name!r}")

            return re.sub(r"@@(?:SESSION\.|GLOBAL\.)?(\w+)", one, code,
                          flags=re.IGNORECASE)

        def sub(code: str) -> str:
            # Unset user variables read as NULL (MySQL semantics).
            return _USER_VAR_RE.sub(
                lambda vm: self.user_vars.get(vm.group(1), "NULL"), code
            )

        return _map_code(query, lambda code: sub(sys_sub(code)))

    def checksum(self, table: str) -> DataFrame:
        """ADMIN CHECKSUM TABLE (executor/checksum.go:39): one
        order-independent table digest — the sum of per-row xxhash64 over
        all columns — plus row/byte tallies.  Distributed: per-partition
        partial sums combine map-side; no row leaves the executor."""
        df = self.tables[table]
        # DECIMAL accumulation: a long sum of 2^63-range hashes overflows
        # under ANSI mode; decimal is exact and order-independent.
        row_hash = F.xxhash64(*[F.col(c).cast("string") for c in df.columns]).cast(
            "decimal(20,0)"
        )
        return df.agg(
            F.sum(row_hash).alias("checksum"),
            F.count(F.lit(1)).alias("total_kvs"),
            F.sum(
                sum(
                    (F.length(F.col(c).cast("string")) for c in df.columns),
                    F.lit(0),
                )
            ).alias("total_bytes"),
        )

    _TABLESAMPLE_RE = re.compile(
        r"(?is)\b(FROM|JOIN)\s+`?(\w+)`?\s+TABLESAMPLE\s+REGIONS\s*\(\s*\)"
        r"(?:\s+(?:AS\s+)?(?!WHERE\b|GROUP\b|ORDER\b|LIMIT\b|JOIN\b|ON\b"
        r"|LEFT\b|RIGHT\b|INNER\b|FULL\b|CROSS\b|UNION\b|HAVING\b)"
        r"(\w+))?"
    )

    def _rewrite_tablesample(self, query: str) -> str:
        """``FROM t TABLESAMPLE REGIONS()`` (executor/sample.go:42 — the
        reference returns the first row of each storage region): the
        Spark-native storage split is the parquet file, so this lowers to
        the first scan-order row per ``input_file_name()`` (projected in
        an inner subquery — nondeterministic funcs can't sit in a window
        spec directly), then a row_number window over the file column.
        Same sampling contract as the reference: rows ∝ storage splits,
        stable across runs, no RNG."""

        def repl(m: re.Match) -> str:
            kw, name, alias = m.groups()
            return (
                f"{kw} (SELECT * EXCEPT (__ts_rn, __ts_f) FROM ("
                f"SELECT *, row_number() OVER ("
                f"PARTITION BY __ts_f ORDER BY __ts_f) AS __ts_rn "
                f"FROM (SELECT *, input_file_name() AS __ts_f FROM {name})"
                f") WHERE __ts_rn = 1) AS {alias or name}"
            )

        return self._TABLESAMPLE_RE.sub(repl, query)

    def _run_recursive_cte(self, rc_stmt) -> DataFrame:
        """Execute the UNION-DISTINCT recursive CTE form Spark rejects
        natively (sqlshim/recursive_cte.py): seed and recursive member
        each run through the full engine pipeline; the fixpoint is the
        shared pipelined round driver (operators/cte.py — the same
        dedup-by-hashtable semantics as the reference's executor/cte.go).
        The recursive member sees the previous round's NEW rows, per the
        MySQL/reference iteration contract; column names map by position
        like any set operation."""
        from tidb_spark.operators.cte import recursive_cte as fixpoint
        from tidb_spark.sqlshim import recursive_cte as rc

        seed = self.sql(rc_stmt.seed_sql)
        cols = rc_stmt.cols or seed.columns
        seed = seed.toDF(*cols)
        n = next(_view_counter)
        frontier_view = f"__rcte_f_{n}"

        def step(frontier: DataFrame) -> DataFrame:
            frontier.createOrReplaceTempView(frontier_view)
            # Rebinding the frontier view is a catalog mutation the
            # statement text can't see: the step SQL is byte-identical
            # every round, so without this bump the direct-statement
            # DataFrame cache would replay round 1's analyzed plan (which
            # resolved the view to round 1's rows) and the fixpoint would
            # converge one round early.
            self._catalog_epoch += 1
            out = self.sql(
                rc.replace_name(rc_stmt.step_sql, rc_stmt.name, frontier_view)
            )
            return out.toDF(*cols)

        result = fixpoint(seed, step, distinct_keys=list(cols))
        out_view = f"__rcte_r_{n}"
        result.createOrReplaceTempView(out_view)
        rest = rc.replace_name(rc_stmt.rest_sql, rc_stmt.name, out_view)
        if rest.startswith(","):
            rest = "WITH " + rest[1:]
        return self.sql(rest)

    def _rewrite_as_of(self, query: str) -> str:
        """``FROM t AS OF TIMESTAMP '…'`` (stale read, parser/ast/dml.go:276
        → executor/stale_txn_test.go:143) on managed tables: bind the
        historical snapshot as a temp view and re-alias it to the table
        name, so the surrounding statement is unchanged."""

        def repl(m: re.Match) -> str:
            name, ts, alias = m.group(1), m.group(2), m.group(3)
            if name not in self.managed:
                return m.group(0)
            view = f"__asof_{next(_view_counter)}"
            self.managed[name].as_of(ts).createOrReplaceTempView(view)
            return f"{view} AS {alias or name}"

        return _AS_OF_RE.sub(repl, query)

    def _lower_any_shortest(self, path: mc.MatchPath) -> tuple[str, list[str]]:
        """MATCH ANY/ALL SHORTEST or TOP k → run the distributed BFS now,
        bind the result as a temp view, and join it back to the vertex
        tables so the outer statement sees src/dst rows plus ``path`` /
        ``dist`` (and ``rank`` for TOP k) columns — the GraphAnyShortestExec
        output shape (executor/graph_shortest.go:90-139).  ALL SHORTEST and
        TOP k are extensions: the reference's planner rejects them
        (logical_plan_builder.go:6567-6577).  The reference restricts ANY
        SHORTEST to one OUT hop with explicit destination (:6710-6712); we
        apply that restriction to all three."""
        if not (
            len(path.hops) == 1
            and path.hops[0].direction == "OUT"
            and path.hops[0].dest is not None
        ):
            raise ValueError("unsupported any shortest path query")
        src, hop = path.source, path.hops[0]
        dst = hop.dest
        src_pk = self.graph.vertex(src.table).id_col
        dst_pk = self.graph.vertex(dst.table).id_col
        sources = self.spark.sql(
            f"SELECT {src.alias}.{src_pk} AS root FROM {src.table} AS "
            f"{src.alias}" + (f" WHERE {src.where}" if src.where else "")
        )
        dests = self.spark.sql(
            f"SELECT {dst.alias}.{dst_pk} AS dst_id FROM {dst.table} AS "
            f"{dst.alias}" + (f" WHERE {dst.where}" if dst.where else "")
        )
        edge_t = self.graph.edge(hop.edge)
        if path.kind == "all":
            result = all_shortest(sources, dests, edge_t)
        elif path.kind == "top":
            # Exact enumeration when the hop budget is small (simple paths
            # grow exponentially with depth, so exhaustive search is safe
            # only on a short horizon); the beam-pruned variant kicks in
            # only when the user raised the horizon or explicitly SET
            # @@graph_topk_beam — beam pruning must not be silently
            # always-on, or ranks > 1 go approximate even at the default
            # hop budget where the DataFrame API is exact.  Rank 1 is exact
            # either way (= the ANY SHORTEST canonical path).  Default
            # horizon 4 (the DataFrame corpus query's bound): the old
            # default of 8 let an ~10-out-degree graph enumerate 10^8
            # simple paths before the per-round explosion guard existed —
            # a silent 100-second walk on the sf0.001 FIXTURE.  Deeper
            # horizons are one SET away and run beam-pruned; past the
            # guard's cap the enumeration fails fast with the beam hint.
            max_hops = int(self.sys_vars.get("graph_topk_max_hops", 4))
            beam_var = self.sys_vars.get("graph_topk_beam")
            if beam_var is not None:
                beam = max(int(beam_var), path.top_k)
            elif max_hops <= 4:
                beam = None  # exact enumeration, same as the DataFrame API
            else:
                beam = max(32, path.top_k)
            result = top_k_shortest(
                sources,
                dests,
                edge_t,
                k=path.top_k,
                max_hops=max_hops,
                beam=beam,
            )
        else:
            result = any_shortest(sources, dests, edge_t)
        view = f"__match_shortest_{next(_view_counter)}"
        result.createOrReplaceTempView(view)
        preds = []
        if src.where:
            preds.append(f"({src.where})")
        if dst.where:
            preds.append(f"({dst.where})")
        chain = (
            f"{src.table} AS {src.alias} "
            f"JOIN {view} ON {view}.src_id = {src.alias}.{src_pk} "
            f"JOIN {dst.table} AS {dst.alias} "
            f"ON {view}.dst_id = {dst.alias}.{dst_pk}"
        )
        return chain, preds

    # -- control plane (§2.13) ----------------------------------------------

    def explain(self, query: str, mode: str = "formatted") -> str:
        """EXPLAIN: the optimized/physical plan text (executor/explain.go)."""
        return self._explain_df(self.sql(query), mode)

    def explain_analyze(self, query: str) -> str:
        """EXPLAIN ANALYZE (executor/explain.go runtime-stats mode): execute
        the statement, then return the FINAL adaptive plan — the post-AQE
        physical plan actually run (runtime-re-planned joins, coalesced
        partitions), not the initial estimate — plus the result row count."""
        df = self.sql(query)
        # Execute THIS DataFrame's queryExecution with zero driver-side
        # materialization: toRdd().count() runs the exact physical plan
        # (AQE finalizes — isFinalPlan=true in the text below) and ships
        # only per-partition counts to the driver.  count() would plan a
        # separate aggregate and leave this plan unexecuted; collect()
        # funnels the whole result to the driver — on a large result
        # EXPLAIN ANALYZE itself became the bottleneck (VERDICT r5).
        n = df._jdf.queryExecution().toRdd().count()  # noqa: SLF001
        plan = self._explain_df(df, "formatted")
        # Plan provenance, mirroring the reference's EXPLAIN [ANALYZE]
        # runtime diagnostics for prepared/bound statements
        # (executor/explain.go + sessionctx last_plan_from_cache/
        # last_plan_from_binding): the LIVE flags were reset at the body
        # statement's entry and set only by what it actually exercised,
        # so they describe exactly the statement explained above; the
        # hit/miss totals are session-cumulative (@@last_plan_from_*
        # expose the same values statement-by-statement; this puts them
        # next to the plan they explain).
        prov = (
            f"-- plan_from_cache: {int(self._last_plan_from_cache)}"
            f"  plan_from_binding: {int(self._last_plan_from_binding)}"
            f"  (session plan cache: {self._plan_cache_hits} hits /"
            f" {self._plan_cache_misses} misses)"
        )
        return f"-- rows: {n}\n{prov}\n{plan}"

    def _explain_df(self, df: DataFrame, mode: str) -> str:
        return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
            df._jdf.queryExecution(), mode
        )

    def analyze(self, table: str) -> DataFrame:
        """ANALYZE TABLE … COMPUTE STATISTICS — and FEED them to Catalyst.

        The reference's ANALYZE builds histograms/CMSketch/TopN that drive
        its cost-based planner (executor/analyze.go:68,
        statistics/histogram.go → planner rule_join_reorder.go).  The Spark
        analogue is catalog statistics consumed by the CBO
        (``spark.sql.cbo.enabled`` + joinReorder): we register the table's
        current parquet location as an external catalog table and run the
        real ``ANALYZE TABLE … COMPUTE STATISTICS FOR ALL COLUMNS``, then
        drop the shadowing temp view so name resolution reaches the
        stats-bearing catalog table.  Catalyst's optimizedPlan.stats then
        reports the analyzed rowCount instead of a file-size guess, and
        join reordering / broadcast selection become stats-driven.

        A subsequent write to a managed table re-binds the temp view
        (``_refresh_view``), which shadows the catalog entry again — stats
        snapshots never serve stale data.

        Returns the per-column count/ndv/null summary (the reference's
        feedback output)."""
        df = self.tables[table]
        path = None
        if table in self.managed:
            mt = self.managed[table]
            path = mt._path(mt._version)
        elif table != "events":
            # events.parquet carries TIMESTAMP(NANOS) — the raw file can't
            # back a catalog table with the view's (micros) schema, so it
            # stays a temp view (see catalog.load_table).
            cand = os.path.join(self.sf_dir, f"{table}.parquet")
            if os.path.exists(cand):
                path = cand
        if path is not None:
            self.spark.sql(f"DROP TABLE IF EXISTS `{table}`")
            self.spark.sql(
                f"CREATE TABLE `{table}` USING parquet LOCATION '{path}'"
            )
            # Equi-height histograms — the Spark analogue of the reference's
            # histogram/TopN (statistics/histogram.go); CBO uses them for
            # range-predicate selectivity beyond plain min/max.
            self.spark.conf.set("spark.sql.statistics.histogram.enabled", "true")
            self.spark.sql(
                f"ANALYZE TABLE `{table}` COMPUTE STATISTICS FOR ALL COLUMNS"
            )
            self.spark.catalog.dropTempView(table)
            # CBO reads catalog stats only when enabled; join reorder uses
            # per-column ndv/min/max from the FOR ALL COLUMNS pass.
            self.spark.conf.set("spark.sql.cbo.enabled", "true")
            self.spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
            self.tables[table] = self.spark.table(table)
        aggs = [F.count(F.lit(1)).alias("__rows")]
        for c in df.columns:
            aggs.append(F.approx_count_distinct(c).alias(f"{c}__ndv"))
            aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"))
        return df.agg(*aggs)

    def show_tables(self) -> list[str]:
        return sorted(self.tables)

    def show_create_table(self, name: str) -> str:
        """SHOW CREATE TABLE, round-tripping the graph DDL extensions
        (SOURCE KEY / DESTINATION KEY — executor/show.go:922) for edge
        tables."""

        def _sql_type(dt) -> str:
            return dt.simpleString().upper()

        if name in self.views:
            # show.go serves views through SHOW CREATE TABLE as well
            # (fetchShowCreateTable4View).
            return f"CREATE VIEW `{name}` AS {self.views[name]}"
        if name in self.graph.edges:
            e = self.graph.edge(name)
            cols = []
            for f in e.df.schema.fields:
                line = f"  `{f.name}` {_sql_type(f.dataType)}"
                if f.name == e.src_col:
                    line += f" SOURCE KEY REFERENCES {e.src_table}"
                elif f.name == e.dst_col:
                    line += f" DESTINATION KEY REFERENCES {e.dst_table}"
                cols.append(line)
            body = ",\n".join(cols)
            return f"CREATE TABLE `{name}` (\n{body}\n)"
        df = self.tables[name] if name in self.tables else self.graph.vertex(name).df
        cols = [f"  `{f.name}` {_sql_type(f.dataType)}" for f in df.schema.fields]
        pk_cols: list[str] = []
        if name in self.graph.vertices:
            pk_cols = [self.graph.vertex(name).id_col]
        elif name in self.managed and self.managed[name].key_cols:
            pk_cols = list(self.managed[name].key_cols)
        if len(pk_cols) == 1:
            for i, f in enumerate(df.schema.fields):
                if f.name == pk_cols[0]:
                    cols[i] += " PRIMARY KEY"
        elif pk_cols:
            cols.append(
                "  PRIMARY KEY (" + ", ".join(f"`{c}`" for c in pk_cols) + ")"
            )
        body = ",\n".join(cols)
        tail = ""
        if name in self.managed and self.managed[name].partition_spec:
            # Round-trips the partition clause (executor/show.go prints the
            # reference's partition info the same way).
            tail = "\n" + self.managed[name].partition_spec.ddl()
        return f"CREATE TABLE `{name}` (\n{body}\n){tail}"
