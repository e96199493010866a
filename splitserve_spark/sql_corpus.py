"""Replay the reference's SQL logic-test corpus against this engine.

The reference ships its executable SQL-surface spec as 28 input files
(reference: sql/core/src/test/resources/sql-tests/inputs/*.sql, run by
sql/core/src/test/scala/org/apache/spark/sql/SQLQueryTestSuite.scala).
SURVEY.md §5 recommends adopting them; this module does, without
copying them: the files are read from the (read-only) reference tree at
test time and each statement is executed twice —

  * through this engine's SQL surface (``spark.sql``), and
  * through an independent DuckDB oracle,

then compared value-by-value.  Temp views a file creates are
materialized from Spark into DuckDB via Arrow, so both engines always
query bit-identical inputs while the *query* under test runs natively
in each dialect.

Statements whose two runs legitimately diverge carry an entry in
``LEDGER`` with a one-line reason — modern-Spark-vs-2.1 strictness,
Spark-vs-DuckDB dialect gaps, and metadata commands DuckDB cannot
mirror.  Anything NOT in the ledger must either match or error in BOTH
engines (the corpus is full of intentional error cases; "both engines
reject it" is the pass condition the reference suite itself uses).

The suite harness pre-registers three fixture views
(SQLQueryTestSuite.scala:247 loadTestData): testdata(key,value) = 1..100,
arraydata(arraycol,nestedarraycol), mapdata(mapcol).  Recreated here
from the same literal values.
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass
from decimal import Decimal

import duckdb
from pyspark.sql import SparkSession
from pyspark.sql import types as T

from splitserve_spark.sql_dialect import to_duckdb

CORPUS_DIR = os.environ.get(
    "SPARK_GRAFT_SQL_CORPUS",
    "/root/reference/sql/core/src/test/resources/sql-tests/inputs",
)

#: Files deliberately not replayed, with the reason the reference's own
#: suite gives (or the determinism rule of FIXTURES.md).
EXCLUDED_FILES = {
    "random.sql": "rand()/randn() outputs are seeded per-engine; no cross-engine oracle",
    "blacklist.sql": "the reference blacklists this file itself (deliberately crashing query)",
}


def corpus_files() -> list[str]:
    names = sorted(
        f for f in os.listdir(CORPUS_DIR)
        if f.endswith(".sql") and f not in EXCLUDED_FILES
    )
    return names


# ---------------------------------------------------------------------------
# Statement splitting (quote-aware: `--` inside a string is not a comment,
# `;` inside a string does not end a statement).
# ---------------------------------------------------------------------------

def split_statements(text: str) -> list[str]:
    stmts: list[str] = []
    buf: list[str] = []
    i, n = 0, len(text)
    in_s: str | None = None  # current quote char or None
    while i < n:
        ch = text[i]
        if in_s:
            buf.append(ch)
            if ch == "\\" and i + 1 < n:
                buf.append(text[i + 1])
                i += 2
                continue
            if ch == in_s:
                in_s = None
            i += 1
            continue
        if ch in ("'", '"'):
            in_s = ch
            buf.append(ch)
            i += 1
            continue
        if ch == "-" and text[i: i + 2] == "--":
            j = text.find("\n", i)
            i = n if j < 0 else j  # keep the newline for token separation
            continue
        if ch == ";":
            stmt = "".join(buf).strip()
            if stmt:
                stmts.append(stmt)
            buf = []
            i += 1
            continue
        buf.append(ch)
        i += 1
    tail = "".join(buf).strip()
    if tail:
        stmts.append(tail)
    return stmts


def canon(stmt: str) -> str:
    """Whitespace-collapsed statement text — the ledger key."""
    return " ".join(stmt.split())


# ---------------------------------------------------------------------------
# Fixtures (SQLQueryTestSuite.scala:247-264 loadTestData)
# ---------------------------------------------------------------------------

def register_fixtures(spark: SparkSession) -> None:
    testdata = spark.createDataFrame(
        [(i, str(i)) for i in range(1, 101)],
        T.StructType([
            T.StructField("key", T.IntegerType()),
            T.StructField("value", T.StringType()),
        ]),
    )
    testdata.createOrReplaceTempView("testdata")
    arraydata = spark.createDataFrame(
        [([1, 2, 3], [[1, 2, 3]]), ([2, 3, 4], [[2, 3, 4]])],
        T.StructType([
            T.StructField("arraycol", T.ArrayType(T.IntegerType())),
            T.StructField("nestedarraycol",
                          T.ArrayType(T.ArrayType(T.IntegerType()))),
        ]),
    )
    arraydata.createOrReplaceTempView("arraydata")
    mapdata = spark.createDataFrame(
        [({1: "a1", 2: "b1", 3: "c1", 4: "d1", 5: "e1"},),
         ({1: "a2", 2: "b2", 3: "c2", 4: "d2"},),
         ({1: "a3", 2: "b3", 3: "c3"},),
         ({1: "a4", 2: "b4"},),
         ({1: "a5"},)],
        T.StructType([
            T.StructField("mapcol", T.MapType(T.IntegerType(), T.StringType())),
        ]),
    )
    mapdata.createOrReplaceTempView("mapdata")


FIXTURE_VIEWS = ("testdata", "arraydata", "mapdata")


def materialize_to_duckdb(spark: SparkSession,
                          con: duckdb.DuckDBPyConnection,
                          name: str,
                          spark_name: str | None = None) -> None:
    """Copy a Spark temp view/table into DuckDB via Arrow so both
    engines see bit-identical inputs.  Arrow preserves exact types
    (int32 stays int32, nulls stay typed) — no pandas dtype coercion
    in between."""
    tbl = spark.table(spark_name or name).toArrow()
    try:
        con.unregister(name)
    except Exception:
        pass
    con.register(name, tbl)


# ---------------------------------------------------------------------------
# Value normalization: engine-native row sets -> comparable canonical form
# ---------------------------------------------------------------------------

def _norm_cell(v):
    import datetime
    import math
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, (int, float, Decimal)):
        # One numeric domain: 10-significant-digit floats.  Engines
        # differ on int/decimal/hugeint surface types for the same
        # literal (Spark DECIMAL(19,0) vs DuckDB HUGEINT); the corpus
        # replay checks VALUES — typed parity is pinned by the
        # registry's strict driver hashes instead.
        f = float(v)
        if math.isnan(f):
            return None
        return float(f"{f:.10g}")
    if isinstance(v, (bytes, bytearray)):
        return bytes(v)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat(sep=" ")
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, datetime.timedelta):
        return ("interval", v.days, v.seconds, v.microseconds)
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    if isinstance(v, dict):
        # DuckDB surfaces MAP values as {'key': [...], 'value': [...]}.
        if set(v.keys()) == {"key", "value"} and isinstance(v["key"], list):
            items = zip(v["key"], v["value"])
            return tuple(sorted((_norm_cell(k), _norm_cell(x)) for k, x in items))
        return tuple(sorted((_norm_cell(k), _norm_cell(x)) for k, x in v.items()))
    # numpy scalars from Arrow paths
    item = getattr(v, "item", None)
    if item is not None and type(v).__module__.startswith("numpy"):
        return _norm_cell(v.item())
    return v


def norm_rows(rows) -> list[tuple]:
    out = [tuple(_norm_cell(c) for c in r) for r in rows]
    out.sort(key=repr)
    return out


# ---------------------------------------------------------------------------
# Divergence ledger
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class Ledgered:
    kind: str  # spark_error | duckdb_gap | value_diverges | skip
    reason: str


def L(kind: str, reason: str) -> Ledgered:
    assert kind in ("spark_error", "duckdb_gap", "value_diverges", "skip")
    assert reason
    return Ledgered(kind, reason)


# Reasons reference the behavior change, not internals:
#  * "2.1 tolerated / modern rejects" — the engine targets modern Spark
#    semantics (SURVEY.md §0: the reference adds no SQL surface of its
#    own, so modern-Spark strictness is the intended behavior).
#  * "DuckDB dialect" — Spark-only syntax the oracle cannot parse; the
#    Spark half still must execute, and the repo's registered queries
#    cover the same semantics with oracle-compatible SQL.
LEDGER: dict[tuple[str, str], Ledgered] = {}

#: Keys actually consulted during replays — the stale-entry test
#: asserts LEDGER ⊆ USED_LEDGER_KEYS after a full-corpus run.
USED_LEDGER_KEYS: set[tuple[str, str]] = set()


def _ledger(file: str, stmt: str, entry: Ledgered) -> None:
    LEDGER[(file, canon(stmt))] = entry


def _populate_ledger() -> None:
    from splitserve_spark.sql_corpus_ledger import populate
    populate(_ledger, L)


# ---------------------------------------------------------------------------
# Per-file replay
# ---------------------------------------------------------------------------

_VIEW_RE = re.compile(
    r"^\s*create\s+(?:or\s+replace\s+)?(global\s+)?temp(?:orary)?\s+view\s+"
    r"(?:if\s+not\s+exists\s+)?`?([\w.]+)`?",
    re.IGNORECASE,
)
_INSERT_RE = re.compile(r"^\s*insert\s+(?:into|overwrite)\s+(?:table\s+)?`?([\w.]+)`?",
                        re.IGNORECASE)
_CTAS_RE = re.compile(
    r"^\s*create\s+(?:external\s+)?table\s+(?:if\s+not\s+exists\s+)?`?([\w.]+)`?",
    re.IGNORECASE)
_DDL_RE = re.compile(
    r"^\s*(create|alter|drop|use|set|insert|truncate|analyze|cache|uncache|refresh)\b",
    re.IGNORECASE,
)
_META_RE = re.compile(r"^\s*(desc|describe|show|explain)\b", re.IGNORECASE)


@dataclass
class StmtResult:
    file: str
    stmt: str
    outcome: str  # match | both_error | spark_only_ok | ledgered:<kind> | DIVERGENCE
    detail: str = ""
    #: Spark's error string ("<TypeName>: message") when the Spark run
    #: raised, whatever the outcome — feeds the expected-error-kind
    #: cross-check against the reference's results/*.sql.out files.
    spark_err: str | None = None


def replay_file(spark: SparkSession, fname: str,
                results: list[StmtResult] | None = None) -> list[StmtResult]:
    """Run every statement of one corpus file through Spark and DuckDB.

    Returns per-statement results; outcome == "DIVERGENCE" marks an
    unexplained disagreement (the test asserts there are none).
    """
    if not LEDGER:
        _populate_ledger()
    path = os.path.join(CORPUS_DIR, fname)
    with open(path) as fh:
        stmts = split_statements(fh.read())

    con = duckdb.connect()
    register_fixtures(spark)
    for v in FIXTURE_VIEWS:
        materialize_to_duckdb(spark, con, v)

    out: list[StmtResult] = results if results is not None else []
    created_views: list[str] = []
    created_tables: list[str] = []

    # Physical tables the corpus creates (describe.sql, order-by-nulls)
    # land in a per-process database so a concurrent strict run or a
    # second pytest process can't collide on warehouse paths.
    corpus_db = f"sqlcorpus_p{os.getpid()}"
    try:
        spark.sql(f"CREATE DATABASE IF NOT EXISTS {corpus_db}")
        spark.sql(f"USE {corpus_db}")
        for stmt in stmts:
            out.append(_run_stmt(spark, con, fname, stmt,
                                 created_views, created_tables))
    finally:
        _cleanup(spark, created_views, created_tables)
        try:
            spark.sql("USE default")
            spark.sql(f"DROP DATABASE IF EXISTS {corpus_db} CASCADE")
        except Exception:
            pass
        con.close()
    return out


def _run_stmt(spark, con, fname, stmt, created_views, created_tables) -> StmtResult:
    key = (fname, canon(stmt))
    entry = LEDGER.get(key)
    if entry and entry.kind == "skip":
        USED_LEDGER_KEYS.add(key)
        return StmtResult(fname, stmt, "ledgered:skip", entry.reason)

    is_view = _VIEW_RE.match(stmt)
    is_ddl = _DDL_RE.match(stmt) is not None
    is_meta = _META_RE.match(stmt) is not None

    # ---- Spark side -------------------------------------------------------
    try:
        sdf = spark.sql(stmt)
        srows = sdf.collect()
        serr = None
    except Exception as e:  # noqa: BLE001 — engine error IS a result here
        srows, serr = None, f"{type(e).__name__}: {str(e)[:300]}"

    if is_view and serr is None:
        created_views.append(is_view.group(2))
    m_ctas = _CTAS_RE.match(stmt)
    if serr is None and m_ctas:
        created_tables.append(m_ctas.group(1))
    if serr is None and re.match(r"^\s*create\s+database\b", stmt, re.I):
        m = re.match(r"^\s*create\s+database\s+(?:if\s+not\s+exists\s+)?`?(\w+)`?", stmt, re.I)
        if m:
            created_tables.append("database:" + m.group(1))

    # ---- DDL / metadata: Spark-only by construction -----------------------
    if is_ddl or is_meta:
        if entry and entry.kind == "spark_error":
            if serr is not None:
                USED_LEDGER_KEYS.add(key)
                return StmtResult(fname, stmt, "ledgered:spark_error",
                                  entry.reason, spark_err=serr)
            return StmtResult(fname, stmt, "DIVERGENCE",
                              "ledger says spark_error but Spark succeeded — stale entry")
        if serr is not None:
            if is_meta:
                # The corpus marks many DESC/SHOW statements as
                # intentional error cases ("Raise an error in this
                # case"); an engine error IS the expected outcome.
                # Non-error metadata behavior is counted by the
                # spark_only_ok floor asserted in the test.
                return StmtResult(fname, stmt, "meta_error", serr,
                                  spark_err=serr)
            return StmtResult(fname, stmt, "DIVERGENCE",
                              f"Spark DDL failed un-ledgered: {serr}",
                              spark_err=serr)
        if is_view:
            # Mirror the new view into DuckDB so later queries compare.
            name = is_view.group(2)
            bare = name.split(".")[-1]
            spark_name = f"global_temp.{bare}" if is_view.group(1) else name
            try:
                materialize_to_duckdb(spark, con, bare, spark_name=spark_name)
            except Exception as e:  # noqa: BLE001
                return StmtResult(fname, stmt, "DIVERGENCE",
                                  f"view materialization to DuckDB failed: {e}")
        m_ins = _INSERT_RE.match(stmt)
        if m_ins or m_ctas:
            # A table gained rows (or was created): refresh the mirror.
            name = (m_ins or m_ctas).group(1)
            try:
                materialize_to_duckdb(spark, con, name.split(".")[-1],
                                      spark_name=name)
            except Exception as e:  # noqa: BLE001
                return StmtResult(fname, stmt, "DIVERGENCE",
                                  f"table materialization to DuckDB failed: {e}")
        if re.match(r"^\s*drop\s+view\b", stmt, re.I):
            m = re.search(r"view\s+(?:if\s+exists\s+)?`?([\w.]+)`?", stmt, re.I)
            if m:
                try:
                    con.unregister(m.group(1).split(".")[-1])
                except Exception:
                    pass
        return StmtResult(fname, stmt, "spark_only_ok")

    # ---- Query: run the oracle --------------------------------------------
    translated = to_duckdb(stmt)
    try:
        drows = con.execute(translated).fetchall()
        derr = None
    except Exception as e:  # noqa: BLE001
        drows, derr = None, f"{type(e).__name__}: {str(e)[:300]} [translated: {translated[:200]}]"

    # The same statement text can occur twice in a file under different
    # SET confs (order-by-ordinal.sql) — "both engines reject" always
    # passes, the ledger explains the occurrence where they split.
    if serr is not None and derr is not None:
        return StmtResult(fname, stmt, "both_error", spark_err=serr)
    if serr is not None:
        if entry and entry.kind == "spark_error":
            USED_LEDGER_KEYS.add(key)
            return StmtResult(fname, stmt, "ledgered:spark_error",
                              entry.reason, spark_err=serr)
        return StmtResult(fname, stmt, "DIVERGENCE",
                          f"Spark errored, DuckDB returned {len(drows)} rows: {serr}",
                          spark_err=serr)
    if derr is not None:
        if entry and entry.kind == "duckdb_gap":
            USED_LEDGER_KEYS.add(key)
            return StmtResult(fname, stmt, "ledgered:duckdb_gap", entry.reason)
        return StmtResult(fname, stmt, "DIVERGENCE",
                          f"DuckDB errored, Spark returned {len(srows)} rows: {derr}")

    if entry and entry.kind == "value_diverges":
        USED_LEDGER_KEYS.add(key)
        return StmtResult(fname, stmt, "ledgered:value_diverges", entry.reason)

    sn, dn = norm_rows(srows), norm_rows(drows)
    if sn == dn:
        return StmtResult(fname, stmt, "match")
    return StmtResult(fname, stmt, "DIVERGENCE",
                      f"values differ: spark={sn[:4]}… ({len(sn)} rows) "
                      f"duckdb={dn[:4]}… ({len(dn)} rows)")


def _cleanup(spark, created_views, created_tables) -> None:
    for v in created_views:
        try:
            if v.lower().startswith("global_temp.") or "." not in v:
                spark.catalog.dropTempView(v.split(".")[-1])
                spark.catalog.dropGlobalTempView(v.split(".")[-1])
        except Exception:
            pass
    for t in reversed(created_tables):
        try:
            if t.startswith("database:"):
                spark.sql(f"DROP DATABASE IF EXISTS {t[9:]} CASCADE")
            else:
                spark.sql(f"DROP TABLE IF EXISTS {t}")
        except Exception:
            pass
    try:
        spark.sql("USE default")
        spark.sql("SET spark.sql.crossJoin.enabled = true")
    except Exception:
        pass


# ---------------------------------------------------------------------------
# Expected-error cross-check against the reference's results/*.sql.out
# (r10 verdict "what's wrong" #2: "both engines reject" used to pass
# without asserting Spark rejects for the reference's documented
# reason; the .out files state the expected error class per statement).
# ---------------------------------------------------------------------------

RESULTS_DIR = os.environ.get(
    "SPARK_GRAFT_SQL_RESULTS",
    os.path.join(os.path.dirname(CORPUS_DIR), "results"),
)

_EXPECTED_ERROR_CACHE: dict[str, dict[str, list]] = {}


def expected_error_kinds(fname: str) -> dict[str, list]:
    """canon(stmt) → per-OCCURRENCE expected error kinds for the
    reference's ``results/<fname>.out``: a list with one entry per
    occurrence of that statement text, in file order — the kind for
    error cases (schema ``struct<>`` with an exception class as the
    first output line), None for occurrences the reference expects to
    SUCCEED.  Per-occurrence matters: order-by-ordinal.sql runs the
    same statement twice under different SET confs with OPPOSITE
    expected outcomes, so a canon-keyed scalar would apply the error
    expectation to both.  Kinds: 'parse' (catalyst.parser.
    ParseException), 'analysis' (AnalysisException + the NoSuch*
    analysis subclasses), 'other'.  Read from the read-only reference
    tree at test time, like the inputs — never copied into the repo."""
    if fname in _EXPECTED_ERROR_CACHE:
        return _EXPECTED_ERROR_CACHE[fname]
    out: dict[str, list] = {}
    path = os.path.join(RESULTS_DIR, fname + ".out")
    if os.path.isfile(path):
        with open(path) as fh:
            text = fh.read()
        blocks = re.split(r"^-- !query \d+$", text, flags=re.M)
        for body in blocks[1:]:
            parts = re.split(r"^-- !query \d+ schema$", body, flags=re.M)
            if len(parts) != 2:
                continue
            sql, rest = parts
            parts = re.split(r"^-- !query \d+ output$", rest, flags=re.M)
            if len(parts) != 2:
                continue
            schema, output = parts[0].strip(), parts[1].strip()
            first = output.splitlines()[0] if output else ""
            if schema != "struct<>":
                kind = None  # expected to succeed
            elif ("parser.ParseException" in first
                    or first.startswith("Exception parsing")):
                kind = "parse"
            elif "AnalysisException" in first or "analysis.NoSuch" in first:
                kind = "analysis"
            elif "Exception" in first:
                kind = "other"
            else:
                kind = None  # empty output, not an error case
            out.setdefault(canon(sql), []).append(kind)
    _EXPECTED_ERROR_CACHE[fname] = out
    return out


def spark_error_kind(spark_err: str | None) -> str | None:
    """Classify a captured Spark error string by its exception type."""
    if not spark_err:
        return None
    name = spark_err.split(":", 1)[0]
    if "ParseException" in name:
        return "parse"
    if "Analysis" in name or "NoSuch" in name:
        return "analysis"
    return "other"


#: Statements whose ERROR KIND legitimately moved between the 2.1-era
#: reference and modern Spark — each with the reason, asserted USED by
#: the test (a stale entry fails, same discipline as LEDGER).
ERROR_KIND_EVOLVED: dict[tuple[str, str], str] = {
    ("inline-table.sql",
     'select * from values ("one", 2.0), ("two") as data(a, b)'):
        "VALUES row-arity mismatch moved from analysis (2.1 resolver) to "
        "the parser's inline-table rule in modern Spark",
    ("inline-table.sql",
     'select * from values ("one"), ("two") as data(a, b)'):
        "VALUES row-arity-vs-alias mismatch moved from analysis (2.1) to "
        "the parser's inline-table rule in modern Spark",
    ("literals.sql",
     "select 1234567890123456789012345678901234567890"):
        "precision-39 integral literal: 2.1 rejected in the parser; modern "
        "Spark parses it and the DecimalType construction raises "
        "ArithmeticException (DECIMAL_PRECISION_EXCEEDS_MAX_PRECISION)",
    ("literals.sql",
     "select 1234567890123456789012345678901234567890.0"):
        "precision-41 decimal literal: same parser->DecimalType "
        "construction move as the integral form above",
    ("literals.sql", "select interval 10 nanoseconds"):
        "unknown interval unit: 2.1 rejected in the parser; modern Spark's "
        "interval utility raises IllegalArgumentException at unit lookup",
}

USED_EVOLVED_KEYS: set[tuple[str, str]] = set()


def expected_error_violations(results) -> tuple[list[str], int]:
    """Cross-check replay results against the reference's expected
    errors.  Returns (violations, n_verified) where n_verified counts
    statements whose Spark error KIND matched the .out expectation.

    Rules (parse/analysis expectations only — 'other' is not a class
    the 2.1 suite distinguishes reliably):
      * Spark errored → its kind must equal the expected kind, unless
        the (file, stmt) carries a reasoned ERROR_KIND_EVOLVED entry.
      * Spark succeeded on a reference-expected-error statement → the
        outcome must be a reasoned ledgered:* entry (engine evolution
        documented in sql_corpus_ledger.py); a bare match/spark_only_ok
        is a silent strictness regression and fails.
    """
    violations: list[str] = []
    verified = 0
    seen: dict[tuple[str, str], int] = {}
    for r in results:
        key = (r.file, canon(r.stmt))
        occurrence = seen.get(key, 0)
        seen[key] = occurrence + 1
        kinds = expected_error_kinds(r.file).get(canon(r.stmt), [])
        exp = kinds[occurrence] if occurrence < len(kinds) else None
        if exp not in ("parse", "analysis"):
            continue
        if r.spark_err is None:
            if not r.outcome.startswith("ledgered:"):
                violations.append(
                    f"{r.file}: reference expects a {exp} error but Spark "
                    f"succeeded un-ledgered ({r.outcome}): "
                    f"{canon(r.stmt)[:140]}")
            continue
        got = spark_error_kind(r.spark_err)
        if got == exp:
            verified += 1
        elif key in ERROR_KIND_EVOLVED:
            USED_EVOLVED_KEYS.add(key)
        else:
            violations.append(
                f"{r.file}: reference expects {exp}, Spark raised "
                f"{r.spark_err.split(':', 1)[0]}: {canon(r.stmt)[:140]}")
    return violations, verified
