"""Query registry: the bridge between operator modules and the driver contract.

Every implemented operator/query from SURVEY.md §2 registers itself here
with (a) a Spark callable ``(spark, sf_dir) -> DataFrame`` and (b) an
equivalent ANSI-SQL string a DuckDB oracle can run on the same parquet
tables.  ``__spark_entry__.py`` exposes the registry to the verification
driver; tests/conftest.py runs the same comparison locally.

Determinism contract (FIXTURES.md): every registered query orders its
output by a unique key (or is a grouped result with unique group keys),
avoids non-deterministic functions in the hash set, and aliases every
computed column identically on both sides.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB-runnable SQL; None → rows-only check
    tags: tuple[str, ...] = ()
    bench: bool = False  # include in bench.py headline set
    doc: str = ""
    priority: int = 50  # ordering for the driver's queries() dict
    seq: int = 0  # registration sequence (tiebreaker within priority)


REGISTRY: dict[str, QuerySpec] = {}

# Priority tiers (lower = earlier in queries()).  The driver verifies
# only the first ~DRIVER_WINDOW entries per round; ordered_registry()
# additionally rotates already-driver-green names (_DRIVER_GREEN) behind
# never-verified ones, so tiers order queries WITHIN each of those two
# groups.  Tier 35 = fixed/added this round, must (re-)verify.
#   0  TPC-H Q1-Q22
#   10 TPC-DS paper quartet
#   20 LLM-pipeline operators (dedup/similarity/text/multimodal/pipeline)
#   30 core joins/aggregates/windows highlights
#   50 default (everything else with an oracle)
#   90 no-oracle rows-only queries — register last, never in the window
PRI_TPCH = 0
PRI_TPCDS = 10
PRI_PIPELINE = 20
PRI_CORE = 30
PRI_DEFAULT = 50
PRI_NO_ORACLE = 90
#: Deliberately deferred to the NEXT round's window: registered after
#: the current round's 50 never-checked names exactly filled the
#: driver window (displacing the rows-only names that have waited
#: since round 1 would break the round's verification plan).  These
#: sort behind every earlier never-checked name and are picked up
#: first by the following round's rotation.
PRI_NEXT_WINDOW = 95
#: Additions made while a round's backlog already fills the driver
#: window exactly: sort behind BOTH that backlog (95) and its
#: strictly-last stragglers (96) — seq follows module-load order, so
#: a merely-equal priority would let a new query in an early-loaded
#: module displace an older backlog name and break the round's
#: verification plan.
PRI_BEHIND_BACKLOG = 98

import re  # noqa: E402

_TIER_PATTERNS: tuple[tuple[re.Pattern, int], ...] = (
    (re.compile(r"^q\d+_"), PRI_TPCH),
    (re.compile(r"^qds\d+_"), PRI_TPCDS),
    (re.compile(
        r"^(pipeline_|dedup_|sim_|text_|mm_|asof_|range_join_"
        r"|join_salted|join_bucketed)"), PRI_PIPELINE),
)

# Oracle-backed relational highlights promoted into the driver window.
_CORE_HIGHLIGHTS = frozenset({
    "agg_variance", "agg_collect_sorted", "agg_rollup",
    "window_ranking", "window_range_frame",
    "setop_except", "join_full_outer", "subq_exists_correlated",
})

# Driver-verification history, DERIVED from the committed
# CORRECTNESS_r*.json evidence files at import time (never
# hand-maintained — rounds 3 and 4 were both lost to a stale
# hand-edited set).  For each query name the LATEST round's verdict
# wins: green = hash_match true (or, for rows-only checks, rows_match
# true with no hash); red/errored names stay OUT of the green set so
# they re-enter the driver window and re-verify.
import json as _json  # noqa: E402
import pathlib as _pathlib  # noqa: E402

_REPO_ROOT = _pathlib.Path(__file__).resolve().parent.parent


def verdict_ok(v: dict) -> bool:
    """The driver-verdict pass rule, shared by the registry loader and
    tests/test_registry.py (one predicate — they can't drift apart):
    err == 'no_oracle' is the driver's weaker rows-only check (pass =
    it ran and produced a row count); any other err is red; otherwise
    hash_match wins when present, else rows_match."""
    err = v.get("err")
    if err == "no_oracle":
        return v.get("spark_rows") is not None
    if err is not None:
        return False
    if v.get("hash_match") is not None:
        return bool(v["hash_match"])
    return bool(v.get("rows_match"))


def _load_driver_verdicts() -> tuple[dict[str, bool], frozenset,
                                     dict[str, int]]:
    """(name → latest driver verdict, names whose latest PASS was the
    weaker rows-only check, name → round of its latest verdict) across
    all committed CORRECTNESS_r*.json files, in round order
    (r01 < r02 < …)."""
    latest: dict[str, bool] = {}
    rows_only: dict[str, bool] = {}
    rounds: dict[str, int] = {}
    for path in sorted(_REPO_ROOT.glob("CORRECTNESS_r*.json")):
        try:
            results = _json.loads(path.read_text())
        except (OSError, ValueError):
            continue  # unreadable evidence file — skip, never crash import
        if not isinstance(results, dict):
            continue
        m = re.search(r"r(\d+)", path.stem)
        rnd = int(m.group(1)) if m else 0
        for name, v in results.items():
            if not isinstance(v, dict):
                continue
            latest[name] = verdict_ok(v)
            rows_only[name] = v.get("err") == "no_oracle"
            rounds[name] = rnd
    return latest, frozenset(
        n for n, ro in rows_only.items() if ro and latest.get(n)
    ), rounds


_DRIVER_VERDICTS, _DRIVER_ROWS_ONLY, _DRIVER_EVIDENCE_ROUND = (
    _load_driver_verdicts()
)
#: Every name the driver has EVER checked (green or red).
_DRIVER_CHECKED = frozenset(_DRIVER_VERDICTS)
#: Names whose latest driver verdict passed — rotate behind never-checked.
_DRIVER_GREEN = frozenset(n for n, ok in _DRIVER_VERDICTS.items() if ok)


def _default_priority(name: str, has_oracle: bool) -> int:
    if not has_oracle:
        return PRI_NO_ORACLE
    for pat, tier in _TIER_PATTERNS:
        if pat.match(name):
            return tier
    if name in _CORE_HIGHLIGHTS:
        return PRI_CORE
    return PRI_DEFAULT


def register(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
    bench: bool = False,
    priority: int | None = None,
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a query under ``name`` with its oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        pri = priority
        if pri is None:
            pri = _default_priority(name, oracle is not None)
        REGISTRY[name] = QuerySpec(
            name=name, fn=fn, oracle=oracle, tags=tags, bench=bench,
            doc=(fn.__doc__ or "").strip(), priority=pri, seq=len(REGISTRY),
        )
        return fn

    return deco


#: Size of the driver's per-round verification window (observed r1/r2).
DRIVER_WINDOW = 50


def _settled(spec: QuerySpec) -> bool:
    """True when the driver's latest verdict fully certifies this spec:
    a green hash verdict, or a rows-only pass for a query that still
    has no oracle.  A query whose only green was the weaker rows-only
    check but which NOW carries an oracle (upgraded this round) is NOT
    settled — it re-enters the window for a value-checked verdict."""
    if spec.name not in _DRIVER_GREEN:
        return False
    return not (spec.name in _DRIVER_ROWS_ONLY and spec.oracle is not None)


def _staleness_key(spec: QuerySpec) -> tuple:
    """Sort key for settled specs: oldest-evidence-round first.  With
    certification debt at zero (every name settled, round 8), a
    (priority, seq) tie-break would re-check the SAME 50 names every
    round while the other 258 certifications age — some date to r1,
    several runtime upgrades ago.  Rotating by evidence round means
    each round's window re-certifies the 50 longest-unverified names,
    so every certification refreshes on a ~6-round cycle."""
    return (_DRIVER_EVIDENCE_ROUND.get(spec.name, 0), spec.priority,
            spec.seq)


def ordered_registry() -> dict[str, QuerySpec]:
    """Registry in driver-facing order: never-driver-verified queries
    first (by priority tier, then registration sequence), already-green
    ones last — and among the settled, stalest certification first
    (see _staleness_key).  The driver checks only the first
    ~DRIVER_WINDOW entries of queries() per round, so this rotation
    maximizes cumulative driver-verified coverage and keeps every
    certification fresh."""
    load_all()
    return {
        spec.name: spec
        for spec in sorted(
            REGISTRY.values(),
            key=lambda s: (
                (True,) + _staleness_key(s) if _settled(s)
                else (False, 0, s.priority, s.seq)
            ),
        )
    }


def driver_window(n: int = DRIVER_WINDOW) -> list[str]:
    """The first ``n`` names of the driver-facing order — what the
    driver will actually hash-check this round (introspection/tests)."""
    return list(ordered_registry())[:n]


_MODULES = (
    "splitserve_spark.operators.relational",
    "splitserve_spark.operators.joins",
    "splitserve_spark.operators.aggregates",
    "splitserve_spark.operators.windows",
    "splitserve_spark.operators.setops",
    "splitserve_spark.operators.subqueries",
    "splitserve_spark.operators.tpch",
    "splitserve_spark.operators.tpcds_paper",
    "splitserve_spark.operators.udf_surface",
    "splitserve_spark.operators.stats",
    "splitserve_spark.operators.catalog_ddl",
    "splitserve_spark.operators.rdd_surface",
    "splitserve_spark.operators.scale_patterns",
    "splitserve_spark.operators.temporal_joins",
    "splitserve_spark.operators.pipeline",
    "splitserve_spark.operators.training_prep",
    "splitserve_spark.operators.dedup",
    "splitserve_spark.operators.similarity",
    "splitserve_spark.operators.text",
    "splitserve_spark.operators.multimodal",
    "splitserve_spark.operators.graph",
    "splitserve_spark.operators.ml",
    "splitserve_spark.operators.modern_sql",
    "splitserve_spark.operators.sql_corpus_shapes",
    "splitserve_spark.operators.analytics",
    "splitserve_spark.sources.io",
    "splitserve_spark.sources.python_ds",
    "splitserve_spark.sources.kafka_shaped",
    "splitserve_spark.functions.strings",
    "splitserve_spark.functions.math_fns",
    "splitserve_spark.functions.datetime_fns",
    "splitserve_spark.functions.json_fns",
    "splitserve_spark.functions.conditional",
    "splitserve_spark.functions.collections",
    "splitserve_spark.functions.hashes",
    "splitserve_spark.streaming.windows",
    "splitserve_spark.streaming.stateful",
    "splitserve_spark.streaming.custom_state",
    # streaming.transform_state is NOT registered: its driver worker
    # needs google.protobuf, absent in this env (see module docstring
    # + README env-limited surfaces).  tests/test_transform_state.py
    # importorskips and activates if protobuf ever lands.
    "splitserve_spark.streaming.sinks",
)


def load_all() -> dict[str, QuerySpec]:
    """Import every operator module (triggering registration) and return
    the full registry."""
    for mod in _MODULES:
        try:
            importlib.import_module(mod)
        except ModuleNotFoundError as ex:
            # Only tolerate the module itself being absent (incremental
            # rounds); a missing transitive dependency must NOT silently
            # shrink the driver's query inventory.
            if ex.name != mod:
                raise
    return REGISTRY
