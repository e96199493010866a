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


REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
    bench: bool = False,
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a query under ``name`` with its oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(
            name=name, fn=fn, oracle=oracle, tags=tags, bench=bench,
            doc=(fn.__doc__ or "").strip(),
        )
        return fn

    return deco


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
    "splitserve_spark.operators.dedup",
    "splitserve_spark.operators.similarity",
    "splitserve_spark.operators.text",
    "splitserve_spark.operators.multimodal",
    "splitserve_spark.operators.graph",
    "splitserve_spark.operators.ml",
    "splitserve_spark.sources.io",
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
)


def load_all() -> dict[str, QuerySpec]:
    """Import every operator module (triggering registration) and return
    the full registry."""
    for mod in _MODULES:
        try:
            importlib.import_module(mod)
        except ModuleNotFoundError:
            pass  # module not built yet (incremental rounds)
    return REGISTRY
