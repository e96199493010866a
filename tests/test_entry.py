"""Docstring-vs-registry drift guard: the counts advertised in
__spark_entry__'s module docstring must equal the live registry."""
from __future__ import annotations

import re


def test_entry_docstring_counts_match_registry():
    import __spark_entry__ as entry

    from splitserve_spark.registry import REGISTRY, load_all

    load_all()
    doc = entry.__doc__
    n_queries = int(re.search(r"\((\d+) entries:", doc).group(1))
    n_oracles = int(re.search(r"\((\d+) entries;", doc).group(1))
    assert n_queries == len(REGISTRY), (
        f"docstring says {n_queries} queries, registry has {len(REGISTRY)}"
    )
    actual_oracles = sum(1 for s in REGISTRY.values() if s.oracle is not None)
    assert n_oracles == actual_oracles, (
        f"docstring says {n_oracles} oracles, registry has {actual_oracles}"
    )


def test_entry_exports_match_registry():
    import __spark_entry__ as entry

    from splitserve_spark.registry import REGISTRY, load_all

    load_all()
    qs = entry.queries()
    assert set(qs) == set(REGISTRY)
    oracles = entry.oracle_sql()
    assert set(oracles) == {n for n, s in REGISTRY.items() if s.oracle is not None}
