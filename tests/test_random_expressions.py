"""Randomized expression parity (SURVEY.md §5 'Randomized' row).

The reference feeds RandomDataGenerator rows through interpreted vs
codegen expression paths and asserts agreement
(`sql/catalyst/src/test/.../expressions/`).  The cross-engine analogue
here: hypothesis-generated rows run through the same expression in
Spark SQL and DuckDB; results must agree on every example.  Expressions
are restricted to the semantically-aligned subset (SURVEY.md §7 risk
register excludes integer-division/coercion/timezone divergences).
"""

from __future__ import annotations

import math

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SAFE_INTS = st.integers(min_value=-(2**31) + 1, max_value=2**31 - 1)
SAFE_FLOATS = st.floats(
    min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
)
SAFE_STRINGS = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789 _-",
    max_size=20,
)

ROWS = st.lists(
    st.tuples(
        st.one_of(st.none(), SAFE_INTS),
        st.one_of(st.none(), SAFE_FLOATS),
        st.one_of(st.none(), SAFE_STRINGS),
    ),
    min_size=1,
    max_size=8,
)

#: (select-list, tolerance) — identical text runs on both engines over
#: a table t(i BIGINT, x DOUBLE, s VARCHAR, rid BIGINT).
EXPRESSIONS = [
    ("abs(i) AS v", 0),
    ("i + 7 AS v", 0),
    ("i * 3 AS v", 0),
    ("coalesce(i, -1) AS v", 0),
    ("greatest(i, 0) AS v", 0),
    ("least(i, 0) AS v", 0),
    ("CASE WHEN i > 0 THEN 'pos' WHEN i < 0 THEN 'neg' ELSE NULL END AS v", 0),
    ("round(x, 2) AS v", 1e-9),
    ("x + x AS v", 1e-9),
    ("sqrt(abs(x)) AS v", 1e-9),
    ("floor(x) AS v", 0),
    ("ceil(x) AS v", 0),
    ("upper(s) AS v", 0),
    ("lower(s) AS v", 0),
    ("length(s) AS v", 0),
    ("substr(s, 2, 3) AS v", 0),
    ("trim(s) AS v", 0),
    ("reverse(s) AS v", 0),
    # NB: concat() itself diverges (Spark returns NULL on any NULL arg,
    # DuckDB treats NULL as '') — `||` propagates NULL in both engines.
    ("(s || '!') AS v", 0),
    ("replace(s, 'a', 'b') AS v", 0),
    ("coalesce(nullif(s, ''), '<empty>') AS v", 0),
    ("s LIKE '%a%' AS v", 0),
]


@pytest.fixture(scope="module")
def duck():
    return duckdb.connect()


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=ROWS)
def test_expression_parity(spark, duck, rows):
    data = [(i, x, s, rid) for rid, (i, x, s) in enumerate(rows)]
    sdf = spark.createDataFrame(data, "i long, x double, s string, rid long")
    sdf.createOrReplaceTempView("hyp_t")
    duck.execute("DROP TABLE IF EXISTS hyp_t")
    duck.execute("CREATE TABLE hyp_t (i BIGINT, x DOUBLE, s VARCHAR, rid BIGINT)")
    duck.executemany("INSERT INTO hyp_t VALUES (?, ?, ?, ?)", data)

    select = ", ".join(
        e.replace(" AS v", f" AS v{k}") for k, (e, _) in enumerate(EXPRESSIONS)
    )
    q = f"SELECT {select} FROM hyp_t ORDER BY rid"
    got = spark.sql(q).collect()
    want = duck.execute(q).fetchall()
    assert len(got) == len(want)
    for g_row, w_row, row in zip(got, want, data):
        for k, (expr, tol) in enumerate(EXPRESSIONS):
            g, w = g_row[f"v{k}"], w_row[k]
            if g is None or w is None:
                assert g is None and w is None, (expr, row, g, w)
            elif tol and isinstance(g, float):
                assert math.isclose(g, w, rel_tol=tol, abs_tol=tol), (expr, row, g, w)
            else:
                assert g == w, (expr, row, g, w)
