"""Divergence ledger for the reference SQL logic-test corpus replay.

Every entry explains ONE statement whose Spark run and DuckDB-oracle
run legitimately disagree.  Kinds:

  spark_error    — Spark (this engine's target semantics) rejects the
                   statement; the reference's own expected-output file
                   (sql-tests/results/<file>.out) records the same
                   AnalysisException/ParseException for every entry so
                   marked "ref .out: error".
  duckdb_gap     — Spark-only dialect/behavior the DuckDB oracle cannot
                   express even through sql_dialect.to_duckdb; the Spark
                   half must still execute successfully.
  value_diverges — both engines succeed with a documented formula
                   difference.
  skip           — not replayed at all (reason required).

tests/test_sql_logic_corpus.py asserts the ledger carries no stale
entries (every entry must be hit by a replay).
"""

from __future__ import annotations


def populate(ledger, L) -> None:  # noqa: N803 — L is the entry factory
    # --- group-analytics.sql / grouping_set.sql: grouping surfaces -------
    for stmt in (
        "SELECT course, year, GROUPING(course) FROM courseSales GROUP BY course, year",
        "SELECT course, year, GROUPING_ID(course, year) FROM courseSales GROUP BY course, year",
        "SELECT course, year FROM courseSales GROUP BY course, year HAVING GROUPING(course) > 0",
        "SELECT course, year FROM courseSales GROUP BY course, year HAVING GROUPING_ID(course) > 0",
        "SELECT course, year FROM courseSales GROUP BY course, year ORDER BY GROUPING(course)",
        "SELECT course, year FROM courseSales GROUP BY course, year ORDER BY GROUPING_ID(course)",
    ):
        ledger("group-analytics.sql", stmt, L(
            "spark_error",
            "grouping()/grouping_id() outside GROUPING SETS/CUBE/ROLLUP is an "
            "analysis error in Spark (ref .out: error); DuckDB returns 0 for "
            "plain GROUP BY"))
    for stmt in (
        "SELECT course, year, grouping__id FROM courseSales GROUP BY CUBE(course, year)",
        "SELECT course, year FROM courseSales GROUP BY CUBE(course, year) HAVING grouping__id > 0",
        "SELECT course, year FROM courseSales GROUP BY CUBE(course, year) ORDER BY grouping__id",
    ):
        ledger("group-analytics.sql", stmt, L(
            "duckdb_gap",
            "Hive's implicit grouping__id virtual column has no DuckDB "
            "equivalent (the function form IS value-verified two statements "
            "earlier via grouping_id -> grouping translation)"))
    for stmt in (
        "SELECT course, year, SUM(earnings) FROM courseSales GROUP BY course, year GROUPING SETS(course)",
        "SELECT course, year, SUM(earnings) FROM courseSales GROUP BY course, year GROUPING SETS(year)",
    ):
        ledger("group-analytics.sql", stmt, L(
            "duckdb_gap",
            "Spark's Hive-style GROUP BY cols GROUPING SETS(subset) lets the "
            "select list keep grouped-out columns (returned as NULL); "
            "ANSI/DuckDB requires every selected column in some grouping set"))
    for stmt in (
        "SELECT a, b, c, count(d) FROM grouping GROUP BY a, b, c GROUPING SETS (())",
        "SELECT a, b, c, count(d) FROM grouping GROUP BY a, b, c GROUPING SETS ((a))",
        "SELECT a, b, c, count(d) FROM grouping GROUP BY a, b, c GROUPING SETS ((c))",
    ):
        ledger("grouping_set.sql", stmt, L(
            "duckdb_gap",
            "same Hive-style grouped-out-columns-as-NULL semantics as "
            "group-analytics.sql; ANSI/DuckDB rejects the select list"))

    # --- group-by.sql ------------------------------------------------------
    ledger("group-by.sql",
           "SELECT SKEWNESS(a), KURTOSIS(a), MIN(a), MAX(a), AVG(a), "
           "VARIANCE(a), STDDEV(a), SUM(a), COUNT(a) FROM testData",
           L("value_diverges",
             "skewness/kurtosis formulas differ: Spark computes population "
             "moments (g1, g2-3), DuckDB bias-corrected sample moments (G1, "
             "G2); min/max/avg/var/stddev/sum/count all match — verified by "
             "hand for this 7-value input"))
    ledger("group-by.sql",
           "SELECT COUNT(DISTINCT b), COUNT(DISTINCT b, c) FROM (SELECT 1 AS "
           "a, 2 AS b, 3 AS c) GROUP BY a",
           L("duckdb_gap",
             "multi-argument COUNT(DISTINCT b, c) is not in DuckDB; a "
             "struct-pack rewrite would change NULL semantics (Spark skips "
             "rows where ANY argument is null)"))

    # --- group-by-ordinal.sql ----------------------------------------------
    ledger("group-by-ordinal.sql",
           "select a, rand(0), sum(b) from data group by a, 2",
           L("duckdb_gap",
             "rand(seed) values are engine-seeded; no cross-engine oracle "
             "for the random column (same rule that excludes random.sql)"))
    ledger("group-by-ordinal.sql", "select * from data group by a, b, 1",
           L("spark_error",
             "Spark rejects star select with ordinal GROUP BY "
             "(STAR_GROUP_BY_POS; ref .out: error); DuckDB expands the star"))
    ledger("group-by-ordinal.sql", "select sum(b) from data group by -1",
           L("duckdb_gap",
             "Spark treats a negative/zero GROUP BY literal as a constant "
             "expression (single group); DuckDB binds every integer literal "
             "as an ordinal and rejects out-of-range"))

    # --- order-by-ordinal.sql ----------------------------------------------
    for stmt in ("select * from data order by 0",
                 "select * from data sort by 0"):
        ledger("order-by-ordinal.sql", stmt, L(
            "duckdb_gap",
            "Spark treats ORDER/SORT BY 0 as a constant sort key (no-op "
            "ordering); DuckDB binds it as an out-of-range ordinal"))

    # --- cte.sql -------------------------------------------------------------
    ledger("cte.sql", "WITH t AS (SELECT 1 FROM t) SELECT * FROM t",
           L("duckdb_gap",
             "CTE name resolution differs: Spark resolves the inner `t` to "
             "the earlier temp view t (3 rows); DuckDB treats it as a "
             "circular CTE reference and errors"))
    ledger("cte.sql",
           "WITH t1 AS (SELECT * FROM t2), t2 AS (SELECT 2 FROM t1) SELECT "
           "* FROM t1 cross join t2",
           L("duckdb_gap",
             "same resolution rule for forward references: Spark reads the "
             "temp views t1/t2, DuckDB sees a circular CTE chain"))

    # --- cross-join.sql ------------------------------------------------------
    ledger("cross-join.sql",
           "SELECT a.key, b.key FROM (SELECT k key FROM nt1 WHERE v1 < 2) a "
           "CROSS JOIN (SELECT k key FROM nt2 WHERE v2 = 22) b",
           L("duckdb_gap",
             "`key` is a DuckDB reserved word used here as a bare (AS-less) "
             "column alias; quoting it automatically would need full "
             "identifier analysis"))

    # --- array.sql -----------------------------------------------------------
    ledger("array.sql",
           "select sort_array(array('b', 'd'), cast(NULL as boolean))",
           L("duckdb_gap",
             "sort_array with a NULL sort-direction argument (Spark errors "
             "at runtime ordering but 2.1 returned a value) has no list_sort "
             "equivalent; the boolean-literal forms ARE value-verified"))

    # --- limit.sql -----------------------------------------------------------
    ledger("limit.sql", "select * from testdata limit true",
           L("spark_error",
             "Spark requires an integer LIMIT (ref .out: error); DuckDB "
             "coerces the boolean to 1"))

    # --- literals.sql ----------------------------------------------------------
    for stmt in ("select 1234567890123456789012345678901234567890",
                 "select 1234567890123456789012345678901234567890.0"):
        ledger("literals.sql", stmt, L(
            "spark_error",
            "DecimalType precision caps at 38 in Spark (ref .out: error); "
            "DuckDB falls back to DOUBLE for the oversized literal"))
    ledger("literals.sql", "select 1E309, -1E309",
           L("spark_error",
             "Spark range-checks double literals at parse (ref .out: error); "
             "DuckDB returns +/-inf"))
    ledger("literals.sql", "select 1.20E-38BD",
           L("spark_error",
             "scale>38 decimal literal: Spark rejects (ref .out: error); the "
             "translated CAST AS DOUBLE succeeds in DuckDB"))
    ledger("literals.sql",
           "select interval 13.123456789 seconds, interval -13.123456789 second",
           L("duckdb_gap",
             "fractional single-unit CalendarInterval literals are Spark "
             "dialect; DuckDB INTERVAL requires integer unit counts"))

    # --- table-valued-functions.sql -------------------------------------------
    ledger("table-valued-functions.sql", "select * from range(1, null)",
           L("spark_error",
             "Spark requires non-null BIGINT range bounds (modern analysis "
             "error; 2.1 .out returned empty) — DuckDB returns 0 rows"))
