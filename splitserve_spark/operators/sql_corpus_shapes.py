"""Representative query shapes extracted from the reference's SQL
logic-test corpus, registered as driver-verified queries.

tests/test_sql_logic_corpus.py replays the corpus files themselves
(inline VALUES data); these queries re-express the corpus's most
load-bearing SHAPES over the real TESTDATA tables so the verification
driver hash-checks them against DuckDB at sf0.01 like every other
registered operator.  Each docstring cites the originating input file
(reference: sql/core/src/test/resources/sql-tests/inputs/).

Every query here runs through the engine's SQL surface
(sql_entry.sql — verbatim Spark SQL), not the DataFrame API: the point
is the reference's *SQL dialect* semantics.

Scale notes per query; none introduces a new physical pattern — they
compile to the same broadcast/shuffle plans the core operators already
pin (joins.py, aggregates.py plan tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from splitserve_spark import sql_entry
from splitserve_spark.registry import register


@register(
    "sqlc_cube_with_syntax",
    oracle="""
    SELECT year(o_orderdate) AS yr, o_orderpriority AS pri,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
    FROM orders
    GROUP BY CUBE (year(o_orderdate), o_orderpriority)
    ORDER BY yr NULLS FIRST, pri NULLS FIRST, n
    """,
    tags=("sql-corpus", "aggregate", "cube"),
)
def sqlc_cube_with_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-style `GROUP BY keys WITH CUBE` (group-analytics.sql:5-11)
    with an expression key — the corpus exercises `a + b ... WITH CUBE`;
    here year(o_orderdate) is the computed key.  The oracle uses the
    ANSI CUBE() spelling, proving the two forms agree.

    Scale: cube = 4 grouping sets expanded BEFORE the shuffle with
    partial aggregation per set; no extra pass over the fact table."""
    return sql_entry.sql(spark, """
        SELECT year(o_orderdate) AS yr, o_orderpriority AS pri,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
        FROM orders
        GROUP BY year(o_orderdate), o_orderpriority WITH CUBE
        ORDER BY yr NULLS FIRST, pri NULLS FIRST, n
    """, sf_dir)


@register(
    "sqlc_having_grouping_col",
    oracle="""
    SELECT form, val FROM (
      SELECT 'grouped' AS form, CAST(count(o_orderkey) AS BIGINT) AS val
      FROM orders GROUP BY o_custkey + 1 HAVING o_custkey + 1 = 2
      UNION ALL
      SELECT 'global' AS form, CAST(min(o_custkey) AS BIGINT) AS val
      FROM (SELECT * FROM orders WHERE o_custkey > 0) t HAVING count(1) > 0
    ) u ORDER BY form
    """,
    tags=("sql-corpus", "aggregate", "having"),
)
def sqlc_having_grouping_col(spark: SparkSession, sf_dir: str) -> DataFrame:
    """having.sql's two subtle HAVING resolutions: (1) a HAVING
    condition over the grouping EXPRESSION (`GROUP BY v + 1 HAVING
    v + 1 = 2` — having.sql:12) and (2) HAVING on an ungrouped query,
    which turns it into a global aggregate (SPARK-11032,
    having.sql:15).  Same SQL runs on both engines.

    Scale: both forms are single hash aggregates; the HAVING predicate
    evaluates post-aggregation (no extra shuffle)."""
    return sql_entry.sql(spark, """
        SELECT form, val FROM (
          SELECT 'grouped' AS form, CAST(count(o_orderkey) AS BIGINT) AS val
          FROM orders GROUP BY o_custkey + 1 HAVING o_custkey + 1 = 2
          UNION ALL
          SELECT 'global' AS form, CAST(min(o_custkey) AS BIGINT) AS val
          FROM (SELECT * FROM orders WHERE o_custkey > 0) t HAVING count(1) > 0
        ) u ORDER BY form
    """, sf_dir)


@register(
    "sqlc_outer_join_coalesce",
    oracle="""
    SELECT CAST(sum(COALESCE(c.c_nationkey, 25)) AS BIGINT) AS s,
           COALESCE(c.c_nationkey, 25) * 2 AS d
    FROM customer c RIGHT JOIN orders o
      ON c.c_custkey = o.o_custkey AND c.c_nationkey < 10
    GROUP BY GREATEST(COALESCE(c.c_nationkey, 9), 5),
             COALESCE(c.c_nationkey, 25)
    HAVING sum(COALESCE(c.c_nationkey, 25)) > COALESCE(c.c_nationkey, 25) * 2
    ORDER BY s, d
    """,
    tags=("sql-corpus", "join", "outer"),
)
def sqlc_outer_join_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """outer-join.sql's SPARK-17099 regression shape: a RIGHT JOIN
    whose GROUP BY keys are GREATEST/COALESCE over the nullable side,
    with a HAVING comparing an aggregate against a grouping expression.
    The join condition's `c_nationkey < 10` filter manufactures the
    null-extended rows the original bug mis-grouped.

    Scale: the dimension (customer) side broadcasts below threshold;
    the aggregate shuffles once on the composite key."""
    return sql_entry.sql(spark, """
        SELECT CAST(sum(COALESCE(c.c_nationkey, 25)) AS BIGINT) AS s,
               COALESCE(c.c_nationkey, 25) * 2 AS d
        FROM customer c RIGHT JOIN orders o
          ON c.c_custkey = o.o_custkey AND c.c_nationkey < 10
        GROUP BY GREATEST(COALESCE(c.c_nationkey, 9), 5),
                 COALESCE(c.c_nationkey, 25)
        HAVING sum(COALESCE(c.c_nationkey, 25)) > COALESCE(c.c_nationkey, 25) * 2
        ORDER BY s, d
    """, sf_dir)


@register(
    "sqlc_scalar_subquery_max",
    oracle="""
    SELECT p.p_partkey AS partkey, CAST(l.l_quantity AS BIGINT) AS qty
    FROM part p, lineitem l
    WHERE p.p_partkey = l.l_partkey
      AND l.l_quantity = (SELECT max(l2.l_quantity) FROM lineitem l2
                          WHERE l2.l_partkey = p.p_partkey)
    ORDER BY partkey, qty
    """,
    tags=("sql-corpus", "subquery", "correlated"),
)
def sqlc_scalar_subquery_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    """scalar-subquery.sql's simplified TPCDS-Q32 (SPARK-18814.1): a
    correlated scalar aggregate subquery equated in the WHERE clause.
    Catalyst de-correlates it into an aggregate + join — the plan the
    original bug broke.

    Scale: the subquery becomes ONE grouped aggregate over lineitem
    reused across the outer probe (not a per-row re-scan); both scans
    prune to (partkey, quantity)."""
    return sql_entry.sql(spark, """
        SELECT p.p_partkey AS partkey, CAST(l.l_quantity AS BIGINT) AS qty
        FROM part p, lineitem l
        WHERE p.p_partkey = l.l_partkey
          AND l.l_quantity = (SELECT max(l2.l_quantity) FROM lineitem l2
                              WHERE l2.l_partkey = p.p_partkey)
        ORDER BY partkey, qty
    """, sf_dir)


@register(
    "sqlc_order_by_ordinal_nulls",
    oracle="""
    SELECT NULLIF(o_custkey % 7, 0) AS bucket, CAST(count(*) AS BIGINT) AS n
    FROM orders GROUP BY 1 ORDER BY 2 DESC, 1 ASC NULLS LAST
    """,
    tags=("sql-corpus", "sort", "ordinal"),
)
def sqlc_order_by_ordinal_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """group-by-ordinal.sql + order-by-ordinal.sql +
    order-by-nulls-ordering.sql in one: GROUP BY 1 binds the computed
    bucket, ORDER BY 2 DESC the aggregate, and the NULL bucket (NULLIF
    folds bucket 0 to NULL) is pinned LAST explicitly — Spark's ASC
    default is NULLS FIRST while DuckDB's is NULLS LAST, so the corpus's
    explicit-nulls-ordering discipline is exactly what makes the two
    engines agree.

    Scale: one hash aggregate + a global sort of ≤7 rows."""
    return sql_entry.sql(spark, """
        SELECT NULLIF(o_custkey % 7, 0) AS bucket,
               CAST(count(*) AS BIGINT) AS n
        FROM orders GROUP BY 1 ORDER BY 2 DESC, 1 ASC NULLS LAST
    """, sf_dir)


@register(
    "sqlc_inline_values_union",
    oracle="""
    SELECT CAST(k AS INTEGER) AS k, CAST(v AS DOUBLE) AS v FROM (
      SELECT r_regionkey AS k, CAST(r_regionkey AS DOUBLE) AS v FROM region
      UNION ALL
      SELECT * FROM (VALUES (98, CAST(2 AS DOUBLE)), (99, 3.5)) t(k, v)
    ) u ORDER BY k, v
    """,
    tags=("sql-corpus", "inline-table", "union"),
)
def sqlc_inline_values_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """inline-table.sql's typed VALUES coercion (int + 2L + 3.5D rows
    coerce column-wise) unioned with a real table slice — union.sql's
    "Type Coerced Union".  The Spark side exercises the dialect's bare
    `FROM VALUES ... AS t(k, v)` inline-table syntax and its int/long/
    double coercion lattice; the oracle spells the coercions out.

    Scale: inline tables are LocalRelations — planner-side constant
    data, never a distributed scan."""
    return sql_entry.sql(spark, """
        SELECT CAST(k AS INT) AS k, CAST(v AS DOUBLE) AS v FROM (
          SELECT r_regionkey AS k, CAST(r_regionkey AS BIGINT) AS v
          FROM region
          UNION ALL
          SELECT * FROM VALUES (98, 2L), (99, 3.5D) AS t(k, v)
        ) u ORDER BY k, v
    """, sf_dir)


@register(
    "sqlc_anti_join_null_cond",
    oracle="""
    SELECT o_orderkey FROM orders o
    WHERE NOT EXISTS (
      SELECT 1 FROM region r
      WHERE (o.o_custkey = o.o_orderkey) IS NULL
         OR o.o_custkey % 8 = r.r_regionkey)
    ORDER BY o_orderkey
    """,
    tags=("sql-corpus", "join", "anti"),
)
def sqlc_anti_join_null_cond(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pred-pushdown.sql's SPARK-18597 shape: a LEFT ANTI JOIN whose
    condition wraps a left-side-only predicate in IS NULL — pushing it
    to the left input would flip anti-join rows; the corpus pins that
    it must stay in the join condition.  Kept rows are orders with
    o_custkey % 8 in 5..7 (regionkeys are 0..4).

    Scale: region broadcasts; the anti join is a broadcast-hash
    left-anti probe, zero shuffle of orders."""
    return sql_entry.sql(spark, """
        SELECT o_orderkey FROM orders
        LEFT ANTI JOIN region
          ON ((orders.o_custkey = orders.o_orderkey) IS NULL
              OR orders.o_custkey % 8 = region.r_regionkey)
        ORDER BY o_orderkey
    """, sf_dir)


@register(
    "sqlc_exists_or_disjunct",
    oracle="""
    SELECT c_custkey FROM customer c
    WHERE EXISTS (SELECT 1 FROM region r
                  WHERE c.c_nationkey = r.r_regionkey + 20)
       OR c_custkey < 50
    ORDER BY c_custkey
    """,
    tags=("sql-corpus", "subquery", "existence"),
)
def sqlc_exists_or_disjunct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pred-pushdown.sql's SPARK-18614 shape: EXISTS in a DISJUNCTION
    with a plain predicate.  Spark plans this as an ExistenceJoin (the
    exists-flag join) because a semi join can't express the OR; the
    corpus pins that the left-side disjunct must not be pushed below
    it.  Matches are customers in nations 20-24 plus low custkeys.

    Scale: region broadcasts as the existence build side; customer
    scans once."""
    return sql_entry.sql(spark, """
        SELECT c_custkey FROM customer c
        WHERE EXISTS (SELECT 1 FROM region r
                      WHERE c.c_nationkey = r.r_regionkey + 20)
           OR c_custkey < 50
        ORDER BY c_custkey
    """, sf_dir)
