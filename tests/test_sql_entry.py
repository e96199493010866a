from __future__ import annotations

import pytest

from splitserve_spark import sql_entry
from splitserve_spark.registry import REGISTRY, load_all
from tests.oracle_utils import SF_DIR, duck_connection

load_all()

#: Verbatim reference-style SQL — each runs through spark.sql AND the
#: DuckDB oracle; both see identical table names.
SQL_QUERIES = {
    "tpch_q1": """
        SELECT l_returnflag, l_linestatus,
               sum(l_quantity) AS sum_qty,
               avg(l_extendedprice) AS avg_price,
               count(*) AS n
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    "join_subquery": """
        SELECT o_orderpriority, count(*) AS n
        FROM orders
        WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    "cte_window": """
        WITH ranked AS (
          SELECT c_custkey, c_acctbal, c_mktsegment,
                 row_number() OVER (PARTITION BY c_mktsegment
                                    ORDER BY c_acctbal DESC, c_custkey) AS rn
          FROM customer)
        SELECT c_mktsegment, c_custkey, c_acctbal
        FROM ranked WHERE rn <= 3
        ORDER BY c_mktsegment, c_acctbal DESC, c_custkey
    """,
}


@pytest.mark.parametrize("name", sorted(SQL_QUERIES))
def test_sql_entry_matches_oracle(spark, name):
    from tests.oracle_utils import compare_frames

    q = SQL_QUERIES[name]
    got = sql_entry.sql(spark, q, SF_DIR).toPandas()
    con = duck_connection(SF_DIR)
    try:
        want = con.execute(q).df()
    finally:
        con.close()
    compare_frames(got, want, name)


def test_sql_entry_matches_dataframe_path(spark):
    """The SQL lifecycle and the DataFrame lifecycle must produce the
    same result for the flagship query (§3.1 vs §3.2)."""
    sql_q1 = sql_entry.sql(
        spark,
        REGISTRY["q1_pricing_summary"].oracle,
        SF_DIR,
    ).toPandas()
    df_q1 = REGISTRY["q1_pricing_summary"].fn(spark, SF_DIR).toPandas()
    from tests.oracle_utils import compare_frames

    compare_frames(df_q1, sql_q1, "q1 sql-vs-dataframe")


def test_sql_join_hints(spark):
    """SQL join-strategy hints resolve and steer the planner
    (BROADCAST / MERGE hint surface)."""
    from splitserve_spark.plans.inspect import physical_plan

    b = sql_entry.sql(
        spark,
        "SELECT /*+ BROADCAST(nation) */ n_name, r_name "
        "FROM nation JOIN region ON n_regionkey = r_regionkey",
        SF_DIR,
    )
    assert "BroadcastHashJoin" in physical_plan(b, mode="simple")
    m = sql_entry.sql(
        spark,
        "SELECT /*+ MERGE(orders) */ o_orderkey, c_name "
        "FROM orders JOIN customer ON o_custkey = c_custkey",
        SF_DIR,
    )
    assert "SortMergeJoin" in physical_plan(m, mode="simple")


def test_distribute_cluster_sort_by(spark):
    """DISTRIBUTE BY / SORT BY / CLUSTER BY — partition-local sort
    surface (§2.6 sortWithinPartitions)."""
    df = sql_entry.sql(
        spark,
        "SELECT o_orderkey, o_custkey FROM orders "
        "DISTRIBUTE BY o_custkey SORT BY o_orderkey",
        SF_DIR,
    )
    # partition-local sort: within every partition, orderkeys ascend
    def check_sorted(it):
        prev = None
        for row in it:
            assert prev is None or row.o_orderkey >= prev
            prev = row.o_orderkey
        return iter(())

    df.rdd.mapPartitions(check_sorted).count()
    # API twin
    api = (
        sql_entry.sql(spark, "SELECT o_orderkey, o_custkey FROM orders", SF_DIR)
        .repartition(4, "o_custkey")
        .sortWithinPartitions("o_orderkey")
    )
    api.rdd.mapPartitions(check_sorted).count()
    sql_entry.sql(
        spark,
        "SELECT o_orderkey FROM orders CLUSTER BY o_orderkey",
        SF_DIR,
    ).count()


def test_sql_tablesample(spark):
    """TABLESAMPLE grammar (SqlBase.g4:422 surface)."""
    n = sql_entry.sql(
        spark,
        "SELECT count(*) AS n FROM (SELECT * FROM lineitem TABLESAMPLE (10 PERCENT))",
        SF_DIR,
    ).collect()[0]["n"]
    total = sql_entry.sql(
        spark, "SELECT count(*) AS n FROM lineitem", SF_DIR
    ).collect()[0]["n"]
    assert 0 < n < total
    exact = sql_entry.sql(
        spark,
        "SELECT count(*) AS n FROM (SELECT * FROM orders TABLESAMPLE (50 ROWS))",
        SF_DIR,
    ).collect()[0]["n"]
    assert exact == 50


def test_input_file_name_and_misc(spark):
    row = sql_entry.sql(
        spark,
        "SELECT input_file_name() AS f, spark_partition_id() AS p, "
        "monotonically_increasing_id() AS m FROM lineitem LIMIT 1",
        SF_DIR,
    ).collect()[0]
    assert row["f"].endswith("lineitem.parquet")
    assert row["p"] >= 0 and row["m"] >= 0


def test_assert_true_and_raise_error(spark):
    assert (
        sql_entry.sql(spark, "SELECT assert_true(1 < 2) AS v", SF_DIR)
        .collect()[0]["v"]
        is None
    )
    import pytest as _pytest

    with _pytest.raises(Exception):
        sql_entry.sql(spark, "SELECT assert_true(1 > 2) AS v", SF_DIR).collect()
    with _pytest.raises(Exception):
        sql_entry.sql(spark, "SELECT raise_error('boom') AS v", SF_DIR).collect()


def test_group_by_all_order_by_all(spark):
    """GROUP BY ALL / ORDER BY ALL sugar — supported by both engines."""
    q = (
        "SELECT o_orderstatus, o_orderpriority, count(*) AS n "
        "FROM orders GROUP BY ALL ORDER BY ALL"
    )
    got = sql_entry.sql(spark, q, SF_DIR).toPandas()
    con = duck_connection(SF_DIR)
    try:
        want = con.execute(q).df()
    finally:
        con.close()
    from tests.oracle_utils import compare_frames

    compare_frames(got, want, "group_by_all")
