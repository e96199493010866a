"""SQL function-registry parity (SURVEY.md §2.8).

The reference registers 229 name→expression entries
(`catalyst/analysis/FunctionRegistry.scala:161-429`).  This test
asserts every one of those names resolves through the engine's SQL
entry point, so a reference user's SQL keeps working verbatim.
"""

from __future__ import annotations

import pytest

# Transcribed from SURVEY.md §2.8 (registry lines :162-428), grouped as
# in the survey table.
MISC_NONAGG = """abs coalesce explode greatest if inline isnan ifnull isnull
  isnotnull least nanvl nullif nvl nvl2 posexplode rand randn stack when""".split()
MATH = """acos asin atan atan2 bin bround cbrt ceil ceiling cos cosh conv
  degrees e exp expm1 floor factorial hex hypot log log10 log1p log2 ln
  negative pi pmod positive pow power radians rint round shiftleft
  shiftright shiftrightunsigned sign signum sin sinh str_to_map sqrt tan
  tanh""".split()
AGGREGATES = """count sum avg mean min max first first_value last last_value
  stddev_samp std stddev stddev_pop var_samp variance var_pop skewness
  kurtosis corr covar_pop covar_samp approx_count_distinct percentile
  percentile_approx collect_list collect_set""".split()
STRING = """ascii base64 concat concat_ws decode elt encode find_in_set
  format_number format_string get_json_object initcap instr lcase length
  levenshtein like lower locate lpad ltrim json_tuple parse_url printf
  regexp_extract regexp_replace repeat reverse rlike rpad rtrim sentences
  soundex space split substr substring substring_index translate trim
  ucase unbase64 unhex upper xpath xpath_boolean xpath_double xpath_float
  xpath_int xpath_long xpath_number xpath_short xpath_string""".split()
DATETIME = """add_months current_date current_timestamp datediff date_add
  date_format date_sub day dayofyear dayofmonth from_unixtime
  from_utc_timestamp hour last_day minute month months_between next_day
  now quarter second to_date to_unix_timestamp to_utc_timestamp trunc
  unix_timestamp weekofyear year window""".split()
COLLECTION = """array array_contains map named_struct map_keys map_values
  size sort_array struct""".split()
MISC = """assert_true crc32 md5 hash sha sha1 sha2 spark_partition_id
  input_file_name monotonically_increasing_id current_database reflect
  java_method""".split()
GROUPING = "cube rollup grouping grouping_id".split()
WINDOW_FNS = """lead lag row_number cume_dist ntile rank dense_rank
  percent_rank""".split()
PREDICATE = "and in not or".split()
CAST_ALIASES = """boolean tinyint smallint int bigint float double decimal
  date timestamp binary string""".split()

ALL_NAMES = sorted(
    set(
        MISC_NONAGG + MATH + AGGREGATES + STRING + DATETIME + COLLECTION
        + MISC + GROUPING + WINDOW_FNS + PREDICATE + CAST_ALIASES
    )
)


def test_full_registry_resolves(spark):
    missing = []
    for name in ALL_NAMES:
        if name in ("cube", "rollup"):
            # Grouping constructs, not free functions in modern Spark —
            # resolvable only in GROUP BY position (semantics covered by
            # the agg_cube / agg_rollup oracle queries).
            spark.sql(f"SELECT 1 AS a, count(*) FROM range(2) GROUP BY {name}(a)")
            continue
        try:
            spark.sql(f"DESCRIBE FUNCTION `{name}`").collect()
        except Exception:
            missing.append(name)
    assert not missing, f"unresolved function names: {missing}"


@pytest.mark.parametrize(
    "expr,expected",
    [
        ("elt(2, 'a', 'b', 'c')", "b"),
        ("nvl2(NULL, 'x', 'y')", "y"),
        ("find_in_set('b', 'a,b,c')", 2),
        ("conv('ff', 16, 10)", "255"),
        ("pmod(-7, 3)", 2),
        ("shiftrightunsigned(-8, 1)", 2147483644),  # int input → 32-bit >>>
        ("substring_index('a.b.c', '.', 2)", "a.b"),
        ("format_number(12345.678, 2)", "12,345.68"),
        ("sentences('Hi there. Bye.')[0][0]", "Hi"),
        ("str_to_map('a:1,b:2')['b']", "2"),
        ("xpath_int('<a><b>3</b></a>', 'a/b')", 3),
        ("java_method('java.lang.Math', 'abs', -3)", "3"),
    ],
)
def test_spot_semantics(spark, expr, expected):
    """Spot-check less-common registry entries actually evaluate."""
    assert spark.sql(f"SELECT {expr} AS v").collect()[0]["v"] == expected
