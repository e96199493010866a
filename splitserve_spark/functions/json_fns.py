"""JSON functions (SURVEY.md §2.8).

Reference: GetJsonObject (`jsonExpressions.scala:119`), JsonTuple
(`:341`), JsonToStruct/from_json (`:486`), StructToJson/to_json (`:511`).

from_json parses JVM-side into a struct (no Python boundary); schema is
explicit — at 100 TB you never infer JSON schemas per-row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, StructField, StructType

from splitserve_spark.registry import register
from splitserve_spark.session import ensure_parity_conf
from splitserve_spark.tables import Tables


@register(
    "fn_json_get",
    oracle="""
    SELECT event_id,
           props ->> '$.k'                         AS k_str,
           CAST(props ->> '$.k' AS INTEGER)        AS k_int,
           CAST(props ->> '$.missing' AS VARCHAR)  AS missing
    FROM events
    WHERE event_id <= 300
    ORDER BY event_id
    """,
    tags=("function", "json"),
)
def fn_json_get(spark: SparkSession, sf_dir: str) -> DataFrame:
    """get_json_object path extraction (string result, null on missing
    path) — reference GetJsonObject."""
    ensure_parity_conf(spark)
    t = Tables(spark, sf_dir)
    return (
        t.events.filter(F.col("event_id") <= 300)
        .select(
            "event_id",
            F.get_json_object("props", "$.k").alias("k_str"),
            F.get_json_object("props", "$.k").cast("int").alias("k_int"),
            F.get_json_object("props", "$.missing").alias("missing"),
        )
        .orderBy("event_id")
    )


@register(
    "fn_json_struct",
    oracle="""
    SELECT event_id,
           CAST(props ->> '$.k' AS INTEGER) AS parsed_k,
           to_json(struct_pack(id := event_id, typ := event_type)) AS as_json
    FROM events
    WHERE event_id <= 300
    ORDER BY event_id
    """,
    tags=("function", "json"),
)
def fn_json_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """from_json with explicit schema → struct field access, and
    to_json over a named struct (both engines emit compact
    {"key":value} text)."""
    ensure_parity_conf(spark)
    t = Tables(spark, sf_dir)
    schema = StructType([StructField("k", IntegerType())])
    return (
        t.events.filter(F.col("event_id") <= 300)
        .select(
            "event_id",
            F.from_json("props", schema).getField("k").alias("parsed_k"),
            F.to_json(
                F.struct(
                    F.col("event_id").alias("id"), F.col("event_type").alias("typ")
                )
            ).alias("as_json"),
        )
        .orderBy("event_id")
    )
