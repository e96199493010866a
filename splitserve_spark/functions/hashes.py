"""Hash/digest functions (SURVEY.md §2.8, registry lines :363-376).

Reference: `catalyst/expressions/hash.scala` (Md5:51 Sha2:86 Sha1:158
Crc32:185 Murmur3Hash:521 XxHash64:552), `misc.scala`,
`MonotonicallyIncreasingID.scala`, `InputFileName.scala`.

md5/sha are standard digests → oracle-checkable.  murmur3/xxhash64 are
engine-internal (seed/variant differ across engines) → rows-only query,
with determinism asserted in tests; they're the workhorses of the dedup
operators where only self-consistency matters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from splitserve_spark.registry import register
from splitserve_spark.session import ensure_parity_conf
from splitserve_spark.tables import Tables


@register(
    "fn_hash_digests",
    oracle="""
    SELECT n_nationkey,
           md5(n_name)                 AS name_md5,
           sha256(n_name)              AS name_sha256
    FROM nation
    ORDER BY n_nationkey
    """,
    tags=("function", "hash"),
)
def fn_hash_digests(spark: SparkSession, sf_dir: str) -> DataFrame:
    """md5 + sha2-256 hex digests (reference hash.scala Md5:51 Sha2:86)."""
    ensure_parity_conf(spark)
    t = Tables(spark, sf_dir)
    return (
        t.nation.select(
            "n_nationkey",
            F.md5(F.col("n_name").cast("binary")).alias("name_md5"),
            F.sha2(F.col("n_name").cast("binary"), 256).alias("name_sha256"),
        )
        .orderBy("n_nationkey")
    )


@register("fn_hash_partitioning", oracle=None, tags=("function", "hash"))
def fn_hash_partitioning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """murmur3 hash / xxhash64 / crc32 — engine-internal hash functions
    (the same family Spark uses for shuffle partitioning).  No cross-
    engine oracle; tests assert determinism across runs."""
    ensure_parity_conf(spark)
    t = Tables(spark, sf_dir)
    return (
        t.nation.select(
            "n_nationkey",
            F.hash("n_name").alias("murmur3"),
            F.xxhash64("n_name").alias("xx64"),
            F.crc32(F.col("n_name").cast("binary")).alias("crc"),
            F.spark_partition_id().alias("pid"),
        )
        .orderBy("n_nationkey")
    )
