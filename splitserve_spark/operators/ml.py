"""ML workload parity: K-means and Pi (SURVEY.md §2.13/§6).

Reference: MLlib KMeans (`mllib/.../clustering/KMeans.scala:43`,
k-means‖ init at `run:208`) → pyspark.ml.clustering.KMeans; SparkPi
(`examples/src/main/python/pi.py`) → a deterministic quasi-Monte-Carlo
over spark.range.

Two K-means forms: the pyspark.ml estimator (the production path) and a
pure-DataFrame Lloyd iteration (deterministic, verified against a numpy
reference in tests — it demonstrates the iterative-aggregation shape
shared with PageRank).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from splitserve_spark.functions.parity_hash import md5_hash60, md5_hash60_sql
from splitserve_spark.registry import register
from splitserve_spark.session import ensure_parity_conf
from splitserve_spark.tables import Tables

K = 8
LLOYD_ITER = 3


@register("ml_kmeans", oracle=None, tags=("ml", "workload"))
def ml_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pyspark.ml KMeans over the embeddings table (seeded).  Cluster
    ids are implementation-specific → rows-only check; tests assert
    cluster-count/coverage invariants."""
    ensure_parity_conf(spark)
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    t = Tables(spark, sf_dir)
    data = t.embeddings.select(
        "vec_id", array_to_vector(F.col("embedding").cast("array<double>")).alias("features")
    )
    model = KMeans(k=K, seed=42, maxIter=10).fit(data)
    return (
        model.transform(data)
        .groupBy(F.col("prediction").alias("cluster"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("cluster")
    )


def _lloyd_centroids(spark, sf_dir) -> list[list[float]]:
    """Deterministic init: the K lowest-vec_id embeddings."""
    t = Tables(spark, sf_dir)
    rows = (
        t.embeddings.filter(F.col("vec_id") < K)
        .orderBy("vec_id")
        .select(F.col("embedding").cast("array<double>").alias("v"))
        .collect()
    )
    return [r.v for r in rows]


@register("ml_kmeans_lloyd", oracle=None, tags=("ml", "workload", "iterative"))
def ml_kmeans_lloyd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure-DataFrame Lloyd's algorithm, fixed init (first K vectors),
    LLOYD_ITER iterations.  Per iteration: one broadcast of K centroids
    + one groupBy over assignments — per-dimension sums via posexplode,
    so the shuffle carries K·dim cells, not raw vectors.  Deterministic;
    verified against a numpy reference in tests."""
    ensure_parity_conf(spark)
    t = Tables(spark, sf_dir)
    data = t.embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    centroids = _lloyd_centroids(spark, sf_dir)

    def dist2(v, c: list[float]):
        carr = F.array(*[F.lit(float(x)) for x in c])
        return F.aggregate(
            F.zip_with(v, carr, lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    for _ in range(LLOYD_ITER):
        d2 = F.array(*[dist2(F.col("v"), c) for c in centroids])
        assigned = data.withColumn(
            "cluster", F.array_position(d2, F.array_min(d2)) - 1
        )
        # Per-dimension mean via posexplode: shuffle K·dim cells only.
        sums = (
            assigned.select(
                "cluster", F.posexplode("v").alias("dim", "val")
            )
            .groupBy("cluster", "dim")
            .agg(F.sum("val").alias("s"), F.count(F.lit(1)).alias("n"))
            .groupBy("cluster")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct("dim", (F.col("s") / F.col("n")).alias("m")))
                ).alias("dims")
            )
            .select("cluster", F.col("dims.m").alias("centroid"))
        )
        new_centroids = {r.cluster: r.centroid for r in sums.collect()}
        centroids = [
            new_centroids.get(i, centroids[i]) for i in range(K)
        ]

    d2 = F.array(*[dist2(F.col("v"), c) for c in centroids])
    return (
        data.select(
            "vec_id",
            (F.array_position(d2, F.array_min(d2)) - 1).alias("cluster"),
            F.round(F.sqrt(F.array_min(d2)), 6).alias("dist"),
        )
        .orderBy("vec_id")
    )


_PI_N = 100_000


@register(
    "workload_pi",
    oracle=f"""
    WITH pts AS (
      SELECT i,
             ({md5_hash60_sql("'x' || CAST(i AS VARCHAR)")} % 1000000) / 1000000.0 AS x,
             ({md5_hash60_sql("'y' || CAST(i AS VARCHAR)")} % 1000000) / 1000000.0 AS y
      FROM range(0, {_PI_N}) t(i)
    )
    SELECT round(4.0 * sum(CASE WHEN x*x + y*y < 1.0 THEN 1 ELSE 0 END)
                 / count(*), 6) AS pi_estimate
    FROM pts
    """,
    tags=("workload",),
)
def workload_pi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SparkPi as deterministic quasi-Monte-Carlo: hash-derived points
    instead of rand() so the estimate is partitioning-independent and
    oracle-checkable.  No input scan — spark.range generates splits."""
    ensure_parity_conf(spark)
    ids = spark.range(0, _PI_N)
    x = (md5_hash60(F.concat(F.lit("x"), F.col("id").cast("string"))) % 1_000_000) / 1_000_000.0
    y = (md5_hash60(F.concat(F.lit("y"), F.col("id").cast("string"))) % 1_000_000) / 1_000_000.0
    return ids.select(
        F.round(
            4.0 * F.sum(F.when(x * x + y * y < 1.0, 1).otherwise(0)) / F.count(F.lit(1)),
            6,
        ).alias("pi_estimate")
    )
