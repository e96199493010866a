"""Custom Python DataSource (pyspark.sql.datasource) — §2.1 extension.

The reference's extension point for a new source is a Scala DataSource
V1/V2 implementation (`sql/core/.../execution/datasources/DataSource.
scala:89`, provider resolution); modern PySpark exposes the same
contract natively in Python (`pyspark.sql.datasource.DataSource` /
`DataSourceReader`, Spark 4): schema + partition planning on the
driver, per-partition iterators on the executors, Arrow-batched back
into the JVM.  This is how an ingest pipeline wraps a bespoke upstream
(internal API, proprietary format, crawl frontier) WITHOUT leaving
Python or giving up partition parallelism.

`CrawlShardDataSource` models a crawl-frontier shard listing: a
deterministic document manifest partitioned into shards, every field
derivable from doc_id alone — which is exactly what makes it
oracle-able: DuckDB replays the formulas over range(n).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

from splitserve_spark.registry import register
from splitserve_spark.session import ensure_parity_conf

PDS_DOCS = 500
PDS_SHARDS = 8


class CrawlShardReader(DataSourceReader):
    """Executor-side reader: one InputPartition per shard; rows are
    generated (never collected on the driver), so a 10⁹-doc manifest
    scales by adding shards, identical to a file-source split plan."""

    def __init__(self, options) -> None:
        self.n_docs = int(options.get("n_docs", PDS_DOCS))
        self.n_shards = int(options.get("n_shards", PDS_SHARDS))

    def partitions(self):
        return [InputPartition(s) for s in range(self.n_shards)]

    def read(self, partition):
        shard = partition.value
        for doc_id in range(shard, self.n_docs, self.n_shards):
            url = f"https://site{doc_id % 7}.example/page/{doc_id}"
            yield (
                doc_id,
                shard,
                url,
                100 + (doc_id * 13) % 400,
            )


class CrawlShardDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "crawl_shards"

    def schema(self) -> str:
        return "doc_id bigint, shard int, url string, length int"

    def reader(self, schema) -> CrawlShardReader:
        return CrawlShardReader(self.options)


@register(
    "source_python_datasource",
    oracle=f"""
    WITH m AS (
      SELECT r.range AS doc_id,
             CAST(r.range % {PDS_SHARDS} AS INTEGER) AS shard,
             'https://site' || (r.range % 7) || '.example/page/' || r.range
               AS url,
             CAST(100 + (r.range * 13) % 400 AS INTEGER) AS length
      FROM range(0, {PDS_DOCS}) r
    )
    SELECT shard,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(length) AS BIGINT) AS total_bytes,
           md5(string_agg(url, ',' ORDER BY doc_id)) AS manifest_hash
    FROM m
    GROUP BY shard
    ORDER BY shard
    """,
    tags=("source", "python-datasource"),
)
def source_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read through the custom Python DataSource and roll the manifest
    up per shard (count, bytes, order-stable url digest) — proving the
    partition planning, per-partition iteration, and Arrow hand-off all
    preserve every row exactly once."""
    ensure_parity_conf(spark)
    try:
        spark.dataSource.register(CrawlShardDataSource)
    except Exception:
        pass  # already registered in this session
    df = (
        spark.read.format("crawl_shards")
        .option("n_docs", PDS_DOCS)
        .option("n_shards", PDS_SHARDS)
        .load()
    )
    return (
        df.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("length").cast("bigint").alias("total_bytes"),
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("doc_id", "url"))),
                        lambda s: s["url"],
                    ),
                    ",",
                ).cast("binary")
            ).alias("manifest_hash"),
        )
        .orderBy("shard")
    )


#: Rows per micro-batch and the deterministic read cutoff for the
#: streaming Python source.
PDS_STREAM_BATCH = 64
PDS_STREAM_N = 256


class FrontierTailReader(SimpleDataSourceStreamReader):
    """Streaming half of the Python DataSource contract
    (SimpleDataSourceStreamReader): offset bookkeeping lives in plain
    dicts the engine checkpoints; `read(start)` advances the frontier
    one micro-batch, and `readBetweenOffsets` replays any committed
    range exactly — which is what makes the source recoverable."""

    def initialOffset(self):
        return {"pos": 0}

    def read(self, start):
        pos = start["pos"]
        end = pos + PDS_STREAM_BATCH
        return (iter([(i, i % 7) for i in range(pos, end)]), {"pos": end})

    def readBetweenOffsets(self, start, end):
        return iter([(i, i % 7) for i in range(start["pos"], end["pos"])])


class FrontierTailSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "crawl_frontier_tail"

    def schema(self) -> str:
        return "seq bigint, site int"

    def simpleStreamReader(self, schema) -> FrontierTailReader:
        return FrontierTailReader()


@register(
    "source_python_stream",
    oracle=f"""
    SELECT CAST(r.range % 7 AS INTEGER) AS site,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(r.range) AS BIGINT) AS seq_sum
    FROM range(0, {PDS_STREAM_N}) r
    GROUP BY site
    ORDER BY site
    """,
    tags=("source", "python-datasource", "streaming"),
)
def source_python_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming read through the custom Python DataSource: run the
    micro-batch loop until at least {PDS_STREAM_N} frontier rows have
    landed in the sink, then aggregate the deterministic seq < N prefix
    — overshoot from the final batch is filtered out, so the result is
    exact regardless of trigger timing."""
    ensure_parity_conf(spark)
    import time

    try:
        spark.dataSource.register(FrontierTailSource)
    except Exception:
        pass
    name = "pys_" + "".join(c if c.isalnum() else "_" for c in sf_dir.strip("/"))
    stream = spark.readStream.format("crawl_frontier_tail").load()
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(processingTime="200 milliseconds")
        .start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            if spark.table(name).count() >= PDS_STREAM_N:
                break
            time.sleep(0.3)
        else:
            raise TimeoutError("python stream source did not reach cutoff")
    finally:
        q.stop()
    return (
        spark.table(name)
        .filter(F.col("seq") < PDS_STREAM_N)
        .groupBy("site")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("seq").cast("bigint").alias("seq_sum"),
        )
        .orderBy("site")
    )
