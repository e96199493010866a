"""Multimodal column handling (beyond-parity).

Image/audio/video payloads are opaque `binary` columns with typed
metadata structs; per-item decode / feature-extraction runs as
Arrow-batched pandas iterators (mapInPandas) so a 100 TB corpus streams
through Python in columnar batches, never row-at-a-time.

The test container ships no image/audio codecs, so the decode kernel is
a deterministic STUB (_fake_decode) behind the real Spark plumbing —
schema contracts, batch iteration, and partitioning are production
shaped; swap `_fake_decode` for a PIL/ffmpeg call in deployment.

The synthetic corpus has no binary column; `documents.text` bytes stand
in as payloads via cast(text AS binary).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from splitserve_spark.registry import register
from splitserve_spark.session import ensure_parity_conf
from splitserve_spark.tables import Tables

#: Output schema of the decode/feature-extract stage.
DECODE_SCHEMA = (
    "doc_id bigint, byte_len int, width int, height int, n_frames int, "
    "feature array<double>"
)


def decode_media(payload: bytes) -> dict:
    """Real decode hook — NOT implemented in this container (no codec
    libraries are installed).  Deployments replace `_fake_decode` with
    this, backed by PIL/torchaudio/ffmpeg."""
    raise NotImplementedError("media codecs are not available in this environment")


def _fake_decode(payload: bytes) -> dict:
    """Deterministic stand-in for decode: derives pseudo 'dimensions'
    and a 4-d feature vector from the payload bytes alone."""
    n = len(payload)
    checksum = sum(payload[:64]) if n else 0
    return {
        "byte_len": n,
        "width": 16 + checksum % 64,
        "height": 16 + (checksum * 7) % 64,
        "n_frames": 1 + n % 8,
        "feature": [
            float(n),
            float(checksum),
            float(payload[0]) if n else 0.0,
            float(payload[-1]) if n else 0.0,
        ],
    }


def _decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: one pandas frame per Arrow batch."""
    for pdf in batches:
        decoded = pdf["payload"].map(lambda b: _fake_decode(bytes(b)))
        out = pd.DataFrame(list(decoded))
        out.insert(0, "doc_id", pdf["doc_id"].values)
        yield out


def with_payload(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents with an opaque binary `payload` column + typed metadata
    struct — the canonical multimodal row layout."""
    t = Tables(spark, sf_dir)
    return t.documents.select(
        "doc_id",
        F.col("text").cast("binary").alias("payload"),
        F.struct(
            F.col("source").alias("origin"),
            F.col("lang").alias("lang"),
            F.length("text").cast("long").alias("content_length"),
        ).alias("media_meta"),
    )


@register(
    "mm_binary_meta",
    oracle="""
    SELECT doc_id,
           CAST(strlen(text) AS INTEGER)  AS payload_bytes,
           sha256(text)                   AS payload_sha,
           source                         AS origin
    FROM documents
    WHERE doc_id < 300
    ORDER BY doc_id
    """,
    tags=("multimodal", "pipeline"),
)
def mm_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload metadata: byte length + content digest — computed
    JVM-side on the binary column (no decode needed)."""
    ensure_parity_conf(spark)
    df = with_payload(spark, sf_dir)
    return (
        df.filter(F.col("doc_id") < 300)
        .select(
            "doc_id",
            F.octet_length("payload").alias("payload_bytes"),
            F.sha2("payload", 256).alias("payload_sha"),
            F.col("media_meta.origin").alias("origin"),
        )
        .orderBy("doc_id")
    )


@register("mm_decode_features", oracle=None, priority=87,  # preferred rows-only filler
          tags=("multimodal", "pipeline", "stub"))
def mm_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode / feature-extract via mapInPandas (Arrow batches).  The
    decode kernel is the deterministic stub; the Spark plumbing (schema,
    batching, partition parallelism) is real.  Reference analogue:
    typed mapPartitions (`execution/objects.scala:174`) and
    BatchEvalPythonExec (`execution/python/BatchEvalPythonExec.scala:63`)."""
    ensure_parity_conf(spark)
    df = with_payload(spark, sf_dir).select("doc_id", "payload")
    return df.mapInPandas(_decode_batches, schema=DECODE_SCHEMA).orderBy("doc_id")


@register("mm_frame_sample", oracle=None, tags=("multimodal", "pipeline", "stub"))
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling: one output row per sampled 'frame' (1:N fan-out
    through mapInPandas) — the video-pipeline shape where a payload
    expands into frame rows downstream."""
    ensure_parity_conf(spark)

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                meta = _fake_decode(bytes(payload))
                for i in range(meta["n_frames"]):
                    rows.append(
                        {
                            "doc_id": doc_id,
                            "frame_idx": i,
                            "frame_hash": (meta["byte_len"] * 31 + i * 7) % 10007,
                        }
                    )
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_idx", "frame_hash"]
            )

    df = with_payload(spark, sf_dir).select("doc_id", "payload").filter(
        F.col("doc_id") < 200
    )
    return df.mapInPandas(
        frames, schema="doc_id bigint, frame_idx int, frame_hash int"
    ).orderBy("doc_id", "frame_idx")
