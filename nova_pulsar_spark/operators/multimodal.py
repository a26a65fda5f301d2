"""Multimodal column handling: opaque binary payloads + typed metadata.

North-star layer (BASELINE.json): image/audio/video are `binary`
columns with struct metadata; decode / feature-extraction runs as
Arrow-batched Pandas UDFs over `mapInPandas`. The container has no
image/audio libraries, so the decode step is a clearly-marked
deterministic fake (`FakeDecoder`) behind the same interface a real
libjpeg/ffmpeg-backed decoder would implement — the Spark-side
plumbing (schema, batching, partitioning) is real and tested.

Scale notes: binary payloads dominate bytes at 100 TB — the layout
keeps metadata in columnar fields so filters/aggregations never
deserialize payloads (parquet column pruning skips the binary column
entirely unless a decode stage asks for it); decode stages are
mapInPandas over Arrow batches, sized by
`spark.sql.execution.arrow.maxRecordsPerBatch` to bound executor
memory against large payloads.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from nova_pulsar_spark.registry import register
from nova_pulsar_spark.sources.tables import load_table


def binarize_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.text → an opaque binary `payload` column + metadata.

    Stand-in for a real multimodal table: (id, payload binary,
    media_type, payload_bytes)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.lit("text/plain").alias("media_type"),
        F.octet_length(F.encode(F.col("text"), "UTF-8")).cast("bigint").alias("payload_bytes"),
    )


@register(
    "multimodal_meta",
    sql="""
    SELECT
      doc_id,
      md5(text) AS payload_md5,
      CAST(octet_length(encode(text)) AS BIGINT) AS payload_bytes,
      'text/plain' AS media_type
    FROM documents
    """,
    doc="Binary payload metadata scan: hash + size without decoding (column pruning keeps payloads unread)",
)
def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    b = binarize_documents(spark, sf_dir)
    return b.select(
        "doc_id",
        F.md5("payload").alias("payload_md5"),
        F.col("payload_bytes"),
        F.col("media_type"),
    )


class FakeDecoder:
    """Deterministic stand-in for an image/audio decoder.

    A real deployment implements ``decode(payload) -> features`` with
    libjpeg/ffmpeg; this fake derives stable pseudo-features from the
    payload bytes so the distributed plumbing is fully testable. The
    real-library entry point raises NotImplementedError by design.
    """

    @staticmethod
    def decode_real(payload: bytes):  # pragma: no cover - documented stub
        raise NotImplementedError(
            "real media decoding requires image/audio libraries not present "
            "in this environment; FakeDecoder provides the deterministic "
            "test path behind the same interface"
        )

    @staticmethod
    def fake_features(payload: bytes) -> tuple[int, int, float]:
        """(width, height, mean_intensity) derived from payload bytes."""
        n = len(payload)
        width = 16 + (n % 64)
        height = 16 + ((n // 64) % 64)
        mean = (sum(payload[:256]) / min(n, 256)) if n else 0.0
        return width, height, mean


DECODE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_intensity", T.DoubleType()),
        T.StructField("payload_bytes", T.LongType()),
    ]
)


def decode_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: Arrow batch in → decoded feature batch out."""
    for pdf in it:
        feats = pdf["payload"].map(FakeDecoder.fake_features)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "media_type": pdf["media_type"],
                "width": feats.map(lambda t: t[0]).astype("int32"),
                "height": feats.map(lambda t: t[1]).astype("int32"),
                "mean_intensity": feats.map(lambda t: t[2]),
                "payload_bytes": pdf["payload_bytes"],
            }
        )


@register(
    "multimodal_decode",
    sql=None,  # decode runs through a Pandas UDF (FakeDecoder) — rows-only check;
    # the deterministic feature math is pinned by unit tests instead.
    doc="mapInPandas decode/feature-extract over Arrow batches (FakeDecoder stands in for media libs)",
)
def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    b = binarize_documents(spark, sf_dir)
    return b.mapInPandas(decode_batches, schema=DECODE_SCHEMA)


@register(
    "multimodal_frame_sample",
    sql="""
    WITH f AS (
      SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS payload_bytes
      FROM documents)
    SELECT f.doc_id, s.i AS frame_no,
           (f.payload_bytes * s.i) // 8 AS frame_offset
    FROM f CROSS JOIN (SELECT UNNEST(range(0, 8)) AS i) s
    WHERE f.payload_bytes >= 8
    """,
    doc="Frame sampling plumbing: 8 evenly-spaced offsets per payload (the video path's seek table)",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    b = binarize_documents(spark, sf_dir)
    frames = spark.range(8).select(F.col("id").cast("int").alias("frame_no"))
    return (
        b.filter(F.col("payload_bytes") >= 8)
        .crossJoin(F.broadcast(frames))
        .select(
            "doc_id",
            "frame_no",
            F.floor(F.col("payload_bytes") * F.col("frame_no") / 8).cast("bigint").alias("frame_offset"),
        )
    )
