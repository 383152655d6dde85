"""Multimodal column handling for training-data pipelines.

Images / audio / video ride through Spark as opaque ``binary`` columns with
typed metadata; decode / feature-extract / resize / frame-sample run as
Arrow-batched ``mapInPandas`` stages. The decode step is STUBBED here (no
image/audio libs in this container — a deterministic fake payload parser
stands in), but the Spark-side plumbing is real: schemas, batch iteration,
partition sizing, UDF signatures are exactly what a production decode uses.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),       # image | audio | video
        StructField("mime", StringType()),
        StructField("payload", BinaryType()),     # opaque encoded bytes
        StructField("width", IntegerType()),      # typed metadata
        StructField("height", IntegerType()),
        StructField("duration_ms", IntegerType()),
    ]
)


def synthetic_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media corpus: payload = md5-stream bytes keyed by
    id. Stands in for a real binary ingest (S3 blobs / tar shards)."""
    rows = []
    for i in range(n):
        seed = hashlib.md5(f"media-{i}".encode()).digest()
        payload = (seed * 64)[: 512 + (i % 7) * 64]
        kind = ["image", "audio", "video"][i % 3]
        rows.append(
            (
                i,
                kind,
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                bytearray(payload),
                64 + (i % 8) * 16 if kind != "audio" else None,
                64 + (i % 5) * 16 if kind != "audio" else None,
                (i % 30 + 1) * 1000 if kind != "image" else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def media_from_documents(docs: DataFrame, text: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Adapt the documents table into the media schema (payload = UTF-8
    bytes of the text). Gives the binary-column pipeline a corpus that
    exists in every test environment — and, because the stub featurizer is
    deterministic md5, an exact DuckDB twin (see queries_pipeline
    media_features)."""
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col(id_col) % 3 + 1).cast("int"),
    )
    return docs.select(
        F.col(id_col).alias("media_id"),
        kind.alias("kind"),
        F.concat(kind, F.lit("/x-doc")).alias("mime"),
        F.col(text).cast("binary").alias("payload"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.when(kind == "video", (F.col(id_col) % 30 + 1) * 1000)
        .cast("int")
        .alias("duration_ms"),
    )


FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", LongType()),
        StructField("payload_digest", StringType()),
        StructField("features", ArrayType(DoubleType())),
    ]
)


def _decode_stub(payload: bytes, kind: str) -> list[float]:
    """STUB for the real decoder.

    A production deployment replaces this body with e.g. PIL/libvips image
    decode + embedding, torchaudio for audio, pyav frame-sampling for video
    (none are available in this container). The deterministic fake below
    keeps the pipeline testable: an 8-dim feature from the payload bytes.
    """
    if not payload:
        raise NotImplementedError("empty payload; real decoder not bundled")
    h = hashlib.md5(payload).digest()
    return [b / 255.0 for b in struct.unpack("8B", h[:8])]


def extract_features(media: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """Decode + featurize via mapInPandas (Arrow batches, streaming per
    partition — constant memory regardless of corpus size)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            digests = []
            for payload, kind in zip(pdf["payload"], pdf["kind"]):
                raw = bytes(payload)
                digests.append(hashlib.md5(raw).hexdigest())
                feats.append(_decode_stub(raw, kind))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(len),
                    "payload_digest": digests,
                    "features": feats,
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Explode videos into per-frame work items (media_id, frame_ts_ms) —
    the fan-out stage ahead of a real frame decoder. Pure Spark: sequence +
    explode, no Python."""
    vids = media.where(F.col("kind") == "video")
    return vids.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("duration_ms") - 1, F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )
