"""Streaming dedup: fingerprint state must cross micro-batch boundaries
(a duplicate in batch 3 of a doc from batch 0 is dropped) and the stream
results must agree with the batch operator."""

from __future__ import annotations

import pandas as pd
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from polars_quant_spark.operators import dedup as batch_dedup
from polars_quant_spark.streaming import dedup as sdedup

SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("event_time", TimestampType()),
        StructField("text", StringType()),
    ]
)


def _run(spark, tmp_path, pdf, build, name):
    src = tmp_path / "src"
    src.mkdir()
    per = max(1, len(pdf) // 4)
    for i, lo in enumerate(range(0, len(pdf), per)):
        # µs timestamps: the session reads TIMESTAMP(NANOS) as long
        # (nanosAsLong), which would clash with the TimestampType schema
        pdf.iloc[lo : lo + per].to_parquet(
            src / f"part{i}.parquet", index=False, coerce_timestamps="us"
        )
    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(str(src))
    )
    q = (
        build(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.sql(f"SELECT * FROM {name}").toPandas()
    q.stop()
    return out


def test_streaming_exact_dedup_crosses_batches(spark, tmp_path):
    base = pd.Timestamp("2024-01-01 00:00:00")
    rows = []
    # 8 docs, doc k duplicates doc k-4 (different punctuation → same
    # canonical fingerprint), arriving in later micro-batches
    for k in range(8):
        text = f"document number {k % 4} with shared content"
        if k >= 4:
            text = text.upper() + "!!!"  # normalizes identically
        rows.append((k, base + pd.Timedelta(minutes=k), text))
    pdf = pd.DataFrame(rows, columns=["doc_id", "event_time", "text"])
    out = _run(
        spark, tmp_path, pdf,
        lambda s: sdedup.streaming_exact_dedup(s, watermark="1 hour"), "sdedup"
    )
    # one survivor per fingerprint, and it is the FIRST arrival
    assert len(out) == 4
    assert set(out.doc_id) == {0, 1, 2, 3}


def test_streaming_simhash_matches_batch(spark, tmp_path):
    base = pd.Timestamp("2024-01-01 00:00:00")
    pdf = pd.DataFrame(
        {
            "doc_id": range(6),
            "event_time": [base + pd.Timedelta(minutes=i) for i in range(6)],
            "text": [f"some text body {i} for hashing" for i in range(6)],
        }
    )
    out = _run(spark, tmp_path, pdf, sdedup.streaming_simhash, "ssim")
    batch = (
        spark.createDataFrame(pdf)
        .select("doc_id", batch_dedup.simhash("text").alias("simhash"))
        .toPandas()
    )
    merged = out.merge(batch, on="doc_id", suffixes=("_s", "_b"))
    assert len(merged) == 6
    assert (merged.simhash_s == merged.simhash_b).all()
