"""Streaming deduplication — the training-data pipeline ops on a live feed.

A 100 TB corpus is usually ingested continuously, so the dedup surface has a
streaming twin:

* ``streaming_exact_dedup`` — canonical-fingerprint dedup across
  micro-batches via ``dropDuplicatesWithinWatermark``: state (one row per
  distinct fingerprint) is evicted once the watermark passes, so the state
  store is bounded by the duplicate-arrival horizon, not stream length.
* ``streaming_minhash_signatures`` / ``streaming_simhash`` — the batch
  signature builders are pure projections, so they run on a stream
  unmodified; candidate *pair* generation stays a batch job over the
  signature store (the LSH self-join is not incrementalizable without
  cross-batch shuffle state, which Structured Streaming reserves for
  stream-stream joins).

The batch/stream split mirrors the standard lakehouse layout: signatures
attach at ingest; global joins run on the accumulated table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from polars_quant_spark.operators.dedup import simhash
from polars_quant_spark.operators.text import tokens


def fingerprint_col(text: Column | str = "text") -> Column:
    """Canonical md5 over the normalized token stream (same contract as
    operators/dedup.exact_dedup)."""
    return F.md5(F.concat_ws(" ", tokens(text)))


def streaming_exact_dedup(
    docs: DataFrame,
    text: str = "text",
    time_col: str = "event_time",
    watermark: str = "1 hour",
) -> DataFrame:
    """Keep the first arrival of each canonical fingerprint.

    Duplicates arriving within `watermark` of the original are dropped;
    state for a fingerprint is evicted after the watermark passes it, so
    the operator runs forever on bounded state."""
    return (
        docs.withColumn("fingerprint", fingerprint_col(text))
        .withWatermark(time_col, watermark)
        .dropDuplicatesWithinWatermark(["fingerprint"])
    )


def streaming_simhash(docs: DataFrame, text: str = "text") -> DataFrame:
    """Attach the 32-bit SimHash at ingest (stateless projection — the
    batch kernel runs on a stream unmodified)."""
    return docs.withColumn("simhash", simhash(text))
