"""Exactly-once streaming sinks (SURVEY §2.1 sinks × §2.7 streaming).

Structured Streaming guarantees at-least-once delivery to foreachBatch: a
failure between the batch function and the checkpoint commit replays the
batch with the SAME batch_id on restart. Exactly-once therefore reduces to
an idempotent batch write — the standard production pattern is "overwrite
the batch's own partition": a replayed batch rewrites identical data over
itself instead of appending duplicates.

``write_stream_exactly_once`` implements that with a ``batch_id=N``
directory per micro-batch (dynamic partition overwrite semantics scoped to
the one directory). Readers take ``path`` recursively; the batch_id column
is a partition column, so consumers can also incrementally tail new batches
by id — which makes the sink double as a changelog.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery


def batch_writer(path: str):
    """The idempotent foreachBatch function: overwrite this batch's own
    directory. Exposed separately so tests (and reprocessing jobs) can
    replay a batch id directly and observe the no-duplicate property."""

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(f"{path}/batch_id={batch_id}")

    return _write


def write_stream_exactly_once(
    stream_df: DataFrame,
    path: str,
    checkpoint: str,
    trigger_available_now: bool = True,
) -> StreamingQuery:
    """Start the stream with the idempotent per-batch parquet sink. The
    checkpoint dir carries the replay cursor: restarting with the same
    checkpoint resumes after the last committed batch; a crash mid-batch
    replays into the same batch_id directory — no dupes, no holes."""
    writer = (
        stream_df.writeStream.foreachBatch(batch_writer(path))
        .option("checkpointLocation", checkpoint)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
