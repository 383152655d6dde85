"""Stream-stream joins (Structured Streaming surface, SURVEY §2.7 ext).

The missing join class from the streaming surface: windows/stateful/dedup/
stream-static enrich are covered elsewhere; this adds the watermarked
stream-stream interval join — the attribution shape ("join each conversion
to the same user's clicks in the preceding N days") that needs BOTH sides
buffered in state.

Scale: state per side is bounded by the watermark delay + interval bound —
Spark evicts a buffered row once the other side's watermark passes its
join-window end, so state is O(rows within the lookback horizon), not O(
stream). The join itself is a hash shuffle on the equi-key; the time bound
prunes within each key's state. Correctness at the boundary: an event
arriving later than `watermark` past its time may be dropped — that is the
documented trade of any watermarked join, chosen by the caller's delay.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str = "l_time",
    right_time: str = "r_time",
    lookback: str = "3 days",
    watermark: str = "1 minute",
) -> DataFrame:
    """Inner join: rows share `key` and right_time ∈ [left_time − lookback,
    left_time] (inclusive both ends). Works identically on batch frames
    (the pytest/oracle twin runs the same function over batch inputs)."""
    lw = left.withWatermark(left_time, watermark) if left.isStreaming else left
    rw = right.withWatermark(right_time, watermark) if right.isStreaming else right
    cond = (
        (lw[key] == rw[key])
        & (rw[right_time] >= lw[left_time] - F.expr(f"INTERVAL {lookback}"))
        & (rw[right_time] <= lw[left_time])
    )
    return lw.join(rw, cond, "inner").drop(rw[key])
