"""Deterministic OHLCV bar view over the driver's ``events`` table.

The reference consumes per-asset OHLCV bar histories where row order is time
(SURVEY.md §1.1; /root/reference/src/backtest/sequential.rs:290). The driver
test data has no bar table, so we derive one deterministically from ``events``:

* symbol   = event_type              (5 symbols)
* ordering = (ts_ns, event_id)       (explicit, tie-broken, reproducible)
* t        = row_number within symbol (1-based bar index)
* close    = value                   (positive: min 0.01)
* open     = previous close (first bar: close)
* high     = max(open, close) * 1.001
* low      = min(open, close) * 0.999
* volume   = (event_id % 1000 + 100) as double

``events.ts`` is parquet TIMESTAMP(NANOS); Spark reads it via the
``nanosAsLong`` legacy flag as an exact int64 (``ts_ns``), DuckDB via
``epoch_ns(ts)`` — bit-identical ordering and values on both engines.

``BARS_CTE`` is the ANSI-SQL twin used as the CTE prefix of every DuckDB
oracle query — the Spark DataFrame below computes bit-identical columns (same
double arithmetic on the same inputs), so value-hash comparison is exact.

Scale note: at 100 TB the scan is a single parquet read with column pruning;
the only shuffle is the window ``partitionBy(symbol)``. With few, fat symbols
that window is the skew risk — real deployments should pre-bucket the bar
store by symbol (``writeTo.bucketBy``) so the sort-within-partition is
shuffle-free; AQE skew handling covers the rest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

# DuckDB twin of `bars()`; prepend to every oracle SQL that consumes bars.
# DuckDB reads the TIMESTAMP(NANOS) parquet at µs resolution, so both engines
# order and expose the time axis as exact int64 microseconds (ts_us).
BARS_CTE = """
WITH bars AS (
  SELECT
    event_type AS symbol,
    epoch_us(ts) AS ts_us,
    CAST(ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY ts, event_id) AS INTEGER) AS t,
    CAST(value AS DOUBLE) AS close,
    COALESCE(LAG(CAST(value AS DOUBLE)) OVER (PARTITION BY event_type ORDER BY ts, event_id), CAST(value AS DOUBLE)) AS open,
    GREATEST(COALESCE(LAG(CAST(value AS DOUBLE)) OVER (PARTITION BY event_type ORDER BY ts, event_id), CAST(value AS DOUBLE)), CAST(value AS DOUBLE)) * 1.001 AS high,
    LEAST(COALESCE(LAG(CAST(value AS DOUBLE)) OVER (PARTITION BY event_type ORDER BY ts, event_id), CAST(value AS DOUBLE)), CAST(value AS DOUBLE)) * 0.999 AS low,
    CAST(event_id % 1000 + 100 AS DOUBLE) AS volume
  FROM events
)
"""


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver parquet table. Plain ``spark.read.parquet`` so filter
    pushdown / column pruning reach the scan. ``events.ts`` (TIMESTAMP NANOS)
    comes back as exact int64 nanoseconds."""
    if name == "events":
        # Modifiable SQLConf — set defensively in case the hosting session
        # didn't configure it (the driver builds its own SparkSession).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def events_with_ts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events with ts exposed both as exact ns (``ts_ns``) and as a µs
    timestamp (``ts``, floor-truncated — matches DuckDB's ns→µs cast)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.withColumnRenamed("ts", "ts_ns").withColumn(
        "ts", F.timestamp_micros(F.expr("ts_ns div 1000"))
    )


def bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLCV bars derived from events — the Spark twin of BARS_CTE.

    The symbol alias happens BEFORE the window so the bar-building shuffle
    and every downstream ``partitionBy(symbol)`` window share one exchange
    (renaming after the window defeats Spark's partitioning-reuse)."""
    ev = (
        load_table(spark, sf_dir, "events")
        .withColumnRenamed("ts", "ts_ns")
        .select(
            F.col("event_type").alias("symbol"),
            F.expr("ts_ns div 1000").alias("ts_us"),
            F.col("event_id"),
            F.col("value").cast("double").alias("_px"),
        )
    )
    w = Window.partitionBy("symbol").orderBy("ts_us", "event_id")
    close = F.col("_px")
    prev = F.lag(close).over(w)
    open_ = F.coalesce(prev, close)
    return ev.select(
        "symbol",
        "ts_us",
        F.row_number().over(w).alias("t"),
        close.alias("close"),
        open_.alias("open"),
        (F.greatest(open_, close) * F.lit(1.001)).alias("high"),
        (F.least(open_, close) * F.lit(0.999)).alias("low"),
        (F.col("event_id") % 1000 + 100).cast("double").alias("volume"),
    )
