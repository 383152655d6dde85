"""SparkSession helpers.

Local test sessions run on ``local[N]``; the configuration below is chosen so
the same code scales to a real cluster: AQE on (runtime skew-join + partition
coalescing), Arrow on (all pandas-UDF exchange is columnar), and a shuffle
partition count that AQE can shrink.
"""

from __future__ import annotations

import os
from contextlib import contextmanager
from typing import Iterator

from pyspark.sql import SparkSession


def get_spark(app_name: str = "polars_quant_spark", shuffle_partitions: int | None = None) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if str(cpus).isdigit() else 32
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # AQE coalescing is size-based and CPU-blind: the ~2 MB symbol
        # shuffle behind every indicator window packs onto ONE task at the
        # default 1 MB floor. 64k keeps small-but-CPU-heavy stages at the
        # hash-partition count (≈symbols); at real scale partitions dwarf
        # either floor and this is a no-op.
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    # Pre-size the heap (-Xms) for big-heap smoke runs: a fresh large-Xmx
    # JVM growing its heap under 32 threads of agg allocation pays a
    # one-time GC-storm tax measured at 30x on the first corpus pass
    # (803.7 s vs 26.7 s warm at the 1024x docs scale — docs/SCALE.md
    # "Round 13"). Cluster executors conventionally run Xms=Xmx for the
    # same reason; opt-in locally because pre-faulting 48 GB on a small CI
    # box would be hostile. Usage: SPARK_GRAFT_XMS=48g (normally set equal
    # to SPARK_DRIVER_MEMORY).
    xms = os.environ.get("SPARK_GRAFT_XMS")
    if xms:
        builder = builder.config("spark.driver.extraJavaOptions", f"-Xms{xms}")
    return builder.getOrCreate()


def is_dir(spark: SparkSession, path: str) -> bool:
    """True when ``path`` is a DIRECTORY on whatever filesystem backs it —
    the Hadoop FileSystem API, not os.path, so a Spark-written table on
    hdfs://, s3a://, etc. is classified correctly (r11 review: an
    os.path.isdir probe runs on the driver's LOCAL fs and silently sent
    remote directory-layout tables down the empty-glob branch — the exact
    silent-empty-source bug streaming's directory branch exists to fix).

    Public home of the former ``streaming.windows._is_dir`` (ADVICE r11:
    queries_pipeline imported the underscore-private symbol across
    modules)."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return bool(fs.getFileStatus(hpath).isDirectory())


@contextmanager
def released(spark: SparkSession) -> Iterator[None]:
    """Release every cache pin CREATED inside the block when it exits.

    Several operators persist internal frames that feed the lazy result
    they return (``dedup.minhash_dedup_pairs``/``token_edit_pairs`` pin
    their exploded key frames; ``segmented.*`` pins each continuation
    piece DISK_ONLY) — the pin is load-bearing while the result is being
    computed, but the caller holds no handle to it, so in a long-lived
    session running many corpus passes the blocks accumulate for the
    session lifetime (ADVICE r10). Wrap the construction AND the final
    action in ``released(spark)`` and the pins are dropped on exit::

        with released(spark):
            pairs = token_edit_pairs(docs)
            pairs.write.parquet(out)          # fully consume inside

    Implementation: snapshot the persistent-RDD id set on entry and
    unpersist (non-blocking) every id that is new on exit. Pre-existing
    pins are untouched, so nesting and interleaving with caller-managed
    caches is safe. The one contract: CONSUME the result inside the
    block — localCheckpoint pins truncate lineage, so touching a frame
    after its pins are dropped recomputes from a plan that no longer
    exists. (Coarser alternative: ``spark.catalog.clearCache()``, which
    drops caller pins too.)

    SINGLE-THREADED DRIVER ASSUMPTION (ADVICE r11): the id-set diff is
    session-global, so if other driver threads create pins concurrently
    inside this block's lifetime, exit unpersists THEIR pins too (the
    same holds for the per-round pin release inside
    ``dedup.connected_components``). All repo drivers are
    single-threaded; for multi-threaded use, scope tracking with a job
    group or serialize corpus passes."""
    jsc = spark.sparkContext._jsc
    before = {int(i) for i in jsc.getPersistentRDDs().keySet().toArray()}
    try:
        yield
    finally:
        live = jsc.getPersistentRDDs()
        for rid in [int(i) for i in live.keySet().toArray()]:
            if rid not in before:
                live.get(rid).unpersist(False)
