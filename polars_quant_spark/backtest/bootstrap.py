"""Monte Carlo block bootstrap of return paths — distributed risk bands.

Strategy metrics from ONE historical path are a point estimate; the
bootstrap's resampled paths give the sampling distribution (confidence
bands on total return, tail quantiles). This is the classic
embarrassingly-parallel Spark win: every (symbol, path) is independent,
so P paths × S symbols fan out across executors as a pure explode+join —
no sequential state anywhere.

Design for cross-engine exactness (the whole point of declaring it as an
oracle-checked query):

* **Block resampling.** A path is B consecutive-return blocks of length L;
  block starts are md5 lanes (pure function of (symbol, path, block)) —
  deterministic under retries and identical in the DuckDB twin. Blocks
  preserve short-range autocorrelation that iid resampling destroys.
* **Integer log-return space.** Each bar's ln(close/prev) is quantized to
  integer micro-units ONCE; a path's total is then an integer SUM —
  association-order-free, so the hash gate is exact (the float product
  Π(1+r) would be order-sensitive, and exp() differs by ulps across
  libms). Consumers exponentiate at presentation time.
* **Percentiles over paths** share the Spark `percentile` / DuckDB
  `quantile_cont` linear-interpolation contract.

Scale: returns per symbol are computed once (one window pass) and folded
into exclusive prefix sums; a drawn block's total is pref[s+L]−pref[s],
so the path fan-out joins TWO probe rows per block (O(P·B), independent
of block length) against the prefix frame and map-side combines the
per-path sums. Measured: the prefix rewrite + an explicit repartition of
the path grid (which otherwise inherits ~1 partition from its
symbols-sized source) took the 8× smoke from 155 s to 11.6 s.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _lane(c) -> F.Column:
    return F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("long")


def bootstrap_path_totals(
    df: DataFrame,
    paths: int = 200,
    block: int = 16,
    symbol: str = "symbol",
    t: str = "t",
    price: str = "close",
    seed: str = "boot",
) -> DataFrame:
    """Total micro-quantized log return per (symbol, path).

    Each path replays ceil((N−1)/L) blocks of L consecutive returns whose
    start indices are md5 lanes mod (N−L); the last block is truncated so
    every path has exactly N−1 return draws (same length as history)."""
    w = Window.partitionBy(symbol).orderBy(t)
    r = (
        df.select(symbol, t, F.col(price).cast("double").alias("_px"))
        .withColumn("_prev", F.lag("_px").over(w))
        .where(F.col("_prev").isNotNull())
        .select(
            F.col(symbol).alias("symbol"),
            (F.row_number().over(w) - 1).alias("idx"),  # 0-based return index
            F.floor(F.log(F.col("_px") / F.col("_prev")) * F.lit(1000000.0) + F.lit(0.5))
            .cast("long")
            .alias("r_m"),
        )
    )
    n = r.groupBy("symbol").agg(F.count(F.lit(1)).alias("_n"))
    # Exclusive prefix sums of the quantized returns: a block's total is
    # pref[start+len] − pref[start], so each drawn block costs TWO probe
    # rows instead of `block` — O(P·B) joined rows, not O(P·N). Integer
    # arithmetic keeps the rewrite bit-identical to summing the raw draws.
    wcum = Window.partitionBy("symbol").orderBy("idx")
    pref = (
        r.withColumn("_cum", F.sum("r_m").over(wcum))
        .select("symbol", (F.col("idx") + 1).alias("idx"), F.col("_cum").alias("pref_m"))
        .unionByName(
            n.select("symbol", F.lit(0).cast("int").alias("idx"), F.lit(0).cast("long").alias("pref_m"))
        )
    )
    # The (symbol, path) grid descends from a symbols-sized aggregate, so
    # without an explicit fan-out the explode chain inherits ~1 partition
    # and runs serial. Repartition the tiny grid BEFORE the explodes.
    shuffle_n = int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
    )
    pb = (
        n.select(
            "symbol",
            "_n",
            F.explode(F.sequence(F.lit(0), F.lit(paths - 1))).alias("path"),
        )
        .repartition(shuffle_n, "symbol", "path")
        .select(
            "symbol",
            "_n",
            "path",
            F.explode(
                F.sequence(
                    F.lit(0), F.ceil(F.col("_n") / block).cast("long") - 1
                )
            ).alias("blk"),
        )
    )
    start = _lane(
        F.concat_ws(":", F.lit(seed), F.col("symbol"), F.col("path"), F.col("blk"))
    ) % F.greatest(F.lit(1).cast("long"), F.col("_n") - block)
    blen = F.least(
        F.lit(block).cast("long"), F.col("_n") - F.col("blk") * block
    )
    blocks = pb.select(
        "symbol", "path", start.alias("_s"), blen.alias("_l")
    )
    probes = blocks.select(
        "symbol",
        "path",
        F.explode(
            F.array(
                F.struct(F.col("_s").alias("idx"), F.lit(-1).alias("sign")),
                F.struct((F.col("_s") + F.col("_l")).alias("idx"), F.lit(1).alias("sign")),
            )
        ).alias("p"),
    ).select("symbol", "path", F.col("p.idx").cast("int").alias("idx"), "p.sign")
    # BOTH join sides scale with the data — pref has one row per return,
    # probes has 2·P·B rows — but the probes side descends from a
    # symbols-sized aggregate through three explodes, so Catalyst's size
    # estimate stays tiny and the planner picks BroadcastHashJoin of what
    # is actually the BIGGER side (caught by the 64× scale smoke: "Not
    # enough memory to build and broadcast" at 38 M bars; at 1000
    # executors it would OOM the driver outright). Force sort-merge: one
    # (symbol, idx) shuffle per side, spill-safe at any scale.
    return (
        probes.join(pref.hint("merge"), ["symbol", "idx"])
        .groupBy("symbol", "path")
        .agg(F.sum(F.col("sign") * F.col("pref_m")).alias("logret_m"))
    )


def bootstrap_bands(
    df: DataFrame,
    paths: int = 200,
    block: int = 16,
    symbol: str = "symbol",
    t: str = "t",
    price: str = "close",
    seed: str = "boot",
) -> DataFrame:
    """Per-symbol risk bands over the bootstrap distribution: p05/p50/p95
    and mean of total log return (micro-unit-exact; exponentiate for
    equity multiples)."""
    totals = bootstrap_path_totals(df, paths, block, symbol, t, price, seed)
    lr = (F.col("logret_m").cast("double") / F.lit(1000000.0)).alias("logret")
    return (
        totals.select("symbol", "logret_m", lr)
        .groupBy("symbol")
        .agg(
            F.expr("percentile(logret, 0.05)").alias("p05"),
            F.expr("percentile(logret, 0.5)").alias("p50"),
            F.expr("percentile(logret, 0.95)").alias("p95"),
            (
                F.sum("logret_m").cast("double")
                / F.lit(1000000.0)
                / F.count(F.lit(1))
            ).alias("mean"),
        )
    )
