"""Deterministic sketches for profiling 100 TB corpora: KMV distinct-count
estimation, md5-Bernoulli sampling, and exact quantiles over a deterministic
sample (driver extension surface, SURVEY.md §7 Phase 5).

Spark's built-in `approx_count_distinct` (HyperLogLog++) and
`percentile_approx` are the production defaults — but their internals are
engine-specific, so a DuckDB twin can never reproduce their outputs and the
correctness gate would degrade to rows-only. These sketches are built on
md5 instead: every estimate is a pure function of the data, bit-identical
on both engines, so the sketch *algorithms* get the same hash-checked
verification as every other operator.

Scale design:
* KMV — one distinct-shuffle on (group, hash); the k-smallest selection is
  two-level (per-scan-partition top-k first), so no executor ever sorts a
  whole group: the global ranking sees ≤ k·partitions survivors per group.
* Sampling — a pure filter projection (no shuffle); pushes the sampled
  fraction through every downstream stage. Deterministic: re-running or
  resuming a pipeline samples the exact same rows, and the DuckDB twin
  selects the identical subset.
* Sampled quantiles — exact `percentile` over the sample: the accuracy story
  of a quantile sketch with per-group memory bounded by the sample, while
  staying engine-exact (Spark `percentile` and DuckDB `quantile_cont` share
  the linear-interpolation definition).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from polars_quant_spark.functions._util import col, round6

# 60-bit hash lane (15 hex digits) for KMV: wide enough that collisions are
# negligible at any corpus size, small enough that the long→double cast used
# by the estimate is exact (doubles hold 53 bits — the *normalized* u is what
# matters, and its error is one ulp on both engines identically).
KMV_HEX = 15
KMV_SCALE = float(2**60)


def hash_lane(c: Column | str, hex_chars: int = KMV_HEX) -> Column:
    """First `hex_chars` hex digits of md5(value) as a non-negative long —
    the engine-shared uniform hash every sketch builds on."""
    return F.conv(F.substring(F.md5(col(c).cast("string")), 1, hex_chars), 16, 10).cast(
        "long"
    )


def kmv_distinct(
    df: DataFrame, key: str, by: list[str] | None = None, k: int = 64
) -> DataFrame:
    """KMV (k-minimum-values) distinct-count estimate of `key` per `by` group.

    Estimate = (k−1) / u₍ₖ₎ where u₍ₖ₎ is the k-th smallest normalized hash
    of the distinct keys; groups with fewer than k distinct keys report the
    exact count (the classic KMV fallback). Standard error ≈ 1/√(k−2).

    Two-level min-k so a billion-key group never sorts in one task: level 1
    ranks each scan partition's distinct hashes and keeps its k smallest
    (the global k smallest are necessarily among them); level 2 ranks the
    ≤ k·partitions survivors. Returns (by…, est_distinct)."""
    by = list(by or [])
    d = df.select(*by, hash_lane(key).alias("_h")).distinct()
    lvl1 = d.withColumn("_pid", F.spark_partition_id())
    w1 = Window.partitionBy(*by, "_pid").orderBy("_h")
    survivors = (
        lvl1.withColumn("_rn", F.row_number().over(w1))
        .where(F.col("_rn") <= k)
        .drop("_rn", "_pid")
    )
    w2 = Window.partitionBy(*by).orderBy("_h")
    ranked = survivors.withColumn("_rn", F.row_number().over(w2))
    agg = ranked.groupBy(*by).agg(
        F.max("_rn").alias("_n"),
        F.max(F.when(F.col("_rn") == k, F.col("_h"))).alias("_kth"),
    )
    est = F.when(F.col("_n") < k, F.col("_n").cast("double")).otherwise(
        F.lit(float(k - 1)) / (F.col("_kth").cast("double") / F.lit(KMV_SCALE))
    )
    return agg.select(*by, round6(est).alias("est_distinct"))


def deterministic_sample(df: DataFrame, key: str, frac: float) -> DataFrame:
    """md5-Bernoulli sample: keep rows whose 32-bit hash lane of `key` falls
    below frac·2³². A pure filter (no shuffle, no RNG state): the same rows
    are selected on every run, every engine, every retry — which is what a
    resumable 100 TB pipeline needs from its sampler."""
    threshold = int(frac * float(2**32))
    return df.where(hash_lane(key, 8) < F.lit(threshold))


def stratified_sample(
    df: DataFrame, key: str, fracs: dict[str, float], by: str
) -> DataFrame:
    """Per-group deterministic Bernoulli sampling — the training-data
    rebalancing shape: keep each `by` group (source, language, domain) at
    its own rate. Groups absent from `fracs` are dropped entirely (their
    NULL threshold fails the comparison), so one filter both selects and
    re-weights the mixture. Pure projection, no shuffle, retry-stable."""
    pairs: list[Column] = []
    for g in sorted(fracs):
        pairs += [F.lit(g), F.lit(int(fracs[g] * float(2**32)))]
    thr = F.element_at(F.create_map(*pairs), col(by))
    return df.where(hash_lane(key, 8) < thr)


def hash_split(
    df: DataFrame, key: str, weights: dict[str, float], out_col: str = "split"
) -> DataFrame:
    """Deterministic train/val/test assignment: the md5 lane of `key` is cut
    at the cumulative weight boundaries (insertion order of `weights`), so
    every engine, run and retry assigns each row the same split — and a
    document's split never changes when the corpus around it grows, which
    is what keeps eval sets stable across dataset versions. Weights must
    sum to ≤ 1; any residual hash range falls into the LAST split. Pure
    projection, no shuffle."""
    if not weights or sum(weights.values()) > 1.0 + 1e-9:
        raise ValueError("weights must be non-empty and sum to <= 1")
    h = hash_lane(key, 8)
    names = list(weights)
    acc = 0.0
    bounds = []
    for name in names[:-1]:
        acc += weights[name]
        bounds.append((name, int(acc * float(2**32))))
    expr = F.lit(names[-1])  # residual hash range → last split
    for name, b in reversed(bounds):
        expr = F.when(h < b, F.lit(name)).otherwise(expr)
    return df.withColumn(out_col, expr)


def sampled_quantiles(
    df: DataFrame,
    value: str,
    probs: list[float],
    by: list[str] | None = None,
    key: str | None = None,
    frac: float = 1.0,
) -> DataFrame:
    """Exact linear-interpolation quantiles of `value` per `by` group over a
    deterministic sample (`key`/`frac`; frac=1 skips sampling). Returns
    (by…, n_sample, q_<p> per prob). One shuffle (the groupBy); per-group
    state is the sampled values — bound frac to the memory budget."""
    by = list(by or [])
    if key is not None and frac < 1.0:
        df = deterministic_sample(df, key, frac)
    aggs = [F.count(F.lit(1)).alias("n_sample")]
    for p in probs:
        name = f"q_{str(p).replace('.', '_')}"
        aggs.append(round6(F.expr(f"percentile({value}, {p!r})")).alias(name))
    return df.groupBy(*by).agg(*aggs)


def mixture_resample(
    df: DataFrame, key: str, by: str, target: dict[str, float]
) -> DataFrame:
    """Resample to a target mixture (downsample-only): derive each `by`
    group's acceptance rate IN-ENGINE from its observed count so the output
    matches `target`'s shares — the "rebalance web/code/books to the training
    recipe" op, where `stratified_sample` takes rates, this takes the recipe.

    rate_g = c·t_g/n_g with c = min_g(n_g/t_g): the binding group keeps
    everything (rate 1) and every other group downsamples to proportion —
    the largest corpus that hits the mixture without replication. Groups
    absent from `target` are dropped.

    Plan shape: one tiny groupBy(by) count (map-side partials), a scalar
    min, and a broadcast of ≤|groups| rate rows back onto the corpus — the
    corpus itself is never shuffled, and the final keep/drop is the same
    md5-threshold filter as `deterministic_sample` (retry-stable, identical
    on every engine). Thresholds are floor-quantized to integers so the
    selection hash-matches DuckDB bit-for-bit."""
    tot = sum(target.values())
    pairs: list[Column] = []
    for g in sorted(target):
        pairs += [F.lit(g), F.lit(target[g] / tot)]
    tmap = F.create_map(*pairs)
    counts = (
        df.groupBy(col(by).alias("_g"))
        .agg(F.count(F.lit(1)).cast("double").alias("_n"))
        .withColumn("_t", F.element_at(tmap, F.col("_g")))
        .where(F.col("_t").isNotNull())
    )
    cmin = counts.agg(F.min(F.col("_n") / F.col("_t")).alias("_c"))
    rates = counts.crossJoin(F.broadcast(cmin)).select(
        F.col("_g"),
        F.floor(F.col("_c") * F.col("_t") / F.col("_n") * F.lit(float(2**32)))
        .cast("long")
        .alias("_thr"),
    )
    return (
        df.join(F.broadcast(rates), col(by) == F.col("_g"))
        .where(hash_lane(key, 8) < F.col("_thr"))
        .drop("_g", "_thr")
    )


def shuffle_shards(
    df: DataFrame, key: str, n_shards: int, out_shard: str = "shard", out_pos: str = "pos"
) -> DataFrame:
    """Deterministic global shuffle for training export: every row gets a
    (shard, pos) address — shard = md5-lane mod n_shards, pos = rank of the
    full 60-bit lane within the shard (ties broken by `key`). The induced
    permutation is uniform-pseudorandom yet a pure function of `key`: the
    same corpus shuffles identically on every engine, run and retry, and a
    row's address never depends on partitioning. Plan: one projection + one
    per-shard window rank — the exchange is the shard assignment itself,
    which is exactly the write layout, so the sort feeds the writer with no
    extra pass. Writers: ``write_training_shards``."""
    lane = hash_lane(key)
    out = df.withColumn("_lane", lane).withColumn(
        out_shard, (F.col("_lane") % n_shards).cast("int")
    )
    w = Window.partitionBy(out_shard).orderBy("_lane", col(key))
    return out.withColumn(out_pos, F.row_number().over(w)).drop("_lane")


def write_training_shards(
    df: DataFrame, path: str, key: str, n_shards: int
) -> None:
    """Materialize the ``shuffle_shards`` order as a shard=K/ directory per
    shard holding ONE parquet file in pos order — the layout data loaders
    index on. The repartition clusters each shard onto a single task (hash
    partitioning may co-locate two shards on one task, but never splits
    one), so each partitionBy directory receives exactly one file; the
    within-partition sort writes it in shuffled order. This is the same
    exchange the rank window needs — one shuffle end to end."""
    out = shuffle_shards(df, key, n_shards)
    (
        out.repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "pos")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )


def exact_k_per_group(
    df: DataFrame,
    group: str,
    key: str,
    k: int,
    seed: str = "holdout",
) -> DataFrame:
    """Deterministic reservoir: EXACTLY min(k, |group|) rows per group,
    chosen by md5 rank — the eval-holdout primitive (`stratified_sample`
    draws a *rate*, so small groups can come back empty; an eval set needs
    a guaranteed count per slice). The pick is a pure function of
    (seed, key): stable under retries, re-runs, and corpus growth limited
    to the usual reservoir caveat (a new row displaces at most one pick).

    Scale: one hash shuffle on `group` + a rank window whose per-group
    state is a running counter; with group cardinality ≪ rows the skew
    bound is the fattest group, same as any per-group top-k. The md5 lane
    is engine-exact, so the DuckDB twin picks the identical rows."""
    lane = hash_lane(F.concat(F.lit(seed), F.lit(":"), col(key).cast("string")))
    w = Window.partitionBy(group).orderBy(lane, col(key))
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= k)
        .drop("_rk")
    )


def numeric_histogram(
    df: DataFrame,
    value: str,
    bins: int = 20,
    group: str | None = None,
) -> DataFrame:
    """Equi-width histogram with in-engine bounds — the profiling primitive
    behind length/score dashboards. Bounds come from one global min/max
    aggregate (broadcast back as a 1-row join, same shuffle-reuse shape as
    rel_q11); each row then lands in bin floor((x−lo)/width), with the max
    clamped into the last bin. Returns (group?, bin, lo_edge, hi_edge, n).

    Scale: two passes over the column (bounds, counts) with map-side
    combine on ≤ bins·groups cells; no sort. Bin edges are computed from
    micro-unit integers so the cut points are engine-exact even for float
    inputs."""
    x = col(value).cast("double")
    m = F.floor(x * F.lit(1000000.0) + F.lit(0.5)).cast("long")
    bounds = df.agg(F.min(m).alias("_lo"), F.max(m).alias("_hi"))
    j = df.join(F.broadcast(bounds))
    width = F.greatest((F.col("_hi") - F.col("_lo")), F.lit(1).cast("long"))
    b = F.least(
        F.lit(bins - 1).cast("long"),
        F.floor(((m - F.col("_lo")) * bins).cast("double") / width.cast("double")).cast("long"),
    )
    keys = ([group] if group else []) + ["bin"]
    out = (
        j.select(*([group] if group else []), b.alias("bin"), F.col("_lo"), F.col("_hi"))
        .groupBy(*keys, "_lo", "_hi")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    lo_edge = (F.col("_lo") + F.col("bin") * (F.col("_hi") - F.col("_lo")) / bins).cast(
        "double"
    ) / 1000000.0
    hi_edge = (
        F.col("_lo") + (F.col("bin") + 1) * (F.col("_hi") - F.col("_lo")) / bins
    ).cast("double") / 1000000.0
    return out.select(
        *keys,
        round6(lo_edge).alias("lo_edge"),
        round6(hi_edge).alias("hi_edge"),
        "n",
    )
