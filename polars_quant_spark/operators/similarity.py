"""Similarity search over embedding columns (ArrayType(FloatType)).

Two paths (SURVEY.md §7 Phase 5):
* ``cosine_topk`` — brute-force exact top-k: queries × corpus with the dot
  product as JVM higher-order fns. Scale: broadcast the (small) query set,
  corpus stays partitioned — one map-side pass + per-query top-k via window.
* ``ivf_topk`` — IVF-style scale path: corpus is bucketed by nearest
  centroid; queries probe only `nprobe` buckets. Centroids here are chosen
  deterministically (hash-sampled rows) rather than trained k-means — the
  bucketing/probing plumbing is the Spark-relevant part.

All dot products run in double via F.aggregate/zip_with — sequential
left-to-right accumulation, bit-matching the DuckDB list_sum oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from polars_quant_spark.functions._util import widen


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )


def cosine(a: Column, b: Column) -> Column:
    d = norm(a) * norm(b)
    return F.when(d > 0, dot(a, b) / d).otherwise(F.lit(0.0))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact brute-force cosine top-k for each query vector.

    Returns (query_id, vec_id, cos_sim, rank). The query side is broadcast —
    the corpus is never shuffled; the only wide op is the per-query top-k,
    bounded by queries×k rows."""
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("_qvec")
    )
    c = widen(corpus).select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("_cvec"))
    scored = c.crossJoin(F.broadcast(q)).select(
        "query_id",
        "vec_id",
        F.round(cosine(F.col("_qvec"), F.col("_cvec")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "cos_sim", "rank")
    )


def embedding_near_dupes(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cos ≥ threshold).

    Brute-force all-pairs here (fine for verification corpora); the 100 TB
    path blocks by ``ivf_assign`` buckets first so only same-bucket pairs
    join."""
    df = widen(df)
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"))
    return (
        a.crossJoin(b)
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(cosine(F.col("_va"), F.col("_vb")), 6).alias("cos_sim"),
        )
        .where(F.col("cos_sim") >= threshold)
    )


def ivf_assign(
    df: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id: str = "centroid_id",
    centroid_vec: str = "centroid",
) -> DataFrame:
    """Assign each vector to its nearest centroid (broadcast argmin via
    struct-max over the centroid array). Adds ``bucket``."""
    cent = centroids.select(
        F.col(centroid_id).alias("_cid"), F.col(centroid_vec).alias("_cvec")
    )
    joined = df.crossJoin(F.broadcast(cent)).select(
        *df.columns,
        F.struct(
            cosine(F.col(vec_col), F.col("_cvec")).alias("sim"),
            (-F.col("_cid")).alias("neg_cid"),
        ).alias("_cand"),
    )
    w = Window.partitionBy(id_col)
    best = joined.withColumn("_best", F.max("_cand").over(w)).where(
        F.col("_cand") == F.col("_best")
    )
    return best.select(*df.columns, (-F.col("_best.neg_cid")).alias("bucket"))


def hash_centroids(df: DataFrame, n: int = 16, id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Deterministic pseudo-centroids: the n corpus vectors with the smallest
    md5(id) — a training-free stand-in that keeps the IVF plumbing honest."""
    ranked = df.select(
        F.col(id_col), F.col(vec_col), F.md5(F.col(id_col).cast("string")).alias("_h")
    ).orderBy("_h").limit(n)
    w = Window.orderBy("_h")
    return ranked.select(
        (F.row_number().over(w) - 1).alias("centroid_id"), F.col(vec_col).alias("centroid")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """IVF-bucketed approximate top-k: corpus bucketed once by nearest
    centroid; each query scans only its `nprobe` nearest buckets."""
    corpus = widen(corpus)
    cents = hash_centroids(corpus, n_centroids, id_col, vec_col)
    bucketed = ivf_assign(corpus, cents, id_col, vec_col)
    q = queries.select(F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("_qvec"))
    qc = q.crossJoin(F.broadcast(cents)).select(
        "query_id",
        "_qvec",
        F.col("centroid_id").alias("bucket"),
        cosine(F.col("_qvec"), F.col("centroid")).alias("_csim"),
    )
    wq = Window.partitionBy("query_id").orderBy(F.col("_csim").desc(), F.col("bucket"))
    probes = qc.withColumn("_r", F.row_number().over(wq)).where(F.col("_r") <= nprobe).select(
        "query_id", "_qvec", "bucket"
    )
    scored = probes.join(
        bucketed.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("_cvec"), "bucket"),
        "bucket",
    ).select(
        "query_id",
        "vec_id",
        F.round(cosine(F.col("_qvec"), F.col("_cvec")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "cos_sim", "rank")
    )
