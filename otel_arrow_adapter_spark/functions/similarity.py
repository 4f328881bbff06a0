"""Similarity search over an embedding column (array<float>).

- ``cosine_topk``: brute-force top-k vs a query vector — native
  ``zip_with`` + ``aggregate`` dot product (JVM, no Python), one pass,
  the exact baseline.
- ``sign_lsh_buckets`` / ``ann_pairs``: the scale path — axis-sign LSH
  (bucket = sign bits of the first m dimensions; an axis-aligned
  random-hyperplane LSH that is engine-portable), candidates only within
  a bucket, cosine verify. At 10^9 vectors the bucket join replaces the
  O(n^2) cross join.
- ``ivf_assign``: IVF-style coarse quantization against a broadcast
  centroid table (here: seeded sample vectors) — one broadcast cross join
  of n x k, argmin by window.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    embeddings: DataFrame,
    query_vec_id: int = 0,
    k: int = 10,
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k neighbors of one vector by cosine (excluding itself);
    deterministic tie-break by vec_id."""
    q = embeddings.where(F.col("vec_id") == query_vec_id).select(
        F.col(vec_col).alias("q_vec")
    )
    scored = (
        embeddings.where(F.col("vec_id") != query_vec_id)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            F.round(cosine(F.col(vec_col), F.col("q_vec")), 6).alias("cos_sim"),
        )
    )
    # orderBy+limit compiles to TakeOrderedAndProject — distributed partial
    # top-k per partition, k rows to the driver — instead of a global
    # single-partition row_number window over all n scores. Rank is then
    # assigned windowlessly on the k survivors (collect+sort+posexplode of
    # an O(k) array): no WindowExec at all in the plan.
    top = scored.orderBy(F.desc("cos_sim"), F.asc("vec_id")).limit(k)
    arr = F.sort_array(
        F.collect_list(F.struct((-F.col("cos_sim")).alias("_neg"), "vec_id", "cos_sim"))
    )
    return (
        top.agg(arr.alias("_v"))
        .select(F.posexplode("_v").alias("_pos", "_s"))
        .select(
            F.col("_s.vec_id").alias("vec_id"),
            F.col("_s.cos_sim").alias("cos_sim"),
            (F.col("_pos") + 1).cast("int").alias("rank"),
        )
    )


def sign_lsh_buckets(embeddings: DataFrame, m: int = 8, vec_col: str = "embedding") -> DataFrame:
    """Bucket id = sign-bit string of the first m dimensions."""
    bits = [
        F.when(F.element_at(F.col(vec_col), i + 1) >= 0, F.lit("1")).otherwise(F.lit("0"))
        for i in range(m)
    ]
    return embeddings.withColumn("bucket", F.concat(*bits))


def ann_pairs(
    embeddings: DataFrame,
    threshold: float = 0.3,
    m: int = 8,
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate near-neighbor pairs: same sign-LSH bucket + cosine >= t."""
    b = sign_lsh_buckets(embeddings, m, vec_col).select("vec_id", "bucket", vec_col)
    l, r = b.alias("l"), b.alias("r")
    return (
        l.join(r, on="bucket")
        .where(F.col("l.vec_id") < F.col("r.vec_id"))
        .select(
            F.col("l.vec_id").alias("vec_a"),
            F.col("r.vec_id").alias("vec_b"),
            F.round(cosine(F.col(f"l.{vec_col}"), F.col(f"r.{vec_col}")), 6).alias("cos_sim"),
        )
        .where(F.col("cos_sim") >= threshold)
    )


def ivf_assign(
    embeddings: DataFrame,
    n_centroids: int = 10,
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF coarse assignment: centroids = the first n seed vectors
    (vec_id < n — deterministic stand-in for k-means; the operator shape
    is identical with trained centroids). Returns (vec_id, centroid_id,
    cos_sim) of the nearest centroid."""
    cents = embeddings.where(F.col("vec_id") < n_centroids).select(
        F.col("vec_id").alias("centroid_id"), F.col(vec_col).alias("c_vec")
    )
    scored = embeddings.crossJoin(F.broadcast(cents)).select(
        "vec_id",
        "centroid_id",
        F.round(cosine(F.col(vec_col), F.col("c_vec")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("cos_sim"), F.asc("centroid_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("vec_id", "centroid_id", "cos_sim")
    )
