"""Similarity search over an embedding column (array<float>).

Two paths, mirroring the index module's design:

- `knn_cosine_brute` — exact top-k, pure Column math. The query side is tiny
  (broadcast); per (query, candidate) pair the dot product runs through
  `F.aggregate` in *index order* so the double-precision sum is bit-identical
  to the SQL oracle's ordered sum (float sums are non-associative; fixing the
  order is what makes the value-hash comparison meaningful).
- `knn_cosine_lsh` — the scale path: random-hyperplane (sign) LSH buckets
  candidates; only same-bucket (+ multi-probe neighbor buckets) pairs are
  scored. Approximate — no SQL oracle; recall is asserted in tests against
  the brute-force path.

At 100 TB the brute path is a broadcast-nested-loop over all rows (linear
scan, embarrassingly parallel, no shuffle); the LSH path reduces scored pairs
by ~bucket_count× at some recall cost. An IVF variant would swap the random
hyperplanes for k-means centroids; hyperplanes keep the pipeline
deterministic without a training pass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

DIM = 64  # embeddings.parquet vector width


def _dot(a: Column, b: Column) -> Column:
    """Ordered double-precision dot product of two array columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def knn_cosine_brute(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k neighbors for the given query ids (self excluded).

    Plan: tiny query relation broadcast against the full embedding table
    (no shuffle on the big side), then per-query top-k via window rank —
    at scale Spark executes the final step as TakeOrderedAndProject per
    query partition. Returns (query_id, rank, vec_id, cosine) with the
    fixed tie-break (cosine DESC, vec_id ASC); cosine rounded to 6.
    """
    q = embeddings.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    pairs = embeddings.crossJoin(F.broadcast(q)).filter(F.col(id_col) != F.col("query_id"))
    scored = pairs.select(
        "query_id",
        F.col(id_col),
        F.round(cosine(F.col("qvec"), F.col(vec_col)), 6).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", id_col, "cosine")
    )


def _hyperplanes(spark, n_planes: int, dim: int = DIM):
    """Deterministic pseudo-random hyperplanes (hash-derived, no RNG state)."""
    import numpy as np

    rng = np.random.default_rng(12345)
    H = rng.standard_normal((n_planes, dim))
    return [[float(x) for x in row] for row in H]


def lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-LSH bucket id: bit_i = 1 iff vec · plane_i > 0."""
    bucket = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        arr = F.array(*[F.lit(x) for x in p])
        bucket = bucket + F.when(_dot(vec, arr) > 0, F.lit(1 << i).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return bucket


def knn_cosine_lsh(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 10,
    n_planes: int = 8,
    multiprobe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: score only candidates in the query's LSH bucket or
    any bucket within `multiprobe` bit flips. Same output contract as the
    brute path; recall < 1 by design (tested ≥0.9 vs brute at defaults)."""
    spark = embeddings.sparkSession
    planes = _hyperplanes(spark, n_planes)
    emb = embeddings.withColumn("bucket", lsh_bucket(F.col(vec_col), planes))
    q = emb.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"), F.col("bucket").alias("qb")
    )
    # multi-probe: query bucket plus all buckets at Hamming distance <= multiprobe
    probes = [0] + ([1 << i for i in range(n_planes)] if multiprobe >= 1 else [])
    probe_arr = F.array(*[F.lit(x).cast("long") for x in probes])
    qp = q.withColumn("bucket", F.explode(F.transform(probe_arr, lambda m: F.col("qb").bitwiseXOR(m)))).drop("qb")
    pairs = emb.join(F.broadcast(qp), "bucket").filter(F.col(id_col) != F.col("query_id"))
    scored = pairs.select(
        "query_id",
        F.col(id_col),
        F.round(cosine(F.col("qvec"), F.col(vec_col)), 6).alias("cosine"),
    ).dropDuplicates(["query_id", id_col])
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", id_col, "cosine")
    )


def embedding_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-dup pairs (id_a < id_b, cosine ≥ threshold).

    Exact all-pairs — O(n²) scored pairs, acceptable for dedup *verification*
    tiers; the LSH bucketing above is the at-scale candidate generator.
    Cosine rounded to 6 before thresholding (oracle-stable).
    """
    a = embeddings.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = embeddings.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(cosine(F.col("va"), F.col("vb")), 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
