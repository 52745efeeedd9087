"""Approximate-nearest-neighbor search over an embedding column.

Baseline: brute-force cosine top-k — broadcast the (small) query set,
score every corpus vector with JVM-side ``zip_with``/``aggregate`` (no
Python in the hot path), take top-k per query with a window. Scale
path: hyperplane-LSH bucketing — bucket both sides on sign bits of
seeded pseudo-random projections and search only matching buckets,
trading recall for a 2^bits-fold scan reduction.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors (vectors are unit-norm ⇒ cosine=dot).
    Queries are broadcast; the corpus is scanned once. Excludes self."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec")
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", F.round(dot(F.col("qvec"), F.col("cvec")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def _bucket_of(vec_col: Column, n_bits: int) -> Column:
    """Random-hyperplane sign bucket (deterministic seeded planes)."""
    dims = F.size(vec_col)

    def bit(seed: int) -> Column:
        proj = F.aggregate(
            F.zip_with(
                vec_col,
                F.transform(F.sequence(F.lit(1), dims), lambda i: F.sin(i * F.lit(float(seed)))),
                lambda x, p: x.cast("double") * p,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        return F.when(proj > 0, F.lit(1)).otherwise(F.lit(0))

    return sum(bit(s + 1) * (2**s) for s in range(n_bits))


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_bits: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: hyperplane-LSH bucket both sides, join on
    bucket, exact cosine within. 2^n_bits-fold scan reduction at the
    cost of recall (neighbors across the plane are missed) — the
    standard scale path when brute force stops fitting."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        _bucket_of(F.col(vec_col), n_bits).alias("bucket"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cvec"),
        _bucket_of(F.col(vec_col), n_bits).alias("bucket"),
    )
    scored = (
        c.join(F.broadcast(q), ["bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", F.round(dot(F.col("qvec"), F.col("cvec")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )
