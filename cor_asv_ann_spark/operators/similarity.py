"""Approximate-nearest-neighbor search over an embedding column.

Baseline: brute-force cosine top-k — broadcast the (small) query set,
score every corpus vector with JVM-side ``zip_with``/``aggregate`` (no
Python in the hot path), take top-k per query with a window. Scale
path: **multi-band hyperplane LSH** — k independent band tables, each
banding on the sign bits of projections against seeded Gaussian
hyperplanes; candidates are the OR over bands, verified with exact
cosine. Candidate generation always goes through bounded (band, code)
buckets — never a cross join — and degenerate buckets are capped the
same way as minhash's ``lsh_candidates``.

The projection itself is a vectorized Arrow-batched numpy matmul
(one ``(batch, dims) @ (dims, n_planes)`` per batch): at 768-dim real
embeddings this is the one place a pandas UDF beats element-wise JVM
higher-order functions by an order of magnitude.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

_PLANE_CACHE: dict[tuple, np.ndarray] = {}


def _planes(seed: int, dims: int, n_planes: int) -> np.ndarray:
    """Deterministic Gaussian hyperplanes, independent across (band, bit):
    one rng stream keyed by (seed, dims, n_planes), cached per worker."""
    key = (seed, dims, n_planes)
    if key not in _PLANE_CACHE:
        rng = np.random.default_rng(abs(hash(key)) % (2**63))
        _PLANE_CACHE[key] = rng.standard_normal((n_planes, dims))
    return _PLANE_CACHE[key]


def band_codes_udf(n_bands: int, n_bits: int, seed: int = 42):
    """pandas UDF: embedding → array<long> of ``n_bands`` bucket codes,
    each code packing ``n_bits`` sign bits of Gaussian projections."""

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def codes(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype=object)
        mat = np.stack(v.to_numpy()).astype(np.float64)
        planes = _planes(seed, mat.shape[1], n_bands * n_bits)
        bits = (mat @ planes.T) > 0  # (batch, n_bands*n_bits)
        weights = 1 << np.arange(n_bits, dtype=np.int64)
        packed = bits.reshape(len(mat), n_bands, n_bits) @ weights
        return pd.Series(list(packed))

    return codes


def banded(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    n_bands: int,
    n_bits: int,
    seed: int = 42,
    max_bucket: int | None = None,
) -> DataFrame:
    """(id, band, code) rows — one per band table. ``max_bucket`` drops
    degenerate (band, code) buckets: a bucket of k rows would emit
    k·(k−1)/2 self-join pairs, so an uncapped hot bucket is an all-pairs
    join in disguise at 10^9+ vectors."""
    codes = band_codes_udf(n_bands, n_bits, seed)
    out = df.select(
        F.col(id_col), F.posexplode(codes(F.col(vec_col))).alias("band", "code")
    )
    if max_bucket is not None:
        # bucket-size cap via a window count: ONE pass over the UDF
        # output (a sizes-subquery join would recompute the projection
        # matmul), and the (band, code) exchange it introduces is the
        # same partitioning the downstream self-join needs
        w = Window.partitionBy("band", "code")
        out = (
            out.withColumn("bsz", F.count(F.lit(1)).over(w))
            .filter(F.col("bsz") <= max_bucket)
            .drop("bsz")
        )
    return out


def dot(a: Column, b: Column) -> Column:
    """JVM-side fold dot product: sequential-fold float semantics match
    DuckDB's list_inner_product, so oracle-checked rank queries stay
    bit-identical. Use ``dot_np`` on high-volume pair verification —
    the per-element HOF chain allocates per lambda call and is ~30×
    slower than one Arrow-batched numpy einsum at millions of pairs."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


@F.pandas_udf(T.DoubleType())
def dot_np(a: pd.Series, b: pd.Series) -> pd.Series:
    if len(a) == 0:
        return pd.Series([], dtype=np.float64)
    ma = np.stack(a.to_numpy()).astype(np.float64)
    mb = np.stack(b.to_numpy()).astype(np.float64)
    return pd.Series(np.einsum("ij,ij->i", ma, mb))


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


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_bands: int = 8,
    n_bits: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket: int | None = None,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: multi-band hyperplane LSH. Each of the
    ``n_bands`` independent band tables buckets both sides on an
    ``n_bits``-bit sign code; candidates are the OR (distinct union)
    over bands, then verified with exact cosine and ranked. Per-band
    scan reduction is 2^n_bits; recall grows as
    1−(1−p^n_bits)^n_bands with p the per-plane agreement probability."""
    cb = banded(corpus, id_col, vec_col, n_bands, n_bits, seed, max_bucket)
    qb = banded(queries, id_col, vec_col, n_bands, n_bits, seed).withColumnRenamed(
        id_col, "query_id"
    )
    cand = (
        cb.join(F.broadcast(qb), ["band", "code"])
        .filter(F.col(id_col) != F.col("query_id"))
        .select(F.col("query_id"), F.col(id_col).alias("neighbor_id"))
        .distinct()
    )
    qv = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"))
    cv = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec"))
    scored = (
        cand.join(cv, "neighbor_id")
        .join(F.broadcast(qv), "query_id")
        .withColumn("cosine", F.round(dot(F.col("qvec"), F.col("cvec")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )
