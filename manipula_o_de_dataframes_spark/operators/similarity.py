"""Similarity search over embedding columns (north-star surface).

Embeddings are ``array<float>`` columns. All vector math happens in
JVM-side higher-order functions (``zip_with`` + ``aggregate``) — no
Python, no UDF serde, stays in whole-stage codegen. Floats are cast to
double *before* any arithmetic and folds run in array order, so results
are bit-reproducible across engines.

Two strategies, as the north star asks:

- **brute-force top-k** — broadcast the query vector, one scan computing
  cosine, TakeOrderedAndProject for the top-k. The exact baseline; at
  100 TB this is one full scan, embarrassingly parallel, zero shuffle.
- **sign-LSH bucketed** — quantize each vector to a bucket key from the
  sign bits of its leading dimensions (a fixed, data-independent set of
  hyperplanes), shuffle only within buckets, search inside the probe's
  bucket. Trades recall for touching ~1/2^b of the data — the IVF-style
  scale path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a, b) -> Column:
    """Dot product of two float arrays, folded in order, in double."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def norm(a) -> Column:
    """L2 norm in double."""
    sq = F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return F.sqrt(sq)


def cosine(a, b) -> Column:
    """Cosine similarity, rounded to 9 dp to absorb fold-order ulps."""
    return F.round(dot(a, b) / (norm(a) * norm(b)), 9)


def brute_force_topk(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    query_id: int,
    k: int = 10,
) -> DataFrame:
    """Exact cosine top-k against the vector with id ``query_id``.

    The 1-row query side is broadcast (a crossJoin with a broadcast hint
    → BroadcastNestedLoopJoin over one row ≡ a map-side constant); the
    scan side never shuffles and top-k plans as TakeOrderedAndProject.
    """
    q = df.filter(F.col(id_col) == query_id).select(F.col(vec_col).alias("__qv"))
    scored = (
        df.filter(F.col(id_col) != query_id)
        .crossJoin(F.broadcast(q))
        .select(F.col(id_col), cosine(F.col(vec_col), F.col("__qv")).alias("cos_sim"))
    )
    return scored.orderBy(F.col("cos_sim").desc(), F.col(id_col)).limit(k)


def sign_bucket(vec, n_bits: int = 6) -> Column:
    """Sign-LSH bucket key: '1'/'0' per leading dimension's sign."""
    bits = [
        F.when(F.element_at(vec, i + 1) >= 0, F.lit("1")).otherwise(F.lit("0"))
        for i in range(n_bits)
    ]
    return F.concat(*bits)


def lsh_topk(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    query_id: int,
    k: int = 10,
    n_bits: int = 6,
) -> DataFrame:
    """Approximate top-k: search only the query's sign-LSH bucket.

    Same scoring as brute force but the scan is pre-filtered to the
    probe bucket — at scale the bucket key is a partition/cluster column
    so the filter prunes files before any I/O.
    """
    with_b = df.withColumn("__bucket", sign_bucket(F.col(vec_col), n_bits))
    q = with_b.filter(F.col(id_col) == query_id).select(
        F.col(vec_col).alias("__qv"), F.col("__bucket").alias("__qb")
    )
    scored = (
        with_b.crossJoin(F.broadcast(q))
        .filter((F.col("__bucket") == F.col("__qb")) & (F.col(id_col) != query_id))
        .select(F.col(id_col), cosine(F.col(vec_col), F.col("__qv")).alias("cos_sim"))
    )
    return scored.orderBy(F.col("cos_sim").desc(), F.col(id_col)).limit(k)


def bucket_histogram(df: DataFrame, vec_col: str, n_bits: int = 6) -> DataFrame:
    """Bucket occupancy report — the recall/selectivity tuning view."""
    return (
        df.withColumn("bucket", sign_bucket(F.col(vec_col), n_bits))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_vectors"))
    )
