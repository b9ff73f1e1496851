"""Similarity search over embedding columns (session mandate).

Brute-force cosine top-k as the exact baseline, and an LSH-bucketed
(random-hyperplane) variant as the scale path.  Dot products stay JVM-side
via ``zip_with`` + ``aggregate`` higher-order functions — no Python in the
scoring loop.

Scale notes: brute force is O(|Q|·|C|) — correct only when the query side is
small enough to broadcast.  The LSH path buckets both sides by hyperplane
sign bits so the join is equi on the bucket key; recall is tuned by
``n_planes`` (fewer planes → bigger buckets → higher recall, more compute).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    q_id: str = "q_id",
    c_id: str = "vec_id",
    q_vec: str = "q_vec",
    c_vec: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors per query by cosine; broadcast the query side."""
    joined = corpus.crossJoin(F.broadcast(queries))
    scored = joined.select(
        F.col(q_id),
        F.col(c_id),
        cosine(F.col(q_vec), F.col(c_vec)).alias("cos"),
    )
    w = Window.partitionBy(q_id).orderBy(F.desc("cos"), F.col(c_id))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(q_id, c_id, F.round("cos", 4).alias("cos"), "rank")
    )


def _plane(seed: int, p: int, dim: int) -> list[float]:
    """Deterministic ±1 hyperplane from md5 — no RNG state."""
    out = []
    for d in range(dim):
        h = hashlib.md5(f"{seed}:{p}:{d}".encode()).digest()[0]
        out.append(1.0 if h % 2 == 0 else -1.0)
    return out


def lsh_bucket(vec: Column, dim: int, n_planes: int = 8, seed: int = 42) -> Column:
    """Sign-bit bucket id from n_planes deterministic hyperplanes."""
    bucket = F.lit(0).cast("long")
    for p in range(n_planes):
        plane = F.array(*[F.lit(w) for w in _plane(seed, p, dim)])
        bit = (dot(vec, plane) > 0).cast("long")
        bucket = bucket * 2 + bit
    return bucket


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 6,
    q_id: str = "q_id",
    c_id: str = "vec_id",
    q_vec: str = "q_vec",
    c_vec: str = "embedding",
) -> DataFrame:
    """Approximate top-k: compare only within the same hyperplane bucket.

    At scale both sides are bucketed scan-side and the join is equi on
    ``bucket`` — shuffle moves each row once, never the cross product.
    """
    qb = queries.withColumn("bucket", lsh_bucket(F.col(q_vec), dim, n_planes))
    cb = corpus.withColumn("bucket", lsh_bucket(F.col(c_vec), dim, n_planes))
    scored = qb.join(cb, "bucket").select(
        F.col(q_id), F.col(c_id), cosine(F.col(q_vec), F.col(c_vec)).alias("cos")
    )
    w = Window.partitionBy(q_id).orderBy(F.desc("cos"), F.col(c_id))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(q_id, c_id, F.round("cos", 4).alias("cos"), "rank")
    )


def neardup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 6,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via LSH buckets (id_a < id_b)."""
    b = df.withColumn("bucket", lsh_bucket(F.col(vec_col), dim, n_planes))
    l, r = b.alias("l"), b.alias("r")
    return (
        l.join(
            r,
            (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
            cosine(F.col(f"l.{vec_col}"), F.col(f"r.{vec_col}")).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", F.round("cos", 4).alias("cos"))
    )
