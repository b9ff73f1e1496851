"""Experiment: minhash_dedup_pairs — current vs (a) posting-list LSH pairs +
(b) verify on hashed-shingle long arrays instead of string arrays.

Run: python tools/exp_minhash.py [sf_dir]
"""
from __future__ import annotations

import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crawlspark import textops
from crawlspark.session import get_spark


def hashed_shingles_col(text_col, k=3):
    return F.transform(textops.shingles_col(text_col, k), lambda s: F.xxhash64(s))


def minhash_signature_v2(df, id_col, text_col, n_hashes=32, k=3):
    exploded = df.select(
        F.col(id_col), F.explode(hashed_shingles_col(F.col(text_col), k)).alias("shh")
    )
    aggs = [
        F.min(F.xxhash64(F.col("shh"), F.lit(i))).alias(f"h{i}")
        for i in range(n_hashes)
    ]
    sig = exploded.groupBy(id_col).agg(*aggs)
    return sig.select(
        F.col(id_col), F.array(*[F.col(f"h{i}") for i in range(n_hashes)]).alias("sig")
    )


def lsh_candidate_pairs_v2(sigs, id_col, bands=8, rows_per_band=4):
    banded = sigs.select(
        F.col(id_col),
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.xxhash64(
                        F.concat_ws(
                            ",",
                            F.transform(
                                F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band),
                                lambda x: x.cast("string"),
                            ),
                        )
                    ).alias("band_hash"),
                ),
            )
        ).alias("bb"),
    ).select(id_col, "bb.band", "bb.band_hash")
    posting = banded.groupBy("band", "band_hash").agg(
        F.array_sort(F.collect_list(id_col)).alias("ids")
    )
    return (
        posting.select(
            F.explode(
                F.flatten(
                    F.transform(
                        F.col("ids"),
                        lambda a, i: F.transform(
                            F.slice(F.col("ids"), i + 2, F.size(F.col("ids"))),
                            lambda b: F.struct(a.alias("id_a"), b.alias("id_b")),
                        ),
                    )
                )
            ).alias("p")
        )
        .select("p.id_a", "p.id_b")
        .distinct()
    )


def minhash_dedup_pairs_v2(
    df, id_col="doc_id", text_col="text", n_hashes=32, k=3, bands=8, threshold=0.5
):
    rows_per_band = n_hashes // bands
    sigs = minhash_signature_v2(df, id_col, text_col, n_hashes, k)
    cand = lsh_candidate_pairs_v2(sigs, id_col, bands, rows_per_band)
    sh = df.select(
        F.col(id_col), hashed_shingles_col(F.col(text_col), k).alias("sh")
    )
    return (
        cand.join(sh.withColumnRenamed(id_col, "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
        .join(sh.withColumnRenamed(id_col, "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b"))
            / F.size(F.array_union("sh_a", "sh_b")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 4).alias("jaccard"))
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("exp-minhash", master="local[32]", shuffle_partitions=32)
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    variants = {
        "current": lambda: textops.minhash_dedup_pairs(docs, "doc_id", "text"),
        "v2": lambda: minhash_dedup_pairs_v2(docs, "doc_id", "text"),
    }
    results = {}
    for name, fn in variants.items():
        for rep in range(3):
            t0 = time.monotonic()
            fn().write.format("noop").mode("overwrite").save()
            results.setdefault(name, []).append(round(time.monotonic() - t0, 2))
    print(results)
    a = variants["current"]().orderBy("id_a", "id_b").collect()
    b = variants["v2"]().orderBy("id_a", "id_b").collect()
    print("rows:", len(a), len(b), "equal:", a == b)
    spark.stop()


if __name__ == "__main__":
    main()
