"""Experiment: ngram_jaccard pair generation — self-join vs groupBy+collect.

Current shape (textops.ngram_jaccard_pairs): explode shingle hashes, self-join
on (block, sh), groupBy pair.  That shuffles the exploded table twice (a/b
sides) plus once for the pair counts plus once for sizes.

Candidate: explode once, groupBy (block, sh) -> collect_list(id), generate
ordered pairs JVM-side (nested transform + flatten), explode pairs, count.
One scan, shuffles: (block,sh) agg + pair agg + sizes agg.

Run: python tools/exp_ngram.py [sf_dir]
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


def ngram_jaccard_grouped(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    threshold: float = 0.8,
    block_col: str | None = None,
) -> DataFrame:
    sh = df.select(
        F.col(id_col),
        *([F.col(block_col)] if block_col else []),
        F.explode(textops.shingles_col(F.col(text_col), k)).alias("sh_str"),
    ).select(
        F.col(id_col),
        *([F.col(block_col)] if block_col else []),
        F.xxhash64("sh_str").alias("sh"),
    )
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    keys = [block_col, "sh"] if block_col else ["sh"]
    grouped = sh.groupBy(*keys).agg(F.collect_list(id_col).alias("ids"))
    ids_sorted = F.array_sort("ids")
    pairs = grouped.select(
        F.explode(
            F.flatten(
                F.transform(
                    ids_sorted,
                    lambda a, i: F.filter(
                        F.transform(
                            F.slice(ids_sorted, i + 2, F.size(ids_sorted)),
                            lambda b: F.struct(a.alias("id_a"), b.alias("id_b")),
                        ),
                        lambda s: s["id_a"] < s["id_b"],
                    ),
                )
            )
        ).alias("p")
    ).select("p.id_a", "p.id_b")
    common = pairs.groupBy("id_a", "id_b").agg(F.count(F.lit(1)).alias("n_common"))
    na = sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"))
    nb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"))
    return (
        common.join(na, "id_a")
        .join(nb, "id_b")
        .withColumn(
            "jaccard",
            F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 4).alias("jaccard"))
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("exp-ngram", master="local[32]", shuffle_partitions=32)
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    print("docs:", docs.count(), "cols:", docs.columns)

    variants = {
        "selfjoin": lambda: textops.ngram_jaccard_pairs(
            docs, "doc_id", "text", k=3, threshold=0.5, block_col="source"
        ),
        "grouped": lambda: ngram_jaccard_grouped(
            docs, "doc_id", "text", k=3, threshold=0.5, block_col="source"
        ),
    }
    results = {}
    for name, fn in variants.items():
        for rep in range(3):
            t0 = time.monotonic()
            fn().write.format("noop").mode("overwrite").save()
            dt = time.monotonic() - t0
            results.setdefault(name, []).append(round(dt, 2))
    print(results)
    # equality check
    a = variants["selfjoin"]().orderBy("id_a", "id_b").collect()
    b = variants["grouped"]().orderBy("id_a", "id_b").collect()
    print("rows:", len(a), len(b), "equal:", a == b)
    spark.stop()


if __name__ == "__main__":
    main()
