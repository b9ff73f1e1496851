"""Experiment: row-side minhash signature (no explode, no shuffle).

RESULT: NEGATIVE — not adopted.  The per-row formulation
``transform(sequence(0,31), i -> array_min(transform(shh, s -> xxhash64(s, i))))``
builds a 32-way nested higher-order expression that falls out of
whole-stage codegen and evaluates interpreted: at sf0.001 the agg path
finishes in 1.4 s while the row-side path did not finish within the
10-minute timeout; at sf0.1 it hangs outright.  The explode + 32-min
hash-aggregate (one shuffle with map-side partial combine) keeps every
hash call inside codegen and stays; kept here as the documented negative
result (like tools/exp_minhash.py's posting-list rewrite).

Run: python tools/exp_minhash_rowside.py [sf_dir] [reps]
"""
from __future__ import annotations

import sys
import time

from pyspark.sql import DataFrame, SparkSession, functions as F

sys.path.insert(0, ".")
from crawlspark import textops  # noqa: E402


def rowside_signature(df: DataFrame, id_col: str, text_col: str,
                      n_hashes: int = 32, k: int = 3) -> DataFrame:
    shh = F.transform(
        textops.shingles_col(F.col(text_col), k), lambda s: F.xxhash64(s)
    )
    sig = F.transform(
        F.sequence(F.lit(0), F.lit(n_hashes - 1)),
        lambda i: F.array_min(F.transform(shh, lambda s: F.xxhash64(s, i))),
    )
    return (
        df.select(F.col(id_col), sig.alias("sig"))
        .filter(F.size("sig") > 0)
        .filter(F.col("sig")[0].isNotNull())
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "8g")
        .appName("exp_minhash_rowside")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    agg = textops.minhash_signature(docs, "doc_id", "text").orderBy("doc_id")
    row = rowside_signature(docs, "doc_id", "text").orderBy("doc_id")
    a = [(r["doc_id"], r["sig"]) for r in agg.collect()]
    b = [(r["doc_id"], r["sig"]) for r in row.collect()]
    print(f"identical: {a == b}  (n={len(a)} vs {len(b)})")

    for name, fn in (
        ("agg", lambda: textops.minhash_signature(docs, "doc_id", "text")),
        ("rowside", lambda: rowside_signature(docs, "doc_id", "text")),
    ):
        walls = []
        for _ in range(reps):
            t0 = time.monotonic()
            fn().write.format("noop").mode("overwrite").save()
            walls.append(round(time.monotonic() - t0, 2))
        print(f"{name}: min={min(walls)} walls={walls}")

    # full dedup pipeline with each signature path
    for name, sigfn in (
        ("pairs_agg", textops.minhash_signature),
        ("pairs_rowside", rowside_signature),
    ):
        walls = []
        for _ in range(reps):
            t0 = time.monotonic()
            sigs = sigfn(docs, "doc_id", "text")
            cand = textops.lsh_candidate_pairs(sigs, "doc_id", 8, 4)
            cand.write.format("noop").mode("overwrite").save()
            walls.append(round(time.monotonic() - t0, 2))
        print(f"{name}: min={min(walls)} walls={walls}")
    spark.stop()


if __name__ == "__main__":
    main()
