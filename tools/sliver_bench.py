"""Exact-recheck plan bench: plain anti-join vs broadcast-flip at scale.

Pins the dedup.unseen(small_probe=True) claim (SURVEY §2 C2; r5): the
maybe-seen sliver the bloom/cuckoo probe leaves behind is bounded by one
round's batch, but a plain ``left_anti`` against the accumulated seen
table sort-merge-joins — shuffling the FULL seen table over the network
every round, the one per-round cost that grows with crawl age.  The
flip (seen ⋉ broadcast(probe) → frontier ▷ broadcast(hits)) scans seen
but never exchanges it.

For growing |seen| and a FIXED probe sliver, measure both plans reading
seen from parquet (the shape the crawl loop sees after a snapshot
resume) and assert result equality via count + ordered xxhash64 digest
of surviving url_hash.  Expected curve: SMJ wall grows with |seen|
(shuffle write ∝ |seen|); flip wall grows only with the scan (columnar,
two int64 columns) and stays several × below.

Writes BENCH/sliver_r5.json.  Usage: python tools/sliver_bench.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

SIZES = [int(s) for s in os.environ.get(
    "CRAWLSPARK_SLIVERBENCH_SIZES", "8000000,16000000,32000000,64000000").split(",")]
PROBE = int(os.environ.get("CRAWLSPARK_SLIVERBENCH_PROBE", "300000"))
CORES = int(os.environ.get("CRAWLSPARK_SLIVERBENCH_CORES", "16"))
REPS = int(os.environ.get("CRAWLSPARK_SLIVERBENCH_REPS", "2"))
N_BUCKETS = 64
OUT = os.path.join(_ROOT, "BENCH", "sliver_r5.json")
TMP = os.path.join(_ROOT, "BENCH", "data", "tmp_sliverbench")


def main() -> None:
    from pyspark.sql import functions as F

    from crawlspark import dedup
    from crawlspark.session import get_spark

    spark = get_spark(
        f"sliver-bench-{CORES}", master=f"local[{CORES}]",
        shuffle_partitions=max(16, CORES),
        extra_conf={"spark.driver.memory": "16g"},
    )

    def mk(lo: int, hi: int, tag: str):
        return (
            spark.range(lo, hi)
            .select(F.xxhash64(F.concat(F.lit(tag), F.col("id").cast("string"))).alias("url_hash"))
            .withColumn("bucket", F.pmod(F.col("url_hash"), F.lit(N_BUCKETS)).cast("int"))
        )

    def digest(df):
        # sort INSIDE the aggregate: collect_list gives no ordering
        # guarantee after the partial-aggregate merge, and a pre-agg
        # orderBy does not survive it — array_sort makes the digest a pure
        # function of the SET, stable across plans/parallelism
        agg = (
            df.select("url_hash")
            .agg(F.xxhash64(F.concat_ws(
                     ",", F.array_sort(F.collect_list("url_hash")))).alias("d"),
                 F.count("*").alias("n"))
            .collect()[0]
        )
        return int(agg["n"]), int(agg["d"])

    os.makedirs(os.path.dirname(TMP), exist_ok=True)
    cells = []
    for n_seen in SIZES:
        seen_path = os.path.join(TMP, f"seen_{n_seen}")
        mk(0, n_seen, "s").write.mode("overwrite").parquet(seen_path)
        seen = spark.read.parquet(seen_path)
        # probe sliver: half true re-links (drawn from seen), half filter
        # false positives (keys not in seen) — the realistic mix
        half = PROBE // 2
        probe = (
            mk(0, half, "s").unionByName(mk(0, PROBE - half, "fp"))
            .withColumn("url", F.concat(F.lit("u"), F.col("url_hash").cast("string")))
        )
        cell = {"n_seen": n_seen, "n_probe": PROBE}
        ref = None
        for plan, flag in (("smj_anti", False), ("broadcast_flip", True)):
            walls = []
            for _ in range(REPS):
                t0 = time.monotonic()
                n, d = digest(dedup.unseen(probe, seen, small_probe=flag))
                walls.append(round(time.monotonic() - t0, 2))
            if ref is None:
                ref = (n, d)
            assert (n, d) == ref, f"plan mismatch at {n_seen}: {(n, d)} != {ref}"
            cell[plan] = {"walls_s": walls, "min_s": min(walls),
                          "n_out": n, "digest": d}
        cell["speedup"] = round(cell["smj_anti"]["min_s"]
                                / cell["broadcast_flip"]["min_s"], 2)
        cells.append(cell)
        print(json.dumps(cell))
        shutil.rmtree(seen_path, ignore_errors=True)

    out = {"bench": "sliver_recheck", "cores": CORES, "reps": REPS,
           "note": ("plain left_anti SMJ-shuffles the full seen table; "
                    "broadcast-flip scans it (identical results, digest-"
                    "asserted per cell)"),
           "cells": cells}
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {OUT}")
    shutil.rmtree(TMP, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
