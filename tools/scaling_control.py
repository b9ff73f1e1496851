"""Hardware scaling control (BENCH/BASELINE.md methodology, r3/r4).

A pure-JVM, embarrassingly-parallel job — parquet scan of the same 2M-page
corpus, xxhash64(html) + length per row, count/max aggregate, no shuffle,
no Python — measures the HOST's 4→16 scaling ceiling in the current load
window.  Any job on this box, however perfectly parallel, cannot scale
better than this; the crawl's efficiency is graded against it.

Usage: python tools/scaling_control.py [reps]   (default 3; min-of-reps)
Prints one JSON line shaped like BENCH/scaling_r3_control.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

PAGES = os.environ.get(
    "CRAWLSPARK_CONTROL_PAGES", "/root/repo/BENCH/data/pages_2000000"
)


def one_level(cpus: int, reps: int) -> float:
    from pyspark.sql import functions as F

    from crawlspark.schemas import PAGES_SCHEMA
    from crawlspark.session import get_spark

    spark = get_spark(f"scaling-control-{cpus}", master=f"local[{cpus}]",
                      shuffle_partitions=max(16, cpus))
    # max(h) — not count(h): Catalyst rewrites count(non-nullable expr) to
    # count(1) and PRUNES html from the scan entirely (caught via explain:
    # ReadSchema collapsed to struct<url:string>); max forces the hash of
    # every html payload, which is the point of the control.
    # A FRESH plan per run: re-collecting one DataFrame object reuses its
    # planned shuffle files, so timed reps would skip the map stage
    # entirely (caught: 0.06 s "scans" of a 1.2 GB corpus).
    def fresh_scan():
        pages = spark.read.schema(PAGES_SCHEMA).parquet(PAGES)
        return pages.select(
            F.xxhash64("html").alias("h"), F.length("url").alias("l")
        ).agg(F.max("h").alias("n"), F.max("l").alias("m"))

    fresh_scan().collect()  # warm: JIT + page cache
    best = None
    for _ in range(reps):
        t0 = time.monotonic()
        fresh_scan().collect()
        w = time.monotonic() - t0
        best = w if best is None or w < best else best
    spark.stop()
    return round(best, 3)


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    lo, hi = (
        int(x)
        for x in os.environ.get("CRAWLSPARK_SCALE_LEVELS", "4,16").split(",")
    )
    w_lo = one_level(lo, reps)
    w_hi = one_level(hi, reps)
    eff = round((w_lo / w_hi) / (hi / lo), 3)
    print(json.dumps({
        "control": "pure-JVM embarrassingly-parallel parquet hash-scan "
                   "(xxhash64(html) + length, count/max agg, no shuffle, "
                   "no Python) over the same 2M-page corpus",
        "levels": [lo, hi],
        f"wall_{lo}": w_lo,
        f"wall_{hi}": w_hi,
        "efficiency": eff,
        "reps": reps,
        "aggregation": "min wall per level",
    }))


if __name__ == "__main__":
    main()
