"""Seen-filter bench: bloom vs cuckoo sidecar cost in the FULL crawl loop.

``CrawlConfig.filter_kind`` was wired in r4 (cuckoo = deletable seen set
for recrawl workloads) but its cost was never measured.  The probe/build
only engage when snapshots are on (the sidecar is rebuilt per committed
round and probed at the next round's fresh-link check), so the cells are:

* ``none``   — snapshot_root=None: the headline-bench configuration, no
  sidecar at all (baseline: what snapshots themselves cost);
* ``bloom``  — snapshots on, partitioned Bloom sidecar (default);
* ``cuckoo`` — snapshots on, partitioned cuckoo sidecar (same probe
  contract, plus in-place deletability the bloom cannot offer).

Same corpus (the cached 2M-page bench parquet), same 150k seeds, same
2-round config, local[CORES]; min-of-REPS per cell in ONE JVM (no
env-baked knobs here, unlike skew_bench).  The fetch-order digest must
be IDENTICAL across all three cells — the filter kind is a physical
choice, never a semantic one (false positives are re-checked exactly).

Writes BENCH/filter_r5.json.  Usage: python tools/filter_bench.py
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.join(_ROOT, "tests"))
os.environ["PYTHONPATH"] = (
    f"{_ROOT}:{os.path.join(_ROOT, 'tests')}:" + os.environ.get("PYTHONPATH", "")
)

SEEDS = int(os.environ.get("CRAWLSPARK_FILTER_SEEDS", "150000"))
ROUNDS = int(os.environ.get("CRAWLSPARK_FILTER_ROUNDS", "2"))
CORES = int(os.environ.get("CRAWLSPARK_FILTER_CORES", "16"))
REPS = int(os.environ.get("CRAWLSPARK_FILTER_REPS", "2"))
OUT = os.path.join(_ROOT, "BENCH", "filter_r5.json")
SNAP = os.path.join(_ROOT, "BENCH", "data", "tmp_filter_snaps")


def main() -> None:
    import gen_pages as gp
    from bench import BENCH_PAGES, ensure_pages, warm_workers
    from pyspark.sql import functions as F

    from crawlspark import config, crawl
    from crawlspark.schemas import PAGES_SCHEMA
    from crawlspark.session import get_spark

    spark = get_spark(
        f"filter-bench-{CORES}",
        master=f"local[{CORES}]",
        shuffle_partitions=max(16, CORES),
        extra_conf={"spark.driver.memory": "16g"},
    )
    pages_path = ensure_pages(spark)
    pages = spark.read.schema(PAGES_SCHEMA).parquet(pages_path)
    robots = gp.robots_df(spark)
    warm_workers(spark)

    def _cfg(kind: str):
        return config.CrawlConfig(
            rounds=ROUNDS,
            round_seconds=200_000.0,
            max_budget_per_host=1_000_000,
            n_buckets=64,
            salt=8,
            max_depth=10,
            filter_kind=kind,
        )

    wseeds = spark.createDataFrame(
        [(s,) for s in gp.gen_seeds(BENCH_PAGES, 200)], "url string"
    )
    crawl.crawl(spark, wseeds, pages, robots, cfg=_cfg("bloom"))["fetch_log"].count()

    seeds = spark.createDataFrame(
        [(s,) for s in gp.gen_seeds(BENCH_PAGES, SEEDS)], "url string"
    )

    cells: dict[str, dict] = {}
    for cell in ("none", "bloom", "cuckoo"):
        kind = "bloom" if cell == "none" else cell
        best = None
        digest = None
        for rep in range(REPS):
            snap_root = None
            if cell != "none":
                snap_root = os.path.join(SNAP, cell)
                shutil.rmtree(snap_root, ignore_errors=True)
            t0 = time.monotonic()
            result = crawl.crawl(
                spark, seeds, pages, robots, cfg=_cfg(kind),
                snapshot_root=snap_root, run_id=f"fb-{cell}-{rep}",
            )
            n = result["fetch_log"].count()
            wall = time.monotonic() - t0
            print(f"  {cell} rep{rep}: wall={wall:.2f}s urls/s={n / wall:,.0f}",
                  file=sys.stderr)
            if best is None or wall < best["wall_sec"]:
                best = {"wall_sec": round(wall, 2), "n_fetched": n,
                        "urls_per_sec": round(n / wall, 1)}
            if digest is None:
                pdf = (
                    result["fetch_log"]
                    .orderBy("round", "sched_ts", "host", "url")
                    .select(F.concat_ws(
                        ":",
                        F.col("round").cast("string"),
                        F.col("sched_ts").cast("string"),
                        F.col("host"), F.col("url"),
                    ).alias("k"))
                    .toPandas()
                )
                digest = hashlib.md5("|".join(pdf["k"]).encode()).hexdigest()
        cells[cell] = {**best, "fetch_digest": digest}
    spark.stop()
    shutil.rmtree(SNAP, ignore_errors=True)

    digests = {c["fetch_digest"] for c in cells.values()}
    out = {
        "metric": "crawl wall: no sidecar vs bloom vs cuckoo seen-filter "
                  "(snapshots on), identical outputs required",
        "pages": BENCH_PAGES, "seeds": SEEDS, "rounds": ROUNDS,
        "cores": CORES, "reps_min": REPS,
        "cells": cells,
        "snapshot_overhead_sec": round(
            cells["bloom"]["wall_sec"] - cells["none"]["wall_sec"], 2),
        "cuckoo_over_bloom_sec": round(
            cells["cuckoo"]["wall_sec"] - cells["bloom"]["wall_sec"], 2),
        "replay_identical_across_kinds": len(digests) == 1,
    }
    assert len(digests) == 1, f"fetch order diverged across filter kinds: {cells}"
    with open(OUT, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
