"""Snapshot-cost scaling: full-mode vs delta-mode commit work vs |seen|.

The r5 incremental-snapshot claim is asymptotic: full mode rewrites the
seen table AND rebuilds the sidecar from it every round (O(|seen|) per
round), delta mode writes only the round's delta and absorbs it into
last round's filter (O(|delta|) amortized).  This bench pins the curve:
for growing seen sizes and a FIXED 250k delta, measure

* ``full``  — write seen parquet + bloom.build(seen) + write sidecar
* ``delta`` — write delta parquet + bloom.absorb(prev, delta, seen)
              + write sidecar

Full-mode wall must grow ~linearly with |seen|; delta-mode wall must
stay ~flat (up to the documented amortized resize rounds — the number
of buckets absorb rebuilt is reported per cell so a resize round is
visible, not hidden).  Equivalence is asserted in-run: the absorbed
sidecar must be byte-identical to a from-scratch build at every size
(the bloom OR-identity the unit tests pin at small scale).

Writes BENCH/snapshot_r5.json.  Usage: python tools/snapshot_bench.py
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
    "CRAWLSPARK_SNAPBENCH_SIZES", "1000000,2000000,4000000,8000000").split(",")]
DELTA = int(os.environ.get("CRAWLSPARK_SNAPBENCH_DELTA", "250000"))
CORES = int(os.environ.get("CRAWLSPARK_SNAPBENCH_CORES", "16"))
REPS = int(os.environ.get("CRAWLSPARK_SNAPBENCH_REPS", "2"))
N_BUCKETS = 64
OUT = os.path.join(_ROOT, "BENCH", "snapshot_r5.json")
TMP = os.path.join(_ROOT, "BENCH", "data", "tmp_snapbench")


def main() -> None:
    from pyspark.sql import functions as F

    from crawlspark import bloom
    from crawlspark.session import get_spark

    spark = get_spark(
        f"snapshot-bench-{CORES}", master=f"local[{CORES}]",
        shuffle_partitions=max(16, CORES),
        extra_conf={"spark.driver.memory": "16g"},
    )

    def mk(lo: int, hi: int, tag: str):
        return (
            spark.range(lo, hi)
            .select(F.xxhash64(F.concat(F.lit(tag), F.col("id").cast("string"))).alias("url_hash"))
            .withColumn("bucket", F.pmod(F.col("url_hash"), F.lit(N_BUCKETS)).cast("int"))
        )

    def sidecar_bytes(path: str) -> dict[int, bytes]:
        rows = spark.read.parquet(path).select("bucket", "bitset").collect()
        return {r["bucket"]: bytes(r["bitset"]) for r in rows}

    shutil.rmtree(TMP, ignore_errors=True)
    cells = []
    for n in SIZES:
        parent = mk(0, n, "u").localCheckpoint(eager=True)
        delta = mk(0, DELTA, "v").localCheckpoint(eager=True)
        full = parent.unionByName(delta).localCheckpoint(eager=True)
        prev_path = os.path.join(TMP, f"prev_{n}")
        bloom.write_sidecar(bloom.build(parent), prev_path)

        full_best = delta_best = None
        rebuilt = None
        for rep in range(REPS):
            d_full = os.path.join(TMP, f"full_{n}_{rep}")
            t0 = time.monotonic()
            full.write.mode("overwrite").parquet(os.path.join(d_full, "seen"))
            bloom.write_sidecar(bloom.build(full), os.path.join(d_full, "bloom"))
            w = time.monotonic() - t0
            full_best = w if full_best is None else min(full_best, w)

            d_delta = os.path.join(TMP, f"delta_{n}_{rep}")
            t0 = time.monotonic()
            delta.write.mode("overwrite").parquet(os.path.join(d_delta, "seen_delta"))
            absorbed = bloom.absorb(spark.read.parquet(prev_path), delta, full)
            bloom.write_sidecar(absorbed, os.path.join(d_delta, "bloom"))
            w = time.monotonic() - t0
            delta_best = w if delta_best is None else min(delta_best, w)
            if rebuilt is None:
                # buckets absorb rebuilt = those whose size rule grew
                prev_sizes = {b: len(v) for b, v in sidecar_bytes(prev_path).items()}
                new_sizes = {b: len(v) for b, v in sidecar_bytes(os.path.join(d_delta, "bloom")).items()}
                rebuilt = sum(1 for b in new_sizes if new_sizes[b] != prev_sizes.get(b))
                # OR-identity: absorbed sidecar == from-scratch build, byte for byte
                assert sidecar_bytes(os.path.join(d_delta, "bloom")) == sidecar_bytes(
                    os.path.join(d_full, "bloom")
                ), f"absorb diverged from full build at n={n}"
        cells.append({
            "seen_rows": n, "delta_rows": DELTA,
            "full_commit_sec": round(full_best, 2),
            "delta_commit_sec": round(delta_best, 2),
            "speedup": round(full_best / delta_best, 2),
            "buckets_resized": rebuilt,
            "absorb_byte_identical_to_full_build": True,
        })
        print(f"  n={n:,}: full={full_best:.2f}s delta={delta_best:.2f}s "
              f"({full_best/delta_best:.1f}x, {rebuilt} buckets resized)",
              file=sys.stderr)
        for df in (parent, delta, full):
            df.unpersist()
    spark.stop()
    shutil.rmtree(TMP, ignore_errors=True)

    out = {
        "metric": "per-round snapshot commit cost (seen write + bloom sidecar), "
                  "full-rewrite mode vs delta+absorb mode, fixed 250k delta",
        "cores": CORES, "reps_min": REPS, "n_buckets": N_BUCKETS,
        "cells": cells,
    }
    with open(OUT, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
