"""Endurance bench: per-round wall over a LONG crawl with growing |seen|.

The component benches prove each per-round cost is O(batch) in isolation
(snapshot_bench: delta commits flat while full commits grow; sliver_bench:
the broadcast-flip recheck flat while plain SMJ grows; filter_bench: absorb
vs rebuild).  This bench proves the COMPOSITION: a many-round crawl with
snapshots, delta-seen cadence, sidecar absorb and the sliver flip all ON,
throttled by the per-host politeness budget so every round fetches a
roughly constant batch while cumulative |seen| grows round over round.  If
any hidden per-round cost scales with crawl age, the wall-vs-round curve
tilts; if the O(batch) design holds, it stays flat (modulo co-tenant
noise).

The throttle uses ``max_budget_per_host``: with ~20 hosts and budget B the
scheduler admits <= 20*B urls/round, so rounds 2..R fetch near-identical
batches from the 2M-page corpus regardless of how much has been seen.

Usage: python tools/endurance_bench.py [rounds] [budget_per_host]
Prints one JSON line; record to BENCH/endurance_r5.json.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.join(_ROOT, "tests"))
os.environ["PYTHONPATH"] = (
    f"{_ROOT}:{os.path.join(_ROOT, 'tests')}:" + os.environ.get("PYTHONPATH", "")
)


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    budget = int(sys.argv[2]) if len(sys.argv) > 2 else 8000
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "16"))

    import gen_pages as gp
    from pyspark.sql import functions as F

    import bench
    from crawlspark import config, crawl
    from crawlspark.schemas import PAGES_SCHEMA

    spark = bench._spark(f"local[{cpus}]", cpus)
    pages_path = bench.ensure_pages(spark)
    bench.warm_workers(spark)
    pages = spark.read.schema(PAGES_SCHEMA).parquet(pages_path)
    robots = gp.robots_df(spark)
    seeds = spark.createDataFrame(
        [(s,) for s in gp.gen_seeds(bench.BENCH_PAGES, 150_000)], "url string"
    )
    cfg = config.CrawlConfig(
        rounds=rounds,
        round_seconds=200_000.0,
        max_budget_per_host=budget,
        n_buckets=64,
        salt=8,
        max_depth=50,
        seen_checkpoint_every=4,  # delta cadence: full every 4th round
    )
    snap_root = tempfile.mkdtemp(prefix="endurance_snap_")
    try:
        t0 = time.monotonic()
        out = crawl.crawl(
            spark, seeds, pages, robots, cfg=cfg,
            snapshot_root=snap_root, run_id="endurance",
        )
        per_round_fetched = {
            r["round"]: r["n"]
            for r in out["fetch_log"].groupBy("round").agg(F.count("*").alias("n")).collect()
        }
        wall_total = round(time.monotonic() - t0, 2)
    finally:
        shutil.rmtree(snap_root, ignore_errors=True)

    walls = out["round_walls"]
    fetched = [per_round_fetched.get(r, 0) for r in range(len(walls))]
    cum_seen = []
    acc = 0
    for n in fetched:
        acc += n
        cum_seen.append(acc)
    # per-url cost per round is the honest flatness metric: batch sizes are
    # only roughly equal (host depletion trims the tail), so normalize
    us_per_url = [
        round(1e6 * w / n, 1) if n else None for w, n in zip(walls, fetched)
    ]
    # slope of wall vs cumulative seen over the steady rounds (drop round 0:
    # it pays seed canonicalization + first-materialization of the corpus
    # pass).  A genuinely O(|seen|) hidden cost at these sizes would add
    # O(seconds) per million seen rows; report sec per extra 1M seen.
    steady = [
        (s, w) for s, w, n in list(zip(cum_seen, walls, fetched))[1:] if n
    ]
    slope = None
    if len(steady) >= 3:
        xs = [s / 1e6 for s, _ in steady]
        ys = [w for _, w in steady]
        mx, my = sum(xs) / len(xs), sum(ys) / len(ys)
        denom = sum((x - mx) ** 2 for x in xs)
        slope = round(
            sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / denom, 3
        ) if denom else None

    print(json.dumps({
        "bench": "endurance: per-round wall over a long crawl, constant batch, growing seen",
        "cpus": cpus,
        "rounds_run": out["rounds_run"],
        "budget_per_host": budget,
        "round_walls_sec": walls,
        "round_fetched": fetched,
        "cumulative_seen": cum_seen,
        "us_per_url": us_per_url,
        "wall_slope_sec_per_1M_seen": slope,
        "wall_total_sec": wall_total,
        "config": "snapshots on, seen_checkpoint_every=4 (delta cadence), sidecar absorb, sliver flip + delta broadcast-hint on (defaults)",
    }))


if __name__ == "__main__":
    main()
