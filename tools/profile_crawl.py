"""Phase-by-phase timing of one bench-scale crawl round.

Materializes each stage of run_round separately (noop write) so the wall
time of canon/schedule/fetch-join/extract/links/absorb can be attributed.
Numbers are upper bounds per phase (later phases recompute earlier lazy
steps unless materialized); the deltas between cumulative rows are the
signal.  Run: python tools/profile_crawl.py [n_pages] [n_seeds]
"""
from __future__ import annotations

import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.join(_ROOT, "tests"))
os.environ["PYTHONPATH"] = (
    f"{_ROOT}:{os.path.join(_ROOT, 'tests')}:" + os.environ.get("PYTHONPATH", "")
)

import gen_pages as gp
from pyspark.sql import functions as F

import bench
from crawlspark import config, crawl, dedup, extract, fetch, polite, sched
from crawlspark.schemas import PAGES_SCHEMA


def t(label, fn):
    t0 = time.monotonic()
    out = fn()
    print(f"{label:35s} {time.monotonic()-t0:7.2f}s", file=sys.stderr)
    return out


def main():
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else bench.BENCH_PAGES
    n_seeds = int(sys.argv[2]) if len(sys.argv) > 2 else bench.BENCH_SEEDS
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = bench._spark(f"local[{cpus}]", cpus)
    pages_path = bench.ensure_pages(spark)
    bench.warm_workers(spark)
    pages = spark.read.schema(PAGES_SCHEMA).parquet(pages_path)
    robots = gp.robots_df(spark)
    cfg = config.CrawlConfig(
        rounds=1, round_seconds=200_000.0, max_budget_per_host=1_000_000,
        n_buckets=64, salt=8, max_depth=10,
    )
    seeds = spark.createDataFrame(
        [(s,) for s in gp.gen_seeds(n_pages, n_seeds)], "url string"
    )

    mat = lambda df: crawl._materialize(df, cfg.persist_mode)

    latest_keys = t("latest_keys (full corpus pass)", lambda: mat(fetch.latest_keys(pages)))
    frontier = t("seeds->frontier (canon UDF)", lambda: mat(crawl.seeds_to_frontier(seeds, cfg.n_buckets)))
    print(f"frontier rows: {frontier.count()}", file=sys.stderr)

    seen = spark.createDataFrame([], "url_hash long, bucket int")
    candidates = dedup.unseen(frontier, seen)
    with_delay = candidates.join(F.broadcast(robots), "host", "left")
    allowed_flag = polite.allowed_col(F.col("url"), F.col("rules"))
    allowed = (
        with_delay.filter(allowed_flag)
        .withColumn("crawl_delay", F.coalesce(F.col("crawl_delay"), F.lit(cfg.default_crawl_delay)))
        .drop("rules")
    )
    scheduled = t("unseen+robots+schedule", lambda: mat(
        sched.schedule(allowed, 0, round_seconds=cfg.round_seconds,
                       max_budget=cfg.max_budget_per_host, salt=cfg.salt)))
    print(f"scheduled rows: {scheduled.count()}", file=sys.stderr)

    fetched = fetch.lookup_latest(
        scheduled.select("url", "host", "depth", "crawl_delay", "sched_ts"),
        pages, latest_keys,
    )
    fetched_nohtml = t("fetch join (drop html, no UDF)", lambda: mat(fetched.drop("html")))

    parsed = (
        fetched.withColumn("__tl", extract.text_links_udf(F.col("html"), F.col("url")))
        .drop("html")
        .withColumn("text", F.col("__tl.text"))
        .withColumn("links", F.col("__tl.links"))
        .drop("__tl")
    )
    parsed = t("fetch join + extract UDF", lambda: mat(parsed))

    raw_links = parsed.select(
        F.col("depth").alias("parent_depth"), F.explode_outer("links").alias("raw_url")
    ).filter(F.col("raw_url").isNotNull() & (F.col("parent_depth") < cfg.max_depth))
    n_raw = t("explode links (count only)", lambda: raw_links.count())
    n_distinct_raw = t("distinct raw links (count)", lambda: raw_links.select("raw_url").distinct().count())
    print(f"raw links: {n_raw}  distinct raw: {n_distinct_raw}", file=sys.stderr)

    discovered = t("links->frontier (canon all links)", lambda: mat(
        crawl.links_to_frontier(parsed, 1, cfg.n_buckets, cfg.max_depth)))
    print(f"discovered rows: {discovered.count()}", file=sys.stderr)

    tried = scheduled.select("url_hash")
    new_seen = t("seen absorb", lambda: mat(dedup.absorb(seen, tried, cfg.n_buckets)))
    leftover = frontier.join(tried, "url_hash", "left_anti")
    new_frontier = dedup.within(
        leftover.unionByName(discovered), stable=True
    ).join(new_seen.select("url_hash"), "url_hash", "left_anti")
    new_frontier = t("frontier' (dedup+anti)", lambda: mat(new_frontier))
    print(f"frontier' rows: {new_frontier.count()}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
