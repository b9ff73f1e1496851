"""spark-submit entrypoint (BASELINE.json: "ships as spark-submit --py-files").

Package and run:

    cd /root/repo && zip -r crawlspark.zip crawlspark
    spark-submit --py-files crawlspark.zip main.py \
        --pages /data/pages --seeds /data/seeds.txt --robots /data/robots.json \
        --rounds 3 --snapshot-root /data/snapshots --run-id run1 \
        --out /data/extracted

``--resume`` continues a killed run from its last committed snapshot.
On a cluster, pass ``--pages-format iceberg`` and an Iceberg table name.
"""

from __future__ import annotations

import argparse
import json
import sys


def parse_args(argv: list[str]) -> argparse.Namespace:
    p = argparse.ArgumentParser(description="crawlspark: PySpark crawl frontier + scheduler")
    p.add_argument("--pages", required=True, help="pages table path (parquet dir or iceberg table)")
    p.add_argument(
        "--pages-format",
        default="parquet",
        choices=["parquet", "iceberg", "warc"],
        help="warc: a directory of .warc/.warc.gz archives (Common Crawl "
        "layout); text extraction then runs in the crawl loop as usual",
    )
    p.add_argument(
        "--warc-split-mb",
        type=float,
        default=None,
        help="with --pages-format warc: cut each .warc.gz into byte ranges "
        "of this many MB so one jumbo archive fans out across executors "
        "(index-free validated-magic member scan; default: one file = one task)",
    )
    p.add_argument("--seeds", required=True, help="seed url list (text file, one url per line)")
    p.add_argument("--robots", default=None, help="robots rules (json file: [{host, rules, crawl_delay}])")
    p.add_argument(
        "--robots-txt",
        default=None,
        help="raw robots.txt bodies instead of --robots: a parquet dir with "
        "columns (host string, robots_txt string), parsed by "
        "polite.robots_from_text",
    )
    p.add_argument("--agent", default="crawlspark", help="user-agent for robots.txt group matching")
    p.add_argument(
        "--robots-from-pages",
        action="store_true",
        help="self-contained mode: mine each host's latest /robots.txt "
        "capture out of the pages corpus itself (no --robots/--robots-txt "
        "input needed); combines with --discover-sitemaps",
    )
    p.add_argument(
        "--discover-sitemaps",
        action="store_true",
        help="with --robots-txt: follow Sitemap: lines into the pages "
        "corpus (recursing sitemapindex refs) and union the discovered "
        "urls into the seed list",
    )
    p.add_argument("--rounds", type=int, default=3)
    p.add_argument("--round-seconds", type=float, default=60.0)
    p.add_argument("--max-depth", type=int, default=10)
    p.add_argument("--n-buckets", type=int, default=None)
    p.add_argument("--salt", type=int, default=None)
    p.add_argument(
        "--filter-kind",
        choices=["bloom", "cuckoo"],
        default="bloom",
        help="seen-filter sidecar: bloom (append-only) or cuckoo (supports "
        "in-place deletes for recrawl invalidation)",
    )
    p.add_argument("--snapshot-root", default=None)
    p.add_argument("--run-id", default=None)
    p.add_argument("--resume", action="store_true")
    p.add_argument(
        "--seen-checkpoint-every",
        type=int,
        default=None,
        help="commit the FULL seen table only every Nth round; rounds "
        "between commit the round's delta (O(batch) snapshot I/O instead "
        "of O(|seen|)); 1 = full every round (default: 8)",
    )
    p.add_argument(
        "--max-frontier-per-host",
        type=int,
        default=None,
        help="frontier growth control: keep at most N urls per host in "
        "each round's new frontier (best-first; drops urls, so replay-"
        "exact ordering applies only without it)",
    )
    p.add_argument(
        "--gc-keep",
        type=int,
        default=None,
        help="after the crawl, delete all but the newest N committed "
        "snapshot rounds (full state per round — older rounds only buy "
        "point-in-time rollback)",
    )
    p.add_argument(
        "--compact-snapshots",
        action="store_true",
        help="with --gc-keep: first rewrite the newest round as a full "
        "seen checkpoint (state.compact_snapshot) so a run that ended "
        "mid-delta-chain does not pin its ancestor rounds",
    )
    p.add_argument("--out", default=None, help="extracted-text sink path")
    p.add_argument(
        "--url-filter",
        action="store_true",
        help="drop trap/junk urls (session ids, calendar traps, binary "
        "extensions, path loops, length/depth/param limits) before they "
        "enter the frontier",
    )
    p.add_argument(
        "--blocklist",
        default=None,
        help="host blocklist (text file, one host suffix per line); "
        "matching hosts and their subdomains never enter the frontier",
    )
    p.add_argument(
        "--quality-feedback",
        action="store_true",
        help="quality-directed crawling: per-host reputation from each "
        "round's extracted text scales the next round's politeness "
        "budgets (changes fetch ordering — off by default)",
    )
    p.add_argument(
        "--frontier-split",
        action="store_true",
        help="dedup the frontier update via a broadcast split on the "
        "bounded fresh-key set instead of a full-frontier window — the "
        "frontier is scanned, never shuffled (turn on when the frontier "
        "dwarfs one round's links, i.e. large-cluster scale; results "
        "identical either way)",
    )
    p.add_argument(
        "--no-sliver-broadcast",
        action="store_true",
        help="exact-recheck the filter's maybe-seen sliver with a plain "
        "anti-join (shuffles the full seen table) instead of the default "
        "broadcast-flip (seen scanned, never shuffled); use when the "
        "per-round sliver exceeds broadcast size AND seen has a bucketed "
        "layout (results identical either way)",
    )
    p.add_argument(
        "--persist-mode",
        default=None,
        choices=["checkpoint", "disk"],
        help="intra-round materialization: localCheckpoint (local mode) or "
        "reliable checkpoint to CRAWLSPARK_CKPT_DIR (cluster-grade)",
    )
    return p.parse_args(argv)


def main(argv: list[str]) -> int:
    args = parse_args(argv)
    if args.discover_sitemaps and not (args.robots_txt or args.robots_from_pages):
        print("--discover-sitemaps requires --robots-txt or --robots-from-pages", file=sys.stderr)
        return 2

    from pyspark.sql import functions as F

    from crawlspark import config, crawl, io
    from crawlspark.schemas import ROBOTS_SCHEMA
    from crawlspark.session import get_spark

    spark = get_spark("crawlspark", master=None)
    pages = io.read_pages(
        spark, args.pages, fmt=args.pages_format, warc_split_mb=args.warc_split_mb
    )
    seeds = io.read_seeds(spark, args.seeds)
    if args.robots_txt or args.robots_from_pages:
        from crawlspark import polite

        if args.robots_from_pages:
            raw = polite.robots_raw_from_pages(pages)
        else:
            raw = spark.read.parquet(args.robots_txt)
        robots = polite.robots_from_text(raw, agent=args.agent)
        if args.discover_sitemaps:
            found = io.discover_seeds_from_robots(raw, pages).select("url")
            n_found = found.count()
            seeds = seeds.unionByName(found).distinct()
            print(f"sitemap discovery: {n_found} urls added to seeds")
    elif args.robots:
        with open(args.robots) as f:
            robots_rows = json.load(f)
        robots = spark.createDataFrame(robots_rows, ROBOTS_SCHEMA)
    else:
        robots = spark.createDataFrame([], ROBOTS_SCHEMA)

    kw = {}
    if args.n_buckets:
        kw["n_buckets"] = args.n_buckets
    if args.salt:
        kw["salt"] = args.salt
    if args.persist_mode:
        kw["persist_mode"] = args.persist_mode
    if args.max_frontier_per_host:
        kw["max_frontier_per_host"] = args.max_frontier_per_host
    if args.filter_kind:
        kw["filter_kind"] = args.filter_kind
    # `is not None`, not truthiness: 0 (and 1) mean "full checkpoint every
    # round" (CrawlConfig treats <= 1 as disabling the delta cadence) and
    # must not silently fall back to the default cadence
    if args.seen_checkpoint_every is not None:
        kw["seen_checkpoint_every"] = args.seen_checkpoint_every
    if args.no_sliver_broadcast:
        kw["sliver_broadcast"] = False
    if args.frontier_split:
        kw["frontier_split"] = True
    cfg = config.CrawlConfig(
        rounds=args.rounds,
        round_seconds=args.round_seconds,
        max_depth=args.max_depth,
        **kw,
    )
    blocklist = None
    if args.blocklist:
        blocklist = (
            spark.read.text(args.blocklist)
            .select(F.trim(F.col("value")).alias("host_suffix"))
            .filter(F.col("host_suffix") != "")
        )
    result = crawl.crawl(
        spark,
        seeds,
        pages,
        robots,
        cfg=cfg,
        snapshot_root=args.snapshot_root,
        run_id=args.run_id,
        resume=args.resume,
        url_filter=args.url_filter,
        blocklist=blocklist,
        quality_feedback=args.quality_feedback,
    )
    n = result["fetch_log"].count()
    print(f"crawl {result['run_id']}: {result['rounds_run']} rounds, {n} urls fetched")
    if args.gc_keep and args.snapshot_root:
        from crawlspark import state

        if args.compact_snapshots:
            # a run ending mid-chain pins its ancestors; rewrite the newest
            # round as a full checkpoint first so gc can actually shrink
            r = state.compact_snapshot(spark, args.snapshot_root, result["run_id"])
            print(f"snapshot compact: round {r} is now a full checkpoint")
        deleted = state.gc_snapshots(args.snapshot_root, result["run_id"], args.gc_keep)
        print(f"snapshot gc: removed rounds {deleted}, kept newest {args.gc_keep}")
    if args.out:
        io.write_text(result["extracted"], args.out)
        print(f"extracted text written to {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
