"""Fetch = join against the pre-crawled pages table (SURVEY.md §2 D1-D6).

The reference's "fetch" is a batched HTTP GET (``efetch.fcgi?id=i1,i2,…``);
at Common-Crawl scale pages are pre-crawled into an Iceberg/Parquet table,
so fetching is an equi-join on url.  AQE sizes the join (broadcast if the
scheduled batch is small, sort-merge otherwise; skew splitting enabled in
session.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def lookup(scheduled: DataFrame, pages: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """D1: inner fetch join.  Project the fat ``html`` column only here —
    never let it travel through upstream shuffles (SURVEY.md §4 pruning)."""
    cols = columns or ["url", "warc_ts", "html", "lang"]
    return scheduled.join(pages.select(*cols), "url", "inner")


def lookup_outer(scheduled: DataFrame, pages: DataFrame) -> DataFrame:
    """D3: left-outer fetch — unmatched rows are fetch-misses (the
    reference's HTTP-404 branch) and feed miss metrics."""
    return scheduled.join(
        pages.select("url", "warc_ts", "html", "lang"), "url", "left_outer"
    ).withColumn("fetch_miss", F.col("warc_ts").isNull())


def present(seeds: DataFrame, pages: DataFrame) -> DataFrame:
    """D4: semi-join — which seeds already exist in the corpus."""
    return seeds.join(pages, "url", "left_semi")


def latest_at(pages: DataFrame, cutoff: Column | str | None = None) -> DataFrame:
    """D5: as-of — latest capture per url at/before ``cutoff``.

    Common-Crawl keeps 1-3 ``warc_ts`` captures per url; the engine fetches
    the newest visible one.  Window + row_number (Spark has no native as-of
    join); url partitioning means no extra shuffle after a url-bucketed scan.
    """
    df = pages
    if cutoff is not None:
        cutoff_col = F.lit(cutoff) if isinstance(cutoff, str) else cutoff
        df = df.filter(F.col("warc_ts") <= cutoff_col)
    w = Window.partitionBy("url").orderBy(F.desc("warc_ts"))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def in_window(events: DataFrame, slots: DataFrame, keys: list[str], lo: str, hi: str, ts: str) -> DataFrame:
    """D6: range/interval join — event ts within a slot's [lo, hi) window,
    equi on ``keys`` first so Spark plans a hash/SMJ join with a range
    residual instead of a nested-loop cross product."""
    cond = [events[k] == slots[k] for k in keys]
    cond.append(events[ts] >= slots[lo])
    cond.append(events[ts] < slots[hi])
    return events.join(slots, cond, "inner")
