from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import gen_pages as gp
from crawlspark import fetch
from crawlspark.schemas import PAGES_SCHEMA


@pytest.fixture(scope="module")
def pages(spark):
    return spark.createDataFrame(gp.gen_pages_local(300), PAGES_SCHEMA).cache()


def test_latest_at_picks_newest(spark, pages):
    latest = fetch.latest_at(pages)
    assert latest.count() == pages.select("url").distinct().count()
    want = {
        r["url"]: r["mx"]
        for r in pages.groupBy("url").agg(F.max("warc_ts").alias("mx")).collect()
    }
    for r in latest.select("url", "warc_ts").collect():
        assert r["warc_ts"] == want[r["url"]]


def test_latest_at_cutoff(spark, pages):
    cutoff = pages.agg(F.min("warc_ts")).first()[0]
    latest = fetch.latest_at(pages, F.lit(cutoff))
    # only captures at/before the global min timestamp survive
    assert latest.filter(F.col("warc_ts") > cutoff).count() == 0


def test_lookup_latest_equiv_and_misses(spark, pages):
    urls = [r["url"] for r in pages.select("url").distinct().limit(40).collect()]
    sched_rows = [(u, f"h", 0, 1.0, 0.0) for u in urls] + [
        ("https://missing.example/x", "h", 0, 1.0, 0.0)
    ]
    scheduled = spark.createDataFrame(
        sched_rows, "url string, host string, depth int, crawl_delay double, sched_ts double"
    )
    keys = fetch.latest_keys(pages)
    out = fetch.lookup_latest(scheduled, pages, keys)
    rows = {r["url"]: r for r in out.collect()}
    assert len(rows) == 41
    assert rows["https://missing.example/x"]["html"] is None
    # html matches the latest_at pick byte-for-byte
    golden = {
        r["url"]: bytes(r["html"])
        for r in fetch.latest_at(pages).filter(F.col("url").isin(urls)).collect()
    }
    for u in urls:
        assert bytes(rows[u]["html"]) == golden[u]


def test_present_semi(spark, pages):
    seeds = spark.createDataFrame(
        [(gp.url_of(0),), ("https://nope.example/",)], "url string"
    )
    hits = fetch.present(seeds, pages.select("url").distinct())
    assert [r["url"] for r in hits.collect()] == [gp.url_of(0)]


def test_in_window_range_join(spark):
    events = spark.createDataFrame(
        [("h", 5.0), ("h", 15.0), ("h", 25.0), ("g", 5.0)], "host string, ts double"
    )
    slots = spark.createDataFrame(
        [("h", 0.0, 10.0), ("h", 20.0, 30.0)], "host string, lo double, hi double"
    )
    out = fetch.in_window(events, slots, ["host"], "lo", "hi", "ts").collect()
    got = sorted((r["host"], r["ts"], r["lo"]) for r in out)
    assert got == [("h", 5.0, 0.0), ("h", 25.0, 20.0)]
