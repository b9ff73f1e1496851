from __future__ import annotations

import os

import pytest

from crawlspark import streaming
from crawlspark.schemas import PAGES_SCHEMA

import gen_pages as gp


@pytest.fixture()
def page_dir(spark, tmp_path):
    rows = gp.gen_pages_local(120)
    df = spark.createDataFrame(rows, PAGES_SCHEMA)
    out = str(tmp_path / "pages_stream")
    df.write.mode("overwrite").parquet(out)
    return out


def test_windowed_metrics_stream(spark, page_dir, tmp_path):
    stream = streaming.read_page_stream(spark, page_dir)
    assert stream.isStreaming
    agg = streaming.windowed_metrics(stream, window="6 hours")
    q = (
        agg.writeStream.format("memory")
        .queryName("win_metrics")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt1"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select * from win_metrics").collect()
    assert len(rows) > 0
    assert {r["lang"] for r in rows} <= {"en", "fr", "es", "zh", "de"}
    assert all(r["n_pages"] > 0 for r in rows)


def test_session_bursts_stream(spark, page_dir, tmp_path):
    stream = streaming.read_page_stream(spark, page_dir)
    agg = streaming.session_bursts(stream, gap="2 hours")
    q = (
        agg.writeStream.format("memory")
        .queryName("bursts")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select * from bursts").collect()
    assert len(rows) > 0
    assert any(r["host"] == "host0.example" for r in rows)


def test_incremental_seen_update(spark, page_dir, tmp_path):
    seen_path = str(tmp_path / "seen")
    stream = streaming.read_page_stream(spark, page_dir)
    q = streaming.incremental_seen_update(
        stream, seen_path, str(tmp_path / "ckpt3"), n_buckets=8
    ).start()
    q.awaitTermination(120)
    seen = spark.read.parquet(seen_path)
    n_urls = spark.read.parquet(page_dir).select("url").distinct().count()
    assert seen.count() == n_urls
    assert seen.select("bucket").distinct().count() <= 8
