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
    seen_root = str(tmp_path / "seen")
    # 1 file per trigger => one delta per file => compaction exercises
    stream = streaming.read_page_stream(spark, page_dir, max_files_per_trigger=1)
    q = streaming.incremental_seen_update(
        stream, seen_root, str(tmp_path / "ckpt3"), n_buckets=8, compact_every=2
    ).start()
    q.awaitTermination(120)
    seen = streaming.seen_view(spark, seen_root)
    n_urls = (
        spark.read.parquet(page_dir)
        .select("url")
        .distinct()
        .count()
    )
    # deltas may repeat hashes across batches; membership set must be exact
    assert seen.select("url_hash").distinct().count() == n_urls
    assert seen.select("bucket").distinct().count() <= 8
    # compact_every=2 over >=2 batches must have produced a committed base
    ptr = streaming._read_pointer(seen_root)
    assert ptr["base_version"] is not None


def test_seen_compaction_crash_safe(spark, page_dir, tmp_path):
    """A compacted view equals the pre-compaction view, and a torn base
    write (no _SUCCESS / pointer not flipped) never changes the view."""
    import os
    import shutil

    seen_root = str(tmp_path / "seen2")
    stream = streaming.read_page_stream(spark, page_dir)
    q = streaming.incremental_seen_update(
        stream, seen_root, str(tmp_path / "ckpt4"), n_buckets=8, compact_every=10_000
    ).start()
    q.awaitTermination(120)
    before = {r["url_hash"] for r in streaming.seen_view(spark, seen_root).collect()}
    assert before

    # simulate a compaction that crashed mid-base-write: partial dir, old pointer
    ptr = streaming._read_pointer(seen_root)
    torn = os.path.join(seen_root, "base", f"v={(ptr['base_version'] or 0) + 1}")
    os.makedirs(torn, exist_ok=True)
    open(os.path.join(torn, "part-junk.parquet"), "wb").write(b"not parquet")
    after_torn = {r["url_hash"] for r in streaming.seen_view(spark, seen_root).collect()}
    assert after_torn == before
    shutil.rmtree(torn)

    # real compaction preserves the membership set exactly and dedups
    streaming.compact_seen(spark, seen_root, n_buckets=8)
    after = streaming.seen_view(spark, seen_root)
    assert {r["url_hash"] for r in after.collect()} == before
    assert after.count() == after.select("url_hash").distinct().count()


def test_stateful_seen_stream(spark, page_dir, tmp_path):
    """transformWithStateInPandas dedup: each url_hash emitted exactly once
    even when the same pages flow through twice."""
    import pytest as _pytest

    double_dir = str(tmp_path / "pages_double")
    pages = spark.read.parquet(page_dir)
    pages.write.mode("overwrite").parquet(double_dir)
    pages.write.mode("append").parquet(double_dir)

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = streaming.read_page_stream(spark, double_dir)
        out = streaming.stateful_seen_stream(stream, n_buckets=8)
        q = (
            out.writeStream.format("memory")
            .queryName("tws_seen")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt5"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        rows = spark.sql("select * from tws_seen").collect()
    except Exception as e:  # pragma: no cover - env-dependent state store
        _pytest.skip(f"transformWithStateInPandas unavailable: {e}")
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    n_urls = pages.select("url").distinct().count()
    hashes = [r["url_hash"] for r in rows]
    assert len(hashes) == len(set(hashes)) == n_urls
    assert all(0 <= r["bucket"] < 8 for r in rows)


def test_stateful_seen_apply(spark, page_dir, tmp_path):
    """applyInPandasWithState dedup (no skip — runs in this sandbox): each
    url_hash emitted exactly once even when the same pages flow twice."""
    double_dir = str(tmp_path / "pages_double2")
    pages = spark.read.parquet(page_dir)
    pages.write.mode("overwrite").parquet(double_dir)
    pages.write.mode("append").parquet(double_dir)

    stream = streaming.read_page_stream(spark, double_dir, max_files_per_trigger=1)
    out = streaming.stateful_seen_apply(stream, n_buckets=8)
    q = (
        out.writeStream.format("memory")
        .queryName("apply_seen")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt6"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = spark.sql("select * from apply_seen").collect()
    n_urls = pages.select("url").distinct().count()
    hashes = [r["url_hash"] for r in rows]
    assert len(hashes) == len(set(hashes)) == n_urls
    assert all(0 <= r["bucket"] < 8 for r in rows)


def test_read_cdx_stream_incremental_shards(spark, tmp_path):
    """New CDXJ shards landing in the directory are parsed incrementally;
    each shard is processed exactly once (file-source checkpointing)."""
    from crawlspark import io as cio

    src = tmp_path / "cdx"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")

    def shard(name, keys):
        (src / name).write_text(
            "\n".join(
                f'{k} 20260101000000 {{"url": "https://{k.split(")")[0].replace(",", ".")}/", '
                f'"status": "200", "filename": "f"}}'
                for k in keys
            )
            + "\n"
        )

    out = str(tmp_path / "out")

    def drain():
        q = (
            cio.read_cdx_stream(spark, str(src))
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return [r["urlkey"] for r in spark.read.parquet(out).collect()]

    shard("a.cdxj", ["com,one)/", "com,two)/"])
    assert sorted(drain()) == ["com,one)/", "com,two)/"]
    shard("b.cdxj", ["org,three)/"])
    got = drain()
    # restart picks up only the NEW shard (checkpointed file tracking):
    # three rows total, each urlkey exactly once
    assert sorted(got) == ["com,one)/", "com,two)/", "org,three)/"]
