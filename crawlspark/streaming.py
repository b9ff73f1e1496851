"""Structured Streaming generalization (SURVEY.md §2 S1-S4).

The reference loop is synchronous batch rounds, and the engine's primary
mode is the deterministic batch round loop (crawl.py) — streaming here is
the optional continuous-ingest generalization: a stream of newly-crawled
pages flows through watermarked windowed metrics, session windows for
burst detection, and a foreachBatch incremental frontier update that reuses
the exact batch-round operators (so semantics stay identical to crawl.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import config, dedup, urlnorm


def read_page_stream(spark, path: str, schema=None) -> DataFrame:
    """S1: file-source stream of page rows (new parquet files = new pages).

    On a cluster this is typically Kafka or an Iceberg incremental read;
    the file source keeps the same downstream plan.
    """
    from .schemas import PAGES_SCHEMA

    return (
        spark.readStream.schema(schema or PAGES_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(path)
    )


def windowed_metrics(page_stream: DataFrame, window: str = "1 hour", watermark: str = "10 minutes") -> DataFrame:
    """S2: watermarked tumbling-window fetch metrics per lang."""
    return (
        page_stream.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("w"), "lang")
        .agg(
            F.count(F.lit(1)).alias("n_pages"),
            F.sum(F.length("text")).alias("n_chars"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "lang",
            "n_pages",
            "n_chars",
        )
    )


def session_bursts(page_stream: DataFrame, gap: str = "30 minutes", watermark: str = "10 minutes") -> DataFrame:
    """S4: session windows per host — detects crawl bursts (politeness
    audit on the ingest side)."""
    hosts = page_stream.select(
        urlnorm.host(F.col("url")).alias("host"), "warc_ts"
    )
    return (
        hosts.withWatermark("warc_ts", watermark)
        .groupBy(F.session_window("warc_ts", gap).alias("s"), "host")
        .agg(F.count(F.lit(1)).alias("n_fetches"))
        .select(
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "host",
            "n_fetches",
        )
    )


def incremental_seen_update(
    page_stream: DataFrame,
    seen_path: str,
    checkpoint_dir: str,
    n_buckets: int = config.N_BUCKETS,
):
    """S3: stateful seen-set maintenance via foreachBatch.

    Rather than a custom state store, each micro-batch reuses the exact
    batch operators (canonicalize → hash → bucket → absorb) and commits the
    union back to the bucketed seen table — identical semantics to the
    batch round loop, which is what makes the streaming mode an optional
    add-on instead of a second implementation.
    """

    def _update(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        new = batch_df.select(
            urlnorm.url_hash(urlnorm.canonicalize(F.col("url"))).alias("url_hash")
        )
        try:
            seen = spark.read.parquet(seen_path)
        except Exception:
            seen = spark.createDataFrame([], "url_hash long, bucket int")
        updated = dedup.absorb(seen, new, n_buckets)
        updated.write.mode("overwrite").parquet(seen_path + ".tmp")
        import shutil

        shutil.rmtree(seen_path, ignore_errors=True)
        shutil.move(seen_path + ".tmp", seen_path)

    return (
        page_stream.writeStream.foreachBatch(_update)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )
