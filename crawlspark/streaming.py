"""Structured Streaming generalization (SURVEY.md §2 S1-S4).

The reference loop is synchronous batch rounds, and the engine's primary
mode is the deterministic batch round loop (crawl.py) — streaming here is
the optional continuous-ingest generalization: a stream of newly-crawled
pages flows through watermarked windowed metrics, session windows for
burst detection, and two stateful seen-set maintainers:

* ``incremental_seen_update`` (foreachBatch): LSM-style **bucketed delta
  appends + versioned compaction**.  Each micro-batch writes only its own
  distinct hashes — O(|batch|) I/O — and every ``compact_every`` batches
  the base is rewritten once and promoted by an ATOMIC pointer flip
  (``os.replace``), so a crash at any point leaves either the old or the
  new committed view, never a missing table (round-1 ADVICE: the previous
  rmtree+move rewrite was O(|seen|) per batch and could lose the whole
  set).  This is the object-store-friendly cluster path (same layout an
  Iceberg table maintains natively via append + rewrite_data_files).
* ``stateful_seen_stream`` (transformWithStateInPandas): the streaming-
  native path — per-key ValueState dedup in the state store; emits each
  url_hash exactly once across the stream's lifetime.  NOTE: this sandbox
  ships no ``protobuf`` package, which Spark's TWS state-server protocol
  requires (``transform_with_state_driver_worker`` fails with
  ``ImportError: google.protobuf``), so the code follows the public API but
  can only execute on a cluster with protobuf installed — the pytest skips
  with that reason, and the foreachBatch delta path above is the primary.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import config, urlnorm
from .schemas import SEEN_SCHEMA

POINTER = "_pointer.json"


def read_page_stream(
    spark, path: str, schema=None, max_files_per_trigger: int = 8
) -> DataFrame:
    """S1: file-source stream of page rows (new parquet files = new pages).

    On a cluster this is typically Kafka or an Iceberg incremental read;
    the file source keeps the same downstream plan.
    """
    from .schemas import PAGES_SCHEMA

    return (
        spark.readStream.schema(schema or PAGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
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


# ---------------------------------------------------------------- seen deltas

def _read_pointer(root: str) -> dict:
    p = os.path.join(root, POINTER)
    if not os.path.exists(p):
        return {"base_version": None, "absorbed": []}
    with open(p) as f:
        return json.load(f)


def _write_pointer(root: str, ptr: dict) -> None:
    """Atomic promote: the pointer file IS the commit point."""
    tmp = os.path.join(root, POINTER + ".tmp")
    with open(tmp, "w") as f:
        json.dump(ptr, f, indent=1, sort_keys=True)
    os.replace(tmp, os.path.join(root, POINTER))


def _complete(d: str) -> bool:
    return os.path.exists(os.path.join(d, "_SUCCESS"))


def _pending_deltas(root: str, absorbed: set[int]) -> list[tuple[int, str]]:
    """(batch_id, dir) of committed delta dirs not yet folded into the base."""
    delta_root = os.path.join(root, "delta")
    out = []
    if os.path.isdir(delta_root):
        for name in os.listdir(delta_root):
            if not name.startswith("batch="):
                continue
            bid = int(name.split("=", 1)[1])
            d = os.path.join(delta_root, name)
            if bid not in absorbed and _complete(d):
                out.append((bid, d))
    return sorted(out)


def seen_view(spark, root: str) -> DataFrame:
    """The committed seen set: current base ∪ unabsorbed deltas.

    Rows may repeat across deltas (membership semantics are idempotent —
    the anti-join in dedup.unseen is unaffected); compaction restores
    distinctness.
    """
    ptr = _read_pointer(root)
    parts = []
    if ptr["base_version"] is not None:
        base = os.path.join(root, "base", f"v={ptr['base_version']}")
        if _complete(base):
            parts.append(base)
    parts += [d for _, d in _pending_deltas(root, set(ptr["absorbed"]))]
    if not parts:
        return spark.createDataFrame([], SEEN_SCHEMA)
    return spark.read.schema(SEEN_SCHEMA).parquet(*parts)


def compact_seen(spark, root: str, n_buckets: int) -> None:
    """Fold base + deltas into a new distinct bucketed base version and
    promote it atomically; GC superseded dirs afterwards (crash-safe: the
    absorbed list in the pointer covers a GC that never ran)."""
    ptr = _read_pointer(root)
    pending = _pending_deltas(root, set(ptr["absorbed"]))
    if not pending:
        return
    new_v = (ptr["base_version"] or 0) + 1
    new_base = os.path.join(root, "base", f"v={new_v}")
    (
        seen_view(spark, root)
        .dropDuplicates(["url_hash"])
        .repartition(n_buckets, "bucket")
        .write.mode("overwrite")
        .parquet(new_base)
    )
    old_v = ptr["base_version"]
    # keep only absorbed ids whose dirs still exist (bounds the list)
    absorbed = [
        b
        for b in set(ptr["absorbed"]) | {b for b, _ in pending}
        if os.path.isdir(os.path.join(root, "delta", f"batch={b}"))
    ]
    _write_pointer(root, {"base_version": new_v, "absorbed": sorted(absorbed)})
    # GC (post-commit; safe to crash anywhere in here)
    for b, d in pending:
        shutil.rmtree(d, ignore_errors=True)
    if old_v is not None:
        shutil.rmtree(os.path.join(root, "base", f"v={old_v}"), ignore_errors=True)


def incremental_seen_update(
    page_stream: DataFrame,
    seen_root: str,
    checkpoint_dir: str,
    n_buckets: int = config.N_BUCKETS,
    compact_every: int = 8,
):
    """S3: stateful seen-set maintenance via foreachBatch + delta appends.

    Per micro-batch: canonicalize → hash → bucket → write ONLY this batch's
    distinct hashes to ``delta/batch=<id>`` (overwrite → a foreachBatch
    retry of the same batch id is idempotent).  Every ``compact_every``
    unabsorbed deltas, compact into a new base version and flip the pointer
    atomically.  Micro-batch cost is O(|batch|); compaction is the usual
    amortized LSM rewrite.
    """

    def _update(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        new = (
            batch_df.select(
                urlnorm.url_hash(urlnorm.canonicalize(F.col("url"))).alias("url_hash")
            )
            .dropDuplicates(["url_hash"])
            .withColumn("bucket", urlnorm.bucket(F.col("url_hash"), n_buckets))
        )
        delta = os.path.join(seen_root, "delta", f"batch={batch_id}")
        new.write.mode("overwrite").parquet(delta)
        ptr = _read_pointer(seen_root)
        if len(_pending_deltas(seen_root, set(ptr["absorbed"]))) >= compact_every:
            compact_seen(spark, seen_root, n_buckets)

    return (
        page_stream.writeStream.foreachBatch(_update)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )


def stateful_seen_apply(
    page_stream: DataFrame, n_buckets: int = config.N_BUCKETS
) -> DataFrame:
    """S3 (streaming-native, runnable here): first-sighting dedup via
    ``applyInPandasWithState`` — per-key GroupState in the state store, so
    each micro-batch costs O(|batch|) state lookups and each url_hash is
    emitted exactly once across the stream's lifetime.

    Unlike ``transformWithStateInPandas`` (below), this older stateful API
    carries its state through Arrow + the regular python worker protocol —
    no protobuf state-server — so it executes in this sandbox and is the
    verified streaming-native path; TWS remains the forward-looking twin.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    buckets = int(n_buckets)

    def _first_seen(key, pdf_iter, state: GroupState):
        if not state.exists:
            state.update((True,))
            h = int(key[0])
            yield pd.DataFrame({"url_hash": [h], "bucket": [h % buckets]})

    hashed = page_stream.select(
        urlnorm.url_hash(urlnorm.canonicalize(F.col("url"))).alias("url_hash")
    )
    return hashed.groupBy("url_hash").applyInPandasWithState(
        _first_seen,
        outputStructType="url_hash long, bucket int",
        stateStructType="flag boolean",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ------------------------------------------------- transformWithState dedup

def stateful_seen_stream(
    page_stream: DataFrame, n_buckets: int = config.N_BUCKETS
) -> DataFrame:
    """S3 (streaming-native): per-key ValueState dedup — each url_hash is
    emitted exactly once across the stream's lifetime; later sightings hit
    the existing state row and produce nothing.  State lives in the
    (RocksDB) state store, so cost per batch is O(|batch|) state lookups,
    never a scan of the accumulated set.
    """
    import pandas as pd
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    buckets = int(n_buckets)

    class FirstSeen(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._seen = handle.getValueState("seen", "flag boolean")

        def handleInputRows(self, key, rows, timerValues):
            if self._seen.exists():
                return
            self._seen.update((True,))
            h = int(key[0])
            yield pd.DataFrame({"url_hash": [h], "bucket": [h % buckets]})

        def close(self) -> None:
            pass

    hashed = page_stream.select(
        urlnorm.url_hash(urlnorm.canonicalize(F.col("url"))).alias("url_hash")
    )
    return hashed.groupBy("url_hash").transformWithStateInPandas(
        FirstSeen(),
        outputStructType="url_hash long, bucket int",
        outputMode="append",
        timeMode="none",
    )
