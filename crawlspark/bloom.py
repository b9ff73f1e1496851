"""Partitioned Bloom-filter URL-seen sidecar (SURVEY.md §2 C3, J3).

Required verbatim by BASELINE.json north_star: "a partitioned Bloom/cuckoo-
filter URL-seen set built with vectorized Arrow UDFs over canonicalized URL
hashes".  PySpark exposes no public DataFrame bloom API, so this is a
first-class engine operator:

* **build**: ``seen.groupBy(bucket).applyInPandas`` → one row per bucket
  ``(bucket, bitset: binary, n_items, version)``.  Bucket count is sized so
  one bucket's hashes fit a Python worker (10^10 urls / 4096 buckets ≈ 2.4M
  int64 ≈ 20 MB); bit positions are computed with numpy (Arrow-vectorized,
  no per-row Python).
* **probe**: frontier repartitioned by bucket → ``mapInArrow``; each task
  lazily loads only the bucket bitsets it touches from the sidecar parquet
  (partition-pruned read), so nothing is broadcast and nothing is joined —
  at 10^10 scale the ~12 GB sidecar never moves through a shuffle.

Invariant (property-tested): **no false negatives** — every hash inserted at
build time probes positive.  False positives are removed by the exact
anti-join (dedup.unseen) that always follows.
"""

from __future__ import annotations

import glob
import os

import numpy as np
import pyarrow as pa

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import config
from .schemas import BLOOM_SCHEMA

_MULT = np.uint64(0xFF51AFD7ED558CCD)  # murmur3 fmix64 constant
_ONE = np.uint64(1)


def _bitset_size_bits(n_items: int) -> int:
    """Power-of-two bit count ≈ n_items * BITS_PER_KEY (mask, not mod)."""
    target = max(config.BLOOM_MIN_BITS, n_items * config.BLOOM_BITS_PER_KEY)
    return 1 << int(target - 1).bit_length()


def _positions(hashes: np.ndarray, m_bits: int) -> np.ndarray:
    """(k, n) bit positions via double hashing; all-numpy, wrap-on-overflow."""
    h1 = hashes.astype(np.int64).view(np.uint64)
    h2 = (h1 ^ (h1 >> np.uint64(33))) * _MULT
    h2 = h2 | _ONE  # odd stride
    mask = np.uint64(m_bits - 1)
    ks = np.arange(config.BLOOM_NUM_HASHES, dtype=np.uint64)[:, None]
    return ((h1[None, :] + ks * h2[None, :]) & mask).astype(np.int64)


def _build_bitset(hashes: np.ndarray) -> bytes:
    m_bits = _bitset_size_bits(len(hashes))
    arr = np.zeros(m_bits // 8, dtype=np.uint8)
    if len(hashes):
        pos = _positions(hashes, m_bits).ravel()
        np.bitwise_or.at(arr, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8))
    return arr.tobytes()


def _probe_bitset(hashes: np.ndarray, bitset: bytes) -> np.ndarray:
    """Boolean membership mask for each hash."""
    if len(hashes) == 0:
        return np.zeros(0, dtype=bool)
    arr = np.frombuffer(bitset, dtype=np.uint8)
    m_bits = len(arr) * 8
    pos = _positions(hashes, m_bits)  # (k, n)
    bits = (arr[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
    return bits.all(axis=0)


def build(seen: DataFrame) -> DataFrame:
    """Build the per-bucket sidecar from a seen table (url_hash, bucket)."""
    import pandas as pd  # local import: runs inside executors too

    def _one_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        hashes = pdf["url_hash"].to_numpy(dtype=np.int64)
        return pd.DataFrame(
            {
                "bucket": [int(pdf["bucket"].iloc[0])],
                "bitset": [_build_bitset(hashes)],
                "n_items": [len(hashes)],
                "version": [config.BLOOM_VERSION],
            }
        )

    return seen.groupBy("bucket").applyInPandas(_one_bucket, BLOOM_SCHEMA)


def write_sidecar(bloom_df: DataFrame, path: str) -> None:
    """Persist the sidecar partitioned by bucket → per-bucket pruned reads."""
    bloom_df.write.mode("overwrite").partitionBy("bucket").parquet(path)


def _load_bucket_bitset(sidecar_path: str, bucket: int) -> bytes | None:
    """Read one bucket's bitset directly (partition-pruned, no Spark job).

    Local filesystem + pyarrow here; on a cluster the same layout is read
    through the storage filesystem (s3/hdfs via pyarrow.fs) — only this
    function changes.
    """
    import pyarrow.parquet as pq

    part_dir = os.path.join(sidecar_path, f"bucket={bucket}")
    files = sorted(glob.glob(os.path.join(part_dir, "*.parquet")))
    if not files:
        return None
    tbl = pq.read_table(files[0], columns=["bitset"])
    if tbl.num_rows == 0:
        return None
    return tbl.column("bitset")[0].as_py()


def probe(frontier: DataFrame, sidecar_path: str, keep_maybe_seen: bool = False) -> DataFrame:
    """Filter frontier rows to those NOT (probably) in the seen set.

    Repartitions by bucket so each mapInArrow task touches few buckets and
    loads each bitset once (cached per task).  Rows whose bucket has no
    sidecar entry are trivially unseen.
    """
    def _probe_batches(batches):
        cache: dict[int, bytes | None] = {}
        for batch in batches:
            if batch.num_rows == 0:
                continue
            hashes = batch.column("url_hash").to_numpy(zero_copy_only=False).astype(np.int64)
            buckets = batch.column("bucket").to_numpy(zero_copy_only=False).astype(np.int64)
            maybe_seen = np.zeros(batch.num_rows, dtype=bool)
            for b in np.unique(buckets):
                key = int(b)
                if key not in cache:
                    cache[key] = _load_bucket_bitset(sidecar_path, key)
                bs = cache[key]
                if bs is None:
                    continue
                sel = buckets == b
                maybe_seen[sel] = _probe_bitset(hashes[sel], bs)
            if keep_maybe_seen:
                yield pa.RecordBatch.from_arrays(
                    list(batch.columns) + [pa.array(maybe_seen)],
                    names=list(batch.schema.names) + ["maybe_seen"],
                )
            else:
                # arrow-native filter keeps the input schema byte-exact
                yield batch.filter(pa.array(~maybe_seen))

    schema = frontier.schema
    if keep_maybe_seen:
        from pyspark.sql.types import BooleanType, StructField, StructType

        schema = StructType(list(schema.fields) + [StructField("maybe_seen", BooleanType(), False)])

    n_parts = max(frontier.sparkSession.sparkContext.defaultParallelism, 8)
    return (
        frontier.repartition(n_parts, "bucket")
        .mapInArrow(_probe_batches, schema)
    )
