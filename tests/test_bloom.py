from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from crawlspark import bloom


@given(st.lists(st.integers(min_value=-(2**63), max_value=2**63 - 1), max_size=500))
@settings(max_examples=100, deadline=None)
def test_no_false_negatives(hashes):
    arr = np.array(hashes, dtype=np.int64)
    bs = bloom._build_bitset(arr)
    if len(arr):
        assert bloom._probe_bitset(arr, bs).all()


def test_false_positive_rate_reasonable():
    rng = np.random.default_rng(42)
    inserted = rng.integers(-(2**63), 2**63 - 1, size=50_000, dtype=np.int64)
    bs = bloom._build_bitset(inserted)
    probes = rng.integers(-(2**63), 2**63 - 1, size=50_000, dtype=np.int64)
    fresh = np.setdiff1d(probes, inserted)
    fp = bloom._probe_bitset(fresh, bs).mean()
    assert fp < 0.05, f"false-positive rate {fp:.4f} too high"


def test_empty_bitset_probe():
    bs = bloom._build_bitset(np.array([], dtype=np.int64))
    assert not bloom._probe_bitset(np.array([1, 2, 3], dtype=np.int64), bs).any()


@pytest.fixture(scope="module")
def seen_df(spark):
    from pyspark.sql import functions as F

    from crawlspark import urlnorm

    df = spark.range(2000).select(
        F.xxhash64(F.concat(F.lit("u"), F.col("id"))).alias("url_hash")
    )
    return df.withColumn("bucket", urlnorm.bucket(F.col("url_hash"), 16))


def test_build_and_probe_roundtrip(spark, seen_df, tmp_path):
    from pyspark.sql import functions as F

    from crawlspark import urlnorm

    sidecar = str(tmp_path / "bloom")
    bdf = bloom.build(seen_df)
    rows = bdf.collect()
    assert {r["bucket"] for r in rows} == set(
        r["bucket"] for r in seen_df.select("bucket").distinct().collect()
    )
    assert all(r["n_items"] > 0 for r in rows)
    bloom.write_sidecar(bdf, sidecar)

    # frontier: half seen, half fresh
    frontier = (
        spark.range(4000)
        .select(F.concat(F.lit("u"), F.col("id")).alias("name"))
        .select(F.xxhash64(F.col("name")).alias("url_hash"))
        .withColumn("bucket", urlnorm.bucket(F.col("url_hash"), 16))
    )
    probed = bloom.probe(frontier, sidecar, keep_maybe_seen=True)
    got = {r["url_hash"]: r["maybe_seen"] for r in probed.collect()}
    seen_hashes = {r["url_hash"] for r in seen_df.collect()}
    assert len(got) == 4000
    n_fp = 0
    for h, maybe in got.items():
        if h in seen_hashes:
            assert maybe, "false negative!"
        elif maybe:
            n_fp += 1
    assert n_fp < 200  # ~1% expected on 2000 fresh

    # filter path drops exactly the maybe_seen rows
    kept = bloom.probe(frontier, sidecar).collect()
    assert {r["url_hash"] for r in kept} == {
        h for h, maybe in got.items() if not maybe
    }


def test_probe_missing_sidecar_bucket(spark, seen_df, tmp_path):
    """Buckets with no sidecar entry are trivially unseen."""
    from pyspark.sql import functions as F

    sidecar = str(tmp_path / "bloom2")
    bloom.write_sidecar(bloom.build(seen_df.filter(F.col("bucket") < 4)), sidecar)
    frontier = seen_df
    probed = bloom.probe(frontier, sidecar, keep_maybe_seen=True)
    for r in probed.collect():
        if r["bucket"] >= 4:
            assert not r["maybe_seen"]
        else:
            assert r["maybe_seen"]


def test_absorb_matches_full_build_byte_exact(spark):
    """absorb (r5 incremental sidecar) must be BYTE-IDENTICAL to a
    from-scratch build: bit positions depend only on bitset size, the size
    rule only on item count, so OR-ing the delta in reproduces build(full)
    exactly — including across a resize (marker → pruned rebuild path)."""
    from pyspark.sql import functions as F

    from crawlspark import urlnorm

    def mk(lo, hi, tag):
        return (
            spark.range(lo, hi)
            .select(F.xxhash64(F.concat(F.lit(tag), F.col("id"))).alias("url_hash"))
            .withColumn("bucket", urlnorm.bucket(F.col("url_hash"), 8))
        )

    parent = mk(0, 3000, "u")
    for n_delta in (50, 6000):  # no-resize OR path / every-bucket-resize path
        delta = mk(0, n_delta, "v")
        full = parent.unionByName(delta)
        got = {
            r["bucket"]: (bytes(r["bitset"]), r["n_items"])
            for r in bloom.absorb(bloom.build(parent), delta, full).collect()
        }
        want = {
            r["bucket"]: (bytes(r["bitset"]), r["n_items"])
            for r in bloom.build(full).collect()
        }
        assert got == want, f"absorb diverged from full build at n_delta={n_delta}"


def test_absorb_new_bucket_rebuilds(spark):
    """A delta landing in a bucket with no previous filter row takes the
    rebuild path and still matches the full build."""
    import pandas as pd

    parent = spark.createDataFrame(
        pd.DataFrame({"url_hash": [10, 20, 30], "bucket": [0, 0, 0]})
    )
    delta = spark.createDataFrame(pd.DataFrame({"url_hash": [99], "bucket": [5]}))
    full = parent.unionByName(delta)
    got = {r["bucket"]: bytes(r["bitset"]) for r in bloom.absorb(bloom.build(parent), delta, full).collect()}
    want = {r["bucket"]: bytes(r["bitset"]) for r in bloom.build(full).collect()}
    assert got == want
