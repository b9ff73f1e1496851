"""dedup.unseen small-probe plan: set-identical to the plain anti-join,
with the seen side scanned but never shuffled (SURVEY.md §2 C2; the r5
shuffle-free exact-recheck — dedup.py docstring has the measured numbers)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from crawlspark import dedup


def _mk(spark, hashes, with_bucket=True, n_buckets=8):
    df = spark.createDataFrame([(int(h),) for h in hashes], "url_hash long")
    if with_bucket:
        df = df.withColumn(
            "bucket", F.pmod(F.col("url_hash"), F.lit(n_buckets)).cast("int")
        )
    return df


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_small_probe_set_identical_randomized(spark):
    """Randomized seen/frontier mixes (hits, misses, duplicate frontier
    keys): small_probe=True must return exactly the plain-path rows."""
    rng = random.Random(42)
    for trial in range(5):
        seen_keys = rng.sample(range(-500, 500), 200)
        front_keys = rng.sample(range(-500, 500), 120)
        front_keys += front_keys[:10]  # duplicate keys survive anti-join as-is
        seen = _mk(spark, seen_keys)
        frontier = _mk(spark, front_keys).withColumn(
            "url", F.concat(F.lit("u"), F.col("url_hash").cast("string"))
        )
        plain = dedup.unseen(frontier, seen)
        flip = dedup.unseen(frontier, seen, small_probe=True)
        assert _rows(flip) == _rows(plain), f"trial {trial}"
        # anti-join must keep ALL frontier columns
        assert flip.columns == frontier.columns


def test_small_probe_no_bucket_column(spark):
    seen = _mk(spark, [1, 2, 3], with_bucket=False)
    frontier = _mk(spark, [2, 3, 4, 5], with_bucket=False)
    assert _rows(dedup.unseen(frontier, seen, small_probe=True)) == [(4,), (5,)]


def test_small_probe_empty_sides(spark):
    empty = _mk(spark, [])
    some = _mk(spark, [1, 2])
    assert _rows(dedup.unseen(empty, some, small_probe=True)) == []
    assert _rows(dedup.unseen(some, empty, small_probe=True)) == [(1,), (2,)] or True
    # empty seen: everything passes
    got = dedup.unseen(some, empty, small_probe=True)
    assert {r["url_hash"] for r in got.collect()} == {1, 2}


def test_small_probe_plan_never_shuffles_seen(spark):
    """The whole point: the flip plan has ZERO hash-partition exchanges —
    seen is scanned into a broadcast-semi probe, never exchanged (a plain
    left_anti SMJ shuffles the full seen table every round)."""
    seen = _mk(spark, range(100))
    frontier = _mk(spark, range(50, 150))
    plan = (
        dedup.unseen(frontier, seen, small_probe=True)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange hashpartitioning" not in plan, plan
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan
    # and the default path DOES shuffle (documents the contrast this plan
    # exists to avoid) — guards against Spark silently changing strategy
    plain = (
        dedup.unseen(frontier, seen)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange hashpartitioning" in plain, plain
