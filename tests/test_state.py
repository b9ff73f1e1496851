from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from crawlspark import config, state, urlnorm


@pytest.fixture()
def small_state(spark):
    frontier = spark.createDataFrame(
        [(f"https://h{i%3}.example/p/{i}", i, f"h{i%3}.example", 0.0, 0, 0) for i in range(50)],
        "url string, url_hash long, host string, priority double, depth int, discovered_round int",
    ).withColumn("bucket", urlnorm.bucket(F.col("url_hash"), 8))
    seen = spark.createDataFrame(
        [(i * 7, i % 8) for i in range(30)], "url_hash long, bucket int"
    )
    return frontier, seen


def test_commit_load_roundtrip(spark, small_state, tmp_path):
    frontier, seen = small_state
    root = str(tmp_path)
    d = state.commit_snapshot(root, "run1", 0, frontier, seen)
    assert os.path.exists(os.path.join(d, state.MANIFEST))
    f2, s2, rnd, mf = state.load_snapshot(spark, root, "run1")
    assert rnd == 0
    assert sorted(r["url"] for r in f2.collect()) == sorted(r["url"] for r in frontier.collect())
    assert s2.count() == seen.count()
    assert mf["bucket_fn_version"] == config.BUCKET_FN_VERSION
    assert "lineage" in mf and "frontier" in mf["lineage"]
    assert sum(p["rows"] for p in mf["lineage"]["frontier"]) == 50


def test_uncommitted_round_ignored(spark, small_state, tmp_path):
    frontier, seen = small_state
    root = str(tmp_path)
    state.commit_snapshot(root, "run1", 0, frontier, seen)
    # torn write: round dir exists but no manifest
    torn = os.path.join(root, "run1", "round=1")
    os.makedirs(torn)
    assert state.committed_rounds(root, "run1") == [0]
    _, _, rnd, _ = state.load_snapshot(spark, root, "run1")
    assert rnd == 0


def test_bucket_version_mismatch_rejected(spark, small_state, tmp_path):
    frontier, seen = small_state
    root = str(tmp_path)
    d = state.commit_snapshot(root, "run1", 0, frontier, seen)
    mf_path = os.path.join(d, state.MANIFEST)
    with open(mf_path) as f:
        mf = json.load(f)
    mf["bucket_fn_version"] = "other-v9"
    with open(mf_path, "w") as f:
        json.dump(mf, f)
    with pytest.raises(ValueError, match="bucket fn"):
        state.load_snapshot(spark, root, "run1")


def test_n_buckets_mismatch_rejected(spark, small_state, tmp_path):
    """Resuming under a different bucket modulus must fail loudly: new links
    would bucket differently and the seen anti-join would silently re-fetch
    (round-1 ADVICE)."""
    frontier, seen = small_state
    root = str(tmp_path)
    state.commit_snapshot(root, "run1", 0, frontier, seen, n_buckets=8)
    _, _, _, mf = state.load_snapshot(spark, root, "run1", expected_n_buckets=8)
    assert mf["n_buckets"] == 8
    with pytest.raises(ValueError, match="n_buckets"):
        state.load_snapshot(spark, root, "run1", expected_n_buckets=16)


def test_latest_round_selected(spark, small_state, tmp_path):
    frontier, seen = small_state
    root = str(tmp_path)
    for r in range(3):
        state.commit_snapshot(root, "run1", r, frontier, seen)
    _, _, rnd, mf = state.load_snapshot(spark, root, "run1")
    assert rnd == 2
    assert mf["parent_round"] == 1


def test_gc_snapshots_retention(spark, tmp_path):
    import os

    from crawlspark import state

    root, run_id = str(tmp_path), "gcrun"
    fr = spark.createDataFrame(
        [("https://h/x", 1, "h", 0.0, 0, 0, 0)],
        "url string, url_hash long, host string, priority double, depth int, "
        "discovered_round int, bucket int",
    )
    seen = spark.createDataFrame([(1, 0)], "url_hash long, bucket int")
    for r in range(4):
        state.commit_snapshot(root, run_id, r, fr, seen)
    # an uncommitted (crashed) older dir and a newer in-progress dir
    os.makedirs(os.path.join(root, run_id, "round=1crash", ), exist_ok=True)
    os.rename(
        os.path.join(root, run_id, "round=1crash"),
        os.path.join(root, run_id, "round=9"),
    )
    deleted = state.gc_snapshots(root, run_id, keep_last=2)
    assert deleted == [0, 1]
    assert state.committed_rounds(root, run_id) == [2, 3]
    # newer uncommitted dir untouched (may be a commit in progress)
    assert os.path.isdir(os.path.join(root, run_id, "round=9"))
    # resume still works from the newest kept round
    f2, s2, r2, _ = state.load_snapshot(spark, root, run_id)
    assert r2 == 3 and f2.count() == 1 and s2.count() == 1
    import pytest as _pytest

    with _pytest.raises(ValueError):
        state.gc_snapshots(root, run_id, keep_last=0)


def test_delta_chain_roundtrip(spark, small_state, tmp_path):
    """Rounds commit disjoint seen deltas; load reconstructs the exact
    union from the nearest full checkpoint + deltas (state.py r5)."""
    frontier, _ = small_state
    root = str(tmp_path)
    full0 = spark.createDataFrame([(i, i % 8) for i in range(10)], "url_hash long, bucket int")
    d1 = spark.createDataFrame([(i, i % 8) for i in range(10, 17)], "url_hash long, bucket int")
    d2 = spark.createDataFrame([(i, i % 8) for i in range(17, 25)], "url_hash long, bucket int")
    state.commit_snapshot(root, "dr", 0, frontier, full0)
    state.commit_snapshot(root, "dr", 1, frontier, None, seen_delta=d1)
    state.commit_snapshot(root, "dr", 2, frontier, None, seen_delta=d2)
    _, s1, _, mf1 = state.load_snapshot(spark, root, "dr", round_no=1)
    assert mf1["seen_mode"] == "delta"
    assert sorted(r["url_hash"] for r in s1.collect()) == list(range(17))
    _, s2, rnd, mf2 = state.load_snapshot(spark, root, "dr")
    assert rnd == 2 and mf2["seen_mode"] == "delta"
    assert sorted(r["url_hash"] for r in s2.collect()) == list(range(25))
    # round 0 itself still loads as a plain full checkpoint
    _, s0, _, mf0 = state.load_snapshot(spark, root, "dr", round_no=0)
    assert mf0["seen_mode"] == "full" and s0.count() == 10


def test_delta_requires_committed_parent(spark, small_state, tmp_path):
    frontier, seen = small_state
    root = str(tmp_path)
    with pytest.raises(ValueError, match="committed parent"):
        state.commit_snapshot(root, "dp", 0, frontier, None, seen_delta=seen)
    state.commit_snapshot(root, "dp", 0, frontier, seen)
    with pytest.raises(ValueError, match="committed parent"):
        state.commit_snapshot(root, "dp", 5, frontier, None, seen_delta=seen)


def test_gc_protects_delta_chain(spark, small_state, tmp_path):
    """keep_last=1 on a delta chain must retain the whole chain; once a
    newer full checkpoint exists, the old chain is reclaimable."""
    frontier, _ = small_state
    root, run_id = str(tmp_path), "gcd"
    full = spark.createDataFrame([(1, 0)], "url_hash long, bucket int")
    delta = spark.createDataFrame([(2, 0)], "url_hash long, bucket int")
    state.commit_snapshot(root, run_id, 0, frontier, full)
    for r in (1, 2, 3):
        state.commit_snapshot(root, run_id, r, frontier, None, seen_delta=delta.withColumn("url_hash", F.lit(r + 1)))
    assert state.gc_snapshots(root, run_id, keep_last=1) == []  # chain alive
    assert state.committed_rounds(root, run_id) == [0, 1, 2, 3]
    state.commit_snapshot(root, run_id, 4, frontier, full)  # new checkpoint
    state.commit_snapshot(root, run_id, 5, frontier, None, seen_delta=delta)
    assert state.gc_snapshots(root, run_id, keep_last=1) == [0, 1, 2, 3]
    assert state.committed_rounds(root, run_id) == [4, 5]
    _, s5, r5, _ = state.load_snapshot(spark, root, run_id)
    assert r5 == 5 and s5.count() == 2


def test_broken_delta_chain_refused(spark, small_state, tmp_path):
    import shutil

    frontier, seen = small_state
    root, run_id = str(tmp_path), "bc"
    state.commit_snapshot(root, run_id, 0, frontier, seen)
    state.commit_snapshot(root, run_id, 1, frontier, None, seen_delta=seen)
    state.commit_snapshot(root, run_id, 2, frontier, None, seen_delta=seen)
    shutil.rmtree(os.path.join(root, run_id, "round=1"))
    with pytest.raises(FileNotFoundError, match="chain"):
        state.load_snapshot(spark, root, run_id, round_no=2)


def test_compact_snapshot_frees_chain(spark, small_state, tmp_path):
    """compact_snapshot rewrites the newest delta round as a full
    checkpoint (same reconstructed set), after which gc keep_last=1 can
    reclaim the whole ancestor chain (r5 incremental snapshots)."""
    frontier, _ = small_state
    root, run_id = str(tmp_path), "cp"
    full0 = spark.createDataFrame([(i, i % 8) for i in range(10)], "url_hash long, bucket int")
    d1 = spark.createDataFrame([(i, i % 8) for i in range(10, 17)], "url_hash long, bucket int")
    d2 = spark.createDataFrame([(i, i % 8) for i in range(17, 25)], "url_hash long, bucket int")
    state.commit_snapshot(root, run_id, 0, frontier, full0)
    state.commit_snapshot(root, run_id, 1, frontier, None, seen_delta=d1)
    state.commit_snapshot(root, run_id, 2, frontier, None, seen_delta=d2)
    assert state.gc_snapshots(root, run_id, keep_last=1) == []  # chain pinned
    assert state.compact_snapshot(spark, root, run_id) == 2
    _, s2, rnd, mf = state.load_snapshot(spark, root, run_id)
    assert rnd == 2 and mf["seen_mode"] == "full"
    assert sorted(r["url_hash"] for r in s2.collect()) == list(range(25))
    assert not os.path.exists(os.path.join(root, run_id, "round=2", "seen_delta"))
    assert "seen" in mf["lineage"] and "seen_delta" not in mf["lineage"]
    assert state.gc_snapshots(root, run_id, keep_last=1) == [0, 1]
    _, s2b, _, _ = state.load_snapshot(spark, root, run_id)
    assert s2b.count() == 25
    # idempotent no-op on a full round
    assert state.compact_snapshot(spark, root, run_id) == 2


def test_refused_commit_preserves_existing_round(spark, small_state, tmp_path):
    """r5 review: validation must precede the destructive rmtree — a
    REFUSED delta commit over an already-committed round dir previously
    erased that round first (data loss + unresumable run)."""
    frontier, seen = small_state
    root = str(tmp_path)
    state.commit_snapshot(root, "run1", 0, frontier, seen)
    delta = spark.createDataFrame([(1000, 0)], "url_hash long, bucket int")
    # round 0 can never be a delta (no parent) -> must refuse...
    with pytest.raises(ValueError, match="committed parent"):
        state.commit_snapshot(root, "run1", 0, frontier, None, seen_delta=delta)
    # ...and the committed round 0 must still load
    _f, _s, rnd, _mf = state.load_snapshot(spark, root, "run1")
    assert rnd == 0
    # seen=None with no delta is an explicit error, also pre-rmtree
    with pytest.raises(ValueError, match="seen"):
        state.commit_snapshot(root, "run1", 0, frontier, None)
    assert state.load_snapshot(spark, root, "run1")[2] == 0


def test_junk_round_dirs_tolerated(spark, small_state, tmp_path):
    """Operator junk like round=0.bak must not wedge resume or gc."""
    import shutil as _sh

    frontier, seen = small_state
    root = str(tmp_path)
    d0 = state.commit_snapshot(root, "run1", 0, frontier, seen)
    state.commit_snapshot(root, "run1", 1, frontier, seen)
    _sh.copytree(d0, os.path.join(root, "run1", "round=0.bak"))
    assert state.committed_rounds(root, "run1") == [0, 1]
    assert state.load_snapshot(spark, root, "run1")[2] == 1
    deleted = state.gc_snapshots(root, "run1", keep_last=1)
    assert deleted == [0]
    assert os.path.isdir(os.path.join(root, "run1", "round=0.bak"))  # untouched


def test_load_snapshot_uncommitted_round_informative(spark, small_state, tmp_path):
    frontier, seen = small_state
    root = str(tmp_path)
    state.commit_snapshot(root, "run1", 0, frontier, seen)
    with pytest.raises(FileNotFoundError, match="not committed"):
        state.load_snapshot(spark, root, "run1", round_no=7)
