"""Cuckoo-filter sidecar: no-false-negatives, FP bound, deletes, determinism."""
from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from crawlspark import cuckoo

H64 = st.integers(min_value=-(2**63), max_value=2**63 - 1)


@settings(max_examples=30, deadline=None)
@given(st.lists(H64, min_size=0, max_size=500, unique=True))
def test_no_false_negatives(hashes):
    t, o = cuckoo._build_table(np.array(hashes, dtype=np.int64))
    hit = cuckoo._probe_table(np.array(hashes, dtype=np.int64), t, o)
    assert hit.all()


def test_fp_rate_bounded():
    # uint64 multiply + int64 view: the constant exceeds int64 and would
    # otherwise promote to float64 and collapse values
    rng = (np.arange(1, 50_001, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15)).view(np.int64)
    members, probes = rng[:25_000], rng[25_000:]
    t, o = cuckoo._build_table(members)
    assert cuckoo._probe_table(members, t, o).all()
    fp = cuckoo._probe_table(probes, t, o).mean()
    # 4-way/16-bit theoretical FP ~ 8/2^16 ≈ 0.012%; generous bound
    assert fp < 0.01, fp


def test_build_is_deterministic_and_dense():
    hashes = (np.arange(10_000, dtype=np.int64) * 0x5851F42D4C957F2D) + 7
    t1, o1 = cuckoo._build_table(hashes)
    t2, o2 = cuckoo._build_table(hashes)
    assert t1 == t2 and o1 == o2
    # sized table absorbs the batch: overflow stays tiny at TARGET_LOAD
    assert len(np.frombuffer(o1, dtype=np.uint16)) <= 10


def test_delete_then_probe():
    hashes = (np.arange(5_000, dtype=np.int64) * 0x2545F4914F6CDD1D) ^ 99
    t, o = cuckoo._build_table(hashes)
    table = np.frombuffer(t, dtype=np.uint16).reshape(-1, cuckoo.SLOTS).copy()
    ovf = np.frombuffer(o, dtype=np.uint16).copy()
    dele, keep = hashes[:1_000], hashes[1_000:]
    table, ovf = cuckoo._delete_from_table(dele, table, ovf)
    t2, o2 = table.tobytes(), ovf.tobytes()
    # survivors: strict no-false-negative even after deletes (each delete
    # removes exactly one stored copy)
    assert cuckoo._probe_table(keep, t2, o2).all()
    # deleted: mostly gone (residual hits are fingerprint collisions only)
    assert cuckoo._probe_table(dele, t2, o2).mean() < 0.01


@pytest.fixture(scope="module")
def seen_df(request):
    spark = request.getfixturevalue("spark")
    import pandas as pd

    hashes = (
        (np.arange(8_000, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15)).view(np.int64) + 3
    )
    pdf = pd.DataFrame({"url_hash": hashes, "bucket": (hashes % 8).astype(np.int32)})
    return spark.createDataFrame(pdf), hashes


def test_sidecar_roundtrip(spark, seen_df, tmp_path):
    seen, hashes = seen_df
    sidecar = str(tmp_path / "cuckoo")
    cuckoo.write_sidecar(cuckoo.build(seen), sidecar)
    probed = cuckoo.probe(seen, sidecar, keep_maybe_seen=True)
    assert probed.filter("NOT maybe_seen").count() == 0  # no false negatives
    import pandas as pd

    other = pd.DataFrame(
        {
            "url_hash": hashes + 1,
            "bucket": ((hashes + 1) % 8).astype(np.int32),
        }
    )
    unseen = cuckoo.probe(spark.createDataFrame(other), sidecar)
    assert unseen.count() >= int(len(hashes) * 0.99)  # FPs filtered, bounded


def test_remove_dataframe_level(spark, seen_df, tmp_path):
    seen, hashes = seen_df
    filters = cuckoo.build(seen)
    deletes = seen.limit(2_000)
    updated = cuckoo.remove(filters, deletes)
    sidecar = str(tmp_path / "cuckoo2")
    cuckoo.write_sidecar(updated, sidecar)
    kept = seen.join(deletes, ["url_hash", "bucket"], "left_anti")
    still = cuckoo.probe(kept, sidecar, keep_maybe_seen=True)
    assert still.filter("NOT maybe_seen").count() == 0
    gone = cuckoo.probe(deletes, sidecar, keep_maybe_seen=True)
    assert gone.filter("maybe_seen").count() < deletes.count() * 0.02


def test_bucket_congruent_hashes_stay_vectorized():
    """r5 filter-bench root cause: seen tables are bucketed by
    pmod(url_hash, n_buckets), so within one bucket every hash shares its
    low bits.  The v1 index (raw ``h & (m-1)``) collapsed a 13k-item
    bucket onto m/64 entries — 11% overflow and a 6.7 s sequential kick
    loop per bucket.  The mixed index must keep placement dense and the
    overflow empty on exactly this distribution."""
    rng = np.random.default_rng(7)
    n = 13_000
    hashes = rng.integers(-(2**56), 2**56, size=n, dtype=np.int64) * 64 + 5
    t, o = cuckoo._build_table(hashes)
    assert len(np.frombuffer(o, dtype=np.uint16)) <= 10  # v1: 1471
    assert cuckoo._probe_table(hashes, t, o).all()
    # index spread: mixed bits must use (nearly) the full table, not 64 rows
    m = cuckoo._m_entries(n)
    i1 = cuckoo._index1(hashes, m)
    assert len(np.unique(i1)) > m // 2  # v1: exactly 64


def test_absorb_no_false_negatives_and_deterministic(spark, seen_df):
    """absorb (r5 incremental sidecar) inserts the delta in place: the
    union must probe all-positive (unconditional no-false-negative
    contract), counts must add exactly, resized buckets must match the
    sizing a full build would pick, and the result must be deterministic."""
    import pandas as pd

    seen, hashes = seen_df
    parent = seen.limit(5_000).localCheckpoint(eager=True)
    delta = seen.join(parent, ["url_hash"], "left_anti").localCheckpoint(eager=True)
    full = parent.unionByName(delta)
    filters = cuckoo.build(parent)
    rows1 = {r["bucket"]: r for r in cuckoo.absorb(filters, delta, full).collect()}
    rows2 = {r["bucket"]: r for r in cuckoo.absorb(filters, delta, full).collect()}
    assert {b: bytes(r["table"]) for b, r in rows1.items()} == {
        b: bytes(r["table"]) for b, r in rows2.items()
    }
    per_bucket_n = {
        r["bucket"]: r["cnt"] for r in full.groupBy("bucket").count().withColumnRenamed("count", "cnt").collect()
    }
    for b, r in rows1.items():
        assert r["n_items"] == per_bucket_n[b]
        m = len(bytes(r["table"])) // (2 * cuckoo.SLOTS)
        assert m == cuckoo._m_entries(r["n_items"]), f"bucket {b} sized off-rule"
        bh = np.array(
            [h for h in hashes if (h % 8) == b], dtype=np.int64
        )
        assert cuckoo._probe_table(bh, bytes(r["table"]), bytes(r["overflow"])).all()


def test_absorb_after_remove_handles_holes(spark, seen_df):
    """remove punches mid-row holes in slot occupancy; a later absorb must
    insert into those holes correctly (recrawl workloads interleave
    invalidation and crawling).  Contract: every live member — parent
    minus removed plus delta — still probes positive."""
    import pandas as pd

    seen, hashes = seen_df
    parent = seen.limit(6_000).localCheckpoint(eager=True)
    removed = parent.limit(1_500).localCheckpoint(eager=True)
    kept = parent.join(removed, ["url_hash"], "left_anti")
    delta = seen.join(parent, ["url_hash"], "left_anti").limit(2_000).localCheckpoint(eager=True)
    live = kept.unionByName(delta).localCheckpoint(eager=True)

    shrunk = cuckoo.remove(cuckoo.build(parent), removed)
    absorbed = {r["bucket"]: r for r in cuckoo.absorb(shrunk, delta, live).collect()}
    live_pdf = live.toPandas()
    for b, grp in live_pdf.groupby("bucket"):
        r = absorbed[int(b)]
        hit = cuckoo._probe_table(
            grp["url_hash"].to_numpy(dtype=np.int64),
            bytes(r["table"]), bytes(r["overflow"]),
        )
        assert hit.all(), f"false negative after remove+absorb in bucket {b}"
