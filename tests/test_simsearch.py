from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from crawlspark import simsearch

DIM = 16


def _vec(i: int) -> list[float]:
    dig = hashlib.md5(f"v{i}".encode()).digest() + hashlib.md5(f"w{i}".encode()).digest()
    return [(b - 127.5) / 127.5 for b in dig[:DIM]]


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [(i, _vec(i)) for i in range(200)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>").cache()


@pytest.fixture(scope="module")
def queries(spark):
    rows = [(i, _vec(i)) for i in range(3)]
    return spark.createDataFrame(rows, "q_id long, q_vec array<float>")


def test_brute_force_self_is_top1(spark, corpus, queries):
    topk = simsearch.cosine_topk(queries, corpus, k=5, c_vec="embedding")
    rows = topk.collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["q_id"], []).append(r)
    for q, rs in by_q.items():
        assert len(rs) == 5
        best = min(rs, key=lambda r: r["rank"])
        assert best["vec_id"] == q  # identical vector → cosine 1.0
        assert best["cos"] == 1.0


def test_lsh_finds_self(spark, corpus, queries):
    topk = simsearch.lsh_topk(queries, corpus, dim=DIM, k=5, n_planes=4)
    rows = topk.collect()
    self_hits = {r["q_id"] for r in rows if r["vec_id"] == r["q_id"] and r["rank"] == 1}
    assert self_hits == {0, 1, 2}  # identical vectors share every bucket


def test_lsh_recall_vs_brute(spark, corpus, queries):
    brute = simsearch.cosine_topk(queries, corpus, k=10, c_vec="embedding").collect()
    lsh = simsearch.lsh_topk(queries, corpus, dim=DIM, k=10, n_planes=2).collect()
    bset = {(r["q_id"], r["vec_id"]) for r in brute}
    lset = {(r["q_id"], r["vec_id"]) for r in lsh}
    recall = len(bset & lset) / len(bset)
    assert recall >= 0.3, f"recall {recall} suspiciously low even for 2 planes"


def test_neardup_pairs_finds_twins(spark, corpus):
    twins = corpus.select((F.col("vec_id") + 1000).alias("vec_id"), "embedding")
    both = corpus.unionByName(twins)
    pairs = simsearch.neardup_pairs(both, threshold=0.999, dim=DIM, n_planes=4)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    for i in range(200):
        assert (i, i + 1000) in got
