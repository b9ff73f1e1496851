from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crawlspark import textops


@pytest.fixture(scope="module")
def docs(spark):
    rows = []
    base = "the quick brown fox jumps over the lazy dog and runs far away today"
    for i in range(40):
        words = base.split()
        # rotate so docs differ, except planted near-dup pairs
        rot = words[i % 5 :] + words[: i % 5]
        rows.append((i, " ".join(rot) + f" unique{i} marker{i}"))
    # planted near-dups: 100+i is doc i with one word appended
    for i in range(0, 40, 10):
        rows.append((100 + i, rows[i][1] + " extra"))
    # exact dups: 200+i identical to doc i
    for i in range(0, 40, 20):
        rows.append((200 + i, rows[i][1]))
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


def test_exact_dedup(spark, docs):
    groups = textops.exact_dup_groups(docs).collect()
    dup_groups = [g for g in groups if g["group_size"] > 1]
    assert len(dup_groups) == 2  # docs 0/200 and 20/220
    deduped = textops.exact_dedup(docs)
    assert deduped.count() == docs.count() - 2
    kept = {r["doc_id"] for r in deduped.collect()}
    assert 0 in kept and 200 not in kept


def test_minhash_finds_planted_neardups(spark, docs):
    pairs = textops.minhash_dedup_pairs(docs, threshold=0.5)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    for i in range(0, 40, 10):
        assert (i, 100 + i) in got, f"missed planted near-dup ({i}, {100+i})"
    for r in pairs.collect():
        assert r["jaccard"] >= 0.5


def test_minhash_signature_shape(spark, docs):
    sigs = textops.minhash_signature(docs, "doc_id", "text", n_hashes=16)
    row = sigs.first()
    assert len(row["sig"]) == 16
    assert sigs.count() == docs.count()


def test_simhash_neardups(spark, docs):
    pairs = textops.simhash_neardup_pairs(docs, max_hamming=6)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    # exact dups have identical simhash (hamming 0)
    assert (0, 200) in got and (20, 220) in got
    for r in pairs.collect():
        assert r["hamming"] <= 6


def test_simhash_deterministic(spark, docs):
    a = {(r["doc_id"], r["sh"]) for r in docs.select("doc_id", textops.simhash_udf("text").alias("sh")).collect()}
    b = {(r["doc_id"], r["sh"]) for r in docs.select("doc_id", textops.simhash_udf("text").alias("sh")).collect()}
    assert a == b


def test_ngram_jaccard_exact(spark, docs):
    pairs = textops.ngram_jaccard_pairs(docs, k=3, threshold=0.9)
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in pairs.collect()}
    assert got[(0, 200)] == 1.0  # identical docs
    assert got[(20, 220)] == 1.0


def test_lang_id_markers(spark):
    rows = [
        (1, "the cat and the dog is a friend of mine"),
        (2, "le chat et la souris est un ami de"),
        (3, "der hund und die katze ist ein freund von"),
        (4, "xyzzy plugh nothing here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["pred_lang"] for r in textops.lang_id(df).collect()}
    assert got[1] == "en"
    assert got[2] == "fr"
    assert got[3] == "de"
    assert got[4] == "und"


def test_quality_and_tokens(spark, docs):
    q = textops.quality_score(docs).first()
    assert 0.0 <= q["quality"] <= 1.0
    t = textops.token_count(docs).collect()
    for r in t:
        assert r["re_tokens"] >= r["ws_tokens"] > 0


def test_fingerprint_normalization(spark):
    rows = [(1, "Hello   World"), (2, "hello world"), (3, "different")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fps = {r["doc_id"]: r["fp_md5"] for r in textops.fingerprint(df).collect()}
    assert fps[1] == fps[2] != fps[3]
