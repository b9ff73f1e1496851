from __future__ import annotations

from crawlspark import io as cio


def test_seeds_from_term_whole_token(spark):
    docs = spark.createDataFrame(
        [
            ("https://a.example/1", "the quick brown fox"),
            ("https://a.example/2", "theatre is not a token match"),
            ("https://a.example/3", "THE case-insensitive hit"),
            ("https://a.example/4", "no stopword here"),
            ("https://a.example/5", "tabs\tand  spaces   the\tend"),
        ],
        "url string, text string",
    )
    got = {r["url"] for r in cio.seeds_from_term(docs, "the").collect()}
    # whole-token, case-insensitive, \s+-tokenized — 'theatre' must NOT match
    assert got == {
        "https://a.example/1",
        "https://a.example/3",
        "https://a.example/5",
    }


def test_seeds_from_term_limit_deterministic(spark):
    docs = spark.createDataFrame(
        [(f"https://h.example/{i:03d}", "the text") for i in range(50)],
        "url string, text string",
    )
    got = [r["url"] for r in cio.seeds_from_term(docs, "the", limit=10).collect()]
    assert got == sorted(got)
    assert got == [f"https://h.example/{i:03d}" for i in range(10)]
