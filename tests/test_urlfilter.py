"""URL heuristics + host blocklist vs hand-labeled expectations."""

from __future__ import annotations

from crawlspark import urlfilter

CASES = [
    # (url, should_keep, reason)
    ("https://example.com/articles/how-to-spark", True, "clean"),
    ("https://example.com/" + "a" * 250, False, "too long"),
    ("https://example.com/a/b/c/d/e/f/g/h/i/j", False, "too deep"),
    ("https://example.com/p?a=1&b=2&c=3&d=4&e=5&f=6&g=7", False, "too many params"),
    ("https://example.com/p?PHPSESSID=abc123", False, "session id"),
    ("https://example.com/cal/2026/03/04", False, "calendar trap"),
    ("https://example.com/photo.JPG", False, "binary extension"),
    ("https://example.com/doc.pdf?dl=1", False, "binary extension with query"),
    ("https://example.com/a/b/a/b/a/b/x", False, "path loop"),
    ("https://example.com/2026-review", True, "year alone is not a calendar"),
    ("https://news.example/2024/06/03/report", True, "date PERMALINK articles are kept"),
    ("https://example.com/download?file=report.pdf", True, "extension in query value is not a binary path"),
    ("https://example.com/a b", False, "malformed (unparsable) url is flagged, not a crash"),
    ("https://example.com/p?a=1&b=2", True, "few params fine"),
]


def test_flag_urls_heuristics(spark):
    df = spark.createDataFrame([(u,) for u, _, _ in CASES], "url string")
    got = {r["url"]: r["url_keep"] for r in urlfilter.flag_urls(df).collect()}
    for url, keep, reason in CASES:
        assert got[url] == keep, f"{url}: {reason}"


def test_filter_urls_preserves_schema(spark):
    df = spark.createDataFrame(
        [(u, i) for i, (u, _, _) in enumerate(CASES)], "url string, n long"
    )
    out = urlfilter.filter_urls(df)
    assert out.columns == ["url", "n"]
    assert out.count() == sum(1 for _, k, _ in CASES if k)


def test_host_suffixes_expr(spark):
    df = spark.createDataFrame([("a.b.co.uk",), ("localhost",)], "h string")
    got = {
        r["h"]: r["s"]
        for r in df.select("h", urlfilter.host_suffixes(df.h).alias("s")).collect()
    }
    assert got["a.b.co.uk"] == ["uk", "co.uk", "b.co.uk", "a.b.co.uk"]
    assert got["localhost"] == ["localhost"]


def test_deep_subdomain_blocklist_entry_matches_itself(spark):
    deep = "x.y.z.w.v.u.t.example.com"
    df = spark.createDataFrame([(f"https://{deep}/p", 1), ("https://ok.example/q", 2)], "url string, n long")
    blocked = spark.createDataFrame([(deep,)], "host_suffix string")
    kept = [r["n"] for r in urlfilter.apply_host_blocklist(df, blocked).collect()]
    assert kept == [2]


def test_apply_host_blocklist_suffix_semantics(spark):
    df = spark.createDataFrame(
        [
            ("https://spam.example.com/x", 1),
            ("https://sub.spam.example.com/y", 2),
            ("https://example.com/ok", 3),
            ("https://notspam-example.com/ok", 4),
            ("https://anything.badtld.test/z", 5),
        ],
        "url string, n long",
    )
    blocked = spark.createDataFrame(
        [("spam.example.com",), ("badtld.test",)], "host_suffix string"
    )
    kept = sorted(
        r["n"] for r in urlfilter.apply_host_blocklist(df, blocked).collect()
    )
    # suffix match blocks the host and its subdomains, nothing else;
    # string-similar-but-different hosts survive
    assert kept == [3, 4]
    assert urlfilter.apply_host_blocklist(df, blocked).columns == ["url", "n"]
