"""robots.txt raw-text parsing (polite.parse_robots_one / robots_from_text)."""
from __future__ import annotations

from pyspark.sql import functions as F

from crawlspark import polite

WIKI_STYLE = """\
# robots.txt for example.org
User-agent: *
Disallow: /private/
Allow: /private/public-bit
Crawl-delay: 2

User-agent: crawlspark
Disallow: /only-for-us/
Crawl-delay: 0.5
"""

MULTI_AGENT_GROUP = """\
User-agent: alpha
User-agent: beta
Disallow: /a/
User-agent: *
Disallow: /b/
"""

MESSY = """\
﻿USER-AGENT: *   # shouty fields
  disallow:   /x/   # inline comment
Disallow:
Allow: /x/ok*
Disallow: /y/*.pdf
Crawl-Delay: not-a-number
noise line without colon-sep?  maybe: yes
"""


def test_specific_agent_group_beats_star():
    p = polite.parse_robots_one(WIKI_STYLE, agent="crawlspark")
    assert p["rules"] == [{"pattern": "/only-for-us/", "allow": False}]
    assert p["crawl_delay"] == 0.5


def test_star_group_for_unknown_agent():
    p = polite.parse_robots_one(WIKI_STYLE, agent="someone-else")
    assert p["rules"] == [
        {"pattern": "/private/", "allow": False},
        {"pattern": "/private/public-bit", "allow": True},
    ]
    assert p["crawl_delay"] == 2.0


def test_multi_agent_lines_share_one_group():
    assert polite.parse_robots_one(MULTI_AGENT_GROUP, agent="beta")["rules"] == [
        {"pattern": "/a/", "allow": False}
    ]
    assert polite.parse_robots_one(MULTI_AGENT_GROUP, agent="gamma")["rules"] == [
        {"pattern": "/b/", "allow": False}
    ]


def test_messy_input():
    p = polite.parse_robots_one(MESSY, agent="anything")
    # empty Disallow contributes nothing; wildcard patterns kept VERBATIM
    # since r4 (allowed_col implements the full RFC-9309 match); bad delay
    # ignored
    assert p["rules"] == [
        {"pattern": "/x/", "allow": False},
        {"pattern": "/x/ok*", "allow": True},
        {"pattern": "/y/*.pdf", "allow": False},
    ]
    assert p["crawl_delay"] is None


SPLIT_STAR_GROUPS = """\
User-agent: *
Disallow: /a/
Crawl-delay: 1

User-agent: other-bot
Disallow: /not-ours/

User-agent: *
Disallow: /b/
Crawl-delay: 3
"""

SPLIT_SPECIFIC_GROUPS = """\
User-agent: crawlspark
Disallow: /one/

User-agent: *
Disallow: /star/

User-agent: crawlspark
Disallow: /two/
"""


def test_tied_star_groups_merge_rfc9309():
    # RFC 9309 §2.2.1: two separate 'User-agent: *' groups MERGE — the
    # second group's Disallow must not be dropped (r2 ADVICE, medium).
    p = polite.parse_robots_one(SPLIT_STAR_GROUPS, agent="crawlspark")
    assert p["rules"] == [
        {"pattern": "/a/", "allow": False},
        {"pattern": "/b/", "allow": False},
    ]
    # most-conservative delay across the merged groups
    assert p["crawl_delay"] == 3.0


def test_tied_specific_groups_merge_and_beat_star():
    p = polite.parse_robots_one(SPLIT_SPECIFIC_GROUPS, agent="crawlspark")
    assert p["rules"] == [
        {"pattern": "/one/", "allow": False},
        {"pattern": "/two/", "allow": False},
    ]


def test_empty_and_none_bodies():
    empty = {"rules": [], "crawl_delay": None, "sitemaps": []}
    assert polite.parse_robots_one(None) == empty
    assert polite.parse_robots_one("") == empty


SITEMAP_BODY = """\
User-agent: *
Disallow: /a/
Sitemap: https://ex.com/sitemap.xml
User-agent: crawlspark
Sitemap: https://ex.com/sitemap2.xml.gz
Disallow: /b/
Sitemap:
"""


def test_sitemap_lines_are_global_and_run_transparent():
    # collected for every agent, regardless of which group is selected,
    # and a Sitemap line between two User-agent lines must not split the run
    for agent in ("crawlspark", "nobody"):
        p = polite.parse_robots_one(SITEMAP_BODY, agent=agent)
        assert p["sitemaps"] == [
            "https://ex.com/sitemap.xml",
            "https://ex.com/sitemap2.xml.gz",
        ]
    assert polite.parse_robots_one(SITEMAP_BODY, agent="crawlspark")["rules"] == [
        {"pattern": "/b/", "allow": False}
    ]


def test_robots_sitemaps_spark(spark):
    raw = spark.createDataFrame(
        [("h1.example", SITEMAP_BODY), ("h2.example", "User-agent: *\n"), ("h3.example", None)],
        "host string, robots_txt string",
    )
    got = sorted(
        (r["host"], r["sitemap_url"])
        for r in polite.robots_sitemaps(raw).collect()
    )
    assert got == [
        ("h1.example", "https://ex.com/sitemap.xml"),
        ("h1.example", "https://ex.com/sitemap2.xml.gz"),
    ]


def test_robots_from_text_roundtrip(spark):
    raw = spark.createDataFrame(
        [
            ("h1.example", WIKI_STYLE),
            ("h2.example", "User-agent: *\nDisallow: /\n"),
            ("h3.example", None),
        ],
        "host string, robots_txt string",
    )
    rules = polite.robots_from_text(raw, agent="crawlspark")
    # the parsed table drives the same filter operator as structured robots
    frontier = spark.createDataFrame(
        [
            ("https://h1.example/only-for-us/p", "h1.example"),
            ("https://h1.example/fine", "h1.example"),
            ("https://h2.example/anything", "h2.example"),
            ("https://h3.example/ok", "h3.example"),
        ],
        "url string, host string",
    )
    kept = polite.with_rules(frontier, rules)
    urls = sorted(r["url"] for r in kept.select("url").collect())
    assert urls == ["https://h1.example/fine", "https://h3.example/ok"]
    row = {r["host"]: r for r in rules.collect()}
    assert row["h1.example"]["crawl_delay"] == 0.5
    assert row["h3.example"]["rules"] == []


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=400), st.text(min_size=1, max_size=20))
def test_parse_robots_never_raises(body, agent):
    """Total function over arbitrary junk: always a well-shaped dict."""
    p = polite.parse_robots_one(body, agent=agent)
    assert set(p) == {"rules", "crawl_delay", "sitemaps"}
    assert all(isinstance(s, str) for s in p["sitemaps"])
    for r in p["rules"]:
        assert isinstance(r["pattern"], str) and isinstance(r["allow"], bool)
        assert "*" not in r["pattern"] and "$" not in r["pattern"]
    assert p["crawl_delay"] is None or isinstance(p["crawl_delay"], float)


def test_robots_raw_from_pages_latest_capture_wins(spark):
    import datetime

    old_body = b"User-agent: *\nDisallow: /old/\n"
    new_body = b"User-agent: *\nDisallow: /new/\nCrawl-delay: 2\n"
    t0 = datetime.datetime(2026, 1, 1)
    t1 = datetime.datetime(2026, 6, 1)
    pages = spark.createDataFrame(
        [
            ("https://h1.example/robots.txt", t0, bytearray(old_body), None, None),
            ("https://h1.example/robots.txt", t1, bytearray(new_body), None, None),
            ("https://h2.example/robots.txt", t0, bytearray(b"\xffUser-agent: *\n"), None, None),
            ("https://h1.example/robots.txt.bak", t0, bytearray(b"x"), None, None),
            ("https://h1.example/page", t0, bytearray(b"<html></html>"), None, None),
        ],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    raw = {r["host"]: r["robots_txt"] for r in polite.robots_raw_from_pages(pages).collect()}
    assert set(raw) == {"h1.example", "h2.example"}
    assert "Disallow: /new/" in raw["h1.example"]       # as-of pick
    assert "Disallow: /old/" not in raw["h1.example"]
    assert raw["h2.example"].startswith("ÿ")            # latin-1 fallback, no crash

    rules = polite.robots_from_text(polite.robots_raw_from_pages(pages))
    got = {r["host"]: r for r in rules.collect()}
    assert got["h1.example"]["crawl_delay"] == 2.0
    assert [r.asDict() for r in got["h1.example"]["rules"]] == [
        {"pattern": "/new/", "allow": False}
    ]


# ---------------------------------------------------------- RFC-9309 wildcards
# Canonical matching examples from the REP spec (RFC 9309 §2.2.3 / the
# google REP parser's documented table), checked against BOTH the engine's
# JVM-side matcher (polite.allowed_col) and the python oracle twin
# (oracle_crawler._match_rules) so the replay contract stays in lockstep.

_WC_CASES = [
    # (rules, path, expected_allowed)
    ([("/fish*", False)], "/fish", False),
    ([("/fish*", False)], "/fishheads/yummy.html", False),
    ([("/fish*", False)], "/Fish.asp", True),            # case-sensitive
    ([("/fish*", False)], "/catfish", True),             # prefix, not substring
    ([("/*.php", False)], "/filename.php", False),
    ([("/*.php", False)], "/folder/filename.php?params", False),
    ([("/*.php", False)], "/", True),
    ([("/*.php", False)], "/windows.PHP", True),
    ([("/*.php$", False)], "/filename.php", False),
    ([("/*.php$", False)], "/filename.php?params", True),  # anchored
    ([("/*.php$", False)], "/filename.php/", True),
    ([("/fish*.php", False)], "/fish.php", False),
    ([("/fish*.php", False)], "/fishheads/catfish.php?params", False),
    ([("/fish*.php", False)], "/Fish.PHP", True),
    # allow/disallow same-length tie: allow wins (RFC 9309 §2.2.2)
    ([("/page", True), ("/page", False)], "/page", True),
    # longest match wins regardless of rule order
    ([("/p", True), ("/page/x", False), ("/page", True)], "/page/x", False),
    # interior '$' is a literal, not an anchor
    ([("/a$b", False)], "/a$b/c", False),
    ([("/a$b", False)], "/ab", True),
    # glob-matcher edges: bare '*' matches everything
    ([("*", False)], "/anything", False),
    # bare '$' = exact-empty-path anchor; paths are never empty
    ([("$", False)], "/", True),
    # '**' collapses to '*'
    ([("/a**b", False)], "/aXYb", False),
    ([("/a**b", False)], "/ab", False),
    # trailing '*$' ≡ trailing '*' ≡ plain prefix
    ([("/fish*$", False)], "/fishheads", False),
    ([("/fish*$", False)], "/fis", True),
    # anchored single segment = exact match
    ([("/exact$", False)], "/exact", False),
    ([("/exact$", False)], "/exactly", True),
    ([("/exact$", False)], "/exac", True),
    # anchored two-segment where prefix and suffix touch
    ([("/a*b$", False)], "/ab", False),
    ([("/a*b$", False)], "/aXb", False),
    ([("/a*b$", False)], "/aXbY", True),
    # greedy mid-consumption must not steal the anchored tail
    ([("/a*b*c$", False)], "/a-b-c-bc", False),
    ([("/a*b$", False)], "/abXb", False),  # end 'b' found past greedy 'b'
    # leading '*' = contains
    ([("*private*", False)], "/x/private/y", False),
    ([("*private*", False)], "/x/pub/y", True),
    # interior '$' combined with wildcard stays literal
    ([("/a$*x", False)], "/a$--x", False),
    ([("/a$*x", False)], "/a--x", True),
]


def test_wildcard_matching_engine_vs_oracle(spark):
    from oracle_crawler import _match_rules  # pytest rootdir puts tests/ on the path

    rows = []
    for i, (rules, path, want) in enumerate(_WC_CASES):
        rows.append((i, f"https://h.example{path}",
                     [{"pattern": p, "allow": a} for p, a in rules], want))
    df = spark.createDataFrame(
        rows,
        "i long, url string, rules array<struct<pattern:string,allow:boolean>>, want boolean",
    )
    got = {r["i"]: r["ok"] for r in df.select(
        "i", polite.allowed_col(F.col("url"), F.col("rules")).alias("ok")
    ).collect()}
    for i, (rules, path, want) in enumerate(_WC_CASES):
        assert got[i] == want, f"engine case {i}: rules={rules} path={path}"
        oracle = _match_rules(path, [{"pattern": p, "allow": a} for p, a in rules])
        assert oracle == want, f"oracle case {i}: rules={rules} path={path}"


def test_parser_keeps_wildcard_rules():
    body = "User-agent: *\nDisallow: /*.php$\nAllow: /fish*\n"
    got = polite.parse_robots_one(body)
    assert {r["pattern"] for r in got["rules"]} == {"/*.php$", "/fish*"}


def test_insane_crawl_delays_not_declared():
    """r5 review: 0 / negative / inf / nan crawl-delays are treated as not
    declared (0 would ANSI-divide-by-zero the round; inf/nan turn sched_ts
    into NaN, corrupting the deterministic replay order)."""
    for bad in ("0", "-1", "inf", "nan", "1e999"):
        p = polite.parse_robots_one(
            f"User-agent: *\nCrawl-delay: {bad}\nDisallow: /x\n"
        )
        assert p["crawl_delay"] is None, bad
    ok = polite.parse_robots_one("User-agent: *\nCrawl-delay: 2.5\n")
    assert ok["crawl_delay"] == 2.5


def test_robots_from_text_collapses_duplicate_hosts(spark):
    """r5 review: duplicate host captures used to emit duplicate rules
    rows, which the broadcast left-join would multiply into
    double-scheduled frontier urls; one deterministic row per host now."""
    raw = spark.createDataFrame(
        [("dup.example", "User-agent: *\nCrawl-delay: 1\n"),
         ("dup.example", "User-agent: *\nCrawl-delay: 9\n"),
         ("solo.example", "User-agent: *\nCrawl-delay: 2\n")],
        "host string, robots_txt string",
    )
    rows = polite.robots_from_text(raw).collect()
    assert len(rows) == 2
    by = {r["host"]: r["crawl_delay"] for r in rows}
    # lexicographically-greatest body wins deterministically
    assert by["dup.example"] == 9.0 and by["solo.example"] == 2.0
