from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from crawlspark.urlnorm import canonicalize_one, host_one

GOLDEN = [
    # (input, canonical)
    ("https://Example.COM/path", "https://example.com/path"),
    ("HTTP://EXAMPLE.com:80/a", "http://example.com/a"),
    ("https://example.com:443/a", "https://example.com/a"),
    ("https://example.com:8080/a", "https://example.com:8080/a"),
    ("https://example.com/a#frag", "https://example.com/a"),
    ("https://example.com/a/./b", "https://example.com/a/b"),
    ("https://example.com/a/../b", "https://example.com/b"),
    ("https://example.com/a/b/..", "https://example.com/a/"),
    ("https://example.com", "https://example.com/"),
    ("https://example.com?q=1", "https://example.com/?q=1"),
    ("https://example.com/%7Euser", "https://example.com/~user"),
    ("https://example.com/%70/1", "https://example.com/p/1"),
    ("https://example.com/a%2fb", "https://example.com/a%2Fb"),
    ("https://example.com./a", "https://example.com/a"),
    ("example.com/x", "http://example.com/x"),
    ("https://u:p@Example.com/x", "https://u:p@example.com/x"),
    ("https://[2001:DB8::1]:443/x", "https://[2001:db8::1]/x"),
    ("HTTPS://HOST0.EXAMPLE:443/p/7", "https://host0.example/p/7"),
    ("https://host0.example/a/../p/7#frag", "https://host0.example/p/7"),
    ("  https://example.com/a  ", "https://example.com/a"),
    ("https://example.com/a?b=%3d&c=2", "https://example.com/a?b=%3D&c=2"),
]


@pytest.mark.parametrize("raw,want", GOLDEN)
def test_canonicalize_golden(raw, want):
    assert canonicalize_one(raw) == want


@pytest.mark.parametrize("raw,want", [(r, w) for r, w in GOLDEN])
def test_canonicalize_idempotent_golden(raw, want):
    assert canonicalize_one(want) == want


@given(
    st.text(
        alphabet=st.characters(min_codepoint=33, max_codepoint=126), max_size=60
    )
)
@settings(max_examples=300, deadline=None)
def test_canonicalize_idempotent_property(s):
    url = "https://example.com/" + s
    c = canonicalize_one(url)
    assert canonicalize_one(c) == c


def test_host():
    assert host_one("HTTPS://Foo.Example:443/x") == "foo.example"
    assert host_one("https://u@bar.example:8080/x") == "bar.example"
    assert host_one("https://[2001:db8::1]/x") == "[2001:db8::1]"


def test_canonicalize_udf_matches_python(spark):
    from pyspark.sql import functions as F

    from crawlspark import urlnorm

    raws = [r for r, _ in GOLDEN]
    df = spark.createDataFrame([(r,) for r in raws], "url string")
    got = [
        r["c"]
        for r in df.select(urlnorm.canonicalize(F.col("url")).alias("c"))
        .orderBy("c")
        .collect()
    ]
    want = sorted(canonicalize_one(r) for r in raws)
    assert got == want


def test_host_col_matches_on_canonical(spark):
    from pyspark.sql import functions as F

    from crawlspark import urlnorm

    canon = [w for _, w in GOLDEN]
    df = spark.createDataFrame([(c,) for c in canon], "url string")
    got = [
        r["h"]
        for r in df.select(urlnorm.host(F.col("url")).alias("h")).collect()
    ]
    want = [host_one(c) for c in canon]
    assert got == want


def test_resolve_aliases_chains_cycles_and_identity(spark):
    from crawlspark import urlnorm

    aliases = spark.createDataFrame(
        [
            ("http://a.ex/1", "http://a.ex/2"),   # chain 1 of 2
            ("http://a.ex/2", "http://a.ex/3"),   # chain 2 of 2
            ("http://c.ex/x", "http://c.ex/y"),   # 2-cycle
            ("http://c.ex/y", "http://c.ex/x"),
            ("http://m.ex/old", "http://m.ex/new"),  # single hop
        ],
        "src string, dst string",
    )
    urls = spark.createDataFrame(
        [(u,) for u in ["http://a.ex/1", "http://c.ex/x", "http://m.ex/old", "http://plain.ex/"]],
        "url string",
    )
    got = {r["url"]: r for r in urlnorm.resolve_aliases(urls, aliases, max_hops=5).collect()}
    assert got["http://a.ex/1"]["resolved_url"] == "http://a.ex/3"
    assert got["http://a.ex/1"]["hops"] == 2
    assert got["http://m.ex/old"]["resolved_url"] == "http://m.ex/new"
    assert got["http://m.ex/old"]["hops"] == 1
    assert got["http://plain.ex/"]["resolved_url"] == "http://plain.ex/"
    assert got["http://plain.ex/"]["hops"] == 0
    # cycle: still rewriting at the cap -> hops == max_hops sentinel
    assert got["http://c.ex/x"]["hops"] == 5
    assert got["http://c.ex/x"]["resolved_url"] in ("http://c.ex/x", "http://c.ex/y")

    # python oracle on a random alias forest
    import random

    rng = random.Random(3)
    nodes = [f"http://r.ex/{i}" for i in range(40)]
    amap = {}
    for i in range(0, 30):  # forest edges only (i -> j with j > i: acyclic)
        j = rng.randint(i + 1, 39)
        amap[nodes[i]] = nodes[j]
    adf = spark.createDataFrame(list(amap.items()), "src string, dst string")
    udf_ = spark.createDataFrame([(n,) for n in nodes], "url string")
    res = {r["url"]: (r["resolved_url"], r["hops"]) for r in
           urlnorm.resolve_aliases(udf_, adf, max_hops=8).collect()}
    for n in nodes:
        cur, hops = n, 0
        while cur in amap and hops < 8:
            cur = amap[cur]
            hops += 1
        assert res[n] == (cur, hops), n
