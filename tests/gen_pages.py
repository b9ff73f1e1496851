"""Deterministic synthetic pages/seeds/robots generator (FIXTURES.md §2).

Every field is a pure function of (seed, row index) via md5 — no RNG state,
no wall clock — so any process (Spark executor, oracle crawler, bench) can
regenerate identical data.  Layout per FIXTURES.md:

* H hosts, Zipf-ish: ``host0.example`` is the mega-host with ~30% of pages
  (exercises salting/skew); a few hosts appear in messy-cased seed/link
  variants for canonicalization tests.
* 1-3 captures per url (as-of pick must choose the latest).
* html is built FROM the ground-truth text (title + body paragraphs +
  entities + script/style noise + <a href> outlinks), so the engine's
  extractor reproducing ``text`` byte-identically is a real check.
* outlinks: k ∈ [0,10] targets per page incl. duplicates, messy variants,
  and dangling urls (fetch-miss path).
"""

from __future__ import annotations

import hashlib
import os
from datetime import datetime, timedelta, timezone

SEED = 42
N_HOSTS = 20
LANGS = ["en", "fr", "es", "zh", "de"]
_EPOCH = datetime(2024, 1, 1, tzinfo=timezone.utc)

# Skew knob for the r5 skew bench (tools/skew_bench.py): when set, host0
# holds this PERCENT of pages instead of the default ~30%.  Read from the
# environment at import time so Spark's forked Python workers (which
# re-import this module) see the same value as the driver — set it BEFORE
# the first SparkSession launch.  When UNSET the original `% 10 < 3`
# formula is used, keeping every existing fixture, golden, and the pinned
# bench constant n_fetched = 682,032 bit-identical (the `% 100` variant
# buckets the hash differently even at 30).
_MEGA_PCT = os.environ.get("CRAWLSPARK_MEGA_PCT")

# Payload-weight knob for the r5 heavy-page scaling bench
# (tools/heavy_scaling.py): when set, the BASE body word count becomes
# this value instead of 20 (per-page jitter `+ _h(i) % 60` unchanged), so
# a page's text/html grow ~N/20× while EVERYTHING the crawl's control
# flow depends on — hosts, urls, outlinks, captures, langs, timestamps —
# stays a pure function of the page index and therefore bit-identical to
# the default corpus of the same page count.  The default fixture's
# ~600-byte pages understate real Common-Crawl payloads by 1-2 orders of
# magnitude; this knob restores a realistic per-url compute share without
# touching crawl semantics (fetch-order digests must match the light
# corpus — asserted by the bench tool).  Same import-time env contract
# as _MEGA_PCT above; unset ⇒ bit-identical legacy corpus.
_BODY_WORDS = int(os.environ.get("CRAWLSPARK_BODY_WORDS", "20"))


def _h(*parts) -> int:
    key = ":".join(str(p) for p in (SEED,) + parts)
    return int.from_bytes(hashlib.md5(key.encode()).digest()[:8], "big")


def host_of(i: int) -> str:
    if _MEGA_PCT is None:
        mega = _h(i, "host") % 10 < 3
    else:
        mega = _h(i, "host") % 100 < int(_MEGA_PCT)
    if mega:
        return "host0.example"
    return f"host{1 + _h(i, 'host2') % (N_HOSTS - 1)}.example"


def url_of(i: int) -> str:
    return f"https://{host_of(i)}/p/{i}"


def messy_url_of(i: int, variant: int) -> str:
    """Non-canonical spellings that must canonicalize to url_of(i)."""
    host = host_of(i)
    v = variant % 4
    if v == 0:
        return f"HTTPS://{host.upper()}:443/p/{i}"
    if v == 1:
        return f"https://{host}/a/../p/{i}#frag"
    if v == 2:
        return f"https://{host}/./p/{i}"
    return f"https://{host}/%70/{i}"  # %70 = 'p' (unreserved decode)


def lang_of(i: int) -> str:
    return LANGS[_h(i, "lang") % len(LANGS)]


def n_captures(i: int) -> int:
    return 1 + _h(i, "ncap") % 3


def capture_ts(i: int, c: int) -> datetime:
    return _EPOCH + timedelta(
        hours=_h(i, "ts") % (24 * 30), minutes=17 * c, seconds=_h(i, "tss", c) % 60
    )


def text_of(i: int, c: int) -> str:
    """Ground-truth extracted text for capture c of page i."""
    lang = lang_of(i)
    title = f"Title {lang} {i} c{c}"
    n_words = _BODY_WORDS + _h(i, "nw") % 60
    words = [f"{lang}w{_h(i, 'w', j) % 500}" for j in range(n_words)]
    if _h(i, "amp") % 5 == 0:
        words[0] = "a&b"
    if _h(i, "acc") % 7 == 0:
        words.append("caf\xe9")
    return " ".join([title] + words)


def is_latin1(i: int) -> bool:
    return _h(i, "enc") % 11 == 0


def outlinks_of(i: int, n_pages: int) -> list[str]:
    k = _h(i, "k") % 11
    links = []
    for t in range(k):
        j = _h(i, "t", t) % n_pages
        if _h(i, "messy", t) % 4 == 0:
            links.append(messy_url_of(j, _h(i, "mv", t)))
        else:
            links.append(url_of(j))
    if k and _h(i, "dang") % 7 == 0:
        links.append(f"https://dangling{_h(i, 'dh') % 50}.example/x/{i}")
    if k >= 2:
        links.append(links[0])  # guaranteed duplicate link
    return links


def html_of(i: int, c: int, n_pages: int) -> bytes:
    text = text_of(i, c)
    toks = text.split()
    title = " ".join(toks[:4])
    body_words = toks[4:]
    # split body into paragraphs of 10 words
    paras = [
        " ".join(body_words[p : p + 10]) for p in range(0, len(body_words), 10)
    ]
    esc = lambda s: s.replace("&", "&amp;").replace("<", "&lt;")
    parts = [
        "<!DOCTYPE html>\n<html>\n<head>\n",
        f"  <title>{esc(title)}</title>\n",
        '  <meta charset="utf-8">\n' if not is_latin1(i) else '  <meta charset="latin-1">\n',
        "  <style>body { color: #000; }</style>\n",
        "</head>\n<body>\n",
        "<script>var tracker = 'ignore-me';</script>\n",
    ]
    for p in paras:
        parts.append(f"  <p>{esc(p)}</p>\n")
    for href in outlinks_of(i, n_pages):
        parts.append(f'  <a href="{esc(href)}"></a>\n')
    parts.append("</body>\n</html>\n")
    s = "".join(parts)
    return s.encode("latin-1" if is_latin1(i) else "utf-8")


def page_rows(i: int, n_pages: int) -> list[dict]:
    """All capture rows for page i (url, warc_ts, html, text, lang)."""
    rows = []
    for c in range(n_captures(i)):
        rows.append(
            {
                "url": url_of(i),
                "warc_ts": capture_ts(i, c),
                "html": html_of(i, c, n_pages),
                "text": text_of(i, c),
                "lang": lang_of(i),
            }
        )
    return rows


def gen_pages_local(n_pages: int) -> list[dict]:
    out: list[dict] = []
    for i in range(n_pages):
        out.extend(page_rows(i, n_pages))
    return out


def gen_seeds(n_pages: int, n_seeds: int) -> list[str]:
    """Seed list: first pages of several hosts, some in messy spellings."""
    seeds = []
    for s in range(n_seeds):
        i = _h("seed", s) % n_pages
        if s % 3 == 0:
            seeds.append(messy_url_of(i, s))
        else:
            seeds.append(url_of(i))
    return seeds


def gen_robots() -> list[dict]:
    """Robots rows: mega-host fast, some hosts slow, one deny rule."""
    rows = [
        {
            "host": "host0.example",
            "rules": [],
            "crawl_delay": 0.5,
        },
        {
            "host": "host3.example",
            "rules": [{"pattern": "/p/", "allow": False}],
            "crawl_delay": 1.0,
        },
        {
            "host": "host5.example",
            "rules": [{"pattern": "/", "allow": True}, {"pattern": "/private", "allow": False}],
            "crawl_delay": 4.0,
        },
    ]
    for h in (1, 2, 4, 6, 7):
        rows.append(
            {"host": f"host{h}.example", "rules": [], "crawl_delay": 1.0 + (h % 3)}
        )
    return rows


def pages_df(spark, n_pages: int, distributed: bool = False):
    """Pages DataFrame; distributed generation for bench-scale n."""
    from crawlspark.schemas import PAGES_SCHEMA

    if not distributed:
        return spark.createDataFrame(gen_pages_local(n_pages), PAGES_SCHEMA)

    import pandas as pd

    def _gen(batches):
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                rows.extend(page_rows(int(i), n_pages))
            yield pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text", "lang"])

    return (
        spark.range(n_pages)
        .repartition(spark.sparkContext.defaultParallelism * 2)
        .mapInPandas(_gen, PAGES_SCHEMA)
    )


def robots_df(spark):
    from crawlspark.schemas import ROBOTS_SCHEMA

    return spark.createDataFrame(gen_robots(), ROBOTS_SCHEMA)
