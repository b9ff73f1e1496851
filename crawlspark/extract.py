"""HTML/XML → text and outlink extraction (SURVEY.md §2 J1-J2).

The reference parses NCBI eFetch XML into title+abstract text (BASELINE.json
north_star: "eFetch/XML-to-text parsing … byte-identical extracted text per
url").  This module generalizes that to Common-Crawl-style HTML while keeping
the PubMed-XML path, as Arrow-batched pandas UDFs over ``html: binary``.

Determinism contract (byte-identical output per url):
* stdlib parsers only (``html.parser``, ``xml.etree``) — no environment-
  dependent libs (SURVEY.md §7 hard-part 2);
* decoding: UTF-8 strict, falling back to Latin-1 (which never fails);
* extracted text := the whitespace-split tokens of the <title> plus all text
  nodes under <body> (excluding <script>/<style>), in document order, joined
  by single spaces — one unambiguous normal form, stable across formatting;
* PubMed-style XML (root contains PubmedArticle / eFetch shapes): tokens of
  ArticleTitle + AbstractText elements, same join rule.
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET
from html import unescape
from html.parser import HTMLParser
from urllib.parse import urljoin

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    StringType,
    StructField,
    StructType,
)

_SKIP_TAGS = {"script", "style"}
_XML_HINT = re.compile(rb"^\s*<\?xml|<PubmedArticle|<PubmedArticleSet", re.I)


def decode_bytes(b: bytes | None) -> str | None:
    if b is None:
        return None
    try:
        return b.decode("utf-8")
    except UnicodeDecodeError:
        return b.decode("latin-1")


class _TextAndLinks(HTMLParser):
    """Single-pass collector of title/body tokens and <a href> targets.

    ``respect_robots_directives=True`` adds RFC-9309-adjacent in-page link
    semantics: ``<a rel="... nofollow ...">`` hrefs are skipped and a
    ``<meta name="robots" content="... nofollow ...">`` suppresses every
    link on the page (applied at ``close()`` so a late meta still wins);
    ``noindex`` is surfaced as a flag for the caller.  Default False keeps
    the byte-identical extraction contract pinned by the goldens.
    """

    def __init__(self, respect_robots_directives: bool = False) -> None:
        super().__init__(convert_charrefs=True)
        self._tokens_scoped: list[str] = []  # title/body only
        self._tokens_all: list[str] = []  # fallback when no <body> present
        self.links: list[str] = []
        self.meta_nofollow = False
        self.meta_noindex = False
        self._respect = respect_robots_directives
        self._skip_depth = 0
        self._in_title = False
        self._in_body = False
        self._saw_body_tag = False

    @property
    def tokens(self) -> list[str]:
        return self._tokens_scoped if self._saw_body_tag else self._tokens_all

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in _SKIP_TAGS:
            self._skip_depth += 1
        elif tag == "title":
            self._in_title = True
        elif tag == "body":
            self._in_body = True
            self._saw_body_tag = True
        elif tag == "meta":
            a = {k: (v or "") for k, v in attrs}
            if a.get("name", "").lower() == "robots":
                directives = {
                    d.strip().lower() for d in a.get("content", "").split(",")
                }
                self.meta_nofollow |= "nofollow" in directives or "none" in directives
                self.meta_noindex |= "noindex" in directives or "none" in directives
        if tag == "a":
            hrefs = []
            rel = None
            for k, v in attrs:
                if k == "href" and v:
                    hrefs.append(v)
                elif k == "rel" and v:
                    rel = v
            if self._respect and rel and "nofollow" in rel.lower().split():
                return
            self.links.extend(hrefs)

    def close(self) -> None:
        super().close()
        if self._respect and self.meta_nofollow:
            self.links = []

    def handle_endtag(self, tag: str) -> None:
        if tag in _SKIP_TAGS and self._skip_depth > 0:
            self._skip_depth -= 1
        elif tag == "title":
            self._in_title = False
        elif tag == "body":
            self._in_body = False

    def handle_data(self, data: str) -> None:
        if self._skip_depth:
            return
        toks = data.split()
        if not toks:
            return
        self._tokens_all.extend(toks)
        if self._in_title or self._in_body:
            self._tokens_scoped.extend(toks)


def _extract_pubmed_xml(s: str) -> str:
    try:
        root = ET.fromstring(s)
    except ET.ParseError:
        return ""
    tokens: list[str] = []
    for tag in ("ArticleTitle", "AbstractText"):
        for el in root.iter(tag):
            tokens.extend("".join(el.itertext()).split())
    return " ".join(tokens)


def extract_text_one(html_bytes: bytes | None) -> str | None:
    """Pure-Python extraction for one page; the UDF maps this per Arrow batch.

    Mirrors the reference's eFetch XML parsing for PubMed-shaped documents
    and generalizes to HTML; output normal form is defined module-level.
    """
    if html_bytes is None:
        return None
    s = decode_bytes(html_bytes)
    if s is None:
        return None
    if _XML_HINT.search(html_bytes[:4096]):
        return _extract_pubmed_xml(s)
    p = _TextAndLinks()
    try:
        p.feed(s)
        p.close()
    except Exception:
        pass  # malformed markup: keep whatever tokens were collected
    return " ".join(p.tokens)


def extract_links_one(html_bytes: bytes | None, base_url: str | None) -> list[str]:
    if html_bytes is None:
        return []
    s = decode_bytes(html_bytes)
    if _XML_HINT.search(html_bytes[:4096]):
        return []  # reference uses eLink for citations; XML pages carry no hrefs
    p = _TextAndLinks()
    try:
        p.feed(s)
        p.close()
    except Exception:
        pass
    if base_url:
        return [urljoin(base_url, h) for h in p.links]
    return list(p.links)


def extract_both_one(
    html_bytes: bytes | None, base_url: str | None
) -> tuple[str | None, list[str]]:
    """One decode + one parse → (text, links).  Field-identical to
    (extract_text_one, extract_links_one) — property-tested — but the hot
    loop pays the HTML parse once instead of twice."""
    if html_bytes is None:
        return None, []
    s = decode_bytes(html_bytes)
    if s is None:
        return None, []
    if _XML_HINT.search(html_bytes[:4096]):
        return _extract_pubmed_xml(s), []
    p = _TextAndLinks()
    try:
        p.feed(s)
        p.close()
    except Exception:
        pass  # malformed markup: keep whatever was collected
    links = [urljoin(base_url, h) for h in p.links] if base_url else list(p.links)
    return " ".join(p.tokens), links


@pandas_udf(StringType())
def text_udf(html: pd.Series) -> pd.Series:
    """J1: byte-identical text per url (BASELINE.json input_hint)."""
    return html.map(extract_text_one)


@pandas_udf(ArrayType(StringType()))
def links_udf(html: pd.Series, url: pd.Series) -> pd.Series:
    """J2: outlink extraction → array<string> (explode downstream)."""
    return pd.Series(
        [extract_links_one(h, u) for h, u in zip(html, url)], index=html.index
    )


_TEXT_LINKS_TYPE = StructType(
    [
        StructField("text", StringType(), True),
        StructField("links", ArrayType(StringType()), True),
    ]
)


@pandas_udf(_TEXT_LINKS_TYPE)
def text_links_udf(html: pd.Series, url: pd.Series) -> pd.DataFrame:
    """J1+J2 fused: the fat ``html`` column crosses Arrow ONCE and is parsed
    ONCE per page (text_udf + links_udf each re-decoded and re-parsed it).
    Used by the crawl hot loop; the single-output UDFs remain the narrow
    API."""
    pairs = [extract_both_one(h, u) for h, u in zip(html, url)]
    return pd.DataFrame(
        {"text": [t for t, _ in pairs], "links": [ls for _, ls in pairs]},
        index=html.index,
    )


# stop Catalyst from duplicating the expensive UDF into collapsed
# projections when both struct fields are read (same rationale as
# urlnorm.canonicalize_udf — pure function, flag only inhibits re-evaluation)
text_links_udf = text_links_udf.asNondeterministic()


def extract_links_polite_one(
    html_bytes: bytes | None, base_url: str | None
) -> tuple[list[str], bool, bool]:
    """Outlinks honoring in-page robots directives: rel=nofollow anchors
    skipped, meta-robots nofollow clears the page's links; returns
    ``(links, meta_nofollow, meta_noindex)`` so the crawl loop can also
    drop noindex'd pages from the text sink."""
    if html_bytes is None:
        return [], False, False
    s = decode_bytes(html_bytes)
    if s is None or _XML_HINT.search(html_bytes[:4096]):
        return [], False, False
    p = _TextAndLinks(respect_robots_directives=True)
    try:
        p.feed(s)
    except Exception:
        pass
    finally:
        # close() applies the meta-robots nofollow link wipe; without the
        # finally, a feed() exception after the <meta> was parsed would
        # leak the partially collected links of a nofollow page (r2 ADVICE)
        try:
            p.close()
        except Exception:
            if p.meta_nofollow:
                p.links = []
    links = [urljoin(base_url, h) for h in p.links] if base_url else list(p.links)
    return links, p.meta_nofollow, p.meta_noindex


_LINKS_POLITE_TYPE = StructType(
    [
        StructField("links", ArrayType(StringType()), True),
        StructField("meta_nofollow", BooleanType(), True),
        StructField("meta_noindex", BooleanType(), True),
    ]
)


@pandas_udf(_LINKS_POLITE_TYPE)
def links_polite_udf(html: pd.Series, url: pd.Series) -> pd.DataFrame:
    """J2 with in-page robots semantics (opt-in; the default link path is
    byte-pinned by goldens and ignores directives like the reference)."""
    triples = [extract_links_polite_one(h, u) for h, u in zip(html, url)]
    return pd.DataFrame(
        {
            "links": [t[0] for t in triples],
            "meta_nofollow": [t[1] for t in triples],
            "meta_noindex": [t[2] for t in triples],
        },
        index=html.index,
    )


links_polite_udf = links_polite_udf.asNondeterministic()


# ---------------------------------------------------- anchor-text extraction

class _Anchors(HTMLParser):
    """Collect (href, anchor text) pairs; anchors don't nest in HTML, so a
    new <a> implicitly closes the previous one."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.pairs: list[tuple[str, str]] = []
        self._href: str | None = None
        self._parts: list[str] = []
        self._skip_depth = 0

    def _close_anchor(self) -> None:
        if self._href is not None:
            self.pairs.append((self._href, " ".join("".join(self._parts).split())))
        self._href = None
        self._parts = []

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in _SKIP_TAGS:
            self._skip_depth += 1
        elif tag == "a":
            self._close_anchor()
            href = next((v for k, v in attrs if k == "href" and v), None)
            self._href = href

    def handle_endtag(self, tag: str) -> None:
        if tag in _SKIP_TAGS:
            self._skip_depth = max(0, self._skip_depth - 1)
        elif tag == "a":
            self._close_anchor()

    def handle_data(self, data: str) -> None:
        if self._href is not None and not self._skip_depth:
            self._parts.append(data)

    def close(self) -> None:
        super().close()
        self._close_anchor()


def extract_anchors_one(
    html_bytes: bytes | None, base_url: str | None
) -> list[dict]:
    """(href → absolute url, anchor text) pairs in document order — link
    context for frontier prioritization (anchor text is the classic
    relevance signal) and weak-label mining.  Same decode/normalize
    contract as the other extractors; unresolvable hrefs are skipped."""
    s = decode_bytes(html_bytes)
    if s is None:
        return []
    p = _Anchors()
    try:
        p.feed(s)
        p.close()
    except Exception:
        return []
    out = []
    for href, text in p.pairs:
        try:
            absu = urljoin(base_url or "", href.strip())
        except Exception:
            continue
        if absu:
            out.append({"url": absu, "anchor": text})
    return out


_ANCHOR_TYPE = ArrayType(
    StructType(
        [StructField("url", StringType()), StructField("anchor", StringType())]
    )
)


@pandas_udf(_ANCHOR_TYPE)
def anchors_udf(html: pd.Series, url: pd.Series) -> pd.Series:
    """Arrow-batched anchor extraction: (html, base url) → [(url, anchor)]."""
    return pd.Series(
        [extract_anchors_one(h, u) for h, u in zip(html, url)], index=html.index
    )


anchors_udf = anchors_udf.asNondeterministic()


# ---------------------------------------------------- main-content extraction

_BLOCK_TAGS = {
    "p", "div", "li", "h1", "h2", "h3", "h4", "h5", "h6", "td", "th",
    "article", "section", "blockquote", "pre", "br", "tr", "ul", "ol",
    "table", "dd", "dt", "figcaption",
}
_CHROME_TAGS = {"nav", "footer", "aside", "header", "form"}


class _Blocks(HTMLParser):
    """Split the document into text blocks at block-level tag boundaries,
    tracking per-block link chars and whether the block sits inside page
    chrome (<nav>/<footer>/<aside>/<header>/<form>)."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[dict] = []
        self._parts: list[str] = []
        self._link_chars = 0
        self._skip_depth = 0
        self._a_depth = 0
        self._chrome_depth = 0

    def _flush(self) -> None:
        text = " ".join("".join(self._parts).split())
        if text:
            self.blocks.append(
                {
                    "text": text,
                    "link_chars": min(self._link_chars, len(text)),
                    "chrome": self._chrome_depth > 0,
                }
            )
        self._parts = []
        self._link_chars = 0

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in _SKIP_TAGS:
            self._skip_depth += 1
        elif tag in _CHROME_TAGS:
            self._flush()
            self._chrome_depth += 1
        elif tag in _BLOCK_TAGS:
            self._flush()
        elif tag == "a":
            self._a_depth += 1

    def handle_endtag(self, tag: str) -> None:
        if tag in _SKIP_TAGS:
            self._skip_depth = max(0, self._skip_depth - 1)
        elif tag in _CHROME_TAGS:
            self._flush()
            self._chrome_depth = max(0, self._chrome_depth - 1)
        elif tag in _BLOCK_TAGS:
            self._flush()
        elif tag == "a":
            self._a_depth = max(0, self._a_depth - 1)

    def handle_data(self, data: str) -> None:
        if self._skip_depth:
            return
        self._parts.append(data)
        if self._a_depth:
            self._link_chars += len(" ".join(data.split()))

    def close(self) -> None:
        super().close()
        self._flush()


def extract_main_one(
    html_bytes: bytes | None,
    min_words: int = 8,
    max_link_density: float = 0.35,
    neighbor_min_words: int = 3,
) -> str | None:
    """Boilerplate-removed main content (jusText/boilerpipe-style shallow
    heuristics, deterministic stdlib-only):

    1. split into text blocks at block-level tag boundaries;
    2. a block is GOOD if it has ≥ ``min_words`` words, link density
       (anchor chars / chars) ≤ ``max_link_density``, and is not inside
       page chrome (<nav>/<footer>/<aside>/<header>/<form>);
    3. smoothing: a short non-chrome block (≥ ``neighbor_min_words``
       words, e.g. a heading) adjacent to a GOOD block is kept too;
    4. kept blocks join with a single blank line, in document order.

    Same determinism contract as :func:`extract_text_one` (UTF-8-strict →
    Latin-1 decode, whitespace-normalized per block).  Link lists, navs,
    and footers drop out via the link-density and chrome rules — this is
    the "text" a pretraining corpus wants, where the byte-pinned
    :func:`extract_text_one` is the "every visible token" normal form the
    crawl-ordering contract pins.
    """
    s = decode_bytes(html_bytes)
    if s is None:
        return None
    p = _Blocks()
    try:
        p.feed(s)
        p.close()
    except Exception:
        return None
    blocks = p.blocks
    n = len(blocks)
    good = [False] * n
    for i, b in enumerate(blocks):
        words = len(b["text"].split())
        dens = b["link_chars"] / len(b["text"]) if b["text"] else 1.0
        good[i] = (
            not b["chrome"] and words >= min_words and dens <= max_link_density
        )
    keep = list(good)
    for i, b in enumerate(blocks):
        if good[i] or b["chrome"]:
            continue
        words = len(b["text"].split())
        dens = b["link_chars"] / len(b["text"]) if b["text"] else 1.0
        if (
            words >= neighbor_min_words
            and dens <= max_link_density
            and ((i > 0 and good[i - 1]) or (i + 1 < n and good[i + 1]))
        ):
            keep[i] = True
    return "\n\n".join(b["text"] for i, b in enumerate(blocks) if keep[i])


@pandas_udf(StringType())
def main_text_udf(html: pd.Series) -> pd.Series:
    """Arrow-batched main-content extraction over ``html: binary``."""
    return html.map(extract_main_one)


main_text_udf = main_text_udf.asNondeterministic()


__all__ = [
    "text_udf",
    "main_text_udf",
    "extract_main_one",
    "anchors_udf",
    "extract_anchors_one",
    "links_udf",
    "text_links_udf",
    "links_polite_udf",
    "extract_text_one",
    "extract_links_one",
    "extract_both_one",
    "extract_links_polite_one",
    "decode_bytes",
]
