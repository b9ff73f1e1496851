"""URL-level filtering — the pre-fetch gate of a web-scale crawl.

At 10^10-frontier scale the cheapest byte is the one never fetched:
URL-string heuristics (session ids, calendar traps, binary extensions,
pathological length/depth) and host blocklists drop a large fraction of
frontier candidates before any scheduling or fetching happens.  Everything
here is built-in expressions (codegen, pushable); url parsing uses the
``try_`` variants so malformed junk is FLAGGED, never a crash — under
Spark 4's default ANSI mode ``parse_url`` throws on exactly the URLs this
module exists to drop.

Flag definitions follow the common public crawl-pipeline heuristics
(CommonCrawl/C4/FineWeb-style URL filtering); thresholds are arguments.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from . import urlnorm

# crawler-trap & junk signals as single-pass regexes (case-insensitive
# where the wild web needs it)
_SESSION_RE = r"(?i)[?&;](sid|sessionid|phpsessid|jsessionid|cfid|cftoken|s_kwcid)="
# calendar LISTING pages end at the date (/2026/03/ or /2026-03-04);
# date-permalink ARTICLES (/2026/03/04/slug) continue past it and are some
# of the highest-quality corpus content — they must NOT be flagged
_CALENDAR_RE = r"/\d{4}[-/]\d{1,2}([-/]\d{1,2})?/?$"
# anchored to the end of the PATH (a ?file=report.pdf query value must not
# flag the HTML page serving it)
_BINARY_EXT_RE = (
    r"(?i)\.(jpe?g|png|gif|webp|bmp|ico|svg|tiff?|mp3|mp4|avi|mov|mkv|wmv|flv|"
    r"ogg|wav|zip|gz|bz2|xz|7z|rar|tar|exe|msi|dmg|iso|bin|apk|jar|"
    r"pdf|ppsx?|pptx?|xlsx?|docx?|epub|swf|css|js|woff2?|ttf|eot)/?$"
)

# single source of truth for flag names: url_flags aliases and flag_urls'
# url_keep conjunction both derive from this list
FLAG_NAMES = (
    "f_too_long",
    "f_too_deep",
    "f_too_many_params",
    "f_session_id",
    "f_calendar",
    "f_binary_ext",
    "f_path_loop",
    "f_unparsable",
)


def url_flags(
    url_col: Column,
    max_len: int = 200,
    max_depth: int = 8,
    max_params: int = 6,
) -> list[Column]:
    """Boolean spam/trap flag columns for a URL column (all built-ins);
    order matches :data:`FLAG_NAMES`."""
    path = F.try_parse_url(url_col, F.lit("PATH"))
    query = F.try_parse_url(url_col, F.lit("QUERY"))
    p = F.coalesce(path, F.lit(""))
    q = F.coalesce(query, F.lit(""))
    cols = [
        F.length(url_col) > max_len,
        F.size(F.split(p, "/")) - 1 > max_depth,
        F.size(F.split(q, "&")) > max_params,
        url_col.rlike(_SESSION_RE),
        p.rlike(_CALENDAR_RE),
        p.rlike(_BINARY_EXT_RE),
        # /a/b/a/b/a/b… repetition — the classic symlink/router loop trap
        p.rlike(r"(/[^/]+/[^/]+)\1\1"),
        # parser rejected it entirely (malformed junk)
        path.isNull() & url_col.isNotNull(),
    ]
    return [c.alias(n) for c, n in zip(cols, FLAG_NAMES)]


def flag_urls(df: DataFrame, url_col: str = "url", **thresholds) -> DataFrame:
    """Append the flag columns plus ``url_keep`` (true = no flag fired)."""
    flags = url_flags(F.col(url_col), **thresholds)
    out = df.select("*", *flags)
    keep = F.lit(True)
    for n in FLAG_NAMES:
        keep = keep & ~F.col(n)
    return out.withColumn("url_keep", keep)


def filter_urls(df: DataFrame, url_col: str = "url", **thresholds) -> DataFrame:
    """Rows passing every URL heuristic, original columns only."""
    flagged = flag_urls(df, url_col, **thresholds)
    return flagged.filter(F.col("url_keep")).select(*df.columns)


def host_suffixes(host_col: Column) -> Column:
    """All dot-suffixes of a host (``a.b.c`` → [a.b.c, b.c, c]) — the join
    key set for suffix blocklists, built with sequence+transform (no UDF).
    Uncapped: a cap would make deep-subdomain blocklist entries silently
    unmatchable (even against the exact host they name); label counts are
    DNS-bounded, so the array stays small.
    """
    parts = F.split(host_col, r"\.")
    n = F.size(parts)
    return F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.concat_ws(".", F.slice(parts, n - i + 1, i)),
    )


def apply_host_blocklist(
    df: DataFrame,
    blocked: DataFrame,
    url_col: str = "url",
    blocked_col: str = "host_suffix",
) -> DataFrame:
    """Drop rows whose url host matches any blocklist entry by dot-suffix
    (``spam.example.com`` is blocked by entries ``spam.example.com``,
    ``example.com``, or ``com`` — standard blocklist semantics).

    Scale shape: joins stay on thin host keys only — DISTINCT frontier
    hosts → explode the suffix set → semi join the broadcast blocklist →
    the blocked-host set, then one anti join of the frontier against it on
    ``host``.  Row payloads (html, text) never enter a join key and never
    shuffle; no regex scan over patterns, no per-pattern pass.  The
    blocked-host set is ⊆ the frontier's distinct hosts and is broadcast —
    at 10^10 urls distinct hosts are ~10^7 and blocked ones a fraction of
    that.
    """
    b = F.broadcast(
        blocked.select(F.col(blocked_col).alias("__sfx")).distinct()
    )
    hosts = df.select(urlnorm.host(F.col(url_col)).alias("__host")).distinct()
    blocked_hosts = (
        hosts.select(
            "__host", F.explode(host_suffixes(F.col("__host"))).alias("__sfx")
        )
        .join(b, "__sfx", "left_semi")
        .select("__host")
        .distinct()
    )
    return (
        df.withColumn("__host", urlnorm.host(F.col(url_col)))
        .join(F.broadcast(blocked_hosts), "__host", "left_anti")
        .drop("__host")
    )
