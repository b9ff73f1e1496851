"""URL-level filtering — the pre-fetch gate of a web-scale crawl.

At 10^10-frontier scale the cheapest byte is the one never fetched:
URL-string heuristics (session ids, calendar traps, binary extensions,
pathological length/depth) and host blocklists drop a large fraction of
frontier candidates before any scheduling or fetching happens.  Everything
here is built-in expressions (codegen, pushable) except nothing — there is
deliberately no Python in this module's hot path.

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
_CALENDAR_RE = r"/\d{4}[-/]\d{1,2}([-/]\d{1,2})?(/|$)"
_BINARY_EXT_RE = (
    r"(?i)\.(jpe?g|png|gif|webp|bmp|ico|svg|tiff?|mp3|mp4|avi|mov|mkv|wmv|flv|"
    r"ogg|wav|zip|gz|bz2|xz|7z|rar|tar|exe|msi|dmg|iso|bin|apk|jar|"
    r"pdf|ppsx?|pptx?|xlsx?|docx?|epub|swf|css|js|woff2?|ttf|eot)([?#]|$)"
)


def url_flags(
    url_col: Column,
    max_len: int = 200,
    max_depth: int = 8,
    max_params: int = 6,
) -> list[Column]:
    """Boolean spam/trap flag columns for a URL column (all built-ins)."""
    path = F.parse_url(url_col, F.lit("PATH"))
    query = F.parse_url(url_col, F.lit("QUERY"))
    return [
        (F.length(url_col) > max_len).alias("f_too_long"),
        (
            F.size(F.split(F.coalesce(path, F.lit("")), "/")) - 1 > max_depth
        ).alias("f_too_deep"),
        (
            F.size(F.split(F.coalesce(query, F.lit("")), "&")) > max_params
        ).alias("f_too_many_params"),
        url_col.rlike(_SESSION_RE).alias("f_session_id"),
        F.coalesce(path, F.lit("")).rlike(_CALENDAR_RE).alias("f_calendar"),
        url_col.rlike(_BINARY_EXT_RE).alias("f_binary_ext"),
        # /a/b/a/b/a/b… repetition — the classic symlink/router loop trap
        F.coalesce(path, F.lit("")).rlike(r"(/[^/]+/[^/]+)\1\1").alias("f_path_loop"),
    ]


def flag_urls(df: DataFrame, url_col: str = "url", **thresholds) -> DataFrame:
    """Append the flag columns plus ``url_keep`` (true = no flag fired)."""
    flags = url_flags(F.col(url_col), **thresholds)
    out = df.select("*", *flags)
    names = [f"f_{n}" for n in (
        "too_long", "too_deep", "too_many_params", "session_id",
        "calendar", "binary_ext", "path_loop",
    )]
    keep = F.lit(True)
    for n in names:
        keep = keep & ~F.col(n)
    return out.withColumn("url_keep", keep)


def filter_urls(df: DataFrame, url_col: str = "url", **thresholds) -> DataFrame:
    """Rows passing every URL heuristic, original columns only."""
    flagged = flag_urls(df, url_col, **thresholds)
    return flagged.filter(F.col("url_keep")).select(*df.columns)


def host_suffixes(host_col: Column, max_labels: int = 6) -> Column:
    """All dot-suffixes of a host (``a.b.c`` → [a.b.c, b.c, c]) — the join
    key set for suffix blocklists, built with sequence+transform (no UDF).
    """
    parts = F.split(host_col, r"\.")
    n = F.least(F.size(parts), F.lit(max_labels))
    return F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.concat_ws(".", F.slice(parts, F.size(parts) - i + 1, i)),
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
    hosts → explode the (bounded, ≤6) suffix set → semi join the broadcast
    blocklist → the blocked-host set, then one anti join of the frontier
    against it on ``host``.  Row payloads (html, text) never enter a join
    key and never shuffle; no regex scan over patterns, no per-pattern
    pass.  The blocked-host set is ⊆ the frontier's distinct hosts and is
    broadcast — at 10^10 urls distinct hosts are ~10^7 and blocked ones a
    fraction of that.
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
