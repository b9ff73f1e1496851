"""Robots rules + crawl-delay politeness (SURVEY.md §2 D2, F3).

The reference hardcodes NCBI's rate policy as a ``time.sleep`` between
requests; generalized per BASELINE.json to per-host robots.txt allow/deny
rules and crawl-delay token budgets.

Rule semantics (RFC 9309): a rule is a path pattern (``*`` = any character
sequence, trailing ``$`` = end anchor, else literal prefix) with an
allow/deny flag; the most specific (longest) matching pattern wins, ALLOW
breaking same-length ties (§2.2.2); no match → allowed.  Matching is pure
built-in string/higher-order functions (``filter``/``aggregate`` over the
rules array, ``locate`` over wildcard segments) — stays in whole-stage
codegen, no Python, no per-row regex compilation.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    StringType,
    StructField,
    StructType,
)

from . import config


def path_of(url_col: Column) -> Column:
    """Path+query of a canonical URL (scheme://host[:port] stripped)."""
    p = F.regexp_replace(url_col, r"^[a-z][a-z0-9+.-]*://[^/]*", "")
    return F.when(p == "", "/").otherwise(p)


def _rule_match(path: Column, pattern: Column) -> Column:
    """RFC-9309 path-pattern match in pure string expressions — no regex,
    stays in whole-stage codegen: ``*`` matches any character sequence, a
    TRAILING ``$`` anchors the end (an interior ``$`` is a literal, per the
    REP grammar), everything else is a literal prefix.

    Wildcard patterns match by greedy leftmost segment search
    (``aggregate`` over the ``*``-split segments with ``locate``) — the
    standard correct algorithm for ``L0*L1*…*Lk`` containment (the earliest
    occurrence always leaves maximal room for later segments).  Chosen over
    ``regexp_like`` with a built pattern because a non-foldable regex
    recompiles PER ROW — a per-(url, rule) compile at 10^10-URL scale.
    Patterns with neither metachar take the plain ``startswith`` fast path
    (the common case; identical semantics)."""
    simple = (~pattern.contains("*")) & (~pattern.contains("$"))
    anchored = pattern.endswith("$")
    core = F.when(
        anchored, F.substring(pattern, F.lit(1), F.length(pattern) - F.lit(1))
    ).otherwise(pattern)
    segs = F.split(core, r"\*", -1)
    n = F.size(segs)
    first = F.element_at(segs, 1)
    last = F.element_at(segs, -1)
    # Segments consumed greedily after the literal-prefix first one: all of
    # them when unanchored; all but the last when anchored (the last must
    # sit at the very end).  Empty segments add no constraint and confuse
    # ``locate`` — filtered ('a**b' ≡ 'a*b', trailing '*' ≡ nothing).
    mids = F.filter(
        F.when(
            anchored, F.slice(segs, 2, F.greatest(n - F.lit(2), F.lit(0)))
        ).otherwise(F.slice(segs, 2, F.greatest(n - F.lit(1), F.lit(0)))),
        lambda s: s != "",
    )
    st = F.aggregate(
        mids,
        F.struct(
            (F.length(first) + F.lit(1)).alias("pos"),
            path.startswith(first).alias("ok"),
        ),
        lambda acc, s: F.struct(
            (
                F.call_function("locate", s, path, acc["pos"]) + F.length(s)
            ).alias("pos"),
            (
                acc["ok"]
                & (F.call_function("locate", s, path, acc["pos"]) > 0)
            ).alias("ok"),
        ),
    )
    # Anchored: the last segment must occupy the very end, starting at or
    # after everything already consumed (no overlap with prefix/mids).
    glob_ok = F.when(
        anchored,
        st["ok"]
        & path.endswith(last)
        & (F.length(path) - F.length(last) + F.lit(1) >= st["pos"]),
    ).otherwise(st["ok"])
    return (
        F.when(simple, path.startswith(pattern))
        .when(anchored & ~core.contains("*"), path == core)  # exact match
        .otherwise(glob_ok)
    )


def allowed_col(url_col: Column, rules_col: Column) -> Column:
    """Most-specific-match allow/deny per RFC 9309: the longest matching
    pattern (octet length, wildcards counted) decides; on an allow/deny tie
    at the same length, ALLOW wins (§2.2.2).  NULL rules → allowed."""
    path = path_of(url_col)
    matched = F.filter(rules_col, lambda r: _rule_match(path, r["pattern"]))
    best = F.aggregate(
        matched,
        F.struct(
            F.lit(-1).alias("plen"), F.lit(True).alias("allow")
        ),
        lambda acc, r: F.when(
            (F.length(r["pattern"]) > acc["plen"])
            | (
                (F.length(r["pattern"]) == acc["plen"])
                & r["allow"]
                & ~acc["allow"]
            ),
            F.struct(
                F.length(r["pattern"]).alias("plen"), r["allow"].alias("allow")
            ),
        ).otherwise(acc),
    )
    return F.when(rules_col.isNull(), F.lit(True)).otherwise(best["allow"])


def with_rules(frontier: DataFrame, robots: DataFrame) -> DataFrame:
    """D2: broadcast-join the (small) robots dim; filter disallowed urls;
    attach effective crawl_delay (default when host unknown)."""
    joined = frontier.join(F.broadcast(robots), "host", "left")
    return (
        joined.filter(allowed_col(F.col("url"), F.col("rules")))
        .withColumn(
            "crawl_delay",
            F.coalesce(F.col("crawl_delay"), F.lit(config.DEFAULT_CRAWL_DELAY)),
        )
        .drop("rules")
    )


def budget_col(
    round_seconds: float, max_budget: int, round_no: int | None = None
) -> Column:
    """Token budget per host per round from its crawl delay.

    The divisor is clamped to ≥1e-9: a structured robots row carrying
    ``crawl_delay: 0`` means "no delay declared" and gets the max_budget
    cap instead of killing the round with ANSI DIVIDE_BY_ZERO (the raw
    robots.txt path already sanitizes 0/negative/non-finite at parse).

    ``round_no`` enables slow-host pacing: a host whose declared delay
    EXCEEDS the round window used to be clamped to 1 fetch per round —
    violating its own crawl-delay by up to orders of magnitude (the F3
    gaps() audit flags exactly this).  With round_no given, such a host is
    fetched once every ``ceil(delay / round_seconds)`` rounds (budget 0 on
    the off-rounds; its urls simply stay in the frontier), so consecutive
    fetches sit ≥ delay apart.  Hosts with delay ≤ round_seconds are
    unaffected — identical budgets, identical replay.
    """
    delay = F.greatest(F.col("crawl_delay"), F.lit(1e-9))
    base = F.least(
        F.lit(max_budget),
        F.greatest(F.lit(1), F.floor(F.lit(round_seconds) / delay)),
    )
    if round_no is None:
        return base.cast("int")
    k = F.ceil(delay / F.lit(float(round_seconds))).cast("long")
    gated = F.when(F.lit(int(round_no)) % k == 0, F.lit(1)).otherwise(F.lit(0))
    return (
        F.when(F.col("crawl_delay") > F.lit(float(round_seconds)), gated)
        .otherwise(base)
        .cast("int")
    )


# ------------------------------------------------------ robots.txt parsing

def parse_robots_one(txt: str | None, agent: str = "crawlspark") -> dict:
    """Parse one raw robots.txt body into {rules, crawl_delay, sitemaps}.

    ``Sitemap:`` lines are host-global (agent-independent) per RFC 9309
    and are collected regardless of group selection — feed them to
    ``io.seeds_from_sitemaps`` to derive seeds.

    Classic REP grammar (RFC 9309, simplified): ``field: value`` lines,
    ``#`` comments, groups of one-or-more ``User-agent`` lines followed by
    ``Allow``/``Disallow``/``Crawl-delay`` records.  Group selection: the
    LONGEST agent-token substring of ``agent`` wins (case-insensitive);
    ``*`` matches any agent with the lowest precedence; ALL groups tied at
    the winning length are merged (rules concatenated, largest crawl-delay
    kept) per RFC 9309 §2.2.1 — a host may split its directives across
    several ``User-agent: *`` groups and every Disallow still applies;
    no matching group → no rules.  An empty ``Disallow:`` value means
    "allow everything" (contributes no rule).  ``*``/``$`` wildcard
    patterns are kept VERBATIM (r4): :func:`allowed_col` implements the
    full RFC-9309 match (``*`` = any sequence, trailing ``$`` = end
    anchor, longest-pattern-wins with allow breaking ties).
    """
    agent_l = agent.lower()
    groups: list[dict] = []  # {"agents": [..], "rules": [..], "delay": float|None}
    sitemaps: list[str] = []
    cur: dict | None = None
    in_agent_run = False  # consecutive User-agent lines extend one group
    for raw_line in (txt or "").lstrip("﻿").splitlines():
        line = raw_line.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "sitemap":
            # RFC 9309 §2.3-adjacent: Sitemap is host-global, group-
            # independent, and transparent (does not break an agent run)
            if value:
                sitemaps.append(value)
            continue
        if field == "user-agent":
            if not in_agent_run:
                cur = {"agents": [], "rules": [], "delay": None}
                groups.append(cur)
                in_agent_run = True
            cur["agents"].append(value.lower())
            continue
        in_agent_run = False
        if cur is None:
            continue  # records before any User-agent line are ignored
        if field in ("allow", "disallow"):
            if value == "":
                continue  # empty Disallow/Allow = no rule
            cur["rules"].append(
                {"pattern": value, "allow": field == "allow"}
            )
        elif field == "crawl-delay":
            try:
                dv = float(value)
            except ValueError:
                pass
            else:
                # sanity-gate: 'Crawl-delay: 0' (common in the wild),
                # negatives, inf and nan are treated as NOT declared — a 0
                # reaching budget_col's divisor would kill the round under
                # ANSI mode, and inf/nan would turn sched_ts into NaN,
                # corrupting the deterministic replay order
                if math.isfinite(dv) and dv > 0:
                    cur["delay"] = dv

    # RFC 9309 §2.2.1: if more than one group matches the agent at the
    # winning specificity (e.g. two separate ``User-agent: *`` groups),
    # their rules are MERGED, not first-wins — keeping only one group
    # silently drops later Disallow lines and over-crawls the host.
    matchlen: list[int] = []  # best match length per group, -1 = no match
    for g in groups:
        m = -1
        for a in g["agents"]:
            if a == "*":
                m = max(m, 0)
            elif a and a in agent_l:
                m = max(m, len(a))
        matchlen.append(m)
    best_len = max(matchlen, default=-1)
    if best_len < 0:
        return {"rules": [], "crawl_delay": None, "sitemaps": sitemaps}
    rules: list[dict] = []
    delay: float | None = None
    for g, m in zip(groups, matchlen):
        if m != best_len:
            continue
        rules.extend(g["rules"])
        if g["delay"] is not None:
            # most-conservative merge: the largest delay wins (politeness
            # must not regress when a host splits its directives)
            delay = g["delay"] if delay is None else max(delay, g["delay"])
    return {"rules": rules, "crawl_delay": delay, "sitemaps": sitemaps}


_ROBOTS_STRUCT = StructType(
    [
        StructField(
            "rules",
            ArrayType(
                StructType(
                    [
                        StructField("pattern", StringType(), False),
                        StructField("allow", BooleanType(), False),
                    ]
                )
            ),
            True,
        ),
        StructField("crawl_delay", DoubleType(), True),
    ]
)


def make_parse_robots_udf(agent: str = "crawlspark"):
    """Arrow-batched robots.txt parser: body string → {rules, crawl_delay}."""

    @pandas_udf(_ROBOTS_STRUCT)
    def _parse(bodies: pd.Series) -> pd.DataFrame:
        parsed = [parse_robots_one(b, agent) for b in bodies]
        return pd.DataFrame(
            {
                "rules": [
                    [(r["pattern"], r["allow"]) for r in p["rules"]]
                    for p in parsed
                ],
                "crawl_delay": [p["crawl_delay"] for p in parsed],
            },
            index=bodies.index,
        )

    return _parse


def robots_from_text(
    raw: DataFrame,
    agent: str = "crawlspark",
    host_col: str = "host",
    body_col: str = "robots_txt",
) -> DataFrame:
    """(host, robots_txt) → ROBOTS_SCHEMA-shaped rules table.

    The fetched-robots ingestion path: raw robots.txt bodies (one per host,
    e.g. joined from the pages corpus or a dedicated fetch) parsed into the
    declarative rules table every other politeness operator consumes.

    Output is guaranteed ONE row per host (duplicate captures collapse to
    the lexicographically-greatest body — deterministic; prefer
    ``robots_raw_from_pages`` for latest-by-timestamp semantics): the
    rules table broadcast-LEFT-joins the frontier, so duplicate host rows
    would multiply frontier urls into double-scheduled fetches and break
    the seen-delta disjointness invariant.
    """
    raw = raw.groupBy(F.col(host_col).alias(host_col)).agg(
        F.max(F.col(body_col)).alias(body_col)
    )
    parsed = raw.select(
        F.col(host_col).alias("host"),
        make_parse_robots_udf(agent)(F.col(body_col)).alias("__p"),
    )
    return parsed.select(
        "host",
        F.col("__p.rules").alias("rules"),
        F.col("__p.crawl_delay").alias("crawl_delay"),
    )


def robots_raw_from_pages(pages: DataFrame) -> DataFrame:
    """(host, robots_txt) raw bodies mined from the pages corpus itself —
    the self-contained path for a Common-Crawl-style corpus, which stores
    each host's ``/robots.txt`` capture like any other page.

    Per host, the LATEST capture wins (``max_by`` on ``warc_ts`` — one
    map-side-combined hash-aggregate over only the robots rows, which the
    url filter prunes at the scan).  Bodies decode UTF-8-strict → Latin-1
    (never fails), matching the extractors' contract.  Compose:
    ``robots_from_text(robots_raw_from_pages(pages))`` and/or
    ``robots_sitemaps(...)`` / ``io.discover_seeds_from_robots(...)``.
    """
    from . import urlnorm

    robots_rows = pages.filter(
        F.col("url").rlike(r"^[a-z][a-z0-9+.-]*://[^/]+/robots\.txt$")
    ).select(
        urlnorm.host(F.col("url")).alias("host"), F.col("warc_ts"), F.col("html")
    )

    @pandas_udf(StringType())
    def _decode(bodies: pd.Series) -> pd.Series:
        def dec(b):
            if b is None:
                return None
            try:
                return bytes(b).decode("utf-8")
            except UnicodeDecodeError:
                return bytes(b).decode("latin-1")

        return bodies.map(dec)

    return (
        robots_rows.groupBy("host")
        .agg(F.max_by("html", "warc_ts").alias("__body"))
        .select("host", _decode(F.col("__body")).alias("robots_txt"))
    )


def robots_sitemaps(
    raw: DataFrame, host_col: str = "host", body_col: str = "robots_txt"
) -> DataFrame:
    """(host, robots_txt) → (host, sitemap_url): the Sitemap: lines of each
    host's robots.txt — the standard discovery path into
    ``io.seeds_from_sitemaps`` (fetch these urls, feed the bodies back)."""

    @pandas_udf(ArrayType(StringType()))
    def _sitemaps(bodies: pd.Series) -> pd.Series:
        return bodies.map(lambda b: parse_robots_one(b)["sitemaps"])

    return raw.select(
        F.col(host_col).alias("host"),
        F.explode(_sitemaps(F.col(body_col))).alias("sitemap_url"),
    )


def gaps(
    fetch_log: DataFrame,
    ts_col: str = "sched_ts",
    robots: DataFrame | None = None,
    default_crawl_delay: float = config.DEFAULT_CRAWL_DELAY,
) -> DataFrame:
    """F3: politeness audit — inter-fetch gap per host must be ≥ crawl_delay.

    A PERSISTED fetch log (FETCH_LOG_SCHEMA: round, sched_ts, host, url)
    carries no crawl_delay column — pass ``robots`` and the per-host delay
    is broadcast-joined in (unknown hosts get ``default_crawl_delay``),
    so the audit runs on snapshots, not just in-memory schedule output.
    """
    if "crawl_delay" not in fetch_log.columns:
        if robots is None:
            raise ValueError(
                "fetch_log has no crawl_delay column; pass robots= so the "
                "audit can join the per-host delay in"
            )
        dim = F.broadcast(robots.select("host", "crawl_delay"))
        fetch_log = fetch_log.join(dim, "host", "left").withColumn(
            "crawl_delay",
            F.coalesce(F.col("crawl_delay"), F.lit(float(default_crawl_delay))),
        )
    w = Window.partitionBy("host").orderBy(ts_col)
    return fetch_log.withColumn(
        "gap", F.col(ts_col) - F.lag(ts_col).over(w)
    ).withColumn(
        "violates",
        F.when(F.col("gap").isNull(), F.lit(False)).otherwise(
            F.col("gap") < F.col("crawl_delay") - F.lit(1e-9)
        ),
    )
