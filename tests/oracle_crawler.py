"""Pure-Python oracle crawler (SURVEY.md §5.4; FIXTURES.md §4).

A minimal single-process reimplementation of the reference crawler's loop
semantics — FIFO-BFS frontier, per-host token-bucket politeness, URL-seen
set — used as the second implementation in a two-implementation cross-check
(the /root/reference dir is empty; see SURVEY.md §0).  The engine run with
the same seeds + politeness budget must reproduce this oracle's exact fetch
order, seen set, and extracted text (BASELINE.json north_rule).

Shares only the leaf functions (canonicalize_one, extract_*) with the
engine — those have their own golden tests; everything the engine does with
DataFrames (scheduling, dedup, budget, ordering) is independently
re-expressed here with dicts, sets, and heapq.
"""

from __future__ import annotations

import heapq
import math
from dataclasses import dataclass, field

from crawlspark.extract import extract_links_one, extract_text_one
from crawlspark.urlnorm import canonicalize_one, host_one


@dataclass
class OracleResult:
    fetch_log: list[tuple[int, int, str]] = field(default_factory=list)
    seen: set[str] = field(default_factory=set)  # canonical urls
    texts: dict[str, str] = field(default_factory=dict)
    rounds_run: int = 0


def _pat_match(path: str, pat: str) -> bool:
    """RFC-9309 pattern match (the engine's polite._rule_match twin):
    '*' = any sequence, TRAILING '$' = end anchor, else literal prefix."""
    if "*" not in pat and "$" not in pat:
        return path.startswith(pat)
    import re

    anchored = pat.endswith("$")
    core = pat[:-1] if anchored else pat
    rx = ".*".join(re.escape(p) for p in core.split("*"))
    # DOTALL + \Z: the engine matcher is newline-agnostic ('.' must cross
    # '\n' in a path) and an anchor means true end-of-string (re '$' would
    # also match before a trailing newline)
    return re.match(rx + (r"\Z" if anchored else ""), path, re.DOTALL) is not None


def _match_rules(path: str, rules) -> bool:
    """Most-specific robots match per RFC 9309: longest pattern wins,
    allow breaks same-length ties; no rules / no match → allowed."""
    if not rules:
        return True
    best_len, allow = -1, True
    for r in rules:
        pat = r["pattern"]
        if _pat_match(path, pat) and (
            len(pat) > best_len or (len(pat) == best_len and r["allow"] and not allow)
        ):
            best_len, allow = len(pat), r["allow"]
    return allow


def _path_of(url: str) -> str:
    rest = url.split("://", 1)[1]
    slash = rest.find("/")
    return rest[slash:] if slash >= 0 else "/"


def crawl_oracle(
    seeds: list[str],
    pages: list[dict],
    robots: list[dict],
    rounds: int = 3,
    round_seconds: float = 60.0,
    default_crawl_delay: float = 1.0,
    max_budget_per_host: int = 10_000,
    max_depth: int = 10,
) -> OracleResult:
    # latest capture per url
    latest: dict[str, dict] = {}
    for row in pages:
        cur = latest.get(row["url"])
        if cur is None or row["warc_ts"] > cur["warc_ts"]:
            latest[row["url"]] = row
    rob = {r["host"]: r for r in robots}

    # frontier: url -> (priority, discovered_round, depth)
    frontier: dict[str, tuple[float, int, int]] = {}
    for s in seeds:
        c = canonicalize_one(s)
        if c:
            frontier.setdefault(c, (0.0, 0, 0))
    seen: set[str] = set()
    res = OracleResult()

    for r in range(rounds):
        if not frontier:
            break
        res.rounds_run += 1
        # group eligible urls per host
        by_host: dict[str, list[tuple]] = {}
        disallowed: list[str] = []
        for url, (prio, dround, depth) in frontier.items():
            if url in seen:
                continue
            host = host_one(url)
            rb = rob.get(host)
            if rb is not None and not _match_rules(_path_of(url), rb["rules"]):
                disallowed.append(url)
                continue
            delay = (rb["crawl_delay"] if rb and rb["crawl_delay"] is not None
                     else default_crawl_delay)
            by_host.setdefault(host, []).append((prio, dround, depth, url, delay))

        # per-host priority queue → top-B, sched_ts assignment
        scheduled: list[tuple[float, str, str, int]] = []  # (ts, host, url, depth)
        for host, items in by_host.items():
            delay = items[0][4]
            # mirrors polite.budget_col(round_no=...): a host whose delay
            # exceeds the round window is fetched once every
            # ceil(delay/round_seconds) rounds (budget 0 off-round) so
            # consecutive fetches sit >= delay apart; divisor clamped like
            # the engine's ANSI-div guard
            if delay > round_seconds:
                budget = 1 if r % math.ceil(delay / round_seconds) == 0 else 0
            else:
                budget = min(
                    max_budget_per_host,
                    max(1, math.floor(round_seconds / max(delay, 1e-9))),
                )
            if budget == 0:
                continue
            best = heapq.nsmallest(budget, [(p, dr, d, u) for p, dr, d, u, _ in items])
            for k, (_p, _dr, depth, url) in enumerate(best):
                ts = r * round_seconds + k * delay
                scheduled.append((ts, host, url, depth))

        # global deterministic fetch order
        scheduled.sort(key=lambda t: (t[0], t[1], t[2]))
        new_links: dict[str, tuple[float, int, int]] = {}
        for seq, (_ts, _host, url, depth) in enumerate(scheduled, start=1):
            res.fetch_log.append((r, seq, url))
            page = latest.get(url)
            if page is not None:
                res.texts[url] = extract_text_one(page["html"])
                if depth < max_depth:
                    for raw in extract_links_one(page["html"], url):
                        c = canonicalize_one(raw)
                        if not c:
                            continue
                        key = (0.0, r + 1, depth + 1)
                        if c not in new_links or key < new_links[c]:
                            new_links[c] = key

        tried = {u for _, _, u, _ in scheduled} | set(disallowed)
        seen |= tried
        nxt: dict[str, tuple[float, int, int]] = {
            u: k for u, k in frontier.items() if u not in tried
        }
        for u, key in new_links.items():
            if u in seen:
                continue
            if u not in nxt or key < nxt[u]:
                # engine keeps the min (priority, discovered_round, depth, url)
                if u in nxt:
                    nxt[u] = min(nxt[u], key)
                else:
                    nxt[u] = key
        frontier = nxt

    res.seen = seen
    return res
