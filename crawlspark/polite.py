"""Robots rules + crawl-delay politeness (SURVEY.md §2 D2, F3).

The reference hardcodes NCBI's rate policy as a ``time.sleep`` between
requests; generalized per BASELINE.json to per-host robots.txt allow/deny
rules and crawl-delay token budgets.

Rule semantics (classic robots.txt): a rule is a path-prefix pattern with an
allow/deny flag; the LONGEST matching pattern wins; no match → allowed.
Matching is pure built-in higher-order functions (``filter``/``aggregate``
over the rules array) — stays in whole-stage codegen, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from . import config


def path_of(url_col: Column) -> Column:
    """Path+query of a canonical URL (scheme://host[:port] stripped)."""
    p = F.regexp_replace(url_col, r"^[a-z][a-z0-9+.-]*://[^/]*", "")
    return F.when(p == "", "/").otherwise(p)


def allowed_col(url_col: Column, rules_col: Column) -> Column:
    """Longest-prefix-match allow/deny; NULL rules → allowed."""
    path = path_of(url_col)
    matched = F.filter(rules_col, lambda r: path.startswith(r["pattern"]))
    best = F.aggregate(
        matched,
        F.struct(
            F.lit(-1).alias("plen"), F.lit(True).alias("allow")
        ),
        lambda acc, r: F.when(
            F.length(r["pattern"]) > acc["plen"],
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


def budget_col(round_seconds: float, max_budget: int) -> Column:
    """Token budget per host per round from its crawl delay."""
    return F.least(
        F.lit(max_budget),
        F.greatest(
            F.lit(1), F.floor(F.lit(round_seconds) / F.col("crawl_delay"))
        ),
    ).cast("int")


def gaps(fetch_log: DataFrame, ts_col: str = "sched_ts") -> DataFrame:
    """F3: politeness audit — inter-fetch gap per host must be ≥ crawl_delay."""
    w = Window.partitionBy("host").orderBy(ts_col)
    return fetch_log.withColumn(
        "gap", F.col(ts_col) - F.lag(ts_col).over(w)
    ).withColumn(
        "violates",
        F.when(F.col("gap").isNull(), F.lit(False)).otherwise(
            F.col("gap") < F.col("crawl_delay") - F.lit(1e-9)
        ),
    )
