"""Sources & sinks (SURVEY.md §2 A1-A2, A6).

On a real cluster the pages corpus is an Iceberg table
(``spark.read.format("iceberg")`` / ``df.writeTo(...)``); no Iceberg jar
ships in this sandbox, so the local path is plain Parquet behind the same
functions — call sites never change (SURVEY.md §7 hard-part 5).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .schemas import PAGES_SCHEMA, SEED_SCHEMA

ICEBERG = "iceberg"


def read_pages(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    warc_split_mb: float | None = None,
) -> DataFrame:
    """A1: page-corpus scan.  Columns are pruned by Catalyst downstream;
    callers should select() before joining so `html` never moves early.
    ``warc_split_mb`` (fmt="warc" only) fans a jumbo archive out across
    executors without a CDX index — see :func:`crawlspark.warc.read_warc`."""
    if fmt == ICEBERG:
        return spark.read.format(ICEBERG).load(path)
    if fmt == "warc":
        from . import warc

        return warc.read_warc(spark, path, split_mb=warc_split_mb)
    return spark.read.schema(PAGES_SCHEMA).parquet(path)


def read_seeds(spark: SparkSession, source: str | list[str]) -> DataFrame:
    """A2: seed list — a text file of URLs or an in-memory list."""
    if isinstance(source, list):
        return spark.createDataFrame([(u,) for u in source], SEED_SCHEMA)
    return (
        spark.read.text(source)
        .select(F.trim(F.col("value")).alias("url"))
        .filter(F.col("url") != "")
    )


def seeds_from_term(
    docs: DataFrame,
    term: str,
    url_col: str = "url",
    text_col: str = "text",
    limit: int | None = None,
) -> DataFrame:
    """A2b: seed derivation by search term — the reference's esearch analog
    (term → result list → fetch ids): scan a (url, text) corpus for documents
    whose token stream contains ``term``, return their URLs as the seed list,
    deterministically ordered and optionally capped (the retmax analog).

    Tokenization matches textops.words_col (split on \\s+) so the match is a
    whole-token hit, not a substring; the filter is a single built-in
    expression, fully pushed into the corpus scan.
    """
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    out = docs.filter(F.array_contains(toks, term.lower())).select(
        F.col(url_col).alias("url")
    )
    if limit is not None:
        out = out.orderBy("url").limit(limit)
    return out


def parse_sitemap_one(body: bytes | None) -> list[dict]:
    """One sitemap XML body → entry dicts (pure function; UDF maps it).

    Handles the two shapes of www.sitemaps.org/protocol: ``<urlset>``
    (page entries with optional lastmod/priority) and ``<sitemapindex>``
    (refs to child sitemaps, flagged ``is_index_ref`` so the caller can
    fetch-and-recurse).  Namespace-agnostic (matches local names — real
    sitemaps use the 0.9 ns, many omit or typo it) and transparently
    gunzips ``.xml.gz`` payloads (magic 1f 8b).  Malformed XML → [].
    """
    import gzip as _gzip
    import xml.etree.ElementTree as _ET

    if body is None:
        return []
    if body[:2] == b"\x1f\x8b":
        try:
            body = _gzip.decompress(body)
        except OSError:
            return []
    try:
        root = _ET.fromstring(body)
    except _ET.ParseError:
        return []

    def local(tag: str) -> str:
        return tag.rsplit("}", 1)[-1].lower()

    is_index = local(root.tag) == "sitemapindex"
    out: list[dict] = []
    for entry in root:
        if local(entry.tag) not in ("url", "sitemap"):
            continue
        loc = lastmod = None
        prio = None
        for child in entry:
            t = local(child.tag)
            txt = (child.text or "").strip()
            if t == "loc":
                loc = txt or None
            elif t == "lastmod":
                lastmod = txt or None
            elif t == "priority":
                try:
                    prio = float(txt)
                except ValueError:
                    prio = None
        if loc:
            out.append(
                {
                    "url": loc,
                    "lastmod": lastmod,
                    "priority": prio,
                    "is_index_ref": is_index,
                }
            )
    return out


_SITEMAP_ENTRY = "array<struct<url:string,lastmod:string,priority:double,is_index_ref:boolean>>"


def seeds_from_sitemaps(sitemaps: DataFrame, body_col: str = "body") -> DataFrame:
    """A2c: seed derivation from sitemap.xml documents (the standard web
    seed feed robots.txt points at).

    Input: (…, ``body_col``: binary) sitemap payloads.  Output one row per
    entry: ``(url, lastmod: timestamp, priority: double, is_index_ref)``,
    parsed by an Arrow-batched pandas UDF and exploded JVM-side; lastmod
    accepts the W3C datetime profile — full with or without fractional
    seconds, date-only, and month-only — via a try_to_timestamp coalesce
    chain (r2 ADVICE: ``2024-01-01T00:00:00.000Z`` and ``2024-01`` used
    to parse to NULL, silently losing freshness data).
    Rows with ``is_index_ref`` are child-sitemap pointers — feed their
    fetched bodies back through this function to recurse an index.
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(_SITEMAP_ENTRY)
    def _parse(bodies: pd.Series) -> pd.Series:
        return bodies.map(parse_sitemap_one)

    return (
        sitemaps.select(F.explode(_parse(F.col(body_col))).alias("e"))
        .select(
            F.col("e.url").alias("url"),
            F.coalesce(
                F.try_to_timestamp(F.col("e.lastmod"), F.lit("yyyy-MM-dd'T'HH:mm:ssXXX")),
                F.try_to_timestamp(
                    F.col("e.lastmod"), F.lit("yyyy-MM-dd'T'HH:mm:ss.SSSXXX")
                ),
                F.try_to_timestamp(F.col("e.lastmod"), F.lit("yyyy-MM-dd")),
                F.try_to_timestamp(F.col("e.lastmod"), F.lit("yyyy-MM")),
            ).alias("lastmod"),
            F.col("e.priority").alias("priority"),
            F.col("e.is_index_ref").alias("is_index_ref"),
        )
    )


def read_cdx(spark: SparkSession, path: str) -> DataFrame:
    """A1b: Common Crawl CDXJ index source — the standard way to enumerate
    a CC crawl without touching WARC payloads.  Lines are
    ``<surt urlkey> <14-digit timestamp> <json>``; gzipped ``.gz`` shards
    decompress transparently via the text source's codec handling.

    Output: (urlkey, warc_ts, url, status, mime, digest, length, offset,
    filename) — join ``filename``/``offset``/``length`` against WARC
    archives for payload fetch, or feed ``url`` straight into the frontier.
    Everything is built-in parsing (regexp split + from_json), fully
    pushed-down/codegen; malformed lines yield nulls and are dropped
    (``try_`` variants — default ANSI mode must not abort an index scan
    on one bad line).
    """
    return _parse_cdx_lines(spark.read.text(path))


def read_cdx_stream(spark: SparkSession, path: str) -> DataFrame:
    """Streaming twin of :func:`read_cdx`: watch a directory for newly
    landed CDXJ shards (how a continuously-published crawl index arrives)
    and emit parsed index rows incrementally — feed into a foreachBatch
    frontier update or any windowed metric.  Identical schema and parse
    to the batch reader; exactly-once per shard comes from the file
    source's checkpointed file tracking.
    """
    lines = spark.readStream.format("text").load(path)
    return _parse_cdx_lines(lines)


def dedup_cdx_digest(cdx: DataFrame, keep: str = "latest") -> DataFrame:
    """Content-seen dedup at the INDEX level: one record per content
    ``digest`` (CC stores a payload hash per capture), picked as-of
    ``latest``/``earliest`` ``warc_ts`` — identical bytes served from many
    urls (mirrors, aliases, re-crawls) collapse before anything fetches a
    payload.  One map-side-combined ``max_by``/``min_by`` aggregate over
    thin index rows; null digests pass through untouched (no evidence =
    no dedup).
    """
    if keep not in ("latest", "earliest"):
        raise ValueError(f"keep must be latest|earliest, got {keep}")
    agg = F.max_by if keep == "latest" else F.min_by
    with_digest = cdx.filter(F.col("digest").isNotNull())
    picked = (
        with_digest.groupBy("digest")
        .agg(agg(F.struct(*cdx.columns), "warc_ts").alias("__r"))
        .select("__r.*")
    )
    return picked.unionByName(cdx.filter(F.col("digest").isNull()))


def _parse_cdx_lines(lines: DataFrame) -> DataFrame:
    line = F.col("value")
    j_schema = (
        "url string, mime string, status string, digest string, "
        "length string, offset string, filename string"
    )
    parsed = lines.select(
        F.regexp_extract(line, r"^(\S+) (\d{14}) (.*)$", 1).alias("urlkey"),
        F.try_to_timestamp(
            F.regexp_extract(line, r"^(\S+) (\d{14}) (.*)$", 2), F.lit("yyyyMMddHHmmss")
        ).alias("warc_ts"),
        F.from_json(
            F.regexp_extract(line, r"^(\S+) (\d{14}) (.*)$", 3), j_schema
        ).alias("j"),
    )
    return (
        parsed.filter((F.col("urlkey") != "") & F.col("j").isNotNull())
        .select(
            "urlkey",
            "warc_ts",
            F.col("j.url").alias("url"),
            F.col("j.status").try_cast("int").alias("status"),
            F.col("j.mime").alias("mime"),
            F.col("j.digest").alias("digest"),
            F.col("j.length").try_cast("long").alias("length"),
            F.col("j.offset").try_cast("long").alias("offset"),
            F.col("j.filename").alias("filename"),
        )
    )


def discover_seeds_from_robots(
    robots_raw: DataFrame,
    pages: DataFrame,
    max_index_depth: int = 3,
    host_col: str = "host",
    body_col: str = "robots_txt",
) -> DataFrame:
    """A2d: the standard web seed-discovery chain, end to end — robots.txt
    ``Sitemap:`` lines → sitemap payloads looked up in the pages corpus →
    ``<urlset>`` entries as seeds, recursing ``<sitemapindex>`` refs up to
    ``max_index_depth`` levels (real indexes are 1-2 deep).

    Output: (url, lastmod, priority) — feed ``url`` to the crawl seed list
    and (url, priority) to ``sched.with_priorities``.

    Scale shape: the wanted-sitemap side is thin (urls only) and broadcast,
    so the fat ``html`` column never shuffles (same discipline as
    fetch.lookup_latest); each recursion level re-joins only the NEW index
    refs (visited urls are anti-joined out, so ref cycles terminate early).
    """
    from . import polite

    spark = robots_raw.sparkSession
    empty = spark.createDataFrame([], "url string, lastmod timestamp, priority double")
    wanted = (
        polite.robots_sitemaps(robots_raw, host_col=host_col, body_col=body_col)
        .select(F.col("sitemap_url").alias("url"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    page_bodies = pages.select("url", "warc_ts", "html")
    seeds = empty
    visited = wanted
    for _ in range(max_index_depth):
        if not wanted.take(1):
            break
        latest = (
            page_bodies.join(F.broadcast(wanted), "url")
            .groupBy("url")
            .agg(F.max_by("html", "warc_ts").alias("body"))
        )
        entries = seeds_from_sitemaps(latest, body_col="body").localCheckpoint(eager=True)
        seeds = seeds.unionByName(
            entries.filter(~F.col("is_index_ref")).select("url", "lastmod", "priority")
        )
        wanted = (
            entries.filter(F.col("is_index_ref"))
            .select("url")
            .distinct()
            .join(visited, "url", "left_anti")
            .localCheckpoint(eager=True)
        )
        visited = visited.union(wanted)
    return seeds.distinct()


def write_text(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    partition_by: list[str] | None = None,
    host_buckets: int | None = None,
) -> None:
    """A6: extracted-text corpus sink (url, text).

    At corpus scale a flat directory is the wrong layout: pass
    ``host_buckets`` to add a ``host_bucket = pmod(xxhash64(host(url)), N)``
    partition column (bounded cardinality, skew-proof — never partition by
    raw host: one mega-host = one mega-file, and 10^7 hosts = 10^7 dirs),
    and/or ``partition_by`` for existing low-cardinality columns (lang).
    Readers then prune partitions on either key.
    """
    from . import urlnorm

    cols = [c for c in df.columns if c in ("url", "text", *(partition_by or []))]
    out = df.select(*dict.fromkeys(["url", "text", *cols]))
    parts = list(partition_by or [])
    if host_buckets:
        out = out.withColumn(
            "host_bucket",
            F.pmod(F.xxhash64(urlnorm.host(F.col("url"))), F.lit(int(host_buckets))).cast("int"),
        )
        parts.append("host_bucket")
    if fmt == ICEBERG:
        out.writeTo(path).createOrReplace()
    else:
        w = out.write.mode("overwrite")
        if parts:
            w = w.partitionBy(*parts)
        w.parquet(path)


def write_pages_bucketed(
    pages: DataFrame, table: str, n_buckets: int = 64
) -> None:
    """Persist the pages corpus BUCKETED by url — the mega-batch fetch path.

    ``fetch.lookup_latest(broadcast_wanted=False)`` over a table written
    this way plans a sort-merge join where the html-bearing pages side has
    NO Exchange: HashPartitioning(url) from the bucketed scan satisfies the
    join's clustered-distribution requirement on (url, warc_ts), so only
    the (thin) scheduled side shuffles.  This is the parquet analog of an
    Iceberg ``bucket(url)`` partition transform; on a cluster the table
    lives in the catalog/metastore instead of the session-local warehouse.
    """
    (
        pages.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, "url")
        .sortBy("url")
        .saveAsTable(table)
    )
