"""Sources & sinks (SURVEY.md §2 A1-A2, A6).

On a real cluster the pages corpus is an Iceberg table
(``spark.read.format("iceberg")`` / ``df.writeTo(...)``); no Iceberg jar
ships in this sandbox, so the local path is plain Parquet behind the same
functions — call sites never change (SURVEY.md §7 hard-part 5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .schemas import PAGES_SCHEMA, SEED_SCHEMA

ICEBERG = "iceberg"


def read_pages(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    """A1: page-corpus scan.  Columns are pruned by Catalyst downstream;
    callers should select() before joining so `html` never moves early."""
    if fmt == ICEBERG:
        return spark.read.format(ICEBERG).load(path)
    if fmt == "warc":
        from . import warc

        return warc.read_warc(spark, path)
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


def write_text(df: DataFrame, path: str, fmt: str = "parquet") -> None:
    """A6: extracted-text corpus sink (url, text)."""
    out = df.select("url", "text")
    if fmt == ICEBERG:
        out.writeTo(path).createOrReplace()
    else:
        out.write.mode("overwrite").parquet(path)


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
