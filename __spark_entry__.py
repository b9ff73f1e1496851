"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship one-round crawl pipeline on pages
synthesized deterministically from the sf0.001 ``documents`` table.
``queries()`` registers one entry per implemented operator from SURVEY.md
§2 (plus the training-data-pipeline operators); ``oracle_sql()`` gives the
DuckDB twin for every SQL-expressible one.  Column names are aliased
identically on both sides (driver hashes after sorting columns by name).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

# --------------------------------------------------------------------------
# registry
# --------------------------------------------------------------------------
_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
_ORACLES: dict[str, str] = {}


def _q(name: str, sql: str | None = None):
    def deco(fn):
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            # timestamps in the fixtures are naive; pin the session to UTC so
            # Spark's micros-since-epoch agree with DuckDB's naive reading.
            spark.conf.set("spark.sql.session.timeZone", "UTC")
            return fn(spark, sf_dir)

        _QUERIES[name] = wrapped
        if sql is not None:
            _ORACLES[name] = sql
        return wrapped

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _epoch(col):
    """Naive (NTZ) timestamp → epoch seconds; session tz pinned to UTC so
    this agrees with DuckDB's epoch() over the same naive parquet value."""
    return col.cast("timestamp_ltz").cast("long")


_NORM_TEXT = r"regexp_replace(lower(trim(text)), '\s+', ' ', 'g')"
_WORDS = r"string_split(trim(text), ' ')"


# --------------------------------------------------------------------------
# A. scans / projection / filter  (SURVEY.md §2 A1, B1, B2)
# --------------------------------------------------------------------------
@_q("scan_pages", "SELECT doc_id, text, lang, source, n_chars FROM documents")
def scan_pages(spark, sf):
    return _t(spark, sf, "documents").select("doc_id", "text", "lang", "source", "n_chars")


@_q("project_docs", "SELECT doc_id, lang, n_chars FROM documents")
def project_docs(spark, sf):
    return _t(spark, sf, "documents").select("doc_id", "lang", "n_chars")


@_q("filter_lang", "SELECT doc_id, lang, source FROM documents WHERE lang = 'en'")
def filter_lang(spark, sf):
    return (
        _t(spark, sf, "documents")
        .filter(F.col("lang") == "en")
        .select("doc_id", "lang", "source")
    )


# --------------------------------------------------------------------------
# B. url normalization / hashing  (B3-B5)
# --------------------------------------------------------------------------
@_q(
    "canon_urls",
    """SELECT doc_id,
              'https://' || lower(source) || '.example/d/' || doc_id AS canon_url
       FROM documents""",
)
def canon_urls(spark, sf):
    """Messy synthesized urls through the canonicalization UDF; the oracle
    states the expected canonical form directly."""
    from crawlspark import urlnorm

    messy = F.concat(
        F.lit("HTTPS://"),
        F.upper("source"),
        F.lit(".EXAMPLE:443/d/"),
        F.col("doc_id").cast("string"),
        F.lit("#frag"),
    )
    return _t(spark, sf, "documents").select(
        "doc_id", urlnorm.canonicalize(messy).alias("canon_url")
    )


@_q(
    "host_extract",
    """SELECT doc_id,
              regexp_extract('https://' || source || '.example/d/' || doc_id,
                             'https://([^/]+)', 1) AS host
       FROM documents""",
)
def host_extract(spark, sf):
    from crawlspark import urlnorm

    url = F.concat(
        F.lit("https://"), F.col("source"), F.lit(".example/d/"), F.col("doc_id").cast("string")
    )
    return _t(spark, sf, "documents").select("doc_id", urlnorm.host(url).alias("host"))


@_q(
    "hash_urls",
    """SELECT count(DISTINCT source) AS n_hashes, count(DISTINCT source) AS n_keys
       FROM documents""",
)
def hash_urls(spark, sf):
    """xxhash64 injectivity on the key domain: distinct hashes == distinct keys."""
    return _t(spark, sf, "documents").agg(
        F.countDistinct(F.xxhash64("source")).alias("n_hashes"),
        F.countDistinct("source").alias("n_keys"),
    )


@_q("salt_distribution")  # rows-only: xxhash64 not available in DuckDB
def salt_distribution(spark, sf):
    """B6: salting spreads a hot key across SALT sub-groups."""
    return (
        _t(spark, sf, "documents")
        .select(
            "source",
            F.pmod(F.xxhash64(F.col("doc_id").cast("string")), F.lit(8)).cast("int").alias("salt"),
        )
        .groupBy("source", "salt")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# --------------------------------------------------------------------------
# C. dedup / set membership  (C1-C5, H1-H3)
# --------------------------------------------------------------------------
@_q("dedup_batch", "SELECT DISTINCT lang, source FROM documents")
def dedup_batch(spark, sf):
    return _t(spark, sf, "documents").select("lang", "source").dropDuplicates()


@_q(
    "anti_join",
    """SELECT c_custkey, c_name FROM customer
       WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""",
)
def anti_join(spark, sf):
    c, o = _t(spark, sf, "customer"), _t(spark, sf, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@_q(
    "union_distinct",
    """SELECT c_nationkey AS nationkey FROM customer
       UNION SELECT s_nationkey FROM supplier""",
)
def union_distinct(spark, sf):
    c = _t(spark, sf, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.unionByName(s).dropDuplicates()


@_q("exact_distinct", "SELECT count(DISTINCT user_id) AS n_users FROM events")
def exact_distinct(spark, sf):
    return _t(spark, sf, "events").agg(F.countDistinct("user_id").alias("n_users"))


@_q("approx_distinct")  # rows-only: HLL estimates differ across engines
def approx_distinct(spark, sf):
    return _t(spark, sf, "events").agg(
        F.approx_count_distinct("user_id").alias("n_users_approx")
    )


@_q(
    "set_union",
    "SELECT n_nationkey AS k FROM nation UNION SELECT c_nationkey FROM customer",
)
def set_union(spark, sf):
    a = _t(spark, sf, "nation").select(F.col("n_nationkey").alias("k"))
    b = _t(spark, sf, "customer").select(F.col("c_nationkey").alias("k"))
    return a.union(b).distinct()


@_q(
    "set_except",
    "SELECT n_nationkey AS k FROM nation EXCEPT SELECT c_nationkey FROM customer",
)
def set_except(spark, sf):
    a = _t(spark, sf, "nation").select(F.col("n_nationkey").alias("k"))
    b = _t(spark, sf, "customer").select(F.col("c_nationkey").alias("k"))
    return a.exceptAll(b.distinct()).distinct()


@_q(
    "set_intersect",
    "SELECT n_nationkey AS k FROM nation INTERSECT SELECT s_nationkey FROM supplier",
)
def set_intersect(spark, sf):
    a = _t(spark, sf, "nation").select(F.col("n_nationkey").alias("k"))
    b = _t(spark, sf, "supplier").select(F.col("s_nationkey").alias("k"))
    return a.intersect(b)


# --------------------------------------------------------------------------
# D. joins  (D1-D6)
# --------------------------------------------------------------------------
@_q(
    "join_equi",
    """SELECT c_mktsegment, count(*) AS n_orders, round(sum(o_totalprice), 2) AS total
       FROM orders JOIN customer ON o_custkey = c_custkey
       GROUP BY c_mktsegment""",
)
def join_equi(spark, sf):
    o, c = _t(spark, sf, "orders"), _t(spark, sf, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
    )


@_q(
    "join_broadcast",
    """SELECT n_name, r_name FROM nation JOIN region ON n_regionkey = r_regionkey""",
)
def join_broadcast(spark, sf):
    n, r = _t(spark, sf, "nation"), _t(spark, sf, "region")
    return n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select("n_name", "r_name")


@_q(
    "join_left",
    """SELECT c_custkey, count(o_orderkey) AS n_orders
       FROM customer LEFT JOIN orders ON o_custkey = c_custkey
       GROUP BY c_custkey""",
)
def join_left(spark, sf):
    c, o = _t(spark, sf, "customer"), _t(spark, sf, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@_q(
    "join_semi",
    """SELECT c_custkey FROM customer
       WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""",
)
def join_semi(spark, sf):
    c, o = _t(spark, sf, "customer"), _t(spark, sf, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey")


@_q(
    "asof_latest",
    """SELECT user_id, event_id, floor(epoch(ts))::BIGINT AS ts_epoch FROM events
       WHERE ts <= TIMESTAMP '2024-01-15 00:00:00'
       QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1""",
)
def asof_latest(spark, sf):
    e = _t(spark, sf, "events").filter(F.col("ts") <= F.lit("2024-01-15 00:00:00").cast("timestamp"))
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        e.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("user_id", "event_id", _epoch(F.col("ts")).alias("ts_epoch"))
    )


@_q(
    "join_range",
    """SELECT o_orderpriority, count(*) AS n
       FROM lineitem JOIN orders
         ON l_orderkey = o_orderkey
        AND l_shipdate >= o_orderdate
        AND l_shipdate < o_orderdate + INTERVAL 60 DAY
       GROUP BY o_orderpriority""",
)
def join_range(spark, sf):
    l, o = _t(spark, sf, "lineitem"), _t(spark, sf, "orders")
    cond = (
        (l.l_orderkey == o.o_orderkey)
        & (l.l_shipdate >= o.o_orderdate)
        & (l.l_shipdate < F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
    )
    return l.join(o, cond).groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n"))


# --------------------------------------------------------------------------
# E. aggregations  (E1-E5)
# --------------------------------------------------------------------------
@_q(
    "agg_basic",
    """SELECT l_returnflag, l_linestatus,
              round(sum(l_quantity), 2) AS sum_qty,
              round(sum(l_extendedprice), 2) AS sum_base,
              round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc,
              round(avg(l_quantity), 4) AS avg_qty,
              count(*) AS n
       FROM lineitem GROUP BY l_returnflag, l_linestatus""",
)
def agg_basic(spark, sf):
    return (
        _t(spark, sf, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@_q(
    "agg_distinct",
    """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts
       FROM lineitem GROUP BY l_returnflag""",
)
def agg_distinct(spark, sf):
    return (
        _t(spark, sf, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").alias("n_parts"))
    )


@_q(
    "agg_rollup",
    """SELECT lang, source, count(*) AS n FROM documents
       GROUP BY ROLLUP (lang, source)""",
)
def agg_rollup(spark, sf):
    return (
        _t(spark, sf, "documents")
        .rollup("lang", "source")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@_q(
    "agg_maxby",
    """SELECT user_id, arg_max(event_type, event_id) AS last_type,
              max(event_id) AS max_eid
       FROM events GROUP BY user_id""",
)
def agg_maxby(spark, sf):
    return (
        _t(spark, sf, "events")
        .groupBy("user_id")
        .agg(
            F.max_by("event_type", "event_id").alias("last_type"),
            F.max("event_id").alias("max_eid"),
        )
    )


@_q(
    "agg_collect",
    """SELECT lang, array_to_string((list_sort(list(source)))[1:5], ',') AS top_sources
       FROM documents GROUP BY lang""",
)
def agg_collect(spark, sf):
    return (
        _t(spark, sf, "documents")
        .groupBy("lang")
        .agg(
            F.concat_ws(",", F.slice(F.sort_array(F.collect_list("source")), 1, 5)).alias("top_sources")
        )
    )


@_q(
    "agg_cube",
    """SELECT event_type, user_id % 10 AS user_mod, count(*) AS n
       FROM events GROUP BY CUBE (event_type, user_id % 10)""",
)
def agg_cube(spark, sf):
    return (
        _t(spark, sf, "events")
        .withColumn("user_mod", F.col("user_id") % 10)
        .cube("event_type", "user_mod")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@_q(
    "agg_grouping_sets",
    """SELECT lang, source, count(*) AS n FROM documents
       GROUP BY GROUPING SETS ((lang), (source))""",
)
def agg_grouping_sets(spark, sf):
    d = _t(spark, sf, "documents").createOrReplaceTempView("__docs_gs")
    return spark.sql(
        """SELECT lang, source, count(*) AS n FROM __docs_gs
           GROUP BY GROUPING SETS ((lang), (source))"""
    )


@_q(
    "udaf_weighted",
    """SELECT user_id,
              round(sum(value * (json_extract_string(props, '$.k')::DOUBLE))
                    / sum(json_extract_string(props, '$.k')::DOUBLE), 4) AS wmean
       FROM events GROUP BY user_id""",
)
def udaf_weighted(spark, sf):
    """J5: custom grouped-agg pandas UDAF (weight from the JSON props)."""
    from crawlspark import textops

    wmean = textops.weighted_mean_udaf()
    e = _t(spark, sf, "events").withColumn(
        "w", F.get_json_object("props", "$.k").cast("double")
    )
    return e.groupBy("user_id").agg(
        F.round(wmean(F.col("value"), F.col("w")), 4).alias("wmean")
    )


@_q(
    "udtf_words",
    f"""SELECT doc_id, word, count(*)::INT AS n
        FROM (SELECT doc_id, unnest({_WORDS}) AS word
              FROM documents WHERE doc_id < 20)
        GROUP BY doc_id, word""",
)
def udtf_words(spark, sf):
    """J6: Python UDTF — word histogram rows per document (doc_id < 20)."""
    from crawlspark import textops

    WordsUDTF = textops.make_words_udtf()
    spark.udtf.register("words_udtf", WordsUDTF)
    _t(spark, sf, "documents").filter(F.col("doc_id") < 20).createOrReplaceTempView(
        "__docs_udtf"
    )
    return spark.sql(
        """SELECT d.doc_id, w.word, w.n
           FROM __docs_udtf d, LATERAL words_udtf(d.text) w"""
    )


@_q(
    "win_rank",
    """SELECT event_id, user_id,
              rank() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS rnk,
              dense_rank() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS drnk
       FROM events""",
)
def win_rank(spark, sf):
    w = Window.partitionBy("user_id").orderBy(F.desc("value"), "event_id")
    return _t(spark, sf, "events").select(
        "event_id",
        "user_id",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
    )


@_q("metrics_counts", "SELECT event_type, count(*) AS n FROM events GROUP BY event_type")
def metrics_counts(spark, sf):
    return _t(spark, sf, "events").groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))


# --------------------------------------------------------------------------
# F. windows  (F1-F6)
# --------------------------------------------------------------------------
@_q(
    "win_rownum",
    """SELECT event_id, user_id,
              row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
       FROM events""",
)
def win_rownum(spark, sf):
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return _t(spark, sf, "events").select(
        "event_id", "user_id", F.row_number().over(w).alias("rn")
    )


@_q(
    "win_topk_per_group",
    """SELECT user_id, event_id, round(value, 4) AS value_r FROM events
       QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) <= 3""",
)
def win_topk_per_group(spark, sf):
    w = Window.partitionBy("user_id").orderBy(F.desc("value"), "event_id")
    return (
        _t(spark, sf, "events")
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= 3)
        .select("user_id", "event_id", F.round("value", 4).alias("value_r"))
    )


@_q(
    "win_lag",
    """SELECT event_id, user_id,
              round(lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id), 4) AS prev_value
       FROM events""",
)
def win_lag(spark, sf):
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return _t(spark, sf, "events").select(
        "event_id", "user_id", F.round(F.lag("value").over(w), 4).alias("prev_value")
    )


@_q(
    "win_cumsum",
    """SELECT event_id, user_id,
              round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS run_sum
       FROM events""",
)
def win_cumsum(spark, sf):
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return _t(spark, sf, "events").select(
        "event_id", "user_id", F.round(F.sum("value").over(w), 4).alias("run_sum")
    )


@_q(
    "win_ntile",
    """SELECT event_id, ntile(4) OVER (ORDER BY value DESC, event_id) AS tile FROM events""",
)
def win_ntile(spark, sf):
    w = Window.orderBy(F.desc("value"), "event_id")
    return _t(spark, sf, "events").select("event_id", F.ntile(4).over(w).alias("tile"))


@_q(
    "win_rangeframe",
    """SELECT event_id, user_id,
              count(*) OVER (PARTITION BY user_id ORDER BY floor(epoch(ts))::BIGINT
                    RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS n_last_hour
       FROM events""",
)
def win_rangeframe(spark, sf):
    e = _t(spark, sf, "events").withColumn("ts_s", _epoch(F.col("ts")))
    w = Window.partitionBy("user_id").orderBy("ts_s").rangeBetween(-3600, 0)
    return e.select(
        "event_id", "user_id", F.count(F.lit(1)).over(w).alias("n_last_hour")
    )


# --------------------------------------------------------------------------
# G. sort / limit / top-k  (G1-G3)
# --------------------------------------------------------------------------
@_q(
    "sort_multi",
    """SELECT l_orderkey, l_linenumber, l_returnflag, l_linestatus
       FROM lineitem
       ORDER BY l_returnflag, l_linestatus, l_shipdate, l_orderkey, l_linenumber
       LIMIT 100""",
)
def sort_multi(spark, sf):
    return (
        _t(spark, sf, "lineitem")
        .orderBy("l_returnflag", "l_linestatus", "l_shipdate", "l_orderkey", "l_linenumber")
        .limit(100)
        .select("l_orderkey", "l_linenumber", "l_returnflag", "l_linestatus")
    )


@_q(
    "topk_limit",
    """SELECT o_orderkey, round(o_totalprice, 2) AS price FROM orders
       ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""",
)
def topk_limit(spark, sf):
    return (
        _t(spark, sf, "orders")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(10)
        .select("o_orderkey", F.round("o_totalprice", 2).alias("price"))
    )


@_q(
    "limit_page",
    """SELECT o_orderkey, o_custkey FROM orders
       QUALIFY row_number() OVER (ORDER BY o_orderkey) BETWEEN 91 AND 100""",
)
def limit_page(spark, sf):
    w = Window.orderBy("o_orderkey")
    return (
        _t(spark, sf, "orders")
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn").between(91, 100))
        .select("o_orderkey", "o_custkey")
    )


# --------------------------------------------------------------------------
# I. scalar function surface  (I1-I7)
# --------------------------------------------------------------------------
@_q(
    "fn_string",
    """SELECT doc_id, upper(lang) AS lang_u, substr(text, 1, 10) AS head,
              length(text) AS n, lang || '-' || source AS tag,
              lpad(source, 8, '_') AS padded, replace(source, 'src', 'S') AS repl
       FROM documents""",
)
def fn_string(spark, sf):
    return _t(spark, sf, "documents").select(
        "doc_id",
        F.upper("lang").alias("lang_u"),
        F.substring("text", 1, 10).alias("head"),
        F.length("text").alias("n"),
        F.concat_ws("-", "lang", "source").alias("tag"),
        F.lpad("source", 8, "_").alias("padded"),
        F.regexp_replace("source", "src", "S").alias("repl"),
    )


@_q(
    "fn_date",
    """SELECT event_id, strftime(ts, '%Y-%m-%d') AS day_str,
              hour(ts) AS h,
              date_diff('day', DATE '2024-01-01', ts::DATE) AS days_since,
              epoch(date_trunc('hour', ts))::BIGINT AS hour_epoch
       FROM events""",
)
def fn_date(spark, sf):
    return _t(spark, sf, "events").select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd").alias("day_str"),
        F.hour("ts").alias("h"),
        F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")).alias("days_since"),
        F.date_trunc("hour", "ts").cast("long").alias("hour_epoch"),
    )


@_q(
    "fn_math",
    """SELECT l_orderkey, l_linenumber,
              round(abs(l_extendedprice - round(l_extendedprice)), 4) AS frac,
              floor(l_quantity) AS fl, ceil(l_discount * 100) AS ce,
              round(log2(l_quantity + 1), 6) AS lg,
              greatest(l_tax, l_discount) AS g, least(l_tax, l_discount) AS s,
              l_orderkey % 7 AS m
       FROM lineitem""",
)
def fn_math(spark, sf):
    li = _t(spark, sf, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.abs(F.col("l_extendedprice") - F.round("l_extendedprice")), 4).alias("frac"),
        F.floor("l_quantity").alias("fl"),
        F.ceil(F.col("l_discount") * 100).alias("ce"),
        F.round(F.log2(F.col("l_quantity") + 1), 6).alias("lg"),
        F.greatest("l_tax", "l_discount").alias("g"),
        F.least("l_tax", "l_discount").alias("s"),
        (F.col("l_orderkey") % 7).alias("m"),
    )


@_q(
    "fn_array",
    """SELECT vec_id, len(embedding) AS dim,
              round(embedding[1]::DOUBLE, 6) AS first_v,
              round(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE)), 6) AS norm2
       FROM embeddings""",
)
def fn_array(spark, sf):
    e = _t(spark, sf, "embeddings")
    norm2 = F.aggregate(
        F.col("embedding"),
        F.lit(0.0),
        lambda acc, x: acc + x.cast("double") * x.cast("double"),
    )
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(F.element_at("embedding", 1).cast("double"), 6).alias("first_v"),
        F.round(norm2, 6).alias("norm2"),
    )


@_q(
    "fn_json",
    """SELECT event_id, json_extract_string(props, '$.k') AS k_str,
              json_extract_string(props, '$.k')::INT AS k_int
       FROM events""",
)
def fn_json(spark, sf):
    return _t(spark, sf, "events").select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        F.get_json_object("props", "$.k").cast("int").alias("k_int"),
    )


@_q(
    "fn_hash",
    """SELECT doc_id, md5(text) AS h_md5, sha256(text) AS h_sha FROM documents""",
)
def fn_hash(spark, sf):
    return _t(spark, sf, "documents").select(
        "doc_id", F.md5("text").alias("h_md5"), F.sha2("text", 256).alias("h_sha")
    )


@_q(
    "fn_cond",
    """SELECT event_id,
              CASE WHEN value > 50 THEN 'hi' WHEN value > 10 THEN 'mid' ELSE 'lo' END AS band,
              coalesce(nullif(event_type, 'error'), 'ERR') AS type_clean
       FROM events""",
)
def fn_cond(spark, sf):
    return _t(spark, sf, "events").select(
        "event_id",
        F.when(F.col("value") > 50, "hi")
        .when(F.col("value") > 10, "mid")
        .otherwise("lo")
        .alias("band"),
        F.coalesce(F.nullif("event_type", F.lit("error")), F.lit("ERR")).alias("type_clean"),
    )


# --------------------------------------------------------------------------
# training-data ops: dedup family
# --------------------------------------------------------------------------
@_q(
    "dedup_exact",
    f"""SELECT md5({_NORM_TEXT}) AS dup_key, count(*) AS group_size
        FROM (SELECT text FROM documents
              UNION ALL SELECT text FROM documents WHERE doc_id % 10 = 0)
        GROUP BY 1""",
)
def dedup_exact(spark, sf):
    from crawlspark import textops

    d = _t(spark, sf, "documents")
    dup = d.select("text").unionByName(d.filter(F.col("doc_id") % 10 == 0).select("text"))
    return dup.groupBy(textops.text_key(F.col("text")).alias("dup_key")).agg(
        F.count(F.lit(1)).alias("group_size")
    )


@_q("dedup_minhash")  # rows-only: xxhash64 signatures not expressible in SQL
def dedup_minhash(spark, sf):
    from crawlspark import textops

    d = _t(spark, sf, "documents")
    # plant near-dups: copy of each 20th doc with one word appended
    planted = d.filter(F.col("doc_id") % 20 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.concat("text", F.lit(" extraword")).alias("text"),
    )
    corpus = d.select("doc_id", "text").unionByName(planted)
    return textops.minhash_dedup_pairs(corpus, threshold=0.5)


@_q("dedup_simhash")  # rows-only: custom pandas-UDF simhash
def dedup_simhash(spark, sf):
    from crawlspark import textops

    d = _t(spark, sf, "documents")
    planted = d.filter(F.col("doc_id") % 20 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.concat("text", F.lit(" zz")).alias("text"),
    )
    corpus = d.select("doc_id", "text").unionByName(planted)
    return textops.simhash_neardup_pairs(corpus, max_hamming=3)


@_q(
    "ngram_jaccard",
    f"""WITH w AS (SELECT doc_id, source, {_WORDS} AS ws FROM documents),
        sh AS (SELECT DISTINCT doc_id, source,
                      unnest(list_transform(generate_series(1, greatest(len(ws) - 2, 0)),
                             i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS sh
               FROM w),
        sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
        common AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
                   FROM sh a JOIN sh b
                     ON a.sh = b.sh AND a.source = b.source AND a.doc_id < b.doc_id
                   GROUP BY 1, 2)
        SELECT id_a, id_b,
               round(n_common / (na.n_sh + nb.n_sh - n_common), 4) AS jaccard
        FROM common
        JOIN sizes na ON na.doc_id = id_a
        JOIN sizes nb ON nb.doc_id = id_b
        WHERE n_common / (na.n_sh + nb.n_sh - n_common) >= 0.12""",
)
def ngram_jaccard(spark, sf):
    """Blocked by ``source`` (host-like key) — the scale-correct pattern:
    the shingle self-join only compares documents within one block."""
    from crawlspark import textops

    d = _t(spark, sf, "documents").select("doc_id", "source", "text")
    return textops.ngram_jaccard_pairs(d, k=3, threshold=0.12, block_col="source")


@_q(
    "fingerprint",
    f"SELECT doc_id, md5({_NORM_TEXT}) AS fp_md5 FROM documents",
)
def fingerprint(spark, sf):
    from crawlspark import textops

    return textops.fingerprint(_t(spark, sf, "documents")).select("doc_id", "fp_md5")


# --------------------------------------------------------------------------
# training-data ops: text analysis
# --------------------------------------------------------------------------
_LANG_CASE = """
    CASE WHEN best > 0 AND score_de = best THEN 'de'
         WHEN best > 0 AND score_en = best THEN 'en'
         WHEN best > 0 AND score_es = best THEN 'es'
         WHEN best > 0 AND score_fr = best THEN 'fr'
         WHEN best > 0 AND score_zh = best THEN 'zh'
         ELSE 'und' END
"""


@_q(
    "lang_id",
    f"""WITH s AS (
          SELECT doc_id,
                 len(list_intersect(list_distinct({_WORDS}), ['der','die','und','von','ist','ein'])) AS score_de,
                 len(list_intersect(list_distinct({_WORDS}), ['the','and','of','to','is','a'])) AS score_en,
                 len(list_intersect(list_distinct({_WORDS}), ['el','la','y','de','es','un'])) AS score_es,
                 len(list_intersect(list_distinct({_WORDS}), ['le','la','et','de','est','un'])) AS score_fr,
                 len(list_intersect(list_distinct({_WORDS}), ['de5','shi4','he2','zai4','le5','you3'])) AS score_zh
          FROM documents),
        b AS (SELECT *, greatest(score_de, score_en, score_es, score_fr, score_zh) AS best FROM s)
        SELECT doc_id, score_de, score_en, score_es, score_fr, score_zh,
               {_LANG_CASE} AS pred_lang
        FROM b""",
)
def lang_id(spark, sf):
    from crawlspark import textops

    return textops.lang_id(_t(spark, sf, "documents"))


@_q(
    "quality_score",
    f"""SELECT doc_id,
               length(text) AS n_chars_q,
               len({_WORDS}) AS n_words,
               round((length(text) - (len({_WORDS}) - 1)) / len({_WORDS}), 4) AS avg_word_len,
               len(list_intersect(list_distinct({_WORDS}), ['a','the','and','of'])) AS n_stopword_kinds,
               round(least(1.0, len({_WORDS}) / 100.0) * 0.5
                     + least(1.0, len(list_intersect(list_distinct({_WORDS}), ['a','the','and','of'])) / 4.0) * 0.5,
                     4) AS quality
        FROM documents""",
)
def quality_score(spark, sf):
    from crawlspark import textops

    return textops.quality_score(_t(spark, sf, "documents"))


@_q(
    "token_count",
    f"""SELECT doc_id, len({_WORDS}) AS ws_tokens,
               len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS re_tokens
        FROM documents""",
)
def token_count(spark, sf):
    from crawlspark import textops

    return textops.token_count(_t(spark, sf, "documents"))


# --------------------------------------------------------------------------
# similarity search
# --------------------------------------------------------------------------
_COS_SQL = """
    list_sum(list_transform(generate_series(1, 64),
        i -> q_vec[i]::DOUBLE * c_vec[i]::DOUBLE))
    / (sqrt(list_sum(list_transform(generate_series(1, 64), i -> q_vec[i]::DOUBLE * q_vec[i]::DOUBLE)))
       * sqrt(list_sum(list_transform(generate_series(1, 64), i -> c_vec[i]::DOUBLE * c_vec[i]::DOUBLE))))
"""


@_q(
    "ann_brute",
    f"""WITH q AS (SELECT vec_id AS q_id, embedding AS q_vec FROM embeddings WHERE vec_id < 3),
        scored AS (
          SELECT q.q_id, c.vec_id, q.q_vec, c.embedding AS c_vec FROM q, embeddings c),
        cosd AS (SELECT q_id, vec_id, {_COS_SQL} AS cos FROM scored)
        SELECT q_id, vec_id, round(cos, 4) AS cos, rank FROM (
          SELECT q_id, vec_id, cos,
                 row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rank
          FROM cosd)
        WHERE rank <= 5""",
)
def ann_brute(spark, sf):
    from crawlspark import simsearch

    e = _t(spark, sf, "embeddings")
    q = e.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    return simsearch.cosine_topk(q, e.select("vec_id", "embedding"), k=5)


@_q("ann_lsh")  # rows-only: bucket assignment not expressible in SQL oracle
def ann_lsh(spark, sf):
    from crawlspark import simsearch

    e = _t(spark, sf, "embeddings")
    q = e.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    return simsearch.lsh_topk(q, e.select("vec_id", "embedding"), dim=64, k=5, n_planes=4)


@_q(
    "embed_neardup",
    """WITH e2 AS (SELECT vec_id, embedding FROM embeddings
                   UNION ALL SELECT vec_id + 100000, embedding FROM embeddings)
       SELECT a.vec_id AS id_a, b.vec_id AS id_b,
              round(list_cosine_similarity(a.embedding, b.embedding), 4) AS cos
       FROM e2 a JOIN e2 b ON a.vec_id < b.vec_id
       WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.999""",
)
def embed_neardup(spark, sf):
    from crawlspark import simsearch

    e = _t(spark, sf, "embeddings").select("vec_id", "embedding")
    e2 = e.unionByName(e.select((F.col("vec_id") + 100000).alias("vec_id"), "embedding"))
    return simsearch.neardup_pairs(e2, threshold=0.999, dim=64, n_planes=4)


# --------------------------------------------------------------------------
# multimodal plumbing (rows-only: synthetic binary payloads)
# --------------------------------------------------------------------------
@_q("multimodal_features")
def multimodal_features(spark, sf):
    from crawlspark import multimodal

    media = multimodal.synthesize_media(spark, 100)
    return multimodal.decode_features(media, strict=False)


@_q("multimodal_meta")
def multimodal_meta(spark, sf):
    from crawlspark import multimodal

    media = multimodal.synthesize_media(spark, 100)
    return multimodal.media_metadata(media)


# --------------------------------------------------------------------------
# crawl-domain ops (rows-only: engine state, not SQL-expressible)
# --------------------------------------------------------------------------
@_q("bloom_roundtrip")
def bloom_roundtrip(spark, sf):
    """C3: build sidecar from even doc hashes, probe all; survivors are the
    odd docs plus ≤1% false-positive leakage (re-checked exactly in crawl)."""
    import tempfile

    from crawlspark import bloom, urlnorm

    d = _t(spark, sf, "documents").select(
        F.xxhash64(F.col("doc_id").cast("string")).alias("url_hash"),
        (F.col("doc_id") % 2).alias("par"),
    ).withColumn("bucket", urlnorm.bucket(F.col("url_hash"), 16))
    seen = d.filter(F.col("par") == 0).select("url_hash", "bucket")
    with tempfile.TemporaryDirectory() as td:
        sidecar = f"{td}/bloom"
        bloom.write_sidecar(bloom.build(seen), sidecar)
        out = bloom.probe(d.select("url_hash", "bucket"), sidecar)
        n_out = out.count()
    return spark.createDataFrame([(n_out,)], "n_unseen long")


@_q("sched_schedule")
def sched_schedule(spark, sf):
    """J4/F1/F2: politeness schedule over a documents-derived frontier."""
    from crawlspark import sched, urlnorm

    d = _t(spark, sf, "documents")
    url = F.concat(F.lit("https://"), "source", F.lit(".example/d/"), F.col("doc_id").cast("string"))
    frontier = d.select(
        url.alias("url"),
        F.xxhash64(url).alias("url_hash"),
        F.concat("source", F.lit(".example")).alias("host"),
        F.lit(0.0).alias("priority"),
        F.lit(0).cast("int").alias("depth"),
        F.lit(0).cast("int").alias("discovered_round"),
        F.lit(1.0).alias("crawl_delay"),
    ).withColumn("bucket", urlnorm.bucket(F.col("url_hash"), 16))
    out = sched.schedule(frontier, round_no=0, round_seconds=30.0, salt=4)
    return out.select("url", "host", "host_rank", "sched_ts")


@_q("crawl_round")
def crawl_round(spark, sf):
    """Flagship end-to-end slice (same pipeline as entry())."""
    return _flagship(spark, sf)


# --------------------------------------------------------------------------
# flagship / entry
# --------------------------------------------------------------------------
def _flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One crawl round over pages synthesized from the documents table:
    canon → hash → dedup → schedule → as-of fetch join → extract."""
    from crawlspark import config, crawl
    from crawlspark.schemas import ROBOTS_SCHEMA

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    d = _t(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"), "source", F.lit(".example/d/"), F.col("doc_id").cast("string")
    )
    html = F.encode(
        F.concat(
            F.lit("<html><head><title>D"),
            F.col("doc_id").cast("string"),
            F.lit("</title></head><body><p>"),
            F.col("text"),
            F.lit("</p></body></html>"),
        ),
        "UTF-8",
    )
    pages = d.select(
        url.alias("url"),
        F.lit("2024-01-01 00:00:00").cast("timestamp").alias("warc_ts"),
        html.alias("html"),
        F.col("text"),
        F.col("lang"),
    )
    seeds = d.filter(F.col("doc_id") < 200).select(
        F.concat(
            F.lit("HTTPS://"), F.upper("source"), F.lit(".EXAMPLE:443/d/"),
            F.col("doc_id").cast("string"),
        ).alias("url")
    )
    robots = spark.createDataFrame(
        [("src0.example", [], 0.5)], ROBOTS_SCHEMA
    )
    cfg = config.CrawlConfig(rounds=1, round_seconds=120.0, n_buckets=16, salt=4)
    from crawlspark import sched

    result = crawl.crawl(spark, seeds, pages, robots, cfg=cfg)
    log = sched.log_with_seq(result["fetch_log"])
    txt = result["extracted"]
    return log.join(txt, "url", "left_outer").select(
        "round", "seq", "url", "text"
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB twins for every SQL-expressible query above."""
    return dict(_ORACLES)
