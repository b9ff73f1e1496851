"""Fixed, declared schemas for every engine table (SURVEY.md §1.2).

No schema inference on production paths: the crawl input table's shape is
contractually fixed by BASELINE.json ``input_hint``
(url:string, warc_ts:timestamp, html:binary, text:string, lang:string).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# The crawl input (Common-Crawl-style pages).  BASELINE.json:input_hint.
PAGES_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("warc_ts", TimestampType(), False),
        StructField("html", BinaryType(), True),
        StructField("text", StringType(), True),
        StructField("lang", StringType(), True),
    ]
)

SEED_SCHEMA = StructType([StructField("url", StringType(), False)])

# FIXTURES.md §5
FRONTIER_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("url_hash", LongType(), False),
        StructField("host", StringType(), False),
        StructField("priority", DoubleType(), False),
        StructField("depth", IntegerType(), False),
        StructField("discovered_round", IntegerType(), False),
    ]
)

SEEN_SCHEMA = StructType(
    [
        StructField("url_hash", LongType(), False),
        StructField("bucket", IntegerType(), False),
    ]
)

BLOOM_SCHEMA = StructType(
    [
        StructField("bucket", IntegerType(), False),
        StructField("bitset", BinaryType(), False),
        StructField("n_items", LongType(), False),
        StructField("version", StringType(), False),
    ]
)

ROBOTS_SCHEMA = StructType(
    [
        StructField("host", StringType(), False),
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

METRICS_SCHEMA = StructType(
    [
        StructField("run_id", StringType(), False),
        StructField("round", IntegerType(), False),
        StructField("stage", StringType(), False),
        StructField("partition_id", IntegerType(), False),
        StructField("rows_in", LongType(), False),
        StructField("rows_out", LongType(), False),
        StructField("wall_ms", LongType(), False),
    ]
)

# scheduler output (sched.py): frontier columns + schedule assignment
SCHEDULED_SCHEMA = StructType(
    list(FRONTIER_SCHEMA.fields)
    + [
        StructField("host_rank", IntegerType(), False),
        StructField("sched_ts", DoubleType(), False),
    ]
)

# the persisted fetch log; the total order within a round is
# (sched_ts, host, url), from which sched.log_with_seq derives dense seqs
FETCH_LOG_SCHEMA = StructType(
    [
        StructField("round", IntegerType(), False),
        StructField("sched_ts", DoubleType(), False),
        StructField("host", StringType(), False),
        StructField("url", StringType(), False),
    ]
)

# validation-time view (sched.log_with_seq output); seq is int64 — a round
# at 10^10-URL scale overflows int32 (ADVICE r1)
FETCH_ORDER_SCHEMA = StructType(
    [
        StructField("round", IntegerType(), False),
        StructField("seq", LongType(), False),
        StructField("url", StringType(), False),
    ]
)
