"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry from ``__spark_entry__`` on Spark and its
``oracle_sql()`` twin on DuckDB over the same sf dir, then compares
row-count, column names, and order-insensitive values (columns sorted by
name, rows sorted by all columns — mirroring the driver's value-hash).

Usage:  python tools/selfcheck.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, "/root/repo")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _norm_cell(v):
    """TYPED normalization — at least as strict as the driver's value hash.

    Round 1 lesson (VERDICT item 1): this used to round floats to 9 digits
    and silently coerce numpy ints, which let a BIGINT-vs-DOUBLE floor/ceil
    mismatch (fn_math) pass locally while failing the driver.  Values are
    now tagged with their type class: 18 (int) != 18.0 (float), exact float
    compare (queries round on BOTH sides in SQL/Spark, so bit-identical
    values are the contract).
    """
    import datetime

    import numpy as np

    if v is None:
        return None
    if isinstance(v, (bool, np.bool_)):  # before int: bool subclasses int
        return ("b", bool(v))
    if isinstance(v, (float, np.floating)):
        f = float(v)
        if math.isnan(f):
            return ("f", "NaN")
        return ("f", f)
    if isinstance(v, (int, np.integer)):
        return ("i", int(v))
    if isinstance(v, datetime.datetime):
        return ("t", v.replace(tzinfo=None).isoformat())
    if isinstance(v, datetime.date):
        return ("d", v.isoformat())
    if isinstance(v, (list, tuple, np.ndarray)):
        return tuple(_norm_cell(x) for x in v)
    if isinstance(v, bytes):
        return ("y", v.hex())
    if isinstance(v, str):
        return ("s", v)
    return ("o", str(v))


def complex_cols(schema) -> list[str]:
    """Top-level array/map/struct columns — the driver canonicalizer crashes
    on these (pandas sort_values → unhashable list), so no registered query
    may emit one.  r2's single red row (multimodal_pipeline) was this."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    return [
        f.name
        for f in schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]


def _norm_frame(pdf):
    cols = sorted(pdf.columns)
    rows = []
    for t in pdf[cols].itertuples(index=False, name=None):
        rows.append(tuple(_norm_cell(v) for v in t))
    rows.sort(key=lambda r: tuple((x is None, str(x)) for x in r))
    return cols, rows


def main() -> int:
    import duckdb

    import __spark_entry__ as entrymod
    from crawlspark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = get_spark("selfcheck", master="local[8]", shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = n_rows_only = 0
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        try:
            sdf = fn(spark, sf_dir)
            # r2 lesson (VERDICT item 2): rows-only queries are canonicalized
            # by the driver too — multimodal_pipeline was rows-only and still
            # crashed it, so the guard runs before any oracle branching.
            bad = complex_cols(sdf.schema)
            if bad:
                print(
                    f"FAIL {name}: complex top-level columns {bad} — "
                    "driver canonicalizer cannot hash array/map/struct; "
                    "stringify (to_json / concat_ws) before returning"
                )
                n_fail += 1
                failures.append(name)
                continue
            spdf = sdf.toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            failures.append(name)
            continue
        if name not in oracles:
            print(f"rows-only {name}: {len(spdf)} rows  ({time.monotonic()-t0:.1f}s)")
            n_rows_only += 1
            continue
        try:
            opdf = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            failures.append(name)
            continue
        scols, srows = _norm_frame(spdf)
        ocols, orows = _norm_frame(opdf)
        ok = True
        if len(srows) != len(orows):
            print(f"FAIL {name}: row count spark={len(srows)} duckdb={len(orows)}")
            ok = False
        elif scols != ocols:
            print(f"FAIL {name}: columns spark={scols} duckdb={ocols}")
            ok = False
        elif srows != orows:
            diff = [
                (a, b) for a, b in zip(srows, orows) if a != b
            ][:3]
            print(f"FAIL {name}: {len([1 for a,b in zip(srows,orows) if a!=b])} differing rows, e.g. {diff}")
            ok = False
        if ok:
            print(f"PASS {name}: {len(srows)} rows  ({time.monotonic()-t0:.1f}s)")
            n_pass += 1
        else:
            n_fail += 1
            failures.append(name)

    print(f"\n== {n_pass} pass, {n_rows_only} rows-only, {n_fail} fail ==")
    if failures:
        print("failed:", " ".join(failures))
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
