"""WARC ingestion throughput bench (r4 verdict item 6).

``read_warc`` parses archives Python-side, one archive per task — parallel
across files but never measured.  This run pins the numbers and the
guidance:

* BALANCED corpus: ``N_FILES`` .warc.gz archives x ``RECS_PER_FILE``
  records of deterministic synthetic HTML (gen_pages.html_of — the same
  payloads the crawl bench extracts), read end-to-end through
  ``read_warc`` -> noop write.  Reports MB/s (compressed bytes on disk and
  decoded record bytes) and MB/s/core.
* JUMBO corpus: ONE archive holding ``JUMBO_RECS`` records — the layout
  where one-task-per-archive serializes the stage.  Measured three ways:
  ``read_warc`` (single task), ``read_records_at`` over the full offset
  index without splitting (still single task — the group key is the
  filename), and ``read_records_at(split_mb=...)`` (offset-range chunks,
  the r5 sub-file parallel path).

Archives are generated once by a process pool (hashlib md5 per word —
CPU-bound) and cached under BENCH/data/warc_{tag}.  min-of-REPS timing,
rep0 of each cell is a dropped warmup.  Writes BENCH/warc_r5.json.

Usage: python tools/warc_bench.py
"""

from __future__ import annotations

import json
import os
import sys
import time
from concurrent.futures import ProcessPoolExecutor

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.join(_ROOT, "tests"))
os.environ["PYTHONPATH"] = (
    f"{_ROOT}:{os.path.join(_ROOT, 'tests')}:" + os.environ.get("PYTHONPATH", "")
)

N_FILES = int(os.environ.get("CRAWLSPARK_WARC_FILES", "64"))
RECS_PER_FILE = int(os.environ.get("CRAWLSPARK_WARC_RECS", "4000"))
# GB-class decoded: after the r5 linear-time gunzip fix an 80k-record
# (40 MB) jumbo parses in ~2 s single-task — too small for sub-file
# splitting to matter.  640k records (~325 MB compressed / ~1.7 GB
# decoded) is where one-task-per-archive visibly serializes the stage.
JUMBO_RECS = int(os.environ.get("CRAWLSPARK_WARC_JUMBO_RECS", "640000"))
CORES = int(os.environ.get("CRAWLSPARK_WARC_CORES", "16"))
REPS = int(os.environ.get("CRAWLSPARK_WARC_REPS", "3"))
SPLIT_MB = float(os.environ.get("CRAWLSPARK_WARC_SPLIT_MB", "4"))
DATA = os.path.join(_ROOT, "BENCH", "data")
OUT = os.path.join(_ROOT, "BENCH", "warc_r5.json")


def _records(lo: int, hi: int, n_pages: int):
    import gen_pages as gp

    for i in range(lo, hi):
        yield gp.url_of(i), gp.capture_ts(i, 0), gp.html_of(i, 0, n_pages)


def _write_one(args) -> list[tuple[str, int, int]]:
    """Write one archive; returns its (url, offset, length) index."""
    path, lo, hi, n_pages = args
    from crawlspark import warc

    return warc.write_warc(list(_records(lo, hi, n_pages)), path, compress=True)


def _ensure_corpus(tag: str, n_files: int, recs_per_file: int) -> tuple[str, str]:
    """Generate the archive set once (size-keyed cache); returns
    (dir, index json path).

    A single jumbo archive is generated as 16 part-files in the process
    pool and byte-concatenated — gzip members are independently
    concatenable, so the result is one valid multi-member .warc.gz and
    each part's offset index just shifts by the part's base offset."""
    d = os.path.join(DATA, f"warc_{tag}_{n_files}x{recs_per_file}")
    idx_path = d + "_index.json"
    if os.path.exists(idx_path):
        return d, idx_path
    os.makedirs(d, exist_ok=True)
    n_pages = n_files * recs_per_file
    t0 = time.monotonic()
    rows = []
    if n_files == 1:
        parts = 16
        per = (recs_per_file + parts - 1) // parts
        jobs = [
            (os.path.join(d, f".part{k:02d}"), k * per,
             min((k + 1) * per, recs_per_file), n_pages)
            for k in range(parts) if k * per < recs_per_file
        ]
        with ProcessPoolExecutor(max_workers=min(16, len(jobs))) as ex:
            indexes = list(ex.map(_write_one, jobs))
        final = os.path.join(d, "seg00000.warc.gz")
        base = 0
        with open(final, "wb") as out_f:
            for (path, _lo, _hi, _n), idx in zip(jobs, indexes):
                with open(path, "rb") as pf:
                    blob = pf.read()
                out_f.write(blob)
                rows.extend(
                    ("seg00000.warc.gz", base + off, ln)
                    for (_u, off, ln) in idx
                )
                base += len(blob)
                os.unlink(path)
    else:
        jobs = [
            (os.path.join(d, f"seg{k:05d}.warc.gz"), k * recs_per_file,
             (k + 1) * recs_per_file, n_pages)
            for k in range(n_files)
        ]
        with ProcessPoolExecutor(max_workers=min(16, len(jobs))) as ex:
            indexes = list(ex.map(_write_one, jobs))
        for (path, _lo, _hi, _n), idx in zip(jobs, indexes):
            fname = os.path.basename(path)
            rows.extend((fname, off, ln) for (_u, off, ln) in idx)
    with open(idx_path, "w") as f:
        json.dump(rows, f)
    print(f"generated {tag}: {n_files} files x {recs_per_file} recs "
          f"in {time.monotonic() - t0:.1f}s", file=sys.stderr)
    return d, idx_path


def _dir_bytes(d: str) -> int:
    return sum(
        os.path.getsize(os.path.join(d, f)) for f in os.listdir(d)
        if f.endswith(".warc.gz")
    )


def _spark():
    from crawlspark.session import get_spark

    return get_spark(
        f"warc-bench-{CORES}",
        master=f"local[{CORES}]",
        shuffle_partitions=max(16, CORES),
        extra_conf={"spark.driver.memory": "16g"},
    )


def _time_df(build, reps: int = REPS) -> tuple[float, int]:
    """min-of-reps wall for materializing build() (rep0 dropped as warmup);
    also returns the row count (from the warmup pass)."""
    n = build().count()
    best = None
    for _ in range(reps):
        df = build()
        t0 = time.monotonic()
        df.write.format("noop").mode("overwrite").save()
        wall = time.monotonic() - t0
        if best is None or wall < best:
            best = wall
    return best, n


def main() -> None:
    from pyspark.sql import functions as F

    from crawlspark import warc

    bal_dir, _ = _ensure_corpus("balanced", N_FILES, RECS_PER_FILE)
    jum_dir, jum_idx_path = _ensure_corpus("jumbo", 1, JUMBO_RECS)

    spark = _spark()
    out: dict = {
        "metric": "WARC ingestion throughput (synthetic multi-record .warc.gz)",
        "cores": CORES, "reps_min": REPS,
    }

    # --- balanced: one-task-per-archive is the right layout -------------
    comp_bytes = _dir_bytes(bal_dir)
    wall, n_rows = _time_df(lambda: warc.read_warc(spark, bal_dir))
    decoded = (
        warc.read_warc(spark, bal_dir)
        .agg(F.sum(F.length("html")).alias("b")).collect()[0]["b"]
    )
    out["balanced"] = {
        "files": N_FILES, "records": n_rows,
        "compressed_mb": round(comp_bytes / 2**20, 1),
        "decoded_html_mb": round(decoded / 2**20, 1),
        "wall_sec": round(wall, 2),
        "records_per_sec": round(n_rows / wall),
        "compressed_mb_per_sec": round(comp_bytes / 2**20 / wall, 1),
        "compressed_mb_per_sec_per_core": round(
            comp_bytes / 2**20 / wall / CORES, 3
        ),
    }
    print(f"balanced: {out['balanced']}", file=sys.stderr)

    # --- jumbo: one archive, three access paths --------------------------
    with open(jum_idx_path) as f:
        idx_rows = json.load(f)
    index = spark.createDataFrame(
        idx_rows, "filename string, offset long, length long"
    ).localCheckpoint(eager=True)
    jum_bytes = _dir_bytes(jum_dir)

    wall_scan, n_scan = _time_df(lambda: warc.read_warc(spark, jum_dir))
    wall_idx1, n_idx1 = _time_df(
        lambda: warc.read_records_at(spark, jum_dir, index)
    )
    wall_split, n_split = _time_df(
        lambda: warc.read_records_at(spark, jum_dir, index, split_mb=SPLIT_MB)
    )
    # index-FREE sub-file parallelism (late r5): validated-magic range scan
    wall_free, n_free = _time_df(
        lambda: warc.read_warc(spark, jum_dir, split_mb=SPLIT_MB)
    )
    assert n_scan == n_idx1 == n_split == n_free == JUMBO_RECS, (
        n_scan, n_idx1, n_split, n_free)
    out["jumbo"] = {
        "files": 1, "records": JUMBO_RECS,
        "compressed_mb": round(jum_bytes / 2**20, 1),
        "split_mb": SPLIT_MB,
        "read_warc_single_task_sec": round(wall_scan, 2),
        "records_at_unsplit_sec": round(wall_idx1, 2),
        "records_at_split_sec": round(wall_split, 2),
        "read_warc_indexfree_split_sec": round(wall_free, 2),
        "split_speedup_vs_single_task": round(wall_scan / wall_split, 2),
        "indexfree_speedup_vs_single_task": round(wall_scan / wall_free, 2),
    }
    print(f"jumbo: {out['jumbo']}", file=sys.stderr)
    spark.stop()

    with open(OUT, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
