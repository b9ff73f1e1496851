"""Snapshot commit / resume (SURVEY.md §2 A3-A4; BASELINE.json: "every stage
checkpoints frontier + seen-set state … so a killed run resumes exactly").

Local layout (Iceberg-shaped; the Iceberg writer is a drop-in behind the
same narrow API on a real cluster — no jar available in this sandbox):

    <root>/<run_id>/round=<k>/frontier/   parquet
                              seen/       parquet (bucketed by `bucket`)
                              bloom/      parquet partitioned by bucket
                              fetch_log/  parquet (round, seq, url)
                              metrics/    parquet
                              _manifest.json   ← written LAST = commit point

A round directory without ``_manifest.json`` is an uncommitted torn write
and is ignored on resume.  The manifest carries run_id, round, parent round,
the bucket-fn version (detects incompatible re-bucketing — SURVEY.md §7
hard-part 3) and per-partition row counts (lineage).
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession

from . import config

MANIFEST = "_manifest.json"


def _round_dir(root: str, run_id: str, round_no: int) -> str:
    return os.path.join(root, run_id, f"round={round_no}")


def _dir_lineage(path: str) -> list[dict]:
    """Per-output-file row counts from the parquet footers of a just-written
    table — a driver-side metadata read, NOT a Spark job (round-1 VERDICT:
    the previous groupBy(spark_partition_id).collect() was 5 extra barrier
    jobs per round).  On Iceberg the same lineage comes free from the
    snapshot manifest's per-file record counts."""
    import pyarrow.parquet as pq

    out = []
    for root, _dirs, files in sorted(os.walk(path)):
        for name in sorted(files):
            if not name.endswith(".parquet"):
                continue
            f = os.path.join(root, name)
            out.append(
                {
                    "file": os.path.relpath(f, path),
                    "rows": pq.ParquetFile(f).metadata.num_rows,
                }
            )
    return out


def commit_snapshot(
    root: str,
    run_id: str,
    round_no: int,
    frontier: DataFrame,
    seen: DataFrame,
    bloom_df: DataFrame | None = None,
    fetch_log: DataFrame | None = None,
    metrics: DataFrame | None = None,
    extra: dict | None = None,
    n_buckets: int | None = None,
) -> str:
    """Write all state tables, then the manifest last (the commit point).

    The 2-5 table writes are independent Spark jobs submitted from driver
    threads so they overlap (inputs are checkpointed upstream — no shared
    recompute); lineage comes from the written files' parquet footers, so
    the whole commit costs exactly one job per table and zero collects.
    """
    from concurrent.futures import ThreadPoolExecutor

    d = _round_dir(root, run_id, round_no)
    if os.path.exists(d):
        shutil.rmtree(d)  # torn previous attempt
    lineage: dict[str, list[dict]] = {}

    def _write(df: DataFrame, name: str, partition_by: str | None = None) -> str:
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(partition_by)
        w.parquet(os.path.join(d, name))
        return name

    jobs: list[tuple[DataFrame, str, str | None]] = [
        (frontier, "frontier", None),
        (seen, "seen", None),
    ]
    if bloom_df is not None:
        jobs.append((bloom_df, "bloom", "bucket"))
    if fetch_log is not None:
        jobs.append((fetch_log, "fetch_log", None))
    if metrics is not None:
        jobs.append((metrics, "metrics", None))
    with ThreadPoolExecutor(max_workers=len(jobs)) as ex:
        futs = [ex.submit(_write, df, name, pb) for df, name, pb in jobs]
        for f in futs:
            f.result()
    for _df, name, _pb in jobs:
        lineage[name] = _dir_lineage(os.path.join(d, name))

    manifest = {
        "run_id": run_id,
        "round": round_no,
        "parent_round": round_no - 1 if round_no > 0 else None,
        "bucket_fn_version": config.BUCKET_FN_VERSION,
        "bloom_version": config.BLOOM_VERSION,
        # the RUN's actual modulus, not the module default: a resume under a
        # different n_buckets silently mismatches the (bucket, url_hash)
        # anti-join and re-fetches seen URLs (round-1 ADVICE)
        "n_buckets": config.N_BUCKETS if n_buckets is None else int(n_buckets),
        "lineage": lineage,
        **(extra or {}),
    }
    tmp = os.path.join(d, MANIFEST + ".tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    os.replace(tmp, os.path.join(d, MANIFEST))
    return d


def committed_rounds(root: str, run_id: str) -> list[int]:
    base = os.path.join(root, run_id)
    if not os.path.isdir(base):
        return []
    out = []
    for name in os.listdir(base):
        if name.startswith("round=") and os.path.exists(
            os.path.join(base, name, MANIFEST)
        ):
            out.append(int(name.split("=", 1)[1]))
    return sorted(out)


def load_snapshot(
    spark: SparkSession,
    root: str,
    run_id: str,
    round_no: int | None = None,
    expected_n_buckets: int | None = None,
) -> tuple[DataFrame, DataFrame, int, dict]:
    """Load (frontier, seen, round, manifest) from the latest (or given)
    committed round; refuses a snapshot written under a different bucket fn
    or (when ``expected_n_buckets`` is given) a different bucket modulus —
    both would silently break the (bucket, url_hash) seen anti-join."""
    rounds = committed_rounds(root, run_id)
    if not rounds:
        raise FileNotFoundError(f"no committed snapshot for run {run_id} under {root}")
    r = round_no if round_no is not None else rounds[-1]
    d = _round_dir(root, run_id, r)
    with open(os.path.join(d, MANIFEST)) as f:
        manifest = json.load(f)
    if manifest["bucket_fn_version"] != config.BUCKET_FN_VERSION:
        raise ValueError(
            f"snapshot bucket fn {manifest['bucket_fn_version']!r} != "
            f"engine {config.BUCKET_FN_VERSION!r}; rebuild state"
        )
    if (
        expected_n_buckets is not None
        and manifest.get("n_buckets") is not None
        and int(manifest["n_buckets"]) != int(expected_n_buckets)
    ):
        raise ValueError(
            f"snapshot n_buckets {manifest['n_buckets']} != resuming config "
            f"{expected_n_buckets}; newly discovered links would bucket under "
            "a different modulus and seen URLs would be re-fetched — "
            "resume with the original n_buckets or rebuild state"
        )
    frontier = spark.read.parquet(os.path.join(d, "frontier"))
    seen = spark.read.parquet(os.path.join(d, "seen"))
    return frontier, seen, r, manifest


def bloom_path(root: str, run_id: str, round_no: int) -> str:
    return os.path.join(_round_dir(root, run_id, round_no), "bloom")


def gc_snapshots(root: str, run_id: str, keep_last: int = 2) -> list[int]:
    """Snapshot retention: delete all but the newest ``keep_last`` COMMITTED
    rounds of a run and return the deleted round numbers.

    Every committed round stores the FULL (frontier, seen) state, so older
    rounds are redundant for resume — retaining more than one only buys
    point-in-time rollback.  Uncommitted round dirs (no manifest — a crash
    mid-write) older than the newest committed round are removed too; a
    NEWER uncommitted dir is left alone, since it may be a commit in
    progress.  ``keep_last`` < 1 is rejected — the run must stay resumable.
    """
    import shutil

    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    committed = committed_rounds(root, run_id)
    if not committed:
        return []
    keep = set(committed[-keep_last:])
    newest = committed[-1]
    base = os.path.join(root, run_id)
    deleted: list[int] = []
    for name in os.listdir(base):
        if not name.startswith("round="):
            continue
        r = int(name.split("=", 1)[1])
        is_committed = r in committed
        if r in keep or (not is_committed and r > newest):
            continue
        shutil.rmtree(os.path.join(base, name), ignore_errors=True)
        if is_committed:
            deleted.append(r)
    return sorted(deleted)
