"""Snapshot commit / resume (SURVEY.md §2 A3-A4; BASELINE.json: "every stage
checkpoints frontier + seen-set state … so a killed run resumes exactly").

Local layout (Iceberg-shaped; the Iceberg writer is a drop-in behind the
same narrow API on a real cluster — no jar available in this sandbox):

    <root>/<run_id>/round=<k>/frontier/   parquet
                              seen/       parquet (full checkpoint rounds)
                              seen_delta/ parquet (delta rounds — see below)
                              bloom/      parquet partitioned by bucket
                              fetch_log/  parquet (round, seq, url)
                              metrics/    parquet
                              _manifest.json   ← written LAST = commit point

A round directory without ``_manifest.json`` is an uncommitted torn write
and is ignored on resume.  The manifest carries run_id, round, parent round,
the bucket-fn version (detects incompatible re-bucketing — SURVEY.md §7
hard-part 3) and per-partition row counts (lineage).

**Incremental seen (r5).** The seen set is monotone within a run and the
crawl loop maintains it as parent ∪ round-delta (a provably disjoint
union, crawlspark/crawl.py run_round).  Writing the FULL set every round
is O(|seen|) I/O per round — O(n²) cumulative over a long crawl, the one
snapshot cost that would not survive a 10^10-url seen table.  So a round
may commit only its delta (``seen_mode: "delta"`` in the manifest, table
``seen_delta/``); resume reconstructs the set with ONE multi-path parquet
scan over the nearest older full checkpoint plus the deltas after it.
Full checkpoints recur every ``CrawlConfig.seen_checkpoint_every`` rounds
(the streaming-state-store delta+snapshot pattern), which bounds chain
length, resume fan-in, and how much history GC must retain.
``gc_snapshots`` protects the live chain of every kept round.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession

from . import config

MANIFEST = "_manifest.json"


def _write_manifest(d: str, manifest: dict) -> None:
    """Durable manifest flip — the commit point.  fsync the file BEFORE the
    rename and the directory AFTER it: os.replace alone orders only the
    rename metadata, so a machine crash could journal the rename while the
    file data is still unflushed, leaving a zero-length _manifest.json that
    committed_rounds would count as committed (wedging resume AND gc)."""
    tmp = os.path.join(d, MANIFEST + ".tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, os.path.join(d, MANIFEST))
    dfd = os.open(d, os.O_RDONLY)
    try:
        os.fsync(dfd)
    finally:
        os.close(dfd)


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
    seen: DataFrame | None,
    bloom_df: DataFrame | None = None,
    fetch_log: DataFrame | None = None,
    metrics: DataFrame | None = None,
    extra: dict | None = None,
    n_buckets: int | None = None,
    seen_delta: DataFrame | None = None,
) -> str:
    """Write all state tables, then the manifest last (the commit point).

    The 2-5 table writes are independent Spark jobs submitted from driver
    threads so they overlap (inputs are checkpointed upstream — no shared
    recompute); lineage comes from the written files' parquet footers, so
    the whole commit costs exactly one job per table and zero collects.

    When ``seen_delta`` is given, ONLY the delta is written (``seen`` is
    ignored — the caller's in-memory union stays the loop's working set)
    and the manifest records ``seen_mode: "delta"``.  Sound only when the
    full set equals parent-round seen ∪ this delta, which the crawl loop
    guarantees (disjoint absorb); requires the parent round to be
    committed, else the chain could never be reconstructed — refused.
    """
    from concurrent.futures import ThreadPoolExecutor

    d = _round_dir(root, run_id, round_no)
    # ALL side-effect-free validation happens before the destructive rmtree:
    # a refused commit must leave any previously committed round dir intact
    # (destroy-then-raise would erase the newest round and break resume)
    if seen is None and seen_delta is None:
        raise ValueError(
            "commit_snapshot needs the full seen table or a seen_delta"
        )
    if seen_delta is not None:
        parent_d = _round_dir(root, run_id, round_no - 1)
        if round_no <= 0 or not os.path.exists(os.path.join(parent_d, MANIFEST)):
            raise ValueError(
                f"delta seen snapshot for round {round_no} requires a "
                "committed parent round (the delta chain must reach a full "
                "checkpoint); commit the full seen table instead"
            )
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
        (seen_delta, "seen_delta", None) if seen_delta is not None else (seen, "seen", None),
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
        "seen_mode": "delta" if seen_delta is not None else "full",
        "lineage": lineage,
        **(extra or {}),
    }
    _write_manifest(d, manifest)
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
            # tolerate junk dirs (operator backups like round=3.bak) the
            # same way torn round dirs are tolerated — skip, don't wedge
            # resume/gc for the whole run on one unparseable name
            try:
                out.append(int(name.split("=", 1)[1]))
            except ValueError:
                continue
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
    if r not in rounds:
        # informative refusal instead of a raw open() error — and a torn
        # dir for round r reads correctly as "uncommitted", not "missing"
        raise FileNotFoundError(
            f"round {r} is not committed for run {run_id} "
            f"(committed: {rounds})"
        )
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
    seen = spark.read.parquet(*_seen_chain_paths(root, run_id, r, manifest))
    return frontier, seen, r, manifest


def _seen_chain(root: str, run_id: str, r: int, manifest: dict) -> list[tuple[int, str]]:
    """(round, table-dir) pairs whose union IS round ``r``'s seen set: the
    round's own table for a full checkpoint, else its delta plus every
    ancestor delta down to the nearest full checkpoint.  The deltas are
    pairwise disjoint by construction, so plain union semantics (no
    distinct) are exact."""
    if manifest.get("seen_mode", "full") != "delta":
        return [(r, "seen")]
    chain = [(r, "seen_delta")]
    rr = r - 1
    while True:
        mpath = os.path.join(_round_dir(root, run_id, rr), MANIFEST)
        if rr < 0 or not os.path.exists(mpath):
            raise FileNotFoundError(
                f"seen delta chain for round {r} is broken at round {rr} "
                f"(missing committed parent under {os.path.join(root, run_id)}); "
                "the full set cannot be reconstructed — was the chain GC'd "
                "by hand instead of via gc_snapshots?"
            )
        with open(mpath) as f:
            mfi = json.load(f)
        if mfi.get("seen_mode", "full") != "delta":
            chain.append((rr, "seen"))
            return chain
        chain.append((rr, "seen_delta"))
        rr -= 1


def _seen_chain_paths(root: str, run_id: str, r: int, manifest: dict) -> list[str]:
    return [
        os.path.join(_round_dir(root, run_id, rr), name)
        for rr, name in _seen_chain(root, run_id, r, manifest)
    ]


def compact_snapshot(spark: SparkSession, root: str, run_id: str) -> int:
    """Rewrite the newest committed round as a self-contained FULL seen
    checkpoint, freeing its delta chain for GC.

    A run that stops mid-chain (its newest round is a delta) pins every
    ancestor down to the last full checkpoint — ``gc_snapshots`` protects
    them, so minimal single-round retention is unreachable until the next
    cadence checkpoint.  This offline step reconstructs the newest round's
    seen set (one multi-path scan), writes it as ``seen/``, atomically
    flips the manifest to ``seen_mode: "full"`` (write-tmp-then-rename,
    same commit discipline as commit_snapshot), and removes the round's
    now-redundant delta dir.  Returns the compacted round number; a run
    already ending on a full checkpoint is a no-op.  Crash-safe: until the
    manifest flips, the round still reads as a delta and the chain is
    intact; after it flips, the full table is already in place.
    """
    rounds = committed_rounds(root, run_id)
    if not rounds:
        raise FileNotFoundError(f"no committed snapshot for run {run_id} under {root}")
    r = rounds[-1]
    d = _round_dir(root, run_id, r)
    with open(os.path.join(d, MANIFEST)) as f:
        manifest = json.load(f)
    if manifest.get("seen_mode", "full") != "delta":
        return r
    seen = spark.read.parquet(*_seen_chain_paths(root, run_id, r, manifest))
    seen.write.mode("overwrite").parquet(os.path.join(d, "seen"))
    manifest["seen_mode"] = "full"
    manifest["lineage"]["seen"] = _dir_lineage(os.path.join(d, "seen"))
    manifest["lineage"].pop("seen_delta", None)
    _write_manifest(d, manifest)
    shutil.rmtree(os.path.join(d, "seen_delta"), ignore_errors=True)
    return r


def bloom_path(root: str, run_id: str, round_no: int) -> str:
    return os.path.join(_round_dir(root, run_id, round_no), "bloom")


def gc_snapshots(root: str, run_id: str, keep_last: int = 2) -> list[int]:
    """Snapshot retention: delete all but the newest ``keep_last`` COMMITTED
    rounds of a run and return the deleted round numbers.

    A full-checkpoint round is self-contained; a delta round (seen_mode
    "delta") needs its ancestor chain down to the nearest full checkpoint
    to reconstruct the seen set, so every kept round's live chain is
    protected too — GC can never orphan a resumable round.  Chain length
    (hence the retention floor) is bounded by the writer's
    ``seen_checkpoint_every``.  Uncommitted round dirs (no manifest — a
    crash mid-write) older than the newest committed round are removed
    too; a NEWER uncommitted dir is left alone, since it may be a commit
    in progress.  ``keep_last`` < 1 is rejected — the run must stay
    resumable.
    """
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    committed = committed_rounds(root, run_id)
    if not committed:
        return []
    keep = set(committed[-keep_last:])
    for k in sorted(keep):
        d = _round_dir(root, run_id, k)
        with open(os.path.join(d, MANIFEST)) as f:
            mf = json.load(f)
        if mf.get("seen_mode", "full") == "delta":
            # protect the whole reconstruction chain of this kept round
            keep.update(rr for rr, _name in _seen_chain(root, run_id, k, mf))
    newest = committed[-1]
    base = os.path.join(root, run_id)
    deleted: list[int] = []
    for name in os.listdir(base):
        if not name.startswith("round="):
            continue
        try:
            r = int(name.split("=", 1)[1])
        except ValueError:
            continue  # operator junk (round=3.bak): never gc, never wedge
        is_committed = r in committed
        if r in keep or (not is_committed and r > newest):
            continue
        shutil.rmtree(os.path.join(base, name), ignore_errors=True)
        if is_committed:
            deleted.append(r)
    return sorted(deleted)
