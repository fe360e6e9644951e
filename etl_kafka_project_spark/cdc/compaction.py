"""Table maintenance: tombstone purge, small-file compaction, snapshot
expiry (vacuum).

Tombstones (SURVEY §2.7 U3): a delete keeps a marker row so stale
pre-delete events arriving later are recognized (``cdc/merge.py``). Once
the stream has drained past a watermark LSN, markers at or below it can
never matter again and are physically dropped — the batch analog of
``dropDuplicates`` over *watermarked* state (north star), with the lake
table playing the state store.

Small files: every MERGE rewrites its touched buckets, so steady-state
file counts stay bounded, but a long replay with many epochs and a
``maxRecordsPerFile``-style salting plan can still fragment cold buckets;
``compact`` rewrites any bucket whose file count exceeds a threshold.

Snapshot expiry mirrors Iceberg's ``expireSnapshots``: old snapshot JSONs
are deleted and data files referenced by NO retained snapshot are removed
from disk. Time travel keeps working for retained versions.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import functions as F

from etl_kafka_project_spark.cdc.salting import plan_write_splits, salted_repartition
from etl_kafka_project_spark.config import EngineConfig
from etl_kafka_project_spark.minilake.table import LakeTable


@dataclass
class CompactionStats:
    buckets_rewritten: int
    files_before: int
    files_after: int
    tombstones_purged: int
    snapshot_version: int | None


def compact(
    table: LakeTable,
    config: EngineConfig | None = None,
    purge_tombstones_below_lsn: int | None = None,
    max_files_per_bucket: int = 4,
) -> CompactionStats:
    """Rewrite buckets that are fragmented or carry purgeable tombstones.

    ``purge_tombstones_below_lsn``: tombstone rows with
    ``last_lsn <= watermark`` are dropped for good — pass the stream's
    drained-through LSN (e.g. ``max_lsn`` from the lineage log minus the
    re-delivery horizon). ``None`` purges nothing.
    """
    config = (config or EngineConfig()).validate()
    snap = table.snapshot()
    key_cols = snap.props["key_columns"]

    by_bucket: dict[int, int] = {}
    rows_by_bucket: dict[int, int] = {}
    for fe in snap.files:
        by_bucket[fe.bucket] = by_bucket.get(fe.bucket, 0) + 1
        rows_by_bucket[fe.bucket] = rows_by_bucket.get(fe.bucket, 0) + fe.rows

    fragmented = {b for b, n in by_bucket.items() if n > max_files_per_bucket}
    if purge_tombstones_below_lsn is not None:
        # buckets holding purgeable tombstones: found with one pruned scan
        # over the tombstone flag + lsn columns only (column-pruned read)
        tomb = (
            table.read(include_tombstones=True)
            .filter(F.col("_deleted") & (F.col("last_lsn") <= purge_tombstones_below_lsn))
            .select(table.bucket_expr(snap).alias("_bucket"))
            .groupBy("_bucket")
            .count()
            .collect()
        )
        fragmented |= {r["_bucket"] for r in tomb}
        n_tombs = sum(r["count"] for r in tomb)
    else:
        n_tombs = 0

    if not fragmented:
        return CompactionStats(0, len(snap.files), len(snap.files), 0, snap.version)

    df = table.read(buckets=fragmented, include_tombstones=True)
    if purge_tombstones_below_lsn is not None:
        df = df.filter(
            ~(F.col("_deleted") & (F.col("last_lsn") <= purge_tombstones_below_lsn))
        )
    df = df.withColumn("_bucket", table.bucket_expr(snap))
    splits = plan_write_splits(
        {b: rows_by_bucket.get(b, 0) for b in fragmented}, config.target_file_rows
    )
    df = salted_repartition(df, key_cols, splits, bucket_col="_bucket")
    new_files = table.write_data_files(df, bucket_col="_bucket")
    committed = table.commit(
        expected_version=snap.version,
        new_files=new_files,
        replaced_buckets=fragmented,
    )
    return CompactionStats(
        buckets_rewritten=len(fragmented),
        files_before=len(snap.files),
        files_after=len(committed.files),
        tombstones_purged=n_tombs,
        snapshot_version=committed.version,
    )


def expire_snapshots(
    table: LakeTable, keep_last: int = 2, orphan_grace_sec: float = 600.0
) -> dict:
    """Delete snapshot JSONs older than the newest ``keep_last`` versions
    and any data file no retained snapshot references (vacuum).

    Unreferenced data/manifest files younger than ``orphan_grace_sec``
    are LEFT ALONE (Iceberg orphan-removal style): ``commit()`` stages
    data files and manifests BEFORE the snapshot CAS, so a vacuum racing
    an in-flight commit would otherwise delete files the winning snapshot
    is about to reference. The grace period only needs to exceed one
    commit's stage-to-CAS window (sub-second in practice); pass ``0.0``
    when the caller holds exclusive access.
    """
    import time

    now = time.time()

    def _expired(path: str) -> bool:
        try:
            return (now - os.path.getmtime(path)) >= orphan_grace_sec
        except OSError:
            return False  # concurrently removed/renamed — not ours

    current = table.current_version()
    floor = max(0, current - keep_last + 1)
    snap_dir = os.path.join(table.root, "snapshots")
    # a version inside the window may already be gone (an earlier run
    # with a smaller keep_last deleted it) — retain what exists, never
    # abort the vacuum on a historical gap
    keep_versions = [
        v
        for v in range(floor, current + 1)
        if os.path.exists(os.path.join(snap_dir, f"v{v}.json"))
    ]
    retained_files: set[str] = set()
    retained_manifests: set[str] = set()
    for v in keep_versions:
        snap = table.snapshot(v)
        retained_files |= {fe.path for fe in snap.files}
        retained_manifests |= {m["path"] for m in snap.manifests.values()}

    removed_snaps = 0
    for fn in os.listdir(snap_dir):
        if not (fn.startswith("v") and fn.endswith(".json")):
            continue
        v = int(fn[1:-5])
        # strictly below the floor only: a snapshot NEWER than the
        # captured current version is a commit that raced this vacuum —
        # deleting it would wedge the table (pointer ahead of the
        # newest JSON) and orphan the epoch's just-committed data
        if v < floor:
            os.remove(os.path.join(snap_dir, fn))
            removed_snaps += 1

    removed_data = 0
    data_dir = os.path.join(table.root, "data")
    for bucket_dir in os.listdir(data_dir):
        bdir = os.path.join(data_dir, bucket_dir)
        for fn in os.listdir(bdir):
            rel = f"data/{bucket_dir}/{fn}"
            full = os.path.join(bdir, fn)
            if rel not in retained_files and _expired(full):
                os.remove(full)
                removed_data += 1

    # manifest files referenced by no retained snapshot (expired
    # versions, or orphans from a crashed/lost-race commit)
    removed_manifests = 0
    manifest_dir = os.path.join(table.root, "manifests")
    if os.path.isdir(manifest_dir):
        for fn in os.listdir(manifest_dir):
            rel = f"manifests/{fn}"
            full = os.path.join(manifest_dir, fn)
            if rel not in retained_manifests and _expired(full):
                os.remove(full)
                removed_manifests += 1
    return {"snapshots_removed": removed_snaps, "data_files_removed": removed_data,
            "manifests_removed": removed_manifests,
            "retained_versions": keep_versions}
