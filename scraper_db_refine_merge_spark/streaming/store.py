"""Crash-safe versioned parquet store for incrementally-maintained state
(sketch register tables, incremental connected-components assignments).

The r4 pattern — rename(target, backup); rename(staging, target) — had a
crash window between the two renames that left the store MISSING with
orphaned backup/staging dirs (ADVICE r4). This store has exactly ONE
committing operation:

    target_path/
        CURRENT              <- pointer file: name of the live version dir
        v-<uuid>/            <- immutable parquet snapshot (+ marker files)

A writer materializes a new ``v-*`` snapshot, then atomically replaces the
pointer with ``os.replace`` (atomic on POSIX local filesystems). A crash at
any earlier point leaves the previous pointer — and therefore the previous
snapshot — fully intact; orphaned snapshots are garbage-collected by the
next successful commit. Readers resolve the pointer and read one immutable
directory, so they can never observe a half-swapped store.

Scope note (also from ADVICE r4): the pointer commit relies on atomic
rename, so this store targets local/POSIX filesystems (and would map to an
atomic-rename FS like HDFS via its own API). On object stores without
atomic rename, use a transactional table format (Delta/Iceberg) instead —
operators/merge.py carries the import-guarded Delta MERGE path.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession

_POINTER = "CURRENT"


def store_version_dir(target_path: str) -> str | None:
    """Absolute path of the live snapshot dir, or None if no commit yet."""
    pointer = os.path.join(target_path, _POINTER)
    if not os.path.exists(pointer):
        return None
    with open(pointer) as f:
        version = f.read().strip()
    d = os.path.join(target_path, version)
    return d if os.path.isdir(d) else None


def store_exists(target_path: str) -> bool:
    return store_version_dir(target_path) is not None


def store_read(spark: SparkSession, target_path: str) -> DataFrame | None:
    """The live snapshot as a DataFrame, or None if the store is empty."""
    d = store_version_dir(target_path)
    return spark.read.parquet(d) if d is not None else None


def store_marker(target_path: str, name: str) -> str | None:
    """Contents of marker file ``name`` in the live snapshot, or None.

    Markers are written into the snapshot BEFORE the pointer commit, so a
    marker and the state it describes become visible atomically (the
    exactly-once batch-id guard for non-idempotent sketch merges).
    """
    d = store_version_dir(target_path)
    if d is None:
        return None
    p = os.path.join(d, name)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return f.read().strip()


def store_commit(
    df: DataFrame, target_path: str, markers: dict[str, str] | None = None
) -> str:
    """Write ``df`` as a new snapshot and atomically point CURRENT at it.

    Returns the committed snapshot dir. Marker filenames should start with
    ``_`` so Spark's parquet reader ignores them as metadata files.
    """
    os.makedirs(target_path, exist_ok=True)
    version = f"v-{uuid.uuid4().hex[:12]}"
    vd = os.path.join(target_path, version)
    df.write.mode("overwrite").parquet(vd)
    for name, value in (markers or {}).items():
        with open(os.path.join(vd, name), "w") as f:
            f.write(value)
    # THE commit: one atomic pointer replace. Everything before this line
    # is invisible to readers; a crash before it leaves the old state live.
    tmp = os.path.join(target_path, f".{_POINTER}.tmp.{uuid.uuid4().hex[:8]}")
    with open(tmp, "w") as f:
        f.write(version)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, os.path.join(target_path, _POINTER))
    # GC superseded/orphaned snapshots and stale pointer tmps (best-effort —
    # a concurrent reader holding the old dir open on POSIX keeps its fds).
    for name in os.listdir(target_path):
        full = os.path.join(target_path, name)
        if name.startswith("v-") and name != version:
            shutil.rmtree(full, ignore_errors=True)
        elif name.startswith(f".{_POINTER}.tmp."):
            try:
                os.remove(full)
            except OSError:
                pass
    return vd
