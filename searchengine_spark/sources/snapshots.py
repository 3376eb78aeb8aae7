"""Snapshot-versioned parquet tables — the sandbox stand-in for the
Iceberg tables the north rule targets ("term-partitioned index segments
written back to Iceberg", "Iceberg table of Common-Crawl-style web
pages").  No Iceberg runtime jars ship in this container, so the layer
reimplements the *semantics* the engine depends on over plain parquet +
JSON manifests; on a real cluster every call here maps 1:1 onto an
Iceberg catalog operation (noted per method).

Semantics provided (and their Iceberg analogue):

* ``commit(df, mode="append")`` — a new table *snapshot*.  Append
  commits reuse the parent snapshot's data files by reference (the
  manifest lists files, not copies), so appending 1k docs to a 10^12-doc
  table writes only the new files — Iceberg's append snapshot +
  manifest list.
* ``_current.json`` atomic pointer swap (``os.replace``) — the catalog's
  current-snapshot pointer.  Readers resolve the pointer once, then read
  an immutable file list: writers never disturb in-flight reads (MVCC),
  and a crashed commit (data written, pointer not swapped) is simply
  invisible and garbage-collected by the next commit at that version.
* ``read(spark, version=…)`` / ``read(spark, tag=…)`` — time travel
  (Iceberg ``VERSION AS OF`` / tag refs).
* ``rollback(version)`` — metadata-only pointer swap, O(1) regardless of
  table size (Iceberg ``rollback_to_snapshot``).
* ``tag(name)`` — named refs (Iceberg tags).
* ``expire_snapshots(keep_last=…)`` — removes expired snapshot
  *metadata* and deletes only data files no retained snapshot
  references (file-level refcounting — the part naive "delete old
  dirs" gets wrong when appends share files).

Per-partition lineage: every manifest entry records one row per parquet
file (task partition) with row count, byte size and row-group count,
read from parquet footers without a Spark job — the same ledger
``pipeline/checkpoint.py`` keeps per stage, here per snapshot.

Single-writer by design (commits are driver-coordinated, as in the
reference's one-process indexer — /root/reference/main_disk.py:74); a
lost-update check still guards against accidental concurrent commits by
verifying the parent pointer did not move while the data was written.
"""

from __future__ import annotations

import json
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

_CURRENT = "_current.json"
_TAGS = "_tags.json"
MANIFEST = "manifest.json"


def _snap_name(version: int) -> str:
    return f"snap-{version:06d}"


class SnapshotTable:
    """A snapshot-versioned table rooted at a directory."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    # -- metadata ----------------------------------------------------------

    def _pointer(self) -> dict | None:
        try:
            with open(os.path.join(self.root, _CURRENT)) as fh:
                return json.load(fh)
        except FileNotFoundError:
            return None

    def current_version(self) -> int | None:
        ptr = self._pointer()
        return None if ptr is None else ptr["version"]

    def manifest(self, version: int) -> dict:
        path = os.path.join(self.root, _snap_name(version), MANIFEST)
        with open(path) as fh:
            return json.load(fh)

    def history(self) -> list[dict]:
        """All committed snapshots, oldest first (expired ones absent)."""
        out = []
        for name in sorted(os.listdir(self.root)):
            mpath = os.path.join(self.root, name, MANIFEST)
            if name.startswith("snap-") and os.path.exists(mpath):
                with open(mpath) as fh:
                    out.append(json.load(fh))
        return out

    def tags(self) -> dict[str, int]:
        try:
            with open(os.path.join(self.root, _TAGS)) as fh:
                return json.load(fh)
        except FileNotFoundError:
            return {}

    # -- write path ---------------------------------------------------------

    def commit(self, df: DataFrame, mode: str = "append",
               note: str | None = None) -> int:
        """Write ``df`` as a new snapshot; returns its version.

        ``mode="append"`` adds the written files to the parent
        snapshot's file list (parent files are referenced, never
        rewritten); ``mode="overwrite"`` starts the list fresh.  The
        snapshot becomes visible only at the final atomic pointer swap.
        """
        if mode not in ("append", "overwrite"):
            raise ValueError(f"unknown commit mode: {mode!r}")
        parent = self.current_version()
        # Allocate past every COMMITTED snapshot, not parent+1: after a
        # rollback the parent is old but later committed snapshots still
        # exist (Iceberg likewise allocates fresh ids after rollback).
        # Uncommitted dirs (crashed commits) don't advance the counter —
        # their slot is reclaimed below. Expired dirs that still hold
        # shared data files can't collide: a file is only ever
        # referenced by the snapshot that wrote it or its descendants,
        # so any such dir sits below the newest committed version.
        committed = [int(n[5:]) for n in os.listdir(self.root)
                     if n.startswith("snap-")
                     and os.path.exists(os.path.join(self.root, n, MANIFEST))]
        version = max(committed, default=-1) + 1
        snap_dir = os.path.join(self.root, _snap_name(version))
        # A crashed earlier commit may have left this version's dir
        # without a manifest/pointer — it was never visible; reclaim it.
        if os.path.exists(snap_dir):
            if os.path.exists(os.path.join(snap_dir, MANIFEST)):
                raise RuntimeError(
                    f"snapshot v{version} already committed but is not "
                    "current — concurrent writer?")
            shutil.rmtree(snap_dir)
        data_dir = os.path.join(snap_dir, "data")

        t0 = time.time()
        df.write.mode("overwrite").parquet(data_dir)
        wall = time.time() - t0

        new_files = _file_lineage(self.root, data_dir)
        schema = df.schema.jsonValue()
        if mode == "append" and parent is not None:
            pm = self.manifest(parent)
            if pm["schema"] != schema:
                # Iceberg would run schema evolution here; this layer
                # fails loudly instead of silently unioning mismatched
                # columns.
                raise ValueError(
                    "append schema does not match the table schema; "
                    "use mode='overwrite' to redefine the table")
            data_files = pm["data_files"] + new_files
        else:
            data_files = new_files

        if self.current_version() != parent:
            raise RuntimeError(
                "current snapshot moved during commit (concurrent "
                "writer) — retry against the new parent")

        man = {
            "version": version,
            "parent": parent,
            "mode": mode,
            "note": note,
            "schema": schema,
            "data_files": data_files,
            "new_files": len(new_files),
            "total_rows": sum(f["rows"] for f in data_files),
            "write_wall_s": round(wall, 3),
        }
        _atomic_json(os.path.join(snap_dir, MANIFEST), man)
        _atomic_json(os.path.join(self.root, _CURRENT),
                     {"version": version})
        return version

    def rollback(self, version: int) -> None:
        """Point the table back at an older snapshot — metadata only."""
        self.manifest(version)  # raises if expired/unknown
        _atomic_json(os.path.join(self.root, _CURRENT),
                     {"version": version})

    def tag(self, name: str, version: int | None = None) -> None:
        version = self.current_version() if version is None else version
        if version is None:
            raise FileNotFoundError(f"empty table at {self.root}")
        self.manifest(version)  # raises if expired/unknown
        tags = self.tags()
        tags[name] = version
        _atomic_json(os.path.join(self.root, _TAGS), tags)

    # -- read path ----------------------------------------------------------

    def read(self, spark: SparkSession, version: int | None = None,
             tag: str | None = None) -> DataFrame:
        """The table as of a snapshot (default: current) — time travel.

        Reads exactly the manifest's immutable file list with the
        manifest's schema pinned, so a concurrent commit (or even a
        rollback) cannot change what this DataFrame scans.
        """
        if tag is not None:
            tags = self.tags()
            if tag not in tags:
                raise KeyError(f"unknown tag {tag!r}")
            version = tags[tag]
        if version is None:
            version = self.current_version()
            if version is None:
                raise FileNotFoundError(f"empty table at {self.root}")
        man = self.manifest(version)
        paths = [os.path.join(self.root, f["path"])
                 for f in man["data_files"]]
        schema = StructType.fromJson(man["schema"])
        if not paths:  # a committed empty table still reads cleanly
            return spark.createDataFrame([], schema)
        return spark.read.schema(schema).parquet(*paths)

    def snapshots_df(self, spark: SparkSession) -> DataFrame:
        """The snapshot history as a DataFrame — Iceberg's
        ``<table>.snapshots`` metadata table.  Driver-side by design:
        its size is the number of snapshots, not the table size."""
        from pyspark.sql.types import (
            IntegerType, LongType, StringType, StructField,
        )

        schema = StructType([
            StructField("version", IntegerType(), False),
            StructField("parent", IntegerType(), True),
            StructField("mode", StringType(), False),
            StructField("note", StringType(), True),
            StructField("total_rows", LongType(), False),
            StructField("new_files", IntegerType(), False),
        ])
        rows = [(m["version"], m["parent"], m["mode"], m["note"],
                 m["total_rows"], m["new_files"]) for m in self.history()]
        return spark.createDataFrame(rows, schema)

    # -- maintenance ---------------------------------------------------------

    def expire_snapshots(self, keep_last: int = 2) -> dict:
        """Drop all but the newest ``keep_last`` snapshots (tagged and
        current snapshots are always retained).  Data files are deleted
        only when no retained manifest references them — append
        snapshots share files with their parents, so expiring v0 after
        an append at v1 deletes nothing.
        """
        hist = self.history()
        versions = [m["version"] for m in hist]
        keep = set(versions[-keep_last:]) if keep_last else set()
        keep.update(self.tags().values())
        cur = self.current_version()
        if cur is not None:
            keep.add(cur)

        referenced = set()
        for m in hist:
            if m["version"] in keep:
                referenced.update(f["path"] for f in m["data_files"])

        dropped_files = 0
        dropped_snapshots = []
        for m in hist:
            v = m["version"]
            if v in keep:
                continue
            for f in m["data_files"]:
                path = f["path"]
                # Only this snapshot's own dir is its responsibility;
                # inherited files belong to the ancestor that wrote them.
                if path.startswith(_snap_name(v) + "/") \
                        and path not in referenced:
                    full = os.path.join(self.root, path)
                    if os.path.exists(full):
                        os.remove(full)
                        dropped_files += 1
            os.remove(os.path.join(self.root, _snap_name(v), MANIFEST))
            _prune_empty(os.path.join(self.root, _snap_name(v)))
            dropped_snapshots.append(v)
        return {"dropped_snapshots": dropped_snapshots,
                "dropped_files": dropped_files,
                "retained": sorted(keep)}


def _file_lineage(root: str, data_dir: str) -> list[dict]:
    """Per-partition lineage rows for every parquet file under
    ``data_dir`` — paths stored relative to the table root so the table
    directory is relocatable."""
    import pyarrow.parquet as pq

    entries = []
    for name in sorted(os.listdir(data_dir)):
        if not name.endswith(".parquet"):
            continue
        path = os.path.join(data_dir, name)
        meta = pq.ParquetFile(path).metadata
        entries.append({
            "path": os.path.relpath(path, root),
            "rows": meta.num_rows,
            "bytes": os.path.getsize(path),
            "row_groups": meta.num_row_groups,
        })
    return entries


def _atomic_json(path: str, obj) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(obj, fh)
    os.replace(tmp, path)


def _prune_empty(snap_dir: str) -> None:
    """Remove a snapshot dir if expiry emptied it (its data files may
    outlive it when a retained append snapshot references them)."""
    for _cur, _dirs, files in os.walk(snap_dir):
        if any(not f.startswith(("_", ".")) for f in files):
            return
    shutil.rmtree(snap_dir, ignore_errors=True)
