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
* per-file column min/max/null-count stats in the manifest (read from
  parquet footers at commit time) and ``read(…, predicates=[…])`` —
  Iceberg's data-file stats + scan planning.  At 10^12 docs a
  term-bucket or docID-range read must *plan away* the files whose
  stat ranges cannot match before Spark ever lists them; the residual
  predicate is still applied as a normal DataFrame filter, so pruning
  is purely an optimization and never changes results.

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
               note: str | None = None,
               properties: dict | None = None) -> int:
        """Write ``df`` as a new snapshot; returns its version.

        ``mode="append"`` adds the written files to the parent
        snapshot's file list (parent files are referenced, never
        rewritten); ``mode="overwrite"`` starts the list fresh.  The
        snapshot becomes visible only at the final atomic pointer swap.
        ``properties`` are table properties (Iceberg's): inherited from
        the parent snapshot and overridden per key.
        """
        if mode not in ("append", "overwrite"):
            raise ValueError(f"unknown commit mode: {mode!r}")
        parent = self.current_version()
        version, snap_dir = self._allocate_version()
        data_dir = os.path.join(snap_dir, "data")

        t0 = time.time()
        df.write.mode("overwrite").parquet(data_dir)
        wall = time.time() - t0

        new_files = _file_lineage(self.root, data_dir)
        schema = df.schema.jsonValue()
        if mode == "append" and parent is not None:
            pm = self.manifest(parent)
            if pm["schema"] != schema:
                # Iceberg-style additive evolution: appending with a
                # superset schema widens the table (old files read the
                # new nullable columns as null — Spark's by-name parquet
                # resolution under a pinned schema). Anything else
                # (dropped columns, type changes) fails loudly.
                if not _is_additive_evolution(pm["schema"], schema):
                    raise ValueError(
                        "append schema is not an additive evolution of "
                        "the table schema (only adding nullable columns "
                        "is supported); use mode='overwrite' to "
                        "redefine the table")
            data_files = pm["data_files"] + new_files
        else:
            data_files = new_files

        props = {}
        if parent is not None:
            props.update(self.manifest(parent).get("properties", {}))
        props.update(properties or {})
        return self._finish_commit(version, parent, mode, note, schema,
                                   data_files, len(new_files), wall,
                                   props)

    def properties(self, version: int | None = None) -> dict:
        """Table properties as of a snapshot (default: current)."""
        if version is None:
            version = self.current_version()
            if version is None:
                raise FileNotFoundError(f"empty table at {self.root}")
        return self.manifest(version).get("properties", {})

    def _allocate_version(self) -> tuple[int, str]:
        """Next snapshot id + its dir.  Allocates past every COMMITTED
        snapshot, not parent+1: after a rollback the parent is old but
        later committed snapshots still exist (Iceberg likewise
        allocates fresh ids after rollback).  Uncommitted dirs (crashed
        commits) don't advance the counter — their slot is reclaimed
        here.  Expired dirs that still hold shared data files can't
        collide: a file is only ever referenced by the snapshot that
        wrote it or its descendants, so any such dir sits below the
        newest committed version."""
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
        return version, snap_dir

    def _finish_commit(self, version, parent, mode, note, schema,
                       data_files, n_new, wall,
                       properties: dict | None = None) -> int:
        """Manifest + pointer swap shared by ``commit`` and
        ``compact`` — the snapshot becomes visible only here."""
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
            "properties": properties or {},
            "data_files": data_files,
            "new_files": n_new,
            "total_rows": sum(f["rows"] for f in data_files),
            "write_wall_s": round(wall, 3),
        }
        snap_dir = os.path.join(self.root, _snap_name(version))
        os.makedirs(snap_dir, exist_ok=True)
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
             tag: str | None = None,
             predicates: list[tuple] | None = None) -> DataFrame:
        """The table as of a snapshot (default: current) — time travel.

        Reads exactly the manifest's immutable file list with the
        manifest's schema pinned, so a concurrent commit (or even a
        rollback) cannot change what this DataFrame scans.

        ``predicates`` — ``[(column, op, value), …]`` with ``op`` in
        ``= < <= > >= in`` — plans away data files whose manifest
        min/max stats cannot satisfy the conjunction (Iceberg scan
        planning), then applies the same predicates as a DataFrame
        filter, so results are identical to filtering the full read.
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
        files = man["data_files"]
        if predicates:
            files = [f for f in files if _file_may_match(f, predicates)]
        paths = [os.path.join(self.root, f["path"]) for f in files]
        schema = StructType.fromJson(man["schema"])
        if not paths:  # a committed empty table still reads cleanly
            df = spark.createDataFrame([], schema)
        else:
            df = spark.read.schema(schema).parquet(*paths)
        if predicates:
            df = df.filter(_predicates_column(predicates))
        return df

    def plan_files(self, predicates: list[tuple],
                   version: int | None = None) -> dict:
        """Scan-planning introspection: how many data files the
        predicate conjunction keeps vs skips at a snapshot (driver-side
        manifest arithmetic only — no Spark job, no file listing)."""
        if version is None:
            version = self.current_version()
            if version is None:
                raise FileNotFoundError(f"empty table at {self.root}")
        files = self.manifest(version)["data_files"]
        kept = [f for f in files if _file_may_match(f, predicates)]
        return {
            "version": version,
            "total_files": len(files),
            "kept_files": len(kept),
            "skipped_files": len(files) - len(kept),
            "kept_rows": sum(f["rows"] for f in kept),
            "kept_paths": [f["path"] for f in kept],
        }

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

    def compact(self, spark: SparkSession, target_mb: int = 128,
                min_input_files: int = 2,
                note: str | None = None) -> int | None:
        """Bin-pack small data files into ~``target_mb`` outputs —
        Iceberg's ``rewrite_data_files`` (binpack strategy).

        Streaming micro-batch appends accrete small files; at 10^12
        docs the fix must rewrite *only those files*, never the table:
        files under 3/4 of the target size are read back and coalesced
        (no shuffle), files at/above it are carried by reference.  The
        result is committed as a new snapshot (time travel to the
        uncompacted version still works; readers pinned to it are
        undisturbed), with a row-count check before the pointer swap.
        Returns the new version, or ``None`` when fewer than
        ``min_input_files`` files qualify (nothing worth rewriting).
        """
        cur = self.current_version()
        if cur is None:
            raise FileNotFoundError(f"empty table at {self.root}")
        man = self.manifest(cur)
        threshold = target_mb * 1024 * 1024 * 3 // 4
        small = [f for f in man["data_files"] if f["bytes"] < threshold]
        if len(small) < min_input_files:
            return None
        big = [f for f in man["data_files"] if f["bytes"] >= threshold]

        version, snap_dir = self._allocate_version()
        data_dir = os.path.join(snap_dir, "data")
        schema = StructType.fromJson(man["schema"])
        paths = [os.path.join(self.root, f["path"]) for f in small]
        n_out = max(1, round(sum(f["bytes"] for f in small)
                             / (target_mb * 1024 * 1024)))
        t0 = time.time()
        (spark.read.schema(schema).parquet(*paths)
         .coalesce(n_out).write.mode("overwrite").parquet(data_dir))
        wall = time.time() - t0

        new_files = _file_lineage(self.root, data_dir)
        want = sum(f["rows"] for f in small)
        got = sum(f["rows"] for f in new_files)
        if got != want:
            shutil.rmtree(snap_dir, ignore_errors=True)
            raise RuntimeError(
                f"compaction row-count mismatch ({got} != {want}) — "
                "snapshot not committed")
        return self._finish_commit(
            version, cur, "compact",
            note or f"binpack {len(small)} files -> {len(new_files)}",
            man["schema"], big + new_files, len(new_files), wall,
            man.get("properties", {}))

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
    directory is relocatable.  Each entry carries per-column
    min/max/null-count stats aggregated across the file's row groups
    (Iceberg data-file stats), read from the parquet footer without a
    Spark job."""
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
            "stats": _footer_stats(meta),
        })
    return entries


# Longest string bound stored in a manifest. A truncated prefix stays a
# valid LOWER bound; a truncated prefix is NOT a valid upper bound
# (Iceberg increments the last byte — this layer just drops the bound),
# so oversized maxima are stored as null = "unbounded above".
_MAX_STAT_CHARS = 64


def _footer_stats(meta) -> dict:
    """``{column: {"min": x, "max": y, "nulls": n}}`` for every
    top-level column whose parquet statistics are present and
    JSON-representable (int/float/bool/str; binary, nested and
    temporal columns carry no stats and are simply never pruned on)."""
    import math

    agg: dict[str, dict] = {}
    for rg in range(meta.num_row_groups):
        group = meta.row_group(rg)
        for ci in range(group.num_columns):
            col = group.column(ci)
            name = col.path_in_schema
            if "." in name:  # nested field — prune only on top level
                continue
            st = col.statistics
            cur = agg.setdefault(name, {"min": None, "max": None,
                                        "nulls": 0, "ok": True})
            if st is not None and st.null_count is not None:
                cur["nulls"] += st.null_count
            if st is None or not st.has_min_max:
                # An all-null row group legitimately has no min/max —
                # it widens nothing. Any other stats-less group leaves
                # the column unprunable for the whole file.
                if not (st is not None
                        and st.null_count == group.num_rows):
                    cur["ok"] = False
                continue
            lo, hi = st.min, st.max
            if not (_stat_value_ok(lo) and _stat_value_ok(hi)):
                cur["ok"] = False
                continue
            if isinstance(lo, float) and (math.isnan(lo) or math.isnan(hi)):
                cur["ok"] = False  # NaN ordering poisons the range
                continue
            cur["min"] = lo if cur["min"] is None else min(cur["min"], lo)
            cur["max"] = hi if cur["max"] is None else max(cur["max"], hi)

    out = {}
    for name, cur in agg.items():
        if not cur["ok"]:
            continue
        lo, hi = cur["min"], cur["max"]
        if isinstance(lo, str) and len(lo) > _MAX_STAT_CHARS:
            lo = lo[:_MAX_STAT_CHARS]  # prefix: still a valid lower bound
        if isinstance(hi, str) and len(hi) > _MAX_STAT_CHARS:
            hi = None  # prefix would under-state the upper bound
        out[name] = {"min": lo, "max": hi, "nulls": cur["nulls"]}
    return out


def _is_additive_evolution(old_schema: dict, new_schema: dict) -> bool:
    """True when ``new_schema`` keeps every existing column (same type)
    and only ADDS nullable ones — the safe subset of Iceberg schema
    evolution this layer supports."""
    old_fields = {f["name"]: f for f in old_schema["fields"]}
    new_fields = {f["name"]: f for f in new_schema["fields"]}
    for name, f in old_fields.items():
        g = new_fields.get(name)
        if g is None or g["type"] != f["type"]:
            return False
    return all(f["nullable"] for name, f in new_fields.items()
               if name not in old_fields)


def _stat_value_ok(v) -> bool:
    return isinstance(v, (int, float, str, bool)) \
        and not isinstance(v, bytes)


_OPS = ("=", "<", "<=", ">", ">=", "in")


def _file_may_match(entry: dict, predicates: list[tuple]) -> bool:
    """Conservative footer-stats check: False only when the file
    provably contains no row satisfying the AND of ``predicates``.
    Files from manifests written before stats existed (no ``stats``
    key) are always kept."""
    stats = entry.get("stats") or {}
    for col, op, val in predicates:
        if op not in _OPS:
            raise ValueError(f"unknown predicate op {op!r}")
        s = stats.get(col)
        if s is None:
            continue  # no stats for this column — cannot prune
        lo, hi = s["min"], s["max"]
        if lo is None and hi is None:
            if s.get("nulls") == entry["rows"]:
                return False  # all-null column: no comparison matches
            continue
        try:
            if op == "in":
                vals = list(val)
                if not any(_in_range(v, lo, hi) for v in vals):
                    return False
            elif op == "=":
                if not _in_range(val, lo, hi):
                    return False
            elif op == "<":
                if lo is not None and not lo < val:
                    return False
            elif op == "<=":
                if lo is not None and not lo <= val:
                    return False
            elif op == ">":
                if hi is not None and not hi > val:
                    return False
            elif op == ">=":
                if hi is not None and not hi >= val:
                    return False
        except TypeError:
            continue  # incomparable literal — keep the file
    return True


def _in_range(v, lo, hi) -> bool:
    if lo is not None and v < lo:
        return False
    if hi is not None and v > hi:
        return False
    return True


def _predicates_column(predicates: list[tuple]):
    """The same conjunction as a Spark Column — applied after pruning
    so ``read(predicates=…)`` is exactly ``read().filter(…)``."""
    from pyspark.sql import functions as F

    out = None
    for col, op, val in predicates:
        c = F.col(col)
        if op == "in":
            e = c.isin(list(val))
        else:
            e = {"=": c == val, "<": c < val, "<=": c <= val,
                 ">": c > val, ">=": c >= val}[op]
        out = e if out is None else out & e
    return out


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
