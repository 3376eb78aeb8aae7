"""Snapshot table (Iceberg stand-in): commit/append file reuse, time
travel, rollback, tags, crash invisibility, and file-refcounted expiry."""

import os

import pytest
from pyspark.sql import Row, functions as F

from searchengine_spark.sources.snapshots import SnapshotTable


def _docs(spark, lo, hi):
    return spark.createDataFrame(
        [Row(doc_id=i, text=f"doc {i}") for i in range(lo, hi)])


@pytest.fixture
def table(tmp_path):
    return SnapshotTable(str(tmp_path / "tbl"))


def test_commit_read_roundtrip(spark, table):
    v0 = table.commit(_docs(spark, 0, 10), note="initial")
    assert v0 == 0
    got = table.read(spark)
    assert sorted(r.doc_id for r in got.collect()) == list(range(10))
    assert table.manifest(0)["note"] == "initial"
    assert table.manifest(0)["total_rows"] == 10


def test_append_reuses_parent_files(spark, table):
    table.commit(_docs(spark, 0, 10))
    v1 = table.commit(_docs(spark, 10, 15), mode="append")
    m0, m1 = table.manifest(0), table.manifest(v1)
    # Parent files referenced, not rewritten: v1's list is a superset.
    assert {f["path"] for f in m0["data_files"]} < \
           {f["path"] for f in m1["data_files"]}
    assert m1["total_rows"] == 15
    # Only the delta lives under v1's own dir.
    own = [f for f in m1["data_files"]
           if f["path"].startswith("snap-000001/")]
    assert sum(f["rows"] for f in own) == 5
    assert table.read(spark).count() == 15


def test_time_travel_and_tags(spark, table):
    table.commit(_docs(spark, 0, 10))
    table.tag("baseline")
    table.commit(_docs(spark, 10, 15), mode="append")
    table.commit(_docs(spark, 100, 103), mode="overwrite")
    assert table.read(spark).count() == 3
    assert table.read(spark, version=1).count() == 15
    assert table.read(spark, version=0).count() == 10
    assert table.read(spark, tag="baseline").count() == 10
    with pytest.raises(KeyError):
        table.read(spark, tag="nope")


def test_rollback_is_metadata_only_and_new_commits_fork(spark, table):
    table.commit(_docs(spark, 0, 10))
    table.commit(_docs(spark, 10, 15), mode="append")
    table.rollback(0)
    assert table.read(spark).count() == 10
    # Commit after rollback allocates a fresh id (v1 still readable).
    v2 = table.commit(_docs(spark, 20, 22), mode="append")
    assert v2 == 2
    assert table.manifest(v2)["parent"] == 0
    assert table.read(spark).count() == 12
    assert table.read(spark, version=1).count() == 15


def test_append_schema_mismatch_fails_loudly(spark, table):
    table.commit(_docs(spark, 0, 5))
    other = _docs(spark, 5, 6).withColumn("lang", F.lit("en"))
    with pytest.raises(ValueError, match="schema"):
        table.commit(other, mode="append")
    table.commit(other, mode="overwrite")  # redefining is explicit
    assert "lang" in table.read(spark).columns


def test_crashed_commit_is_invisible_and_reclaimed(spark, table):
    table.commit(_docs(spark, 0, 10))
    # Simulate a crash after data write, before manifest+pointer: a
    # version dir with data but no manifest.
    orphan = os.path.join(table.root, "snap-000001", "data")
    os.makedirs(orphan)
    with open(os.path.join(orphan, "junk.parquet"), "w") as fh:
        fh.write("not really parquet")
    assert table.current_version() == 0
    assert [m["version"] for m in table.history()] == [0]
    v1 = table.commit(_docs(spark, 10, 12), mode="append")
    assert v1 == 1  # orphan reclaimed, same slot reused
    assert table.read(spark).count() == 12


def test_reader_pinned_against_concurrent_overwrite(spark, table):
    table.commit(_docs(spark, 0, 10))
    df = table.read(spark)  # resolved to v0's immutable file list
    table.commit(_docs(spark, 100, 101), mode="overwrite")
    assert df.count() == 10  # unaffected by the new snapshot


def test_expire_refcounts_shared_files(spark, table):
    table.commit(_docs(spark, 0, 10))
    table.commit(_docs(spark, 10, 15), mode="append")
    table.commit(_docs(spark, 15, 18), mode="append")
    res = table.expire_snapshots(keep_last=1)
    assert res["dropped_snapshots"] == [0, 1]
    # v0/v1 files are shared with the retained v2 → nothing deleted.
    assert res["dropped_files"] == 0
    assert table.read(spark).count() == 18
    with pytest.raises(FileNotFoundError):
        table.read(spark, version=0)
    # History now only shows the retained snapshot.
    assert [m["version"] for m in table.history()] == [2]


def test_expire_deletes_unreferenced_files(spark, table):
    table.commit(_docs(spark, 0, 10))
    table.commit(_docs(spark, 100, 103), mode="overwrite")
    res = table.expire_snapshots(keep_last=1)
    assert res["dropped_snapshots"] == [0]
    assert res["dropped_files"] > 0  # v0's files orphaned by overwrite
    assert not os.path.exists(os.path.join(table.root, "snap-000000"))
    assert table.read(spark).count() == 3


def test_expire_keeps_tagged(spark, table):
    table.commit(_docs(spark, 0, 10))
    table.tag("keepme")
    table.commit(_docs(spark, 100, 103), mode="overwrite")
    table.commit(_docs(spark, 200, 204), mode="overwrite")
    res = table.expire_snapshots(keep_last=1)
    assert res["dropped_snapshots"] == [1]
    assert table.read(spark, tag="keepme").count() == 10


def test_snapshots_metadata_table(spark, table):
    table.commit(_docs(spark, 0, 10), note="first")
    table.commit(_docs(spark, 10, 15), mode="append")
    meta = table.snapshots_df(spark).orderBy("version").collect()
    assert [(r.version, r.parent, r.mode) for r in meta] == \
           [(0, None, "append"), (1, 0, "append")]
    assert meta[0].note == "first" and meta[1].total_rows == 15


def test_pointer_swap_is_atomic_artifact(table):
    # The pointer is always a complete JSON file (written via tmp +
    # os.replace); no .tmp residue survives a commit.
    assert not any(n.endswith(".tmp") for n in os.listdir(table.root))


def test_publish_segments_versioned_roundtrip(spark, tmp_path, table):
    """publish_segments: each build is a table version; a pinned reader
    decodes the published segments back to the exact source postings."""
    from searchengine_spark.indexing.segments import decode_postings
    from searchengine_spark.pipeline.index_pipeline import (
        publish_segments,
        run_index_pipeline,
        stage_segments,
    )

    root = str(tmp_path / "idx")
    docs = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .limit(40))
    idx = run_index_pipeline(spark, root, docs, "pub1")
    seg = stage_segments(spark, root, idx, "pub1", block_span=16,
                         term_buckets=8)
    v0 = publish_segments(spark, table.root, seg, note="build pub1")
    assert v0 == 0 and table.manifest(0)["note"] == "build pub1"

    served = table.read(spark, version=v0)
    dec = decode_postings(served, terms=None)
    assert dec.count() == idx.postings.count()
    assert (dec.select("term", "doc_id").exceptAll(
        idx.postings.select("term", "doc_id")).count() == 0)

    # A second publish is a new version; the pinned v0 still serves.
    v1 = publish_segments(spark, table.root, seg.limit(1), note="bad build")
    assert v1 == 1 and table.read(spark).count() == 1
    assert decode_postings(table.read(spark, version=v0),
                           terms=None).count() == idx.postings.count()
    table.rollback(v0)
    assert table.read(spark).count() == seg.count()


def test_input_snapshot_versions_key_the_resumable_build(spark, tmp_path,
                                                         table):
    """End-to-end lineage: the pages corpus lives in a snapshot table
    (the north rule's input Iceberg table); the index build fingerprint
    carries the input snapshot version, so building against crawl v0
    resumes instantly while crawl v1 (an append commit) triggers a
    fresh build over exactly v1's file list."""
    from searchengine_spark.pipeline.checkpoint import read_manifest
    from searchengine_spark.pipeline.index_pipeline import run_index_pipeline

    docs = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .select("doc_id", "text"))
    v0 = table.commit(docs.filter(F.col("doc_id") < 30),
                      note="crawl batch 0")
    root = str(tmp_path / "idx")

    idx0 = run_index_pipeline(spark, root,
                              table.read(spark, version=v0),
                              f"pages@v{v0}")
    n0 = idx0.doc_stats.count()
    assert n0 == 30
    # Same input version → resume (manifest fingerprint matches).
    run_index_pipeline(spark, root, table.read(spark, version=v0),
                       f"pages@v{v0}")
    assert read_manifest(root, "analyzed")["complete"]

    v1 = table.commit(docs.filter(F.col("doc_id").between(30, 49)),
                      mode="append", note="crawl batch 1")
    idx1 = run_index_pipeline(spark, root,
                              table.read(spark, version=v1),
                              f"pages@v{v1}")
    assert idx1.doc_stats.count() == 50
    assert read_manifest(root, "analyzed")["fingerprint"].endswith(
        f"pages@v{v1}")


def test_lineage_entries_match_footers(spark, table):
    table.commit(_docs(spark, 0, 10))
    m = table.manifest(0)
    for f in m["data_files"]:
        assert f["rows"] >= 0 and f["bytes"] > 0 and f["row_groups"] >= 1
    assert sum(f["rows"] for f in m["data_files"]) == 10
    # Relocatable: paths are root-relative.
    assert all(not f["path"].startswith("/") for f in m["data_files"])
