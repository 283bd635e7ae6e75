"""Incremental snapshot-diff reads + lake-to-lake replication."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from binlog_es_go_spark.cdc.apply import apply_batch
from binlog_es_go_spark.cdc.events import generate_changelog
from binlog_es_go_spark.cdc.oracle import apply_sequential, table_digest
from binlog_es_go_spark.lake.changes import changed_buckets, replicate_changes, snapshot_changes
from binlog_es_go_spark.lake.table import LakeTable

PAYLOAD = T.StructType([T.StructField(n, T.StringType()) for n in ["repo", "path", "commit", "lang", "content"]])


def _source_table(spark, tmp_path, log):
    t = LakeTable.create(spark, str(tmp_path / "src"), PAYLOAD, key_cols=["repo", "path"], n_buckets=8)
    apply_batch(t, log.filter(F.col("offset") < 1000), batch_id=0)     # -> v1
    apply_batch(t, log.filter(F.col("offset") >= 1000), batch_id=1)    # -> v2
    return t


def test_snapshot_changes_from_empty_is_full_insert_set(spark, tmp_path):
    log = generate_changelog(spark, 2000, n_repos=20, paths_per_repo=10, seed=21)
    log.cache().count()
    t = _source_table(spark, tmp_path, log)
    ch = snapshot_changes(t, 0, t.current_version())
    assert ch.filter(F.col("op") != "insert").count() == 0
    assert ch.count() == t.read().count()
    # diff carries the NEW payload: content matches the table row by row
    joined = ch.alias("c").join(t.read().alias("s"), on=["repo", "path"])
    assert joined.filter(F.col("c.content") != F.col("s.content")).count() == 0


def test_snapshot_changes_incremental_ops(spark, tmp_path):
    log = generate_changelog(spark, 2000, n_repos=20, paths_per_repo=10, seed=21)
    log.cache().count()
    t = _source_table(spark, tmp_path, log)
    ch = snapshot_changes(t, 1, 2).cache()

    v1_keys = {(r["repo"], r["path"]) for r in t.read(version=1).select("repo", "path").collect()}
    v2_keys = {(r["repo"], r["path"]) for r in t.read(version=2).select("repo", "path").collect()}
    got = {(r["repo"], r["path"]): r["op"] for r in ch.collect()}
    # every insert is new in v2; every delete was visible in v1 and gone in v2
    for (repo, path), op in got.items():
        if op == "insert":
            assert (repo, path) in v2_keys and (repo, path) not in v1_keys
        elif op == "delete":
            assert (repo, path) in v1_keys and (repo, path) not in v2_keys
        else:
            assert (repo, path) in v1_keys and (repo, path) in v2_keys
    # completeness: every key that changed visibility appears in the diff
    for k in v2_keys - v1_keys:
        assert got.get(k) == "insert"
    for k in v1_keys - v2_keys:
        assert got.get(k) == "delete"
    # bucket pruning: the diff reads only buckets the second batch touched
    assert set(changed_buckets(t, 1, 2)) <= set(range(8))


def test_replicate_changes_lake_to_lake(spark, tmp_path):
    log = generate_changelog(spark, 2000, n_repos=20, paths_per_repo=10, seed=21)
    log.cache().count()
    src = _source_table(spark, tmp_path, log)
    dst = LakeTable.create(spark, str(tmp_path / "dst"), PAYLOAD, key_cols=["repo", "path"], n_buckets=8)

    replicate_changes(src, dst, 0, 1, batch_id=0)
    replicate_changes(src, dst, 1, 2, batch_id=1)
    d_src = table_digest(src.read().select("repo", "path", "content").toPandas())
    d_dst = table_digest(dst.read().select("repo", "path", "content").toPandas())
    assert d_dst == d_src
    # replaying an overlapping range is a no-op (the target keeps the guard)
    replicate_changes(src, dst, 0, 2, batch_id=2)
    assert table_digest(dst.read().select("repo", "path", "content").toPandas()) == d_src
    # and the replica equals the sequential oracle end to end
    oracle = apply_sequential(log.toPandas())
    assert d_dst == table_digest(oracle[["repo", "path", "content"]])

def test_tombstone_gc_retention_contract(spark, tmp_path):
    """compact(drop_tombstones_below=...) records the GC watermark in
    manifest properties; a diff whose from_version predates the GC raises
    (deletes may be unobservable), a diff within retention still sees the
    delete, and allow_missing_deletes opts back into the lossy read."""
    import pytest

    from binlog_es_go_spark.cdc.apply import applied_offsets
    from binlog_es_go_spark.lake.changes import TombstoneRetentionError
    from binlog_es_go_spark.lake.maintenance import compact

    log = generate_changelog(spark, 2000, n_repos=20, paths_per_repo=10, seed=21)
    log.cache().count()
    t = _source_table(spark, tmp_path, log)                      # v1, v2
    assert log.filter(F.col("op") == "delete").count() > 0

    # diff within retention (pre-GC) observes deletes
    pre = snapshot_changes(t, 1, 2)
    n_deletes_pre = pre.filter(F.col("op") == "delete").count()

    watermark = min(applied_offsets(t).values())
    gc_v = compact(t, drop_tombstones_below=watermark + 1)        # -> v3
    assert t.snapshot().properties["tombstone_gc_version"] == gc_v

    # a diff spanning the GC refuses to pretend it saw the deletes
    with pytest.raises(TombstoneRetentionError):
        snapshot_changes(t, 1, gc_v)
    with pytest.raises(TombstoneRetentionError):
        replicate_changes(
            t,
            LakeTable.create(spark, str(tmp_path / "d2"), PAYLOAD, key_cols=["repo", "path"], n_buckets=8),
            1,
            gc_v,
        )
    # opting in yields insert/update-only semantics without raising
    lossy = snapshot_changes(t, 1, gc_v, allow_missing_deletes=True)
    assert lossy.filter(F.col("op") == "delete").count() <= n_deletes_pre

    # diffs at or after the GC version are unaffected
    apply_batch(
        t,
        log.filter(F.col("offset") >= 1000).limit(0),
        batch_id=9,
        prune_buckets=False,
    )  # -> v4 (empty commit just to advance the version)
    assert snapshot_changes(t, gc_v, t.current_version()).count() == 0


def test_snapshot_diff_reads_only_changed_files(spark, tmp_path):
    """Composing file-COW with incremental reads: after a single-key merge
    into a multi-file bucket, the diff's scan set is the one rewritten
    file + its replacement — O(batch), not O(touched buckets) — and the
    diff row is exactly the changed key."""
    from binlog_es_go_spark.lake.changes import changed_file_sets

    log = generate_changelog(spark, 2000, n_repos=20, paths_per_repo=10, seed=21)
    log.cache().count()
    t = LakeTable.create(spark, str(tmp_path / "fsrc"), PAYLOAD, key_cols=["repo", "path"], n_buckets=4)
    # 8 range files per bucket. Round 6 collapses surgical (small)
    # commits to one file per bucket — pin the pre-collapse behavior for
    # THIS fixture build: the subject under test is the diff's file-level
    # scan pruning over a multi-file table, which needs the spread-out
    # layout a big table would have.
    import binlog_es_go_spark.lake.merge as _mg

    prev_small = _mg.SMALL_COMMIT_BYTES
    _mg.SMALL_COMMIT_BYTES = 0
    try:
        apply_batch(t, log, batch_id=0, salt_partitions=32)                 # -> v1
    finally:
        _mg.SMALL_COMMIT_BYTES = prev_small
    v1 = t.current_version()
    n_files_v1 = sum(len(fl) for fl in t.snapshot().buckets.values())
    assert n_files_v1 >= 16, f"need a multi-file table, got {n_files_v1}"

    row = t.read().select("repo", "path").first()
    hot = spark.createDataFrame(
        [(10**7, 0, 0, "update", row["repo"], row["path"], None,
          ("cH", "py", "HOT"), None)], log.schema)
    apply_batch(t, hot, batch_id=1, salt_partitions=32)                     # -> v2

    old_files, new_files = changed_file_sets(t, v1, t.current_version())
    assert len(old_files) == 1 and len(new_files) == 1, (old_files, new_files)

    ch = snapshot_changes(t, v1, t.current_version())
    rows = ch.collect()
    assert len(rows) == 1
    assert (rows[0]["op"], rows[0]["repo"], rows[0]["path"], rows[0]["content"]) == (
        "update", row["repo"], row["path"], "HOT")
