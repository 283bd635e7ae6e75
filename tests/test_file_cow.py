"""File-granular copy-on-write inside buckets (round-4 verdict #1).

Writes are khash-range-split and khash-sorted, so every data file carries
a tight ``_khash`` min/max in the manifest; a MERGE rewrites only the
files whose range can contain a batch key and CARRIES the rest forward.
The reference's sink is row-level upsert (``pkg/es/writer.go:156-193``);
this is the lake-scale analog: one hot key costs one file rewrite, not a
whole-bucket rewrite.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F
from pyspark.sql import types as T

from binlog_es_go_spark.cdc.apply import apply_batch
from binlog_es_go_spark.cdc.events import CHANGELOG_SCHEMA
from binlog_es_go_spark.lake.table import KHASH_COL, LakeTable

TS = dt.datetime(2026, 1, 1)

PAYLOAD = T.StructType(
    [
        T.StructField("repo", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("commit", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("content", T.StringType()),
    ]
)


def _events(spark, rows):
    """rows: (offset, partition, seq, op, repo, path, content)"""
    data = [
        (off, p, s, op, r, pa, None, (f"c{off}", "py", content), TS)
        for (off, p, s, op, r, pa, content) in rows
    ]
    return spark.createDataFrame(data, CHANGELOG_SCHEMA)


def _bulk_insert(spark, n):
    return _events(
        spark,
        [(i, 0, 0, "insert", f"repo{i % 7}", f"f{i}.py", f"v{i}") for i in range(n)],
    )


def test_single_key_merge_rewrites_only_overlapping_files(spark, tmp_path):
    t = LakeTable.create(
        spark, str(tmp_path / "t"), PAYLOAD, key_cols=["repo", "path"], n_buckets=2
    )
    # initial load range-split 8 ways per bucket -> multi-file buckets
    apply_batch(t, _bulk_insert(spark, 2000), batch_id=0, salt_partitions=16)
    snap0 = t.snapshot()
    files0 = {b: list(fl) for b, fl in snap0.buckets.items()}
    n_files0 = sum(len(fl) for fl in files0.values())
    assert n_files0 >= 8, f"initial load should range-split: {n_files0} files"
    # every file carries a harvested _khash range
    for fl in files0.values():
        for rel in fl:
            assert KHASH_COL in snap0.file_stats.get(rel, {}), rel

    # range files within a bucket are DISJOINT in khash (sorted write +
    # range-group split), which is what makes pruning selective
    for b, fl in files0.items():
        ranges = sorted(
            (snap0.file_stats[rel][KHASH_COL][0], snap0.file_stats[rel][KHASH_COL][1])
            for rel in fl
        )
        for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
            assert hi1 < lo2, f"bucket {b} file ranges overlap: {ranges}"

    # single-key update -> exactly the file(s) containing that key rewrite
    res = apply_batch(
        t,
        _events(spark, [(5000, 0, 0, "update", "repo3", "f3.py", "HOT")]),
        batch_id=1,
        salt_partitions=16,
    )
    assert res.rewritten_files == 1, (
        f"single key should rewrite exactly its one overlapping file, "
        f"got {res.rewritten_files} (carried {res.carried_files})"
    )
    # counts cover the affected bucket only (bucket-level pruning already
    # skipped the other bucket entirely)
    [hot_bucket] = res.affected_buckets
    assert res.carried_files == len(files0[hot_bucket]) - 1
    snap1 = t.snapshot()
    carried = set()
    for fl in snap1.buckets.values():
        carried.update(set(fl))
    old_files = {rel for fl in files0.values() for rel in fl}
    assert len(carried & old_files) == n_files0 - 1, "all but one old file carried by path"

    # state correctness: the hot row updated, everything else intact
    got = {
        (r["repo"], r["path"]): r["content"]
        for r in t.read().select("repo", "path", "content").collect()
    }
    assert got[("repo3", "f3.py")] == "HOT"
    assert len(got) == 2000
    assert got[("repo1", "f1.py")] == "v1"

    # a re-applied (stale) batch is still a no-op through the pruned path
    apply_batch(
        t,
        _events(spark, [(5000, 0, 0, "update", "repo3", "f3.py", "STALE-REPLAY")]),
        batch_id=1,
        salt_partitions=16,
    )
    assert (
        t.read().filter((F.col("repo") == "repo3") & (F.col("path") == "f3.py"))
        .select("content").collect()[0]["content"]
        == "HOT"
    )


def test_delete_and_reinsert_through_pruned_files(spark, tmp_path):
    """Tombstone guard must survive file-granular pruning: the delete's
    tombstone lands in the key's file; a later stale insert must read that
    file (pruning can't skip it) and stay dead."""
    t = LakeTable.create(
        spark, str(tmp_path / "d"), PAYLOAD, key_cols=["repo", "path"], n_buckets=2
    )
    apply_batch(t, _bulk_insert(spark, 500), batch_id=0, salt_partitions=8)
    apply_batch(
        t, _events(spark, [(1000, 0, 0, "delete", "repo2", "f2.py", None)]),
        batch_id=1, salt_partitions=8,
    )
    res = apply_batch(
        t, _events(spark, [(900, 0, 0, "insert", "repo2", "f2.py", "stale resurrect")]),
        batch_id=2, salt_partitions=8,
    )
    assert res.rewritten_files is not None and res.rewritten_files <= 2
    assert t.read().filter((F.col("repo") == "repo2") & (F.col("path") == "f2.py")).count() == 0


def test_wide_batch_still_rewrites_everything_it_touches(spark, tmp_path):
    """A batch touching every key prunes nothing — carried = 0 — and the
    result matches a fresh full build (no rows lost to pruning)."""
    from binlog_es_go_spark.cdc.oracle import table_digest

    t = LakeTable.create(
        spark, str(tmp_path / "w"), PAYLOAD, key_cols=["repo", "path"], n_buckets=2
    )
    apply_batch(t, _bulk_insert(spark, 300), batch_id=0, salt_partitions=8)
    upd = _events(
        spark,
        [(10_000 + i, 0, 0, "update", f"repo{i % 7}", f"f{i}.py", f"new{i}") for i in range(300)],
    )
    res = apply_batch(t, upd, batch_id=1, salt_partitions=8)
    assert res.carried_files == 0, "wide batch overlaps every file"

    ref = LakeTable.create(
        spark, str(tmp_path / "wref"), PAYLOAD, key_cols=["repo", "path"], n_buckets=2
    )
    apply_batch(ref, upd, batch_id=0, salt_partitions=8)
    da = table_digest(t.read().select("repo", "path", "content").toPandas())
    db = table_digest(ref.read().select("repo", "path", "content").toPandas())
    assert da == db


def test_compaction_resplits_and_preserves_pruning(spark, tmp_path):
    """compact(target_files_per_bucket=k) produces k disjoint range files
    per bucket, and post-compaction single-key merges still prune."""
    from binlog_es_go_spark.lake.maintenance import compact

    t = LakeTable.create(
        spark, str(tmp_path / "c"), PAYLOAD, key_cols=["repo", "path"], n_buckets=2
    )
    apply_batch(t, _bulk_insert(spark, 1000), batch_id=0, salt_partitions=16)
    compact(t, target_files_per_bucket=4)
    snap = t.snapshot()
    per_bucket = {b: len(fl) for b, fl in snap.buckets.items()}
    assert all(1 <= n <= 4 for n in per_bucket.values()), per_bucket
    assert sum(per_bucket.values()) >= 4, f"compaction should range-split: {per_bucket}"

    res = apply_batch(
        t, _events(spark, [(5000, 0, 0, "update", "repo1", "f1.py", "X")]),
        batch_id=1, salt_partitions=16,
    )
    [hot_bucket] = res.affected_buckets
    assert res.rewritten_files == 1 and res.carried_files == per_bucket[hot_bucket] - 1
    assert t.read().count() == 1000


def test_read_keys_point_lookup_prunes_files(spark, tmp_path):
    """Driver-side zlib.crc32 matches Spark's crc32 routing (golden cross
    check), so a point lookup resolves its scan set from the manifest
    alone: O(len(keys)) files read, tombstoned keys invisible, missing
    keys empty."""
    import zlib

    from binlog_es_go_spark.lake.table import KEY_SEP, bucket_expr

    t = LakeTable.create(
        spark, str(tmp_path / "pk"), PAYLOAD, key_cols=["repo", "path"], n_buckets=2
    )
    apply_batch(t, _bulk_insert(spark, 2000), batch_id=0, salt_partitions=16)

    # cross-engine routing: python zlib.crc32 == Spark crc32 on sample keys
    sample = [("repo3", "f3.py"), ("repo0", "f7.py")]
    got = spark.createDataFrame(sample, ["repo", "path"]).select(
        bucket_expr(["repo", "path"], 2).alias("b")).collect()
    for (r, p), row in zip(sample, got):
        assert zlib.crc32(f"{r}{KEY_SEP}{p}".encode()) % 2 == row["b"]

    out = t.read_keys([("repo3", "f3.py"), ("repo1", "f8.py"), ("nope", "x.py")])
    rows = {(r["repo"], r["path"]): r["content"] for r in out.collect()}
    assert rows == {("repo3", "f3.py"): "v3", ("repo1", "f8.py"): "v8"}

    # pruning: the lookup's scan is a strict subset of the table's files
    n_total = sum(len(fl) for fl in t.snapshot().buckets.values())
    snap = t.snapshot()
    kh = zlib.crc32(f"repo3{KEY_SEP}f3.py".encode())
    hit_files = [
        rel for rel in snap.buckets.get(kh % 2, [])
        if snap.file_stats[rel]["_khash"][0] <= kh <= snap.file_stats[rel]["_khash"][1]
    ]
    assert len(hit_files) == 1 and n_total >= 8

    # tombstoned key is invisible to the lookup
    apply_batch(t, _events(spark, [(9999, 0, 0, "delete", "repo3", "f3.py", None)]),
                batch_id=1, salt_partitions=16)
    assert t.read_keys([("repo3", "f3.py")]).count() == 0
    assert t.read_keys([("repo3", "f3.py")], include_deleted=True).count() == 1
    assert t.read_keys([]).count() == 0


def test_partial_compaction_folds_only_fragmented_buckets(spark, tmp_path):
    """File-COW accumulates files per bucket commit-over-commit;
    small_file_buckets + compact(buckets=...) fold exactly the fragmented
    buckets — other buckets keep their files BY PATH, state is intact."""
    from binlog_es_go_spark.lake.maintenance import compact, small_file_buckets

    t = LakeTable.create(
        spark, str(tmp_path / "pc"), PAYLOAD, key_cols=["repo", "path"], n_buckets=2
    )
    # one file per bucket...
    apply_batch(t, _bulk_insert(spark, 600), batch_id=0, salt_partitions=2)
    # ...then a single-key merge at a finer write-group split rewrites that
    # bucket's one overlapping file into up to 8 range files — the
    # k-mismatch fragmentation pattern (steady-state same-k merges replace
    # files 1:1 and do NOT fragment; see test above). Round 6 collapses
    # surgical commits to one write group per bucket, which REMOVES this
    # fragmentation source — disable the collapse here so the compaction
    # path under test still gets a fragmented fixture to fold.
    import binlog_es_go_spark.lake.merge as _mg

    prev_small = _mg.SMALL_COMMIT_BYTES
    _mg.SMALL_COMMIT_BYTES = 0
    try:
        apply_batch(
            t, _events(spark, [(10_000, 0, 0, "update", "repo3", "f3.py", "u0")]),
            batch_id=1, salt_partitions=16,
        )
    finally:
        _mg.SMALL_COMMIT_BYTES = prev_small
    snap = t.snapshot()
    counts = {b: len(fl) for b, fl in snap.buckets.items()}
    frag = small_file_buckets(t, max_files_per_bucket=5)
    assert frag and max(counts.values()) > 5, counts
    cold = [b for b in counts if b not in frag]
    cold_files = {b: list(snap.buckets[b]) for b in cold}

    v = compact(t, target_files_per_bucket=2, buckets=frag)
    snap2 = t.snapshot()
    assert v == snap.version + 1
    for b in frag:
        assert len(snap2.buckets[b]) <= 2, "fragmented bucket folded"
    for b in cold:
        assert snap2.buckets[b] == cold_files[b], "cold bucket untouched by path"
    assert small_file_buckets(t, max_files_per_bucket=5) == []

    got = {(r["repo"], r["path"]): r["content"]
           for r in t.read().select("repo", "path", "content").collect()}
    assert len(got) == 600 and got[("repo3", "f3.py")] == "u0"

    # post-compaction merges still prune at file granularity
    res = apply_batch(
        t, _events(spark, [(20_000, 0, 0, "update", "repo3", "f3.py", "FINAL")]),
        batch_id=99, salt_partitions=8,
    )
    assert res.rewritten_files == 1
