"""Per-file column statistics + data skipping (Iceberg stats analog).

The manifest records parquet footer min/max per primitive column at
commit time; value-range scans prune FILES (on top of key-hash bucket
pruning). Pruning must be provably safe: it may only skip files whose
recorded range cannot contain a match.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from binlog_es_go_spark.cdc.apply import apply_batch
from binlog_es_go_spark.lake.maintenance import compact
from binlog_es_go_spark.lake.table import LakeTable, bucket_expr

PAYLOAD = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("size", T.LongType()),
        T.StructField("lang", T.StringType()),
    ]
)


def _table_with_bucket_correlated_sizes(spark, tmp_path, n=800, n_buckets=8):
    """size = bucket(doc_id)*1000 + small noise, so each bucket's single
    file has a tight, disjoint size range — a sharp pruning fixture."""
    t = LakeTable.create(spark, str(tmp_path / "t"), PAYLOAD, key_cols=["doc_id"], n_buckets=n_buckets)
    rows = spark.range(n).select(
        F.col("id").alias("offset"),
        F.lit(0).cast("int").alias("partition_id"),
        F.lit(0).cast("int").alias("seq_in_tx"),
        F.lit("insert").alias("op"),
        F.col("id").alias("doc_id"),
        F.struct(
            (bucket_expr(["doc_id"], n_buckets).cast("long") * 1000 + F.pmod(F.col("id"), F.lit(100))).alias("size"),
            F.element_at(F.array(F.lit("en"), F.lit("de")), (F.pmod(F.col("id"), F.lit(2)) + 1).cast("int")).alias("lang"),
        ).alias("after"),
        F.lit(None).cast("timestamp").alias("ts"),
    )
    apply_batch(t, rows, batch_id=0, salt_partitions=n_buckets)
    return t


def test_stats_harvested_and_prune_files(spark, tmp_path):
    t = _table_with_bucket_correlated_sizes(spark, tmp_path)
    snap = t.snapshot()
    all_files = t.files_for()
    assert len(all_files) >= 8
    # every data file has harvested stats for the primitive columns
    for p in all_files:
        st = snap.file_stats[p]
        assert "size" in st and "doc_id" in st and "lang" in st
        mn, mx, nulls = st["size"]
        assert mn <= mx and nulls == 0

    # a tight size range hits exactly one bucket's file(s)
    pruned = t.files_for(stats_filter={"size": (3000, 3099)})
    assert 1 <= len(pruned) < len(all_files)

    # pruned scan + real predicate == full scan + real predicate
    want = t.read().filter(F.col("size").between(3000, 3099))
    got = t.read(stats_filter={"size": (3000, 3099)}).filter(F.col("size").between(3000, 3099))
    assert sorted(r["doc_id"] for r in got.collect()) == sorted(r["doc_id"] for r in want.collect())
    assert want.count() > 0

    # half-open bounds and string columns prune safely too
    hi_only = t.files_for(stats_filter={"size": (None, 999)})
    assert 1 <= len(hi_only) < len(all_files)
    got_s = t.read(stats_filter={"lang": ("en", "en")}).filter(F.col("lang") == "en").count()
    assert got_s == t.read().filter(F.col("lang") == "en").count()


def test_stats_safety_on_random_ranges(spark, tmp_path):
    """Pruning may never change results: sweep ranges, compare counts."""
    t = _table_with_bucket_correlated_sizes(spark, tmp_path)
    for lo, hi in [(0, 50), (500, 2500), (7000, 7999), (9999, 99999), (None, 0), (0, None)]:
        cond = F.lit(True)
        if lo is not None:
            cond = cond & (F.col("size") >= lo)
        if hi is not None:
            cond = cond & (F.col("size") <= hi)
        full = t.read().filter(cond).count()
        pruned = t.read(stats_filter={"size": (lo, hi)}).filter(cond).count()
        assert pruned == full, (lo, hi)


def test_stats_survive_merge_and_compaction(spark, tmp_path):
    t = _table_with_bucket_correlated_sizes(spark, tmp_path)
    # an update batch rewrites some buckets; stats must re-harvest
    upd = spark.range(10).select(
        (F.col("id") + 10000).alias("offset"),
        F.lit(0).cast("int").alias("partition_id"),
        F.lit(0).cast("int").alias("seq_in_tx"),
        F.lit("update").alias("op"),
        F.col("id").alias("doc_id"),
        F.struct(F.lit(777777).cast("long").alias("size"), F.lit("fr").alias("lang")).alias("after"),
        F.lit(None).cast("timestamp").alias("ts"),
    )
    apply_batch(t, upd, batch_id=1)
    snap = t.snapshot()
    assert all(p in snap.file_stats for p in t.files_for()), "rewritten files re-harvested"
    # the updated rows are found through a pruned scan
    got = t.read(stats_filter={"size": (777777, 777777)}).filter(F.col("size") == 777777).count()
    assert got == 10

    compact(t)
    snap2 = t.snapshot()
    assert all(p in snap2.file_stats for p in t.files_for())
    pruned = t.files_for(stats_filter={"size": (777777, 777777)})
    assert len(pruned) <= len(t.files_for())
    assert t.read(stats_filter={"size": (777777, 777777)}).filter(F.col("size") == 777777).count() == 10


def test_pre_stats_manifests_read_fine(spark, tmp_path):
    """A manifest without file_stats (older table) keeps every file."""
    import json
    import os

    t = _table_with_bucket_correlated_sizes(spark, tmp_path)
    v = t.current_version()
    mpath = os.path.join(t.root, f"manifest-{v}.json")
    m = json.load(open(mpath))
    m.pop("file_stats", None)
    os.unlink(mpath)
    json.dump(m, open(mpath, "w"))
    assert t.files_for(stats_filter={"size": (0, 1)}) == t.files_for()
    assert t.read(stats_filter={"size": (3000, 3099)}).filter(F.col("size").between(3000, 3099)).count() > 0


def test_carried_file_stats_stay_exact_across_merge_and_compaction(spark, tmp_path):
    """File-granular COW carries untouched files' manifest stats forward
    verbatim (write_buckets keeps `p in live` entries). That is only
    sound if a carried entry always equals the file's TRUE footer stats —
    they must never drift across merges, delta appends, or compaction.
    VERDICT r4 #10."""
    from binlog_es_go_spark.lake.table import _harvest_file_stats

    t = _table_with_bucket_correlated_sizes(spark, tmp_path)
    v1_files = set(t.files_for())

    # incremental batch touching 3 keys: most v1 files are carried
    upd = spark.createDataFrame(
        [(10_000 + k, 0, 0, "update", k, (9_999, "fr")) for k in (1, 2, 3)],
        "offset long, partition_id int, seq_in_tx int, op string, doc_id long, "
        "after struct<size:long,lang:string>",
    ).withColumn("ts", F.lit(None).cast("timestamp"))
    apply_batch(t, upd, batch_id=1, salt_partitions=8)

    snap = t.snapshot()
    live = t.files_for()
    carried = set(live) & v1_files
    assert carried, "fixture must exercise the carry path"
    assert set(live) - v1_files, "fixture must also rewrite something"

    fresh = _harvest_file_stats(t.root, live, snap.schema)
    for p in live:
        assert snap.file_stats.get(p) == fresh.get(p), f"stats drift on {p} (carried={p in carried})"

    # compaction replaces layout wholesale; harvested stats must again be
    # exactly the new files' footer truth
    compact(t, target_files_per_bucket=1)
    snap2 = t.snapshot()
    live2 = t.files_for()
    fresh2 = _harvest_file_stats(t.root, live2, snap2.schema)
    for p in live2:
        assert snap2.file_stats.get(p) == fresh2.get(p)
    # and the khash ranges recorded for the compacted files truly bound
    # the rows inside (the file-COW correctness contract)
    from binlog_es_go_spark.lake.table import KHASH_COL
    for p in live2:
        lo, hi, _ = snap2.file_stats[p][KHASH_COL]
        real = spark.read.parquet(f"{t.root}/{p}").agg(
            F.min(KHASH_COL), F.max(KHASH_COL)).first()
        assert lo <= real[0] and real[1] <= hi
