"""Extreme hot-key skew: correctness and plan behavior under Zipf abuse.

The north rule requires salting to defeat hot repo keys. Two layers
handle skew here: (a) the write-side salt spreads a hot repo's rows over
many tasks/files; (b) the merge window's WindowGroupLimit partial pass
(asserted in test_physical_plans) pre-filters to one candidate row per
key per input partition BEFORE the shuffle, so even a single
super-hot (repo, path) key ships O(partitions) rows, not O(events).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from binlog_es_go_spark.cdc.apply import apply_batch
from binlog_es_go_spark.cdc.events import generate_changelog
from binlog_es_go_spark.cdc.oracle import apply_sequential, table_digest
from binlog_es_go_spark.lake.table import BUCKET_COL, LakeTable, bucket_expr
from binlog_es_go_spark.operators.salting import salt_column

PAYLOAD = T.StructType([T.StructField(n, T.StringType()) for n in ["repo", "path", "commit", "lang", "content"]])


def test_single_hot_key_replay_converges(spark, tmp_path):
    """50% of all events hit ONE (repo, path): LWW must still converge."""
    log = generate_changelog(spark, 3000, n_repos=20, paths_per_repo=10, seed=41)
    hot = log.withColumn(
        "repo", F.when(F.col("offset") % 2 == 0, F.lit("org0/hotrepo")).otherwise(F.col("repo"))
    ).withColumn(
        "path", F.when(F.col("offset") % 2 == 0, F.lit("HOT.txt")).otherwise(F.col("path"))
    )
    hot.cache().count()
    t = LakeTable.create(spark, str(tmp_path / "t"), PAYLOAD, key_cols=["repo", "path"], n_buckets=8)
    for i in range(3):
        apply_batch(t, hot.filter((F.col("offset") >= i * 1000) & (F.col("offset") < (i + 1) * 1000)), batch_id=i)
    oracle = apply_sequential(hot.toPandas())
    got = t.read().select("repo", "path", "content").toPandas()
    assert table_digest(got) == table_digest(oracle[["repo", "path", "content"]])
    # the hot key holds its max offset
    hot_row = t.read().filter(F.col("repo") == "org0/hotrepo").collect()
    assert len(hot_row) == 1 and hot_row[0]["last_offset"] >= 2996


def test_zipf_bucket_balance(spark):
    """crc32 bucketing keeps bucket sizes balanced even under repo skew
    (hot repos spread across their paths — the bucketing-by-full-key
    design property the 100 TB story depends on)."""
    log = generate_changelog(spark, 20000, n_repos=100, paths_per_repo=50, skew=4.0, seed=42)
    # what matters for file sizes is DISTINCT KEYS per bucket (the final
    # state holds one row per key); raw event counts per key are collapsed
    # by the WindowGroupLimit partial pass before the shuffle
    sizes = (
        log.select("repo", "path").distinct()
        .select(bucket_expr(["repo", "path"], 64).alias(BUCKET_COL))
        .groupBy(BUCKET_COL)
        .count()
        .agg(F.min("count").alias("lo"), F.max("count").alias("hi"), F.avg("count").alias("mean"))
        .first()
    )
    assert sizes["hi"] / sizes["mean"] < 2.0, f"bucket imbalance: {sizes}"


def test_salt_spreads_hot_repo(spark):
    """Write-side salt: one hot repo's rows land in many salt slots."""
    df = spark.range(10000).select(
        F.lit("org0/hotrepo").alias("repo"),
        F.concat(F.lit("p"), F.col("id").cast("string")).alias("path"),
    )
    n = df.select(salt_column(["repo", "path"], 32).alias("s")).select("s").distinct().count()
    assert n == 32


def test_merge_write_salt_splits_hot_bucket_above_n_buckets(spark, tmp_path):
    """The write-layout dial pinned (lake/merge.py): the (bucket,
    crc32(key) % n_out) repartition degenerates to one file per bucket at
    n_out == n_buckets, and splits each bucket into n_out/n_buckets write
    groups above that — so a hot bucket's write fans out without
    inflating cold buckets' file counts."""
    import os

    from pyspark.sql import types as T

    from binlog_es_go_spark.cdc.apply import apply_batch
    from binlog_es_go_spark.cdc.events import generate_changelog
    from binlog_es_go_spark.lake.table import LakeTable

    PAYLOAD = T.StructType([T.StructField(n, T.StringType()) for n in ["repo", "path", "commit", "lang", "content"]])
    log = generate_changelog(spark, 4000, n_repos=30, paths_per_repo=20, seed=9)
    log.cache().count()

    def files_per_bucket(root):
        # files may sit under _bucket=N/ directly (one write group) or in
        # _bucket=N/_wg=M/ range-group subdirs (round-4 file-COW layout)
        out = {}
        data = os.path.join(root, "data")
        for commit in os.listdir(data):
            cdir = os.path.join(data, commit)
            for entry in os.listdir(cdir):
                if entry.startswith("_bucket="):
                    b = int(entry.split("=")[1])
                    n = 0
                    for dirpath, _, fns in os.walk(os.path.join(cdir, entry)):
                        n += len([f for f in fns if f.endswith(".parquet")])
                    out[b] = out.get(b, 0) + n
        return out

    t1 = LakeTable.create(spark, str(tmp_path / "t1"), PAYLOAD, key_cols=["repo", "path"], n_buckets=8)
    apply_batch(t1, log, batch_id=0, salt_partitions=8, prune_buckets=False)
    fpb1 = files_per_bucket(str(tmp_path / "t1"))
    assert max(fpb1.values()) == 1, f"n_out==n_buckets must be a bucket-identity write: {fpb1}"

    t2 = LakeTable.create(spark, str(tmp_path / "t2"), PAYLOAD, key_cols=["repo", "path"], n_buckets=8)
    apply_batch(t2, log, batch_id=0, salt_partitions=32, prune_buckets=False)
    fpb2 = files_per_bucket(str(tmp_path / "t2"))
    # crc%32 takes 4 values per crc%8 class -> up to 4 write groups/bucket
    assert max(fpb2.values()) > 1, f"hot buckets must split above n_buckets: {fpb2}"
    assert max(fpb2.values()) <= 4, fpb2
