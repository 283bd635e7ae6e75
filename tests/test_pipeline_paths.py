"""Bootstrap, streaming-tail, and dead-letter replay paths share one core."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from binlog_es_go_spark.cdc.apply import apply_batch, applied_offsets
from binlog_es_go_spark.cdc.bootstrap import as_changelog, run_full_scan, run_with_keys
from binlog_es_go_spark.cdc.deadletter import DeadLetterLog, replay_dead_letters
from binlog_es_go_spark.cdc.events import generate_changelog
from binlog_es_go_spark.cdc.oracle import apply_sequential, table_digest
from binlog_es_go_spark.cdc.stream import run_tail_until_drained
from binlog_es_go_spark.lake.table import LakeTable

PAYLOAD = T.StructType([T.StructField(n, T.StringType()) for n in ["repo", "path", "commit", "lang", "content"]])


def fresh_table(spark, tmp_path, name="t", n_buckets=16):
    return LakeTable.create(spark, str(tmp_path / name), PAYLOAD, key_cols=["repo", "path"], n_buckets=n_buckets)


@pytest.fixture(scope="module")
def base_source(spark):
    """A base table: final state of a small changelog (inserts only)."""
    log = generate_changelog(spark, 1500, n_repos=30, paths_per_repo=15, seed=11, delete_ratio=0.0)
    from binlog_es_go_spark.cdc.events import flatten_changelog
    from binlog_es_go_spark.lake.merge import dedup_last_writer

    df = dedup_last_writer(flatten_changelog(log), ["repo", "path"]).select(
        "repo", "path", "commit", "lang", "content"
    )
    df.cache().count()
    return df


def test_bootstrap_full_scan(spark, tmp_path, base_source):
    t = fresh_table(spark, tmp_path)
    run_full_scan(t, base_source, epoch_offset=0)
    assert t.read().count() == base_source.count()
    # re-running bootstrap at the same epoch is idempotent
    v = t.current_version()
    run_full_scan(t, base_source, epoch_offset=0)
    got = t.read().select("repo", "path", "content").toPandas()
    exp = base_source.select("repo", "path", "content").toPandas()
    assert table_digest(got) == table_digest(exp)
    assert t.current_version() >= v  # commit happened but state unchanged


def test_bootstrap_where_pushdown(spark, tmp_path, base_source):
    t = fresh_table(spark, tmp_path)
    run_full_scan(t, base_source, where="lang = 'py'")
    assert t.read().count() == base_source.filter("lang = 'py'").count()
    assert t.read().filter("lang <> 'py'").count() == 0


def test_bootstrap_then_tail_wins(spark, tmp_path, base_source):
    """Realtime events (offset > epoch) override bootstrap rows."""
    t = fresh_table(spark, tmp_path)
    run_full_scan(t, base_source, epoch_offset=0)
    one = base_source.limit(1).collect()[0]
    ev = spark.createDataFrame(
        [(10_000, 0, 0, "update", one["repo"], one["path"], None,
          ("newcommit", one["lang"], "updated content"), __import__("datetime").datetime(2026, 1, 1))],
        schema="offset long, partition_id int, seq_in_tx int, op string, repo string, path string, "
               "before struct<commit:string,lang:string,content:string>, "
               "after struct<commit:string,lang:string,content:string>, ts timestamp",
    )
    apply_batch(t, ev, batch_id=1)
    got = t.read().filter((F.col("repo") == one["repo"]) & (F.col("path") == one["path"])).collect()
    assert got[0]["content"] == "updated content"
    assert t.read().count() == base_source.count()


def test_run_with_keys_exact_recompute(spark, tmp_path, base_source):
    t = fresh_table(spark, tmp_path)
    keys = base_source.select("repo", "path").limit(7)
    run_with_keys(t, base_source, keys, epoch_offset=0)
    assert t.read().count() == 7


def test_streaming_tail_converges(spark, tmp_path):
    events_dir = str(tmp_path / "events")
    ckpt = str(tmp_path / "ckpt")
    log = generate_changelog(spark, 3000, n_repos=25, paths_per_repo=12, seed=5)
    log.cache().count()
    # three "shipped" event files arriving over time
    for i in range(3):
        log.filter((F.col("offset") >= i * 1000) & (F.col("offset") < (i + 1) * 1000)).coalesce(1).write.mode(
            "append"
        ).parquet(events_dir)
    t = fresh_table(spark, tmp_path, "stream_t")
    run_tail_until_drained(t, spark, events_dir, ckpt, timeout_sec=300, max_files_per_trigger=1)
    oracle = apply_sequential(log.toPandas())
    got = t.read().select("repo", "path", "content").toPandas()
    assert len(got) == len(oracle)
    assert table_digest(got) == table_digest(oracle[["repo", "path", "content"]])
    assert len(applied_offsets(t)) == 8


def test_streaming_restart_resumes_from_checkpoint(spark, tmp_path):
    events_dir = str(tmp_path / "ev2")
    ckpt = str(tmp_path / "ckpt2")
    log = generate_changelog(spark, 2000, n_repos=25, paths_per_repo=12, seed=9)
    log.cache().count()
    first = log.filter(F.col("offset") < 1000)
    first.coalesce(1).write.mode("append").parquet(events_dir)
    t = fresh_table(spark, tmp_path, "stream_r")
    run_tail_until_drained(t, spark, events_dir, ckpt, timeout_sec=300)
    mid_digest = table_digest(t.read().select("repo", "path", "content").toPandas())
    # "restart": new query, same checkpoint; ship the rest
    log.filter(F.col("offset") >= 1000).coalesce(1).write.mode("append").parquet(events_dir)
    run_tail_until_drained(t, spark, events_dir, ckpt, timeout_sec=300)
    oracle = apply_sequential(log.toPandas())
    got = t.read().select("repo", "path", "content").toPandas()
    assert table_digest(got) == table_digest(oracle[["repo", "path", "content"]])
    assert table_digest(got) != mid_digest  # it actually advanced


def test_deadletter_record_and_replay(spark, tmp_path, base_source):
    t = fresh_table(spark, tmp_path)
    dl = DeadLetterLog(spark, str(tmp_path / "dl"))
    failed = base_source.select("repo", "path").limit(5).withColumn("offset", F.lit(123).cast("long"))
    dl.record_failure(failed, reason="sink timeout", stage="merge", batch_id=7)
    assert dl.pending_keys().count() == 5
    # duplicate recording dedups on replay (parser-dedup analog)
    dl.record_failure(failed, reason="sink timeout again", stage="merge", batch_id=8)
    assert dl.pending_keys().count() == 5
    res = replay_dead_letters(t, dl, base_source, epoch_offset=0)
    assert res is not None
    assert t.read().count() == 5
    assert dl.pending_keys().count() == 0  # archived
    ana = dl.analyze().collect()
    assert ana[0]["n"] == 10 and ana[0]["failure_type"] == "apply_error"
    # nothing pending -> replay is a no-op
    assert replay_dead_letters(t, dl, base_source, epoch_offset=0) is None


def test_as_changelog_shape(spark, base_source):
    cl = as_changelog(base_source, ["repo", "path"], epoch_offset=42)
    row = cl.limit(1).collect()[0]
    assert row["offset"] == 42 and row["op"] == "insert"
    assert set(cl.columns) == {"offset", "partition_id", "seq_in_tx", "op", "repo", "path", "before", "after", "ts"}
