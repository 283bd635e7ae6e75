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


def test_circuit_breaker_backoff_ladder():
    """Pure-unit: open after threshold, exponential capped backoff, close
    on success (pkg/pipeline/sink/bulkwriter.go:50-96 semantics)."""
    from binlog_es_go_spark.cdc.circuit import CircuitBreaker, CircuitBreakerConfig

    slept = []
    b = CircuitBreaker(CircuitBreakerConfig(failure_threshold=2, base_backoff_ms=100, max_backoff_ms=400),
                       sleep=slept.append)
    b.before_attempt(); b.record_failure()          # 1st failure: closed
    b.before_attempt(); b.record_failure()          # 2nd: opens
    assert b.is_open and b.opens == 1
    b.before_attempt(); b.record_failure()          # waited 100ms, probe fails
    b.before_attempt(); b.record_failure()          # waited 200ms
    b.before_attempt(); b.record_failure()          # waited 400ms
    b.before_attempt(); b.record_success()          # waited 400ms (capped), probe succeeds
    assert slept == [0.1, 0.2, 0.4, 0.4]
    assert not b.is_open and b.current_backoff_ms() == 0


def test_circuit_breaker_throttles_failing_sink_then_recovers(spark, tmp_path):
    """A sink failing k batches opens the circuit (backoff sleeps observed);
    recovery resumes cleanly and later batches land."""
    from binlog_es_go_spark.cdc.circuit import CircuitBreaker, CircuitBreakerConfig

    events_dir, ckpt = str(tmp_path / "ev"), str(tmp_path / "ck")
    log = generate_changelog(spark, 500, n_repos=10, paths_per_repo=5, seed=13, delete_ratio=0.0)
    for i in range(5):
        log.filter((F.col("offset") >= i * 100) & (F.col("offset") < (i + 1) * 100)).coalesce(1).write.mode(
            "append"
        ).parquet(events_dir)
    t = fresh_table(spark, tmp_path, "cb_t")

    sleeps: list[float] = []
    breaker = CircuitBreaker(
        CircuitBreakerConfig(failure_threshold=3, base_backoff_ms=200, max_backoff_ms=1000),
        sleep=lambda s: sleeps.append(round(s, 3)),
    )
    calls = {"n": 0}

    def flaky_mapper(df):
        calls["n"] += 1
        if calls["n"] <= 4:
            raise RuntimeError("sink down")
        return df

    dead: list[int] = []
    run_tail_until_drained(
        t, spark, events_dir, ckpt, timeout_sec=300, max_files_per_trigger=1,
        mapper=flaky_mapper, on_error=lambda bid, df, exc: dead.append(bid),
        circuit=breaker,
    )
    assert dead == [0, 1, 2, 3]
    assert breaker.opens == 1
    # attempts 4 and 5 each waited out the ladder: 200ms then 400ms
    assert sleeps == [0.2, 0.4]
    assert not breaker.is_open          # success closed it
    assert t.read().count() > 0         # the recovered batch landed


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


def test_bootstrap_then_tail_cutover_converges(spark, tmp_path):
    """The classic CDC cutover: bootstrap a snapshot at epoch E, then tail
    the FULL changelog from offset 0 — the epoch guard must no-op the
    already-bootstrapped prefix and apply only the tail, converging to the
    sequential oracle with no lost or doubled events."""
    log = generate_changelog(spark, 2000, n_repos=20, paths_per_repo=10, seed=17)
    log.cache().count()
    epoch = 1200
    # the snapshot a dump tool would hand us: state as of offset < epoch
    from binlog_es_go_spark.cdc.events import flatten_changelog
    from binlog_es_go_spark.lake.merge import dedup_last_writer

    prefix = log.filter(F.col("offset") < epoch)
    snap_state = (
        dedup_last_writer(flatten_changelog(prefix), ["repo", "path"])
        .filter(F.col("op") != "delete")
        .select("repo", "path", "commit", "lang", "content")
    )
    t = fresh_table(spark, tmp_path, "cutover")
    run_full_scan(t, snap_state, epoch_offset=epoch - 1)
    # documented cutover protocol: the coarse filter drops the pre-epoch
    # prefix GLOBALLY (the dump has no tombstones for keys deleted before
    # it, so replaying stale pre-epoch inserts would resurrect them)
    from binlog_es_go_spark.cdc.apply import filter_unapplied

    remaining = filter_unapplied(log, applied_offsets(t))
    assert remaining.count() == log.filter(F.col("offset") >= epoch).count()
    events_dir, ckpt = str(tmp_path / "ev"), str(tmp_path / "ck")
    remaining.coalesce(2).write.parquet(events_dir)
    run_tail_until_drained(t, spark, events_dir, ckpt, timeout_sec=300)
    oracle = apply_sequential(log.toPandas())
    got = t.read().select("repo", "path", "content").toPandas()
    assert len(got) == len(oracle)
    assert table_digest(got) == table_digest(oracle[["repo", "path", "content"]])


def test_tail_runs_from_rate_source(spark, tmp_path):
    """The 'Kafka is a readStream swap' claim, exercised: the same
    start_tail + apply core consumes a non-file source (rate) with zero
    apply-path changes — only the readStream line differs."""
    import time as _time

    from binlog_es_go_spark.cdc.stream import start_tail

    payload_t = "struct<commit:string,lang:string,content:string>"
    rate = spark.readStream.format("rate").option("rowsPerSecond", "500").load()
    chg = rate.select(
        F.col("value").alias("offset"),
        F.pmod(F.col("value"), F.lit(4)).cast("int").alias("partition_id"),
        F.lit(0).cast("int").alias("seq_in_tx"),
        F.lit("insert").alias("op"),
        F.concat(F.lit("r"), F.pmod(F.col("value"), F.lit(20)).cast("string")).alias("repo"),
        F.concat(F.lit("p"), F.pmod(F.col("value"), F.lit(7)).cast("string")).alias("path"),
        F.lit(None).cast(payload_t).alias("before"),
        F.struct(
            F.sha2(F.col("value").cast("string"), 256).alias("commit"),
            F.lit("py").alias("lang"),
            F.concat(F.lit("content@"), F.col("value").cast("string")).alias("content"),
        ).alias("after"),
        F.col("timestamp").alias("ts"),
    )
    t = fresh_table(spark, tmp_path, "rate_t", n_buckets=8)
    q = start_tail(t, chg, str(tmp_path / "rate_ckpt"), trigger={"processingTime": "1 second"})
    try:
        deadline = _time.time() + 120
        while _time.time() < deadline and t.current_version() == 0:
            _time.sleep(1)
    finally:
        q.stop()
    assert t.current_version() > 0, "no batch committed from the rate source"
    assert t.read().count() > 0
    offs = applied_offsets(t)
    assert offs and all(int(v) >= 0 for v in offs.values())


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


# ------------------------------------------------------------ kafka form
def test_kafka_projection_maps_positions_and_parses_json(spark):
    """changelog_stream_kafka's projection, driven without a broker: a
    batch DataFrame with Kafka's wire schema (value binary JSON,
    partition, offset) must parse into the changelog schema with Kafka's
    own (partition, offset) OVERRIDING any event-embedded positions, and
    the result must flow through the standard apply core."""
    import json

    from pyspark.sql import types as T

    from binlog_es_go_spark.cdc.apply import apply_batch
    from binlog_es_go_spark.cdc.stream import project_kafka_records
    from binlog_es_go_spark.lake.table import LakeTable

    def rec(partition, offset, op, repo, path, content, embedded_offset=999999):
        # the embedded positions are decoys: Kafka's must win
        v = {
            "offset": embedded_offset, "partition_id": 77, "seq_in_tx": 0,
            "op": op, "repo": repo, "path": path,
            "before": None,
            "after": None if op == "delete" else
                {"commit": "c" * 40, "lang": "py", "content": content},
            "ts": "2026-01-01 00:00:00",
        }
        return (None, json.dumps(v).encode(), "topic", partition, offset, None, 0)

    wire_schema = T.StructType([
        T.StructField("key", T.BinaryType()),
        T.StructField("value", T.BinaryType()),
        T.StructField("topic", T.StringType()),
        T.StructField("partition", T.IntegerType()),
        T.StructField("offset", T.LongType()),
        T.StructField("timestamp", T.TimestampType()),
        T.StructField("timestampType", T.IntegerType()),
    ])
    raw = spark.createDataFrame(
        [
            rec(0, 10, "insert", "r1", "a.py", "v1"),
            rec(0, 11, "update", "r1", "a.py", "v2"),
            rec(1, 5, "insert", "r2", "b.py", "w1"),
            rec(0, 12, "delete", "r1", "a.py", None),
        ],
        wire_schema,
    )
    log = project_kafka_records(raw)
    rows = {(r["partition_id"], r["offset"]): r for r in log.collect()}
    assert set(rows) == {(0, 10), (0, 11), (1, 5), (0, 12)}, "Kafka positions must win"
    assert rows[(0, 11)]["after"]["content"] == "v2"
    assert rows[(0, 12)]["op"] == "delete" and rows[(0, 12)]["after"] is None
    assert log.schema["ts"].dataType.typeName() == "timestamp"

    # end to end: the projected log applies through the standard core
    from binlog_es_go_spark.cdc.events import PAYLOAD_SCHEMA

    table = LakeTable.create(
        spark, str(spark.conf.get("spark.local.dir", "/tmp")) + "/kafka_proj_t",
        PAYLOAD_SCHEMA, key_cols=["repo", "path"], n_buckets=4,
    )
    try:
        apply_batch(table, log, batch_id=0)
        live = {(r["repo"], r["path"]): r["content"] for r in table.read().collect()}
        assert live == {("r2", "b.py"): "w1"}, "r1/a.py deleted at offset 12; r2 lives"
    finally:
        import shutil
        shutil.rmtree(str(spark.conf.get("spark.local.dir", "/tmp")) + "/kafka_proj_t",
                      ignore_errors=True)


def test_kafka_wire_stream_end_to_end(spark, tmp_path):
    """The Kafka source path under a REAL StreamingQuery, broker excepted:
    records in Kafka's exact wire framing (key/value binary, topic,
    partition, offset, timestamp) flow readStream → project_kafka_records
    → start_tail, across two incremental triggers with a checkpoint
    restart in between — so the (partition, offset) → (partition_id,
    offset) guard mapping, duplicate-delivery rejection, and resume
    semantics are integration-tested with everything but the socket.
    (``changelog_stream_kafka`` swaps only the reader: format('kafka')
    instead of parquet-dir; the projection under test here is shared,
    ``cdc/stream.py:78``. No connector jar exists in this container.)"""
    import json
    import time as _time

    from pyspark.sql import types as T

    from binlog_es_go_spark.cdc.events import PAYLOAD_SCHEMA
    from binlog_es_go_spark.cdc.stream import project_kafka_records, start_tail
    from binlog_es_go_spark.lake.table import LakeTable

    wire_schema = T.StructType([
        T.StructField("key", T.BinaryType()),
        T.StructField("value", T.BinaryType()),
        T.StructField("topic", T.StringType()),
        T.StructField("partition", T.IntegerType()),
        T.StructField("offset", T.LongType()),
        T.StructField("timestamp", T.TimestampType()),
        T.StructField("timestampType", T.IntegerType()),
    ])

    def rec(partition, offset, op, repo, path, content):
        v = {
            "offset": 424242, "partition_id": 99, "seq_in_tx": 0,  # decoys: Kafka wins
            "op": op, "repo": repo, "path": path, "before": None,
            "after": None if op == "delete" else
                {"commit": "c" * 40, "lang": "py", "content": content},
            "ts": "2026-01-01 00:00:00",
        }
        return (repo.encode(), json.dumps(v).encode(), "binlog", partition, offset, None, 0)

    wire_dir, ckpt = str(tmp_path / "wire"), str(tmp_path / "ckpt")
    table = LakeTable.create(
        spark, str(tmp_path / "t"), PAYLOAD_SCHEMA, key_cols=["repo", "path"], n_buckets=4
    )

    def run_stream():
        raw = spark.readStream.schema(wire_schema).parquet(wire_dir)
        q = start_tail(table, project_kafka_records(raw), ckpt,
                       trigger={"availableNow": True})
        # availableNow terminates on its own; poll so a slow contended
        # host can't silently time the wait out mid-trigger.
        deadline = _time.time() + 600
        while not q.awaitTermination(10):
            assert _time.time() < deadline, "stream did not finish in 600s"

    # trigger 1: two partitions make progress
    spark.createDataFrame([
        rec(0, 10, "insert", "r1", "a.py", "v1"),
        rec(0, 11, "update", "r1", "a.py", "v2"),
        rec(1, 5, "insert", "r2", "b.py", "w1"),
    ], wire_schema).coalesce(1).write.mode("append").parquet(wire_dir)
    run_stream()
    state = {(r["repo"], r["path"]): r["content"] for r in table.read().collect()}
    assert state == {("r1", "a.py"): "v2", ("r2", "b.py"): "w1"}

    # trigger 2 after a RESTART from the checkpoint: replays of already-
    # applied offsets (broker at-least-once) must be guard-rejected while
    # genuinely new offsets apply.
    spark.createDataFrame([
        rec(0, 11, "update", "r1", "a.py", "STALE-REPLAY"),   # duplicate delivery
        rec(0, 12, "delete", "r1", "a.py", None),
        rec(1, 4, "update", "r2", "b.py", "STALE-OLD"),       # below partition 1 floor
        rec(1, 6, "update", "r2", "b.py", "w2"),
    ], wire_schema).coalesce(1).write.mode("append").parquet(wire_dir)
    _time.sleep(0.1)
    run_stream()
    state = {(r["repo"], r["path"]): r["content"] for r in table.read().collect()}
    assert state == {("r2", "b.py"): "w2"}, (
        "a.py deleted at (0,12); b.py advanced to (1,6); stale replays rejected"
    )
