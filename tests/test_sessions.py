"""Sessionization (batch + stateful streaming), watermarked windowed
aggregation, and within-watermark streaming dedup."""

from __future__ import annotations

import datetime as dt
import time

from pyspark.sql import functions as F

from binlog_es_go_spark.operators.sessions import (
    sessionize,
    sessionize_stream,
    streaming_dedup,
    windowed_stream_agg,
)


def _events(spark):
    base = dt.datetime(2026, 1, 1)
    rows = [
        # user 1: two sessions (gap 45 min between event 2 and 3)
        (1, base, 1.0),
        (1, base + dt.timedelta(minutes=10), 2.0),
        (1, base + dt.timedelta(minutes=55), 4.0),
        (1, base + dt.timedelta(minutes=60), 8.0),
        # user 2: one session
        (2, base + dt.timedelta(minutes=5), 1.5),
        (2, base + dt.timedelta(minutes=20), 2.5),
    ]
    return spark.createDataFrame(rows, "user_id long, ts timestamp, value double")


def test_sessionize_batch(spark):
    got = {
        (r["user_id"], r["session_id"]): (r["n_events"], r["total_value"])
        for r in sessionize(_events(spark), gap_minutes=30).collect()
    }
    assert got == {(1, 1): (2, 3.0), (1, 2): (2, 12.0), (2, 1): (2, 4.0)}


def test_sessionize_batch_on_events_table(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    s = sessionize(ev, gap_minutes=30)
    # sessions partition the events exactly
    assert s.agg(F.sum("n_events")).first()[0] == ev.count()
    assert s.filter("session_end < session_start").count() == 0


class _FileAger:
    """Backdate files as they are written so FileStreamSource (which orders
    batches by modification time) processes them in write order."""

    def __init__(self, d: str):
        self.d = d
        self.seen: set[str] = set()

    def stamp(self, age_sec: float) -> None:
        import os
        import time as _t

        t = _t.time() - age_sec
        for root, _, files in os.walk(self.d):
            for fn in files:
                p = os.path.join(root, fn)
                if p not in self.seen:
                    os.utime(p, (t, t))
                    self.seen.add(p)


def test_windowed_stream_agg_matches_batch_and_drops_late(spark, tmp_path):
    """Event-time windows + watermark: on-time results equal the batch
    aggregation; an event arriving behind the watermark is DROPPED (the
    documented late policy), not silently mis-aggregated.

    Batch choreography (Spark evicts finalized windows at the END of the
    batch in which the watermark passed them): batch 0 advances the
    watermark to 08:00, batch 1 triggers the eviction of the hour-0
    windows, batch 2 delivers the late event — which must bounce off the
    watermark, not re-open or corrupt the finalized windows."""
    base = dt.datetime(2026, 1, 1)
    schema = "event_type string, ts timestamp, value double"
    events_dir = str(tmp_path / "ev")
    ager = _FileAger(events_dir)

    on_time = [
        ("click", base + dt.timedelta(minutes=10), 1.0),
        ("click", base + dt.timedelta(minutes=40), 2.0),
        ("view", base + dt.timedelta(minutes=20), 4.0),
        # far-future event: advances the watermark to 08:00
        ("click", base + dt.timedelta(hours=10), 8.0),
    ]
    mid = [("other", base + dt.timedelta(hours=10, minutes=1), 0.5)]
    late = [("click", base + dt.timedelta(minutes=50), 100.0)]  # hours behind watermark
    spark.createDataFrame(on_time, schema).coalesce(1).write.mode("append").parquet(events_dir)
    ager.stamp(400)
    spark.createDataFrame(mid, schema).coalesce(1).write.mode("append").parquet(events_dir)
    ager.stamp(200)
    spark.createDataFrame(late, schema).coalesce(1).write.mode("append").parquet(events_dir)
    ager.stamp(5)

    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(events_dir)
    agg = windowed_stream_agg(stream, window="1 hour", watermark="2 hours")
    q = (
        agg.writeStream.format("memory").queryName("win_out").outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck")).trigger(availableNow=True).start()
    )
    assert q.awaitTermination(180)
    got = {
        (r["window_start"], r["event_type"]): (r["n"], r["total_value"])
        for r in spark.sql("select * from win_out").collect()
    }
    # hour-0 windows finalized WITHOUT the late 100.0 event
    assert got[(base, "click")] == (2, 3.0)
    assert got[(base, "view")] == (1, 4.0)
    # the far-future windows are still open (not past watermark) -> not emitted
    assert (base + dt.timedelta(hours=10), "click") not in got


def test_streaming_dedup_within_watermark(spark, tmp_path):
    """Duplicate event_ids re-delivered in a later micro-batch are dropped."""
    base = dt.datetime(2026, 1, 1)
    schema = "event_id long, ts timestamp, value double"
    b1 = [(1, base, 1.0), (2, base + dt.timedelta(minutes=1), 2.0)]
    b2 = [(2, base + dt.timedelta(minutes=1), 2.0),  # duplicate delivery
          (3, base + dt.timedelta(minutes=2), 3.0)]
    events_dir = str(tmp_path / "ev")
    ager = _FileAger(events_dir)
    spark.createDataFrame(b1, schema).coalesce(1).write.mode("append").parquet(events_dir)
    ager.stamp(300)
    spark.createDataFrame(b2, schema).coalesce(1).write.mode("append").parquet(events_dir)
    ager.stamp(5)

    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(events_dir)
    clean = streaming_dedup(stream, ["event_id"], watermark="1 hour")
    q = (
        clean.writeStream.format("memory").queryName("dedup_out").outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck")).trigger(availableNow=True).start()
    )
    assert q.awaitTermination(180)
    rows = spark.sql("select event_id from dedup_out").collect()
    ids = sorted(r["event_id"] for r in rows)
    assert ids == [1, 2, 3], f"duplicate survived or event lost: {ids}"


def test_sessionize_stream_stateful(spark, tmp_path):
    """applyInPandasWithState: sessions emit on processing-time timeout."""
    events_dir = str(tmp_path / "ev")
    ckpt = str(tmp_path / "ck")
    _events(spark).coalesce(1).write.parquet(events_dir)

    stream = spark.readStream.schema("user_id long, ts timestamp, value double").parquet(events_dir)
    sessions = sessionize_stream(stream, gap_minutes=30, state_timeout_ms=1500)
    q = (
        sessions.writeStream.format("memory")
        .queryName("sessions_out")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    try:
        # batch 1 folds events into state; timeout fires on a later empty
        # batch and flushes the open sessions
        deadline = time.time() + 120
        want = {(1, 0), (1, 1), (2, 0)}
        got = {}
        while time.time() < deadline:
            rows = spark.sql("select * from sessions_out").collect()
            got = {(r["user_id"], r["session_id"]): (r["n_events"], r["total_value"]) for r in rows}
            if set(got) >= want:
                break
            time.sleep(1)
        assert set(got) >= want, f"incomplete sessions: {got}"
        assert got[(1, 0)] == (2, 3.0) and got[(1, 1)] == (2, 12.0) and got[(2, 0)] == (2, 4.0)
    finally:
        q.stop()
