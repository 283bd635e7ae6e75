"""Sessionization: batch gaps-and-islands + streaming applyInPandasWithState."""

from __future__ import annotations

import datetime as dt
import time

from pyspark.sql import functions as F

from binlog_es_go_spark.operators.sessions import sessionize, sessionize_stream


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
