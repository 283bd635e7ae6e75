"""Sessionization: event-time session windows, batch and streaming.

The reference has no event-time windowing (SURVEY.md §2.2 — its batching
is wall-clock). A training-data/event pipeline needs sessions, so both
execution strategies are provided:

* ``sessionize`` — batch gaps-and-islands: lag + cumulative-sum of
  gap-breaks, pure window functions (ANSI-expressible, oracle-checkable);
* ``sessionize_stream`` — Structured Streaming custom stateful operator
  via ``applyInPandasWithState`` with processing-time timeouts (the
  GroupState API; sessions emit when the gap timeout fires).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SESSION_SCHEMA = (
    "user_id long, session_id long, session_start timestamp, session_end timestamp, "
    "n_events long, total_value double"
)


def sessionize(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: float = 30.0,
    value_col: str | None = "value",
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Batch session windows: a session breaks after ``gap_minutes`` idle.

    Two shuffles (both partitioned by key): the lag/cum-sum window and the
    final per-session aggregate. At scale both reuse the same hash
    partitioning on the key, so the second exchange is elided by Catalyst.
    """
    order = [F.col(ts_col)] + [F.col(c) for c in (tiebreak_cols or [])]
    w = Window.partitionBy(key_col).orderBy(*order)
    # NTZ-safe epoch seconds (session TZ is UTC; plain cast-to-double is
    # rejected for TIMESTAMP_NTZ under ANSI)
    epoch = F.unix_micros(F.col(ts_col).cast("timestamp")).cast("double") / F.lit(1e6)
    gap = epoch - F.lag(epoch).over(w)
    is_break = F.when(gap.isNull() | (gap > gap_minutes * 60.0), 1).otherwise(0)
    sessions = df.withColumn("_brk", is_break).withColumn(
        "session_id", F.sum("_brk").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    aggs = [
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count("*").alias("n_events"),
    ]
    if value_col:
        # Sum in DECIMAL, not double: double summation order is partition-
        # dependent in Spark, so round(sum(double), 2) can flip at half-cent
        # boundaries between runs/engines. Decimal addition is exact and
        # associative — the sha256 state-equality standard requires it for
        # every money-like aggregate.
        aggs.append(
            F.round(F.sum(F.col(value_col).cast("decimal(30,10)")), 2).cast("double").alias("total_value")
        )
    return sessions.groupBy(key_col, "session_id").agg(*aggs)


def windowed_stream_agg(
    events: DataFrame,
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "2 hours",
    ts_col: str = "ts",
    value_col: str = "value",
    keys: tuple[str, ...] = ("event_type",),
) -> DataFrame:
    """Event-time windowed aggregation with a late-data watermark.

    The streaming twin of the batch ``windowed_event_agg`` contract query:
    tumbling (or sliding) event-time windows, append-mode-safe because the
    watermark bounds state — windows older than ``watermark`` behind the
    max seen event time finalize and emit; events later than that drop
    (the documented late-data policy, not silent wrong answers).
    """
    win = F.window(F.col(ts_col), window, slide) if slide else F.window(F.col(ts_col), window)
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(win.alias("win"), *[F.col(k) for k in keys])
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(F.col(value_col).cast("decimal(30,10)")), 2).cast("double").alias("total_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            *keys,
            "n",
            "total_value",
        )
    )


def streaming_dedup(
    events: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """At-least-once -> effectively-once event feed: state-bounded streaming
    dedup. Duplicates arriving within ``watermark`` of the original are
    dropped; state for older keys is GC'd (the streaming analog of the
    MERGE offset guard, for pipelines that want a clean feed BEFORE the
    sink)."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(key_cols)


def sessionize_stream(
    events: DataFrame,
    gap_minutes: float = 30.0,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    state_timeout_ms: int = 2000,
):
    """Streaming sessionization: custom stateful operator.

    GroupState holds the open session per key ``(start, end, n, total)``;
    a batch's events fold into it; the session emits when the
    processing-time timeout fires with no new events (the streaming analog
    of the batch gap rule). Output mode: update/append via foreachBatch.
    """
    import datetime as dt

    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_sec = gap_minutes * 60.0
    state_schema = "start double, end double, n long, total double, sid long"
    out_schema = SESSION_SCHEMA

    def fold(key, pdf_iter, state: GroupState):
        (user_id,) = key
        rows = []
        if state.hasTimedOut:
            if state.exists:
                start, end, n, total, sid = state.get
                rows.append((user_id, sid, dt.datetime.utcfromtimestamp(start),
                             dt.datetime.utcfromtimestamp(end), n, round(total, 2)))
                state.remove()
        else:
            start = end = None
            n, total, sid = 0, 0.0, 0
            if state.exists:
                start, end, n, total, sid = state.get
            # applyInPandasWithState gives no intra-batch ordering guarantee:
            # concatenate the group's chunks and sort by event time before
            # folding, or out-of-order arrivals split sessions falsely.
            batch = pd.concat(list(pdf_iter), ignore_index=True)
            if len(batch):
                batch = batch.sort_values(ts_col, kind="mergesort", ignore_index=True)
                ts = batch[ts_col].astype("int64") / 1e9
                for t, v in zip(ts.tolist(), batch[value_col].tolist()):
                    if start is None:
                        start = end = t
                    elif t - end > gap_sec:
                        rows.append((user_id, sid, dt.datetime.utcfromtimestamp(start),
                                     dt.datetime.utcfromtimestamp(end), n, round(total, 2)))
                        sid += 1
                        start = end = t
                        n, total = 0, 0.0
                    end = max(end, t)
                    n += 1
                    total += float(v)
            if start is not None:
                state.update((start, end, n, total, sid))
                state.setTimeoutDuration(state_timeout_ms)
        yield pd.DataFrame(
            rows,
            columns=["user_id", "session_id", "session_start", "session_end", "n_events", "total_value"],
        )

    return (
        events.groupBy(key_col)
        .applyInPandasWithState(
            fold,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
