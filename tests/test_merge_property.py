"""Property-based convergence: ANY schedule converges to the oracle.

The (offset, seq)-tuple guard + within-batch LWW + tombstones make the
final visible state a pure function of the event SET: for every key, the
max-(offset, seq) event wins (absent if it is a delete) — regardless of
how events are partitioned into micro-batches, the order batches are
applied in, or duplicate delivery. Hypothesis searches schedules for a
counterexample; the deterministic suite (test_merge_core) pins the named
corner cases.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from binlog_es_go_spark.cdc.apply import apply_batch
from binlog_es_go_spark.cdc.events import CHANGELOG_SCHEMA
from binlog_es_go_spark.lake.table import LakeTable

TS = dt.datetime(2026, 1, 1)
KEYS = ["a", "b", "c", "d", "e"]

PAYLOAD = T.StructType(
    [T.StructField(n, T.StringType()) for n in ["repo", "path", "commit", "lang", "content"]]
)

event_st = st.tuples(
    st.sampled_from(KEYS),          # path (repo fixed)
    st.integers(min_value=0, max_value=15),   # offset
    st.integers(min_value=0, max_value=3),    # seq_in_tx
    st.sampled_from(["insert", "update", "delete"]),
)

schedule_st = st.tuples(
    # unique (key, offset, seq): a binlog position identifies ONE physical
    # event, so two different events can never share a position — without
    # this constraint hypothesis finds e.g. insert+delete at the same
    # (offset, seq), whose outcome legitimately depends on delivery order
    # (the guard rejects the second arrival) and which no binlog can emit.
    # Duplicate DELIVERY of identical bytes is covered by the re-applied
    # slice in the test body.
    st.lists(event_st, min_size=1, max_size=24, unique_by=lambda e: (e[0], e[1], e[2])),
    st.integers(min_value=1, max_value=3),    # number of batches
    st.randoms(use_true_random=False),        # seeded shuffler for batch order
)


def _row(key: str, offset: int, seq: int, op: str):
    # content is a pure function of (key, offset, seq): duplicate events
    # are byte-identical, so ties cannot smuggle in ambiguity
    after = None if op == "delete" else (f"c{offset}", "py", f"content-{key}-{offset}-{seq}")
    return (offset, offset % 2, seq, op, "org/r", f"{key}.txt", None, after, TS)


def _expected(events: list[tuple]) -> dict[str, str]:
    """Pure-python spec: per key, max (offset, seq) wins; delete = absent."""
    best: dict[str, tuple] = {}
    for key, offset, seq, op in events:
        pos = (offset, seq)
        if key not in best or pos > best[key][0]:
            best[key] = (pos, op)
    return {
        k: f"content-{k}-{pos[0]}-{pos[1]}"
        for k, (pos, op) in best.items()
        if op != "delete"
    }


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(schedule_st)
def test_any_schedule_converges(spark_session_holder, sched):
    events, n_batches, rng = sched
    spark, tmp_root, counter = spark_session_holder
    counter[0] += 1
    table = LakeTable.create(
        spark, f"{tmp_root}/t{counter[0]}", PAYLOAD, key_cols=["repo", "path"], n_buckets=4
    )

    # partition the event list into n_batches contiguous slices, then apply
    # them in a hypothesis-chosen (seeded, shrinkable) order
    bounds = sorted(rng.randrange(0, len(events) + 1) for _ in range(n_batches - 1))
    slices = []
    prev = 0
    for b in [*bounds, len(events)]:
        slices.append(events[prev:b])
        prev = b
    rng.shuffle(slices)

    for i, sl in enumerate(slices):
        if not sl:
            continue
        rows = [_row(*e) for e in sl]
        apply_batch(table, spark.createDataFrame(rows, CHANGELOG_SCHEMA), batch_id=i)

    # at-least-once delivery: re-apply one already-applied slice verbatim —
    # the guard must make the re-delivery a no-op
    redeliver = [sl for sl in slices if sl]
    if redeliver:
        sl = redeliver[rng.randrange(len(redeliver))]
        apply_batch(
            table,
            spark.createDataFrame([_row(*e) for e in sl], CHANGELOG_SCHEMA),
            batch_id=len(slices),
        )

    got = {
        r["path"].removesuffix(".txt"): r["content"]
        for r in table.read().select("path", "content").collect()
    }
    assert got == _expected(events)


# session-scoped holder so hypothesis examples reuse one SparkSession
import pytest  # noqa: E402


@pytest.fixture(scope="module")
def spark_session_holder(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("prop_lake")
    yield spark, str(root), [0]
