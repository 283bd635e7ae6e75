"""Phase-1 gate: replay convergence of the offset-guarded MERGE core.

Four delivery schedules of the same changelog must converge to the
sequential oracle's final state (SURVEY.md §5 test strategy #2):
  (a) one big batch, (b) K micro-batches, (c) duplicated delivery
  (at-least-once), (d) re-applied batches (idempotence).
Comparison: per-row sha256(content) + order-insensitive table digest.
"""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest

from binlog_es_go_spark.cdc.apply import apply_batch, applied_offsets, filter_unapplied
from binlog_es_go_spark.cdc.events import CHANGELOG_SCHEMA, generate_changelog
from binlog_es_go_spark.cdc.oracle import apply_sequential, content_sha256, table_digest
from binlog_es_go_spark.lake.table import LakeTable
from pyspark.sql import functions as F
from pyspark.sql import types as T

N_EVENTS = 4000
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


@pytest.fixture(scope="module")
def changelog(spark):
    df = generate_changelog(spark, N_EVENTS, n_repos=40, paths_per_repo=20, seed=42)
    df.cache().count()
    return df


@pytest.fixture(scope="module")
def oracle_state(changelog) -> pd.DataFrame:
    return apply_sequential(changelog.toPandas())


def fresh_table(spark, tmp_path, name="t") -> LakeTable:
    return LakeTable.create(
        spark, str(tmp_path / name), PAYLOAD, key_cols=["repo", "path"], n_buckets=16
    )


def assert_matches_oracle(table: LakeTable, oracle_state: pd.DataFrame):
    got = (
        table.read()
        .select("repo", "path", "commit", "lang", "content", "last_offset")
        .toPandas()
        .sort_values(["repo", "path"])
        .reset_index(drop=True)
    )
    exp = oracle_state[["repo", "path", "commit", "lang", "content", "last_offset"]].reset_index(drop=True)
    assert len(got) == len(exp), f"row count {len(got)} != oracle {len(exp)}"
    pd.testing.assert_series_equal(
        content_sha256(got), content_sha256(exp), check_names=False
    )
    assert table_digest(got) == table_digest(exp)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_single_batch(spark, tmp_path, changelog, oracle_state):
    t = fresh_table(spark, tmp_path)
    apply_batch(t, changelog, batch_id=0)
    assert_matches_oracle(t, oracle_state)


def test_micro_batches(spark, tmp_path, changelog, oracle_state):
    t = fresh_table(spark, tmp_path)
    k = 5
    for i in range(k):
        batch = changelog.filter(
            (F.col("offset") >= i * N_EVENTS // k) & (F.col("offset") < (i + 1) * N_EVENTS // k)
        )
        apply_batch(t, batch, batch_id=i)
    assert_matches_oracle(t, oracle_state)
    # per-partition offsets recorded
    offs = applied_offsets(t)
    assert len(offs) == 8 and max(offs.values()) == N_EVENTS - 1


def test_duplicated_delivery(spark, tmp_path, oracle_state, changelog):
    dup = generate_changelog(
        spark, N_EVENTS, n_repos=40, paths_per_repo=20, seed=42, duplicate_ratio=0.3
    )
    t = fresh_table(spark, tmp_path)
    for i in range(3):
        batch = dup.filter(
            (F.col("offset") >= i * N_EVENTS // 3) & (F.col("offset") < (i + 1) * N_EVENTS // 3 + (N_EVENTS % 3 if i == 2 else 0))
        )
        apply_batch(t, batch, batch_id=i)
    assert_matches_oracle(t, oracle_state)


def test_reapply_idempotent(spark, tmp_path, changelog, oracle_state):
    """foreachBatch crash-rerun: applying the same batch twice is a no-op."""
    t = fresh_table(spark, tmp_path)
    half = changelog.filter(F.col("offset") < N_EVENTS // 2)
    rest = changelog.filter(F.col("offset") >= N_EVENTS // 2)
    apply_batch(t, half, batch_id=0)
    digest_mid = table_digest(t.read().select("repo", "path", "content").toPandas())
    apply_batch(t, half, batch_id=0)  # re-run of the same batch
    assert table_digest(t.read().select("repo", "path", "content").toPandas()) == digest_mid
    apply_batch(t, rest, batch_id=1)
    assert_matches_oracle(t, oracle_state)


def test_filter_unapplied_prefix(spark, tmp_path, changelog, oracle_state):
    """Restart path: coarse offset filter drops the applied prefix."""
    t = fresh_table(spark, tmp_path)
    half = changelog.filter(F.col("offset") < N_EVENTS // 2)
    apply_batch(t, half, batch_id=0)
    remaining = filter_unapplied(changelog, applied_offsets(t))
    assert remaining.count() == changelog.count() - half.count()
    apply_batch(t, remaining, batch_id=1)
    assert_matches_oracle(t, oracle_state)


def test_delete_then_stale_insert_stays_dead(spark, tmp_path):
    """Tombstone guard: a lower-offset insert replayed after a delete must not resurrect."""
    t = fresh_table(spark, tmp_path)
    rows = [
        (10, 0, 0, "insert", "o/r", "a.txt", None, ("c1", "py", "hello v1"), TS),
        (20, 0, 0, "delete", "o/r", "a.txt", None, None, TS),
    ]
    df = spark.createDataFrame(rows, CHANGELOG_SCHEMA)
    apply_batch(t, df, batch_id=0)
    assert t.read().count() == 0
    stale = spark.createDataFrame(
        [(10, 0, 0, "insert", "o/r", "a.txt", None, ("c1", "py", "hello v1"), TS)],
        CHANGELOG_SCHEMA,
    )
    apply_batch(t, stale, batch_id=1)
    assert t.read().count() == 0, "stale insert resurrected a deleted key"
    fresh = spark.createDataFrame(
        [(30, 0, 0, "insert", "o/r", "a.txt", None, ("c2", "py", "hello v2"), TS)],
        CHANGELOG_SCHEMA,
    )
    apply_batch(t, fresh, batch_id=2)
    got = t.read().select("content").collect()
    assert [r["content"] for r in got] == ["hello v2"]


def test_transaction_split_across_batches(spark, tmp_path):
    """A same-offset, higher-seq event in a LATER micro-batch must win:
    the (offset, seq) guard is lexicographic and seq is persisted, matching
    the sequential oracle's strictly-greater-tuple rule."""
    t = fresh_table(spark, tmp_path)
    first = spark.createDataFrame(
        [(10, 0, 1, "update", "o/r", "a.txt", None, ("c1", "py", "v seq1"), TS)],
        CHANGELOG_SCHEMA,
    )
    apply_batch(t, first, batch_id=0)
    # same transaction (offset 10), later statement, delivered next batch
    second = spark.createDataFrame(
        [(10, 0, 3, "update", "o/r", "a.txt", None, ("c1", "py", "v seq3"), TS)],
        CHANGELOG_SCHEMA,
    )
    apply_batch(t, second, batch_id=1)
    row = t.read().select("content", "last_offset", "last_seq").collect()[0]
    assert row["content"] == "v seq3" and row["last_seq"] == 3
    # but an equal (offset, seq) re-delivery is still a no-op (target wins ties)
    stale = spark.createDataFrame(
        [(10, 0, 3, "update", "o/r", "a.txt", None, ("c1", "py", "SHOULD NOT APPLY"), TS)],
        CHANGELOG_SCHEMA,
    )
    apply_batch(t, stale, batch_id=2)
    assert t.read().select("content").collect()[0]["content"] == "v seq3"
    # and a lower-seq same-offset straggler cannot regress state
    lower = spark.createDataFrame(
        [(10, 0, 2, "update", "o/r", "a.txt", None, ("c1", "py", "old seq2"), TS)],
        CHANGELOG_SCHEMA,
    )
    apply_batch(t, lower, batch_id=3)
    assert t.read().select("content").collect()[0]["content"] == "v seq3"


def test_replay_changelog_matches_per_batch_apply(spark, tmp_path, changelog, oracle_state):
    """Bulk replay (one metadata pass for all commits) must produce the
    IDENTICAL final state, manifest offsets, and commit count as the
    batch-at-a-time path."""
    from binlog_es_go_spark.cdc.apply import replay_changelog
    from binlog_es_go_spark.cdc.oracle import table_digest

    a = LakeTable.create(spark, str(tmp_path / "a"), PAYLOAD, key_cols=["repo", "path"], n_buckets=8)
    apply_batch(a, changelog.filter(F.col("offset") < 700), batch_id=0)
    apply_batch(a, changelog.filter((F.col("offset") >= 700) & (F.col("offset") < 1400)), batch_id=1)
    apply_batch(a, changelog.filter(F.col("offset") >= 1400), batch_id=2)

    b = LakeTable.create(spark, str(tmp_path / "b"), PAYLOAD, key_cols=["repo", "path"], n_buckets=8)
    results = replay_changelog(b, changelog, boundaries=[700, 1400])

    assert len(results) == 3 and b.current_version() == a.current_version()
    da = table_digest(a.read().select("repo", "path", "content").toPandas())
    db = table_digest(b.read().select("repo", "path", "content").toPandas())
    assert da == db
    assert applied_offsets(a) == applied_offsets(b)
    # re-running the bulk replay is a no-op (same guard as apply_batch)
    replay_changelog(b, changelog, boundaries=[700, 1400])
    assert table_digest(b.read().select("repo", "path", "content").toPandas()) == da


def test_replay_changelog_many_boundaries_bounded(spark, tmp_path, changelog):
    """K=1,000 boundaries must not degenerate: the batch id is one shallow
    array expression (size(filter(lit_array))), not a K-deep comparison
    chain whose analysis cost blows up around K~10^4. Most ranges here are
    empty (no commit), so the test isolates the metadata/expression cost."""
    import time

    from binlog_es_go_spark.cdc.apply import replay_changelog

    t = LakeTable.create(spark, str(tmp_path / "kb"), PAYLOAD, key_cols=["repo", "path"], n_buckets=8)
    # 2 real cut points + 998 boundaries above every offset (empty ranges)
    boundaries = [700, 1400] + list(range(100_000, 100_000 + 998))
    t0 = time.time()
    results = replay_changelog(t, changelog, boundaries=boundaries)
    wall = time.time() - t0
    assert len(results) == 3, "empty ranges commit nothing"
    assert wall < 120, f"1,000-boundary replay took {wall:.0f}s — expression degenerated"

    ref = LakeTable.create(spark, str(tmp_path / "kb_ref"), PAYLOAD, key_cols=["repo", "path"], n_buckets=8)
    apply_batch(ref, changelog, batch_id=0)
    da = table_digest(t.read().select("repo", "path", "content").toPandas())
    db = table_digest(ref.read().select("repo", "path", "content").toPandas())
    assert da == db and applied_offsets(t) == applied_offsets(ref)
