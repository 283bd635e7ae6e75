"""Schema evolution (ALTER analog) + crash-restart convergence fixtures.

SURVEY.md §5 #3: new column mid-replay => schema merged, old rows
null-padded; §5 #2(c): kill/restart from checkpoint converges.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from binlog_es_go_spark.cdc.apply import apply_batch, applied_offsets, filter_unapplied
from binlog_es_go_spark.cdc.events import generate_changelog
from binlog_es_go_spark.cdc.oracle import apply_sequential, table_digest
from binlog_es_go_spark.lake.table import LakeTable

PAYLOAD = T.StructType([T.StructField(n, T.StringType()) for n in ["repo", "path", "commit", "lang", "content"]])
N = 2000
CUT = 1000


def test_alter_mid_replay_null_pads_and_merges(spark, tmp_path):
    log = generate_changelog(
        spark, N, n_repos=20, paths_per_repo=10, seed=21, evolve_after_offset=CUT, delete_ratio=0.05
    )
    t = LakeTable.create(spark, str(tmp_path / "t"), PAYLOAD, key_cols=["repo", "path"], n_buckets=8)
    # batch 1: pre-ALTER events only (size_bytes column all null -> still absent semantics)
    apply_batch(t, log.filter(F.col("offset") <= CUT), batch_id=0)
    # batch 2: post-ALTER events carry size_bytes
    apply_batch(t, log.filter(F.col("offset") > CUT), batch_id=1)

    snap = t.snapshot()
    names = [f.name for f in snap.schema.fields]
    assert "size_bytes" in names, "ALTER-added column must merge into table schema"
    df = t.read()
    # rows last touched after the cut have size_bytes; before-cut rows are null-padded
    assert df.filter((F.col("last_offset") > CUT) & F.col("size_bytes").isNull()).count() == 0
    assert df.filter((F.col("last_offset") <= CUT) & F.col("size_bytes").isNotNull()).count() == 0
    assert df.filter(F.col("size_bytes").isNotNull()).count() > 0

    # state still converges to the oracle on the shared columns
    oracle = apply_sequential(log.toPandas())
    got = df.select("repo", "path", "content").toPandas()
    assert table_digest(got) == table_digest(oracle[["repo", "path", "content"]])

    # size_bytes values are the content length (generator invariant)
    bad = df.filter(F.col("size_bytes").isNotNull() & (F.col("size_bytes") != F.length("content"))).count()
    assert bad == 0


def test_old_reader_path_still_works_after_evolution(spark, tmp_path):
    """Files written under the old schema remain readable after the merge
    widens the table (mixed-schema scan + time travel)."""
    old_log = generate_changelog(spark, CUT, n_repos=20, paths_per_repo=10, seed=22)  # 3-field after
    new_log = generate_changelog(
        spark, N, n_repos=20, paths_per_repo=10, seed=22, evolve_after_offset=0
    ).filter(F.col("offset") >= CUT)  # 4-field after, strictly newer offsets
    t = LakeTable.create(spark, str(tmp_path / "t"), PAYLOAD, key_cols=["repo", "path"], n_buckets=8)
    apply_batch(t, old_log, batch_id=0)
    v_old = t.current_version()
    assert "size_bytes" not in [f.name for f in t.snapshot().schema.fields]
    apply_batch(t, new_log, batch_id=1)
    # time-travel to the pre-ALTER snapshot: no size_bytes column there
    old = t.read(version=v_old)
    assert "size_bytes" not in old.columns
    assert old.count() > 0
    # current snapshot mixes old files (null-padded) and new files
    cur = t.read()
    assert "size_bytes" in cur.columns
    assert cur.filter(F.col("size_bytes").isNull()).count() > 0
    assert cur.filter(F.col("size_bytes").isNotNull()).count() > 0


def test_crash_restart_mid_replay_converges(spark, tmp_path):
    """Kill/restart: batch 1 applied, crash 'loses' the driver, restart
    re-derives the remaining work from recorded offsets, re-applies batch 1
    (at-least-once) plus the rest — state converges to the oracle."""
    log = generate_changelog(spark, N, n_repos=15, paths_per_repo=10, seed=23)
    log.cache().count()
    t = LakeTable.create(spark, str(tmp_path / "t"), PAYLOAD, key_cols=["repo", "path"], n_buckets=8)
    apply_batch(t, log.filter(F.col("offset") < 700), batch_id=0)

    # --- crash. restart: reload table from disk (fresh handle), resume.
    t2 = LakeTable.load(spark, str(tmp_path / "t"))
    offs = applied_offsets(t2)
    assert offs, "offsets must be recoverable from the manifest"
    remaining = filter_unapplied(log, offs)
    # at-least-once: overlap the boundary deliberately (replay last 100)
    overlap = log.filter((F.col("offset") >= 600) & (F.col("offset") < 700))
    apply_batch(t2, remaining.unionByName(overlap), batch_id=1)

    oracle = apply_sequential(log.toPandas())
    got = t2.read().select("repo", "path", "content").toPandas()
    assert len(got) == len(oracle)
    assert table_digest(got) == table_digest(oracle[["repo", "path", "content"]])


def test_out_of_order_across_keys_per_partition_order(spark, tmp_path):
    """Events arrive partition-ordered but globally interleaved: applying
    per-partition slices in arbitrary order converges (LWW by offset)."""
    log = generate_changelog(spark, 1600, n_repos=10, paths_per_repo=8, seed=24, n_partitions=4)
    log.cache().count()
    t = LakeTable.create(spark, str(tmp_path / "t"), PAYLOAD, key_cols=["repo", "path"], n_buckets=8)
    for pid in (2, 0, 3, 1):  # partitions applied out of order
        apply_batch(t, log.filter(F.col("partition_id") == pid), batch_id=pid)
    oracle = apply_sequential(log.toPandas())
    got = t.read().select("repo", "path", "content").toPandas()
    assert table_digest(got) == table_digest(oracle[["repo", "path", "content"]])
    assert len(applied_offsets(t)) == 4


def test_alter_modify_widens_numeric_types(spark, tmp_path):
    """ALTER TABLE MODIFY int -> bigint (and float -> double) mid-stream:
    the manifest schema widens, pre-widening files read back promoted (no
    rewrite — the vectorized parquet reader upcasts at scan time), values
    past the narrow type's range land exactly, and a later batch that
    regresses to the narrow type is cast UP on write, never narrowing."""
    payload = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("size", T.IntegerType()),
        T.StructField("score", T.FloatType()),
    ])
    t = LakeTable.create(spark, str(tmp_path / "w"), payload, key_cols=["id"], n_buckets=4)

    def batch(rows, size_t, score_t):
        return spark.createDataFrame(
            rows,
            f"offset long, partition_id int, seq_in_tx int, op string, id long, "
            f"after struct<size:{size_t},score:{score_t}>, ts timestamp",
        )

    apply_batch(t, batch([(k, 0, 0, "insert", k, (k * 10, float(k) / 2), None)
                          for k in range(20)], "int", "float"), batch_id=0)
    # upstream ALTER MODIFY: size -> bigint, score -> double; one value
    # overflows int32 and one needs double precision
    big, precise = 1 << 40, 1.0000000116861
    apply_batch(t, batch([(100, 0, 0, "update", 3, (big, precise), None)],
                         "bigint", "double"), batch_id=1)

    snap = t.snapshot()
    types = {f.name: f.dataType.simpleString() for f in snap.schema.fields}
    assert types["size"] == "bigint" and types["score"] == "double"
    rows = {r["id"]: (r["size"], r["score"]) for r in t.read().collect()}
    assert rows[3] == (big, precise), "post-ALTER values exact at full width"
    assert rows[7] == (70, 3.5), "pre-ALTER files read back type-promoted"

    # a narrow straggler batch (old producer) casts UP, never narrows back
    apply_batch(t, batch([(200, 0, 0, "update", 5, (555, 5.5), None)],
                         "int", "float"), batch_id=2)
    snap2 = t.snapshot()
    assert {f.name: f.dataType.simpleString() for f in snap2.schema.fields}["size"] == "bigint"
    assert {r["id"]: r["size"] for r in t.read().collect()}[5] == 555


def test_widening_through_delta_append(spark, tmp_path):
    """The merge-on-read delta path widens too: a bigint batch delta-
    appended onto an int base widens the manifest schema; reads promote
    the narrow base files at scan time and resolve the delta rows under
    the wide type; the fold keeps the widened values exact."""
    from binlog_es_go_spark.lake.maintenance import compact_deltas

    payload = T.StructType([T.StructField("id", T.LongType()), T.StructField("size", T.IntegerType())])
    t = LakeTable.create(spark, str(tmp_path / "dw"), payload, key_cols=["id"], n_buckets=4)

    def batch(rows, size_t):
        return spark.createDataFrame(
            rows,
            f"offset long, partition_id int, seq_in_tx int, op string, id long, "
            f"after struct<size:{size_t}>, ts timestamp",
        )

    apply_batch(t, batch([(k, 0, 0, "insert", k, (k,), None) for k in range(10)], "int"),
                batch_id=0)
    big = 1 << 40
    apply_batch(t, batch([(100, 0, 0, "update", 3, (big,), None)], "bigint"),
                batch_id=1, write_mode="delta")
    assert t.snapshot().deltas
    assert t.snapshot().schema["size"].dataType.simpleString() == "bigint"
    rows = {r["id"]: r["size"] for r in t.read().collect()}
    assert rows[3] == big and rows[7] == 7

    compact_deltas(t)
    assert not t.snapshot().deltas
    rows2 = {r["id"]: r["size"] for r in t.read().collect()}
    assert rows2 == rows
