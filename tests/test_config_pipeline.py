"""Config-driven pipeline: relatedQuery reverse lookup + deleteOnMissing
wired end-to-end into the tail (pkg/realtime/loop.go:325-451 +
pkg/realtime/flush.go:119-140 semantics), plus the YAML loader and the
CDC-mode relevance filter."""

from __future__ import annotations

import textwrap

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from binlog_es_go_spark.cdc.pipeline import process_config_batch, start_config_tail
from binlog_es_go_spark.config import (
    EnrichmentJoin,
    RelatedQueryConfig,
    SyncTaskConfig,
    load_config,
)
from binlog_es_go_spark.lake.table import LakeTable

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("offset", T.LongType(), False),
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("seq_in_tx", T.IntegerType(), False),
        T.StructField("op", T.StringType(), False),
        T.StructField("table", T.StringType(), False),
        T.StructField("custkey", T.LongType(), False),
        T.StructField("nationkey", T.LongType(), True),
        T.StructField(
            "after",
            T.StructType([T.StructField("name", T.StringType()), T.StructField("nationkey", T.LongType())]),
            True,
        ),
        T.StructField("ts", T.TimestampType(), True),
    ]
)

TARGET_SCHEMA = T.StructType(
    [
        T.StructField("custkey", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("nationkey", T.LongType()),
        T.StructField("n_name", T.StringType()),
    ]
)


def _setup(spark, tmp_path):
    # source-of-truth main table: custkeys 1..8 EXCEPT 4 (deleted upstream)
    src = spark.createDataFrame(
        [(k, f"cust{k}", k % 3) for k in range(1, 9) if k != 4],
        "custkey long, name string, nationkey long",
    )
    src_path = str(tmp_path / "main_src")
    src.write.parquet(src_path)
    nation_path = str(tmp_path / "nation_dim")
    spark.createDataFrame(
        [(0, "N0"), (1, "N1"), (2, "N2")], "nationkey long, n_name string"
    ).write.parquet(nation_path)
    table = LakeTable.create(
        spark, str(tmp_path / "target"), TARGET_SCHEMA, key_cols=["custkey"], n_buckets=4
    )
    cfg = SyncTaskConfig(
        name="t",
        target_table_path=str(tmp_path / "target"),
        key_cols=["custkey"],
        main_table="customer",
        main_table_path=src_path,
        relevant_tables=["customer", "nation"],
        table_rewrite_rules=[("_[0-9]+$", "")],
        n_buckets=4,
        delete_on_missing=True,
        related_queries=[
            RelatedQueryConfig(child_table="nation", join_cols=["nationkey"], parent_key_cols=["custkey"])
        ],
        enrichments=[EnrichmentJoin(table_path=nation_path, on=["nationkey"], kind="dim")],
    )
    assert cfg.validate() == []
    return src_path, nation_path, table, cfg


def _batch0(spark):
    # main-table inserts for custkeys 1..5 (4 no longer exists in the source)
    rows = [(k, 0, 0, "insert", "customer_17", k, None, (f"stale{k}", None), None) for k in range(1, 6)]
    return spark.createDataFrame(rows, EVENT_SCHEMA)


def _batch1(spark):
    # child-table change: nation 1 renamed -> parents with nationkey=1 recompute
    return spark.createDataFrame(
        [(100, 1, 0, "update", "nation_3", -1, 1, None, None)], EVENT_SCHEMA
    )


def _state(table):
    rows = table.read().select("custkey", "name", "n_name", "last_offset", "last_op").collect()
    return {r["custkey"]: (r["name"], r["n_name"], r["last_offset"], r["last_op"]) for r in rows}


def test_recompute_child_change_and_delete_on_missing(spark, tmp_path):
    _, _, table, cfg = _setup(spark, tmp_path)
    process_config_batch(spark, cfg, table, _batch0(spark), batch_id=0)
    s0 = _state(table)
    # recompute reads the SOURCE, not the event image ("stale..." never lands)
    assert set(s0) == {1, 2, 3, 5}, "custkey 4 must be deleteOnMissing'd"
    # each key is stamped at ITS OWN trigger offset (batch0: offset==custkey),
    # not the cross-partition batch max
    assert s0[1] == ("cust1", "N1", 1, "update")
    assert s0[3] == ("cust3", "N0", 3, "update")

    process_config_batch(spark, cfg, table, _batch1(spark), batch_id=1)
    s1 = _state(table)
    # nationkey=1 parents in the source are {1, 7}: 1 recomputed at the new
    # offset, 7 synced in (never inserted before), others untouched
    assert set(s1) == {1, 2, 3, 5, 7}
    assert s1[1][2] == 100 and s1[7] == ("cust7", "N1", 100, "update")
    assert s1[2][2] == 2 and s1[5][2] == 5

    # crash-rerun of the batch is a no-op (same synthetic (offset, seq))
    process_config_batch(spark, cfg, table, _batch1(spark), batch_id=1)
    assert _state(table) == s1


def test_recompute_offsets_are_per_key_not_batch_max(spark, tmp_path):
    """Multi-partition ordering (ADVICE r2): a batch containing an
    unrelated high-offset event on another partition must NOT inflate the
    recompute stamp of other keys — otherwise the NEXT batch's genuine
    update for those keys (at a lower offset on its own partition) loses
    the LWW guard and the newer source-of-truth state is silently dropped.
    """
    src_path, _, table, cfg = _setup(spark, tmp_path)
    # batch 0: key 1 changes at (p0, offset 10); key 5 changes at (p1, offset 9000)
    b0 = spark.createDataFrame(
        [
            (10, 0, 0, "insert", "customer_1", 1, None, (None, None), None),
            (9000, 1, 0, "insert", "customer_1", 5, None, (None, None), None),
        ],
        EVENT_SCHEMA,
    )
    process_config_batch(spark, cfg, table, b0, batch_id=0)
    s0 = _state(table)
    assert s0[1][2] == 10, "key 1 must be stamped at its own offset, not the batch max 9000"
    assert s0[5][2] == 9000

    # upstream source of truth changes for key 1, then its next event
    # arrives at (p0, offset 11) — far below the other partition's 9000
    spark.createDataFrame(
        [(k, "cust1-renamed" if k == 1 else f"cust{k}", k % 3) for k in range(1, 9) if k != 4],
        "custkey long, name string, nationkey long",
    ).write.mode("overwrite").parquet(src_path)
    b1 = spark.createDataFrame(
        [(11, 0, 0, "update", "customer_1", 1, None, (None, None), None)], EVENT_SCHEMA
    )
    process_config_batch(spark, cfg, table, b1, batch_id=1)
    s1 = _state(table)
    # with a batch-max stamp this recompute would have lost to offset 9000;
    # per-key trigger offsets make 11 > 10 win for key 1
    assert s1[1] == ("cust1-renamed", "N1", 11, "update"), f"newer recompute must land: {s1[1]}"
    assert s1[5][2] == 9000, "the other partition's key is untouched"


def test_recompute_main_delete_event_deletes_directly(spark, tmp_path):
    _, _, table, cfg = _setup(spark, tmp_path)
    process_config_batch(spark, cfg, table, _batch0(spark), batch_id=0)
    delete_ev = spark.createDataFrame(
        [(200, 0, 0, "delete", "customer_9", 2, None, None, None)], EVENT_SCHEMA
    )
    process_config_batch(spark, cfg, table, delete_ev, batch_id=1)
    assert set(_state(table)) == {1, 3, 5}


def test_cdc_mode_relevance_filter_applies_images(spark, tmp_path):
    """Without main_table_path the after-image applies directly and
    irrelevant tables are dropped."""
    table = LakeTable.create(
        spark, str(tmp_path / "t2"), TARGET_SCHEMA, key_cols=["custkey"], n_buckets=4
    )
    cfg = SyncTaskConfig(
        name="cdc",
        target_table_path=str(tmp_path / "t2"),
        key_cols=["custkey"],
        main_table="customer",
        relevant_tables=["customer"],
        table_rewrite_rules=[("_[0-9]+$", "")],
        n_buckets=4,
    )
    rows = [
        (1, 0, 0, "insert", "customer_17", 1, None, ("image1", 0), None),
        (2, 0, 0, "insert", "nation_3", 9, None, ("not-me", 0), None),
    ]
    batch = spark.createDataFrame(rows, EVENT_SCHEMA).drop("nationkey")
    process_config_batch(spark, cfg, table, batch, batch_id=0)
    got = {r["custkey"]: r["name"] for r in table.read().select("custkey", "name").collect()}
    assert got == {1: "image1"}


def test_yaml_config_tail_end_to_end(spark, tmp_path):
    """YAML file -> load_config -> streaming tail with relatedQuery +
    deleteOnMissing: the full declarative surface in one run."""
    src_path, nation_path, table, _ = _setup(spark, tmp_path)
    yaml_text = textwrap.dedent(
        f"""
        name: customers_enriched
        target_table_path: {tmp_path / "target"}
        key_cols: [custkey]
        main_table: customer
        main_table_path: {src_path}
        relevant_tables: [customer, nation]
        table_rewrite_rules:
          - ["_[0-9]+$", ""]
        n_buckets: 4
        delete_on_delete: true
        delete_on_missing: true
        enrichments:
          - table_path: {nation_path}
            on: [nationkey]
            kind: dim
        related_queries:
          - child_table: nation
            join_cols: [nationkey]
            parent_key_cols: [custkey]
        bulk:
          max_files_per_trigger: 1
        """
    )
    cfg_path = tmp_path / "task.yaml"
    cfg_path.write_text(yaml_text)
    cfg = load_config(str(cfg_path))
    assert cfg.related_queries[0].child_table == "nation"
    assert cfg.bulk.max_files_per_trigger == 1

    events_dir = str(tmp_path / "events")
    _batch0(spark).repartition(1).write.mode("append").parquet(events_dir)
    _batch1(spark).repartition(1).write.mode("append").parquet(events_dir)

    from binlog_es_go_spark.cdc.stream import changelog_stream

    stream = changelog_stream(spark, events_dir, schema=EVENT_SCHEMA, max_files_per_trigger=1)
    q = start_config_tail(spark, cfg, stream, str(tmp_path / "ckpt"))
    assert q.awaitTermination(120)
    s = _state(table)
    assert set(s) == {1, 2, 3, 5, 7}
    assert s[7] == ("cust7", "N1", 100, "update")


def test_recompute_schema_evolution_widens_target(spark, tmp_path):
    """The source of truth gains a column between batches (ALTER TABLE
    upstream): recomputed rows carry it, the target schema widens, and
    untouched rows read back null-padded."""
    import dataclasses

    src_path, _, table, cfg = _setup(spark, tmp_path)
    process_config_batch(spark, cfg, table, _batch0(spark), batch_id=0)

    # upstream ALTER: add a 'tier' column to the main source
    evolved_path = str(tmp_path / "main_src_v2")
    spark.read.parquet(src_path).withColumn(
        "tier", F.concat(F.lit("t"), (F.col("custkey") % 2).cast("string"))
    ).write.parquet(evolved_path)
    cfg2 = dataclasses.replace(cfg, main_table_path=evolved_path)

    # child change recomputes only nationkey=1 parents
    process_config_batch(spark, cfg2, table, _batch1(spark), batch_id=1)
    rows = {r["custkey"]: r["tier"] for r in table.read().select("custkey", "tier").collect()}
    assert rows[1] == "t1" and rows[7] == "t1"      # recomputed: evolved column filled
    assert rows[2] is None and rows[5] is None      # untouched: null-padded
    assert "tier" in [f.name for f in table.snapshot().schema.fields]


def test_load_config_rejects_invalid(tmp_path):
    p = tmp_path / "bad.yaml"
    p.write_text("name: x\ntarget_table_path: /t\nkey_cols: [k]\ndelete_on_missing: true\n")
    with pytest.raises(ValueError, match="main_table_path"):
        load_config(str(p))


def test_cross_partition_child_trigger_floor(spark, tmp_path):
    """VERDICT r4 #9: parent and child tables on DIFFERENT stream
    partitions. A child-triggered recompute arriving at a LOW offset on
    its own partition must still supersede a prior recompute stamped at a
    HIGH offset from the parent's partition — without the per-key
    monotonic floor the synthetic stamp (50, SEQ_RECOMPUTE) would lose the
    LWW guard to (1000, SEQ_RECOMPUTE) and the newer source-of-truth state
    would be silently dropped."""
    import dataclasses

    src_path, _, table, cfg = _setup(spark, tmp_path)
    # multi-partition deployment -> floor auto-enabled
    cfg = dataclasses.replace(cfg, stream_partitions=2)

    # batch 0: main event for custkey 1 rides partition 0 at offset 1000
    b0 = spark.createDataFrame(
        [(1000, 0, 0, "insert", "customer_1", 1, None, (None, None), None)], EVENT_SCHEMA
    )
    process_config_batch(spark, cfg, table, b0, batch_id=0)
    assert _state(table)[1] == ("cust1", "N1", 1000, "update")

    # upstream source of truth changes for custkey 1 ...
    spark.createDataFrame(
        [(k, "cust1-v2" if k == 1 else f"cust{k}", k % 3) for k in range(1, 9) if k != 4],
        "custkey long, name string, nationkey long",
    ).write.mode("overwrite").parquet(src_path)
    # ... and the only signal is a CHILD event on partition 1 at offset 50
    b1 = spark.createDataFrame(
        [(50, 1, 0, "update", "nation_3", -1, 1, None, None)], EVENT_SCHEMA
    )
    process_config_batch(spark, cfg, table, b1, batch_id=1)
    s1 = _state(table)
    # the floor lifts the stamp to the persisted guard (1000, seq+1): the
    # NEWER recompute applies instead of losing to its own history
    assert s1[1][0] == "cust1-v2" and s1[1][2] == 1000
    # a parent only now synced in (custkey 7, nationkey 1, no prior state)
    # takes its natural trigger stamp — no lift for unseen keys
    assert s1[7] == ("cust7", "N1", 50, "update")

    # crash-rerun of the lifted batch: value-idempotent (re-lifts one seq
    # higher and re-applies the identical recomputed payload)
    process_config_batch(spark, cfg, table, b1, batch_id=1)
    assert _state(table) == s1


def test_floor_covers_same_batch_direct_delete(spark, tmp_path):
    """A main-table DELETE at a high offset and a child trigger at a low
    offset for the SAME key in one batch: the recompute finds the row in
    the source of truth (the delete was superseded upstream), so its
    synthetic stamp must be lifted above the direct delete's real
    position or the tombstone would win the merge window."""
    import dataclasses

    src_path, _, table, cfg = _setup(spark, tmp_path)
    cfg = dataclasses.replace(cfg, stream_partitions=2)

    b0 = spark.createDataFrame(
        [(100, 0, 0, "insert", "customer_1", 1, None, (None, None), None)], EVENT_SCHEMA
    )
    process_config_batch(spark, cfg, table, b0, batch_id=0)

    # one batch: DELETE custkey 1 at (p0, 900) + child trigger at (p1, 10);
    # the source of truth STILL holds custkey 1
    b1 = spark.createDataFrame(
        [
            (900, 0, 0, "delete", "customer_1", 1, None, None, None),
            (10, 1, 0, "update", "nation_3", -1, 1, None, None),
        ],
        EVENT_SCHEMA,
    )
    process_config_batch(spark, cfg, table, b1, batch_id=1)
    s1 = _state(table)
    # recompute (lifted above the delete's (900, 0)) wins: row survives
    # with the source-of-truth payload
    assert 1 in s1 and s1[1][0] == "cust1" and s1[1][2] == 900


def test_floor_off_single_stream_keeps_exact_noop_rerun(spark, tmp_path):
    """Default single-stream deployments skip the floor: stamps are the
    raw trigger offsets and a crash-rerun is an exact (offset, seq) no-op
    commit, byte-identical guard state."""
    _, _, table, cfg = _setup(spark, tmp_path)
    assert (cfg.stream_partitions or 1) == 1
    process_config_batch(spark, cfg, table, _batch0(spark), batch_id=0)
    v0 = table.current_version()
    s0 = _state(table)
    process_config_batch(spark, cfg, table, _batch0(spark), batch_id=0)
    assert _state(table) == s0
