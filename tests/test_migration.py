"""GTID/binlog-position -> offset-floor cutover bridge (round-4 #8)."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from binlog_es_go_spark.cdc.migration import (
    CutoverFloors,
    GoPosition,
    TxWatermark,
    cutover_floors,
    gtid_covered,
    parse_gtid_set,
    seed_cutover_offsets,
)


def test_parse_and_cover():
    s = parse_gtid_set("3E11FA47-71CA-11E1-9E33-C80AA9429562:1-5:7, abc:23")
    assert gtid_covered(s, "3e11fa47-71ca-11e1-9e33-c80aa9429562", 3)
    assert gtid_covered(s, "3E11FA47-71CA-11E1-9E33-C80AA9429562", 7)
    assert not gtid_covered(s, "3e11fa47-71ca-11e1-9e33-c80aa9429562", 6)
    assert gtid_covered(s, "abc", 23) and not gtid_covered(s, "abc", 22)
    assert not gtid_covered(s, "other", 1)


def _w(p, off, txno):
    return TxWatermark(partition_id=p, offset=off, gtid_uuid="u1", txno=txno)


def test_floor_is_prefix_closed_across_gaps():
    """A gap in the saved GTID set caps the floor BELOW the gap even when
    later transactions are covered — resuming above it would skip data."""
    saved = GoPosition(gtid_set="u1:1-10:12-20")
    ws = [_w(0, 100, 9), _w(0, 101, 10), _w(0, 102, 11), _w(0, 103, 12),
          _w(1, 50, 13), _w(1, 51, 14)]
    out = cutover_floors(saved, ws)
    assert out.floors == {"0": 101, "1": 51}
    assert out.gaps == {0: 102}, "txno 11 is the uncovered gap"


def test_floor_file_pos_mode():
    saved = GoPosition(file="mysql-bin.000002", pos=500)
    ws = [
        TxWatermark(0, 10, file="mysql-bin.000001", pos=900),
        TxWatermark(0, 11, file="mysql-bin.000002", pos=400),
        TxWatermark(0, 12, file="mysql-bin.000002", pos=700),
        TxWatermark(0, 13, file="mysql-bin.000003", pos=100),
    ]
    out = cutover_floors(saved, ws)
    assert out.floors == {"0": 11} and out.gaps == {0: 12}


def test_mixed_identity_raises():
    with pytest.raises(ValueError, match="no gtid identity"):
        cutover_floors(GoPosition(gtid_set="u1:1-3"),
                       [TxWatermark(0, 1, file="f", pos=1)])
    with pytest.raises(ValueError, match="no file/pos"):
        cutover_floors(GoPosition(file="f", pos=9), [_w(0, 1, 2)])


def test_empty_and_uncovered_partitions():
    saved = GoPosition(gtid_set="u1:1-5")
    out = cutover_floors(saved, [_w(0, 7, 9)])  # first tx already uncovered
    assert out.floors == {} and out.gaps == {0: 7}
    assert cutover_floors(saved, []) == CutoverFloors(floors={}, gaps={})


def test_seed_offsets_then_filter_unapplied(spark, tmp_path):
    """Seeded floors land in stream_offsets (metadata-only commit,
    max-merge: re-seeding lower floors cannot regress), and the tail's
    coarse filter drops the shipped prefix."""
    from pyspark.sql import functions as F

    from binlog_es_go_spark.cdc.apply import applied_offsets, filter_unapplied
    from binlog_es_go_spark.lake.table import LakeTable

    payload = T.StructType([T.StructField("repo", T.StringType()),
                            T.StructField("content", T.StringType())])
    t = LakeTable.create(spark, str(tmp_path / "t"), payload, key_cols=["repo"], n_buckets=4)
    v0 = t.current_version()
    seed_cutover_offsets(t, {"0": 100, "1": 55})
    assert t.current_version() == v0 + 1, "metadata-only commit advances the version"
    assert applied_offsets(t) == {"0": 100, "1": 55}
    assert t.read().count() == 0, "no data files written"

    seed_cutover_offsets(t, {"0": 90, "2": 7})
    assert applied_offsets(t) == {"0": 100, "1": 55, "2": 7}, "max-merge only raises"

    log = spark.createDataFrame(
        [(100, 0), (101, 0), (55, 1), (56, 1), (7, 2), (8, 2)],
        "offset long, partition_id int",
    )
    kept = {(r["partition_id"], r["offset"])
            for r in filter_unapplied(log, applied_offsets(t)).collect()}
    assert kept == {(0, 101), (1, 56), (2, 8)}
