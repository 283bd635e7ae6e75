"""Bootstrap: seed / recompute the lake table from a full source scan.

The reference's bootstrap mode (``pkg/bootstrap/runner.go``) hand-rolls
range partitioning (``Run``, :421-620), keyset-paginated full scans
(``RunFullScan``, :324-418) and an explicit id-list path (``RunWithIDs``,
:37-132), fanned out over a worker pool. In Spark all three collapse into
the same apply core with different key sources:

* full scan      -> read the source table, treat every row as an insert
* partial scan   -> same, plus a pushed-down WHERE (the analog of
                    ``injectWhere``, runner.go:214-227 — Catalyst pushes
                    the predicate into the parquet scan)
* explicit keys  -> join the key list against the source (broadcast when
                    small), then the same path

Partition planning (``--bootstrap.partition.size``, 5000 keys/partition ×
4 workers) is Spark's job: the scan parallelizes by file split and the
MERGE shuffle by key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from binlog_es_go_spark.cdc.apply import apply_batch
from binlog_es_go_spark.lake.merge import MergeResult
from binlog_es_go_spark.lake.table import LakeTable

BOOTSTRAP_PARTITION = "bootstrap"
# Bootstrap rows ride the reserved epoch partition: its recorded offset is
# a GLOBAL floor ("state as of offset E, all partitions"), which
# filter_unapplied applies to every partition — so a tail fed the full
# changelog after a dump-based cutover skips the pre-epoch prefix instead
# of replaying stale inserts against keys whose deletes predate the dump
# (the dump carries no tombstones for those).
EPOCH_PARTITION = -2


def as_changelog(
    source: DataFrame,
    key_cols: list[str],
    epoch_offset: int = 0,
    where: str | None = None,
) -> DataFrame:
    """Wrap a base-table scan as a synthetic changelog of inserts.

    Every row gets ``offset = epoch_offset`` (the bootstrap epoch): a later
    realtime tail starting at offsets > epoch wins over bootstrap rows, and
    a re-run bootstrap at the same epoch is idempotent under the MERGE
    guard.
    """
    if where:
        source = source.filter(F.expr(where))
    payload_cols = [c for c in source.columns if c not in key_cols]
    return source.select(
        F.lit(int(epoch_offset)).cast("long").alias("offset"),
        F.lit(EPOCH_PARTITION).cast("int").alias("partition_id"),
        F.lit(0).cast("int").alias("seq_in_tx"),
        F.lit("insert").alias("op"),
        *key_cols,
        F.lit(None).cast(
            "struct<" + ",".join(f"{c}:{source.schema[c].dataType.simpleString()}" for c in payload_cols) + ">"
        ).alias("before"),
        F.struct(*[F.col(c) for c in payload_cols]).alias("after"),
        F.current_timestamp().alias("ts"),
    )


def run_full_scan(
    table: LakeTable,
    source: DataFrame,
    epoch_offset: int = 0,
    where: str | None = None,
    mapper=None,
) -> MergeResult:
    """Reference ``RunFullScan`` (pkg/bootstrap/runner.go:324-418)."""
    snap = table.snapshot()
    changelog = as_changelog(source, snap.key_cols, epoch_offset, where)
    return apply_batch(table, changelog, mapper=mapper, batch_id=-1, source=BOOTSTRAP_PARTITION)


def run_with_keys(
    table: LakeTable,
    source: DataFrame,
    keys: DataFrame,
    epoch_offset: int = 0,
    mapper=None,
) -> MergeResult:
    """Reference ``RunWithIDs`` (pkg/bootstrap/runner.go:37-132).

    ``keys``: a DataFrame of the table's key columns (dead-letter replay or
    exact recompute). Broadcast when small — the planner's choice under AQE.
    """
    snap = table.snapshot()
    key_cols = snap.key_cols
    scoped = source.join(F.broadcast(keys.select(*key_cols).distinct()), on=key_cols, how="inner")
    changelog = as_changelog(scoped, key_cols, epoch_offset)
    return apply_batch(table, changelog, mapper=mapper, batch_id=-2, source="replay")
