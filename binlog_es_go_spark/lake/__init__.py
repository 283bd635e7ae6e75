"""A minimal lake-table format: bucketed parquet + JSON manifests.

This container ships no Iceberg/Delta jars, so the engine implements the
small slice of a table format that the CDC design needs, from scratch:

* immutable parquet data files, hash-bucketed by the merge key;
* a versioned JSON manifest per snapshot (atomic tmp+rename commit — the
  same durability trick the reference uses for its position store,
  ``pkg/position/store.go:55-72``);
* snapshot isolation + optimistic-concurrency commit retry (the analog of
  Iceberg's ``CommitFailedException`` retry, replacing the reference's
  ES version-conflict recompute, ``pkg/pipeline/sink/bulkwriter.go:188-266``);
* schema evolution by column-union merge on write (strictly stronger than
  the reference's never-invalidated schema cache,
  ``pkg/realtime/schema_cache.go:21-52``);
* copy-on-write MERGE that rewrites only the buckets containing changed
  keys — the scale story: at 100 TB a micro-batch touches a bounded set
  of buckets, so MERGE cost is O(affected buckets), not O(table).

On a real cluster the same API maps 1:1 onto Iceberg (``MERGE INTO`` with
an offset-guard predicate); the bucket pruning here is what Iceberg's
``bucket(N, key)`` partition transform + partition pruning gives.
"""

from binlog_es_go_spark.lake.table import LakeTable
from binlog_es_go_spark.lake.merge import merge_into
from binlog_es_go_spark.lake.changes import replicate_changes, snapshot_changes

__all__ = ["LakeTable", "merge_into", "snapshot_changes", "replicate_changes"]
