"""Dead-letter table + replay job.

The reference appends failed id batches as ``ts|[ids]|reason`` lines to
``logs/dead-letters/<task>.log`` (``pkg/bootstrap/runner.go:135-163``),
parses them back with dedup (``cmd/binlog-es-go/main.go:564-598``), and
replays via ``RunWithIDs``. It also defines (but never populates) a richer
structured failure record (``pkg/tracking/failure_tracker.go:15-29``).

Here dead letters are a first-class parquet append log with the structured
superset of columns, and replay is the same apply core fed by the
dead-letter keys (SURVEY.md §3.3: same core, different key source).
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from binlog_es_go_spark.cdc.bootstrap import run_with_keys
from binlog_es_go_spark.lake.merge import MergeResult
from binlog_es_go_spark.lake.table import LakeTable

DEADLETTER_SCHEMA = T.StructType(
    [
        T.StructField("ts", T.TimestampType()),
        T.StructField("repo", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("failure_type", T.StringType()),
        T.StructField("stage", T.StringType()),
        T.StructField("offset", T.LongType()),
        T.StructField("batch_id", T.LongType()),
        T.StructField("reason", T.StringType()),
        T.StructField("replayed", T.BooleanType()),
    ]
)


class DeadLetterLog:
    """Append-only parquet directory; files are immutable once written."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    def record_failure(
        self,
        keys: DataFrame,
        reason: str,
        stage: str,
        failure_type: str = "apply_error",
        batch_id: int | None = None,
    ) -> None:
        """Write one dead-letter file for the failed keys."""
        out = keys.select(
            F.current_timestamp().alias("ts"),
            F.col("repo"),
            F.col("path"),
            F.lit(failure_type).alias("failure_type"),
            F.lit(stage).alias("stage"),
            (F.col("offset") if "offset" in keys.columns else F.lit(None)).cast("long").alias("offset"),
            F.lit(batch_id).cast("long").alias("batch_id"),
            F.lit(reason).alias("reason"),
            F.lit(False).alias("replayed"),
        )
        out.write.mode("append").parquet(os.path.join(self.root, f"dl-{uuid.uuid4().hex}"))

    def read(self, include_replayed: bool = False) -> DataFrame:
        # pending entries live in dl-* files, replay history in replayed-*:
        # the pending read never scans the (unbounded) history
        prefixes = ("dl-", "replayed-") if include_replayed else ("dl-",)
        dirs = [
            os.path.join(self.root, d)
            for d in os.listdir(self.root)
            if d.startswith(prefixes)
        ]
        if not dirs:
            return self.spark.createDataFrame([], DEADLETTER_SCHEMA)
        df = self.spark.read.parquet(*dirs)
        if not include_replayed:
            df = df.filter(~F.col("replayed"))
        return df

    def pending_keys(self) -> DataFrame:
        """Distinct unreplayed keys — parser-dedup analog (main.go:583-593)."""
        return self.read().select("repo", "path").distinct()

    def mark_replayed(self) -> None:
        """Archive the PENDING entries as replayed (file-archive analog,
        cmd/binlog-es-go/main.go:551-559).

        O(pending), not O(total history): only the active dl-* files are
        rewritten into one replayed-* file; prior replay history is never
        re-read or re-written. Original files are renamed out of the
        active set (kept for forensics, never scanned again)."""
        pending = [d for d in os.listdir(self.root) if d.startswith("dl-")]
        if not pending:
            return
        df = self.spark.read.parquet(*[os.path.join(self.root, d) for d in pending])
        df.withColumn("replayed", F.lit(True)).write.parquet(
            os.path.join(self.root, f"replayed-{uuid.uuid4().hex}")
        )
        for d in pending:
            os.rename(os.path.join(self.root, d), os.path.join(self.root, "archived-" + d[3:]))

    def analyze(self) -> DataFrame:
        """Failure aggregation (AnalyzeFailures analog,
        pkg/tracking/failure_tracker.go:118-163): counts by type/stage."""
        return (
            self.read(include_replayed=True)
            .groupBy("failure_type", "stage")
            .agg(F.count("*").alias("n"), F.min("ts").alias("first_ts"), F.max("ts").alias("last_ts"))
            .orderBy(F.col("n").desc())
        )


def replay_dead_letters(
    table: LakeTable,
    dl: DeadLetterLog,
    source: DataFrame,
    epoch_offset: int,
    mapper=None,
) -> MergeResult | None:
    """--mode=replay-deadletters (cmd/binlog-es-go/main.go:503-561)."""
    keys = dl.pending_keys()
    if keys.isEmpty():
        return None
    result = run_with_keys(table, source, keys, epoch_offset=epoch_offset, mapper=mapper)
    dl.mark_replayed()
    return result
