"""Structured Streaming tail: the realtime mode.

The reference's realtime loop (``pkg/realtime/loop.go:24-520``) hand-rolls
event batching (count/time/overflow triggers, :44-91,:476-513), reconnect
(:140-175) and position persistence (:92-111). Structured Streaming owns
all of that here:

* micro-batching     -> ``trigger(processingTime=...)`` / availableNow
* rate limiting      -> ``maxFilesPerTrigger`` (maxPending analog)
* reconnect/restart  -> checkpoint dir; restart resumes from the last
                        committed source offsets
* position store     -> checkpoint WAL + our per-partition offsets in the
                        lake manifest (saved atomically with the data, the
                        way the reference saves its position after each
                        flush, pkg/realtime/flush.go:212-232)

The changelog source here is a parquet file stream (a directory that an
upstream binlog/WAL shipper appends event files to — the lake-native stand-
in for a Kafka/Debezium feed; swapping in Kafka changes one line of
``readStream``). Exactly-once comes from the MERGE offset guard, NOT from
the checkpoint: a batch re-run after a crash re-merges and no-ops.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from binlog_es_go_spark.cdc.apply import apply_batch
from binlog_es_go_spark.cdc.events import CHANGELOG_SCHEMA
from binlog_es_go_spark.lake.table import LakeTable


def changelog_stream(
    spark: SparkSession,
    events_dir: str,
    schema: T.StructType = CHANGELOG_SCHEMA,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.parquet(events_dir)


def changelog_stream_kafka(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    schema: T.StructType = CHANGELOG_SCHEMA,
    starting_offsets: str = "latest",
    max_offsets_per_trigger: int | None = None,
) -> DataFrame:
    """The Kafka/Debezium form of the changelog source — the documented
    one-line swap for ``changelog_stream`` (same downstream pipeline).

    Kafka's (partition, offset) maps 1:1 onto the engine's
    (partition_id, offset) guard columns; the JSON value parses into the
    changelog schema. NOT exercisable in this container (no Kafka
    connector jar / broker) — the non-file source path itself is proven by
    the rate-source test (tests/test_pipeline_paths.py); on a real cluster
    add ``--packages org.apache.spark:spark-sql-kafka-0-10_2.13:<ver>``.
    """
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
    )
    if max_offsets_per_trigger:
        reader = reader.option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
    return project_kafka_records(reader.load(), schema)


def project_kafka_records(raw: DataFrame, schema: T.StructType = CHANGELOG_SCHEMA) -> DataFrame:
    """Kafka wire records -> changelog rows (the testable projection).

    ``raw`` has Kafka's source schema (key/value binary, topic, partition,
    offset, timestamp...). The JSON value parses into ``schema``; Kafka's
    own (partition, offset) is the authoritative monotonic position and
    OVERRIDES any event-embedded positions — Debezium payloads often carry
    a source LSN, but per-partition ordering guarantees come from the
    broker, not the producer. Works identically on a batch DataFrame with
    the same columns, which is how the unit test drives it without a
    broker (tests/test_pipeline_paths.py)."""
    from pyspark.sql import functions as F

    payload = F.from_json(F.col("value").cast("string"), schema).alias("e")
    flat = raw.select(
        payload,
        F.col("partition").cast("int").alias("_kafka_partition"),
        F.col("offset").cast("long").alias("_kafka_offset"),
    )
    return flat.select(
        F.col("_kafka_offset").alias("offset"),
        F.col("_kafka_partition").alias("partition_id"),
        *[F.col(f"e.{f.name}").alias(f.name) for f in schema.fields if f.name not in ("offset", "partition_id")],
    )


def start_tail(
    table: LakeTable,
    changelog: DataFrame,
    checkpoint_dir: str,
    mapper: Callable[[DataFrame], DataFrame] | None = None,
    relevant_ops: tuple[str, ...] = ("insert", "update", "delete"),
    trigger: dict | None = None,
    on_error: Callable[[int, DataFrame, Exception], None] | None = None,
    salt_partitions: int | None = None,
    circuit=None,
    apply_fn: Callable[[DataFrame, int], None] | None = None,
) -> StreamingQuery:
    """Start the incremental tail; returns the StreamingQuery handle.

    ``on_error``: dead-letter hook — called with (batch_id, batch_df, exc)
    when a batch fails after Spark-level retries; the batch is then skipped
    (the reference's dead-letter-and-continue policy,
    ``pkg/bootstrap/runner.go:135-163``). Without a hook, errors propagate
    and stop the query (fail-stop).

    ``circuit``: a ``CircuitBreaker`` (or config) — consecutive sink
    failures open it and each subsequent attempt first waits out a capped
    exponential backoff (``pkg/pipeline/sink/bulkwriter.go:50-96``), so a
    persistently failing sink throttles the tail instead of dead-lettering
    every batch at full speed; one success closes it.

    ``apply_fn``: custom per-batch sink (batch_df, batch_id) replacing the
    default guarded MERGE into ``table`` — derived sinks (e.g. the LSH
    near-dup index, operators/lsh_index.py) tail the same changelog with
    the same dead-letter/circuit choreography.
    """
    from pyspark.sql import functions as F

    from binlog_es_go_spark.cdc.circuit import CircuitBreaker, CircuitBreakerConfig

    if isinstance(circuit, CircuitBreakerConfig):
        circuit = CircuitBreaker(config=circuit)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        batch = batch_df.filter(F.col("op").isin(*relevant_ops))
        if circuit is not None:
            circuit.before_attempt()
        try:
            if apply_fn is not None:
                apply_fn(batch, batch_id)
            else:
                apply_batch(
                    table, batch, mapper=mapper, batch_id=batch_id,
                    source="realtime", salt_partitions=salt_partitions,
                )
            if circuit is not None:
                circuit.record_success()
        except Exception as exc:  # noqa: BLE001 — dead-letter boundary
            if circuit is not None:
                circuit.record_failure()
            if on_error is None:
                raise
            on_error(batch_id, batch_df, exc)

    writer = changelog.writeStream.foreachBatch(process).option("checkpointLocation", checkpoint_dir)
    writer = writer.trigger(**(trigger or {"availableNow": True}))
    return writer.start()


def run_tail_until_drained(
    table: LakeTable,
    spark: SparkSession,
    events_dir: str,
    checkpoint_dir: str,
    timeout_sec: float = 600,
    **kwargs,
) -> None:
    """Convenience: process everything currently in the source, then stop."""
    stream = changelog_stream(spark, events_dir, **({k: kwargs.pop(k) for k in ("max_files_per_trigger",) if k in kwargs}))
    q = start_tail(table, stream, checkpoint_dir, trigger={"availableNow": True}, **kwargs)
    try:
        if not q.awaitTermination(timeout_sec):
            raise TimeoutError(f"stream did not drain within {timeout_sec}s")
    finally:
        if q.isActive:
            q.stop()
