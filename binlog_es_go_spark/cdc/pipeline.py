"""Config-driven realtime pipeline: key extraction -> recompute -> flush.

This is the end-to-end wiring of ``SyncTaskConfig`` into the tail — the
reference's actual realtime architecture (``pkg/realtime/loop.go:24-520`` +
``pkg/realtime/flush.go:39-140``): binlog events are reduced to AFFECTED
MAIN-TABLE KEYS (main events contribute their own key; child-table events
resolve parents through the relatedQuery reverse lookup,
``loop.go:325-451``), the keys are batch-recomputed against the mapping
(one semi-join against the source-of-truth main table + the config's
enrichments, instead of the reference's per-batch mapping SQL), and keys
whose recompute comes back empty are deleted when ``deleteOnMissing``
(``flush.go:119-140``). Main-table DELETE events delete directly when
``deleteOnDelete`` (``loop.go:317-321``).

Everything funnels into ONE synthetic changelog per micro-batch and the
standard ``apply_batch`` MERGE, so idempotence / offset guarding / salting
are inherited, and a crash-rerun of the batch is a no-op. Synthetic
recompute events ride a reserved partition_id (-1) and carry, PER KEY, the
max offset of the events that triggered that key's recompute (main events:
the key's own offsets; child events: the child row's offset, threaded
through the reverse lookup), with a high seq, so:

* re-running the batch recomputes the same keys at the same (offset, seq)
  — the tuple guard makes it a no-op;
* a recompute wins over a same-offset raw event (source-of-truth state is
  newer than any image inside the batch);
* real stream partitions' offset bookkeeping is untouched;
* recompute-vs-recompute ordering is correct across micro-batches when
  ALL events affecting a key — the main-table events AND the relatedQuery
  child events that resolve to it — ride one totally-ordered stream
  partition: offsets from different partitions are not mutually ordered,
  so a cross-partition batch max would let a later batch dominated by a
  low-offset partition stamp recomputes BELOW a prior recompute and
  silently lose the newer source-of-truth state to the LWW guard.
  Per-key trigger offsets are monotonic under that single-stream-per-key
  contract; note that child events are partitioned by the CHILD key, so a
  parent triggered via children on one partition and via its own events
  on another can receive a lower ``_trig_off`` than a prior recompute.
  Multi-partition deployments therefore get a PER-KEY MONOTONIC FLOOR
  (``_lift_to_floor``, enabled automatically when the config has related
  queries and ``stream_partitions > 1``): before synthesizing, each
  recompute key's stamp is lifted strictly above max(the target table's
  current persisted ``(last_offset, last_seq)`` for that key — tombstones
  and pending merge-on-read deltas included — and any same-batch direct
  DELETE position for the key). A recompute reads CURRENT source-of-truth
  state, which supersedes everything already applied, so lifting is
  always semantically correct; the lift only fires when the trigger
  offset alone would lose, so the single-stream deployment (the
  reference's, ``pkg/realtime/loop.go:140-175``) keeps exact
  rerun-is-a-no-op stamps. A crash-rerun of a LIFTED batch re-lifts one
  seq higher and re-applies — idempotent in value (the recompute re-reads
  the same source of truth), at worst one redundant file rewrite.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from binlog_es_go_spark.cdc.apply import apply_batch
from binlog_es_go_spark.cdc.events import flatten_changelog
from binlog_es_go_spark.config import SyncTaskConfig, build_mapper
from binlog_es_go_spark.lake.merge import MergeResult
from binlog_es_go_spark.lake.table import LakeTable
from binlog_es_go_spark.operators.enrichment import (
    affected_parent_keys_with_offset,
    rewrite_table_name,
)

# Synthetic recompute events ride a reserved stream partition so they never
# perturb a real partition's applied-offset bookkeeping.
RECOMPUTE_PARTITION = -1
# Within one offset, a recompute's seq beats any raw event's seq_in_tx —
# source-of-truth state is newer than any image inside the batch. Direct
# deletes (deleteOnDelete) are NOT on this ladder: they keep their real
# (offset, partition, seq_in_tx) so they order like any other raw event.
SEQ_RECOMPUTE = (1 << 30) + 1


def _logical_table(batch: DataFrame, cfg: SyncTaskConfig) -> DataFrame:
    """Apply the physical->logical table-name rewrite (helpers.go:57-74)."""
    if "table" not in batch.columns or not cfg.table_rewrite_rules:
        return batch
    return batch.withColumn("table", rewrite_table_name("table", cfg.table_rewrite_rules))


def _payload_struct(src: DataFrame, key_cols: list[str]):
    payload = [c for c in src.columns if c not in key_cols and not c.startswith("_")]
    return F.struct(*[F.col(c) for c in payload])


def _lift_to_floor(
    table: LakeTable, recompute_keys: DataFrame, key_cols: list[str], main: DataFrame
) -> DataFrame:
    """Per-key monotonic floor for multi-partition deployments (see module
    docstring): return ``recompute_keys`` with ``(_trig_off, _trig_seq)``
    lifted strictly above both the target's persisted guard for the key
    and any same-batch main-table DELETE position, so a recompute
    triggered from a low-offset stream partition can never lose the LWW
    window to older state. Cost: one bounded driver job (the distinct
    bucket list, <= n_buckets rows) plus a bucket-and-column-pruned scan
    of the target's guard columns, broadcast-joined against the
    batch-sized keyset — no extra shuffle of the target."""
    from binlog_es_go_spark.lake.table import khash_expr

    snap = table.snapshot()
    buckets = [
        int(r[0])
        for r in recompute_keys.select(
            F.pmod(khash_expr(key_cols), F.lit(snap.n_buckets)).cast("int").alias("b")
        )
        .distinct()
        .collect()
    ]
    state = table.read(buckets=buckets, include_deleted=True)
    floors = state.join(
        F.broadcast(recompute_keys.select(*key_cols)), on=key_cols, how="inner"
    ).select(
        *key_cols,
        F.col("last_offset").alias("_fl_off"),
        F.coalesce(F.col("last_seq"), F.lit(0)).cast("long").alias("_fl_seq"),
    )
    same_batch_deletes = main.filter(F.col("op") == "delete").select(
        *key_cols,
        F.col("offset").alias("_fl_off"),
        F.coalesce(F.col("seq_in_tx"), F.lit(0)).cast("long").alias("_fl_seq"),
    )
    floor = (
        floors.unionByName(same_batch_deletes)
        .groupBy(*key_cols)
        .agg(F.max(F.struct(F.col("_fl_off"), F.col("_fl_seq"))).alias("_f"))
    )
    lift = F.col("_f").isNotNull() & (
        (F.col("_f._fl_off") > F.col("_trig_off"))
        | (
            (F.col("_f._fl_off") == F.col("_trig_off"))
            & (F.col("_f._fl_seq") >= F.lit(SEQ_RECOMPUTE))
        )
    )
    return recompute_keys.join(floor, on=key_cols, how="left").select(
        *key_cols,
        F.when(lift, F.col("_f._fl_off")).otherwise(F.col("_trig_off")).alias("_trig_off"),
        F.when(lift, F.col("_f._fl_seq") + 1)
        .otherwise(F.lit(SEQ_RECOMPUTE))
        .cast("int")
        .alias("_trig_seq"),
    )


def process_config_batch(
    spark: SparkSession,
    cfg: SyncTaskConfig,
    table: LakeTable,
    batch: DataFrame,
    batch_id: int,
    mapper: Callable[[DataFrame], DataFrame] | None = None,
    main_src: DataFrame | None = None,
    monotonic_floor: bool | None = None,
) -> MergeResult:
    """Apply one mixed-table micro-batch under a SyncTaskConfig.

    RECOMPUTE mode (``cfg.main_table_path`` set — the reference's mode):
    events reduce to keys, keys re-read from the source of truth through
    the mapper, absences deleted per ``delete_on_missing``.

    ``monotonic_floor``: lift recompute stamps above the target's
    persisted per-key guard (module docstring). Default: on exactly when
    the config has related queries AND ``stream_partitions > 1`` — the
    only shape where cross-partition trigger offsets can regress.

    CDC mode (no ``main_table_path``): after-images apply directly; only
    the relevance filter and mapper come from config.
    """
    if mapper is None:
        mapper = build_mapper(spark, cfg) if (cfg.enrichments or cfg.transforms) else None
    batch = _logical_table(batch, cfg)
    has_table = "table" in batch.columns

    if cfg.main_table_path is None:
        if has_table:
            relevant = set(cfg.relevant_tables or [cfg.main_table])
            batch = batch.filter(F.col("table").isin(*relevant)).drop("table")
        return apply_batch(
            table, batch, mapper=mapper, batch_id=batch_id,
            salt_partitions=cfg.salt_partitions, stream_partitions=cfg.stream_partitions,
        )

    flat = flatten_changelog(batch)
    key_cols = cfg.key_cols
    main = flat.filter(F.col("table") == cfg.main_table) if has_table else flat
    if main_src is None:
        # per-batch fallback; the streaming tail hoists this out of the
        # loop (a spark.read.parquet is a driver-side listing + schema
        # resolution — pure serial cost when repeated every micro-batch)
        main_src = spark.read.parquet(cfg.main_table_path)

    # ---- key extraction --------------------------------------------------
    # Every affected key carries ``_trig_off`` = the max offset of the
    # events that put it in this batch. Synthetic recompute events ride
    # that per-key offset (NOT a cross-partition batch max, which is not
    # mutually ordered across stream partitions — see module docstring),
    # so no extra driver job is needed to pin an offset either.
    # main-table inserts/updates -> their own key at their own offsets
    keyed = main.filter(F.col("op") != "delete").select(*key_cols, F.col("offset").alias("_trig_off"))
    # child-table events -> affected parents via the relatedQuery lookup,
    # the child event's offset threaded through as the trigger position
    for rq in cfg.related_queries:
        child = flat.filter(F.col("table") == rq.child_table) if has_table else flat.limit(0)
        affected = affected_parent_keys_with_offset(
            child, main_src, rq.join_cols, rq.parent_key_cols, rq.direct_fk_cols
        ).select(*[F.col(p).alias(k) for p, k in zip(rq.parent_key_cols, key_cols)], "_trig_off")
        keyed = keyed.unionByName(affected)
    recompute_keys = keyed.groupBy(*key_cols).agg(F.max("_trig_off").alias("_trig_off"))
    if monotonic_floor is None:
        monotonic_floor = bool(cfg.related_queries) and (cfg.stream_partitions or 1) > 1
    if monotonic_floor:
        recompute_keys = _lift_to_floor(table, recompute_keys, key_cols, main)
    else:
        recompute_keys = recompute_keys.withColumn(
            "_trig_seq", F.lit(SEQ_RECOMPUTE).cast("int")
        )

    # No driver-side emptiness probe: an empty batch flows through to
    # apply_batch, whose per-batch metadata scan (the one unavoidable
    # serial job) comes back empty and short-circuits the MERGE to a
    # no-op MergeResult — the isEmpty() here was a SECOND serial job paid
    # by every non-empty batch to save nothing on empty ones.

    # ---- batch recompute (the mapping query, flush.go:39) ----------------
    # the key side is small (one micro-batch's distinct keys), so Catalyst
    # broadcasts it: main_src is SCANNED, never shuffled (plan-asserted in
    # tests/test_physical_plans.py)
    found = main_src.join(F.broadcast(recompute_keys), on=key_cols, how="inner")

    def synth(df: DataFrame, op: str, keep_positions: bool) -> DataFrame:
        payload = _payload_struct(found, key_cols)
        after = payload if op != "delete" else F.lit(None).cast(
            T.StructType([
                f for f in found.schema.fields
                if f.name not in key_cols and not f.name.startswith("_")
            ])
        )
        return df.select(
            (F.col("offset") if keep_positions else F.col("_trig_off").cast("long")).alias("offset"),
            (F.col("partition_id") if keep_positions else F.lit(RECOMPUTE_PARTITION).cast("int")).alias("partition_id"),
            # non-positional stamps ride the per-key trigger seq (the
            # SEQ_RECOMPUTE constant, or the floor-lifted value)
            (F.col("seq_in_tx") if keep_positions else F.col("_trig_seq").cast("int")).alias("seq_in_tx"),
            F.lit(op).alias("op"),
            *key_cols,
            after.alias("after"),
            (F.col("ts") if "ts" in df.columns else F.lit(None).cast("timestamp")).alias("ts"),
        )

    parts = [synth(found, "update", keep_positions=False)]
    # main DELETE events -> direct deletes at their real positions
    if cfg.delete_on_delete:
        deletes = main.filter(F.col("op") == "delete")
        parts.append(synth(deletes, "delete", keep_positions=True))
    # recomputed keys with no source row -> deleteOnMissing, stamped at
    # the missing key's own trigger offset
    if cfg.delete_on_missing:
        missing = recompute_keys.join(found.select(*key_cols), on=key_cols, how="left_anti")
        parts.append(synth(missing, "delete", keep_positions=False))

    synthetic = parts[0]
    for p in parts[1:]:
        synthetic = synthetic.unionByName(p)

    # Materialize the synthetic changelog ONCE (micro-batch-sized by
    # construction): apply_batch otherwise evaluates the whole recompute
    # DAG — key extraction, the broadcast semi-join against the source of
    # truth, the deleteOnMissing anti-join — twice (metadata scan + the
    # MERGE itself), and every broadcast build is its own driver-blocking
    # stage (measured ~10 mini-jobs per batch at sf0.1). AQE is off for
    # the materialization for the same reason it is off inside the merge
    # (lake/merge.scoped_merge_conf).
    from binlog_es_go_spark.lake.merge import scoped_merge_conf

    with scoped_merge_conf(spark):
        synthetic = synthetic.localCheckpoint()

    return apply_batch(
        table, synthetic, mapper=mapper, batch_id=batch_id,
        source="recompute", salt_partitions=cfg.salt_partitions,
    )


def start_config_tail(
    spark: SparkSession,
    cfg: SyncTaskConfig,
    changelog: DataFrame,
    checkpoint_dir: str,
    trigger: dict | None = None,
    on_error: Callable[[int, DataFrame, Exception], None] | None = None,
    schema_refresh_batches: int = 64,
) -> StreamingQuery:
    """Streaming tail fully driven by a SyncTaskConfig — the analog of the
    reference's ``runEventLoop`` + flush with relatedQuery/deleteOnMissing
    wired in from YAML (``pkg/realtime/runner.go:95-171``)."""
    problems = cfg.validate()
    if problems:
        raise ValueError(f"invalid config: {problems}")
    table = LakeTable.load(spark, cfg.target_table_path)
    mapper = build_mapper(spark, cfg) if (cfg.enrichments or cfg.transforms) else None
    # Schema inference hoisted out of the batch loop (footer reads +
    # several py4j round trips of serial driver time per micro-batch).
    # The FILE LISTING deliberately stays per-batch: the main table is the
    # SOURCE OF TRUTH the binlog events describe — it changes between
    # batches (the reference re-queries MySQL on every flush,
    # pkg/realtime/flush.go:39), and a DataFrame pinned at stream start
    # would recompute against a stale snapshot forever.
    # The SCHEMA is refreshed every `schema_refresh_batches` batches and
    # once more on a failing batch before it dead-letters: columns added
    # to the source table mid-stream (the reference re-queries MySQL per
    # flush and sees DDL immediately) flow into recomputes within one
    # refresh window instead of requiring a tail restart.
    def _infer_schema():
        return (
            spark.read.parquet(cfg.main_table_path).schema
            if cfg.main_table_path is not None
            else None
        )

    state = {"schema": _infer_schema(), "n": 0}

    def _run(batch_df: DataFrame, batch_id: int) -> None:
        main_src = (
            spark.read.schema(state["schema"]).parquet(cfg.main_table_path)
            if state["schema"] is not None
            else None
        )
        process_config_batch(
            spark, cfg, table, batch_df, batch_id, mapper=mapper, main_src=main_src
        )

    def process(batch_df: DataFrame, batch_id: int) -> None:
        state["n"] += 1
        if state["schema"] is not None and state["n"] % schema_refresh_batches == 0:
            state["schema"] = _infer_schema()
        try:
            _run(batch_df, batch_id)
        except Exception as exc:  # noqa: BLE001 — dead-letter boundary
            # A stale pinned schema is one known failure cause; retry once
            # against a freshly inferred one before giving the batch up.
            retried = False
            if state["schema"] is not None:
                fresh = _infer_schema()
                if fresh != state["schema"]:
                    state["schema"] = fresh
                    retried = True
            if retried:
                try:
                    _run(batch_df, batch_id)
                    return
                except Exception as exc2:  # noqa: BLE001
                    exc = exc2
            if on_error is None:
                raise exc
            on_error(batch_id, batch_df, exc)

    writer = changelog.writeStream.foreachBatch(process).option("checkpointLocation", checkpoint_dir)
    writer = writer.trigger(**(trigger or {"availableNow": True}))
    return writer.start()
