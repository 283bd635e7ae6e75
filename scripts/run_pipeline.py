"""CLI entrypoint: the reference's four run modes, spark-submit-able.

Reference: ``cmd/binlog-es-go/main.go:483-499`` — ``--mode`` in
{realtime, bootstrap, self-check, replay-deadletters}. Same surface here:

    spark-submit --py-files binlog_es_go_spark.zip scripts/run_pipeline.py \
        --mode realtime --target /lake/repo_files --events /changelog \
        --checkpoint /ckpt --stream-partitions 32

    python scripts/run_pipeline.py --mode self-check --target /tmp/lake \
        --events /tmp/changelog

Local runs build a local[N] session; under spark-submit the existing
session/cluster is used (getOrCreate).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser(description="binlog-es-go-spark pipeline runner")
    ap.add_argument("--mode", required=True,
                    choices=["realtime", "bootstrap", "self-check", "replay-deadletters",
                             "compact", "expire-snapshots", "stats", "replicate", "export",
                             "compact-deltas", "rebucket", "lsh-index"])
    ap.add_argument("--target", help="lake table root (or target_table_path from --config)")
    ap.add_argument("--events", help="changelog parquet dir (realtime/self-check)")
    ap.add_argument("--source", help="base-table parquet (bootstrap/replay)")
    ap.add_argument("--checkpoint", help="streaming checkpoint dir (realtime)")
    ap.add_argument("--deadletters", help="dead-letter log dir")
    ap.add_argument("--config", help="YAML sync-task config (pkg/config/load.go analog); "
                                     "declares enrichments/relatedQuery/deleteOnMissing")
    ap.add_argument("--key-cols", default="repo,path")
    ap.add_argument("--n-buckets", type=int, default=64)
    ap.add_argument("--stream-partitions", type=int, default=None)
    ap.add_argument("--epoch-offset", type=int, default=0, help="bootstrap epoch (bootstrap/replay)")
    ap.add_argument("--where", default=None, help="bootstrap WHERE pushdown")
    ap.add_argument("--timeout-sec", type=float, default=3600)
    ap.add_argument("--cores", type=int, default=None, help="local[N] when no session exists")
    # maintenance / replication modes
    ap.add_argument("--drop-tombstones", action="store_true",
                    help="compact: GC tombstones below the applied-offset watermark "
                         "(records tombstone_gc_version; snapshot diffs spanning it will refuse)")
    ap.add_argument("--keep-last", type=int, default=2, help="expire-snapshots: versions to retain")
    ap.add_argument("--max-files-per-bucket", type=int, default=None,
                    help="compact: only fold buckets above this file count "
                         "(partial compaction — the file-COW maintenance loop)")
    ap.add_argument("--target-files-per-bucket", type=int, default=1,
                    help="compact: range files per compacted bucket")
    ap.add_argument("--min-age-sec", type=float, default=600.0,
                    help="expire-snapshots: never delete commit dirs younger than this")
    ap.add_argument("--new-n-buckets", type=int, default=None,
                    help="rebucket: the new bucket count")
    ap.add_argument("--replica", help="replicate: target lake table root")
    ap.add_argument("--from-version", type=int, default=None, help="replicate: source version floor")
    ap.add_argument("--allow-missing-deletes", action="store_true",
                    help="replicate/export: accept a diff that spans a tombstone GC "
                         "(insert/update-only semantics for the GC'd range)")
    ap.add_argument("--out", help="export: output dir for _bulk bodies (parquet)")
    ap.add_argument("--index", default="docs", help="export: search index name")
    ap.add_argument("--n-shards", type=int, default=None, help="export: crc32 routing shards")
    ap.add_argument("--max-actions-per-body", type=int, default=1000)
    ap.add_argument("--ship-url", default=None,
                    help="export: POST the bodies to this search cluster's /_bulk from "
                         "the executors (retry ladder + 413 splitting; delivery report "
                         "written next to the bodies) instead of only writing files")
    ap.add_argument("--action-shape", default="index", choices=["index", "update"],
                    help="export: 'index' = external-version full-doc replace (wholesale "
                         "cutover); 'update' = the Go writer's doc_as_upsert stream "
                         "(safe to interleave with the reference during dual-writing)")
    ap.add_argument("--follow", action="store_true",
                    help="export: continuous delivery loop (the reference's steady-state "
                         "loop, pkg/realtime/loop.go:44-76): poll the table version, ship "
                         "each new snapshot range, advance the resume state only after "
                         "full delivery. Requires --ship-url; ship-only (no body files).")
    ap.add_argument("--poll-interval-sec", type=float, default=2.0,
                    help="export --follow: idle poll cadence")
    ap.add_argument("--max-rounds", type=int, default=None,
                    help="export --follow: stop after N loop rounds (default unbounded)")
    ap.add_argument("--until-idle", action="store_true",
                    help="export --follow: exit as soon as the table has no undelivered "
                         "range (catch-up jobs / tests)")
    ap.add_argument("--lsh-k", type=int, default=64, help="lsh-index: signature length")
    ap.add_argument("--lsh-bands", type=int, default=16, help="lsh-index: LSH bands")
    ap.add_argument("--lsh-hash", default="xxhash64", choices=["xxhash64", "md5"],
                    help="lsh-index: base hash (md5 = cross-engine-checkable)")
    ap.add_argument("--id-col", default="doc_id", help="lsh-index: document key column")
    ap.add_argument("--text-col", default="text", help="lsh-index: document text column")
    ap.add_argument("--sig-store", default="inline", choices=["inline", "table"],
                    help="lsh-index: signature layout (table = sigs once per doc in a "
                         "sibling lake table; ~4x less index bytes, second commit per batch)")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from binlog_es_go_spark.session import build_session

    spark = SparkSession.getActiveSession() or build_session("pipeline", parallelism=args.cores)
    key_cols = args.key_cols.split(",")

    from binlog_es_go_spark.config import SyncTaskConfig, load_config
    from binlog_es_go_spark.lake.table import LakeTable

    if args.config:
        cfg = load_config(args.config)
        key_cols = cfg.key_cols
        if args.target:
            import dataclasses

            cfg = dataclasses.replace(cfg, target_table_path=args.target)
    else:
        if not args.target:
            ap.error("--target is required without --config")
        cfg = SyncTaskConfig(
            name="cli", target_table_path=args.target, key_cols=key_cols,
            n_buckets=args.n_buckets, stream_partitions=args.stream_partitions,
        )

    if args.mode == "export":
        # incremental search-index feed: snapshot diff -> ES _bulk bodies
        # (the reference's output side, pkg/es/writer.go, as files a bulk
        # HTTP shipper drains). Resume position rides a sidecar state file
        # in the output dir — the exporter is a consumer and must not
        # write into the source table's manifest.
        import json as _json

        from binlog_es_go_spark.lake.changes import snapshot_changes
        from binlog_es_go_spark.lake.merge import ENGINE_COLS
        from binlog_es_go_spark.lake.table import LakeTable
        from binlog_es_go_spark.operators.search_export import bulk_bodies, bulk_index_actions

        if not args.out:
            ap.error("--out is required for --mode export")
        table = LakeTable.load(spark, cfg.target_table_path)
        state_path = os.path.join(args.out, "_EXPORT_STATE.json")
        if args.follow:
            if not args.ship_url:
                ap.error("--follow requires --ship-url")
            from binlog_es_go_spark.operators.search_export import run_export_tail

            os.makedirs(args.out, exist_ok=True)
            summary = run_export_tail(
                table, args.ship_url, state_path, index=args.index,
                n_shards=args.n_shards, action_shape=args.action_shape,
                max_actions_per_body=args.max_actions_per_body,
                poll_interval_sec=args.poll_interval_sec,
                max_rounds=args.max_rounds, stop_when_idle=args.until_idle,
                allow_missing_deletes=args.allow_missing_deletes,
            )
            print(f"followed to v{summary['exported_through']}: "
                  f"{summary['rounds']} rounds, {summary['bodies']} bodies, "
                  f"{summary['errors']} errors, {summary['conflicts']} version conflicts")
            return 3 if summary["errors"] else 0
        exported_through = None
        if os.path.exists(state_path):
            with open(state_path) as f:
                exported_through = int(_json.load(f)["exported_through"])
        fresh = exported_through is None
        from_v = exported_through or 0
        to_v = table.current_version()
        if to_v <= from_v:
            print(f"export up to date (source v{to_v})")
            return 0
        snap = table.snapshot()
        payload_cols = [
            f.name for f in snap.schema.fields
            if f.name not in snap.key_cols and f.name not in ENGINE_COLS
        ]
        changes = snapshot_changes(
            table, from_v, to_v,
            allow_missing_deletes=args.allow_missing_deletes or (fresh and from_v == 0),
        )
        acts = bulk_index_actions(
            changes, snap.key_cols, payload_cols, index=args.index,
            n_shards=args.n_shards, mode="json", action_shape=args.action_shape,
        )
        bodies = bulk_bodies(acts, max_actions_per_body=args.max_actions_per_body)
        out_dir = os.path.join(args.out, f"v{from_v}-v{to_v}")
        bodies.write.parquet(out_dir, mode="errorifexists")
        if args.ship_url:
            # last mile over HTTP: deliver what was just persisted (the
            # files are the audit/replay record; the report row per body
            # carries attempts/conflicts for the recompute pass)
            from binlog_es_go_spark.operators.search_export import ship_bulk_bodies

            report = ship_bulk_bodies(spark.read.parquet(out_dir), args.ship_url)
            report.write.parquet(out_dir + "_delivery", mode="errorifexists")
            rep = spark.read.parquet(out_dir + "_delivery")
            n_err = rep.filter(rep.status == "error").count()
            n_conf = rep.selectExpr("sum(size(conflicted_ids)) c").collect()[0]["c"] or 0
            print(f"shipped to {args.ship_url}: {rep.count()} bodies, "
                  f"{n_err} errors, {n_conf} version conflicts")
            if n_err:
                return 3
        os.makedirs(args.out, exist_ok=True)
        tmp = state_path + ".tmp"
        with open(tmp, "w") as f:
            _json.dump({"exported_through": to_v, "source": cfg.target_table_path}, f)
        os.replace(tmp, state_path)
        print(f"exported v{from_v}..v{to_v} -> {out_dir}")
        return 0

    if args.mode == "rebucket":
        # bucket-count evolution: one atomic whole-table rewrite commit
        # (lake/maintenance.rebucket; Iceberg REPLACE PARTITION FIELD analog)
        from binlog_es_go_spark.lake.maintenance import rebucket

        if args.new_n_buckets is None:
            ap.error("--new-n-buckets is required for --mode rebucket")
        table = LakeTable.load(spark, cfg.target_table_path)
        old = table.snapshot().n_buckets
        v = rebucket(table, args.new_n_buckets,
                     target_files_per_bucket=args.target_files_per_bucket)
        print(f"rebucketed {old} -> {table.snapshot().n_buckets} buckets at v{v}")
        return 0

    if args.mode == "compact-deltas":
        # fold pending merge-on-read deltas into base files (the
        # maintenance half of the delta-append tail; see lake/maintenance)
        from binlog_es_go_spark.lake.maintenance import compact_deltas

        table = LakeTable.load(spark, cfg.target_table_path)
        v = compact_deltas(table)
        print("no deltas pending" if v is None else f"folded deltas -> v{v}")
        return 0

    if args.mode in ("compact", "expire-snapshots", "stats", "replicate"):
        # lake maintenance (the Iceberg rewrite_data_files / expire_snapshots
        # / replication analog; no reference equivalent — ES merges segments)
        table = LakeTable.load(spark, cfg.target_table_path)
        if args.mode == "compact":
            from binlog_es_go_spark.cdc.apply import applied_offsets
            from binlog_es_go_spark.lake.maintenance import compact

            wm = None
            if args.drop_tombstones:
                offs = applied_offsets(table)
                if not offs:
                    ap.error("--drop-tombstones needs applied offsets in the manifest")
                wm = min(offs.values())
            buckets = None
            if args.max_files_per_bucket is not None:
                from binlog_es_go_spark.lake.maintenance import small_file_buckets

                buckets = small_file_buckets(table, args.max_files_per_bucket)
                if not buckets:
                    print("no bucket exceeds the file threshold; nothing to compact")
                    return 0
            v = compact(table, target_files_per_bucket=args.target_files_per_bucket,
                        drop_tombstones_below=wm, buckets=buckets)
            scope = f" ({len(buckets)} buckets)" if buckets is not None else ""
            print(f"compacted -> v{v}{scope}" + (f" (tombstones below {wm} dropped)" if wm is not None else ""))
            return 0
        if args.mode == "expire-snapshots":
            from binlog_es_go_spark.lake.maintenance import expire_snapshots

            removed = expire_snapshots(table, keep_last=args.keep_last, min_age_sec=args.min_age_sec)
            print(f"expired {len(removed)} data files")
            return 0
        if args.mode == "stats":
            from binlog_es_go_spark.lake.maintenance import table_stats

            print(table_stats(table))
            return 0
        # replicate: incremental lake-to-lake sync from the replica's own
        # recorded position (snapshot diff through the apply core)
        from binlog_es_go_spark.lake.changes import replicate_changes

        if not args.replica:
            ap.error("--replica is required for --mode replicate")
        if not LakeTable.exists(args.replica):
            src_snap = table.snapshot()
            user_fields = [
                f for f in src_snap.schema.fields
                if f.name not in ("last_offset", "last_seq", "last_op", "_deleted", "updated_at", "_khash")
            ]
            from pyspark.sql import types as T

            LakeTable.create(spark, args.replica, T.StructType(user_fields),
                             key_cols=src_snap.key_cols, n_buckets=src_snap.n_buckets)
        replica = LakeTable.load(spark, args.replica)
        replicated_through = replica.snapshot().properties.get("replicated_through")
        fresh = replicated_through is None  # nothing replicated yet
        from_v = args.from_version
        if from_v is None:
            # resume from the replica's own recorded position
            from_v = int(replicated_through or 0)
        elif fresh and from_v > 0:
            # a fresh replica diffed from v>0 would silently miss every key
            # whose last change predates from_v — an incomplete replica
            ap.error(f"--from-version {from_v} on a fresh replica would build an "
                     "incomplete replica; omit it (first sync must diff from v0)")
        # A v0 diff into an empty replica is safe even across a tombstone
        # GC: a GC'd delete is a key invisible on BOTH sides, so nothing is
        # missed — auto-allow instead of failing first-time replication of
        # a compacted source with TombstoneRetentionError.
        allow_missing = args.allow_missing_deletes or (fresh and from_v == 0)
        to_v = table.current_version()
        if to_v <= from_v:
            print(f"replica up to date (source v{to_v})")
            return 0
        res = replicate_changes(table, replica, from_v, to_v,
                                allow_missing_deletes=allow_missing)
        print(f"replicated v{from_v}..v{to_v} -> replica v{res.version}")
        return 0

    if args.mode == "self-check":
        from binlog_es_go_spark.cdc.preflight import run_preflight

        report = run_preflight(spark, cfg, changelog_dir=args.events, checkpoint_dir=args.checkpoint)
        print(report)
        return 0 if report.ok else 1

    if args.mode == "bootstrap":
        from binlog_es_go_spark.cdc.bootstrap import run_full_scan

        source = spark.read.parquet(args.source or cfg.main_table_path)
        if not LakeTable.exists(cfg.target_table_path):
            from pyspark.sql import types as T

            schema = T.StructType([f for f in source.schema.fields])
            LakeTable.create(spark, cfg.target_table_path, schema, key_cols=key_cols,
                             n_buckets=cfg.n_buckets)
        table = LakeTable.load(spark, cfg.target_table_path)
        # a config-declared bootstrap runs the same mapping as the tail
        # (the reference's bootstrap executes the mapping SQL per batch,
        # pkg/bootstrap/runner.go:369-418) — bare bootstrap stays raw
        mapper = None
        if args.config and (cfg.enrichments or cfg.transforms):
            from binlog_es_go_spark.config import build_mapper

            mapper = build_mapper(spark, cfg)
        res = run_full_scan(table, source, epoch_offset=args.epoch_offset, where=args.where,
                            mapper=mapper)
        print(f"bootstrap committed v{res.version} ({len(res.affected_buckets)} buckets, {res.wall_sec:.1f}s)")
        return 0

    if args.mode == "lsh-index":
        # near-dup index tail: same checkpointed loop as realtime, sink =
        # the incrementally-maintained banded LSH table (operators/lsh_index.py)
        from binlog_es_go_spark.operators.lsh_index import LshIndex

        if not (args.events and args.checkpoint):
            ap.error("--events and --checkpoint are required for --mode lsh-index")
        if LakeTable.exists(cfg.target_table_path):
            idx = LshIndex.load(spark, cfg.target_table_path)
        else:
            idx = LshIndex.create(
                spark, cfg.target_table_path, k=args.lsh_k, bands=args.lsh_bands,
                hash_fn=args.lsh_hash, n_buckets=args.n_buckets, sig_store=args.sig_store,
            )
        stream = spark.readStream.schema(spark.read.parquet(args.events).schema).parquet(args.events)
        q = idx.start_tail(
            stream, args.checkpoint, id_col=args.id_col, text_col=args.text_col,
            trigger={"availableNow": True},
        )
        if not q.awaitTermination(args.timeout_sec):
            q.stop()
            raise TimeoutError(f"stream did not drain within {args.timeout_sec}s")
        n = idx.band_rows().select("id").distinct().count()
        print(f"lsh-index drained; {n} docs indexed at {cfg.target_table_path}")
        return 0

    if args.mode == "realtime":
        from binlog_es_go_spark.cdc.deadletter import DeadLetterLog
        from binlog_es_go_spark.cdc.stream import run_tail_until_drained

        table = LakeTable.load(spark, cfg.target_table_path)
        on_error = None
        if args.deadletters:
            dl = DeadLetterLog(spark, args.deadletters)

            def on_error(bid, df, exc):  # noqa: ANN001
                dl.record_failure(df.select(*key_cols, "offset"), reason=str(exc)[:200],
                                  stage="merge", batch_id=bid)

        if args.config:
            # config-declared pipeline: enrichments, relatedQuery reverse
            # lookups, deleteOnMissing — all from the YAML
            from binlog_es_go_spark.cdc.pipeline import start_config_tail
            from binlog_es_go_spark.cdc.stream import changelog_stream

            stream = changelog_stream(
                spark, args.events,
                schema=spark.read.parquet(args.events).schema,
                max_files_per_trigger=cfg.bulk.max_files_per_trigger,
            )
            q = start_config_tail(spark, cfg, stream, args.checkpoint, on_error=on_error)
            if not q.awaitTermination(args.timeout_sec):
                q.stop()
                raise TimeoutError(f"stream did not drain within {args.timeout_sec}s")
        else:
            run_tail_until_drained(
                table, spark, args.events, args.checkpoint,
                timeout_sec=args.timeout_sec, on_error=on_error,
            )
        from binlog_es_go_spark.cdc.apply import applied_offsets

        print(f"tail drained; offsets: {applied_offsets(table)}")
        return 0

    # replay-deadletters (cmd/binlog-es-go/main.go:503-561 analog)
    from binlog_es_go_spark.cdc.deadletter import DeadLetterLog, replay_dead_letters

    table = LakeTable.load(spark, cfg.target_table_path)
    dl = DeadLetterLog(spark, args.deadletters)
    source = spark.read.parquet(args.source)
    res = replay_dead_letters(table, dl, source, epoch_offset=args.epoch_offset)
    print("nothing to replay" if res is None else f"replayed -> v{res.version}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
