"""Config validation, preflight self-check, metrics listener, maintenance."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from binlog_es_go_spark.cdc.apply import apply_batch, applied_offsets
from binlog_es_go_spark.cdc.events import generate_changelog
from binlog_es_go_spark.cdc.metrics import LakeMetricsListener, lag_summary, read_metrics
from binlog_es_go_spark.cdc.preflight import run_preflight
from binlog_es_go_spark.cdc.stream import run_tail_until_drained
from binlog_es_go_spark.config import (
    BulkConfig,
    EnrichmentJoin,
    SyncTaskConfig,
    TransformSpec,
    build_mapper,
)
from binlog_es_go_spark.lake.maintenance import compact, expire_snapshots, table_stats
from binlog_es_go_spark.lake.table import LakeTable

PAYLOAD = T.StructType([T.StructField(n, T.StringType()) for n in ["repo", "path", "commit", "lang", "content"]])


def test_config_validate():
    good = SyncTaskConfig(name="t", target_table_path="/tmp/x")
    assert good.validate() == []
    bad = SyncTaskConfig(
        name="t",
        target_table_path="/tmp/x",
        key_cols=[],
        transforms=[TransformSpec(kind="nope", field="f"), TransformSpec(kind="json_decode", field="g")],
        enrichments=[EnrichmentJoin(table_path="/tmp/d", on=["k"], kind="one_to_many")],
    )
    problems = bad.validate()
    assert len(problems) == 4


def test_preflight_pass_and_fail(spark, tmp_path):
    events_dir = str(tmp_path / "ev")
    generate_changelog(spark, 200, n_repos=5, paths_per_repo=5).write.parquet(events_dir)
    table_path = str(tmp_path / "t")
    LakeTable.create(spark, table_path, PAYLOAD, key_cols=["repo", "path"], n_buckets=8)
    dim_path = str(tmp_path / "dim")
    spark.createDataFrame([("py", "Python")], ["lang", "lang_name"]).write.parquet(dim_path)

    cfg = SyncTaskConfig(
        name="task",
        target_table_path=table_path,
        n_buckets=8,
        enrichments=[EnrichmentJoin(table_path=dim_path, on=["lang"], kind="dim")],
    )
    rep = run_preflight(spark, cfg, changelog_dir=events_dir, checkpoint_dir=str(tmp_path / "ckpt"))
    assert rep.ok, str(rep)

    # recompute-mode checks: good source passes, bad join col fails
    from binlog_es_go_spark.config import RelatedQueryConfig

    src_path = str(tmp_path / "src")
    spark.createDataFrame(
        [("o/r", "a.txt", "py")], ["repo", "path", "lang"]
    ).write.parquet(src_path)
    cfg_rc = SyncTaskConfig(
        name="rc", target_table_path=table_path, n_buckets=8,
        main_table_path=src_path,
        related_queries=[RelatedQueryConfig(child_table="langs", join_cols=["lang"], parent_key_cols=["repo", "path"])],
    )
    assert run_preflight(spark, cfg_rc).ok
    cfg_rc_bad = SyncTaskConfig(
        name="rcb", target_table_path=table_path, n_buckets=8,
        main_table_path=src_path,
        related_queries=[RelatedQueryConfig(child_table="langs", join_cols=["nope"], parent_key_cols=["repo", "path"])],
    )
    rep_bad = run_preflight(spark, cfg_rc_bad)
    assert not rep_bad.ok and any(n.startswith("related[") and not p for n, p, _ in rep_bad.checks)

    # failing variants: absent target, bucket mismatch, bad enrichment col
    cfg2 = SyncTaskConfig(name="t2", target_table_path=str(tmp_path / "missing"))
    assert not run_preflight(spark, cfg2).ok
    cfg3 = SyncTaskConfig(
        name="t3", target_table_path=table_path, n_buckets=99,
        enrichments=[EnrichmentJoin(table_path=dim_path, on=["not_a_col"], kind="dim")],
    )
    rep3 = run_preflight(spark, cfg3)
    failed = {n for n, p, _ in rep3.checks if not p}
    assert "target.n_buckets" in failed and any("enrichment" in f for f in failed)


def test_build_mapper_enrich_and_transform(spark, tmp_path):
    dim_path = str(tmp_path / "langdim")
    spark.createDataFrame(
        [(l, l.upper()) for l in ["py", "go", "rs", "md", "js", "c", "java", "rb"]], ["lang", "lang_name"]
    ).write.parquet(dim_path)
    cfg = SyncTaskConfig(
        name="m",
        target_table_path=str(tmp_path / "t"),
        enrichments=[EnrichmentJoin(table_path=dim_path, on=["lang"], kind="dim")],
        transforms=[TransformSpec(kind="split_string", field="tags", separator=";")],
    )
    mapper = build_mapper(spark, cfg)
    df = spark.createDataFrame([("r", "p", "py", "a;b; c")], ["repo", "path", "lang", "tags"])
    out = mapper(df).collect()[0]
    assert out["lang_name"] == "PY" and out["tags"] == ["a", "b", "c"]


def test_mapper_in_apply_pipeline(spark, tmp_path):
    """Full pipeline with config-compiled mapper: enrichment lands in the lake."""
    dim_path = str(tmp_path / "ld")
    spark.createDataFrame(
        [(l, l.upper()) for l in ["py", "go", "rs", "md", "js", "c", "java", "rb"]], ["lang", "lang_name"]
    ).write.parquet(dim_path)
    enriched_schema = T.StructType(PAYLOAD.fields + [T.StructField("lang_name", T.StringType())])
    t = LakeTable.create(spark, str(tmp_path / "lk"), enriched_schema, key_cols=["repo", "path"], n_buckets=8)
    cfg = SyncTaskConfig(
        name="m", target_table_path=t.root,
        enrichments=[EnrichmentJoin(table_path=dim_path, on=["lang"], kind="dim")],
    )
    log = generate_changelog(spark, 500, n_repos=10, paths_per_repo=10, delete_ratio=0.0)
    apply_batch(t, log, mapper=build_mapper(spark, cfg), batch_id=0)
    got = t.read()
    assert got.filter(F.col("lang_name").isNull()).count() == 0
    assert got.filter(F.upper("lang") == F.col("lang_name")).count() == got.count()


def test_metrics_listener(spark, tmp_path):
    events_dir, ckpt, mdir = str(tmp_path / "ev"), str(tmp_path / "ck"), str(tmp_path / "metrics")
    generate_changelog(spark, 1000, n_repos=10, paths_per_repo=10).coalesce(2).write.parquet(events_dir)
    t = LakeTable.create(spark, str(tmp_path / "t"), PAYLOAD, key_cols=["repo", "path"], n_buckets=8)
    listener = LakeMetricsListener(spark, mdir)
    spark.streams.addListener(listener)
    try:
        run_tail_until_drained(t, spark, events_dir, ckpt, timeout_sec=300)
        assert listener.wait_for(1), "no progress events arrived"
        listener.flush()
    finally:
        spark.streams.removeListener(listener)
    m = read_metrics(spark, mdir)
    assert m.count() >= 1
    # numInputRows counts source-rows-read per action; the pruned apply
    # path runs 2 actions per batch (metadata scan + merge write), so the
    # counter is a multiple of the event count
    total = m.agg(F.sum("num_input_rows")).first()[0]
    assert total >= 1000 and total % 1000 == 0
    summary = lag_summary(spark, mdir).first()
    assert summary["n_batches"] >= 1


def test_metrics_http_endpoint(spark, tmp_path):
    """Live /metrics + /healthz probe of a (simulated) running tail —
    pkg/metrics/metrics.go:9-80 analog."""
    import types
    import urllib.request

    from binlog_es_go_spark.cdc.metrics import LakeMetricsListener, MetricsServer

    li = LakeMetricsListener(spark, str(tmp_path / "m"))
    progress = types.SimpleNamespace(
        id="q-1", batchId=7, timestamp="2026-01-01T00:00:00Z", numInputRows=1234,
        inputRowsPerSecond=100.0, processedRowsPerSecond=456.7, batchDuration=89,
        sources=[],
    )
    li.onQueryProgress(types.SimpleNamespace(progress=progress))

    healthy = {"v": True}
    srv = MetricsServer(li, port=0, health_probe=lambda: healthy["v"])
    port = srv.start()
    try:
        body = urllib.request.urlopen(f"http://127.0.0.1:{port}/metrics").read().decode()
        assert "binlog_spark_batches_total 1" in body
        assert "binlog_spark_rows_total 1234" in body
        assert 'binlog_spark_process_rows_per_sec{query="q-1"} 456.7' in body
        assert urllib.request.urlopen(f"http://127.0.0.1:{port}/healthz").read() == b"ok"
        healthy["v"] = False
        import urllib.error

        try:
            urllib.request.urlopen(f"http://127.0.0.1:{port}/healthz")
            raise AssertionError("expected 503")
        except urllib.error.HTTPError as e:
            assert e.code == 503
    finally:
        srv.stop()


def test_compaction_preserves_state_and_shrinks_files(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), PAYLOAD, key_cols=["repo", "path"], n_buckets=8)
    log = generate_changelog(spark, 3000, n_repos=20, paths_per_repo=10, delete_ratio=0.15)
    for i in range(3):
        apply_batch(t, log.filter((F.col("offset") >= i * 1000) & (F.col("offset") < (i + 1) * 1000)), batch_id=i)
    before = table_stats(t)
    digest_before = sorted(tuple(r) for r in t.read().select("repo", "path", "content").collect())
    watermark = min(applied_offsets(t).values())
    compact(t, drop_tombstones_below=watermark)
    after = table_stats(t)
    digest_after = sorted(tuple(r) for r in t.read().select("repo", "path", "content").collect())
    assert digest_after == digest_before        # visible state unchanged
    assert after["files"] <= before["files"]
    assert after["tombstones"] < before["tombstones"] or before["tombstones"] == 0

    # fresh dirs are protected by the in-progress-commit age guard: a
    # default-retention call removes nothing, an aged-out call removes
    assert expire_snapshots(t, keep_last=1) == []
    removed = expire_snapshots(t, keep_last=1, min_age_sec=0)
    assert removed, "old snapshot files should be deleted"
    # current snapshot still fully readable
    assert sorted(tuple(r) for r in t.read().select("repo", "path", "content").collect()) == digest_before


def test_expire_keeps_time_travel_window(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), PAYLOAD, key_cols=["repo", "path"], n_buckets=4)
    log = generate_changelog(spark, 400, n_repos=5, paths_per_repo=5, delete_ratio=0.0)
    apply_batch(t, log.filter("offset < 200"), batch_id=0)
    v1 = t.current_version()
    n1 = t.read().count()
    apply_batch(t, log.filter("offset >= 200"), batch_id=1)
    expire_snapshots(t, keep_last=2, min_age_sec=0)  # keeps v1 and v2
    assert t.read(version=v1).count() == n1  # time-travel within window intact
