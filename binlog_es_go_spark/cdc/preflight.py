"""Preflight self-check: validate the environment before starting a task.

The reference's ``--mode=self-check`` (cmd/binlog-es-go/main.go:79-185)
validates MySQL connectivity, ``binlog_format=ROW``, ``gtid_mode``,
``binlog_row_image``, ES ping, index existence, mappingTable sanity and
min/max permissions. The lake equivalents:

| reference check | here |
|---|---|
| MySQL connectivity + binlog_format | changelog source dir readable, schema has the changelog columns |
| gtid_mode / row image | offset + before/after columns present and typed |
| ES ping + index exists | target lake table loads; key columns match config |
| mappingTable sanity | config.validate() + enrichment tables readable |
| min/max permission probe | source table min/max(offset) probe |
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import SparkSession

from binlog_es_go_spark.config import SyncTaskConfig
from binlog_es_go_spark.lake.table import LakeTable

REQUIRED_CHANGELOG_COLS = {"offset", "partition_id", "seq_in_tx", "op", "ts"}


@dataclass
class PreflightReport:
    ok: bool = True
    checks: list[tuple[str, bool, str]] = field(default_factory=list)

    def add(self, name: str, passed: bool, detail: str = "") -> None:
        self.checks.append((name, passed, detail))
        self.ok = self.ok and passed

    def __str__(self) -> str:
        lines = [f"[{'OK' if p else 'FAIL'}] {n}" + (f" — {d}" if d else "") for n, p, d in self.checks]
        return "\n".join(lines + [f"preflight: {'PASS' if self.ok else 'FAIL'}"])


def run_preflight(
    spark: SparkSession,
    cfg: SyncTaskConfig,
    changelog_dir: str | None = None,
    checkpoint_dir: str | None = None,
) -> PreflightReport:
    r = PreflightReport()

    problems = cfg.validate()
    r.add("config", not problems, "; ".join(problems))

    if changelog_dir is not None:
        try:
            df = spark.read.parquet(changelog_dir)
            missing = REQUIRED_CHANGELOG_COLS - set(df.columns)
            key_missing = set(cfg.key_cols) - set(df.columns)
            r.add("changelog.columns", not missing and not key_missing,
                  f"missing={sorted(missing | key_missing)}" if (missing or key_missing) else "")
            # min/max probe (GetMinMax analog, pkg/db/mysql.go:26-41)
            from pyspark.sql import functions as F

            mm = df.agg(F.min("offset").alias("lo"), F.max("offset").alias("hi")).first()
            r.add("changelog.offset_range", mm["lo"] is not None, f"[{mm['lo']}, {mm['hi']}]")
        except Exception as e:  # noqa: BLE001
            r.add("changelog.readable", False, str(e)[:200])

    # target-table gate (fail-fast index-exists, pkg/bootstrap/runner.go:184-192)
    try:
        t = LakeTable.load(spark, cfg.target_table_path)
        snap = t.snapshot()
        r.add("target.exists", True, f"v{snap.version}")
        r.add("target.key_cols", snap.key_cols == cfg.key_cols,
              f"table={snap.key_cols} config={cfg.key_cols}")
        r.add("target.n_buckets", snap.n_buckets == cfg.n_buckets,
              f"table={snap.n_buckets} config={cfg.n_buckets}")
    except FileNotFoundError:
        r.add("target.exists", False, cfg.target_table_path)

    # recompute-mode source of truth (mapping-query target sanity)
    if cfg.main_table_path:
        try:
            src_cols = set(spark.read.parquet(cfg.main_table_path).columns)
            key_ok = set(cfg.key_cols) <= src_cols
            r.add("main_table.key_cols", key_ok,
                  f"keys {cfg.key_cols} vs source cols {sorted(src_cols)[:8]}")
            for rq in cfg.related_queries:
                join_ok = set(rq.join_cols) <= src_cols
                parent_ok = set(rq.parent_key_cols) <= src_cols
                r.add(f"related[{rq.child_table}]", join_ok and parent_ok,
                      f"join={rq.join_cols} parent={rq.parent_key_cols}")
        except Exception as ex:  # noqa: BLE001
            r.add("main_table.readable", False, str(ex)[:120])

    for e in cfg.enrichments:
        try:
            cols = set(spark.read.parquet(e.table_path).columns)
            r.add(f"enrichment[{e.table_path}]", set(e.on) <= cols,
                  f"join cols {e.on} vs table cols {sorted(cols)[:8]}")
        except Exception as ex:  # noqa: BLE001
            r.add(f"enrichment[{e.table_path}]", False, str(ex)[:120])

    if checkpoint_dir is not None:
        parent = os.path.dirname(checkpoint_dir.rstrip("/")) or "."
        writable = os.path.isdir(parent) and os.access(parent, os.W_OK)
        r.add("checkpoint.writable", writable, checkpoint_dir)

    return r
