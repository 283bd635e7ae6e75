"""Typed pipeline configuration — the reference's YAML config, as code.

The reference's YAML is its catalog (``pkg/config/types.go:4-14``): per-task
mapping (`_index`, `_id`, sql, mainTable, sharding, deleteOnDelete,
deleteOnMissing; :112-127), mappingTable (:98), relatedQuery (:145-155),
transforms (:158-168) and bulk/retry tuning (:170-179). Here the same
surface is a frozen dataclass tree; "SQL strings executed by MySQL" become
declarative enrichment specs executed by this engine (SURVEY.md §2.3).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class ShardingConfig:
    """Reference ``sharding`` (types.go:100-110): physical shard routing.

    In the lake design shards collapse into hash buckets; this survives as
    (a) parity checks against the reference's routing, (b) salting."""

    enabled: bool = False
    shards: int = 64
    strategy: str = "crc32_ieee_uint32"  # | crc32_ieee_signed_abs | mod


@dataclass(frozen=True)
class TransformSpec:
    """One transform application (types.go:158-168): kind in
    {split_string, json_decode, binary_to_string}, applied to ``field``."""

    kind: str
    field: str
    separator: str = ";"
    trim: bool = True
    json_schema: str | None = None  # DDL string for json_decode


@dataclass(frozen=True)
class EnrichmentJoin:
    """One mapping-SQL join (config.example.yaml:143-145): a lake table
    joined on ``on`` columns; kind in {one_to_one, dim, one_to_many}."""

    table_path: str
    on: list[str]
    kind: str = "one_to_one"
    agg_value: str | None = None      # one_to_many: expression to aggregate
    agg_order_by: list[str] = field(default_factory=list)
    agg_alias: str = "agg"
    agg_separator: str = ";"


@dataclass(frozen=True)
class RelatedQueryConfig:
    """Child-table reverse lookup (types.go:145-155): which changelog
    "table" feeds parent-key recompute, and how keys resolve."""

    child_table: str
    join_cols: list[str]
    parent_key_cols: list[str]
    direct_fk_cols: list[str] | None = None


@dataclass(frozen=True)
class BulkConfig:
    """Batch tuning (types.go:170-179; defaults loop.go:44-56). Spark owns
    batching; these map onto trigger/rate limits."""

    size: int = 100                      # bulk.size -> informational
    flush_interval_ms: int = 500         # -> trigger processingTime
    max_pending: int = 10_000            # -> maxFilesPerTrigger analog
    max_files_per_trigger: int | None = None


@dataclass(frozen=True)
class RetryConfig:
    """Retry/backoff (pkg/util/retry.go:9-32)."""

    max_attempts: int = 5
    backoff_ms: tuple[int, ...] = (200, 400, 800, 1600, 3200)


@dataclass(frozen=True)
class SyncTaskConfig:
    """One sync task (types.go:88-127): the whole pipeline declaration."""

    name: str
    target_table_path: str                      # `_index` analog
    key_cols: list[str] = field(default_factory=lambda: ["repo", "path"])  # `_id` analog
    main_table: str = "repo_files"              # mapping.mainTable analog
    # Lake path of the main table's source-of-truth state. When set, the
    # tail runs in RECOMPUTE mode (the reference's actual architecture,
    # pkg/realtime/flush.go:39-140): events only contribute KEYS; state is
    # re-read from here through the mapper, and keys whose recompute comes
    # back empty are deleted when ``delete_on_missing``. When None, events'
    # after-images apply directly (lake-native CDC mode).
    main_table_path: str | None = None
    relevant_tables: list[str] = field(default_factory=list)   # mappingTable keys
    table_rewrite_rules: list[tuple[str, str]] = field(default_factory=list)
    n_buckets: int = 64
    delete_on_delete: bool = True               # types.go:126
    delete_on_missing: bool = False             # README.md:91-99 semantics
    stream_partitions: int | None = None
    salt_partitions: int | None = None
    enrichments: list[EnrichmentJoin] = field(default_factory=list)
    related_queries: list[RelatedQueryConfig] = field(default_factory=list)
    transforms: list[TransformSpec] = field(default_factory=list)
    bulk: BulkConfig = field(default_factory=BulkConfig)
    retry: RetryConfig = field(default_factory=RetryConfig)

    def validate(self) -> list[str]:
        """Static config sanity (part of the self-check surface,
        cmd/binlog-es-go/main.go:140-152)."""
        problems = []
        if not self.key_cols:
            problems.append("key_cols must be non-empty")
        if self.n_buckets < 1:
            problems.append("n_buckets must be >= 1")
        for t in self.transforms:
            if t.kind not in ("split_string", "json_decode", "binary_to_string"):
                problems.append(f"unknown transform kind {t.kind!r}")
            if t.kind == "json_decode" and not t.json_schema:
                problems.append(f"json_decode on {t.field!r} needs json_schema")
        for e in self.enrichments:
            if e.kind not in ("one_to_one", "dim", "one_to_many"):
                problems.append(f"unknown enrichment kind {e.kind!r}")
            if e.kind == "one_to_many" and not e.agg_value:
                problems.append(f"one_to_many join on {e.on} needs agg_value")
        if self.related_queries and not self.main_table_path:
            problems.append("related_queries require main_table_path (recompute source)")
        if self.delete_on_missing and not self.main_table_path:
            problems.append("delete_on_missing requires main_table_path (recompute source)")
        for rq in self.related_queries:
            if not rq.join_cols and not rq.direct_fk_cols:
                problems.append(f"related query on {rq.child_table!r} needs join_cols or direct_fk_cols")
        return problems


def config_from_dict(raw: dict) -> SyncTaskConfig:
    """Build a SyncTaskConfig from a plain dict (parsed YAML/JSON)."""
    def _keys(d: dict) -> dict:
        # YAML 1.1 parses a bare `on:` key as boolean True — map it back
        # (EnrichmentJoin's join-column field is literally named "on")
        return {("on" if k is True else str(k)): v for k, v in d.items()}

    raw = dict(raw)
    enrichments = [EnrichmentJoin(**_keys(e)) for e in raw.pop("enrichments", [])]
    related = [RelatedQueryConfig(**r) for r in raw.pop("related_queries", [])]
    transforms = [TransformSpec(**t) for t in raw.pop("transforms", [])]
    bulk = BulkConfig(**raw.pop("bulk", {}))
    retry_raw = dict(raw.pop("retry", {}))
    if "backoff_ms" in retry_raw:
        retry_raw["backoff_ms"] = tuple(retry_raw["backoff_ms"])
    retry = RetryConfig(**retry_raw)
    if "table_rewrite_rules" in raw:
        raw["table_rewrite_rules"] = [tuple(r) for r in raw["table_rewrite_rules"]]
    return SyncTaskConfig(
        enrichments=enrichments, related_queries=related, transforms=transforms,
        bulk=bulk, retry=retry, **raw,
    )


def load_config(path: str) -> SyncTaskConfig:
    """YAML/JSON config-file loader — the ``pkg/config/load.go`` analog.

    The file is one sync-task document whose keys mirror SyncTaskConfig
    fields (see configs/example.yaml). JSON is accepted too (YAML superset).
    """
    import yaml

    with open(path) as f:
        raw = yaml.safe_load(f)
    if not isinstance(raw, dict):
        raise ValueError(f"config file {path} must contain a mapping, got {type(raw).__name__}")
    cfg = config_from_dict(raw)
    problems = cfg.validate()
    if problems:
        raise ValueError(f"invalid config {path}: {problems}")
    return cfg


def build_mapper(spark, cfg: SyncTaskConfig):
    """Compile a SyncTaskConfig's enrichments + transforms into the apply
    core's ``mapper`` callable (the executable form of the mapping SQL)."""
    from pyspark.sql import functions as F

    from binlog_es_go_spark.operators.enrichment import enrich_documents, ordered_group_concat
    from binlog_es_go_spark.operators.transforms import json_decode_field, split_string_field

    def mapper(df):
        one_to_one, dims, one_to_many = [], [], None
        for e in cfg.enrichments:
            tbl = spark.read.parquet(e.table_path)
            if e.kind == "one_to_one":
                one_to_one.append((tbl, e.on))
            elif e.kind == "dim":
                dims.append((tbl, e.on))
            else:
                agg = ordered_group_concat(
                    F.expr(e.agg_value), [F.expr(c) for c in e.agg_order_by] or [F.expr(e.agg_value)],
                    sep=e.agg_separator,
                ).alias(e.agg_alias)
                one_to_many = (tbl, e.on, agg)
        out = enrich_documents(df, cfg.key_cols, one_to_one=one_to_one, dims=dims, one_to_many=one_to_many)
        for t in cfg.transforms:
            if t.kind == "split_string":
                out = out.withColumn(t.field, split_string_field(t.field, t.separator, t.trim))
            elif t.kind == "json_decode":
                out = out.withColumn(t.field, json_decode_field(t.field, t.json_schema))
            elif t.kind == "binary_to_string":
                out = out.withColumn(t.field, F.col(t.field).cast("string"))
        return out

    return mapper
