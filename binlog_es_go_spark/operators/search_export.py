"""Search-index bulk-action export: the reference's LAST MILE, in-engine.

The reference's output side builds Elasticsearch ``_bulk`` payloads —
index/update actions with external versioning and delete actions, routed
by the crc32 shard of the document key (``pkg/es/writer.go:57-81,156-193``;
shard strategy ``pkg/realtime/helpers.go:104-123``). This module produces
the SAME action stream from a changelog or snapshot diff as a DataFrame,
so a migration keeps feeding an existing ES/OpenSearch cluster: each row
is one document's action metadata line + source line, ready for any bulk
HTTP shipper (``foreachPartition`` poster, Kafka topic, files).

Versioning maps 1:1: the reference stamps docs with a binlog-derived
version and ships ``version_type=external``; here the version is the
``(offset, seq)`` guard encoded as ``offset * 2^20 + seq`` — strictly
monotonic per key under the same ordering the MERGE enforces, so ES
resolves replayed/duplicated deliveries exactly like the lake does.

Two source modes, one formatter:

* ``bulk_index_actions(changelog_or_diff)`` — op + keys + payload rows
  (``snapshot_changes`` output or a flattened changelog) become actions;
* deletes emit a ``delete`` action (no source line), mirroring
  deleteOnDelete/deleteOnMissing routing into ``DeleteBulk``.

``mode="concat"`` builds the JSON by deterministic string concatenation
(string/integral payload columns only — cross-engine reproducible, the
DuckDB-oracle-checkable twin); ``mode="json"`` uses Spark's ``to_json``
(full escaping, any payload type — the production path).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# version = offset * 2^20 + seq: seq_in_tx is bounded well below 2^20 by
# the generator/stream contract, so ordering matches the (offset, seq)
# lexicographic guard exactly.
_SEQ_BITS = 20


def external_version(offset_col: str = "offset", seq_col: str | None = "seq_in_tx") -> Column:
    off = F.col(offset_col).cast("long")
    if seq_col is None:
        return off * F.lit(1 << _SEQ_BITS)
    return off * F.lit(1 << _SEQ_BITS) + F.coalesce(F.col(seq_col).cast("long"), F.lit(0))


def bulk_index_actions(
    changes: DataFrame,
    key_cols: list[str],
    payload_cols: list[str],
    index: str,
    op_col: str = "op",
    offset_col: str = "offset",
    seq_col: str | None = "seq_in_tx",
    n_shards: int | None = None,
    mode: str = "json",
) -> DataFrame:
    """One row per document action:

    ``_id`` (unit-less ``:``-joined key, the reference's PK-derived doc
    id), ``action`` in {index, delete}, ``version`` (external), ``shard``
    (crc32 routing when ``n_shards`` given — the reference's
    ``crc32_ieee_uint32 % n``), ``action_line`` and ``source_line`` (null
    for deletes) — concatenate pairwise for a ready ``_bulk`` body.
    """
    if mode not in ("json", "concat"):
        raise ValueError(f"mode must be 'json' or 'concat', got {mode!r}")
    doc_id = F.concat_ws(":", *[F.coalesce(F.col(c).cast("string"), F.lit("")) for c in key_cols])
    is_delete = F.col(op_col) == "delete"
    action = F.when(is_delete, F.lit("delete")).otherwise(F.lit("index"))
    version = external_version(offset_col, seq_col)

    action_line = F.concat(
        F.lit('{"'), action, F.lit('":{"_index":"'), F.lit(index),
        F.lit('","_id":"'), doc_id,
        F.lit('","version":'), version.cast("string"),
        F.lit(',"version_type":"external"}}'),
    )
    if mode == "json":
        src = F.to_json(F.struct(*[F.col(c) for c in payload_cols]))
    else:
        parts = []
        for i, c in enumerate(payload_cols):
            prefix = '{"' if i == 0 else ',"'
            parts.append(F.lit(f'{prefix}{c}":'))
            parts.append(
                F.when(F.col(c).isNull(), F.lit("null")).otherwise(
                    F.concat(F.lit('"'), F.col(c).cast("string"), F.lit('"'))
                )
            )
        parts.append(F.lit("}"))
        src = F.concat(*parts)
    source_line = F.when(~is_delete, src)

    out = changes.select(
        doc_id.alias("_id"),
        action.alias("action"),
        version.alias("version"),
        action_line.alias("action_line"),
        source_line.alias("source_line"),
    )
    if n_shards is not None:
        from binlog_es_go_spark.lake.table import khash_expr

        shard = F.pmod(khash_expr(key_cols), F.lit(n_shards)).cast("int")
        out = changes.select(
            doc_id.alias("_id"),
            action.alias("action"),
            version.alias("version"),
            shard.alias("shard"),
            action_line.alias("action_line"),
            source_line.alias("source_line"),
        )
    return out


def bulk_bodies(actions: DataFrame, max_actions_per_body: int = 1000) -> DataFrame:
    """Group action rows into ``_bulk`` request bodies: NDJSON strings of
    at most ``max_actions_per_body`` actions, grouped by shard when
    present (the reference flushes per-shard bulks of bounded size,
    ``pkg/pipeline/sink/bulkwriter.go``). Distributed: bodies are built
    per (shard, chunk) group — no driver collect."""
    cols = actions.columns
    grp = ["shard"] if "shard" in cols else []
    w_cols = [F.col(c) for c in grp] or [F.lit(0)]
    from pyspark.sql import Window

    rn = F.row_number().over(Window.partitionBy(*w_cols).orderBy(F.col("_id"), F.col("version")))
    chunked = actions.withColumn("_chunk", ((rn - 1) / F.lit(max_actions_per_body)).cast("int"))
    line = F.when(
        F.col("source_line").isNotNull(),
        F.concat(F.col("action_line"), F.lit("\n"), F.col("source_line")),
    ).otherwise(F.col("action_line"))
    return (
        chunked.withColumn("_line", line)
        .groupBy(*grp, "_chunk")
        .agg(
            F.count("*").alias("n_actions"),
            F.concat_ws("\n", F.array_sort(F.collect_list(F.col("_line")))).alias("body"),
        )
        .drop("_chunk")
    )
