"""Incremental reads: the row-level changelog BETWEEN two lake snapshots.

The reference is a one-way pipe (binlog -> index). A lake engine can close
the loop: every committed snapshot is a consistent version, so the diff
between two versions IS a changelog — the Iceberg "CDC read" /
`table.changes(from, to)` analog. Downstream consumers (a second lake
table, a search-index exporter, a cache invalidator) replay it through the
same ``apply_batch`` core, giving lake-to-lake incremental replication
with the exactly-once (offset, seq) guard for free.

Scale shape: only buckets whose FILE LISTS differ between the manifests
are read (bucket-pruned diff — a micro-batch commit touches few buckets,
so an incremental consumer reads O(changed data), never O(table)). The
old/new full-outer join then shuffles both pruned sides on the key; on a
real cluster the same layout maps onto Iceberg's storage-partitioned
join (both sides bucket(N, key)-partitioned), which elides that shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from binlog_es_go_spark.lake.merge import ENGINE_COLS
from binlog_es_go_spark.lake.table import DELETED_COL, LakeTable

# Reserved stream partition for replicated changelogs, alongside
# RECOMPUTE_PARTITION (-1, cdc/pipeline.py) and EPOCH_PARTITION (-2,
# cdc/bootstrap.py). Replication must NOT ride a real partition id: the
# target records the replicated max offset per partition in its
# stream_offsets property, and if the target also tails a real changelog,
# filter_unapplied would wrongly skip genuine events of that partition at
# or below the replicated offset.
REPLICATION_PARTITION = -3

# Manifest property set by compact(drop_tombstones_below=...): the first
# snapshot version whose tombstones below the offset watermark are gone.
GC_VERSION_PROP = "tombstone_gc_version"
GC_OFFSET_PROP = "tombstone_gc_offset"


class TombstoneRetentionError(ValueError):
    """A snapshot diff spans a compaction that GC'd tombstones, so deletes
    in the requested range may be unobservable (the Iceberg analog:
    changelog reads across expire_snapshots)."""


def changed_buckets(table: LakeTable, from_version: int, to_version: int) -> list[int]:
    """Buckets whose file lists differ between the two manifests, plus the
    buckets touched by merge-on-read delta files added or removed between
    them (delta rows change a bucket's state without changing its base
    file list)."""
    s_from = table.snapshot(from_version)
    s_to = table.snapshot(to_version)
    all_b = set(s_from.buckets) | set(s_to.buckets)
    out = {b for b in all_b if s_from.buckets.get(b) != s_to.buckets.get(b)}
    d_from, d_to = set(s_from.deltas or []), set(s_to.deltas or [])
    dmaps = {**(s_from.delta_buckets or {}), **(s_to.delta_buckets or {})}
    for rel in d_from ^ d_to:
        touched = dmaps.get(rel)
        if touched is None:
            # unknown span (pre-map manifest): conservatively all buckets
            return sorted(set(range(s_to.n_buckets)) | out)
        out.update(int(b) for b in touched)
    return sorted(out)


def changed_file_sets(
    table: LakeTable, from_version: int, to_version: int
) -> tuple[list[str], list[str]]:
    """(files only in FROM, files only in TO) — the file-granular diff
    scan set. Data files are immutable and a key lives in at most ONE
    file per bucket per version (every merge rewrites all files that
    could contain its keys and window-dedups; compaction likewise), so a
    file SHARED by both manifests contributes bit-identical rows to both
    sides whose keys changed in neither — they can only land in the
    diff's "no change" branch. Dropping shared files from BOTH sides
    therefore preserves the diff exactly while making an incremental read
    O(files actually rewritten), which under file-granular COW
    (lake/merge.py) is O(batch), not O(touched buckets)."""
    s_from = table.snapshot(from_version)
    s_to = table.snapshot(to_version)
    f_from = {p for fl in s_from.buckets.values() for p in fl}
    f_to = {p for fl in s_to.buckets.values() for p in fl}
    return sorted(f_from - f_to), sorted(f_to - f_from)


def snapshot_changes(
    table: LakeTable,
    from_version: int,
    to_version: int | None = None,
    allow_missing_deletes: bool = False,
) -> DataFrame:
    """Row-level diff ``from_version -> to_version`` as a changelog.

    Output: ``op`` in {insert, update, delete}, the key columns, the NEW
    payload (null for deletes), and ``offset``/``seq_in_tx``/``ts`` carried
    from the new row's guard columns — shaped so ``apply_batch`` on
    another table consumes it directly.

    Semantics per key (visible = exists and not tombstoned):
      invisible -> visible : insert
      visible   -> visible with a higher (offset, seq) : update
      visible   -> invisible : delete (offset from the tombstone)

    Retention contract (ENFORCED): a delete is only observable while its
    tombstone survives. ``compact(..., drop_tombstones_below=...)`` records
    the compacted version in manifest properties (``tombstone_gc_version``);
    a diff whose ``from_version`` predates that version spans the GC and
    may have lost deletes, so it raises :class:`TombstoneRetentionError`
    unless ``allow_missing_deletes=True`` (the same contract as Iceberg
    changelog reads vs expire_snapshots — consumers must keep up with the
    GC watermark or opt into insert/update-only semantics).
    """
    to_version = table.current_version() if to_version is None else to_version
    snap = table.snapshot(to_version)
    gc_version = int(snap.properties.get(GC_VERSION_PROP, -1))
    # The compaction's BASE (gc_version - 1) is the earliest safe
    # from_version: every tombstone the GC dropped was already a tombstone
    # (key invisible) at base, so a base->post diff emits no delete for it
    # correctly. Only diffs from BEFORE base can have a delete-in-range
    # whose tombstone is gone. (compact() records the watermark only when
    # it actually dropped at least one tombstone.)
    if gc_version >= 0 and from_version < gc_version - 1 and not allow_missing_deletes:
        raise TombstoneRetentionError(
            f"diff from v{from_version} spans the tombstone GC at v{gc_version} "
            f"(offsets below {snap.properties.get(GC_OFFSET_PROP)}): deletes in "
            f"range may be unobservable. Diff from >= v{gc_version - 1}, or pass "
            f"allow_missing_deletes=True for insert/update-only semantics."
        )
    key_cols = snap.key_cols
    s_from = table.snapshot(from_version)
    has_deltas = bool(s_from.deltas or []) or bool(snap.deltas or [])
    old_files, new_files = changed_file_sets(table, from_version, to_version)
    diff_buckets = changed_buckets(table, from_version, to_version) if has_deltas else []
    if not old_files and not new_files and not diff_buckets:
        return _empty_changelog(table, to_version)

    payload_cols = [
        f.name for f in snap.schema.fields
        if f.name not in key_cols
        and f.name not in ENGINE_COLS
    ]

    def side(version: int, tag: str, with_payload: bool) -> DataFrame:
        if has_deltas:
            # Merge-on-read deltas break the key-in-one-file invariant the
            # file-granular diff rests on (a key's state is the guard
            # winner across base∪delta, and a winning delta row can shadow
            # a SHARED base file's row). Fall back to bucket-granular
            # resolved reads of the changed buckets — exact, O(changed
            # buckets); diffs return to file-granular once compact_deltas
            # folds the debt.
            return _side_cols(
                table.read(
                    buckets=diff_buckets, include_deleted=True, version=version,
                    resolve_deltas=True,
                ),
                tag, with_payload,
            )
        # File-granular incremental read: only the files this version
        # does NOT share with the other side (see changed_file_sets for
        # why shared files cannot contribute diff rows).
        df = table.read(
            files=(old_files if tag == "o" else new_files),
            include_deleted=True,
            version=version,
        )
        return _side_cols(df, tag, with_payload)

    def _side_cols(df: DataFrame, tag: str, with_payload: bool) -> DataFrame:
        vis = ~F.coalesce(F.col(DELETED_COL), F.lit(False))
        cols = [
            *key_cols,
            vis.alias(f"{tag}_vis"),
            F.coalesce(F.col("last_offset"), F.lit(-1)).alias(f"{tag}_off"),
            F.coalesce(F.col("last_seq"), F.lit(0)).alias(f"{tag}_seq"),
        ]
        if with_payload:
            cols.extend(F.col(c).alias(f"{tag}_{c}") for c in payload_cols)
            cols.append(F.col("updated_at").alias(f"{tag}_ts"))
        return df.select(*cols)

    # The old side needs only key + visibility + guard columns: its payload
    # values never reach the output, and (schema evolution) columns added
    # after from_version don't exist in the old snapshot's schema at all.
    old = side(from_version, "o", with_payload=False)
    new = side(to_version, "n", with_payload=True)
    j = old.join(new, on=key_cols, how="full_outer")

    o_vis = F.coalesce(F.col("o_vis"), F.lit(False))
    n_vis = F.coalesce(F.col("n_vis"), F.lit(False))
    advanced = (F.col("n_off") > F.coalesce(F.col("o_off"), F.lit(-1))) | (
        (F.col("n_off") == F.col("o_off")) & (F.col("n_seq") > F.col("o_seq"))
    )
    op = (
        F.when(~o_vis & n_vis, F.lit("insert"))
        .when(o_vis & ~n_vis & F.col("n_off").isNotNull(), F.lit("delete"))
        .when(o_vis & n_vis & advanced, F.lit("update"))
        .otherwise(F.lit(None))
    )
    out = j.withColumn("op", op).filter(F.col("op").isNotNull())
    return out.select(
        F.col("op"),
        *key_cols,
        *[F.col(f"n_{c}").alias(c) for c in payload_cols],
        F.col("n_off").cast("long").alias("offset"),
        F.col("n_seq").cast("int").alias("seq_in_tx"),
        F.lit(REPLICATION_PARTITION).cast("int").alias("partition_id"),
        F.col("n_ts").cast("timestamp").alias("ts"),
    )


def _empty_changelog(table: LakeTable, version: int) -> DataFrame:
    snap = table.snapshot(version)
    key_cols = snap.key_cols
    payload_cols = [
        f.name for f in snap.schema.fields
        if f.name not in key_cols
        and f.name not in ENGINE_COLS
    ]
    df = table.read(buckets=[], version=version)
    return df.select(
        F.lit("insert").alias("op"),
        *key_cols,
        *payload_cols,
        F.lit(0).cast("long").alias("offset"),
        F.lit(0).cast("int").alias("seq_in_tx"),
        F.lit(REPLICATION_PARTITION).cast("int").alias("partition_id"),
        F.lit(None).cast("timestamp").alias("ts"),
    ).limit(0)


def replicate_changes(
    source: LakeTable,
    target: LakeTable,
    from_version: int,
    to_version: int | None = None,
    batch_id: int | None = None,
    allow_missing_deletes: bool = False,
):
    """Lake-to-lake incremental replication: feed the snapshot diff through
    the standard apply core (the target gets the same exactly-once
    (offset, seq) guard, so overlapping/replayed ranges are no-ops).
    Replicated events ride the reserved REPLICATION_PARTITION (-3) so the
    target's per-partition offset bookkeeping never collides with a real
    changelog's partitions. The consumed source version is recorded in the
    target manifest (``replicated_through``) atomically with the commit,
    so an incremental replicator resumes from its own recorded position
    (scripts/run_pipeline.py --mode replicate).

    ONE replication source per target, ENFORCED: all replicated events
    share the single reserved partition (-3), so a second source would
    interleave its unrelated offset sequence under the same key in
    ``stream_offsets`` and the two sources would overwrite each other's
    ``replicated_through`` resume position. The first replication stamps
    ``replication_source`` in the target manifest; a different source
    root raises instead of silently corrupting the bookkeeping (fan-IN
    needs one target table per source; fan-OUT — one source, many
    replicas — is unrestricted)."""
    import os as _os

    from binlog_es_go_spark.cdc.apply import apply_batch

    src_id = _os.path.abspath(source.root)
    prev_src = target.snapshot().properties.get("replication_source")
    if prev_src is not None and prev_src != src_id:
        raise ValueError(
            f"target already replicates from {prev_src}; refusing second source "
            f"{src_id} — replicated offsets and resume positions share one "
            "reserved partition and would overwrite each other (use one "
            "target table per replication source)"
        )
    to_version = source.current_version() if to_version is None else to_version
    changes = snapshot_changes(
        source, from_version, to_version, allow_missing_deletes=allow_missing_deletes
    )
    # apply_batch flattens 'after'; our diff is already flat — wrap payload
    key_cols = source.snapshot().key_cols
    payload_cols = [
        c for c in changes.columns
        if c not in key_cols and c not in ("op", "offset", "seq_in_tx", "partition_id", "ts")
    ]
    after_type = "struct<" + ",".join(
        f"{f.name}:{f.dataType.simpleString()}"
        for f in changes.schema.fields if f.name in payload_cols
    ) + ">"
    wrapped = changes.select(
        "offset", "partition_id", "seq_in_tx", "op", *key_cols,
        F.when(F.col("op") != "delete", F.struct(*[F.col(c) for c in payload_cols]))
        .cast(after_type).alias("after"),
        "ts",
    )
    return apply_batch(
        target, wrapped, batch_id=batch_id, source="replicate",
        extra_properties={"replicated_through": to_version, "replication_source": src_id},
    )
