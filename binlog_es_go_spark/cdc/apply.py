"""The apply core: changelog micro-batch -> lake state.

One core, three key sources (the reference's single most important
architectural fact, SURVEY.md §3.3):

* realtime tail  (``runEventLoop``,   pkg/realtime/loop.go:24-520)
* bootstrap scan (``Runner.Run``,     pkg/bootstrap/runner.go:421-620)
* replay         (``RunWithIDs``,     pkg/bootstrap/runner.go:37-132)

Per batch: op/relevance filter -> flatten after-image -> within-batch LWW
dedup -> optional enrichment/mapping -> offset-guarded MERGE -> offsets +
lineage rows recorded in the same commit (atomically, via the manifest
properties — the analog of saving the binlog position after each flush,
``pkg/realtime/flush.go:212-232``).
"""

from __future__ import annotations

import time
from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from binlog_es_go_spark.cdc.events import flatten_changelog
from binlog_es_go_spark.lake.merge import (
    KEY_PRUNE_CAP,
    BatchKeyInfo,
    MergeResult,
    dedup_last_writer,
    merge_into,
)
from binlog_es_go_spark.lake.table import LakeTable

OFFSETS_PROP = "stream_offsets"  # properties key: {partition_id: max offset applied}
LINEAGE_PROP = "lineage"         # properties key: list of per-batch metric rows

# Observation probe range for per-partition offsets when the stream
# partition count is undeclared (fresh-table fast path): covers the
# reserved epoch (-2) / recompute (-1) partitions plus 64 real ones.
PID_PROBE_LO = -2
PID_PROBE_HI = 64

# Auto write-mode floor: a batch whose copy-on-write rewrite would move
# less than this many base-file bytes just rewrites (cheap, keeps the
# table delta-free); above it, AND when the rewrite is >=32x the batch's
# own size, the merge-on-read delta path wins (see apply_batch).
DELTA_MIN_REWRITE_BYTES = 8 << 20
# ...and the rewrite must amplify the batch by at least this factor
# (batch size proxied at ~1 KB/key) before delta wins.
DELTA_MIN_AMPLIFICATION = 32


def partition_offsets(changelog: DataFrame) -> dict[str, int]:
    """Per-source-partition max offset of a batch (GTID-set analog)."""
    rows = changelog.groupBy("partition_id").agg(F.max("offset").alias("mx")).collect()
    return {str(r["partition_id"]): int(r["mx"]) for r in rows}


def _batch_metadata(
    flat: DataFrame, key_cols: list[str], n_buckets: int
) -> tuple[dict[str, int], list[int], dict[int, BatchKeyInfo]]:
    """Per-partition max offsets, affected buckets, AND the per-bucket
    batch key-hash sets (file-granular COW pruning input) in ONE
    column-pruned scan — metadata jobs are a serial cost per micro-batch,
    so they are folded together. Grouped by (partition, bucket): at most
    n_partitions x n_buckets rows, each carrying <= KEY_PRUNE_CAP+1
    hashes, so the driver transfer stays bounded regardless of batch
    size; a bucket whose merged set overflows the cap degrades to its
    [lo, hi] range (still conservative-correct for pruning)."""
    from binlog_es_go_spark.lake.table import khash_expr

    rows = (
        flat.select("partition_id", "offset", khash_expr(key_cols).alias("_kh"))
        .withColumn("_b", F.pmod(F.col("_kh"), F.lit(n_buckets)).cast("int"))
        .groupBy("partition_id", "_b")
        .agg(
            F.max("offset").alias("mx"),
            F.slice(F.sort_array(F.collect_set("_kh")), 1, KEY_PRUNE_CAP + 1).alias("khs"),
            F.min("_kh").alias("lo"),
            F.max("_kh").alias("hi"),
        )
        .collect()
    )
    offs: dict[str, int] = {}
    acc: dict[int, list] = {}  # bucket -> [set | None, lo, hi]
    for r in rows:
        p = str(r["partition_id"])
        offs[p] = max(offs.get(p, -(1 << 62)), int(r["mx"]))
        b = int(r["_b"])
        cur = acc.setdefault(b, [set(), int(r["lo"]), int(r["hi"])])
        cur[1] = min(cur[1], int(r["lo"]))
        cur[2] = max(cur[2], int(r["hi"]))
        if cur[0] is not None:
            if len(r["khs"]) > KEY_PRUNE_CAP:
                cur[0] = None
            else:
                cur[0].update(r["khs"])
                if len(cur[0]) > KEY_PRUNE_CAP:
                    cur[0] = None
    kinfo = {
        b: BatchKeyInfo(
            khashes=sorted(s) if s is not None else None, lo=lo, hi=hi
        )
        for b, (s, lo, hi) in acc.items()
    }
    return offs, sorted(acc), kinfo


def apply_batch(
    table: LakeTable,
    changelog: DataFrame,
    mapper: Callable[[DataFrame], DataFrame] | None = None,
    batch_id: int | None = None,
    source: str = "realtime",
    salt_partitions: int | None = None,
    prune_buckets: bool = True,
    stream_partitions: int | None = None,
    affected_buckets: list[int] | None = None,
    precomputed_offsets: dict[str, int] | None = None,
    precomputed_khashes: dict[int, BatchKeyInfo] | None = None,
    extra_properties: dict | None = None,
    write_mode: str = "auto",
    delta_max_batch_keys: int = 20_000,
    delta_fold_after: int = 32,
) -> MergeResult:
    """Apply one changelog micro-batch to the lake table.

    ``write_mode``:

    * ``"rewrite"`` — copy-on-write MERGE (merge_into): every base file a
      batch key might live in is rewritten. O(files touched) per batch.
    * ``"delta"`` — merge-on-read append (merge_into_delta): the batch's
      winners land as one small delta file, no base file touched.
      O(batch) per batch; readers resolve by the same (offset, seq) guard.
    * ``"auto"`` (default) — delta when the batch is PROVABLY small
      (every bucket's key set exact under the prune cap and total keys <=
      ``delta_max_batch_keys``), rewrite otherwise. Once
      ``delta_fold_after`` delta commits have accumulated, the debt is
      folded (maintenance.compact_deltas) before the next delta append —
      so steady-state tail cost is O(batch) per commit plus one amortized
      rewrite every ``delta_fold_after`` commits, and read-side resolve
      work stays bounded.

    ``mapper``: optional enrichment/field-mapping stage (the analog of the
    reference's mapping SQL, ``pkg/db/mysql.go:124-180``) applied to the
    flattened, deduped batch before MERGE. It must preserve the key
    columns and the offset/op/ts columns.

    ``stream_partitions``: when the source-partition count is known (it is
    a fixed property of the upstream binlog/WAL shipper, like the
    reference's replication stream identity), per-partition max offsets
    are collected as Observation metrics DURING the merge write itself —
    zero extra jobs per batch. Unknown -> a dedicated column-pruned scan.

    ``affected_buckets`` + ``precomputed_offsets`` (+ optionally
    ``precomputed_khashes``): callers that already know them
    (``replay_changelog`` computes all three for ALL batches in one scan)
    skip the per-batch metadata job entirely while keeping file-granular
    COW pruning and the small-batch write shape.
    """
    t0 = time.time()
    snap = table.snapshot()

    flat = flatten_changelog(changelog)

    obs = None
    obs_pids: range | None = None
    obs_strict = False
    offs: dict[str, int] = {}
    kinfo = None
    if affected_buckets is not None and precomputed_offsets is not None:
        offs, buckets = dict(precomputed_offsets), list(affected_buckets)
        kinfo = precomputed_khashes
    elif prune_buckets:
        # incremental tail: a micro-batch touches few buckets — discover
        # them (plus per-partition offsets and the per-bucket key-hash
        # sets that drive file-granular COW) in one column-pruned scan so
        # the MERGE reads O(batch) target files, not O(table)
        offs, buckets, kinfo = _batch_metadata(flat, snap.key_cols, snap.n_buckets)
    else:
        # bulk replay/bootstrap: batches touch ~every bucket, so bucket
        # discovery is pure serial overhead — rewrite all buckets and
        # collect per-partition offsets as Observation metrics DURING the
        # merge write itself (zero extra jobs). When the stream partition
        # count is undeclared, a fixed probe range of partition ids is
        # observed instead ([-2, 64): the reserved epoch/recompute
        # partitions plus 64 real ones); a feed outside the probe falls
        # back to one explicit offsets job (rare, still correct) — this
        # replaces the round-5 unconditional partition_offsets job.
        buckets = list(range(snap.n_buckets))
        from pyspark.sql import Observation

        obs_strict = stream_partitions is not None
        obs_pids = range(stream_partitions) if obs_strict else range(PID_PROBE_LO, PID_PROBE_HI)
        obs = Observation()
        flat = flat.observe(
            obs,
            *[
                F.max(F.when(F.col("partition_id") == p, F.col("offset"))).alias(f"p{p}")
                for p in obs_pids
            ],
            F.max("partition_id").alias("max_pid"),
            F.min("partition_id").alias("min_pid"),
        )

    # partition_id is stream metadata, not document payload
    flat = flat.drop("partition_id")

    if mapper is not None:
        # mapping runs on the deduped batch (recompute once per key, the
        # reference's batch-recompute amortization, flush.go:39)
        flat = mapper(dedup_last_writer(flat, snap.key_cols))

    def props_after_write(base_props: dict) -> dict:
        # ``base_props`` is the properties of the snapshot the commit is
        # actually building on — on a CommitConflict retry that is NEWER
        # than ``snap`` captured above, and merging against the stale copy
        # would silently drop/regress the other writer's per-partition
        # offsets (and, later, inflate the tombstone-GC watermark).
        batch_offs = dict(offs)
        if obs is not None:
            got = obs.get
            max_pid = got.get("max_pid")
            min_pid = got.get("min_pid")
            if obs_strict and max_pid is not None and max_pid >= stream_partitions:
                raise ValueError(
                    f"event partition_id {max_pid} >= declared stream_partitions={stream_partitions}"
                )
            if not obs_strict and max_pid is not None and (
                max_pid >= PID_PROBE_HI or min_pid < PID_PROBE_LO
            ):
                # partition ids outside the probe range: pay the explicit
                # offsets job (rare; correctness over the saved job)
                batch_offs = partition_offsets(changelog)
            else:
                batch_offs = {
                    str(p): int(got[f"p{p}"])
                    for p in obs_pids
                    if got.get(f"p{p}") is not None
                }
        prev = dict(base_props.get(OFFSETS_PROP, {}))
        for p, mx in batch_offs.items():
            prev[p] = max(int(prev.get(p, -1)), int(mx))
        return {
            OFFSETS_PROP: prev,
            LINEAGE_PROP: list(base_props.get(LINEAGE_PROP, []))[-200:]
            + [
                {
                    "batch_id": batch_id,
                    "source": source,
                    "offsets": batch_offs,
                    "wall_sec": round(time.time() - t0, 2),
                }
            ],
            **(extra_properties or {}),
        }

    use_delta = write_mode == "delta"
    if write_mode == "auto" and kinfo:
        exact = all(i.khashes is not None for i in kinfo.values())
        if exact:
            from binlog_es_go_spark.lake.merge import estimate_overlap_bytes

            n_keys = sum(len(i.khashes) for i in kinfo.values())
            overlap = estimate_overlap_bytes(snap, kinfo)
            # delta pays off when the rewrite would move far more bytes
            # than the batch carries (~1 KB/key is generous); bulk loads
            # and cheap surgical rewrites keep the copy-on-write path
            use_delta = (
                n_keys <= delta_max_batch_keys
                and overlap >= DELTA_MIN_REWRITE_BYTES
                and overlap >= DELTA_MIN_AMPLIFICATION * n_keys * 1024
            )
    if use_delta:
        if len(snap.deltas or []) >= delta_fold_after:
            # fold the accumulated delta debt ONCE, then append — the
            # amortized rewrite that keeps reader resolve work bounded
            from binlog_es_go_spark.lake.maintenance import compact_deltas

            compact_deltas(table, salt_partitions=salt_partitions)
        from binlog_es_go_spark.lake.merge import merge_into_delta

        result = merge_into_delta(table, flat, properties_fn=props_after_write)
    else:
        result = merge_into(
            table,
            flat,
            already_deduped=mapper is not None,
            affected_buckets=buckets,
            salt_partitions=salt_partitions,
            properties_fn=props_after_write,
            bucket_khashes=kinfo,
        )
    result.wall_sec = time.time() - t0
    return result


def replay_changelog(
    table: LakeTable,
    changelog: DataFrame,
    boundaries: list[int],
    mapper: Callable[[DataFrame], DataFrame] | None = None,
    source: str = "replay",
    salt_partitions: int | None = None,
    first_batch_id: int = 0,
) -> list[MergeResult]:
    """Bulk multi-commit replay with ONE metadata pass (backfill path).

    ``boundaries``: sorted offset cut points; commit i covers offsets in
    ``[boundaries[i-1], boundaries[i])`` (first: below boundaries[0];
    last: at or above boundaries[-1]). Identical semantics to calling
    ``apply_batch`` once per range — same MERGEs, same manifest commits,
    same (offset, seq) guard — but the per-batch metadata jobs (affected
    buckets + per-partition max offsets) collapse into a single
    column-pruned scan grouped by batch: for a K-commit backfill that
    removes K-1 serial driver jobs, the dominant amortizable slice of the
    per-commit floor (BENCH.md "Round-3 serial-floor attack").
    """
    from binlog_es_go_spark.lake.table import khash_expr

    snap = table.snapshot()
    flat = flatten_changelog(changelog)
    # batch id = how many boundaries the offset has passed. ONE shallow
    # array expression (a flat array literal + filter + size), not a chain
    # of K additive comparisons: the chained form built a K-deep expression
    # tree whose analysis/codegen cost degenerates around K~10^4, while
    # this stays a single node with O(K) vectorized comparisons per row.
    bounds_lit = F.lit([int(b) for b in boundaries])
    batch = F.size(F.filter(bounds_lit, lambda b: F.col("offset") >= b))
    # Same grouped shape as _batch_metadata, plus the batch dimension:
    # per-partition offsets AND the per-bucket key-hash sets (file-granular
    # COW pruning + small-batch write shape) for every commit in one scan.
    rows = (
        flat.select(
            batch.alias("_batch"), "partition_id", "offset",
            khash_expr(snap.key_cols).alias("_kh"),
        )
        .withColumn("_b", F.pmod(F.col("_kh"), F.lit(snap.n_buckets)).cast("int"))
        .groupBy("_batch", "partition_id", "_b")
        .agg(
            F.max("offset").alias("mx"),
            F.slice(F.sort_array(F.collect_set("_kh")), 1, KEY_PRUNE_CAP + 1).alias("khs"),
            F.min("_kh").alias("lo"),
            F.max("_kh").alias("hi"),
        )
        .collect()
    )
    per_batch_offs: dict[int, dict[str, int]] = {}
    per_batch_acc: dict[int, dict[int, list]] = {}
    for r in rows:
        i = int(r["_batch"])
        p = str(r["partition_id"])
        offs_i = per_batch_offs.setdefault(i, {})
        offs_i[p] = max(offs_i.get(p, -(1 << 62)), int(r["mx"]))
        b = int(r["_b"])
        cur = per_batch_acc.setdefault(i, {}).setdefault(b, [set(), int(r["lo"]), int(r["hi"])])
        cur[1] = min(cur[1], int(r["lo"]))
        cur[2] = max(cur[2], int(r["hi"]))
        if cur[0] is not None:
            if len(r["khs"]) > KEY_PRUNE_CAP:
                cur[0] = None
            else:
                cur[0].update(r["khs"])
                if len(cur[0]) > KEY_PRUNE_CAP:
                    cur[0] = None
    per_batch_kinfo: dict[int, dict[int, BatchKeyInfo]] = {
        i: {
            b: BatchKeyInfo(khashes=sorted(s) if s is not None else None, lo=lo, hi=hi)
            for b, (s, lo, hi) in acc.items()
        }
        for i, acc in per_batch_acc.items()
    }

    results = []
    cuts = [None, *boundaries, None]
    for i in range(len(boundaries) + 1):
        lo, hi = cuts[i], cuts[i + 1]
        part = changelog
        if lo is not None:
            part = part.filter(F.col("offset") >= int(lo))
        if hi is not None:
            part = part.filter(F.col("offset") < int(hi))
        if i not in per_batch_offs:
            continue  # empty range: no commit, same as apply_batch on empty
        results.append(
            apply_batch(
                table, part, mapper=mapper, batch_id=first_batch_id + i,
                source=source, salt_partitions=salt_partitions,
                affected_buckets=sorted(per_batch_kinfo[i]),
                precomputed_offsets=per_batch_offs[i],
                precomputed_khashes=per_batch_kinfo[i],
            )
        )
    return results


def applied_offsets(table: LakeTable) -> dict[str, int]:
    return {k: int(v) for k, v in table.snapshot().properties.get(OFFSETS_PROP, {}).items()}


def filter_unapplied(changelog: DataFrame, offsets: dict[str, int]) -> DataFrame:
    """Drop events at-or-below the recorded per-partition offsets.

    Cross-batch replay protection for restarts: the coarse filter here
    skips whole prefixes cheaply; the MERGE offset guard catches anything
    that slips through (belt and suspenders, both deterministic).

    The reserved epoch partition (bootstrap's EPOCH_PARTITION, -2) is a
    GLOBAL floor: a dump-based bootstrap at epoch E means "state as of
    offset E on every partition", so events with offset <= E drop
    regardless of partition — without this, a stale insert for a key whose
    delete predates the dump (hence no tombstone) would resurrect it.
    """
    if not offsets:
        return changelog
    from binlog_es_go_spark.cdc.bootstrap import EPOCH_PARTITION

    expr = F.lit(True)
    floor = offsets.get(str(EPOCH_PARTITION))
    if floor is not None:
        expr = expr & (F.col("offset") > int(floor))
    for p, o in offsets.items():
        if int(p) == EPOCH_PARTITION:
            continue
        expr = expr & ~((F.col("partition_id") == int(p)) & (F.col("offset") <= o))
    return changelog.filter(expr)
