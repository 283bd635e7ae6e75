"""GTID/binlog-position -> per-partition-offset cutover bridge.

The reference persists its replication position as either a GTID set or a
binlog (file, pos) pair (``pkg/position/store.go:14-23``) and resumes the
MySQL replication protocol from it (``pkg/realtime/loop.go:140-175``).
This engine has no replication-protocol surface BY DESIGN (SURVEY §3):
its source contract is a partitioned changelog (Kafka/parquet) where
``(partition_id, offset)`` is totally ordered per partition, and resume
state is the ``stream_offsets`` manifest property.

A migration from the Go engine therefore needs exactly one artifact: the
CHANGELOG SHIPPER's watermark log. Whatever ships the binlog into the
partitioned changelog (Debezium, Maxwell, a custom tailer) knows, for
every transaction it forwarded, both identities:

    (gtid_uuid, txno | file, pos)  ->  (partition_id, offset)

Emitting that pair per transaction (a few bytes; Debezium already puts
``gtid``/``file``/``pos`` in every envelope's ``source`` block) gives a
watermark table. The bridge below turns the Go engine's saved position
plus that table into per-partition OFFSET FLOORS:

    floor(p) = the largest offset F on partition p such that EVERY
               transaction shipped to p with offset <= F is covered by
               the saved position.

Prefix-closedness matters: a gap in the saved GTID set (a transaction the
Go engine has NOT applied) caps the floor below that transaction's
offset, even if later transactions are covered — resuming above the gap
would skip it. Floors seed ``stream_offsets``; the tail then resumes with
``filter_unapplied`` dropping the shipped prefix cheaply while the MERGE
(offset, seq) guard makes any overlap a no-op. Cutover is therefore
idempotent: it is always safe to set floors LOW (events replay as
no-ops), never safe to set them high.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class GoPosition:
    """The reference's persisted position (``position.State``,
    pkg/position/store.go:14-23): a GTID set string when GTID mode is on,
    else the binlog (file, pos) pair."""

    gtid_set: str | None = None
    file: str | None = None
    pos: int = 0


@dataclass
class TxWatermark:
    """One shipped transaction: its source identity on both sides."""

    partition_id: int
    offset: int
    gtid_uuid: str | None = None
    txno: int | None = None
    file: str | None = None
    pos: int | None = None


@dataclass
class CutoverFloors:
    floors: dict[str, int]          # partition_id -> offset floor
    gaps: dict[int, int] = field(default_factory=dict)
    # partition -> first offset NOT covered (the gap that capped the floor)


def parse_gtid_set(s: str) -> dict[str, list[tuple[int, int]]]:
    """Parse ``uuid:1-5:7,uuid2:1-30`` into sorted interval lists.

    The grammar is the MySQL GTID-set text form the reference round-trips
    through its position store; intervals are inclusive.
    """
    out: dict[str, list[tuple[int, int]]] = {}
    for part in filter(None, (p.strip() for p in s.split(","))):
        uuid, *ranges = part.split(":")
        ivs = []
        for r in ranges:
            lo, _, hi = r.partition("-")
            ivs.append((int(lo), int(hi or lo)))
        out[uuid.strip().lower()] = sorted(ivs)
    return out


def gtid_covered(gtid_set: dict[str, list[tuple[int, int]]], uuid: str, txno: int) -> bool:
    for lo, hi in gtid_set.get(uuid.lower(), ()):
        if lo <= txno <= hi:
            return True
    return False


def _covered(pos: GoPosition, parsed_gtids, w: TxWatermark) -> bool:
    if pos.gtid_set is not None:
        if w.gtid_uuid is None or w.txno is None:
            raise ValueError(
                f"saved position is GTID-based but watermark {w} has no gtid identity"
            )
        return gtid_covered(parsed_gtids, w.gtid_uuid, w.txno)
    if w.file is None or w.pos is None:
        raise ValueError(
            f"saved position is (file, pos)-based but watermark {w} has no file/pos"
        )
    # Binlog files order by the NUMERIC index, not the string: at the
    # index-width rollover ('mysql-bin.999999' -> 'mysql-bin.1000000')
    # lexicographic order inverts, which would judge post-save
    # transactions "covered" and set cutover floors too high (skipped
    # transactions — the exact invariant this module exists to protect).
    return (_binlog_file_key(w.file), w.pos) <= (_binlog_file_key(pos.file), pos.pos)


def _binlog_file_key(name: str) -> tuple[str, int]:
    """(basename, numeric index) sort key for a binlog file name.

    MySQL names series files ``<basename>.<NNNNNN>`` and grows the digit
    width past 999999 rather than wrapping, so the trailing digits parsed
    as an int are the series order. Non-numeric suffixes (should not
    occur) fall back to index -1 so they can never cover a real position.
    """
    base, _, suffix = name.rpartition(".")
    if suffix.isdigit():
        return (base, int(suffix))
    return (name, -1)


def cutover_floors(saved: GoPosition, watermarks: list[TxWatermark]) -> CutoverFloors:
    """Per-partition offset floors for resuming THIS engine at the Go
    engine's saved position (see module docstring for the prefix-closed
    floor rule). Runs on the driver: the watermark table is one row per
    shipped TRANSACTION near the cutover window, not per event — callers
    prune it to a recent window; floors only need to cover offsets the
    changelog still retains."""
    parsed = parse_gtid_set(saved.gtid_set) if saved.gtid_set is not None else None
    by_part: dict[int, list[TxWatermark]] = {}
    for w in watermarks:
        by_part.setdefault(int(w.partition_id), []).append(w)

    floors: dict[str, int] = {}
    gaps: dict[int, int] = {}
    for p, ws in by_part.items():
        ws.sort(key=lambda w: w.offset)
        floor = None
        for w in ws:
            if _covered(saved, parsed, w):
                floor = w.offset
            else:
                gaps[p] = w.offset
                break  # prefix ends at the first uncovered transaction
        if floor is not None:
            floors[str(p)] = int(floor)
    return CutoverFloors(floors=floors, gaps=gaps)


def seed_cutover_offsets(table, floors: dict[str, int]):
    """Record cutover floors in the target's ``stream_offsets`` manifest
    property (metadata-only commit, no data files): ``filter_unapplied``
    then skips the already-applied prefix on the first tailed batch.
    Floors only ever RAISE recorded offsets (max-merge) — re-seeding or
    racing a live tail cannot regress another writer's position."""
    from binlog_es_go_spark.cdc.apply import OFFSETS_PROP

    def props_fn(base_props: dict) -> dict:
        prev = dict(base_props.get(OFFSETS_PROP, {}))
        for p, off in floors.items():
            prev[str(p)] = max(int(prev.get(str(p), -1)), int(off))
        return {OFFSETS_PROP: prev}

    empty = table.with_bucket(table.read(buckets=[]).limit(0))
    return table.write_buckets(
        empty, replaced_buckets=[], properties_fn=props_fn, collect_stats=False
    )
