"""Search-index bulk-action export: the reference's LAST MILE, in-engine.

The reference's output side builds Elasticsearch ``_bulk`` payloads —
index/update actions with external versioning and delete actions, routed
by the crc32 shard of the document key (``pkg/es/writer.go:57-81,156-193``;
shard strategy ``pkg/realtime/helpers.go:104-123``). This module produces
the SAME action stream from a changelog or snapshot diff as a DataFrame,
so a migration keeps feeding an existing ES/OpenSearch cluster: each row
is one document's action metadata line + source line, ready for any bulk
HTTP shipper (``foreachPartition`` poster, Kafka topic, files).

Two action shapes, matching two write semantics:

* ``action_shape="index"`` (default): full-document ``index`` actions
  stamped ``version_type=external`` with the ``(offset, seq)`` guard
  encoded as ``offset * 2^20 + seq`` — strictly monotonic per key under
  the same ordering the MERGE enforces, so ES resolves replayed or
  duplicated deliveries exactly like the lake does. This is STRONGER
  than what the reference ships and is the right shape for a wholesale
  cutover where this engine is the only writer.
* ``action_shape="update"``: byte-parity with the reference's actual
  bulk writer — ``update`` actions with ``"doc_as_upsert": true`` and
  versionless ``delete`` actions, no external versioning anywhere
  (``pkg/es/writer.go:66,174-178``). Use this during a phased migration
  while the Go engine still writes the same index: mixing the
  reference's internal-versioned updates with external-versioned index
  actions version-conflicts, so dual-writing REQUIRES this shape (or a
  wholesale index cutover).

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
    action_shape: str = "index",
) -> DataFrame:
    """One row per document action:

    ``_id`` (unit-less ``:``-joined key, the reference's PK-derived doc
    id), ``action`` in {index, delete} (or {update, delete} under
    ``action_shape="update"``), ``version`` (the ``(offset, seq)``
    encoding — kept as a column for deterministic ordering even when the
    update shape omits it from the wire), ``shard`` (crc32 routing when
    ``n_shards`` given — the reference's ``crc32_ieee_uint32 % n``),
    ``action_line`` and ``source_line`` (null for deletes) — concatenate
    pairwise for a ready ``_bulk`` body.
    """
    if mode not in ("json", "concat"):
        raise ValueError(f"mode must be 'json' or 'concat', got {mode!r}")
    if action_shape not in ("index", "update"):
        raise ValueError(f"action_shape must be 'index' or 'update', got {action_shape!r}")
    doc_id = F.concat_ws(":", *[F.coalesce(F.col(c).cast("string"), F.lit("")) for c in key_cols])
    is_delete = F.col(op_col) == "delete"
    upsert_op = "update" if action_shape == "update" else "index"
    action = F.when(is_delete, F.lit("delete")).otherwise(F.lit(upsert_op))
    version = external_version(offset_col, seq_col)

    if action_shape == "index":
        action_line = F.concat(
            F.lit('{"'), action, F.lit('":{"_index":"'), F.lit(index),
            F.lit('","_id":"'), doc_id,
            F.lit('","version":'), version.cast("string"),
            F.lit(',"version_type":"external"}}'),
        )
    else:
        # Reference parity (pkg/es/writer.go:66,174): no version on the
        # wire — conflicts are resolved by ES internal versioning plus
        # the reference's conflict-recompute loop, not by the guard.
        action_line = F.concat(
            F.lit('{"'), action, F.lit('":{"_index":"'), F.lit(index),
            F.lit('","_id":"'), doc_id, F.lit('"}}'),
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
    if action_shape == "update":
        # {"doc": <payload>, "doc_as_upsert": true} — writer.go:175-178.
        src = F.concat(F.lit('{"doc":'), src, F.lit(',"doc_as_upsert":true}'))
    source_line = F.when(~is_delete, src)

    out_cols = [
        doc_id.alias("_id"),
        action.alias("action"),
        version.alias("version"),
        action_line.alias("action_line"),
        source_line.alias("source_line"),
    ]
    if n_shards is not None:
        from binlog_es_go_spark.lake.table import khash_expr

        shard = F.pmod(khash_expr(key_cols), F.lit(n_shards)).cast("int")
        out_cols.insert(3, shard.alias("shard"))
    return changes.select(*out_cols)


def bulk_bodies(
    actions: DataFrame,
    max_actions_per_body: int = 1000,
    chunk_parallelism: int = 32,
) -> DataFrame:
    """Group action rows into ``_bulk`` request bodies: NDJSON strings of
    at most ``max_actions_per_body`` actions, grouped by shard when
    present (the reference flushes per-shard bulks of bounded size,
    ``pkg/pipeline/sink/bulkwriter.go``). Distributed: bodies are built
    per (shard, chunk) group — no driver collect. Without a shard column
    the chunk-assignment window partitions by ``crc32(_id) %
    chunk_parallelism`` instead of a single global partition, so the
    export never funnels through one task; doc-id hashing keeps the
    grouping deterministic (same input → same bodies)."""
    cols = actions.columns
    from pyspark.sql import Window

    if "shard" in cols:
        chunked = actions
        grp = ["shard"]
        w_cols = [F.col("shard")]
    else:
        grp = ["_cgrp"]
        chunked = actions.withColumn(
            "_cgrp", F.pmod(F.crc32(F.col("_id").cast("binary")), F.lit(chunk_parallelism)).cast("int")
        )
        w_cols = [F.col("_cgrp")]

    rn = F.row_number().over(Window.partitionBy(*w_cols).orderBy(F.col("_id"), F.col("version")))
    chunked = chunked.withColumn("_chunk", ((rn - 1) / F.lit(max_actions_per_body)).cast("int"))
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
        .drop("_chunk", "_cgrp")
    )


# ---------------------------------------------------------------------------
# HTTP shipper: the reference's doBulk/util.Retry last mile
# (``pkg/es/writer.go:281-316``, ``pkg/pipeline/mapper/executor.go:19-39``).
#
# ``ship_bulk_bodies`` is a mapPartitions transformation, not a driver loop:
# each task posts its partition's bodies sequentially and emits ONE result
# row per body (status, attempts, conflicted ids), so delivery telemetry
# comes back as a DataFrame — bounded at one row per ~max_actions_per_body
# actions — instead of a side channel. Conflict recompute stays the
# caller's job, as in the reference (``pkg/realtime/flush.go:170-186``:
# re-query the conflicted ids, retry the write once).
# ---------------------------------------------------------------------------

_SHIP_RESULT_SCHEMA = (
    "shard int, n_actions int, status string, http_status int, "
    "attempts int, n_requests int, conflicted_ids array<string>, error string"
)


def _iter_bulk_actions(body: str):
    """Split an NDJSON ``_bulk`` body back into whole actions (meta line
    plus source line when the op carries one) — the unit a 413 split must
    preserve: halving on raw lines could orphan a source line."""
    import json

    lines = body.split("\n")
    i = 0
    while i < len(lines):
        meta = lines[i]
        if not meta:
            i += 1
            continue
        op = next(iter(json.loads(meta)))
        if op == "delete":
            yield meta
            i += 1
        else:
            yield meta + "\n" + lines[i + 1]
            i += 2


def _post_ndjson(url: str, body: str, timeout_s: float, headers: dict | None):
    """One POST to ``<url>`` with x-ndjson framing; returns
    (http_status, parsed-json-or-None). Transport errors raise."""
    import json
    import urllib.error
    import urllib.request

    data = (body if body.endswith("\n") else body + "\n").encode("utf-8")
    req = urllib.request.Request(url, data=data, method="POST")
    req.add_header("Content-Type", "application/x-ndjson")
    for k, v in (headers or {}).items():
        req.add_header(k, v)
    try:
        with urllib.request.urlopen(req, timeout=timeout_s) as resp:
            raw = resp.read()
            status = resp.status
    except urllib.error.HTTPError as e:  # non-2xx still has a body
        raw = e.read()
        status = e.code
    try:
        parsed = json.loads(raw) if raw else None
    except ValueError:
        parsed = None
    return status, parsed


def _bulk_response_conflicts(parsed) -> tuple[list[str], list[str]]:
    """(conflicted ids, other error reasons) from a ``_bulk`` response —
    the reference's ``toBulkError`` (``pkg/es/writer.go:252-279``):
    conflict = item status 409 or error.type
    version_conflict_engine_exception."""
    conflicted, reasons = [], []
    if not parsed or not parsed.get("errors"):
        return conflicted, reasons
    for item in parsed.get("items", []):
        for op, detail in item.items():
            err = detail.get("error")
            if not err:
                continue
            etype = (err.get("type") or "") if isinstance(err, dict) else str(err)
            if detail.get("status") == 409 or etype == "version_conflict_engine_exception":
                conflicted.append(str(detail.get("_id")))
            else:
                reasons.append(f"{op} {detail.get('_id')}: {etype}")
    return conflicted, reasons


def _ship_one_body(url, body, n_actions, max_attempts, backoff_ms, timeout_s, headers):
    """Deliver one body with the reference's retry ladder; on 413 split
    into whole-action halves and deliver each (fresh ladder per half) —
    the README's operational answer to '413 Request Entity Too Large'
    (``README.md:231-254``) automated. Returns an accumulator dict."""
    import time as _time

    acc = {"attempts": 0, "n_requests": 0, "conflicted": [], "reasons": [], "http_status": 0}

    def _deliver(piece: str, n_piece: int) -> bool:
        last_exc = None
        for attempt in range(max_attempts):
            acc["attempts"] += 1
            try:
                acc["n_requests"] += 1
                status, parsed = _post_ndjson(url, piece, timeout_s, headers)
                acc["http_status"] = status
                if status == 413 and n_piece > 1:
                    actions = list(_iter_bulk_actions(piece))
                    mid = len(actions) // 2
                    ok1 = _deliver("\n".join(actions[:mid]), mid)
                    ok2 = _deliver("\n".join(actions[mid:]), len(actions) - mid)
                    return ok1 and ok2
                if 200 <= status < 300:
                    conf, reasons = _bulk_response_conflicts(parsed)
                    acc["conflicted"].extend(conf)
                    # Item-level non-conflict errors are terminal for the
                    # body (the reference surfaces them as BulkError, not
                    # a retry): record and report.
                    acc["reasons"].extend(reasons)
                    return not reasons
                last_exc = f"http {status}"
            except Exception as exc:  # noqa: BLE001 — transport errors retry
                last_exc = repr(exc)
            if attempt + 1 < max_attempts:
                ladder = backoff_ms or [0]
                _time.sleep(ladder[min(attempt, len(ladder) - 1)] / 1000.0)
        if last_exc:
            acc["reasons"].append(last_exc)
        return False

    ok = _deliver(body, n_actions)
    acc["ok"] = ok
    return acc


def ship_bulk_bodies(
    bodies: DataFrame,
    url: str,
    max_attempts: int = 3,
    backoff_ms: list[int] | None = None,
    timeout_s: float = 30.0,
    headers: dict | None = None,
) -> DataFrame:
    """POST each ``bulk_bodies`` row to ``<url>/_bulk`` from the
    executors; returns one result row per body. Lazy like any
    transformation — run an action (``.collect()``, write) to ship.

    Per-body semantics match the reference writer: retry ladder
    ``(max_attempts, backoff_ms)`` on transport errors and non-2xx
    (``pkg/pipeline/mapper/executor.go:19``), automatic whole-action
    413 halving, conflict ids harvested from the response items for the
    caller's recompute pass. Deliveries within one partition are
    sequential (the reference's per-shard writer is too); parallelism
    comes from partitioning, so repartition the bodies to the number of
    concurrent bulk streams the cluster should open.
    """
    backoff = list(backoff_ms or [100, 500, 1000])
    hdrs = dict(headers or {})
    endpoint = url.rstrip("/") + "/_bulk"
    has_shard = "shard" in bodies.columns

    def _ship(rows):
        for row in rows:
            acc = _ship_one_body(
                endpoint, row["body"], row["n_actions"], max_attempts, backoff, timeout_s, hdrs
            )
            yield (
                row["shard"],
                row["n_actions"],
                "ok" if acc["ok"] else "error",
                acc["http_status"],
                acc["attempts"],
                acc["n_requests"],
                acc["conflicted"],
                "; ".join(acc["reasons"]) or None,
            )

    shard_col = F.col("shard") if has_shard else F.lit(None).cast("int").alias("shard")
    narrowed = bodies.select(shard_col, F.col("n_actions"), F.col("body"))
    return narrowed.rdd.mapPartitions(_ship).toDF(_SHIP_RESULT_SCHEMA)


def run_export_tail(
    table,
    url: str,
    state_path: str,
    index: str,
    payload_cols: list[str] | None = None,
    n_shards: int | None = 16,
    action_shape: str = "index",
    max_actions_per_body: int = 1000,
    poll_interval_sec: float = 0.5,
    max_rounds: int | None = None,
    stop_when_idle: bool = False,
    max_attempts: int = 3,
    backoff_ms: list[int] | None = None,
    allow_missing_deletes: bool = False,
) -> dict:
    """Continuous lake → search-index delivery: the reference's steady
    state (``pkg/realtime/loop.go:44-76`` — flush every ``flushIntervalMs``
    or on pending overflow), re-expressed as a snapshot-diff tail.

    Loop: whenever the table's current version is past the recorded
    ``exported_through``, compute the snapshot diff (delta-aware, exact),
    format it as ``_bulk`` actions, ship from the executors
    (:func:`ship_bulk_bodies` — retry ladder, 413 splitting, conflict
    harvesting), and ONLY THEN advance the sidecar state file — so a
    crash between ship and record re-ships a range, which the index
    resolves: external versions make replays no-ops under
    ``action_shape="index"``, and doc_as_upsert re-applies idempotently
    under ``"update"``. Delivery errors leave the position untouched and
    surface in the returned summary instead of silently skipping a range.

    Driver-side scheduling, executor-side everything else: the diff, the
    formatting, and the HTTP posts are all DataFrame work; the loop only
    compares two integers per poll. ``stop_when_idle`` / ``max_rounds``
    bound the loop for tests and catch-up jobs; a service deployment runs
    it unbounded next to (or inside) the ingest tail's driver.
    """
    import json
    import os
    import time

    from binlog_es_go_spark.lake.changes import snapshot_changes
    from binlog_es_go_spark.lake.merge import ENGINE_COLS

    summary = {"rounds": 0, "ranges": [], "bodies": 0, "errors": 0, "conflicts": 0}
    exported_through = 0
    if os.path.exists(state_path):
        with open(state_path) as f:
            exported_through = int(json.load(f)["exported_through"])

    while True:
        to_v = table.current_version()
        if to_v <= exported_through:
            if stop_when_idle:
                break
            time.sleep(poll_interval_sec)
            if max_rounds is not None and summary["rounds"] >= max_rounds:
                break
            continue
        snap = table.snapshot(to_v)
        cols = payload_cols or [
            f.name for f in snap.schema.fields
            if f.name not in snap.key_cols and f.name not in ENGINE_COLS
        ]
        changes = snapshot_changes(
            table, exported_through, to_v,
            allow_missing_deletes=allow_missing_deletes or exported_through == 0,
        )
        acts = bulk_index_actions(
            changes, snap.key_cols, cols, index=index,
            n_shards=n_shards, mode="json", action_shape=action_shape,
        )
        bodies = bulk_bodies(acts, max_actions_per_body=max_actions_per_body)
        report = ship_bulk_bodies(
            bodies, url, max_attempts=max_attempts, backoff_ms=backoff_ms
        ).collect()
        n_err = sum(1 for r in report if r["status"] == "error")
        summary["rounds"] += 1
        summary["bodies"] += len(report)
        summary["errors"] += n_err
        summary["conflicts"] += sum(len(r["conflicted_ids"]) for r in report)
        summary["ranges"].append([exported_through, to_v])
        if n_err:
            # do NOT advance: the failed range re-ships next round (the
            # reference's retry-then-circuit posture; idempotent on the
            # index side by versioning/upsert semantics)
            if stop_when_idle or (max_rounds is not None and summary["rounds"] >= max_rounds):
                break
            time.sleep(poll_interval_sec)
            continue
        exported_through = to_v
        os.makedirs(os.path.dirname(state_path) or ".", exist_ok=True)
        tmp = state_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"exported_through": to_v}, f)
        os.replace(tmp, state_path)
        if max_rounds is not None and summary["rounds"] >= max_rounds:
            break
    summary["exported_through"] = exported_through
    return summary
