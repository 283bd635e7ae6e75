"""HTTP bulk shipper against a stub ES server: retry ladder, 413
whole-action splitting, conflict harvesting, and the external-version
convergence contract (replayed deliveries leave the store unchanged).

Reference behavior being mirrored: ``pkg/es/writer.go:281-316`` (doBulk +
toBulkError), ``pkg/pipeline/mapper/executor.go:19-39`` (retry ladder),
``README.md:231-254`` (413 → smaller bulks)."""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest
from pyspark.sql import functions as F

from binlog_es_go_spark.operators.search_export import (
    bulk_bodies,
    bulk_index_actions,
    ship_bulk_bodies,
)


class _StubES:
    """In-memory document store with ES `_bulk` semantics: external
    versioning for index actions, doc_as_upsert merge for updates,
    knobs for injected failures (503 runs, 413 size limits)."""

    def __init__(self):
        self.lock = threading.Lock()
        self.docs: dict[str, dict] = {}
        self.versions: dict[str, int] = {}
        self.fail_remaining = 0       # next N requests answer 503
        self.max_actions = None       # bodies above this answer 413
        self.n_requests = 0

    def apply(self, lines: list[str]):
        items, errors = [], False
        i = 0
        while i < len(lines):
            meta = json.loads(lines[i])
            op = next(iter(meta))
            detail = meta[op]
            _id = detail["_id"]
            if op == "delete":
                self.docs.pop(_id, None)
                items.append({"delete": {"_id": _id, "status": 200}})
                i += 1
                continue
            src = json.loads(lines[i + 1])
            i += 2
            if op == "index" and detail.get("version_type") == "external":
                v = int(detail["version"])
                if v <= self.versions.get(_id, -1):
                    errors = True
                    items.append({"index": {"_id": _id, "status": 409, "error": {
                        "type": "version_conflict_engine_exception"}}})
                    continue
                self.versions[_id] = v
                self.docs[_id] = src
                items.append({"index": {"_id": _id, "status": 200}})
            elif op == "update":
                doc = src["doc"]
                if _id in self.docs:
                    self.docs[_id] = {**self.docs[_id], **doc}
                elif src.get("doc_as_upsert"):
                    self.docs[_id] = dict(doc)
                items.append({"update": {"_id": _id, "status": 200}})
            else:
                errors = True
                items.append({op: {"_id": _id, "status": 400, "error": {
                    "type": "illegal_argument_exception"}}})
        return {"errors": errors, "items": items}


def _make_server(stub: _StubES):
    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):
            body = self.rfile.read(int(self.headers["Content-Length"])).decode()
            lines = [ln for ln in body.split("\n") if ln]
            with stub.lock:
                stub.n_requests += 1
                if stub.fail_remaining > 0:
                    stub.fail_remaining -= 1
                    self.send_response(503)
                    self.end_headers()
                    return
                n_actions = sum(
                    1 for ln in lines
                    if next(iter(json.loads(ln))) in ("index", "update", "delete", "create")
                    and list(json.loads(ln).values())[0].keys() >= {"_id"}
                )
                if stub.max_actions is not None and n_actions > stub.max_actions:
                    self.send_response(413)
                    self.end_headers()
                    return
                resp = json.dumps(stub.apply(lines)).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(resp)))
            self.end_headers()
            self.wfile.write(resp)

        def log_message(self, *a):  # quiet test output
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    return srv, f"http://127.0.0.1:{srv.server_address[1]}"


@pytest.fixture()
def stub_es():
    stub = _StubES()
    srv, url = _make_server(stub)
    yield stub, url
    srv.shutdown()


def _changes(spark, n=12):
    rows = [(f"r{i}", f"f{i}.py", "update" if i % 4 else "insert", 100 + i, 0, f"v{i}")
            for i in range(n)]
    rows.append(("gone", "x.py", "delete", 200, 0, None))
    return spark.createDataFrame(
        rows, "repo string, path string, op string, offset long, seq_in_tx int, content string"
    )


def _bodies(spark, n=12, **kw):
    acts = bulk_index_actions(
        _changes(spark, n), ["repo", "path"], ["content"], index="idx", n_shards=4, **kw
    )
    return bulk_bodies(acts, max_actions_per_body=5)


def test_ship_happy_path_delivers_all_docs(spark, stub_es):
    stub, url = stub_es
    res = ship_bulk_bodies(_bodies(spark), url).collect()
    assert all(r["status"] == "ok" for r in res)
    assert sum(r["n_actions"] for r in res) == 13
    assert len(stub.docs) == 12 and "gone:x.py" not in stub.docs
    assert stub.docs["r3:f3.py"] == {"content": "v3"}


def test_ship_replay_converges_via_external_versions(spark, stub_es):
    """The external-version contract: a full replay of already-applied
    bodies is rejected doc-by-doc as version conflicts and the store is
    byte-identical — duplicated deliveries converge with no recompute."""
    stub, url = stub_es
    bodies = _bodies(spark)
    first = ship_bulk_bodies(bodies, url).collect()
    assert all(r["status"] == "ok" for r in first)
    snap_docs, snap_vers = dict(stub.docs), dict(stub.versions)

    replay = ship_bulk_bodies(bodies, url).collect()
    conflicted = sorted(cid for r in replay for cid in r["conflicted_ids"])
    # every index action conflicts (12 docs); the delete re-applies as a no-op
    assert len(conflicted) == 12
    assert stub.docs == snap_docs and stub.versions == snap_vers


def test_ship_newer_version_wins_after_replay(spark, stub_es):
    """Out-of-order interleaving: old bodies shipped after new ones never
    regress the store (the lake's LWW guard, enforced by ES this time)."""
    stub, url = stub_es
    old = _bodies(spark)
    new_changes = _changes(spark).withColumn("offset", F.col("offset") + 1000) \
        .withColumn("content", F.concat(F.lit("NEW-"), F.coalesce("content", F.lit(""))))
    new = bulk_bodies(
        bulk_index_actions(new_changes, ["repo", "path"], ["content"], index="idx", n_shards=4),
        max_actions_per_body=5,
    )
    ship_bulk_bodies(new, url).collect()
    ship_bulk_bodies(old, url).collect()  # stale replay arrives late
    assert stub.docs["r3:f3.py"] == {"content": "NEW-v3"}
    assert all(v >= (1100 << 20) for v in stub.versions.values())


def test_ship_retry_ladder_survives_transient_503(spark, stub_es):
    stub, url = stub_es
    stub.fail_remaining = 2
    res = ship_bulk_bodies(
        _bodies(spark), url, max_attempts=4, backoff_ms=[1, 1, 1]
    ).collect()
    assert all(r["status"] == "ok" for r in res)
    assert max(r["attempts"] for r in res) >= 2, "at least one body retried"
    assert len(stub.docs) == 12


def test_ship_retry_ladder_exhausts_and_reports(spark, stub_es):
    stub, url = stub_es
    stub.fail_remaining = 10_000
    res = ship_bulk_bodies(
        _bodies(spark, n=4), url, max_attempts=2, backoff_ms=[1]
    ).collect()
    assert all(r["status"] == "error" for r in res)
    assert all(r["attempts"] == 2 for r in res)
    assert all("http 503" in r["error"] for r in res)


def test_ship_413_splits_on_whole_action_boundaries(spark, stub_es):
    stub, url = stub_es
    stub.max_actions = 2  # any body over 2 actions is "too large"
    res = ship_bulk_bodies(_bodies(spark), url).collect()
    assert all(r["status"] == "ok" for r in res)
    # splitting happened: more HTTP requests than bodies
    assert sum(r["n_requests"] for r in res) > len(res)
    # and no action was torn apart: every doc landed intact
    assert len(stub.docs) == 12
    assert stub.docs["r7:f7.py"] == {"content": "v7"}


def test_update_action_shape_matches_reference_writer(spark, stub_es):
    """action_shape='update' is byte-parity with pkg/es/writer.go: update
    meta without versions, {"doc":...,"doc_as_upsert":true} source,
    versionless delete meta."""
    stub, url = stub_es
    acts = bulk_index_actions(
        _changes(spark, 3), ["repo", "path"], ["content"], index="idx",
        action_shape="update",
    )
    rows = {r["_id"]: r for r in acts.collect()}
    up = rows["r1:f1.py"]
    assert up["action_line"] == '{"update":{"_index":"idx","_id":"r1:f1.py"}}'
    src = json.loads(up["source_line"])
    assert src == {"doc": {"content": "v1"}, "doc_as_upsert": True}
    de = rows["gone:x.py"]
    assert de["action_line"] == '{"delete":{"_index":"idx","_id":"gone:x.py"}}'
    assert de["source_line"] is None
    # and the stub (internal-version semantics) applies them cleanly twice
    bodies = bulk_bodies(acts, max_actions_per_body=2)
    for _ in range(2):
        res = ship_bulk_bodies(bodies, url).collect()
        assert all(r["status"] == "ok" for r in res)
    assert stub.docs["r1:f1.py"] == {"content": "v1"}


def test_bulk_bodies_without_shard_parallelizes_chunking(spark):
    """No shard column → chunk assignment is hash-partitioned, not a
    single global window partition (ADVICE r4: the default export path
    must not funnel through one task)."""
    acts = bulk_index_actions(
        _changes(spark, 40), ["repo", "path"], ["content"], index="idx"
    )
    bodies = bulk_bodies(acts, max_actions_per_body=5, chunk_parallelism=8)
    plan = bodies._jdf.queryExecution().executedPlan().toString()
    assert "_cgrp" in plan, "hash group drives the window partitioning"
    rows = bodies.collect()
    assert sum(r["n_actions"] for r in rows) == 41
    assert all(r["n_actions"] <= 5 for r in rows)
    assert "shard" not in bodies.columns and "_cgrp" not in bodies.columns
    # deterministic: same input → same bodies
    again = {(r["n_actions"], r["body"]) for r in bulk_bodies(
        acts, max_actions_per_body=5, chunk_parallelism=8).collect()}
    assert {(r["n_actions"], r["body"]) for r in rows} == again



def test_export_tail_follows_the_lake(spark, stub_es, tmp_path):
    """run_export_tail: lake commits (including merge-on-read delta
    appends) flow to the search index incrementally; the sidecar resume
    position only advances after a fully delivered range, and a failing
    round re-ships instead of skipping."""
    from pyspark.sql import types as T

    from binlog_es_go_spark.cdc.apply import apply_batch
    from binlog_es_go_spark.lake.table import LakeTable
    from binlog_es_go_spark.operators.search_export import run_export_tail

    stub, url = stub_es
    t = LakeTable.create(
        spark, str(tmp_path / "t"),
        T.StructType([T.StructField("id", T.LongType()), T.StructField("val", T.StringType())]),
        key_cols=["id"], n_buckets=4,
    )
    schema = ("offset long, partition_id int, seq_in_tx int, op string, id long, "
              "before struct<val:string>, after struct<val:string>, ts timestamp")

    def events(rows):
        return spark.createDataFrame(
            [(off, 0, 0, op, k, None, None if op == "delete" else (v,), None)
             for off, op, k, v in rows], schema)

    apply_batch(t, events([(k, "insert", k, f"v{k}") for k in range(20)]), batch_id=0)
    state = str(tmp_path / "state.json")

    s1 = run_export_tail(t, url, state, index="docs", stop_when_idle=True,
                         poll_interval_sec=0.05, backoff_ms=[1])
    assert s1["errors"] == 0 and s1["rounds"] == 1
    assert len(stub.docs) == 20 and stub.docs["3"] == {"val": "v3"}

    # increment: an update + a delete via the delta tail path
    apply_batch(t, events([(100, "update", 3, "v3b"), (101, "delete", 7, None)]),
                batch_id=1, write_mode="delta")
    s2 = run_export_tail(t, url, state, index="docs", stop_when_idle=True,
                         poll_interval_sec=0.05, backoff_ms=[1])
    assert s2["errors"] == 0
    assert stub.docs["3"] == {"val": "v3b"} and "7" not in stub.docs
    assert len(stub.docs) == 19

    # idle: nothing new -> zero rounds, position unchanged
    s3 = run_export_tail(t, url, state, index="docs", stop_when_idle=True)
    assert s3["rounds"] == 0 and s3["exported_through"] == s2["exported_through"]

    # failure posture: a dead cluster leaves the position untouched...
    apply_batch(t, events([(200, "update", 5, "v5b")]), batch_id=2, write_mode="delta")
    stub.fail_remaining = 10_000
    s4 = run_export_tail(t, url, state, index="docs", stop_when_idle=True,
                         max_attempts=2, backoff_ms=[1])
    assert s4["errors"] > 0 and s4["exported_through"] == s2["exported_through"]
    assert stub.docs["5"] == {"val": "v5"}
    # ...and the healed cluster receives the same range on the next run
    stub.fail_remaining = 0
    s5 = run_export_tail(t, url, state, index="docs", stop_when_idle=True,
                         backoff_ms=[1])
    assert s5["errors"] == 0 and stub.docs["5"] == {"val": "v5b"}
