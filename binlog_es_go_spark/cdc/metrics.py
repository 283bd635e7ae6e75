"""Streaming metrics: the Prometheus surface, lake-native.

The reference exports binlog-lag gauge, flush-size histogram, SQL/bulk
latency histograms and retry/reconnect counters over HTTP
(``pkg/metrics/metrics.go:9-80``), updating lag after each flush
(``pkg/realtime/flush.go:208-211``). Here:

* per-batch rows/sec, duration, and input lag come from Structured
  Streaming's ``StreamingQueryListener`` progress events (built-in
  instrumentation — no hand-rolled counters);
* each batch's metrics row is appended to a parquet metrics log next to
  the offsets lineage already stored in the lake manifest (north rule:
  "checkpoints per-partition offsets + lineage/metrics").
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQueryListener

METRICS_SCHEMA = T.StructType(
    [
        T.StructField("query_id", T.StringType()),
        T.StructField("batch_id", T.LongType()),
        T.StructField("ts", T.StringType()),
        T.StructField("num_input_rows", T.LongType()),
        T.StructField("input_rows_per_sec", T.DoubleType()),
        T.StructField("process_rows_per_sec", T.DoubleType()),
        T.StructField("batch_duration_ms", T.LongType()),
        T.StructField("sources", T.StringType()),
    ]
)


class LakeMetricsListener(StreamingQueryListener):
    """Buffers one metrics row per micro-batch progress event.

    PySpark forwards listener events asynchronously on a separate thread,
    so (a) rows may arrive shortly AFTER the query drains — use
    ``wait_for(n)``; (b) the callback must stay cheap — persistence
    happens in ``flush()``, not in the callback.
    """

    def __init__(self, spark: SparkSession, metrics_dir: str):
        self.spark = spark
        self.metrics_dir = metrics_dir
        os.makedirs(metrics_dir, exist_ok=True)
        self.rows: list[tuple] = []
        # live counters for the HTTP endpoint (MetricsServer)
        self.totals = {"batches": 0, "rows": 0}
        self.latest: dict[str, dict] = {}

    def onQueryStarted(self, event) -> None:  # noqa: N802
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        self.rows.append(
            (
                str(p.id),
                int(p.batchId),
                p.timestamp,
                int(p.numInputRows),
                float(p.inputRowsPerSecond or 0.0),
                float(p.processedRowsPerSecond or 0.0),
                int(p.batchDuration),
                json.dumps([s.description for s in p.sources]),
            )
        )
        self.totals["batches"] += 1
        self.totals["rows"] += int(p.numInputRows)
        self.latest[str(p.id)] = {
            "batch_id": int(p.batchId),
            "num_input_rows": int(p.numInputRows),
            "process_rows_per_sec": float(p.processedRowsPerSecond or 0.0),
            "batch_duration_ms": int(p.batchDuration),
            "at": time.time(),
        }

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    def wait_for(self, min_rows: int, timeout_sec: float = 30.0) -> bool:
        """Wait for at least ``min_rows`` progress events to arrive."""
        deadline = time.time() + timeout_sec
        while time.time() < deadline:
            if len(self.rows) >= min_rows:
                return True
            time.sleep(0.2)
        return len(self.rows) >= min_rows

    def flush(self) -> int:
        """Persist buffered rows as one parquet append; returns row count."""
        if not self.rows:
            return 0
        rows, self.rows = self.rows, []
        df = self.spark.createDataFrame(rows, METRICS_SCHEMA)
        df.coalesce(1).write.mode("append").parquet(
            os.path.join(self.metrics_dir, f"m-{uuid.uuid4().hex}")
        )
        return len(rows)


class MetricsServer:
    """Live ``/metrics`` (Prometheus text format) + ``/healthz`` endpoint.

    The analog of the reference's HTTP metrics server
    (``pkg/metrics/metrics.go:9-80``, wiring ``cmd/binlog-es-go/
    main.go:435-481``): a stdlib ThreadingHTTPServer on a daemon thread
    serving the listener's live counters — a way to probe a RUNNING tail,
    complementing the parquet metrics log used for offline analysis.

    ``health_probe``: optional callable -> bool (e.g. ``query.isActive``);
    /healthz returns 200/ok while it is truthy, 503 otherwise.
    """

    def __init__(self, listener: LakeMetricsListener, port: int = 0, health_probe=None):
        self.listener = listener
        self.port = port
        self.health_probe = health_probe
        self._server = None
        self._thread = None

    def render_metrics(self) -> str:
        li = self.listener
        lines = [
            "# TYPE binlog_spark_batches_total counter",
            f"binlog_spark_batches_total {li.totals['batches']}",
            "# TYPE binlog_spark_rows_total counter",
            f"binlog_spark_rows_total {li.totals['rows']}",
        ]
        for qid, p in li.latest.items():
            lbl = f'{{query="{qid}"}}'
            lines += [
                f"binlog_spark_last_batch_id{lbl} {p['batch_id']}",
                f"binlog_spark_last_batch_rows{lbl} {p['num_input_rows']}",
                f"binlog_spark_process_rows_per_sec{lbl} {p['process_rows_per_sec']}",
                f"binlog_spark_last_batch_duration_ms{lbl} {p['batch_duration_ms']}",
            ]
        return "\n".join(lines) + "\n"

    def start(self) -> int:
        import threading
        from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # noqa: ANN002 — silence per-request logs
                pass

            def do_GET(self):  # noqa: N802
                if self.path.startswith("/metrics"):
                    body = outer.render_metrics().encode()
                    self.send_response(200)
                    self.send_header("Content-Type", "text/plain; version=0.0.4")
                elif self.path.startswith("/healthz"):
                    ok = outer.health_probe() if outer.health_probe else True
                    body = (b"ok" if ok else b"unhealthy")
                    self.send_response(200 if ok else 503)
                    self.send_header("Content-Type", "text/plain")
                else:
                    body = b"not found"
                    self.send_response(404)
                    self.send_header("Content-Type", "text/plain")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

        self._server = ThreadingHTTPServer(("127.0.0.1", self.port), Handler)
        self._thread = threading.Thread(target=self._server.serve_forever, daemon=True)
        self._thread.start()
        return self._server.server_address[1]

    def stop(self) -> None:
        if self._server is not None:
            self._server.shutdown()
            self._server.server_close()


def read_metrics(spark: SparkSession, metrics_dir: str):
    dirs = [os.path.join(metrics_dir, d) for d in os.listdir(metrics_dir) if d.startswith("m-")]
    if not dirs:
        return spark.createDataFrame([], METRICS_SCHEMA)
    return spark.read.parquet(*dirs)


def lag_summary(spark: SparkSession, metrics_dir: str):
    """The lag/throughput gauge view (metrics.go:14-23 analog)."""
    m = read_metrics(spark, metrics_dir)
    return m.agg(
        F.count("*").alias("n_batches"),
        F.sum("num_input_rows").alias("rows"),
        F.round(F.avg("process_rows_per_sec"), 1).alias("avg_rows_per_sec"),
        F.max("batch_duration_ms").alias("max_batch_ms"),
    )
