"""Phase-level profiling of the per-commit apply floor (guide §1).

Times each driver-visible phase of the headline CDC queries' commit path
by monkeypatching timers around apply internals, at sf0.1 scale. Run:

    python scripts/profile_apply.py [repeats]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import tempfile

SCRATCH = "/dev/shm" if os.path.isdir("/dev/shm") else tempfile.gettempdir()
tempfile.tempdir = SCRATCH
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

PHASES: dict[str, float] = {}
COUNTS: dict[str, int] = {}


def timed(label, fn):
    def wrap(*a, **k):
        t0 = time.time()
        try:
            return fn(*a, **k)
        finally:
            dt = time.time() - t0
            PHASES[label] = PHASES.get(label, 0.0) + dt
            COUNTS[label] = COUNTS.get(label, 0) + 1
    return wrap


def install():
    import binlog_es_go_spark.cdc.apply as ap
    import binlog_es_go_spark.lake.merge as mg
    import binlog_es_go_spark.lake.table as tb

    ap._batch_metadata = timed("metadata_job", ap._batch_metadata)
    mg._merge_once = timed("merge_once_total", mg._merge_once)
    tb.LakeTable.write_buckets = timed("write_buckets", tb.LakeTable.write_buckets)
    tb._harvest_file_stats = timed("harvest_stats", tb._harvest_file_stats)
    tb.LakeTable.read = timed("table_read_build", tb.LakeTable.read)

    # time the actual Spark write action inside write_buckets by patching
    # DataFrameWriter.parquet
    from pyspark.sql.readwriter import DataFrameWriter

    DataFrameWriter.parquet = timed("parquet_write_action", DataFrameWriter.parquet)


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    import __spark_entry__ as entrymod

    from binlog_es_go_spark.session import build_session

    install()
    spark = build_session("profile-apply", parallelism=CPUS)
    qs = entrymod.queries()
    for name in ["cdc_replay_events", "config_recompute_pipeline",
                 "incremental_lsh_index", "incremental_embedding_index"]:
        for rep in range(reps):
            PHASES.clear()
            COUNTS.clear()
            spark.sparkContext.setJobDescription(name)
            t0 = time.time()
            n = qs[name](spark, SF_DIR).count()
            wall = time.time() - t0
            print(f"\n=== {name} rep{rep}: {wall:.2f}s total ({n} rows)")
            for k in sorted(PHASES, key=PHASES.get, reverse=True):
                print(f"  {k:24s} {PHASES[k]:6.2f}s  x{COUNTS[k]}")
    spark.stop()


if __name__ == "__main__":
    main()
