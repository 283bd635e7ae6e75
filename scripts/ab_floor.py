"""A/B the per-commit floor attacks inside one session (guide §1).

    python scripts/ab_floor.py [reps]
"""
from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
SCRATCH = "/dev/shm" if os.path.isdir("/dev/shm") else tempfile.gettempdir()
tempfile.tempdir = SCRATCH
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def run(qname: str, spark, qs, reps: int) -> list[float]:
    out = []
    for _ in range(reps):
        t0 = time.time()
        qs[qname](spark, SF_DIR).count()
        out.append(round(time.time() - t0, 2))
    return out


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    import __spark_entry__ as entrymod

    import binlog_es_go_spark.cdc.apply as ap
    import binlog_es_go_spark.lake.merge as mg
    from binlog_es_go_spark.session import build_session

    spark = build_session("ab-floor", parallelism=CPUS)
    qs = entrymod.queries()
    hc = spark.sparkContext._jsc.hadoopConfiguration()

    names = ["cdc_replay_events", "config_recompute_pipeline"]
    for q in names:
        run(q, spark, qs, 1)  # warmup
        print(f"{q} baseline:       {run(q, spark, qs, reps)}")

        hc.set("mapreduce.fileoutputcommitter.algorithm.version", "2")
        hc.set("mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")
        print(f"{q} committer v2:   {run(q, spark, qs, reps)}")

        mg.KEY_PRUNE_CAP = 8192
        ap.KEY_PRUNE_CAP = 8192
        print(f"{q} + prune cap 8k: {run(q, spark, qs, reps)}")

        hc.set("mapreduce.fileoutputcommitter.algorithm.version", "1")
        hc.set("mapreduce.fileoutputcommitter.marksuccessfuljobs", "true")
        print(f"{q} cap8k only:     {run(q, spark, qs, reps)}")
        mg.KEY_PRUNE_CAP = 1024
        ap.KEY_PRUNE_CAP = 1024
    spark.stop()


if __name__ == "__main__":
    main()
