"""Interleaved A/B: AQE on vs off during the merge-commit path.

    python scripts/ab_aqe.py [pairs]
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


def main():
    pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    import __spark_entry__ as entrymod

    import binlog_es_go_spark.cdc.apply as ap
    from binlog_es_go_spark.session import build_session

    spark = build_session("ab-aqe", parallelism=CPUS)
    hc = spark.sparkContext._jsc.hadoopConfiguration()
    hc.set("mapreduce.fileoutputcommitter.algorithm.version", "2")
    hc.set("mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")
    qs = entrymod.queries()

    orig_apply = ap.apply_batch

    def apply_no_aqe(*a, **k):
        prev = spark.conf.get("spark.sql.adaptive.enabled")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        try:
            return orig_apply(*a, **k)
        finally:
            spark.conf.set("spark.sql.adaptive.enabled", prev)

    names = ["cdc_replay_events", "config_recompute_pipeline",
             "incremental_lsh_index", "incremental_embedding_index"]
    for q in names:
        qs[q](spark, SF_DIR).count()  # warm
        on, off = [], []
        for _ in range(pairs):
            ap.apply_batch = orig_apply
            t0 = time.time(); qs[q](spark, SF_DIR).count(); on.append(round(time.time() - t0, 2))
            ap.apply_batch = apply_no_aqe
            # also patch the imports in pipeline/lsh_index modules
            import binlog_es_go_spark.cdc.pipeline as pl
            import binlog_es_go_spark.operators.lsh_index as lx
            pl.apply_batch = apply_no_aqe
            lx.apply_batch = apply_no_aqe
            t0 = time.time(); qs[q](spark, SF_DIR).count(); off.append(round(time.time() - t0, 2))
            pl.apply_batch = orig_apply
            lx.apply_batch = orig_apply
        ap.apply_batch = orig_apply
        print(f"{q}\n  AQE on : {on}  min {min(on)}\n  AQE off: {off}  min {min(off)}")
    spark.stop()


if __name__ == "__main__":
    main()
