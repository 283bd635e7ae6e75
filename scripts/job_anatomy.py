"""Count Spark jobs + wall per job for one query execution (warm).

    python scripts/job_anatomy.py <query> [reps]
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
    qname = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    import __spark_entry__ as entrymod

    from binlog_es_go_spark.session import build_session

    spark = build_session("anatomy", parallelism=CPUS)
    hc = spark.sparkContext._jsc.hadoopConfiguration()
    hc.set("mapreduce.fileoutputcommitter.algorithm.version", "2")
    hc.set("mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")
    qs = entrymod.queries()
    qs[qname](spark, SF_DIR).count()  # warm

    sc = spark.sparkContext
    jsc = sc._jsc.sc()
    for rep in range(reps):
        t0 = time.time()
        qs[qname](spark, SF_DIR).count()
        wall = time.time() - t0
        # pull job data from the status store
        store = jsc.statusStore()
        jobs = store.jobsList(None)
        n = jobs.size()
        rows = []
        for i in range(n):
            j = jobs.apply(i)
            sub = j.submissionTime().get().getTime() / 1000.0
            try:
                comp = j.completionTime().get().getTime() / 1000.0
            except Exception:
                comp = sub
            if comp >= t0:
                rows.append((sub, comp, j.jobId(), j.numTasks(), j.name()[:60]))
        rows.sort()
        print(f"\n=== {qname} rep{rep}: wall {wall:.2f}s, {len(rows)} jobs")
        prev_end = t0
        for sub, comp, jid, ntasks, name in rows:
            gap = sub - prev_end
            print(f"  job {jid:4d} dur {comp-sub:5.2f}s gap {gap:5.2f}s tasks {ntasks:4d}  {name}")
            prev_end = max(prev_end, comp)
        print(f"  tail gap {time.time()-prev_end- (time.time()-t0-wall):.2f}")
    spark.stop()


if __name__ == "__main__":
    main()
