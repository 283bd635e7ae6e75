"""Extra benchmarks for optimization work (bench.py itself is FROZEN for
measurement — this file carries the iteration/isolation harness per the
optimization guide §1: noop-sink isolation, per-query repeats, plan dumps).

Usage:
    python bench_extra.py queries [name ...] [--reps N]   # per-query wall (bench.py methodology)
    python bench_extra.py explain <out_suffix> [name ...] # dump .explain("formatted") to plans/r06/
    python bench_extra.py cc|lsh|tail [cores]             # re-run bench.py's section benches
    python bench_extra.py cdc <cores> [events]            # one replay run, prints events/s
"""

from __future__ import annotations

import io
import os
import sys
import tempfile
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SCRATCH = "/dev/shm" if os.path.isdir("/dev/shm") else tempfile.gettempdir()


def _session():
    from binlog_es_go_spark.session import build_session

    tempfile.tempdir = SCRATCH
    return build_session("bench-extra", parallelism=CPUS)


def run_queries(names: list[str], reps: int = 1) -> None:
    import __spark_entry__ as entrymod
    import bench

    spark = _session()
    qs = entrymod.queries()
    names = names or bench.HEADLINE
    totals: dict[str, list[float]] = {n: [] for n in names}
    for rep in range(reps):
        total = 0.0
        for name in names:
            spark.sparkContext.setJobDescription(name)
            t0 = time.time()
            n = qs[name](spark, SF_DIR).count()
            dt = time.time() - t0
            totals[name].append(dt)
            total += dt
            print(f"  [{rep}] {name}: {dt:.2f}s ({n} rows)", file=sys.stderr)
        print(f"  [{rep}] TOTAL {total:.2f}s", file=sys.stderr)
    if reps > 1:
        for name in names:
            ts = totals[name]
            print(f"  min {name}: {min(ts):.2f}s  (all: {[round(t,2) for t in ts]})",
                  file=sys.stderr)
    print(f"  SUM-OF-MIN: {sum(min(t) for t in totals.values()):.2f}s", file=sys.stderr)
    spark.stop()


def dump_plans(suffix: str, names: list[str]) -> None:
    import __spark_entry__ as entrymod
    import bench

    os.makedirs("plans/r06", exist_ok=True)
    spark = _session()
    qs = entrymod.queries()
    for name in names or bench.HEADLINE:
        df = qs[name](spark, SF_DIR)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        with open(f"plans/r06/{name}_{suffix}.txt", "w") as f:
            f.write(buf.getvalue())
        print(f"  wrote plans/r06/{name}_{suffix}.txt", file=sys.stderr)
    spark.stop()


def main() -> None:
    import bench

    mode = sys.argv[1] if len(sys.argv) > 1 else "queries"
    rest = sys.argv[2:]
    if mode == "queries":
        reps = 1
        if "--reps" in rest:
            i = rest.index("--reps")
            reps = int(rest[i + 1])
            rest = rest[:i] + rest[i + 2:]
        run_queries(rest, reps=reps)
    elif mode == "explain":
        dump_plans(rest[0], rest[1:])
    elif mode == "cc":
        print(bench.cc_scale_bench(cores=int(rest[0]) if rest else min(8, CPUS)))
    elif mode == "lsh":
        print(bench.lsh_index_bench(cores=int(rest[0]) if rest else min(8, CPUS)))
    elif mode == "tail":
        print(bench.cdc_tail_bench(cores=int(rest[0]) if rest else min(8, CPUS)))
    elif mode == "cdc":
        cores = int(rest[0])
        n_events = int(rest[1]) if len(rest) > 1 else bench.CDC_EVENTS
        from binlog_es_go_spark.cdc.events import generate_changelog
        from binlog_es_go_spark.session import build_session

        base = tempfile.mkdtemp(prefix="bx_changelog_", dir=SCRATCH)
        gen = build_session("bx-gen", parallelism=CPUS)
        generate_changelog(gen, n_events, n_repos=5000, paths_per_repo=400,
                           n_partitions=32, skew=3.0, seed=42).write.parquet(base + "/events")
        generate_changelog(gen, bench.WARMUP_EVENTS, n_repos=500, paths_per_repo=50,
                           n_partitions=32, seed=7).write.parquet(base + "/warmup")
        gen.stop()
        thr = bench.cdc_replay_run(cores, base + "/events", base + "/warmup", n_events)
        print(f"local[{cores}]: {thr:,.0f} events/s")
        import shutil

        shutil.rmtree(base, ignore_errors=True)
    else:
        raise SystemExit(f"unknown mode {mode}")


if __name__ == "__main__":
    main()
