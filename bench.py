"""Benchmark: headline queries at $SPARK_GRAFT_SF_DIR + the north-star
CDC replay throughput at two parallelism levels (N and 4N cores).

Prints ONE JSON line:
  {"metric": "...", "value": <total headline sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": ...,
   "cdc": {"events": N, "events_per_sec_4n": ..., "events_per_sec_n": ...,
            "cores_n": 8, "cores_4n": 32, "scaling_efficiency": ...}}

The scaling protocol (BASELINE.md): the identical replay job — same input,
same plan — runs at local[N] and local[4N] with shuffle partitions scaled
proportionally; efficiency = (throughput_4N / throughput_N) / 4.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
CDC_EVENTS = int(os.environ.get("BENCH_CDC_EVENTS", "2000000"))
CDC_BATCHES = int(os.environ.get("BENCH_CDC_BATCHES", "4"))

HEADLINE = [
    "enrichment_mapping",
    "q1_pricing_summary",
    "q3_top_orders",
    "q5_region_revenue",
    "cdc_lww_latest_state",
    "cdc_final_state",
    "windowed_event_agg",
    "salted_aggregate",
    "dedup_exact_groups",
    "ngram_jaccard_pairs",
    "ann_cosine_topk",
    "token_counts",
    "quality_scores",
]


def run_headline_queries() -> tuple[dict[str, float], float]:
    import __spark_entry__ as entrymod
    from binlog_es_go_spark.session import build_session

    spark = build_session("bench-queries", parallelism=CPUS)
    qs = entrymod.queries()
    timings: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        fn = qs[name]
        t0 = time.time()
        df = fn(spark, SF_DIR)
        n = df.count()
        dt = time.time() - t0
        timings[name] = round(dt, 3)
        total += dt
        print(f"  {name}: {dt:.2f}s ({n} rows)", file=sys.stderr)
    spark.stop()
    return timings, total


def cdc_replay_throughput(cores: int, events_dir: str, n_events: int) -> float:
    """Replay the pre-generated changelog into a fresh lake table; return events/sec.

    The job under measurement is the full apply path: flatten -> LWW dedup
    window -> bucket-pruned read -> offset-guarded merge window -> salted
    bucket write -> manifest commit, over CDC_BATCHES micro-batches.
    """
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from binlog_es_go_spark.cdc.apply import apply_batch
    from binlog_es_go_spark.lake.table import LakeTable
    from binlog_es_go_spark.session import build_session

    spark = build_session(f"bench-cdc-{cores}", parallelism=cores)
    try:
        payload = T.StructType(
            [T.StructField(n, T.StringType()) for n in ["repo", "path", "commit", "lang", "content"]]
        )
        root = tempfile.mkdtemp(prefix=f"bench_lake_{cores}_")
        table = LakeTable.create(spark, root + "/t", payload, key_cols=["repo", "path"], n_buckets=64)
        log = spark.read.parquet(events_dir)
        per = n_events // CDC_BATCHES
        t0 = time.time()
        for i in range(CDC_BATCHES):
            lo, hi = i * per, (i + 1) * per if i < CDC_BATCHES - 1 else n_events
            batch = log.filter((F.col("offset") >= lo) & (F.col("offset") < hi))
            apply_batch(table, batch, batch_id=i, salt_partitions=cores * 2)
        wall = time.time() - t0
        shutil.rmtree(root, ignore_errors=True)
        return n_events / wall
    finally:
        spark.stop()


def main() -> None:
    # ---- generate the replay changelog once (excluded from measurement)
    from binlog_es_go_spark.cdc.events import generate_changelog
    from binlog_es_go_spark.session import build_session

    events_dir = tempfile.mkdtemp(prefix="bench_changelog_") + "/events"
    gen = build_session("bench-gen", parallelism=CPUS)
    generate_changelog(
        gen, CDC_EVENTS, n_repos=2000, paths_per_repo=200, n_partitions=32, skew=3.0, seed=42
    ).write.parquet(events_dir)
    gen.stop()

    # ---- north-star: same job at N and 4N cores
    cores_4n = CPUS
    cores_n = max(1, CPUS // 4)
    print(f"CDC replay @ local[{cores_n}] ...", file=sys.stderr)
    thr_n = cdc_replay_throughput(cores_n, events_dir, CDC_EVENTS)
    print(f"  -> {thr_n:,.0f} events/s", file=sys.stderr)
    print(f"CDC replay @ local[{cores_4n}] ...", file=sys.stderr)
    thr_4n = cdc_replay_throughput(cores_4n, events_dir, CDC_EVENTS)
    print(f"  -> {thr_4n:,.0f} events/s", file=sys.stderr)
    efficiency = (thr_4n / thr_n) / (cores_4n / cores_n)
    shutil.rmtree(os.path.dirname(events_dir), ignore_errors=True)

    # ---- headline queries at SF_DIR
    print("headline queries ...", file=sys.stderr)
    timings, total = run_headline_queries()

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    result = {
        "metric": "headline_queries_total",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "cdc": {
            "events": CDC_EVENTS,
            "batches": CDC_BATCHES,
            "cores_n": cores_n,
            "cores_4n": cores_4n,
            "events_per_sec_n": round(thr_n, 1),
            "events_per_sec_4n": round(thr_4n, 1),
            "scaling_efficiency": round(efficiency, 3),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
