"""Transforms, shard routing (golden vectors), salting, enrichment."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from binlog_es_go_spark.operators.enrichment import (
    affected_parent_keys,
    collect_sorted_list,
    delete_on_missing_keys,
    enrich_documents,
    ordered_group_concat,
    rewrite_table_name,
)
from binlog_es_go_spark.operators.salting import (
    CRC32_IEEE_SIGNED_ABS,
    CRC32_IEEE_UINT32,
    MOD,
    salt_column,
    salted_aggregate,
    shard_for_key,
)
from binlog_es_go_spark.operators.transforms import (
    json_decode_field,
    json_decode_kept,
    preview_top_n,
    split_string_field,
)

# Cross-language golden vectors from the reference README.md:139-144
# (strategy crc32_ieee_uint32, shards=64).
GOLDEN_SHARDS = [("0", 33), ("1", 55), ("42", 8), ("258652761531355136", 0), ("258652848596717568", 63)]


def test_shard_router_golden_vectors(spark):
    df = spark.createDataFrame([(k,) for k, _ in GOLDEN_SHARDS], ["key"])
    got = {r["key"]: r["shard"] for r in df.select("key", shard_for_key("key", 64).alias("shard")).collect()}
    assert got == dict(GOLDEN_SHARDS)


def test_shard_router_matches_zlib(spark):
    """Property: JVM crc32 routing == python zlib.crc32 (CRC-32/IEEE)."""
    import zlib

    keys = [str(x) for x in [0, 1, 7, 99, 12345, 2**40, 2**62]] + ["org3/repo17", "src/a/b.txt"]
    df = spark.createDataFrame([(k,) for k in keys], ["key"])
    got = {r["key"]: r["s"] for r in df.select("key", shard_for_key("key", 64).alias("s")).collect()}
    exp = {k: zlib.crc32(k.encode()) % 64 for k in keys}
    assert got == exp


def test_shard_router_signed_abs_matches_go_model(spark):
    """crc32_ieee_signed_abs == Go's abs(int64(int32(crc32))) % shards —
    including keys whose crc32 lands in the negative int32 range, with a
    non-power-of-2 shard count (the case a MinInt32 special-case would
    silently diverge on)."""
    import zlib

    keys = [str(x) for x in range(200)] + ["org3/repo17", "src/a/b.txt"]
    exp = {}
    for k in keys:
        u = zlib.crc32(k.encode())
        signed = u - 2**32 if u >= 2**31 else u  # int32 reinterpretation
        exp[k] = abs(signed) % 63                # abs in int64, like Go
    df = spark.createDataFrame([(k,) for k in keys], ["key"])
    got = {
        r["key"]: r["s"]
        for r in df.select("key", shard_for_key("key", 63, CRC32_IEEE_SIGNED_ABS).alias("s")).collect()
    }
    assert got == exp


def test_shard_strategies(spark):
    df = spark.createDataFrame([("42",), ("-5",)], ["key"])
    mod = {r["key"]: r["s"] for r in df.select("key", shard_for_key("key", 10, MOD).alias("s")).collect()}
    assert mod == {"42": 2, "-5": 5}  # abs(key) % shards
    sab = df.select(shard_for_key("key", 64, CRC32_IEEE_SIGNED_ABS).alias("s")).collect()
    assert all(0 <= r["s"] < 64 for r in sab)


def test_salt_column_bounds_and_determinism(spark):
    df = spark.range(500).select(F.col("id").cast("string").alias("k"))
    s1 = df.select(salt_column(["k"], 16).alias("s")).toPandas()["s"]
    s2 = df.select(salt_column(["k"], 16).alias("s")).toPandas()["s"]
    assert (s1 == s2).all() and s1.between(0, 15).all()
    assert s1.nunique() == 16  # spreads over all salt values


def test_salted_aggregate_matches_plain(spark):
    df = spark.range(2000).select(
        (F.col("id") % 3).cast("string").alias("g"),  # 3 hot groups
        F.col("id").alias("v"),
        F.col("id").cast("string").alias("u"),
    )
    got = (
        salted_aggregate(df, ["g"], {"v": "sum", "u": "count"}, salt_cols=["u"], factor=8)
        .orderBy("g")
        .collect()
    )
    exp = df.groupBy("g").agg(F.sum("v").alias("sum_v"), F.count("u").alias("count_u")).orderBy("g").collect()
    assert [(r["g"], r["sum_v"], r["count_u"]) for r in got] == [
        (r["g"], r["sum_v"], r["count_u"]) for r in exp
    ]


def test_split_string_field(spark):
    df = spark.createDataFrame([("a; b ;;c",), ("",), (None,)], ["s"])
    got = df.select(split_string_field("s").alias("a")).collect()
    assert got[0]["a"] == ["a", "b", "c"]
    assert got[1]["a"] == []
    assert got[2]["a"] is None


def test_json_decode_field(spark):
    df = spark.createDataFrame([('{"k": 87}',), ("not json",), (None,)], ["j"])
    got = df.select(json_decode_field("j", "struct<k:int>").alias("p")).collect()
    assert got[0]["p"]["k"] == 87
    assert got[1]["p"] is None and got[2]["p"] is None
    kept = df.select(json_decode_kept("j", "struct<k:int>").alias("p")).collect()
    assert kept[1]["p"]["raw"] == "not json"  # original kept on failure


def test_preview_top_n(spark):
    df = spark.createDataFrame([(1, list(range(10)))], ["a", "arr"])
    row = preview_top_n(df, n=5, array_sample=3).collect()[0]
    assert row["arr"] == [0, 1, 2]


def test_ordered_group_concat_deterministic(spark):
    df = spark.createDataFrame(
        [(1, "b", "2"), (1, "a", "1"), (1, "c", "3"), (2, "z", "9")], ["k", "name", "val"]
    )
    got = (
        df.groupBy("k")
        .agg(ordered_group_concat(F.concat_ws(" : ", "name", "val"), ["name", "val"]).alias("gc"))
        .orderBy("k")
        .collect()
    )
    assert got[0]["gc"] == "a : 1;b : 2;c : 3"
    assert got[1]["gc"] == "z : 9"
    arr = (
        df.groupBy("k").agg(collect_sorted_list("name", ["name"]).alias("l")).orderBy("k").collect()
    )
    assert arr[0]["l"] == ["a", "b", "c"]


def test_rewrite_table_name(spark):
    df = spark.createDataFrame([("enterprise_07",), ("orders",)], ["t"])
    got = df.select(rewrite_table_name("t", [(r"_\d+$", "")]).alias("t")).collect()
    assert [r["t"] for r in got] == ["enterprise", "orders"]


def test_enrich_documents_shape(spark):
    main = spark.createDataFrame([("r1", "p1", "py"), ("r1", "p2", "go")], ["repo", "path", "lang"])
    meta = spark.createDataFrame([("r1", "a repo")], ["repo", "description"])
    dim = spark.createDataFrame([("py", "Python")], ["lang", "lang_name"])
    attrs = spark.createDataFrame(
        [("r1", "p1", "size", "10"), ("r1", "p1", "mode", "644")], ["repo", "path", "name", "value"]
    )
    out = enrich_documents(
        main,
        ["repo", "path"],
        one_to_one=[(meta, ["repo"])],
        dims=[(dim, ["lang"])],
        one_to_many=(
            attrs,
            ["repo", "path"],
            ordered_group_concat(F.concat_ws(" : ", "name", "value"), ["name", "value"]).alias("attributes"),
        ),
    ).orderBy("path")
    rows = out.collect()
    assert rows[0]["description"] == "a repo" and rows[0]["lang_name"] == "Python"
    assert rows[0]["attributes"] == "mode : 644;size : 10"
    assert rows[1]["lang_name"] is None and rows[1]["attributes"] is None
    # dim join must be broadcast
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Broadcast" in plan


def test_affected_parent_keys_semi_join(spark):
    parent = spark.createDataFrame(
        [("r1", "p1", "py"), ("r1", "p2", "py"), ("r2", "p3", "go")], ["repo", "path", "lang"]
    )
    child_changes = spark.createDataFrame([("py",)], ["lang"])  # dim change fan-out
    got = affected_parent_keys(child_changes, parent, ["lang"], ["repo", "path"])
    assert sorted((r["repo"], r["path"]) for r in got.collect()) == [("r1", "p1"), ("r1", "p2")]


def test_affected_parent_keys_direct_path(spark):
    parent = spark.createDataFrame([("r9", "p9", "k1")], ["repo", "path", "join_key"])
    child = spark.createDataFrame(
        [("k1", "r1", "p1"), ("k1", None, None)], ["join_key", "parent_repo", "parent_path"]
    )
    got = affected_parent_keys(
        child, parent, ["join_key"], ["repo", "path"], direct_fk_cols=["parent_repo", "parent_path"]
    )
    assert sorted((r["repo"], r["path"]) for r in got.collect()) == [("r1", "p1"), ("r9", "p9")]


def test_delete_on_missing(spark):
    batch = spark.createDataFrame([("r1", "p1"), ("r1", "p2")], ["repo", "path"])
    recomputed = spark.createDataFrame([("r1", "p1")], ["repo", "path"])
    got = delete_on_missing_keys(batch, recomputed, ["repo", "path"]).collect()
    assert [(r["repo"], r["path"]) for r in got] == [("r1", "p2")]
