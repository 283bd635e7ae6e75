"""Incrementally-maintained LSH index (operators/lsh_index.py).

The invariant under test everywhere: after any sequence of document
upserts/deletes applied through the guarded MERGE, the index state is
INDISTINGUISHABLE from rebuilding the banded signature table from the
final document set — incremental maintenance must not be observable.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from binlog_es_go_spark.operators.dedup import banded_signature_rows, minhash_lsh_candidates
from binlog_es_go_spark.operators.lsh_index import LshIndex

AFTER_T = T.StructType([T.StructField("text", T.StringType())])

DOCS = [
    # three near-dup clusters + singletons; every text >= 3 words
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown fox jumps over the lazy cat"),
    (3, "the quick brown fox leaps over the lazy dog"),
    (10, "pack my box with five dozen liquor jugs tonight"),
    (11, "pack my box with five dozen liquor jugs today"),
    (20, "completely unrelated sentence about distributed query engines"),
    (21, "sphinx of black quartz judge my vow swiftly"),
    (30, "colorless green ideas sleep furiously in the night"),
    (31, "colorless green ideas sleep furiously in the day"),
    # exact duplicates (ids survive both the %3 update and %10 delete):
    # every band matches, so at least one candidate pair is guaranteed
    # regardless of how the near-dup shingle sets land in the bands
    (41, "the five boxing wizards jump quickly over the frozen river tonight"),
    (43, "the five boxing wizards jump quickly over the frozen river tonight"),
]


def _docs_df(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"]).select(
        F.col("doc_id").cast("long").alias("doc_id"), "text"
    )


def _ev(df, off_col, op, text_col):
    return df.select(
        off_col.cast("long").alias("offset"),
        F.lit(0).cast("int").alias("partition_id"),
        F.lit(0).cast("int").alias("seq_in_tx"),
        F.lit(op).alias("op"),
        F.col("doc_id"),
        (F.struct(text_col.alias("text")) if op != "delete" else F.lit(None)).cast(AFTER_T).alias("after"),
        F.lit(None).cast("timestamp").alias("ts"),
    )


def _fresh_index(spark, tmp_path, **kw):
    kw.setdefault("k", 16)
    kw.setdefault("bands", 4)
    kw.setdefault("n_buckets", 4)
    return LshIndex.create(spark, str(tmp_path / "ix"), **kw)


def _final_docs(spark):
    """What the doc set looks like after the update+delete batch below."""
    docs = _docs_df(spark)
    return docs.filter(F.col("doc_id") % 10 != 0).select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0, F.concat(F.col("text"), F.lit(" revised")))
        .otherwise(F.col("text"))
        .alias("text"),
    )


def _apply_two_batches(spark, idx):
    docs = _docs_df(spark)
    idx.apply_doc_batch(_ev(docs, F.col("doc_id"), "insert", F.col("text")), batch_id=0)
    updates = _ev(
        docs.filter(F.col("doc_id") % 3 == 0),
        F.col("doc_id") + 1000, "update", F.concat(F.col("text"), F.lit(" revised")),
    )
    deletes = _ev(docs.filter(F.col("doc_id") % 10 == 0), F.col("doc_id") + 2000, "delete", F.col("text"))
    idx.apply_doc_batch(updates.unionByName(deletes), batch_id=1)


def test_incremental_index_equals_full_rebuild(spark, tmp_path):
    idx = _fresh_index(spark, tmp_path)
    _apply_two_batches(spark, idx)

    got = {
        (r["id"], r["band"]): (r["bh"], tuple(r["sig"]))
        for r in idx.band_rows().collect()
    }
    want = {
        (r["id"], r["band"]): (r["bh"], tuple(r["sig"]))
        for r in banded_signature_rows(
            _final_docs(spark), "text", "doc_id", k=16, bands=4
        ).collect()
    }
    assert got == want


def test_candidate_pairs_match_batch_operator(spark, tmp_path):
    idx = _fresh_index(spark, tmp_path)
    _apply_two_batches(spark, idx)

    got = {
        (r["id_a"], r["id_b"]): round(r["est_jaccard"], 9)
        for r in idx.candidate_pairs().collect()
    }
    want = {
        (r["id_a"], r["id_b"]): round(r["est_jaccard"], 9)
        for r in minhash_lsh_candidates(_final_docs(spark), "text", "doc_id", k=16, bands=4).collect()
    }
    assert got == want
    assert got, "fixture must actually produce candidate pairs"


def test_delete_tombstones_all_band_rows(spark, tmp_path):
    idx = _fresh_index(spark, tmp_path)
    _apply_two_batches(spark, idx)

    live_ids = {r["id"] for r in idx.band_rows().select("id").distinct().collect()}
    assert 10 not in live_ids and 20 not in live_ids and 30 not in live_ids
    per_doc = idx.band_rows().groupBy("id").count().collect()
    assert all(r["count"] == 4 for r in per_doc), "each live doc has exactly `bands` rows"


def test_replay_is_idempotent(spark, tmp_path):
    idx = _fresh_index(spark, tmp_path)
    _apply_two_batches(spark, idx)
    before = sorted(map(str, idx.band_rows().collect()))

    # duplicate delivery of batch 1 (same offsets) must be a no-op
    docs = _docs_df(spark)
    updates = _ev(
        docs.filter(F.col("doc_id") % 3 == 0),
        F.col("doc_id") + 1000, "update", F.concat(F.col("text"), F.lit(" revised")),
    )
    deletes = _ev(docs.filter(F.col("doc_id") % 10 == 0), F.col("doc_id") + 2000, "delete", F.col("text"))
    idx.apply_doc_batch(updates.unionByName(deletes), batch_id=2)
    after = sorted(map(str, idx.band_rows().collect()))
    assert before == after


def test_stale_update_rejected_per_key(spark, tmp_path):
    """An update delivered with an OLDER offset than the applied one must
    lose the guard for every band row of the doc."""
    idx = _fresh_index(spark, tmp_path)
    _apply_two_batches(spark, idx)
    before = sorted(map(str, idx.band_rows().filter(F.col("id") == 3).collect()))

    docs = _docs_df(spark).filter(F.col("doc_id") == 3)
    stale = _ev(docs, F.lit(1), "update", F.lit("stale text that must not win"))
    idx.apply_doc_batch(stale, batch_id=3)
    after = sorted(map(str, idx.band_rows().filter(F.col("id") == 3).collect()))
    assert before == after


def test_probe_restricted_pairs(spark, tmp_path):
    """Probing only changed ids returns exactly the full pair set
    restricted to pairs touching those ids — the O(changed) query path."""
    idx = _fresh_index(spark, tmp_path)
    _apply_two_batches(spark, idx)

    full = {
        (r["id_a"], r["id_b"]): round(r["est_jaccard"], 9)
        for r in idx.candidate_pairs().collect()
    }
    probe = spark.createDataFrame([(41,)], ["id"])
    got = {
        (r["id_a"], r["id_b"]): round(r["est_jaccard"], 9)
        for r in idx.candidate_pairs(probe_ids=probe).collect()
    }
    want = {pair: v for pair, v in full.items() if 41 in pair}
    assert got == want and got


def test_sig_store_table_layout_equivalent(spark, tmp_path):
    """The normalized layout (band rows carry no signature; sigs live
    once per doc in a sibling lake table) must be observationally
    identical to the inline layout — same band rows, same candidate
    pairs — while storing the signature exactly once per live doc."""
    idx = LshIndex.create(spark, str(tmp_path / "ixt"), k=16, bands=4, n_buckets=4, sig_store="table")
    _apply_two_batches(spark, idx)

    assert "sig" not in idx.table.read().columns, "band rows must not duplicate signatures"
    n_docs = idx.sigs.read().count()
    assert n_docs == idx.band_rows().select("id").distinct().count()

    got = {
        (r["id"], r["band"]): (r["bh"], tuple(r["sig"]))
        for r in idx.band_rows().collect()
    }
    want = {
        (r["id"], r["band"]): (r["bh"], tuple(r["sig"]))
        for r in banded_signature_rows(_final_docs(spark), "text", "doc_id", k=16, bands=4).collect()
    }
    assert got == want

    # reload (params + sigs table round-trip) and probe
    loaded = LshIndex.load(spark, str(tmp_path / "ixt"))
    assert loaded.sig_store == "table" and loaded.sigs is not None
    pairs = {
        (r["id_a"], r["id_b"]): round(r["est_jaccard"], 9)
        for r in loaded.candidate_pairs().collect()
    }
    want_pairs = {
        (r["id_a"], r["id_b"]): round(r["est_jaccard"], 9)
        for r in minhash_lsh_candidates(_final_docs(spark), "text", "doc_id", k=16, bands=4).collect()
    }
    assert pairs == want_pairs and pairs


def test_streaming_tail_into_index(spark, tmp_path):
    """The index tails a checkpointed document stream through the same
    foreachBatch loop as the document lake — final state must equal a
    full rebuild from the final doc set."""
    docs = _docs_df(spark)
    inserts = _ev(docs, F.col("doc_id"), "insert", F.col("text"))
    updates = _ev(
        docs.filter(F.col("doc_id") % 3 == 0),
        F.col("doc_id") + 1000, "update", F.concat(F.col("text"), F.lit(" revised")),
    )
    deletes = _ev(docs.filter(F.col("doc_id") % 10 == 0), F.col("doc_id") + 2000, "delete", F.col("text"))

    events_dir = str(tmp_path / "events")
    for batch in (inserts, updates.unionByName(deletes)):
        batch.coalesce(1).write.mode("append").parquet(events_dir)

    idx = _fresh_index(spark, tmp_path)
    stream = spark.readStream.schema(inserts.schema).option("maxFilesPerTrigger", "1").parquet(events_dir)
    q = idx.start_tail(stream, str(tmp_path / "ckpt"), trigger={"availableNow": True})
    try:
        assert q.awaitTermination(300), "stream did not drain"
    finally:
        if q.isActive:
            q.stop()

    got = {
        (r["id"], r["band"]): (r["bh"], tuple(r["sig"]))
        for r in idx.band_rows().collect()
    }
    want = {
        (r["id"], r["band"]): (r["bh"], tuple(r["sig"]))
        for r in banded_signature_rows(_final_docs(spark), "text", "doc_id", k=16, bands=4).collect()
    }
    assert got == want


def test_apply_and_probe_returns_batch_scoped_pairs(spark, tmp_path):
    """apply_and_probe = apply + probe of the batch's upserted ids: the
    result must equal the full pair set restricted to pairs touching
    those ids, after the batch took effect."""
    idx = _fresh_index(spark, tmp_path)
    docs = _docs_df(spark)
    idx.apply_doc_batch(_ev(docs, F.col("doc_id"), "insert", F.col("text")), batch_id=0)

    # batch 2: revise the exact-dup pair member 41 (still identical to 43
    # after the same revision is applied to both? no — only 41 changes, so
    # (41, 43) drops out of exact-band overlap OR stays a candidate; either
    # way probe must agree with the full recompute), delete doc 10
    upd = _ev(
        docs.filter(F.col("doc_id").isin(2, 41)),
        F.col("doc_id") + 1000, "update", F.concat(F.col("text"), F.lit(" second rev")),
    )
    dele = _ev(docs.filter(F.col("doc_id") == 10), F.lit(5000), "delete", F.col("text"))
    got = {
        (r["id_a"], r["id_b"]): round(r["est_jaccard"], 9)
        for r in idx.apply_and_probe(upd.unionByName(dele), batch_id=1).collect()
    }

    full = {
        (r["id_a"], r["id_b"]): round(r["est_jaccard"], 9)
        for r in idx.candidate_pairs().collect()
    }
    want = {pair: v for pair, v in full.items() if 2 in pair or 41 in pair}
    assert got == want


def test_load_roundtrips_params(spark, tmp_path):
    idx = _fresh_index(spark, tmp_path, k=32, bands=8, hash_fn="md5", seed=7)
    _apply_two_batches(spark, idx)
    loaded = LshIndex.load(spark, str(tmp_path / "ix"))
    assert (loaded.k, loaded.bands, loaded.shingle_n, loaded.seed, loaded.hash_fn) == (32, 8, 3, 7, "md5")
    assert loaded.band_rows().count() == idx.band_rows().count()


# ---------------------------------------------------------------- embeddings
VEC_AFTER_T = T.StructType([T.StructField("embedding", T.ArrayType(T.DoubleType()))])


def _vecs_df(spark):
    import math

    rows = []
    for i in range(24):
        base = [math.sin(0.7 * i + j * 0.3) for j in range(8)]
        rows.append((i, base))
    # planted near-dups: 101 ~ vec 1, 103 ~ vec 3 (ids chosen to survive
    # both the %7 update and the %10 delete, as do their partners)
    rows.append((101, [x * 1.02 + 0.01 for x in rows[1][1]]))
    rows.append((103, [x * 0.98 - 0.01 for x in rows[3][1]]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _vev(df, off_col, op):
    return df.select(
        off_col.cast("long").alias("offset"),
        F.lit(0).cast("int").alias("partition_id"),
        F.lit(0).cast("int").alias("seq_in_tx"),
        F.lit(op).alias("op"),
        F.col("vec_id"),
        (F.struct(F.col("embedding")) if op != "delete" else F.lit(None)).cast(VEC_AFTER_T).alias("after"),
        F.lit(None).cast("timestamp").alias("ts"),
    )


def _apply_vec_batches(spark, idx):
    vecs = _vecs_df(spark)
    idx.apply_vec_batch(_vev(vecs, F.col("vec_id"), "insert"), batch_id=0)
    # update: reverse the vectors of ids %7==0; delete ids %10==0
    upd = _vev(
        vecs.filter(F.col("vec_id") % 7 == 0).select("vec_id", F.reverse("embedding").alias("embedding")),
        F.col("vec_id") + 1000, "update",
    )
    dele = _vev(vecs.filter(F.col("vec_id") % 10 == 0), F.col("vec_id") + 2000, "delete")
    idx.apply_vec_batch(upd.unionByName(dele), batch_id=1)


def _final_vecs(spark):
    vecs = _vecs_df(spark)
    return vecs.filter(F.col("vec_id") % 10 != 0).select(
        "vec_id",
        F.when(F.col("vec_id") % 7 == 0, F.reverse("embedding")).otherwise(F.col("embedding")).alias("embedding"),
    )


def test_embedding_index_single_table_matches_batch_operator(spark, tmp_path):
    from binlog_es_go_spark.operators.dedup import embedding_near_dups
    from binlog_es_go_spark.operators.lsh_index import EmbeddingNearDupIndex

    idx = EmbeddingNearDupIndex.create(
        spark, str(tmp_path / "eix"), n_planes=4, n_tables=1, seed=7, dim=8, n_buckets=4
    )
    _apply_vec_batches(spark, idx)

    got = {
        (r["id_a"], r["id_b"]): round(r["cosine"], 9)
        for r in idx.candidate_pairs(threshold=0.3).collect()
    }
    want = {
        (r["id_a"], r["id_b"]): round(r["cosine"], 9)
        for r in embedding_near_dups(
            _final_vecs(spark), "embedding", "vec_id", threshold=0.3, n_planes=4, seed=7, dim=8
        ).collect()
    }
    assert got == want and got


def test_embedding_index_multi_table_superset_and_verified(spark, tmp_path):
    """n_tables=2 candidates are a superset of table 0's (any-table
    collision), every returned pair passes the exact cosine threshold,
    and planted near-dups are found."""
    from binlog_es_go_spark.operators.lsh_index import EmbeddingNearDupIndex

    one = EmbeddingNearDupIndex.create(
        spark, str(tmp_path / "e1"), n_planes=4, n_tables=1, seed=7, dim=8, n_buckets=4
    )
    two = EmbeddingNearDupIndex.create(
        spark, str(tmp_path / "e2"), n_planes=4, n_tables=2, seed=7, dim=8, n_buckets=4
    )
    _apply_vec_batches(spark, one)
    _apply_vec_batches(spark, two)

    p1 = {(r["id_a"], r["id_b"]) for r in one.candidate_pairs(threshold=0.3).collect()}
    rows2 = two.candidate_pairs(threshold=0.3).collect()
    p2 = {(r["id_a"], r["id_b"]) for r in rows2}
    assert p1 <= p2
    assert all(r["cosine"] >= 0.3 for r in rows2)
    assert (1, 101) in p2 and (3, 103) in p2, "planted near-dups must be found"


def test_embedding_index_table_layout_and_probe(spark, tmp_path):
    from binlog_es_go_spark.operators.lsh_index import EmbeddingNearDupIndex

    idx = EmbeddingNearDupIndex.create(
        spark, str(tmp_path / "ev"), n_planes=4, n_tables=2, seed=7, dim=8, n_buckets=4,
        vec_store="table",
    )
    _apply_vec_batches(spark, idx)
    assert "v" not in idx.table.read().columns

    loaded = EmbeddingNearDupIndex.load(spark, str(tmp_path / "ev"))
    assert loaded.vec_store == "table" and loaded.vecs is not None
    full = {
        (r["id_a"], r["id_b"]): round(r["cosine"], 9)
        for r in loaded.candidate_pairs(threshold=0.3).collect()
    }
    probe = spark.createDataFrame([(101,)], ["id"])
    got = {
        (r["id_a"], r["id_b"]): round(r["cosine"], 9)
        for r in loaded.candidate_pairs(threshold=0.3, probe_ids=probe).collect()
    }
    want = {pair: v for pair, v in full.items() if 101 in pair}
    assert got == want and got
