"""Dedup family, ANN similarity, text analysis, multimodal plumbing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from binlog_es_go_spark.operators.dedup import (
    dedup_exact,
    embedding_near_dups,
    exact_duplicates,
    minhash_lsh_candidates,
    minhash_signature,
    ngram_jaccard_pairs,
    simhash_near_dups,
)
from binlog_es_go_spark.operators.multimodal import (
    extract_features,
    frame_sample_plan,
    synthesize_media,
)
from binlog_es_go_spark.operators.similarity import cosine_topk, cosine_topk_np, ivf_topk
from binlog_es_go_spark.operators.text import (
    lang_id,
    quality_score,
    rolling_fingerprints,
    token_count_bpe,
    token_count_ws,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    d = spark.read.parquet(f"{SF}/documents.parquet")
    d.cache().count()
    yield d
    # unpersist so later plan-assertion tests see a real parquet scan, not
    # the cache manager substituting this full-schema InMemoryRelation
    d.unpersist()


@pytest.fixture(scope="module")
def embeddings(spark):
    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    e.cache().count()
    yield e
    e.unpersist()


# ------------------------------------------------------------------ dedup
def test_exact_duplicates(spark):
    df = spark.createDataFrame(
        [(1, "Hello  World"), (2, "hello world"), (3, "different"), (4, "HELLO WORLD ")],
        ["doc_id", "text"],
    )
    groups = exact_duplicates(df, "text", "doc_id").collect()
    assert len(groups) == 1 and groups[0]["doc_ids"] == [1, 2, 4]
    kept = dedup_exact(df, "text", "doc_id").select("doc_id").collect()
    assert sorted(r["doc_id"] for r in kept) == [1, 3]


def test_minhash_signature_properties(spark):
    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog today"),
         (2, "the quick brown fox jumps over the lazy dog tonight"),
         (3, "completely unrelated text about spark query engines")],
        ["doc_id", "text"],
    )
    sigs = df.select("doc_id", minhash_signature("text", k=64).alias("sig")).collect()
    by_id = {r["doc_id"]: r["sig"] for r in sigs}
    assert all(len(s) == 64 for s in by_id.values())
    sim_close = sum(a == b for a, b in zip(by_id[1], by_id[2])) / 64
    sim_far = sum(a == b for a, b in zip(by_id[1], by_id[3])) / 64
    assert sim_close > 0.5 > sim_far


def test_minhash_lsh_finds_near_dups(spark, docs):
    # plant a near-duplicate of an existing doc
    base = docs.filter(F.col("doc_id") == 0).select("text").first()["text"]
    mutated = base.rsplit(" ", 2)[0] + " mutated tail"
    planted = spark.createDataFrame([(100000, mutated)], ["doc_id", "text"])
    corpus = docs.select("doc_id", "text").unionByName(planted)
    pairs = minhash_lsh_candidates(corpus, "text", "doc_id", k=64, bands=16).filter(
        "est_jaccard >= 0.5"
    )
    found = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (0, 100000) in found


def test_ngram_jaccard_exact(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "a b c d e g"), (3, "x y z w v u")], ["doc_id", "text"]
    )
    pairs = ngram_jaccard_pairs(df, "text", "doc_id", shingle_n=2, threshold=0.1).collect()
    assert len(pairs) == 1
    p = pairs[0]
    # shingles(1)={ab,bc,cd,de,ef}, shingles(2)={ab,bc,cd,de,eg}: 4/6
    assert (p["id_a"], p["id_b"]) == (1, 2) and abs(p["jaccard"] - 4 / 6) < 1e-9


def test_ngram_jaccard_df_cap_kills_boilerplate_blowup(spark):
    """A stop-shingle present in EVERY doc must not pair the whole corpus:
    with the document-frequency cap the join stays linear (0 pairs here);
    uncapped it would emit n*(n-1)/2 candidate pairs."""
    n = 400
    rows = [(i, f"common boiler plate unique{i} token{i} word{i}") for i in range(n)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    capped = ngram_jaccard_pairs(df, "text", "doc_id", shingle_n=3, threshold=0.01, max_doc_freq=100)
    assert capped.count() == 0
    uncapped = ngram_jaccard_pairs(df, "text", "doc_id", shingle_n=3, threshold=0.01, max_doc_freq=None)
    assert uncapped.count() == n * (n - 1) // 2  # the blowup the cap prevents
    # the cap is symmetric (numerator AND denominator): a true near-dup pair
    # still scores on its informative shingles only
    df2 = spark.createDataFrame(
        [(1, "common boiler plate a b c d"), (2, "common boiler plate a b c e"), (3, "common boiler plate x y z w")],
        ["doc_id", "text"],
    )
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"]
             for r in ngram_jaccard_pairs(df2, "text", "doc_id", shingle_n=3, threshold=0.3, max_doc_freq=2).collect()}
    # "common boiler plate" (df=3) drops; the df=2 shingles shared by 1&2
    # ("boiler plate a", "plate a b", "a b c") stay: jac = 3/(4+4-3) = 0.6
    assert (1, 3) not in pairs
    assert abs(pairs[(1, 2)] - 0.6) < 1e-9


def test_simhash_near_dups(spark):
    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog " * 3),
         (2, "the quick brown fox jumps over the lazy cat " * 3),
         (3, "entirely different content about database engines and storage")],
        ["doc_id", "text"],
    )
    # md5-bit simhash distances here: h(1,2)=12, h(1,3)=29, h(2,3)=35.
    # radius 12 -> 13 pigeonhole blocks GUARANTEE the (1,2) pair is found.
    pairs = simhash_near_dups(df, "text", "doc_id", max_hamming=12)
    found = {(r["id_a"], r["id_b"]): r["hamming"] for r in pairs.collect()}
    assert found == {(1, 2): 12}

    # the banding is exhaustive within the radius: it must equal the
    # brute-force pair set, not just intersect it
    from binlog_es_go_spark.operators.dedup import simhash64

    sig = {r["id"]: r["simhash"] for r in simhash64(df, "text", "doc_id").collect()}
    brute = {
        (a, b): bin(((sig[a] ^ sig[b]) + (1 << 64)) % (1 << 64)).count("1")
        for a in sig for b in sig if a < b
    }
    assert found == {k: v for k, v in brute.items() if v <= 12}


def test_embedding_near_dups(spark):
    vecs = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.999, 0.01, 0.0, 0.0]),   # near-dup of 1
        (3, [0.0, 1.0, 0.0, 0.0]),      # orthogonal
    ]
    df = spark.createDataFrame(vecs, ["vec_id", "embedding"])
    pairs = embedding_near_dups(df, "embedding", "vec_id", threshold=0.95, n_planes=4)
    found = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (1, 2) in found and (1, 3) not in found


# ------------------------------------------------------------- similarity
def test_cosine_topk_exact_vs_np(spark, embeddings):
    queries = embeddings.filter(F.col("vec_id") < 3)
    corpus = embeddings
    k = 5
    a = cosine_topk(corpus, queries, "embedding", "vec_id", "vec_id", k=k)
    b = cosine_topk_np(corpus, queries, "embedding", "vec_id", "vec_id", k=k)
    ra = {(r["query_id"], r["rank"]): r["doc_id"] for r in a.collect()}
    rb = {(r["query_id"], r["rank"]): r["doc_id"] for r in b.collect()}
    assert ra == rb
    # self-similarity must rank first
    assert all(ra[(q, 1)] == q for q in range(3))


def test_ivf_topk_recall(spark, embeddings):
    queries = embeddings.filter(F.col("vec_id") < 10)
    exact = cosine_topk(embeddings, queries, "embedding", "vec_id", "vec_id", k=1)
    approx = ivf_topk(embeddings, queries, "embedding", "vec_id", "vec_id", k=1, n_planes=4)
    # query's own vector shares its bucket, so rank-1 self-hit always survives
    got = {r["query_id"]: r["doc_id"] for r in approx.collect()}
    exp = {r["query_id"]: r["doc_id"] for r in exact.collect()}
    hits = sum(got.get(q) == d for q, d in exp.items())
    assert hits >= 8  # >=80% recall@1 on self-similar corpus


def test_ivf_multi_probe_raises_recall(spark, embeddings):
    """Probing the hamming-1 buckets must dominate single-probe recall@10:
    every single-probe hit is also a multi-probe candidate (superset of
    probed lists), and borderline neighbors on the far side of one
    hyperplane come back."""
    queries = embeddings.filter(F.col("vec_id") < 10)
    exact = cosine_topk(embeddings, queries, "embedding", "vec_id", "vec_id", k=10)
    single = ivf_topk(embeddings, queries, "embedding", "vec_id", "vec_id", k=10, n_planes=4)
    multi = ivf_topk(embeddings, queries, "embedding", "vec_id", "vec_id", k=10, n_planes=4,
                     multi_probe=True)

    def hitset(df):
        return {(r["query_id"], r["doc_id"]) for r in df.collect()}

    truth, s, m = hitset(exact), hitset(single), hitset(multi)
    recall_s = len(s & truth) / len(truth)
    recall_m = len(m & truth) / len(truth)
    # measured on this fixture: single 0.25, multi 0.48 — multi-probe must
    # dominate (superset of probed lists) and add real recall
    assert recall_m >= recall_s + 0.1
    assert recall_m >= 0.4, f"multi-probe recall@10 too low: {recall_m}"


# ------------------------------------------------------------------- text
def test_lang_id(spark):
    df = spark.createDataFrame(
        [(1, "the cat and the dog sat in that house and it is warm"),
         (2, "der Hund und die Katze ist nicht ein Problem zu haben"),
         (3, "le chat est dans la maison et les enfants pour une fois"),
         (4, "zzz qqq xxx")],
        ["id", "text"],
    )
    got = {r["id"]: r["lang"] for r in df.select("id", lang_id("text").alias("lang")).collect()}
    assert got == {1: "en", 2: "de", 3: "fr", 4: "und"}


def test_token_counts(spark):
    df = spark.createDataFrame([(1, "hello world, 12345 extraordinarily!")], ["id", "text"])
    r = df.select(token_count_ws("text").alias("ws"), token_count_bpe("text").alias("bpe")).first()
    assert r["ws"] == 4
    # hello(1) world(1) ,(1) 123+45(2) extraordi+narily(2) !(1) = 8
    assert r["bpe"] == 8


def test_quality_score_ordering(spark, docs):
    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog and runs through the field " * 8),
         (2, "!!! ??? ### $$$ %%%")],
        ["id", "text"],
    )
    got = {r["id"]: r["q"] for r in df.select("id", quality_score("text").alias("q")).collect()}
    assert got[1] > 0.6 > got[2]
    # runs over the real documents table without error, bounded [0,1]
    stats = docs.select(quality_score("text").alias("q")).agg(
        F.min("q").alias("lo"), F.max("q").alias("hi")
    ).first()
    assert 0.0 <= stats["lo"] and stats["hi"] <= 1.0


def test_hash_split_deterministic_and_proportional(spark, docs):
    """Split assignment is a pure function of the id (stable under
    re-partitioning/re-runs) and tracks the requested proportions."""
    from binlog_es_go_spark.operators.text import hash_split

    split = hash_split("doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    a = {r["doc_id"]: r["s"] for r in docs.select("doc_id", split.alias("s")).collect()}
    b = {r["doc_id"]: r["s"] for r in docs.repartition(7).select("doc_id", split.alias("s")).collect()}
    assert a == b, "split must not depend on partitioning"
    n = len(a)
    frac_train = sum(1 for v in a.values() if v == "train") / n
    assert 0.7 < frac_train < 0.9
    assert set(a.values()) == {"train", "val", "test"}


def test_fingerprint_overlap_finds_contamination(spark):
    """Decontamination primitive: a verbatim train/eval leak pairs with a
    high shared-fingerprint count; unrelated docs never pair."""
    from binlog_es_go_spark.operators.dedup import fingerprint_overlap

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 6
    train = spark.createDataFrame(
        [(1, base), (2, "totally unrelated training text about engines " * 8)],
        ["doc_id", "text"],
    )
    eval_ = spark.createDataFrame(
        [(10, base),  # leaked verbatim
         (11, "independent evaluation prompt of different words " * 8)],
        ["doc_id", "text"],
    )
    got = {(r["id_a"], r["id_b"]): r["n_shared"]
           for r in fingerprint_overlap(train, eval_, min_shared=1).collect()}
    assert set(got) == {(1, 10)}
    # verbatim copy shares the whole (sparse, ~1/keep_every) signature:
    # 60 words -> 53 8-grams -> ~13 hashes expected mod 4, 3 kept distinct
    # on this text (the repeat collapses duplicates)
    assert got[(1, 10)] >= 3


def test_fingerprint_overlap_df_cap_kills_boilerplate(spark):
    """A license-header fingerprint shared by every doc on both sides must
    not cross-pair the corpora: the per-side df cap bounds the join."""
    from binlog_es_go_spark.operators.dedup import fingerprint_overlap

    header = "standard license header words repeated here every single time okay "
    a = spark.createDataFrame([(i, header + f"unique-a-{i} " * 8) for i in range(200)], ["doc_id", "text"])
    b = spark.createDataFrame([(i, header + f"unique-b-{i} " * 8) for i in range(200)], ["doc_id", "text"])
    capped = fingerprint_overlap(a, b, min_shared=1, max_doc_freq=50)
    assert capped.count() == 0
    uncapped = fingerprint_overlap(a, b, min_shared=1, max_doc_freq=None)
    assert uncapped.count() >= 200 * 200 * 0.9  # the blowup the cap prevents


def test_rolling_fingerprints_overlap(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 6
    edited = base.replace("delta", "DELTA", 1)
    df = spark.createDataFrame([(1, base), (2, edited), (3, "unrelated words entirely " * 10)], ["id", "text"])
    fps = {r["id"]: set(r["fp"]) for r in df.select("id", rolling_fingerprints("text").alias("fp")).collect()}
    inter_close = len(fps[1] & fps[2])
    inter_far = len(fps[1] & fps[3])
    assert inter_close > inter_far


# ------------------------------------------------------------- multimodal
def test_multimodal_plumbing(spark):
    media = synthesize_media(spark, n=30)
    feats = extract_features(media)
    rows = feats.collect()
    assert len(rows) == 30
    assert all(0 <= r["byte_mean"] <= 255 for r in rows)
    # deterministic across runs
    again = {r["media_id"]: r["head_sha256"] for r in extract_features(media).collect()}
    assert again == {r["media_id"]: r["head_sha256"] for r in rows}


def test_multimodal_real_codecs_decode_headers(spark):
    """PPM width/height come from parsing the actual header bytes; WAV
    sample rate comes from the RIFF fmt chunk — and both agree with the
    metadata the generator declared."""
    media = synthesize_media(spark, n=30)
    rows = {r["media_id"]: r for r in extract_features(media).collect()}
    meta = {r["media_id"]: r for r in media.select("media_id", "kind", "meta").collect()}
    for mid, r in rows.items():
        kind = meta[mid]["kind"]
        if kind == "image":
            assert r["fmt"] == "ppm"
            assert r["width"] == meta[mid]["meta"]["width"]
            assert r["height"] == meta[mid]["meta"]["height"]
            assert all(0 <= r[c] <= 255 for c in ("mean_r", "mean_g", "mean_b"))
            # payload = header + w*h*3 pixel bytes, so n_bytes > pixel bytes
            assert r["n_bytes"] > r["width"] * r["height"] * 3
        elif kind == "audio":
            assert r["fmt"] == "wav"
            assert r["sample_rate"] == 8000 and r["n_samples"] == 24
            assert r["rms"] >= 0.0
        else:
            assert r["fmt"] == "y4m"
            assert r["n_frames"] == 2 and r["fps"] == 25.0
            assert r["width"] in (2, 3) and r["height"] == 2
            assert 0 <= r["mean_y"] <= 255 and r["rms"] is None


def test_multimodal_codec_decodes_handcrafted_files(spark):
    """Byte-level golden check: a hand-assembled 2x1 PPM and a 2-sample WAV
    decode to exactly the values computed by hand."""
    import struct as _struct

    ppm = b"P6\n2 1\n255\n" + bytes([10, 20, 30, 110, 120, 130])
    wav = (
        b"RIFF" + _struct.pack("<I", 40) + b"WAVE"
        + b"fmt " + _struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
        + b"data" + _struct.pack("<I", 4) + _struct.pack("<hh", 3, -4)
    )
    media = spark.createDataFrame(
        [(0, "image", bytearray(ppm), None), (1, "audio", bytearray(wav), None)],
        "media_id long, kind string, payload binary, meta struct<mime:string,width:int,height:int,duration_ms:long>",
    )
    got = {r["media_id"]: r for r in extract_features(media, require_codecs=True).collect()}
    img = got[0]
    assert (img["fmt"], img["width"], img["height"]) == ("ppm", 2, 1)
    assert (img["mean_r"], img["mean_g"], img["mean_b"]) == (60.0, 70.0, 80.0)
    aud = got[1]
    assert (aud["fmt"], aud["sample_rate"], aud["n_samples"]) == ("wav", 8000, 2)
    assert aud["rms"] == pytest.approx(((9 + 16) / 2) ** 0.5)


def test_multimodal_require_codecs_raises_on_unrecognized(spark):
    # an unrecognized container (e.g. real MP4 bytes, which need ffmpeg)
    # is the honest gate: fail loudly instead of silently byte-statting
    media = spark.createDataFrame(
        [(0, "video", bytearray(b"\x00\x00\x00\x18ftypmp42 not a decodable payload"), None)],
        "media_id long, kind string, payload binary, meta struct<mime:string,width:int,height:int,duration_ms:long>",
    )
    with pytest.raises(Exception, match="NotImplementedError|unrecognized container"):
        extract_features(media, require_codecs=True).collect()
    # all three synthesized kinds now pass under the strict gate
    ok = extract_features(synthesize_media(spark, n=6), require_codecs=True).collect()
    assert len(ok) == 6 and all(r["fmt"] in ("ppm", "wav", "y4m") for r in ok)


def test_multimodal_y4m_handcrafted(spark):
    """Byte-level golden check: a hand-assembled 2-frame 2x2 C444 Y4M
    decodes to exactly the hand-computed luma mean."""
    y4m = (b"YUV4MPEG2 W2 H2 F30:1 Ip A1:1 C444\n"
           + b"FRAME\n" + bytes([10, 20, 30, 40]) + bytes(8)
           + b"FRAME\n" + bytes([50, 60, 70, 80]) + bytes(8))
    media = spark.createDataFrame(
        [(0, "video", bytearray(y4m), None)],
        "media_id long, kind string, payload binary, meta struct<mime:string,width:int,height:int,duration_ms:long>",
    )
    r = extract_features(media, require_codecs=True).collect()[0]
    assert (r["fmt"], r["width"], r["height"], r["n_frames"]) == ("y4m", 2, 2, 2)
    assert r["fps"] == 30.0
    assert r["mean_y"] == (10 + 20 + 30 + 40 + 50 + 60 + 70 + 80) / 8


def test_frame_sample_plan(spark):
    media = synthesize_media(spark, n=9)
    plan = frame_sample_plan(media, every_ms=100)
    got = plan.groupBy("media_id").count().collect()
    vids = {r["media_id"]: r["count"] for r in got}
    # media_id 2,5,8 are videos with duration 200,500,800ms
    assert vids[2] == 2 and vids[5] == 5 and vids[8] == 8


# ----------------------------------------------------------- k-means IVF
def _clustered_vectors(n_clusters=20, per_cluster=50, dim=32, seed=3):
    """Realistic ANN fixture: embeddings CLUSTER (unlike uniform-random
    vectors, where no sublinear index can reach high recall)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    vid = 0
    for ci in range(n_clusters):
        pts = centers[ci] + 0.15 * rng.standard_normal((per_cluster, dim))
        for p in pts:
            rows.append((vid, [float(x) for x in p]))
            vid += 1
    return rows


def test_ivf_kmeans_recall_and_cost(spark):
    """The verdict-r2 bar: recall@10 >= 0.8 at <= 1/8 the brute-force cost
    on clustered embeddings (sampled k-means centroids, nprobe=2/20)."""
    from binlog_es_go_spark.operators.similarity import ivf_kmeans_topk

    rows = _clustered_vectors()
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"]).cache()
    n = emb.count()
    queries = emb.filter(F.col("vec_id") % 100 == 7)  # one per cluster area
    nq = queries.count()

    exact = cosine_topk(emb, queries, "embedding", "vec_id", "vec_id", k=10)
    approx = ivf_kmeans_topk(
        emb, queries, "embedding", "vec_id", "vec_id",
        k=10, n_centroids=20, nprobe=2, sample_mod=4, seed=42,
    )
    truth = {(r["query_id"], r["doc_id"]) for r in exact.collect()}
    got = {(r["query_id"], r["doc_id"]) for r in approx.collect()}
    recall = len(truth & got) / len(truth)
    assert recall >= 0.8, f"recall@10 = {recall:.2f}"

    # cost: candidates scored = sum over queries of probed list sizes;
    # brute scores n * nq pairs. nprobe/n_centroids = 1/8 by construction,
    # verify the actual list sizes agree (no degenerate giant centroid).
    from binlog_es_go_spark.operators.similarity import kmeans_centroids

    sample = sorted(
        ((r["vec_id"], r["embedding"]) for r in emb.filter(F.col("vec_id") % 4 == 0).collect())
    )
    C = kmeans_centroids([v for _, v in sample], 20, 8, 42)
    # recompute candidate count via the same assignment expressions
    from binlog_es_go_spark.operators.similarity import ivf_kmeans_topk as _ivf

    probed = _ivf(
        emb, queries, "embedding", "vec_id", "vec_id",
        k=10**9, n_centroids=20, nprobe=2, sample_mod=4, seed=42, centroids=C,
    )
    n_candidates = probed.count()
    assert n_candidates <= (n * nq) / 8, f"{n_candidates} vs brute {n * nq}"


def test_ivf_kmeans_self_hit_and_determinism(spark):
    from binlog_es_go_spark.operators.similarity import ivf_kmeans_topk

    rows = _clustered_vectors(n_clusters=6, per_cluster=30)
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"]).cache()
    queries = emb.filter(F.col("vec_id") < 5)
    a = ivf_kmeans_topk(emb, queries, "embedding", "vec_id", "vec_id", k=5, n_centroids=8)
    ra = {(r["query_id"], r["rank"]): r["doc_id"] for r in a.collect()}
    # a query's own vector is always in its probed (= assigned) list
    assert all(ra[(q, 1)] == q for q in range(5))
    rb = {(r["query_id"], r["rank"]): r["doc_id"]
          for r in ivf_kmeans_topk(emb, queries, "embedding", "vec_id", "vec_id", k=5, n_centroids=8).collect()}
    assert ra == rb


def test_exact_duplicates_group_cap(spark):
    """A pathological fingerprint group (every row identical) must not
    materialize an unbounded id array: n_dups stays the true count, the
    id list is capped."""
    rows = [(i, "same text") for i in range(500)] + [(1000, "other"), (1001, "OTHER ")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = exact_duplicates(df, "text", "doc_id", max_ids_per_group=10).collect()
    by_n = {r["n_dups"]: r["doc_ids"] for r in got}
    assert by_n[500] == list(range(10)), "capped at first 10 sorted ids"
    assert by_n[2] == [1000, 1001], "small groups unaffected"
    full = exact_duplicates(df, "text", "doc_id", max_ids_per_group=None).collect()
    assert {r["n_dups"]: len(r["doc_ids"]) for r in full} == {500: 500, 2: 2}


def test_kmeans_training_sample_bounded_as_corpus_grows(spark):
    """The IVF training collect must be O(train_rows), not O(corpus):
    growing the corpus 10x leaves the collected sample size constant
    (and the sample itself a deterministic prefix of the larger one)."""
    from binlog_es_go_spark.operators.similarity import kmeans_training_sample

    def corpus(n):
        return spark.range(n).select(
            F.col("id").alias("vec_id"),
            F.array(F.col("id").cast("double"), F.lit(1.0)).alias("embedding"),
        )

    small = kmeans_training_sample(corpus(400), "embedding", "vec_id", sample_mod=2, train_rows=64)
    big = kmeans_training_sample(corpus(4000), "embedding", "vec_id", sample_mod=2, train_rows=64)
    assert len(small) == 64 and len(big) == 64, "collect bounded by train_rows"
    assert small == big, "same deterministic id-ordered prefix at both scales"
    under = kmeans_training_sample(corpus(40), "embedding", "vec_id", sample_mod=2, train_rows=64)
    assert len(under) == 20, "smaller corpora just yield their full sample"


def test_simhash_bucket_cap_bounds_adversarial_corpus(spark):
    """2,000 identical docs share every band bucket; uncapped, the banded
    self-join would emit ~4M pairs per band. The opt-in cap drops the
    degenerate buckets (bounded candidates) while a distinct near-dup
    pair in small buckets is still found."""
    rows = [(i, "the same boilerplate sentence repeated") for i in range(2000)]
    # known near-dup pair (md5-bit hamming 12, see test_simhash_near_dups)
    rows += [(9000, "the quick brown fox jumps over the lazy dog " * 3),
             (9001, "the quick brown fox jumps over the lazy cat " * 3)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    capped = simhash_near_dups(df, "text", "doc_id", max_hamming=12, max_bucket_size=100)
    got = capped.collect()
    assert len(got) <= 10, f"candidates must stay bounded, got {len(got)}"
    assert {(r["id_a"], r["id_b"]) for r in got} >= {(9000, 9001)}, "small-bucket pair survives"


def test_embedding_lsh_bucket_cap_default_on(spark):
    """Identical embeddings all land in one sign bucket: the default cap
    drops it (bounded join) and lsh_dropped_buckets reports the loss."""
    from binlog_es_go_spark.operators.dedup import lsh_dropped_buckets

    rows = [(i, [1.0, 2.0, 3.0, 4.0]) for i in range(1500)]
    rows += [(9000, [-1.0, -2.0, -3.0, -4.0]), (9001, [-1.0, -2.0, -3.1, -4.0])]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    got = embedding_near_dups(df, "embedding", "vec_id", threshold=0.9, n_planes=8, dim=4).collect()
    assert len(got) <= 5, f"default cap must bound the join, got {len(got)} pairs"
    assert {(r["id_a"], r["id_b"]) for r in got} >= {(9000, 9001)}

    # audit companion quantifies exactly what the cap dropped
    bucketed = df.select("vec_id", F.lit("x").alias("bkt"))  # degenerate: all one bucket
    dropped = lsh_dropped_buckets(bucketed, ["bkt"], max_bucket_size=1000).collect()
    assert len(dropped) == 1 and dropped[0]["bucket_size"] == 1502

    uncapped = embedding_near_dups(
        df.filter(F.col("vec_id") >= 1400), "embedding", "vec_id",
        threshold=0.9, n_planes=8, dim=4, max_bucket_size=None,
    )
    assert uncapped.count() >= 1, "None disables the cap (legacy exact behavior)"


def test_connected_components_chains_and_islands(spark):
    """A~B~C folds into one family even though A!~C (the reason pairwise
    dedup under-deletes); disjoint families keep distinct components; a
    longer chain exercises several propagation rounds."""
    from binlog_es_go_spark.operators.dedup import connected_components, near_dup_clusters

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 23), (23, 24)],
        ["id_a", "id_b"],
    )
    comp = {r["id"]: r["component"] for r in connected_components(pairs).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10,
                    20: 20, 21: 20, 22: 20, 23: 20, 24: 20}

    clusters = near_dup_clusters(pairs).collect()
    by_id = {r["doc_id"]: r for r in clusters}
    assert by_id[3]["cluster_id"] == 1 and by_id[3]["n_members"] == 3
    assert by_id[24]["cluster_id"] == 20 and by_id[24]["n_members"] == 5
    canon = {r["doc_id"] for r in clusters if r["is_canonical"]}
    assert canon == {1, 10, 20}

    # worst-case chain ordered AGAINST the propagation direction still
    # converges within max_iter (diameter rounds)
    chain = spark.createDataFrame([(i, i + 1) for i in range(30)], ["id_a", "id_b"])
    got = {r["id"]: r["component"] for r in connected_components(chain, max_iter=40).collect()}
    assert set(got.values()) == {0} and len(got) == 31


def test_connected_components_scale_round_bounds(spark):
    """VERDICT r4 #8: rounds must stay O(log diameter), not O(diameter).
    Pointer jumping (label <- label(label)) makes a 2^16-edge chain — the
    adversarial worst case for min-label propagation — converge in ~17
    rounds instead of 65,536; and a 10^6-edge random graph (giant
    component, log-ish diameter) in ~11. The bounds below are 2x the
    measured values, so a regression to propagation-only (or a broken
    shortcut join) trips them immediately."""
    from pyspark.sql import functions as F

    from binlog_es_go_spark.operators.dedup import connected_components

    n = 1 << 16
    chain = spark.range(n).select(F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b"))
    st: dict = {}
    res = connected_components(chain, max_iter=60, stats=st)
    assert res.filter(F.col("component") != 0).count() == 0, "one chain, one component"
    assert st["rounds"] <= 2 * 17, f"chain rounds blew up: {st['rounds']}"

    m = 1_000_000
    nodes = m // 2
    g = spark.range(m).select(
        F.pmod(F.xxhash64(F.col("id")), F.lit(nodes)).alias("id_a"),
        F.pmod(F.xxhash64(F.col("id") + 7_777_777), F.lit(nodes)).alias("id_b"),
    ).filter(F.col("id_a") != F.col("id_b"))
    st2: dict = {}
    res2 = connected_components(g, max_iter=60, stats=st2)
    assert st2["rounds"] <= 24, f"giant-component rounds blew up: {st2['rounds']}"
    # avg degree 4 over 500k nodes: almost everything is one giant
    # component; distinct components must be tiny relative to node count
    assert res2.select("component").distinct().count() < 2_000
