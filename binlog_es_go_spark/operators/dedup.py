"""Deduplication family for training-data pipelines.

Exact (hash groupBy), MinHash+LSH, SimHash, n-gram Jaccard, and
embedding-cosine near-dup. Everything except the two numpy-vectorized
pandas UDFs (simhash, embedding LSH) is JVM builtins; MinHash signatures
are built with ``transform``/``aggregate`` array expressions so the hot
path stays inside whole-stage codegen.

Scale notes (the 100 TB story):

* exact dedup: one shuffle on the fingerprint; at scale, pre-partition by
  fingerprint prefix or rely on AQE.
* MinHash LSH: candidate generation explodes b bands per doc and shuffles
  on (band, band_hash) — band buckets are the only quadratic surface, and
  skewed buckets (boilerplate docs) are capped by ``max_bucket_size``.
* verification joins only candidate pairs, never all pairs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from binlog_es_go_spark.operators.functions import content_fingerprint, word_shingles

# deterministic 64-bit mix constants for minhash permutations
_MERSENNE = (1 << 31) - 1  # Mersenne-31: a*h+b stays < 2^62 (ANSI-safe)


def _perm_params(k: int, seed: int) -> list[tuple[int, int]]:
    """k deterministic (a, b) pairs for h_i(x) = (a*x + b) mod p."""
    import hashlib

    params = []
    for i in range(k):
        d = hashlib.sha256(f"minhash-{seed}-{i}".encode()).digest()
        a = (int.from_bytes(d[:8], "big") % (_MERSENNE - 1)) + 1
        b = int.from_bytes(d[8:16], "big") % _MERSENNE
        params.append((a, b))
    return params


def exact_duplicates(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Groups of exact duplicates (after whitespace/case normalization).

    Returns (fingerprint, n_dups, doc_ids sorted) for groups with n>1.
    One shuffle; the canonical first pass of any dedup pipeline.
    """
    return (
        df.select(F.col(id_col), content_fingerprint(text_col).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(F.count("*").alias("n_dups"), F.sort_array(F.collect_list(id_col)).alias("doc_ids"))
        .filter(F.col("n_dups") > 1)
    )


def dedup_exact(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Keep the min-id representative of each exact-duplicate group."""
    w = Window.partitionBy(content_fingerprint(text_col)).orderBy(F.col(id_col))
    return df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")


def minhash_signature(
    text_col: Column | str, k: int = 64, shingle_n: int = 3, seed: int = 42
) -> Column:
    """MinHash signature array<long> of length k — pure array expressions.

    h_i(shingle) = (a_i * (xxhash64(shingle) mod p) + b_i) mod p, p=2^31-1;
    signature element i is the min over the document's distinct shingles.
    """
    shingles = word_shingles(text_col, shingle_n)
    base = F.transform(shingles, lambda s: F.pmod(F.xxhash64(s), F.lit(_MERSENNE)))
    sig = F.array(
        *[
            F.array_min(
                F.transform(base, lambda h: F.pmod(h * F.lit(a) + F.lit(b), F.lit(_MERSENNE)))
            )
            for a, b in _perm_params(k, seed)
        ]
    )
    return sig


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    seed: int = 42,
    max_bucket_size: int = 1000,
) -> DataFrame:
    """Candidate near-dup pairs via banded LSH over MinHash signatures.

    signature -> b bands of r=k/b rows; docs sharing any band hash are
    candidates. Pair estimated similarity = fraction of matching signature
    elements. ``max_bucket_size`` drops degenerate buckets (boilerplate)
    — a skew cap, logged out as dropped rather than silently exploding.
    """
    assert k % bands == 0, "k must be divisible by bands"
    r = k // bands
    sigs = df.select(F.col(id_col).alias("id"), minhash_signature(text_col, k, shingle_n, seed).alias("sig"))
    banded = sigs.select(
        "id",
        "sig",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"), F.xxhash64(F.slice("sig", b * r + 1, r).cast("string")).alias("bh")
                ),
            )
        ).alias("bb"),
    ).select("id", "sig", F.col("bb.band").alias("band"), F.col("bb.bh").alias("bh"))

    bucket_w = Window.partitionBy("band", "bh")
    banded = banded.withColumn("_bn", F.count("*").over(bucket_w)).filter(
        F.col("_bn") <= max_bucket_size
    )

    a = banded.alias("a")
    b = banded.alias("b")
    pairs = (
        a.join(b, on=["band", "bh"], how="inner")
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    # zip_with yields null on mismatch; array_compact keeps only matches
    sim = F.size(F.array_compact(F.zip_with("sig_a", "sig_b", lambda x, y: F.when(x == y, F.lit(1))))) / F.lit(
        float(k)
    )
    return pairs.select("id_a", "id_b", sim.alias("est_jaccard"))


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    shingle_n: int = 3,
    threshold: float = 0.5,
    max_doc_freq: int | None = 1000,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for all pairs sharing >=1 shingle.

    explode(shingles) -> drop shingles with document frequency above
    ``max_doc_freq`` -> self-join on shingle -> |intersection| per pair ->
    Jaccard = inter / (|A| + |B| - inter) over the KEPT shingle sets.

    The shingle join is the candidate filter, and ``max_doc_freq`` is its
    skew cap (the exact-path twin of ``max_bucket_size`` in
    minhash_lsh_candidates): a boilerplate shingle appearing in k docs
    would emit k^2 join rows — quadratic in corpus size for stop-shingles
    — while carrying no similarity signal. Dropping df > max_doc_freq
    shingles bounds any shingle's join fan-out at max_doc_freq^2 and makes
    the measure "Jaccard over informative shingles", applied symmetrically
    to numerator and denominator (so it stays a true Jaccard of the capped
    sets and is mirrored 1:1 in the SQL oracle). Pass None to disable.
    """
    sh = df.select(
        F.col(id_col).alias("id"), word_shingles(text_col, shingle_n).alias("shingles")
    )
    exploded = sh.select("id", F.explode("shingles").alias("shingle"))
    if max_doc_freq is not None:
        exploded = exploded.withColumn(
            "_df", F.count("*").over(Window.partitionBy("shingle"))
        ).filter(F.col("_df") <= max_doc_freq).drop("_df")
    # set sizes AFTER the cap: both branches of the self-join share this
    # exact subplan, so Catalyst reuses one exchange for the pair join
    exploded = exploded.withColumn("sz", F.count("*").over(Window.partitionBy("id")))
    a = exploded.alias("a")
    b = exploded.alias("b")
    inter = (
        a.join(b, on="shingle")
        .filter(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                 F.col("a.sz").alias("sz_a"), F.col("b.sz").alias("sz_b"))
        .agg(F.count("*").alias("inter"))
    )
    jac = F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter"))
    return inter.select("id_a", "id_b", jac.alias("jaccard")).filter(F.col("jaccard") >= threshold)


def simhash64(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """64-bit SimHash per document — numpy-vectorized pandas UDF.

    Per doc: tokens -> 64-bit hashes -> per-bit vote (+1 if set, -1 if
    not) -> sign bit. Arrow-batched; the per-batch work is a numpy
    unpackbits matmul, not per-row Python.
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _simhash(texts: pd.Series) -> pd.Series:
        import hashlib

        out = np.zeros(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            if not t:
                continue
            toks = t.lower().split()
            if not toks:
                continue
            hs = np.fromiter(
                (int.from_bytes(hashlib.blake2b(w.encode(), digest_size=8).digest(), "big") for w in set(toks)),
                dtype=np.uint64,
            )
            bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)) & 1).astype(np.int32)
            votes = (2 * bits - 1).sum(axis=0)
            sh = np.uint64(0)
            for j in np.nonzero(votes > 0)[0]:
                sh |= np.uint64(1) << np.uint64(j)
            out[i] = np.int64(sh.astype(np.int64))
        return pd.Series(out)

    return df.select(F.col(id_col).alias("id"), _simhash(F.col(text_col)).alias("simhash"))


def simhash_near_dups(
    df: DataFrame, text_col: str, id_col: str, max_hamming: int = 3, prefix_bits: int = 16
) -> DataFrame:
    """Near-dups by SimHash hamming distance, blocked by bit-prefix bands.

    4 rotated prefix blocks guarantee any pair within hamming<=3 shares at
    least one block (pigeonhole over 4 segments).
    """
    sh = simhash64(df, text_col, id_col)
    blocks = 4
    seg = 64 // blocks
    banded = sh.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("blk"),
                        F.shiftrightunsigned(F.col("simhash"), i * seg)
                        .bitwiseAND(F.lit((1 << seg) - 1))
                        .alias("key"),
                    )
                    for i in range(blocks)
                ]
            )
        ).alias("b"),
    ).select("id", "simhash", "b.blk", "b.key")
    a, b = banded.alias("a"), banded.alias("b")
    pairs = (
        a.join(b, on=["blk", "key"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                F.col("a.simhash").alias("h_a"), F.col("b.simhash").alias("h_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    ham = F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b")))
    return pairs.select("id_a", "id_b", ham.alias("hamming")).filter(F.col("hamming") <= max_hamming)


def embedding_near_dups(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    threshold: float = 0.95,
    n_planes: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-dup via random-hyperplane LSH + exact verify.

    Sign pattern over ``n_planes`` seeded hyperplanes buckets the vectors;
    only same-bucket pairs get the exact cosine. Planes are generated
    driver-side (numpy, seeded) and folded into the plan as literals.
    """
    import numpy as np

    first = df.select(F.size(vec_col).alias("d")).first()
    dim = int(first["d"])
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim))

    def bucket_bits() -> Column:
        bits = []
        for p in planes:
            dot = F.aggregate(
                F.zip_with(vec_col, F.array(*[F.lit(float(x)) for x in p]), lambda a, b: a * b),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            bits.append(F.when(dot >= 0, F.lit("1")).otherwise(F.lit("0")))
        return F.concat(*bits)

    bucketed = df.select(
        F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v"), bucket_bits().alias("bkt")
    )
    a, b = bucketed.alias("a"), bucketed.alias("b")
    dot = F.aggregate(F.zip_with("a.v", "b.v", lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)
    norm = lambda side: F.sqrt(F.aggregate(F.transform(f"{side}.v", lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))  # noqa: E731
    cos = dot / (norm("a") * norm("b"))
    return (
        a.join(b, on="bkt")
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"), cos.alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )
