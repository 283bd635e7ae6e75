"""Deduplication family for training-data pipelines.

Exact (hash groupBy), MinHash+LSH, SimHash, n-gram Jaccard, and
embedding-cosine near-dup. Everything is JVM builtins — MinHash and
SimHash signatures are built with ``transform``/``aggregate``/``zip_with``
array expressions, so the hot path stays inside whole-stage codegen with
no Python worker at all.

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


def exact_duplicates(
    df: DataFrame, text_col: str, id_col: str, max_ids_per_group: int = 10_000
) -> DataFrame:
    """Groups of exact duplicates (after whitespace/case normalization).

    Returns (fingerprint, n_dups, doc_ids sorted) for groups with n>1.
    One shuffle; the canonical first pass of any dedup pipeline.

    ``max_ids_per_group`` bounds the materialized id array: a pathological
    group (think empty-string documents at corpus scale — billions of
    rows, one fingerprint) would otherwise build ONE unbounded row on a
    single reducer. The bound is enforced BEFORE aggregation with a
    rank-limit window (Spark plans it as WindowGroupLimit, so the cap
    applies map-side too, not just in the agg buffer); ``n_dups`` stays
    the true count and the id list is the sorted first
    ``max_ids_per_group`` members — enough for audit sampling; downstream
    dedup uses ``dedup_exact``, which never materializes groups. Pass
    ``None`` to keep full lists (one shuffle instead of two window
    passes on the same key).
    """
    fp = df.select(F.col(id_col), content_fingerprint(text_col).alias("fingerprint"))
    if max_ids_per_group is None:
        return (
            fp.groupBy("fingerprint")
            .agg(F.count("*").alias("n_dups"), F.sort_array(F.collect_list(id_col)).alias("doc_ids"))
            .filter(F.col("n_dups") > 1)
        )
    w = Window.partitionBy("fingerprint")
    capped = (
        fp.withColumn("n_dups", F.count("*").over(w))
        .withColumn("_rn", F.row_number().over(w.orderBy(F.col(id_col))))
        .filter((F.col("n_dups") > 1) & (F.col("_rn") <= max_ids_per_group))
    )
    # same hash(fingerprint) clustering as the window -> no extra exchange
    return capped.groupBy("fingerprint").agg(
        F.first("n_dups").alias("n_dups"),
        F.sort_array(F.collect_list(id_col)).alias("doc_ids"),
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

    The k permutations ride ONE fold (``aggregate``) over the base-hash
    array with a k-wide minima accumulator: the expression tree (and the
    work Catalyst does per query) is O(1) in k, AND each shingle's base
    hash is evaluated exactly once — the base array is the fold's INPUT,
    so its elements reach the lambda as bound values. The round-5 nested
    form (transform over perms with the base transform inside the lambda)
    re-evaluated the base-hash subtree once per permutation in Spark's
    interpreted higher-order-function path (no codegen, no subexpression
    elimination there): k x the per-shingle hash cost. Values are
    bit-identical (min over shingles of (a_i*h+b_i) mod p either way).
    """
    shingles = word_shingles(text_col, shingle_n)
    base = F.transform(shingles, lambda s: F.pmod(F.xxhash64(s), F.lit(_MERSENNE)))
    return _fold_signature(base, k, seed)


def _fold_signature(base: Column, k: int, seed: int) -> Column:
    """min-fold of the k permutations over a base-hash array (see
    minhash_signature): acc_i <- min(acc_i, (h*a_i + b_i) mod p), zero
    acc = p (greater than any residue, and word_shingles never yields an
    empty array, so the zero never survives). The (a, b) pairs ride two
    array LITERALS zipped at plan time — 2 Literal nodes instead of 2k
    (smaller tree for Catalyst per query, same values)."""
    params = _perm_params(k, seed)
    perms = F.arrays_zip(
        F.lit([a for a, _ in params]).alias("a"),
        F.lit([b for _, b in params]).alias("b"),
    )
    zero = F.array_repeat(F.lit(_MERSENNE).cast("long"), k)
    return F.aggregate(
        base,
        zero,
        lambda acc, h: F.zip_with(
            acc, perms, lambda m, p: F.least(m, F.pmod(h * p["a"] + p["b"], F.lit(_MERSENNE)))
        ),
    )


def minhash_signature_md5(
    text_col: Column | str, k: int = 32, shingle_n: int = 3, seed: int = 42
) -> Column:
    """MinHash signature array<long>, md5-seeded — the cross-engine twin.

    ONE md5 per shingle: ``h(s) = conv(md5(s)[0:15], 16) mod p`` (60 hex
    bits, exact in a long), then the same k arithmetic permutations as
    the xxhash64 production mode, ``h_i = (a_i*h + b_i) mod p`` with
    p = 2^31-1 (a*h < 2^62, no overflow). Any uniform, engine-agnostic
    base hash works for MinHash; md5-derived arithmetic is one an ANSI
    oracle (DuckDB: ``('0x' || substr(md5(s),1,15))::BIGINT``) reproduces
    bit-for-bit. The earlier form computed a FRESH md5 per (permutation,
    shingle) — k times the hash work per document; this keeps the oracle
    property at 1/k the per-doc hash cost, which is what dominates when
    the md5 mode runs over a real corpus. Round 6: the fold form of
    ``_fold_signature`` guarantees the once-per-shingle property AT
    EVALUATION TIME too — the round-5 nested transform re-evaluated the
    md5+conv base subtree once per permutation in Spark's interpreted
    higher-order-function path (see minhash_signature docstring).
    """
    shingles = word_shingles(text_col, shingle_n)
    base = F.transform(
        shingles,
        lambda s: F.pmod(F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long"), F.lit(_MERSENNE)),
    )
    return _fold_signature(base, k, seed)


def band_hash(sig_col: Column, band: int, r: int, hash_fn: str = "xxhash64") -> Column:
    """LSH bucket id for one band: hash of signature elements
    [band*r, band*r+r), always a STRING so an index table keyed on it has
    one schema regardless of ``hash_fn`` ("md5" = hex digest the oracle
    reproduces; "xxhash64" = decimal rendering of the 64-bit hash)."""
    sl = F.slice(sig_col, band * r + 1, r)
    if hash_fn == "md5":
        return F.md5(F.array_join(sl.cast("array<string>"), "|"))
    return F.xxhash64(sl.cast("string")).cast("string")


def banded_signature_rows(
    df: DataFrame,
    text_col: str | Column,
    id_col: str,
    k: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    seed: int = 42,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """(id, sig, band, bh) — one row per (document, band): the banded-LSH
    index rows for the given documents. Shared by the batch candidate
    pipeline (:func:`minhash_lsh_candidates`) and the incrementally
    maintained index (operators/lsh_index.py), so both compute identical
    buckets by construction."""
    assert k % bands == 0, "k must be divisible by bands"
    r = k // bands
    if hash_fn == "md5":
        sig = minhash_signature_md5(text_col, k, shingle_n)
    else:
        sig = minhash_signature(text_col, k, shingle_n, seed)
    sigs = df.select(F.col(id_col).alias("id"), sig.alias("sig"))
    return sigs.select(
        "id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        band_hash(F.col("sig"), b, r, hash_fn).alias("bh"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "sig", F.col("bb.band").alias("band"), F.col("bb.bh").alias("bh"))


def lsh_pairs_from_band_rows(banded: DataFrame, k: int, max_bucket_size: int = 1000) -> DataFrame:
    """Candidate pairs from (id, sig, band, bh) rows: docs sharing any
    band bucket pair up (id_a < id_b, deduped across bands), estimated
    similarity = fraction of matching signature elements. Buckets larger
    than ``max_bucket_size`` are dropped (boilerplate skew cap)."""
    bucket_w = Window.partitionBy("band", "bh")
    banded = banded.withColumn("_bn", F.count("*").over(bucket_w)).filter(
        F.col("_bn") <= max_bucket_size
    )
    # Materialize the candidate frame ONCE before the self-join: both join
    # sides otherwise carry the whole signature+banding subtree (verified
    # in the round-6 plan dumps — no ReusedExchange materialized), so the
    # signatures were computed and analyzed twice. The checkpoint stores
    # O(band rows) — the same magnitude the banding shuffle already moves.
    banded = banded.localCheckpoint()

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


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    seed: int = 42,
    max_bucket_size: int = 1000,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Candidate near-dup pairs via banded LSH over MinHash signatures.

    signature -> b bands of r=k/b rows; docs sharing any band hash are
    candidates. Pair estimated similarity = fraction of matching signature
    elements. ``max_bucket_size`` drops degenerate buckets (boilerplate)
    — a skew cap, logged out as dropped rather than silently exploding.

    ``hash_fn``: "xxhash64" (production: cheap 64-bit arithmetic) or
    "md5" (oracle-checkable: DuckDB recomputes the identical signature).
    """
    banded = banded_signature_rows(df, text_col, id_col, k, bands, shingle_n, seed, hash_fn)
    return lsh_pairs_from_band_rows(banded, k, max_bucket_size)


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
    # set sizes AFTER the cap, then materialize once: the self-join's two
    # branches otherwise each carry the scan → explode → two-window
    # subtree (the hoped-for exchange reuse did not materialize — round-6
    # plan dumps show both subtrees planned)
    exploded = exploded.withColumn("sz", F.count("*").over(Window.partitionBy("id")))
    exploded = exploded.localCheckpoint()
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
    """64-bit SimHash per document — pure JVM array expressions, no Python.

    Per doc: distinct lowercase tokens -> 64 hash bits per token (the two
    32-bit words of md5's first 16 hex chars) -> per-bit vote (+1 if set,
    -1 if not), folded in ONE pass over the token array with a 32-wide
    accumulator per word (``aggregate`` + ``zip_with``) -> sign bit. Stays
    inside whole-stage codegen with zero shuffle (map-side only), and —
    because md5 is available in ANSI engines — the whole definition is
    reproducible in the DuckDB oracle bit-for-bit.
    """
    toks = F.array_distinct(
        F.array_remove(F.split(F.lower(F.trim(F.col(text_col))), r"\s+"), "")
    )
    # md5 once per token (the inner transform's OUTPUT feeds the outer, so
    # the hex digest is a bound value), split into the two 32-bit words
    hexes = F.transform(toks, lambda t: F.md5(t))
    words = F.transform(
        hexes,
        lambda h: F.struct(
            F.conv(F.substring(h, 1, 8), 16, 10).cast("long").alias("hi"),
            F.conv(F.substring(h, 9, 8), 16, 10).cast("long").alias("lo"),
        ),
    )
    zeros = F.array_repeat(F.lit(0).cast("long"), 64)

    def bits64(w):
        # per-bit +/-1 votes, lo word bits 0..31 then hi word bits 0..31
        return F.array(
            *(
                [
                    F.shiftrightunsigned(w.getField(f), j).bitwiseAND(F.lit(1)).cast("long")
                    * F.lit(2) - F.lit(1)
                    for f in ("lo", "hi")
                    for j in range(32)
                ]
            )
        )

    # ONE 64-wide fold (round 6; was two 32-wide folds, each re-reading —
    # and re-hashing — the token array), then sign-bit reconstruction as a
    # power fold over a literal weights array instead of 64 chained CASE
    # WHENs: same bits, much smaller expression tree for Catalyst to
    # analyze per query. Weight order matches the vote order; index 63 is
    # the two's-complement sign bit. Intermediate sums stay in long range
    # (positive powers sum to 2^63-1 before the final negative weight).
    votes = F.aggregate(
        words, zeros, lambda acc, w: F.zip_with(acc, bits64(w), lambda a, b: a + b)
    )
    powers = F.lit([1 << j for j in range(63)] + [-(2**63)])
    simhash = F.aggregate(
        F.zip_with(votes, powers, lambda v, p: F.when(v > 0, p).otherwise(F.lit(0).cast("long"))),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )
    return df.select(F.col(id_col).alias("id"), simhash.alias("simhash"))


def simhash_near_dups(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_hamming: int = 3,
    n_blocks: int | None = None,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Near-dups by SimHash hamming distance, blocked by disjoint bit bands.

    ``max_hamming + 1`` disjoint segments guarantee (pigeonhole) that any
    pair within the radius shares at least one untouched segment, so the
    banded join finds EVERY qualifying pair — which is what lets a plain
    brute-force oracle check this operator exactly. More blocks = shorter
    segment keys = bigger buckets: the standard LSH recall/cost dial.

    ``max_bucket_size`` (OPT-IN, default None = exact) drops band buckets
    above that size before the self-join. A duplicate-heavy corpus — the
    normal case at 100 TB — lands identical signatures in one bucket and
    the join goes quadratic; the cap bounds any bucket's fan-out at
    max_bucket_size^2. It is deliberately NOT on by default because
    capping voids the pigeonhole exactness guarantee (pairs whose every
    shared segment sits in an oversized bucket are missed — typically
    exact duplicates, which ``dedup_exact`` should have removed first).
    No silent caps: when set, rows drop only via this documented filter;
    audit the loss with ``lsh_dropped_buckets`` on the same inputs.
    """
    sh = simhash64(df, text_col, id_col)
    blocks = max(2, min(n_blocks or (max_hamming + 1), 32))
    bounds = [round(i * 64 / blocks) for i in range(blocks + 1)]
    banded = sh.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("blk"),
                        F.shiftrightunsigned(F.col("simhash"), bounds[i])
                        .bitwiseAND(F.lit((1 << (bounds[i + 1] - bounds[i])) - 1))
                        .alias("key"),
                    )
                    for i in range(blocks)
                ]
            )
        ).alias("b"),
    ).select("id", "simhash", "b.blk", "b.key")
    if max_bucket_size is not None:
        banded = banded.withColumn(
            "_bn", F.count("*").over(Window.partitionBy("blk", "key"))
        ).filter(F.col("_bn") <= max_bucket_size).drop("_bn")
    # one evaluation of the simhash vote expressions for both join sides
    # (see lsh_pairs_from_band_rows)
    banded = banded.localCheckpoint()
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


def fingerprint_overlap(
    corpus_a: DataFrame,
    corpus_b: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 8,
    keep_every: int = 4,
    min_shared: int = 1,
    hash_fn: str = "xxhash64",
    max_doc_freq: int | None = 1000,
) -> DataFrame:
    """Cross-corpus contamination check: pairs (a, b) sharing winnowing
    fingerprints — the train/eval decontamination primitive.

    Each side winnows its documents into a sparse w-gram signature
    (operators.text.rolling_fingerprints); the join on fingerprint is the
    candidate filter (docs with no common kept gram never pair), and
    ``n_shared`` counts the common fingerprints. Shape at 100 TB: explode
    + equi-join on the fingerprint — linear in corpus size times signature
    density (1/keep_every), never all-pairs. ``max_doc_freq`` drops
    fingerprints above that document frequency PER SIDE (license headers,
    boilerplate): a fingerprint in k_a x k_b docs emits k_a*k_b join rows,
    so the cap bounds any fingerprint's fan-out at max_doc_freq^2 — the
    same skew rule as ngram_jaccard_pairs' shingle cap.
    """
    from binlog_es_go_spark.operators.text import rolling_fingerprints

    def fps(df: DataFrame, tag: str) -> DataFrame:
        out = df.select(
            F.col(id_col).alias(f"id_{tag}"),
            F.explode(rolling_fingerprints(text_col, window, keep_every, hash_fn)).alias("fp"),
        )
        if max_doc_freq is not None:
            out = out.withColumn(
                "_df", F.count("*").over(Window.partitionBy("fp"))
            ).filter(F.col("_df") <= max_doc_freq).drop("_df")
        return out

    a, b = fps(corpus_a, "a"), fps(corpus_b, "b")
    return (
        a.join(b, on="fp")
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 25,
    stats: dict | None = None,
) -> DataFrame:
    """Connected components over an undirected pair list: (id, component),
    component = the minimum id reachable from the node.

    The last step of every near-dup pipeline: candidate PAIRS (minhash /
    simhash / jaccard / embedding) must become CLUSTERS before one
    canonical document per group can be kept — pairwise drops alone
    under-delete (A~B, B~C but A!~C still forms one duplicate family).

    Algorithm: min-label propagation WITH pointer jumping — each round
    every node takes the min of (its own label, its neighbors' labels),
    then shortcuts through its label's label (path doubling, the
    Shiloach-Vishkin move). Propagation alone needs diameter rounds — a
    10^6-node chain would need 10^6 rounds; the shortcut step makes label
    distances collapse geometrically, so rounds are O(log diameter):
    measured 18 rounds for a 2^17-edge chain and 11 for a 10^6-edge
    random graph (tests pin both bounds). Converged when a
    round changes nothing (bounded by ``max_iter``); lineage is truncated
    each round (localCheckpoint) so the plan does not grow with
    iterations.

    Round shape (round-6 rework — per-round shuffle volume halved vs the
    4-join round-3 loop): the EDGE table is hash-partitioned by ``dst``
    once, outside the loop (localCheckpoint preserves the partitioning),
    so the O(E) side of the per-round join never re-shuffles — only the
    O(V) label side moves. Neighbor-min and own-label fold in one
    union + partial-aggregated groupBy (not a join + agg + left join),
    the pointer-jump join's probe side arrives already partitioned by id
    from that groupBy (no exchange), and convergence is checked by
    carrying each node's previous label through the round and counting
    label != old on the checkpointed result — a scan, where the round-3
    loop paid a fourth (join) shuffle. No collect, no driver-side graph.

    ``stats``: optional dict; ``stats["rounds"]`` records the rounds run
    (scale instrumentation for bench.py's long-chain corpus).
    """
    spark = pairs.sparkSession
    n_part = spark.conf.get("spark.sql.shuffle.partitions")
    edges = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    edges = (
        edges.unionByName(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .distinct()
        .repartition(int(n_part), "dst")
        .localCheckpoint()
    )
    labels = (
        edges.select(F.col("src").alias("id")).distinct().withColumn("label", F.col("id"))
    ).localCheckpoint()
    id_t = dict(labels.dtypes)["id"]
    rounds = 0
    for _ in range(max_iter):
        # neighbor contributions + each node's own (old) label, folded by
        # one partially-aggregated groupBy; _old survives as max() because
        # exactly one union branch carries it per id
        contrib = edges.join(labels, edges["dst"] == labels["id"]).select(
            edges["src"].alias("id"),
            F.col("label"),
            F.lit(None).cast(id_t).alias("_old"),
        )
        merged = (
            labels.select("id", "label", F.col("label").alias("_old"))
            .unionByName(contrib)
            .groupBy("id")
            .agg(F.min("label").alias("label"), F.max("_old").alias("_old"))
        )
        # pointer jumping: label <- label(label). Labels are always ids of
        # component members (label(x) <= x, monotone), so the fixpoint
        # argument is untouched — the shortcut only accelerates descent.
        new_labels = (
            merged.alias("a")
            .join(
                merged.select(
                    F.col("id").alias("_pid"), F.col("label").alias("_plabel")
                ).alias("b"),
                F.col("a.label") == F.col("b._pid"),
                "left",
            )
            .select(
                F.col("a.id").alias("id"),
                F.least(
                    F.col("a.label"), F.coalesce(F.col("_plabel"), F.col("a.label"))
                ).alias("label"),
                F.col("a._old").alias("_old"),
            )
            .localCheckpoint()
        )
        changed = new_labels.filter(F.col("label") != F.col("_old")).count()
        labels = new_labels.drop("_old")
        rounds += 1
        if changed == 0:
            break
    if stats is not None:
        stats["rounds"] = rounds
    return labels.select(F.col("id"), F.col("label").alias("component"))


def near_dup_clusters(
    pairs: DataFrame, id_a: str = "id_a", id_b: str = "id_b", max_iter: int = 25
) -> DataFrame:
    """Resolve candidate pairs into duplicate clusters:
    (doc_id, cluster_id, n_members, is_canonical) — keep the
    ``is_canonical`` rows (min id per cluster) to dedup the corpus."""
    cc = connected_components(pairs, id_a, id_b, max_iter)
    w = Window.partitionBy("component")
    return cc.select(
        F.col("id").alias("doc_id"),
        F.col("component").alias("cluster_id"),
        F.count("*").over(w).alias("n_members"),
        (F.col("id") == F.col("component")).alias("is_canonical"),
    )


def lsh_dropped_buckets(bucketed: DataFrame, bucket_cols: list[str], max_bucket_size: int) -> DataFrame:
    """Audit companion for the LSH skew caps: the buckets a given
    ``max_bucket_size`` would drop, with their sizes. Run it on the same
    bucketed/banded frame to quantify (and log) what a cap costs before
    turning it on — the "no silent caps" rule made queryable."""
    return (
        bucketed.groupBy(*bucket_cols)
        .agg(F.count("*").alias("bucket_size"))
        .filter(F.col("bucket_size") > max_bucket_size)
    )


def embedding_near_dups(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    threshold: float = 0.95,
    n_planes: int = 16,
    seed: int = 42,
    dim: int | None = None,
    max_bucket_size: int | None = 1000,
) -> DataFrame:
    """Embedding-cosine near-dup via random-hyperplane LSH + exact verify.

    Sign pattern over ``n_planes`` seeded hyperplanes buckets the vectors;
    only same-bucket pairs get the exact cosine. Planes are generated
    driver-side (numpy, seeded) and folded into the plan as literals.
    Pass ``dim`` when known to skip the probe job.

    ``max_bucket_size`` (DEFAULT ON) drops sign-pattern buckets larger
    than the cap before the self-join: identical/near-identical embeddings
    (duplicate-heavy corpora — the normal case at scale) all share one
    bucket, whose join otherwise emits bucket_size^2 rows. The operator is
    approximate by construction, so a bounded-recall cap is the right
    default here (unlike simhash's exactness guarantee); pass None for the
    uncapped behavior and ``lsh_dropped_buckets`` to audit the loss.
    """
    import numpy as np

    if dim is None:
        dim = int(df.select(F.size(vec_col).alias("d")).first()["d"])
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim))

    def bucket_bits() -> Column:
        # one array literal per plane — see similarity.hyperplane_bucket
        bits = []
        for p in planes:
            dot = F.aggregate(
                F.zip_with(vec_col, F.lit([float(x) for x in p]), lambda a, b: a * b),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            bits.append(F.when(dot >= 0, F.lit("1")).otherwise(F.lit("0")))
        return F.concat(*bits)

    norm_v = F.sqrt(
        F.aggregate(F.transform("v", lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x)
    )
    bucketed = df.select(
        F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v"), bucket_bits().alias("bkt")
    ).withColumn("nrm", norm_v)
    if max_bucket_size is not None:
        bucketed = bucketed.withColumn(
            "_bn", F.count("*").over(Window.partitionBy("bkt"))
        ).filter(F.col("_bn") <= max_bucket_size).drop("_bn")
    # one evaluation of the hyperplane fold expressions — and of each
    # row's norm: per-side norms are bit-identical to the per-pair form
    # (the final dot/(na*nb) is the same float ops) at 1/bucket-size of
    # the fold work — for both join sides (see lsh_pairs_from_band_rows)
    bucketed = bucketed.localCheckpoint()
    a, b = bucketed.alias("a"), bucketed.alias("b")
    dot = F.aggregate(F.zip_with("a.v", "b.v", lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)
    cos = dot / (F.col("a.nrm") * F.col("b.nrm"))
    return (
        a.join(b, on="bkt")
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"), cos.alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )
