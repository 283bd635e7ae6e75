"""Approximate-nearest-neighbor search over embedding columns.

Three tiers, trading recall for cost at 100 TB:

* ``cosine_topk``      — exact brute force, pure array expressions
                         (baseline + oracle-checkable);
* ``cosine_topk_np``   — exact brute force, broadcast queries + numpy
                         matmul inside ``mapInPandas`` (the fast path:
                         one BLAS gemm per Arrow batch);
* ``ivf_topk``         — IVF-style: k-means-ish centroid assignment via
                         seeded hyperplane buckets, probe only matching
                         buckets (the scale path: cost / n_buckets).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def _norm(v) -> Column:
    return F.sqrt(F.aggregate(F.transform(v, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))


def cosine_similarity(a, b) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str,
    id_col: str,
    query_id_col: str,
    k: int = 10,
) -> DataFrame:
    """Exact top-k by cosine: broadcast queries × corpus, window rank.

    The cross join is broadcast on the (small) query side so the corpus
    is scanned exactly once with no shuffle; the only shuffle is the
    per-query top-k window.
    """
    # cast to double BEFORE any arithmetic: float32 products then widened
    # would diverge from an all-double oracle at the last bits
    # norms ride each SIDE of the join (one fold per row), not the pair
    # expression (one fold per pair): bit-identical output — the final
    # division dot/(nd*nq) is the same float ops in the same order —
    # at 1/|queries| and 1/|corpus| of the norm work respectively
    q = F.broadcast(
        queries.select(
            F.col(query_id_col).alias("query_id"),
            F.col(vec_col).cast("array<double>").alias("qv"),
        ).withColumn("nq", _norm(F.col("qv")))
    )
    c = corpus.select(
        F.col(id_col).alias("doc_id"), F.col(vec_col).cast("array<double>").alias("dv")
    ).withColumn("nd", _norm(F.col("dv")))
    scored = c.crossJoin(q).select(
        "query_id", "doc_id",
        (_dot(F.col("dv"), F.col("qv")) / (F.col("nd") * F.col("nq"))).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("doc_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def cosine_topk_np(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str,
    id_col: str,
    query_id_col: str,
    k: int = 10,
) -> DataFrame:
    """Exact top-k, numpy fast path: one gemm per Arrow batch.

    Queries are collected (small by contract) and closed over; each corpus
    partition computes Q·Xᵀ with BLAS and emits its local top-k per query;
    a final window reduces partition-local winners — k × n_partitions
    rows shuffle, never the full score matrix.
    """
    import numpy as np
    import pandas as pd

    qrows = queries.select(query_id_col, vec_col).collect()
    qids = np.array([r[query_id_col] for r in qrows])
    qmat = np.array([r[vec_col] for r in qrows], dtype=np.float64)
    qmat /= np.linalg.norm(qmat, axis=1, keepdims=True) + 1e-12

    out_schema = "query_id long, doc_id long, cosine double"

    def score(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            X = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            X /= np.linalg.norm(X, axis=1, keepdims=True) + 1e-12
            S = qmat @ X.T  # (n_queries, batch)
            kk = min(k, S.shape[1])
            idx = np.argpartition(-S, kk - 1, axis=1)[:, :kk]
            recs = []
            ids = pdf[id_col].to_numpy()
            for qi in range(S.shape[0]):
                for j in idx[qi]:
                    recs.append((int(qids[qi]), int(ids[j]), float(S[qi, j])))
            yield pd.DataFrame(recs, columns=["query_id", "doc_id", "cosine"])

    local = corpus.select(id_col, vec_col).mapInPandas(score, schema=out_schema)
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("doc_id"))
    return local.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def hyperplane_bucket(vec_col: str, planes) -> Column:
    """Sign-pattern bucket id over seeded hyperplanes (shared with dedup).

    Each plane rides ONE array literal (``F.lit(list)``), not one Literal
    node per component — n_planes x dim literal nodes bloated the tree
    Catalyst re-analyzes per query (round-6 anatomy: ~0.7 s of driver gap
    per pass at 8 x 64 components). Same values.
    """
    bits = []
    for p in planes:
        dot = _dot(F.col(vec_col), F.lit([float(x) for x in p]))
        bits.append(F.when(dot >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def _probe_buckets(bucket: Column, n_planes: int) -> Column:
    """The bucket plus all hamming-1 neighbors (multi-probe): flipping the
    sign bit whose hyperplane the vector was closest to recovers most
    borderline misses — the standard recall dial for sign-LSH."""
    variants = [bucket]
    for i in range(n_planes):
        pre = F.substring(bucket, 1, i)
        bit = F.substring(bucket, i + 1, 1)
        post = F.substring(bucket, i + 2, n_planes - i - 1)
        flipped = F.when(bit == "1", F.lit("0")).otherwise(F.lit("1"))
        variants.append(F.concat(pre, flipped, post))
    return F.array(*variants)


def kmeans_centroids(vectors, n_centroids: int, iters: int = 8, seed: int = 42):
    """Spherical k-means on a driver-side sample (numpy, deterministic).

    Input row ORDER matters for bit-exact reproducibility (float mean
    accumulation + rng init) — callers must pass rows in a deterministic
    order (sorted by id). Centroids are L2-normalized every iteration so
    assignment-by-max-dot equals assignment-by-cosine.
    """
    import numpy as np

    X = np.asarray(vectors, dtype=np.float64)
    X = X / (np.linalg.norm(X, axis=1, keepdims=True) + 1e-12)
    rng = np.random.default_rng(seed)
    n_centroids = min(n_centroids, len(X))
    C = X[rng.choice(len(X), size=n_centroids, replace=False)].copy()
    for _ in range(iters):
        assign = (X @ C.T).argmax(axis=1)
        for j in range(n_centroids):
            members = X[assign == j]
            if len(members):
                C[j] = members.mean(axis=0)
        C = C / (np.linalg.norm(C, axis=1, keepdims=True) + 1e-12)
    return C


def _centroid_dots(vec_col: str, centroids) -> Column:
    """Array of sequential-fold dot products against centroid literals —
    the same fold order as ``_dot``, so a SQL oracle using
    list_sum(list_transform(...)) reproduces every bit. One array literal
    per centroid (see hyperplane_bucket)."""
    v = F.col(vec_col).cast("array<double>")
    return F.array(*[_dot(v, F.lit([float(x) for x in c])) for c in centroids])


def kmeans_training_sample(
    corpus: DataFrame,
    vec_col: str,
    id_col: str,
    sample_mod: int = 4,
    train_rows: int = 4096,
) -> list:
    """Deterministic, BOUNDED k-means training sample: every
    ``sample_mod``-th row by id, the first ``train_rows`` of them in id
    order. ``orderBy + limit`` plans as TakeOrderedAndProject — a
    distributed partial top-N — so the driver receives at most
    ``train_rows`` rows NO MATTER how large the corpus is (the unbounded
    1/sample_mod collect was the one driver-side scale bottleneck in the
    ANN ladder). Determinism: ids are unique, the order is total, and the
    same (sample_mod, train_rows) reproduces the same sample on any
    engine — the SQL oracle mirrors it with ORDER BY id LIMIT n."""
    rows = (
        corpus.filter(F.pmod(F.col(id_col), F.lit(sample_mod)) == 0)
        .select(id_col, vec_col)
        .orderBy(F.col(id_col))
        .limit(int(train_rows))
        .collect()
    )
    return [r[vec_col] for r in rows]


def ivf_kmeans_topk(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str,
    id_col: str,
    query_id_col: str,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 2,
    sample_mod: int = 4,
    iters: int = 8,
    seed: int = 42,
    centroids=None,
    train_rows: int = 4096,
) -> DataFrame:
    """Real IVF: sampled k-means centroids -> inverted lists -> multi-probe.

    Train: every ``sample_mod``-th row by id, capped at a FIXED
    ``train_rows`` budget (deterministic, engine-neutral; see
    ``kmeans_training_sample`` — the collect is O(train_rows) regardless
    of corpus size), and spherical k-means runs on the driver — the
    classic IVF recipe (sample -> train -> broadcast), no iterative
    distributed job. Index: each corpus row joins the inverted list of its
    max-dot centroid. Search: each query probes its ``nprobe`` nearest
    centroids, so cost ~ nprobe/n_centroids of brute force while recall
    degrades only for neighbors that fall just outside the probed cells.

    Assignment runs as pure JVM fold expressions (n_centroids dot
    products per row, whole-stage codegen) — bit-identical to the SQL
    oracle; at very large n_centroids a gemm mapInPandas assignment
    (cosine_topk_np's pattern) is the natural swap-in.

    Pass ``centroids`` to skip training (e.g. reuse across queries).
    """
    if centroids is None:
        vectors = kmeans_training_sample(corpus, vec_col, id_col, sample_mod, train_rows)
        centroids = kmeans_centroids(vectors, n_centroids, iters, seed)
    n_c = len(centroids)
    nprobe = min(nprobe, n_c)

    # (dot, index) pairs sorted descending by dot (ties -> lower index,
    # matching numpy argmax-first): element 1 is the assignment, the first
    # nprobe are the probe set
    pairs = F.arrays_zip(
        _centroid_dots(vec_col, centroids).alias("d"),
        F.sequence(F.lit(1), F.lit(n_c)).alias("i"),
    )
    by_dot_desc = F.array_sort(
        pairs,
        lambda l, r: F.when(l["d"] > r["d"], F.lit(-1))
        .when(l["d"] < r["d"], F.lit(1))
        .otherwise((l["i"] - r["i"]).cast("int")),
    )
    cid = F.element_at(by_dot_desc, 1)["i"].cast("int")
    c = corpus.select(
        F.col(id_col).alias("doc_id"),
        F.col(vec_col).cast("array<double>").alias("dv"),
        cid.alias("cid"),
    )

    probes = F.transform(F.slice(by_dot_desc, 1, nprobe), lambda s: s["i"].cast("int"))
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
        F.explode(probes).alias("cid"),
    ).withColumn("nq", _norm(F.col("qv")))

    # per-side norms (see cosine_topk) — bit-identical, 1/side-cardinality
    # of the fold work
    scored = c.withColumn("nd", _norm(F.col("dv"))).join(F.broadcast(q), on="cid").select(
        "query_id", "doc_id",
        (_dot(F.col("dv"), F.col("qv")) / (F.col("nd") * F.col("nq"))).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("doc_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str,
    id_col: str,
    query_id_col: str,
    k: int = 10,
    n_planes: int = 6,
    seed: int = 42,
    dim: int | None = None,
    multi_probe: bool = False,
) -> DataFrame:
    """LSH-bucketed ANN: probe the query's bucket (approximate).

    2^n_planes inverted lists; recall is tunable by n_planes (fewer planes
    -> bigger lists -> higher recall & cost) and by ``multi_probe``, which
    also probes every hamming-1 bucket (1 + n_planes lists per query —
    still a vanishing fraction of the corpus at scale).

    ``dim``: embedding dimensionality. Pass it when known (schema
    contract) — probing it costs a driver job on the corpus.
    """
    import numpy as np

    if dim is None:
        dim = int(corpus.select(F.size(vec_col).alias("d")).first()["d"])
    planes = np.random.default_rng(seed).standard_normal((n_planes, dim))

    c = corpus.select(F.col(id_col).alias("doc_id"), F.col(vec_col).cast("array<double>").alias("dv"),
                      hyperplane_bucket(vec_col, planes).alias("bkt"))
    q = queries.select(F.col(query_id_col).alias("query_id"), F.col(vec_col).cast("array<double>").alias("qv"),
                       hyperplane_bucket(vec_col, planes).alias("bkt"))
    if multi_probe:
        q = q.select(
            "query_id", "qv", F.explode(_probe_buckets(F.col("bkt"), n_planes)).alias("bkt")
        )
    # per-side norms (see cosine_topk) — bit-identical
    scored = (
        c.withColumn("nd", _norm(F.col("dv")))
        .join(F.broadcast(q.withColumn("nq", _norm(F.col("qv")))), on="bkt")
        .select(
            "query_id", "doc_id",
            (_dot(F.col("dv"), F.col("qv")) / (F.col("nd") * F.col("nq"))).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("doc_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
