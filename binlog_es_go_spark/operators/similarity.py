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
    q = F.broadcast(
        queries.select(F.col(query_id_col).alias("query_id"), F.col(vec_col).cast("array<double>").alias("qv"))
    )
    c = corpus.select(F.col(id_col).alias("doc_id"), F.col(vec_col).cast("array<double>").alias("dv"))
    scored = c.crossJoin(q).select(
        "query_id", "doc_id", cosine_similarity(F.col("dv"), F.col("qv")).alias("cosine")
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
    """Sign-pattern bucket id over seeded hyperplanes (shared with dedup)."""
    bits = []
    for p in planes:
        dot = _dot(F.col(vec_col), F.array(*[F.lit(float(x)) for x in p]))
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
    scored = c.join(F.broadcast(q), on="bkt").select(
        "query_id", "doc_id", cosine_similarity(F.col("dv"), F.col("qv")).alias("cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("doc_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
