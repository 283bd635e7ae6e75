"""Changelog schema + deterministic distributed generator.

The changelog models the reference's binlog RowsEvent stream
(``pkg/realtime/loop.go:181-237``) over the source-code-repository domain
fixed by BASELINE.json: key ``(repo, path)``, payload
``(commit, lang, content)``, positions ``(partition_id, offset, seq_in_tx)``
(GTID/log-pos analog, ``pkg/position/store.go:14-23``).

Generation is Spark-native (``spark.range`` + hash-derived columns): every
attribute is a pure function of ``(event id, seed)`` via xxhash64, so the
same (n_events, seed) produces byte-identical data at any parallelism —
which is what lets the bench run the identical input at local[8] and
local[32]. Zipf-ish key skew gives the hot repos the north rule requires
salting to defeat.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

LANGS = ["py", "go", "rs", "md", "js", "c", "java", "rb"]

PAYLOAD_SCHEMA = T.StructType(
    [
        T.StructField("commit", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("content", T.StringType()),
    ]
)

CHANGELOG_SCHEMA = T.StructType(
    [
        T.StructField("offset", T.LongType(), False),
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("seq_in_tx", T.IntegerType(), False),
        T.StructField("op", T.StringType(), False),
        T.StructField("repo", T.StringType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("before", PAYLOAD_SCHEMA, True),
        T.StructField("after", PAYLOAD_SCHEMA, True),
        T.StructField("ts", T.TimestampType(), False),
    ]
)


def _u(col, seed: int, salt: str):
    """Deterministic uniform [0,1) from (col, seed, salt) — parallelism-proof."""
    h = F.xxhash64(col.cast("string"), F.lit(seed), F.lit(salt))
    return (F.pmod(h, F.lit(1_000_000)).cast("double") / F.lit(1_000_000.0))


def generate_changelog(
    spark: SparkSession,
    n_events: int,
    n_repos: int = 100,
    paths_per_repo: int = 50,
    n_partitions: int = 8,
    delete_ratio: float = 0.1,
    skew: float = 3.0,
    seed: int = 42,
    duplicate_ratio: float = 0.0,
    evolve_after_offset: int | None = None,
    content_repeat: int = 4,
) -> DataFrame:
    """Deterministic changelog of ``n_events`` (+ optional duplicates).

    * ``skew``: repo ids are drawn as ``floor(n_repos * u^skew)`` — higher
      values concentrate events on low repo ids (hot keys).
    * ``duplicate_ratio``: fraction of events re-delivered verbatim
      (at-least-once delivery fixture). Duplicates keep their original
      offset, so an idempotent sink must ignore them.
    * ``evolve_after_offset``: events past this offset carry an extra
      ``size_bytes`` field in ``after`` (ALTER TABLE analog).
    """
    df = spark.range(0, n_events, 1).withColumnRenamed("id", "eid")
    u_repo = _u(F.col("eid"), seed, "repo")
    u_path = _u(F.col("eid"), seed, "path")
    u_op = _u(F.col("eid"), seed, "op")

    repo_id = F.floor(F.lit(float(n_repos)) * F.pow(u_repo, F.lit(float(skew)))).cast("int")
    path_id = F.floor(F.lit(float(paths_per_repo)) * u_path).cast("int")

    df = df.select(
        F.col("eid").alias("offset"),
        F.pmod(F.col("eid"), F.lit(n_partitions)).cast("int").alias("partition_id"),
        F.pmod(F.xxhash64("eid", F.lit(seed), F.lit("seq")), F.lit(7)).cast("int").alias("seq_in_tx"),
        F.when(u_op < F.lit(delete_ratio), F.lit("delete"))
        .when(u_op < F.lit(delete_ratio + (1.0 - delete_ratio) / 2), F.lit("insert"))
        .otherwise(F.lit("update"))
        .alias("op"),
        F.concat(F.lit("org"), (repo_id % 10).cast("string"), F.lit("/repo"), repo_id.cast("string")).alias("repo"),
        F.concat(F.lit("src/dir"), (path_id % 7).cast("string"), F.lit("/file"), path_id.cast("string"), F.lit(".txt")).alias("path"),
        F.col("eid"),
    )

    content = F.concat(
        F.lit("content "),
        F.col("repo"), F.lit(":"), F.col("path"), F.lit("@"), F.col("offset").cast("string"), F.lit(" "),
        F.repeat(
            F.concat(F.substring(F.sha2(F.concat(F.col("repo"), F.col("path"), F.col("offset").cast("string")), 256), 1, 32), F.lit(" ")),
            content_repeat,
        ),
    )
    after = F.struct(
        F.substring(F.sha2(F.concat_ws("|", F.col("repo"), F.col("path"), F.col("offset").cast("string"), F.lit(str(seed))), 256), 1, 40).alias("commit"),
        F.element_at(F.array(*[F.lit(x) for x in LANGS]), (F.pmod(F.xxhash64("repo", "path"), F.lit(len(LANGS))) + 1).cast("int")).alias("lang"),
        content.alias("content"),
    )
    if evolve_after_offset is not None:
        after_evolved = F.struct(
            after.getField("commit").alias("commit"),
            after.getField("lang").alias("lang"),
            after.getField("content").alias("content"),
            F.length(content).cast("long").alias("size_bytes"),
        )
        payload_t = T.StructType(PAYLOAD_SCHEMA.fields + [T.StructField("size_bytes", T.LongType())])
        after = F.when(
            F.col("offset") > F.lit(evolve_after_offset), after_evolved
        ).otherwise(F.struct(
            after.getField("commit").alias("commit"),
            after.getField("lang").alias("lang"),
            after.getField("content").alias("content"),
            F.lit(None).cast("long").alias("size_bytes"),
        )).cast(payload_t)

    df = df.select(
        "offset", "partition_id", "seq_in_tx", "op", "repo", "path",
        F.when(F.col("op") != "delete", after).alias("after"),
        (F.lit("2026-01-01 00:00:00").cast("timestamp") + F.make_interval(secs=F.col("offset").cast("double") / 100.0)).alias("ts"),
    )
    # before image: null (not needed by LWW apply; kept nullable for schema fidelity)
    df = df.withColumn("before", F.lit(None).cast(df.schema["after"].dataType)).select(
        "offset", "partition_id", "seq_in_tx", "op", "repo", "path", "before", "after", "ts"
    )

    if duplicate_ratio > 0:
        dups = df.filter(_u(F.col("offset"), seed, "dup") < F.lit(duplicate_ratio))
        df = df.unionByName(dups)
    return df


def flatten_changelog(changelog: DataFrame) -> DataFrame:
    """Changelog -> merge source: flatten the after image beside the keys.

    The analog of zipping positional binlog rows with cached column names
    (``pkg/realtime/loop.go:203,326-331``) — here it is a pure projection.
    Generic over the event schema: every non-image column (positions, op,
    key columns, ts) passes through; ``after`` fields flatten beside them
    (meta-level columns win a name collision).
    """
    meta = [c for c in changelog.columns if c not in ("before", "after")]
    payload_fields = [
        f.name for f in changelog.schema["after"].dataType.fields if f.name not in meta
    ]
    # one selectExpr call — this projection runs per micro-batch commit
    return changelog.selectExpr(
        *[f"`{c}`" for c in meta],
        *[f"`after`.`{f}` AS `{f}`" for f in payload_fields],
    )
