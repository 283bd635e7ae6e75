"""Multimodal columns: binary payloads + typed metadata, Spark-side plumbing.

Images/audio/video ride as opaque ``binary`` columns with a typed metadata
struct; decode / feature-extract / resize / frame-sample run as Arrow-
batched ``mapInPandas`` stages. The decode libraries (PIL/ffmpeg/librosa)
are not in this container, so the actual codec step is STUBBED: by default
a deterministic fake decoder (bytes -> uint8 stats) keeps the plumbing —
schema, partitioning, UDF signature, batch shape — real and testable; pass
``require_codecs=True`` to get the honest NotImplementedError where a real
codec would be called.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.LongType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes int, byte_mean double, byte_std double, "
    "head_sha256 string"
)


def synthesize_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (payload = seeded pseudo-bytes).

    64-byte payload = unhex(sha256(seed||id) || sha256(seed||id||'b')) —
    two sha256 halves rather than one sha512 so an ANSI oracle (DuckDB
    has sha256-over-VARCHAR only) can re-derive the identical bytes."""
    df = spark.range(n).select(
        F.col("id").alias("media_id"),
        F.element_at(F.array(F.lit("image"), F.lit("audio"), F.lit("video")), (F.pmod(F.col("id"), F.lit(3)) + 1).cast("int")).alias("kind"),
        F.unhex(
            F.concat(
                F.sha2(F.concat(F.lit(str(seed)), F.col("id").cast("string")), 256),
                F.sha2(F.concat(F.lit(str(seed)), F.col("id").cast("string"), F.lit("b")), 256),
            )
        ).alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.lit(64).alias("width"),
            F.lit(64).alias("height"),
            (F.col("id") * 100).alias("duration_ms"),
        ).alias("meta"),
    )
    return df


def extract_features(media: DataFrame, require_codecs: bool = False, batch_hint: int | None = None) -> DataFrame:
    """Decode + feature-extract via mapInPandas (Arrow batches of rows).

    The fake decoder computes byte statistics — the real one would swap in
    `PIL.Image.open(io.BytesIO(payload))` etc. at the marked site. The
    Spark-side contract (partitioning preserved, one output row per input
    row, typed schema) is what the tests pin down.
    """

    def extract(batches):
        import hashlib
        import math

        import numpy as np
        import pandas as pd

        for pdf in batches:
            if require_codecs:
                # Real codec integration point (PIL / ffmpeg / librosa).
                raise NotImplementedError(
                    "media codecs unavailable in this environment; "
                    "install PIL/ffmpeg and replace the fake decoder"
                )
            payloads = pdf["payload"]
            n_bytes, mean, std, head = [], [], [], []
            for p in payloads:
                arr = np.frombuffer(p or b"", dtype=np.uint8)
                n = len(arr)
                n_bytes.append(n)
                # exact-integer moments -> the same two float ops on every
                # engine: byte sums fit doubles exactly, so mean/std are
                # reproducible bit-for-bit by the SQL oracle
                s1 = int(arr.sum())
                s2 = int((arr.astype(np.int64) ** 2).sum())
                m = s1 / n if n else 0.0
                mean.append(m)
                std.append(math.sqrt(max(s2 / n - m * m, 0.0)) if n else 0.0)
                # hash of the head's HEX (ANSI sha256 is VARCHAR-only)
                head.append(hashlib.sha256((p or b"")[:32].hex().encode()).hexdigest())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pd.array(n_bytes, dtype="int32"),
                    "byte_mean": mean,
                    "byte_std": std,
                    "head_sha256": head,
                }
            )

    return media.mapInPandas(extract, schema=FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one row per (media, frame_ts) — the
    distributed exploded work-list a real decoder would consume. Pure
    JVM (sequence + explode), no Python."""
    vids = media.filter(F.col("kind") == "video")
    return vids.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col("meta.duration_ms") - 1, F.lit(0)), F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )
