"""Incrementally-maintained MinHash-LSH near-duplicate index over a CDC'd
document corpus.

The reference keeps a search index continuously in sync with an OLTP
source (``pkg/realtime/loop.go:24-520`` ships row images;
``pkg/es/writer.go`` upserts them) — this module applies the same
continuous-sync discipline to a *near-duplicate* index: instead of
recomputing MinHash signatures for the whole corpus after every change
(O(corpus) per batch), the banded LSH bucket table is itself a lake
table keyed ``(id, band)`` and maintained through the identical
(offset, seq)-guarded MERGE the document table uses.

Per micro-batch cost is O(changed docs):

* an upsert computes the signature of the NEW text only and overwrites
  the doc's ``bands`` rows — the band domain is fixed (0..bands-1), so
  stale buckets cannot linger: every (id, band) key is rewritten with
  the new bucket hash;
* a delete tombstones the doc's band rows through the normal delete
  branch — no signature computation at all;
* out-of-order / duplicate deliveries are rejected per key by the same
  (offset, seq) guard as any lake table, so replaying a document
  changelog into the index is idempotent.

At 100 TB the index table is bucketed by crc32(id, band) like any lake
table: a batch's MERGE touches only the buckets its (id, band) keys
hash to, and the candidate probe joins only the CHANGED docs' band rows
against the index (broadcast the probe side), never all-pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from binlog_es_go_spark.cdc.apply import apply_batch
from binlog_es_go_spark.lake.merge import MergeResult
from binlog_es_go_spark.lake.table import LakeTable
from binlog_es_go_spark.operators.dedup import (
    band_hash,
    lsh_pairs_from_band_rows,
    minhash_signature,
    minhash_signature_md5,
)

_META_COLS = ("offset", "partition_id", "seq_in_tx", "op", "ts")


class LshIndex:
    """A banded MinHash-LSH index backed by a :class:`LakeTable`.

    Schema: key ``(id, band)``, values ``bh`` (band bucket hash, string)
    and ``sig`` (full signature, array<bigint> — carried so candidate
    scoring needs no second pass over document text). LSH parameters are
    pinned in the table manifest at create time; ``load`` reads them
    back, so writers and readers cannot disagree on k/bands/seed.
    """

    def __init__(self, table: LakeTable):
        self.table = table
        p = table.snapshot().properties
        self.k = int(p["lsh.k"])
        self.bands = int(p["lsh.bands"])
        self.shingle_n = int(p["lsh.shingle_n"])
        self.seed = int(p["lsh.seed"])
        self.hash_fn = p["lsh.hash_fn"]

    # ------------------------------------------------------------ lifecycle
    @classmethod
    def create(
        cls,
        spark: SparkSession,
        root: str,
        *,
        k: int = 64,
        bands: int = 16,
        shingle_n: int = 3,
        seed: int = 42,
        hash_fn: str = "xxhash64",
        n_buckets: int = 16,
    ) -> "LshIndex":
        assert k % bands == 0, "k must be divisible by bands"
        schema = T.StructType(
            [
                T.StructField("id", T.LongType()),
                T.StructField("band", T.IntegerType()),
                T.StructField("bh", T.StringType()),
                T.StructField("sig", T.ArrayType(T.LongType())),
            ]
        )
        table = LakeTable.create(
            spark,
            root,
            schema,
            key_cols=["id", "band"],
            n_buckets=n_buckets,
            properties={
                "lsh.k": str(k),
                "lsh.bands": str(bands),
                "lsh.shingle_n": str(shingle_n),
                "lsh.seed": str(seed),
                "lsh.hash_fn": hash_fn,
            },
        )
        return cls(table)

    @classmethod
    def load(cls, spark: SparkSession, root: str) -> "LshIndex":
        return cls(LakeTable.load(spark, root))

    # ------------------------------------------------------------ maintain
    def band_events(
        self, doc_events: DataFrame, id_col: str = "doc_id", text_col: str = "text"
    ) -> DataFrame:
        """Document changelog -> band-row changelog.

        Input rows carry the standard event columns (offset,
        partition_id, seq_in_tx, op, ts), the document key ``id_col``
        and an ``after`` struct with ``text_col`` for upserts. Each doc
        event fans out to exactly ``bands`` band-row events sharing the
        doc event's (offset, seq) — per-(id, band) guards stay correct
        because every band row of a doc moves with the same offset.
        """
        r = self.k // self.bands
        after_t = T.StructType(
            [
                T.StructField("bh", T.StringType()),
                T.StructField("sig", T.ArrayType(T.LongType())),
            ]
        )
        meta = [F.col(c) for c in _META_COLS]
        doc_id = F.col(id_col).cast("long").alias("id")

        text = F.col(f"after.{text_col}")
        sig = (
            minhash_signature_md5(text, self.k, self.shingle_n)
            if self.hash_fn == "md5"
            else minhash_signature(text, self.k, self.shingle_n, self.seed)
        )
        upserts = (
            doc_events.filter(F.col("op") != "delete")
            .withColumn("_sig", sig)
            .select(
                *meta,
                doc_id,
                F.explode(
                    F.array(
                        *[
                            F.struct(
                                F.lit(b).alias("band"),
                                F.struct(
                                    band_hash(F.col("_sig"), b, r, self.hash_fn).alias("bh"),
                                    F.col("_sig").alias("sig"),
                                ).cast(after_t).alias("after"),
                            )
                            for b in range(self.bands)
                        ]
                    )
                ).alias("bb"),
            )
            .select(*_META_COLS, "id", F.col("bb.band").alias("band"), F.col("bb.after").alias("after"))
        )
        deletes = (
            doc_events.filter(F.col("op") == "delete")
            .select(
                *meta,
                doc_id,
                F.explode(F.array(*[F.lit(b) for b in range(self.bands)])).alias("band"),
            )
            .withColumn("after", F.lit(None).cast(after_t))
            .select(*_META_COLS, "id", "band", "after")
        )
        return upserts.unionByName(deletes)

    def apply_doc_batch(
        self,
        doc_events: DataFrame,
        batch_id: int | None = None,
        id_col: str = "doc_id",
        text_col: str = "text",
        **apply_kwargs,
    ) -> MergeResult:
        """Apply one document-changelog micro-batch to the index —
        signatures computed for this batch's upserts only."""
        return apply_batch(
            self.table,
            self.band_events(doc_events, id_col=id_col, text_col=text_col),
            batch_id=batch_id,
            **apply_kwargs,
        )

    def start_tail(
        self,
        changelog: DataFrame,
        checkpoint_dir: str,
        id_col: str = "doc_id",
        text_col: str = "text",
        **tail_kwargs,
    ):
        """Tail a streaming document changelog into the index — the same
        checkpointed foreachBatch loop (dead-letter hook, circuit
        breaker, resume-on-restart) the document lake's tail uses
        (cdc/stream.py:start_tail), with the index MERGE as the sink.
        A dual-sink deployment runs one tail into the document table and
        one into the index off the same source with separate checkpoints;
        each resumes independently and the (offset, seq) guard absorbs
        the replay overlap after a crash."""
        from binlog_es_go_spark.cdc.stream import start_tail

        return start_tail(
            self.table,
            changelog,
            checkpoint_dir,
            apply_fn=lambda batch, bid: self.apply_doc_batch(
                batch, batch_id=bid, id_col=id_col, text_col=text_col
            ),
            **tail_kwargs,
        )

    # ------------------------------------------------------------ query
    def band_rows(self) -> DataFrame:
        """Live (id, sig, band, bh) rows — the same shape
        dedup.banded_signature_rows produces from raw text."""
        return self.table.read().select("id", "sig", "band", "bh")

    def candidate_pairs(
        self,
        min_est: float | None = None,
        max_bucket_size: int = 1000,
        probe_ids: DataFrame | None = None,
    ) -> DataFrame:
        """Near-dup candidate pairs from the index state.

        ``probe_ids`` (a one-column ``id`` DataFrame) restricts one side
        to those docs — the incremental query pattern: after a batch,
        probe ONLY the changed ids against the index, so candidate cost
        is O(changed x bucket), not O(corpus^2). Pairs are normalized to
        id_a < id_b either way.
        """
        rows = self.band_rows()
        if probe_ids is None:
            pairs = lsh_pairs_from_band_rows(rows, self.k, max_bucket_size)
        else:
            bucket_n = F.count("*").over(Window.partitionBy("band", "bh"))
            capped = rows.withColumn("_bn", bucket_n).filter(F.col("_bn") <= max_bucket_size)
            probe = capped.join(
                F.broadcast(probe_ids.select(F.col(probe_ids.columns[0]).cast("long").alias("id"))),
                "id",
                "left_semi",
            )
            a, b = probe.alias("a"), capped.alias("b")
            joined = (
                a.join(b, on=["band", "bh"], how="inner")
                .filter(F.col("a.id") != F.col("b.id"))
                .select(
                    F.least("a.id", "b.id").alias("id_a"),
                    F.greatest("a.id", "b.id").alias("id_b"),
                    F.col("a.sig").alias("sig_a"),
                    F.col("b.sig").alias("sig_b"),
                )
                .dropDuplicates(["id_a", "id_b"])
            )
            sim = F.size(
                F.array_compact(F.zip_with("sig_a", "sig_b", lambda x, y: F.when(x == y, F.lit(1))))
            ) / F.lit(float(self.k))
            pairs = joined.select("id_a", "id_b", sim.alias("est_jaccard"))
        if min_est is not None:
            pairs = pairs.filter(F.col("est_jaccard") >= min_est)
        return pairs
