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

Storage layouts (``sig_store``):

* ``"inline"`` (default) — every band row carries the full signature:
  one table, one commit per batch, candidate scoring is a self-join.
  Costs ``bands`` copies of the signature per doc (~2.4 KB/doc at
  k=32/bands=8) — right for corpora up to the low billions of rows.
* ``"table"`` — band rows are (id, band, bh) only (~40 B/row);
  signatures live ONCE per doc in a sibling lake table keyed (id).
  ~4x less index bytes and write amplification at k=32/bands=8 — the
  100 TB layout — at the cost of a second commit per batch and a
  sig join at query time. The two tables need no cross-table atomic
  commit: both are idempotent functions of the same changelog, each
  gated by its own per-key (offset, seq) guard, so a crash between the
  two commits is healed by replaying the batch (the already-committed
  table no-ops).
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
_SIGS_SUBDIR = "sigs"
_VECS_SUBDIR = "vecs"


class LshIndex:
    """A banded MinHash-LSH index backed by a :class:`LakeTable`.

    Band table: key ``(id, band)``, value ``bh`` (band bucket hash,
    string) and — in the ``inline`` layout — ``sig`` (full signature,
    array<bigint>, carried so candidate scoring needs no second pass
    over document text). LSH parameters are pinned in the table manifest
    at create time; ``load`` reads them back, so writers and readers
    cannot disagree on k/bands/seed.
    """

    def __init__(self, table: LakeTable, sigs: LakeTable | None = None):
        self.table = table
        p = table.snapshot().properties
        self.k = int(p["lsh.k"])
        self.bands = int(p["lsh.bands"])
        self.shingle_n = int(p["lsh.shingle_n"])
        self.seed = int(p["lsh.seed"])
        self.hash_fn = p["lsh.hash_fn"]
        self.sig_store = p.get("lsh.sig_store", "inline")
        self.sigs = sigs
        if self.sig_store == "table" and sigs is None:
            raise ValueError("sig_store='table' index requires its sigs table (use LshIndex.load)")

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
        sig_store: str = "inline",
    ) -> "LshIndex":
        assert k % bands == 0, "k must be divisible by bands"
        assert sig_store in ("inline", "table")
        fields = [
            T.StructField("id", T.LongType()),
            T.StructField("band", T.IntegerType()),
            T.StructField("bh", T.StringType()),
        ]
        if sig_store == "inline":
            fields.append(T.StructField("sig", T.ArrayType(T.LongType())))
        table = LakeTable.create(
            spark,
            root,
            T.StructType(fields),
            key_cols=["id", "band"],
            n_buckets=n_buckets,
            properties={
                "lsh.k": str(k),
                "lsh.bands": str(bands),
                "lsh.shingle_n": str(shingle_n),
                "lsh.seed": str(seed),
                "lsh.hash_fn": hash_fn,
                "lsh.sig_store": sig_store,
            },
        )
        sigs = None
        if sig_store == "table":
            sigs = LakeTable.create(
                spark,
                f"{root}/{_SIGS_SUBDIR}",
                T.StructType(
                    [
                        T.StructField("id", T.LongType()),
                        T.StructField("sig", T.ArrayType(T.LongType())),
                    ]
                ),
                key_cols=["id"],
                n_buckets=n_buckets,
            )
        return cls(table, sigs)

    @classmethod
    def load(cls, spark: SparkSession, root: str) -> "LshIndex":
        table = LakeTable.load(spark, root)
        sigs = None
        if table.snapshot().properties.get("lsh.sig_store", "inline") == "table":
            sigs = LakeTable.load(spark, f"{root}/{_SIGS_SUBDIR}")
        return cls(table, sigs)

    # ------------------------------------------------------------ maintain
    def _sig_expr(self, text_col):
        if self.hash_fn == "md5":
            return minhash_signature_md5(text_col, self.k, self.shingle_n)
        return minhash_signature(text_col, self.k, self.shingle_n, self.seed)

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
        inline = self.sig_store == "inline"
        after_fields = [T.StructField("bh", T.StringType())]
        if inline:
            after_fields.append(T.StructField("sig", T.ArrayType(T.LongType())))
        after_t = T.StructType(after_fields)
        meta = [F.col(c) for c in _META_COLS]
        doc_id = F.col(id_col).cast("long").alias("id")

        def after_struct(b: int):
            bh = band_hash(F.col("_sig"), b, r, self.hash_fn).alias("bh")
            if inline:
                return F.struct(bh, F.col("_sig").alias("sig")).cast(after_t)
            return F.struct(bh).cast(after_t)

        upserts = (
            doc_events.filter(F.col("op") != "delete")
            .withColumn("_sig", self._sig_expr(F.col(f"after.{text_col}")))
            .select(
                *meta,
                doc_id,
                F.explode(
                    F.array(
                        *[
                            F.struct(F.lit(b).alias("band"), after_struct(b).alias("after"))
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

    def sig_events(
        self, doc_events: DataFrame, id_col: str = "doc_id", text_col: str = "text"
    ) -> DataFrame:
        """Document changelog -> per-doc signature changelog (one row per
        doc event) for the ``table`` layout's sigs table."""
        after_t = T.StructType([T.StructField("sig", T.ArrayType(T.LongType()))])
        meta = [F.col(c) for c in _META_COLS]
        doc_id = F.col(id_col).cast("long").alias("id")
        return doc_events.select(
            *meta,
            doc_id,
            F.when(
                F.col("op") != "delete",
                F.struct(self._sig_expr(F.col(f"after.{text_col}")).alias("sig")),
            ).cast(after_t).alias("after"),
        )

    def apply_doc_batch(
        self,
        doc_events: DataFrame,
        batch_id: int | None = None,
        id_col: str = "doc_id",
        text_col: str = "text",
        **apply_kwargs,
    ) -> MergeResult:
        """Apply one document-changelog micro-batch to the index —
        signatures computed for this batch's upserts only. In the
        ``table`` layout this is two commits (bands, then sigs), each
        independently guarded and idempotent; see the module docstring
        for the crash-between-commits argument.

        The band events are materialized ONCE per batch with
        ``localCheckpoint`` (round 6; was ``persist``): apply_batch makes
        several passes over its source (key pruning, then the MERGE
        itself), and beyond guaranteeing the signature's interpreted
        higher-order hash expressions evaluate once per batch, the
        checkpoint TRUNCATES THE LOGICAL PLAN — a cached-but-unpruned
        plan still carried the full signature expression tree into every
        downstream Catalyst analysis (~0.5-1.0 s of serial driver time
        per pass at k=32/bands=8, measured with the round-6 job-anatomy
        profiler). Fault-tolerance note: checkpointed blocks are not
        recomputable; a lost executor fails the batch, and the streaming
        tail's retry + the (offset, seq) guard absorb the replay — the
        same contract every micro-batch already has."""
        events = self.band_events(doc_events, id_col=id_col, text_col=text_col).localCheckpoint()
        result = apply_batch(self.table, events, batch_id=batch_id, **apply_kwargs)
        if self.sig_store == "table":
            apply_batch(
                self.sigs,
                self.sig_events(doc_events, id_col=id_col, text_col=text_col),
                batch_id=batch_id,
                **apply_kwargs,
            )
        return result

    def apply_and_probe(
        self,
        doc_events: DataFrame,
        batch_id: int | None = None,
        id_col: str = "doc_id",
        text_col: str = "text",
        min_est: float | None = None,
        max_bucket_size: int = 1000,
        **apply_kwargs,
    ) -> DataFrame:
        """The incremental dedup loop in one call: apply the batch, then
        answer "which near-dup pairs involve THIS batch's documents?" —
        the batch's upserted ids probe the (now updated) index, so the
        per-batch dedup decision costs O(batch x bucket) regardless of
        corpus size. Deleted docs probe nothing (their band rows are
        tombstoned by the apply)."""
        self.apply_doc_batch(
            doc_events, batch_id=batch_id, id_col=id_col, text_col=text_col, **apply_kwargs
        )
        changed = (
            doc_events.filter(F.col("op") != "delete")
            .select(F.col(id_col).cast("long").alias("id"))
            .distinct()
        )
        return self.candidate_pairs(
            min_est=min_est, max_bucket_size=max_bucket_size, probe_ids=changed
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
        dedup.banded_signature_rows produces from raw text. In the
        ``table`` layout the signature joins in from the sigs table
        (bands-side key join; at probe scale the per-band fan-out is the
        big side and the join is key-local)."""
        rows = self.table.read()
        if self.sig_store == "table":
            rows = rows.join(self.sigs.read(), "id")
        return rows.select("id", "sig", "band", "bh")

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

        Probe plan shape (the property that holds at 100 TB): the full
        index is SCANNED once but never hash-shuffled whole — probe ids
        broadcast against the scan to find the probe's band rows, their
        distinct (band, bh) bucket ids broadcast back to filter the scan
        down to just the touched buckets, and only those rows reach the
        bucket-size window and the pair join. The earlier form computed
        the skew-cap window over the ENTIRE index before probing —
        an O(corpus) shuffle per probe that this plan eliminates; the
        cap semantics are unchanged because a touched bucket's rows all
        survive the hot-bucket filter, so its windowed count is still
        the bucket's true global size.
        """
        rows = self.band_rows()
        if probe_ids is None:
            pairs = lsh_pairs_from_band_rows(rows, self.k, max_bucket_size)
        else:
            ids = F.broadcast(
                probe_ids.select(F.col(probe_ids.columns[0]).cast("long").alias("id")).distinct()
            )
            hot = F.broadcast(
                rows.join(ids, "id", "left_semi").select("band", "bh").distinct()
            )
            touched = rows.join(hot, ["band", "bh"], "left_semi")
            bucket_n = F.count("*").over(Window.partitionBy("band", "bh"))
            capped = touched.withColumn("_bn", bucket_n).filter(F.col("_bn") <= max_bucket_size)
            # materialize the touched-bucket slice once (small: the
            # probe's buckets only) — it feeds both sides of the pair join
            capped = capped.localCheckpoint()
            probe = capped.join(ids, "id", "left_semi")
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


class EmbeddingNearDupIndex:
    """The embedding counterpart of :class:`LshIndex`: an incrementally
    maintained random-hyperplane LSH index for cosine near-duplicates.

    ``n_tables`` independent plane sets (classic multi-table LSH — each
    table is one recall draw; a near-dup pair is a candidate if it
    collides in ANY table) of ``n_planes`` sign bits each. Rows are keyed
    ``(id, tbl)`` with the bucket bit-string ``bkt``; the vector itself is
    stored inline (default) or once per id in a sibling lake table
    (``vec_store="table"`` — n_tables x fewer vector bytes, the 100 TB
    layout). Planes are REGENERATED from (seed, dim) at load — never
    stored — so writers and readers cannot disagree.

    Maintenance and probe semantics mirror LshIndex exactly: upserts
    bucket only the batch's vectors, deletes tombstone the id's rows,
    the (offset, seq) guard absorbs replay, and the probe path
    broadcasts (ids, then touched (tbl, bkt)) against the scan so the
    index is never hash-shuffled whole. With ``n_tables=1`` the
    candidate set is bit-identical to the batch operator
    ``dedup.embedding_near_dups`` (same seeded planes, same row-major
    draw order).
    """

    def __init__(self, table: LakeTable, vecs: LakeTable | None = None):
        self.table = table
        p = table.snapshot().properties
        self.n_planes = int(p["emb.n_planes"])
        self.n_tables = int(p["emb.n_tables"])
        self.seed = int(p["emb.seed"])
        self.dim = int(p["emb.dim"])
        self.vec_store = p.get("emb.vec_store", "inline")
        self.vecs = vecs
        if self.vec_store == "table" and vecs is None:
            raise ValueError("vec_store='table' index requires its vecs table (use load)")
        import numpy as np

        rng = np.random.default_rng(self.seed)
        # row-major draw: table 0's planes equal dedup.embedding_near_dups'
        # planes for the same (seed, dim, n_planes) — the equivalence tests
        # and the DuckDB oracle both lean on this
        self._planes = rng.standard_normal((self.n_tables * self.n_planes, self.dim)).reshape(
            self.n_tables, self.n_planes, self.dim
        )

    # ------------------------------------------------------------ lifecycle
    @classmethod
    def create(
        cls,
        spark: SparkSession,
        root: str,
        *,
        n_planes: int = 16,
        n_tables: int = 4,
        seed: int = 42,
        dim: int,
        n_buckets: int = 16,
        vec_store: str = "inline",
    ) -> "EmbeddingNearDupIndex":
        assert vec_store in ("inline", "table")
        fields = [
            T.StructField("id", T.LongType()),
            T.StructField("tbl", T.IntegerType()),
            T.StructField("bkt", T.StringType()),
        ]
        if vec_store == "inline":
            fields.append(T.StructField("v", T.ArrayType(T.DoubleType())))
        table = LakeTable.create(
            spark,
            root,
            T.StructType(fields),
            key_cols=["id", "tbl"],
            n_buckets=n_buckets,
            properties={
                "emb.n_planes": str(n_planes),
                "emb.n_tables": str(n_tables),
                "emb.seed": str(seed),
                "emb.dim": str(dim),
                "emb.vec_store": vec_store,
            },
        )
        vecs = None
        if vec_store == "table":
            vecs = LakeTable.create(
                spark,
                f"{root}/{_VECS_SUBDIR}",
                T.StructType(
                    [
                        T.StructField("id", T.LongType()),
                        T.StructField("v", T.ArrayType(T.DoubleType())),
                    ]
                ),
                key_cols=["id"],
                n_buckets=n_buckets,
            )
        return cls(table, vecs)

    @classmethod
    def load(cls, spark: SparkSession, root: str) -> "EmbeddingNearDupIndex":
        table = LakeTable.load(spark, root)
        vecs = None
        if table.snapshot().properties.get("emb.vec_store", "inline") == "table":
            vecs = LakeTable.load(spark, f"{root}/{_VECS_SUBDIR}")
        return cls(table, vecs)

    # ------------------------------------------------------------ maintain
    def _bucket_bits(self, vec_col, tbl: int):
        # one array literal per plane (F.lit(list)): n_planes x dim
        # per-component Literal nodes made Catalyst re-analyze a bloated
        # tree on every batch (~0.7 s/pass measured at 2x4x64)
        bits = []
        for p in self._planes[tbl]:
            dot = F.aggregate(
                F.zip_with(vec_col, F.lit([float(x) for x in p]), lambda a, b: a * b),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            bits.append(F.when(dot >= 0, F.lit("1")).otherwise(F.lit("0")))
        return F.concat(*bits)

    def bucket_events(
        self, vec_events: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
    ) -> DataFrame:
        """Vector changelog -> (id, tbl) bucket-row changelog (same event
        contract as LshIndex.band_events; each vector event fans out to
        n_tables rows sharing the event's (offset, seq))."""
        inline = self.vec_store == "inline"
        after_fields = [T.StructField("bkt", T.StringType())]
        if inline:
            after_fields.append(T.StructField("v", T.ArrayType(T.DoubleType())))
        after_t = T.StructType(after_fields)
        meta = [F.col(c) for c in _META_COLS]
        vid = F.col(id_col).cast("long").alias("id")
        v = F.col(f"after.{vec_col}").cast("array<double>")

        def after_struct(t: int):
            bkt = self._bucket_bits(F.col("_v"), t).alias("bkt")
            if inline:
                return F.struct(bkt, F.col("_v").alias("v")).cast(after_t)
            return F.struct(bkt).cast(after_t)

        upserts = (
            vec_events.filter(F.col("op") != "delete")
            .withColumn("_v", v)
            .select(
                *meta,
                vid,
                F.explode(
                    F.array(
                        *[
                            F.struct(F.lit(t).alias("tbl"), after_struct(t).alias("after"))
                            for t in range(self.n_tables)
                        ]
                    )
                ).alias("bb"),
            )
            .select(*_META_COLS, "id", F.col("bb.tbl").alias("tbl"), F.col("bb.after").alias("after"))
        )
        deletes = (
            vec_events.filter(F.col("op") == "delete")
            .select(
                *meta,
                vid,
                F.explode(F.array(*[F.lit(t) for t in range(self.n_tables)])).alias("tbl"),
            )
            .withColumn("after", F.lit(None).cast(after_t))
            .select(*_META_COLS, "id", "tbl", "after")
        )
        return upserts.unionByName(deletes)

    def vec_events_rows(
        self, vec_events: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
    ) -> DataFrame:
        after_t = T.StructType([T.StructField("v", T.ArrayType(T.DoubleType()))])
        meta = [F.col(c) for c in _META_COLS]
        vid = F.col(id_col).cast("long").alias("id")
        return vec_events.select(
            *meta,
            vid,
            F.when(
                F.col("op") != "delete",
                F.struct(F.col(f"after.{vec_col}").cast("array<double>").alias("v")),
            ).cast(after_t).alias("after"),
        )

    def apply_vec_batch(
        self,
        vec_events: DataFrame,
        batch_id: int | None = None,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        **apply_kwargs,
    ) -> MergeResult:
        # localCheckpoint for the same two reasons as LshIndex
        # .apply_doc_batch: one evaluation of the hyperplane fold
        # expressions per batch, and a truncated plan for the 2+ analysis
        # passes apply_batch makes over its source.
        events = self.bucket_events(vec_events, id_col=id_col, vec_col=vec_col).localCheckpoint()
        result = apply_batch(
            self.table,
            events,
            batch_id=batch_id,
            **apply_kwargs,
        )
        if self.vec_store == "table":
            apply_batch(
                self.vecs,
                self.vec_events_rows(vec_events, id_col=id_col, vec_col=vec_col),
                batch_id=batch_id,
                **apply_kwargs,
            )
        return result

    def start_tail(
        self,
        changelog: DataFrame,
        checkpoint_dir: str,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        **tail_kwargs,
    ):
        from binlog_es_go_spark.cdc.stream import start_tail

        return start_tail(
            self.table,
            changelog,
            checkpoint_dir,
            apply_fn=lambda batch, bid: self.apply_vec_batch(
                batch, batch_id=bid, id_col=id_col, vec_col=vec_col
            ),
            **tail_kwargs,
        )

    # ------------------------------------------------------------ query
    def bucket_rows(self) -> DataFrame:
        rows = self.table.read()
        if self.vec_store == "table":
            rows = rows.join(self.vecs.read(), "id")
        return rows.select("id", "v", "tbl", "bkt")

    def candidate_pairs(
        self,
        threshold: float = 0.95,
        max_bucket_size: int = 1000,
        probe_ids: DataFrame | None = None,
    ) -> DataFrame:
        """Cosine near-dup pairs from the index state: same-(tbl, bkt)
        collisions (any table), exact cosine verify, id_a < id_b, deduped
        across tables. Probe plan mirrors LshIndex.candidate_pairs — the
        index is scanned, never hash-shuffled whole."""
        rows = self.bucket_rows()
        if probe_ids is not None:
            ids = F.broadcast(
                probe_ids.select(F.col(probe_ids.columns[0]).cast("long").alias("id")).distinct()
            )
            hot = F.broadcast(rows.join(ids, "id", "left_semi").select("tbl", "bkt").distinct())
            rows = rows.join(hot, ["tbl", "bkt"], "left_semi")
        bucket_n = F.count("*").over(Window.partitionBy("tbl", "bkt"))
        norm_v = F.sqrt(
            F.aggregate(F.transform("v", lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x)
        )
        capped = rows.withColumn("_bn", bucket_n).filter(F.col("_bn") <= max_bucket_size)
        # both sides of the pair join read this frame — materialize once,
        # with each row's norm precomputed (bit-identical: the final
        # dot/(na*nb) expression is unchanged)
        capped = capped.withColumn("_nrm", norm_v).localCheckpoint()
        left = capped.join(ids, "id", "left_semi") if probe_ids is not None else capped
        a, b = left.alias("a"), capped.alias("b")
        cond = F.col("a.id") < F.col("b.id") if probe_ids is None else F.col("a.id") != F.col("b.id")
        pairs = (
            a.join(b, on=["tbl", "bkt"], how="inner")
            .filter(cond)
            .select(
                F.least("a.id", "b.id").alias("id_a"),
                F.greatest("a.id", "b.id").alias("id_b"),
                F.col("a.v").alias("v_a"),
                F.col("b.v").alias("v_b"),
                F.col("a._nrm").alias("n_a"),
                F.col("b._nrm").alias("n_b"),
            )
            .dropDuplicates(["id_a", "id_b"])
        )
        dot = F.aggregate(F.zip_with("v_a", "v_b", lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)
        cos = dot / (F.col("n_a") * F.col("n_b"))
        return pairs.select("id_a", "id_b", cos.alias("cosine")).filter(F.col("cosine") >= threshold)
