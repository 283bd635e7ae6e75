"""Shard routing + skew salting.

The reference routes each key to a physical shard with
``crc32_ieee_uint32(utf8(str(key))) % shards`` (default), ``mod``, or
``crc32_ieee_signed_abs`` (``pkg/realtime/helpers.go:104-150``), with
cross-language golden vectors in ``README.md:139-144`` (shards=64:
"0"->33, "1"->55, "42"->8, "258652761531355136"->0,
"258652848596717568"->63).

Spark's ``crc32`` builtin IS CRC-32/IEEE over the UTF-8 bytes, so shard
routing stays entirely JVM-side (whole-stage codegen) — validated against
the golden vectors in tests. In the lake design physical shards collapse
into bucketed partitions, so the surviving uses are:

* reproducing reference shard assignment (migration / parity checks);
* **skew salting**: spreading a hot key's rows over ``factor`` sub-keys
  before a shuffle (the north rule's "salts hot repo keys"), then
  un-salting after partial aggregation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

CRC32_IEEE_UINT32 = "crc32_ieee_uint32"
CRC32_IEEE_SIGNED_ABS = "crc32_ieee_signed_abs"
MOD = "mod"


def shard_for_key(key: Column | str, shards: int, strategy: str = CRC32_IEEE_UINT32) -> Column:
    """Shard id for a key — semantics-equal to shardForKey
    (pkg/realtime/helpers.go:104-150), all JVM builtins."""
    c = F.col(key) if isinstance(key, str) else key
    s = c.cast("string")
    if strategy == CRC32_IEEE_UINT32:
        # crc32() returns the unsigned value as a long already
        return F.pmod(F.crc32(s), F.lit(shards)).cast("int")
    if strategy == CRC32_IEEE_SIGNED_ABS:
        return shard_for_key_signed_abs(c, shards)
    if strategy == MOD:
        return F.pmod(F.abs(c.cast("long")), F.lit(shards)).cast("int")
    raise ValueError(f"unknown strategy {strategy}")


def shard_for_key_signed_abs(key: Column | str, shards: int) -> Column:
    """crc32_ieee_signed_abs (helpers.go:124-138): abs(int64(int32(crc32))) % n.

    int32 reinterpretation: values >= 2^31 wrap negative; the reference
    takes the absolute value in int64, so crc32 == 0x80000000 (MinInt32)
    yields 2147483648 — no special case (Spark longs hold it exactly).
    """
    c = F.col(key) if isinstance(key, str) else key
    u = F.crc32(c.cast("string"))  # 0 .. 2^32-1 as long
    signed = F.when(u >= F.lit(2**31), u - F.lit(2**32)).otherwise(u)
    return F.pmod(F.abs(signed), F.lit(shards)).cast("int")


def salt_column(cols: list[Column | str], factor: int) -> Column:
    """Deterministic salt in [0, factor): crc32 of the concatenated columns.

    Deterministic (not rand()) so re-runs of a failed stage place rows
    identically — required for idempotent MERGE re-runs.
    """
    parts = [F.coalesce((F.col(c) if isinstance(c, str) else c).cast("string"), F.lit("")) for c in cols]
    return F.pmod(F.crc32(F.concat_ws("\x1f", *parts)), F.lit(max(1, factor))).cast("int")


def salted_repartition(
    df: DataFrame,
    hot_key_cols: list[str],
    salt_cols: list[str],
    num_partitions: int,
    factor: int | None = None,
) -> DataFrame:
    """Repartition by (hot keys, salt) so one hot key spreads over
    ``factor`` partitions instead of one."""
    f = factor or num_partitions
    return df.repartition(num_partitions, *[F.col(c) for c in hot_key_cols], salt_column(salt_cols, f))


def salted_aggregate(
    df: DataFrame,
    group_cols: list[str],
    aggs: dict[str, str],
    salt_cols: list[str],
    factor: int = 16,
) -> DataFrame:
    """Two-phase skewed aggregation: partial agg by (keys, salt), final by keys.

    Supported agg fns: sum, count, min, max (re-aggregable ones). The
    partial pass disperses a hot group across ``factor`` reducers; the
    final pass combines ``factor`` rows per group — O(groups × factor)
    instead of one straggler task.
    """
    salted = df.withColumn("_salt", salt_column(salt_cols, factor))
    partial_exprs, final_exprs = [], []
    for col, fn in aggs.items():
        alias = f"{fn}_{col}"
        if fn == "count":
            partial_exprs.append(F.count(col).alias(alias))
            final_exprs.append(F.sum(alias).alias(alias))
        elif fn in ("sum", "min", "max"):
            partial_exprs.append(getattr(F, fn)(col).alias(alias))
            final_exprs.append((F.sum if fn == "sum" else getattr(F, fn))(alias).alias(alias))
        else:
            raise ValueError(f"non-re-aggregable fn {fn}")
    partial = salted.groupBy(*group_cols, "_salt").agg(*partial_exprs)
    return partial.groupBy(*group_cols).agg(*final_exprs)
