"""Enrichment / field mapping: the reference's config-SQL layer, native.

The reference delegates its relational work to MySQL via an opaque mapping
SQL (``configs/config.example.yaml:131-147``): projection with aliases,
three LEFT JOINs (1:1 description, N:1 dimension, 1:N attributes),
``GROUP BY`` the main key, and an ordered ``GROUP_CONCAT`` — executed per
key batch through IN-expansion (``pkg/db/mysql.go:124-180``). This module
is the core inversion (SURVEY.md §2.1 #14): instead of re-querying an OLTP
store per batch, the affected-keys DataFrame joins lake-resident dimension
tables — broadcast when small, shuffle otherwise (Catalyst/AQE decides).

Also here: the relatedQuery reverse lookup (child change -> affected
parent keys, ``pkg/realtime/loop.go:325-451``) as a semi-join, replacing
cursor pagination wholesale, and the deleteOnMissing anti-join
(``pkg/realtime/flush.go:119-140``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def ordered_group_concat(
    value: Column | str,
    order_by: list[Column | str],
    sep: str = ";",
) -> Column:
    """GROUP_CONCAT(value ORDER BY ... SEPARATOR sep) — deterministic.

    The reference orders its concat (``config.example.yaml:137-141``) and
    raises ``group_concat_max_len`` to dodge silent 1 MiB truncation
    (``pkg/realtime/runner.go:39-43``). ``collect_list`` has no truncation,
    but it IS nondeterministic in arrival order — sorting structs of the
    order keys restores determinism (SURVEY.md §7 hard part 4), which the
    sha256 state equality depends on.
    """
    v = F.col(value) if isinstance(value, str) else value
    keys = [F.col(c) if isinstance(c, str) else c for c in order_by]
    packed = F.struct(*[k.alias(f"_o{i}") for i, k in enumerate(keys)], v.alias("_v"))
    return F.array_join(F.transform(F.array_sort(F.collect_list(packed)), lambda s: s.getField("_v")), sep)


def collect_sorted_list(value: Column | str, order_by: list[Column | str]) -> Column:
    """Deterministic collect_list: the array form of ordered_group_concat."""
    v = F.col(value) if isinstance(value, str) else value
    keys = [F.col(c) if isinstance(c, str) else c for c in order_by]
    packed = F.struct(*[k.alias(f"_o{i}") for i, k in enumerate(keys)], v.alias("_v"))
    return F.transform(F.array_sort(F.collect_list(packed)), lambda s: s.getField("_v"))


def enrich_documents(
    main: DataFrame,
    key_cols: list[str],
    one_to_one: list[tuple[DataFrame, list[str]]] | None = None,
    dims: list[tuple[DataFrame, list[str]]] | None = None,
    one_to_many: tuple[DataFrame, list[str], Column] | None = None,
) -> DataFrame:
    """The example mapping SQL shape (config.example.yaml:131-147), natively.

    * ``one_to_one``: (table, join_cols) LEFT JOINs (description analog).
    * ``dims``: (table, join_cols) LEFT JOINs, broadcast (category analog —
      dimensions are small by definition).
    * ``one_to_many``: (table, join_cols, agg_expr) — the attributes table;
      pre-aggregated per key BEFORE the join so the main table never
      fans out (the reference leans on GROUP BY after fan-out; aggregating
      first is the scalable plan: the join stays 1:1).
    """
    out = main
    for tbl, on in one_to_one or []:
        out = out.join(tbl, on=on, how="left")
    for tbl, on in dims or []:
        out = out.join(F.broadcast(tbl), on=on, how="left")
    if one_to_many is not None:
        tbl, on, agg_expr = one_to_many
        pre = tbl.groupBy(*on).agg(agg_expr)
        out = out.join(pre, on=on, how="left")
    return out


def affected_parent_keys(
    child_changes: DataFrame,
    parent: DataFrame,
    join_cols: list[str],
    parent_key_cols: list[str],
    direct_fk_cols: list[str] | None = None,
) -> DataFrame:
    """relatedQuery: child-table change -> distinct affected parent keys.

    Direct path (loop.go:325-367): when the child event row carries the
    parent key, project it. Fallback (loop.go:369-435): semi-join the
    parent table on the shared columns — one shuffle replaces the
    reference's cursor-paginated lookup loop (pageSize=500, max 1000
    pages); no fan-out cap is needed because the join is distributed.
    COALESCE of both paths mirrors the config pattern
    (config.example.yaml:183-192).
    """
    if direct_fk_cols:
        has_all_fks = F.lit(True)
        for c in direct_fk_cols:
            has_all_fks = has_all_fks & F.col(c).isNotNull()
        direct = child_changes.filter(has_all_fks).select(
            *[F.col(c).alias(k) for c, k in zip(direct_fk_cols, parent_key_cols)]
        )
        missing = child_changes.filter(~has_all_fks)
    else:
        direct = None
        missing = child_changes
    looked_up = (
        parent.join(missing.select(*join_cols).distinct(), on=join_cols, how="left_semi")
        .select(*parent_key_cols)
    )
    out = looked_up if direct is None else direct.unionByName(looked_up)
    return out.distinct()


def affected_parent_keys_with_offset(
    child_changes: DataFrame,
    parent: DataFrame,
    join_cols: list[str],
    parent_key_cols: list[str],
    direct_fk_cols: list[str] | None = None,
    offset_col: str = "offset",
) -> DataFrame:
    """relatedQuery carrying provenance: each affected parent key comes
    back with ``_trig_off`` = the max offset of the child events that
    triggered it.

    Recompute events must ride the TRIGGERING event's own position, not a
    cross-partition batch max: offsets from different stream partitions
    are not mutually ordered, so a later batch dominated by a low-offset
    partition would stamp recomputes below a prior recompute and the newer
    source-of-truth state would lose the LWW guard. Per-key offsets are
    monotonic whenever the upstream partitions by key (the Kafka/binlog
    contract), which the batch max is not.

    Shape: the child side is aggregated to (join_cols, max offset) FIRST —
    a micro-batch's worth of rows — so the parent join probe stays tiny
    and Catalyst broadcasts it; the parent table is scanned, never
    shuffled (same plan as :func:`affected_parent_keys`).
    """
    if direct_fk_cols:
        has_all_fks = F.lit(True)
        for c in direct_fk_cols:
            has_all_fks = has_all_fks & F.col(c).isNotNull()
        direct = child_changes.filter(has_all_fks).select(
            *[F.col(c).alias(k) for c, k in zip(direct_fk_cols, parent_key_cols)],
            F.col(offset_col).alias("_trig_off"),
        )
        missing = child_changes.filter(~has_all_fks)
    else:
        direct = None
        missing = child_changes
    probe = missing.groupBy(*join_cols).agg(F.max(offset_col).alias("_trig_off"))
    looked_up = parent.join(probe, on=join_cols, how="inner").select(*parent_key_cols, "_trig_off")
    out = looked_up if direct is None else direct.unionByName(looked_up)
    return out.groupBy(*parent_key_cols).agg(F.max("_trig_off").alias("_trig_off"))


def delete_on_missing_keys(batch_keys: DataFrame, recomputed: DataFrame, key_cols: list[str]) -> DataFrame:
    """deleteOnMissing (flush.go:119-140): keys whose recompute returned no
    rows must be deleted from the target — a left-anti join."""
    return batch_keys.select(*key_cols).distinct().join(
        recomputed.select(*key_cols).distinct(), on=key_cols, how="left_anti"
    )


def rewrite_table_name(col: Column | str, rules: list[tuple[str, str]]) -> Column:
    """Physical->logical table-name rewrite (helpers.go:57-74), e.g.
    ``enterprise_07`` -> ``enterprise`` — chained regexp_replace."""
    c = F.col(col) if isinstance(col, str) else col
    for pattern, replacement in rules:
        c = F.regexp_replace(c, pattern, replacement)
    return c
