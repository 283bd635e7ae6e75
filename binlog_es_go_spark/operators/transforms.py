"""Document transforms — the reference's closed transform set, vectorized.

Reference: ``pkg/pipeline/transform/transform.go`` — three transforms
applied per-document between mapping and sink
(``pkg/realtime/flush.go:148-167``):

* ``NormalizeBytesToString`` (:10-24)  -> typed columns make it a cast
* ``JSONDecodeFields``       (:29-60)  -> ``from_json`` (permissive: keep
                                          the raw string on parse failure)
* ``SplitStringField``       (:64-97)  -> split + trim + drop-empties,
                                          all JVM builtins

Plus the config-SQL string producers the transforms anticipate
(SURVEY.md §2.3): ordered GROUP_CONCAT and CONCAT_WS equivalents live in
``operators.enrichment``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def normalize_binary_to_string(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Binary -> UTF-8 string for the given (or all binary) columns."""
    targets = columns or [f.name for f in df.schema.fields if isinstance(f.dataType, T.BinaryType)]
    for c in targets:
        df = df.withColumn(c, F.col(c).cast("string"))
    return df


def split_string_field(
    col: Column | str,
    sep: str = ";",
    trim: bool = True,
) -> Column:
    """Delimited string -> array<string>, trimmed, empties dropped.

    Matches SplitStringField semantics (transform.go:64-97): separator
    defaults to ';', items trimmed, empty items removed; a null input
    yields null (the reference leaves the field absent).
    """
    c = F.col(col) if isinstance(col, str) else col
    parts = F.split(c, F.lit(sep), -1)
    if trim:
        parts = F.transform(parts, lambda x: F.trim(x))
    return F.when(c.isNull(), F.lit(None)).otherwise(F.array_remove(parts, ""))


def json_decode_field(col: Column | str, schema: T.DataType | str) -> Column:
    """Parse a JSON-looking string into a typed value; keep nulls null.

    JSONDecodeFields (transform.go:29-60) only attempts parse when the
    trimmed value starts with '{' or '['; on failure the original string
    is kept. With a typed target column we cannot keep the raw string in
    the same column, so the permissive contract is: non-JSON or
    unparseable -> null, and ``json_decode_kept`` below offers the
    keep-original behavior for string targets.
    """
    c = F.col(col) if isinstance(col, str) else col
    looks_json = F.trim(c).startswith("{") | F.trim(c).startswith("[")
    return F.when(c.isNotNull() & looks_json, F.from_json(c, schema)).otherwise(F.lit(None))


def json_decode_kept(col: Column | str, schema: T.DataType | str) -> Column:
    """Permissive variant: struct<parsed, raw> — raw retained on failure."""
    c = F.col(col) if isinstance(col, str) else col
    parsed = json_decode_field(c, schema)
    return F.struct(parsed.alias("parsed"), F.when(parsed.isNull(), c).alias("raw"))


def preview_top_n(df: DataFrame, n: int = 20, array_sample: int = 3) -> DataFrame:
    """Debug projection (PreviewTopN, transform.go:101-129): first n rows,
    arrays truncated to ``array_sample`` elements."""
    cols = []
    for f in df.schema.fields:
        if isinstance(f.dataType, T.ArrayType):
            cols.append(F.slice(F.col(f.name), 1, array_sample).alias(f.name))
        else:
            cols.append(F.col(f.name))
    return df.select(*cols).limit(n)
