"""Scalar function helpers shared by operators (all JVM-side builtins).

sha256-of-content is the engine's per-row invariant (BASELINE.json
``input_hint``); everything here stays inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def sha256_hex(col: Column | str) -> Column:
    """sha256 hex digest of a string column (the per-row invariant)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sha2(c, 256)


def content_fingerprint(col: Column | str) -> Column:
    """Normalized md5 fingerprint: lowercase, collapse whitespace.

    Deterministic document identity for exact-dup detection that is robust
    to whitespace/case noise; md5 exists in both Spark and ANSI oracles.
    """
    c = F.col(col) if isinstance(col, str) else col
    normalized = F.regexp_replace(F.lower(F.trim(c)), r"\s+", " ")
    return F.md5(normalized)


def words(col: Column | str) -> Column:
    """Whitespace tokenization -> array<string> (empties removed)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.array_remove(F.split(F.trim(c), r"\s+"), "")


def word_shingles(col: Column | str, n: int = 3) -> Column:
    """Word n-gram shingles -> array<string> (distinct).

    Built from ``sequence`` + ``slice`` — pure JVM, no UDF. A document
    shorter than ``n`` words yields its whole text as the single shingle.
    """
    w = words(col)
    k = F.size(w) - F.lit(n - 1)
    grams = F.when(
        k > 0,
        F.transform(F.sequence(F.lit(1), k), lambda i: F.concat_ws(" ", F.slice(w, i, n))),
    ).otherwise(F.array(F.concat_ws(" ", w)))
    return F.array_distinct(grams)


def char_shingles(col: Column | str, n: int = 5) -> Column:
    """Character n-gram shingles -> array<string> (distinct)."""
    c = F.col(col) if isinstance(col, str) else col
    k = F.length(c) - F.lit(n - 1)
    grams = F.when(
        k > 0,
        F.transform(F.sequence(F.lit(1), k), lambda i: F.substring(c, i, n)),
    ).otherwise(F.array(c))
    return F.array_distinct(grams)
