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


def gram_strings(col: Column | str, n: int) -> Column:
    """Space-joined word n-grams at positions 1..len-n+1 — pure JVM.

    Built by ``zip_with``-folding the words array against its own
    shifted slices: each of the n-1 shifts evaluates the words subtree
    once per ROW, so the split/trim regex runs O(n) times per document.
    The round-5 form (``transform(sequence(1, k), i -> concat_ws(" ",
    slice(w, i, n)))``) referenced the words array INSIDE the lambda
    body, and Spark's interpreted higher-order-function path re-evaluates
    such subexpressions once per element — O(len) regex splits per
    document, measured ~14 ms/doc on the sf0.1 fixtures and the dominant
    cost of every shingle-based operator. zip_with null-pads the shorter
    side and ``concat`` propagates nulls, so tail positions filter away.
    """
    w = words(col)
    g = w
    for j in range(1, n):
        shifted = F.slice(
            words(col), j + 1, F.greatest(F.size(words(col)) - j, F.lit(0))
        )
        g = F.zip_with(g, shifted, lambda a, b: F.concat(a, F.lit(" "), b))
    return F.filter(g, lambda x: x.isNotNull())


def word_shingles(col: Column | str, n: int = 3) -> Column:
    """Word n-gram shingles -> array<string> (distinct).

    Pure JVM (``gram_strings``), no UDF. A document shorter than ``n``
    words yields its whole text as the single shingle.
    """
    w = words(col)
    k = F.size(w) - F.lit(n - 1)
    grams = F.when(k > 0, gram_strings(col, n)).otherwise(F.array(F.concat_ws(" ", w)))
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
