"""Text analysis for training-data pipelines — all JVM builtins.

Language-ID (stopword n-gram heuristic), quality scoring, token counting
(whitespace + BPE-ish regex), and document fingerprinting. Each operator
is a pure Column expression, so the whole suite runs inside whole-stage
codegen and is expressible 1:1 in ANSI SQL for oracle checking.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from binlog_es_go_spark.operators.functions import content_fingerprint, words

# tiny deterministic stopword profiles (heuristic language ID)
LANG_PROFILES: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "it"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "zu"],
    "fr": ["le", "la", "les", "et", "est", "une", "que", "pour"],
    "es": ["el", "la", "los", "de", "que", "es", "una", "para"],
}


def _profile_hits(col: Column, profile: list[str]) -> Column:
    pattern = r"\b(" + "|".join(profile) + r")\b"
    return F.size(F.regexp_extract_all(F.lower(col), F.lit(pattern), 1))


def lang_id(col: Column | str, profiles: dict[str, list[str]] | None = None) -> Column:
    """Heuristic language ID: argmax of stopword-profile hit counts.

    Ties and zero-hit documents resolve to 'und' (undetermined) — fully
    deterministic; the scale path is identical (one regexp pass per
    profile, codegen'd).
    """
    c = F.col(col) if isinstance(col, str) else col
    profs = profiles or LANG_PROFILES
    scores = [(name, _profile_hits(c, words_)) for name, words_ in profs.items()]
    best = F.greatest(*[s for _, s in scores])
    result = F.lit("und")
    # build reverse so earlier profiles win ties deterministically
    for name, score in reversed(scores):
        result = F.when((score == best) & (best > 0), F.lit(name)).otherwise(result)
    return result


def token_count_ws(col: Column | str) -> Column:
    """Whitespace token count."""
    return F.size(words(col))


def token_count_bpe(col: Column | str) -> Column:
    """BPE-ish subword count: word chunks + digits + punctuation runs.

    A deterministic proxy for tokenizer counts (GPT-style regex family):
    matches of `[A-Za-z]{1,8}|[0-9]{1,3}|[^A-Za-z0-9\\s]` — long words
    split every 8 chars, number runs every 3 digits, punctuation 1:1.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(r"([A-Za-z]{1,8}|[0-9]{1,3}|[^A-Za-z0-9\s])"), 1))


def quality_features(col: Column | str) -> dict[str, Column]:
    """Quality-signal features: length, word stats, punct/stopword ratios."""
    c = F.col(col) if isinstance(col, str) else col
    w = words(c)
    n_words = F.size(w)
    n_chars = F.length(c)
    mean_word_len = F.when(n_words > 0, (F.aggregate(w, F.lit(0), lambda a, x: a + F.length(x))).cast("double") / n_words).otherwise(F.lit(0.0))
    n_punct = F.size(F.regexp_extract_all(c, F.lit(r"([^\w\s])"), 1))
    punct_ratio = F.when(n_chars > 0, n_punct.cast("double") / n_chars).otherwise(F.lit(0.0))
    stop_hits = _profile_hits(c, LANG_PROFILES["en"])
    stopword_ratio = F.when(n_words > 0, stop_hits.cast("double") / n_words).otherwise(F.lit(0.0))
    return {
        "n_chars": n_chars,
        "n_words": n_words,
        "mean_word_len": mean_word_len,
        "punct_ratio": punct_ratio,
        "stopword_ratio": stopword_ratio,
    }


def quality_score(col: Column | str) -> Column:
    """Composite quality score in [0,1]: longer, wordier, punct-sane text
    scores higher. Deterministic weighted clamp of the features."""
    f = quality_features(col)
    len_score = F.least(f["n_words"].cast("double") / F.lit(100.0), F.lit(1.0))
    word_len_score = F.when(
        (f["mean_word_len"] >= 3) & (f["mean_word_len"] <= 10), F.lit(1.0)
    ).otherwise(F.lit(0.3))
    punct_score = F.when(f["punct_ratio"] <= 0.2, F.lit(1.0)).otherwise(F.lit(0.2))
    stop_score = F.least(f["stopword_ratio"] * F.lit(5.0), F.lit(1.0))
    return (
        len_score * F.lit(0.4) + word_len_score * F.lit(0.2) + punct_score * F.lit(0.2) + stop_score * F.lit(0.2)
    )


def hash_split(
    col: Column | str,
    weights: dict[str, float],
    salt: str = "split",
    buckets: int = 10_000,
) -> Column:
    """Deterministic dataset split (train/val/test) by content/id hash.

    ``rand()``-based sampling is irreproducible across runs and engines;
    hashing the ID into ``buckets`` and carving contiguous ranges by the
    normalized weights gives a split that is (a) stable under re-runs and
    data re-partitioning, (b) consistent for the same key across tables,
    (c) reproducible in an ANSI oracle (md5-nibble bucket). This is the
    standard leakage-safe splitter for training pipelines.
    """
    c = F.col(col) if isinstance(col, str) else col
    # bucket = first 12 md5 hex chars mod buckets (48 bits: no modulo bias
    # worth caring about at 10^4 buckets)
    h = F.conv(F.substring(F.md5(F.concat(F.lit(salt + ":"), c.cast("string"))), 1, 12), 16, 10)
    b = F.pmod(h.cast("long"), F.lit(buckets))
    total = sum(weights.values())
    items = list(weights.items())
    expr = None
    upper = 0.0
    # CASE WHEN b < u1 THEN s1 WHEN b < u2 THEN s2 ... — ascending bounds,
    # first match wins; the last split takes the remainder (no float gap)
    for name, w in items[:-1]:
        upper += w / total * buckets
        cond = b < F.lit(int(round(upper)))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    if expr is None:
        return F.lit(items[-1][0])
    return expr.otherwise(F.lit(items[-1][0]))


def doc_fingerprint(col: Column | str) -> Column:
    """Normalized md5 document fingerprint (exact-dup identity)."""
    return content_fingerprint(col)


def rolling_fingerprints(
    col: Column | str, window: int = 8, keep_every: int = 4, hash_fn: str = "xxhash64"
) -> Column:
    """Winnowing-style rolling fingerprints: hash each word w-gram, keep
    hashes ≡ 0 mod keep_every — a deterministic sparse signature robust to
    local edits (near-dup evidence / plagiarism-style matching).

    ``hash_fn``: "xxhash64" (production, cheap) keeps array<long>; "md5"
    keeps array<string> with selection by the LAST hex nibble mod
    keep_every — the same rule an ANSI oracle can evaluate, putting the
    winnowing pipeline under the cross-engine hash gate (keep_every <= 16).
    """
    from binlog_es_go_spark.operators.functions import gram_strings

    w = words(col)
    k = F.size(w) - F.lit(window - 1)
    if hash_fn == "md5":
        h = lambda g: F.md5(g)  # noqa: E731
        keep = lambda x: F.pmod(F.conv(F.substring(x, 32, 1), 16, 10).cast("int"), F.lit(keep_every)) == 0  # noqa: E731
    else:
        h = lambda g: F.xxhash64(g)  # noqa: E731
        keep = lambda x: F.pmod(x, F.lit(keep_every)) == 0  # noqa: E731
    # gram_strings: O(window) evaluations of the split subtree per row
    # instead of O(len) (see its docstring — same values either way)
    grams = F.when(
        k > 0, F.transform(gram_strings(col, window), h)
    ).otherwise(F.array(h(F.concat_ws(" ", w))))
    return F.sort_array(F.array_distinct(F.filter(grams, keep)))
