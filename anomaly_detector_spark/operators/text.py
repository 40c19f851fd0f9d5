"""Text-analysis operators for training-data pipelines.

All hot-path expressions are JVM-side ``pyspark.sql.functions`` (inside
whole-stage codegen, no Python): token counting, quality scoring,
fingerprinting, language-ID scoring. At 100 TB these run as narrow maps
over the scan — zero shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language common-word lists for the language-ID heuristic.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "for", "with"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "zu"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "por", "con", "para"],
    "fr": ["le", "la", "les", "de", "et", "un", "une", "est", "pour", "dans"],
    "zh": ["de5", "shi4", "bu4", "le5", "zai4", "ren2", "you3", "ta1", "zhe4", "wo3"],
}

STOPWORDS = sorted({w for ws in LANG_MARKERS.values() for w in ws})


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization; empty/NULL-safe (returns empty array)."""
    c = F.col(col) if isinstance(col, str) else col
    trimmed = F.trim(F.coalesce(c, F.lit("")))
    return F.when(trimmed == "", F.array().cast("array<string>")).otherwise(
        F.split(trimmed, r"\s+")
    )


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


def bpe_ish_token_count(col: Column | str) -> Column:
    """BPE-ish subword proxy: count alnum runs + standalone punctuation.

    Approximates tokenizer behavior (words split from punctuation) with
    one regexp pass, JVM-side.
    """
    c = F.col(col) if isinstance(col, str) else col
    arr = F.regexp_extract_all(
        F.coalesce(c, F.lit("")), F.lit(r"([A-Za-z0-9]+|[^A-Za-z0-9\s])"), F.lit(1)
    )
    return F.size(arr)


def with_text_stats(df: DataFrame, col: str = "text") -> DataFrame:
    """Length / token / punctuation / stopword quality features, one pass."""
    toks = tokens(col)
    c = F.coalesce(F.col(col), F.lit(""))
    n_chars = F.length(c)
    n_tokens = F.size(toks)
    n_alpha = F.length(F.regexp_replace(c, r"[^A-Za-z]", ""))
    n_punct = F.length(F.regexp_replace(c, r"[A-Za-z0-9\s]", ""))
    stop_arr = F.array(*[F.lit(w) for w in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, F.lower(t))))
    return (
        df.withColumn("n_chars", n_chars)
        .withColumn("n_tokens", n_tokens)
        .withColumn(
            "avg_token_len",
            F.when(n_tokens > 0, F.round((n_chars - (n_tokens - 1)) / n_tokens, 4)).otherwise(F.lit(0.0)),
        )
        .withColumn("alpha_ratio", F.when(n_chars > 0, F.round(n_alpha / n_chars, 4)).otherwise(F.lit(0.0)))
        .withColumn("punct_ratio", F.when(n_chars > 0, F.round(n_punct / n_chars, 4)).otherwise(F.lit(0.0)))
        .withColumn("stopword_ratio", F.when(n_tokens > 0, F.round(n_stop / n_tokens, 4)).otherwise(F.lit(0.0)))
    )


def quality_score(df: DataFrame, col: str = "text", round_digits: int | None = 4) -> DataFrame:
    """Composite [0,1] quality score from the stats columns (adds them if absent).

    ``round_digits=None`` keeps the raw double: scale-N rounding of a
    double is engine-dependent at half boundaries (JVM BigDecimal
    HALF_UP on the exact expansion vs scaled-double rounding), so
    cross-engine-exact consumers should gate/convert on the raw value
    with a single scale-0 round, which IS engine-identical.
    """
    if "n_tokens" not in df.columns:
        df = with_text_stats(df, col)
    length_ok = (F.col("n_tokens") >= 5) & (F.col("n_chars") <= 100000)
    score = (
        F.when(length_ok, F.lit(0.4)).otherwise(F.lit(0.0))
        + F.col("alpha_ratio") * 0.3
        + (1.0 - F.least(F.col("punct_ratio") * 4, F.lit(1.0))) * 0.3
    )
    if round_digits is not None:
        score = F.round(score, round_digits)
    return df.withColumn("quality_score", score)


def with_lang_id(df: DataFrame, col: str = "text") -> DataFrame:
    """Marker-word language-ID heuristic, JVM-side.

    Scores each language by distinct marker-word hits in the token set;
    ties break lexicographically; zero hits → 'und' (undetermined).
    """
    toks = F.transform(tokens(col), lambda t: F.lower(t))
    scores = [
        F.struct(
            F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in ws]))).alias("hits"),
            F.lit(lang).alias("lang"),
        )
        for lang, ws in sorted(LANG_MARKERS.items())
    ]
    # array_max on structs orders by (hits, lang); invert lang for lex-asc
    # tie-break by taking max hits then min lang among maxes.
    arr = F.array(*scores)
    best_hits = F.array_max(F.transform(arr, lambda s: s["hits"]))
    best = F.array_min(
        F.transform(F.filter(arr, lambda s: s["hits"] == best_hits), lambda s: s["lang"])
    )
    return df.withColumn(
        "lang_id", F.when(best_hits > 0, best).otherwise(F.lit("und"))
    ).withColumn("lang_id_hits", best_hits.cast("long"))


def with_fingerprint(df: DataFrame, col: str = "text", out: str = "fingerprint") -> DataFrame:
    """64-bit rolling-hash-style document fingerprint (xxhash64 of
    normalized content) — cheap exact-dup key."""
    norm = F.lower(F.regexp_replace(F.coalesce(F.col(col), F.lit("")), r"\s+", " "))
    return df.withColumn(out, F.xxhash64(norm))


def winnow_fingerprints(
    df: DataFrame,
    col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
    window: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (the MOSS scheme, Schleimer/
    Wilkerson/Aiken SIGMOD'03): hash every word k-shingle, slide a
    ``window``-wide window over the hash sequence, keep the minimum of
    each window; the distinct selected hashes are the document's
    fingerprint set. Guarantees any shared run of window+k-1 tokens
    between two documents shares at least one fingerprint.

    Everything is JVM-side array expressions (transform/slice/array_min)
    — a narrow map, no shuffle, no Python. Hashes are sha256-derived hex
    prefixes so any SQL engine reproduces them. Output: one row per
    (doc, fingerprint), explode-ready for an inverted-index join.
    """
    from .dedup import word_shingles

    sh = word_shingles(col, shingle_k, distinct=False)
    hashes = F.transform(sh, lambda s: F.substring(F.sha2(s, 256), 1, 16))
    n_windows = F.size(hashes) - (window - 1)
    # guard: Spark sequence(1, n) DESCENDS when n < 1 — an empty doc must
    # yield an empty fingerprint set, not sequence(1, 0) == [1, 0]
    selected = F.when(n_windows < 1, F.array().cast("array<string>")).otherwise(
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), n_windows),
                lambda i: F.array_min(F.slice(hashes, i, window)),
            )
        )
    )
    return df.select(
        F.col(id_col), F.explode(selected).alias("fingerprint")
    )
