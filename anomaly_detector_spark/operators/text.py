"""Text-analysis operators for training-data pipelines.

All hot-path expressions are JVM-side ``pyspark.sql.functions`` (inside
whole-stage codegen, no Python): token counting, quality scoring,
fingerprinting, language-ID scoring. At 100 TB these run as narrow maps
over the scan — zero shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
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
    one regexp pass, JVM-side. Where exactness matters (token-budget
    packing, shard sizing), use the REAL learned-merge tokenizer in
    operators/bpe.py (learn_bpe + bpe_doc_token_counts) — this one is
    the zero-shuffle screening heuristic.
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


def _marker_masks() -> tuple[dict[str, int], dict[str, int]]:
    """Bit layout for single-pass language scoring: one bit per
    (lang, marker) slot (50 bits total); a token shared by several
    languages ("de", "la") carries the OR of all its slots."""
    tok_bits: dict[str, int] = {}
    lang_mask: dict[str, int] = {}
    p = 0
    for lang in sorted(LANG_MARKERS):
        m = 0
        for w in LANG_MARKERS[lang]:
            tok_bits[w] = tok_bits.get(w, 0) | (1 << p)
            m |= 1 << p
            p += 1
        lang_mask[lang] = m
    return tok_bits, lang_mask


def with_lang_id(df: DataFrame, col: str = "text") -> DataFrame:
    """Marker-word language-ID heuristic, JVM-side.

    Scores each language by distinct marker-word hits in the token set;
    ties break lexicographically; zero hits → 'und' (undetermined).

    Single-pass form: ONE ``aggregate`` traversal ORs each token's
    marker bit (distinctness free — OR is idempotent) into a 50-bit
    mask, materialized as its OWN projection; ``lang_id`` and
    ``lang_id_hits`` are cheap bit ops over that mask column. Two
    earlier forms lost:

    * per-language ``array_intersect(transform(split(...)))`` —
      re-expanded the tokenization inside every consumer (~12
      traversals/row; HOFs are interpreted, no codegen CSE): 3.3s to
      filter 5,000 300-char docs vs ~0.2s for the mask form;
    * fold returning a ``struct(lang, hits)`` with both outputs
      extracted from it — each GetStructField carried its OWN copy of
      the whole fold (struct subscripting copies the expression tree;
      interpreted projection has no subexpression elimination), so the
      dominant token traversal ran TWICE per row. Folding to the raw
      mask first halves it: CollapseProject keeps the mask as a
      separate projection because it is non-cheap and referenced ~11
      times downstream.
    """
    tok_bits, lang_mask = _marker_masks()
    entries: list = []
    for w in sorted(tok_bits):
        entries += [F.lit(w), F.lit(tok_bits[w])]
    mmap = F.create_map(*entries)  # literal map, constant-folded
    langs = sorted(LANG_MARKERS)

    mask = F.aggregate(
        tokens(col),
        F.lit(0).cast("long"),
        lambda acc, t: acc.bitwiseOR(
            F.coalesce(F.element_at(mmap, F.lower(t)), F.lit(0).cast("long"))
        ),
    )
    df = df.withColumn("_lang_mask", mask)
    m = F.col("_lang_mask")
    hits = {l: F.bit_count(m.bitwiseAND(F.lit(lang_mask[l]))) for l in langs}
    best = F.greatest(*hits.values()) if len(langs) > 1 else hits[langs[0]]
    pick = F.lit("und")
    # iterate reversed so the FIRST (lex-min) max lang wins the chain
    for l in reversed(langs):
        pick = F.when(hits[l] == best, F.lit(l)).otherwise(pick)
    return (
        df.withColumn("lang_id", F.when(best > 0, pick).otherwise(F.lit("und")))
        .withColumn("lang_id_hits", best.cast("long"))
        .drop("_lang_mask")
    )


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

    # Bind the hash array as a lambda variable before the sliding-window
    # lambda consumes it: an inline reference would re-derive the whole
    # shingle+sha256 pipeline per WINDOW (interpreted HOF bodies evaluate
    # per element) — O(n²) per doc. A bound variable is a slot read.
    def mk(hs):
        n_windows = F.size(hs) - (window - 1)
        # guard: Spark sequence(1, n) DESCENDS when n < 1 — an empty doc
        # must yield an empty fingerprint set, not sequence(1, 0) == [1, 0]
        return F.when(n_windows < 1, F.array().cast("array<string>")).otherwise(
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), n_windows),
                    lambda i: F.array_min(F.slice(hs, i, window)),
                )
            )
        )

    selected = F.element_at(F.transform(F.array(hashes), mk), 1)
    return df.select(
        F.col(id_col), F.explode(selected).alias("fingerprint")
    )


def repetition_stats(
    df: DataFrame, col: str = "text", k: int = 3, round_digits: int | None = 6
) -> DataFrame:
    """Within-document repetition score: the fraction of word k-grams
    that are repeats of an earlier k-gram in the same document.

    Boilerplate / degenerate generations repeat themselves; corpus-prep
    pipelines gate on this the same way they gate on quality_score. All
    JVM array expressions over one narrow pass — the k-gram multiset is
    never shuffled, only its two counts survive the projection.

    Adds: n_grams (total k-grams), n_unique, rep_ratio = 1 - unique/total
    (0.0 for docs shorter than k tokens).
    """
    from .dedup import word_shingles

    # Materialize the shingle array as its OWN projection: n_grams and
    # n_unique both consume it, and within a single interpreted Project
    # each reference would carry its own copy of the whole k-gram
    # construction (HOFs get no codegen CSE) — measured 2x the stage.
    # CollapseProject keeps the split because the producing expression
    # is non-cheap and referenced twice.
    df = df.withColumn("_sh", word_shingles(col, k, distinct=False))
    n = F.size(F.col("_sh"))
    d = F.size(F.array_distinct(F.col("_sh")))
    ratio = F.lit(1.0) - d / n
    if round_digits is not None:
        ratio = F.round(ratio, round_digits)
    return df.select(
        "*",
        n.cast("long").alias("n_grams"),
        d.cast("long").alias("n_unique"),
        F.when(n > 0, ratio).otherwise(F.lit(0.0)).alias("rep_ratio"),
    ).drop("_sh")


def vocab_topk(
    df: DataFrame, col: str = "text", k: int = 100, min_count: int = 1
) -> DataFrame:
    """Corpus-wide token heavy hitters (the tokenizer-training /
    vocab-building pass): (token, n) for the k most frequent tokens,
    ties broken lexicographically (deterministic output).

    Scale shape: explode is narrow; the groupBy partial-aggregates
    map-side, so the shuffle carries one row per (token, partition) —
    O(|vocab| × tasks), not O(total tokens). The final ordered limit
    runs on the |vocab|-sized aggregate via Spark's TakeOrdered
    (per-partition top-k then a k-row merge at the driver — no global
    sort materializes).
    """
    return (
        df.select(F.explode(tokens(col)).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .filter(F.col("n") >= min_count)
        .orderBy(F.desc("n"), F.asc("token"))
        .limit(k)
    )


# PII patterns chosen from the regex subset with IDENTICAL semantics in
# Java (Spark) and RE2 (DuckDB/Go scrubbers): character classes, bounded
# repetition, \b word boundaries — no lookarounds, no backrefs. Order
# matters: emails are redacted before IPs so the digits of a host part
# are never re-matched.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+\d{7,15}\b", "<PHONE>"),
]


def redact_pii(
    df: DataFrame,
    col: str = "text",
    out: str = "redacted",
    patterns: list[tuple[str, str, str]] | None = None,
) -> DataFrame:
    """Redact PII spans and count them per kind: adds ``out`` (the
    scrubbed text) and one ``n_<kind>`` long per pattern.

    Pure JVM ``regexp_replace``/``regexp_count`` chain — zero shuffle,
    zero Python, applied in pattern order on the progressively scrubbed
    string (counts are computed on the text as each pattern sees it, so
    overlapping kinds never double-count). At 100 TB this is a map-only
    pass that pipelines into whatever scan feeds it.
    """
    pats = patterns if patterns is not None else PII_PATTERNS
    cur = F.coalesce(F.col(col), F.lit(""))
    counts = []
    for kind, rx, token in pats:
        counts.append(F.regexp_count(cur, F.lit(rx)).cast("long").alias(f"n_{kind}"))
        cur = F.regexp_replace(cur, rx, token)
    return df.select("*", *counts, cur.alias(out))


def bigram_perplexity(
    df: DataFrame,
    col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 0.1,
    model_df: DataFrame | None = None,
    round_digits: int = 4,
) -> DataFrame:
    """Per-document bigram-LM perplexity — the CCNet-style quality
    signal LLM data pipelines filter on (high perplexity under a
    reference model ≈ boilerplate/garbled text).

    Model: add-k-smoothed bigram MLE trained in-plan on ``model_df``
    (default: the scored corpus itself) —
    P(w2|w1) = (c(w1,w2) + alpha) / (c(w1) + alpha*V). Score:
    nll = -sum(n * ln P) / n_bigrams over the doc's bigram counts,
    ppl = exp(nll).

    Scale shape (100 TB): bigrams come from one zip_with over the token
    array (narrow); both model tables are map-side-combined hash
    aggregates; scoring joins the per-doc AGGREGATED (doc, w1, w2)
    counts against the model on the bigram key (AQE-broadcastable for
    bounded vocabularies) — the text itself never rides a shuffle, and
    nothing is per-row Python. V and the model are data, not driver
    state: no collect anywhere.

    Determinism across engines AND partitionings: each bigram's
    log-prob is quantized to integer MICRO-NATS (round(ln P * 1e6) as
    long), so the per-doc sum is exact integer arithmetic — immune to
    the float-summation-order drift that a double sum has at the 6th
    decimal (measured: a plain double sum hash-mismatched DuckDB at
    1e-6 on sf0.01). nll = -sll / (n_bigrams * 1e6) is then one IEEE
    division of exact operands, and ppl = round(exp(nll_6dp), 4) only
    needs libm-exp parity at 4dp.

    Returns (id_col, n_bigrams, nll, ppl); docs with < 2 tokens (no
    bigrams) emit no rows.
    """
    train = model_df if model_df is not None else df

    def _bigrams(frame: DataFrame) -> DataFrame:
        toks = tokens(col)
        n = F.size(toks)
        pairs = F.zip_with(
            F.slice(toks, 1, F.greatest(n - 1, F.lit(0))),
            F.slice(toks, 2, F.greatest(n - 1, F.lit(0))),
            lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
        )
        return frame.select(
            F.col(id_col).alias("_id"), F.explode(pairs).alias("bg")
        ).select("_id", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))

    big_counts = _bigrams(train).groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    uni_counts = (
        train.select(F.explode(tokens(col)).alias("w1"))
        .groupBy("w1")
        .agg(F.count(F.lit(1)).alias("c1"))
    )
    vocab = train.select(F.explode(tokens(col)).alias("w")).agg(
        F.count_distinct("w").alias("v")
    )
    doc_bg = _bigrams(df).groupBy("_id", "w1", "w2").agg(F.count(F.lit(1)).alias("n"))
    scored = (
        doc_bg.join(big_counts, ["w1", "w2"], "left")
        .join(uni_counts, "w1", "left")
        .crossJoin(F.broadcast(vocab))
        .withColumn(
            "_ll_micro",
            F.round(
                F.log(
                    (F.coalesce(F.col("c12"), F.lit(0)) + F.lit(alpha))
                    / (F.coalesce(F.col("c1"), F.lit(0)) + F.lit(alpha) * F.col("v"))
                )
                * F.lit(1000000.0)
            ).cast("long"),
        )
    )
    agg = scored.groupBy("_id").agg(
        F.sum("n").alias("n_bigrams"),
        F.sum(F.col("n") * F.col("_ll_micro")).alias("_sll"),
    )
    nll = F.round(
        -F.col("_sll").cast("double") / (F.col("n_bigrams") * F.lit(1000000.0)), 6
    )
    return agg.select(
        F.col("_id").alias(id_col),
        F.col("n_bigrams").cast("long").alias("n_bigrams"),
        nll.alias("nll"),
        F.round(F.exp(nll), round_digits).alias("ppl"),
    )


def tfidf_topk(
    df: DataFrame,
    col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    round_digits: int = 6,
) -> DataFrame:
    """Top-k TF-IDF terms per document (keyword extraction / doc
    representation for corpus curation and retrieval indexing).

    score = tf * (ln((N + 1) / (df + 1)) + 1)  — raw term count times
    smoothed idf (the sklearn smooth_idf formulation: +1 on both log
    arguments so unseen-ish terms never divide by zero, +1 outside so
    terms appearing in EVERY doc still score).

    Scale shape (100 TB): explode -> two map-side-combined hash
    aggregates ((doc, term) tf, then term df), a term-keyed shuffle
    join of two aggregated frames (AQE-broadcastable when the vocab is
    small), the corpus size N folded in as a broadcast 1-row aggregate
    (never a driver action), and a per-doc top-k window over the
    already-aggregated (doc, term) frame. The document text itself
    never rides any shuffle. Ranking compares the ROUNDED score (ties
    broken by term ascending) so results are partitioning- and
    engine-stable.

    Returns (id_col, term, tf, score, rank), rank <= k. Documents with
    no tokens emit no rows.
    """
    tf_frame = (
        df.select(F.col(id_col).alias("_id"), F.explode(tokens(col)).alias("term"))
        .groupBy("_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    doc_freq = tf_frame.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.agg(F.count_distinct(F.col(id_col)).alias("n_docs"))
    scored = (
        tf_frame.join(doc_freq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.round(
                F.col("tf")
                * (F.log((F.col("n_docs") + F.lit(1.0)) / (F.col("df") + F.lit(1.0))) + F.lit(1.0)),
                round_digits,
            ),
        )
    )
    w = Window.partitionBy("_id").orderBy(F.col("score").desc(), F.col("term").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("_id").alias(id_col),
            "term",
            F.col("tf").cast("long").alias("tf"),
            "score",
            F.col("rank").cast("long").alias("rank"),
        )
    )


def chunk_documents(
    df: DataFrame,
    col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 128,
    stride: int = 96,
) -> DataFrame:
    """Overlapping token-window chunking — the RAG / training-prep
    standard: (id, chunk_idx, n_tokens, chunk) rows where chunk i covers
    tokens [i*stride, i*stride + chunk_tokens). ``stride < chunk_tokens``
    overlaps consecutive chunks by ``chunk_tokens - stride`` tokens so no
    boundary context is lost; ``stride == chunk_tokens`` degenerates to
    doc_segments' disjoint windows. ``stride > chunk_tokens`` would drop
    tokens silently and is rejected.

    Chunk counts use pure INTEGER arithmetic (1 + (n - w + s - 1) div s),
    never a float ceil — cross-engine exact. Empty/NULL docs emit no
    rows. All JVM array expressions: the token array binds as a lambda
    variable (the HOF per-element re-evaluation lesson), the explode
    fans out map-side, zero Python, zero shuffles.
    """
    if stride < 1 or stride > chunk_tokens:
        raise ValueError(
            f"stride ({stride}) must be in [1, chunk_tokens={chunk_tokens}]: "
            "a larger stride silently drops the tokens between windows"
        )
    w, s = chunk_tokens, stride

    def mk(tk: Column) -> Column:
        n = F.size(tk)
        nchunks = F.when(n <= w, F.lit(1)).otherwise(
            (F.lit(1) + (n - w + s - 1) / F.lit(s)).cast("int")
        )
        return F.when(n <= 0, F.array().cast("array<struct<nt:int,ch:string>>")).otherwise(
            F.transform(
                F.sequence(F.lit(0), nchunks - 1),
                lambda i: F.struct(
                    F.least(F.lit(w), n - i * s).cast("int").alias("nt"),
                    F.concat_ws(" ", F.slice(tk, i * s + 1, w)).alias("ch"),
                ),
            )
        )

    arr = F.element_at(F.transform(F.array(tokens(col)), mk), 1)
    ex = df.select(F.col(id_col), F.posexplode(arr).alias("chunk_idx", "_c"))
    return ex.select(
        id_col,
        "chunk_idx",
        F.col("_c.nt").alias("n_tokens"),
        F.col("_c.ch").alias("chunk"),
    )
