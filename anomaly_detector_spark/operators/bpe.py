"""Real byte-pair encoding: distributed merge learning + exact
tokenization.

Replaces the ``bpe_ish_token_count`` heuristic (operators/text.py) with
the canonical LLM-pipeline operator (Sennrich et al. 2016, public
algorithm): learn a merge table from the corpus, then tokenize exactly
against it.

Spark-first shape — and the 100 TB story:

* The corpus collapses to a WORD-FREQUENCY frame once (one shuffle;
  words are the classic BPE unit, so everything after runs over the
  vocabulary, which is orders of magnitude smaller than the corpus and
  stays distributed — at web scale the unique-word set can itself be
  hundreds of millions of rows, so it is never collected).
* Each learning round is one explode + map-side-combined groupBy over
  the vocab frame (pair counts weighted by word frequency), a 1-row
  argmax collect, and a JVM-side ``F.aggregate`` fold applying the
  winning merge — NO Python UDF anywhere in the loop. The vocab frame
  is localCheckpointed every round: plans stay shallow (the fold would
  otherwise nest ``n_merges`` deep) and each round's input is
  materialized once.
* Exact tokenization dedups to DISTINCT words, tokenizes each once in
  an Arrow-batched kernel against the broadcast merge ranks, and joins
  back — the standard vocab-level optimization: the Python cost is
  O(unique words), not O(corpus tokens).

Determinism: ties in pair counts break lexicographically (count DESC,
left ASC, right ASC) — pinned by the oracle and by the hand-computed
Sennrich-style fixture test.
"""

from __future__ import annotations

import sys
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import tokens

try:  # pragma: no cover - trivial registration
    from pyspark import cloudpickle as _cp

    _cp.register_pickle_by_value(sys.modules[__name__])
except Exception:
    pass


def word_frequencies(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, cnt): whitespace words of ``text_col`` with corpus
    frequencies — the one corpus-wide shuffle BPE needs."""
    return (
        df.select(F.explode(tokens(text_col)).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _apply_merge(symbols_col, a: str, b: str):
    """JVM-side left-to-right merge of adjacent (a, b) into a||b: a
    lambda fold over the symbol array (whole-stage-codegen friendly,
    no Python). Greedy scan semantics: 'aaa' + (a,a) -> ['aa', 'a']."""
    return F.aggregate(
        symbols_col,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (x == F.lit(b)),
            F.concat(
                F.slice(acc, F.lit(1), F.size(acc) - 1), F.array(F.lit(a + b))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def learn_bpe(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 40,
    min_pair_count: int = 2,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from the corpus, distributed.

    Driver-side loop of Spark jobs: each round counts adjacent symbol
    pairs over the (distributed, word-level) vocab frame, collects the
    single argmax row, and applies it with a JVM fold. Stops early when
    the best pair's weighted count drops below ``min_pair_count``.
    Returns the merge list in learned order."""
    # lazy localCheckpoint: the round's argmax action materializes it,
    # so each round costs ONE job instead of two (measured 2x on the
    # fixture); lineage still truncates at every round
    vocab = (
        word_frequencies(df, text_col)
        .select(F.split(F.col("word"), "").alias("symbols"), "cnt")
        .localCheckpoint(eager=False)
    )
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        best = (
            vocab.select(
                F.explode(
                    # sequence(0, -1) DESCENDS in Spark, so single-symbol
                    # words need the explicit empty-array guard
                    F.expr(
                        "CASE WHEN size(symbols) < 2 "
                        "THEN array() "
                        "ELSE transform(sequence(0, size(symbols) - 2), "
                        "i -> struct(symbols[i] AS a, symbols[i + 1] AS b)) END"
                    )
                ).alias("p"),
                "cnt",
            )
            .groupBy("p.a", "p.b")
            .agg(F.sum("cnt").alias("n"))
            .orderBy(F.col("n").desc(), F.col("a").asc(), F.col("b").asc())
            .limit(1)
            .collect()
        )
        if not best or best[0]["n"] < min_pair_count:
            break
        a, b = best[0]["a"], best[0]["b"]
        merges.append((a, b))
        vocab = vocab.select(
            _apply_merge(F.col("symbols"), a, b).alias("symbols"), "cnt"
        ).localCheckpoint(eager=False)
    return merges


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Exact BPE encode of one word: repeatedly merge the
    lowest-rank pair present (equivalent to applying the learned merges
    in order)."""
    syms = list(word)
    while len(syms) >= 2:
        best_rank, best_pair = None, None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, (syms[i], syms[i + 1])
        if best_pair is None:
            break
        a, b = best_pair
        out: list[str] = []
        for s in syms:
            if out and out[-1] == a and s == b:
                out[-1] = a + b
            else:
                out.append(s)
        syms = out
    return syms


def bpe_tokenize_words(
    words: DataFrame, merges: list[tuple[str, str]]
) -> DataFrame:
    """(word, tokens array<string>): exact tokenization of each DISTINCT
    word against the merge table (broadcast ranks, Arrow-batched)."""
    ranks = {pair: i for i, pair in enumerate(merges)}

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "word": pdf["word"],
                    "toks": [_encode_word(w, ranks) for w in pdf["word"]],
                }
            )

    return words.select("word").distinct().mapInPandas(
        kernel, "word string, toks array<string>"
    )


def bpe_token_counts(
    df: DataFrame, merges: list[tuple[str, str]], text_col: str = "text"
) -> DataFrame:
    """(token, total_cnt): corpus-wide BPE token counts — word
    frequencies x per-word tokenization, the vocab-level join that
    keeps Python cost O(unique words)."""
    freqs = word_frequencies(df, text_col)
    toks = bpe_tokenize_words(freqs, merges)
    return (
        freqs.join(toks, "word")
        .select(F.explode("toks").alias("token"), "cnt")
        .groupBy("token")
        .agg(F.sum("cnt").alias("total_cnt"))
    )


def bpe_doc_token_counts(
    df: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, n_bpe_tokens): exact per-document BPE token count — the
    honest replacement for ``bpe_ish_token_count`` where exactness
    matters (token-budget packing, shard sizing)."""
    occurrences = df.select(
        F.col(id_col), F.explode(tokens(text_col)).alias("word")
    ).filter(F.col("word") != "")
    per_word = bpe_tokenize_words(
        occurrences.select("word"), merges
    ).select("word", F.size("toks").alias("n_toks"))
    return (
        occurrences.join(per_word, "word")
        .groupBy(id_col)
        .agg(F.sum("n_toks").alias("n_bpe_tokens"))
    )


def save_merges(spark, merges: list[tuple[str, str]], store_dir: str) -> None:
    """Persist a learned merge table as a parquet tokenizer artifact —
    the BPE member of the cross-run store family (dedup band stores,
    quantile stores): learn once on a sample window, tokenize every
    later ingest with the SAME vocabulary (mixing merge tables across
    runs silently changes token budgets). One tiny file; rank order is
    the schema's contract."""
    spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(merges)],
        "rank long, lhs string, rhs string",
    ).coalesce(1).write.mode("overwrite").parquet(store_dir)


def load_merges(spark, store_dir: str) -> list[tuple[str, str]]:
    """Load a persisted merge table in learned (rank) order. A missing
    store raises AnalysisException loudly — an untrained tokenizer must
    never silently tokenize char-by-char."""
    rows = spark.read.parquet(store_dir).orderBy("rank").collect()
    return [(r["lhs"], r["rhs"]) for r in rows]


def synth_bpe_corpus_rows(n_docs: int) -> list[tuple[int, str]]:
    """Deterministic corpus shared by the Spark fixture and the
    independent reference implementation (tools/gen_bpe_expected.py):
    doc i = 12 words drawn from a fixed pool by sha256 bytes. Pure
    function of ``n_docs`` — no RNG, no files."""
    import hashlib

    pool = [
        "low", "lower", "lowest", "new", "newer", "newest", "wide",
        "wider", "widest", "the", "these", "this", "that", "then",
        "there", "train", "training", "trainer", "data", "dataset",
    ]
    rows = []
    for i in range(n_docs):
        d = hashlib.sha256(f"bpe{i}".encode()).digest()
        words = [pool[d[k] % len(pool)] for k in range(12)]
        rows.append((i, " ".join(words)))
    return rows


def synth_bpe_corpus(spark, n_docs: int) -> DataFrame:
    return spark.createDataFrame(
        synth_bpe_corpus_rows(n_docs), "doc_id long, text string"
    )
