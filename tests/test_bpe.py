"""Real-BPE tests (operators/bpe.py) — the r4 verdict's canonical
LLM-pipeline ask: distributed merge learning + exact tokenization,
replacing the bpe_ish heuristic where exactness matters."""

from pyspark.sql import functions as F

from anomaly_detector_spark.operators.bpe import (
    bpe_doc_token_counts,
    bpe_token_counts,
    bpe_tokenize_words,
    learn_bpe,
    synth_bpe_corpus,
    synth_bpe_corpus_rows,
)


def test_learn_bpe_tiny_hand_computed(spark):
    # freqs: 'aa' x2, 'aab' x1. pair (a,a) weight 3, (a,b) weight 1.
    # merge 1 = (a,a); then pair (aa,b) has weight 1 < min_pair_count 2
    # -> stop. Greedy left-to-right: 'aab' -> [aa, b].
    corpus = spark.createDataFrame(
        [(0, "aa aab"), (1, "aa")], "doc_id long, text string"
    )
    merges = learn_bpe(corpus, n_merges=10, min_pair_count=2)
    assert merges == [("a", "a")]
    counts = {
        r["token"]: r["total_cnt"]
        for r in bpe_token_counts(corpus, merges).collect()
    }
    assert counts == {"aa": 3, "b": 1}


def test_learn_bpe_tie_breaks_lexicographically(spark):
    # (a,b) and (c,d) both have weight 2 -> the lexicographically
    # smaller pair must win deterministically
    corpus = spark.createDataFrame(
        [(0, "ab cd ab cd")], "doc_id long, text string"
    )
    merges = learn_bpe(corpus, n_merges=1, min_pair_count=2)
    assert merges == [("a", "b")]


def test_greedy_fold_overlapping_occurrences(spark):
    # 'aaa' under merge (a,a) scans left to right: ['aa', 'a'] — the
    # JVM aggregate-fold and the kernel tokenizer must agree on this
    corpus = spark.createDataFrame(
        [(0, "aaa aaa aa")], "doc_id long, text string"
    )
    merges = learn_bpe(corpus, n_merges=1, min_pair_count=2)
    assert merges == [("a", "a")]
    words = spark.createDataFrame([("aaa",), ("aaaa",)], "word string")
    toks = {
        r["word"]: r["toks"] for r in bpe_tokenize_words(words, merges).collect()
    }
    assert toks["aaa"] == ["aa", "a"]
    assert toks["aaaa"] == ["aa", "aa"]


def _sequential_reference(rows, n_merges, min_pair_count=2):
    """In-test definitional BPE (independent of operators/bpe.py)."""
    from collections import Counter

    freqs = Counter(w for _i, t in rows for w in t.split())
    vocab = {w: list(w) for w in freqs}
    merges = []
    for _ in range(n_merges):
        pc = Counter()
        for w, syms in vocab.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += freqs[w]
        if not pc:
            break
        (a, b), n = min(pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        if n < min_pair_count:
            break
        merges.append((a, b))
        for w, syms in vocab.items():
            out = []
            for s in syms:
                if out and out[-1] == a and s == b:
                    out[-1] = a + b
                else:
                    out.append(s)
            vocab[w] = out
    return merges, vocab, freqs


def test_distributed_learn_matches_sequential_reference(spark):
    rows = synth_bpe_corpus_rows(100)
    expect_merges, vocab, freqs = _sequential_reference(rows, 12)
    corpus = synth_bpe_corpus(spark, 100)
    merges = learn_bpe(corpus, n_merges=12)
    assert merges == expect_merges

    from collections import Counter

    expect_counts = Counter()
    for w, syms in vocab.items():
        for s in syms:
            expect_counts[s] += freqs[w]
    got = {
        r["token"]: r["total_cnt"]
        for r in bpe_token_counts(corpus, merges).collect()
    }
    assert got == dict(expect_counts)


def test_doc_token_counts_sum_to_corpus_total(spark):
    corpus = synth_bpe_corpus(spark, 50)
    merges = learn_bpe(corpus, n_merges=8)
    per_doc = bpe_doc_token_counts(corpus, merges)
    assert per_doc.count() == 50
    total = per_doc.agg(F.sum("n_bpe_tokens")).collect()[0][0]
    corpus_total = bpe_token_counts(corpus, merges).agg(
        F.sum("total_cnt")
    ).collect()[0][0]
    assert total == corpus_total > 0


def test_merge_store_round_trip_and_missing_store_loud(spark, tmp_path):
    from pyspark.errors import AnalysisException

    from anomaly_detector_spark.operators.bpe import load_merges, save_merges

    corpus = synth_bpe_corpus(spark, 50)
    merges = learn_bpe(corpus, n_merges=8)
    store = str(tmp_path / "tokenizer")
    save_merges(spark, merges, store)
    assert load_merges(spark, store) == merges
    # tokenizing with the reloaded table is bit-identical
    a = {r["token"]: r["total_cnt"] for r in bpe_token_counts(corpus, merges).collect()}
    b = {
        r["token"]: r["total_cnt"]
        for r in bpe_token_counts(corpus, load_merges(spark, store)).collect()
    }
    assert a == b
    import pytest

    with pytest.raises(AnalysisException):
        load_merges(spark, str(tmp_path / "absent"))
