"""Operator tests: dedup family, similarity search, text analysis,
multimodal plumbing, synth determinism."""

import pytest
from pyspark.sql import functions as F

from anomaly_detector_spark.functions.hashing import sha256_oracle, with_content_sha
from anomaly_detector_spark.functions.timeparse import tolerant_timestamp
from anomaly_detector_spark.operators.dedup import (
    exact_dedup,
    exact_dup_groups,
    jaccard_pairs,
    minhash_lsh_candidates,
    simhash_near_dups,
    with_simhash64,
    word_shingles,
)
from anomaly_detector_spark.operators.multimodal import extract_features, synth_media
from anomaly_detector_spark.operators.similarity import brute_force_topk, lsh_topk
from anomaly_detector_spark.operators.text import (
    bpe_ish_token_count,
    quality_score,
    token_count,
    with_lang_id,
    with_text_stats,
)
from anomaly_detector_spark.synth import DRIFT_LANG, MEGA_REPO, synth_files


# ------------------------------------------------------------------ synth

def test_synth_deterministic_and_planted(spark):
    a = synth_files(spark, 5000).collect()
    b = synth_files(spark, 5000).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    rows = a
    n = len(rows)
    mega = sum(1 for r in rows if r.repo == MEGA_REPO)
    assert 0.4 < mega / n < 0.6  # skewed mega-repo
    nulls = sum(1 for r in rows if r.content is None)
    assert 0.001 < nulls / n < 0.02
    unknown = sum(1 for r in rows if r.lang in ("klingon", "brainfuck", ""))
    assert 0.003 < unknown / n < 0.03
    keys = [(r.repo, r.path, r.commit) for r in rows]
    assert len(set(keys)) < len(keys)  # planted duplicate keys
    drift_lens = [len(r.content) for r in rows if r.lang == DRIFT_LANG and r.content]
    other_lens = [len(r.content) for r in rows if r.lang == "python" and r.content]
    assert sum(drift_lens) / len(drift_lens) > 2 * sum(other_lens) / len(other_lens)


# ------------------------------------------------------------------ dedup

def test_exact_dedup(spark):
    df = spark.createDataFrame(
        [(1, "same text"), (2, "same text"), (3, "other")], "doc_id long, text string"
    )
    surv = exact_dedup(df).collect()
    assert {r.doc_id for r in surv} == {1, 3}
    groups = exact_dup_groups(df).collect()
    assert len(groups) == 1 and groups[0]["n_copies"] == 2 and groups[0]["keep_id"] == 1


def test_minhash_finds_near_dup(spark):
    base = "the quick brown fox jumps over the lazy dog again and again " * 5
    near = base.replace("lazy", "sleepy")
    other = "completely different content about spark and distributed joins " * 5
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, other)], "doc_id long, text string"
    )
    cand = minhash_lsh_candidates(df, num_hashes=64, bands=16)
    pairs = {(r.id_a, r.id_b) for r in cand.collect()}
    assert (1, 2) in pairs
    assert (1, 3) not in pairs and (2, 3) not in pairs
    verified = jaccard_pairs(df, cand, threshold=0.5).collect()
    assert {(r.id_a, r.id_b) for r in verified} == {(1, 2)}
    jac = verified[0]["jaccard"]
    assert 0.5 < jac < 1.0


def test_affine_draw_matches_python_wrapping_multiply(spark):
    """The 32-bit-lane ANSI-safe multiply must equal (a*h mod 2^64) xor b."""
    from anomaly_detector_spark.operators.dedup import (
        _M64,
        _affine_draw,
        _signed64,
        _splitmix64,
    )

    def py_affine(i, h, seed):
        a = (_splitmix64(seed * 0x10001 + 2 * i) & 0x7FFFFFFF) | 1
        b = _splitmix64(seed * 0x10001 + 2 * i + 1)
        return _signed64(((a * (h & _M64)) & _M64) ^ b)

    vals = [0, 1, -1, 7, -7, 2**63 - 1, -(2**63), 123456789012345, -98765432109876]
    df = spark.createDataFrame([(v,) for v in vals], "h long")
    for i in (0, 3, 63):
        got = [r[0] for r in df.select(_affine_draw(i, F.col("h"), seed=1)).collect()]
        want = [py_affine(i, v, 1) for v in vals]
        assert got == want, f"draw {i}: {got} != {want}"
    # bijectivity on a block: distinct inputs -> distinct outputs
    big = spark.range(0, 10_000).select((F.col("id") * 7919 - 5000).alias("h"))
    assert big.select(_affine_draw(5, F.col("h"), seed=1).alias("d")).distinct().count() == 10_000


def test_minhash_affine_mode_finds_near_dup(spark):
    base = "the quick brown fox jumps over the lazy dog again and again " * 5
    near = base.replace("lazy", "sleepy")
    other = "completely different content about spark and distributed joins " * 5
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, other)], "doc_id long, text string"
    )
    cand = minhash_lsh_candidates(df, num_hashes=64, bands=16, hash_fn="affine")
    pairs = {(r.id_a, r.id_b) for r in cand.collect()}
    assert (1, 2) in pairs
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_jaccard_exact_value(spark):
    df = spark.createDataFrame([(1, "a b c d"), (2, "a b c e")], "doc_id long, text string")
    cand = spark.createDataFrame([(1, 2, 1)], "id_a long, id_b long, n_bands int")
    out = jaccard_pairs(df, cand, shingle_k=2, threshold=0.0).collect()
    # word-2-shingles: {a b, b c, c d} vs {a b, b c, c e} → J = 2/4
    assert out[0]["jaccard"] == pytest.approx(0.5)


def test_simhash_identical_and_near(spark):
    base = "one two three four five six seven eight nine ten " * 3
    df = spark.createDataFrame(
        [(1, base), (2, base), (3, base.replace("ten", "zen")), (4, "unrelated words entirely xyz")],
        "doc_id long, text string",
    )
    sigs = {r.doc_id: r.simhash for r in with_simhash64(df).collect()}
    assert sigs[1] == sigs[2]
    pairs = {(r.id_a, r.id_b): r.hamming for r in simhash_near_dups(df, max_hamming=10).collect()}
    assert pairs[(1, 2)] == 0
    assert (1, 3) in pairs


# -------------------------------------------------------------- similarity

def test_brute_force_topk_self_first(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 3).select(F.col("vec_id").alias("query_id"), "embedding")
    top = brute_force_topk(emb, q, k=3).collect()
    rank1 = {r.query_id: r for r in top if r.rank == 1}
    for qid, r in rank1.items():
        assert r.vec_id == qid  # self-similarity wins
        assert r.score == pytest.approx(1.0, abs=1e-6)


def test_lsh_topk_recall(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 10).select(F.col("vec_id").alias("query_id"), "embedding")
    exact = {(r.query_id, r.vec_id) for r in brute_force_topk(emb, q, k=3).collect()}
    approx = {(r.query_id, r.vec_id) for r in lsh_topk(emb, q, k=3, dim=64, bits=4, tables=8).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5  # ANN quality floor at tiny scale (random vectors)


# ------------------------------------------------------------------- text

def test_token_count_edges(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "a"), (4, "a  b\tc"), (5, None)], "id long, text string"
    )
    out = {r.id: r.n for r in df.select("id", token_count("text").alias("n")).collect()}
    assert out == {1: 0, 2: 0, 3: 1, 4: 3, 5: 0}


def test_bpe_ish_tokens(spark):
    df = spark.createDataFrame([(1, "ab1 c! d,e")], "id long, text string")
    n = df.select(bpe_ish_token_count("text").alias("n")).collect()[0]["n"]
    # ab1, c, !, d, ',', e
    assert n == 6


def test_text_stats_and_quality(spark):
    df = spark.createDataFrame(
        [(1, "the quick brown fox and the dog run fast today")], "id long, text string"
    )
    r = quality_score(with_text_stats(df, "text"), "text").collect()[0]
    assert r["n_tokens"] == 10
    assert r["stopword_ratio"] == pytest.approx(0.3)  # the, the, and = 3 of 10
    assert 0.0 <= r["quality_score"] <= 1.0


def test_lang_id(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat and the dog is in that house for now"),
            (2, "der hund und die katze ist nicht hier"),
            (3, "qqq zzz xxx"),
        ],
        "id long, text string",
    )
    out = {r.id: r.lang_id for r in with_lang_id(df, "text").collect()}
    assert out[1] == "en" and out[2] == "de" and out[3] == "und"


# -------------------------------------------------------------- functions

def test_sha256_matches_hashlib(spark):
    df = spark.createDataFrame([(1, "hello"), (2, None), (3, "")], "id long, content string")
    rows = with_content_sha(df).collect()
    for r in rows:
        assert r.content_sha256 == sha256_oracle(r.content)


def test_tolerant_timestamp(spark):
    df = spark.createDataFrame(
        [
            (1, "1577836800000"),  # 13-digit ms
            (2, "1577836800"),  # 10-digit s
            (3, "2020-01-01 00:00:00"),  # ISO
            (4, "1577836800000000000"),  # 19-digit ns
        ],
        "id long, t string",
    )
    out = {r.id: r.ts for r in df.select("id", tolerant_timestamp("t").alias("ts")).collect()}
    assert len({str(v) for v in out.values()}) == 1  # all the same instant


# ------------------------------------------------------------- multimodal

def test_multimodal_features(spark):
    media = synth_media(spark, 50)
    feats = extract_features(media).collect()
    assert len(feats) == 50
    for r in feats:
        assert r.n_bytes > 0
        fs = [r[f"f{i}"] for i in range(8)]
        assert abs(sum(fs) - 1.0) < 0.01
        # payload bytes are ascii hex chars: only buckets 1 ('0'-'9')
        # and 3 ('a'-'f') can be populated
        assert fs[0] == fs[2] == fs[4] == fs[5] == fs[6] == fs[7] == 0.0
    again = {r.media_id: tuple(r[f"f{i}"] for i in range(8)) for r in extract_features(media).collect()}
    assert again == {r.media_id: tuple(r[f"f{i}"] for i in range(8)) for r in feats}  # deterministic


# ------------------------------------------------------- embedding near-dups

def test_embedding_near_dups_finds_planted_pair(spark):
    import numpy as np

    from anomaly_detector_spark.operators.dedup import embedding_near_dups

    rng = np.random.default_rng(3)
    vecs = rng.normal(size=(50, 64))
    vecs[7] = vecs[3] + rng.normal(scale=0.01, size=64)  # near-duplicate of 3
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    out = embedding_near_dups(df, threshold=0.95, dim=64, bits=8, tables=6).collect()
    pairs = {(r["id_a"], r["id_b"]) for r in out}
    assert (3, 7) in pairs
    assert all(r["score"] >= 0.95 for r in out)


def test_ivf_topk_agrees_with_brute_force_top1(spark):
    import numpy as np

    from anomaly_detector_spark.operators.similarity import ivf_topk

    rng = np.random.default_rng(5)
    vecs = rng.normal(size=(80, 64))
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    q = df.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    # self-query: top-1 must be the vector itself (score 1.0), any nprobe
    out = ivf_topk(df, q, k=1, n_cells=8, nprobe=8).collect()
    assert {(r["query_id"], r["vec_id"]) for r in out} == {(i, i) for i in range(3)}


# ------------------------------------------------------------- winnowing

def test_winnow_fingerprints_shared_run_guarantee(spark):
    # winnowing guarantee: two docs sharing a run of window+k-1 = 6+
    # tokens share at least one fingerprint
    from anomaly_detector_spark.operators.text import winnow_fingerprints

    shared = "alpha beta gamma delta epsilon zeta eta theta"
    df = spark.createDataFrame(
        [
            (1, "intro words here " + shared + " tail one"),
            (2, "completely different prefix " + shared),
            (3, "no overlap with the others at all whatsoever"),
        ],
        "doc_id long, text string",
    )
    fps = winnow_fingerprints(df, "text", "doc_id").collect()
    by_doc = {}
    for r in fps:
        by_doc.setdefault(r["doc_id"], set()).add(r["fingerprint"])
    assert by_doc[1] & by_doc[2]          # shared run -> shared fingerprint
    assert not (by_doc[1] & by_doc[3])    # disjoint docs -> disjoint sets


def test_containment_pairs_finds_embedded_doc(spark):
    # a small doc wholesale-embedded in a much larger one: Jaccard is
    # tiny (the symmetric measures miss it) but containment == 1.0
    from anomaly_detector_spark.operators.dedup import containment_pairs

    small = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    big_filler = " ".join(f"filler{i} word{i} token{i}" for i in range(40))
    rows = [
        (1, small),
        (2, big_filler + " " + small + " trailing tail words here"),
        (3, "a corpus document about entirely unrelated matters " * 5),
        (4, "too short"),  # < window+k-1 tokens -> no fingerprints
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {(r["id_a"], r["id_b"]): r for r in containment_pairs(df, threshold=0.8).collect()}
    assert (1, 2) in out
    r = out[(1, 2)]
    assert r["containment"] == 1.0 and r["shared"] == r["n_a"] and r["n_a"] < r["n_b"]
    assert all(p == (1, 2) for p in out)  # nothing else pairs
    # the same pair is invisible to symmetric Jaccard at its usual bar
    cand = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    assert jaccard_pairs(df, cand, threshold=0.7).count() == 0

    # plan-only mode agrees with the checkpointed default
    out2 = {
        (r["id_a"], r["id_b"]): r["containment"]
        for r in containment_pairs(df, threshold=0.8, materialize=False).collect()
    }
    assert set(out2) == set(out) and out2[(1, 2)] == 1.0


def test_containment_pairs_partitioning_invariance(spark):
    # pair set and scores must not depend on how the input is split
    from anomaly_detector_spark.operators.dedup import containment_pairs

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [(i, f"doc {i} filler " + " ".join(f"w{i}_{j}" for j in range(10))
             + (" " + base if i % 3 == 0 else "")) for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    def pairs(frame):
        return sorted(
            (r["id_a"], r["id_b"], r["shared"], r["containment"])
            for r in containment_pairs(frame, threshold=0.15).collect()
        )

    a = pairs(df)
    b = pairs(df.repartition(7, "doc_id"))
    c = pairs(df.coalesce(1))
    assert a == b == c and len(a) > 0


def test_containment_pairs_posting_cap_drops_boilerplate(spark):
    # a license header shared by EVERY doc creates a mega posting list;
    # with the cap below the corpus size those fingerprints are dropped
    # and header-only overlap produces no pair
    from anomaly_detector_spark.operators.dedup import containment_pairs

    header = "licensed under the apache license version two point zero see notice"
    rows = [(i, header + f" unique body {i} " + " ".join(f"w{i}_{j}" for j in range(12)))
            for i in range(8)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # uncapped: every pair shares the header fingerprints
    assert containment_pairs(df, threshold=0.3, max_posting=100).count() > 0
    # capped at < corpus size: header postings dropped, no pair survives
    assert containment_pairs(df, threshold=0.3, max_posting=7).count() == 0


def test_winnow_fingerprints_empty_doc(spark):
    from anomaly_detector_spark.operators.text import winnow_fingerprints

    df = spark.createDataFrame([(1, ""), (2, None), (3, "one two")], "doc_id long, text string")
    assert winnow_fingerprints(df, "text", "doc_id").count() == 0


def test_pure_python_xxh64_matches_spark(spark):
    # the independent XXH64 oracle (functions/hashing.py) must stay
    # bit-exact with F.xxhash64 across every length class: empty,
    # sub-4, sub-8, sub-32, exact-stripe, multi-stripe
    from anomaly_detector_spark.functions.hashing import xxh64

    cases = ["", "a", "abc", "abcd", "abcdefg", "abcdefgh", "x" * 31, "y" * 32,
             "z" * 33, "w" * 100, "the quick brown fox " * 10, "unicode: éü中文"]
    df = spark.createDataFrame([(c,) for c in cases], "s string")
    got = [r[0] for r in df.select(F.xxhash64("s")).collect()]
    assert got == [xxh64(c.encode("utf-8")) for c in cases]


def test_frame_sample_plan(spark):
    # one row per sampled frame timestamp for video rows only, distributed
    # via sequence+explode (no driver loop)
    from anomaly_detector_spark.operators.multimodal import frame_sample_plan, synth_media

    media = synth_media(spark, 30)
    frames = frame_sample_plan(media, every_ms=1000).collect()
    vids = {r["media_id"]: r["meta"]["duration_ms"] for r in media.collect() if r["kind"] == "video"}
    assert vids, "synth should contain video rows"
    by_id = {}
    for r in frames:
        by_id.setdefault(r["media_id"], []).append(r["frame_ts_ms"])
    assert set(by_id) == set(vids)
    for mid, ts in by_id.items():
        assert len(ts) == max(vids[mid] // 1000, 1)
        assert sorted(ts) == [i * 1000 for i in range(len(ts))]


def test_bigram_perplexity_hand_computed(spark):
    """Self-trained add-k bigram LM on a 3-doc corpus, checked against
    the formula evaluated independently in plain Python."""
    import math

    from anomaly_detector_spark.operators.text import bigram_perplexity

    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c"), (3, "x")],  # doc 3: no bigrams
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in bigram_perplexity(df, alpha=0.1).collect()}
    # model over both docs: c12 = {(a,b):3, (b,a):1, (b,c):1};
    # c1 = {a:3, b:3, c:1, x:1}; V = 4
    c12 = {("a", "b"): 3, ("b", "a"): 1, ("b", "c"): 1}
    c1 = {"a": 3, "b": 3, "c": 1, "x": 1}
    v = 4

    def llm(w1, w2, _c12=None, _c1=None, _v=None):
        # integer micro-nats, exactly the operator's quantization
        from decimal import ROUND_HALF_UP, Decimal

        p = ((_c12 or c12).get((w1, w2), 0) + 0.1) / ((_c1 or c1).get(w1, 0) + 0.1 * (_v or v))
        return int(Decimal(math.log(p) * 1e6).quantize(0, ROUND_HALF_UP))

    for doc_id, bgs in ((1, [("a", "b"), ("b", "a"), ("a", "b")]), (2, [("a", "b"), ("b", "c")])):
        nll = round(-sum(llm(*b) for b in bgs) / (len(bgs) * 1e6), 6)
        assert out[doc_id]["n_bigrams"] == len(bgs)
        assert out[doc_id]["nll"] == nll
        assert out[doc_id]["ppl"] == round(math.exp(nll), 4)
    assert 3 not in out
    # external reference model: unseen bigrams/histories score with 0 counts
    ref = spark.createDataFrame([(10, "a b")], "doc_id long, text string")
    out2 = {r["doc_id"]: r for r in bigram_perplexity(df, model_df=ref, alpha=0.1).collect()}
    # model: c12={(a,b):1}, c1={a:1,b:1}, V=2
    rc12, rc1, rv = {("a", "b"): 1}, {"a": 1, "b": 1}, 2
    lab = llm("a", "b", rc12, rc1, rv)
    lba = llm("b", "a", rc12, rc1, rv)  # unseen bigram
    lbc = llm("b", "c", rc12, rc1, rv)  # unseen bigram
    nll1 = round(-(2 * lab + lba) / (3 * 1e6), 6)
    nll2 = round(-(lab + lbc) / (2 * 1e6), 6)
    assert out2[1]["nll"] == nll1 and out2[2]["nll"] == nll2


def test_tfidf_topk_hand_computed(spark):
    import math

    from anomaly_detector_spark.operators.text import tfidf_topk

    docs = spark.createDataFrame(
        [
            (1, "apple banana apple"),
            (2, "banana cherry"),
            (3, "cherry cherry durian"),
            (4, ""),           # tokenless -> no rows
        ],
        "doc_id long, text string",
    )
    out = tfidf_topk(docs, "text", "doc_id", k=2)
    rows = {(r["doc_id"], r["term"]): r for r in out.collect()}
    n = 4  # count(DISTINCT doc_id) includes the empty doc

    def idf(df_t):
        return math.log((n + 1.0) / (df_t + 1.0)) + 1.0

    # doc 1: apple tf=2 df=1, banana tf=1 df=2
    assert rows[(1, "apple")]["tf"] == 2
    assert rows[(1, "apple")]["score"] == round(2 * idf(1), 6)
    assert rows[(1, "apple")]["rank"] == 1
    assert rows[(1, "banana")]["rank"] == 2
    # doc 3: cherry tf=2 df=2 -> 2*idf(2)=3.0217.. beats durian tf=1 df=1
    # -> 1*idf(1)=1.9163..
    assert rows[(3, "cherry")]["rank"] == 1
    assert rows[(3, "cherry")]["score"] == round(2 * idf(2), 6)
    assert rows[(3, "durian")]["rank"] == 2
    # empty doc emits nothing; every doc capped at k=2
    assert not any(d == 4 for d, _ in rows)
    assert len(rows) == 6


def test_kmeans_assign_separable_clusters(spark):
    from anomaly_detector_spark.operators.similarity import kmeans_assign

    # three well-separated directions in 4-d; cosine k-means must put
    # each group in one cluster regardless of vector magnitude
    import itertools

    groups = {
        0: [1.0, 0.05, 0.0, 0.0],
        1: [0.0, 1.0, 0.05, 0.0],
        2: [0.0, 0.0, 0.05, 1.0],
    }
    rows = []
    for g, base in groups.items():
        for i in range(10):
            scale = 0.5 + 0.3 * i
            jit = 0.01 * (i % 3)
            rows.append((g * 10 + i, [scale * (b + jit) for b in base]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = kmeans_assign(df, k=3, n_iter=3).collect()
    by_group = {}
    for r in out:
        by_group.setdefault(r["vec_id"] // 10, set()).add(r["cluster"])
    # each source group lands in exactly one cluster, and the three
    # clusters are distinct
    assert all(len(cl) == 1 for cl in by_group.values()), by_group
    assert len(set(itertools.chain(*by_group.values()))) == 3


def test_kmeans_assign_partitioning_invariant(spark):
    from anomaly_detector_spark.operators.similarity import kmeans_assign

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    a = sorted(
        (r["vec_id"], r["cluster"], r["sim"])
        for r in kmeans_assign(emb.repartition(1), k=8, n_iter=2).collect()
    )
    b = sorted(
        (r["vec_id"], r["cluster"], r["sim"])
        for r in kmeans_assign(emb.repartition(7), k=8, n_iter=2).collect()
    )
    assert a == b


def test_two_phase_topk_equals_single_window(spark):
    """The two-phase form must be partitioning-invariant and identical
    to the naive single-window top-k."""
    from pyspark.sql import Window

    from anomaly_detector_spark.operators.similarity import two_phase_topk

    rows = [(q, i, float((q * 7 + i * 13) % 29)) for q in range(3) for i in range(50)]
    df = spark.createDataFrame(rows, "query_id long, vec_id long, score double")
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("vec_id").asc())
    naive = sorted(
        (r["query_id"], r["vec_id"], r["rank"])
        for r in df.withColumn("rank", F.row_number().over(w)).filter("rank <= 5").collect()
    )
    for nparts in (1, 4, 16):
        got = sorted(
            (r["query_id"], r["vec_id"], r["rank"])
            for r in two_phase_topk(df.repartition(nparts), 5).collect()
        )
        assert got == naive, nparts


def test_pq_topk_self_match_and_invariance(spark):
    """Corpus-drawn queries must retrieve themselves at rank 1 (exact
    re-rank guarantees it as long as ADC keeps self in the candidate
    set), and the result must not depend on input partitioning."""
    from anomaly_detector_spark.operators.similarity import pq_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.filter("vec_id < 5")
    out = pq_topk(emb, q, k=5, query_id_col="vec_id").collect()
    top1 = {r["query_id"]: r["vec_id"] for r in out if r["rank"] == 1}
    assert top1 == {i: i for i in range(5)}
    scores = {(r["query_id"], r["rank"]): (r["vec_id"], r["adc"], r["score"]) for r in out}
    out7 = pq_topk(emb.repartition(7), q, k=5, query_id_col="vec_id").collect()
    scores7 = {(r["query_id"], r["rank"]): (r["vec_id"], r["adc"], r["score"]) for r in out7}
    assert scores == scores7


def test_pq_training_reduces_quantization_error(spark):
    """One Lloyd round on the codebook must not increase total ADC
    self-distance (it minimizes within-cell L2 by construction)."""
    from anomaly_detector_spark.operators.similarity import pq_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.filter("vec_id < 5")

    def self_adc(train_iters):
        out = pq_topk(
            emb, q, k=5, train_iters=train_iters, query_id_col="vec_id"
        ).filter("query_id = vec_id")
        return sum(r["adc"] for r in out.collect())

    assert self_adc(1) < self_adc(0)


def test_embedding_outliers_flags_far_point(spark):
    from anomaly_detector_spark.operators.similarity import embedding_outliers

    # two tight directional clusters plus one point assigned to the first
    # cluster but angularly far from everyone in it
    rows = []
    for i in range(12):
        jit = 0.002 * (i % 4)
        rows.append((i, [1.0, jit, 0.0, 0.0]))          # cluster around e1
        rows.append((100 + i, [0.0, jit, 1.0, 0.0]))    # cluster around e3
    rows.append((999, [0.7, 0.7, 0.05, 0.0]))           # 45-deg off e1: far
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r["vec_id"]: r for r in embedding_outliers(df, k=2, n_iter=3).collect()}
    assert len(out) == 25
    assert out[999]["is_outlier"] is True
    assert out[999]["z_score"] > 3.0
    # nobody inside either tight cluster is flagged
    assert not any(r["is_outlier"] for vid, r in out.items() if vid != 999)
    # partitioning invariance of flags and z-scores
    out7 = {
        r["vec_id"]: (r["di"], r["z_score"], r["is_outlier"])
        for r in embedding_outliers(df.repartition(7), k=2, n_iter=3).collect()
    }
    assert out7 == {v: (r["di"], r["z_score"], r["is_outlier"]) for v, r in out.items()}


def test_incremental_lsh_matches_full_batch(spark, tmp_path):
    """Two ingest runs against the band-row store == one full-batch LSH."""
    from anomaly_detector_spark.operators.dedup import incremental_lsh_candidates

    base = "the quick brown fox jumps over the lazy dog again and again " * 5
    other = "completely different content about spark and distributed joins " * 5
    third = "yet another unrelated snippet concerning parquet footers and stats " * 5
    run1 = [(1, base), (2, base.replace("lazy", "sleepy")), (3, other)]
    run2 = [(4, base.replace("dog", "cat")), (5, other.replace("joins", "scans")), (6, third)]
    df1 = spark.createDataFrame(run1, "doc_id long, text string")
    df2 = spark.createDataFrame(run2, "doc_id long, text string")
    store = str(tmp_path / "bands")

    def pairset(df):
        return {(r.id_a, r.id_b, r.n_bands) for r in df.collect()}

    p1 = pairset(incremental_lsh_candidates(spark, df1, store, "r1"))
    p2 = pairset(incremental_lsh_candidates(spark, df2, store, "r2"))
    full = pairset(minhash_lsh_candidates(df1.unionByName(df2)))
    assert p1 | p2 == full
    assert p1 & p2 == set()
    # run-2 pairs touching run-1 docs are tagged new_old
    kinds = {
        (r.id_a, r.id_b): r.pair_kind
        for r in incremental_lsh_candidates(spark, df2, store, "r2b", commit=False).collect()
    }
    for (a, b), kind in kinds.items():
        assert kind == ("new_new" if a >= 4 else "new_old"), (a, b, kind)

    # crash-retry: re-appending run 2's rows must not change a later run
    p2_retry = pairset(incremental_lsh_candidates(spark, df2, store, "r2"))
    assert p2_retry == p2
    df3 = spark.createDataFrame([(7, base.replace("fox", "hen"))], "doc_id long, text string")
    p3 = pairset(incremental_lsh_candidates(spark, df3, store, "r3"))
    full3 = pairset(minhash_lsh_candidates(df1.unionByName(df2).unionByName(df3)))
    assert p1 | p2 | p3 == full3


def test_incremental_containment_matches_full_batch(spark, tmp_path):
    """Two ingest runs against the fingerprint store == one full-batch
    containment_pairs (the incremental-LSH parity claim, winnow form)."""
    from anomaly_detector_spark.operators.dedup import (
        containment_pairs,
        incremental_containment_pairs,
    )

    small = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    fill1 = " ".join(f"f{i} tok{i}" for i in range(25))
    fill2 = " ".join(f"g{i} word{i}" for i in range(25))
    run1 = [(1, small), (2, fill1)]
    # run 2: doc 3 embeds run-1's doc 1 (cross-run pair), doc 4 unrelated
    run2 = [(3, fill2 + " " + small), (4, "nothing shared here at all " * 4)]
    df1 = spark.createDataFrame(run1, "doc_id long, text string")
    df2 = spark.createDataFrame(run2, "doc_id long, text string")
    store = str(tmp_path / "fps")
    TH = 0.8

    def pairset(df):
        return {(r.id_a, r.id_b, r.shared, r.n_a, r.n_b, r.containment)
                for r in df.collect()}

    p1 = pairset(incremental_containment_pairs(spark, df1, store, "r1", threshold=TH))
    p2 = pairset(incremental_containment_pairs(spark, df2, store, "r2", threshold=TH))
    full = pairset(containment_pairs(df1.unionByName(df2), threshold=TH))
    assert p1 | p2 == full
    assert p1 & p2 == set()
    # the cross-run embedded pair surfaces in run 2 as new_old
    kinds = {
        (r.id_a, r.id_b): r.pair_kind
        for r in incremental_containment_pairs(
            spark, df2, store, "r2b", threshold=TH, commit=False
        ).collect()
    }
    assert kinds.get((1, 3)) == "new_old"
    # crash-retry with the same run_id changes nothing downstream
    p2_retry = pairset(
        incremental_containment_pairs(spark, df2, store, "r2", threshold=TH)
    )
    assert p2_retry == p2
    df3 = spark.createDataFrame(
        [(5, "prefix words " + small + " suffix")], "doc_id long, text string"
    )
    p3 = pairset(incremental_containment_pairs(spark, df3, store, "r3", threshold=TH))
    full3 = pairset(
        containment_pairs(df1.unionByName(df2).unionByName(df3), threshold=TH)
    )
    assert p1 | p2 | p3 == full3


def test_embedding_drift_planted_shift(spark):
    import numpy as np

    from anomaly_detector_spark.operators.similarity import embedding_drift

    rng = np.random.default_rng(5)
    dim = 16
    rows = []
    for i in range(300):
        v = rng.normal(0, 0.2, dim)
        rows.append((i, "stable_a", [float(x) for x in v]))
    for i in range(300, 600):
        v = rng.normal(0, 0.2, dim)
        rows.append((i, "stable_b", [float(x) for x in v]))
    for i in range(600, 900):
        v = rng.normal(0.35, 0.2, dim)  # shifted mean: projections move
        rows.append((i, "shifted", [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, label string, embedding array<double>")
    out = {r["partition_key"]: r for r in
           embedding_drift(df, "label", dim=dim, n_planes=6, bucket_micro=300_000).collect()}
    assert out["shifted"]["psi"] > 2 * max(out["stable_a"]["psi"], out["stable_b"]["psi"])
    assert out["shifted"]["n_obs"] == 300
    # partitioning invariance: integer-micro buckets + 6dp psi
    out2 = {r["partition_key"]: r for r in
            embedding_drift(df.repartition(17), "label", dim=dim, n_planes=6,
                            bucket_micro=300_000).collect()}
    assert {k: (v["psi"], v["worst_plane"]) for k, v in out.items()} == \
           {k: (v["psi"], v["worst_plane"]) for k, v in out2.items()}


def test_embedding_drift_check_config_plane(spark):
    import numpy as np

    from anomaly_detector_spark.plans.config import suite_from_config

    rng = np.random.default_rng(9)
    rows = [(i, "a" if i < 200 else "b",
             [float(x) for x in rng.normal(0.5 if i >= 200 else 0.0, 0.15, 8)])
            for i in range(400)]
    rows += [(400, "tiny", [0.0] * 8)]  # below min_rows -> SKIPPED
    df = spark.createDataFrame(rows, "vec_id long, label string, embedding array<double>")
    suite = suite_from_config(
        {
            "checks": [
                {"check": "embedding_drift", "partition_col": "label", "min_rows": 25,
                 "dim": 8, "n_planes": 4, "bucket_micro": 200000, "max_psi": 0.3}
            ]
        }
    )
    res = suite[0].run(df)
    v = {r["partition_key"]: r["verdict"] for r in res.verdicts.collect()}
    # a and b are each half the pool and far apart: both drift vs pooled
    assert v["a"] == "FAIL" and v["b"] == "FAIL" and v["tiny"] == "SKIPPED"


def test_embedding_drift_external_baseline_catches_global_shift(spark):
    import numpy as np

    from anomaly_detector_spark.operators.similarity import (
        embedding_drift,
        embedding_histogram,
    )

    rng = np.random.default_rng(3)
    dim = 8

    def corpus(mean):
        return spark.createDataFrame(
            [(i, f"p{i % 3}", [float(x) for x in rng.normal(mean, 0.15, dim)])
             for i in range(600)],
            "vec_id long, label string, embedding array<double>",
        )

    yesterday = corpus(0.0)
    today = corpus(0.45)  # model bump: EVERY partition moves together
    kw = dict(dim=dim, n_planes=4, bucket_micro=200_000)
    # pooled in-batch baseline is blind: everyone still matches the pool
    pooled = embedding_drift(today, "label", **kw).collect()
    assert all(r["psi"] < 0.1 for r in pooled)
    # yesterday's persisted O(planes x buckets) histogram catches it
    store = embedding_histogram(yesterday, **kw)
    vs_store = embedding_drift(today, "label", baseline=store, **kw).collect()
    assert all(r["psi"] > 1.0 for r in vs_store)
    # and yesterday vs its own store is clean
    clean = embedding_drift(yesterday, "label", baseline=store, **kw).collect()
    assert all(r["psi"] < 0.1 for r in clean)


def test_ann_recall_harness(spark):
    # exact self-queries: the query vector itself is always a hit (cos 1.0),
    # so recall >= 1/k for every method; rows exist for every (method, query)
    from anomaly_detector_spark.operators.similarity import ann_recall

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = ann_recall(
        emb, queries, k=5,
        lsh_params={"dim": 64, "bits": 10, "tables": 4},
        ivf_params={"n_cells": 16, "nprobe": 4},
    ).collect()
    assert len(out) == 8  # 4 queries x 2 methods, zero-hit rows included
    by = {(r["method"], r["query_id"]): r for r in out}
    for (m, q), r in by.items():
        assert 0.0 <= r["recall"] <= 1.0 and r["n_hits"] == round(r["recall"] * 5)
    # the ivf probe always covers the query's own cell -> self-hit
    assert all(by[("ivf", q)]["n_hits"] >= 1 for q in range(4))


def test_skeleton_dup_groups(spark):
    from anomaly_detector_spark.operators.dedup import skeleton, skeleton_dup_groups

    code = "def f(x):\n    return x + 1\n"
    reformatted = "def f(x):  \n\treturn x   + 1"          # whitespace churn
    commented = code + "# trailing comment\n// another\n/* block\ncomment */"
    rows = [
        (1, code), (2, reformatted), (3, commented),       # one skeleton group
        (10, "exact copy"), (11, "exact copy"),            # byte dups: excluded
        (20, "# only a comment\n   \n"),                   # empty skeleton
        (21, "/* nothing else */"),                        # empty skeleton
        (30, None),                                        # NULL excluded
        (40, 'print("has # inside")'),                     # mangled consistently
        (41, 'print("has # inside")   '),                  # ws variant of 40
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    sk = {r["doc_id"]: r["s"] for r in df.select("doc_id", skeleton().alias("s")).collect()}
    assert sk[1] == sk[2] == sk[3] == "deff(x):returnx+1"
    assert sk[20] == "" and sk[21] == ""
    assert sk[40] == sk[41] == 'print("has'  # heuristic: # in string mangles BOTH

    groups = skeleton_dup_groups(df, hash_fn="sha256").collect()
    by_keep = {r["keep_id"]: r for r in groups}
    assert set(by_keep) == {1, 40}
    assert by_keep[1]["n_files"] == 3 and by_keep[1]["n_variants"] == 3
    assert by_keep[40]["n_files"] == 2 and by_keep[40]["n_variants"] == 2
    # xxhash64 production mode: identical group structure
    prod = sorted(
        (r["keep_id"], r["n_files"], r["n_variants"])
        for r in skeleton_dup_groups(df, hash_fn="xxhash64").collect()
    )
    assert prod == [(1, 3, 3), (40, 2, 2)]


def test_skeleton_pairs_compose_into_clusters(spark):
    """Skeleton dup groups emit the canonical (id_a, id_b) pair shape,
    so they close into dup_clusters alongside every other family."""
    from anomaly_detector_spark.operators.corpus import dup_clusters
    from anomaly_detector_spark.operators.dedup import skeleton_dup_pairs

    rows = [
        (1, "def f(x):\n    return x\n"),
        (2, "def f(x):  \n\treturn x"),
        (3, "def f(x): return x  # same skeleton? no - spaces differ"),
        (10, "unrelated body one"),
        (11, "unrelated  body one"),   # ws variant of 10
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = skeleton_dup_pairs(df)
    got = sorted((r["id_a"], r["id_b"]) for r in pairs.collect())
    assert got == [(1, 2), (1, 3), (10, 11)]
    clusters = {r["doc_id"]: r for r in dup_clusters(pairs).collect()}
    assert clusters[2]["cluster_id"] == 1 and clusters[3]["cluster_id"] == 1
    assert clusters[1]["is_survivor"] and clusters[10]["is_survivor"]
    assert clusters[11]["cluster_size"] == 2


def test_vector_sanity_kinds(spark):
    from anomaly_detector_spark.operators.similarity import vector_kinds, vector_sanity

    nan, inf = float("nan"), float("inf")
    cases = [
        (0, [1.0, 2.0, 3.0], ""),
        (1, None, "null_vec"),
        (2, [1.0, 2.0], "wrong_dim"),
        (3, [nan, 2.0, 3.0], "has_nan"),
        (4, [inf, 2.0, 3.0], "has_inf"),
        (5, [-inf, 2.0, 3.0], "has_inf"),
        (6, [0.0, 0.0, 0.0], "zero_norm"),
        (7, [nan, 0.0], "wrong_dim,has_nan"),  # NaN never also zero_norm
    ]
    df = spark.createDataFrame(
        [(i, v) for i, v, _ in cases], "vec_id long, embedding array<double>"
    )
    got = {
        r["vec_id"]: r["k"]
        for r in df.select("vec_id", vector_kinds(dim=3).alias("k")).collect()
    }
    for i, _, want in cases:
        assert got[i] == want, (i, got[i], want)
    bad = {r["vec_id"] for r in vector_sanity(df, dim=3, id_col="vec_id").collect()}
    assert bad == {1, 2, 3, 4, 5, 6, 7}


def test_skeleton_membership_composition(spark):
    """Families compose: a skeleton-hash column + the bloom membership
    primitives give cross-run formatting-variant 'seen before' with no
    new machinery — run 2's reformatted copy of a run-1 file probes
    maybe_seen even though its bytes are new."""
    from anomaly_detector_spark.checks.membership import bloom_probe, bloom_words
    from anomaly_detector_spark.operators.dedup import skeleton
    from pyspark.sql import functions as F

    def with_sk(df):
        return df.withColumn("sk", F.xxhash64(skeleton("text")).cast("string"))

    run1 = with_sk(spark.createDataFrame(
        [(1, "python", "def f(x):\n    return x\n")], "doc_id long, lang string, text string"
    ))
    run2 = with_sk(spark.createDataFrame(
        [(2, "python", "def f(x):\treturn x"),       # reformatted: same skeleton
         (3, "python", "def g(y): return y+y")],      # genuinely new
        "doc_id long, lang string, text string",
    ))
    words = bloom_words(run1, "lang", ["sk"], n_bits=1 << 12, k=4)
    probed = {
        r["doc_id"]: r["maybe_seen"]
        for r in bloom_probe(run2, words, "lang", ["sk"], n_bits=1 << 12, k=4).join(
            run2.select(F.col("sk"), "doc_id"), "sk"
        ).collect()
    }
    assert probed == {2: True, 3: False}


def test_phash_near_dups_finds_planted_pairs_and_nothing_else(spark):
    # 20 planted one-byte near-copies among 500 payloads: dHash pairs at
    # hamming <= 2 (a one-byte edit touches exactly two comparisons);
    # unrelated sha-derived payloads sit near hamming 32 — the pigeonhole
    # block join must surface exactly the planted set.
    from anomaly_detector_spark.operators.multimodal import (
        phash_near_dups,
        synth_media,
        with_dhash,
    )

    media = synth_media(spark, 500, plant_every=25)
    got = {
        (r["media_id_a"], r["media_id_b"]): r["hamming"]
        for r in phash_near_dups(media, max_hamming=6, blocks=8).collect()
    }
    expected = {(k - 1, k) for k in range(24, 500, 25)}
    assert set(got) == expected
    assert all(h <= 2 for h in got.values())

    # signed-64 packing: the signature column is a plain long, and a
    # payload identical to another yields hamming 0 via xor
    sigs = {r["media_id"]: r["phash"] for r in with_dhash(media).collect()}
    assert all(isinstance(v, int) for v in sigs.values())
    # plant_every=None default unchanged: no near-dup pairs at all
    clean = phash_near_dups(synth_media(spark, 200), max_hamming=6, blocks=8)
    assert clean.count() == 0


def test_phash_pigeonhole_requires_enough_blocks(spark):
    import pytest as _pytest

    from anomaly_detector_spark.operators.multimodal import phash_near_dups, synth_media

    with _pytest.raises(ValueError):
        phash_near_dups(synth_media(spark, 10), max_hamming=8, blocks=8)


def test_phash_materialize_runs_decode_once_and_agrees(spark):
    # materialize=True checkpoints the (id, sig) frame: the pair plan
    # must contain ZERO MapInPandas nodes (decode ran once, eagerly) —
    # without it the self-join re-runs the Python kernel per side —
    # and both modes return identical pairs.
    from anomaly_detector_spark.operators.multimodal import phash_near_dups, synth_media

    media = synth_media(spark, 300, plant_every=25)
    mat = phash_near_dups(media, max_hamming=6, blocks=8)
    plan = mat._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" not in plan
    lazy = phash_near_dups(media, max_hamming=6, blocks=8, materialize=False)
    assert sorted(map(tuple, mat.collect())) == sorted(map(tuple, lazy.collect()))
