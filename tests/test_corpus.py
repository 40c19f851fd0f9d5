"""Corpus-prep operator tests: connected components / dup clustering,
deterministic stratified sampling, token-budget sharding, repetition."""

from pyspark.sql import Window
from pyspark.sql import functions as F

from anomaly_detector_spark.operators.corpus import (
    connected_components,
    dup_clusters,
    rate_to_hex_threshold,
    stratified_sample,
    token_budget_shards,
)
from anomaly_detector_spark.operators.text import repetition_stats


# ------------------------------------------------------ connected comps

def _cc_map(rows):
    return {r["node"]: r["cluster_id"] for r in rows}


def test_cc_star_and_chain(spark):
    # star {1..4}, chain {10..14} (diameter 4 — needs >1 round), pair {20,21}
    edges = [(1, 2), (1, 3), (1, 4), (10, 11), (11, 12), (12, 13), (13, 14), (21, 20)]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = _cc_map(connected_components(df).collect())
    assert got == {
        1: 1, 2: 1, 3: 1, 4: 1,
        10: 10, 11: 10, 12: 10, 13: 10, 14: 10,
        20: 20, 21: 20,
    }


def test_cc_merging_components(spark):
    # two stars bridged by one late edge — labels must propagate across
    edges = [(2, 1), (3, 1), (12, 11), (13, 11), (3, 13)]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = _cc_map(connected_components(df).collect())
    assert set(got.values()) == {1}
    assert set(got) == {1, 2, 3, 11, 12, 13}


def test_dup_clusters_sizes_and_survivors(spark):
    edges = [(1, 2), (2, 3), (7, 8)]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    rows = {r["doc_id"]: r for r in dup_clusters(df).collect()}
    assert rows[1]["cluster_size"] == 3 and rows[1]["is_survivor"]
    assert rows[2]["cluster_id"] == 1 and not rows[2]["is_survivor"]
    assert rows[7]["cluster_size"] == 2 and rows[7]["is_survivor"]
    assert not rows[8]["is_survivor"]
    assert set(rows) == {1, 2, 3, 7, 8}  # singletons absent by contract


# ------------------------------------------------------------- sampling

def test_rate_to_hex_threshold_bounds():
    assert rate_to_hex_threshold(0.0) == "00000000"
    assert rate_to_hex_threshold(1.0) == "g"  # above every hex digit
    assert rate_to_hex_threshold(0.5) == "80000000"


def test_stratified_sample_deterministic_and_rates(spark):
    df = spark.range(4000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "en").otherwise("de").alias("lang"),
    )
    rates = {"en": 0.5, "de": 0.1}
    a = {r["doc_id"] for r in stratified_sample(df, "lang", rates).collect()}
    # repartitioning must not change the surviving set
    b = {
        r["doc_id"]
        for r in stratified_sample(df.repartition(13), "lang", rates).collect()
    }
    assert a == b
    en = sum(1 for i in a if i % 2 == 0) / 2000
    de = sum(1 for i in a if i % 2 == 1) / 2000
    assert 0.44 < en < 0.56
    assert 0.06 < de < 0.14


def test_stratified_sample_default_rate_drops_unknown(spark):
    df = spark.createDataFrame([(1, "xx"), (2, "en")], "doc_id long, lang string")
    kept = stratified_sample(df, "lang", {"en": 1.0}).collect()
    assert [r["doc_id"] for r in kept] == [2]


# ------------------------------------------------------------- sharding

def test_token_budget_shards_matches_global_window(spark):
    df = spark.range(500).select(
        F.col("id").alias("doc_id"), (F.col("id") % 37 + 1).alias("w")
    )
    got = {
        r["doc_id"]: r["shard_id"]
        for r in token_budget_shards(df, "w", "doc_id", budget=100, group_size=8).collect()
    }
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
    ref = {
        r["doc_id"]: r["s"]
        for r in df.withColumn(
            "s", (F.coalesce(F.sum("w").over(w), F.lit(0)) / 100).cast("long")
        ).collect()
    }
    assert got == ref
    # every shard except possibly the last stays near the budget
    tot = (
        token_budget_shards(df, "w", "doc_id", budget=100, group_size=8)
        .groupBy("shard_id")
        .agg(F.sum("w").alias("t"))
        .collect()
    )
    last = max(r["shard_id"] for r in tot)
    assert all(r["t"] >= 64 for r in tot if r["shard_id"] != last)  # 37 = max w


def test_token_budget_shards_no_global_sort_shuffle(spark):
    """The scale contract: no window over the full frame. The only Sort
    without a partition key must sit on the O(n_groups) offsets frame."""
    df = spark.range(100).select(F.col("id").alias("doc_id"), F.lit(5).alias("w"))
    plan = token_budget_shards(df, "w", "doc_id", budget=50, group_size=10)._jdf \
        .queryExecution().optimizedPlan().toString()
    # exactly two Window operators: the O(n_groups) offsets window (fed
    # by the groupBy(_grp) Aggregate, so its input is tiny) and the
    # within-group window partitioned by _grp (bounded by group_size).
    assert plan.count("Window [") == 2
    assert "Aggregate [_grp" in plan            # offsets window input is aggregated
    assert ", [_grp" in plan                     # per-row window partitions by _grp


# ----------------------------------------------------------- repetition

def test_repetition_stats(spark):
    df = spark.createDataFrame(
        [
            (1, "a b c a b c a b c"),   # trigrams heavily repeated
            (2, "one two three four"),  # all unique
            (3, "x y"),                 # shorter than k
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in repetition_stats(df, "text", k=3).collect()}
    assert rows[1]["n_grams"] == 7 and rows[1]["n_unique"] == 3
    assert abs(rows[1]["rep_ratio"] - (1 - 3 / 7)) < 1e-6
    assert rows[2]["rep_ratio"] == 0.0 and rows[2]["n_unique"] == 2
    assert rows[3]["n_grams"] == 0 and rows[3]["rep_ratio"] == 0.0


# -------------------------------------------------------- decontaminate

def test_decontaminate_counts_and_short_docs(spark):
    from anomaly_detector_spark.operators.corpus import decontaminate

    bench = spark.createDataFrame([(100, "the quick brown fox jumps")], "doc_id long, text string")
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox runs"),   # shares 'the quick brown', 'quick brown fox'
            (2, "totally unrelated words here maybe"),
            (3, "fox"),                        # shorter than k: 0 grams
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in decontaminate(docs, bench, k=3, min_hits=2).collect()}
    assert rows[1]["matched"] == 2 and rows[1]["contaminated"]
    assert rows[1]["n_grams"] == 3
    assert abs(rows[1]["contam_frac"] - 2 / 3) < 1e-9
    assert rows[2]["matched"] == 0 and not rows[2]["contaminated"]
    assert rows[3]["n_grams"] == 0 and rows[3]["contam_frac"] == 0.0
    assert len(rows) == 3  # zero-gram docs retained


def test_decontaminate_broadcasts_bench(spark):
    from anomaly_detector_spark.operators.corpus import decontaminate

    bench = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    docs = spark.createDataFrame([(2, "a b c e")], "doc_id long, text string")
    plan = decontaminate(docs, bench, k=3)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan


# ---------------------------------------------------------- vocab top-k

def test_vocab_topk_counts_and_tiebreak(spark):
    from anomaly_detector_spark.operators.text import vocab_topk

    df = spark.createDataFrame(
        [(1, "b a b c"), (2, "a b  c"), (3, None), (4, "")],
        "doc_id long, text string",
    )
    rows = vocab_topk(df, "text", k=2).collect()
    assert [(r["token"], r["n"]) for r in rows] == [("b", 3), ("a", 2)]
    rows3 = vocab_topk(df, "text", k=3).collect()
    assert [(r["token"], r["n"]) for r in rows3] == [("b", 3), ("a", 2), ("c", 2)]


def _uf_components(edges):
    """Pure-python union-find reference."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # resolve to component minimum
    return {n: find(n) for n in parent}


def test_cc_random_graphs_match_union_find(spark):
    import random

    for seed in (7, 21, 99):
        rng = random.Random(seed)
        nodes = list(range(200))
        edges = [
            (rng.choice(nodes), rng.choice(nodes)) for _ in range(120)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        df = spark.createDataFrame(edges, "id_a long, id_b long")
        got = _cc_map(connected_components(df).collect())
        assert got == _uf_components(edges), f"seed {seed}"


def test_cc_long_chain_converges_logarithmically(spark):
    # a 200-node path has diameter 199; pointer jumping must close it
    # well inside the default 25-round budget (plain min-propagation
    # would need 199 rounds and previously returned WRONG labels).
    edges = [(i, i + 1) for i in range(199)]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = _cc_map(connected_components(df, max_iter=25).collect())
    assert set(got.values()) == {0} and len(got) == 200


def test_cc_raises_on_non_convergence(spark):
    import pytest

    edges = [(i, i + 1) for i in range(40)]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(df, max_iter=1)


def test_token_budget_shards_carry_cols(spark):
    df = spark.range(20).select(
        F.col("id").alias("doc_id"), F.lit(10).alias("w"), (F.col("id") % 2).alias("tag")
    )
    out = token_budget_shards(df, "w", "doc_id", budget=50, group_size=5, carry_cols=["tag"])
    rows = out.collect()
    assert set(out.columns) == {"doc_id", "w", "tag", "shard_id"}
    assert all(r["tag"] == r["doc_id"] % 2 for r in rows)


# ------------------------------------------- temperature / pack / topfrac

def test_temperature_resample_rates_and_determinism(spark):
    from anomaly_detector_spark.operators.corpus import temperature_resample

    # en 400 docs, fr 100, zh 25 -> alpha=0.5 rates (25/n)^0.5:
    # en 0.25, fr 0.5, zh 1.0 (smallest stratum keeps everything)
    rows = [(i, "en") for i in range(400)]
    rows += [(1000 + i, "fr") for i in range(100)]
    rows += [(2000 + i, "zh") for i in range(25)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    kept = temperature_resample(df, "lang", alpha=0.5, key_col="doc_id", salt="t")
    got = {r["lang"]: r["n"] for r in kept.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert got["zh"] == 25  # rate 1.0 -> all kept
    # hash-threshold Bernoulli: expect ~rate*n within a loose binomial bound
    assert 60 <= got["en"] <= 140   # ~100
    assert 30 <= got["fr"] <= 70    # ~50
    # deterministic: identical selection on re-run and under repartitioning
    a = sorted(r["doc_id"] for r in kept.collect())
    b = sorted(
        r["doc_id"]
        for r in temperature_resample(
            df.repartition(7), "lang", alpha=0.5, key_col="doc_id", salt="t"
        ).collect()
    )
    assert a == b
    # alpha=1 keeps everything
    assert temperature_resample(df, "lang", alpha=1.0, key_col="doc_id").count() == 525


def test_temperature_resample_null_stratum(spark):
    from anomaly_detector_spark.operators.corpus import temperature_resample

    rows = [(i, "en") for i in range(64)] + [(100 + i, None) for i in range(4)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    kept = temperature_resample(df, "lang", alpha=0.0, key_col="doc_id", salt="t")
    got = {r["lang"]: r["n"] for r in kept.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    # NULL is its own (smallest) stratum: rate 1.0, all 4 survive
    assert got.get(None) == 4
    assert 0 < got.get("en", 0) < 64  # en downsampled toward 4


def test_pack_sequences_matches_global_prefix_sum(spark):
    from anomaly_detector_spark.operators.corpus import pack_sequences

    rows = [(i, (i * 37) % 97 + 1) for i in range(500)]
    rows[50] = (50, 0)  # zero-weight doc: spans exactly 1 sequence
    df = spark.createDataFrame(rows, "doc_id long, w long")
    got = {
        r["doc_id"]: (r["seq_id"], r["seq_offset"], r["n_seqs_spanned"])
        for r in pack_sequences(df, "w", "doc_id", seq_len=128, group_size=64).collect()
    }
    pre = 0
    for i, w in sorted(rows):
        first = pre // 128
        spans = 1 if w <= 0 else (pre + w - 1) // 128 - first + 1
        assert got[i] == (first, pre % 128, spans), i
        pre += w


def test_top_fraction_by_group(spark):
    from anomaly_detector_spark.operators.corpus import top_fraction_by_group

    # group a: 4 rows -> ceil(4*0.5)=2 kept; group b: 3 rows -> 2 kept;
    # ties broken by doc_id (1 beats 2 at score 9)
    rows = [
        (1, "a", 9.0), (2, "a", 9.0), (3, "a", 5.0), (4, "a", 1.0),
        (5, "b", 3.0), (6, "b", 2.0), (7, "b", 1.0),
    ]
    df = spark.createDataFrame(rows, "doc_id long, g string, score double")
    kept = sorted(
        r["doc_id"]
        for r in top_fraction_by_group(df, "g", "score", frac=0.5, tiebreak_col="doc_id").collect()
    )
    assert kept == [1, 2, 5, 6]


# ------------------------------------------------------- epoch shuffle

def test_epoch_shuffle_deterministic_and_uniform(spark):
    from anomaly_detector_spark.operators.corpus import epoch_shuffle

    df = spark.createDataFrame([(i,) for i in range(400)], "doc_id long")
    a = epoch_shuffle(df, epoch=0).collect()
    b = epoch_shuffle(df.repartition(7), epoch=0).collect()
    # identical assignment regardless of input partitioning
    key = lambda rows: sorted((r["doc_id"], r["shard"], r["pos"]) for r in rows)
    assert key(a) == key(b)
    # pos is a dense 1..n_shard rank within each shard
    by_shard: dict[str, list[int]] = {}
    for r in a:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    for poss in by_shard.values():
        assert sorted(poss) == list(range(1, len(poss) + 1))
    # 256 shards over 400 uniform draws: no shard grabs a gross share
    assert max(len(v) for v in by_shard.values()) <= 12


def test_epoch_shuffle_epochs_differ(spark):
    from anomaly_detector_spark.operators.corpus import epoch_shuffle

    df = spark.createDataFrame([(i,) for i in range(50)], "doc_id long")
    e0 = {r["doc_id"]: (r["shard"], r["pos"]) for r in epoch_shuffle(df, epoch=0).collect()}
    e1 = {r["doc_id"]: (r["shard"], r["pos"]) for r in epoch_shuffle(df, epoch=1).collect()}
    assert e0 != e1  # a different permutation per epoch
    assert set(e0) == set(e1)  # ... over the same documents


# ------------------------------------------------------ split leakage

def test_split_assign_fractions_determinism_stability(spark):
    from anomaly_detector_spark.operators.corpus import split_assign

    df = spark.range(0, 20_000).select(F.col("id").alias("doc_id"))
    fr = {"train": 0.9, "valid": 0.05, "test": 0.05}
    got = split_assign(df, fr).groupBy("split").count().collect()
    counts = {r["split"]: r["count"] for r in got}
    assert set(counts) == {"train", "valid", "test"}
    assert abs(counts["train"] / 20_000 - 0.9) < 0.02
    assert abs(counts["valid"] / 20_000 - 0.05) < 0.01
    # deterministic and partitioning-invariant
    a = {r["doc_id"]: r["split"] for r in split_assign(df, fr).collect()}
    b = {r["doc_id"]: r["split"] for r in split_assign(df.repartition(13), fr).collect()}
    assert a == b
    # threshold-growth stability: enlarging train never evicts a train row
    wide = {r["doc_id"]: r["split"] for r in
            split_assign(df, {"train": 0.95, "valid": 0.03, "test": 0.02}).collect()}
    assert all(wide[k] == "train" for k, v in a.items() if v == "train")
    # different salt re-rolls
    c = {r["doc_id"]: r["split"] for r in split_assign(df, fr, salt="other").collect()}
    assert a != c


def test_split_assign_validates(spark):
    import pytest

    from anomaly_detector_spark.operators.corpus import split_assign

    df = spark.range(3).select(F.col("id").alias("doc_id"))
    with pytest.raises(ValueError):
        split_assign(df, {"train": 1.0})
    with pytest.raises(ValueError):
        split_assign(df, {"train": 0.7, "test": 0.2})


def test_split_leakage_flags_cross_split_near_dups(spark):
    from anomaly_detector_spark.operators.corpus import split_leakage

    base = "the quick brown fox jumps over the lazy dog again and again " * 4
    rows = [
        (1, base + "alpha", "train"),
        (2, base + "omega", "test"),     # near-dup of 1, other split -> leak
        (3, base + "gamma", "train"),    # near-dup of 1/2, same split as 1
        (4, "completely different content with no shared shingles at all "
            "whatsoever in any window of three tokens", "test"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, split string")
    out = {(r["id_a"], r["id_b"]): r for r in
           split_leakage(df, threshold=0.5, bands=32, num_hashes=64).collect()}
    assert (1, 2) in out and out[(1, 2)]["leak"] is True
    assert out[(1, 2)]["split_a"] == "train" and out[(1, 2)]["split_b"] == "test"
    assert (1, 3) in out and out[(1, 3)]["leak"] is False
    assert all(4 not in k for k in out)
