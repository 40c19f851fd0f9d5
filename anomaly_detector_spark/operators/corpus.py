"""Corpus-preparation operators a web-scale training-data pipeline needs
beyond per-pair dedup: transitive duplicate CLUSTERING, deterministic
stratified SAMPLING, and token-budget SHARDING.

These extend the reference's dedup semantics (keep-first on duplicated
keys, /root/reference/algo/operator.py:92) from pairwise to corpus level:

* connected_components / dup_clusters — a near-dup pair list (MinHash /
  SimHash / embedding LSH output) is not a dedup decision until pairs
  are closed transitively; one representative per CLUSTER survives.
  Implemented as distributed min-label propagation: each iteration is a
  join + partial-aggregated groupBy-min (both map-side combinable), and
  the frame is localCheckpoint-ed per round so lineage stays O(1) deep.
  Each round combines neighbor-min with a pointer jump (adopt the
  label's own label), so rounds = O(log diameter) — star-like dup
  graphs finish in 2-3 rounds and even a pathological 10^6-long chain
  in ~20, at 10^12 edges. Convergence is detected from the per-round
  (sum(label), count) aggregate — labels only ever decrease, so an
  unchanged sum means a fixed point; this rides the same action that
  materializes the round, no extra job — and non-convergence at
  max_iter raises instead of returning partial labels.

* stratified_sample — deterministic hash-threshold sampling: a row
  survives iff the first 8 hex chars of sha256(salt || key) compare
  below the stratum's threshold. No RNG state, no shuffle, pure narrow
  codegen'd filter — and the SAME rows survive on retry, re-run, or a
  different partitioning, which is what makes sampling safe to compose
  with exactly-once sinks at 100 TB. Thresholds fold into the plan as
  string literals (fixed-width hex compares like the integer it encodes).

* token_budget_shards — assign each document to a training shard so
  every shard carries ~budget tokens, in a deterministic global order.
  A naive `sum() OVER (ORDER BY ..)` is a single-partition window — the
  classic scale-killer. This is the two-phase prefix-sum instead:
  group rows by a coarse deterministic key (floor(order/group_size)),
  aggregate per-group totals (tiny frame: n_groups rows), compute group
  prefix offsets with a window over THAT frame only, broadcast-join the
  offsets back, and finish with a within-group cumulative window whose
  partitions are bounded by group_size. The only global-order structure
  ever shuffled is the O(n_groups) offsets frame.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


# ------------------------------------------------------------------ CC

def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Connected components of an undirected edge list.

    Returns (node, cluster_id) for every node that appears in an edge;
    cluster_id is the component's minimum node id (deterministic).
    Nodes must be a numeric/orderable type.

    Min-label propagation with pointer jumping: labels[v] starts at v;
    each round every node takes the min of its own label, its
    neighbors' labels, and its label's label (the jump — doubling the
    effective propagation distance, so rounds = O(log diameter)).
    Fixed point = every node holds its component minimum. Each round
    is one groupBy-min shuffle (map-side partial agg) plus one O(n)
    label-to-label join on the aggregated frame; raises if max_iter
    rounds pass without a fixed point.
    """
    bi = edges.select(
        F.col(src).alias("node"), F.col(dst).alias("nbr")
    ).unionByName(edges.select(F.col(dst).alias("node"), F.col(src).alias("nbr")))
    # cache the static edge relation: it feeds every round
    bi = bi.distinct().persist()

    labels = bi.groupBy("node").agg(F.min("nbr").alias("lab"))
    labels = labels.select("node", F.least("node", "lab").alias("lab")).localCheckpoint()
    prev_sig = labels.agg(
        F.sum("lab").alias("s"), F.count(F.lit(1)).alias("c")
    ).collect()[0]

    converged = False
    for _ in range(max_iter):
        # neighbor messages: each edge forwards the src's current label
        msgs = bi.join(labels, "node").select(
            F.col("nbr").alias("node"), F.col("lab")
        )
        mins = (
            msgs.unionByName(labels)
            .groupBy("node")
            .agg(F.min("lab").alias("lab"))
        )
        # pointer jump: also adopt the label's OWN label (every label
        # value is a node id, so the lookup always hits). Neighbor-min
        # alone moves a chain's minimum one hop per round (rounds =
        # diameter); the jump doubles the effective hop distance, so
        # rounds = O(log diameter) — a 10^6-long path converges in ~20
        # rounds instead of 10^6, and star-like dup graphs still finish
        # in 2-3. Cost: one extra O(n) self-join per round on the
        # already-aggregated labels frame.
        lut = mins.select(F.col("node").alias("lab"), F.col("lab").alias("_lab2"))
        new_labels = (
            mins.join(lut, "lab", "left")
            .select("node", F.least("lab", "_lab2").alias("lab"))
            .localCheckpoint()  # truncate lineage; also materializes the round
        )
        sig = new_labels.agg(
            F.sum("lab").alias("s"), F.count(F.lit(1)).alias("c")
        ).collect()[0]
        labels = new_labels
        # labels are bounded below and strictly decrease until fixed point:
        # an unchanged (sum, count) IS convergence, not a hash collision risk
        if sig["s"] == prev_sig["s"] and sig["c"] == prev_sig["c"]:
            converged = True
            break
        prev_sig = sig
    bi.unpersist()
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds; "
            "raise max_iter (rounds needed = O(log graph diameter))"
        )
    return labels.select("node", F.col("lab").alias("cluster_id"))


def dup_clusters(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Close a near-dup pair list into clusters with sizes.

    Output: (doc_id, cluster_id, cluster_size, is_survivor) — one row per
    clustered document, cluster_id = min doc_id in the component, the
    survivor being the canonical representative a dedup pass would keep
    (min id, mirroring the reference's keep-first rule,
    /root/reference/algo/operator.py:92). Singleton documents (no pair)
    are absent: they need no decision.

    The pair list is eagerly materialized first (localCheckpoint): the
    iterative CC consumes it every round, and when it arrives as an
    unmaterialized MinHash/LSH plan the first checkpoint inside CC would
    re-derive that whole pipeline. Pairs are O(near-dup pairs) — tiny
    relative to the corpus.
    """
    pairs = pairs.localCheckpoint()
    cc = connected_components(pairs, src, dst, max_iter)
    sizes = cc.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("cluster_size"))
    # sizes is O(clusters) — broadcast it back onto members
    return cc.join(F.broadcast(sizes), "cluster_id").select(
        F.col("node").alias("doc_id"),
        "cluster_id",
        F.col("cluster_size").cast("long").alias("cluster_size"),
        (F.col("node") == F.col("cluster_id")).alias("is_survivor"),
    )


# ------------------------------------------------------------ sampling

def rate_to_hex_threshold(rate: float) -> str:
    """Map a keep-rate in [0, 1] to the 8-hex-char threshold such that
    `hex8 < threshold` keeps ~rate of uniformly-hashed keys. Fixed-width
    lowercase hex compares exactly like its integer value, so both Spark
    and any ANSI oracle can evaluate the SAME string literal."""
    if rate >= 1.0:
        return "g"  # > every hex char: keeps all rows
    return format(max(int(rate * 16**8), 0), "08x")


def sample_hash(key: Column, salt: str) -> Column:
    """First 8 hex chars of sha256(salt || key) — the uniform draw."""
    return F.substring(F.sha2(F.concat(F.lit(salt), key.cast("string")), 256), 1, 8)


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates: dict[str, float],
    key_col: str = "doc_id",
    salt: str = "mix1",
    default_rate: float = 0.0,
) -> DataFrame:
    """Deterministic per-stratum Bernoulli sample (training-mix weights).

    `rates` maps stratum value -> keep probability. Selection depends
    only on (salt, key) — never on partitioning, task retries, or row
    order — so the sample is reproducible and safe under speculative
    execution. The whole predicate is codegen'd string ops; zero shuffle.
    """
    draw = sample_hash(F.col(key_col), salt)
    thr = F.lit(rate_to_hex_threshold(default_rate))
    for val, rate in sorted(rates.items()):
        thr = F.when(F.col(strata_col) == val, F.lit(rate_to_hex_threshold(rate))).otherwise(thr)
    return df.filter(draw < thr)


def temperature_resample(
    df: DataFrame,
    strata_col: str,
    alpha: float = 0.5,
    key_col: str = "doc_id",
    salt: str = "temp1",
) -> DataFrame:
    """Temperature-based mixture rebalancing (the multilingual /
    multi-source training-mix downsampler): keep-rate per stratum
    ``r_g = (n_min / n_g) ** (1 - alpha)``, so expected kept counts are
    proportional to ``n_g ** alpha`` — ``alpha=1`` keeps everything,
    ``alpha=0`` downsamples every stratum to the smallest one
    (uniform mix). Downsample-only (all rates <= 1), realized by the
    same deterministic hash-threshold Bernoulli as stratified_sample,
    so the selection is reproducible under retries and repartitioning.

    Unlike stratified_sample the rates are DERIVED IN-PLAN from the
    observed stratum counts: a groupBy(strata).count() aggregate
    (O(strata) rows), a 1-row global-min frame, both broadcast back —
    no driver action, no collect. The threshold is re-encoded to the
    8-hex-char string form in-plan (floor(rate * 2^32) as zero-padded
    lower hex), identical in any engine with hex()/lpad(). NULL strata
    participate as their own group (null-safe join).
    """
    counts = df.groupBy(F.col(strata_col).alias("_stratum")).agg(
        F.count(F.lit(1)).alias("_n")
    )
    nmin = counts.agg(F.min("_n").alias("_nmin"))
    rates = counts.crossJoin(F.broadcast(nmin)).select(
        "_stratum",
        F.pow(F.col("_nmin") / F.col("_n"), F.lit(1.0 - alpha)).alias("_rate"),
    )
    thr = F.when(F.col("_rate") >= 1.0, F.lit("g")).otherwise(
        F.lpad(
            F.lower(F.hex(F.floor(F.col("_rate") * F.lit(float(16**8))).cast("long"))),
            8,
            "0",
        )
    )
    rates = rates.withColumn("_thr", thr)
    draw = sample_hash(F.col(key_col), salt)
    return (
        df.join(
            F.broadcast(rates),
            F.col(strata_col).eqNullSafe(F.col("_stratum")),
            "left",
        )
        .filter(draw < F.col("_thr"))
        .drop("_stratum", "_n", "_rate", "_thr")
    )


def split_assign(
    df: DataFrame,
    fracs: dict[str, float],
    key_col: str = "doc_id",
    salt: str = "split1",
    split_col: str = "split",
) -> DataFrame:
    """Deterministic train/valid/test assignment by hash threshold.

    Every row gets exactly one split label from ``fracs`` (an ordered
    name -> fraction dict summing to ~1; the LAST split takes the
    remainder, so rounding never drops a row). Assignment depends only
    on (salt, key) — the same sha256-threshold draw as
    ``stratified_sample`` — so it is reproducible across runs, retries,
    partitionings, and engines (fixed-width hex compares like its
    integer value; the thresholds are plan-folded literals any ANSI
    oracle can evaluate). Changing the salt re-rolls the split;
    changing a fraction moves only the boundary region, because the
    draw is a fixed uniform per key (the standard hash-split stability
    property — growing train from 0.90 to 0.95 never moves a train row
    to test). Zero shuffle: one codegen'd CASE over a hash expression.
    """
    names = list(fracs)
    if len(names) < 2:
        raise ValueError("split_assign needs at least two splits")
    total = sum(fracs.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split fractions must sum to 1, got {total}")
    draw = sample_hash(F.col(key_col), salt)
    cum = 0.0
    expr = None
    for name in names[:-1]:
        cum += fracs[name]
        cond = draw < F.lit(rate_to_hex_threshold(cum))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    return df.withColumn(split_col, expr.otherwise(F.lit(names[-1])))


def split_leakage(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    split_col: str = "split",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    threshold: float = 0.4,
    hash_fn: str = "xxhash64",
    max_bucket: int = 10_000,
) -> DataFrame:
    """Eval-contamination guard: near-duplicate pairs that STRADDLE a
    train/valid/test split.

    A near-dup of a test document sitting in train silently inflates
    every evaluation on that test set — the leak decontaminate() can't
    see because it only checks the EXPLICIT eval inventory, not the
    held-out slice of the corpus itself. This runs the engine's banded
    MinHash-LSH + exact-Jaccard verification (operators/dedup.py — the
    bucketed kind, never all-pairs) over the whole corpus and labels
    each surviving pair with both members' splits: ``leak = split_a !=
    split_b``. Returns (id_a, id_b, jaccard, split_a, split_b, leak) —
    the full near-dup pair set, so the same pass answers both "how much
    leakage" and "what to drop/re-home before training".

    Scale shape: identical to minhash_lsh_candidates/jaccard_pairs
    (explode -> K codegen'd min-aggs, band self-join with oversized-
    bucket capping, semi-join-pruned shingle verification); the split
    labels ride two equi-joins of the O(pairs) result against the
    narrow (id, split) projection — the raw corpus never meets itself
    outside the banded join.
    """
    from .dedup import jaccard_pairs, minhash_lsh_candidates

    cand = minhash_lsh_candidates(
        df, text_col, id_col,
        num_hashes=num_hashes, bands=bands, shingle_k=shingle_k,
        hash_fn=hash_fn, max_bucket=max_bucket,
    )
    pairs = jaccard_pairs(df, cand, text_col, id_col, shingle_k=shingle_k, threshold=threshold)
    sp = df.select(F.col(id_col), F.col(split_col))
    a = sp.select(F.col(id_col).alias("id_a"), F.col(split_col).alias("split_a"))
    b = sp.select(F.col(id_col).alias("id_b"), F.col(split_col).alias("split_b"))
    return (
        pairs.join(a, "id_a").join(b, "id_b")
        .select(
            "id_a", "id_b", "jaccard", "split_a", "split_b",
            (F.col("split_a") != F.col("split_b")).alias("leak"),
        )
    )


def top_fraction_by_group(
    df: DataFrame,
    group_col: str,
    score_col: str,
    frac: float = 0.75,
    tiebreak_col: str = "doc_id",
) -> DataFrame:
    """Adaptive per-group quality gate: keep the top ``frac`` of each
    group's rows by ``score_col`` (ties broken by ``tiebreak_col`` so
    the cut is deterministic). The per-lang analog of a fixed quality
    threshold — each language's own score distribution sets its bar.

    Exact rank semantics: keep iff rank <= ceil(frac * group_count).
    One shuffle (the group window); parallel across groups, so the
    bound is the LARGEST group's sort, not the corpus. For a corpus
    where one group dominates, swap in the approximate two-phase form:
    percentile_approx(score, 1-frac) per group (a pre-aggregated
    broadcast frame) and a narrow filter — same shape as
    checks/stats.py quantiles — at the cost of an approximate cut.
    """
    w = Window.partitionBy(group_col).orderBy(
        F.col(score_col).desc(), F.col(tiebreak_col).asc()
    )
    wc = Window.partitionBy(group_col)
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .withColumn("_n", F.count(F.lit(1)).over(wc))
        .filter(F.col("_rk") <= F.ceil(F.col("_n") * F.lit(frac)))
        .drop("_rk", "_n")
    )


# ------------------------------------------------------------ sharding

def token_budget_shards(
    df: DataFrame,
    weight_col: str,
    order_col: str = "doc_id",
    budget: int = 100_000,
    group_size: int = 10_000,
    materialize: bool = True,
    carry_cols: list[str] | None = None,
) -> DataFrame:
    """Assign rows to ~budget-weight shards in deterministic order.

    Returns the narrow assignment frame (order_col, weight_col,
    [carry_cols...,] shard_id); join it back on order_col to carry wide
    columns — the shard pass itself never ships the wide row.
    `carry_cols` is for cheap fixed-width columns a downstream rollup
    needs (a lang index, a source id): they ride the materialized
    narrow frame instead of forcing the caller into a post-hoc join.

    shard_id = (prefix_sum_exclusive(weight) over rows ordered by
    order_col) div budget — the shard into which the row's first token
    falls. Equivalent to `(sum(w) OVER (ORDER BY o) - w) // budget` but
    WITHOUT the single-partition global window: see module docstring
    (two-phase prefix sum; the global structure is an O(n/group_size)
    offsets frame computed once and broadcast).

    `order_col` must be numeric and unique (a doc id); `group_size`
    bounds the within-group window partitions.

    `materialize=True` (default) localCheckpoints the narrow
    (order, weight, group) projection before branching. The plan has
    two consumers (group-totals aggregate + within-group window) and
    column pruning gives each a different scan schema, so Catalyst
    cannot reuse one exchange between them — without materialization
    the SOURCE is scanned twice and any upstream weight derivation
    (tokenizing a 100 TB text column) recomputed twice. The
    materialized frame is ~16 bytes/row on executor-local storage;
    two passes over that beat two passes over the source. Set False
    only when the input is already a cheap cached/narrow frame.
    """
    base = df.select(
        order_col, weight_col, *(carry_cols or []),
        F.floor(F.col(order_col) / F.lit(group_size)).alias("_grp"),
    )
    if materialize:
        base = base.localCheckpoint()
    grp_tot = base.groupBy("_grp").agg(F.sum(weight_col).alias("_gsum"))
    # n_groups rows only — a single-partition window here is O(n_groups),
    # not O(n): this is the deliberate, bounded global-order step
    w_off = Window.orderBy("_grp").rowsBetween(Window.unboundedPreceding, -1)
    offsets = grp_tot.select(
        "_grp", F.coalesce(F.sum("_gsum").over(w_off), F.lit(0)).alias("_off")
    )
    w_in = (
        Window.partitionBy("_grp")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    out = (
        base.join(F.broadcast(offsets), "_grp")
        .withColumn(
            "_pre",
            F.col("_off") + F.coalesce(F.sum(weight_col).over(w_in), F.lit(0)),
        )
        .withColumn("shard_id", F.expr(f"_pre div {int(budget)}"))
    )
    return out.drop("_grp", "_gsum", "_off", "_pre")


def pack_sequences(
    df: DataFrame,
    weight_col: str,
    order_col: str = "doc_id",
    seq_len: int = 2048,
    group_size: int = 10_000,
    materialize: bool = True,
    carry_cols: list[str] | None = None,
) -> DataFrame:
    """Offset-based sequence packing: lay documents head-to-tail in
    deterministic ``order_col`` order and cut the token stream into
    fixed ``seq_len`` training sequences (the standard pre-training
    packing step — no padding between documents).

    Adds to the narrow (order, weight[, carry...]) frame:

    * ``seq_id``      — the sequence holding the document's FIRST token
      (``pre div seq_len``);
    * ``seq_offset``  — the document's start position within it;
    * ``n_seqs_spanned`` — how many sequences the document crosses
      (``(pre+w-1) div seq_len - pre div seq_len + 1``; long documents
      straddle boundaries rather than being padded around).

    Same two-phase prefix sum as token_budget_shards (its module-
    docstring scale argument applies verbatim): per-group totals →
    O(n_groups) offsets window → broadcast back → bounded within-group
    window. No single-partition global window ever exists; join the
    result back on ``order_col`` to carry the text into the writer.
    """
    base = df.select(
        order_col, weight_col, *(carry_cols or []),
        F.floor(F.col(order_col) / F.lit(group_size)).alias("_grp"),
    )
    if materialize:
        base = base.localCheckpoint()
    grp_tot = base.groupBy("_grp").agg(F.sum(weight_col).alias("_gsum"))
    w_off = Window.orderBy("_grp").rowsBetween(Window.unboundedPreceding, -1)
    offsets = grp_tot.select(
        "_grp", F.coalesce(F.sum("_gsum").over(w_off), F.lit(0)).alias("_off")
    )
    w_in = (
        Window.partitionBy("_grp")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    pre = F.col("_off") + F.coalesce(F.sum(weight_col).over(w_in), F.lit(0))
    w = F.col(weight_col)
    out = (
        base.join(F.broadcast(offsets), "_grp")
        .withColumn("_pre", pre)
        .withColumn("seq_id", F.expr(f"_pre div {int(seq_len)}"))
        .withColumn("seq_offset", F.col("_pre") % F.lit(int(seq_len)))
        .withColumn(
            "n_seqs_spanned",
            F.when(w <= 0, F.lit(1)).otherwise(
                F.expr(f"(_pre + {weight_col} - 1) div {int(seq_len)}") - F.col("seq_id") + 1
            ).cast("long"),
        )
    )
    return out.drop("_grp", "_gsum", "_off", "_pre")


# ------------------------------------------------------- epoch shuffle

def epoch_shuffle(
    df: DataFrame,
    key_col: str = "doc_id",
    epoch: int = 0,
    shard_hex_chars: int = 2,
    salt: str = "shuf1",
) -> DataFrame:
    """Deterministic training-epoch shuffle: a (shard, pos) ordering of
    the corpus that depends only on (salt, epoch, key) — the reader
    consumes shards in shard order and rows in ``pos`` order within
    each, and gets a pseudo-random document order that is bit-identical
    across task retries, repartitionings, and re-runs (the property a
    resumable multi-epoch data loader needs), with a different
    permutation per ``epoch``.

    Adds: ``shuffle_draw`` (hex sha256 of salt|epoch|key — the sort
    key), ``shard`` (its first ``shard_hex_chars`` chars: 16^k shards,
    uniform by construction since the draw is uniform), and ``pos``
    (row_number within the shard by (draw, key) — the key tiebreak
    makes colliding draws deterministic too).

    Scale shape: the ONLY global-order structure is the shard prefix —
    there is no single-partition global rank. The window partitions by
    shard (16^k-way parallel; pick k so 16^k ~ the cluster's task
    count — k=4 is 65,536 shards), and each shard sorts ~n/16^k rows.
    Writing with partitionBy("shard") gives the reader one file group
    per shard and a globally shuffled stream for free. The draw reuses
    sample_hash's sha256 construction, so any ANSI engine reproduces
    the exact permutation (no engine-private RNG anywhere).
    """
    if not 1 <= shard_hex_chars <= 8:
        raise ValueError("shard_hex_chars must be in 1..8")
    draw = F.sha2(
        F.concat(
            F.lit(f"{salt}|{int(epoch)}|"), F.col(key_col).cast("string")
        ),
        256,
    )
    w = Window.partitionBy("shard").orderBy("shuffle_draw", key_col)
    return (
        df.withColumn("shuffle_draw", draw)
        .withColumn("shard", F.substring("shuffle_draw", 1, shard_hex_chars))
        .withColumn("pos", F.row_number().over(w))
    )


# ------------------------------------------------------ decontamination

def decontaminate(
    docs: DataFrame,
    bench: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    min_hits: int = 1,
) -> DataFrame:
    """Benchmark decontamination: per-document overlap with an eval
    set's word k-gram inventory (the standard train/test-leak gate a
    training-data pipeline runs before every export).

    Returns one row per docs row: (id_col, n_grams, matched,
    contam_frac, contaminated) where n_grams counts the document's
    DISTINCT k-grams, matched counts those also present anywhere in
    `bench`, and contaminated = matched >= min_hits.

    Scale shape: the bench inventory is exploded + distinct'd once and
    BROADCAST (eval sets are MBs against a 100 TB corpus; the distinct
    is a shuffle over bench only). The corpus side is one narrow
    explode; a document's grams stay inside its task, so the per-doc
    count partial-aggregates to exactly one row per document before the
    only corpus-side shuffle (O(n_docs) count rows). Documents shorter
    than k tokens survive via explode_outer with matched = 0.
    """
    from .dedup import word_shingles

    grams = F.coalesce(word_shingles(text_col, k), F.array().cast("array<string>"))
    bgrams = (
        bench.select(F.explode(word_shingles(text_col, k)).alias("_gram"))
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    exploded = docs.select(
        F.col(id_col),
        F.size(grams).cast("long").alias("n_grams"),
        F.explode_outer(grams).alias("_gram"),
    )
    per_doc = (
        exploded.join(F.broadcast(bgrams), "_gram", "left")
        .groupBy(id_col)
        .agg(
            F.first("n_grams").alias("n_grams"),
            F.coalesce(F.sum("_hit"), F.lit(0)).cast("long").alias("matched"),
        )
    )
    return per_doc.select(
        id_col,
        "n_grams",
        "matched",
        F.when(F.col("n_grams") > 0, F.col("matched") / F.col("n_grams"))
        .otherwise(F.lit(0.0))
        .alias("contam_frac"),
        (F.col("matched") >= F.lit(min_hits)).alias("contaminated"),
    )
