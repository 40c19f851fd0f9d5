"""Similarity search over embedding columns (array<float>).

* brute_force_topk — exact cosine top-k: broadcast the (small) query
  set against the corpus; the dot product runs JVM-side with
  ``F.zip_with`` + ``F.aggregate`` (no Python, no shuffle of the
  corpus); top-k via per-query row_number. This is the baseline and
  the verification oracle for the ANN path.
* lsh_topk — scale path: random-hyperplane LSH buckets (signs of
  hash-derived pseudo-random projections) shrink the candidate set to
  matching buckets (multi-probe via multiple tables), then exact
  cosine re-rank. At 10^12 vectors the bucket join replaces the full
  cross product; buckets are uniform by construction.
* ivf_topk — IVF-style: k-means-lite centroids sampled deterministically,
  assign each vector to nearest centroid (one narrow pass), search only
  the ``nprobe`` closest cells per query.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def vector_kinds(vec_col: str = "embedding", dim: int = 64) -> Column:
    """Embedding-damage kinds (empty string when clean) — the
    path_rule_kinds classifier pattern for the vector column: NULL
    vector, wrong dimensionality, NaN elements (an upstream divide
    blew up), Inf elements (overflowed norm), all-zero vector (cosine
    is undefined — a zero-norm vector silently poisons every
    similarity/ANN/drift operator downstream). One codegen'd HOF
    expression; no UDF, no shuffle. A NaN-bearing vector is NOT also
    flagged zero_norm (its sum-of-squares is NaN, not 0)."""
    v = F.col(vec_col)
    kinds = [
        F.when(v.isNull(), F.lit("null_vec")),
        F.when(v.isNotNull() & (F.size(v) != dim), F.lit("wrong_dim")),
        F.when(F.exists(v, lambda x: F.isnan(x)), F.lit("has_nan")),
        F.when(
            F.exists(
                v,
                lambda x: (x == F.lit(float("inf"))) | (x == F.lit(float("-inf"))),
            ),
            F.lit("has_inf"),
        ),
        F.when(
            v.isNotNull()
            & (F.aggregate(v, F.lit(0.0), lambda a, x: a + x * x) == 0),
            F.lit("zero_norm"),
        ),
    ]
    return F.array_join(F.filter(F.array(*kinds), lambda x: x.isNotNull()), ",")


def vector_sanity(
    df: DataFrame,
    vec_col: str = "embedding",
    dim: int = 64,
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-row vector damage rows: (id_col, kinds) for damaged vectors
    only. The pre-flight every embedding pipeline needs before ANN /
    drift / near-dup consume the column — all of which assume finite,
    non-zero, fixed-dim vectors."""
    return (
        df.select(F.col(id_col), vector_kinds(vec_col, dim).alias("kinds"))
        .filter(F.col("kinds") != "")
    )


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact cosine top-k of corpus rows per query row.

    Output: (query_id, vec_id, score, rank), rank 1..k, deterministic
    tie-break on vec_id.

    WARNING — oracle baseline, never the scale path: the scoring pass is
    O(|corpus| x |queries|) and the final window funnels all N x Q scored
    rows through Q reducers (one sorted task per query). Correct and fine
    for validating lsh_topk / ivf_topk at test scale; at 100 TB use those
    bucketed variants, which this function exists to oracle.
    """
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("q_vec"),
    )
    c = corpus.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).cast("array<double>").alias("c_vec")
    )
    scored = c.crossJoin(F.broadcast(q)).select(
        "query_id",
        "vec_id",
        F.round(cosine(F.col("q_vec"), F.col("c_vec")), 6).alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("vec_id").asc())
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def hyperplane_signs(dim: int, bits: int, table: int) -> list[list[float]]:
    """Deterministic ±1 hyperplane matrix, derived on the DRIVER from
    sha256("{table}:{j}:{i}") parity. The planes are constants of the
    index — hashing them per data row (the previous formulation) was
    pure overhead and, being xxhash64, unreproducible outside the JVM.
    As literals they fold into the plan (codegen'd multiply-adds) and
    any SQL oracle can inline the same matrix from the same derivation.
    """
    import hashlib

    return [
        [
            1.0 if int(hashlib.sha256(f"{table}:{j}:{i}".encode()).hexdigest()[0], 16) % 2 == 1 else -1.0
            for i in range(dim)
        ]
        for j in range(bits)
    ]


def _hyperplane_sig(vec: Column, dim: int, bits: int, table: int) -> Column:
    """Random-hyperplane signature: bit j = sign of <vec, plane_j>, the
    plane a ±1 literal array (see hyperplane_signs). zip_with + aggregate
    keeps the dot product JVM-side."""
    sig = None
    for j, row in enumerate(hyperplane_signs(dim, bits, table)):
        plane = F.array(*[F.lit(s) for s in row])
        proj = F.aggregate(
            F.zip_with(vec, plane, lambda x, s: x * s), F.lit(0.0), lambda a, v: a + v
        )
        term = F.when(proj > 0, F.lit(1 << j).cast("long")).otherwise(F.lit(0).cast("long"))
        sig = term if sig is None else sig.bitwiseOR(term)
    return sig


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    dim: int = 64,
    bits: int = 12,
    tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate cosine top-k: hyperplane-LSH bucket join + exact re-rank.

    Recall improves with ``tables`` (independent hash tables). Output
    schema matches brute_force_topk; ranks are per-query over the
    candidate union.
    """
    def sig_cols(vec: Column):
        return [
            _hyperplane_sig(vec, dim, bits, t).alias(f"sig{t}") for t in range(tables)
        ]

    c = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("c_vec"),
        *sig_cols(F.col(vec_col).cast("array<double>")),
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("q_vec"),
        *sig_cols(F.col(vec_col).cast("array<double>")),
    )
    c_b = c.select(
        "vec_id", "c_vec",
        F.explode(F.array(*[F.struct(F.lit(t).alias("t"), F.col(f"sig{t}").alias("s")) for t in range(tables)])).alias("b"),
    ).select("vec_id", "c_vec", F.col("b.t").alias("t"), F.col("b.s").alias("s"))
    q_b = q.select(
        "query_id", "q_vec",
        F.explode(F.array(*[F.struct(F.lit(t).alias("t"), F.col(f"sig{t}").alias("s")) for t in range(tables)])).alias("b"),
    ).select("query_id", "q_vec", F.col("b.t").alias("t"), F.col("b.s").alias("s"))
    cand = (
        c_b.join(F.broadcast(q_b), on=["t", "s"], how="inner")
        .select("query_id", "vec_id", "q_vec", "c_vec")
        .dropDuplicates(["query_id", "vec_id"])
    )
    scored = cand.select(
        "query_id", "vec_id", F.round(cosine(F.col("q_vec"), F.col("c_vec")), 6).alias("score")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("vec_id").asc())
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """IVF-style ANN: deterministic sampled centroids, cell-restricted search.

    Centroids = the ``n_cells`` corpus vectors with the smallest
    xxhash64(id) (a deterministic uniform sample — k-means-lite). Each
    corpus vector is assigned to its nearest centroid; each query probes
    its ``nprobe`` nearest cells.
    """
    c = corpus.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).cast("array<double>").alias("c_vec")
    )
    # sha256-ordered deterministic sample (not xxhash64): same uniform
    # pseudo-random pick, but reproducible outside the JVM for oracles
    cents = (
        c.withColumn("_h", F.sha2(F.col("vec_id").cast("string"), 256))
        .orderBy("_h")
        .limit(n_cells)
        .select(F.col("vec_id").alias("cell_id"), F.col("c_vec").alias("cent_vec"))
    )
    # assign corpus rows to nearest centroid (broadcast centroids).
    # max_by aggregation, NOT a per-vector row_number window: the window
    # variant sorts corpus x n_cells rows inside a hash-partition-by-
    # vec_id exchange; max_by gets map-side partial aggregation and no
    # sort. Tie-break folded into the ordering struct (sim desc, then
    # cell_id asc via negation) so assignment stays deterministic.
    sim = cosine(F.col("c_vec"), F.col("cent_vec"))
    assigned = (
        c.crossJoin(F.broadcast(cents))
        .groupBy("vec_id")
        .agg(
            F.first("c_vec").alias("c_vec"),
            F.max_by(
                F.col("cell_id"), F.struct(sim.alias("s"), (-F.col("cell_id")).alias("t"))
            ).alias("cell_id"),
        )
        .select("vec_id", "c_vec", "cell_id")
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).cast("array<double>").alias("q_vec")
    )
    probes = (
        q.crossJoin(F.broadcast(cents))
        .withColumn("_sim", cosine(F.col("q_vec"), F.col("cent_vec")))
        .withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(F.col("_sim").desc(), F.col("cell_id").asc())
            ),
        )
        .filter(F.col("_rn") <= nprobe)
        .select("query_id", "q_vec", "cell_id")
    )
    cand = assigned.join(F.broadcast(probes), on="cell_id", how="inner")
    scored = cand.select(
        "query_id", "vec_id", F.round(cosine(F.col("q_vec"), F.col("c_vec")), 6).alias("score")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("vec_id").asc())
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def two_phase_topk(
    scored: DataFrame,
    k: int,
    group_col: str = "query_id",
    order_desc: str = "score",
    tie_col: str = "vec_id",
    descending: bool = True,
) -> DataFrame:
    """Distributed top-k per group without the single-reducer funnel.

    A plain ``row_number().over(partitionBy(group))`` ships EVERY scored
    row to the group's one reducer — N x Q rows through Q tasks. This
    two-phase form first takes the top-k within each *physical* input
    partition (cheap local sort over whatever rows a task already holds),
    so the global window only sees ``n_partitions x k`` rows per group.
    The final result is partitioning-INVARIANT: every true global top-k
    row is by definition in its own partition's local top-k, so phase 1
    never drops a winner; ties are broken on ``tie_col`` in both phases.
    """
    order = [
        F.col(order_desc).desc() if descending else F.col(order_desc).asc(),
        F.col(tie_col).asc(),
    ]
    w_local = Window.partitionBy(group_col, "_pid").orderBy(*order)
    w_global = Window.partitionBy(group_col).orderBy(*order)
    return (
        scored.withColumn("_pid", F.spark_partition_id())
        .withColumn("_lrn", F.row_number().over(w_local))
        .filter(F.col("_lrn") <= k)
        .drop("_pid", "_lrn")
        .withColumn("rank", F.row_number().over(w_global))
        .filter(F.col("rank") <= k)
    )


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    dim: int = 64,
    n_sub: int = 8,
    ksub: int = 16,
    refine: int = 4,
    train_iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Product-quantization ANN with asymmetric-distance (ADC) scoring
    and exact cosine re-rank (IVF-PQ's scoring half; compose with
    ``ivf_topk``'s cell restriction for the full index).

    Index build — all in-plan, no driver collect:
      * codebook init: the ``ksub`` corpus vectors with the smallest
        sha256(id) (the family's deterministic uniform sample), each
        split into ``n_sub`` subvectors of dim/n_sub.
      * codebook train: ``train_iters`` Lloyd rounds PER SUBSPACE —
        assign every corpus subvector to its nearest entry (L2, 6dp,
        tie -> lowest code), recompute entries as the element-wise mean.
        The mean update posexplodes to (m, code, pos, val) and
        hash-aggregates: partial aggregation collapses each task to
        n_sub x ksub x subdim rows, so the shuffle carries
        O(codebook x tasks), never O(N x dim). Empty cells keep their
        previous entry (left-join coalesce); the ~128-row flat codebook
        is localCheckpoint-ed per round (O(1) lineage).
      * the trained codebook folds into ONE broadcast row
        ``codebook[m][code]`` via two tiny aggregations; encoding is
        pure nested higher-order functions against that row — a narrow
        map, zero shuffle. At 10^12 vectors the stored index is n_sub
        small ints per vector (~16x smaller than the raw float64[64]),
        which is the actual point of PQ: the scan side of ANN becomes
        memory-bandwidth-cheap.
      * query: per-query distance table ``qtab[m][code]`` (same HOFs).

    Scoring: adc = sum_m qtab[m][codes[m]] — ``n_sub`` array lookups per
    (vector, query) instead of ``dim`` multiplies. Candidates = top
    ``k*refine`` by ADC (ascending; approximate), then exact cosine
    re-rank to the final k. Both top-k stages run through
    ``two_phase_topk`` — local per-partition top-k first, so no stage
    ships all N x Q scored rows to Q reducers.

    Output: (query_id, vec_id, adc, score, rank) — ``adc`` kept so the
    quantized distance is auditable against the exact score.
    """
    sub = dim // n_sub
    c = corpus.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).cast("array<double>").alias("vec")
    )
    samp = (
        c.withColumn("_h", F.sha2(F.col("vec_id").cast("string"), 256))
        .orderBy("_h")
        .limit(ksub)
    )
    # code = 1..ksub in hash order (16-row frame: the window is trivial)
    samp = samp.withColumn("code", F.row_number().over(Window.orderBy("_h")))
    # flat codebook: (m, code, cent) — n_sub x ksub rows
    flat = samp.select(
        "code",
        F.posexplode(
            F.array(*[F.slice("vec", m * sub + 1, sub) for m in range(n_sub)])
        ).alias("m", "cent"),
    ).select("m", "code", "cent")

    def _nest(flat_df: DataFrame) -> DataFrame:
        """Fold the flat codebook into one broadcastable row
        codebook[m][code] (1-based code -> array index)."""
        return (
            flat_df.groupBy("m")
            .agg(F.array_sort(F.collect_list(F.struct("code", "cent"))).alias("cc"))
            .groupBy()
            .agg(F.array_sort(F.collect_list(F.struct("m", "cc"))).alias("mm"))
            .select(
                F.transform(
                    "mm", lambda s: F.transform(s["cc"], lambda t: t["cent"])
                ).alias("codebook")
            )
        )

    def _l2(a: Column, b: Column) -> Column:
        return F.round(
            F.aggregate(
                F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ),
            6,
        )

    ms = F.sequence(F.lit(0), F.lit(n_sub - 1))

    def _subvec(vec: Column, m: Column) -> Column:
        return F.slice(vec, m * sub + 1, sub)

    def _code(vec: Column, m: Column) -> Column:
        """1-based nearest-codebook-entry index for subspace m (L2 at
        6dp, first/lowest code on ties — array_position returns the
        first index holding the exact min element)."""
        dists = F.transform(
            F.element_at(F.col("codebook"), (m + 1).cast("int")),
            lambda cent: _l2(_subvec(vec, m), cent),
        )
        return F.array_position(dists, F.array_min(dists))

    for _ in range(train_iters):
        book1 = _nest(flat)
        assigned = (
            c.crossJoin(F.broadcast(book1))
            .select(
                F.explode(
                    F.transform(
                        ms,
                        lambda m: F.struct(
                            m.cast("int").alias("m"),
                            _code(F.col("vec"), m).cast("int").alias("code"),
                            _subvec(F.col("vec"), m).alias("sv"),
                        ),
                    )
                ).alias("e")
            )
            .select("e.m", "e.code", F.posexplode("e.sv").alias("pos", "val"))
        )
        means = (
            assigned.groupBy("m", "code", "pos")
            .agg(F.round(F.avg("val"), 6).alias("v"))
            .groupBy("m", "code")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "v"))).alias("pv"))
            .select(
                "m", "code", F.transform("pv", lambda s: s["v"]).alias("new_cent")
            )
        )
        flat = (
            flat.join(means, ["m", "code"], "left")
            .select("m", "code", F.coalesce("new_cent", "cent").alias("cent"))
            .localCheckpoint()
        )
    book1 = _nest(flat)

    enc = (
        c.crossJoin(F.broadcast(book1))
        .withColumn(
            "codes", F.transform(ms, lambda m: _code(F.col("vec"), m))
        )
        .select("vec_id", "vec", "codes")
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("q_vec"),
    )
    qt = (
        q.crossJoin(F.broadcast(book1))
        .withColumn(
            "qtab",
            F.transform(
                ms,
                lambda m: F.transform(
                    F.element_at(F.col("codebook"), (m + 1).cast("int")),
                    lambda cent: _l2(_subvec(F.col("q_vec"), m), cent),
                ),
            ),
        )
        .select("query_id", "q_vec", "qtab")
    )
    scored = enc.crossJoin(F.broadcast(qt)).select(
        "query_id",
        "vec_id",
        "vec",
        "q_vec",
        F.round(
            F.aggregate(
                F.zip_with(
                    "codes",
                    "qtab",
                    lambda code, row: F.element_at(row, code.cast("int")),
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ),
            6,
        ).alias("adc"),
    )
    cands = two_phase_topk(
        scored, k * refine, order_desc="adc", descending=False
    ).drop("rank")
    reranked = cands.withColumn(
        "score", F.round(cosine(F.col("q_vec"), F.col("vec")), 6)
    )
    return two_phase_topk(reranked, k).select(
        "query_id", "vec_id", "adc", "score", "rank"
    )


def kmeans_assign(
    vectors: DataFrame,
    k: int = 8,
    n_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """Distributed spherical k-means (Lloyd): cluster an embedding
    corpus into k cells — the refinement step IVF indexing wants on top
    of ``ivf_topk``'s sampled centroids, and the standard corpus-level
    grouping for topic balancing / dedup blocking.

    Init: the k corpus vectors with the smallest sha256(id) (the same
    deterministic uniform sample ivf_topk uses, reproducible outside
    the JVM for oracles). Each Lloyd round then
      1. assigns every vector to its max-cosine centroid — broadcast
         centroid crossJoin + ``max_by`` aggregation (map-side partial
         agg, no per-vector sort window), ties broken by cell id;
      2. recomputes centroids as the element-wise mean — posexplode to
         (cell, pos, val) and hash-aggregate: the explode is map-side
         and partial aggregation collapses it to k x dim rows per task,
         so the shuffle carries O(k x dim x tasks) rows, never
         O(N x dim). Cells that lose all members keep their previous
         centroid (left-join coalesce).
    Centroids and similarities are rounded to ``round_digits`` each
    round, which makes the fixture exactly reproducible by any engine
    (aggregation-order float drift ~1e-15 vanishes at 1e-6) and the
    result partitioning-invariant. The centroid frame (k rows) is
    localCheckpoint-ed per round — O(1) lineage, broadcast each pass.

    Returns (vec_id, cluster, sim): final assignment against the last
    round's centroids; ``cluster`` is the init vector's id (stable
    labels). Zero vectors would yield NaN cosine — filter them first.
    """
    v = vectors.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).cast("array<double>").alias("vec")
    )
    cents = (
        v.withColumn("_h", F.sha2(F.col("vec_id").cast("string"), 256))
        .orderBy("_h")
        .limit(k)
        .select(F.col("vec_id").alias("cell_id"), F.col("vec").alias("cent"))
        .localCheckpoint()
    )

    def _assign(cents_df: DataFrame) -> DataFrame:
        return (
            v.crossJoin(F.broadcast(cents_df))
            .withColumn("_sim", F.round(cosine(F.col("vec"), F.col("cent")), round_digits))
            .groupBy("vec_id")
            .agg(
                F.first("vec").alias("vec"),
                F.max_by(
                    F.struct(F.col("cell_id"), F.col("_sim")),
                    F.struct(F.col("_sim").alias("s"), (-F.col("cell_id")).alias("t")),
                ).alias("best"),
            )
            .select(
                "vec_id",
                "vec",
                F.col("best.cell_id").alias("cell_id"),
                F.col("best._sim").alias("sim"),
            )
        )

    for _ in range(n_iter):
        assigned = _assign(cents)
        means = (
            assigned.select("cell_id", F.posexplode("vec").alias("pos", "val"))
            .groupBy("cell_id", "pos")
            .agg(F.round(F.avg("val"), round_digits).alias("m"))
            .groupBy("cell_id")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
            .select("cell_id", F.transform("pm", lambda s: s["m"]).alias("new_cent"))
        )
        cents = (
            cents.join(means, "cell_id", "left")
            .select("cell_id", F.coalesce("new_cent", "cent").alias("cent"))
            .localCheckpoint()
        )
    return _assign(cents).select("vec_id", F.col("cell_id").alias("cluster"), "sim")


def embedding_outliers(
    vectors: DataFrame,
    k: int = 8,
    n_iter: int = 2,
    z_thresh: float = 3.0,
    iqr_k: float = 1.5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Median-gated outlier flagging in embedding space: the reference's
    per-device outlier kernel (z-score + IQR over curve errors,
    /root/reference/algo/error_calculation.py:5-12) re-aimed at embedding
    geometry — cluster the corpus with ``kmeans_assign``, then flag
    vectors whose cosine distance to their OWN centroid is an outlier
    within that cluster (far-side only: the median gate never flags
    unusually central points). The corpus-curation use is semantic-space
    anomaly triage: mislabeled/garbled documents sit far from every
    cluster they get assigned to.

    Determinism (the perplexity lesson): distances quantize to integer
    micro-units (sim is already 6dp-rounded, so ``di = round(1e6*(1-sim))``
    is exact), per-cluster mean/variance derive from exact decimal
    sums — never ``stddev_samp``, whose merge order varies with
    partitioning — so z-scores and flags are engine- and
    partitioning-invariant.

    Scale: the cluster stats frame is O(k) rows (one aggregate with
    map-side partials) broadcast back to the assignment frame; flagging
    adds zero windows and one broadcast join on top of kmeans_assign's
    documented O(k x dim x tasks) shuffles.

    Returns (vec_id, cluster, di, z_score, is_outlier): ``di`` the
    micro-distance, ``z_score`` rounded to 4dp for display (flags use
    the unrounded value).
    """
    asg = kmeans_assign(vectors, k=k, n_iter=n_iter, id_col=id_col, vec_col=vec_col)
    d = asg.select(
        "vec_id",
        "cluster",
        F.round(F.lit(1_000_000.0) * (F.lit(1.0) - F.col("sim"))).cast("long").alias("di"),
    )
    st = d.groupBy("cluster").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("di").cast("decimal(38,0)")).alias("s1"),
        F.sum((F.col("di") * F.col("di")).cast("decimal(38,0)")).alias("s2"),
        F.expr("percentile(di, 0.5)").alias("med"),
        F.expr("percentile(di, 0.25)").alias("q1"),
        F.expr("percentile(di, 0.75)").alias("q3"),
    )
    j = d.join(F.broadcast(st), "cluster")
    s1d, s2d, n = F.col("s1").cast("double"), F.col("s2").cast("double"), F.col("n")
    var = (s2d - s1d * s1d / n) / (n - F.lit(1))
    z = F.when((n > 1) & (var > 0), (F.col("di") - s1d / n) / F.sqrt(var)).otherwise(F.lit(0.0))
    iqr = F.col("q3") - F.col("q1")
    flagged = ((z > z_thresh) | (F.col("di") > F.col("q3") + iqr_k * iqr)) & (
        F.col("di") > F.col("med")
    )
    return j.select(
        "vec_id", "cluster", "di", F.round(z, 4).alias("z_score"), flagged.alias("is_outlier")
    )


def embedding_histogram(
    vectors: DataFrame,
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 8,
    bucket_micro: int = 500_000,
    table: int = 7,
) -> DataFrame:
    """Pooled projection histogram (plane, bucket, base_n) — the
    persistable baseline for ``embedding_drift(baseline=...)``. Same
    quantization and planes as the drift pass (parameters must match;
    stamp them into the store path or check id). Persist one per
    run/model-version next to the manifest: run-over-run embedding
    drift then needs only this O(planes x buckets) frame, never a
    rescan of yesterday's vectors — the same mergeable-summary story
    as the HLL/t-digest/top-k/bloom sketch tables (counts are additive;
    sum base_n to merge runs)."""
    v = F.col(vec_col).cast("array<double>")
    projs = []
    for row in hyperplane_signs(dim, n_planes, table):
        plane = F.array(*[F.lit(int(s)) for s in row])
        terms = F.zip_with(
            v, plane, lambda x, s: F.round(x * F.lit(1e6)).cast("long") * s.cast("long")
        )
        projs.append(F.aggregate(terms, F.lit(0).cast("long"), lambda a, t: a + t))
    return (
        vectors.select(F.posexplode(F.array(*projs)).alias("plane", "proj"))
        .select(
            "plane",
            F.floor(F.col("proj").cast("double") / F.lit(float(bucket_micro)))
            .cast("long")
            .alias("bucket"),
        )
        .groupBy("plane", "bucket")
        .agg(F.count(F.lit(1)).alias("base_n"))
    )


def embedding_drift(
    vectors: DataFrame,
    partition_col: str,
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 8,
    bucket_micro: int = 500_000,
    table: int = 7,
    baseline: DataFrame | None = None,
) -> DataFrame:
    """Per-partition drift of the EMBEDDING DISTRIBUTION itself:
    (partition_key, psi, worst_plane, n_obs).

    The scalar drift checks watch columns; this watches the vector
    space — a silent embedding-model version bump, a re-normalization,
    or a corpus shift moves the DISTRIBUTION of vectors long before any
    scalar metric notices. Method: project every vector onto
    ``n_planes`` fixed ±1 hyperplanes (``hyperplane_signs`` — driver-
    derived, plan-folded literals), histogram each projection, and
    score each partition's per-plane histogram against the pooled
    baseline with the drift module's smoothed PSI; a partition's score
    is its WORST plane (drifted in any direction is drifted).

    ``baseline``: an external (plane, bucket, base_n) frame — from
    ``embedding_histogram`` persisted by a previous run or a trusted
    reference corpus. REQUIRED to catch GLOBAL drift: with the default
    in-batch pooled baseline, an embedding-model version bump moves
    every partition together and every partition still matches the
    pool — only same-batch divergence flags. Same blindness argument as
    the scalar drift check's peer-relative gate; run-over-run comparison
    needs the stored histogram, O(planes x buckets) and additive across
    runs. Parameters (dim/planes/bucket/table) must match the store's.

    Determinism (the perplexity lesson): projections quantize per
    ELEMENT to integer micro-units before summing — ``sum_i
    round(1e6 * x_i) * s_i`` is exact long arithmetic, so the bucket a
    vector lands in is identical in any engine and any partitioning
    (a raw double dot product could flip a floor() boundary). PSI sums
    are doubles rounded to 6dp; the worst-plane argmax ties break on
    the ROUNDED psi then min plane, so the output is engine-exact.

    Scale shape: ONE narrow pass over the vectors (codegen'd zip_with
    multiply-adds, posexplode to n_planes rows/vector, map-side-combined
    groupBy) produces the O(partitions x planes x buckets) histogram,
    localCheckpointed because four tiny consumers fork from it; every
    later join is broadcast. The vector column never rides a shuffle.
    """
    v = F.col(vec_col).cast("array<double>")
    projs = []
    for row in hyperplane_signs(dim, n_planes, table):
        plane = F.array(*[F.lit(int(s)) for s in row])
        terms = F.zip_with(
            v, plane, lambda x, s: F.round(x * F.lit(1e6)).cast("long") * s.cast("long")
        )
        projs.append(F.aggregate(terms, F.lit(0).cast("long"), lambda a, t: a + t))
    hist = (
        vectors.select(
            F.col(partition_col).cast("string").alias("partition_key"),
            F.posexplode(F.array(*projs)).alias("plane", "proj"),
        )
        .select(
            "partition_key",
            "plane",
            F.floor(F.col("proj").cast("double") / F.lit(float(bucket_micro)))
            .cast("long")
            .alias("bucket"),
        )
        .groupBy("partition_key", "plane", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint()
    )
    base = (
        baseline.select("plane", "bucket", "base_n")
        if baseline is not None
        else hist.groupBy("plane", "bucket").agg(F.sum("n").alias("base_n"))
    )
    grid = (
        hist.select("plane", "bucket")
        .unionByName(base.select("plane", "bucket"))
        .distinct()
    )
    cnt = (
        hist.filter(F.col("plane") == 0)
        .groupBy("partition_key")
        .agg(F.sum("n").alias("n_obs"))
    )
    base_tot = base.groupBy("plane").agg(F.sum("base_n").alias("n_total"))
    bp = grid.groupBy("plane").agg(F.count(F.lit(1)).alias("b"))
    # null-safe on partition_key (a NULL partition is a legal group and
    # must meet its own histogram / count rows; plane/bucket never NULL)
    from ..checks.base import null_safe_join

    f = (
        null_safe_join(
            cnt.select("partition_key").crossJoin(F.broadcast(grid)),
            hist, ["partition_key", "plane", "bucket"], "left",
        )
        .join(F.broadcast(base), ["plane", "bucket"], "left")
        .na.fill({"n": 0, "base_n": 0})
        .join(F.broadcast(bp), "plane")
        .transform(
            lambda d: null_safe_join(d, cnt, ["partition_key"], broadcast_right=True)
        )
        .join(F.broadcast(base_tot), "plane")
    )
    p = (F.col("n") + 0.5) / (F.col("n_obs") + 0.5 * F.col("b"))
    q = (F.col("base_n") + 0.5) / (F.col("n_total") + 0.5 * F.col("b"))
    psis = (
        f.select(
            "partition_key", "plane", "n_obs", ((p - q) * F.log(p / q)).alias("term")
        )
        .groupBy("partition_key", "plane", "n_obs")
        .agg(F.round(F.sum("term"), 6).alias("psi6"))
    )
    m = psis.groupBy("partition_key", "n_obs").agg(F.max("psi6").alias("psi"))
    wp = (
        null_safe_join(psis, m, ["partition_key", "n_obs"])
        .where(F.col("psi6") == F.col("psi"))
        .groupBy("partition_key")
        .agg(F.min("plane").cast("long").alias("worst_plane"))
    )
    return null_safe_join(m, wp, ["partition_key"]).select(
        "partition_key", "psi", "worst_plane", F.col("n_obs").cast("long").alias("n_obs")
    )


def ann_recall(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    lsh_params: dict | None = None,
    ivf_params: dict | None = None,
) -> DataFrame:
    """Honesty metric for the approximate indexes: recall@k of lsh_topk
    and ivf_topk against the brute-force truth, per query —
    (method, query_id, n_hits, recall). Run it on a deterministic query
    SAMPLE whenever index parameters change (bits/tables, cells/nprobe):
    a bucketed index that silently dropped to 0.3 recall is worse than
    a slow exact scan, and nothing else in the pipeline would notice.

    Cost shape: the truth side is brute-force over corpus x queries —
    this is an EVALUATION harness for a small query sample (tens to
    hundreds), never a production path; the approximate sides cost the
    same as serving. Queries with zero approximate hits still emit a
    row (left join from the query set — recall 0, not absence).
    """
    truth = brute_force_topk(corpus, queries, k=k).select("query_id", "vec_id")
    qs = queries.select("query_id").distinct()
    parts = []
    for method, res in (
        ("lsh", lsh_topk(corpus, queries, k=k, **(lsh_params or {}))),
        ("ivf", ivf_topk(corpus, queries, k=k, **(ivf_params or {}))),
    ):
        hits = (
            res.select("query_id", "vec_id")
            .join(truth, ["query_id", "vec_id"], "left_semi")
            .groupBy("query_id")
            .agg(F.count(F.lit(1)).alias("n_hits"))
        )
        parts.append(
            qs.join(hits, "query_id", "left")
            .na.fill({"n_hits": 0})
            .select(
                F.lit(method).alias("method"),
                F.col("query_id").cast("long").alias("query_id"),
                F.col("n_hits").cast("long").alias("n_hits"),
                F.round(F.col("n_hits") / F.lit(float(k)), 6).alias("recall"),
            )
        )
    return parts[0].unionByName(parts[1])
