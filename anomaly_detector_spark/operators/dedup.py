"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale design notes (the 100 TB story):

* exact_dedup — hash-groupBy on sha256(content): one shuffle keyed by a
  uniform 256-bit hash, immune to content skew; survivor = min(id) so
  results are partitioning-invariant.
* minhash_lsh — shingle → K minhashes → B bands; candidate generation is
  a self-join on (band_idx, band_hash) buckets, so comparisons are
  O(sum of bucket^2) instead of O(n^2); the band hash is uniform so the
  shuffle is balanced. All hashing is JVM-side (xxhash64 in higher-order
  functions) — no Python in the candidate path; only optional exact
  Jaccard verification touches token arrays.
* simhash — 64-bit signature via bit-majority over token hashes,
  computed with explode + groupBy-sum (fully vectorized); near-dups =
  bucket join on rotated prefixes (hamming-adjacent candidates).
* ngram_jaccard — exact verification kernel on candidate pairs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.errors import AnalysisException
from pyspark.sql import functions as F

from .text import tokens


def exact_dedup(df: DataFrame, col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep one row per distinct content (survivor = min id). Returns survivors."""
    w = Window.partitionBy(F.sha2(F.col(col), 256)).orderBy(F.col(id_col).asc())
    return df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")


def exact_dup_groups(df: DataFrame, col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """One row per duplicated content hash: (content_sha, n_copies, keep_id)."""
    return (
        df.groupBy(F.sha2(F.col(col), 256).alias("content_sha"))
        .agg(F.count(F.lit(1)).alias("n_copies"), F.min(id_col).alias("keep_id"))
        .filter(F.col("n_copies") > 1)
    )


def skeleton(col: Column | str = "text") -> Column:
    """Formatting-invariant code skeleton: block comments (/* */), line
    comments (// and #) and ALL whitespace stripped, map-side regex
    only. Two files differing solely by reformatting or comment churn —
    the dominant near-dup class in code corpora after exact copies —
    collapse to the same skeleton; exact hashing misses them and
    MinHash finds them only at shingle cost. A HEURISTIC, not a parser:
    a '#' inside a string literal is treated as a comment start — fine
    for duplicate DETECTION (both copies mangle identically), never for
    content rewriting. Regexes are RE2-compatible (inline (?s), lazy
    quantifier) so the DuckDB oracle replays them verbatim."""
    c = F.coalesce(F.col(col) if isinstance(col, str) else col, F.lit(""))
    no_block = F.regexp_replace(c, r"(?s)/\*.*?\*/", "")
    no_line = F.regexp_replace(no_block, r"(//|#)[^\n]*", "")
    return F.regexp_replace(no_line, r"\s+", "")


def skeleton_dup_groups(
    df: DataFrame,
    col: str = "text",
    id_col: str = "doc_id",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Formatting-variant duplicate groups: one row per skeleton shared
    by >1 file with >1 DISTINCT byte content —
    (skeleton_hash, n_files, n_variants, keep_id).

    Byte-identical copies (n_variants == 1) are excluded: those are
    exact_dup_groups / uniqueness territory; this operator reports only
    groups where reformatting hides the duplication. Empty skeletons
    (whitespace/comment-only files) are excluded — every such file
    would otherwise collapse into one meaningless mega-group. One
    partial-aggregated shuffle keyed by the uniform skeleton hash;
    content never rides it (both hashes computed map-side).
    ``hash_fn='sha256'`` is the oracle-replayable twin."""
    sk = skeleton(col)
    h = F.xxhash64(sk) if hash_fn == "xxhash64" else F.sha2(sk, 256)
    if hash_fn not in ("xxhash64", "sha256"):
        raise ValueError(f"hash_fn must be 'xxhash64' or 'sha256', got {hash_fn!r}")
    return (
        df.filter(F.col(col).isNotNull() & (F.length(sk) > 0))
        .groupBy(h.alias("skeleton_hash"))
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.countDistinct(F.sha2(F.col(col), 256)).alias("n_variants"),
            F.min(id_col).alias("keep_id"),
        )
        .filter((F.col("n_files") > 1) & (F.col("n_variants") > 1))
    )


def skeleton_dup_pairs(
    df: DataFrame,
    col: str = "text",
    id_col: str = "doc_id",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Skeleton groups as a canonical near-dup PAIR list (id_a, id_b)
    with id_a = the group's keep_id — the same shape minhash/simhash
    candidates produce, so skeleton dups compose into the one
    dup_clusters closure (operators/corpus.py) alongside every other
    dedup family. The group frame is O(duplicated skeletons) and
    broadcast back onto one row scan (the vendored_examples pattern)."""
    groups = skeleton_dup_groups(df, col, id_col, hash_fn).select(
        "skeleton_hash", "keep_id"
    )
    sk = skeleton(col)
    h = F.xxhash64(sk) if hash_fn == "xxhash64" else F.sha2(sk, 256)
    rows = df.filter(F.col(col).isNotNull() & (F.length(sk) > 0)).select(
        F.col(id_col).alias("_id"), h.alias("skeleton_hash")
    )
    return (
        rows.join(F.broadcast(groups), "skeleton_hash")
        .filter(F.col("_id") != F.col("keep_id"))
        .select(F.col("keep_id").alias("id_a"), F.col("_id").alias("id_b"))
    )


def char_shingles(col: Column | str, k: int = 5) -> Column:
    """Character k-shingles of normalized text, JVM-side."""
    c = F.col(col) if isinstance(col, str) else col

    # normalized string bound as a lambda variable — an inline reference
    # inside the per-shingle lambda would re-run the regexp per element
    # (see word_shingles)
    def mk(norm: Column) -> Column:
        n = F.length(norm) - (k - 1)
        # sequence(1, n) descends for n < 1 — short strings yield no shingles
        return F.when(n < 1, F.array().cast("array<string>")).otherwise(
            F.array_distinct(
                F.transform(F.sequence(F.lit(1), n), lambda i: norm.substr(i, F.lit(k)))
            )
        )

    return F.element_at(
        F.transform(
            F.array(F.lower(F.regexp_replace(F.coalesce(c, F.lit("")), r"\s+", " "))), mk
        ),
        1,
    )


def word_shingles(col: Column | str, k: int = 3, distinct: bool = True) -> Column:
    """Word k-shingles (n-grams joined by space), JVM-side.

    ``distinct=False`` skips the set-dedup for consumers where duplicate
    shingles are harmless (MinHash: the min over a multiset equals the min
    over its set). (Measured: slice+concat_ws beats k element_at lookups —
    fewer interpreted expression nodes per shingle.)

    The token array is BOUND as a lambda variable (transform over a
    1-element array) before the per-shingle lambda consumes it: HOF
    lambda bodies are interpreted per element, so an inline ``tokens``
    expression inside the slice would re-run the whole split for EVERY
    shingle — O(n_tokens²) per document (measured 6x on 300-token docs:
    3.2s → 0.5s for the k-gram distinct count at sf0.1). A bound
    variable is a slot read.
    """

    def mk(tk: Column) -> Column:
        n = F.size(tk) - (k - 1)
        # guard: Spark sequence(1, n) DESCENDS for n < 1 ([1, 0], and
        # slice(_, 0, _) throws) — docs with fewer than k tokens must
        # yield an empty shingle set
        return F.when(n < 1, F.array().cast("array<string>")).otherwise(
            F.transform(
                F.sequence(F.lit(1), n),
                lambda i: F.concat_ws(" ", F.slice(tk, i, k)),
            )
        )

    arr = F.element_at(F.transform(F.array(tokens(col)), mk), 1)
    return F.array_distinct(arr) if distinct else arr


_M32 = 0xFFFFFFFF
_M64 = 0xFFFFFFFFFFFFFFFF


def _splitmix64(x: int) -> int:
    """Driver-side splitmix64 — derives the affine family's (a_i, b_i)
    constants deterministically from (seed, i); plan-folded literals."""
    x = (x + 0x9E3779B97F4A7C15) & _M64
    x ^= x >> 30
    x = (x * 0xBF58476D1CE4E5B9) & _M64
    x ^= x >> 27
    x = (x * 0x94D049BB133111EB) & _M64
    return x ^ (x >> 31)


def _signed64(x: int) -> int:
    return x - (1 << 64) if x >= (1 << 63) else x


def _affine_draw(i: int, h: Column, seed: int) -> Column:
    """Draw i as ``(a_i * h mod 2^64) xor b_i`` — a bijection over the
    64-bit space (a_i odd), i.e. the classic affine MinHash permutation,
    in pure primitive codegen ops (no hash-function rounds per draw).

    ANSI mode (Spark 4 default) throws on 64-bit multiply/add overflow,
    so the wrapping multiply is built from 32-bit lanes where no
    intermediate exceeds 2^63: with a_i < 2^31 and h split into unsigned
    halves (hh, hl), ``a*h mod 2^64 = ((a*hl) & m32) | (((a*hl >>> 32) +
    (a*hh & m32)) & m32) << 32``. Shifts and bitwise ops never
    ANSI-check; both products are < 2^63; the one addition sums two
    sub-2^32 values. The offset is XOR rather than +, sidestepping
    wrapping addition entirely (equally uniform for a bijective family).
    """
    a = (_splitmix64(seed * 0x10001 + 2 * i) & 0x7FFFFFFF) | 1
    b = _signed64(_splitmix64(seed * 0x10001 + 2 * i + 1))
    hl = h.bitwiseAND(F.lit(_M32))
    hh = F.shiftrightunsigned(h, 32)
    p0 = F.lit(a) * hl
    up = (F.shiftrightunsigned(p0, 32) + (F.lit(a) * hh).bitwiseAND(F.lit(_M32))).bitwiseAND(
        F.lit(_M32)
    )
    return F.shiftleft(up, 32).bitwiseOR(p0.bitwiseAND(F.lit(_M32))).bitwiseXOR(F.lit(b))


def _shingle_hash(i: int, sh: Column, seed: int, hash_fn: str) -> Column:
    """Hash draw i of a shingle. ``xxhash64`` (production: cheapest JVM
    hash) or ``sha256`` (oracle mode: first 16 hex chars as a STRING —
    fixed-width lowercase hex compares lexicographically == numerically,
    so min-aggregation semantics are identical, and any SQL engine with
    sha256 can re-derive the signature exactly).

    Production mode receives ``sh`` already reduced to ONE long
    (``xxhash64(seed, shingle)``, projected once in minhash_signatures)
    and derives draw i by re-hashing that long (``xxhash64(i, h1)`` —
    fixed 12-byte input): the classic one-hash MinHash family. The
    former form hashed the full shingle string K times — K x the
    string-scan cost for the same collision behavior. A true affine
    ``a_i*h ^ b_i`` family (``hash_fn="affine"``, ANSI-safe 32-bit-lane
    wrapping multiply) was built and MEASURED SLOWER (4.1s vs 3.2s,
    sf0.1 signatures, local[32]): its ~10 primitive expression nodes per
    draw x 64 draws bloat the generated aggregate-projection code past
    what JIT digests, while xxhash64 is one tight codegen'd call.
    Recorded in PLANS.md losing variants; the mode stays available and
    test-pinned for engines where hash calls are pricier."""
    if hash_fn == "xxhash64":
        return F.xxhash64(F.lit(i), sh)
    if hash_fn == "affine":
        return _affine_draw(i, sh, seed)
    if hash_fn == "sha256":
        return F.substring(F.sha2(F.concat(F.lit(f"{i + seed}:"), sh), 256), 1, 16)
    raise ValueError(f"unknown hash_fn {hash_fn!r}")


def minhash_signatures(
    df: DataFrame,
    col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    shingle_k: int = 3,
    seed: int = 1,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Per-document MinHash signature as ``num_hashes`` long columns _h0.._hK.

    Implementation note (the 100 TB story): the naive column expression
    ``transform(0..K, i -> array_min(transform(shingles, s -> hash(i,s))))``
    is a nested higher-order function — interpreted (no whole-stage
    codegen) AND re-inlined per reference by Catalyst's projection
    collapse, which made it ~1000x slower than this form in practice.
    Here we explode to (id, shingle) rows and run K min-aggregates —
    plain codegen'd expressions with map-side partial aggregation, so
    the shuffle carries K longs per document regardless of document
    size, and skew is bounded by the longest single document. In
    production (xxhash64) mode the shingle STRING is hashed exactly
    once per row (``_h1``); the K draws re-hash that long (see
    _shingle_hash), cutting the dominant string-hash cost K-fold.
    """
    sh = df.select(
        F.col(id_col).alias("_id"),
        F.explode(word_shingles(col, shingle_k, distinct=False)).alias("_sh"),
    )
    if hash_fn in ("xxhash64", "affine"):
        sh = sh.select("_id", F.xxhash64(F.lit(seed), F.col("_sh")).alias("_h1"))
        draw = F.col("_h1")
    else:
        draw = F.col("_sh")
    mins = [
        F.min(_shingle_hash(i, draw, seed, hash_fn)).alias(f"_h{i}")
        for i in range(num_hashes)
    ]
    return sh.groupBy("_id").agg(*mins)


def banded_rows(
    df: DataFrame,
    col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    seed: int = 1,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """(_id, band_idx, band_hash) rows — the LSH bucket assignment.

    Band hashes are computed straight off the signature columns
    (``xxhash64(lit(b), _h{br}.., _h{br+r-1})``) — no array slicing, no
    string concat, fully codegen'd. Deterministic in the document content
    alone, which is what makes the rows PERSISTABLE: a stored band row
    written by one run buckets identically against rows computed by any
    later run (see incremental_lsh_candidates).
    """
    assert num_hashes % bands == 0
    r = num_hashes // bands
    sigs = minhash_signatures(df, col, id_col, num_hashes, shingle_k, seed, hash_fn)

    def band_hash(b: int) -> F.Column:
        cols = [F.col(f"_h{b * r + j}") for j in range(r)]
        if hash_fn == "sha256":
            # sha256 over the '|'-joined hex signatures — byte-identical
            # to `sha256(h0 || '|' || h1 || ...)` in the SQL oracle
            return F.sha2(F.concat_ws("|", *cols), 256)
        return F.xxhash64(F.lit(b), *cols)

    band_structs = [
        F.struct(F.lit(b).alias("band_idx"), band_hash(b).alias("band_hash"))
        for b in range(bands)
    ]
    return sigs.select("_id", F.explode(F.array(*band_structs)).alias("band")).select(
        "_id", F.col("band.band_idx").alias("band_idx"), F.col("band.band_hash").alias("band_hash")
    )


def minhash_lsh_candidates(
    df: DataFrame,
    col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    seed: int = 1,
    max_bucket: int = 10_000,
    hash_fn: str = "xxhash64",
    materialize: bool = True,
) -> DataFrame:
    """Candidate near-duplicate pairs (id_a < id_b) via banded MinHash LSH.

    rows_per_band = num_hashes / bands; a pair is a candidate if any band
    of their signatures matches exactly. Output: (id_a, id_b, n_bands)
    with n_bands = number of matching bands.

    The self-join on (band_idx, band_hash) is O(sum bucket^2); buckets
    larger than ``max_bucket`` (degenerate content, e.g. empty files at
    web scale) are dropped from candidate generation — their members are
    exact-duplicable far more cheaply via exact_dedup, and keeping them
    would quadratically blow up the join. AQE skew-join splitting handles
    the surviving skew.
    """
    banded = banded_rows(df, col, id_col, num_hashes, bands, shingle_k, seed, hash_fn)
    if materialize:
        # banded is consumed THREE times (bucket-size census + both sides
        # of the self-join); without materialization each consumer embeds
        # its own copy of the shingle-explode + K-min-agg subtree and only
        # runtime exchange reuse partially deduplicates the work (measured:
        # the full signature derivation ran ~2x). An eager localCheckpoint
        # computes signatures exactly once into executor-local storage —
        # (docs x bands) rows of three longs, far smaller than the corpus —
        # and is GC'd with the frame. Disable for recompute-over-storage
        # tradeoffs at extreme scale.
        banded = banded.localCheckpoint()
    bucket_sizes = banded.groupBy("band_idx", "band_hash").agg(F.count(F.lit(1)).alias("_n"))
    oversized = bucket_sizes.filter(F.col("_n") > max_bucket).select("band_idx", "band_hash")
    banded = banded.join(F.broadcast(oversized), ["band_idx", "band_hash"], "left_anti")
    a = banded.alias("a")
    b = banded.alias("b")
    pairs = (
        a.join(b, on=["band_idx", "band_hash"], how="inner")
        .filter(F.col("a._id") < F.col("b._id"))
        .groupBy(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_bands"))
    )
    return pairs


def incremental_lsh_candidates(
    spark,
    new_docs: DataFrame,
    store_dir: str,
    run_id: str,
    col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    seed: int = 1,
    max_bucket: int = 10_000,
    hash_fn: str = "xxhash64",
    commit: bool = True,
) -> DataFrame:
    """Cross-run near-dup candidates: new docs vs themselves AND the corpus so far.

    The fourth mergeable-sketch family next to the manifest's HLL
    distincts, t-digest quantiles, and top-k heavy hitters: the persisted
    artifact here is the banded MinHash assignment (doc_id, band_idx,
    band_hash) — ~``bands`` rows of three longs per document, a fixed
    ~0.5% of corpus bytes — appended per ingest run. Each increment then
    costs O(new docs) signature computation plus ONE equi-join of the new
    band rows against the store, instead of re-running LSH over the whole
    corpus (O(corpus) per ingest, the full-batch alternative). At 10^12
    docs the store is the only thing that makes continuous ingest dedup
    feasible: signatures for already-ingested content are never
    recomputed, and the join is keyed by the uniform band hash, so AQE
    skew splitting plus the ``max_bucket`` cap bound every bucket.

    Returns (id_a, id_b, n_bands, pair_kind) where at least one side is
    new this run: ``new_new`` pairs (id_a < id_b, both ingested now) and
    ``new_old`` pairs (id_a = least, id_b = greatest, one side stored by
    an earlier run). Old-vs-old pairs were reported when THEIR run
    ingested them and are never re-emitted. The union over all runs
    equals one full-batch ``minhash_lsh_candidates`` over the whole
    corpus (pinned by test) provided ``max_bucket`` doesn't bite — the
    cap censuses the union of store + new rows, so a bucket can cross the
    cap in a later run than it would in full batch.

    Commit protocol: band rows are appended (with ``run_id``) BEFORE the
    returned plan is consumed; the old side of the plan filters
    ``run_id != this run``, so the append is invisible to the very
    computation that follows it and a crash-retry with the same run_id is
    safe — duplicated rows from the retried append are collapsed by the
    deterministic-row dedupe on read (band rows are pure functions of
    content), same at-least-once + dedupe-on-read story as the manifest
    sketches. Doc ids are assumed immutable (re-ingesting an id with
    changed content leaves both bucket sets live; dedupe re-ingests
    upstream with exact_dedup on sha256 first).
    """
    banded_new = banded_rows(
        new_docs, col, id_col, num_hashes, bands, shingle_k, seed, hash_fn
    ).localCheckpoint()  # consumed by census, both joins, and the append

    if commit:
        (
            banded_new.select(
                F.col("_id").alias("doc_id"),
                "band_idx",
                "band_hash",
                F.lit(run_id).alias("run_id"),
            )
            .write.mode("append")
            .parquet(store_dir)
        )

    try:
        old = (
            spark.read.parquet(store_dir)
            .filter(F.col("run_id") != F.lit(run_id))
            .select(F.col("doc_id").alias("_id"), "band_idx", "band_hash")
            .dropDuplicates(["_id", "band_idx"])  # retry-appended rows are identical
        )
    except AnalysisException:  # first run: store path absent (and commit=False);
        # any OTHER read failure (corrupt store, FS error) must fail loudly —
        # swallowing it would silently drop every new_old pair (r4 advice)
        old = banded_new.filter(F.lit(False))

    return incremental_pairs_from_bands(banded_new, old, max_bucket)


def incremental_pairs_from_bands(
    banded_new: DataFrame, banded_old: DataFrame, max_bucket: int = 10_000
) -> DataFrame:
    """Pure-plan core of incremental_lsh_candidates: pairs touching the new side.

    Both inputs are (_id, band_idx, band_hash) frames (banded_rows shape).
    Exposed separately so the store-free form is query/oracle-testable.
    """
    # Oversized-bucket census over the union, so degenerate buckets are
    # capped consistently on both join sides.
    all_rows = banded_new.unionByName(banded_old)
    oversized = (
        all_rows.groupBy("band_idx", "band_hash")
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") > max_bucket)
        .select("band_idx", "band_hash")
    )
    banded_new = banded_new.join(F.broadcast(oversized), ["band_idx", "band_hash"], "left_anti")
    banded_old = banded_old.join(F.broadcast(oversized), ["band_idx", "band_hash"], "left_anti")

    a, b = banded_new.alias("a"), banded_new.alias("b")
    new_new = (
        a.join(b, on=["band_idx", "band_hash"], how="inner")
        .filter(F.col("a._id") < F.col("b._id"))
        .groupBy(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_bands"))
        .withColumn("pair_kind", F.lit("new_new"))
    )
    n, o = banded_new.alias("n"), banded_old.alias("o")
    new_old = (
        n.join(o, on=["band_idx", "band_hash"], how="inner")
        .filter(F.col("n._id") != F.col("o._id"))  # re-ingested id meets its own rows
        .groupBy(
            F.least(F.col("n._id"), F.col("o._id")).alias("id_a"),
            F.greatest(F.col("n._id"), F.col("o._id")).alias("id_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_bands"))
        .withColumn("pair_kind", F.lit("new_old"))
    )
    return new_new.unionByName(new_old)


def jaccard_pairs(
    df: DataFrame,
    candidates: DataFrame,
    col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
    threshold: float = 0.7,
    materialize: bool = True,
) -> DataFrame:
    """Exact n-gram Jaccard verification of candidate pairs (JVM set ops).

    Only candidate members get shingled (semi-join first), so the heavy
    array materialization is proportional to the candidate set, not the
    corpus. ``candidates`` is consumed three times (two id projections +
    the verification join), so it is eagerly localCheckpoint-ed by
    default — when it arrives as an unmaterialized LSH plan, each
    consumer would otherwise re-derive the whole signature pipeline.
    """
    if materialize:
        candidates = candidates.localCheckpoint()
    cand_ids = (
        candidates.select(F.col("id_a").alias("_id"))
        .unionByName(candidates.select(F.col("id_b").alias("_id")))
        .distinct()
    )
    sh = (
        df.join(cand_ids, df[id_col] == cand_ids["_id"], "left_semi")
        .select(F.col(id_col).alias("_id"), word_shingles(col, shingle_k).alias("_sh"))
    )
    out = (
        candidates.join(sh.withColumnRenamed("_id", "id_a").withColumnRenamed("_sh", "sh_a"), "id_a")
        .join(sh.withColumnRenamed("_id", "id_b").withColumnRenamed("_sh", "sh_b"), "id_b")
        .withColumn("inter", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn("uni", F.size(F.array_union("sh_a", "sh_b")))
        .withColumn(
            "jaccard",
            F.when(F.col("uni") > 0, F.round(F.col("inter") / F.col("uni"), 6)).otherwise(F.lit(0.0)),
        )
        .select("id_a", "id_b", "jaccard")
    )
    return out.filter(F.col("jaccard") >= threshold)


def embedding_near_dups(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    dim: int = 64,
    bits: int = 10,
    tables: int = 4,
) -> DataFrame:
    """Near-duplicate pairs by embedding cosine similarity.

    Candidate pairs = vectors sharing a random-hyperplane LSH bucket in
    any table (cosine-similar vectors collide with probability
    (1 - theta/pi)^bits per table); candidates are exactly re-scored and
    filtered at ``threshold``. Output: (id_a, id_b, score), id_a < id_b.
    At scale the bucket join replaces the O(n^2) cross product; the
    signature computation is a narrow JVM-side pass.
    """
    from .similarity import _hyperplane_sig, cosine

    c = corpus.select(
        F.col(id_col).alias("_id"), F.col(vec_col).cast("array<double>").alias("_vec")
    )
    sigs = c.select(
        "_id", "_vec",
        *[_hyperplane_sig(F.col("_vec"), dim, bits, t).alias(f"sig{t}") for t in range(tables)],
    )
    banded = sigs.select(
        "_id", "_vec",
        F.explode(
            F.array(*[F.struct(F.lit(t).alias("t"), F.col(f"sig{t}").alias("s")) for t in range(tables)])
        ).alias("b"),
    ).select("_id", "_vec", F.col("b.t").alias("t"), F.col("b.s").alias("s"))
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(b, on=["t", "s"], how="inner")
        .filter(F.col("a._id") < F.col("b._id"))
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.col("a._vec").alias("va"),
            F.col("b._vec").alias("vb"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        cand.withColumn("score", F.round(cosine(F.col("va"), F.col("vb")), 6))
        .filter(F.col("score") >= threshold)
        .select("id_a", "id_b", "score")
    )


def _bit_mask(bit: int) -> int:
    """Signed-64 literal for 1<<bit (bit 63 wraps to the sign bit)."""
    return (1 << bit) if bit < 63 else -(1 << 63)


def _token_hash(tok: Column, hash_fn: str) -> Column:
    """64-bit (xxhash64) or 60-bit (sha256-derived) token hash. The sha
    variant parses the first 15 hex chars of sha256 as an integer —
    60 bits, reproducible in any SQL engine with sha256 + hex casts."""
    if hash_fn == "xxhash64":
        return F.xxhash64(tok)
    if hash_fn == "sha256":
        return F.conv(F.substring(F.sha2(tok, 256), 1, 15), 16, 10).cast("long")
    raise ValueError(f"unknown hash_fn {hash_fn!r}")


def with_simhash64(
    df: DataFrame,
    col: str = "text",
    id_col: str = "doc_id",
    out: str = "simhash",
    bits: int = 64,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """``bits``-wide SimHash per document — single-pass explode + groupBy.

    bit b of the signature is 1 iff sum over tokens of (+1 if the token
    hash has bit b set else -1) is positive. The explode fans token
    hashing across executors; the conditional sums run in one
    partial-aggregated groupBy (map-side combine), so the shuffle
    carries ``bits`` longs per document regardless of document size. Bit
    masks are Python int literals (no Column shift ops). Default: 64
    bits over xxhash64; ``hash_fn='sha256'`` uses 60-bit sha-derived
    hashes (pass bits=60) for SQL-oracle reproducibility.
    """
    h = _token_hash(F.col("_tok"), hash_fn)
    votes = [
        F.sum(
            F.when(h.bitwiseAND(F.lit(_bit_mask(b))) != 0, F.lit(1)).otherwise(F.lit(-1))
        ).alias(f"_v{b}")
        for b in range(bits)
    ]
    agg = (
        df.select(F.col(id_col), F.explode(tokens(col)).alias("_tok"))
        .groupBy(id_col)
        .agg(*votes)
    )
    sig = None
    for b in range(bits):
        term = F.when(F.col(f"_v{b}") > 0, F.lit(_bit_mask(b)).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        sig = term if sig is None else sig.bitwiseOR(term)
    sigs = agg.select(F.col(id_col), sig.alias(out))
    return df.join(sigs, on=id_col, how="left").withColumn(out, F.coalesce(F.col(out), F.lit(0)))


def simhash_near_dups(
    df: DataFrame,
    col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    blocks: int = 4,
    bits: int = 64,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Near-dup pairs by SimHash: block the ``bits``-wide signature into
    ``blocks`` chunks; by pigeonhole, any pair within ``max_hamming``
    (< blocks) shares at least one exact block → bucket join per block,
    then exact hamming filter via bit_count(xor).
    """
    width = bits // blocks
    sigs = with_simhash64(
        df.select(F.col(id_col).alias("_id"), F.col(col)), col, "_id", "_sig",
        bits=bits, hash_fn=hash_fn,
    ).select("_id", "_sig")
    blocked = sigs.select(
        "_id",
        "_sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("block_idx"),
                        F.shiftright(F.col("_sig"), b * width)
                        .bitwiseAND(F.lit((1 << width) - 1))
                        .alias("block_val"),
                    )
                    for b in range(blocks)
                ]
            )
        ).alias("blk"),
    ).select("_id", "_sig", F.col("blk.block_idx").alias("block_idx"), F.col("blk.block_val").alias("block_val"))
    a, b = blocked.alias("a"), blocked.alias("b")
    return (
        a.join(b, on=["block_idx", "block_val"], how="inner")
        .filter(F.col("a._id") < F.col("b._id"))
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.bit_count(F.col("a._sig").bitwiseXOR(F.col("b._sig"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .dropDuplicates(["id_a", "id_b"])
    )


def containment_pairs(
    df: DataFrame,
    col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
    window: int = 4,
    threshold: float = 0.8,
    max_posting: int = 5_000,
    materialize: bool = True,
) -> DataFrame:
    """MOSS-style partial-copy detection: pairs whose winnowing
    fingerprint CONTAINMENT (shared / min set size) clears ``threshold``
    — the asymmetric near-dup class every symmetric measure misses (a
    file wholesale-embedded in a larger one has Jaccard ~= |A|/|B|, far
    below any MinHash threshold, but containment ~= 1.0: winnowing
    guarantees any shared run of window+shingle_k-1 tokens shares a
    fingerprint, and a copied region's interior windows select
    identical mins in both documents).

    Scale shape: an inverted-index self-join bucketed by the winnowed
    fingerprint (operators/text.py winnow_fingerprints — narrow map,
    per-doc distinct), exactly the banded-LSH join geometry: cost is
    O(sum posting_list^2), NOT all-pairs. ``max_posting`` drops
    fingerprints recurring in more than that many documents before the
    join — corpus boilerplate (license headers, generated preambles)
    would otherwise create mega-postings, and a fingerprint shared by
    half the corpus identifies nothing (the minhash max_bucket / lines
    boilerplate rationale; lower it or strip_boilerplate first when
    boilerplate mass is high). Shared counts partial-aggregate to one
    row per surviving pair before the size join; text never rides any
    shuffle. The fingerprint frame feeds three consumers (sizes,
    posting filter, both join sides), so it is localCheckpoint-ed by
    default (``materialize=False`` keeps the pure plan for oracle/plan
    inspection).

    Returns (id_a, id_b, shared, n_a, n_b, containment) with
    id_a < id_b; containment rounded to 6dp (engine-exact). Documents
    too short to emit a fingerprint (< window+shingle_k-1 tokens)
    cannot appear — chunk-level dedup for sub-shingle texts is
    segment_dedup's job.
    """
    from .text import winnow_fingerprints

    fps = winnow_fingerprints(df, col, id_col, shingle_k=shingle_k, window=window)
    if materialize:
        fps = fps.localCheckpoint()
    sizes = fps.groupBy(id_col).agg(F.count(F.lit(1)).alias("_n_fp"))
    posting = fps.groupBy("fingerprint").agg(F.count(F.lit(1)).alias("_p"))
    kept = fps.join(
        posting.filter(F.col("_p") > max_posting).select("fingerprint"),
        on="fingerprint",
        how="left_anti",
    )
    # kept feeds BOTH sides of the pair self-join and Spark duplicates
    # the anti-join subtree per side (self-joins never share a plan
    # fragment) — checkpoint it so the posting filter runs once
    # (measured: the duplicated subtree was 2 of the plan's 6
    # post-checkpoint passes over the fingerprint frame).
    if materialize:
        kept = kept.localCheckpoint()
    a = kept.select(F.col(id_col).alias("id_a"), "fingerprint")
    b = kept.select(F.col(id_col).alias("id_b"), "fingerprint")
    shared = (
        a.join(b, on="fingerprint")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    out = (
        shared.join(
            sizes.select(F.col(id_col).alias("id_a"), F.col("_n_fp").alias("n_a")), "id_a"
        )
        .join(
            sizes.select(F.col(id_col).alias("id_b"), F.col("_n_fp").alias("n_b")), "id_b"
        )
        .withColumn(
            "containment",
            F.round(F.col("shared") / F.least("n_a", "n_b"), 6),
        )
        .select("id_a", "id_b", "shared", "n_a", "n_b", "containment")
    )
    return out.filter(F.col("containment") >= threshold)


def incremental_containment_pairs(
    spark,
    new_docs: DataFrame,
    store_dir: str,
    run_id: str,
    col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
    window: int = 4,
    threshold: float = 0.8,
    max_posting: int = 5_000,
    commit: bool = True,
) -> DataFrame:
    """Cross-run partial-copy pairs: new docs vs themselves AND the
    corpus so far — the winnowing twin of ``incremental_lsh_candidates``
    (same store protocol, same join geometry, same parity claim).

    The persisted artifact is the winnowed fingerprint assignment
    (doc_id, fingerprint, n_fp, run_id) — roughly tokens/``window`` rows
    per document, appended per ingest run; n_fp is denormalized onto
    every row so the OLD side's containment denominator comes off the
    store without a corpus-wide aggregate. Each increment costs O(new
    docs) fingerprinting plus ONE equi-join of the new rows against the
    store; re-running the full corpus join per ingest (the batch
    alternative) is linear in corpus size and simply not runnable at
    continuous-ingest scale — the band store's argument verbatim.

    Returns (id_a, id_b, shared, n_a, n_b, containment, pair_kind) where
    at least one side is new: ``new_new`` (both ingested now, id_a <
    id_b) and ``new_old`` (id_a = least, id_b = greatest). Old-old pairs
    were reported when THEIR run ingested them. The union over all runs
    equals one full-batch ``containment_pairs`` over the whole corpus
    (pinned by test) provided ``max_posting`` doesn't bite — the posting
    census runs over the UNION of store + new rows, so a fingerprint can
    cross the cap in a later run than it would in full batch.

    Commit protocol mirrors incremental_lsh_candidates: rows are
    appended (with run_id) BEFORE the returned plan is consumed; the old
    side filters ``run_id != this run`` so the append is invisible to
    the computation that follows, and a crash-retry with the same run_id
    is safe (fingerprint rows are pure functions of content — the
    dropDuplicates on read collapses retried appends). Doc ids are
    immutable; re-ingesting an id with CHANGED content leaves both
    fingerprint sets live — exact_dedup upstream first.
    """
    from .text import winnow_fingerprints

    fps = winnow_fingerprints(new_docs, col, id_col, shingle_k=shingle_k, window=window)
    sizes = fps.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_fp"))
    fps_new = (
        fps.join(sizes, on=id_col)
        .select(F.col(id_col).alias("_id"), "fingerprint", "n_fp")
        .localCheckpoint()  # consumed by census, both joins, and the append
    )

    if commit:
        (
            fps_new.select(
                F.col("_id").alias("doc_id"),
                "fingerprint",
                "n_fp",
                F.lit(run_id).alias("run_id"),
            )
            .write.mode("append")
            .parquet(store_dir)
        )

    try:
        old = (
            spark.read.parquet(store_dir)
            .filter(F.col("run_id") != F.lit(run_id))
            .select(F.col("doc_id").alias("_id"), "fingerprint", "n_fp")
            .dropDuplicates(["_id", "fingerprint"])
        )
    except AnalysisException:  # first run: store path absent (and commit=False);
        # any OTHER read failure (corrupt store, FS error) must fail loudly —
        # swallowing it would silently drop every new_old pair (r4 advice)
        old = fps_new.filter(F.lit(False))

    return incremental_pairs_from_fingerprints(
        fps_new, old, threshold=threshold, max_posting=max_posting
    )


def incremental_pairs_from_fingerprints(
    fps_new: DataFrame,
    fps_old: DataFrame,
    threshold: float = 0.8,
    max_posting: int = 5_000,
) -> DataFrame:
    """Pure-plan core of incremental_containment_pairs: pairs touching
    the new side. Both inputs are (_id, fingerprint, n_fp) frames.
    Exposed separately so the store-free form is directly testable."""
    all_rows = fps_new.unionByName(fps_old)
    oversized = (
        all_rows.groupBy("fingerprint")
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") > max_posting)
        .select("fingerprint")
    )
    kept_new = fps_new.join(F.broadcast(oversized), ["fingerprint"], "left_anti")
    kept_old = fps_old.join(F.broadcast(oversized), ["fingerprint"], "left_anti")

    def score(pairs):
        return pairs.withColumn(
            "containment", F.round(F.col("shared") / F.least("n_a", "n_b"), 6)
        ).filter(F.col("containment") >= threshold)

    a, b = kept_new.alias("a"), kept_new.alias("b")
    new_new = score(
        a.join(b, on="fingerprint")
        .filter(F.col("a._id") < F.col("b._id"))
        .groupBy(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .agg(
            F.count(F.lit(1)).alias("shared"),
            F.min("a.n_fp").alias("n_a"),  # constant per pair; min = the value
            F.min("b.n_fp").alias("n_b"),
        )
    ).withColumn("pair_kind", F.lit("new_new"))
    n, o = kept_new.alias("n"), kept_old.alias("o")
    lo = F.col("n._id") < F.col("o._id")
    new_old = score(
        n.join(o, on="fingerprint")
        .filter(F.col("n._id") != F.col("o._id"))  # re-ingested id meets its own rows
        .groupBy(
            F.least(F.col("n._id"), F.col("o._id")).alias("id_a"),
            F.greatest(F.col("n._id"), F.col("o._id")).alias("id_b"),
        )
        .agg(
            F.count(F.lit(1)).alias("shared"),
            F.min(F.when(lo, F.col("n.n_fp")).otherwise(F.col("o.n_fp"))).alias("n_a"),
            F.min(F.when(lo, F.col("o.n_fp")).otherwise(F.col("n.n_fp"))).alias("n_b"),
        )
    ).withColumn("pair_kind", F.lit("new_old"))
    return new_new.unionByName(new_old)


def doc_segments(
    df: DataFrame, col: str = "text", id_col: str = "doc_id", seg_tokens: int = 16
) -> DataFrame:
    """(id, seg_idx, seg) rows: fixed-width ``seg_tokens``-token segments.

    Fixed-width token windows rather than newline paragraphs so the
    operator is content-agnostic (code, prose, single-line docs all
    segment); a delimiter-based splitter is a one-line swap of the
    segment array expression. All JVM array ops — the explode fans out
    map-side, no Python.
    """
    # Token array bound as a lambda variable (see word_shingles): an
    # inline tokens() inside the slice would re-split the text per
    # SEGMENT — O(n²) per doc in interpreted HOF evaluation.
    def mk(tk: Column) -> Column:
        n = F.size(tk)
        nseg = F.ceil(n / F.lit(seg_tokens)).cast("int")
        return F.when(n <= 0, F.array().cast("array<string>")).otherwise(
            F.transform(
                F.sequence(F.lit(0), nseg - 1),
                lambda i: F.concat_ws(" ", F.slice(tk, i * seg_tokens + 1, seg_tokens)),
            )
        )

    segs_arr = F.element_at(F.transform(F.array(tokens(col)), mk), 1)
    return df.select(F.col(id_col), F.posexplode(segs_arr).alias("seg_idx", "seg"))


def segment_dedup(
    df: DataFrame, col: str = "text", id_col: str = "doc_id", seg_tokens: int = 16
) -> DataFrame:
    """C4-style corpus-wide segment dedup: every repeated segment keeps
    only its first occurrence (min (id, seg_idx)); docs are reassembled
    from their surviving segments in order.

    Output: (id, clean_text, n_kept, n_segments) — one row per input
    doc, docs whose every segment was deduped away (or that were empty)
    survive with clean_text = '' / n_kept = 0.

    Scale: one shuffle keyed by the segment STRING (uniform hash
    distribution; boilerplate mega-segments are single keys whose
    row_number scan is linear), one reassembly shuffle keyed by doc id.
    Segment text rides both shuffles — unavoidable for reassembly, and
    bounded by the input size; the dedup DECISION itself could run on
    xxhash64(seg) alone, but keying on the string keeps the semantics
    collision-free and engine-reproducible.
    """
    segs = doc_segments(df, col, id_col, seg_tokens)
    w = Window.partitionBy("seg").orderBy(F.col(id_col).asc(), F.col("seg_idx").asc())
    flagged = segs.withColumn("_keep", F.row_number().over(w) == 1)
    per_doc = flagged.groupBy(id_col).agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(
                    F.collect_list(F.when(F.col("_keep"), F.struct("seg_idx", "seg")))
                ),
                lambda s: s["seg"],
            ),
        ).alias("clean_text"),
        F.sum(F.col("_keep").cast("long")).alias("n_kept"),
        F.count(F.lit(1)).alias("n_segments"),
    )
    base = df.select(F.col(id_col))
    return (
        base.join(per_doc, on=id_col, how="left")
        .select(
            F.col(id_col),
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
            F.coalesce("n_segments", F.lit(0)).cast("long").alias("n_segments"),
        )
    )
