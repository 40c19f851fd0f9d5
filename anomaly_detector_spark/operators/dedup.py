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


def char_shingles(col: Column | str, k: int = 5) -> Column:
    """Character k-shingles of normalized text, JVM-side."""
    c = F.col(col) if isinstance(col, str) else col
    norm = F.lower(F.regexp_replace(F.coalesce(c, F.lit("")), r"\s+", " "))
    n = F.greatest(F.length(norm) - (k - 1), F.lit(0))
    return F.array_distinct(
        F.transform(F.sequence(F.lit(1), n), lambda i: norm.substr(i, F.lit(k)))
    )


def word_shingles(col: Column | str, k: int = 3) -> Column:
    """Word k-shingles (n-grams joined by space), JVM-side."""
    toks = tokens(col)
    n = F.greatest(F.size(toks) - (k - 1), F.lit(0))
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), n),
            lambda i: F.concat_ws(" ", F.slice(toks, i, k)),
        )
    )


def minhash_signature(shingles: Column, num_hashes: int = 64, seed: int = 1) -> Column:
    """K minhash values: min over shingles of xxhash64(seed_i, shingle)."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda i: F.array_min(F.transform(shingles, lambda s: F.xxhash64(i + seed, s))),
    )


def minhash_lsh_candidates(
    df: DataFrame,
    col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    seed: int = 1,
) -> DataFrame:
    """Candidate near-duplicate pairs (id_a < id_b) via banded MinHash LSH.

    rows_per_band = num_hashes / bands; a pair is a candidate if any band
    of their signatures matches exactly. Output: (id_a, id_b, n_bands)
    with n_bands = number of matching bands.
    """
    assert num_hashes % bands == 0
    r = num_hashes // bands
    sig = minhash_signature(word_shingles(col, shingle_k), num_hashes, seed)
    withsig = df.select(F.col(id_col).alias("_id"), sig.alias("_sig")).filter(
        F.size(F.col("_sig")) > 0
    )
    banded = withsig.select(
        "_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band_idx"),
                    F.xxhash64(F.concat_ws(",", F.transform(
                        F.slice(F.col("_sig"), b * r + 1, r), lambda x: x.cast("string")
                    ))).alias("band_hash"),
                ),
            )
        ).alias("band"),
    ).select("_id", F.col("band.band_idx").alias("band_idx"), F.col("band.band_hash").alias("band_hash"))
    a = banded.alias("a")
    b = banded.alias("b")
    pairs = (
        a.join(b, on=["band_idx", "band_hash"], how="inner")
        .filter(F.col("a._id") < F.col("b._id"))
        .groupBy(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_bands"))
    )
    return pairs


def jaccard_pairs(
    df: DataFrame,
    candidates: DataFrame,
    col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
    threshold: float = 0.7,
) -> DataFrame:
    """Exact n-gram Jaccard verification of candidate pairs (JVM set ops)."""
    sh = df.select(F.col(id_col).alias("_id"), word_shingles(col, shingle_k).alias("_sh"))
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


def _bit_mask(bit: int) -> int:
    """Signed-64 literal for 1<<bit (bit 63 wraps to the sign bit)."""
    return (1 << bit) if bit < 63 else -(1 << 63)


def with_simhash64(
    df: DataFrame, col: str = "text", id_col: str = "doc_id", out: str = "simhash"
) -> DataFrame:
    """64-bit SimHash per document — single-pass explode + groupBy.

    bit b of the signature is 1 iff sum over tokens of (+1 if
    xxhash64(token) has bit b set else -1) is positive. The explode
    fans token hashing across executors; 64 conditional sums run in one
    partial-aggregated groupBy (map-side combine), so the shuffle
    carries 64 longs per document regardless of document size. Bit
    masks are Python int literals (no Column shift ops).
    """
    h = F.xxhash64(F.col("_tok"))
    votes = [
        F.sum(
            F.when(h.bitwiseAND(F.lit(_bit_mask(b))) != 0, F.lit(1)).otherwise(F.lit(-1))
        ).alias(f"_v{b}")
        for b in range(64)
    ]
    agg = (
        df.select(F.col(id_col), F.explode(tokens(col)).alias("_tok"))
        .groupBy(id_col)
        .agg(*votes)
    )
    sig = None
    for b in range(64):
        term = F.when(F.col(f"_v{b}") > 0, F.lit(_bit_mask(b)).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        sig = term if sig is None else sig.bitwiseOR(term)
    sigs = agg.select(F.col(id_col), sig.alias(out))
    return df.join(sigs, on=id_col, how="left").withColumn(out, F.coalesce(F.col(out), F.lit(0)))


def simhash_near_dups(
    df: DataFrame, col: str = "text", id_col: str = "doc_id", max_hamming: int = 3, blocks: int = 4
) -> DataFrame:
    """Near-dup pairs by SimHash: block the 64-bit signature into
    ``blocks`` chunks; by pigeonhole, any pair within ``max_hamming``
    (< blocks) shares at least one exact block → bucket join per block,
    then exact hamming filter via bit_count(xor).
    """
    width = 64 // blocks
    sigs = with_simhash64(
        df.select(F.col(id_col).alias("_id"), F.col(col)), col, "_id", "_sig"
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
