"""Line-level boilerplate detection: corpus-frequent lines per document.

The sub-document sibling of vendored-content detection
(operators/codescan.py vendored_content): a license header, a
copyright banner, or a generated-file preamble repeats across
thousands of files WITHOUT the files being duplicates — invisible to
(repo,path,commit) uniqueness, to whole-content vendoring, and mostly
to MinHash (the boilerplate is a minority of each doc's shingles).
For a training corpus that repeated mass is memorization fodder; the
standard pipeline treatment (CCNet / RefinedWeb line dedup) is to
measure and strip it.

Operators:

* ``doc_lines``          — explode content into (doc, pos, line) rows;
                           trims and drops trivially-short lines (a
                           ``}`` line repeating everywhere is syntax,
                           not boilerplate).
* ``line_frequency``     — distinct-doc count per line, keyed by the
                           line HASH so the wide shuffles carry 16-byte
                           rows, never line text.
* ``boilerplate_share``  — per-document share of eligible line
                           instances whose line occurs in >= min_docs
                           distinct documents.
* ``strip_boilerplate``  — enforcement twin (the redact_secrets
                           pattern): rebuild content with frequent
                           eligible lines removed, all other lines and
                           their order preserved byte-exactly.

Scale shape: one explode (map-side, no shuffle), ONE partial-aggregated
shuffle of (line_hash, doc_hash) slim pairs for the frequency frame,
one equi-join back on the uniform line_hash, one aggregate on the doc
key. The exploded lines frame feeds two consumers (frequency + join
side); unlike checks/fd.py's O(distinct cells) frames it is O(total
lines) — a localCheckpoint would persist more bytes than the source's
content column, so the default recomputes it (two pruned scans of
``content`` only) and ``materialize=True`` is the knob for inputs
where a second scan is the worse trade.

``hash_fn='xxhash64'`` is the production key; the DuckDB oracle
groups by the raw line TEXT instead (equivalent answer, no portable
xxhash in SQL) — the minhash sha-twin precedent, but here the hash
never reaches the output so no twin mode is needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DOC_KEY = ["repo", "path", "commit"]


def doc_lines(
    df: DataFrame,
    id_cols: list[str] | None = None,
    col: str = "content",
    min_len: int = 16,
) -> DataFrame:
    """(id_cols..., pos, line) — trimmed, short/empty lines dropped.

    ``pos`` is the 0-based line index in the ORIGINAL content, so the
    enforcement twin can reassemble order even after filtering."""
    ids = list(id_cols) if id_cols is not None else DOC_KEY
    return (
        df.filter(F.col(col).isNotNull())
        .select(*ids, F.posexplode(F.split(F.col(col), "\n")).alias("pos", "_raw"))
        .select(*ids, "pos", F.trim(F.col("_raw")).alias("line"))
        .filter(F.length("line") >= min_len)
    )


def line_frequency(
    lines: DataFrame,
    id_cols: list[str] | None = None,
) -> DataFrame:
    """(line_hash, n_docs) — distinct documents containing each line.

    Dedup to (doc_hash, line_hash) first (a doc repeating its own line
    100x is one document), then count per line_hash. Both hashes are
    computed map-side; the shuffle never carries text."""
    ids = list(id_cols) if id_cols is not None else DOC_KEY
    pairs = lines.select(
        F.xxhash64("line").alias("line_hash"),
        F.xxhash64(*[F.col(c) for c in ids]).alias("_doc"),
    ).distinct()
    return pairs.groupBy("line_hash").agg(F.count(F.lit(1)).alias("n_docs"))


def boilerplate_share(
    df: DataFrame,
    id_cols: list[str] | None = None,
    col: str = "content",
    min_len: int = 16,
    min_docs: int = 5,
    extra_cols: list[str] | None = None,
    history: DataFrame | None = None,
) -> DataFrame:
    """Per-document boilerplate mass: (id_cols..., [extra_cols...,]
    n_lines, n_boiler, boiler_share).

    ``n_lines`` counts eligible line INSTANCES (length >= min_len after
    trim); ``n_boiler`` those whose line text occurs in >= min_docs
    distinct documents corpus-wide. Documents with no eligible lines
    (or NULL content) are absent from the output — gate with min_rows
    upstream. ``extra_cols`` (e.g. the partition column) ride the
    explode so the check never joins back to the source.

    ``history``: optional (line_hash, n_docs) frame from
    ``load_line_frequency`` — historical counts SUM with this batch's,
    so an incremental batch scores against the corpus-so-far (a
    license header frequent in past runs flags today's single new copy
    — the in-batch count alone would not). Batch == incremental
    equality under disjoint runs is test-pinned."""
    ids = list(id_cols) if id_cols is not None else DOC_KEY
    carry = list(extra_cols or [])
    lines = doc_lines(df, ids + carry, col, min_len)
    freq = line_frequency(lines, ids)
    if history is not None:
        freq = (
            freq.unionByName(history.select("line_hash", "n_docs"))
            .groupBy("line_hash")
            .agg(F.sum("n_docs").alias("n_docs"))
        )
    tagged = lines.select(
        *ids, *carry, F.xxhash64("line").alias("line_hash")
    ).join(freq, "line_hash", "left")
    return tagged.groupBy(*ids, *carry).agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum((F.coalesce(F.col("n_docs"), F.lit(0)) >= min_docs).cast("long")).alias(
            "n_boiler"
        ),
        F.round(
            F.sum((F.coalesce(F.col("n_docs"), F.lit(0)) >= min_docs).cast("double"))
            / F.count(F.lit(1)),
            6,
        ).alias("boiler_share"),
    )


def append_line_frequency(
    df: DataFrame,
    store_dir: str,
    run_id: str,
    id_cols: list[str] | None = None,
    col: str = "content",
    min_len: int = 16,
) -> None:
    """Persist this batch's (line_hash, n_docs) rows — the cross-run
    boilerplate store (the KMV/band-store pattern): each run appends
    its per-line distinct-doc counts; readers SUM per line_hash, which
    is exact under incremental ingestion (every document arrives in
    exactly one run — the same single-arrival caveat the membership
    and novelty stores document). Re-validating the same documents in
    two runs over-counts their lines; use revalidation runs with a
    fresh store. Rows are O(distinct lines) per run; compaction =
    ``plans/stores.py compact_store(..., 'linefreq')``."""
    ids = list(id_cols) if id_cols is not None else DOC_KEY
    freq = line_frequency(doc_lines(df, ids, col, min_len), ids).select(
        F.lit(run_id).alias("run_id"), "line_hash", "n_docs"
    )
    freq.write.mode("append").parquet(store_dir)


def load_line_frequency(spark, store_dir: str) -> DataFrame:
    """Summed (line_hash, n_docs) across every persisted run."""
    return (
        spark.read.parquet(store_dir)
        .groupBy("line_hash")
        .agg(F.sum("n_docs").alias("n_docs"))
    )


def strip_boilerplate(
    df: DataFrame,
    id_cols: list[str] | None = None,
    col: str = "content",
    min_len: int = 16,
    min_docs: int = 5,
    broadcast_freq: bool = True,
) -> DataFrame:
    """Rebuild ``col`` with corpus-frequent eligible lines removed —
    the publish-scrubbed-corpus enforcement twin (redact_secrets
    pattern). Ineligible lines (short/empty after trim) are always
    kept BYTE-EXACT (untrimmed), and surviving line order is restored
    from the explode position, so a clean document round-trips
    identically. Rows with NULL content pass through untouched.

    Plan: the same frequency aggregate as boilerplate_share, joined to
    ALL exploded lines (kept untrimmed alongside the eligibility key),
    then one aggregate per doc rebuilds the text via sort_array over
    (pos, line) structs — no window, no second source join; the
    original row's other columns ride the explode.

    The frequent-line set is the HEAD of the frequency distribution
    (lines in >= min_docs docs) — small by construction for real
    corpora, so it broadcasts; ``broadcast_freq=False`` is the escape
    hatch for degenerate inputs where the head itself is huge (the
    join stays a plain equi-join on the uniform hash).

    A document whose every line is stripped (all-boilerplate) keeps
    its row with empty content — enforcement rewrites rows, it never
    drops them (row-count parity with the input is pinned in tests)."""
    ids = list(id_cols) if id_cols is not None else DOC_KEY
    others = [c for c in df.columns if c not in ids and c != col]
    src = df.filter(F.col(col).isNotNull())
    all_lines = src.select(
        *ids, *others, F.posexplode(F.split(F.col(col), "\n")).alias("pos", "_raw")
    ).withColumn("_t", F.trim(F.col("_raw")))
    eligible = F.length("_t") >= min_len
    freq = line_frequency(
        all_lines.filter(eligible).select(*ids, F.col("_t").alias("line")), ids
    ).filter(F.col("n_docs") >= min_docs)
    fr = freq.select(F.col("line_hash").alias("_lh"), "n_docs")
    if broadcast_freq:
        fr = F.broadcast(fr)
    tagged = all_lines.withColumn(
        "_lh", F.when(eligible, F.xxhash64("_t"))
    ).join(fr, "_lh", "left")
    # collect_list skips NULL entries, so stripped lines drop out while
    # the doc's group (and output row) survives even when EVERY line is
    # stripped — enforcement rewrites rows, never drops them.
    keep_struct = F.when(
        F.col("n_docs").isNull(), F.struct(F.col("pos"), F.col("_raw").alias("line"))
    )
    rebuilt = tagged.groupBy(*ids).agg(
        *[F.first(c).alias(c) for c in others],
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(keep_struct)), lambda s: s["line"]
            ),
            "\n",
        ).alias(col),
    )
    nulls = df.filter(F.col(col).isNull()).select(*ids, *others, col)
    return rebuilt.select(*ids, *others, col).unionByName(nulls)
