"""Z-order data layout: multi-dimensional clustering for scan pruning.

The engine's north-star table is an Iceberg source-code table at 10^12
files (BASELINE.json north_rule). At that scale the dominant cost of
every validation pass is the scan, and the dominant scan optimization is
FILE PRUNING: parquet/Iceberg keep per-file (and per-row-group) min/max
for every column, and the reader skips files whose ranges cannot match
the predicate. A table clustered on one sort key prunes one dimension;
a table rewritten in Z-ORDER (bit-interleaved space-filling curve over
several normalized dimensions) keeps per-file ranges tight on EVERY
clustered dimension at once, so multi-dimensional box predicates
(``ts BETWEEN .. AND value BETWEEN ..``) prune multiplicatively. This is
the standard Iceberg/Delta ``rewrite_data_files(strategy => 'sort',
sort_order => 'zorder(..)')`` maintenance job, re-expressed as a plain
DataFrame transform so it runs anywhere this engine runs.

Scale design — the whole operator is three cheap pieces:

1. one global 1-row aggregate (min/max per dimension) broadcast back —
   O(dims) doubles over the wire, partial-aggregated map-side;
2. the z-key itself: a pure codegen'd integer column expression
   (unrolled shift/mask/or — no UDF, no shuffle, whole-stage codegen);
3. ``repartitionByRange(zkey)`` + ``sortWithinPartitions(zkey)`` — ONE
   range exchange (boundaries from Spark's reservoir sample), then a
   local sort; the write inherits tight per-file ranges.

The z-key uses RANK NORMALIZATION against the global min/max: each
dimension is scaled to an unsigned ``bits``-wide integer before
interleaving, so dimensions with wildly different units (microsecond
epochs vs small doubles) contribute equal resolution. Skewed dimensions
keep locality but allocate curve resolution unevenly — for heavy skew,
pre-transform the column (e.g. log) before clustering; the operator
takes arbitrary Column expressions, not just names.

Reference tie-in: the reference has no layout machinery (single-node,
one pandas frame — /root/reference/algo/operator.py:130-152 just
pickles state); this operator exists for the 10^12-row reframing, where
partition/file pruning is the difference between scanning 100 TB and
scanning the one repo a query touches.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "zorder_key",
    "add_zorder",
    "cluster_write",
    "parquet_file_ranges",
    "file_sizes",
    "compaction_plan",
    "rewrite_compacted",
    "sweep_depth",
    "file_col_ranges",
    "clustering_health",
]


def _rank(col: Column, cmin: Column, cmax: Column, bits: int) -> Column:
    """Scale ``col`` to an integer in [0, 2^bits - 1] given global min/max.

    Pure double arithmetic in a fixed evaluation order — ``(x - min) /
    span * K`` then floor — so an external engine (the DuckDB oracle)
    reproduces the exact same integer. NULLs and zero-span (constant)
    dimensions rank 0.
    """
    k = float((1 << bits) - 1)
    span = cmax - cmin
    scaled = F.when(span > 0, F.floor((col - cmin) / span * F.lit(k))).otherwise(F.lit(0))
    return F.coalesce(scaled, F.lit(0)).cast("long")


def zorder_key(ranks: list[Column], bits: int = 16) -> Column:
    """Bit-interleave pre-normalized integer ranks into one z-value.

    Unrolled to ``bits * len(ranks)`` shift/mask terms summed together
    (the terms occupy disjoint bits, so + is bitwise-or) — all integer
    column arithmetic, fully inside whole-stage codegen. With one rank
    this degrades gracefully to the identity (plain range clustering).
    """
    d = len(ranks)
    if d == 0:
        raise ValueError("zorder_key needs at least one rank column")
    if d == 1:
        return ranks[0]
    if bits * d > 62:
        raise ValueError(f"bits={bits} x dims={d} exceeds a signed 64-bit key")
    terms = [
        F.shiftleft(F.shiftright(r, i).bitwiseAND(F.lit(1)), i * d + j)
        for i in range(bits)
        for j, r in enumerate(ranks)
    ]
    return reduce(lambda a, b: a + b, terms)


def add_zorder(
    df: DataFrame,
    cols: list[Column | str],
    bits: int = 16,
    key_col: str = "zkey",
) -> DataFrame:
    """Append a z-order key over ``cols`` (names or Column expressions).

    Cost: one 1-row global min/max aggregate broadcast back onto the
    frame (O(dims) doubles), then a codegen'd expression per row — no
    wide shuffle, no UDF. The min/max aggregate is the only extra pass
    and is itself map-side combined.
    """
    exprs = [F.col(c).cast("double") if isinstance(c, str) else c.cast("double") for c in cols]
    aggs = []
    for i, e in enumerate(exprs):
        aggs += [F.min(e).alias(f"_zmin{i}"), F.max(e).alias(f"_zmax{i}")]
    bounds = df.agg(*aggs)
    out = df.crossJoin(F.broadcast(bounds))
    ranks = [
        _rank(e, F.col(f"_zmin{i}"), F.col(f"_zmax{i}"), bits) for i, e in enumerate(exprs)
    ]
    drop = [f"_zmin{i}" for i in range(len(exprs))] + [f"_zmax{i}" for i in range(len(exprs))]
    return out.withColumn(key_col, zorder_key(ranks, bits)).drop(*drop)


def cluster_write(
    df: DataFrame,
    cols: list[Column | str],
    path: str,
    n_files: int = 16,
    bits: int = 16,
    mode: str = "overwrite",
) -> None:
    """Rewrite ``df`` as parquet clustered on the z-order of ``cols``.

    ``repartitionByRange`` puts contiguous z-ranges in the same output
    file; ``sortWithinPartitions`` tightens row-group-level ranges
    inside each file. The key itself is dropped before the write — the
    value is the LAYOUT (tight per-file min/max on every clustered
    column), not the column. At cluster scale this is the compaction /
    rewrite job you run once per ingest cycle so every later validation
    scan prunes; locally it is just a write with one range exchange.
    """
    z = add_zorder(df, cols, bits=bits)
    (
        z.repartitionByRange(n_files, F.col("zkey"))
        .sortWithinPartitions("zkey")
        .drop("zkey")
        .write.mode(mode)
        .parquet(path)
    )


def parquet_file_ranges(path: str, cols: list[str]):
    """Per-file (min, max) ranges from parquet footers — the pruning view.

    Returns a pandas frame with one row per data file and
    ``{col}_min`` / ``{col}_max`` columns aggregated across that file's
    row groups, i.e. exactly the statistics a reader's file-pruning
    step consults. Driver-side and footer-only (no data pages are read);
    used by tests and by operators that want to measure how many files a
    box predicate would touch under a given layout.
    """
    import glob as _glob
    import os

    import pandas as pd
    import pyarrow.parquet as pq

    rows = []
    for f in sorted(_glob.glob(os.path.join(path, "*.parquet"))):
        md = pq.ParquetFile(f).metadata
        row: dict = {"file": os.path.basename(f), "n_rows": md.num_rows}
        if md.num_rows == 0:
            continue
        names = {md.schema.column(i).name: i for i in range(md.num_columns)}
        for c in cols:
            lo, hi = None, None
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(names[c]).statistics
                if st is None or not st.has_min_max:
                    lo, hi = None, None
                    break
                lo = st.min if lo is None else min(lo, st.min)
                hi = st.max if hi is None else max(hi, st.max)
            row[f"{c}_min"], row[f"{c}_max"] = lo, hi
        rows.append(row)
    return pd.DataFrame(rows)


def file_sizes(spark, files) -> "DataFrame":
    """Per-file (file, n_rows, n_bytes) read distributedly from footers
    and the filesystem — the compaction planner's inventory. Same
    mapInPandas shape as checks/metadata.py footer_stats: O(files)
    KB-sized metadata reads, zero data pages. ``files`` is a path list or
    a 1-column DataFrame (at 10^12 files, pass the Iceberg manifest's
    file list, never a driver glob)."""
    if isinstance(files, DataFrame):
        paths = files.select(F.col(files.columns[0]).alias("file"))
    else:
        paths = spark.createDataFrame([(f,) for f in files], "file string")

    def kernel(batches):
        import os

        import pandas as pd
        import pyarrow.parquet as pq

        for pdf in batches:
            out = {"file": [], "n_rows": [], "n_bytes": []}
            for f in pdf["file"]:
                out["file"].append(f)
                out["n_rows"].append(pq.ParquetFile(f).metadata.num_rows)
                out["n_bytes"].append(os.path.getsize(f))
            yield pd.DataFrame(out)

    return paths.mapInPandas(kernel, "file string, n_rows long, n_bytes long")


def compaction_plan(
    sizes: DataFrame, target_bytes: int, order_chunks: int = 1024
) -> DataFrame:
    """Metadata-only small-file compaction plan: (file, n_rows, n_bytes,
    action, group_id).

    The small-files problem at 10^12-file scale: every file costs a
    footer read, a task, and a catalog entry per scan, so a table that
    accretes KB-sized files from incremental ingest gets slower to
    validate even when total bytes are flat. This planner bins every
    file SMALLER than ``target_bytes`` into ~target-sized rewrite groups
    (``action='compact'``, contiguous ``group_id``); files already at or
    above target are healthy and left alone (``action='keep'``,
    group_id NULL — rewriting them buys nothing).

    Packing is the engine's two-phase prefix sum (corpus.py
    token_budget_shards), keyed here by the (xxhash64(file), file) total
    order: group_id = exclusive_prefix_sum(n_bytes) div target. The hash
    order makes the order-chunking uniform without a global row_number
    (chunk = hash div 2^64/order_chunks is order-CONSISTENT with the
    hash itself), at the cost of path locality within groups — this is
    bin-packing compaction, same contract as Iceberg's binpack rewrite;
    use cluster_write for a clustering rewrite. A group's size is
    bounded by target_bytes + the largest member (first-byte rule), and
    group count is ceil(total_small_bytes / target).
    """
    chunk_w = (1 << 64) // order_chunks
    sized = sizes.select(
        "file", "n_rows", "n_bytes", F.xxhash64("file").alias("_h")
    ).withColumn("_grp", F.expr(f"_h div {chunk_w}"))
    small = sized.filter(F.col("n_bytes") < target_bytes).localCheckpoint()

    grp_tot = small.groupBy("_grp").agg(F.sum("n_bytes").alias("_gsum"))
    w_off = Window.orderBy("_grp").rowsBetween(Window.unboundedPreceding, -1)
    offsets = grp_tot.select(
        "_grp", F.coalesce(F.sum("_gsum").over(w_off), F.lit(0)).alias("_off")
    )
    w_in = (
        Window.partitionBy("_grp")
        .orderBy("_h", "file")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    packed = (
        small.join(F.broadcast(offsets), "_grp")
        .withColumn(
            "_pre", F.col("_off") + F.coalesce(F.sum("n_bytes").over(w_in), F.lit(0))
        )
        .select("file", F.expr(f"_pre div {int(target_bytes)}").alias("group_id"))
    )
    return (
        sized.join(packed, "file", "left")
        .select(
            "file",
            "n_rows",
            "n_bytes",
            F.when(F.col("n_bytes") < target_bytes, F.lit("compact"))
            .otherwise(F.lit("keep"))
            .alias("action"),
            "group_id",
        )
    )


def sweep_depth(
    ranges: DataFrame,
    lo_col: str = "lo",
    hi_col: str = "hi",
    group_cols: list[str] | None = None,
    chunks: int = 64,
) -> DataFrame:
    """Interval-stabbing depth stats per group: how many intervals overlap.

    Input: one row per interval with ``[lo_col, hi_col]`` (inclusive,
    NULL-range rows are dropped); output one row per ``group_cols``
    combination with ``n_intervals``, ``avg_depth``, ``max_depth``.
    Depth at a point x is #{intervals containing x}; it is probed at
    every interval START (depth only increases at starts, so the max
    over starts is the true max stabbing depth, and the start-weighted
    average is exactly the expected number of intervals a point lookup
    landing at a fresh interval boundary must open).

    This is the classic sweep — sort boundary events, running-sum the
    +1/-1 deltas — expressed as the engine's two-phase prefix sum so no
    global window appears (corpus.py token_budget_shards is the module-
    level writeup). Order-consistent chunking comes from
    ``repartitionByRange`` itself: Spark's RangePartitioner assigns
    ascending key ranges to ascending partition ids (the same invariant
    ``df.sort`` relies on), so ``spark_partition_id()`` is a valid chunk
    key for the offsets pass. The partition ids are pinned with a
    localCheckpoint because the plan forks into two consumers and range
    boundaries are re-sampled per execution. The only global-order
    structure is the O(groups x chunks) offsets frame, broadcast back.

    Tie handling: starts sort before ends at equal value (inclusive
    intervals — an interval ending exactly at x still covers x), and
    tied starts take the max running sum over the tie group, so the
    result is deterministic even though within-tie window order is not.
    """
    g = list(group_cols or [])
    base = ranges.filter(F.col(lo_col).isNotNull() & F.col(hi_col).isNotNull())
    starts = base.select(
        *g,
        F.col(lo_col).cast("double").alias("_v"),
        F.lit(0).alias("_e"),
        F.lit(1).alias("_d"),
    )
    ends = base.select(
        *g,
        F.col(hi_col).cast("double").alias("_v"),
        F.lit(1).alias("_e"),
        F.lit(-1).alias("_d"),
    )
    ev = (
        starts.unionByName(ends)
        .repartitionByRange(chunks, *([F.col(c) for c in g] + [F.col("_v"), F.col("_e")]))
        .withColumn("_c", F.spark_partition_id())
        .localCheckpoint()
    )
    tot = ev.groupBy(*g, "_c").agg(F.sum("_d").alias("_cs"))
    w_off = (
        Window.partitionBy(*g).orderBy("_c").rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = tot.select(
        *g, "_c", F.coalesce(F.sum("_cs").over(w_off), F.lit(0)).alias("_off")
    )
    w_in = (
        Window.partitionBy(*(g + ["_c"]))
        .orderBy("_v", "_e")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # null-safe on the group dims: a NULL dimension value is a legal
    # window group and must meet its own offsets row (_c never NULL)
    from ..checks.base import null_safe_join

    run = null_safe_join(ev, offs, g + ["_c"], broadcast_right=True).withColumn(
        "_run", F.col("_off") + F.sum("_d").over(w_in)
    )
    probes = (
        run.filter(F.col("_e") == 0)
        .groupBy(*g, "_v")
        .agg(F.max("_run").alias("_depth"), F.count(F.lit(1)).alias("_n"))
    )
    return probes.groupBy(*g).agg(
        F.sum("_n").alias("n_intervals"),
        (F.sum(F.col("_depth") * F.col("_n")) / F.sum("_n")).alias("avg_depth"),
        F.max("_depth").alias("max_depth"),
    )


def file_col_ranges(spark, files, cols: list[str]) -> DataFrame:
    """Long-form per-file column ranges from parquet footers, read
    distributedly: (file, col_name, lo, hi) with lo/hi cast to double
    (timestamps become epoch seconds). Numeric/temporal columns only —
    these are the dimensions pruning reasons about. Files lacking
    min/max statistics for a column (or empty files) contribute no row
    for it. Same mapInPandas footer-only shape as ``file_sizes``."""
    if isinstance(files, DataFrame):
        paths = files.select(F.col(files.columns[0]).alias("file"))
    elif isinstance(files, str):
        import glob as _glob
        import os

        flist = sorted(_glob.glob(os.path.join(files, "*.parquet")))
        paths = spark.createDataFrame([(f,) for f in flist], "file string")
    else:
        paths = spark.createDataFrame([(f,) for f in files], "file string")
    want = list(cols)

    def kernel(batches):
        import datetime

        import pandas as pd
        import pyarrow.parquet as pq

        def as_double(v):
            if isinstance(v, datetime.datetime):
                return v.timestamp()
            return float(v)

        for pdf in batches:
            out = {"file": [], "col_name": [], "lo": [], "hi": []}
            for f in pdf["file"]:
                md = pq.ParquetFile(f).metadata
                if md.num_rows == 0:
                    continue
                names = {md.schema.column(i).name: i for i in range(md.num_columns)}
                for c in want:
                    lo, hi = None, None
                    for rg in range(md.num_row_groups):
                        st = md.row_group(rg).column(names[c]).statistics
                        if st is None or not st.has_min_max:
                            lo, hi = None, None
                            break
                        lo = st.min if lo is None else min(lo, st.min)
                        hi = st.max if hi is None else max(hi, st.max)
                    if lo is None:
                        continue
                    out["file"].append(f)
                    out["col_name"].append(c)
                    out["lo"].append(as_double(lo))
                    out["hi"].append(as_double(hi))
            yield pd.DataFrame(out).astype(
                {"file": "object", "col_name": "object", "lo": "float64", "hi": "float64"}
            )

    return paths.mapInPandas(
        kernel, "file string, col_name string, lo double, hi double"
    )


def clustering_health(spark, files, cols: list[str], chunks: int = 64) -> DataFrame:
    """Measure a layout's READ AMPLIFICATION per clustered dimension:
    (col_name, n_files, avg_depth, max_depth).

    ``avg_depth`` is the mean interval-stabbing depth of the per-file
    [min, max] ranges for that column — i.e. how many files a point
    predicate on the column must open on average under this layout.
    A perfectly clustered table has depth ~1 (disjoint file ranges); a
    layout uncorrelated with the column degrades toward depth = n_files
    (every file spans the whole domain, nothing prunes). This is the
    number that justifies (or schedules) a ``cluster_write`` rewrite:
    measure before/after, or alert when ingest churn drifts avg_depth
    above a threshold. Footer-only (no data pages), O(files) metadata
    rows into one sweep — at 10^12-file scale feed the Iceberg
    manifest's file list, never a driver glob."""
    return (
        sweep_depth(
            file_col_ranges(spark, files, cols),
            "lo",
            "hi",
            group_cols=["col_name"],
            chunks=chunks,
        )
        .withColumnRenamed("n_intervals", "n_files")
    )


def rewrite_compacted(spark, src_path: str, plan: DataFrame, dest: str) -> None:
    """Execute a compaction plan: rewrite the 'compact' files into
    ~one-file-per-group at ``dest`` (keep-files are untouched — move or
    reference them separately).

    One read of the compacted files, tagged with input_file_name, a
    broadcast join to the O(files) plan for group ids, then
    ``repartitionByRange(group_id)`` so each output partition (and file)
    holds whole groups. Row-preserving, pinned by test."""
    to_compact = plan.filter(F.col("action") == "compact").select(
        F.element_at(F.split("file", "/"), -1).alias("_base"), "group_id"
    )
    n_groups = to_compact.select("group_id").distinct().count()
    if n_groups == 0:
        return
    df = spark.read.parquet(src_path).withColumn(
        "_base", F.element_at(F.split(F.input_file_name(), "/"), -1)
    )
    (
        df.join(F.broadcast(to_compact), "_base", "inner")
        .drop("_base")
        .repartitionByRange(n_groups, F.col("group_id"))
        .drop("group_id")
        .write.mode("append")
        .parquet(dest)
    )
