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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["zorder_key", "add_zorder", "cluster_write", "parquet_file_ranges"]


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
