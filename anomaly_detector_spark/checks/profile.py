"""One-pass table profiler: per-column completeness, cardinality, and
value/length statistics over ANY table.

The reference knows its input shape a priori (one value column per
device, util/config.py); a validation engine pointed at an unknown
table needs the inverse — measure first, then write constraints. This
is the Deequ-ColumnProfiler shape: a long-form report
(column, metric, value) that feeds rule authoring (null_frac -> a
completeness rule, distinct_frac ~ 1 -> a uniqueness candidate,
min/max -> range predicates).

Scale design: ONE aggregate over ONE scan for every profiled column.
Per column the expressions are type-driven (numeric/timestamp -> value
min/max/mean; string/binary -> length min/max/mean), all codegen'd.
Cardinality defaults to approx_count_distinct (HLL, map-side partial —
the 10^12-row path); ``exact=True`` switches to count(DISTINCT ...),
which Catalyst plans via Expand — still one scan, but the shuffled row
count multiplies by the number of profiled columns, so exact mode is
for oracle parity and small tables, not the default. The wide result
(one row, cols x metrics fields) is unpivoted driver-side into the
long form via ``stack`` — O(cols) literals, no second pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

METRICS = ["n_rows", "n_null", "null_frac", "n_distinct", "min", "max", "mean"]

_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)


def _value_expr(field: T.StructField) -> F.Column | None:
    """The column's 'measurable value' (numeric value, epoch seconds, or
    string/binary length); None for unmeasurable types (arrays, maps...)."""
    c = F.col(field.name)
    t = field.dataType
    if isinstance(t, _NUMERIC):
        return c.cast("double")
    if isinstance(t, T.BooleanType):
        return c.cast("int").cast("double")
    if isinstance(t, (T.TimestampType, T.TimestampNTZType, T.DateType)):
        # INTEGER epoch seconds (NTZ casts through the UTC session tz):
        # integral doubles sum exactly below 2^53, so the mean is
        # bit-deterministic across engines and partitionings — a
        # fractional-microsecond epoch's float sum at ~1e13 magnitude
        # would diverge in the rounded decimals.
        return c.cast("timestamp").cast("long").cast("double")
    if isinstance(t, T.StringType):
        return F.length(c).cast("double")
    if isinstance(t, T.BinaryType):
        return F.length(c).cast("double")
    return None


def profile_table(
    df: DataFrame,
    columns: list[str] | None = None,
    exact: bool = False,
    round_to: int = 4,
    by: str | None = None,
) -> DataFrame:
    """Long-form profile: one row per (column, metric) — or per
    (``by``-value, column, metric) when ``by`` names a partition column.

    Metrics: n_rows, n_null, null_frac, n_distinct, and — where the type
    is measurable — min/max/mean of the value (numerics/timestamps) or of
    the length (strings/binaries). Unmeasurable types report the first
    four only. For string columns min/max/mean describe LENGTHS, which is
    what a length-cap or empty-string rule needs.

    The grouped form stays ONE aggregate over ONE scan (now a
    partial-aggregated groupBy shuffle of O(partitions) wide rows); the
    unpivot branches all select the same aggregated frame.
    """
    fields = {f.name: f for f in df.schema.fields}
    columns = columns or [n for n in fields if n != by]
    aggs: list[F.Column] = [F.count(F.lit(1)).alias("__n")]
    for name in columns:
        c = F.col(name)
        aggs.append(F.sum(c.isNull().cast("long")).alias(f"__null_{name}"))
        aggs.append(
            (F.count_distinct(c) if exact else F.approx_count_distinct(c)).alias(
                f"__dist_{name}"
            )
        )
        v = _value_expr(fields[name])
        if v is not None:
            aggs.append(F.min(v).alias(f"__min_{name}"))
            aggs.append(F.max(v).alias(f"__max_{name}"))
            aggs.append(F.avg(v).alias(f"__mean_{name}"))
    wide = df.groupBy(by).agg(*aggs) if by is not None else df.agg(*aggs)

    parts: list[DataFrame] = []
    for name in columns:
        measurable = _value_expr(fields[name]) is not None
        pairs = [
            ("n_rows", "CAST(__n AS DOUBLE)"),
            ("n_null", f"CAST(__null_{name} AS DOUBLE)"),
            ("null_frac", f"ROUND(__null_{name} / CAST(__n AS DOUBLE), {round_to})"),
            ("n_distinct", f"CAST(__dist_{name} AS DOUBLE)"),
        ]
        if measurable:
            pairs += [
                ("min", f"ROUND(__min_{name}, {round_to})"),
                ("max", f"ROUND(__max_{name}, {round_to})"),
                ("mean", f"ROUND(__mean_{name}, {round_to})"),
            ]
        body = ", ".join(f"'{m}', {e}" for m, e in pairs)
        sel = [
            f"'{name}' AS `column`",
            f"stack({len(pairs)}, {body}) AS (metric, value)",
        ]
        if by is not None:
            sel.insert(0, f"`{by}`")
        parts.append(wide.selectExpr(*sel))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def suggest_rules(
    df: DataFrame,
    partition_col: str = "lang",
    columns: list[str] | None = None,
    max_domain: int = 20,
    length_headroom: float = 2.0,
    min_rows: int = 25,
    exact: bool = False,
):
    """Profile-driven constraint suggestion (the Deequ
    ConstraintSuggestion shape): measure a trusted snapshot, emit the
    CheckSpecs that encode its status quo, then run them against future
    snapshots ("suggest on yesterday, validate today").

    Heuristics, all deterministic from the profile:

    * ``null_frac == 0``                  -> completeness rule;
    * string column with ``0 < n_distinct <= max_domain``
                                          -> accepted_values over the
      observed domain (collected sorted — one tiny job per such column,
      bounded by max_domain rows);
    * string column with observed max length L
                                          -> size predicate
      ``length(col) <= ceil(L * length_headroom)``.

    Driver-side authoring tool: one profile pass + one small job per
    domain column; the OUTPUT is a plain list[CheckSpec] for run_suite /
    run_with_manifest, so suggestion cost is paid once, never per run.
    """
    import math

    from .base import CheckSpec
    from .rowrules import run_accepted_values, run_completeness, run_row_predicate

    fields = {f.name: f for f in df.schema.fields}
    # the partition column is still a data column — a domain rule on it is
    # often exactly the constraint wanted (cf. the referential check)
    columns = columns or list(fields)
    prof = {
        (r["column"], r["metric"]): r["value"]
        for r in profile_table(df, columns=columns, exact=exact).collect()
    }
    specs: list[CheckSpec] = []
    for name in columns:
        if prof[(name, "null_frac")] == 0.0:
            specs.append(
                CheckSpec(
                    f"suggest_complete_{name}",
                    run_completeness,
                    {"column": name},
                    partition_col,
                    min_rows,
                )
            )
        is_string = isinstance(fields[name].dataType, T.StringType)
        n_distinct = prof[(name, "n_distinct")]
        if is_string and 0 < n_distinct <= max_domain:
            domain = sorted(
                r[0]
                for r in df.select(name).where(F.col(name).isNotNull()).distinct().collect()
            )
            specs.append(
                CheckSpec(
                    f"suggest_domain_{name}",
                    run_accepted_values,
                    {"column": name, "values": domain, "allow_null": prof[(name, "n_null")] > 0},
                    partition_col,
                    min_rows,
                )
            )
        if is_string and (name, "max") in prof and prof[(name, "max")] is not None:
            cap = int(math.ceil(prof[(name, "max")] * length_headroom))
            specs.append(
                CheckSpec(
                    f"suggest_maxlen_{name}",
                    run_row_predicate,
                    {"expr": f"length({name}) <= {cap} OR {name} IS NULL"},
                    partition_col,
                    min_rows,
                )
            )
    return specs


def suggest_sweep(
    df: DataFrame,
    columns: list[str] | None = None,
    buckets: int = 50,
    exact: bool = False,
) -> dict[str, float]:
    """Profile-driven column set for run_drift_sweep: ``{column:
    bucket_width}`` with width = observed (max - min) / buckets (string
    columns: length range — the same measure the sweep buckets), floored
    at a width of 1. Constant columns (max == min) and unmeasurable
    types are skipped — a one-bucket histogram can't drift.

    The authoring companion to suggest_rules: profile a trusted snapshot
    once (one scan), then declare ``{"check": "drift_sweep", "columns":
    <this>}`` — every measurable column watched for distribution drift
    from a single extra scan per run.
    """
    fields = {f.name: f for f in df.schema.fields}
    columns = columns or [
        n for n in fields if _value_expr(fields[n]) is not None
    ]
    prof = {
        (r["column"], r["metric"]): r["value"]
        for r in profile_table(df, columns=columns, exact=exact).collect()
    }
    out: dict[str, float] = {}
    for name in columns:
        lo, hi = prof.get((name, "min")), prof.get((name, "max"))
        if lo is None or hi is None or hi <= lo:
            continue
        out[name] = max(1.0, round((hi - lo) / buckets, 4))
    return out


def top_values(df: DataFrame, column: str, k: int = 5) -> DataFrame:
    """Exact top-k most frequent values of one column (NULL included as a
    value): groupBy + TakeOrdered — map-side combined count shuffle of
    O(distinct) rows, no global sort. Deterministic tie-break on value."""
    return (
        df.groupBy(F.col(column).cast("string").alias("value"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc_nulls_last("value"))
        .limit(k)
    )


def skew_profile(
    df: DataFrame,
    cols: list[str],
    k: int = 10,
    min_share: float = 1e-4,
) -> DataFrame:
    """Join/shuffle-key skew audit: the heaviest values of each
    candidate key column with their row share — the numbers that decide
    broadcast vs shuffle vs salting BEFORE a 100-TB join, and the
    fixture evidence behind uniqueness's ``salt_buckets`` knob.

    Output per (col_name, value): ``n``, ``rank`` (1..k by count desc,
    value asc — deterministic ties), ``share`` (n / column rows) and
    ``skew_x`` = share x n_distinct — a uniform key scores 1.0; 50
    means that value carries 50x a uniform key's share, which is the
    threshold family AQE's skew-join split and the salting decision
    key off.

    Scale shape: ONE pass for all columns — each row explodes to
    (col_name, value) pairs and one map-side-combined groupBy counts
    them, so the shuffle carries O(sum of per-column distincts) rows,
    never O(rows x cols). Totals and distincts per column derive from
    the SAME counts frame (broadcast back — O(cols) rows). The only
    rank structure is a per-column window over counts PRE-FILTERED to
    ``share >= min_share`` — by pigeonhole at most 1/min_share rows per
    column survive (10^4 at the default), so the window never sorts a
    high-cardinality column's full distinct set; a key below min_share
    cannot be a skew problem by definition. Fewer than k survivors IS
    the healthy answer.
    """
    from pyspark.sql import Window

    pairs = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("col_name"),
                        F.col(c).cast("string").alias("value"),
                    )
                    for c in cols
                ]
            )
        ).alias("p")
    ).select("p.col_name", "p.value")
    counts = pairs.groupBy("col_name", "value").agg(F.count(F.lit(1)).alias("n"))
    per_col = counts.groupBy("col_name").agg(
        F.sum("n").alias("n_rows"), F.count(F.lit(1)).alias("n_distinct")
    )
    heavy = counts.join(F.broadcast(per_col), "col_name").filter(
        F.col("n") >= F.col("n_rows") * F.lit(min_share)
    )
    w = Window.partitionBy("col_name").orderBy(F.desc("n"), F.asc_nulls_last("value"))
    return (
        heavy.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "col_name",
            "value",
            "n",
            F.col("rank").cast("long").alias("rank"),
            F.round(F.col("n") / F.col("n_rows"), 6).alias("share"),
            F.round(F.col("n") * F.col("n_distinct") / F.col("n_rows"), 4).alias("skew_x"),
        )
    )


def topk_sketches(
    df: DataFrame,
    partition_col: str,
    col: str,
    k: int = 64,
    run_id: str = "r0",
) -> DataFrame:
    """Per-partition truncated top-k value counts with a SOUND undercount
    bound — the heavy-hitter member of the mergeable sketch family
    (checks/stats.py hll_sketches for distincts, checks/quantiles.py
    t-digests for quantiles): store one sketch frame per run next to the
    manifest, union frames across runs, and ``topk_union`` answers
    "all-time most frequent values" WITHOUT rescanning committed history.

    Rows: (run_id, partition_key, item, n, bound) — exact per-run counts
    for the k most frequent items (ties on item) plus ``bound``, the
    count at rank k+1 (0 when the partition has <= k distinct items).
    ``bound`` is the largest count any DROPPED item can have, which is
    what makes cross-run merging sound: a merged estimate undercounts an
    item by at most the sum of the bounds of the runs that dropped it
    (the Misra-Gries / SpaceSaving merge argument, realized with exact
    per-run counts).

    Scale: one map-side-combined count shuffle of O(distinct) rows, then
    two_phase_topk — no single-reducer funnel even for partitions with
    huge vocabularies.
    """
    from ..operators.similarity import two_phase_topk

    counts = df.groupBy(
        F.col(partition_col).cast("string").alias("partition_key"),
        F.col(col).cast("string").alias("item"),
    ).agg(F.count(F.lit(1)).alias("n"))
    ranked = two_phase_topk(
        counts, k + 1, group_col="partition_key", order_desc="n", tie_col="item"
    )
    bound = ranked.filter(F.col("rank") == k + 1).select(
        "partition_key", F.col("n").alias("_bnd")
    )
    from .base import null_safe_join

    return (
        null_safe_join(
            ranked.filter(F.col("rank") <= k), bound,
            ["partition_key"], "left", broadcast_right=True,
        )
        .select(
            F.lit(run_id).alias("run_id"),
            "partition_key",
            "item",
            "n",
            F.coalesce(F.col("_bnd"), F.lit(0)).cast("long").alias("bound"),
        )
    )


def topk_union(sketches: DataFrame, k: int = 10) -> DataFrame:
    """Merge unioned per-run sketch frames into per-partition all-time
    top-k with sound bounds: (partition_key, rank, item, est, upper).

    ``est`` (sum of stored counts) is a LOWER bound on the true count;
    ``upper`` adds, per item, the bounds of exactly the runs that did
    NOT store it — the tightest undercount interval the sketches can
    justify. Pure relational: the per-(run, partition) bound table and
    the per-item presence sums come off the same tiny sketch frame.
    """
    from ..operators.similarity import two_phase_topk

    run_bounds = (
        sketches.select("run_id", "partition_key", "bound")
        .distinct()
        .groupBy("partition_key")
        .agg(F.sum("bound").alias("_total_bound"))
    )
    per_item = sketches.groupBy("partition_key", "item").agg(
        F.sum("n").alias("est"), F.sum("bound").alias("_present_bound")
    )
    from .base import null_safe_join

    merged = null_safe_join(
        per_item, run_bounds, ["partition_key"], broadcast_right=True
    ).select(
        "partition_key",
        "item",
        "est",
        (F.col("est") + F.col("_total_bound") - F.col("_present_bound")).alias("upper"),
    )
    return two_phase_topk(
        merged, k, group_col="partition_key", order_desc="est", tie_col="item"
    ).select("partition_key", "rank", "item", "est", "upper")
