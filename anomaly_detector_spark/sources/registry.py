"""Table sources: parquet test tables and the derived ``files`` view.

``load_table`` is the engine's batch source (the Spark-native analog of
the reference's Kafka source, /root/reference/util/op_base.py:81-84 —
an Iceberg/parquet scan instead of a poll loop; filters and column
selection push down into the scan).

``files_view`` deterministically derives a source-code-files-shaped
table ``(repo, path, commit, lang, content)`` from the ``documents``
test table, with planted duplicate keys (doc_id folding) and langs that
are checked against an allowed dimension. The SAME derivation is
expressed as ANSI SQL in ``FILES_CTE_SQL`` so DuckDB produces the
identical table for oracle comparison — keep the two in lockstep.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

# Langs permitted by the referential check on the derived files table.
# 'zh' is deliberately absent → its rows are planted referential violations.
ALLOWED_DOC_LANGS = ["de", "en", "es", "fr"]

# doc_id folding modulus: ids >= _FOLD alias the key columns of id % _FOLD,
# creating duplicate (repo, path, commit) keys with differing content.
_FOLD = 450


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def files_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived files table; must stay semantically identical to FILES_CTE_SQL."""
    d = load_table(spark, sf_dir, "documents")
    key_id = (F.col("doc_id") % _FOLD).cast("long")
    return d.select(
        F.concat(
            F.lit("org"), (key_id % 10).cast("string"), F.lit("/repo"), (key_id % 7).cast("string")
        ).alias("repo"),
        F.concat(F.lit("src/f"), key_id.cast("string"), F.lit("."), F.col("lang")).alias("path"),
        F.substring(F.sha2(key_id.cast("string"), 256), 1, 40).alias("commit"),
        F.col("lang"),
        F.col("text").alias("content"),
        F.col("doc_id").cast("long").alias("doc_id"),
    )


FILES_SCHEMA = "repo string, path string, commit string, lang string, content string"


def write_bucketed(
    df: DataFrame,
    table: str,
    buckets: int = 64,
    bucket_cols: tuple[str, ...] = ("repo", "path", "commit"),
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Persist the files table bucketed by the uniqueness key.

    Bucketing is the co-location lever for the hot path: a scan of a
    table bucketed by (repo, path, commit) already satisfies the
    clustering requirement of every aggregate/join keyed by that tuple
    (or any superset, e.g. the suite's (key, lang) counts), so the
    uniqueness check's only wide shuffle disappears — the aggregation
    runs entirely map-side on the bucketed scan. On Iceberg the same is
    expressed as a `bucket(N, ...)` partition transform with
    storage-partitioned joins. Verified by test_sources:
    no Exchange below the first aggregate over the bucketed scan.
    """
    w = df.write.mode(mode).bucketBy(buckets, *bucket_cols).sortBy(*bucket_cols).format("parquet")
    if path is not None:
        w = w.option("path", path)  # external table; default: session warehouse
    w.saveAsTable(table)


def read_input(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: str | None = None,
    corrupt_col: str = "_corrupt_record",
    options: dict | None = None,
) -> DataFrame:
    """One batch-input surface for every landed format the suite
    validates: ``parquet`` / ``iceberg`` / ``table`` (catalog name) /
    ``orc`` read their own schema from footers or the catalog; ``csv``,
    ``json`` and ``xml`` (one element per line, Spark 4 native
    ``from_xml``) are SCHEMALESS TEXT and follow landed-data rules:

    * A schema is mandatory (default ``FILES_SCHEMA``) and
      ``inferSchema`` is never used — inference is a SECOND full pass
      over the data, unaffordable at 100 TB, and it lets the data vote
      on its own types (a drifted file silently flips a column to
      string instead of failing validation).
    * PERMISSIVE parsing with a ``corrupt_col`` column: malformed lines
      become rows whose payload columns are NULL and whose corrupt
      column holds the raw text — callers split them off
      (``split_corrupt``) and validate them as first-class bad input
      instead of crashing the run (FAILFAST) or silently dropping them
      (DROPMALFORMED).
    * The text formats are read as a ``text`` scan + ``from_json`` /
      ``from_csv`` COLUMN EXPRESSIONS, not the file-source readers:
      the readers' internal corrupt-record column cannot be queried on
      its own (Spark's QUERY_ONLY_CORRUPT_RECORD_COLUMN rule — the
      documented workaround is caching the table, unaffordable at
      100 TB), while a parsed corrupt column is an ordinary column
      both sides of the quarantine split can filter and count. Same
      single splittable scan either way. Known limit: line-based,
      so csv fields with EMBEDDED NEWLINES are out of scope (the
      non-splittable multiLine mode would be too — landed data with
      newline fields should arrive as json).

    Scale note: csv/json scans get no column pruning or predicate
    pushdown — every check pass re-reads whole lines. They are the
    validate-on-landing formats; the suite's verdict gates conversion
    to parquet/Iceberg (the WAP plan), after which scans prune.
    """
    opts = dict(options or {})
    if fmt == "parquet":
        return spark.read.options(**opts).parquet(path)
    if fmt == "iceberg":
        return spark.read.options(**opts).format("iceberg").load(path)
    if fmt == "table":
        return spark.table(path)
    if fmt == "orc":
        return spark.read.options(**opts).orc(path)
    if fmt in ("csv", "json", "xml"):
        raw = spark.read.text(path)
        return _parse_text_lines(raw, fmt, schema or FILES_SCHEMA, corrupt_col, opts)
    raise ValueError(f"unknown input format {fmt!r}")


def _parse_text_lines(
    raw: DataFrame, fmt: str, sch: str, corrupt_col: str, opts: dict
) -> DataFrame:
    """Shared csv/json line parser for the batch and streaming readers:
    PERMISSIVE ``from_json``/``from_csv`` column expressions over a
    ``text`` scan's ``value`` column (see ``read_input`` for why this
    beats the file-source readers). ``raw`` may be batch or streaming —
    everything here is a stateless projection/filter, legal in both.

    The flatten is ``inline(array(parsed))`` — a Generate node — NOT a
    struct projection: from_json/from_csv are CodegenFallback
    expressions, so a collapsed project would let Catalyst inline the
    parse into every consumer (split_corrupt's null filter AND the
    payload projection each re-parse the line — measured 3.52s vs 2.12s
    for a payload aggregate over 1M json lines at local[8]). Generate
    emits the fields as real output ATTRIBUTES computed once per row;
    downstream filters/projects reference attributes and can never
    duplicate the parse."""
    full = f"{sch}, {corrupt_col} string"
    popts = {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": corrupt_col}
    if fmt == "json":
        popts.update(opts)  # timestampFormat, allowComments, ... pass through
        parsed = F.from_json(F.col("value"), full, popts)
    elif fmt == "xml":
        # one COMPLETE element per line (same line-based contract as
        # csv/json; Spark 4's native from_xml, PERMISSIVE like the rest)
        popts["rowTag"] = opts.pop("rowTag", "row")
        popts.update(opts)
        parsed = F.from_xml(F.col("value"), full, popts)
    else:
        header = opts.pop("header", "true")
        popts.update(opts)
        if str(header).lower() == "true":
            # the writer's header line is the schema's field names
            # in order; drop it wherever it appears (once per file)
            names = [f.strip().split(" ")[0] for f in sch.split(",")]
            sep = popts.get("sep", popts.get("delimiter", ","))
            raw = raw.filter(F.col("value") != sep.join(names))
        parsed = F.from_csv(F.col("value"), full, popts)
    return raw.select(F.inline(F.array(parsed)))


def read_input_stream(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: str | None = None,
    corrupt_col: str = "_corrupt_record",
    options: dict | None = None,
) -> DataFrame:
    """Streaming twin of ``read_input`` — a file-source stream of landed
    data with IDENTICAL parse semantics, so validate-on-landing can run
    continuously (files appear in a drop directory, each micro-batch is
    validated and committed) without a second reader implementation.

    ``parquet``/``orc`` streams need the schema up front (Spark refuses
    to infer on a stream) — the default is ``FILES_SCHEMA``, matching
    the batch reader's contract. ``csv``/``json`` reuse the batch text
    parser verbatim: ``readStream.text`` + the same PERMISSIVE parse
    expressions, corrupt lines surviving as quarantine rows that
    ``validate_stream(corrupt_dir=...)`` routes per micro-batch.
    ``options`` passes through file-stream knobs (``maxFilesPerTrigger``
    etc.) — but note validate_stream's split-partition warning: a
    partition split across triggers is only validated on its first
    appearance.
    """
    opts = dict(options or {})
    sch = schema or FILES_SCHEMA
    if fmt in ("parquet", "orc"):
        return spark.readStream.options(**opts).schema(sch).format(fmt).load(path)
    if fmt in ("csv", "json", "xml"):
        stream_opts = {
            k: opts.pop(k) for k in ("maxFilesPerTrigger", "latestFirst") if k in opts
        }
        raw = spark.readStream.options(**stream_opts).text(path)
        return _parse_text_lines(raw, fmt, sch, corrupt_col, opts)
    raise ValueError(f"unknown stream input format {fmt!r}")


def split_corrupt(
    df: DataFrame, corrupt_col: str = "_corrupt_record"
) -> tuple[DataFrame, DataFrame]:
    """(clean, corrupt) split of a PERMISSIVE csv/json read — two
    filters over one scan, the quarantine_by_rules shape: no join, no
    shuffle. Clean rows drop the corrupt column; corrupt rows keep the
    raw line plus ``source_file`` (``input_file_name()``) — at scale the
    rejection unit is the landed FILE, not the line, so quarantine rows
    must name the file that produced them (groupBy source_file on the
    quarantine table = the reject/re-request list for the upstream
    producer). A frame without the column (parquet/orc/table input)
    returns (df, empty)."""
    if corrupt_col not in df.columns:
        empty = df.select(
            F.lit(None).cast("string").alias(corrupt_col),
            F.lit(None).cast("string").alias("source_file"),
        ).limit(0)
        return df, empty
    clean = df.filter(F.col(corrupt_col).isNull()).drop(corrupt_col)
    corrupt = df.filter(F.col(corrupt_col).isNotNull()).select(
        corrupt_col, F.input_file_name().alias("source_file")
    )
    return clean, corrupt


def landed_key_profile(
    raw: DataFrame, declared: list[str] | str, value_col: str = "value"
) -> DataFrame:
    """Schema-evolution audit for landed json, BEFORE the declared-schema
    parse: per top-level key, how many lines carry it and whether the
    declared schema knows it. The failure mode this catches: upstream
    renames ``content`` -> ``body`` — the PERMISSIVE parse silently
    yields 100% NULL ``content`` (the null-rate check fires, but can't
    say WHY) and silently DROPS ``body`` (nothing fires). The profile
    shows ``content`` share dropping and an ``unknown`` key ``body``
    rising — the rename, named.

    Returns (key, n_rows, share, status): one row per observed key plus
    one per declared-but-never-observed key (n_rows=0); status is
    ``declared`` or ``unknown``. Malformed lines (``json_object_keys``
    -> NULL) are skipped here — they are ``split_corrupt``'s job.

    Scale shape: ``json_object_keys`` tokenizes only the top-level key
    names (no value parse) in one pass; the explode fans out to
    O(lines x keys) but collapses immediately into a map-side partial
    count, so the shuffle is O(distinct keys). The line total is a
    second, parse-free count of the same text scan; the declared list
    and the totals row ride broadcast joins. Batch frames only (the
    two-aggregate shape needs a complete input; run it per micro-batch
    via foreachBatch if needed on a stream).
    """
    if isinstance(declared, str):
        names = [f.strip().split(" ")[0] for f in declared.split(",")]
    else:
        names = list(declared)
    spark = raw.sparkSession
    obs = (
        raw.select(F.explode(F.json_object_keys(F.col(value_col))).alias("key"))
        .groupBy("key")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )
    decl = spark.createDataFrame([(n,) for n in names], "key string")
    totals = raw.agg(F.count(F.lit(1)).alias("n_lines"))
    # No broadcast hint: Spark cannot build-right a FULL OUTER hash join,
    # so the hint was ignored with a per-run HintErrorLogger warning.
    # Both sides are O(distinct keys) aggregates — the SMJ is trivial.
    prof = obs.join(decl.withColumn("_decl", F.lit(True)), "key", "full_outer")
    return (
        prof.crossJoin(F.broadcast(totals))
        .select(
            "key",
            F.coalesce("n_rows", F.lit(0)).alias("n_rows"),
            (F.coalesce("n_rows", F.lit(0)) / F.col("n_lines")).alias("share"),
            F.when(F.col("_decl").isNull(), F.lit("unknown"))
            .otherwise(F.lit("declared"))
            .alias("status"),
        )
    )


def parse_kafka_envelope(df: DataFrame, schema: str = FILES_SCHEMA) -> DataFrame:
    """Decode a Kafka-shaped frame (binary ``value`` column) into file
    rows: value = JSON document in ``input_hint`` shape. Pure column
    expressions — testable on a static frame, identical for the stream.

    The reference consumes one JSON message at a time from its Kafka
    consumer (/root/reference/util/op_base.py:81-108); here the decode is
    a vectorized from_json over whatever micro-batch Spark delivers.
    Flattened via ``inline(array(...))``, not a struct projection — the
    Generate barrier keeps a pushed-down downstream filter from inlining
    (= re-evaluating) the CodegenFallback from_json per consumer, the
    same fix as ``_parse_text_lines`` (PLANS.md round-3 §41).
    """
    return df.select(
        F.inline(F.array(F.from_json(F.col("value").cast("string"), schema)))
    )


def kafka_files_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    schema: str = FILES_SCHEMA,
    starting_offsets: str = "earliest",
) -> DataFrame:
    """S1 in its native form: a Kafka stream of file rows, ready for
    ``streaming.validate.validate_stream``. Requires the
    spark-sql-kafka connector on the classpath (spark-submit --packages
    org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-version>); the
    envelope decode is the separately-tested parse_kafka_envelope.
    """
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )
    return parse_kafka_envelope(raw, schema)


# DuckDB CTE producing the identical table (oracle side).
FILES_CTE_SQL = f"""
files AS (
  SELECT
    'org' || CAST((doc_id % {_FOLD}) % 10 AS VARCHAR)
          || '/repo' || CAST((doc_id % {_FOLD}) % 7 AS VARCHAR) AS repo,
    'src/f' || CAST(doc_id % {_FOLD} AS VARCHAR) || '.' || lang AS path,
    substr(sha256(CAST(doc_id % {_FOLD} AS VARCHAR)), 1, 40) AS "commit",
    lang,
    text AS content,
    CAST(doc_id AS BIGINT) AS doc_id
  FROM documents
)
"""


def files_from_tree(
    spark: SparkSession,
    root: str,
    glob: str | None = None,
    repo: str | None = None,
    lang_map: dict | None = None,
) -> DataFrame:
    """Ingest a directory TREE of raw source files into the files-table
    shape ``(repo, path, commit, lang, content)`` — the top of the
    funnel: point the suite at an actual checkout instead of an already-
    tabular landing. One row per FILE (``wholetext`` scan — each task
    reads whole files, so the unit of parallelism is the file, the same
    contract as the reference's one-document-per-message input):

    * ``path``: file path relative to ``root``;
    * ``repo``: ``repo`` if given, else the first path segment under
      ``root`` (a directory of checkouts);
    * ``lang``: lower-cased file extension, optionally renamed through
      ``lang_map`` (e.g. ``{"py": "python"}``);
    * ``commit``: first 40 hex chars of sha256(content) — CONTENT-
      addressed, so re-ingesting an unchanged tree is manifest-stable
      and a changed file revalidates, without any VCS dependency.

    Text files only — pass ``glob`` (e.g. ``"*.py"``) to exclude
    binaries; undecodable bytes arrive as replacement characters, they
    do not crash the scan. Reads via the ``binaryFile`` source + UTF-8
    decode, NOT ``text(wholetext=True)`` — wholetext strips the trailing
    newline, and a content-addressed commit must hash the exact bytes.
    Scale: the listing caveat of ``file_inventory`` applies; a file is
    one task's unit of work (source files are small — that's the
    point), and binaryFile caps single files at 2 GB.
    """
    import os as _os

    r = spark.read.format("binaryFile").option("recursiveFileLookup", "true")
    if glob:
        r = r.option("pathGlobFilter", glob)
    raw = r.load(root).select(
        F.col("path").alias("_file"),
        F.decode(F.col("content"), "UTF-8").alias("content"),
    )
    prefix = _os.path.abspath(root).rstrip("/") + "/"
    rel = F.expr(
        f"substring(regexp_replace(_file, '^file:/+', '/'), {len(prefix) + 1})"
    )
    ext = F.lower(F.substring_index(F.substring_index(rel, "/", -1), ".", -1))
    lang = ext
    for k, v in (lang_map or {}).items():
        lang = F.when(ext == k.lower(), F.lit(v)).otherwise(lang)
    repo_col = F.lit(repo) if repo is not None else F.substring_index(rel, "/", 1)
    return raw.select(
        repo_col.alias("repo"),
        rel.alias("path"),
        F.substring(F.sha2(F.col("content"), 256), 1, 40).alias("commit"),
        lang.alias("lang"),
        "content",
    )
