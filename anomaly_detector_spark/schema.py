"""Canonical schemas and dimensions.

The engine's primary input is a table of source-code files with exactly
the columns ``(repo, path, commit, lang, content)`` (all strings). The
reference's dynamic, config-driven mapping layer (util/config.py:46-59 in
/root/reference) is replaced by this declared StructType plus a
projection helper; its selector routing (util/__init__.py:98-103) becomes
the check registry in plans.suite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

FILES_SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType(), nullable=False),
        T.StructField("path", T.StringType(), nullable=False),
        T.StructField("commit", T.StringType(), nullable=False),
        T.StructField("lang", T.StringType(), nullable=True),
        T.StructField("content", T.StringType(), nullable=True),
    ]
)

FILES_KEY = ["repo", "path", "commit"]

# Allowed-language dimension (referential check, SURVEY.md J1). Tiny by
# construction — always broadcast.
ALLOWED_LANGS: list[tuple[str, str]] = [
    ("python", "scripting"),
    ("javascript", "scripting"),
    ("typescript", "scripting"),
    ("ruby", "scripting"),
    ("perl", "scripting"),
    ("php", "scripting"),
    ("lua", "scripting"),
    ("shell", "scripting"),
    ("r", "scripting"),
    ("julia", "scripting"),
    ("java", "managed"),
    ("kotlin", "managed"),
    ("scala", "managed"),
    ("csharp", "managed"),
    ("go", "managed"),
    ("swift", "managed"),
    ("c", "systems"),
    ("cpp", "systems"),
    ("rust", "systems"),
    ("zig", "systems"),
    ("fortran", "systems"),
    ("ada", "systems"),
    ("sql", "query"),
    ("html", "markup"),
    ("css", "markup"),
    ("xml", "markup"),
    ("json", "data"),
    ("yaml", "data"),
    ("toml", "data"),
    ("markdown", "doc"),
]

ALLOWED_LANGS_SCHEMA = T.StructType(
    [
        T.StructField("lang", T.StringType(), nullable=False),
        T.StructField("family", T.StringType(), nullable=False),
    ]
)


def allowed_langs_df(spark: SparkSession) -> DataFrame:
    """The broadcast-side dimension table."""
    return spark.createDataFrame(ALLOWED_LANGS, schema=ALLOWED_LANGS_SCHEMA)


def project_files(df: DataFrame, mappings: dict[str, str] | None = None) -> DataFrame:
    """Project an arbitrary source DataFrame onto FILES_SCHEMA.

    ``mappings`` is {dest: source_expr}; source_expr may be a nested path
    (``data.val_a``) — the Spark-native analog of the reference's
    mapping/rename projection (util/__init__.py:123).
    """
    mappings = mappings or {f.name: f.name for f in FILES_SCHEMA.fields}
    cols = [F.expr(src).cast("string").alias(dest) for dest, src in mappings.items()]
    return df.select(*cols)
