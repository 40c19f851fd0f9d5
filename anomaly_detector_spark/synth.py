"""Deterministic, distributed synthesizer for the source-code files table.

Generates ``(repo, path, commit, lang, content)`` at any row count with
pure column expressions seeded by ``xxhash64`` — no Python RNG, no
driver-side loops — so the same ``(n_rows, seed)`` yields the identical
table on 1 core or 1000 executors, and generation itself scales linearly
(it is a narrow map over ``spark.range``).

Planted irregularities (per FIXTURES.md §1):
* one skewed mega-repo holding ~50% of rows (exercises salted dedup),
* ~1% rows with unknown langs (referential violations),
* ~0.5% NULL content (null-rate stat),
* a designated lang (``cpp``) with a shifted content-length
  distribution (drift violations),
* a ~0.5% slice of exact duplicate (repo, path, commit) keys with
  differing content (uniqueness violations, keep-first semantics as in
  the reference's index dedup, /root/reference/algo/operator.py:92).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .schema import ALLOWED_LANGS

_WORDS = [
    "def", "class", "return", "import", "for", "while", "if", "else",
    "try", "except", "lambda", "yield", "async", "await", "match",
    "struct", "enum", "impl", "trait", "fn", "let", "mut", "pub",
    "void", "static", "const", "template", "typename", "namespace",
    "public", "private", "protected", "virtual", "override", "final",
    "func", "var", "package", "interface", "chan", "select", "defer",
    "x", "y", "z", "i", "j", "k", "n", "m", "tmp", "buf", "ptr",
    "data", "value", "result", "error", "ctx", "cfg", "args", "kwargs",
]

_EXT = {
    "python": "py", "javascript": "js", "typescript": "ts", "java": "java",
    "go": "go", "rust": "rs", "c": "c", "cpp": "cc", "ruby": "rb",
    "shell": "sh", "sql": "sql", "html": "html", "css": "css",
    "json": "json", "yaml": "yaml", "markdown": "md",
}

# Langs actually emitted by the generator (subset of the allowed dim) plus
# the planted-violation langs that are NOT in the dimension.
_GEN_LANGS = list(_EXT.keys())
_BAD_LANGS = ["klingon", "brainfuck", ""]

DRIFT_LANG = "cpp"          # the partition with the shifted length distribution
MEGA_REPO = "org0/megarepo"  # the skewed repo


def _h(seed: int, *cols) -> F.Column:
    """Stable 64-bit hash column (xxhash64 with a fixed salt)."""
    return F.xxhash64(F.lit(seed), *cols)


def synth_files(
    spark: SparkSession,
    n_rows: int,
    seed: int = 42,
    skew: bool = True,
    partitions: int | None = None,
) -> DataFrame:
    """Build the files table as a lazy DataFrame (never materialized on the driver)."""
    base = spark.range(0, n_rows, 1, partitions or spark.sparkContext.defaultParallelism)

    # ~0.5% of ids alias the key of the id 7 positions earlier → duplicate keys.
    key_id = F.when(
        (F.col("id") % 199 == 7) & (F.col("id") >= 7), F.col("id") - 7
    ).otherwise(F.col("id"))
    df = base.withColumn("key_id", key_id)

    # repo: half the rows land in one mega-repo when skew is on.
    h_repo = F.pmod(_h(seed + 1, F.col("key_id")), F.lit(1000))
    repo_tail = F.concat(
        F.lit("org"), (h_repo % 13).cast("string"), F.lit("/repo"), (h_repo % 7).cast("string")
    )
    repo = (
        F.when(h_repo < 500, F.lit(MEGA_REPO)).otherwise(repo_tail)
        if skew
        else repo_tail
    )
    df = df.withColumn("repo", repo)

    # lang: ~1% unknown langs, else uniform over the generated subset.
    h_lang = F.pmod(_h(seed + 2, F.col("key_id")), F.lit(1600))
    lang_arr = F.array(*[F.lit(x) for x in _GEN_LANGS])
    bad_arr = F.array(*[F.lit(x) for x in _BAD_LANGS])
    df = df.withColumn(
        "lang",
        F.when(h_lang < 16, F.element_at(bad_arr, (h_lang % 3 + 1).cast("int")))
        .otherwise(F.element_at(lang_arr, (h_lang % len(_GEN_LANGS) + 1).cast("int"))),
    )

    # path: depth 1-4 directories + filename with a lang-consistent extension.
    ext_map = F.create_map(*[F.lit(x) for kv in _EXT.items() for x in kv])
    h_path = _h(seed + 3, F.col("key_id"))
    df = df.withColumn(
        "path",
        F.concat(
            F.lit("src/"),
            F.concat_ws(
                "/",
                F.transform(
                    F.sequence(F.lit(1), (F.pmod(h_path, F.lit(4)) + 1).cast("int")),
                    lambda i: F.concat(F.lit("d"), F.pmod(_h(seed + 4, F.col("key_id"), i), F.lit(50)).cast("string")),
                ),
            ),
            F.lit("/f"),
            F.pmod(h_path, F.lit(100000)).cast("string"),
            F.lit("."),
            F.coalesce(ext_map[F.col("lang")], F.lit("txt")),
        ),
    )

    # commit: sha1-shaped (40 lowercase hex chars), 1-5 distinct per repo.
    df = df.withColumn(
        "commit",
        F.substring(
            F.sha2(F.concat(F.col("repo"), F.pmod(_h(seed + 5, F.col("key_id")), F.lit(5)).cast("string")), 256),
            1,
            40,
        ),
    )

    # content: pseudo-source text; token count ~ lang-dependent with a
    # planted +shift for DRIFT_LANG; ~0.5% NULLs. NOTE: token count hashes
    # on `id` (not key_id) so duplicate keys carry differing content.
    n_tok_base = (F.pmod(_h(seed + 6, F.col("id")), F.lit(120)) + 5).cast("int")
    n_tok = F.when(F.col("lang") == DRIFT_LANG, n_tok_base + F.lit(140)).otherwise(n_tok_base)
    word_arr = F.array(*[F.lit(w) for w in _WORDS])
    content = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(1), n_tok),
            lambda i: F.element_at(
                word_arr, (F.pmod(_h(seed + 7, F.col("id"), i), F.lit(len(_WORDS))) + 1).cast("int")
            ),
        ),
    )
    df = df.withColumn(
        "content",
        F.when(F.pmod(_h(seed + 8, F.col("id")), F.lit(200)) == 0, F.lit(None).cast("string")).otherwise(content),
    )

    return df.select("repo", "path", "commit", "lang", "content")
