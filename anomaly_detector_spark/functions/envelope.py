"""Result envelope encode/decode (reference S3/F14 semantics).

The reference wraps every emitted result in a JSON envelope
``{pipeline_id, operator_id, analytics: {...}, time}`` keyed by operator
id (/root/reference/util/op_base.py:86-97) with ISO 'Z' timestamps, and
decodes inbound messages with json.loads (:84). Spark-native:
``F.to_json(struct)`` / ``F.from_json`` — JVM-side, codegen'd, usable on
any sink/source including Kafka writers.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def to_envelope(
    df: DataFrame,
    analytics_cols: list[str],
    pipeline_id: str,
    operator_id: str,
    out: str = "envelope",
) -> DataFrame:
    """Wrap ``analytics_cols`` into the reference's JSON envelope column.

    ``time`` is ISO-8601 UTC with a trailing 'Z'
    (cf. ``datetime.utcnow().isoformat() + 'Z'``, util/op_base.py:93).
    """
    payload = F.struct(
        F.lit(pipeline_id).alias("pipeline_id"),
        F.lit(operator_id).alias("operator_id"),
        F.struct(*[F.col(c) for c in analytics_cols]).alias("analytics"),
        F.concat(
            F.date_format(F.current_timestamp(), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"), F.lit("Z")
        ).alias("time"),
    )
    return df.withColumn(out, F.to_json(payload))


def envelope_schema(analytics_schema: T.StructType) -> T.StructType:
    return T.StructType(
        [
            T.StructField("pipeline_id", T.StringType()),
            T.StructField("operator_id", T.StringType()),
            T.StructField("analytics", analytics_schema),
            T.StructField("time", T.StringType()),
        ]
    )


def from_envelope(col: Column | str, analytics_schema: T.StructType) -> Column:
    """Decode an envelope JSON string column into a typed struct."""
    c = F.col(col) if isinstance(col, str) else col
    return F.from_json(c, envelope_schema(analytics_schema))
