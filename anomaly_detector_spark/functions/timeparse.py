"""Tolerant timestamp coercion (reference F1 semantics).

The reference accepts epoch-ms (13 digits), epoch-ns (19 digits), or
anything pandas can parse (/root/reference/algo/operator.py:81-88
``todatetime``). Re-expressed as a single JVM-side column expression —
branching on digit-string shape with ``when``; no Python in the path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def tolerant_timestamp(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    s = c.cast("string")
    is_digits = s.rlike(r"^\d+$")
    n = F.length(s)
    return (
        F.when(is_digits & (n == 13), F.timestamp_millis(s.cast("long")))
        .when(is_digits & (n == 19), (s.cast("decimal(25,0)") / F.lit(1000000000)).cast("timestamp"))
        .when(is_digits & (n == 10), F.timestamp_seconds(s.cast("long")))
        .otherwise(F.to_timestamp(s))
    )
